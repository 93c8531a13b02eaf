package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source/sink format coverage beyond parquet: CSV and JSON lines
  * roundtrips with explicit schemas, plus partitioned parquet writes with
  * partition pruning — the layout/compaction moves a 100 TB pipeline
  * depends on. */
class SourcesSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, "/root/testdata/sf0.001")

  test("csv roundtrip with explicit schema and header") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    docs.select("doc_id", "lang", "n_chars")
      .write.mode("overwrite").option("header", "true").csv(dir)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("lang", StringType),
      StructField("n_chars", LongType)))
    val back = spark.read.option("header", "true").schema(schema).csv(dir)
    assert(back.count() === docs.count())
    assert(back.agg(sum("n_chars")).head.getLong(0) ===
      docs.agg(sum("n_chars")).head.getLong(0))
  }

  test("json-lines roundtrip preserves nested arrays") {
    val dir = java.nio.file.Files.createTempDirectory("graft_json").toString
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001").limit(50)
    emb.write.mode("overwrite").json(dir)
    val back = spark.read
      .schema("vec_id LONG, embedding ARRAY<FLOAT>, label INT")
      .json(dir)
    assert(back.count() === 50)
    val a = back.orderBy("vec_id").select("embedding").head.getSeq[Float](0)
    val b = emb.orderBy("vec_id").select("embedding").head.getSeq[Float](0)
    assert(a === b)
  }

  test("orc roundtrip with predicate pushdown") {
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString
    docs.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir).filter(col("n_chars") > 500)
    assert(back.count() === docs.filter(col("n_chars") > 500).count())
    // ORC scans carry pushed filters like parquet ones
    val scan = back.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") && scan.contains("n_chars"))
  }

  test("corrupt file in a directory degrades gracefully with ignoreCorruptFiles") {
    // at 100 TB some files WILL be broken; the job must not die
    val dir = java.nio.file.Files.createTempDirectory("graft_corrupt").toString
    docs.limit(100).write.mode("overwrite").parquet(dir)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "part-junk.parquet"),
      "this is not a parquet file".getBytes)
    val saved = spark.conf.getOption("spark.sql.files.ignoreCorruptFiles")
    spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
    try {
      assert(spark.read.parquet(dir).count() === 100)
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.files.ignoreCorruptFiles", v)
      case None => spark.conf.unset("spark.sql.files.ignoreCorruptFiles")
    }
  }

  test("column pruning reaches the scan: 2-column projection reads a 2-column schema") {
    val lineitem = Tables.lineitem(spark, "/root/testdata/sf0.001")
    val narrow = lineitem.select("l_orderkey", "l_quantity")
    val scan = narrow.queryExecution.executedPlan.toString
    // the parquet ReadSchema must contain ONLY the projected columns
    val schemaLine = scan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(schemaLine.contains("l_orderkey") && schemaLine.contains("l_quantity"))
    assert(!schemaLine.contains("l_extendedprice") && !schemaLine.contains("l_shipdate"))
  }

  test("partitioned parquet write + partition pruning on read") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    docs.write.mode("overwrite").partitionBy("lang").parquet(dir)
    val one = spark.read.parquet(dir).filter(col("lang") === "en")
    assert(one.count() === docs.filter(col("lang") === "en").count())
    // pruning proof: the scan's partition filters mention lang
    val scan = one.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("lang"))
  }
}
