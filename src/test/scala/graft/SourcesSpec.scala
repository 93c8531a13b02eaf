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
