package graft.queries

import graft.Tables
import graft.ops.Money
import org.apache.spark.sql.functions._

/** Sink/round-trip queries: materialize to storage, read back, verify
  * relationally. The reference's only sink is a per-image text side-car
  * (appV2.py:178-179, SURVEY.md R15); a corpus engine needs the
  * partitioned columnar write every curation stage ends with.
  *
  * Each query WRITES (to a deterministic scratch dir under
  * java.io.tmpdir, overwrite mode — reruns are idempotent) and returns
  * the read-back aggregate; the oracle computes the same aggregate from
  * the original table, so a silent drop/dup/corruption in the
  * write-read cycle fails the hash compare.
  *
  * Scale notes: partitionBy("lang") produces one directory per language
  * — the layout that lets every downstream per-language query prune
  * files at the source (PartitionFilters, no data read outside the
  * partition). The repartition(lang) before the write keeps it to one
  * file per partition-dir per shuffle partition instead of
  * tasks × languages small files — at 100 TB the small-file explosion,
  * not the write itself, is what kills a naive partitioned sink. */
object SinkQueries extends QueryRegistry {

  /** Scratch dir keyed by Spark application id AND scale factor:
    * Verify (sf0.01), Bench (sf0.1) and the test suite (also sf0.01!)
    * can overlap in time — any key that two JVMs can share would let
    * one run's mode("overwrite") delete the directory under another's
    * read-back scan, or mix two scale factors into one aggregate. The
    * applicationId is unique per SparkSession, and everything in the
    * same session (a query and the spec asserting on its output)
    * resolves the same path. Dirs accumulate one per app run under the
    * ephemeral tmpdir at ~100 KB each. */
  private[graft] def scratch(spark: org.apache.spark.sql.SparkSession,
                             name: String, sfDir: String): String = {
    val sfKey = new java.io.File(sfDir).getName
    val app = spark.sparkContext.applicationId
    new java.io.File(sys.props("java.io.tmpdir"), s"${name}_${app}_$sfKey").getAbsolutePath
  }

  private val partitionedParquet = NamedQuery(
    "q_sink_partitioned",
    (spark, d) => {
      val out = scratch(spark, "graft_sink_partitioned", d)
      Tables.documents(spark, d)
        .repartition(col("lang"))
        .write.mode("overwrite").partitionBy("lang").parquet(out)
      // explicit schema on the read-back (the CSV/JSON round-trips'
      // convention): partition-column INFERENCE would re-derive lang's
      // type from directory names — a numeric-looking value would come
      // back as int and fail the dtype-class compare, and ''/NULL both
      // collapse into the Hive default partition
      spark.read.schema("doc_id LONG, n_chars LONG, lang STRING")
        .parquet(out)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          countDistinct(col("doc_id")).as("n_distinct_ids"))
        .orderBy("lang")
    },
    Some("""SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  count(DISTINCT doc_id) AS n_distinct_ids
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin))

  // CSV round-trip: header + explicit read schema (inference is a
  // second full scan — never at 100 TB). Content fidelity is pinned by
  // md5(text) surviving the cycle, aggregated per source.
  private val csvRoundTrip = NamedQuery(
    "q_sink_csv_roundtrip",
    (spark, d) => {
      val out = scratch(spark, "graft_sink_csv", d)
      Tables.documents(spark, d)
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
          md5(col("text")).as("text_md5"))
        .write.mode("overwrite").option("header", "true").csv(out)
      spark.read
        .schema("doc_id LONG, lang STRING, source STRING, n_chars LONG, text_md5 STRING")
        .option("header", "true")
        .csv(out)
        // O(1)-state content digest: XOR of per-row 60-bit hashes is
        // commutative/associative, so the per-group aggregation buffer
        // stays constant-size at any corpus scale — the collect_list +
        // sort digest this replaces buffered EVERY row key of a group
        // (billions at the 100 TB posture this file designs for).
        // count(*) rides alongside, so a row duplicated an even number
        // of times (XOR's blind spot) still fails the compare.
        .withColumn("h", graft.ops.TextOps.md5Long(col("text_md5")))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          expr("bit_xor(h)").as("content_digest"))
        .orderBy("source")
    },
    Some("""SELECT source, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  bit_xor(('0x' || substr(md5(md5(text)), 1, 15))::BIGINT) AS content_digest
        |FROM documents GROUP BY source ORDER BY source""".stripMargin))

  // ---- ORC round-trip: the other columnar format Spark speaks
  // natively. Same contract as the CSV round-trip: write the projection
  // to ORC, read it back, and aggregate to a content digest the oracle
  // reproduces from the ORIGINAL parquet — so the check proves the
  // write→read cycle is lossless (any dropped/mangled row changes the
  // sorted digest). ORC brings its own stripe statistics; the read-back
  // aggregation pushes the column projection into the ORC scan the same
  // way parquet does.
  private val orcRoundTrip = NamedQuery(
    "q_sink_orc_roundtrip",
    (spark, d) => {
      val out = scratch(spark, "graft_sink_orc", d)
      Tables.lineitem(spark, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          col("l_quantity"), col("l_extendedprice"))
        .write.mode("overwrite").orc(out)
      spark.read.orc(out)
        // O(1)-state digest (see the CSV round-trip note): XOR of the
        // per-row key hashes + count(*) replaces the unbounded
        // collect_list buffer
        .withColumn("h", graft.ops.TextOps.md5Long(
          concat_ws(":", col("l_orderkey"), col("l_linenumber"))))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_rows"),
          sum(col("l_quantity")).cast("bigint").as("sum_qty"),
          Money.centsSum(col("l_extendedprice")).as("sum_price"),
          expr("bit_xor(h)").as("content_digest"))
        .orderBy("l_returnflag")
    },
    Some(s"""SELECT l_returnflag, count(*) AS n_rows,
        |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
        |  ${Money.centsSumSql("l_extendedprice")} AS sum_price,
        |  bit_xor(('0x' || substr(md5(l_orderkey || ':' || l_linenumber), 1, 15))::BIGINT)
        |    AS content_digest
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin))

  // JSON-lines round-trip: the interchange format every pipeline ends up
  // speaking. Schema applied EXPLICITLY on read — schema inference at
  // 100 TB is a full extra pass over the data before the real one —
  // and doubles survive the text encoding bit-exactly (Jackson writes
  // shortest-roundtrip decimals). The per-group sorted-key digest
  // proves no row is dropped, duplicated, or key-corrupted through the
  // write-read cycle.
  private val jsonRoundTrip = NamedQuery(
    "q_sink_json_roundtrip",
    (spark, d) => {
      val out = scratch(spark, "graft_sink_json", d)
      Tables.orders(spark, d)
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_orderstatus"), col("o_totalprice"))
        .write.mode("overwrite").json(out)
      spark.read
        .schema("o_orderkey BIGINT, o_custkey BIGINT, " +
          "o_orderstatus STRING, o_totalprice DOUBLE")
        .json(out)
        // O(1)-state digest (see the CSV round-trip note)
        .withColumn("h", graft.ops.TextOps.md5Long(col("o_orderkey").cast("string")))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_rows"),
          Money.centsSum(col("o_totalprice")).as("sum_price"),
          expr("bit_xor(h)").as("content_digest"))
        .orderBy("o_orderstatus")
    },
    Some(s"""SELECT o_orderstatus, count(*) AS n_rows,
        |  ${Money.centsSumSql("o_totalprice")} AS sum_price,
        |  bit_xor(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT)
        |    AS content_digest
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin))

  val all: Seq[NamedQuery] =
    Seq(partitionedParquet, csvRoundTrip, orcRoundTrip, jsonRoundTrip)
}
