package graft

import graft.ops.Maintenance
import org.apache.spark.sql.functions._

/** Compaction: many tiny files → few range-clustered files, content
  * bit-identical, key ranges disjoint across output files, old data
  * retired (not destroyed) by the atomic swap. */
class MaintenanceSpec extends SparkSpec {

  test("compactParquet merges small files, preserves content, clusters ranges") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString + "/t"
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    // simulate a micro-batch-fragmented table: 25 appends of 1 file each
    (0 until 25).foreach { k =>
      docs.filter(col("doc_id") % 25 === k).coalesce(1)
        .write.mode("append").parquet(dir)
    }
    val digestOf = (d: String) => spark.read.parquet(d)
      .agg(sum(crc32(concat_ws("|", col("doc_id"), col("text"), col("lang"),
        col("source"), col("n_chars")))).as("digest"))
      .collect().head.getLong(0)
    val beforeDigest = digestOf(dir)
    val report = Maintenance.compactParquet(spark, dir, "doc_id",
      targetFileBytes = 512L * 1024)

    assert(report.filesBefore === 25)
    assert(report.filesAfter < report.filesBefore,
      s"no consolidation: ${report.filesAfter} files")
    assert(digestOf(dir) === beforeDigest, "content changed under compaction")
    assert(report.rows === docs.count())

    // range clustering: per-file key ranges must be pairwise disjoint, so
    // a doc_id predicate prunes to exactly one file
    val ranges = Maintenance.fileRanges(spark, dir, "doc_id")
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) =>
        assert(hi < lo2, s"overlapping file ranges: $hi >= $lo2")
      case _ => ()
    }

    // the swap retired the original directory instead of deleting it —
    // under a HIDDEN sibling name, invisible to partition discovery
    val d = new java.io.File(dir)
    val retired = new java.io.File(d.getParentFile, s".${d.getName}.pre-compact")
    assert(retired.exists, "pre-compact data not retained")
  }

  test("report.rows is exact when compaction needs MULTIPLE output files " +
      "(RangePartitioner sampling must not double-count the observe)") {
    // nOut > 1 plans a range shuffle whose partitioner runs a separate
    // sampling job; with the metrics node below the exchange that job
    // re-executes it and rows reads ~2x. Tiny targetFileBytes forces
    // the multi-file path the 25-file test never takes.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_compact2").toString + "/t"
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    (0 until 10).foreach { k =>
      docs.filter(col("doc_id") % 10 === k).coalesce(1)
        .write.mode("append").parquet(dir)
    }
    val report = Maintenance.compactParquet(spark, dir, "doc_id",
      targetFileBytes = 8L * 1024)
    assert(report.filesAfter > 1, "test must exercise the multi-file path")
    assert(report.rows === docs.count(),
      s"rows=${report.rows} vs actual ${docs.count()} — sampling double-count")
  }
}
