package graft

import org.apache.spark.sql.functions._

/** End-to-end curation chain: the tool surface over the oracle-checked
  * primitives. Monotone shrinkage, exact/near dup removal, deterministic
  * sampling, and a readable parquet output. */
class CurateCorpusSpec extends SparkSpec {
  import spark.implicits._

  test("curate: quality filter, dedup stages, sampling, and parquet output") {
    // 60 DISTINCT words: one word change affects only 3 of ~58 shingles
    // (Jaccard ≈ 0.9 > θ); a repetitive base would make a single change
    // alter a large fraction of the (few) distinct shingles
    val base = (1 to 60).map(i => s"word$i").mkString(" ")
    val rows =
      // 4 exact copies of one doc (3 dropped at the exact stage)
      (1L to 4L).map(i => (i, base)) ++
      // a near-dup of base (one word changed → Jaccard >> 0.8)
      Seq((10L, base.replaceFirst("word30", "changed30"))) ++
      // distinct healthy docs
      (20L until 30L).map(i => (i, s"doc $i " + ("mu nu xi omicron pi rho sigma tau " * 6) + i)) ++
      // junk: all-stopword doc (low diversity + high stopword density)
      Seq((40L, "the the the the the the the the the the the the"))
    val in = rows.toDF("doc_id", "text")
    val out = java.nio.file.Files.createTempDirectory("graft_curated").toString

    val report = CurateCorpus.curate(spark, in, out,
      "doc_id", "text", minQuality = 0.5, jaccardT = 0.8, sampleMod = 0L).toMap

    assert(report("input") === 16L)
    assert(report("quality >= threshold") === 15L) // stopword doc dropped
    assert(report("exact-deduped") === 12L)        // 3 exact copies dropped
    assert(report("near-dup-deduped") === 11L)     // near-dup of keeper dropped
    assert(report("sampled/written") === 11L)

    val written = spark.read.parquet(out)
    assert(written.count() === 11L)
    // the min-id keeper of the dup cluster survives, copies don't
    val ids = written.select("doc_id").as[Long].collect().toSet
    assert(ids.contains(1L) && !ids.contains(2L) && !ids.contains(10L))
    assert(!ids.contains(40L))
  }
}
