package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Components

/** Measurement harness for VERDICT r10 §next-8: does folding ONE extra
  * shortcut hop (labels0 ∘ labels0 — a cheap label self-join, no edge
  * join) in front of Components.connectedComponents' loop save a
  * materialized round at the diameters dedup corpora actually have?
  *
  * Method: run dedup_clusters' real edge relation (MinHash-LSH verified
  * pairs at the given SF) through (a) the production loop and (b) the
  * pre-shortcut variant, N alternating repetitions each, recording wall
  * time and round count (the loop's observe() convergence protocol is
  * replicated by instrumenting maxIter probes — rounds are read off the
  * convergence exception boundary instead, see below). Also runs a
  * 300-node path graph — the adversarial deep-diameter shape — so the
  * variant's round arithmetic is visible where it matters most.
  *
  * This is a measurement main, not a registry query: its output goes to
  * SCALE.md as the decide-with-data record (accept or decline). */
object CcMeasure {

  /** The production algorithm with an optional pre-loop shortcut hop,
    * copied structurally from Components.connectedComponents (kept in
    * sync by hand — this harness exists only to compare the two). */
  private def ccVariant(edges: DataFrame, preShortcut: Boolean,
                        maxIter: Int = 20): (DataFrame, Int) = {
    val e0 = edges.select(col("src"), col("dst")).localCheckpoint()
    val symRaw = e0
      .unionByName(e0.select(col("dst").as("src"), col("src").as("dst")))
    val labels0base = symRaw
      .groupBy(col("src").as("id"))
      .agg(min(least(col("src"), col("dst"))).as("component"))
      .localCheckpoint()
    // the candidate change: one label∘label shortcut BEFORE the loop —
    // no edge join, just the (small) label relation self-joined once
    val labels0 =
      if (!preShortcut) labels0base
      else labels0base.as("l1")
        .join(labels0base.as("l2"), col("l1.component") === col("l2.id"))
        .select(col("l1.id"), col("l2.component").as("component"))
        .localCheckpoint()
    var labels = labels0
    val sym = symRaw
      .unionByName(labels.select(col("id").as("src"), col("id").as("dst")))
      .repartition(col("dst"))
      .cache()
    var iter = 0
    var converged = false
    var prevSum: Option[Option[Any]] = None
    while (!converged && iter < maxIter) {
      val obs = org.apache.spark.sql.Observation(s"ccm_${preShortcut}_$iter")
      val doubled = labels.as("l1")
        .join(labels.as("l2"), col("l1.component") === col("l2.id"))
        .select(col("l1.id"), col("l2.component").as("component"))
      val next = sym.as("s")
        .join(doubled.as("h"), col("s.dst") === col("h.id"))
        .groupBy(col("s.src").as("id"))
        .agg(min(col("h.component")).as("component"))
        .observe(obs, sum(col("component").cast("decimal(38,0)")).as("label_sum"))
        .localCheckpoint()
      val curSum = Option(obs.get("label_sum"))
      converged = prevSum.contains(curSum)
      prevSum = Some(curSum)
      if (labels ne labels0) Components.freeCheckpoint(labels)
      labels = next
      iter += 1
    }
    sym.unpersist(false)
    if (labels ne labels0) Components.freeCheckpoint(labels0)
    Components.freeCheckpoint(e0)
    require(converged, s"did not converge in $maxIter")
    (labels, iter)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // warm-up
    spark.range(1000000).selectExpr("sum(id)").collect()

    // the REAL edge relation dedup_clusters consumes, materialized once
    // so both variants measure only the CC loop, not pair generation
    val pairs = graft.queries.DedupQueries.minhashVerifiedPairs(spark, sfDir)
      .select(col("id1").as("src"), col("id2").as("dst"))
      .localCheckpoint()
    println(s"[ccm] edges: ${pairs.count()} pairs at $sfDir")

    // adversarial deep graph: a 300-node path (template-spam chain)
    val path = (0L until 299L).map(i => (i, i + 1)).toDF("src", "dst")
      .localCheckpoint()

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    for (graph <- Seq("dedup" -> pairs, "path300" -> path)) {
      val (gname, g) = graph
      for (r <- 1 to reps; pre <- Seq(false, true)) {
        val ((labels, rounds), sec) = time {
          val (l, n) = ccVariant(g, preShortcut = pre)
          (l.agg(sum(col("component"))).collect().head.get(0), n)
        }
        println(f"[ccm] graph=$gname rep=$r preShortcut=$pre rounds=$rounds " +
          f"wall=$sec%.3f s checksum=$labels")
      }
    }
    spark.stop()
  }
}
