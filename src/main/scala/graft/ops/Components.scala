package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an undirected edge list —
  * the missing last stage of every near-dup pipeline: pair lists
  * (minhash/simhash/jaccard candidates) must become CLUSTERS with one
  * canonical keeper per cluster before documents can be dropped, and a
  * driver-side union-find does not exist at 100 TB.
  *
  * Algorithm: iterative min-label propagation (each node repeatedly
  * adopts the minimum label among itself and its neighbors) with a
  * driver-controlled loop — the standard Spark formulation (the
  * large-star/small-star algorithm of Kiveris et al. "Connected
  * Components in MapReduce and Beyond", SoCC'14, reduces rounds to
  * O(log log n); plain propagation converges in O(diameter) rounds,
  * which for dedup clusters — tiny diameters — is typically ≤ 3).
  * Each round is one shuffle-join on node id; labels are
  * localCheckpoint'd per round so the lineage (and the re-execution
  * cost) does not grow with iterations.
  *
  * Determinism: the fixed point is unique (min node id per component),
  * so results are engine-portable — the DuckDB oracle reproduces it
  * with a recursive reachability CTE. */
object Components {

  /** Free the block-manager storage behind a localCheckpoint'd frame once
    * it has been superseded. localCheckpoint truncates lineage, so the
    * persisted blocks ARE the data — only unpersist frames no downstream
    * consumer will read again (the returned labels keep their final
    * checkpoint; everything intermediate is released here so a long-lived
    * session pins O(1) label copies, not O(rounds)). */
  private def freeCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(false)
      case _ => ()
    }

  /** edges(src, dst) — treated as undirected; self-loops and duplicates
    * are tolerated. Returns (id, component) where component = min node
    * id reachable, one row per distinct node appearing in `edges`. */
  def connectedComponents(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    // checkpoint the INPUT first: the symmetrization union references the
    // edge subtree twice, and callers pass arbitrarily expensive pair
    // pipelines (e.g. the full Jaccard chain) as edges
    val e0 = edges.select(col("src"), col("dst")).localCheckpoint()
    val sym = e0
      .unionByName(e0.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint()
    var labels = sym.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("component"))
      .localCheckpoint()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // min label among the node itself and its neighbors
      val nbrMin = sym
        .join(labels, sym("dst") === labels("id"))
        .groupBy(sym("src").as("id"))
        .agg(min(col("component")).as("nbr_min"))
      // ONE job per round: the convergence metric rides the checkpoint
      // action itself via observe() — no separate probe job
      val obs = org.apache.spark.sql.Observation(s"cc_round_$iter")
      val next = labels.as("l")
        .join(nbrMin.as("n"), Seq("id"), "left")
        .select(col("id"),
          least(col("l.component"), coalesce(col("n.nbr_min"), col("l.component")))
            .as("component"),
          (col("n.nbr_min") < col("l.component")).as("changed"))
        .observe(obs, sum(col("changed").cast("long")).as("n_changed"))
        .localCheckpoint()
      // sum over an empty relation observes NULL → trivially converged
      converged = Option(obs.get("n_changed")).forall(_.asInstanceOf[Long] == 0L)
      // `next` is materialized (eager checkpoint): the previous round's
      // label blocks can no longer be read — release them now
      freeCheckpoint(labels)
      labels = next.select(col("id"), col("component"))
      iter += 1
    }
    // the edge relations are only read inside the loop
    freeCheckpoint(sym)
    freeCheckpoint(e0)
    require(converged, s"connectedComponents did not converge in $maxIter rounds")
    labels
  }
}
