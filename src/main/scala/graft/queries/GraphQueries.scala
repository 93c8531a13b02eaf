package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-14 surface growth, graph family: the three traversal /
  * neighborhood primitives a lakehouse graph workload runs that the
  * existing family (PageRank, pointer-doubling rollup, triangles,
  * degree histogram, connected components) did not yet pin —
  * multi-source BFS (reachability radius), k-core peeling (dense-core
  * extraction), and Adamic-Adar common-neighbor scoring (link
  * prediction). All three ride the co-purchase graph the triangle /
  * degree queries already declare (AdvancedQueries.copurchaseEdges),
  * so the whole graph family audits one shared edge relation; the
  * kernels take any canonically-oriented (u < v) edge relation and are
  * property-tested on crafted graphs (GraphOpsSpec).
  *
  * Scale posture (the 100 TB question is iteration shape, not size):
  * every round of every kernel is one equi-join + one partial-aggregated
  * shuffle on the SAME key the edge relation is already partitioned on;
  * frontier/alive relations are node-bounded, never path-enumerating.
  */
object GraphQueries extends QueryRegistry {

  /** Directed symmetrization of the canonical (u < v) edge list:
    * the traversal kernels walk edges in both directions. */
  private def symmetrized(e: DataFrame): DataFrame =
    e.select(col("u").as("src"), col("v").as("dst"))
      .unionByName(e.select(col("v").as("src"), col("u").as("dst")))

  private val symCte =
    """sym AS (SELECT u AS src, v AS dst FROM edges
      |       UNION ALL SELECT v, u FROM edges)""".stripMargin

  /** Multi-source BFS over (u < v) edges: min-hop distance from the
    * source set {node ≡ 0 mod `srcMod`} within `rounds` hops, returned
    * as the (dist, n_nodes) histogram. The relational BFS shape: the
    * frontier is a (node, dist) relation bounded by |V|, each round is
    * frontier⋈edges + a min() re-aggregation — never a path
    * enumeration, so a 100 TB edge list costs rounds × (one shuffle
    * join on the cached edge partitioning + one node-keyed partial
    * agg). Unlike PageRank's lazy chain (where the rank relation feeds
    * exactly ONE consumer per round), each BFS round reads `dist`
    * TWICE (the expansion join AND the union back in) — left lazy, the
    * plan DOUBLES per round (2^rounds copies of round 0; measured 140
    * AQE jobs for 6 rounds at sf0.001), so every round pins its
    * node-bounded state with localCheckpoint and frees the previous
    * one — the Components/pointerDoubleRollup posture. */
  private[graft] def bfsHopHistogram(e: DataFrame, srcMod: Long,
                                     rounds: Int): DataFrame = {
    // Pinned as UnsafeRows (localCheckpoint), not columnar cache (r14
    // opt): the six per-round expansion joins broadcast the node-bounded
    // dist relation, so the edge side is never shuffled either way — but
    // a columnar cache pays decompression + ColumnarToRow through a
    // fresh codegen class on EVERY round's re-scan (measured ~10× the
    // per-scan executor time of checkpoint-pinned UnsafeRows on the
    // identical relation in q_pagerank, Scratch pr_scan_eager vs
    // pr_lc_scan). The explode emits both edge directions in one pass
    // over `e`, where the union-of-two-selects formulation scanned the
    // co-purchase self-join subtree twice.
    val edges = e.select(explode(array(
        struct(col("u").as("src"), col("v").as("dst")),
        struct(col("v").as("src"), col("u").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .localCheckpoint()
    // SIZE-AWARE broadcast hint per round (r14, the q_pagerank fix): a
    // checkpointed LogicalRDD has no stats, so without the hint the
    // INITIAL plan shuffles the edge side and AQE only converts to
    // broadcast after materializing those exchanges. dist's exact row
    // count rides each round's checkpoint action via observe() (free —
    // no extra job), and the hint fires only while that count × 32 B
    // clears the session's own broadcast threshold: a frontier too big
    // to broadcast keeps the planner's shuffle join, no forced OOM.
    val bcThresh = try org.apache.spark.network.util.JavaUtils
      .byteStringAsBytes(e.sparkSession.conf
        .get("spark.sql.autoBroadcastJoinThreshold"))
    catch { case _: Throwable => 10L << 20 }
    val obs0 = org.apache.spark.sql.Observation("bfs_dist_0")
    var dist = edges.select(col("src").as("node")).distinct()
      .filter(pmod(col("node"), lit(srcMod)) === 0)
      .select(col("node"), lit(0L).as("dist"))
      .observe(obs0, count(lit(1)).as("n"))
      .localCheckpoint()
    var nDist = obs0.get("n").asInstanceOf[Long]
    // ABOVE-THRESHOLD posture (r15, VERDICT r14 #2-wrong): when even the
    // INITIAL frontier cannot broadcast, every round's expansion join
    // would reshuffle the full 2E-row edge checkpoint (frontiers only
    // grow). In that regime the loop reads a src-partitioned columnar
    // cache instead — one extra edge shuffle up front, then each round
    // moves only the node-bounded dist relation (the q_pagerank switch;
    // sf1 A/B with the threshold forced to 1 KB: 3.76-4.5 s vs 3.1 s at
    // the default — the reshuffle is real and this bounds it). If the
    // frontier outgrows the threshold mid-traversal the hint simply
    // stops firing for the remaining rounds; the pin decision is made
    // once, from the source-set size, with no extra job.
    val loopEdges =
      if (nDist * 32 < bcThresh) edges
      else edges.repartition(col("src")).cache()
    for (r <- 1 to rounds) {
      val obs = org.apache.spark.sql.Observation(s"bfs_dist_$r")
      val distSide = if (nDist * 32 < bcThresh) broadcast(dist) else dist
      val next = distSide.join(loopEdges, dist("node") === loopEdges("src"))
        .select(col("dst").as("node"), (col("dist") + lit(1L)).as("dist"))
        .unionByName(dist)
        .groupBy("node").agg(min("dist").as("dist"))
        .observe(obs, count(lit(1)).as("n"))
        .localCheckpoint()
      graft.ops.Components.freeCheckpoint(dist)
      dist = next
      nDist = obs.get("n").asInstanceOf[Long]
    }
    val out = dist.groupBy("dist")
      .agg(count(lit(1)).as("n_nodes"))
      .orderBy("dist")
      .localCheckpoint()
    graft.ops.Components.freeCheckpoint(dist)
    if (loopEdges ne edges) loopEdges.unpersist(false)
    graft.ops.Components.freeCheckpoint(edges)
    out
  }

  /** k-core peeling over (u < v) edges, fixed `rounds` rounds: each
    * round drops nodes of degree < k and the edges they carry; returns
    * the (round, n_nodes, n_edges) shrink profile. Each round is one
    * degree aggregation + two semi-joins, all keyed on node ids.
    * Rounds are eagerly pinned (localCheckpoint): round r's alive set
    * is read three times (degree, stats, next round) — lazy chaining
    * would re-execute the whole peel prefix per consumer. |alive| only
    * shrinks, so the pinned relations are each ≤ |E|. */
  private[graft] def kcorePeelProfile(e: DataFrame, k: Int,
                                      rounds: Int): DataFrame = {
    var alive = e.localCheckpoint()
    (1 to rounds).map { r =>
      val deg = alive.select(col("u").as("node"))
        .unionByName(alive.select(col("v").as("node")))
        .groupBy("node").agg(count(lit(1)).as("deg"))
      val keep = deg.filter(col("deg") >= k).select(col("node"))
        .localCheckpoint()
      alive = alive
        .join(keep.select(col("node").as("u")), Seq("u"), "left_semi")
        .join(keep.select(col("node").as("v")), Seq("v"), "left_semi")
        .select(col("u"), col("v"))
        .localCheckpoint()
      keep.agg(count(lit(1)).as("n_nodes"))
        .crossJoin(alive.agg(count(lit(1)).as("n_edges")))
        .select(lit(r).cast("long").as("round"), col("n_nodes"), col("n_edges"))
    }.reduce(_ unionByName _).orderBy("round")
  }

  /** Adamic-Adar link prediction over (u < v) edges: for non-adjacent
    * pairs, score = Σ_{w ∈ N(u)∩N(v)} 1/ln(deg(w)); top `k` by
    * (rounded score desc, u, v). The wedge-join formulation: neighbor
    * lists self-join on the center w, so the pair space never
    * materializes beyond genuine 2-hop co-neighbors. The center degree
    * rides an UNORDERED window over the same src partitioning the wedge
    * join needs (the PageRank degree trick — one exchange total), and
    * hubs with deg > `degCap` are excluded as centers (the df-cap
    * posture of dedup_ngram_capped: a hub contributes C(deg,2) wedges
    * and ~no signal — 1/ln(deg) → 0). Determinism: deg is exact integer
    * → 1/ln identical doubles; the wedge sum is reassociation-safe
    * under round(6); ordering is on the ROUNDED score with (u, v)
    * tie-break. */
  private[graft] def adamicAdarTopK(e0: DataFrame, degCap: Int,
                                    k: Int): DataFrame = {
    val e = e0.localCheckpoint()
    val nb = symmetrized(e)
      .select(col("src").as("w"), col("dst").as("n"))
      .withColumn("dw", count(lit(1)).over(Window.partitionBy("w")))
      .filter(col("dw") <= degCap)
    val wedges = nb.as("a").join(nb.as("b"),
        col("a.w") === col("b.w") && col("a.n") < col("b.n"))
      .select(col("a.n").as("u"), col("b.n").as("v"),
        (lit(1.0) / log(col("a.dw").cast("double"))).as("contrib"))
    val scored = wedges.groupBy("u", "v")
      .agg(round(sum(col("contrib")), 6).as("score"))
    scored.join(e, Seq("u", "v"), "left_anti")
      .orderBy(desc("score"), col("u"), col("v"))
      .limit(k)
  }

  // ---- Multi-source BFS, 6 rounds, from a deterministic ~1% source
  // set (node ≡ 0 mod 97). The oracle replays the identical 6-round
  // min-hop fixed point with a recursive CTE — UNION-deduped
  // (node, dist) pairs keep the recursion |V|×7-bounded there too.
  private val bfsHops = NamedQuery(
    "q_bfs_hops",
    (spark, d) =>
      bfsHopHistogram(AdvancedQueries.copurchaseEdges(spark, d), 97L, 6),
    Some(s"""WITH RECURSIVE ${AdvancedQueries.copurchaseCte},
        |$symCte,
        |srcs AS (SELECT DISTINCT src AS node FROM sym WHERE src % 97 = 0),
        |bfs(node, dist) AS (
        |  SELECT node, 0 FROM srcs
        |  UNION
        |  SELECT s.dst, b.dist + 1 FROM bfs b
        |  JOIN sym s ON b.node = s.src WHERE b.dist < 6),
        |md AS (SELECT node, min(dist) AS dist FROM bfs GROUP BY node)
        |SELECT CAST(dist AS BIGINT) AS dist, count(*) AS n_nodes
        |FROM md GROUP BY dist ORDER BY dist""".stripMargin))

  // ---- k-core peeling (k = 3), 3 fixed rounds: the dense-core
  // extraction that seeds community mining and spam-cluster hunts.
  // Fixed round count (not to-convergence) keeps the result an exact
  // relational fixed prefix both engines replay; the oracle unrolls
  // the three rounds as explicit CTEs.
  private val kcorePeel = NamedQuery(
    "q_kcore_peel",
    (spark, d) =>
      kcorePeelProfile(AdvancedQueries.copurchaseEdges(spark, d), 3, 3),
    Some(s"""WITH ${AdvancedQueries.copurchaseCte},
        |d1 AS (SELECT node, count(*) AS deg FROM (
        |    SELECT u AS node FROM edges UNION ALL SELECT v FROM edges) t
        |  GROUP BY node),
        |k1 AS (SELECT node FROM d1 WHERE deg >= 3),
        |e1 AS (SELECT u, v FROM edges
        |  WHERE u IN (SELECT node FROM k1) AND v IN (SELECT node FROM k1)),
        |d2 AS (SELECT node, count(*) AS deg FROM (
        |    SELECT u AS node FROM e1 UNION ALL SELECT v FROM e1) t
        |  GROUP BY node),
        |k2 AS (SELECT node FROM d2 WHERE deg >= 3),
        |e2 AS (SELECT u, v FROM e1
        |  WHERE u IN (SELECT node FROM k2) AND v IN (SELECT node FROM k2)),
        |d3 AS (SELECT node, count(*) AS deg FROM (
        |    SELECT u AS node FROM e2 UNION ALL SELECT v FROM e2) t
        |  GROUP BY node),
        |k3 AS (SELECT node FROM d3 WHERE deg >= 3),
        |e3 AS (SELECT u, v FROM e2
        |  WHERE u IN (SELECT node FROM k3) AND v IN (SELECT node FROM k3))
        |SELECT CAST(1 AS BIGINT) AS round,
        |  (SELECT count(*) FROM k1) AS n_nodes,
        |  (SELECT count(*) FROM e1) AS n_edges
        |UNION ALL SELECT 2, (SELECT count(*) FROM k2), (SELECT count(*) FROM e2)
        |UNION ALL SELECT 3, (SELECT count(*) FROM k3), (SELECT count(*) FROM e3)
        |ORDER BY round""".stripMargin))

  // ---- Adamic-Adar top-100 predicted links on the co-purchase graph
  // (center-degree cap 256; binds nothing at the fixture scales but is
  // pinned in the oracle so the guarded and unguarded plans can never
  // silently diverge).
  private val adamicAdar = NamedQuery(
    "q_adamic_adar",
    (spark, d) =>
      adamicAdarTopK(AdvancedQueries.copurchaseEdges(spark, d), 256, 100),
    Some(s"""WITH ${AdvancedQueries.copurchaseCte},
        |$symCte,
        |nb AS (
        |  SELECT src AS w, dst AS n,
        |    count(*) OVER (PARTITION BY src) AS dw
        |  FROM sym),
        |nbc AS (SELECT w, n, dw FROM nb WHERE dw <= 256),
        |scored AS (
        |  SELECT a.n AS u, b.n AS v,
        |    round(sum(1.0 / ln(CAST(a.dw AS DOUBLE))), 6) AS score
        |  FROM nbc a JOIN nbc b ON a.w = b.w AND a.n < b.n
        |  GROUP BY 1, 2),
        |nonadj AS (
        |  SELECT s.u, s.v, s.score FROM scored s
        |  ANTI JOIN edges e ON s.u = e.u AND s.v = e.v)
        |SELECT u, v, score FROM nonadj
        |ORDER BY score DESC, u, v LIMIT 100""".stripMargin))

  val all: Seq[NamedQuery] = Seq(bfsHops, kcorePeel, adamicAdar)
}
