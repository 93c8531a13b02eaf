package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an undirected edge list —
  * the missing last stage of every near-dup pipeline: pair lists
  * (minhash/simhash/jaccard candidates) must become CLUSTERS with one
  * canonical keeper per cluster before documents can be dropped, and a
  * driver-side union-find does not exist at 100 TB.
  *
  * Algorithm: min-label propagation WITH POINTER DOUBLING, a
  * driver-controlled loop. Each materialized round is one propagation
  * hop (every node adopts the minimum label among itself and its
  * neighbors — self-loops in the edge relation make that a single
  * join + min-aggregation) followed by one shortcut hop
  * (next(v) = label(label(v))), so label chains halve every round and
  * convergence takes O(log diameter) rounds, not O(diameter) — in the
  * family of Kiveris et al. "Connected Components in MapReduce and
  * Beyond" (SoCC'14) and the hash-to-min scheme of Rastogi et al.
  * (ICDE'13). Dedup clusters usually have tiny diameters (≤3), but a
  * chain of pairwise near-dups (template spam with a sliding field)
  * builds a path graph, and a plain-propagation loop dies there.
  * The edge relation is pre-partitioned on the join key and
  * CACHED (an InMemoryRelation preserves its partitioning where a
  * localCheckpoint does not), so every hop reshuffles only the (small)
  * label relation while the big edge side stays put.
  * Convergence rides the checkpoint action itself via observe(): labels
  * only ever decrease, so the label SUM strictly decreases until the
  * fixed point — two consecutive equal sums mean converged, with no
  * separate probe job. Superseded per-round checkpoints are unpersisted
  * so a long-lived session pins O(1) label copies, not O(rounds).
  *
  * Determinism: the fixed point is unique (min node id per component),
  * so results are engine-portable — the DuckDB oracle reproduces it
  * with a recursive reachability CTE. */
object Components {

  /** Free the block-manager storage behind a localCheckpoint'd frame once
    * it has been superseded. localCheckpoint truncates lineage, so the
    * persisted blocks ARE the data — only unpersist frames no downstream
    * consumer will read again (the returned labels keep their final
    * checkpoint; everything intermediate is released here). */
  private[graft] def freeCheckpoint(df: DataFrame): Unit =
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
    // pipelines (e.g. the full Jaccard chain) as edges. The observe rides
    // the checkpoint action, so the edge count used for partition sizing
    // below is free (no extra job).
    val eObs = org.apache.spark.sql.Observation("cc_edges")
    val e0 = edges.select(col("src"), col("dst"))
      .observe(eObs, count(lit(1)).as("n")).localCheckpoint()
    val nEdges = eObs.get("n").asInstanceOf[Long]
    // symmetrize only — NO distinct: min-aggregation is insensitive to
    // duplicate edges, and a distinct here would shuffle the full 2E-row
    // relation once just to drop rows the partial aggregation collapses
    // for free every round. At 100 TB the avoided distinct is the single
    // largest shuffle this function would otherwise run.
    val symRaw = e0
      .unionByName(e0.select(col("dst").as("src"), col("src").as("dst")))
    // initial labels fold the FIRST propagation hop into the node-set
    // aggregation: component0(v) = min(v, neighbors(v)). One shuffle
    // (map-side partial agg) replaces the old distinct-nodes job and a
    // whole hop of the loop.
    val labels0 = symRaw
      .groupBy(col("src").as("id"))
      .agg(min(least(col("src"), col("dst"))).as("component"))
      .localCheckpoint()
    var labels = labels0
    // self-loops (v,v) — taken from the label relation, not a distinct
    // over edges — make min-over-(neighbors ∪ self) a single join per
    // hop. Pre-partition on dst, the per-round join key, and cache():
    // InMemoryRelation preserves outputPartitioning (a checkpoint's
    // LogicalRDD reports UnknownPartitioning, verified against Spark
    // 4.1), so every round's join reuses this one shuffle and only the
    // small label relation moves.
    // Partition count derived from the DATA (guide §2.2: fewer, larger
    // partitions), not pinned to spark.sql.shuffle.partitions: the
    // candidate graphs CC consumes span 400 nodes (q_er_resolve) to the
    // full dedup pair relation, and a 32-way repartition of a few
    // hundred rows makes every one of the O(log diameter) rounds pay 32
    // task launches + a fresh-codegen warmup per task to move bytes of
    // data (r14 StageProfile: 1.3 s executor per round on a 20 k-row
    // relation). ~2M rows (~32 MB at 16 B/row) per partition, floored
    // at 1; capped at 4× the configured shuffle parallelism so a huge
    // edge relation still scales out with the cluster's own setting
    // instead of exploding the M×R shuffle-block count.
    val shufP = e0.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val symParts = math.max(1L, math.min(4L * shufP,
      (2L * nEdges) / 2000000L + 1L)).toInt
    val sym = symRaw
      .unionByName(labels.select(col("id").as("src"), col("id").as("dst")))
      .repartition(symParts, col("dst"))
      .cache()
    var iter = 0
    var converged = false
    // decimal(38,0) sum: immune to long overflow at any id scale
    var prevSum: Option[Option[Any]] = None
    while (!converged && iter < maxIter) {
      val obs = org.apache.spark.sql.Observation(s"cc_round_$iter")
      // One POINTER-DOUBLING shortcut on the MATERIALIZED label relation
      // (doubled(v) = label(label(v)) — a self-join of the checkpoint, so
      // both sides read persisted blocks and nothing recomputes), then
      // one PROPAGATION hop streaming the cached pre-partitioned edges.
      // Labels only decrease and label(v) ≤ v, so label(v) is always
      // itself a labeled node and the shortcut join is total. Doubling
      // makes convergence O(log diameter) materialized rounds instead of
      // O(diameter) — plain propagation dies on a 300-node near-dup
      // chain (template-spam corpora produce exactly those). The
      // shortcut must NOT be applied to the un-materialized propagation
      // output: self-joining that subtree re-executes the edge join per
      // branch when exchange reuse doesn't engage under AQE (observed
      // 2x cost per round).
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
      // `next` is materialized (eager checkpoint): the previous round's
      // label blocks can no longer be read by the LOOP — but the initial
      // labels also live inside the cached `sym` lineage (its self-loop
      // branch), and a lost cached partition recomputes from there. Keep
      // labels0's blocks until sym itself is released below; free every
      // later round's labels eagerly.
      if (labels ne labels0) freeCheckpoint(labels)
      labels = next
      iter += 1
    }
    // the edge relations are only read inside the loop; once sym is
    // dropped nothing can recompute from labels0 or e0 anymore
    sym.unpersist(false)
    if (labels ne labels0) freeCheckpoint(labels0)
    freeCheckpoint(e0)
    if (!converged) {
      // free the final round's checkpoint too before throwing — a long-
      // lived session that catches the failure must not keep one full
      // label-relation copy pinned in the block manager
      if (labels ne labels0) freeCheckpoint(labels)
      throw new IllegalArgumentException(
        s"connectedComponents did not converge in $maxIter rounds")
    }
    labels
  }

  /** Alternative formulation: alternating LARGE-STAR / SMALL-STAR edge
    * contraction (Kiveris et al., "Connected Components in MapReduce and
    * Beyond", SoCC'14). Where `connectedComponents` keeps the EDGE
    * relation fixed (cached, pre-partitioned) and iterates on a label
    * relation, the star algorithm rewrites the edge relation itself each
    * round — large-star hangs every node's larger neighbors off its
    * neighborhood minimum, small-star re-centers the smaller neighbors —
    * until the graph is a star forest whose centers are the component
    * minima. The edge relation SHRINKS monotonically toward one edge per
    * non-root node, so this wins when edges ≫ nodes (dense candidate
    * graphs: a hot LSH bucket of k docs contributes k²/2 pairs that
    * collapse to k−1 star edges after one round); label propagation wins
    * when the edge relation is lean and reusable. Both converge in
    * O(log n) rounds. Same contract as connectedComponents: (id,
    * component = min reachable node id), one row per distinct node in
    * `edges`; ComponentsSpec proves the two agree on randomized graphs.
    */
  def connectedComponentsStar(edges: DataFrame, maxIter: Int = 25): DataFrame = {
    // checkpoint the INPUT once (the connectedComponents posture: callers
    // pass arbitrarily expensive pair pipelines) — `nodes` and the
    // canonical edge set below both derive from it, and two separate
    // checkpoint actions straight off `edges` would re-execute the whole
    // upstream pipeline twice. Nodes come from the PRE-self-loop-filter
    // relation so isolated self-loop nodes keep their label row.
    val e0 = edges.select(col("src"), col("dst")).localCheckpoint()
    // canonical undirected form, self-loops dropped (re-added as labels at
    // the end via the node set), duplicates collapsed once up front — the
    // star rewrites below keep the relation deduplicated round to round
    val nodes = e0
      .select(explode(array(col("src"), col("dst"))).as("id"))
      .distinct()
      .localCheckpoint()
    var e = e0
      .select(least(col("src"), col("dst")).as("lo"),
        greatest(col("src"), col("dst")).as("hi"))
      .filter(col("lo") =!= col("hi"))
      .distinct()
      .localCheckpoint()
    freeCheckpoint(e0)
    var nE = e.count()
    var iter = 0
    var converged = nE == 0L
    while (!converged && iter < maxIter) {
      // LARGE-STAR: center u, m = min(neighborhood(u) ∪ {u}); every
      // STRICTLY LARGER neighbor v > u re-attaches to m. Since m ≤ u < v
      // the produced edge is already canonically ordered (m, v).
      val sym = e.select(col("lo").as("u"), col("hi").as("v"))
        .unionByName(e.select(col("hi").as("u"), col("lo").as("v")))
      val minL = sym.groupBy("u")
        .agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      val large = sym.join(minL, "u")
        .filter(col("v") > col("u"))
        .select(col("m").as("lo"), col("v").as("hi"))
        .filter(col("lo") =!= col("hi"))
        .distinct()
        .localCheckpoint() // read twice by small-star (agg + join)
      // SMALL-STAR: direct edges large→small (every (lo,hi) points
      // hi→lo); center u = hi, m = min of its smaller neighbors; all of
      // them AND u itself re-attach to m.
      val dir = large.select(col("hi").as("u"), col("lo").as("v"))
      val minS = dir.groupBy("u").agg(min(col("v")).as("m"))
      val small = dir.join(minS, "u")
        .select(col("m").as("lo"), col("v").as("hi"))
        .filter(col("lo") =!= col("hi"))
        .unionByName(minS.select(col("m").as("lo"), col("u").as("hi")))
        .distinct()
        .localCheckpoint()
      // fixed point = the edge SET is unchanged: same cardinality and no
      // row of the new relation missing from the old (⊆ + equal count ⇒
      // equality on deduplicated relations — an exact check, no checksum)
      val nSmall = small.count()
      converged = nSmall == nE &&
        small.join(e, Seq("lo", "hi"), "left_anti").isEmpty
      freeCheckpoint(large)
      freeCheckpoint(e)
      e = small
      nE = nSmall
      iter += 1
    }
    if (!converged) {
      // release storage BEFORE throwing — a caught non-convergence in a
      // long-lived session must not pin the node set and last edge round
      freeCheckpoint(nodes)
      freeCheckpoint(e)
      throw new IllegalArgumentException(
        s"connectedComponentsStar did not converge in $maxIter rounds")
    }
    // the converged relation is a star forest: (component-min, member).
    // Non-root members appear exactly once as `hi`; roots and isolated
    // nodes label themselves.
    val labels = nodes
      .join(e.select(col("hi").as("id"), col("lo").as("component")),
        Seq("id"), "left")
      .select(col("id"),
        coalesce(col("component"), col("id")).as("component"))
      .localCheckpoint() // materialize BEFORE freeing the frames it reads
    freeCheckpoint(nodes)
    freeCheckpoint(e)
    labels
  }
}
