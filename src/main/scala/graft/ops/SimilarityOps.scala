package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Vector-similarity building blocks over ARRAY<FLOAT> embedding columns.
  * Pure higher-order-function expressions (codegen'd, no UDFs) — the
  * arithmetic is done in DOUBLE and matches the DuckDB oracle's
  * list_cosine_similarity to within an ulp (outputs are round()ed). */
object SimilarityOps {

  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity rounded to 6 decimals — rounding BEFORE any
    * ranking/thresholding is the cross-engine determinism contract
    * (last-ulp differences between libm and JDK math must not flip
    * comparisons). */
  def cosine6(a: Column, b: Column): Column =
    round(dot(a, b) / (norm(a) * norm(b)), 6)

  /** Same arithmetic as cosine6 through the fused native Catalyst
    * expression (graft.functions.CosineSimilarity): one codegen'd loop,
    * no intermediate arrays — the hot-path form for O(n²) candidate
    * joins. Bit-identical to cosine6 (FunctionsSpec proves it), so
    * queries can swap freely without touching their oracles. */
  def cosineNative6(spark: org.apache.spark.sql.SparkSession,
                    a: Column, b: Column): Column = {
    graft.functions.GraftFunctions.register(spark)
    round(call_function("graft_cosine", a, b), 6)
  }

  /** Fused native dot product (graft.functions.DotProduct) — the
    * norm-hoisted kernel for O(|q|·|train|) scored joins. */
  def dotNative(spark: org.apache.spark.sql.SparkSession,
                a: Column, b: Column): Column = {
    graft.functions.GraftFunctions.register(spark)
    call_function("graft_dot", a, b)
  }

  /** Norm-hoisted cosine for quadratic scored joins: the caller computes
    * [[norm]] ONCE per row on each side (|q|+|train| sqrt's) and this
    * divides the fused dot by their product — BIT-IDENTICAL to
    * [[cosineNative6]] (same per-element double promotion, same
    * left-to-right sums, `dot / (sqrt(nx)·sqrt(ny))` with the sqrt's
    * merely evaluated earlier; FunctionsSpec pins the equality) at a
    * third of the per-pair flops. The norm projections live BELOW the
    * join, so Catalyst cannot re-inline them into the per-pair project
    * (CollapseProject never crosses a Join). */
  def cosineHoisted6(spark: org.apache.spark.sql.SparkSession,
                     a: Column, b: Column,
                     normA: Column, normB: Column): Column =
    round(dotNative(spark, a, b) / (normA * normB), 6)

  /** Coarse-quantizer stride shared by the IVF / PQ / cell-blocked
    * dedup family: centroids are the vectors with `vec_id % stride == 0`.
    * stride = greatest(100, floor(sqrt(N))) — fixed ~100-vector cells in
    * the fixture regime (≤10⁴ vectors, bit-identical to the historical
    * fixed `% 100` quantizer there), √N cells beyond, so neither the
    * centroid-assignment cross product (N·cells) nor the per-cell
    * candidate work (N·cellSize) ever grows quadratically: both are
    * N^1.5, the single-level IVF optimum. A fixed stride makes the
    * centroid COUNT linear in the corpus and assignment cost N²/stride —
    * the cliff the sf1 headroom run exposed (SCALE.md). */
  def centroidStride(n: Long): Long =
    math.max(100L, math.floor(math.sqrt(n.toDouble)).toLong)

  /** DuckDB dual of [[centroidStride]]: the centroid CTE every oracle in
    * the family shares (expects a `v(vec_id, emb)` CTE upstream). */
  val centroidSqlCte: String =
    "cent AS (SELECT vec_id AS cid, emb AS cemb FROM v WHERE vec_id % " +
      "(SELECT greatest(100, CAST(floor(sqrt(count(*))) AS BIGINT)) FROM v) = 0)"

  /** Nearest-centroid assignment — the IVF-family entry point. The
    * centroid table is √N-bounded BY CONSTRUCTION (every caller builds
    * it with [[centroidStride]]), so it is collected once (limit-guarded
    * like every other driver collect in the engine) and the assignment
    * runs as ONE mapPartitions kernel over primitive arrays: each task
    * streams its vectors against the broadcast centroid matrix and
    * emits exactly one (id, cid [, sim_c] [, emb]) row — no joined row
    * is ever materialized. The relational max_by form this replaces
    * ([[assignNearestCellRelational]], retained as the parity reference
    * and the >maxCollectRows fallback) is a BroadcastNestedLoopJoin
    * that copies two embedding arrays per (point, centroid) pair before
    * the partial aggregate sees them — at sf1 that is 2.8M UnsafeRow
    * copies per assignment, the dominant super-linear term the sf1
    * campaign left in the IVF family (SCALE.md round 8).
    *
    * Decision parity with the relational form (SimilarityKernelSpec):
    * raw cosine folds left-to-right exactly like
    * CosineSimilarity.nullSafeEval, rounds to 6 dp with Spark round()'s
    * HALF_UP-on-decimal-string semantics, NaN orders greatest
    * (Double.compare — Spark's double ordering), ties break to the
    * lowest cid (ascending-cid scan, strict-improvement update), and a
    * length-mismatched centroid can only win when every centroid
    * mismatches (the relational null-orders-first rule; sim_c is null
    * on such a row). Returns (idCol, cid [, sim_c if carrySim]
    * [, embCol if carryEmbedding]). */
  def assignNearestCell(spark: org.apache.spark.sql.SparkSession,
                        points: DataFrame, idCol: String, embCol: String,
                        cent: DataFrame, carryEmbedding: Boolean = false,
                        carrySim: Boolean = false,
                        maxCollectRows: Long = 1000000L): DataFrame = {
    import spark.implicits._
    // a null-cid centroid is unaddressable (nothing can be assigned to
    // it) and would NPE the typed collect — drop it in BOTH paths so the
    // kernel and the relational fallback see the same dimension
    val cent2 = cent.where(col("cid").isNotNull)
    val collected: Array[(Long, Array[Float])] =
      cent2.select(col("cid").cast("long"), col("cemb"))
        .limit(math.min(maxCollectRows + 1, Int.MaxValue).toInt)
        .as[(Long, Array[Float])].collect()
    if (collected.length > maxCollectRows) {
      return assignNearestCellRelational(spark, points, idCol, embCol, cent2,
        carryEmbedding, carrySim)
    }
    val cents = collected.sortBy(_._1)
    val bc = spark.sparkContext.broadcast(cents)
    val assigned = points.select(col(idCol).cast("long"), col(embCol))
      .as[(Option[Long], Array[Float])] // Option: a dirty null id must make
      .mapPartitions { it =>            // an error row, not an encoder crash
        val cs = bc.value
        // Per-partition reusable buffers: RAW cosine per centroid plus a
        // validity mask (NaN is a REAL cosine value — zero-norm vectors —
        // so it cannot double as the "mismatched" sentinel).
        val raw = new Array[Double](cs.length)
        val okc = new Array[Boolean](cs.length)
        it.flatMap { case (id, v) =>
          var xmax = 0.0
          var found = false      // a real (length-matched) cosine seen
          var nullSeen = false   // any mismatched centroid seen
          var nullCid = 0L       // lowest mismatched cid (null-cos rule);
                                 // a boolean flag, NOT a -1 sentinel — a
                                 // sentinel would conflate "none seen"
                                 // with real negative centroid ids
          var i = 0
          while (i < cs.length) {
            val (cid, c) = cs(i)
            if (v == null || c == null || c.length != v.length) {
              okc(i) = false
              // a null or length-mismatched embedding (POINT or
              // CENTROID side) behaves like the relational null-cosine:
              // struct(ccos, -cid) orders null-first, so the lowest
              // mismatched cid wins with sim_c null. cs is cid-sorted
              // ascending, so the first mismatch IS the lowest.
              if (!nullSeen) { nullSeen = true; nullCid = cid }
            } else {
              var dot = 0.0; var nx = 0.0; var ny = 0.0
              var k = 0
              while (k < v.length) {
                val x = v(k).toDouble; val y = c(k).toDouble
                dot += x * y; nx += x * x; ny += y * y
                k += 1
              }
              val x = dot / (math.sqrt(nx) * math.sqrt(ny))
              raw(i) = x; okc(i) = true
              if (!found || java.lang.Double.compare(x, xmax) > 0) {
                found = true; xmax = x
              }
            }
            i += 1
          }
          // don't serialize the (large) embedding into every output row
          // unless a caller actually wants it back — column pruning can't
          // reach inside the lambda
          val emb = if (carryEmbedding) v else null
          if (found) {
            // Winner under the ROUNDED ordering, without rounding per
            // pair. roundN is monotone w.r.t. Double.compare's total
            // order (NaN→NaN greatest, ±Inf fixed, finite monotone, and
            // -0.0/0.0 both round to 0.0), so max(round(raw_i)) =
            // round(xmax) and the winner is the FIRST (lowest-cid,
            // ascending scan = the one-pass fold's strict-improvement
            // rule) index whose raw value rounds to it. Only values in
            // the raw max's 1e-6-wide rounding bucket can tie it, so
            // everything below xmax − 2e-6 (a NaN/Inf-safe guard: for
            // xmax NaN or +Inf the subtraction propagates and only an
            // equal raw passes compare ≥ 0) is skipped without the
            // BigDecimal.valueOf→setScale call — the per-PAIR rounding
            // (N·√N Double.toString parses) that dominated the sf3
            // assignment stage profile (SCALE.md round 12).
            val rmax = roundN(xmax, 6)
            val floor6 = xmax - 2e-6
            var bestCid = -1L
            var j = 0
            var done = false
            while (!done && j < cs.length) {
              if (okc(j) && java.lang.Double.compare(raw(j), floor6) >= 0 &&
                  java.lang.Double.compare(roundN(raw(j), 6), rmax) == 0) {
                bestCid = cs(j)._1; done = true
              }
              j += 1
            }
            Some((id, bestCid, Some(rmax), emb))
          }
          else if (nullSeen) Some((id, nullCid, None: Option[Double], emb))
          else None
        }
      }
      .toDF(idCol, "cid", "sim_c", embCol)
    val cols = Seq(col(idCol), col("cid")) ++
      (if (carrySim) Seq(col("sim_c")) else Nil) ++
      (if (carryEmbedding) Seq(col(embCol)) else Nil)
    assigned.select(cols: _*)
  }

  /** The declarative form of [[assignNearestCell]] — map-side max_by
    * over the centroid crossJoin (shuffle carries |points| rows, no
    * window sort). Retained as the kernel's decision-parity reference
    * and its oversized-centroid-table fallback. Tie-break
    * (max over struct(ccos, −cid)) is identical to the oracle window
    * form's ORDER BY ccos DESC, cid. */
  def assignNearestCellRelational(spark: org.apache.spark.sql.SparkSession,
                                  points: DataFrame, idCol: String, embCol: String,
                                  cent: DataFrame, carryEmbedding: Boolean = false,
                                  carrySim: Boolean = false): DataFrame = {
    val ccos = cosineNative6(spark, col(embCol), col("cemb"))
    // the winning row's ccos IS sim_c, so carrying it costs nothing extra.
    // Assignment is per-ROW: the group key is a per-row surrogate, not
    // idCol — grouping by idCol would collapse all null-id rows (and any
    // duplicate ids) into ONE output row while the kernel emits one row
    // per input row, so the two paths would disagree on cardinality on
    // exactly the dirty input the kernel's Option[Long] id tolerates.
    val payload = struct(
      Seq(col(idCol).as("pid"), col("cid")) ++
        (if (carrySim) Seq(ccos.as("sim_c")) else Nil) ++
        (if (carryEmbedding) Seq(col(embCol).as("emb")) else Nil): _*)
    val agg = points.withColumn("__rk", monotonically_increasing_id())
      .crossJoin(broadcast(cent))
      .select(col("__rk"), payload.as("p"), struct(ccos, negate(col("cid"))).as("o"))
      .groupBy(col("__rk"))
      .agg(max_by(col("p"), col("o")).as("best"))
    val outCols = Seq(col("best.pid").as(idCol), col("best.cid").as("cid")) ++
      (if (carrySim) Seq(col("best.sim_c").as("sim_c")) else Nil) ++
      (if (carryEmbedding) Seq(col("best.emb").as(embCol)) else Nil)
    agg.select(outCols: _*)
  }

  /** DuckDB dual of [[assignNearestCell]] in STREAMING form (expects
    * `v(vec_id, emb)` and `cent(cid, cemb)` CTEs upstream; emits
    * `assign(vec_id, cid, sim_c)`). The historical row_number form
    * sorted the N×cells cross join through a window — at sf10 (200k
    * vectors × 448 centroids = 89M rows) DuckDB spilled that sort past
    * the machine's disk. This form materializes the slim (vec_id, cid,
    * s) relation ONCE (~24 B/row: 2 GB at sf10) and replaces the window
    * with two streaming hash aggregates. Decision-identical in DuckDB
    * semantics: NaN = NaN is TRUE and NaN aggregates/orders greatest
    * (probed on 1.0.0), so max(s) is the window's DESC head and
    * min(cid) over the s = max rows is its cid tie-break; a NULL s
    * is the one divergence class — the join form would silently DROP an
    * all-NULL vector where the Spark kernel's nullSeen path keeps it
    * with sim_c NULL. Rather than leave that gate-blind (ADVICE r12),
    * the assumption fails LOUDLY: coalesce(s, error(...)) raises inside
    * the oracle the moment any fixture gains a null/dirty embedding
    * (coalesce short-circuits in DuckDB — probed on 1.0.0 — so clean
    * fixtures never evaluate the error branch). */
  val assignSqlCtes: String =
    """sims AS MATERIALIZED (
      |  SELECT v.vec_id, cent.cid,
      |    coalesce(round(list_cosine_similarity(v.emb, cent.cemb), 6),
      |             error('NULL cosine: assign group-by-max oracle would drop this vector; fixture gained a null/dirty embedding')) AS s
      |  FROM v CROSS JOIN cent),
      |assign AS (
      |  SELECT s.vec_id, min(s.cid) AS cid, max(s.s) AS sim_c
      |  FROM sims s
      |  JOIN (SELECT vec_id, max(s) AS ms FROM sims GROUP BY vec_id) m
      |    ON s.vec_id = m.vec_id AND s.s = m.ms
      |  GROUP BY s.vec_id)""".stripMargin

  /** Second-level cell split (two-level IVF): cells are capped at
    * [[cellCap]] members by banding each cell's members in
    * (sim_c, vec_id) order — row_number partitions by cid, so band
    * `⌊(pos−1)/cellCap⌋` is a deterministic sub-cell id and every
    * (cid, band) block holds AT MOST cellCap vectors. Per-block
    * quadratic work is therefore bounded by the CONSTANT cellCap², and
    * Σ blocks · cellCap² ≤ N·cellCap — the cell-blocked pair stage is
    * linear in the corpus instead of N^1.5 (the round-7 residual on
    * sim_knn_graph / dedup_semantic / dedup_embedding_blocked).
    * Geometrically the bands are similarity-to-centroid annuli: exact
    * and near duplicates have (near-)equal sim_c, so they land in the
    * same band except at a band boundary — the same bounded-recall
    * trade the cell blocking itself already makes, and the oracle
    * states the identical banding so the gate stays exact. */
  val cellCap = 128

  /** Spark-side banding: adds `pos` (1-based rank in the cell by
    * (sim_c, vec_id)) and `band` (= ⌊(pos−1)/cellCap⌋) to an
    * assignment that carries sim_c. */
  def bandCells(assign: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cid").orderBy(col("sim_c").asc, col("vec_id").asc)
    assign.withColumn("pos", row_number().over(w))
      .withColumn("band", floor((col("pos") - 1) / lit(cellCap.toDouble)))
  }

  /** DuckDB dual of [[bandCells]] (expects an `assign(vec_id, …, cid,
    * sim_c)` CTE upstream; emits every assign column plus pos, band). */
  val bandSqlCte: String =
    s"""banded AS (
       |  SELECT *, CAST(floor((pos - 1) / $cellCap.0) AS BIGINT) AS band FROM (
       |    SELECT *, row_number() OVER (PARTITION BY cid
       |      ORDER BY sim_c NULLS FIRST, vec_id) AS pos
       |    FROM assign) t)""".stripMargin
  // NULLS FIRST pins DuckDB to Spark's asc null ordering: a dirty row
  // (null/length-mismatched embedding) carries sim_c NULL by the
  // assignment contract, and DuckDB's ASC default is NULLS LAST — the
  // two duals would band such a row differently and the blocked-pair
  // candidate sets would silently diverge. With assignSqlCtes' error()
  // guard a NULL sim_c can no longer REACH this CTE through the
  // group-by-max assign (it raises upstream); NULLS FIRST stays for
  // callers that band an assignment produced by other CTEs.

  /** All-pairs raw cosine over a SMALL vector set as a broadcast-matrix
    * kernel — the scale-correct form of the brute-force baseline.
    *
    * The declarative self-join (`v.as("a").join(v.as("b"), id<id)`) is a
    * BroadcastNestedLoopJoin that MATERIALIZES every joined row — two
    * embedding arrays copied per pair (≈ 7.5 GB of UnsafeRow copies for
    * 5000 vectors at dim 64) before the cosine filter ever runs;
    * measured 3.6 s warm. This kernel broadcasts the collected matrix
    * once (n×dim floats — by definition the brute-force baseline only
    * applies when that fits; the IVF/blocked queries are the large-n
    * path), partitions the row ids, and emits ONLY pairs passing
    * `rawPrefilter` — 0 row copies, one narrow stage, ~0.3 s.
    *
    * The per-pair arithmetic is the same left-to-right double loop as
    * CosineSimilarity.nullSafeEval, so the emitted `raw_cos` is
    * bit-identical to the native expression's output; callers apply the
    * EXACT `round(raw_cos, 6) >= θ` predicate on the surviving pairs,
    * with `rawPrefilter` set safely below θ (θ − 1e-5) so rounding can
    * never resurrect a dropped pair — results match the declarative
    * form bit-for-bit (SimilarityKernelSpec + unchanged oracles).
    *
    * Guarded collect: ONE limit-guarded job decides the path AND
    * fetches the broadcast payload (the verifyCandidates pattern). An
    * input over `maxCollectRows` never reaches the driver — it routes
    * to the distributed BNLJ self-join over the native `graft_cosine`
    * expression (same left-to-right double loop → bit-identical
    * raw_cos; length-mismatched pairs yield null and are dropped by
    * the prefilter, matching the kernel's skip). Slower, but it cannot
    * OOM the driver on misuse. */
  def allPairsCosineLocal(df: DataFrame, idCol: String, vecCol: String,
                          rawPrefilter: Double,
                          maxCollectRows: Long = 1000000L,
                          maxCollectBytes: Long = 1L << 30): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // dirty-row guard (the file-wide kernel convention): a null id fails
    // the (Long, _) encoder at collect and a null vector NPEs in the
    // pair loop, while the distributed fallback below silently DROPS the
    // same rows (graft_cosine → null → prefilter) — behavior must not
    // flip from drop to crash on input size
    val clean = df.where(col(idCol).isNotNull && col(vecCol).isNotNull)
    // (rows, BYTES) decision, like TextOps.verifyCandidates: 1M vectors
    // at dim 4096 is ~16 GB — a row cap alone does not bound the
    // driver-side payload
    val rel = clean.select(col(idCol).cast("long"), col(vecCol))
    val dec = rel.agg(count(lit(1)),
      coalesce(sum(size(col(vecCol)).cast("long")), lit(0L))).collect().head
    val fits = dec.getLong(0) <= maxCollectRows &&
      dec.getLong(1) * 4L <= maxCollectBytes
    val collected: Array[(Long, Array[Float])] =
      if (!fits) Array.empty else rel.as[(Long, Array[Float])].collect()
    if (!fits) {
      val v = clean.select(col(idCol).cast("long").as("pid"), col(vecCol).as("pvec"))
      return v.as("a").join(v.as("b"), col("a.pid") < col("b.pid"))
        .select(col("a.pid").as("id1"), col("b.pid").as("id2"),
          call_function("graft_cosine", col("a.pvec"), col("b.pvec")).as("raw_cos"))
        .filter(col("raw_cos") >= rawPrefilter)
    }
    val rows = collected.sortBy(_._1)
    val bc = spark.sparkContext.broadcast(rows)
    spark.range(rows.length).repartition(spark.sparkContext.defaultParallelism)
      .as[Long]
      .mapPartitions { it =>
        val data = bc.value
        it.flatMap { i0 =>
          val i = i0.toInt
          val (id1, x) = data(i)
          (i + 1 until data.length).iterator.flatMap { j =>
            val (id2, y) = data(j)
            val n = x.length
            if (n != y.length) None
            else {
              var dot = 0.0; var nx = 0.0; var ny = 0.0
              var k = 0
              while (k < n) {
                val xk = x(k).toDouble; val yk = y(k).toDouble
                dot += xk * yk; nx += xk * xk; ny += yk * yk
                k += 1
              }
              val c = dot / (math.sqrt(nx) * math.sqrt(ny))
              // NaN (a zero-norm vector: 0/0) must pass, matching the
              // distributed fallback below — Spark's comparison treats
              // NaN as greater than every double, so `raw_cos >=
              // prefilter` KEEPS the pair there, while Java's `>=` is
              // false for NaN and would silently drop it here: the pair
              // set would flip on input size, the exact drop-vs-keep
              // flip this function's dirty-row contract forbids (and
              // the oracle, NaN-greatest like Spark, sides with keep)
              if (c >= rawPrefilter || c.isNaN) Some((id1, id2, c)) else None
            }
          }
        }
      }
      .toDF("id1", "id2", "raw_cos")
  }

  /** Deterministic SRP hyperplane component u(p,d) — the md5 affine
    * derivation shared verbatim with the DuckDB oracle of
    * sim_srp_hamming: first 15 hex digits of md5("srp_<p>_<d>") as a
    * 60-bit integer, scaled to [-1, 1). Both engines perform the same
    * long→double conversion and the same `/ 2^60 * 2 - 1` chain, so the
    * values are bit-identical. */
  def srpPlane(p: Int, d: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"srp_${p}_$d".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16).toDouble /
      1152921504606846976.0 * 2 - 1
  }

  /** Raw per-subspace squared-L2 distances to a broadcast codebook —
    * the encoding/lookup kernel of the PQ path (sim_pq_adc): for every
    * input vector and every (centroid, subspace) cell, one row
    * (id, cid, s, d2raw). A mapPartitions kernel over primitive arrays
    * (the HOF zip_with/aggregate form is interpreted and measured 5×+
    * slower); the codebook side is collected and broadcast — it is
    * broadcast-size by construction (a codebook that doesn't fit in
    * memory defeats PQ's purpose). d2 is emitted RAW; callers apply
    * Spark's round() before any argmin/sum, per the determinism
    * contract. Subspace s covers dims [s·(dims/nSub), (s+1)·(dims/nSub)). */
  def subspaceL2(df: DataFrame, idCol: String, vecCol: String,
                 cent: DataFrame, centIdCol: String, centVecCol: String,
                 nSub: Int): DataFrame =
    subspaceL2(df, idCol, vecCol, collectCodebook(cent, centIdCol, centVecCol), nSub)

  /** Collect a broadcast-size codebook once, for reuse across several
    * [[subspaceL2]] passes (e.g. the full-corpus encoding pass and the
    * query lookup-table pass of sim_pq_adc share one collect job). */
  def collectCodebook(cent: DataFrame, centIdCol: String,
                      centVecCol: String): Array[(Long, Array[Float])] = {
    val spark = cent.sparkSession
    import spark.implicits._
    cent.select(col(centIdCol).cast("long"), col(centVecCol))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
  }

  /** Fused PQ ENCODER: per (vector, subspace) emit only the assigned
    * code (id, s, cid) — the argmin over the codebook computed inside
    * the kernel, so the N×|codebook|×nSub distance relation NEVER
    * exists as rows (at corpus scale that relation is 64× the code
    * output; sim_pq_adc measured 2× wall time just encoding it through
    * the row pipeline at sf1). Decision parity with the relational
    * `groupBy.min(struct(round(d2,6), cid))` form: d2 is rounded to
    * 6 dp with the SAME HALF_UP-on-decimal-string semantics as Spark's
    * `round()` (java BigDecimal.valueOf = Double.toString, the exact
    * path Catalyst's Round takes for DoubleType), and ties break on the
    * smallest cid because the codebook array is scanned in ascending-cid
    * order with a strict `<` update. */
  def pqEncodeLocal(df: DataFrame, idCol: String, vecCol: String,
                    cents: Array[(Long, Array[Float])], nSub: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(cents)
    df.select(col(idCol).cast("long"), col(vecCol))
      // dirty rows (null id / null embedding) contribute no codes — like
      // the relational explode of a null array — instead of crashing the
      // encoder job on one corrupt row
      .where(col(idCol).isNotNull && col(vecCol).isNotNull)
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val cs = bc.value
        // reusable raw-distance buffer (two-pass rounding, see below);
        // each subspace's argmin fully consumes it before the next fills
        val raw = new Array[Double](cs.length)
        it.flatMap { case (id, v) =>
          require(v.length % nSub == 0,
            s"pqEncodeLocal: ${v.length} dims not divisible into $nSub subspaces")
          val dimsPer = v.length / nSub
          (0 until nSub).iterator.map { s =>
            // Pass 1: raw d2 + raw min under the original's primitive-<
            // rule (NaN and +Inf never win — NaN < x and Inf < MaxValue
            // are both false). Rounding is monotone, so the
            // argmin-of-rounded winner falls out of raw comparisons and
            // the N·nSub·|codebook| BigDecimal.valueOf calls (each a
            // Double.toString + parse) collapse to ~one per (point,
            // subspace) — the assignment-kernel two-pass (SCALE.md r12).
            var rawMin = Double.MaxValue
            var found = false
            var i = 0
            while (i < cs.length) {
              val c = cs(i)._2
              var d2 = 0.0
              var k = s * dimsPer
              val end = k + dimsPer
              while (k < end) {
                val t = v(k).toDouble - c(k).toDouble
                d2 += t * t
                k += 1
              }
              raw(i) = d2
              if (d2 < rawMin) { rawMin = d2; found = true }
              i += 1
            }
            // Pass 2: first (ascending-cid = the strict-< fold's tie
            // rule) candidate in the raw min's 1e-6 rounding bucket
            // whose d2 rounds to the rounded min.
            var bestCid = -1L
            if (found) {
              val rmin = java.math.BigDecimal.valueOf(rawMin)
                .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
              val ceil6 = rawMin + 2e-6
              var j = 0
              while (bestCid == -1L && j < cs.length) {
                if (raw(j) <= ceil6 && {
                  val rj = java.math.BigDecimal.valueOf(raw(j))
                    .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
                  rj == rmin
                }) bestCid = cs(j)._1
                j += 1
              }
            }
            (id, s, bestCid)
          }
        }
      }
      .toDF(idCol, "s", "cid")
  }

  /** [[subspaceL2]] over a pre-collected codebook. */
  def subspaceL2(df: DataFrame, idCol: String, vecCol: String,
                 cents: Array[(Long, Array[Float])], nSub: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(cents)
    df.select(col(idCol).cast("long"), col(vecCol))
      // dirty rows (null id / null embedding) contribute no distances —
      // like the relational explode of a null array — not a job crash
      .where(col(idCol).isNotNull && col(vecCol).isNotNull)
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val cs = bc.value
        it.flatMap { case (id, v) =>
          // fail fast: a remainder subspace would silently drop dims here
          // while an oracle bucketing by d/dimsPer would keep them
          require(v.length % nSub == 0,
            s"subspaceL2: ${v.length} dims not divisible into $nSub subspaces")
          val dimsPer = v.length / nSub
          cs.iterator.flatMap { case (cid, c) =>
            (0 until nSub).iterator.map { s =>
              var d2 = 0.0
              var k = s * dimsPer
              val end = k + dimsPer
              while (k < end) {
                val t = v(k).toDouble - c(k).toDouble
                d2 += t * t
                k += 1
              }
              (id, cid, s, d2)
            }
          }
        }
      }
      .toDF(idCol, "cid", "s", "d2raw")
  }

  /** Raw SRP projections: one row per vector, `dots[p]` = <v, u_p> for
    * nPlanes md5-derived hyperplanes. A mapPartitions kernel over
    * primitive arrays (the engine's per-row numeric-kernel pattern —
    * HOF lambdas are interpreted and an explode→join over the plane
    * relation shuffles |v|·dims·nPlanes rows; this touches each vector
    * once and emits nPlanes doubles). Dots are emitted RAW — callers
    * apply Spark's own round() before any sign/threshold decision, per
    * the cross-engine determinism contract. The plane matrix is built
    * lazily per partition (nPlanes×dims md5 calls, microseconds) so the
    * kernel needs no broadcast and adapts to the embedding width. */
  def srpDots(df: DataFrame, idCol: String, vecCol: String,
              nPlanes: Int = 60): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(vecCol))
      // null id / null embedding rows project nothing (relational explode
      // of null yields no rows) rather than NPE-ing the sketch job
      .where(col(idCol).isNotNull && col(vecCol).isNotNull)
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        var planes: Array[Array[Double]] = null
        // empty vectors produce NO row — the relational form (posexplode
        // of an empty array) and the oracle's unnest drop them the same way
        it.filter(_._2.length > 0).map { case (id, v) =>
          if (planes == null || planes(0).length != v.length)
            planes = Array.tabulate(nPlanes, v.length)(srpPlane)
          val dots = new Array[Double](nPlanes)
          var p = 0
          while (p < nPlanes) {
            val u = planes(p)
            var s = 0.0
            var d = 0
            while (d < v.length) { s += v(d).toDouble * u(d); d += 1 }
            dots(p) = s
            p += 1
          }
          (id, dots)
        }
      }
      .toDF(idCol, "dots")
  }

  /** Spark SQL round() semantics for doubles (decimal HALF_UP) — the
    * local kernels must round exactly as the relational pipeline does
    * or iteration inputs drift between the two paths. NaN/Inf pass
    * through exactly as Catalyst's Round does (BigDecimal.valueOf would
    * throw on them). */
  @inline private def roundN(x: Double, scale: Int): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(scale, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Nearest centroid (index, d2) under the relational sim_kmeans
    * pipeline's exact tie rules: index-order distance fold, round(6)
    * HALF_UP, argmin ties to the lower cid via Double.compare (an
    * object-level method so executor closures stay self-contained). */
  private def nearestCentroid(c: Array[(Long, Array[Double])],
                              v: Array[Double]): (Int, Double) = {
    if (c.length == 0) return (-1, 0.0)
    // Pass 1: RAW squared distances + raw min under Double.compare. The
    // BigDecimal rounding the relational parity demands is monotone in
    // that total order, so the argmin-of-rounded winner falls out of
    // raw comparisons (the assignment kernel's two-pass derivation,
    // which cut its sf10 stage 4.6x): only distances inside the raw
    // min's 1e-6 rounding bucket can tie it, so the k-per-point
    // BigDecimal.valueOf (a Double.toString + parse each) collapses to
    // ~one per point across every Lloyd iteration.
    val raw = new Array[Double](c.length)
    var xmin = 0.0
    var j = 0
    while (j < c.length) {
      val cj = c(j)._2
      var d = 0.0; var i = 0
      val n = math.min(v.length, cj.length)
      while (i < n) { val t = v(i) - cj(i); d += t * t; i += 1 }
      raw(j) = d
      if (j == 0 || java.lang.Double.compare(d, xmin) < 0) xmin = d
      j += 1
    }
    // Pass 2: first (lowest-index = the one-pass fold's strict-
    // improvement rule) candidate whose distance rounds to the rounded
    // min. xmin + 2e-6 is NaN/Inf-safe: NaN propagates and only a NaN
    // raw passes the == rmin check; +Inf admits only +Inf.
    val rmin = roundN(xmin, 6)
    val ceil6 = xmin + 2e-6
    j = 0
    while (j < c.length) {
      if (java.lang.Double.compare(raw(j), ceil6) <= 0 &&
          java.lang.Double.compare(roundN(raw(j), 6), rmin) == 0)
        return (j, rmin)
      j += 1
    }
    (0, rmin) // unreachable: the raw min itself always rounds to rmin
  }

  /** K-means (Lloyd) — the cluster-scale kernel behind the relational
    * `sim_kmeans` query. Centroids live on the driver (k×dim doubles:
    * tiny by definition), and each iteration fuses ASSIGN + UPDATE into
    * ONE mapPartitions pass that emits at most k partial
    * (cid, count, Σvec) rows per partition, collected straight to the
    * driver — no exploded (vec × dim) relation, no shuffle at all. At
    * 100 TB this moves k×dim×partitions doubles per round versus the
    * relational plan's per-dimension aggregate exchange.
    *
    * Arithmetic parity with the relational query (so the two paths are
    * interchangeable): distances fold in index order and round(6) with
    * Spark's HALF_UP decimal semantics, argmin ties break on the lower
    * cid (Double.compare — NaN-greatest like Spark's struct ordering),
    * centroid means round(6). SimilarityKernelSpec proves both paths
    * yield identical centroids and membership censuses.
    *
    * Returns (per-cluster (cid, n_members, inertia), final centroids);
    * inertia = round(Σ member d2, 3) as in the query. Clusters that
    * lose every member disappear, exactly as the relational groupBy
    * does. Init = the k lowest-id vectors (the query's init). */
  def kmeansLocal(df: DataFrame, idCol: String, embCol: String,
                  k: Int, iters: Int): (Array[(Long, Long, Double)], Array[(Long, Array[Double])]) = {
    val spark = df.sparkSession
    import spark.implicits._
    val pts = df
      .select(col(idCol).cast("long").as("id"),
        transform(col(embCol), x => x.cast("double")).as("v"))
      .as[(Long, Array[Double])]
    var cent: Array[(Long, Array[Double])] =
      pts.filter(_._1 < k).collect().sortBy(_._1)
    require(cent.nonEmpty, s"need at least one init vector with $idCol < $k")

    for (_ <- 1 to iters) {
      val bc = spark.sparkContext.broadcast(cent)
      val partials = pts.mapPartitions { it =>
        val c = bc.value
        val cnt = new Array[Long](c.length)
        var sums: Array[Array[Double]] = null
        it.foreach { case (_, v) =>
          if (sums == null) sums = Array.fill(c.length)(new Array[Double](v.length))
          val (j, _) = nearestCentroid(c, v)
          cnt(j) += 1
          // ragged input: accumulate the shared prefix, like
          // nearestCentroid's min-length distance — not an AIOOBE
          val s = sums(j); var i = 0
          val n = math.min(s.length, v.length)
          while (i < n) { s(i) += v(i); i += 1 }
        }
        if (sums == null) Iterator.empty
        else Iterator.range(0, c.length).filter(cnt(_) > 0)
          .map(j => (c(j)._1, cnt(j), sums(j)))
      }.collect()
      bc.destroy()
      // merge the ≤ k×partitions partials driver-side (tiny). dim is the
      // MIN over partials, not ps.head's length: each partition sizes its
      // sum arrays by its own first vector, so on ragged input head's
      // width is partition-order-dependent — indexing by it would AIOOBE
      // (or silently truncate) depending on which partial happens to
      // arrive first. min matches the shared-prefix accumulation above.
      cent = partials.groupBy(_._1).toArray.sortBy(_._1).map { case (cid, ps) =>
        val n = ps.map(_._2).sum
        val dim = ps.iterator.map(_._3.length).min
        val mean = Array.tabulate(dim) { i =>
          roundN(ps.map(_._3(i)).sum / n, 6)
        }
        cid -> mean
      }
    }

    val bc = spark.sparkContext.broadcast(cent)
    val census = pts.mapPartitions { it =>
      val c = bc.value
      val cnt = new Array[Long](c.length)
      val inertia = new Array[Double](c.length)
      it.foreach { case (_, v) =>
        val (j, d) = nearestCentroid(c, v)
        cnt(j) += 1; inertia(j) += d
      }
      Iterator.range(0, c.length).filter(cnt(_) > 0)
        .map(j => (c(j)._1, cnt(j), inertia(j)))
    }.collect()
    val rows = census.groupBy(_._1).toArray.sortBy(_._1).map { case (cid, ps) =>
      (cid, ps.map(_._2).sum, roundN(ps.map(_._3).sum, 3))
    }
    (rows, cent)
  }
}
