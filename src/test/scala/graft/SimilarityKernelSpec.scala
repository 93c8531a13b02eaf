package graft

import graft.ops.{SimilarityOps, TextOps}
import org.apache.spark.sql.functions._

/** Broadcast all-pairs kernels must be bit-identical to the declarative
  * self-join forms they replace (same doubles, same rounding, same
  * integers) — the queries swapped implementations without touching
  * their DuckDB oracles. */
class SimilarityKernelSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("allPairsCosineLocal + exact rounded predicate == declarative BNLJ self-join") {
    val v = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val declarative = v.as("a").join(v.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id1"), col("b.vec_id").as("id2"),
        SimilarityOps.cosineNative6(spark,
          col("a.embedding"), col("b.embedding")).as("cosine"))
      .filter(col("cosine") >= 0.45)
      .orderBy("id1", "id2").collect().toSeq
    val kernel = SimilarityOps.allPairsCosineLocal(v, "vec_id", "embedding", 0.45 - 1e-5)
      .select(col("id1"), col("id2"), round(col("raw_cos"), 6).as("cosine"))
      .filter(col("cosine") >= 0.45)
      .orderBy("id1", "id2").collect().toSeq
    assert(kernel.nonEmpty)
    assert(kernel === declarative)
  }

  test("allPairsLevenshteinLocal == declarative levenshtein self-join") {
    val s = Tables.supplier(spark, sf).select(col("s_suppkey"), col("s_name"))
    val declarative = s.as("a").join(s.as("b"), col("a.s_suppkey") < col("b.s_suppkey"))
      .select(col("a.s_suppkey").as("id1"), col("b.s_suppkey").as("id2"),
        levenshtein(col("a.s_name"), col("b.s_name")).as("dist"))
      .filter(col("dist") <= 3)
      .orderBy("id1", "id2").collect().toSeq
    val kernel = TextOps.allPairsLevenshteinLocal(s, "s_suppkey", "s_name", 3)
      .orderBy("id1", "id2").collect().toSeq
    assert(kernel.nonEmpty)
    assert(kernel === declarative)
  }

  test("allPairsCosineLocal over-limit input routes to the distributed join, same rows") {
    val v = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val local = SimilarityOps.allPairsCosineLocal(v, "vec_id", "embedding", 0.45 - 1e-5)
      .select(col("id1"), col("id2"), round(col("raw_cos"), 6).as("cosine"))
      .orderBy("id1", "id2").collect().toSeq
    // maxCollectRows=5 forces the guard: the full input must never be
    // collected — the kernel degrades to the distributed self-join
    val guarded = SimilarityOps.allPairsCosineLocal(
        v, "vec_id", "embedding", 0.45 - 1e-5, maxCollectRows = 5L)
      .select(col("id1"), col("id2"), round(col("raw_cos"), 6).as("cosine"))
      .orderBy("id1", "id2").collect().toSeq
    assert(guarded.nonEmpty)
    assert(guarded === local)
  }

  test("allPairsCosineLocal: a zero-norm vector (NaN cosine) yields the " +
      "SAME pair set on both paths — kernel must not drop what the " +
      "distributed join keeps") {
    import spark.implicits._
    val v = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.0f, 0.0f)) // zero norm: cosine = 0/0 = NaN vs anyone
    ).toDF("vec_id", "embedding")
    def pairs(maxRows: Long) = SimilarityOps
      .allPairsCosineLocal(v, "vec_id", "embedding", 0.45, maxRows)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sorted.toSeq
    val kernel = pairs(1000000L)
    val fallback = pairs(1L) // force the distributed join
    assert(kernel === fallback, "pair set flipped between paths")
    // Spark/oracle semantics: NaN is greater than any threshold → the
    // zero-norm vector's pairs are KEPT on both paths
    assert(kernel.contains((1L, 3L)) && kernel.contains((2L, 3L)),
      s"NaN pairs must survive the prefilter, got $kernel")
  }

  test("allPairsLevenshteinLocal over-limit input routes to the distributed join, same rows") {
    val s = Tables.supplier(spark, sf).select(col("s_suppkey"), col("s_name"))
    val local = TextOps.allPairsLevenshteinLocal(s, "s_suppkey", "s_name", 3)
      .orderBy("id1", "id2").collect().toSeq
    val guarded = TextOps.allPairsLevenshteinLocal(
        s, "s_suppkey", "s_name", 3, maxCollectRows = 5L)
      .orderBy("id1", "id2").collect().toSeq
    assert(guarded.nonEmpty)
    assert(guarded === local)
  }

  test("assignNearestCell kernel == relational max_by form (fixture corpus)") {
    val v = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val stride = SimilarityOps.centroidStride(v.count())
    val cent = v.filter(col("vec_id") % stride === 0)
      .select(col("vec_id").as("cid"), col("embedding").as("cemb"))
    val kernel = SimilarityOps
      .assignNearestCell(spark, v, "vec_id", "embedding", cent)
      .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val relational = SimilarityOps
      .assignNearestCellRelational(spark, v, "vec_id", "embedding", cent)
      .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(kernel.nonEmpty)
    assert(kernel === relational)
  }

  test("assignNearestCell over-limit centroids route to the relational " +
      "fallback, carrySim intact") {
    val v = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val stride = SimilarityOps.centroidStride(v.count())
    val cent = v.filter(col("vec_id") % stride === 0)
      .select(col("vec_id").as("cid"), col("embedding").as("cemb"))
    val kernel = SimilarityOps
      .assignNearestCell(spark, v, "vec_id", "embedding", cent, carrySim = true)
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // maxCollectRows=3 forces the fallback — every IVF-family caller
    // passes carrySim=true, so the 100 TB degrade path must carry it too
    val guarded = SimilarityOps
      .assignNearestCell(spark, v, "vec_id", "embedding", cent,
        carrySim = true, maxCollectRows = 3L)
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(guarded.nonEmpty)
    assert(guarded === kernel)
  }

  test("assignNearestCell: a null embedding makes a null-sim row, not a crash") {
    import spark.implicits._
    val cent = Seq((7L, Array(1f, 0f)), (3L, Array(0f, 1f))).toDF("cid", "cemb")
    val pts = Seq((1L, Array(2f, 1f)), (2L, null.asInstanceOf[Array[Float]]))
      .toDF("vec_id", "embedding")
    val got = SimilarityOps
      .assignNearestCell(spark, pts, "vec_id", "embedding", cent, carrySim = true)
      .orderBy("vec_id").collect()
    assert(got.length === 2)
    // the dirty row behaves like the relational all-mismatch rule:
    // lowest cid wins, sim_c null
    assert(got(1).getLong(1) === 3L && got(1).isNullAt(2))
    assert(!got(0).isNullAt(2))
  }

  test("assignNearestCell survives a NULL centroid embedding and negative cids, " +
      "kernel == relational") {
    import spark.implicits._
    // a null centroid embedding must behave like an all-mismatch
    // centroid (not NPE the kernel), and NEGATIVE cids must not be
    // confused with the old -1 'none seen' sentinel: the all-mismatch
    // point below must emit with the LOWEST cid (-9), not vanish
    val cent = Seq(
      (-9L, Array(1f, 0f)), (-3L, null.asInstanceOf[Array[Float]]),
      (4L, Array(0f, 1f)))
      .toDF("cid", "cemb")
    val pts = Seq(
      (1L, Array(2f, 1f)),          // matches the non-null centroids
      (2L, Array(1f, 2f, 3f)))      // length-mismatches EVERYTHING
      .toDF("vec_id", "embedding")
    def census(df: org.apache.spark.sql.DataFrame) = df
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.isNullAt(2))).toSeq
    val kernel = census(SimilarityOps
      .assignNearestCell(spark, pts, "vec_id", "embedding", cent, carrySim = true))
    val relational = census(SimilarityOps
      .assignNearestCellRelational(spark, pts, "vec_id", "embedding", cent,
        carrySim = true))
    assert(kernel.length === 2, "the all-mismatch row must not vanish")
    assert(kernel(1) === ((2L, -9L, true)),
      "all-mismatch assigns the LOWEST cid with null sim")
    assert(kernel === relational)
  }

  test("assignNearestCell kernel and relational fallback agree on dirty input " +
      "(null ids, duplicate ids): one output row per input row") {
    import spark.implicits._
    val cent = Seq((7L, Array(1f, 0f)), (3L, Array(0f, 1f))).toDF("cid", "cemb")
    // two null-id rows with DIFFERENT embeddings plus a duplicated id —
    // a groupBy(idCol) fallback would collapse them (1 row per key);
    // per-row assignment must emit all 4
    val pts = Seq(
      (Some(1L), Array(2f, 1f)), (None, Array(1f, 0f)),
      (None, Array(0f, 1f)), (Some(1L), Array(0f, 3f)))
      .toDF("vec_id", "embedding")
    def census(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0), r.getLong(1)))
      .sorted.toSeq
    val kernel = census(SimilarityOps
      .assignNearestCell(spark, pts, "vec_id", "embedding", cent))
    val relational = census(SimilarityOps
      .assignNearestCellRelational(spark, pts, "vec_id", "embedding", cent))
    assert(kernel.length === 4, "kernel must emit one row per input row")
    assert(kernel === relational,
      "fallback path must match the kernel's per-row cardinality on dirty input")
  }

  test("assignNearestCell ties break to the lowest cid; sim_c is round(cos,6)") {
    import spark.implicits._
    // centroids 7 and 3 are IDENTICAL vectors → every point ties on
    // cosine and must assign to cid 3 (lowest), exactly like the
    // relational max(struct(ccos, -cid))
    val cent = Seq(
      (7L, Array(1f, 0f, 0f)), (3L, Array(1f, 0f, 0f)), (9L, Array(0f, 1f, 0f)))
      .toDF("cid", "cemb")
    val pts = Seq(
      (1L, Array(2f, 0.1f, 0f)), (2L, Array(0.1f, 2f, 0f)), (3L, Array(1f, 1f, 1f)))
      .toDF("vec_id", "embedding")
    val got = SimilarityOps
      .assignNearestCell(spark, pts, "vec_id", "embedding", cent, carrySim = true)
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val rel = SimilarityOps
      .assignNearestCellRelational(spark, pts, "vec_id", "embedding", cent)
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got.map(t => (t._1, t._2)) === rel)
    assert(got.head._2 === 3L, "tie must break to the lowest cid")
    // sim_c must be the 6-dp rounded cosine the relational side computes
    val expSim = pts.crossJoin(cent.filter(col("cid") === 3))
      .filter(col("vec_id") === 1)
      .select(SimilarityOps.cosineNative6(spark, col("embedding"), col("cemb")))
      .head().getDouble(0)
    assert(got.head._3 === expSim)
  }

  test("bandCells caps every (cid, band) block at cellCap members") {
    val v = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val stride = SimilarityOps.centroidStride(v.count())
    val cent = v.filter(col("vec_id") % stride === 0)
      .select(col("vec_id").as("cid"), col("embedding").as("cemb"))
    val banded = SimilarityOps.bandCells(SimilarityOps
      .assignNearestCell(spark, v, "vec_id", "embedding", cent, carrySim = true))
    val sizes = banded.groupBy("cid", "band").count().collect()
    assert(sizes.nonEmpty)
    assert(sizes.forall(_.getLong(2) <= SimilarityOps.cellCap),
      "a (cid, band) block exceeded cellCap")
    // banding must not lose or duplicate vectors
    assert(banded.count() === v.count())
    // the fixture's cells (≈100-member average with skew) must actually
    // exercise a split somewhere across the SFs this spec sees — if not,
    // the band column is inert and the cap claim untested
    val nBands = banded.select("cid", "band").distinct().count()
    val nCells = banded.select("cid").distinct().count()
    assert(nBands >= nCells)
  }

  test("kmeansLocal (fused mapPartitions rounds) == relational sim_kmeans census") {
    val relational = SparkEntry.queries("sim_kmeans")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val (census, cent) = SimilarityOps.kmeansLocal(
      Tables.embeddings(spark, sf), "vec_id", "embedding", k = 4, iters = 2)
    // memberships/counts must match EXACTLY; inertia is compared within
    // an epsilon because the two paths merge partial sums in different
    // orders (driver-side fold vs Spark's agg), and the shared round(3)
    // contract only masks that reassociation drift away from the .0005
    // boundary — exact Double === could flip on a boundary-adjacent sum
    // under a different partition count or JVM
    assert(census.map(c => (c._1, c._2)).toSeq === relational.map(r => (r._1, r._2)),
      "fused kernel membership census diverged from the relational pipeline")
    census.zip(relational).foreach { case ((cid, _, ik), (_, _, ir)) =>
      assert(math.abs(ik - ir) <= 1e-3 + 1e-9,
        s"cluster $cid inertia: kernel $ik vs relational $ir")
    }
    // centroid parity too: replay the relational update chain's final
    // centroids and compare the rounded coordinates
    assert(cent.length == relational.length)
    cent.foreach { case (_, m) => assert(m.length == 64) }
    // iterating further never grows inertia on this fixture (Lloyd
    // monotonicity holds when assignments use the same rounded metric)
    val (census3, _) = SimilarityOps.kmeansLocal(
      Tables.embeddings(spark, sf), "vec_id", "embedding", k = 4, iters = 3)
    assert(census3.map(_._3).sum <= census.map(_._3).sum + 1e-6,
      "inertia increased after an extra Lloyd iteration")
  }
}
