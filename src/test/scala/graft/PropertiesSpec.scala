package graft

import graft.ops.TextOps
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck-generated property tests (SURVEY.md §5.3). The scalatest/
  * scalacheck bridge artifact isn't available offline, so generators are
  * sampled explicitly under fixed seeds — same coverage, deterministic. */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic samples from a generator. */
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private lazy val vocab = Vocab.fromJson(spark,
    """{"0": {"tag": "safe", "category": "rating"},
      | "1": {"tag": "nsfw", "category": "rating"},
      | "2": {"tag": "good", "category": "quality"},
      | "3": {"tag": "hair", "category": "general"},
      | "4": {"tag": "sky", "category": "general"},
      | "5": {"tag": "alice", "category": "character"}}""".stripMargin)

  private val logitsGen: Gen[List[Double]] =
    Gen.listOfN(6, Gen.chooseNum(-40.0, 40.0))

  test("property: sigmoid bounded in (0,1) across extreme logits") {
    val xs = samples(Gen.chooseNum(-200.0, 200.0), 40)
    val ps = xs.toDF("x").select(Tagging.clippedSigmoid(col("x")).as("p"))
      .collect().map(_.getDouble(0))
    assert(ps.forall(p => p > 0.0 && p < 1.0))
  }

  test("property: raising thresholds never adds tags (monotonicity)") {
    for (logits <- samples(logitsGen, 8)) {
      val scores = Seq((1L, logits)).toDF("image_id", "logits")
      def tagsAt(t: Double): Set[String] =
        Tagging.pipeline(scores, vocab, t, t).collect().head.getString(1)
          .split(", ").filter(_.nonEmpty).toSet
      val loose = tagsAt(0.45)
      val strict = tagsAt(0.65)
      assert(strict.subsetOf(loose), s"logits=$logits")
    }
  }

  test("property: tag output invariant to input row order") {
    for (vs <- samples(Gen.listOfN(4, logitsGen), 4)) {
      val rows = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      def run(rs: Seq[(Long, List[Double])]) =
        Tagging.pipeline(rs.toDF("image_id", "logits"), vocab)
          .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(run(rows) === run(rows.reverse))
    }
  }

  test("property: exact dedup idempotent") {
    for (texts <- samples(Gen.listOfN(30,
        Gen.oneOf("a b c", "x y z", "q w e")), 4)) {
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "text")
      val once = df.dropDuplicates("text")
      assert(once.dropDuplicates("text").count() === once.count())
    }
  }

  test("property: jaccard pairs bounded in (0,1], canonical id1<id2") {
    for (docs <- samples(Gen.listOfN(6,
        Gen.listOfN(8, Gen.oneOf("w1", "w2", "w3", "w4", "w5"))), 4)) {
      val df = docs.zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      val pairs = TextOps.jaccardPairs(
        TextOps.shingles(df, "doc_id", "text", 2), "doc_id").collect()
      pairs.foreach { r =>
        val j = r.getAs[Double]("jaccard")
        assert(j > 0.0 && j <= 1.0)
        assert(r.getAs[Long]("id1") < r.getAs[Long]("id2"))
      }
    }
  }

  test("row-local kernels ≡ declarative forms: simhash + minhash signatures on real docs") {
    // the scale-path kernels must reproduce the exact md5-derived
    // integers of the explode/groupBy forms on the fixture corpus
    // (including multi-space/empty-token edge cases in real text)
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val simDecl = TextOps.simhash(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val simLocal = TextOps.simhashLocal(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(simLocal === simDecl)
    val mhDecl = TextOps.minhashSignatures(
      TextOps.shingles(docs, "doc_id", "text", 3), "doc_id", 16)
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val mhLocal = TextOps.minhashSignaturesLocal(docs, "doc_id", "text", 3, 16)
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(mhLocal === mhDecl)
    // the hashed-shingle kernel == declarative shingles ∘ md5Long
    val shDecl = TextOps.shingles(docs, "doc_id", "text", 3)
      .select(col("doc_id"), TextOps.md5Long(col("shingle")).as("shingle"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val shLocal = TextOps.shinglesHashedLocal(docs, "doc_id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(shLocal === shDecl)
    // and the kernels shuffle nothing
    val plan = TextOps.simhashLocal(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("property: identical texts get identical minhash signatures") {
    for (texts <- samples(Gen.listOfN(6,
        Gen.oneOf("p q r s t", "s t u v w", "m n o p q")), 4)) {
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val sig = TextOps.minhashSignatures(
        TextOps.shingles(df, "doc_id", "text", 3), "doc_id", 8)
        .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
      for {
        (ti, i) <- texts.zipWithIndex
        (tj, j) <- texts.zipWithIndex if i < j && ti == tj
      } assert(sig(i.toLong) === sig(j.toLong))
    }
  }
}
