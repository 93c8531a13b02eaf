package graft

import graft.ops.Ranking
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ops.Ranking — the two-phase histogram rank that replaces
  * corpus-spanning `row_number()/ntile()` windows. The invariant that
  * matters: offset + local rank must equal the global window row_number
  * EXACTLY, for every row, on data with duplicate values straddling
  * bucket boundaries, empty groups, and groups smaller than k. */
class RankingSpec extends SparkSpec {

  private def randomDf(seed: Long, n: Int) = {
    val r = new scala.util.Random(seed)
    import spark.implicits._
    // values quantized to .5 so duplicates are common and many rows
    // share the floor() bucket of a different-valued neighbor
    (1 to n).map(i => (i.toLong, math.floor(r.nextDouble() * 40) / 2.0,
        s"g${r.nextInt(3)}"))
      .toDF("id", "v", "grp")
  }

  test("groupedRank (global) equals window row_number on duplicate-heavy data") {
    val df = randomDf(7, 500)
    val got = Ranking.groupedRank(df, Seq.empty, col("v"),
        floor(col("v")).cast("long"), Seq("id"))
      .select("id", "rank", "grp_n")
    val w = Window.orderBy(col("v").asc, col("id").asc)
    val want = df.withColumn("rank", row_number().over(w))
      .withColumn("grp_n", count(lit(1)).over(Window.partitionBy()))
      .select("id", "rank", "grp_n")
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("groupedRank (grouped) equals per-group window row_number") {
    val df = randomDf(11, 400)
    val got = Ranking.groupedRank(df, Seq("grp"), col("v"),
        floor(col("v") * 4).cast("long"), Seq("id"))
      .select("id", "rank", "grp_n")
    val w = Window.partitionBy("grp").orderBy(col("v").asc, col("id").asc)
    val want = df.withColumn("rank", row_number().over(w))
      .withColumn("grp_n", count(lit(1)).over(Window.partitionBy("grp")))
      .select("id", "rank", "grp_n")
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("groupedRank ranks NULL values first, like window row_number — not drop them") {
    import spark.implicits._
    val df = Seq((1L, Some(2.0), "g0"), (2L, None, "g0"), (3L, Some(0.5), "g0"),
        (4L, None, "g1"), (5L, Some(1.0), "g1"))
      .toDF("id", "v", "grp")
    val got = Ranking.groupedRank(df, Seq("grp"), col("v"),
        floor(col("v")).cast("long"), Seq("id"))
      .select("id", "rank", "grp_n")
    val w = Window.partitionBy("grp").orderBy(col("v").asc, col("id").asc)
    val want = df.withColumn("rank", row_number().over(w))
      .withColumn("grp_n", count(lit(1)).over(Window.partitionBy("grp")))
      .select("id", "rank", "grp_n")
    assert(got.count() === 5, "null-valued rows must survive the rank")
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("ntileFromRank equals SQL ntile for sizes around the remainder edge") {
    import spark.implicits._
    for (n <- Seq(1, 2, 3, 9, 10, 11, 29); k <- Seq(3, 10)) {
      val df = (1 to n).map(_.toLong).toDF("id")
      val got = df.select(col("id"),
          Ranking.ntileFromRank(col("id"), lit(n.toLong), k).cast("int").as("b"))
      val want = df.select(col("id"),
        ntile(k).over(Window.orderBy("id")).as("b"))
      assert(got.except(want).isEmpty && want.except(got).isEmpty,
        s"ntile mismatch at n=$n k=$k")
    }
  }

  test("property: groupedRank equals window row_number across random values/ties/bucket widths") {
    // ScalaCheck-generated inputs (explicit sampling under fixed seeds —
    // the scalatest/scalacheck bridge isn't available offline, see
    // PropertiesSpec). Value domains are deliberately tiny so duplicate
    // values straddle bucket boundaries constantly, and bucket widths
    // sweep from finer-than-the-value-grid to one-bucket-holds-all —
    // the degenerate ends where an offset arithmetic bug would hide.
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    val cfg: Gen[(Int, Int, Int, Double, Boolean)] = for {
      n <- Gen.chooseNum(1, 240)          // includes single-row inputs
      nGroups <- Gen.chooseNum(1, 4)
      domain <- Gen.oneOf(3, 7, 40)       // distinct-value count → tie density
      width <- Gen.oneOf(0.25, 0.5, 1.0, 3.0, 1e6) // 1e6 → one global bucket
      negate <- Gen.oneOf(true, false)    // negative values cross floor()'s sign kink
    } yield (n, nGroups, domain, width, negate)
    val configs = (0 until 12).flatMap(i =>
      cfg.apply(Gen.Parameters.default, Seed(1000L + i)))
    assert(configs.size >= 10)
    configs.foreach { case (n, nGroups, domain, width, negate) =>
      val r = new scala.util.Random(n * 31 + domain)
      val sign = if (negate) -1.0 else 1.0
      val df = (1 to n).map(i => (i.toLong,
          sign * math.floor(r.nextDouble() * domain) / 2.0,
          s"g${r.nextInt(nGroups)}"))
        .toDF("id", "v", "grp")
      val got = Ranking.groupedRank(df, Seq("grp"), col("v"),
          floor(col("v") / width).cast("long"), Seq("id"))
        .select("id", "rank", "grp_n").collect()
        .map(x => (x.getLong(0), x.getLong(2), x.getLong(1))).sorted
      val w = Window.partitionBy("grp").orderBy(col("v").asc, col("id").asc)
      val want = df.withColumn("rank", row_number().over(w))
        .withColumn("grp_n", count(lit(1)).over(Window.partitionBy("grp")))
        .select("id", "rank", "grp_n").collect()
        .map(x => (x.getLong(0), x.getLong(2), x.getInt(1).toLong)).sorted
      assert(got.toSeq == want.toSeq,
        s"mismatch at n=$n nGroups=$nGroups domain=$domain width=$width negate=$negate")
    }
  }

  test("histDf contract detector: a violating caller fails loudly under " +
      "-Dgraft.ranking.checkHist=1 (ADVICE r14 #4)") {
    val base = randomDf(17, 200)
    val filtered = base.where(col("v") > 5.0) // different row multiset
    val prev = sys.props.put("graft.ranking.checkHist", "1")
    try {
      // conforming caller (df only adds columns to histDf rows): passes
      Ranking.groupedRank(base.withColumn("extra", lit(1)), Seq("grp"),
        col("v"), floor(col("v")).cast("long"), Seq("id"),
        histDf = base).count()
      // violating caller (df filtered after the base was pinned): throws
      val ex = intercept[IllegalArgumentException] {
        Ranking.groupedRank(filtered, Seq("grp"), col("v"),
          floor(col("v")).cast("long"), Seq("id"), histDf = base).count()
      }
      assert(ex.getMessage.contains("histDf contract violated"))
    } finally {
      prev match {
        case Some(v) => sys.props.put("graft.ranking.checkHist", v)
        case None => sys.props.remove("graft.ranking.checkHist")
      }
    }
  }

  test("groupedRank plan: no unpartitioned window, offsets broadcast") {
    val df = randomDf(13, 100)
    val plan = Ranking.groupedRank(df, Seq("grp"), col("v"),
        floor(col("v")).cast("long"), Seq("id"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), "rank must never run unpartitioned")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      "histogram offsets must join broadcast")
  }
}
