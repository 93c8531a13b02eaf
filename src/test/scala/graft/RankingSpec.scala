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
