package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global ranking — the 100 TB replacement for
  * `row_number() OVER ([PARTITION BY few-valued-key] ORDER BY value)`,
  * whose partitions each span a corpus-sized slice and therefore sort it
  * in ONE task. The two-phase shape:
  *
  *   1. histogram the rows on a coarse, order-preserving VALUE bucket
  *      (floor, fixed-point truncation, …) — the histogram is bounded by
  *      the value DOMAIN, not the row count;
  *   2. turn the tiny histogram into per-(group, bucket) rank offsets
  *      and per-group totals with broadcast self-joins of the histogram
  *      (NO window — a windowed cumulative sum would itself run
  *      unpartitioned for a global rank);
  *   3. rank rows locally inside (group, bucket) — a PARTITIONED window,
  *      every task sorts only its bucket — and add the offset.
  *
  * offset + local rank IS the global row_number because the bucket order
  * is consistent with the (value, ties…) total order. `q_ntile_deciles`
  * and `text_perplexity_buckets` both declare this shape.
  */
object Ranking {

  /** Adds `rankCol` (1-based global row_number within each group under
    * (value ASC, tieCols… ASC)) and `nCol` (group row count).
    *
    * `bucket` must be monotone non-decreasing in `value` over the input
    * (e.g. `floor(value)`, `floor(value * 100)`); ties inside a bucket
    * are resolved by the partitioned window's full ordering. `groupCols`
    * may be empty (one global ranking). The histogram (distinct
    * (group, bucket) pairs) must be broadcast-small — that is the
    * premise of histogram ranking.
    */
  def groupedRank(df: DataFrame, groupCols: Seq[String], value: Column,
                  bucket: Column, tieCols: Seq[String],
                  rankCol: String = "rank", nCol: String = "grp_n"): DataFrame = {
    val gk = if (groupCols.isEmpty) lit(0L) else struct(groupCols.map(col): _*)
    val withB = df.withColumn("__g", gk).withColumn("__b", bucket)
    val hist = withB.groupBy("__g", "__b").agg(count(lit(1)).as("__cnt"))

    // per-(group, bucket) offset = Σ counts of strictly smaller buckets
    // in the same group; per-group totals. Broadcast self-join of the
    // domain-bounded histogram — windowless, so an empty `groupCols`
    // never degenerates into an unpartitioned WindowExec.
    val b2 = hist.select(col("__g").as("__g2"), col("__b").as("__b2"),
      col("__cnt").as("__cnt2"))
    // NULL buckets (null value) rank FIRST, like row_number's ASC
    // nulls-first: "strictly smaller" must count a null bucket below
    // every non-null one, and the row join must match null to null —
    // a plain EqualTo would silently DROP every null-valued row
    val smaller = (col("__b2").isNull && col("__b").isNotNull) ||
      (col("__b2") < col("__b"))
    val offs = hist
      .join(broadcast(b2), col("__g2") === col("__g") && smaller, "left")
      .groupBy(col("__g"), col("__b"))
      .agg(coalesce(sum(col("__cnt2")), lit(0L)).as("__off"))
    val totals = hist.groupBy("__g").agg(sum("__cnt").as(nCol))

    val wLocal = Window.partitionBy(col("__g"), col("__b"))
      .orderBy(value.asc +: tieCols.map(c => col(c).asc): _*)
    val offsR = offs.select(col("__g").as("__go"), col("__b").as("__bo"),
      col("__off"))
    withB
      .join(broadcast(offsR),
        col("__g") === col("__go") && col("__b") <=> col("__bo"))
      .join(broadcast(totals), Seq("__g"))
      .withColumn(rankCol, col("__off") + row_number().over(wLocal))
      .drop("__g", "__b", "__go", "__bo", "__off")
  }

  /** SQL `ntile(k)` from a 1-based global rank and the group size n:
    * the first n % k buckets take ⌈n/k⌉ rows, the rest ⌊n/k⌋ — the exact
    * ANSI remainder-spread definition, as closed-form arithmetic. */
  def ntileFromRank(rank: Column, n: Column, k: Int): Column = {
    val q = (n / k).cast("long")
    val rem = n % k
    val hi = (q + lit(1L)) * rem // ranks 1..hi fill the larger buckets
    when(rank <= hi, ceil(rank / (q + lit(1L)).cast("double")))
      .otherwise(rem + ceil((rank - hi) / q.cast("double")))
  }
}
