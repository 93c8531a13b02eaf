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
    *
    * `histDf` (default `df`) is the relation the histogram aggregates
    * over; pass the PINNED base when chaining several ranks over the
    * same rows (q_rfm_segments) so each rank's histogram subtree reads
    * the checkpoint instead of re-executing every earlier rank's
    * window — that multi-consumer blowup is what previously forced a
    * localCheckpoint barrier between chained ranks. The caller must
    * guarantee histDf has the same (groupCols, bucket-value) row
    * multiset as df — true whenever df only ADDS columns to histDf rows.
    */
  def groupedRank(df: DataFrame, groupCols: Seq[String], value: Column,
                  bucket: Column, tieCols: Seq[String],
                  rankCol: String = "rank", nCol: String = "grp_n",
                  histDf: DataFrame = null): DataFrame = {
    val gk = if (groupCols.isEmpty) lit(0L) else struct(groupCols.map(col): _*)
    val withB = df.withColumn("__g", gk).withColumn("__b", bucket)
    val histSrc = Option(histDf).getOrElse(df)
    val hist = histSrc.withColumn("__g", gk).withColumn("__b", bucket)
      .groupBy("__g", "__b").agg(count(lit(1)).as("__cnt"))
    // opt-in misuse detector (ADVICE r14 #4): the histDf contract — same
    // (group, bucket) row MULTISET as df — is correctness-critical but
    // invisible at runtime (offsets over rows not in df silently corrupt
    // every rank). Under -Dgraft.ranking.checkHist=1 (test suites only;
    // it runs an action inside the builder) a violating caller fails
    // loudly instead.
    if ((histSrc ne df) &&
        sys.props.get("graft.ranking.checkHist").contains("1")) {
      val dfHist = withB.groupBy("__g", "__b").agg(count(lit(1)).as("__dcnt"))
      val bad = dfHist.join(hist, dfHist("__g") <=> hist("__g") &&
          dfHist("__b") <=> hist("__b"), "full")
        .where(coalesce(col("__dcnt"), lit(-1L)) =!=
          coalesce(col("__cnt"), lit(-2L)))
        .count()
      require(bad == 0L,
        s"groupedRank histDf contract violated: $bad (group, bucket) " +
          "cells differ between df and histDf — histDf must have the " +
          "same (groupCols, bucket) row multiset as df")
    }

    // per-(group, bucket) offset = Σ counts of strictly smaller buckets
    // in the same group, via a PREFIX-SUM WINDOW over the histogram —
    // O(k log k) in the bucket count where the previous broadcast
    // self-join with a `<` predicate planned as a nested-loop O(k²)
    // pass (measured 1.05 s in ONE task for q_ntile_deciles' 8185
    // buckets, r14). The window partitions on __g, so it is never the
    // unpartitioned-WindowExec shape the plan sweep forbids, and it
    // runs over the DOMAIN-BOUNDED histogram (broadcast-small by this
    // function's premise), never over corpus rows. asc_nulls_first
    // keeps row_number's null ordering: a NULL bucket (null value)
    // counts below every non-null one.
    val wOff = Window.partitionBy(col("__g"))
      .orderBy(col("__b").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = hist
      .withColumn("__off", coalesce(sum(col("__cnt")).over(wOff), lit(0L)))
      .select(col("__g"), col("__b"), col("__off"))
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
