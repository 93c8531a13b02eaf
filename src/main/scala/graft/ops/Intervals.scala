package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval×interval overlap join compiled to an equi-join — the
  * both-sides-fact-sized case that a theta-join (BroadcastNestedLoop)
  * cannot survive at scale.
  *
  * Technique (the "bin ownership" form of the classic interval-bin
  * compilation, cf. the point-in-range variant in q_range_bin_join):
  * every half-open interval [s, e) explodes onto the fixed-width bins it
  * touches (⌈len/W⌉+1 rows at most), the join runs hash-partitioned on
  * (key, bin), and the duplicate problem — a pair overlapping across
  * several shared bins would match once per bin — is eliminated WITHOUT
  * a distinct: a pair is counted only in the bin that contains the LATER
  * interval's start. Overlap (s1 < e2 ∧ s2 < e1) guarantees the earlier
  * interval also covers that day, so exactly one joined bin row
  * satisfies `bin = greatest(startBin(a), startBin(b))` — for ANY
  * interval lengths, any bin width (PropertiesSpec fuzzes both).
  *
  * At 100 TB: one exchange keyed (key, bin); per-bin work is quadratic
  * only in genuine co-residency, and W trades row expansion
  * (intervals/bin) against join selectivity. */
object Intervals {

  /** All overlapping same-key pairs (idA < idB) of half-open intervals.
    * Input columns: key, id, s, e (e exclusive, s < e). Output:
    * (key, id1, id2).
    *
    * Long-span safety: an interval spanning more than
    * `maxBinsPerInterval` bins does NOT ride the explode — a single
    * open-ended sentinel row (e = Long.MaxValue, the SCD "current"
    * idiom) would otherwise expand to ~10¹⁴ sequence() elements and
    * kill the whole job, the exact one-dirty-row failure the
    * zero-length filter below exists to prevent. Such intervals are
    * rare by construction (they span > cap·W time units), so they take
    * an EXACT key-equi theta path against the full relation instead:
    * same pair set, no explosion, and the common short-interval case
    * pays nothing. */
  def overlapPairs(df: DataFrame, keyCol: String, idCol: String,
                   sCol: String, eCol: String, binWidth: Long,
                   maxBinsPerInterval: Long = 1L << 16): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(maxBinsPerInterval > 0, "maxBinsPerInterval must be positive")
    // exact long floor-division WITHOUT intermediate overflow: `div`
    // truncates toward zero, so floor(x / W) = x div W, minus 1 when the
    // (dividend-signed) remainder is negative. The former
    // `(x - pmod(x, W)) div W` form underflowed for x within W of
    // Long.MinValue (a "-infinity" sentinel at binWidth 86400): under
    // ANSI mode the subtraction THREW — one dirty row killing the job,
    // the same class the try_subtract span guard below exists for.
    // Plain `/` would round-trip through a double, and at epoch-nano
    // magnitudes (> 2^53) that mis-bins boundary-adjacent endpoints.
    def floorDiv(x: String): String =
      s"(($x) div ${binWidth}L) + (CASE WHEN ($x) % ${binWidth}L < 0 THEN -1 ELSE 0 END)"
    // ebin − sbin can OVERFLOW Long for an interval spanning nearly the
    // full Long range at a small binWidth (s near Long.MinValue, e near
    // Long.MaxValue): under ANSI mode a plain minus THROWS (one dirty
    // row kills the job — the exact failure this guard exists to
    // prevent), and with ANSI off it would wrap negative and read as
    // "short", riding a ~2^64-bin explode. try_subtract yields NULL on
    // overflow; a span too wide to even compute is by definition long.
    val span = expr("try_subtract(ebin, sbin)")
    val isLong = span.isNull || span >= maxBinsPerInterval
    // count the long-span intervals on the checkpoint action itself
    // (observe — no extra job): when there are NONE, the whole long-path
    // subtree (a second full self-join + distinct, ~2 AQE jobs) is
    // provably empty and is skipped outright (r15, guide §2.4 — union
    // with an empty relation is identity). Long spans are rare by
    // construction; common workloads should not pay the safety path's
    // stages for zero rows.
    val obs = org.apache.spark.sql.Observation()
    val base = df.select(col(keyCol).as("k"), col(idCol).as("id"),
        col(sCol).cast("long").as("s"), col(eCol).cast("long").as("e"))
      // a zero-length (or inverted) half-open interval is EMPTY: it
      // overlaps nothing mathematically, but the pairwise predicate
      // below (s1 < e2 ∧ s2 < e1) would still admit [x,x) against any
      // interval covering x — a false-positive pair — and its ebin <
      // sbin makes sequence() emit a bogus DESCENDING bin list. Filter,
      // don't require: at scale one dirty row must not fail the job.
      .where(col("s") < col("e"))
      .withColumn("sbin", expr(floorDiv("s")))
      .withColumn("ebin", expr(floorDiv("e - 1")))
      .observe(obs, sum(when(isLong, 1L).otherwise(0L)).as("n_long"))
      // read by the short-side explode AND both sides of the long-path
      // join — pin it, or the caller's upstream scan runs three times
      .localCheckpoint()
    val nLong = Option(obs.get("n_long")).map(_.asInstanceOf[Long]).getOrElse(0L)
    val binned = base.where(!isLong)
      .select(col("k"), col("id"), col("s"), col("e"), col("sbin"),
        explode(sequence(col("sbin"), col("ebin"))).as("bin"))
      // the self-join below reads this subtree twice — pin it, or the
      // explode runs once per side
      .localCheckpoint()
    val shortPairs = binned.as("a").join(binned.as("b"),
        col("a.k") === col("b.k") && col("a.bin") === col("b.bin") &&
          col("a.id") < col("b.id") &&
          col("a.s") < col("b.e") && col("b.s") < col("a.e") &&
          col("a.bin") === greatest(col("a.sbin"), col("b.sbin")))
      .select(col("a.k").as(keyCol), col("a.id").as("id1"),
        col("b.id").as("id2"))
    if (nLong == 0L) shortPairs
    else {
      // every pair with at least one LONG side: key-equi join of the
      // (rare) longs against the full relation, id-normalized + distinct
      // (distinct is cheap — the relation is |longs|·|co-keyed| rows, and
      // a long-vs-long pair is the only double-emission)
      val longPairs = base.where(isLong).as("a")
        .join(base.as("b"),
          col("a.k") === col("b.k") && col("a.id") =!= col("b.id") &&
            col("a.s") < col("b.e") && col("b.s") < col("a.e"))
        .select(col("a.k").as(keyCol),
          least(col("a.id"), col("b.id")).as("id1"),
          greatest(col("a.id"), col("b.id")).as("id2"))
        .distinct()
      shortPairs.unionByName(longPairs)
    }
  }
}
