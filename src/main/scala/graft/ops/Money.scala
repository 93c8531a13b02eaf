package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exact-cents money aggregation — determinism rule 11 (COVERAGE.md).
  *
  * `round(sum(double_money_expr), 2)` is order-dependent: both engines
  * sum doubles in whatever order their parallelism produces, the results
  * differ by ulps, and whenever the true sum sits within an ulp of a
  * half-cent boundary the final 2-dp round diverges by a cent (first
  * caught by the sf1 headroom gate in q9/q10 — sums that had passed at
  * four smaller scale factors by luck). The 100 TB-safe form quantizes
  * each TERM to integer cents with `round(x*100, 0)` — a row-local,
  * cross-engine-identical operation (the q_gini_revenue convention:
  * Spark HALF_UP and DuckDB's away-from-zero agree on every double,
  * including the exactly-representable k.5 ties) — then sums EXACT
  * integers, which is associative, so partial aggregation order cannot
  * matter. Spark partials run in DECIMAL(38,0) to match the headroom of
  * DuckDB's silent BIGINT→HUGEINT promotion (rule 10). Dollars are
  * emitted as the RAW double `sum/100` — identical integers divide to
  * identical doubles, so no output round() is needed (rule 2).
  */
object Money {

  /** Σ term, quantized per-row to integer cents; DECIMAL(38,0) exact. */
  def centsSumRaw(term: Column): Column =
    sum(round(term * 100, 0).cast("decimal(38,0)"))

  /** Exact dollars-out money sum: `centsSumRaw / 100` as a raw double. */
  def centsSum(term: Column): Column =
    centsSumRaw(term).cast("double") / lit(100.0)

  /** DuckDB dual of [[centsSumRaw]] (BIGINT terms; DuckDB promotes the
    * sum to HUGEINT, the headroom twin of the Spark DECIMAL(38,0)). */
  def centsSumRawSql(term: String): String =
    s"sum(CAST(round(($term) * 100, 0) AS BIGINT))"

  /** DuckDB dual of [[centsSum]]. */
  def centsSumSql(term: String): String =
    s"CAST(${centsSumRawSql(term)} AS DOUBLE) / 100.0"
}
