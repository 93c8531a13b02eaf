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

  /** Exact-cents mean, emitted RAW (rule 12). `round(avg(money), s)` is
    * the sharpest instance of the rule-11 hazard: the true mean is
    * RATIONAL (integer cents / 100n), so for friendly group sizes it
    * lands EXACTLY on a half-boundary of the rounding grid and the two
    * engines' ulp-different double sums round to different sides (first
    * caught at sf1 by q_hourly_seasonality: mean 52.10175 → 52.1017 vs
    * 52.1018 between two otherwise-identical runs). The exact integer
    * sum fixes the sums — but a final round() would RE-introduce the
    * divergence: a measured ~10% of exact half-boundary rationals round
    * apart between Spark (shortest-decimal-repr HALF_UP) and DuckDB
    * (scaled multiply + away-from-zero), e.g. 261/20000 → 0.0130 vs
    * 0.0131. So per rule 2 the mean is emitted raw: identical integers
    * through the identical IEEE chain `/100.0/count` are bit-identical
    * doubles in both engines, no rounding step exists to disagree on.
    * Term must be null-free (the divisor is count(*), not avg's
    * null-aware count). */
  def centsMean(term: Column): Column =
    centsSum(term) / count(lit(1))

  /** DuckDB dual of [[centsMean]]. */
  def centsMeanSql(term: String): String =
    s"${centsSumSql(term)} / count(*)"

  /** Row-local cents quantization — a VALUE used as an exact integer
    * term/key (not the rule-11 sum): round-half-up VIA floor,
    * `floor(x·100 + 0.5)`, which keeps rule-2 bit-exactness (floor of
    * the identical IEEE chain is identical in both engines, unlike
    * round()'s divergent half-way tie-breaking) AND lands every 2-dp
    * money value on its true cent. A bare floor(x·100) understates
    * roughly half of all stored prices by one cent — 0.29 is
    * 0.2899999…₂, ×100 = 28.999999999999996, floor → 28 — and since
    * both engines computed the identical wrong integer, the oracle
    * gate was structurally blind to it (round-10 review finding). ONE
    * definition so the quantization convention cannot drift between
    * the queries that share it. */
  def quantizeCents(x: Column): Column = floor(x * 100 + 0.5).cast("long")

  /** DuckDB dual of [[quantizeCents]]. */
  def quantizeCentsSql(x: String): String =
    s"CAST(floor(($x) * 100 + 0.5) AS BIGINT)"

  /** Spark-SQL-text flavor of [[centsMean]] for queries authored as SQL
    * strings (the q_sql_text_api surface): DECIMAL(38,0) partials as in
    * [[centsSumRaw]], same division chain as [[centsMean]]. */
  def centsMeanSparkSql(term: String): String =
    s"cast(sum(cast(round(($term) * 100, 0) as decimal(38,0))) as double)" +
      " / 100.0 / count(*)"
}
