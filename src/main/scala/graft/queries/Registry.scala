package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named engine query: the Spark implementation plus (when the
  * semantics are ANSI-expressible) the equivalent DuckDB oracle SQL the
  * driver hash-compares against (driver contract, Verify.scala).
  *
  * Parity rules every query follows (SURVEY.md §5, §7.4):
  *   - ends in a deterministic ORDER BY on output keys;
  *   - every computed/aggregate column aliased to the SAME name on both
  *     sides (the driver sorts columns by name before hashing);
  *   - no raw floating-point accumulations in the output — doubles are
  *     round()ed, timestamps emitted as epoch seconds or date strings.
  */
final case class NamedQuery(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait QueryRegistry {
  def all: Seq[NamedQuery]
}
