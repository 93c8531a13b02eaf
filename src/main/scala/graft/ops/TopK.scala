package graft.ops

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

final case class ScoredNeighbor(neighbor_id: Long, cosine: Double)

/** Typed bounded top-k aggregator (SURVEY.md §7.4 "possible custom
  * Aggregator"): keeps only k candidates per group through the partial
  * and merge phases, so a top-k-per-query job shuffles k rows per group
  * instead of sorting the whole candidate set in a window — the
  * map-side-combine shape that matters when candidates per query are
  * large. Ordering is (cosine DESC, neighbor_id ASC), identical to the
  * window row_number ordering, so results match the windowed form (and
  * its oracle) exactly — including NaN placement: Spark SQL's total
  * order puts NaN above every double, so in DESC order a NaN cosine
  * (zero-norm embedding) ranks FIRST. java.lang.Double.compare has the
  * same NaN-greatest contract; negating `-s.cosine` via Ordering.by does
  * NOT (NaN == -NaN there, and it would sort NaN last and silently drop
  * it from the top-k). */
final class TopKByScore(k: Int)
    extends Aggregator[ScoredNeighbor, Seq[ScoredNeighbor], Seq[ScoredNeighbor]] {
  // fail at construction (driver-side), not as an obscure
  // NoSuchElementException from b.last deep in an executor's reduce
  require(k > 0, s"TopKByScore needs k > 0, got $k")

  private val ord: Ordering[ScoredNeighbor] = new Ordering[ScoredNeighbor] {
    override def compare(a: ScoredNeighbor, b: ScoredNeighbor): Int = {
      val c = -java.lang.Double.compare(a.cosine, b.cosine) // DESC, NaN first
      if (c != 0) c else java.lang.Long.compare(a.neighbor_id, b.neighbor_id)
    }
  }

  override def zero: Seq[ScoredNeighbor] = Vector.empty

  override def reduce(b: Seq[ScoredNeighbor], a: ScoredNeighbor): Seq[ScoredNeighbor] =
    if (b.length >= k && ord.lteq(b.last, a)) b
    else (b :+ a).sorted(ord).take(k)

  override def merge(a: Seq[ScoredNeighbor], b: Seq[ScoredNeighbor]): Seq[ScoredNeighbor] =
    (a ++ b).sorted(ord).take(k)

  override def finish(r: Seq[ScoredNeighbor]): Seq[ScoredNeighbor] = r.sorted(ord)

  override def bufferEncoder: Encoder[Seq[ScoredNeighbor]] =
    ExpressionEncoder[Seq[ScoredNeighbor]]()
  override def outputEncoder: Encoder[Seq[ScoredNeighbor]] =
    ExpressionEncoder[Seq[ScoredNeighbor]]()
}

object TopKByScore {
  def udafFor(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new TopKByScore(k), Encoders.product[ScoredNeighbor])
}
