package graft

import org.apache.spark.sql.catalyst.plans._
import org.apache.spark.sql.execution.{FileSourceScanExec, FilterExec, SparkPlan}
import org.apache.spark.sql.execution.joins.{CartesianProductExec, ShuffledHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}

/** Registry-wide plan regression guard: every declared query's physical
  * plan is swept for the four scale anti-patterns that individual
  * PlansSpec tests only pin for hand-picked queries —
  *
  *   1. an unpartitioned window (empty PARTITION BY ⇒ Exchange
  *      SinglePartition ⇒ the whole relation serializes through one
  *      task at 100 TB),
  *   2. a cartesian product (pair materialization),
  *   3. a shuffled join (sort-merge / shuffled-hash) whose build side
  *      Catalyst itself estimates under the 8 MB broadcast bar — a
  *      dimension that should have been broadcast and wasn't,
  *   4. an unpushed parquet filter — a FilterExec sitting directly on a
  *      parquet scan that pushed NOTHING, not even an inferred
  *      IsNotNull: the whole predicate is opaque to the source, and at
  *      100 TB that is the difference between row-group skipping at the
  *      source and decoding every page to throw rows away one exec node
  *      later. A pushable twin usually exists (the five queries this
  *      check first caught all gained a semantically-implied IsNotNull
  *      conjunct on the scanned column).
  *
  * Planned (not executed) at sf0.001 — plan SHAPE is scale-invariant
  * for these patterns: empty partitionSpec and CartesianProductExec are
  * data-independent, a sub-8 MB-estimated side at planning time would
  * broadcast identically on a cluster, and pushdown is decided from the
  * predicate's shape, not the data. Allowlist entries carry the reason
  * the pattern is deliberate there. */
class PlanSweepSpec extends SparkSpec {

  /** name -> reason the flagged shape is intentional AND bounded. */
  private val allow: Map[String, String] = Map(
    "q_salted_join" -> ("the POINT of the query is the salted shuffled " +
      "join (hot-key mitigation for when the dim is too big to " +
      "broadcast); SHUFFLE_HASH-hinted by design"))

  private def offenders(p: SparkPlan): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    p.foreach {
      case w: WindowExec if w.partitionSpec.isEmpty =>
        out += "unpartitioned WindowExec"
      case w: WindowGroupLimitExec if w.partitionSpec.isEmpty =>
        out += "unpartitioned WindowGroupLimitExec"
      case _: CartesianProductExec =>
        out += "CartesianProductExec"
      case j: SortMergeJoinExec =>
        smallSide(j.joinType, j.left, j.right)
          .foreach(s => out += s"SortMergeJoin(${j.joinType}) with $s")
      case j: ShuffledHashJoinExec =>
        smallSide(j.joinType, j.left, j.right)
          .foreach(s => out += s"ShuffledHashJoin(${j.joinType}) with $s")
      case f: FilterExec =>
        f.child match {
          // Catalyst's v1 planner records every translatable conjunct in
          // the scan's PushedFilters as it plans, so "a Filter directly
          // on a parquet scan that pushed NOTHING — not even an inferred
          // IsNotNull" means the whole predicate is opaque to the source
          // (coalesce()/UDF/derived-expression shapes): every page
          // decodes only to discard rows one node later, when a
          // pushable rewrite usually exists. (DSv2 scans are out of
          // scope here: their pushdown happens in the ScanBuilder and
          // isn't generically introspectable; every fixture table is a
          // v1 parquet read.)
          case scan: FileSourceScanExec
              if scan.metadata.getOrElse("PushedFilters", "[]") == "[]" =>
            out += "unpushed parquet filter: " +
              f.condition.sql.replaceAll("\\s+", " ").take(90)
          case _ => ()
        }
      case _ => ()
    }
    out.toSeq.distinct
  }

  /** Catalyst's own planning-time estimate, via the physical node's
    * logical link — the number the broadcast decision was made from.
    * Only sides that could LEGALLY be the broadcast build side for the
    * join type count: a full-outer join can broadcast neither side, a
    * left-outer/semi/anti only its right — an SMJ there is Catalyst's
    * only option and the correct scale posture, not a missed broadcast. */
  private def smallSide(jt: JoinType, left: SparkPlan,
                        right: SparkPlan): Option[String] = {
    val bar = 8L * 1024 * 1024
    val (leftLegal, rightLegal) = jt match {
      case Inner | Cross => (true, true)
      case LeftOuter | LeftSemi | LeftAnti | _: ExistenceJoin => (false, true)
      case RightOuter => (true, false)
      case _ => (false, false) // FullOuter & anything exotic
    }
    def est(p: SparkPlan): Option[BigInt] =
      p.logicalLink.map(_.stats.sizeInBytes)
    (est(left), est(right)) match {
      case (Some(l), _) if leftLegal && l < bar =>
        Some(s"${l}B-estimated broadcastable left side")
      case (_, Some(r)) if rightLegal && r < bar =>
        Some(s"${r}B-estimated broadcastable right side")
      case _ => None
    }
  }

  test("the unpushed-filter detector actually fires (not vacuously green)") {
    // a null-TOLERANT predicate on a derived expression: nothing
    // translates (no comparison, and no inferred IsNotNull either), so
    // the scan pushes NOTHING — the smell the fourth check exists for,
    // here deliberately constructed (the pushable rewrite is
    // `o_orderpriority IS NULL OR o_orderpriority = ''`)
    val df = Tables.orders(spark, "/root/testdata/sf0.001")
      .filter(org.apache.spark.sql.functions
        .coalesce(org.apache.spark.sql.functions.col("o_orderpriority"),
          org.apache.spark.sql.functions.lit("")) === "")
    val found = offenders(df.queryExecution.sparkPlan)
    assert(found.exists(_.startsWith("unpushed parquet filter")),
      s"detector missed the opaque-predicate plan; saw: $found")
    // and the pushable rewrite is NOT flagged
    val good = Tables.orders(spark, "/root/testdata/sf0.001")
      .filter(org.apache.spark.sql.functions.col("o_orderpriority").isNull ||
        org.apache.spark.sql.functions.col("o_orderpriority") === "")
    assert(!offenders(good.queryExecution.sparkPlan)
      .exists(_.startsWith("unpushed parquet filter")))
  }

  test("no unpartitioned window / cartesian / unbroadcast-small-side " +
      "shuffled join / unpushed parquet filter across the full query registry") {
    val dir = "/root/testdata/sf0.001"
    val violations = scala.collection.mutable.ArrayBuffer[String]()
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      val found = offenders(fn(spark, dir).queryExecution.sparkPlan)
      if (found.nonEmpty && !allow.contains(name))
        violations += s"$name: ${found.mkString("; ")}"
    }
    assert(violations.isEmpty,
      s"\n${violations.size} queries with scale anti-patterns:\n" +
        violations.mkString("\n"))
  }
}
