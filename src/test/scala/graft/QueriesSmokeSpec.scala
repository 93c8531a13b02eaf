package graft

/** Every declared query must build and execute on sf0.001 — a fast
  * regression net under `sbt test` (the oracle hash gate runs via
  * Verify + tools/verify_local.py). */
class QueriesSmokeSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle entries without a query: $missing")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"query $name executes on sf0.001") {
      assert(fn(spark, sfDir).count() >= 0)
    }
  }

  test("plan hygiene: no query plans an un-broadcast CartesianProduct") {
    // a CartesianProduct (as opposed to a BroadcastNestedLoopJoin with a
    // deliberately broadcast small side) means a full n×m shuffle-less
    // cross product — never acceptable at scale; any intentional cross
    // join in the engine must broadcast() its small side
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, sfDir).queryExecution.sparkPlan.toString
      if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty, s"queries with CartesianProduct: $offenders")
  }
}
