package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.GraftTestShims
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}

/** Every declared query must build and execute on sf0.001 — a fast
  * regression net under `sbt test` (the oracle hash gate runs via
  * Verify + tools/verify_local.py).
  *
  * The execution sweep doubles as the RUNTIME job/stage budget
  * (ADVICE r11 watch item). PlanSweepSpec's repeated-subtree check is
  * static: it assumes Spark's exchange reuse engages at runtime, and
  * ops/Components.scala documents an observed shape where AQE's reuse
  * did NOT. Counting the jobs and EXECUTED stages each query actually
  * runs (skipped stages fire no completion event), and pinning them
  * against committed budgets in fixtures/job_budgets.txt, catches the
  * class at runtime: exchange reuse silently disengaging, a convergence
  * loop gaining rounds, an accidental extra action — anything that
  * makes a query run more Spark work than the day its budget was
  * recorded. Attribution is by job group: Spark propagates local
  * properties into AQE stage-materialization and broadcast threads
  * (SPARK-33933), so suites running concurrently on the shared session
  * cannot pollute the counts. Budgets are tied to the test config
  * (local[4], shuffle.partitions=4, sf0.001); after a deliberate plan
  * change, regenerate with
  * `GRAFT_REGEN_JOB_BUDGETS=1 sbt "testOnly graft.QueriesSmokeSpec"`. */
class QueriesSmokeSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private val budgetPath = Paths.get("fixtures/job_budgets.txt")
  private val groupPrefix = "graft-budget:"

  private val jobsByQuery = new ConcurrentHashMap[String, AtomicInteger]()
  private val stagesByQuery = new ConcurrentHashMap[String, AtomicInteger]()
  private val stageOwner = new ConcurrentHashMap[Int, String]()

  private val listener = new SparkListener {
    override def onJobStart(job: SparkListenerJobStart): Unit = {
      val group = Option(job.properties)
        .flatMap(p => Option(p.getProperty("spark.jobGroup.id")))
      group.filter(_.startsWith(groupPrefix)).foreach { g =>
        val name = g.stripPrefix(groupPrefix)
        jobsByQuery.computeIfAbsent(name, _ => new AtomicInteger).incrementAndGet()
        job.stageIds.foreach(id => stageOwner.put(id, name))
      }
    }
    override def onStageCompleted(st: SparkListenerStageCompleted): Unit = {
      val name = stageOwner.get(st.stageInfo.stageId)
      if (name != null)
        stagesByQuery.computeIfAbsent(name, _ => new AtomicInteger).incrementAndGet()
    }
  }

  // registered at construction so every test (and a filtered testOnly -z
  // run) records counts; listeners survive on the shared session
  spark.sparkContext.addSparkListener(listener)

  /** Run `body` under an attributed job group, flush the listener bus,
    * and return (jobs, executed stages) recorded for it. */
  private def measured(tag: String)(body: => Unit): (Int, Int) = {
    val sc = spark.sparkContext
    sc.setJobGroup(groupPrefix + tag, s"graft budget sweep: $tag",
      interruptOnCancel = false)
    try body finally sc.clearJobGroup()
    GraftTestShims.waitListenerBusEmpty(sc)
    (Option(jobsByQuery.get(tag)).map(_.get).getOrElse(0),
      Option(stagesByQuery.get(tag)).map(_.get).getOrElse(0))
  }

  test("entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle entries without a query: $missing")
  }

  test("the runtime stage counter sees repeated execution (not vacuously green)") {
    import org.apache.spark.sql.functions.{col, sum}
    def base() = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey")).agg(sum(col("o_totalprice")).as("v"))
    val (_, once) = measured("selftest-once") { base().count() }
    // two separate actions re-plan from scratch: the scan + shuffle map
    // stage executes twice, and the counter must see it
    val (_, twice) = measured("selftest-twice") {
      val b = base(); b.count(); b.count()
    }
    assert(once > 0, "no stages recorded for a shuffling query")
    assert(twice > once,
      s"stage counter blind to repeated execution: once=$once twice=$twice")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"query $name executes on sf0.001") {
      val (_, _) = measured(name) { assert(fn(spark, sfDir).count() >= 0) }
    }
  }

  test("runtime job/stage counts stay within committed budgets") {
    GraftTestShims.waitListenerBusEmpty(spark.sparkContext)
    val names = SparkEntry.queries.keySet
    val actual: Map[String, (Int, Int)] = names.iterator.map { n =>
      n -> ((Option(jobsByQuery.get(n)).map(_.get).getOrElse(0),
        Option(stagesByQuery.get(n)).map(_.get).getOrElse(0)))
    }.toMap
    // a filtered run (testOnly -z) records nothing for skipped queries —
    // only judge what actually ran in this suite instance
    val ran = actual.filter(_._2._1 > 0)
    assume(ran.nonEmpty, "no budgeted query ran in this suite instance")
    if (sys.env.get("GRAFT_REGEN_JOB_BUDGETS").contains("1")) {
      assert(ran.size == names.size,
        s"budget regeneration needs a full-suite run; ran ${ran.size}/${names.size}")
      val body = ran.toSeq.sortBy(_._1)
        .map { case (n, (j, s)) => s"$n $j $s" }.mkString("", "\n", "\n")
      val tmp = Files.createTempFile(budgetPath.getParent, "job_budgets", ".tmp")
      Files.write(tmp, body.getBytes("UTF-8"))
      Files.move(tmp, budgetPath, StandardCopyOption.REPLACE_EXISTING,
        StandardCopyOption.ATOMIC_MOVE)
      info(s"wrote ${ran.size} budgets to $budgetPath")
    } else {
      assert(Files.exists(budgetPath),
        s"$budgetPath missing — regenerate with GRAFT_REGEN_JOB_BUDGETS=1")
      val budget: Map[String, (Int, Int)] =
        scala.jdk.CollectionConverters.IteratorHasAsScala(
          Files.lines(budgetPath).iterator).asScala
          .filter(_.nonEmpty).map { line =>
            val Array(n, j, s) = line.split(" ")
            n -> ((j.toInt, s.toInt))
          }.toMap
      val stale = budget.keySet -- names
      assert(stale.isEmpty,
        s"budgets for queries no longer in the registry (regenerate): $stale")
      val missing = ran.keySet -- budget.keySet
      assert(missing.isEmpty,
        s"queries without a committed job budget (regenerate): $missing")
      val over = ran.toSeq.sortBy(_._1).flatMap { case (n, (j, s)) =>
        val (bj, bs) = budget(n)
        if (j > bj || s > bs)
          Some(s"$n: jobs $j (budget $bj), executed stages $s (budget $bs)")
        else None
      }
      assert(over.isEmpty,
        s"\n${over.size} queries ran more Spark work than their committed " +
          s"budget — a repeated subtree, a disengaged exchange reuse, or an " +
          s"extra action (regenerate only if deliberate):\n${over.mkString("\n")}")
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
