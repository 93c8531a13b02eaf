package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev-only experiment harness for the optimization round: runs named
  * variants of a query body back-to-back in one session and prints
  * per-stage executorRunTime / GC / deserialization so per-task cost can
  * be attributed. Not part of the registry or the bench; variants here
  * never feed declared results.
  *
  * Usage: runMain graft.Scratch <variant> [sfDir] [reps]
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val variant = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    case class Row(id: Int, name: String, tasks: Int, runMs: Long,
                   gcMs: Long, deserMs: Long, cpuMs: Long)
    val rows = scala.collection.mutable.ArrayBuffer.empty[Row]
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        if (si.attemptNumber == 0) {
          val m = si.taskMetrics
          rows.synchronized {
            rows += Row(si.stageId, si.name.takeWhile(_ != '\n').take(50),
              si.numTasks, m.executorRunTime, m.jvmGCTime,
              m.executorDeserializeTime, m.executorCpuTime / 1000000)
          }
        }
      }
    }

    val fn: (SparkSession, String) => DataFrame = variant match {
      case "pr0" => (s, d) => SparkEntry.queries("q_pagerank")(s, d)
      case "pr_scan" => (s, d) => { // cache build + bare scan-agg of the cache, no join
        val e0 = Tables.lineitem(s, d)
          .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .select((col("l_suppkey") + 1000000L).as("src"), col("o_custkey").as("dst"))
          .distinct().localCheckpoint()
        val sym = e0.unionByName(e0.select(col("dst").as("src"), col("src").as("dst")))
        val edges = sym.withColumn("deg", count(lit(1)).over(Window.partitionBy("src"))).cache()
        edges.count()
        var agg: DataFrame = null
        for (_ <- 1 to 5)
          agg = edges.groupBy(col("dst").as("node")).agg(sum(col("deg")).as("x"))
        val out = agg.localCheckpoint()
        edges.unpersist(false)
        graft.ops.Components.freeCheckpoint(e0)
        out
      }
      case "pr_scan_eager" => (s, d) => { // 5 INDEPENDENT scan-aggs, each counted
        val e0 = Tables.lineitem(s, d)
          .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .select((col("l_suppkey") + 1000000L).as("src"), col("o_custkey").as("dst"))
          .distinct().localCheckpoint()
        val sym = e0.unionByName(e0.select(col("dst").as("src"), col("src").as("dst")))
        val edges = sym.withColumn("deg", count(lit(1)).over(Window.partitionBy("src"))).cache()
        edges.count()
        for (_ <- 1 to 5)
          edges.groupBy(col("dst").as("node")).agg(sum(col("deg")).as("x")).count()
        val out = edges.limit(1).localCheckpoint()
        edges.unpersist(false)
        graft.ops.Components.freeCheckpoint(e0)
        out
      }
      case "pr_lc" => (s, d) => { // edges pinned as UnsafeRows (localCheckpoint) instead of columnar cache
        val e0 = Tables.lineitem(s, d)
          .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .select((col("l_suppkey") + 1000000L).as("src"), col("o_custkey").as("dst"))
          .distinct().localCheckpoint()
        val sym = e0.unionByName(e0.select(col("dst").as("src"), col("src").as("dst")))
        val edges = sym.withColumn("deg", count(lit(1)).over(Window.partitionBy("src")))
          .localCheckpoint()
        graft.ops.Components.freeCheckpoint(e0)
        val nodes = edges.select(col("src")).distinct()
        val n = nodes.count().toDouble
        var pr = nodes.select(col("src").as("node"), lit(1.0 / n).as("rank"))
        for (_ <- 1 to 5) {
          pr = edges
            .join(broadcast(pr), edges("src") === pr("node"))
            .groupBy(col("dst").as("node"))
            .agg((lit(0.15 / n) + lit(0.85) * sum(col("rank") / col("deg"))).as("rank"))
        }
        val out = pr.select(col("node"), round(col("rank"), 8).as("rank"))
          .localCheckpoint()
        graft.ops.Components.freeCheckpoint(edges)
        out.orderBy("node")
      }
      case "pr_lc_scan" => (s, d) => { // 5 independent eager scan-aggs over the checkpointed edges
        val e0 = Tables.lineitem(s, d)
          .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .select((col("l_suppkey") + 1000000L).as("src"), col("o_custkey").as("dst"))
          .distinct().localCheckpoint()
        val sym = e0.unionByName(e0.select(col("dst").as("src"), col("src").as("dst")))
        val edges = sym.withColumn("deg", count(lit(1)).over(Window.partitionBy("src")))
          .localCheckpoint()
        graft.ops.Components.freeCheckpoint(e0)
        for (_ <- 1 to 5)
          edges.groupBy(col("dst").as("node")).agg(sum(col("deg")).as("x")).count()
        val out = edges.limit(1).localCheckpoint()
        graft.ops.Components.freeCheckpoint(edges)
        out
      }
      case "pr_lc2" => (s, d) => { // single-pass symmetrize via explode, one checkpoint total
        val edges = Tables.lineitem(s, d)
          .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .select((col("l_suppkey") + 1000000L).as("a"), col("o_custkey").as("b"))
          .distinct()
          .select(explode(array(
            struct(col("a").as("src"), col("b").as("dst")),
            struct(col("b").as("src"), col("a").as("dst")))).as("e"))
          .select(col("e.src").as("src"), col("e.dst").as("dst"))
          .withColumn("deg", count(lit(1)).over(Window.partitionBy("src")))
          .localCheckpoint()
        val nodes = edges.select(col("src")).distinct()
        val n = nodes.count().toDouble
        var pr = nodes.select(col("src").as("node"), lit(1.0 / n).as("rank"))
        for (_ <- 1 to 5) {
          pr = edges
            .join(broadcast(pr), edges("src") === pr("node"))
            .groupBy(col("dst").as("node"))
            .agg((lit(0.15 / n) + lit(0.85) * sum(col("rank") / col("deg"))).as("rank"))
        }
        val out = pr.select(col("node"), round(col("rank"), 8).as("rank"))
          .localCheckpoint()
        graft.ops.Components.freeCheckpoint(edges)
        out.orderBy("node")
      }
      case "pr_lc3" => (s, d) => { // deg folded into the broadcast side; edges = bare (src,dst)
        val edges = Tables.lineitem(s, d)
          .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .select((col("l_suppkey") + 1000000L).as("a"), col("o_custkey").as("b"))
          .distinct()
          .select(explode(array(
            struct(col("a").as("src"), col("b").as("dst")),
            struct(col("b").as("src"), col("a").as("dst")))).as("e"))
          .select(col("e.src").as("src"), col("e.dst").as("dst"))
          .localCheckpoint()
        val degObs = org.apache.spark.sql.Observation("pr_nodes")
        val deg = edges.groupBy(col("src").as("node"))
          .agg(count(lit(1)).as("deg"))
          .observe(degObs, count(lit(1)).as("n"))
          .localCheckpoint()
        val n = degObs.get("n").asInstanceOf[Long].toDouble
        var pr = deg.select(col("node"), lit(1.0 / n).as("rank"))
        for (_ <- 1 to 5) {
          val contrib = pr.join(deg, Seq("node"))
            .select(col("node"), (col("rank") / col("deg")).as("c"))
          pr = edges
            .join(contrib, edges("src") === contrib("node"))
            .groupBy(col("dst").as("node"))
            .agg((lit(0.15 / n) + lit(0.85) * sum(col("c"))).as("rank"))
        }
        val out = pr.select(col("node"), round(col("rank"), 8).as("rank"))
          .localCheckpoint()
        graft.ops.Components.freeCheckpoint(edges)
        graft.ops.Components.freeCheckpoint(deg)
        out.orderBy("node")
      }
      // ---- r15 stage-latency decomposition (VERDICT r14 #2): a ladder of
      // k chained exchanges over a tiny relation isolates the per-stage
      // FIXED wall cost (scheduling + AQE replan + task launch) from data
      // work — the slope in k is the per-exchange constant the mid-tail
      // pays 6-15 times per query. Run with SPARK_GRAFT_CPUS=32 and 8 to
      // split task-launch (scales with partitions) from driver barriers.
      case "lat_ladder" => (s, d) => {
        var df = Tables.orders(s, d)
          .select(col("o_custkey").as("k"), col("o_totalprice").as("v"))
        for (i <- 1 to 8)
          df = df.groupBy(pmod(col("k") + i, lit(10000)).as("k"))
            .agg(sum(col("v")).as("v"))
        df
      }
      case "lat_ladder2" => (s, d) => { // 2 exchanges: slope anchor
        var df = Tables.orders(s, d)
          .select(col("o_custkey").as("k"), col("o_totalprice").as("v"))
        for (i <- 1 to 2)
          df = df.groupBy(pmod(col("k") + i, lit(10000)).as("k"))
            .agg(sum(col("v")).as("v"))
        df
      }
      case "lat_ladder_noaqe" => (s, d) => {
        s.conf.set("spark.sql.adaptive.enabled", "false")
        var df = Tables.orders(s, d)
          .select(col("o_custkey").as("k"), col("o_totalprice").as("v"))
        for (i <- 1 to 8)
          df = df.groupBy(pmod(col("k") + i, lit(10000)).as("k"))
            .agg(sum(col("v")).as("v"))
        df
      }
      case "lat_ladder2_noaqe" => (s, d) => {
        s.conf.set("spark.sql.adaptive.enabled", "false")
        var df = Tables.orders(s, d)
          .select(col("o_custkey").as("k"), col("o_totalprice").as("v"))
        for (i <- 1 to 2)
          df = df.groupBy(pmod(col("k") + i, lit(10000)).as("k"))
            .agg(sum(col("v")).as("v"))
        df
      }
      case "lat_floor" => (s, d) => { // zero-exchange floor: scan + count only
        Tables.orders(s, d).select(col("o_custkey"))
      }
      // ---- r15 VERDICT #3: pagerank posture when the rank side CANNOT
      // broadcast. Force the session threshold to 1 KB so neither the
      // size-aware hint nor the planner broadcasts; measure the per-round
      // edge reshuffle the r14 verdict flagged as the unproven regime.
      case "pr_nobcast" => (s, d) => {
        s.conf.set("spark.sql.autoBroadcastJoinThreshold", "1KB")
        SparkEntry.queries("q_pagerank")(s, d)
      }
      // the candidate fix for that regime: edges pinned WITH partitioning
      // (repartition(src) + cache, the Components posture) so the
      // per-round join reshuffles only the rank relation
      case "pr_partpin" => (s, d) => {
        s.conf.set("spark.sql.autoBroadcastJoinThreshold", "1KB")
        val edges = Tables.lineitem(s, d)
          .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .select((col("l_suppkey") + 1000000L).as("a"), col("o_custkey").as("b"))
          .distinct()
          .select(explode(array(
            struct(col("a").as("src"), col("b").as("dst")),
            struct(col("b").as("src"), col("a").as("dst")))).as("e"))
          .select(col("e.src").as("src"), col("e.dst").as("dst"))
          .withColumn("deg", count(lit(1)).over(Window.partitionBy("src")))
          .repartition(col("src"))
          .cache()
        val nodes = edges.select(col("src")).distinct()
        val n = nodes.count().toDouble
        var pr = nodes.select(col("src").as("node"), lit(1.0 / n).as("rank"))
        for (_ <- 1 to 5) {
          pr = edges
            .join(pr, edges("src") === pr("node"))
            .groupBy(col("dst").as("node"))
            .agg((lit(0.15 / n) + lit(0.85) * sum(col("rank") / col("deg"))).as("rank"))
        }
        val out = pr.select(col("node"), round(col("rank"), 8).as("rank"))
          .localCheckpoint()
        edges.unpersist(false)
        out.orderBy("node")
      }
      case "bfs_nobcast" => (s, d) => {
        s.conf.set("spark.sql.autoBroadcastJoinThreshold", "1KB")
        SparkEntry.queries("q_bfs_hops")(s, d)
      }
      // ---- r15 VERDICT #4: q_assoc_rules at-scale byte posture.
      // ar0 = shipped form (flat self-join, SHUFFLE_HASH + ReuseExchange)
      case "ar0" => (s, d) => SparkEntry.queries("q_assoc_rules")(s, d)
      // ar3 = basket arrays via ONE exchange (collect_set dedups in-agg,
      // no separate distinct shuffle), pair expansion via codegen
      // Generate (posexplode + explode(slice)) instead of the r13 nested
      // transform/flatten HOF chain
      case "ar3" => (s, d) => {
        val minSupp = 3
        val b = Tables.lineitem(s, d)
          .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
          .groupBy(col("o"))
          .agg(sort_array(collect_set(col("p"))).as("items"))
          .localCheckpoint()
        val nBaskets = b.agg(count(lit(1)).as("n_baskets"))
        val itemSupp = b
          .select(explode(col("items")).as("item"))
          .groupBy(col("item")).agg(count(lit(1)).as("supp"))
        val pairs = b
          .select(posexplode(col("items")).as(Seq("i", "item_a")),
            col("items"))
          .select(col("item_a"),
            explode(slice(col("items"), col("i") + lit(2),
              greatest(size(col("items")) - col("i") - 1, lit(0)))).as("item_b"))
          .groupBy(col("item_a"), col("item_b"))
          .agg(count(lit(1)).as("supp_ab"))
          .filter(col("supp_ab") >= minSupp)
        pairs
          .join(broadcast(itemSupp.select(col("item").as("item_a"),
            col("supp").as("supp_a"))), "item_a")
          .join(broadcast(itemSupp.select(col("item").as("item_b"),
            col("supp").as("supp_b"))), "item_b")
          .crossJoin(broadcast(nBaskets))
          .select(col("item_a"), col("item_b"), col("supp_ab"),
            (col("supp_ab").cast("double") / col("supp_a")).as("conf_ab"),
            (col("supp_ab").cast("double") / col("supp_b")).as("conf_ba"),
            (col("supp_ab").cast("double") * col("n_baskets")
              / (col("supp_a") * col("supp_b"))).as("lift"))
          .orderBy(desc("lift"), col("item_a"), col("item_b"))
      }
      case "lat_micro" => (s, d) => { // decompose the per-query fixed cost
        def t(label: String)(body: => Any): Unit = {
          val t0 = System.nanoTime(); body
          println(f"[micro] $label ${(System.nanoTime() - t0) / 1e6}%.1f ms")
        }
        t("rdd 1-part job          ")(s.sparkContext.parallelize(Seq(1), 1).count())
        t("range 1-part count      ")(s.range(0, 1000, 1, 1).count())
        t("range 32-part count     ")(s.range(0, 1000, 1, 32).count())
        t("read.parquet (plan only)")(Tables.orders(s, d))
        t("orders analyze+optimize ")(Tables.orders(s, d)
          .select(col("o_custkey")).queryExecution.executedPlan)
        t("orders.count            ")(Tables.orders(s, d).count())
        t("orders proj count       ")(Tables.orders(s, d).select(col("o_custkey")).count())
        t("orders sum (2-stage agg)")(Tables.orders(s, d)
          .agg(sum(col("o_custkey"))).collect())
        t("orders groupBy count    ")(Tables.orders(s, d)
          .groupBy(col("o_custkey")).agg(sum(col("o_totalprice"))).count())
        val sch = Tables.orders(s, d).schema
        t("read w/ explicit schema  ")(
          s.read.schema(sch).parquet(s"$d/orders.parquet"))
        t("read w/ schema + count   ")(
          s.read.schema(sch).parquet(s"$d/orders.parquet").count())
        val reused = Tables.orders(s, d)
        t("reused DF count          ")(reused.count())
        t("reused DF count again    ")(reused.count())
        s.range(1).toDF("id")
      }
      case other => sys.error(s"unknown variant $other")
    }

    var wall = 0.0
    var i = 0
    while (i < reps) {
      val last = i == reps - 1
      if (last) spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      wall = (System.nanoTime() - t0) / 1e9
      println(f"[scratch] $variant rep $i wall=${(System.nanoTime() - t0) / 1e9}%.3f s")
      if (!last) System.gc()
      i += 1
    }
    var stable = 0; var lastN = -1
    while (stable < 10) {
      Thread.sleep(100)
      val n = rows.synchronized(rows.size)
      if (n == lastN) stable += 1 else { stable = 0; lastN = n }
    }
    println(f"[scratch] $variant last wall=$wall%.3f s")
    println("stage  tasks   runMs    gcMs  deserMs   cpuMs  name")
    rows.sortBy(_.id).foreach { r =>
      println(f"${r.id}%5d ${r.tasks}%6d ${r.runMs}%7d ${r.gcMs}%7d ${r.deserMs}%8d ${r.cpuMs}%7d  ${r.name}")
    }
    spark.stop()
  }
}
