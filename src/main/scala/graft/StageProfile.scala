package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Dev tool: run a named query and print a per-stage cost breakdown —
  * executor run time, task count, input/shuffle volumes — so a wall-clock
  * ratio between two scale factors can be attributed to a NAMED term
  * (which stage grew, and in which dimension) instead of guessed at.
  * Built for the round-12 sf3-residual investigation (VERDICT r11 #3:
  * sim_knn_classify 4.8× and sim_ann_ivf 4.11× for 3× rows).
  *
  * Usage: runMain graft.StageProfile <queryName> <sfDir> [reps=3]
  *
  * Per stage (attempt 0 only, resubmissions excluded — the ADVICE r11
  * budget-gate lesson) of the LAST rep: stage id, name head, tasks,
  * executorRunTime ms, input bytes/records, shuffle read/write bytes and
  * records. Earlier reps warm JIT and the page cache so the profiled rep
  * measures the plan.
  */
object StageProfile {
  private case class StageRow(id: Int, name: String, tasks: Int,
                              runMs: Long, inBytes: Long, inRecs: Long,
                              srBytes: Long, srRecs: Long,
                              swBytes: Long, swRecs: Long)

  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args(1)
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)

    val rows = mutable.ArrayBuffer.empty[StageRow]
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        if (si.attemptNumber == 0) {
          val m = si.taskMetrics
          rows.synchronized {
            rows += StageRow(si.stageId, si.name.takeWhile(_ != '\n').take(60),
              si.numTasks, m.executorRunTime,
              m.inputMetrics.bytesRead, m.inputMetrics.recordsRead,
              m.shuffleReadMetrics.totalBytesRead,
              m.shuffleReadMetrics.recordsRead,
              m.shuffleWriteMetrics.bytesWritten,
              m.shuffleWriteMetrics.recordsWritten)
          }
        }
      }
    }

    var wall = 0.0
    try {
      var i = 0
      while (i < reps) {
        val last = i == reps - 1
        if (last) spark.sparkContext.addSparkListener(listener)
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        wall = (System.nanoTime() - t0) / 1e9
        if (!last) System.gc()
        i += 1
      }
      // stage-completion events arrive async on the listener bus
      // (waitUntilEmpty is private[spark]); poll until the row count has
      // been stable for 1s so the final rep's tail stages are captured
      var stable = 0
      var last = -1
      while (stable < 10) {
        Thread.sleep(100)
        val n = rows.synchronized(rows.size)
        if (n == last) stable += 1 else { stable = 0; last = n }
      }
    } finally spark.sparkContext.removeSparkListener(listener)

    println(f"[profile] $name @ $sfDir rep=$reps wall=$wall%.3f s")
    println("stage  tasks   runMs      inMB     inRecs     srMB     srRecs     swMB     swRecs  name")
    rows.sortBy(_.id).foreach { r =>
      println(f"${r.id}%5d ${r.tasks}%6d ${r.runMs}%7d ${r.inBytes / 1e6}%9.1f ${r.inRecs}%10d " +
        f"${r.srBytes / 1e6}%8.1f ${r.srRecs}%10d ${r.swBytes / 1e6}%8.1f ${r.swRecs}%10d  ${r.name}")
    }
    val totRun = rows.map(_.runMs).sum
    println(f"[profile] total executorRunTime ${totRun}ms across ${rows.size} stages")
    spark.stop()
  }
}
