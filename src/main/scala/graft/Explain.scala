package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time a named query and dump its formatted physical plan.
  * Usage: runMain graft.Explain <queryName> [sfDir] [--plan] */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1 && !args(1).startsWith("--")) args(1)
                else "/root/testdata/sf0.1"
    val showPlan = args.contains("--plan")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    // warm-up run amortizes JIT/session init out of the measurement
    fn(spark, sfDir).count()
    val t0 = System.nanoTime()
    val df = fn(spark, sfDir)
    val n = df.count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[explain] $name: $n rows in $sec%.2f s")
    if (showPlan) df.explain("formatted")
    spark.stop()
  }
}
