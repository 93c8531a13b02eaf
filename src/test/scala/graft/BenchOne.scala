package graft

import org.apache.spark.sql.SparkSession

/** Dev tool (test scope): time a subset of declared queries.
  * Usage: sbt "Test/runMain graft.BenchOne <sfDir> <query1> [query2 ...]"
  * Warm min-of-2 per query, same methodology as Bench.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    Tables.embeddings(spark, sfDir).count()
    Tables.documents(spark, sfDir).count()
    for (n <- names) {
      val fn = SparkEntry.queries(n)
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val a = once(); System.gc()
      val b = once(); System.gc()
      println(f"[benchone] $n%-28s min=${math.min(a, b)}%.3f  (a=$a%.3f b=$b%.3f)")
    }
    spark.stop()
  }
}
