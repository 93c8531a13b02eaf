package graft

import org.apache.spark.sql.SparkSession

// Throwaway timing harness (not part of the driver contract; deleted
// before commit).
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq else Seq("q_pagerank")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    Tables.lineitem(spark, sfDir).count()
    Tables.orders(spark, sfDir).count()
    for (n <- names; i <- 1 to 3) {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).count()
      println(f"[scratch] $n run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      System.gc()
    }
    spark.stop()
  }
}
