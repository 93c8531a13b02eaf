package graft

import org.apache.spark.sql.functions._

/** The SCALE.md bucketing claim, proven: writing both join sides bucketed
  * by the join key lets Spark plan the join with NO shuffle exchange on
  * either side — the layout move that makes the lineitem⋈orders join
  * free at 100 TB. */
class BucketingSpec extends SparkSpec {

  test("bucketed-by-key tables join without a shuffle") {
    // spark.sql.warehouse.dir is static — managed tables land in the
    // default ./spark-warehouse; DROP TABLE removes the data, and the
    // leftover empty db dir is cleaned below (and gitignored)
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_bucket_test")
    spark.sql("USE graft_bucket_test")
    try {
      val d = "/root/testdata/sf0.001"
      Tables.lineitem(spark, d).write.mode("overwrite")
        .bucketBy(4, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("li_bucketed")
      Tables.orders(spark, d).write.mode("overwrite")
        .bucketBy(4, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("ord_bucketed")
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      // disable auto-broadcast so the join strategy is the bucketed SMJ
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        assert(joined.collect().map(_.getLong(1)).sum === 6000L)
        val plan = joined.queryExecution.executedPlan.toString
        assert(plan.contains("SortMergeJoin"))
        // the only exchange is the final single-partition aggregation —
        // neither JOIN side shuffles (bucketing pre-partitioned them)
        val joinSection = plan.substring(plan.indexOf("SortMergeJoin"))
        assert(!joinSection.contains("Exchange hashpartitioning(l_orderkey"))
        assert(!joinSection.contains("Exchange hashpartitioning(o_orderkey"))
      } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
      spark.sql("USE default")
      spark.sql("DROP DATABASE IF EXISTS graft_bucket_test")
    }
  }
}
