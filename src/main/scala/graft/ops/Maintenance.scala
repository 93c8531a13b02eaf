package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Table-maintenance operators — the write-side hygiene a 100 TB lake
  * needs between queries. The reference writes one tiny side-car per
  * image (appV2.py:178-179), the pathological small-file shape at scale;
  * ingest pipelines (streaming micro-batches, per-task parquet parts)
  * produce the same problem: thousands of KB-sized files whose
  * open/footer costs dominate scans and whose row groups are too small
  * for min/max pruning to bite.
  *
  * `compactParquet` rewrites a parquet directory into ~target-sized,
  * range-clustered files: partition count from actual byte size,
  * `repartitionByRange(sortCol)` + `sortWithinPartitions` so every
  * output file owns a contiguous key range (file-level min/max stats
  * become disjoint → a point/range predicate prunes to one file — the
  * 1-D cousin of q_zorder_cluster's multi-dim layout). The rewrite goes
  * to a staging directory first and swaps in with two renames. Honest
  * durability contract (a filesystem has no multi-path transaction —
  * that is exactly what a table format's metadata commit adds at
  * scale): the staged data is fully written and fsync'd before any
  * rename; between the two renames a concurrent reader can observe the
  * path briefly missing; if the second rename fails the original is
  * rolled back. The pre-compact data is retired to the HIDDEN sibling
  * `.<name>.pre-compact` (dot-prefixed so partition discovery over a
  * partitioned table root never rediscovers it as a bogus partition) —
  * never deleted by this function; a leftover retired copy from an
  * earlier run must be cleared by the CALLER (refusing to delete it
  * here is what makes the retired copy a real rollback artifact).
  *
  * Scope: a single physical directory. For a date-partitioned table,
  * compact each partition directory independently (which is also the
  * only shape that keeps the job incremental); passing the table root
  * is rejected rather than silently collapsing the layout. */
object Maintenance {

  final case class CompactionReport(
      filesBefore: Int, bytesBefore: Long,
      filesAfter: Int, bytesAfter: Long,
      rows: Long)

  private def parquetFiles(spark: SparkSession, dir: String): Seq[org.apache.hadoop.fs.FileStatus] = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(path).toSeq.filter(s =>
      s.isFile && s.getPath.getName.endsWith(".parquet"))
  }

  def compactParquet(spark: SparkSession, dir: String, sortCol: String,
                     targetFileBytes: Long = 128L * 1024 * 1024): CompactionReport = {
    val before = parquetFiles(spark, dir)
    require(before.nonEmpty,
      s"no top-level parquet files at $dir — for a partitioned table, " +
        "compact each partition directory independently")
    val bytesBefore = before.map(_.getLen).sum
    // at least one output file; sized from the REAL byte footprint, not
    // a row-count guess (row width varies wildly across tables)
    val nOut = math.max(1L, (bytesBefore + targetFileBytes - 1) / targetFileBytes).toInt
    val df = spark.read.parquet(dir)
    val p = new org.apache.hadoop.fs.Path(dir)
    // HIDDEN (dot-prefixed) sibling names: Spark/Hadoop file listing and
    // partition discovery skip them, so compacting one partition of a
    // partitioned table never makes the staging/retired copies visible
    // to readers of the table root as bogus partitions
    val staging = new org.apache.hadoop.fs.Path(
      p.getParent, s".${p.getName}.compacting").toString
    val retired = new org.apache.hadoop.fs.Path(
      p.getParent, s".${p.getName}.pre-compact").toString
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(!fs.exists(new org.apache.hadoop.fs.Path(retired)),
      s"$retired already exists — a previous compaction's rollback copy; " +
        "inspect and remove it before compacting again")
    // row count rides the write action via observe() — no second scan.
    // The metrics node must sit ABOVE the range exchange: when nOut > 1
    // the RangePartitioner runs its own sampling job over the exchange's
    // CHILD plan, and an observe placed below would be executed by that
    // pass too, reporting ~2x the true count (regression-pinned in
    // MaintenanceSpec; the nOut == 1 path plans no sampler, which is
    // why small-directory tests never saw it)
    val obs = org.apache.spark.sql.Observation(s"compact_${p.getName}")
    df.repartitionByRange(nOut, col(sortCol))
      .sortWithinPartitions(sortCol)
      .observe(obs, count(lit(1)).as("rows"))
      .write.mode("overwrite").parquet(staging)
    val rows = obs.get("rows").asInstanceOf[Long]
    require(fs.rename(p, new org.apache.hadoop.fs.Path(retired)),
      s"could not retire $dir — table untouched, but a full staged copy " +
        s"remains at $staging (delete it before retrying)")
    if (!fs.rename(new org.apache.hadoop.fs.Path(staging), p)) {
      // roll the original back so the table path never stays missing —
      // and report honestly when even that fails, so an operator knows
      // whether the data now lives at the table path or the retired one
      val rolledBack = fs.rename(new org.apache.hadoop.fs.Path(retired), p)
      throw new IllegalStateException(
        if (rolledBack)
          s"could not swap staging into $dir — original rolled back, staging left at $staging"
        else
          s"could not swap staging into $dir AND rollback failed — table path missing; data is at $retired, staging at $staging")
    }
    val after = parquetFiles(spark, dir)
    CompactionReport(before.size, bytesBefore, after.size, after.map(_.getLen).sum, rows)
  }

  /** File-level min/max of `sortCol` per parquet part file — the
    * pruning statistics a range-clustered layout produces. Disjoint
    * ranges across files mean a predicate on sortCol opens one file. */
  def fileRanges(spark: SparkSession, dir: String, sortCol: String) = {
    import spark.implicits._
    spark.read.parquet(dir)
      .select(input_file_name().as("file"), col(sortCol).cast("long").as("k"))
      .groupBy("file")
      .agg(min("k").as("k_min"), max("k").as("k_max"), count(lit(1)).as("rows"))
      .orderBy("k_min")
  }
}
