package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries are contributed by per-family registries under graft.queries;
  * every SQL-expressible query carries DuckDB oracle SQL. */
object SparkEntry {

  private def registries: Seq[QueryRegistry] = Seq(
    TaggerQueries,
    RelationalQueries,
    Relational2Queries,
    Relational3Queries,
    Relational4Queries,
    Relational5Queries,
    AggQueries,
    StatsQueries,
    ScalarFuncQueries,
    SinkQueries,
    SetOpQueries,
    EventsQueries,
    AdvancedQueries,
    GraphQueries,
    MlStatsQueries,
    TextQueries,
    DedupQueries,
    SimilarityQueries,
    ImageQueries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's end-to-end pipeline: score vectors → tag strings. */
  def entry(spark: SparkSession): DataFrame =
    queries("tagger_pipeline")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registries.flatMap(_.all).map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registries.flatMap(_.all).flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
