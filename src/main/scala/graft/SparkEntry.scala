package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The operator inventory lives in [[Queries]]; oracle SQL in [[Oracles]]. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the EXstream explanation pipeline applied to the generic events table
    * (per-user first-half/second-half windows, per-event-type features). */
  def entry(spark: SparkSession): DataFrame =
    Queries.exstreamExplain(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables — every query has one (hashing/sampling is
    * md5-based specifically so an independent engine reproduces it). */
  def oracleSql: Map[String, String] = Oracles.oracleSql
}
