package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the full query catalog: each entry is an operator/capability
  * from SURVEY.md §2 (or a north-star extension), and — where expressible
  * in ANSI SQL — has a DuckDB oracle with byte-matching column names and
  * deterministic (exact-decimal / epoch-second) output types.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ TextQueries.queries ++ ConnectorQueries.queries ++
      MultimodalQueries.queries ++ SketchQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ TextQueries.oracles ++ ConnectorQueries.oracles ++
      MultimodalQueries.oracles ++ SketchQueries.oracles
}
