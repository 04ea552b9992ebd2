package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{ConnectorRegistry, RelationalRegistry, SimilarityRegistry, TextRegistry}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries`: one entry per implemented operator from SURVEY.md §2;
  * `oracleSql`: DuckDB-runnable equivalent for the driver's
  * hash-compare (omitted for rows-only operators whose semantics are
  * not ANSI-SQL-expressible).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.q1PricingSummary(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalRegistry.queries ++ TextRegistry.queries ++
      SimilarityRegistry.queries ++ ConnectorRegistry.queries

  def oracleSql: Map[String, String] =
    RelationalRegistry.oracle ++ TextRegistry.oracle ++
      SimilarityRegistry.oracle ++ ConnectorRegistry.oracle
}
