package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The [Q] inventory lives in graft.queries.*; this object is only the
  * aggregation point the driver grades.
  */
object SparkEntry {

  /** Every declared query of the engine, keyed by name. */
  def inventory: Seq[Q] =
    Relational.all ++ Merges.all ++ Functions.all ++ Text.all ++
      Vectors.all ++ Pipelines.all ++ SqlSurface.all ++ Approx.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. The TPC-H-Q1-shaped multi-key aggregation. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_a7_multikey_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    inventory.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted entries get a rows-only check. */
  def oracleSql: Map[String, String] =
    inventory.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
