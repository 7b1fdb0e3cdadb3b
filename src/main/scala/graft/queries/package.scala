package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

package object queries {

  /** One declared query of the engine's [Q] inventory (SURVEY.md §2):
    * a Spark pipeline plus (when SQL-expressible) the equivalent ANSI
    * SQL for the DuckDB oracle. Determinism contract for oracle
    * hashing:
    *  - result ends with ORDER BY on a unique column tuple;
    *  - double aggregates go through exact DECIMAL arithmetic and are
    *    cast to double only at the end (bit-identical across engines);
    *  - float folds (dot products, rolling hashes) are ORDERED left
    *    folds on both sides;
    *  - timestamps are emitted as epoch microseconds (bigint);
    *  - integer outputs are bigint on both sides.
    */
  final case class Q(
      name: String,
      fn: (SparkSession, String) => DataFrame,
      oracle: Option[String])

  /** Load one testdata table (TESTDATA.md layout). */
  def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")
}
