package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dynamic predicate assembly (SURVEY.md P6) — the engine's analog of
  * the reference's env-driven optional filters + LIMIT
  * (/root/reference/utils/details_translator/db_orchestrator.py:155-174):
  * each filter is applied only when its config value is present, so
  * one pipeline serves point-lookup, scoped, and full-scan runs.
  * Because the filters land in the logical plan before optimization,
  * Catalyst pushes them into the scan — config-driven does not mean
  * pushdown-defeating.
  */
object Predicates {

  sealed trait Spec { def toFilter: Column }
  final case class Eq(col: String, v: Any) extends Spec {
    def toFilter: Column = org.apache.spark.sql.functions.col(col) === lit(v)
  }
  final case class Ge(col: String, v: Any) extends Spec {
    def toFilter: Column = org.apache.spark.sql.functions.col(col) >= lit(v)
  }
  final case class Like(col: String, pattern: String) extends Spec {
    def toFilter: Column = org.apache.spark.sql.functions.col(col).like(pattern)
  }
  final case class NotNull(col: String) extends Spec {
    def toFilter: Column = org.apache.spark.sql.functions.col(col).isNotNull
  }

  /** Apply every present filter, then the optional limit. */
  def assemble(df: DataFrame, specs: Seq[Option[Spec]],
      limit: Option[Int] = None): DataFrame = {
    val filtered = specs.flatten.foldLeft(df)((d, s) => d.filter(s.toFilter))
    limit.fold(filtered)(filtered.limit)
  }
}
