package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table registry — the engine's replacement for the reference's
  * information_schema introspection (SURVEY.md §1.3;
  * /root/reference/sql_query/collect_db_fields.sql:1-8). Tables are
  * directories/files of parquet under a root; schema discovery is
  * `df.schema`, column discovery is `spark.catalog`.
  */
final case class Catalog(spark: SparkSession, root: String) {

  /** Load one table. Path layout: `<root>/<name>.parquet`. */
  def table(name: String): DataFrame =
    spark.read.parquet(s"$root/$name.parquet")

  def apply(name: String): DataFrame = table(name)

  /** Column names of a table — replaces collect_db_fields.sql. */
  def columnsOf(name: String): Seq[String] =
    table(name).schema.fieldNames.toSeq

  /** Does the table have the given column — replaces the
    * information_schema existence probes
    * (/root/reference/utils/universal_translator.py:75-108). */
  def hasColumn(name: String, column: String): Boolean =
    columnsOf(name).contains(column)
}

/** Mapping-driven projection config — the map.csv contract
  * (/root/reference/utils/importer/ETL.py:93-99): raw input column →
  * (target table, target column). The one driver-side collect the
  * engine allows: the mapping is config, not data. */
final case class ColumnMapping(entries: Seq[ColumnMapping.Entry]) {
  import org.apache.spark.sql.functions.col

  /** Projection list for one target table: select+rename of every raw
    * column mapped into it (SURVEY.md P1). */
  def projectionFor(table: String): Seq[org.apache.spark.sql.Column] =
    entries.filter(e => e.table == table && e.field.nonEmpty)
      .map(e => col(e.raw).alias(e.field))
}

object ColumnMapping {
  final case class Entry(raw: String, table: String, field: String)

  /** Load from a mapping CSV with header
    * raw_input_field,db_table,field. */
  def fromCsv(spark: SparkSession, path: String): ColumnMapping = {
    val rows = spark.read.option("header", "true").csv(path)
      .select("raw_input_field", "db_table", "field")
      .collect()
    ColumnMapping(rows.toSeq.map(r =>
      Entry(r.getString(0),
        Option(r.getString(1)).getOrElse(""),
        Option(r.getString(2)).getOrElse(""))))
  }
}
