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

/** FK-graph registry — the engine's analog of the reference's
  * information_schema FK discovery
  * (/root/reference/sql_query/collect_FK.sql:1-14, the 3-way
  * table_constraints ⋈ key_column_usage ⋈ constraint_column_usage
  * join). Parquet carries no FK metadata, so the graph is DECLARED
  * once per schema — one edge per (child_table, child_col,
  * parent_table, parent_col) — and everything downstream derives
  * from it: [[FkRegistry.rules]] compiles the whole graph to
  * [[graft.operators.Constraints.RefIntegrity]] audit rules (no more
  * hand-declaring one rule per table), and [[FkRegistry.asTable]]
  * exposes it in collect_FK.sql's own column layout for users who
  * query the catalog. */
object FkRegistry {

  /** One FK edge: every non-null child value must exist in the
    * parent column. */
  final case class Fk(childTable: String, childCol: String,
      parentTable: String, parentCol: String)

  /** The importer output schema's FK graph — mirrors the reference
    * catalog's DDL constraints (product → product_collection,
    * link/translation/details tables → their two sides;
    * /root/reference/utils/importer/backup_before_fix.sql table
    * definitions). */
  val importerSchema: Seq[Fk] = Seq(
    Fk("product", "collection_id",
      "product_collection", "collection_id"),
    Fk("collection_category", "collection_id",
      "product_collection", "collection_id"),
    Fk("collection_category", "category_id",
      "category", "category_id"),
    Fk("product_collection_translations", "collection_id",
      "product_collection", "collection_id"),
    Fk("collection_details_html", "collection_id",
      "product_collection", "collection_id"),
    Fk("collection_details_html", "details_html_id",
      "details_html", "details_html_id"))

  /** The TPC-H-shaped testdata schema's FK graph. */
  val testdataSchema: Seq[Fk] = Seq(
    Fk("nation", "n_regionkey", "region", "r_regionkey"),
    Fk("customer", "c_nationkey", "nation", "n_nationkey"),
    Fk("supplier", "s_nationkey", "nation", "n_nationkey"),
    Fk("orders", "o_custkey", "customer", "c_custkey"),
    Fk("lineitem", "l_orderkey", "orders", "o_orderkey"),
    Fk("lineitem", "l_partkey", "part", "p_partkey"),
    Fk("lineitem", "l_suppkey", "supplier", "s_suppkey"))

  /** Compile a graph to the audit rule set — the registry is the
    * single source of truth for referential-integrity checks. */
  def rules(edges: Seq[Fk]): Seq[graft.operators.Constraints.Rule] =
    edges.map(e => graft.operators.Constraints.RefIntegrity(
      e.childTable, e.childCol, e.parentTable, e.parentCol))

  /** The graph in collect_FK.sql's output layout (source_table,
    * source_column, target_table, target_column, constraint_name). */
  def asTable(spark: SparkSession, edges: Seq[Fk]): DataFrame = {
    import spark.implicits._
    edges.map(e => (e.childTable, e.childCol, e.parentTable,
        e.parentCol, s"fk_${e.childTable}_${e.childCol}"))
      .toDF("source_table", "source_column", "target_table",
        "target_column", "constraint_name")
  }
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
