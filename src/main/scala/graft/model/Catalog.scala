package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table registry — the engine's replacement for the reference's
  * information_schema introspection (SURVEY.md §1.3;
  * /root/reference/sql_query/collect_db_fields.sql:1-8). Tables are
  * directories/files of parquet under a root; schema discovery is
  * `df.schema`, column discovery is `spark.catalog`.
  *
  * A `root` starting with `jdbc:` switches every table to Spark's
  * JDBC source — the reference's ACTUAL read path is a live Postgres
  * (/root/reference/utils/custom_attributes_parser.py:8,
  * utils/product_attributes_etl.py:22-30), and this seam makes the
  * same registry serve either backing store with no caller changes.
  * `jdbcOptions` passes driver/credentials and, crucially, the
  * parallel-read knobs: at scale a JDBC table read without
  * `partitionColumn`/`lowerBound`/`upperBound`/`numPartitions` is ONE
  * executor holding one cursor — set them (or `predicates`) so the
  * scan fans out; Spark still pushes filters and prunes columns
  * through the JDBC source (`PushedFilters` shows in `.explain`).
  *
  * Dialect map for the reference's actual DDL (PostgreSQL 17,
  * backup_before_fix.sql:42-525) → Spark arrival types through this
  * seam (Spark's PostgresDialect):
  *   - `uuid`         → StringType — the pg driver reports JDBC
  *     OTHER and Spark reads the 36-char text, the exact shape
  *     [[graft.functions.deterministicId]] emits, so parquet- and
  *     pg-backed ids join without casts.
  *   - `text[]`       → ArrayType(StringType) natively under
  *     PostgresDialect; the embedded Derby spec stands in with a
  *     delimited VARCHAR + `split` at the read seam.
  *   - `timestamptz`  → TimestampType (an instant; rendered in the
  *     Spark session timezone — set `spark.sql.session.timeZone` to
  *     the warehouse zone for byte-stable output).
  *   - `numeric(p,s)` → DecimalType(p,s); UNBOUNDED `numeric`
  *     arrives as DecimalType(38,18) — cast down explicitly where
  *     the schema declares no precision.
  *   - `jsonb`/`json` → StringType; parse with `from_json` + schema.
  * The Derby-backed SchemasSpec proves the seam mechanics (registry
  * API, filter pushdown, partitioned fan-out, typed arrival) with
  * the closest embedded types: CHAR(36) uuid shape, delimited
  * VARCHAR array, TIMESTAMP, DECIMAL(12,2).
  */
final case class Catalog(spark: SparkSession, root: String,
    jdbcOptions: Map[String, String] = Map.empty) {

  /** True when the registry is backed by a database, not parquet. */
  val isJdbc: Boolean = root.startsWith("jdbc:")

  /** Load one table. Parquet layout: `<root>/<name>.parquet`;
    * JDBC: `dbtable = <name>` against the `root` URL. */
  def table(name: String): DataFrame =
    if (isJdbc)
      spark.read.format("jdbc")
        .option("url", root).option("dbtable", name)
        .options(jdbcOptions).load()
    else spark.read.parquet(s"$root/$name.parquet")

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
      "details_html", "details_html_id"),
    Fk("collection_img_array", "collection_id",
      "product_collection", "collection_id"),
    Fk("collection_img_array", "img_array_id",
      "img_array", "img_array_id"),
    Fk("product_collection_translations", "lang_code",
      "lang", "lang_code"),
    Fk("source_translations", "source_id",
      "source", "source_id"))

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
    * column mapped into it (SURVEY.md P1), casting to the entry's
    * declared type when the mapping carries one — the older importer
    * variant's `Type` column
    * (/root/reference/utils/importer/importer_etl.py:21-28); typed
    * targets no longer rely on downstream casts. */
  def projectionFor(table: String): Seq[org.apache.spark.sql.Column] =
    entries.filter(e => e.table == table && e.field.nonEmpty)
      .map { e =>
        val c = col(e.raw)
        if (e.dtype.trim.isEmpty) c.alias(e.field)
        else ColumnMapping.sparkTypeOf(e.dtype) match {
          case Some(t) => c.cast(t).alias(e.field)
          // a typed entry that resolves to nothing is a mapping-file
          // typo — fail loud, never silently skip the cast
          case None => throw new IllegalArgumentException(
            s"mapping entry ${e.raw} -> ${e.table}.${e.field}: " +
              s"unknown type '${e.dtype}' (use a Postgres name like " +
              "integer/numeric/text or a Spark DDL type)")
        }
      }
}

object ColumnMapping {
  final case class Entry(raw: String, table: String, field: String,
      dtype: String = "")

  /** Map the mapping-CSV's db-flavored type names onto Spark cast
    * targets. Empty → None (untyped entry, no cast — old mapping
    * files keep their exact semantics). Postgres names map to their
    * Spark equivalents; anything else is accepted iff Spark's DDL
    * parser recognizes it (`int`, `decimal(10,2)`, …), else None —
    * [[ColumnMapping.projectionFor]] turns that None into a loud
    * config error for typed entries. */
  def sparkTypeOf(dtype: String): Option[String] = {
    val t = dtype.trim.toLowerCase
    if (t.isEmpty) None // untyped entry: the pre-Type behavior
    else t match {
      case "text" | "varchar" => Some("string")
      case "integer" | "int4" | "serial" => Some("int")
      case "bigint" | "int8" | "bigserial" => Some("long")
      case "numeric" | "decimal" => Some("decimal(38,9)")
      case "real" | "float4" => Some("float")
      case "double precision" | "float8" => Some("double")
      case "boolean" | "bool" => Some("boolean")
      case "date" => Some("date")
      case "timestamp" | "timestamptz" => Some("timestamp")
      case other =>
        scala.util.Try(
          org.apache.spark.sql.types.DataType.fromDDL(other))
          .toOption.map(_ => other)
    }
  }

  /** Load from a mapping CSV with header
    * raw_input_field,db_table,field[,type] — the `type` column is
    * optional, matching both reference mapping-file generations. */
  def fromCsv(spark: SparkSession, path: String): ColumnMapping = {
    val df = spark.read.option("header", "true").csv(path)
    val hasType = df.columns.contains("type")
    val rows = (if (hasType)
        df.select("raw_input_field", "db_table", "field", "type")
      else df.select("raw_input_field", "db_table", "field"))
      .collect()
    ColumnMapping(rows.toSeq.map(r =>
      Entry(r.getString(0),
        Option(r.getString(1)).getOrElse(""),
        Option(r.getString(2)).getOrElse(""),
        if (hasType) Option(r.getString(3)).getOrElse("") else "")))
  }
}
