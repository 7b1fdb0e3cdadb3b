package graft.sources

import java.nio.file.{Files, Path, Paths}
import java.util
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import scala.jdk.CollectionConverters._
import scala.util.Using

/** `TableCatalog` plugin for manifest tables — the seam that makes
  * the lakehouse layer a full SQL citizen (the reference's users
  * speak SQL end-to-end; every `verify_*.py` audit there is a SQL
  * query — cf. `utils/importer/verify_products.sql`). Register once:
  *
  * {{{
  * spark.conf.set("spark.sql.catalog.graft",
  *   "graft.sources.GraftCatalog")
  * spark.conf.set("spark.sql.catalog.graft.root", "/warehouse")
  * }}}
  *
  * and every table is the directory `/warehouse/<name>` in
  * [[ManifestTable]]'s on-disk format — interchangeable with the
  * Scala API and `format("graft-manifest")` reads/writes on the same
  * path. Supported SQL surface:
  *
  *  - `SELECT ... FROM graft.t` — the pinned, zone-pruned DSv2 scan;
  *  - `SELECT ... FROM graft.t VERSION AS OF 3` — time travel (the
  *    catalog resolves the version-pinned snapshot);
  *  - `INSERT INTO graft.t ...` / `INSERT OVERWRITE` — the atomic
  *    DSv2 write (one optimistic manifest publish per job);
  *  - `CREATE TABLE graft.t (...) USING graft-manifest` — registers
  *    the directory (a marker file, so an empty table EXISTS before
  *    its first commit); the first INSERT publishes v1;
  *  - `DELETE FROM graft.t WHERE k BETWEEN a AND b` — plans through
  *    [[ManifestV2Table]]'s `SupportsDelete` onto the merge-on-read
  *    [[ManifestTable.deleteRangeDv]];
  *  - `DROP TABLE graft.t`.
  *
  * Identifiers are single-level (`graft.t`); namespaces map to
  * subdirectories (`graft.ns.t` → `/warehouse/ns/t`). Schemas are
  * DATA-derived (the by-name union of the live files' footers —
  * [[ManifestV2.schemaFor]]); a CREATE TABLE's declared column list
  * is honored for the pre-first-insert table object but the manifest
  * remains the source of truth once data lands (ACCEPT_ANY_SCHEMA —
  * the read side owns evolution). `ALTER`/`RENAME` are loud
  * unsupported (rename would invalidate snapshot paths). */
class GraftCatalog extends TableCatalog {

  private var catName: String = _
  private var root: Path = _

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catName = name
    root = Paths.get(Option(options.get("root")).getOrElse(
      Paths.get(System.getProperty("java.io.tmpdir"),
        "graft-catalog-root").toString))
    Files.createDirectories(root)
    ()
  }

  override def name(): String = catName

  private def dirOf(ident: Identifier): Path = {
    (ident.namespace.toSeq :+ ident.name).foreach { part =>
      require(part.nonEmpty && !part.contains("/") &&
          !part.contains("..") && !part.startsWith("."),
        s"illegal graft table identifier segment: $part")
    }
    ident.namespace.foldLeft(root)(_.resolve(_)).resolve(ident.name)
  }

  /** A table exists when its directory holds a published manifest
    * (any writer's) or the CREATE TABLE marker. */
  override def tableExists(ident: Identifier): Boolean = {
    val dir = dirOf(ident)
    Files.isDirectory(dir) &&
      (ManifestTable.versions(dir.toString).nonEmpty ||
        Files.exists(dir.resolve("_graft_table")))
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val ns = namespace.foldLeft(root)(_.resolve(_))
    if (!Files.isDirectory(ns)) Array.empty
    else Using.resource(Files.list(ns)) { st =>
      st.iterator().asScala
        .filter(Files.isDirectory(_))
        .map(p => Identifier.of(namespace, p.getFileName.toString))
        .filter(tableExists)
        .toArray
    }
  }

  private def load(ident: Identifier,
      version: Option[Long]): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val dir = dirOf(ident)
    val opts = ManifestV2Options(dir.toString, version)
    // data-derived schema once a snapshot exists; the CREATE TABLE
    // declaration (persisted in the marker) carries the
    // pre-first-insert table so INSERT INTO can resolve its columns
    val schema =
      if (ManifestTable.versions(dir.toString).nonEmpty ||
          version.isDefined)
        ManifestV2.schemaFor(opts)
      else {
        val marker = dir.resolve("_graft_table")
        val txt = Files.readString(marker).trim
        if (txt.startsWith("{"))
          org.apache.spark.sql.types.DataType.fromJson(txt)
            .asInstanceOf[StructType]
        else StructType(Seq.empty)
      }
    new ManifestV2Table(schema, opts)
  }

  override def loadTable(ident: Identifier): Table =
    load(ident, None)

  /** `VERSION AS OF n` — the SQL face of manifest time travel. */
  override def loadTable(ident: Identifier, version: String): Table =
    load(ident, Some(version.toLong))

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    require(partitions.isEmpty,
      "graft-manifest tables take no PARTITIONED BY — layout is " +
        "owned by OPTIMIZE (plain or clustered)")
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    val dir = dirOf(ident)
    Files.createDirectories(dir)
    // the marker records table existence AND the declared schema, so
    // the first INSERT INTO resolves its columns before any data
    Files.writeString(dir.resolve("_graft_table"), schema.json + "\n")
    new ManifestV2Table(schema,
      ManifestV2Options(dir.toString, None))
  }

  override def alterTable(ident: Identifier,
      changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "graft catalog: ALTER TABLE is not supported — the manifest's " +
        "read side owns schema evolution (append evolving data)")

  override def dropTable(ident: Identifier): Boolean = {
    if (!tableExists(ident)) return false
    val dir = dirOf(ident)
    Using.resource(Files.walk(dir)) { st =>
      st.sorted(java.util.Comparator.reverseOrder[Path]())
        .iterator().asScala.foreach(Files.delete)
    }
    true
  }

  override def renameTable(oldIdent: Identifier,
      newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "graft catalog: RENAME would invalidate the snapshot paths " +
        "inside published manifests")
}
