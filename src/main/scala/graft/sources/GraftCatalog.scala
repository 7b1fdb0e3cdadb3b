package graft.sources

import java.nio.file.{Files, Path, Paths}
import java.util
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.{StructField, StructType}
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
  * [[ManifestV2.schemaFor]]) unioned with marker-DECLARED columns no
  * file carries yet; a CREATE TABLE's declared column list is
  * honored for the pre-first-insert table object but the manifest
  * remains the source of truth once data lands for the columns it
  * covers. `ALTER TABLE ... ADD COLUMN` (additive, nullable,
  * top-level) widens the declared schema — pre-evolution files read
  * the new column as NULL; every other ALTER and `RENAME` is loud
  * unsupported (they would rewrite history the immutable manifests
  * still reference). */
class GraftCatalog extends TableCatalog
    with org.apache.spark.sql.connector.catalog.ProcedureCatalog
    with org.apache.spark.sql.connector.catalog.FunctionCatalog {

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

  // marker format: line 1 = declared schema JSON; optional
  // `partition=a,b` line = declared partition columns
  private def declaredSchema(dir: Path): StructType = {
    val marker = dir.resolve("_graft_table")
    if (!Files.exists(marker)) return StructType(Seq.empty)
    val txt = Files.readString(marker)
    txt.linesIterator.find(_.trim.startsWith("{"))
      .map(l => org.apache.spark.sql.types.DataType.fromJson(l.trim)
        .asInstanceOf[StructType])
      .getOrElse(StructType(Seq.empty))
  }

  private def declaredPartCols(dir: Path): Option[Seq[String]] = {
    val marker = dir.resolve("_graft_table")
    if (!Files.exists(marker)) return None
    Files.readString(marker).linesIterator
      .find(_.startsWith("partition="))
      .map(l => ManifestBucket.splitSpecs(
        l.drop("partition=".length)))
      .filter(_.nonEmpty)
  }

  /** The table's declared DML mode (`merge.mode` table property —
    * the Iceberg `write.merge.mode` vocabulary): merge-on-read
    * tables commit MERGE/UPDATE/rewritten-DELETE as deletion-vector
    * deltas; copy-on-write (the default, also Iceberg's) rewrites
    * the matched files. */
  private def declaredMergeOnRead(dir: Path): Boolean = {
    val marker = dir.resolve("_graft_table")
    if (!Files.exists(marker)) return false
    Files.readString(marker).linesIterator
      .find(_.startsWith("merge.mode="))
      .exists(l => ManifestV2Options.mergeOnReadOf(
        l.drop("merge.mode=".length).trim))
  }

  /** Marker writes stage to a temp file and MOVE atomically into
    * place (mirroring the manifest publish's tmp-then-link
    * discipline): a concurrent load() never observes a torn,
    * half-written schema JSON. Unlike manifests the marker is
    * legitimately mutable (ALTER TABLE rewrites it), so the move
    * REPLACES — concurrent ALTERs serialize last-wins, which is the
    * standard single-marker catalog semantics; what the atomic move
    * rules out is the torn read. */
  private def writeMarker(dir: Path, schema: StructType,
      partCols: Option[Seq[String]],
      mergeOnRead: Boolean = false): Unit = {
    val tmp = dir.resolve(
      s".graft_table.${java.util.UUID.randomUUID().toString.take(12)}.tmp")
    Files.writeString(tmp,
      schema.json + "\n" +
        partCols.filter(_.nonEmpty)
          .map(cs => s"partition=${cs.mkString(",")}\n")
          .getOrElse("") +
        (if (mergeOnRead) "merge.mode=merge-on-read\n" else ""))
    Files.move(tmp, dir.resolve("_graft_table"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    ()
  }

  private def load(ident: Identifier,
      version: Option[Long]): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val dir = dirOf(ident)
    val opts = ManifestV2Options(dir.toString, version)
      .copy(mergeOnRead = declaredMergeOnRead(dir))
    // data-derived schema once a snapshot exists, UNIONED with any
    // marker-declared columns no data file carries yet (the ALTER
    // TABLE ADD COLUMN case — reads NULL-fill them through the
    // merged-footer evolution path, writes validate against the
    // widened schema). The CREATE TABLE declaration alone carries
    // the pre-first-insert table so INSERT INTO can resolve its
    // columns. A VERSION AS OF read stays purely data-derived: time
    // travel shows the snapshot as committed, not today's declared
    // widening.
    val schema =
      if (version.isDefined) ManifestV2.schemaFor(opts)
      else {
        val fromData =
          if (ManifestTable.versions(dir.toString).nonEmpty)
            ManifestV2.schemaFor(opts)
          else StructType(Seq.empty)
        val known = fromData.fieldNames.toSet
        declaredSchema(dir).fields
          .filterNot(f => known.contains(f.name))
          .foldLeft(fromData)(_ add _)
      }
    new ManifestV2Table(schema, opts,
      declaredPartCols = declaredPartCols(dir))
  }

  override def loadTable(ident: Identifier): Table =
    load(ident, None)

  /** `VERSION AS OF n` — the SQL face of manifest time travel. */
  override def loadTable(ident: Identifier, version: String): Table =
    load(ident, Some(version.toLong))

  /** `TIMESTAMP AS OF ts` — resolves to the NEWEST version committed
    * at or before the timestamp (the Delta convention; Spark hands
    * the literal over as epoch MICROseconds). Every publish stamps
    * `#at=<epochMillis>`; pre-stamp manifests fall back to file
    * mtime. Loud when the timestamp predates retained history. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val dir = dirOf(ident)
    load(ident, Some(ManifestTable.versionAt(dir.toString,
      Math.floorDiv(timestamp, 1000L))))
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    // PARTITIONED BY (col, ..., bucket(n, col)): identity transforms
    // (hive-style value partitioning) and hash buckets over declared
    // columns; every INSERT splits its rows per partition tuple and
    // records exact `#pval=` lines the scan prunes on BEFORE zone
    // stats — bucket specs additionally feed storage-partitioned
    // joins through this catalog's `bucket` function
    val partCols = partitions.toSeq.map(ManifestV2Table.specOf)
    partCols.foreach { spec =>
      val c = ManifestBucket.column(spec)
      require(schema.fieldNames.contains(c),
        s"PARTITIONED BY column $c is not in the declared schema")
    }
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    val dir = dirOf(ident)
    Files.createDirectories(dir)
    val mor = Option(properties.get("merge.mode"))
      .exists(ManifestV2Options.mergeOnReadOf)
    // the marker records table existence AND the declared schema, so
    // the first INSERT INTO resolves its columns before any data
    writeMarker(dir, schema, Some(partCols), mor)
    new ManifestV2Table(schema,
      ManifestV2Options(dir.toString, None, mergeOnRead = mor),
      declaredPartCols = if (partCols.isEmpty) None
        else Some(partCols))
  }

  /** `ALTER TABLE ... ADD COLUMN` — the ADDITIVE half of
    * catalog-declared schema evolution: the widened schema lands in
    * the marker file; reads NULL-fill the new column for
    * pre-evolution files (the merged-footer evolution contract the
    * read side already honors) and subsequent INSERTs validate
    * against — and may populate — it. Everything non-additive
    * (drop/rename/retype/reposition) stays loud-unsupported: those
    * would rewrite history the immutable manifests still reference.
    */
  override def alterTable(ident: Identifier,
      changes: TableChange*): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val dir = dirOf(ident)
    val current = loadTable(ident).asInstanceOf[ManifestV2Table]
    var schema = current.schema()
    changes.foreach {
      case add: TableChange.AddColumn =>
        require(add.fieldNames.length == 1,
          "graft catalog: ADD COLUMN supports top-level columns " +
            "only (manifest tables are flat relational)")
        val name = add.fieldNames.head
        require(!schema.fieldNames.contains(name),
          s"graft catalog: column $name already exists")
        require(add.isNullable,
          "graft catalog: added columns must be nullable — " +
            "pre-evolution rows read them as NULL")
        require(add.position == null,
          "graft catalog: ADD COLUMN takes no position — new " +
            "columns append (the by-name read contract makes order " +
            "cosmetic)")
        // loud on nested/unsupported types, same gate as the writer
        ManifestParquet.messageTypeOf(
          StructType(Seq(StructField(name, add.dataType))))
        schema = schema.add(StructField(name, add.dataType,
          nullable = true))
      case other =>
        throw new UnsupportedOperationException(
          s"graft catalog: only ADD COLUMN is supported " +
            s"(got ${other.getClass.getSimpleName}) — non-additive " +
            "changes would rewrite history the immutable manifests " +
            "still reference")
    }
    val mor = declaredMergeOnRead(dir)
    writeMarker(dir, schema, declaredPartCols(dir), mor)
    new ManifestV2Table(schema,
      ManifestV2Options(dir.toString, None, mergeOnRead = mor),
      declaredPartCols = declaredPartCols(dir))
  }

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

  /** Directory of a table named INSIDE a procedure argument
    * (`'t'` or `'ns.t'`) — same identifier hygiene as SQL access. */
  private[sources] def tableDirOf(name: String): Path = {
    val parts = name.split('.')
    val ident = Identifier.of(parts.dropRight(1), parts.last)
    require(tableExists(ident),
      s"graft catalog: no such table $name under $root")
    dirOf(ident)
  }

  // ---- SQL maintenance surface (ProcedureCatalog): -----------------
  //   CALL graft.optimize(table => 't' [, target_bytes, cluster_by,
  //     bits])       — plain or Hilbert-clustered compaction
  //   CALL graft.vacuum(table => 't' [, keep_versions, grace_ms])
  //   CALL graft.history(table => 't')   — DESCRIBE HISTORY shape
  // The SQL face of the Scala maintenance API (compact /
  // compactClustered / vacuum / history) — same seams, so post-state
  // is identical whichever surface ran the job.

  override def listProcedures(
      namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty)
      GraftProcedures.names.map(n =>
        Identifier.of(Array.empty[String], n))
    else Array.empty

  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures
        .UnboundProcedure = {
    require(ident.namespace.isEmpty,
      s"graft catalog: procedures live at the catalog root " +
        s"(got namespace ${ident.namespace.mkString(".")})")
    GraftProcedures.load(this, ident.name)
  }

  // ---- FunctionCatalog: the `bucket` partition function — what
  // lets Spark RESOLVE a bucket-transform KeyGroupedPartitioning
  // reported by a manifest scan (V2ExpressionUtils resolves the
  // transform through the table's catalog), so two same-bucketed
  // tables storage-partition join exchange-free. The bound function
  // computes the SAME canonical hash the writer routed rows by
  // ([[ManifestBucket]]) — Spark may evaluate it when one join side
  // needs a runtime repartition onto the other's bucket layout.

  override def listFunctions(namespace: Array[String])
      : Array[Identifier] =
    if (namespace.isEmpty)
      Array(Identifier.of(Array.empty[String], "bucket"))
    else Array.empty

  override def loadFunction(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.functions
        .UnboundFunction = {
    if (ident.namespace.nonEmpty || ident.name != "bucket")
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchFunctionException(ident)
    GraftBucketFunction
  }
}

/** The catalog's `bucket(n, key)` partition function (public-API
  * analog of Iceberg's SparkFunctions bucket): binds per key type
  * and computes [[ManifestBucket]]'s canonical id. `canonicalName`
  * is keyed by the HASH family, not the exact input type — an
  * integer-bucketed table joins a long-bucketed one because both
  * sides hash through the same int64 encoding. */
object GraftBucketFunction
    extends org.apache.spark.sql.connector.catalog.functions
      .UnboundFunction {
  import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction}
  import org.apache.spark.sql.types._

  override def name(): String = "bucket"
  override def description(): String =
    "bucket(n, key): graft canonical hash-bucket id in [0, n)"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2 &&
        inputType.fields(0).dataType == IntegerType,
      s"bucket expects (buckets INT, key); got $inputType")
    inputType.fields(1).dataType match {
      case LongType | IntegerType | DateType | TimestampType =>
        new Int64Bucket(inputType.fields(1).dataType)
      case StringType => StringBucket
      case other => throw new UnsupportedOperationException(
        s"bucket: unsupported key type $other (integer, date, " +
          "timestamp, and string keys bucket)")
    }
  }

  private final class Int64Bucket(dt: DataType)
      extends ScalarFunction[Integer] {
    override def inputTypes(): Array[DataType] =
      Array(IntegerType, dt)
    override def resultType(): DataType = IntegerType
    override def name(): String = "bucket"
    override def canonicalName(): String = "graft.bucket(int64)"
    override def produceResult(
        input: org.apache.spark.sql.catalyst.InternalRow): Integer =
      if (input.isNullAt(1)) null
      else {
        val v = dt match {
          case LongType | TimestampType => input.getLong(1)
          case _ => input.getInt(1).toLong
        }
        Integer.valueOf(ManifestBucket.idOfLong(v, input.getInt(0)))
      }
  }

  private object StringBucket extends ScalarFunction[Integer] {
    override def inputTypes(): Array[org.apache.spark.sql.types
      .DataType] = Array(IntegerType, StringType)
    override def resultType(): org.apache.spark.sql.types.DataType =
      IntegerType
    override def name(): String = "bucket"
    override def canonicalName(): String = "graft.bucket(string)"
    override def produceResult(
        input: org.apache.spark.sql.catalyst.InternalRow): Integer =
      if (input.isNullAt(1)) null
      else Integer.valueOf(ManifestBucket.idOfBytes(
        input.getUTF8String(1).getBytes, input.getInt(0)))
  }
}

/** The catalog's maintenance procedures. Each is bound trivially
  * (parameters are scalars; Spark aligns positional/named args and
  * fills declared defaults) and returns ONE LocalScan of result rows
  * — the DSv2 procedure contract. Side-effecting, so
  * `isDeterministic = false` keeps the planner from caching a CALL.
  */
private[sources] object GraftProcedures {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
  import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
  import org.apache.spark.sql.connector.read.{LocalScan, Scan}
  import org.apache.spark.sql.types._
  import org.apache.spark.unsafe.types.UTF8String

  val names: Array[String] = Array("optimize", "vacuum", "history")

  def load(cat: GraftCatalog, name: String): UnboundProcedure =
    name match {
      case "optimize" => new Optimize(cat)
      case "vacuum" => new Vacuum(cat)
      case "history" => new History(cat)
      case other => throw new UnsupportedOperationException(
        s"graft catalog: no procedure $other " +
          s"(have ${names.mkString(", ")})")
    }

  private abstract class P(pname: String) extends UnboundProcedure
      with BoundProcedure {
    override def name(): String = pname
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    protected def result(schema: StructType,
        data: Array[InternalRow]): java.util.Iterator[Scan] =
      java.util.List.of[Scan](new LocalScan {
        override def rows(): Array[InternalRow] = data
        override def readSchema(): StructType = schema
        override def description(): String =
          s"graft.$pname result"
      }).iterator()
  }

  private def p(n: String, dt: DataType): ProcedureParameter =
    ProcedureParameter.in(n, dt).build()
  private def pd(n: String, dt: DataType,
      default: String): ProcedureParameter =
    ProcedureParameter.in(n, dt).defaultValue(default).build()

  /** `CALL graft.optimize(table => 't')` — plain bin-packing
    * compaction; pass `cluster_by => 'a,b'` for the Hilbert-clustered
    * rewrite (the Scala `compactClustered` seam), or
    * `partition_col/partition_value` to compact ONE partition of a
    * partitioned table (the `compactPartition` seam — the realistic
    * 100 TB maintenance shape). Returns the published version and
    * before/after file counts — the same triple the Scala API hands
    * back. */
  private final class Optimize(cat: GraftCatalog)
      extends P("optimize") {
    override def description(): String =
      "compact a manifest table (whole, Hilbert-clustered, or one " +
        "partition)"
    override def parameters(): Array[ProcedureParameter] = Array(
      p("table", StringType),
      pd("target_bytes", LongType, "134217728"),
      pd("cluster_by", StringType, "''"),
      pd("bits", IntegerType, "12"),
      pd("partition_col", StringType, "''"),
      pd("partition_value", StringType, "''"))
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val dir = cat.tableDirOf(input.getUTF8String(0).toString).toString
      val spark = org.apache.spark.sql.SparkSession.active
      val targetBytes = input.getLong(1)
      val clusterBy = input.getUTF8String(2).toString.split(',')
        .map(_.trim).filter(_.nonEmpty).toSeq
      val partCol = input.getUTF8String(4).toString.trim
      require(clusterBy.isEmpty || partCol.isEmpty,
        "optimize takes cluster_by OR partition_col, not both")
      val (v, before, after) =
        if (partCol.nonEmpty)
          ManifestTable.compactPartition(spark, dir, targetBytes,
            partCol, input.getUTF8String(5).toString)
        else if (clusterBy.isEmpty)
          ManifestTable.compact(spark, dir, targetBytes)
        else ManifestTable.compactClustered(spark, dir, targetBytes,
          clusterBy, input.getInt(3))
      result(
        StructType(Seq(StructField("version", LongType),
          StructField("files_before", IntegerType),
          StructField("files_after", IntegerType))),
        Array(new GenericInternalRow(Array[Any](v, before, after))))
    }
  }

  /** `CALL graft.vacuum(table => 't', keep_versions => 3)` — the
    * retention sweep; `grace_ms` is the in-flight-writer guard
    * (default 20 min — pass 0 only when no writer can be racing). */
  private final class Vacuum(cat: GraftCatalog) extends P("vacuum") {
    override def description(): String =
      "delete data files unreferenced by the newest keep_versions " +
        "manifests"
    override def parameters(): Array[ProcedureParameter] = Array(
      p("table", StringType),
      pd("keep_versions", IntegerType, "1"),
      pd("grace_ms", LongType, (20L * 60L * 1000L).toString))
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val dir = cat.tableDirOf(input.getUTF8String(0).toString).toString
      val (live, deleted) = ManifestTable.vacuum(dir,
        input.getInt(1), input.getLong(2))
      result(
        StructType(Seq(StructField("live_files", IntegerType),
          StructField("deleted_files", IntegerType))),
        Array(new GenericInternalRow(Array[Any](live, deleted))))
    }
  }

  /** `CALL graft.history(table => 't')` — DESCRIBE HISTORY: one
    * metadata-only row per live version (version, file count, exact
    * live row count or −1, DV positions, idempotence tag). */
  private final class History(cat: GraftCatalog) extends P("history") {
    override def description(): String =
      "one audit row per live version of a manifest table"
    override def parameters(): Array[ProcedureParameter] =
      Array(p("table", StringType))
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val dir = cat.tableDirOf(input.getUTF8String(0).toString).toString
      val df = ManifestTable.history(
        org.apache.spark.sql.SparkSession.active, dir)
      result(df.schema,
        df.queryExecution.executedPlan.executeCollect()
          .map(_.copy(): InternalRow))
    }
  }
}
