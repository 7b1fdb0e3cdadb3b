package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsDelete, SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** [[ManifestTable]] as a FIRST-CLASS Spark source:
  * `spark.read.format("graft-manifest").option("path", dir)` — the
  * DataSourceV2 integration that makes the lakehouse layer a PLANNER
  * citizen instead of a Scala-API helper:
  *
  *  - **snapshot selection** (time travel) via `.option("version",
  *    n)` — resolved against the manifest exactly like
  *    [[ManifestTable.read]], and PINNED: each scan resolves its
  *    snapshot exactly once, so every planning call (filter
  *    selection, aggregate pushdown, partition planning) and every
  *    re-execution of the same DataFrame sees one version even under
  *    concurrent commits — the Delta/Iceberg pin-at-scan rule;
  *  - **zone pruning reaches the planner**: range filters on stats
  *    columns plan one InputPartition per SURVIVING file — a pruned
  *    query's scan has fewer partitions, visible in `.explain` and
  *    `rdd.getNumPartitions`. Integer, DATE (epoch-day) and
  *    TIMESTAMP (epoch-microsecond) predicates prune on the int64
  *    `#stats=` lines; STRING predicates prune on the `#sstats=`
  *    hex-UTF-8 lines by unsigned byte comparison. Pushed filters
  *    are also re-applied row-level by Spark (declared residual), so
  *    skipping stays an optimization, never a filter;
  *  - **metadata-only COUNT(*)**: a global count with no residual
  *    filters answers COMPLETELY from the manifest's `#nrows=` lines
  *    (minus deletion-vector cardinalities) — one small-file read,
  *    zero data I/O, through the planner's aggregate-pushdown seam;
  *    declined (normal scan) whenever any live file lacks a count;
  *  - **deletion vectors apply**: each InputPartition carries its
  *    file's dead positions and the reader skips them by ordinal —
  *    a DSv2 read of a DV'd snapshot is value-identical to
  *    [[ManifestTable.read]];
  *  - **SQL DELETE**: the table implements `SupportsDelete`, so
  *    `DELETE FROM <catalog>.<table> WHERE k BETWEEN a AND b` plans
  *    through Catalyst onto [[ManifestTable.deleteRangeDv]] — a
  *    small ranged purge commits a deletion-vector-only version with
  *    ZERO rewritten data files;
  *  - **streaming CDC source**: `spark.readStream
  *    .format("graft-manifest")` with `.option("startingVersion",
  *    v)` (INCLUSIVE, the Delta convention) serves each committed
  *    version's ADDED files as ONE micro-batch (admission-controlled
  *    — pending versions never coalesce) — offsets are manifest
  *    versions, manifests are immutable, so checkpoint replays
  *    re-plan identical batches (exactly-once);
  *  - **planner statistics**: the scan reports
  *    `SupportsReportStatistics` from the manifest's free metadata
  *    (file bytes, `#nrows=` minus DV cardinalities), POST-pruning —
  *    Catalyst broadcasts small manifest dims at plan time;
  *  - **hive-style partitioning**: `partitionColumns` writes split
  *    per value with exact `#pval=` lines; partition Eq/range/IN
  *    predicates prune BEFORE zone stats, `partitioning()` exposes
  *    the identity transforms, appends inherit the layout;
  *  - **LIMIT pushdown** (partial): `LIMIT k` plans only the files
  *    whose counted rows prove k satisfiable;
  *  - **streaming sink**: `writeStream.format("graft-manifest")`
  *    commits ONE tagged version per epoch
  *    (`stream:<queryId>:<epochId>`) — checkpoint replays
  *    short-circuit, exactly-once at the SQL surface;
  *  - **vectorized reads**: scans plan COLUMNAR through Spark's own
  *    vectorized parquet reader (ColumnarBatch into whole-stage
  *    codegen); DV'd files stay columnar via a zero-copy
  *    row-id-mapping mask ([[FilteredColumnVector]]); the row path
  *    remains exactly where row-level semantics demand it
  *    (`_graft_pos`);
  *  - **row-group splits**: files past ~1.5× `splitBytes` (default
  *    128 MiB) plan several row-group-aligned InputPartitions — no
  *    straggler task on a hot compacted file;
  *  - **runtime file pruning**: `SupportsRuntimeV2Filtering` — a
  *    fact ⋈ selective-dim join re-prunes the fact's files from the
  *    dim's join keys at execution time (the Delta-DFP shape);
  *  - **merge-on-read DML**: tables with `merge.mode=merge-on-read`
  *    plan SQL MERGE/UPDATE/DELETE as position deltas
  *    ([[ManifestDeltaOperation]]) — DV lines + one insert file,
  *    zero rewrites — with the `dvMaxFraction` budget enforcing the
  *    copy-on-write fallback at commit;
  *  - **storage-partitioned joins**: partitioned tables report
  *    KeyGroupedPartitioning (each partition exposes its `#pval`
  *    tuple), so same-key manifest⋈manifest joins plan with no
  *    exchange under `spark.sql.sources.v2.bucketing.enabled`;
  *  - **NDV column statistics**: per-file `#ndv=` HLL sketches merge
  *    over the surviving files into `columnStats` distinct/null
  *    counts — CBO join cardinality and broadcast decisions run on
  *    manifest arithmetic.
  *
  * The partition reader decodes parquet directly via parquet-mr's
  * Group API (the same bundled library Spark's own scan uses
  * underneath) with the projection pushed into the read schema —
  * column pruning costs nothing at the I/O layer. Surface contract:
  * FLAT relational snapshots (boolean/int/long/float/double/binary/
  * string/date/timestamp-micros columns — what the manifest DML
  * writes); nested types fail loudly at schema inference. Schema is
  * the by-name union of the LIVE files' footers (the S16 read-side
  * evolution contract: files missing a late column read it as NULL).
  */
class ManifestTableProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-manifest"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ManifestV2.schemaFor(ManifestV2Options(options))

  override def getTable(schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = ManifestV2Options(
      new CaseInsensitiveStringMap(properties))
    // partition columns: explicit transforms (writeTo.partitionedBy)
    // win; else the `partitionColumns` option; else inherited from
    // the current snapshot's pvals (appends keep a partitioned
    // table partitioned without restating the spec)
    val declared =
      if (partitioning.nonEmpty)
        Some(partitioning.toSeq.map(ManifestV2Table.specOf))
      else Option(properties.get("partitionColumns"))
        .map(ManifestBucket.splitSpecs)
        .filter(_.nonEmpty)
    new ManifestV2Table(schema, opts, acceptAnySchema = true,
      declaredPartCols = declared)
  }
}

private[sources] object ManifestV2Table {
  /** The transform shapes manifest tables support, rendered to the
    * canonical partition-spec string: identity over a top-level
    * column (hive-style value partitioning) and `bucket(n, col)`
    * (hash buckets over a high-NDV key — [[ManifestBucket]]). */
  def specOf(t: Transform): String = {
    require(t.references.length == 1 &&
        t.references.head.fieldNames.length == 1,
      s"graft-manifest partition transforms take ONE top-level " +
        s"column; got $t")
    val c = t.references.head.fieldNames.head
    t.name match {
      case "identity" => c
      case "bucket" =>
        val n = t.arguments.collectFirst {
          case l: org.apache.spark.sql.connector.expressions
            .Literal[_] if l.value.isInstanceOf[Number] =>
            l.value.asInstanceOf[Number].intValue()
        }.getOrElse(throw new IllegalArgumentException(
          s"bucket transform without a bucket count: $t"))
        ManifestBucket.render(c, Some(n))
      case other => throw new IllegalArgumentException(
        s"graft-manifest supports identity and bucket partition " +
          s"transforms only; got $other")
    }
  }
}

/** Table options (serializable — shipped to tasks). `dvMaxFraction`
  * tunes SQL DELETE's merge-on-read crossover (see
  * [[ManifestTable.deleteRangeDv]]); `startingVersion` is the CDC
  * stream's INCLUSIVE lower bound (the Delta CDF convention:
  * `startingVersion = v` delivers v's own files onward; default 0 =
  * everything). */
final case class ManifestV2Options(path: String, version: Option[Long],
    dvMaxFraction: Double = 0.5, startingVersion: Long = 0L,
    splitBytes: Long = ManifestV2Options.DefaultSplitBytes,
    mergeOnRead: Boolean = false)
    extends Serializable

object ManifestV2Options {
  /** Target bytes per scan InputPartition — files past ~1.5× this
    * split on row-group boundaries (Spark's own
    * `files.maxPartitionBytes` default). `splitBytes=0` disables. */
  val DefaultSplitBytes: Long = 128L * 1024 * 1024

  /** `merge.mode` values — the Iceberg `write.merge.mode` vocabulary. */
  def mergeOnReadOf(v: String): Boolean = v match {
    case "merge-on-read" => true
    case "copy-on-write" => false
    case other => throw new IllegalArgumentException(
      s"merge.mode must be copy-on-write or merge-on-read: $other")
  }

  def apply(o: CaseInsensitiveStringMap): ManifestV2Options = {
    val p = o.get("path")
    require(p != null, "graft-manifest requires option 'path'")
    ManifestV2Options(p, Option(o.get("version")).map(_.toLong),
      Option(o.get("dvMaxFraction")).map(_.toDouble).getOrElse(0.5),
      Option(o.get("startingVersion")).map(_.toLong).getOrElse(0L),
      Option(o.get("splitBytes")).map(_.toLong)
        .getOrElse(DefaultSplitBytes),
      Option(o.get("merge.mode")).exists(mergeOnReadOf))
  }
}

object ManifestV2 {

  /** One live file of the planned snapshot: absolute path, its
    * deletion-vector positions (sorted), and the manifest row count
    * when recorded. */
  final case class FileSlice(path: String, dv: Array[Long],
      rows: Option[Long]) extends Serializable

  /** One RESOLVED snapshot, pinned for the life of a scan: version,
    * live files, per-RELATIVE-path zone stats (integer `#stats=`
    * and string `#sstats=` lines), and per-file partition values
    * (`#pval=` lines — exact, pruned BEFORE zone stats). */
  final case class Pinned(version: Long, slices: Seq[FileSlice],
      stats: Map[String, Seq[(String, Long, Long)]],
      sstats: Map[String, Seq[(String, String, String)]],
      pvals: Map[String, Seq[(String, String)]],
      ndvs: Map[String, Seq[(String, Long, String, String)]] =
        Map.empty)

  /** Resolve the snapshot ONCE — callers hold the result so every
    * subsequent planning/execution step sees the same version. */
  def resolvePinned(opts: ManifestV2Options): Pinned = {
    val snap = ManifestTable.snapshotFor(opts.path, opts.version)
    val root = java.nio.file.Paths.get(opts.path)
    val slices = snap.files.map { f =>
      FileSlice(root.resolve(f).toString,
        snap.dvs.getOrElse(f, Seq.empty).toArray,
        snap.rows.get(f))
    }
    Pinned(snap.version, slices,
      snap.files.map(f =>
        f -> snap.stats.getOrElse(f, Seq.empty)).toMap,
      snap.files.map(f =>
        f -> snap.sstats.getOrElse(f, Seq.empty)).toMap,
      snap.files.map(f =>
        f -> snap.pvals.getOrElse(f, Seq.empty)).toMap,
      snap.files.map(f =>
        f -> snap.ndvs.getOrElse(f, Seq.empty)).toMap)
  }

  /** The partition SPECS a SNAPSHOT actually carries: the columns
    * EVERY live file records a `#pval=` line for (files without
    * pvals — unpartitioned commits, cross-partition rewrites — make
    * the table effectively unpartitioned for planning purposes;
    * per-file pvals still prune whatever carries them). A column
    * whose non-NULL encodings are all `B<n>:` with ONE n
    * reconstructs as `bucket(n,col)`; all value encodings →
    * identity; mixed encodings drop the column (no coherent spec to
    * inherit). */
  def partitionColsOf(pinned: Pinned): Seq[String] =
    if (pinned.slices.isEmpty) Seq.empty
    else {
      val common = pinned.pvals.values
        .map(_.map(_._1).toSet)
        .reduce(_ intersect _).toSeq.sorted
      common.flatMap { c =>
        val encs = pinned.pvals.values
          .flatMap(_.collect { case (`c`, e) if e != "N" => e }).toSeq
        val buckets = encs.flatMap(e =>
          ManifestBucket.decode(e).map(_._1)).distinct
        if (encs.isEmpty) Some(c) // all-NULL: identity by convention
        else if (buckets.isEmpty) Some(c)
        else if (buckets.size == 1 && buckets.head > 0 &&
            encs.forall(_.startsWith("B")))
          Some(ManifestBucket.render(c, Some(buckets.head)))
        else None
      }
    }

  private def footerSchema(path: String): StructType = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(path),
      new org.apache.hadoop.conf.Configuration())
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val msg = reader.getFooter.getFileMetaData.getSchema
      import scala.jdk.CollectionConverters._
      import org.apache.parquet.schema.LogicalTypeAnnotation
      StructType(msg.getFields.asScala.toSeq.map { f =>
        require(f.isPrimitive,
          s"graft-manifest serves flat relational snapshots; " +
            s"column ${f.getName} is nested")
        val p = f.asPrimitiveType()
        import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
        val ann = p.getLogicalTypeAnnotation
        val dt = p.getPrimitiveTypeName match {
          case INT64
              if ann.isInstanceOf[LogicalTypeAnnotation
                .TimestampLogicalTypeAnnotation] =>
            val t = ann.asInstanceOf[LogicalTypeAnnotation
              .TimestampLogicalTypeAnnotation]
            require(t.getUnit ==
                LogicalTypeAnnotation.TimeUnit.MICROS,
              s"graft-manifest reads MICROS timestamps; column " +
                s"${f.getName} is ${t.getUnit}")
            TimestampType
          // Spark's parquet writer defaults to INT96 timestamps
          // (spark.sql.parquet.outputTimestampType=INT96), which is
          // what the Scala-path commits stage via df.write.parquet —
          // the DSv2 reader decodes both encodings so the two write
          // surfaces stay interchangeable on one table
          case INT96   => TimestampType
          case INT64   => LongType
          case INT32
              if ann.isInstanceOf[LogicalTypeAnnotation
                .DateLogicalTypeAnnotation] => DateType
          case INT32   => IntegerType
          case DOUBLE  => DoubleType
          case FLOAT   => FloatType
          case BOOLEAN => BooleanType
          case BINARY
              if ann == LogicalTypeAnnotation.stringType() =>
            StringType
          case BINARY  => BinaryType
          case other => throw new IllegalArgumentException(
            s"graft-manifest serves flat relational snapshots; " +
              s"column ${f.getName} has unsupported type $other")
        }
        StructField(f.getName, dt)
      })
    } finally reader.close()
  }

  /** By-name union of the live files' footers — per-LIVE-file
    * metadata reads, bounded by the snapshot. Same-name columns must
    * agree on type (loud otherwise). A table with NO published
    * snapshot yet has no schema to infer — EMPTY, the write-bootstrap
    * case (the first `df.write.format("graft-manifest")` creates the
    * table; a read of it still fails loudly at scan planning). */
  def schemaFor(opts: ManifestV2Options): StructType = {
    if (ManifestTable.versions(opts.path).isEmpty &&
        opts.version.isEmpty)
      return StructType(Seq.empty)
    val pinned = resolvePinned(opts)
    require(pinned.slices.nonEmpty,
      s"graft-manifest: snapshot of ${opts.path} lists no data files")
    pinned.slices.map(s => footerSchema(s.path)).reduce { (a, b) =>
      val known = a.fieldNames.toSet
      b.fields.foldLeft(a) { (acc, f) =>
        if (!known.contains(f.name)) acc.add(f)
        else {
          val prev = acc(f.name)
          require(prev.dataType == f.dataType,
            s"graft-manifest: column ${f.name} changes type across " +
              s"live files (${prev.dataType} vs ${f.dataType})")
          acc
        }
      }
    }
  }
}

/** The `_graft_file` metadata column: the manifest-relative data
  * file of each row — the GROUP id Spark's group-based row-level
  * operations (MERGE INTO / UPDATE / rewritten DELETE) filter and
  * replace by, and a debugging aid for everyone else. */
private[sources] object GraftFileColumn
    extends org.apache.spark.sql.connector.catalog.MetadataColumn {
  override def name(): String = "_graft_file"
  override def dataType(): DataType = StringType
  override def isNullable: Boolean = false
  override def comment(): String =
    "manifest-relative data file of the row (row-level op group id)"
}

/** The `_graft_pos` metadata column: the row's physical file ordinal
  * (`_metadata.row_index`) — together with `_graft_file` it is the
  * ROW ID the delta-based (merge-on-read) row-level operations key
  * their deletion-vector lines on. Row-path only: a scan requiring
  * it plans row readers (whose position counter IS the ordinal). */
private[sources] object GraftPosColumn
    extends org.apache.spark.sql.connector.catalog.MetadataColumn {
  override def name(): String = "_graft_pos"
  override def dataType(): DataType = LongType
  override def isNullable: Boolean = false
  override def comment(): String =
    "physical row ordinal within the row's data file (DV position)"
}

/** `acceptAnySchema` splits the two write contracts: the PATH-BASED
  * `format("graft-manifest")` table keeps ACCEPT_ANY_SCHEMA (the
  * manifest's read side owns evolution — by-name union of live
  * footers, late columns NULL — and the write-bootstrap table has no
  * schema to validate against), while CATALOG-loaded tables validate
  * writes against the table schema like any SQL table — which is
  * ALSO what unlocks SQL row-level operations: ACCEPT_ANY_SCHEMA
  * sets `skipSchemaResolution` on UPDATE/MERGE plans, and Spark then
  * never aligns assignments or rewrites the command. SQL-side
  * evolution is the Scala API's job (append evolving data through
  * the path-based writer). */
class ManifestV2Table(schema: StructType, opts: ManifestV2Options,
    acceptAnySchema: Boolean = false,
    declaredPartCols: Option[Seq[String]] = None)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite
    with SupportsDelete
    with org.apache.spark.sql.connector.catalog.SupportsMetadataColumns
    with org.apache.spark.sql.connector.catalog
      .SupportsRowLevelOperations {

  override def metadataColumns()
      : Array[org.apache.spark.sql.connector.catalog.MetadataColumn] =
    Array(GraftFileColumn, GraftPosColumn)

  /** MERGE INTO / UPDATE (and DELETEs whose WHERE the metadata path
    * declines) plan by the table's write mode — the Iceberg
    * `write.merge.mode` split, surfaced as the `merge.mode` table
    * property / source option:
    *
    *  - **copy-on-write** (default, the Iceberg default): GROUP-BASED
    *    — the operation's scan serves rows plus their `_graft_file`
    *    group id, Spark's runtime group filter narrows the scan to
    *    files that actually hold matching rows, and the replacement
    *    write swaps exactly those files in one atomic publish;
    *  - **merge-on-read**: DELTA-BASED ([[ManifestDeltaOperation]])
    *    — matched rows commit as deletion-vector lines keyed by the
    *    (`_graft_file`, `_graft_pos`) row id plus ONE appended insert
    *    file, so a small SQL MERGE publishes a version with ZERO
    *    rewritten data files (the [[ManifestTable.mergeByKeyDv]]
    *    discipline, through the planner); files whose accumulated DV
    *    would blow the `dvMaxFraction`/position budget are rewritten
    *    inline at commit — the CoW fallback.
    *
    * Ranged DELETEs still take the deletion-vector metadata path
    * (Spark's OptimizeMetadataOnlyDeleteFromTable converts back to
    * [[deleteWhere]] whenever [[canDeleteWhere]] accepts). */
  override def newRowLevelOperationBuilder(
      info: org.apache.spark.sql.connector.write.RowLevelOperationInfo)
      : org.apache.spark.sql.connector.write.RowLevelOperationBuilder =
    () =>
      if (opts.mergeOnRead)
        new ManifestDeltaOperation(info.command(), opts)
      else new ManifestRowLevelOperation(info.command(), opts)
  override def name(): String = s"graft-manifest:${opts.path}"
  override def schema(): StructType = schema

  /** Effective partition columns: declared (catalog PARTITIONED BY /
    * `partitionColumns` option / writeTo transforms) or derived from
    * the current snapshot's pvals — an append to an
    * already-partitioned table inherits the layout. */
  private[sources] lazy val partCols: Seq[String] =
    declaredPartCols.getOrElse {
      if (ManifestTable.versions(opts.path).isEmpty) Seq.empty
      else ManifestV2.partitionColsOf(
        ManifestV2.resolvePinned(ManifestV2Options(opts.path, None)))
    }

  override def partitioning(): Array[Transform] =
    partCols.map { spec =>
      val (c, b) = ManifestBucket.parse(spec)
      b match {
        case Some(n) => org.apache.spark.sql.connector.expressions
          .Expressions.bucket(n, c): Transform
        case None => org.apache.spark.sql.connector.expressions
          .Expressions.identity(c): Transform
      }
    }.toArray
  // ACCEPT_ANY_SCHEMA: the manifest's READ side owns schema
  // evolution (by-name union of live footers, late columns NULL,
  // same-name type drift loud at read) — validating appends against
  // the inferred union would reject exactly the evolving commits the
  // table is built to absorb, and the write-bootstrap table has no
  // schema to validate against at all
  override def capabilities(): util.Set[TableCapability] = {
    val caps = java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.STREAMING_WRITE)
    if (acceptAnySchema) caps.add(TableCapability.ACCEPT_ANY_SCHEMA)
    caps
  }
  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new ManifestScanBuilder(schema, opts)
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new ManifestWriteBuilder(info.schema(), opts,
      Option(info.options.get("statsColumns"))
        .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
        .getOrElse(Seq.empty),
      Option(info.options.get("partitionColumns"))
        .map(ManifestBucket.splitSpecs)
        .getOrElse(partCols),
      info.queryId(),
      // catalog-loaded tables (the !acceptAnySchema contract above)
      // can cluster bucketed writes by the bucket FUNCTION — Spark
      // resolves it through this table's FunctionCatalog; path-based
      // writes have no function catalog and cluster by column
      bucketExprOk = !acceptAnySchema)

  /** SQL DELETE seam: supported exactly when the WHERE clause is a
    * conjunctive RANGE on ONE int64-prunable column (integer, date,
    * or timestamp — the shape [[ManifestTable.deleteRangeDv]]
    * serves); anything else declines loudly rather than deleting a
    * superset. NULL rows never match (SQL DELETE semantics ride the
    * range predicate). */
  private def deleteRangeOf(filters: Array[Filter])
      : Option[(String, Long, Long)] = {
    if (filters.isEmpty) return None
    // TOTAL translation — every filter AND every conjunct inside an
    // And must translate, else the merged range is a SUPERSET of the
    // true predicate and deleteWhere would delete rows the WHERE
    // never matched (the lossy longRangesOf drops untranslatable
    // conjuncts, which is safe for pruning but never for acting)
    ManifestScan.longRangesTotal(filters.toSeq, schema) match {
      case Some(m) if m.size == 1 =>
        val (c, (lo, hi)) = m.head
        Some((c, lo, hi))
      case _ => None
    }
  }

  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    deleteRangeOf(filters).isDefined

  override def deleteWhere(filters: Array[Filter]): Unit = {
    val (c, lo, hi) = deleteRangeOf(filters).getOrElse(
      throw new UnsupportedOperationException(
        s"graft-manifest DELETE supports a conjunctive range on one " +
          s"integer/date/timestamp column; got " +
          s"${filters.mkString(", ")}"))
    ManifestTable.deleteRangeDv(
      org.apache.spark.sql.SparkSession.active, opts.path, c, lo, hi,
      dvMaxFraction = opts.dvMaxFraction)
    ()
  }
}

class ManifestScanBuilder(fullSchema: StructType,
    opts: ManifestV2Options)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters with SupportsPushDownAggregates
    with SupportsPushDownLimit {

  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty
  private var metaAgg: Option[(StructType, Array[Any])] = None
  private var limit: Option[Int] = None

  /** LIMIT k plans only as many files as the manifest's `#nrows=`
    * counts PROVE can satisfy k live rows — `SELECT * FROM t LIMIT
    * 10` on a million-file table opens one file. PARTIAL pushdown
    * (returns false): Spark keeps its own LocalLimit above the scan,
    * so uncounted files (which contribute an unknown ≥0 rows and are
    * conservatively kept) can never produce extra rows. */
  override def pushLimit(l: Int): Boolean = {
    limit = Some(l)
    false // partial: the scan trims FILES, Spark still trims ROWS
  }

  // ONE resolution serves every planning call of this scan — a
  // concurrent commit between pushFilters, pushAggregation and
  // planInputPartitions cannot split the read across versions. Lazy:
  // the STREAMING path never resolves a batch snapshot at all.
  private lazy val pinned = ManifestV2.resolvePinned(opts)

  override def pruneColumns(requiredSchema: StructType): Unit =
    if (metaAgg.isEmpty) required = requiredSchema

  /** Filters usable for ZONE/partition pruning are remembered (and
    * surfaced in explain): ranges, equalities, and IN sets on
    * prunable columns. ALL filters are returned residual — Spark
    * re-applies them row-level, so the zones only ever skip, never
    * filter. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(f =>
      ManifestScan.longRangesOf(Seq(f), fullSchema).nonEmpty ||
        ManifestScan.strRangesOf(Seq(f), fullSchema).nonEmpty ||
        ManifestScan.longInSetsOf(Seq(f), fullSchema).nonEmpty ||
        ManifestScan.strInSetsOf(Seq(f), fullSchema).nonEmpty)
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  /** Only a complete metadata answer is worth taking over (the
    * Iceberg/Delta metadata-aggregate shape): ungrouped, unfiltered
    * combinations of
    *  - COUNT(*)       — live rows (`#nrows` − |dv|) per file, exact
    *    only when every file is counted;
    *  - COUNT(col)     — the `#ndv=` lines' exact per-file null
    *    counts subtracted from `#nrows`;
    *  - MIN/MAX(col)   — the `#stats=` int64 zone fold (integer /
    *    date / timestamp columns; per-file bounds are exact, so the
    *    fold is — the [[ManifestTable.statsBounds]] discipline);
    * bailing on ANY deletion vector (a DV'd file's recorded extrema
    * / null counts may BE deleted rows) and on any stats-less
    * nonempty file. `SELECT max(ts) FROM t` — the probe every
    * incremental-ingest ledger issues — then reads ZERO data files.
    * Everything else (grouped, filtered, strings whose stored bounds
    * may be truncation-widened) declines to a normal scan. */
  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate
        .Aggregation): Boolean =
    metaFor(agg).isDefined

  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate
        .Aggregation): Boolean =
    metaFor(agg) match {
      case some @ Some(_) => metaAgg = some; true
      case None => false
    }

  private def metaFor(
      agg: org.apache.spark.sql.connector.expressions.aggregate
        .Aggregation): Option[(StructType, Array[Any])] = {
    import org.apache.spark.sql.connector.expressions.NamedReference
    import org.apache.spark.sql.connector.expressions.aggregate._
    if (agg.groupByExpressions.nonEmpty) return None
    if (pushed.nonEmpty) return None // a filter means reading rows
    val slices = pinned.slices
    val root = java.nio.file.Paths.get(opts.path)
    val rels = slices.map(s => root.relativize(
      java.nio.file.Paths.get(s.path)).toString)
    lazy val anyDv = slices.exists(_.dv.nonEmpty)
    lazy val liveRows: Option[Long] = {
      val per = slices.map(s => s.rows.map(_ - s.dv.length))
      if (per.forall(_.isDefined)) Some(per.flatten.sum) else None
    }
    def colOf(e: org.apache.spark.sql.connector.expressions
        .Expression): Option[String] = e match {
      case r: NamedReference if r.fieldNames.length == 1 =>
        Some(r.fieldNames.head)
      case _ => None
    }
    // int64 zone fold over live files: exact iff no DVs and every
    // nonempty file carries a `#stats=` line for c (a nonempty file
    // WITHOUT one might be all-NULL in c or just stats-less —
    // indistinguishable, so decline); min/max ignore NULLs, and the
    // per-file bounds are computed over non-null values only, so the
    // fold matches SQL semantics exactly
    def boundsFor(c: String): Option[(Long, Long)] = {
      if (anyDv) return None
      val per = slices.zip(rels).map { case (s, rel) =>
        pinned.stats.getOrElse(rel, Seq.empty).find(_._1 == c) match {
          case Some((_, mn, mx)) => Some(Some((mn, mx)))
          case None if s.rows.contains(0L) => Some(None)
          case None => None
        }
      }
      if (per.exists(_.isEmpty)) return None
      val bs = per.flatten.flatten
      if (bs.isEmpty) None // all-empty: MIN is NULL — let a scan say so
      else Some((bs.map(_._1).min, bs.map(_._2).max))
    }
    def nonNullFor(c: String): Option[Long] = {
      if (anyDv) return None
      val per = slices.zip(rels).map { case (s, rel) =>
        pinned.ndvs.getOrElse(rel, Seq.empty).find(_._1 == c) match {
          case Some((_, nulls, _, _)) => s.rows.map(_ - nulls)
          case None if s.rows.contains(0L) => Some(0L)
          case None => None
        }
      }
      if (per.forall(_.isDefined)) Some(per.flatten.sum) else None
    }
    // catalyst-internal value of an int64-encoded bound, by col type
    def internal(c: String, v: Long): Option[(DataType, Any)] =
      fullSchema.fields.find(_.name == c).map(_.dataType).collect {
        case LongType | TimestampType =>
          (fullSchema(c).dataType, v: Any)
        case IntegerType | DateType =>
          (fullSchema(c).dataType, v.toInt: Any)
        case ShortType => (ShortType, v.toShort: Any)
        case ByteType => (ByteType, v.toByte: Any)
      }
    val cols: Seq[Option[(StructField, Any)]] =
      agg.aggregateExpressions.toSeq.zipWithIndex.map {
        case (_: CountStar, i) =>
          liveRows.map(n =>
            (StructField(s"agg_$i", LongType, nullable = false),
              n: Any))
        case (c: Count, i) if !c.isDistinct =>
          colOf(c.column).flatMap(nonNullFor).map(n =>
            (StructField(s"agg_$i", LongType, nullable = false),
              n: Any))
        case (m: Min, i) =>
          colOf(m.column).flatMap(c => boundsFor(c).flatMap {
            case (lo, _) => internal(c, lo).map { case (dt, v) =>
              (StructField(s"agg_$i", dt), v) }
          })
        case (m: Max, i) =>
          colOf(m.column).flatMap(c => boundsFor(c).flatMap {
            case (_, hi) => internal(c, hi).map { case (dt, v) =>
              (StructField(s"agg_$i", dt), v) }
          })
        case _ => None
      }
    if (cols.isEmpty || cols.exists(_.isEmpty)) None
    else Some((StructType(cols.flatten.map(_._1)),
      cols.flatten.map(_._2).toArray))
  }

  override def build(): Scan =
    new ManifestScan(required, pushed, metaAgg, opts,
      () => pinned, fullSchema, limit)
}

object ManifestScan {

  /** Translate runtime V2 predicates (the shapes dynamic pruning
    * emits after subquery execution: IN / = over one column with
    * literal values) into per-column IN-sets in the zone encodings —
    * int64 for integer/date/timestamp literals (catalyst internal
    * values: DATE = epoch days as Int, TIMESTAMP = epoch micros),
    * hex UTF-8 for strings. Untranslatable predicates contribute
    * nothing (skipping is an optimization, never a filter). Shared
    * by the batch scan and the row-level-operation scan. */
  def runtimeInSets(
      predicates: Array[org.apache.spark.sql.connector.expressions
        .filter.Predicate])
      : (Map[String, Set[Long]], Map[String, Set[String]]) = {
    import org.apache.spark.sql.connector.expressions.{Literal, NamedReference}
    def colOf(e: Any): Option[String] = e match {
      case f: NamedReference if f.fieldNames.length == 1 =>
        Some(f.fieldNames.head)
      case _ => None
    }
    def longOf(l: Literal[_]): Option[Long] = l.dataType match {
      case LongType | TimestampType =>
        Option(l.value).map(_.asInstanceOf[Long])
      case IntegerType | DateType =>
        Option(l.value).map(_.asInstanceOf[Int].toLong)
      case ShortType =>
        Option(l.value).map(_.asInstanceOf[Short].toLong)
      case ByteType =>
        Option(l.value).map(_.asInstanceOf[Byte].toLong)
      case _ => None
    }
    def hexOf(l: Literal[_]): Option[String] = l.dataType match {
      case StringType => Option(l.value)
        .map(v => StrStat.hex(
          v.asInstanceOf[UTF8String].getBytes.clone()))
      case _ => None
    }
    var longs = Map.empty[String, Set[Long]]
    var strs = Map.empty[String, Set[String]]
    def addLong(c: String, vs: Set[Long]): Unit =
      longs = longs.updated(c,
        longs.get(c).map(_ intersect vs).getOrElse(vs))
    def addStr(c: String, vs: Set[String]): Unit =
      strs = strs.updated(c,
        strs.get(c).map(_ intersect vs).getOrElse(vs))
    predicates.foreach { p =>
      val kids = p.children()
      (p.name(), kids.headOption.flatMap(colOf)) match {
        case ("IN", Some(c)) if kids.length > 1 =>
          val lits = kids.tail.collect { case l: Literal[_] => l }
          if (lits.length == kids.length - 1) {
            val lv = lits.flatMap(longOf)
            val hv = lits.flatMap(hexOf)
            if (lv.length == lits.length) addLong(c, lv.toSet)
            else if (hv.length == lits.length) addStr(c, hv.toSet)
          }
        case ("=", Some(c)) if kids.length == 2 =>
          kids(1) match {
            case l: Literal[_] =>
              longOf(l).foreach(v => addLong(c, Set(v)))
              hexOf(l).foreach(h => addStr(c, Set(h)))
            case _ => ()
          }
        case _ => () // not translatable — skipping is optional
      }
    }
    (longs, strs)
  }

  /** Session opt-in for storage-partitioned-join planning (the
    * Iceberg `preserve-data-grouping` discipline): when true (and
    * Spark's v2 bucketing is on), partitioned manifest scans report
    * KeyGroupedPartitioning — same-key joins drop their exchanges,
    * at the cost of plain scans grouping to one task per partition
    * value. */
  val PreserveGroupingKey =
    "spark.sql.graft.planning.preserveDataGrouping"

  /** Plan one surviving file as one-or-more row-group-aligned
    * InputPartitions: a file past ~1.5× `targetBytes` gets its footer
    * read (driver-side, only for the big files) and its row groups
    * greedily packed into byte ranges of ~`targetBytes` — so one hot
    * 1 GiB compacted file parallelizes across tasks instead of
    * becoming the scan's straggler. Ranges select row groups by the
    * parquet midpoint rule on COMPRESSED offsets (boundaries sit on
    * block starting positions, so every row group lands in exactly
    * one range); `rowOffset` carries the range's first file-ordinal
    * so deletion-vector masking stays position-exact on splits. Any
    * metadata hiccup (unreadable footer) falls back to one
    * whole-file partition — splitting is an optimization, never a
    * correctness step. */
  def splitPartitions(s: ManifestV2.FileSlice, rel: String,
      cols: Array[String], targetBytes: Long): Seq[InputPartition] = {
    def whole = Seq(
      ManifestFilePartition(s.path, rel, s.dv, cols): InputPartition)
    if (targetBytes <= 0L) return whole
    val size =
      try java.nio.file.Files.size(java.nio.file.Paths.get(s.path))
      catch { case _: java.io.IOException => return whole }
    if (size <= targetBytes + targetBytes / 2) return whole
    val blocks =
      try {
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(new org.apache.hadoop.fs.Path(s.path),
            new org.apache.hadoop.conf.Configuration())
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try {
          import scala.jdk.CollectionConverters._
          r.getFooter.getBlocks.asScala.toSeq.map(b =>
            (b.getStartingPos, b.getCompressedSize, b.getRowCount))
        } finally r.close()
      } catch { case scala.util.control.NonFatal(_) => return whole }
    if (blocks.length <= 1) return whole
    // greedy pack consecutive row groups to ~targetBytes per range
    val groups = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long)] // (range startPos, rows before range)
    var acc = 0L
    var rowsBefore = 0L
    blocks.foreach { case (pos, bytes, rows) =>
      if (groups.isEmpty || (acc + bytes > targetBytes && acc > 0L)) {
        groups += ((pos, rowsBefore))
        acc = 0L
      }
      acc += bytes
      rowsBefore += rows
    }
    if (groups.length <= 1) return whole
    groups.toSeq.zipWithIndex.map { case ((pos, rb), i) =>
      val end =
        if (i + 1 < groups.length) groups(i + 1)._1 else size
      ManifestFilePartition(s.path, rel, s.dv, cols, pos, end - pos,
        rb): InputPartition
    }
  }

  /** One conjunctive string bound: [lo, hi] on UTF-8 bytes, either
    * side open (None) and independently inclusive/exclusive. */
  final case class StrRange(lo: Option[Array[Byte]], loInc: Boolean,
      hi: Option[Array[Byte]], hiInc: Boolean)

  private def literalLong(schema: StructType, a: String,
      v: Any): Option[Long] = {
    val dt = schema.fields.find(_.name == a).map(_.dataType)
    (dt, v) match {
      case (Some(LongType) | Some(IntegerType), l: java.lang.Long) =>
        Some(l)
      case (Some(LongType) | Some(IntegerType), i: java.lang.Integer) =>
        Some(i.toLong)
      case (Some(LongType) | Some(IntegerType), s: java.lang.Short) =>
        Some(s.toLong)
      case (Some(LongType) | Some(IntegerType), b: java.lang.Byte) =>
        Some(b.toLong)
      case (Some(DateType), d: java.sql.Date) =>
        Some(d.toLocalDate.toEpochDay)
      case (Some(DateType), d: java.time.LocalDate) =>
        Some(d.toEpochDay)
      case (Some(TimestampType), t: java.sql.Timestamp) =>
        Some(Math.floorDiv(t.getTime, 1000L) * 1000000L +
          t.getNanos / 1000L)
      case (Some(TimestampType), i: java.time.Instant) =>
        Some(Math.multiplyExact(i.getEpochSecond, 1000000L) +
          i.getNano / 1000L)
      case _ => None
    }
  }

  /** Conjunctive [lo, hi] int64 ranges per column from source
    * filters — integer columns as-is, DATE as epoch days, TIMESTAMP
    * as epoch microseconds (the manifest's `#stats=` encodings —
    * same exactness discipline on both sides). */
  def longRangesOf(filters: Seq[Filter], schema: StructType)
      : Map[String, (Long, Long)] = {
    def asLong(a: String, v: Any): Option[Long] =
      literalLong(schema, a, v)
    val ranges = filters.flatMap {
      case EqualTo(a, v) =>
        asLong(a, v).map(x => a -> (x, x)).toSeq
      case GreaterThan(a, v) =>
        asLong(a, v).filter(_ < Long.MaxValue)
          .map(x => a -> (x + 1, Long.MaxValue)).toSeq
      case GreaterThanOrEqual(a, v) =>
        asLong(a, v).map(x => a -> (x, Long.MaxValue)).toSeq
      case LessThan(a, v) =>
        asLong(a, v).filter(_ > Long.MinValue)
          .map(x => a -> (Long.MinValue, x - 1)).toSeq
      case LessThanOrEqual(a, v) =>
        asLong(a, v).map(x => a -> (Long.MinValue, x)).toSeq
      case And(l, r) =>
        longRangesOf(Seq(l), schema).toSeq ++
          longRangesOf(Seq(r), schema).toSeq
      case _ => Seq.empty
    }
    ranges.groupBy(_._1).view.mapValues { rs =>
      (rs.map(_._2._1).max, rs.map(_._2._2).min)
    }.toMap
  }

  /** TOTAL variant of [[longRangesOf]]: Some only when EVERY filter
    * — and every conjunct inside an And — translates to an int64
    * range. [[longRangesOf]] is lossy BY DESIGN (a dropped conjunct
    * just skips fewer files, which is safe for pruning); consumers
    * that ACT on the ranges (SQL DELETE via `deleteWhere`) need the
    * total form, where a dropped conjunct would silently widen the
    * predicate into a superset delete. */
  def longRangesTotal(filters: Seq[Filter], schema: StructType)
      : Option[Map[String, (Long, Long)]] = {
    def intersect(a: Map[String, (Long, Long)],
        b: Map[String, (Long, Long)]): Map[String, (Long, Long)] =
      (a.keySet ++ b.keySet).map { c =>
        val (alo, ahi) = a.getOrElse(c, (Long.MinValue, Long.MaxValue))
        val (blo, bhi) = b.getOrElse(c, (Long.MinValue, Long.MaxValue))
        c -> (math.max(alo, blo), math.min(ahi, bhi))
      }.toMap
    def one(f: Filter): Option[Map[String, (Long, Long)]] = f match {
      case And(l, r) =>
        for { a <- one(l); b <- one(r) } yield intersect(a, b)
      case leaf =>
        val m = longRangesOf(Seq(leaf), schema)
        if (m.nonEmpty) Some(m) else None
    }
    filters.foldLeft(Option(Map.empty[String, (Long, Long)])) {
      (acc, f) => for { a <- acc; b <- one(f) } yield intersect(a, b)
    }
  }

  /** STRING bounds per pushed filter (kept as a LIST of conjuncts —
    * a file must survive every one, which is exactly as strong as
    * intersecting them first). Compared unsigned byte-wise against
    * the `#sstats=` zone lines. */
  def strRangesOf(filters: Seq[Filter], schema: StructType)
      : Seq[(String, StrRange)] = {
    def strCol(a: String): Boolean =
      schema.fields.exists(f =>
        f.name == a && f.dataType == StringType)
    def bytes(v: Any): Option[Array[Byte]] = v match {
      case s: String => Some(StrStat.bytesOf(s))
      case u: UTF8String => Some(u.getBytes.clone())
      case _ => None
    }
    filters.flatMap {
      case EqualTo(a, v) if strCol(a) =>
        bytes(v).map(b => a -> StrRange(Some(b), true, Some(b), true))
      case GreaterThan(a, v) if strCol(a) =>
        bytes(v).map(b => a -> StrRange(Some(b), false, None, true))
      case GreaterThanOrEqual(a, v) if strCol(a) =>
        bytes(v).map(b => a -> StrRange(Some(b), true, None, true))
      case LessThan(a, v) if strCol(a) =>
        bytes(v).map(b => a -> StrRange(None, true, Some(b), false))
      case LessThanOrEqual(a, v) if strCol(a) =>
        bytes(v).map(b => a -> StrRange(None, true, Some(b), true))
      case And(l, r) =>
        strRangesOf(Seq(l), schema) ++ strRangesOf(Seq(r), schema)
      case _ => Seq.empty
    }
  }

  /** IN-set predicates per column (long encodings): several In
    * filters on one column intersect conjunctively. A filter whose
    * value list fails total translation contributes nothing (it just
    * doesn't prune). Used against zones AND partition values: a file
    * survives In(c, vs) iff some v lies inside its [min, max]. */
  def longInSetsOf(filters: Seq[Filter], schema: StructType)
      : Map[String, Set[Long]] = {
    val sets = filters.flatMap {
      case In(a, values) if values.nonEmpty =>
        val enc = values.toSeq.map(v => literalLong(schema, a, v))
        if (enc.forall(_.isDefined))
          Seq(a -> enc.flatten.toSet)
        else Seq.empty
      case And(l, r) =>
        longInSetsOf(Seq(l), schema).toSeq ++
          longInSetsOf(Seq(r), schema).toSeq
      case _ => Seq.empty
    }
    sets.groupBy(_._1).view
      .mapValues(_.map(_._2).reduce(_ intersect _)).toMap
  }

  /** IN-set predicates per STRING column, values as the `#sstats=`/
    * `#pval=` hex encoding. */
  def strInSetsOf(filters: Seq[Filter], schema: StructType)
      : Map[String, Set[String]] = {
    def strCol(a: String): Boolean =
      schema.fields.exists(f =>
        f.name == a && f.dataType == StringType)
    def hexOf(v: Any): Option[String] = v match {
      case s: String => Some(StrStat.hex(StrStat.bytesOf(s)))
      case u: UTF8String => Some(StrStat.hex(u.getBytes.clone()))
      case _ => None
    }
    val sets = filters.flatMap {
      case In(a, values) if values.nonEmpty && strCol(a) =>
        val enc = values.toSeq.map(hexOf)
        if (enc.forall(_.isDefined))
          Seq(a -> enc.flatten.toSet)
        else Seq.empty
      case And(l, r) =>
        strInSetsOf(Seq(l), schema).toSeq ++
          strInSetsOf(Seq(r), schema).toSeq
      case _ => Seq.empty
    }
    sets.groupBy(_._1).view
      .mapValues(_.map(_._2).reduce(_ intersect _)).toMap
  }

  /** Does a file survive the pushed predicates, given its zone
    * lines? Absent lines always survive (skipping is an
    * optimization, never a filter); a file KNOWN empty skips
    * exactly. */
  def survives(rows: Option[Long],
      lines: Seq[(String, Long, Long)],
      sLines: Seq[(String, String, String)],
      longRanges: Map[String, (Long, Long)],
      strRanges: Seq[(String, StrRange)]): Boolean =
    survivesAll(rows, lines, sLines, Seq.empty, longRanges,
      strRanges, Map.empty, Map.empty)

  /** Full pruning check: zone lines, PARTITION VALUES (exact — a
    * pval acts as a degenerate [v, v] zone and is checked FIRST by
    * prepending; a NULL partition value prunes under any predicate
    * on that column, since Eq/range/In never match NULL), and IN
    * sets. */
  def survivesAll(rows: Option[Long],
      lines: Seq[(String, Long, Long)],
      sLines: Seq[(String, String, String)],
      pvals: Seq[(String, String)],
      longRanges: Map[String, (Long, Long)],
      strRanges: Seq[(String, StrRange)],
      inLongs: Map[String, Set[Long]],
      inStrs: Map[String, Set[String]]): Boolean = {
    if (rows.contains(0L)) return false
    def constrained(c: String): Boolean =
      longRanges.contains(c) || strRanges.exists(_._1 == c) ||
        inLongs.contains(c) || inStrs.contains(c)
    // NULL partition value: no Eq/range/In predicate can match it
    if (pvals.exists { case (c, enc) => enc == "N" && constrained(c) })
      return false
    // bucket partition value (`B<n>:<id>`): POINT predicates on the
    // bucketed column (equality = degenerate range, IN sets — static
    // or runtime) can only live in the bucket their canonical hash
    // maps to; range predicates never prune buckets (hash order is
    // unrelated to value order)
    val bucketDead = pvals.exists { case (c, enc) =>
      ManifestBucket.decode(enc).exists { case (n, id) =>
        longRanges.get(c).exists { case (lo, hi) =>
          lo == hi && ManifestBucket.idOfLong(lo, n) != id } ||
        inLongs.get(c).exists(set =>
          !set.exists(v => ManifestBucket.idOfLong(v, n) == id)) ||
        strRanges.exists { case (sc, r) =>
          sc == c && r.loInc && r.hiInc && ((r.lo, r.hi) match {
            case (Some(l), Some(h)) =>
              java.util.Arrays.equals(l, h) &&
                ManifestBucket.idOfBytes(l, n) != id
            case _ => false
          })
        } ||
        inStrs.get(c).exists(set =>
          !set.exists(h => ManifestBucket.idOfBytes(
            StrStat.unhex(h), n) == id))
      }
    }
    if (bucketDead) return false
    // exact partition values prepend as degenerate zones
    val effLines = pvals.collect {
      case (c, enc) if enc.startsWith("L:") =>
        val v = enc.drop(2).toLong
        (c, v, v)
    } ++ lines
    val effSLines = pvals.collect {
      case (c, enc) if enc.startsWith("S:") =>
        val h = enc.drop(2)
        (c, h, h)
    } ++ sLines
    longRanges.forall { case (c, (lo, hi)) =>
      effLines.find(_._1 == c)
        .forall { case (_, mn, mx) => mx >= lo && mn <= hi }
    } &&
    strRanges.forall { case (c, r) =>
      effSLines.find(_._1 == c).forall { case (_, mnH, mxH) =>
        val mn = StrStat.unhex(mnH)
        val mx = StrStat.unhex(mxH)
        r.lo.forall { l =>
          val d = StrStat.cmp(mx, l)
          d > 0 || (d == 0 && r.loInc)
        } && r.hi.forall { h =>
          val d = StrStat.cmp(mn, h)
          d < 0 || (d == 0 && r.hiInc)
        }
      }
    } &&
    inLongs.forall { case (c, set) =>
      effLines.find(_._1 == c).forall { case (_, mn, mx) =>
        set.exists(v => v >= mn && v <= mx)
      }
    } &&
    inStrs.forall { case (c, set) =>
      effSLines.find(_._1 == c).forall { case (_, mnH, mxH) =>
        val mn = StrStat.unhex(mnH)
        val mx = StrStat.unhex(mxH)
        set.exists { h =>
          val v = StrStat.unhex(h)
          StrStat.cmp(mn, v) <= 0 && StrStat.cmp(v, mx) <= 0
        }
      }
    }
  }
}

class ManifestScan(required: StructType, pushed: Array[Filter],
    metaAgg: Option[(StructType, Array[Any])],
    opts: ManifestV2Options,
    pinnedF: () => ManifestV2.Pinned, fullSchema: StructType,
    limit: Option[Int] = None)
    extends Scan with Batch with SupportsReportStatistics
    with SupportsRuntimeV2Filtering
    with SupportsReportPartitioning {

  private lazy val pinned = pinnedF()

  // ---- STORAGE-PARTITIONED JOINS (the Iceberg SPJ shape): a table
  // whose every live file carries exact `#pval=` tuples reports
  // KeyGroupedPartitioning over its partition columns, and each
  // InputPartition exposes its decoded tuple as the partition key —
  // two manifest tables partitioned on the same column then join
  // with ZERO exchange (Spark groups same-key partitions per side
  // and zips them). DOUBLE-gated, exactly Iceberg's discipline:
  // Spark's `spark.sql.sources.v2.bucketing.enabled` (default true
  // in Spark 4) AND the explicit session opt-in below — because a
  // reported grouping also GROUPS plain scans down to one task per
  // partition value, which is the right trade only when a
  // same-key join is the query's dominant cost. Reporting is an
  // optimization only — an UnknownPartitioning table just plans the
  // ordinary shuffled join.

  /** Partition SPECS usable as a key-grouped report: every live
    * file must carry a pval for each (partitionColsOf), and the
    * underlying column must be in the scanned schema. Identity
    * specs report identity transforms keyed by the exact value;
    * `bucket(n,c)` specs report bucket transforms keyed by the
    * bucket id (resolvable through [[GraftCatalog]]'s `bucket`
    * function — the Iceberg SPJ-over-buckets shape). */
  private lazy val spjSpecs: Seq[(String, Option[Int])] =
    if (metaAgg.isDefined) Seq.empty
    else ManifestV2.partitionColsOf(pinned)
      .map(ManifestBucket.parse)
      .filter { case (c, _) => fullSchema.fieldNames.contains(c) }
  private def spjCols: Seq[String] = spjSpecs.map(_._1)

  private def spjEnabled: Boolean = spjCols.nonEmpty && {
    val conf = org.apache.spark.sql.internal.SQLConf.get
    conf.v2BucketingEnabled &&
      conf.getConfString(ManifestScan.PreserveGroupingKey, "false")
        .toBoolean
  }

  /** Decode one file's `#pval=` tuple into catalyst values in
    * [[spjSpecs]] order — exact values for identity specs, Int
    * bucket ids for bucket specs. */
  private def keyOf(rel: String): Array[Any] = {
    val pv = pinned.pvals.getOrElse(rel, Seq.empty).toMap
    spjSpecs.map { case (c, buckets) =>
      (pv(c), buckets) match {
        case ("N", _) => null
        case (enc, Some(n)) =>
          ManifestBucket.decode(enc) match {
            case Some((bn, id)) if bn == n => (id: Any)
            case _ => throw new IllegalStateException(
              s"unreadable bucket value ${pv(c)} for $c of $rel")
          }
        case (enc, None) if enc.startsWith("L:") =>
          val v = enc.drop(2).toLong
          // ascribe Any per branch: Scala's numeric lub would widen
          // the Int branch back to Long, and the generated key
          // ordering unboxes by the COLUMN type
          fullSchema(c).dataType match {
            case IntegerType | DateType => (v.toInt: Any)
            case _ => (v: Any)
          }
        case (enc, None) if enc.startsWith("S:") =>
          UTF8String.fromBytes(StrStat.unhex(enc.drop(2)))
        case (other, _) => throw new IllegalStateException(
          s"unreadable partition value $other for $c of $rel")
      }
    }.toArray
  }

  override def outputPartitioning()
      : org.apache.spark.sql.connector.read.partitioning.Partitioning =
    if (spjEnabled) {
      val root = java.nio.file.Paths.get(opts.path)
      val keys = survivingStatic.map(s => keyOf(root.relativize(
        java.nio.file.Paths.get(s.path)).toString).toSeq).distinct
      new org.apache.spark.sql.connector.read.partitioning
        .KeyGroupedPartitioning(
          spjSpecs.map {
            case (c, Some(n)) =>
              org.apache.spark.sql.connector.expressions.Expressions
                .bucket(n, c): org.apache.spark.sql.connector
                .expressions.Expression
            case (c, None) =>
              org.apache.spark.sql.connector.expressions.Expressions
                .identity(c): org.apache.spark.sql.connector
                .expressions.Expression
          }.toArray,
          keys.size)
    } else new org.apache.spark.sql.connector.read.partitioning
      .UnknownPartitioning(0)

  // ---- RUNTIME (dynamic) file pruning — the Delta-DFP / Iceberg
  // runtime-filtering shape: when this scan joins a selective dim,
  // Spark broadcasts the dim's join keys back as IN predicates at
  // EXECUTION time, and the scan re-prunes its surviving files
  // against the zone/partition metadata before re-planning
  // partitions — a fact ⋈ filtered-dim join skips fact files no
  // static predicate could have. Filtering only ever SKIPS files
  // (the join itself re-checks rows), so an untranslatable runtime
  // predicate is ignored, never wrong.

  @volatile private var runtimeInLongs: Map[String, Set[Long]] =
    Map.empty
  @volatile private var runtimeInStrs: Map[String, Set[String]] =
    Map.empty

  /** Columns worth a runtime filter: those carrying zone stats or
    * partition values on ANY file of the pinned snapshot (a runtime
    * IN on anything else could never skip a file) — restricted to
    * the scan's OUTPUT columns, because Spark resolves these
    * references against the pruned relation (a declared column the
    * projection dropped fails analysis, not just the optimization).
    */
  override def filterAttributes()
      : Array[org.apache.spark.sql.connector.expressions
        .NamedReference] = {
    if (metaAgg.isDefined) return Array.empty
    val out = readSchema().fieldNames.toSet
    val cols = (pinned.stats.values.flatten.map(_._1) ++
      pinned.sstats.values.flatten.map(_._1) ++
      pinned.pvals.values.flatten.map(_._1)).toSet
    cols.filter(out.contains).toSeq.sorted.map(c =>
      org.apache.spark.sql.connector.expressions.Expressions
        .column(c)).toArray
  }

  override def filter(
      predicates: Array[org.apache.spark.sql.connector.expressions
        .filter.Predicate]): Unit = {
    val (longs, strs) = ManifestScan.runtimeInSets(predicates)
    longs.foreach { case (c, set) =>
      runtimeInLongs = runtimeInLongs.updated(c,
        runtimeInLongs.get(c).map(_ intersect set).getOrElse(set))
    }
    strs.foreach { case (c, set) =>
      runtimeInStrs = runtimeInStrs.updated(c,
        runtimeInStrs.get(c).map(_ intersect set).getOrElse(set))
    }
  }

  /** [[survivingStatic]] minus files the RUNTIME IN-sets prove
    * empty — what partition re-planning reads after `filter`. */
  private def surviving: Seq[ManifestV2.FileSlice] = {
    if (runtimeInLongs.isEmpty && runtimeInStrs.isEmpty)
      return survivingStatic
    val root = java.nio.file.Paths.get(opts.path)
    survivingStatic.filter { s =>
      val rel = root.relativize(
        java.nio.file.Paths.get(s.path)).toString
      ManifestScan.survivesAll(s.rows,
        pinned.stats.getOrElse(rel, Seq.empty),
        pinned.sstats.getOrElse(rel, Seq.empty),
        pinned.pvals.getOrElse(rel, Seq.empty),
        Map.empty, Seq.empty, runtimeInLongs, runtimeInStrs)
    }
  }

  override def readSchema(): StructType = metaAgg match {
    case Some((schema, _)) => schema
    case None => required
  }

  override def toBatch: Batch = this

  /** The files that survive zone pruning under the PUSHED (static)
    * filters — shared by partition planning AND statistics reporting,
    * so the planner's size estimate reflects the pruned scan, not the
    * whole table. Runtime filters subtract from this via
    * [[surviving]]; the columnar decision reads the static set (it
    * must be stable across re-planning). */
  private lazy val survivingStatic: Seq[ManifestV2.FileSlice] = {
    val root = java.nio.file.Paths.get(opts.path)
    val longRanges = ManifestScan.longRangesOf(pushed.toSeq, fullSchema)
    val strRanges = ManifestScan.strRangesOf(pushed.toSeq, fullSchema)
    val inLongs = ManifestScan.longInSetsOf(pushed.toSeq, fullSchema)
    val inStrs = ManifestScan.strInSetsOf(pushed.toSeq, fullSchema)
    val kept = pinned.slices.filter { s =>
      val rel = root.relativize(
        java.nio.file.Paths.get(s.path)).toString
      ManifestScan.survivesAll(s.rows,
        pinned.stats.getOrElse(rel, Seq.empty),
        pinned.sstats.getOrElse(rel, Seq.empty),
        pinned.pvals.getOrElse(rel, Seq.empty),
        longRanges, strRanges, inLongs, inStrs)
    }
    limit match {
      case None => kept
      // the trim is only sound when NO residual predicate sits above
      // (our pushed filters are all residual — a row-level filter
      // could drop proven rows, making later files load-bearing);
      // Spark only offers pushLimit on direct Limit-over-scan plans
      // today, but guard rather than trust that forever
      case Some(_) if pushed.nonEmpty => kept
      case Some(k) =>
        // pushed LIMIT (partial): keep files only until the
        // manifest's counted LIVE rows prove k is satisfiable —
        // uncounted files contribute an unknown ≥0, so the running
        // proof only advances on counted ones and the cut is always
        // conservative; Spark's LocalLimit above trims the rows
        var proven = 0L
        val out = scala.collection.mutable.ArrayBuffer
          .empty[ManifestV2.FileSlice]
        val it = kept.iterator
        while (it.hasNext && proven < k) {
          val s = it.next()
          out += s
          proven += s.rows.map(r => math.max(r - s.dv.length, 0L))
            .getOrElse(0L)
        }
        out.toSeq
    }
  }

  /** Planner statistics from the manifest's free metadata, at zero
    * extra I/O: sizeInBytes = the surviving files' on-disk bytes,
    * numRows = their `#nrows=` counts minus deletion-vector
    * cardinalities (exact when every surviving file is counted,
    * absent otherwise — never a guess). This is what lets Catalyst
    * make broadcast-vs-shuffle join decisions for manifest tables at
    * PLAN time instead of waiting for AQE runtime stats — the
    * Delta/Iceberg posture. Post-pruning: a filtered scan of one
    * surviving file reports one file's bytes, so zone pruning
    * compounds into join planning. File sizes are a driver-side
    * metadata stat (file-count-bounded, standard lakehouse design).
    */
  override def estimateStatistics()
      : org.apache.spark.sql.connector.read.Statistics = {
    val (bytesOpt, rowsOpt) = metaAgg match {
      case Some(_) => (Some(64L), Some(1L))
      case None =>
        // a concurrently vacuumed file makes the size UNKNOWN, not 0:
        // absent sizeInBytes falls back to the planner's conservative
        // default (never broadcast), whereas an understated size
        // could steer Catalyst into broadcasting a large table
        var sizeKnown = true
        val b = surviving.map { s =>
          try java.nio.file.Files.size(java.nio.file.Paths.get(s.path))
          catch {
            case _: java.io.IOException => sizeKnown = false; 0L
          }
        }.sum
        // clamp per-file live rows at 0: a recorded count racing a
        // rival DV could otherwise go negative and poison the sum
        val per = surviving.map(s =>
          s.rows.map(r => math.max(r - s.dv.length, 0L)))
        (if (sizeKnown) Some(b) else None,
          if (per.forall(_.isDefined)) Some(per.flatten.sum)
          else None)
    }
    // COLUMN statistics from the `#ndv=` register sketches, merged
    // (byte-wise max = HLL union) over exactly the SURVIVING files —
    // reported only for columns EVERY surviving file sketches, and
    // paired with the merged zone bounds as catalyst min/max. This
    // is what CBO's join-cardinality estimation keys on
    // (outputRows ≈ n1·n2 / max(ndv)): join order and downstream
    // broadcast decisions flip with the reported NDV, at zero data
    // I/O. NULL counts ride the same `#ndv=` lines (exact per
    // file, summed over survivors).
    val colStats: java.util.Map[
        org.apache.spark.sql.connector.expressions.NamedReference,
        org.apache.spark.sql.connector.read.colstats.ColumnStatistics] =
      if (metaAgg.isDefined || surviving.isEmpty)
        java.util.Collections.emptyMap()
      else {
        val root = java.nio.file.Paths.get(opts.path)
        val rels = surviving.map(s => root.relativize(
          java.nio.file.Paths.get(s.path)).toString)
        val perFile = rels.map(f =>
          pinned.ndvs.getOrElse(f, Seq.empty)
            .map { case (c, nulls, regs, hist) =>
              c -> (nulls, regs, hist) }.toMap)
        val common = perFile.map(_.keySet).reduce(_ intersect _)
        val out = new java.util.HashMap[
          org.apache.spark.sql.connector.expressions.NamedReference,
          org.apache.spark.sql.connector.read.colstats
            .ColumnStatistics]()
        common.foreach { c =>
          val regs = perFile.map(m => StrStat.unhex(m(c)._2))
            .reduce(NdvSketch.merge)
          val ndv = NdvSketch.estimate(regs)
          val nulls = perFile.map(m => m(c)._1).sum
          // merged zone bounds as catalyst-internal min/max values,
          // when every surviving file carries an int64 zone for c
          val zones = rels.map(f =>
            pinned.stats.getOrElse(f, Seq.empty).find(_._1 == c))
          val minMax: Option[(Any, Any)] =
            if (!zones.forall(_.isDefined)) None
            else {
              val lo = zones.flatten.map(_._2).min
              val hi = zones.flatten.map(_._3).max
              fullSchema.fields.find(_.name == c).map(_.dataType) match {
                case Some(LongType | TimestampType) => Some((lo, hi))
                case Some(IntegerType | DateType) =>
                  Some((lo.toInt, hi.toInt))
                case _ => None
              }
            }
          // EQUI-HEIGHT histogram from the merged log-frame counts
          // (vector add over the surviving files' `#ndv=` histogram
          // fields, [[graft.expressions.LogHist]]): CBO's filter and
          // join estimation stops assuming uniformity exactly where
          // skew would mislead it — a broadcast decision over a
          // skewed key flips where NDV alone could not flip it.
          // Reported only when EVERY surviving file carries the
          // field and the exact zone bounds exist to clamp to.
          val histOpt: Option[org.apache.spark.sql.connector.read
              .colstats.Histogram] =
            if (perFile.exists(m => m(c)._3.isEmpty) ||
                minMax.isEmpty) None
            else {
              val counts = perFile
                .map(m => graft.expressions.LogHist.decode(m(c)._3))
                .reduce(graft.expressions.LogHist.merge)
              val loD = zones.flatten.map(_._2).min.toDouble
              val hiD = zones.flatten.map(_._3).max.toDouble
              graft.expressions.LogHist
                .equiHeight(counts, 16, loD, hiD, ndv)
                .map { case (binHeight, bs) =>
                  new org.apache.spark.sql.connector.read.colstats
                    .Histogram {
                    override def height(): Double = binHeight
                    override def bins(): Array[
                        org.apache.spark.sql.connector.read.colstats
                          .HistogramBin] =
                      bs.map { case (l, h, bndv) =>
                        new org.apache.spark.sql.connector.read
                          .colstats.HistogramBin {
                          override def lo(): Double = l
                          override def hi(): Double = h
                          override def ndv(): Long = bndv
                        }
                      }.toArray
                  }
                }
            }
          out.put(
            org.apache.spark.sql.connector.expressions.Expressions
              .column(c),
            new org.apache.spark.sql.connector.read.colstats
              .ColumnStatistics {
              override def distinctCount(): java.util.OptionalLong =
                java.util.OptionalLong.of(ndv)
              override def nullCount(): java.util.OptionalLong =
                java.util.OptionalLong.of(nulls)
              override def min(): java.util.Optional[Object] =
                minMax.map(v => java.util.Optional.of(
                  v._1.asInstanceOf[Object]))
                  .getOrElse(java.util.Optional.empty[Object]())
              override def max(): java.util.Optional[Object] =
                minMax.map(v => java.util.Optional.of(
                  v._2.asInstanceOf[Object]))
                  .getOrElse(java.util.Optional.empty[Object]())
              override def histogram(): java.util.Optional[
                  org.apache.spark.sql.connector.read.colstats
                    .Histogram] =
                histOpt match {
                  case Some(h) => java.util.Optional.of(h)
                  case None => java.util.Optional.empty[
                    org.apache.spark.sql.connector.read.colstats
                      .Histogram]()
                }
            })
        }
        out
      }
    new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        bytesOpt.map(java.util.OptionalLong.of)
          .getOrElse(java.util.OptionalLong.empty())
      override def numRows(): java.util.OptionalLong =
        rowsOpt.map(java.util.OptionalLong.of)
          .getOrElse(java.util.OptionalLong.empty())
      override def columnStats(): java.util.Map[
          org.apache.spark.sql.connector.expressions.NamedReference,
          org.apache.spark.sql.connector.read.colstats
            .ColumnStatistics] = colStats
    }
  }

  /** CDC micro-batch stream: each committed version's ADDED files
    * are one batch; offsets are manifest versions (immutable — a
    * checkpoint replay re-plans the identical batch). */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new ManifestMicroBatchStream(required, opts)

  override def description(): String = metaAgg match {
    case Some((schema, vals)) =>
      s"graft-manifest ${opts.path} [metadata agg " +
        schema.fieldNames.zip(vals)
          .map { case (f, v) => s"$f=$v" }.mkString(", ") + "]"
    case None =>
      s"graft-manifest ${opts.path} v${pinned.version} " +
        s"[files=${planInputPartitions().length}, " +
        s"zonePruned=${pushed.mkString(", ")}]"
  }

  override def planInputPartitions(): Array[InputPartition] =
    metaAgg match {
      case Some((_, vals)) => Array(ManifestMetaPartition(vals))
      case None =>
        val root = java.nio.file.Paths.get(opts.path)
        val spj = spjEnabled
        surviving.flatMap { s =>
          val rel = root.relativize(
            java.nio.file.Paths.get(s.path)).toString
          val parts = ManifestScan.splitPartitions(s, rel,
            required.fieldNames, opts.splitBytes)
          if (!spj) parts
          else {
            // key-grouped report: every partition carries its tuple
            // (splits of one file share the key and group back)
            val key = keyOf(rel)
            parts.map {
              case p: ManifestFilePartition =>
                ManifestKeyedPartition(p, key): InputPartition
              case other => other
            }
          }
        }.toArray
    }

  /** Columnar (vectorized) whenever the scan serves plain rows —
    * deletion vectors included ([[FilteredColumnVector]] masks them
    * by row-id mapping, zero copies). Only a required `_graft_pos`
    * row id (the delta-operation scan) forces the row path, where
    * per-row ordinals are the point. The pushed filters ride along
    * so the columnar reader can skip ROW GROUPS and PAGES inside
    * each surviving file (zone stats prune per file; OPTIMIZE makes
    * files big — the intra-file skip is what keeps a selective
    * predicate cheap on a 1 GiB compacted file). */
  override def createReaderFactory(): PartitionReaderFactory = {
    val columnar = metaAgg.isEmpty &&
      !required.fieldNames.contains("_graft_pos")
    ManifestReaderFactory(required, columnar, pushed.toSeq)
  }
}

/** The CDC micro-batch source: offset = manifest version; batch
  * (a, b] = the files present in v_b but not in v_a (readChanges'
  * file-level semantics — exact row-level inserts for an append-only
  * history; maintenance rewrites re-add surviving rows, the
  * documented Delta-CDF-across-OPTIMIZE caveat), masked by v_b's
  * deletion vectors. Manifests are immutable and versions dense, so
  * a replayed offset range plans the identical batch — exactly-once
  * with no source-side state beyond the checkpointed offset.
  *
  * Offsets advance ONE VERSION PER MICRO-BATCH (the
  * SupportsAdmissionControl seam): pending versions never coalesce
  * into one range, so a file added in v and removed in v+1 is still
  * delivered in v's batch instead of vanishing inside a merged
  * (v−1, v+1] diff — each committed version's adds arrive exactly
  * once, in commit order. `startingVersion` is INCLUSIVE (the Delta
  * CDF convention). */
class ManifestMicroBatchStream(required: StructType,
    opts: ManifestV2Options)
    extends org.apache.spark.sql.connector.read.streaming
      .MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming
      .SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit}

  private case class VOffset(v: Long) extends Offset {
    override def json(): String = v.toString
  }

  // inclusive option → exclusive offset floor (never below 0: the
  // empty pre-v1 snapshot)
  private val base = math.max(opts.startingVersion - 1L, 0L)

  private def filesAt(v: Long): Set[String] =
    if (v <= 0L) Set.empty
    else ManifestTable.snapshotFor(opts.path, Some(v)).files.toSet

  private def latestVersion: Long = {
    val vs = ManifestTable.versions(opts.path)
    if (vs.isEmpty) base else math.max(vs.last, base)
  }

  // Trigger.AvailableNow pins its target at query start: the run
  // drains up to here one version per batch, then stops even if
  // rival writers keep committing
  @volatile private var availableTarget: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableTarget = Some(latestVersion)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def initialOffset(): Offset = VOffset(base)

  // admission-controlled sources are asked latestOffset(start, limit)
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "graft-manifest CDC paces by version: latestOffset(start, limit)")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[VOffset].v
    val cap = availableTarget.getOrElse(latestVersion)
    VOffset(if (cap <= s) s else s + 1L) // ONE version per batch
  }

  override def reportLatestOffset(): Offset = VOffset(latestVersion)

  override def deserializeOffset(json: String): Offset =
    VOffset(json.toLong)

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[VOffset].v
    val e = end.asInstanceOf[VOffset].v
    if (e <= s) return Array.empty
    val before = filesAt(s)
    val snap = ManifestTable.snapshotFor(opts.path, Some(e))
    val root = java.nio.file.Paths.get(opts.path)
    snap.files.filterNot(before).map { f =>
      ManifestFilePartition(root.resolve(f).toString, f,
        snap.dvs.getOrElse(f, Seq.empty).toArray,
        required.fieldNames): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    ManifestReaderFactory(required)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** One SQL row-level operation (MERGE INTO / UPDATE / rewritten
  * DELETE) against a manifest table — Spark's GROUP-BASED
  * copy-on-write protocol:
  *
  *  1. Spark plans the operation against THIS operation's scan
  *     ([[ManifestRowScan]] — snapshot-pinned, serving `_graft_file`
  *     group ids);
  *  2. at execution, the runtime group filter finds the DISTINCT
  *     `_graft_file` values holding matching rows and narrows the
  *     scan to those files ([[ManifestRowScan.filter]]) — untouched
  *     files are never read OR rewritten;
  *  3. Spark computes the full replacement row set for the affected
  *     groups (carried-unchanged + merged/updated rows) and writes it
  *     through [[ManifestReplaceWrite]], whose job-level commit swaps
  *     exactly the scanned files for the staged outputs in ONE
  *     optimistic publish (rival appends ride along; removed inputs
  *     or rival DVs abort — the DML conflict rules).
  *
  * Zone stats survive: the replacement writer streams typed bounds
  * for every column ALL live files carry zones for, so SQL MERGE
  * doesn't erode the snapshot's prunability. */
class ManifestRowLevelOperation(
    cmd: org.apache.spark.sql.connector.write.RowLevelOperation.Command,
    opts: ManifestV2Options)
    extends org.apache.spark.sql.connector.write.RowLevelOperation {
  import org.apache.spark.sql.connector.write._

  // the operation's scan instance: the write replaces exactly the
  // files this scan ultimately planned (after group filtering)
  @volatile private[sources] var scan: ManifestRowScan = _

  override def command(): RowLevelOperation.Command = cmd

  override def requiredMetadataAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions
      .column("_graft_file"))

  // ONE ScanBuilder and ONE scan per operation instance: should
  // Spark ever configure a second scan against the same
  // RowLevelOperationTable (the runtime group-filter subquery plans
  // against it too), every consumer must share the runtime-FILTERED
  // scan — a last-build-wins overwrite could hand commit() the
  // replacedFiles of an UNFILTERED rival and drop files whose rows
  // were never in the replacement set (the Iceberg
  // cache-one-builder-per-operation rule)
  private lazy val cachedBuilder: ScanBuilder = {
    val pinned = ManifestV2.resolvePinned(opts)
    new ScanBuilder with SupportsPushDownRequiredColumns {
      private var required: StructType = ManifestV2.schemaFor(opts)
      private var prunedOnce = false
      // UNION the required schemas across pruneColumns calls: every
      // consumer shares the one cached scan, so a second consumer
      // (e.g. the runtime group-filter subquery) configured with a
      // different column set must widen the shared projection — a
      // last-call-wins overwrite could hand the first consumer a
      // schema missing columns it asked for
      override def pruneColumns(s: StructType): Unit =
        ManifestRowLevelOperation.this.synchronized {
          val built = ManifestRowLevelOperation.this.scan
          if (built != null) {
            val have = built.readSchema().fieldNames.toSet
            require(s.fieldNames.forall(have.contains),
              "row-level operation scan already built with columns " +
                s"${have.mkString(", ")}; a later consumer requires " +
                s"${s.fieldNames.mkString(", ")} — cannot widen a " +
                "shared scan after build")
          } else if (!prunedOnce) {
            required = s
            prunedOnce = true
          } else {
            val known = required.fieldNames.toSet
            s.fields.filterNot(f => known.contains(f.name))
              .foreach(f => required = required.add(f))
          }
        }
      override def build(): Scan =
        ManifestRowLevelOperation.this.synchronized {
          if (ManifestRowLevelOperation.this.scan == null)
            ManifestRowLevelOperation.this.scan =
              new ManifestRowScan(required, opts, pinned)
          ManifestRowLevelOperation.this.scan
        }
    }
  }

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder = cachedBuilder

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new ManifestReplaceWrite(info.schema(), opts,
            ManifestRowLevelOperation.this)
      }
    }
}

/** The row-level operation's scan: the pinned snapshot's live rows
  * plus `_graft_file`, narrowed at runtime to the files that hold
  * matching rows (Spark's group filter arrives as an IN predicate on
  * the metadata column). Unparseable runtime predicates are ignored
  * — filtering is an optimization; the write then replaces more
  * files with identical content, never wrong content. */
class ManifestRowScan(required: StructType, opts: ManifestV2Options,
    private[sources] val pinned: ManifestV2.Pinned,
    zoneFiltering: Boolean = false)
    extends Scan with Batch
    with org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering {
  import org.apache.spark.sql.connector.expressions.{Expressions, Literal, NamedReference}
  import org.apache.spark.sql.connector.expressions.filter.Predicate

  @volatile private var retained: Option[Set[String]] = None
  // runtime IN-sets over DATA columns (dynamic pruning from the
  // DML's join key — what narrows a delta MERGE's scan to the files
  // whose zones can hold the source's keys, the planner face of
  // mergeByKeyDv's candidate pruning)
  @volatile private var runtimeInLongs: Map[String, Set[Long]] =
    Map.empty
  @volatile private var runtimeInStrs: Map[String, Set[String]] =
    Map.empty

  private def relOf(abs: String): String =
    java.nio.file.Paths.get(opts.path)
      .relativize(java.nio.file.Paths.get(abs)).toString

  /** Zone/pval survival of one file under the runtime DATA-column
    * IN-sets (absent metadata always survives — skip-only). */
  private def survivesRuntime(rel: String, rows: Option[Long])
      : Boolean =
    (runtimeInLongs.isEmpty && runtimeInStrs.isEmpty) ||
      ManifestScan.survivesAll(rows,
        pinned.stats.getOrElse(rel, Seq.empty),
        pinned.sstats.getOrElse(rel, Seq.empty),
        pinned.pvals.getOrElse(rel, Seq.empty),
        Map.empty, Seq.empty, runtimeInLongs, runtimeInStrs)

  /** The manifest-relative files this scan plans — what the
    * replacement write swaps out. Group-based (CoW) consumers swap
    * exactly these, so BOTH narrowings apply: the `_graft_file`
    * group filter and the data-column zone pruning (a file the zones
    * prove key-free holds no matching rows, so excluding it from the
    * replacement set is exact, never lossy). */
  private[sources] def replacedFiles: Seq[String] = {
    val all = pinned.slices
      .filter(s => survivesRuntime(relOf(s.path), s.rows))
      .map(s => relOf(s.path))
    retained match {
      case Some(keep) => all.filter(keep)
      case None => all
    }
  }

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def description(): String =
    s"graft-manifest ${opts.path} v${pinned.version} " +
      s"[row-level scan, files=${replacedFiles.size}]"

  /** Runtime-filterable attributes, BY OPERATION KIND — the two
    * planner rules want different keys and must not mix:
    *
    *  - GROUP-BASED (CoW) scans declare ONLY `_graft_file`: Spark's
    *    runtime group-filtering rule keys its matching-rows subquery
    *    on the ENTIRE declared set, so adding data columns would
    *    turn the group filter into a multi-column key the scan-side
    *    translation can't use — and silently disable it (the
    *    Iceberg copy-on-write scan declares only `_file` for the
    *    same reason);
    *  - DELTA scans declare the OUTPUT data columns carrying zone
    *    stats / partition values: no group rule applies to
    *    WriteDelta, and standard dynamic pruning on the DML join key
    *    then skips files whose zones can't hold the source's keys —
    *    [[ManifestTable.mergeByKeyDv]]'s candidate pruning through
    *    the planner. */
  override def filterAttributes(): Array[NamedReference] =
    if (!zoneFiltering)
      Array(Expressions.column("_graft_file"))
    else {
      val out = required.fieldNames.toSet
      (pinned.stats.values.flatten.map(_._1) ++
        pinned.sstats.values.flatten.map(_._1) ++
        pinned.pvals.values.flatten.map(_._1)).toSet
        .filter(out.contains).toSeq.sorted
        .map(Expressions.column).toArray
    }

  override def filter(predicates: Array[Predicate]): Unit = {
    def strLit(e: Any): Option[String] = e match {
      case l: Literal[_] if l.dataType == StringType =>
        Option(l.value).map(_.toString)
      case _ => None
    }
    def isGroupCol(e: Any): Boolean = e match {
      case f: NamedReference => f.fieldNames.sameElements(
        Array("_graft_file"))
      case _ => false
    }
    val (groupPreds, dataPreds) = predicates.toSeq.partition { p =>
      p.children().headOption.exists(isGroupCol)
    }
    val sets = groupPreds.flatMap { p =>
      val kids = p.children()
      p.name() match {
        case "IN" if kids.nonEmpty =>
          val vals = kids.tail.map(strLit)
          if (vals.forall(_.isDefined))
            Some(vals.flatten.toSet)
          else None
        case "=" if kids.length == 2 =>
          strLit(kids(1)).map(Set(_))
        case _ => None // not a group predicate — ignore (optimization)
      }
    }
    if (sets.nonEmpty) {
      val merged = sets.reduce(_ intersect _)
      retained = Some(retained.map(_ intersect merged).getOrElse(merged))
    }
    val (longs, strs) = ManifestScan.runtimeInSets(dataPreds.toArray)
    longs.foreach { case (c, set) =>
      runtimeInLongs = runtimeInLongs.updated(c,
        runtimeInLongs.get(c).map(_ intersect set).getOrElse(set))
    }
    strs.foreach { case (c, set) =>
      runtimeInStrs = runtimeInStrs.updated(c,
        runtimeInStrs.get(c).map(_ intersect set).getOrElse(set))
    }
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val keep = retained
    pinned.slices.flatMap { s =>
      val rel = relOf(s.path)
      if (keep.forall(_.contains(rel)) && survivesRuntime(rel, s.rows))
        Some(ManifestFilePartition(s.path, rel, s.dv,
          required.fieldNames): InputPartition)
      else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    ManifestReaderFactory(required)
}

/** The replacement write: stages rows exactly like the append path
  * (typed streamed zone bounds over every column ALL live files
  * carry zones for; a PARTITIONED table's replacement splits per
  * partition tuple and re-records `#pval=` lines, so SQL MERGE
  * doesn't erode partition pruning any more than zone pruning), then
  * ONE [[ManifestTable.publishReplace]] swaps the operation scan's
  * files for the staged outputs. A replacement that empties the
  * table stages one explicit empty file so the snapshot keeps its
  * schema. */
class ManifestReplaceWrite(schema: StructType,
    opts: ManifestV2Options, op: ManifestRowLevelOperation)
    extends org.apache.spark.sql.connector.write.BatchWrite {
  import org.apache.spark.sql.connector.write._
  require(!schema.fieldNames.contains("_graft_file"),
    "row-level replacement rows must not carry the metadata column")
  private val nonce = java.util.UUID.randomUUID().toString.take(12)
  // zone columns every LIVE file carries (intersection is
  // conservative vs the replaced subset's — recording fewer columns
  // only costs pruning opportunity, never correctness), restricted
  // to columns present in the replacement schema; partition columns
  // the same way (partition cols live IN the data, so the split
  // writer can re-derive each output's tuple)
  private val (statsCols: Seq[String], partCols: Seq[String]) = {
    val pinned = ManifestV2.resolvePinned(opts)
    val root = java.nio.file.Paths.get(opts.path)
    val rels = pinned.slices.map(s =>
      root.relativize(java.nio.file.Paths.get(s.path)).toString)
    val sc =
      if (rels.isEmpty) Seq.empty[String]
      else rels.map(f =>
          (pinned.stats.getOrElse(f, Seq.empty).map(_._1) ++
            pinned.sstats.getOrElse(f, Seq.empty).map(_._1)).toSet)
        .reduce(_ intersect _).toSeq.sorted
        .filter(schema.fieldNames.contains)
    val pc = ManifestV2.partitionColsOf(pinned)
      .filter(spec => schema.fieldNames
        .contains(ManifestBucket.column(spec)))
    (sc, pc)
  }

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    ManifestWriterFactory(schema, opts.path, nonce, statsCols,
      partCols)

  override def commit(msgs: Array[WriterCommitMessage]): Unit = {
    require(op.scan != null,
      "row-level write committed without the operation's scan")
    val replaced = op.scan.replacedFiles
    val files = ManifestCommit.taskFiles(msgs)
    if (replaced.isEmpty && files.isEmpty) return // no-op operation
    var staged = files.map(_.rel).toSeq
    var rows = files.map(f => f.rel -> f.rows).toMap
    if (staged.isEmpty) {
      // the operation deleted every row of the replaced files and
      // nothing else survives alongside: keep the snapshot readable
      val rel = s"data/w-$nonce/part-$nonce-empty.parquet"
      val abs = java.nio.file.Paths.get(opts.path).resolve(rel)
      ManifestParquet.openWriter(abs,
        ManifestParquet.messageTypeOf(schema)).close()
      staged = Seq(rel)
      rows = Map(rel -> 0L)
    }
    val stats = files.flatMap { f =>
      val entries = statsCols.flatMap(c =>
        f.stats.get(c).map { case (mn, mx) => (c, mn, mx) })
      if (entries.isEmpty) None else Some(f.rel -> entries)
    }.toMap
    val sstats = files.flatMap { f =>
      val entries = statsCols.flatMap(c =>
        f.sstats.get(c).map { case (mn, mx) => (c, mn, mx) })
      if (entries.isEmpty) None else Some(f.rel -> entries)
    }.toMap
    val root = java.nio.file.Paths.get(opts.path)
    val expectDvs = op.scan.pinned.slices.map(s =>
      root.relativize(java.nio.file.Paths.get(s.path)).toString ->
        s.dv.toSeq).toMap
    val pvals = files.flatMap(f =>
      if (f.pvals.isEmpty) None else Some(f.rel -> f.pvals)).toMap
    ManifestTable.publishReplace(opts.path, replaced, staged, stats,
      sstats, rows, expectDvs, pvals)
    ()
  }

  override def abort(msgs: Array[WriterCommitMessage]): Unit = {
    val dir = java.nio.file.Paths.get(opts.path, "data", s"w-$nonce")
    if (java.nio.file.Files.isDirectory(dir)) {
      import scala.jdk.CollectionConverters._
      scala.util.Using.resource(java.nio.file.Files.walk(dir)) { st =>
        st.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .iterator().asScala.foreach(java.nio.file.Files.delete)
      }
    }
  }
}

/** Parquet message type for the DSv2 writer AND the empty-overwrite
  * placeholder — shared so both stage byte-identical schemas. */
private[sources] object ManifestParquet {
  def messageTypeOf(s: StructType)
      : org.apache.parquet.schema.MessageType = {
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
    val fields = s.fields.toSeq.map { f =>
      f.dataType match {
        case LongType    => Types.optional(INT64).named(f.name)
        case IntegerType => Types.optional(INT32).named(f.name)
        case DoubleType  => Types.optional(DOUBLE).named(f.name)
        case FloatType   => Types.optional(FLOAT).named(f.name)
        case BooleanType => Types.optional(BOOLEAN).named(f.name)
        case DateType    => Types.optional(INT32)
          .as(LogicalTypeAnnotation.dateType()).named(f.name)
        case TimestampType => Types.optional(INT64)
          .as(LogicalTypeAnnotation.timestampType(true,
            LogicalTypeAnnotation.TimeUnit.MICROS)).named(f.name)
        case StringType  => Types.optional(BINARY)
          .as(LogicalTypeAnnotation.stringType()).named(f.name)
        case BinaryType  => Types.optional(BINARY).named(f.name)
        case other => throw new IllegalArgumentException(
          s"graft-manifest writes flat relational rows; column " +
            s"${f.name} has unsupported type $other")
      }
    }
    new org.apache.parquet.schema.MessageType("spark_schema",
      fields: _*)
  }

  def openWriter(abs: java.nio.file.Path,
      msgType: org.apache.parquet.schema.MessageType)
      : org.apache.parquet.hadoop.ParquetWriter[
        org.apache.parquet.example.data.Group] = {
    java.nio.file.Files.createDirectories(abs.getParent)
    org.apache.parquet.hadoop.example.ExampleParquetWriter
      .builder(org.apache.parquet.hadoop.util.HadoopOutputFile
        .fromPath(new org.apache.hadoop.fs.Path(abs.toString),
          new org.apache.hadoop.conf.Configuration()))
      .withType(msgType)
      .build()
  }
}

/** The WRITE half of the planner citizenship (`df.write
  * .format("graft-manifest").mode("append")` — the S17e pattern
  * applied to the lakehouse layer): each task stages ONE parquet
  * file under the job's writer-unique `data/w-<nonce>/` prefix —
  * with the nonce ALSO in the file basename, because deletion-vector
  * masking and compaction key on snapshot-unique basenames — and
  * reports (path, row count, per-stats-column min/max) in its commit
  * message; the job-level `BatchWrite.commit` then runs exactly ONE
  * optimistic manifest publish — the whole distributed write is
  * atomic (readers see all of the job's files or none), task retries
  * overwrite nothing (attempt-unique file names, losers deleted on
  * abort), and an aborted job leaves only unreferenced staging that
  * [[ManifestTable.vacuum]] reclaims. `option("statsColumns",
  * "a,b")` records zone lines from per-task streaming min/max — no
  * post-write scan, the DSv2 analog of
  * [[ManifestTable.commitWithStats]]: integer/date/timestamp
  * columns land as int64 `#stats=` lines (epoch days / micros),
  * string columns as `#sstats=` hex byte-wise lines with the
  * truncation-conservative bounds. Schema is ACCEPT_ANY (the
  * manifest's read side owns evolution: by-name union, late columns
  * NULL, same-name type drift loud at read). An OVERWRITE of an
  * empty frame still publishes — a snapshot holding one explicit
  * empty file — so `mode("overwrite")` truncates like Spark/Delta
  * instead of silently keeping the old snapshot. */
class ManifestWriteBuilder(schema: StructType,
    opts: ManifestV2Options, statsCols: Seq[String],
    partCols: Seq[String] = Seq.empty, queryId: String = "",
    bucketExprOk: Boolean = false)
    extends org.apache.spark.sql.connector.write.WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsTruncate {
  import org.apache.spark.sql.connector.write._
  statsCols.foreach { c =>
    require(schema.fieldNames.contains(c),
      s"statsColumns entry $c is not a written column")
    ManifestTable.statKindOf(schema(c).dataType, c) // loud on others
  }
  partCols.foreach { spec =>
    val c = ManifestBucket.column(spec)
    require(schema.fieldNames.contains(c),
      s"partition column $c is not a written column")
    ManifestTable.statKindOf(schema(c).dataType, c) // L/D/T/S only
  }
  // underlying partition COLUMNS (bucket(n,c) clusters/sorts by c —
  // a bucket is a function of its column, so column clustering
  // co-locates whole buckets without needing the planner to resolve
  // a bucket function for path-based writes)
  private val partDataCols: Seq[String] =
    partCols.map(ManifestBucket.column)
  // mode("overwrite") arrives as truncate(): the new snapshot lists
  // ONLY the job's files — old files stay on disk for time travel
  // until vacuum, exactly commit(append = false)'s contract
  private var append = true
  override def truncate(): WriteBuilder = { append = false; this }
  override def build(): Write = new Write
      with RequiresDistributionAndOrdering {
    // Distribution discipline for PARTITIONED appends (the
    // Iceberg write-distribution-mode=hash shape): cluster incoming
    // rows by the partition columns so each partition VALUE lands in
    // ONE task — a 32-task append to n values stages ~n files, not
    // 32×n slivers (at 1000 executors the difference is the whole
    // small-file problem). The exchange is the write's own rows,
    // paid once, and AQE may coalesce further. Within each task,
    // rows sort by the stats columns: tight `#stats=` zone lines AND
    // range-disjoint parquet row groups — exactly what file pruning
    // and the row-group skip feed on. Unpartitioned writes declare
    // nothing (no exchange).
    override def requiredDistribution
        : org.apache.spark.sql.connector.distributions.Distribution =
      if (partCols.isEmpty)
        org.apache.spark.sql.connector.distributions.Distributions
          .unspecified()
      else
        org.apache.spark.sql.connector.distributions.Distributions
          .clustered(partCols.map { spec =>
            ManifestBucket.parse(spec) match {
              // bucket specs cluster by the bucket FUNCTION when the
              // session can resolve it (catalog writes): one task
              // per bucket id, files = n. Spark's own hash-of-column
              // would scatter each bucket across tasks.
              case (c, Some(n)) if bucketExprOk =>
                org.apache.spark.sql.connector.expressions.Expressions
                  .bucket(n, c): org.apache.spark.sql.connector
                  .expressions.Expression
              case (c, _) =>
                org.apache.spark.sql.connector.expressions.Expressions
                  .column(c): org.apache.spark.sql.connector
                  .expressions.Expression
            }
          }.toArray)
    override def requiredOrdering
        : Array[org.apache.spark.sql.connector.expressions
          .SortOrder] =
      if (partCols.isEmpty) Array.empty
      else (partDataCols ++
        statsCols.filterNot(partDataCols.contains))
        .map(c => org.apache.spark.sql.connector.expressions
          .Expressions.sort(
            org.apache.spark.sql.connector.expressions.Expressions
              .column(c),
            org.apache.spark.sql.connector.expressions
              .SortDirection.ASCENDING)).toArray
    override def toBatch: BatchWrite =
      new ManifestBatchWrite(schema, opts, statsCols, partCols,
        append)
    override def toStreaming
        : org.apache.spark.sql.connector.write.streaming
          .StreamingWrite =
      new ManifestStreamingWrite(schema, opts, statsCols, partCols,
        queryId, append)
  }
}

/** Job-level commit bookkeeping the batch AND streaming writes
  * share: collect the tasks' staged files, fold their streamed
  * min/max into `#stats=`/`#sstats=` lines, their partition tuples
  * into `#pval=` lines, and publish ONE atomic version. */
private[sources] object ManifestCommit {
  import org.apache.spark.sql.connector.write.WriterCommitMessage

  def taskFiles(msgs: Array[WriterCommitMessage])
      : Seq[ManifestTaskFile] =
    msgs.toSeq.flatMap {
      case f: ManifestTaskFile => Seq(f)
      case s: ManifestTaskFileSet => s.files
      case _ => Seq.empty
    }.filter(_.rel.nonEmpty).sortBy(_.rel)

  def publish(path: String, schema: StructType,
      statsCols: Seq[String], append: Boolean, nonce: String,
      files: Seq[ManifestTaskFile], tag: Option[String]): Unit = {
    if (files.isEmpty) {
      // append of nothing publishes nothing; OVERWRITE of nothing
      // must still truncate (Spark/Delta semantics) — publish a
      // snapshot holding one explicit empty file so the table reads
      // as zero rows with its schema intact and countRows stays
      // exact. A column-less frame has nothing stageable: no-op.
      if (append || schema.isEmpty) return
      val rel = s"data/w-$nonce/part-$nonce-empty.parquet"
      val abs = java.nio.file.Paths.get(path).resolve(rel)
      ManifestParquet.openWriter(abs,
        ManifestParquet.messageTypeOf(schema)).close()
      ManifestTable.publishStaged(path, Seq(rel), Map.empty,
        Map(rel -> 0L), append = false)
      return
    }
    val stats = files.flatMap { f =>
      val entries = statsCols.flatMap(c =>
        f.stats.get(c).map { case (mn, mx) => (c, mn, mx) })
      if (entries.isEmpty) None else Some(f.rel -> entries)
    }.toMap
    val sstats = files.flatMap { f =>
      val entries = statsCols.flatMap(c =>
        f.sstats.get(c).map { case (mn, mx) => (c, mn, mx) })
      if (entries.isEmpty) None else Some(f.rel -> entries)
    }.toMap
    val pvals = files.flatMap(f =>
      if (f.pvals.isEmpty) None else Some(f.rel -> f.pvals)).toMap
    val ndvs = files.flatMap { f =>
      val entries = statsCols.flatMap(c =>
        f.ndvs.get(c).map { case (nulls, regs, hist) =>
          (c, nulls, regs, hist) })
      if (entries.isEmpty) None else Some(f.rel -> entries)
    }.toMap
    ManifestTable.publishStaged(path, files.map(_.rel),
      stats, files.map(f => f.rel -> f.rows).toMap, append, sstats,
      pvals, tag, ndvs)
    ()
  }

  def dropStaging(path: String, nonce: String): Unit = {
    val dir = java.nio.file.Paths.get(path, "data", s"w-$nonce")
    if (java.nio.file.Files.isDirectory(dir)) {
      import scala.jdk.CollectionConverters._
      scala.util.Using.resource(java.nio.file.Files.walk(dir)) { st =>
        st.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .iterator().asScala.foreach(java.nio.file.Files.delete)
      }
    }
  }
}

class ManifestBatchWrite(schema: StructType, opts: ManifestV2Options,
    statsCols: Seq[String], partCols: Seq[String], append: Boolean)
    extends org.apache.spark.sql.connector.write.BatchWrite {
  import org.apache.spark.sql.connector.write._
  private val nonce = java.util.UUID.randomUUID().toString.take(12)

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    ManifestWriterFactory(schema, opts.path, nonce, statsCols,
      partCols)

  override def commit(msgs: Array[WriterCommitMessage]): Unit =
    ManifestCommit.publish(opts.path, schema, statsCols, append,
      nonce, ManifestCommit.taskFiles(msgs), tag = None)

  // unreferenced staging is already invisible to readers; delete
  // what this job staged so vacuum has less to sweep
  override def abort(msgs: Array[WriterCommitMessage]): Unit =
    ManifestCommit.dropStaging(opts.path, nonce)
}

/** `writeStream.format("graft-manifest")` — the DSv2 streaming sink:
  * each epoch's tasks stage files exactly like the batch write, and
  * the epoch-level commit runs ONE tagged publish whose tag is
  * `stream:<queryId>:<epochId>` — a checkpoint replay of an
  * already-committed epoch short-circuits to the published version
  * (the ST7 exactly-once discipline, now at the SQL surface; the
  * same batch-id idempotence `streamCommit` keeps on the Scala
  * side). A replayed epoch's re-staged files are orphans vacuum
  * reclaims. Append-only: `complete`/`update` output modes would
  * rewrite history that immutable manifests reference. */
class ManifestStreamingWrite(schema: StructType,
    opts: ManifestV2Options, statsCols: Seq[String],
    partCols: Seq[String], queryId: String, append: Boolean)
    extends org.apache.spark.sql.connector.write.streaming
      .StreamingWrite {
  import org.apache.spark.sql.connector.write._
  require(append,
    "graft-manifest streaming sink is append-only (outputMode " +
      "\"append\"): complete/update would rewrite published history")

  private val nonce = java.util.UUID.randomUUID().toString.take(12)

  override def createStreamingWriterFactory(info: PhysicalWriteInfo)
      : streaming.StreamingDataWriterFactory =
    ManifestStreamingWriterFactory(schema, opts.path, nonce,
      statsCols, partCols)

  override def commit(epochId: Long,
      msgs: Array[WriterCommitMessage]): Unit =
    ManifestCommit.publish(opts.path, schema, statsCols,
      append = true, nonce, ManifestCommit.taskFiles(msgs),
      tag = Some(s"stream:$queryId:$epochId"))

  override def abort(epochId: Long,
      msgs: Array[WriterCommitMessage]): Unit =
    ManifestCommit.dropStaging(opts.path, s"$nonce-e$epochId")
}

/** Per-epoch writer factory: reuses the batch task writer with an
  * epoch-scoped nonce so two epochs of one query never stage the
  * same basename. */
final case class ManifestStreamingWriterFactory(schema: StructType,
    table: String, nonce: String, statsCols: Seq[String],
    partCols: Seq[String])
    extends org.apache.spark.sql.connector.write.streaming
      .StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
    ManifestWriterFactory(schema, table, s"$nonce-e$epochId",
      statsCols, partCols).createWriter(partitionId, taskId)
}

/** One task's staged file: manifest-relative path, row count,
  * per-stats-column bounds observed while streaming the rows —
  * int64 (min, max) for integer/date/timestamp columns, hex-encoded
  * truncation-conservative byte bounds for string columns — and, for
  * partitioned writes, the file's exact partition tuple (encoded
  * `#pval=` values). */
final case class ManifestTaskFile(rel: String, rows: Long,
    stats: Map[String, (Long, Long)],
    sstats: Map[String, (String, String)],
    pvals: Seq[(String, String)] = Seq.empty,
    ndvs: Map[String, (Long, String, String)] = Map.empty)
    extends org.apache.spark.sql.connector.write.WriterCommitMessage

/** A PARTITIONED task's staged files — one [[ManifestTaskFile]] per
  * partition tuple the task's rows touched. */
final case class ManifestTaskFileSet(files: Seq[ManifestTaskFile])
    extends org.apache.spark.sql.connector.write.WriterCommitMessage

final case class ManifestWriterFactory(schema: StructType,
    table: String, nonce: String, statsCols: Seq[String],
    partCols: Seq[String] = Seq.empty)
    extends org.apache.spark.sql.connector.write.DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
    new org.apache.spark.sql.connector.write.DataWriter[InternalRow] {
      // spec entries are identity columns or bucket(n,col) — the
      // writer routes rows by VALUE for identity, by canonical-hash
      // bucket id for buckets ([[ManifestBucket]]); pval lines key on
      // the underlying COLUMN either way
      private val partSpec = partCols.map(ManifestBucket.parse).toArray
      private val partColNames = partSpec.map(_._1)
      private val partBuckets = partSpec.map(_._2)
      private val partIdx =
        partColNames.map(schema.fieldIndex)
      private val partKind = partColNames.map(c =>
        ManifestTable.statKindOf(schema(c).dataType, c))
      // one open file per partition tuple this task sees (hive-style
      // split-by-value; bounded by the task's distinct tuples — size
      // partitions so tasks don't fan out to thousands of values,
      // same operational rule as Spark's own partitioned writes)
      private val open = scala.collection.mutable
        .LinkedHashMap.empty[String, OneFile]
      private var seq = 0

      /** Partition value of row `r` for partition column `j`,
        * encoded exactly as the `#pval=` manifest line. */
      private def encodeVal(r: InternalRow, j: Int): String = {
        val idx = partIdx(j)
        if (r.isNullAt(idx)) "N"
        else if (partBuckets(j).isDefined) {
          val n = partBuckets(j).get
          val id = partKind(j) match {
            case 'S' => ManifestBucket.idOfBytes(
              r.getUTF8String(idx).getBytes, n)
            case _ =>
              val v = schema(idx).dataType match {
                case LongType | TimestampType => r.getLong(idx)
                case IntegerType | DateType => r.getInt(idx).toLong
                case other => throw new IllegalStateException(
                  s"unreachable partition kind for $other")
              }
              ManifestBucket.idOfLong(v, n)
          }
          ManifestBucket.encode(n, id)
        }
        else partKind(j) match {
          case 'S' =>
            // partition values are EXACT equality keys, so unlike the
            // truncation-conservative #sstats= bounds they can never
            // shorten silently — cap them LOUDLY instead, keeping
            // every manifest line metadata-sized (a partition column
            // is a low-cardinality short key by design; a long value
            // here is a modeling error worth surfacing at write time)
            val bytes = r.getUTF8String(idx).getBytes.clone()
            require(bytes.length <= ManifestTable.MaxPartValueBytes,
              s"partition value of column ${partCols(j)} is " +
                s"${bytes.length} bytes (cap " +
                s"${ManifestTable.MaxPartValueBytes}) — string " +
                "partition columns must be short exact keys; use a " +
                "zone-stats column for long strings")
            "S:" + StrStat.hex(bytes)
          case _ =>
            val v = schema(idx).dataType match {
              case LongType | TimestampType => r.getLong(idx)
              case IntegerType | DateType => r.getInt(idx).toLong
              case other => throw new IllegalStateException(
                s"unreachable partition kind for $other")
            }
            s"L:$v"
        }
      }

      /** Human-readable hive-style directory segment for a
        * partition value. DISPLAY ONLY (lossy sanitization is fine —
        * basenames are unique and the `#pval=` line is the
        * authoritative value). */
      private def dirSeg(c: String, r: InternalRow, j: Int): String = {
        val idx = partIdx(j)
        val v =
          if (r.isNullAt(idx)) "__null__"
          else if (partBuckets(j).isDefined)
            "bucket" + encodeVal(r, j).dropWhile(_ != ':').drop(1)
          else {
            val raw = partKind(j) match {
              case 'S' => r.getUTF8String(idx).toString
              case _ => schema(idx).dataType match {
                case LongType | TimestampType =>
                  r.getLong(idx).toString
                case _ => r.getInt(idx).toString
              }
            }
            val safe = raw.map(ch =>
              if (ch.isLetterOrDigit || ch == '-' || ch == '_' ||
                ch == '.') ch else '_')
            if (safe.isEmpty) "__empty__" else safe.take(64)
          }
        s"$c=$v"
      }

      override def write(r: InternalRow): Unit = {
        val file =
          if (partIdx.isEmpty)
            open.getOrElseUpdate("", {
              seq += 1
              new OneFile(
                s"data/w-$nonce/part-$nonce-$partitionId-$taskId" +
                  ".parquet",
                Seq.empty)
            })
          else {
            val encs = partIdx.indices.map(j => encodeVal(r, j))
            open.getOrElseUpdate(encs.mkString(" "), {
              seq += 1
              val segs = partIdx.indices
                .map(j => dirSeg(partColNames(j), r, j))
                .mkString("/")
              new OneFile(
                s"data/w-$nonce/$segs/part-$nonce-$partitionId-" +
                  s"$taskId-$seq.parquet",
                partColNames.toSeq.zip(encs))
            })
          }
        file.write(r)
      }

      override def commit()
          : org.apache.spark.sql.connector.write.WriterCommitMessage =
        if (partIdx.isEmpty)
          // unpartitioned: one (or zero) staged file — keep the
          // single-message shape the rest of the engine pattern-matches
          open.values.headOption.map(_.finish())
            .getOrElse(ManifestTaskFile("", 0L, Map.empty, Map.empty))
        else ManifestTaskFileSet(open.values.map(_.finish()).toSeq)

      // attempt-unique file names make retries conflict-free; the
      // losers' bytes go here, the winners' paths reach commit()
      override def abort(): Unit = open.values.foreach(_.drop())
      override def close(): Unit = ()
    }

  /** One staged parquet file with its streamed per-column bounds —
    * the unit both the unpartitioned (one per task) and partitioned
    * (one per task × partition tuple) writers stage. `pvals` is the
    * file's exact partition tuple; partition columns stay IN the
    * data file too (unlike hive's path-only convention), which keeps
    * the reader, schema union, and evolution paths identical for
    * partitioned and unpartitioned tables — the bytes cost ~nothing
    * (constant columns run-length-encode). */
  private final class OneFile(rel: String,
      pvals: Seq[(String, String)]) {
    // nonce IN the basename: basenames must be snapshot-unique
    // (DV masking / compaction key on them), and taskIds restart
    // per application — two appends from different applications
    // must never stage the same basename
    private val abs = java.nio.file.Paths.get(table).resolve(rel)
    private val msgType = ManifestParquet.messageTypeOf(schema)
    private val statIdx = statsCols.map(schema.fieldIndex)
    private val statKind = statsCols.map(c =>
      ManifestTable.statKindOf(schema(c).dataType, c))
    private val mins = Array.fill(statsCols.size)(Long.MaxValue)
    private val maxs = Array.fill(statsCols.size)(Long.MinValue)
    private val strMins = Array.fill[UTF8String](statsCols.size)(null)
    private val strMaxs = Array.fill[UTF8String](statsCols.size)(null)
    // streamed per-column NDV sketch over the canonical encoding —
    // byte-identical to fileMeta's aggregate build (one blob format,
    // any write path)
    private val ndvRegs =
      Array.fill(statsCols.size)(NdvSketch.empty())
    private val nullCnt = Array.fill(statsCols.size)(0L)
    // streamed log-frame distribution histogram (int64 kinds; the
    // `#ndv=` line's histogram field — one update per row, a bitlen)
    private val histCnt = Array.fill(statsCols.size)(
      new Array[Long](graft.expressions.LogHist.B))
    private var n = 0L
    // open lazily on the FIRST row: empty partitions stage no file
    private var writer: org.apache.parquet.hadoop.ParquetWriter[
      org.apache.parquet.example.data.Group] = null
    private var factory:
      org.apache.parquet.example.data.simple.SimpleGroupFactory = null

    private def ensureOpen(): Unit = if (writer == null) {
      writer = ManifestParquet.openWriter(abs, msgType)
      factory = new org.apache.parquet.example.data.simple
        .SimpleGroupFactory(msgType)
    }

    def write(r: InternalRow): Unit = {
      ensureOpen()
      val g = factory.newGroup()
      var i = 0
      while (i < schema.length) {
        if (!r.isNullAt(i)) {
          val name = schema(i).name
          schema(i).dataType match {
            case LongType    => g.append(name, r.getLong(i))
            case IntegerType => g.append(name, r.getInt(i))
            case DoubleType  => g.append(name, r.getDouble(i))
            case FloatType   => g.append(name, r.getFloat(i))
            case BooleanType => g.append(name, r.getBoolean(i))
            case DateType    => g.append(name, r.getInt(i))
            case TimestampType => g.append(name, r.getLong(i))
            case StringType  => g.append(name,
              org.apache.parquet.io.api.Binary
                .fromString(r.getUTF8String(i).toString))
            case BinaryType  => g.append(name,
              org.apache.parquet.io.api.Binary
                .fromConstantByteArray(r.getBinary(i)))
            case other => throw new IllegalStateException(
              s"unreachable: $other passed messageTypeOf")
          }
        }
        i += 1
      }
      var j = 0
      while (j < statIdx.length) {
        val idx = statIdx(j)
        if (r.isNullAt(idx)) nullCnt(j) += 1L
        if (!r.isNullAt(idx)) {
          statKind(j) match {
            case 'S' =>
              // clone: the row's UTF8String may alias a reused
              // buffer; UTF8String.compareTo IS the unsigned
              // byte-wise order the zone lines need
              val v = r.getUTF8String(idx)
              if (strMins(j) == null ||
                  v.compareTo(strMins(j)) < 0)
                strMins(j) = v.clone()
              if (strMaxs(j) == null ||
                  v.compareTo(strMaxs(j)) > 0)
                strMaxs(j) = v.clone()
              NdvSketch.update(ndvRegs(j), v.getBytes)
            case k =>
              val v = schema(idx).dataType match {
                case LongType | TimestampType => r.getLong(idx)
                case IntegerType | DateType => r.getInt(idx).toLong
                case ShortType => r.getShort(idx).toLong
                case ByteType => r.getByte(idx).toLong
                case other => throw new IllegalStateException(
                  s"unreachable stat kind $k for $other")
              }
              if (v < mins(j)) mins(j) = v
              if (v > maxs(j)) maxs(j) = v
              histCnt(j)(graft.expressions.LogHist.bucketOf(v)) += 1L
              // canonical NDV input = the int64 encoding's decimal
              // string (what fileMeta's cast-to-string hashes too)
              NdvSketch.update(ndvRegs(j),
                String.valueOf(v).getBytes(
                  java.nio.charset.StandardCharsets.UTF_8))
          }
        }
        j += 1
      }
      writer.write(g)
      n += 1
    }

    def finish(): ManifestTaskFile =
      if (writer == null)
        ManifestTaskFile("", 0L, Map.empty, Map.empty)
      else {
        writer.close()
        val stats = statsCols.zipWithIndex.flatMap { case (c, j) =>
          if (statKind(j) == 'S' || mins(j) > maxs(j)) None
          else Some(c -> (mins(j), maxs(j)))
        }.toMap
        val sstats = statsCols.zipWithIndex.flatMap { case (c, j) =>
          if (statKind(j) != 'S' || strMins(j) == null) None
          else StrStat.entry(c, strMins(j).toString,
              strMaxs(j).toString)
            .map { case (_, mnH, mxH) => c -> (mnH, mxH) }
        }.toMap
        val ndvs = statsCols.zipWithIndex.map { case (c, j) =>
          val hist =
            if (statKind(j) == 'S') ""
            else graft.expressions.LogHist.encode(histCnt(j))
          c -> (nullCnt(j), StrStat.hex(ndvRegs(j)), hist)
        }.toMap
        ManifestTaskFile(rel, n, stats, sstats, pvals, ndvs)
      }

    def drop(): Unit = if (writer != null) {
      try writer.close() catch { case _: Throwable => () }
      java.nio.file.Files.deleteIfExists(abs); ()
    }
  }
}

/** The one-row partition a COMPLETE metadata-aggregate pushdown
  * plans: `values` are the precomputed answers (COUNT/MIN/MAX folds
  * of the manifest lines) in the pushed aggregates' order — the scan
  * reads zero data files. */
final case class ManifestMetaPartition(values: Array[Any])
    extends InputPartition
/** `rel` is the manifest-relative path — served as the `_graft_file`
  * metadata column (the row-level operation GROUP id). `start` /
  * `length` bound the parquet ROW GROUPS this partition reads (byte
  * range, midpoint rule — `Long.MaxValue` length = whole file):
  * large files plan several row-group-aligned partitions instead of
  * one straggler task. `rowOffset` is the file-ordinal of the
  * range's first row — what keeps deletion-vector positions (and the
  * `_graft_pos` row id) correct on a split read. */
final case class ManifestFilePartition(path: String, rel: String,
    dv: Array[Long], cols: Array[String], start: Long = 0L,
    length: Long = Long.MaxValue, rowOffset: Long = 0L)
    extends InputPartition

/** [[ManifestFilePartition]] plus its decoded `#pval=` tuple — the
  * [[org.apache.spark.sql.connector.read.HasPartitionKey]] face a
  * key-grouped (storage-partitioned-join) scan plans. Splits of one
  * file share the key; Spark groups same-key partitions per side and
  * zips them exchange-free. */
final case class ManifestKeyedPartition(base: ManifestFilePartition,
    keyVals: Array[Any]) extends InputPartition
    with org.apache.spark.sql.connector.read.HasPartitionKey {
  override def partitionKey(): InternalRow =
    new org.apache.spark.sql.catalyst.expressions
      .GenericInternalRow(keyVals)
}

final case class ManifestReaderFactory(required: StructType,
    columnar: Boolean = false,
    filters: Seq[Filter] = Seq.empty)
    extends PartitionReaderFactory {

  /** Scan-wide (Spark requires all partitions of a batch to agree):
    * the scan sets `columnar` unless a row-position column
    * (`_graft_pos`) is required — DV'd files stay columnar behind
    * the zero-copy row-id mapping ([[FilteredColumnVector]]). */
  override def supportColumnarReads(partition: InputPartition)
      : Boolean = columnar

  override def createColumnarReader(partition: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] =
    partition match {
      case ManifestKeyedPartition(base, _) =>
        createColumnarReader(base)
      case ManifestFilePartition(path, rel, dv, _, start, length,
          rowOffset) =>
        new ManifestColumnarReader(path, rel, start, length, required,
          dv, rowOffset, filters)
      case other => throw new IllegalStateException(
        s"columnar read of non-file partition $other")
    }

  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] =
    partition match {
      case ManifestMetaPartition(values) =>
        new PartitionReader[InternalRow] {
          private var done = false
          override def next(): Boolean =
            if (done) false else { done = true; true }
          override def get(): InternalRow =
            new org.apache.spark.sql.catalyst.expressions
              .GenericInternalRow(values)
          override def close(): Unit = ()
        }
      case ManifestKeyedPartition(base, _) => createReader(base)
      case ManifestFilePartition(path, rel, dv, _, start, length,
          rowOffset) =>
        new ManifestFileReader(path, rel, dv, required, start, length,
          rowOffset)
    }
}

/** VECTORIZED file reader — the hot path of every DV-free manifest
  * scan: Spark's own [[org.apache.spark.sql.execution.datasources
  * .parquet.VectorizedParquetRecordReader]] decodes the parquet
  * pages straight into ColumnarBatch vectors (the same reader the
  * built-in parquet source runs), so the DSv2 scan feeds whole-stage
  * codegen columnar instead of materializing one boxed Group per row.
  * The requested schema rides the standard `ParquetReadSupport` conf
  * seam, which also gives the merged-footer evolution contract for
  * free: a required column ABSENT from this file's footer is clipped
  * to a constant-NULL vector by the reader's missing-column handling.
  * `_graft_file` (when required) lands as a constant string vector
  * through the reader's partition-column seam; when it is not the
  * trailing column, the batch is re-wrapped in required order (the
  * vectors are shared — no copy). Byte range [start, start+length)
  * selects row groups by the parquet midpoint rule — the split seam.
  */
final class ManifestColumnarReader(path: String, rel: String,
    start: Long, length: Long, required: StructType,
    dv: Array[Long] = Array.empty, rowOffset: Long = 0L,
    filters: Seq[Filter] = Seq.empty)
    extends PartitionReader[
      org.apache.spark.sql.vectorized.ColumnarBatch] {
  import org.apache.spark.sql.execution.datasources.parquet.{ParquetReadSupport, VectorizedParquetRecordReader}
  import org.apache.spark.sql.vectorized.ColumnarBatch

  private val dataSchema = StructType(
    required.fields.filterNot(_.name == "_graft_file"))
  private val wantsFile = required.fieldNames.contains("_graft_file")

  private val reader: VectorizedParquetRecordReader = {
    val conf = new org.apache.hadoop.conf.Configuration()
    conf.set(org.apache.parquet.hadoop.ParquetInputFormat
      .READ_SUPPORT_CLASS, classOf[ParquetReadSupport].getName)
    conf.set(ParquetReadSupport.SPARK_ROW_REQUESTED_SCHEMA,
      dataSchema.json)
    // ---- INTRA-FILE predicate skipping: translate the scan's
    // pushed source filters to a parquet FilterPredicate against
    // THIS file's footer schema (absent / drifted columns simply do
    // not convert — Spark's ParquetFilters discipline), so the
    // decoder skips whole ROW GROUPS by min/max + dictionary +
    // bloom, and PAGES by the column index. DV'd reads skip the
    // skip: the deletion-vector mapping (and split `rowOffset`
    // arithmetic) needs the running ordinal to equal the file row
    // index, which only holds when no row group is elided. Any
    // metadata hiccup disables it — pushdown is an optimization,
    // never a correctness step (Spark re-applies every filter
    // row-level above the scan).
    if (filters.nonEmpty && dv.isEmpty) {
      try {
        val inF = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(new org.apache.hadoop.fs.Path(path), conf)
        val fr = org.apache.parquet.hadoop.ParquetFileReader.open(inF)
        val msgType =
          try fr.getFooter.getFileMetaData.getSchema
          finally fr.close()
        val pf = new org.apache.spark.sql.execution.datasources
          .parquet.ParquetFilters(msgType,
            true, true, true, true, 10, false,
            org.apache.spark.sql.catalyst.util.RebaseDateTime
              .RebaseSpec(org.apache.spark.sql.internal
                .LegacyBehaviorPolicy.CORRECTED, None))
        filters.flatMap(f => pf.createFilter(f))
          .reduceOption(
            org.apache.parquet.filter2.predicate.FilterApi.and)
          .foreach(p => org.apache.parquet.hadoop.ParquetInputFormat
            .setFilterPredicate(conf, p))
      } catch { case scala.util.control.NonFatal(_) => () }
    }
    val sql = org.apache.spark.sql.internal.SQLConf
    conf.setBoolean(sql.CASE_SENSITIVE.key, false)
    conf.setBoolean(sql.PARQUET_BINARY_AS_STRING.key, false)
    conf.setBoolean(sql.PARQUET_INT96_AS_TIMESTAMP.key, true)
    conf.setBoolean(sql.PARQUET_INFER_TIMESTAMP_NTZ_ENABLED.key, true)
    // manifest tables never carry TIMESTAMP(NANOS) (messageTypeOf
    // forbids it; Spark stages micros/INT96), so the legacy
    // nanos-as-long toggle is moot — set, because the schema
    // converter reads it with no default
    conf.setBoolean(sql.LEGACY_PARQUET_NANOS_AS_LONG.key, false)
    conf.set(sql.SESSION_LOCAL_TIMEZONE.key, "UTC")
    // files are written by this engine (Spark 4 / the DSv2 writer) —
    // modern proleptic-Gregorian values, CORRECTED on both rebases
    // (exactly the semantics the row-path INT96 decoder applies)
    val r = new VectorizedParquetRecordReader(null, "CORRECTED",
      "UTC", "CORRECTED", "UTC", false, 4096)
    val len = if (length == Long.MaxValue) {
      try java.nio.file.Files.size(java.nio.file.Paths.get(path))
      catch { case _: java.io.IOException => Long.MaxValue - 1L }
    } else length
    val split = new org.apache.hadoop.mapred.FileSplit(
      new org.apache.hadoop.fs.Path(path), start, len,
      Array.empty[String])
    val ctx = new org.apache.hadoop.mapreduce.task
      .TaskAttemptContextImpl(conf,
        new org.apache.hadoop.mapreduce.TaskAttemptID())
    r.initialize(split, ctx)
    if (wantsFile)
      r.initBatch(
        StructType(Seq(StructField("_graft_file", StringType,
          nullable = false))),
        new org.apache.spark.sql.catalyst.expressions
          .GenericInternalRow(
            Array[Any](UTF8String.fromString(rel))))
    else
      r.initBatch(new StructType(),
        org.apache.spark.sql.catalyst.InternalRow.empty)
    r.enableReturningBatches()
    r
  }

  // batch column order = dataSchema then the appended constant; remap
  // to `required` order when they differ (shared vectors, no copy)
  private val inner: ColumnarBatch = reader.resultBatch()
  private val ordered: Array[org.apache.spark.sql.vectorized
      .ColumnVector] = {
    val batchOrder = dataSchema.fieldNames ++
      (if (wantsFile) Array("_graft_file") else Array.empty[String])
    val idx = batchOrder.zipWithIndex.toMap
    required.fieldNames.map(n => inner.column(idx(n)))
  }

  // ---- DELETION-VECTOR masking, columnar (the Iceberg
  // ColumnVectorWithFilter / row-id-mapping shape): per batch, build
  // the LIVE ordinals' index mapping (dv is sorted; one merge pass)
  // and serve delegating vectors that translate rowId through it —
  // dead rows vanish with zero copying, and merge-on-read tables
  // keep vectorized scan speed instead of dropping to the row path.
  private val mapping = new Array[Int](4096)
  private val mapped: Array[FilteredColumnVector] =
    if (dv.isEmpty) Array.empty
    else ordered.map(new FilteredColumnVector(_, mapping))
  private val out: ColumnarBatch =
    if (dv.isEmpty) new ColumnarBatch(
      ordered.map(v => v: org.apache.spark.sql.vectorized.ColumnVector))
    else new ColumnarBatch(
      mapped.map(v => v: org.apache.spark.sql.vectorized.ColumnVector))
  // next file ordinal = rows served so far within this partition's
  // byte range (row groups stream in order), offset by the range's
  // first ordinal — the same `_metadata.row_index` discipline as the
  // row path
  private var ordinal = rowOffset
  private var dvIdx = {
    var i = 0
    while (i < dv.length && dv(i) < rowOffset) i += 1
    i
  }
  private var live = 0

  override def next(): Boolean = {
    if (!reader.nextBatch()) return false
    val n = inner.numRows()
    ManifestColumnarReader.rowsDecoded.addAndGet(n)
    if (dv.isEmpty) { out.setNumRows(n); return true }
    live = 0
    var i = 0
    while (i < n) {
      if (dvIdx < dv.length && dv(dvIdx) == ordinal + i) dvIdx += 1
      else { mapping(live) = i; live += 1 }
      i += 1
    }
    ordinal += n
    out.setNumRows(live)
    true
  }

  override def get(): ColumnarBatch = out
  override def close(): Unit = reader.close()
}

object ManifestColumnarReader {
  /** JVM-wide decoded-row counter — a local-mode DIAGNOSTIC (specs
    * and the graded row-group-skip probe reset it, run one scan, and
    * read it back; at local[32] every task shares this JVM). One
    * atomic add per 4096-row batch — noise on the hot path. */
  val rowsDecoded = new java.util.concurrent.atomic.AtomicLong()
}

/** A zero-copy VIEW over a batch vector that translates row ids
  * through a live-rows index mapping — how deletion vectors mask in
  * COLUMNAR reads (the batch's numRows shrinks to the live count;
  * accessor i reads underlying row mapping(i)). Flat relational
  * types only — exactly the manifest surface contract. */
private[sources] final class FilteredColumnVector(
    inner: org.apache.spark.sql.vectorized.ColumnVector,
    mapping: Array[Int])
    extends org.apache.spark.sql.vectorized.ColumnVector(
      inner.dataType()) {
  override def close(): Unit = () // the reader owns the inner vector
  override def hasNull: Boolean = inner.hasNull
  override def numNulls(): Int = inner.numNulls()
  override def isNullAt(i: Int): Boolean = inner.isNullAt(mapping(i))
  override def getBoolean(i: Int): Boolean =
    inner.getBoolean(mapping(i))
  override def getByte(i: Int): Byte = inner.getByte(mapping(i))
  override def getShort(i: Int): Short = inner.getShort(mapping(i))
  override def getInt(i: Int): Int = inner.getInt(mapping(i))
  override def getLong(i: Int): Long = inner.getLong(mapping(i))
  override def getFloat(i: Int): Float = inner.getFloat(mapping(i))
  override def getDouble(i: Int): Double =
    inner.getDouble(mapping(i))
  override def getUTF8String(i: Int): UTF8String =
    inner.getUTF8String(mapping(i))
  override def getBinary(i: Int): Array[Byte] =
    inner.getBinary(mapping(i))
  override def getDecimal(i: Int, precision: Int,
      scale: Int): org.apache.spark.sql.types.Decimal =
    inner.getDecimal(mapping(i), precision, scale)
  override def getArray(i: Int)
      : org.apache.spark.sql.vectorized.ColumnarArray =
    throw new UnsupportedOperationException(
      "manifest tables serve flat relational columns")
  override def getMap(i: Int)
      : org.apache.spark.sql.vectorized.ColumnarMap =
    throw new UnsupportedOperationException(
      "manifest tables serve flat relational columns")
  override def getChild(i: Int)
      : org.apache.spark.sql.vectorized.ColumnVector =
    throw new UnsupportedOperationException(
      "manifest tables serve flat relational columns")
}

/** One file's ROW reader (the DV-masking / row-id path; DV-free
  * scans take [[ManifestColumnarReader]]): parquet-mr Group API with
  * the projection pushed into the read schema, deletion-vector
  * positions skipped by ordinal (parquet-mr yields rows in file
  * order, so the running counter — seeded with the partition's
  * `rowOffset` on a split read — IS `_metadata.row_index`). Byte
  * range [start, start+length) selects row groups by the same
  * midpoint rule as the columnar reader. */
final class ManifestFileReader(path: String, rel: String,
    dv: Array[Long],
    required: StructType, start: Long = 0L,
    length: Long = Long.MaxValue,
    rowOffset: Long = 0L) extends PartitionReader[InternalRow] {
  private val conf = new org.apache.hadoop.conf.Configuration()
  private val fileSchema = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(path), conf)
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try r.getFooter.getFileMetaData.getSchema finally r.close()
  }
  // projection: only requested columns THIS file has (evolution —
  // missing columns read as NULL); parquet-mr takes it via the
  // read-schema conf key
  private val present = required.fieldNames.filter(fileSchema.containsField)
  locally {
    if (present.nonEmpty) {
      val fields = present.toSeq
        .map(n => fileSchema.getType(fileSchema.getFieldIndex(n)))
      val msg = new org.apache.parquet.schema.MessageType(
        "spark_schema", fields: _*)
      conf.set(org.apache.parquet.hadoop.api.ReadSupport
        .PARQUET_READ_SCHEMA, msg.toString)
    }
  }
  private val reader: org.apache.parquet.hadoop.ParquetReader[
      org.apache.parquet.example.data.Group] = {
    val end =
      if (length == Long.MaxValue) Long.MaxValue
      else Math.addExact(start, length)
    org.apache.parquet.hadoop.ParquetReader
      .builder(new org.apache.parquet.hadoop.example.GroupReadSupport(),
        new org.apache.hadoop.fs.Path(path))
      .withConf(conf)
      .withFileRange(start, end)
      .build()
  }
  private val dead: java.util.HashSet[java.lang.Long] = {
    val s = new java.util.HashSet[java.lang.Long]()
    dv.foreach(p => s.add(p))
    s
  }
  // TIMESTAMP columns arrive in either parquet encoding: INT64
  // MICROS (the DSv2 writer) or legacy 12-byte INT96 (Spark's
  // default df.write.parquet, i.e. the Scala-path staged commits)
  private val int96Fields: java.util.HashSet[String] = {
    import scala.jdk.CollectionConverters._
    val s = new java.util.HashSet[String]()
    fileSchema.getFields.asScala.foreach { f =>
      if (f.isPrimitive && f.asPrimitiveType().getPrimitiveTypeName ==
          org.apache.parquet.schema.PrimitiveType
            .PrimitiveTypeName.INT96)
        s.add(f.getName)
    }
    s
  }

  /** INT96 parquet timestamp → epoch microseconds: 8 little-endian
    * bytes of nanos-within-day followed by 4 little-endian bytes of
    * Julian day (the public parquet layout Spark/Hive/Impala share).
    */
  private def int96Micros(b: Array[Byte]): Long = {
    val buf = java.nio.ByteBuffer.wrap(b)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val nanos = buf.getLong
    val julianDay = buf.getInt
    (julianDay - 2440588L) * 86400000000L + nanos / 1000L
  }

  private var pos = rowOffset - 1L
  private var current: InternalRow = _

  override def next(): Boolean = {
    var g = reader.read()
    pos += 1
    while (g != null && dead.contains(pos)) {
      g = reader.read()
      pos += 1
    }
    if (g == null) false
    else { current = decode(g); true }
  }

  override def get(): InternalRow = current
  override def close(): Unit = reader.close()

  private def decode(
      g: org.apache.parquet.example.data.Group): InternalRow = {
    val vals = new Array[Any](required.length)
    var i = 0
    while (i < required.length) {
      val name = required(i).name
      vals(i) =
        if (name == "_graft_file") UTF8String.fromString(rel)
        else if (name == "_graft_pos") pos // physical file ordinal
        else if (!fileSchema.containsField(name)) null // evolution
        else if (g.getFieldRepetitionCount(name) == 0) null
        else required(i).dataType match {
          case LongType    => g.getLong(name, 0)
          case IntegerType => g.getInteger(name, 0)
          case DoubleType  => g.getDouble(name, 0)
          case FloatType   => g.getFloat(name, 0)
          case BooleanType => g.getBoolean(name, 0)
          case DateType    => g.getInteger(name, 0) // epoch days
          case TimestampType => // epoch micros
            if (int96Fields.contains(name))
              int96Micros(g.getInt96(name, 0).getBytes)
            else g.getLong(name, 0)
          case StringType  =>
            UTF8String.fromBytes(g.getBinary(name, 0).getBytes)
          case BinaryType  => g.getBinary(name, 0).getBytes
          case other => throw new IllegalStateException(
            s"unreachable: $other passed schema inference")
        }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions
      .GenericInternalRow(vals)
  }
}
