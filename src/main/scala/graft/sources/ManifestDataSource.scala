package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
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
  *    [[ManifestTable.read]];
  *  - **zone pruning reaches the planner**: range filters on stats
  *    columns plan one InputPartition per SURVIVING file — a pruned
  *    query's scan has fewer partitions, visible in `.explain` and
  *    `rdd.getNumPartitions` (the same `#stats=` arithmetic as
  *    [[ManifestTable.readPruned]], now driven by Catalyst filters);
  *    pushed filters are also re-applied row-level by Spark
  *    (declared residual), so skipping stays an optimization, never
  *    a filter;
  *  - **metadata-only COUNT(*)**: a global count with no residual
  *    filters answers COMPLETELY from the manifest's `#nrows=` lines
  *    (minus deletion-vector cardinalities) — one small-file read,
  *    zero data I/O, through the planner's aggregate-pushdown seam;
  *    declined (normal scan) whenever any live file lacks a count;
  *  - **deletion vectors apply**: each InputPartition carries its
  *    file's dead positions and the reader skips them by ordinal —
  *    a DSv2 read of a DV'd snapshot is value-identical to
  *    [[ManifestTable.read]].
  *
  * The partition reader decodes parquet directly via parquet-mr's
  * Group API (the same bundled library Spark's own scan uses
  * underneath) with the projection pushed into the read schema —
  * column pruning costs nothing at the I/O layer. Surface contract:
  * FLAT relational snapshots (boolean/int/long/float/double/binary/
  * string columns — what the manifest DML writes); nested types
  * fail loudly at schema inference. Schema is the by-name union of
  * the LIVE files' footers (the S16 read-side evolution contract:
  * files missing a late column read it as NULL).
  */
class ManifestTableProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-manifest"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ManifestV2.schemaFor(ManifestV2Options(options))

  override def getTable(schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ManifestV2Table(schema,
      ManifestV2Options(new CaseInsensitiveStringMap(properties)))
}

/** Table options (serializable — shipped to tasks). */
final case class ManifestV2Options(path: String, version: Option[Long])
    extends Serializable

object ManifestV2Options {
  def apply(o: CaseInsensitiveStringMap): ManifestV2Options = {
    val p = o.get("path")
    require(p != null, "graft-manifest requires option 'path'")
    ManifestV2Options(p, Option(o.get("version")).map(_.toLong))
  }
}

object ManifestV2 {

  /** One live file of the planned snapshot: absolute path, its
    * deletion-vector positions (sorted), and the manifest row count
    * when recorded. */
  final case class FileSlice(path: String, dv: Array[Long],
      rows: Option[Long]) extends Serializable

  /** Resolve the snapshot: (files with their DVs/counts, per-file
    * zone stats keyed by relative path). */
  def resolve(opts: ManifestV2Options)
      : (Seq[FileSlice], Map[String, Seq[(String, Long, Long)]]) = {
    val snap = ManifestTable.snapshotFor(opts.path, opts.version)
    val root = java.nio.file.Paths.get(opts.path)
    val slices = snap.files.map { f =>
      FileSlice(root.resolve(f).toString,
        snap.dvs.getOrElse(f, Seq.empty).toArray,
        snap.rows.get(f))
    }
    (slices, snap.files.map(f =>
      f -> snap.stats.getOrElse(f, Seq.empty)).toMap)
  }

  private def footerSchema(path: String): StructType = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(path),
      new org.apache.hadoop.conf.Configuration())
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val msg = reader.getFooter.getFileMetaData.getSchema
      import scala.jdk.CollectionConverters._
      StructType(msg.getFields.asScala.toSeq.map { f =>
        require(f.isPrimitive,
          s"graft-manifest serves flat relational snapshots; " +
            s"column ${f.getName} is nested")
        val p = f.asPrimitiveType()
        import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
        val dt = p.getPrimitiveTypeName match {
          case INT64   => LongType
          case INT32   => IntegerType
          case DOUBLE  => DoubleType
          case FLOAT   => FloatType
          case BOOLEAN => BooleanType
          case BINARY
              if p.getLogicalTypeAnnotation ==
                org.apache.parquet.schema.LogicalTypeAnnotation
                  .stringType() => StringType
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
    val (slices, _) = resolve(opts)
    require(slices.nonEmpty,
      s"graft-manifest: snapshot of ${opts.path} lists no data files")
    slices.map(s => footerSchema(s.path)).reduce { (a, b) =>
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

class ManifestV2Table(schema: StructType, opts: ManifestV2Options)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = s"graft-manifest:${opts.path}"
  override def schema(): StructType = schema
  // ACCEPT_ANY_SCHEMA: the manifest's READ side owns schema
  // evolution (by-name union of live footers, late columns NULL,
  // same-name type drift loud at read) — validating appends against
  // the inferred union would reject exactly the evolving commits the
  // table is built to absorb, and the write-bootstrap table has no
  // schema to validate against at all
  override def capabilities(): util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.ACCEPT_ANY_SCHEMA)
  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new ManifestScanBuilder(schema, opts)
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new ManifestWriteBuilder(info.schema(), opts,
      Option(info.options.get("statsColumns"))
        .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
        .getOrElse(Seq.empty))
}

class ManifestScanBuilder(fullSchema: StructType,
    opts: ManifestV2Options)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters with SupportsPushDownAggregates {

  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty
  private var countOnly: Option[Long] = None

  override def pruneColumns(requiredSchema: StructType): Unit =
    if (countOnly.isEmpty) required = requiredSchema

  /** Filters usable for ZONE pruning are remembered (and surfaced in
    * explain); ALL filters are returned residual — Spark re-applies
    * them row-level, so the zones only ever skip, never filter. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(f =>
      ManifestScan.rangesOf(Seq(f), fullSchema).nonEmpty)
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  /** Only a complete answer is worth taking over: the global
    * COUNT(*) of a fully-counted snapshot is pure manifest
    * arithmetic (rows − |dv| per file). Everything else — grouped
    * aggregates, counts under residual filters (pushFilters returns
    * them all residual, so Spark only offers the aggregate when NO
    * filter remains), min/max — declines to a normal scan. */
  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate
        .Aggregation): Boolean =
    countFor(agg).isDefined

  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate
        .Aggregation): Boolean =
    countFor(agg) match {
      case Some(n) => countOnly = Some(n); true
      case None => false
    }

  private def countFor(
      agg: org.apache.spark.sql.connector.expressions.aggregate
        .Aggregation): Option[Long] = {
    import org.apache.spark.sql.connector.expressions.aggregate._
    if (agg.groupByExpressions.nonEmpty) return None
    if (pushed.nonEmpty) return None // a filter means counting rows
    agg.aggregateExpressions.toSeq match {
      case Seq(_: CountStar) =>
        val (slices, _) = ManifestV2.resolve(opts)
        val per = slices.map(s => s.rows.map(_ - s.dv.length))
        if (per.forall(_.isDefined)) Some(per.flatten.sum) else None
      case _ => None
    }
  }

  override def build(): Scan =
    new ManifestScan(required, pushed, countOnly, opts)
}

object ManifestScan {
  /** Conjunctive [lo, hi] ranges per LONG column from source
    * filters — the zone-pruning predicate form. Only long-typed
    * columns with integral literals participate (same exactness
    * discipline as the manifest's `#stats=` lines). */
  def rangesOf(filters: Seq[Filter], schema: StructType)
      : Map[String, (Long, Long)] = {
    def longCol(a: String): Boolean =
      schema.fields.exists(f => f.name == a && f.dataType == LongType)
    def asLong(v: Any): Option[Long] = v match {
      case l: java.lang.Long    => Some(l)
      case i: java.lang.Integer => Some(i.toLong)
      case s: java.lang.Short   => Some(s.toLong)
      case b: java.lang.Byte    => Some(b.toLong)
      case _ => None
    }
    val ranges = filters.flatMap {
      case EqualTo(a, v) if longCol(a) =>
        asLong(v).map(x => a -> (x, x))
      case GreaterThan(a, v) if longCol(a) =>
        asLong(v).filter(_ < Long.MaxValue)
          .map(x => a -> (x + 1, Long.MaxValue))
      case GreaterThanOrEqual(a, v) if longCol(a) =>
        asLong(v).map(x => a -> (x, Long.MaxValue))
      case LessThan(a, v) if longCol(a) =>
        asLong(v).filter(_ > Long.MinValue)
          .map(x => a -> (Long.MinValue, x - 1))
      case LessThanOrEqual(a, v) if longCol(a) =>
        asLong(v).map(x => a -> (Long.MinValue, x))
      case And(l, r) =>
        rangesOf(Seq(l), schema).toSeq ++ rangesOf(Seq(r), schema).toSeq
      case _ => Seq.empty
    }
    ranges.groupBy(_._1).view.mapValues { rs =>
      (rs.map(_._2._1).max, rs.map(_._2._2).min)
    }.toMap
  }
}

class ManifestScan(required: StructType, pushed: Array[Filter],
    countOnly: Option[Long], opts: ManifestV2Options)
    extends Scan with Batch {

  override def readSchema(): StructType = countOnly match {
    case Some(_) => StructType(Seq(StructField("count", LongType)))
    case None => required
  }

  override def toBatch: Batch = this

  override def description(): String = countOnly match {
    case Some(n) => s"graft-manifest ${opts.path} [metadata count=$n]"
    case None =>
      s"graft-manifest ${opts.path} " +
        s"[files=${planInputPartitions().length}, " +
        s"zonePruned=${pushed.mkString(", ")}]"
  }

  override def planInputPartitions(): Array[InputPartition] =
    countOnly match {
      case Some(n) => Array(ManifestCountPartition(n))
      case None =>
        val (slices, stats) = ManifestV2.resolve(opts)
        val root = java.nio.file.Paths.get(opts.path)
        // a file survives unless SOME pushed range provably misses
        // its recorded zone for that column (absent line → scan; a
        // known-empty file skips exactly)
        val kept = slices.filter { s =>
          val rel = root.relativize(
            java.nio.file.Paths.get(s.path)).toString
          val lines = stats.getOrElse(rel, Seq.empty)
          !s.rows.contains(0L) &&
          rangesOfPushed.forall { case (c, (lo, hi)) =>
            lines.find(_._1 == c)
              .forall { case (_, mn, mx) => mx >= lo && mn <= hi }
          }
        }
        kept.map(s =>
          ManifestFilePartition(s.path, s.dv, required.fieldNames)
            : InputPartition).toArray
    }

  /** Ranges computed against the TABLE schema (pushed filters may
    * name columns the projection dropped). */
  private lazy val rangesOfPushed: Map[String, (Long, Long)] =
    ManifestScan.rangesOf(pushed.toSeq,
      ManifestV2.schemaFor(opts))

  override def createReaderFactory(): PartitionReaderFactory =
    ManifestReaderFactory(required)
}

/** The WRITE half of the planner citizenship (`df.write
  * .format("graft-manifest").mode("append")` — the S17e pattern
  * applied to the lakehouse layer): each task stages ONE parquet
  * file under the job's writer-unique `data/w-<nonce>/` prefix and
  * reports (path, row count, per-stats-column min/max) in its commit
  * message; the job-level `BatchWrite.commit` then runs exactly ONE
  * optimistic manifest publish — the whole distributed write is
  * atomic (readers see all of the job's files or none), task retries
  * overwrite nothing (attempt-unique file names, losers deleted on
  * abort), and an aborted job leaves only unreferenced staging that
  * [[ManifestTable.vacuum]] reclaims. `option("statsColumns",
  * "a,b")` records `#stats=`/`#nrows=` zone lines from per-task
  * streaming min/max — no post-write scan, the DSv2 analog of
  * [[ManifestTable.commitWithStats]]. Schema is ACCEPT_ANY (the
  * manifest's read side owns evolution: by-name union, late columns
  * NULL, same-name type drift loud at read). */
class ManifestWriteBuilder(schema: StructType,
    opts: ManifestV2Options, statsCols: Seq[String])
    extends org.apache.spark.sql.connector.write.WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsTruncate {
  import org.apache.spark.sql.connector.write._
  statsCols.foreach { c =>
    require(schema.fieldNames.contains(c),
      s"statsColumns entry $c is not a written column")
    require(schema(c).dataType == LongType ||
        schema(c).dataType == IntegerType,
      s"statsColumns entry $c must be integer-typed (zone lines " +
        s"are exact int64), got ${schema(c).dataType}")
  }
  // mode("overwrite") arrives as truncate(): the new snapshot lists
  // ONLY the job's files — old files stay on disk for time travel
  // until vacuum, exactly commit(append = false)'s contract
  private var append = true
  override def truncate(): WriteBuilder = { append = false; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new ManifestBatchWrite(schema, opts, statsCols, append)
  }
}

class ManifestBatchWrite(schema: StructType, opts: ManifestV2Options,
    statsCols: Seq[String], append: Boolean)
    extends org.apache.spark.sql.connector.write.BatchWrite {
  import org.apache.spark.sql.connector.write._
  private val nonce = java.util.UUID.randomUUID().toString.take(12)

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    ManifestWriterFactory(schema, opts.path, nonce, statsCols)

  override def commit(msgs: Array[WriterCommitMessage]): Unit = {
    val files = msgs.collect {
      case f: ManifestTaskFile if f.rel.nonEmpty => f
    }.sortBy(_.rel)
    if (files.isEmpty) return // an all-empty write publishes nothing
    val stats = files.flatMap { f =>
      val entries = statsCols.flatMap(c =>
        f.stats.get(c).map { case (mn, mx) => (c, mn, mx) })
      if (entries.isEmpty) None else Some(f.rel -> entries)
    }.toMap
    ManifestTable.publishStaged(opts.path, files.map(_.rel).toSeq,
      stats, files.map(f => f.rel -> f.rows).toMap, append)
    ()
  }

  override def abort(msgs: Array[WriterCommitMessage]): Unit = {
    // unreferenced staging is already invisible to readers; delete
    // what this job staged so vacuum has less to sweep
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

/** One task's staged file: manifest-relative path, row count, and
  * per-stats-column (min, max) observed while streaming the rows. */
final case class ManifestTaskFile(rel: String, rows: Long,
    stats: Map[String, (Long, Long)])
    extends org.apache.spark.sql.connector.write.WriterCommitMessage

final case class ManifestWriterFactory(schema: StructType,
    table: String, nonce: String, statsCols: Seq[String])
    extends org.apache.spark.sql.connector.write.DataWriterFactory {

  private def messageTypeOf(s: StructType)
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

  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
    new org.apache.spark.sql.connector.write.DataWriter[InternalRow] {
      private val rel =
        s"data/w-$nonce/part-$partitionId-$taskId.parquet"
      private val abs = java.nio.file.Paths.get(table).resolve(rel)
      private val msgType = messageTypeOf(schema)
      private val statIdx = statsCols.map(schema.fieldIndex)
      private val mins = Array.fill(statsCols.size)(Long.MaxValue)
      private val maxs = Array.fill(statsCols.size)(Long.MinValue)
      private var n = 0L
      // open lazily on the FIRST row: empty partitions stage no file
      private var writer: org.apache.parquet.hadoop.ParquetWriter[
        org.apache.parquet.example.data.Group] = null
      private var factory:
        org.apache.parquet.example.data.simple.SimpleGroupFactory = null

      private def ensureOpen(): Unit = if (writer == null) {
        java.nio.file.Files.createDirectories(abs.getParent)
        writer = org.apache.parquet.hadoop.example.ExampleParquetWriter
          .builder(org.apache.parquet.hadoop.util.HadoopOutputFile
            .fromPath(new org.apache.hadoop.fs.Path(abs.toString),
              new org.apache.hadoop.conf.Configuration()))
          .withType(msgType)
          .build()
        factory = new org.apache.parquet.example.data.simple
          .SimpleGroupFactory(msgType)
      }

      override def write(r: InternalRow): Unit = {
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
          if (!r.isNullAt(idx)) {
            val v = schema(idx).dataType match {
              case LongType => r.getLong(idx)
              case _        => r.getInt(idx).toLong
            }
            if (v < mins(j)) mins(j) = v
            if (v > maxs(j)) maxs(j) = v
          }
          j += 1
        }
        writer.write(g)
        n += 1
      }

      override def commit()
          : org.apache.spark.sql.connector.write.WriterCommitMessage =
        if (writer == null) ManifestTaskFile("", 0L, Map.empty)
        else {
          writer.close()
          val stats = statsCols.zipWithIndex.flatMap { case (c, j) =>
            if (mins(j) > maxs(j)) None // all-NULL column in this file
            else Some(c -> (mins(j), maxs(j)))
          }.toMap
          ManifestTaskFile(rel, n, stats)
        }

      // attempt-unique file names make retries conflict-free; the
      // loser's bytes go here, the winner's path reaches commit()
      override def abort(): Unit = if (writer != null) {
        try writer.close() catch { case _: Throwable => () }
        java.nio.file.Files.deleteIfExists(abs); ()
      }
      override def close(): Unit = ()
    }
}

final case class ManifestCountPartition(n: Long) extends InputPartition
final case class ManifestFilePartition(path: String, dv: Array[Long],
    cols: Array[String]) extends InputPartition

final case class ManifestReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] =
    partition match {
      case ManifestCountPartition(n) =>
        new PartitionReader[InternalRow] {
          private var done = false
          override def next(): Boolean =
            if (done) false else { done = true; true }
          override def get(): InternalRow =
            new org.apache.spark.sql.catalyst.expressions
              .GenericInternalRow(Array[Any](n))
          override def close(): Unit = ()
        }
      case ManifestFilePartition(path, dv, _) =>
        new ManifestFileReader(path, dv, required)
    }
}

/** One file's reader: parquet-mr Group API with the projection
  * pushed into the read schema, deletion-vector positions skipped by
  * ordinal (parquet-mr yields rows in file order, so the running
  * counter IS `_metadata.row_index`). */
final class ManifestFileReader(path: String, dv: Array[Long],
    required: StructType) extends PartitionReader[InternalRow] {
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
      org.apache.parquet.example.data.Group] =
    org.apache.parquet.hadoop.ParquetReader
      .builder(new org.apache.parquet.hadoop.example.GroupReadSupport(),
        new org.apache.hadoop.fs.Path(path))
      .withConf(conf)
      .build()
  private val dead: java.util.HashSet[java.lang.Long] = {
    val s = new java.util.HashSet[java.lang.Long]()
    dv.foreach(p => s.add(p))
    s
  }
  private var pos = -1L
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
        if (!fileSchema.containsField(name)) null // evolution: NULL
        else if (g.getFieldRepetitionCount(name) == 0) null
        else required(i).dataType match {
          case LongType    => g.getLong(name, 0)
          case IntegerType => g.getInteger(name, 0)
          case DoubleType  => g.getDouble(name, 0)
          case FloatType   => g.getFloat(name, 0)
          case BooleanType => g.getBoolean(name, 0)
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
