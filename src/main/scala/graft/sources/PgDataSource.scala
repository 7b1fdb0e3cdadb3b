package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** S17 as a FIRST-CLASS Spark source: `spark.read.format("graft-pg")`
  * over the dependency-free wire client — the DataSourceV2 integration
  * that makes the pg seam a planner citizen instead of a helper call:
  *
  *  - **column pruning** reaches the server: the SELECT list is the
  *    pruned schema, so a 2-column projection of a 40-column table
  *    ships 2 columns over the wire (`.explain` shows the narrowed
  *    ReadSchema, and the scan description carries the exact SQL);
  *  - **filter pushdown** compiles Catalyst filters (=, <>, <, <=, >,
  *    >=, IN, IS [NOT] NULL, STARTS/ENDS/CONTAINS, AND) to a WHERE
  *    clause rendered through the same [[PgWire.sqlLiteral]] dialect
  *    as the write path; unsupported filters stay in Spark (DSv2
  *    re-applies anything not accepted);
  *  - **partitioned scans**: `partitionColumn` (integer) +
  *    `numPartitions` plan one InputPartition per mod-N slice, each
  *    task streaming its slice off its own connection
  *    ([[PgWire.Conn.execStream]] — one row in memory at a time).
  *
  * Options: host, port, database, table, user, [password],
  * [partitionColumn], [numPartitions]. Types follow
  * [[PgWire.pgTypeFor]] (numeric arrives as its exact decimal string;
  * cast downstream to the precision you mean).
  */
class PgTableProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-pg"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PgTableProvider.schemaFor(PgOptions(options))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new PgTable(schema, PgOptions(new CaseInsensitiveStringMap(properties)))
}

object PgTableProvider {
  /** ONE zero-row probe (`LIMIT 0` still carries the RowDescription)
    * yields both the Spark schema and the column→OID map — the
    * pushdown gate needs the SERVER's type, not the Spark mapping
    * (numeric and uuid both map to StringType, but pg compares them
    * as numeric/uuid). */
  def probe(opts: PgOptions): (StructType, Map[String, Int]) = {
    val (names, oids, _) = PgWire.query(opts.host, opts.port, opts.user,
      opts.database, s"SELECT * FROM ${opts.table} LIMIT 0",
      opts.password)
    (StructType(names.zip(oids).map { case (n, o) =>
      StructField(n, PgWire.pgTypeFor(o))
    }), names.zip(oids).toMap)
  }

  def schemaFor(opts: PgOptions): StructType = probe(opts)._1
}

/** Connection/table options (serializable — shipped to tasks). */
final case class PgOptions(host: String, port: Int, user: String,
    database: String, table: String, password: Option[String],
    partitionColumn: Option[String], numPartitions: Int)
    extends Serializable

object PgOptions {
  def apply(o: CaseInsensitiveStringMap): PgOptions = {
    def req(k: String): String = {
      val v = o.get(k)
      require(v != null, s"graft-pg requires option '$k'")
      v
    }
    PgOptions(req("host"), req("port").toInt, req("user"),
      req("database"), req("table"), Option(o.get("password")),
      Option(o.get("partitionColumn")),
      Option(o.get("numPartitions")).map(_.toInt).getOrElse(1))
  }
}

class PgTable(schema: StructType, opts: PgOptions)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = s"graft-pg:${opts.table}"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE)
  // one OID probe per table instance, shared by every scan builder —
  // the V2 relation caches this Table across a query's planning, so
  // repeated filter/aggregate planning never re-probes the server
  private lazy val oids: Map[String, Int] =
    PgTableProvider.probe(opts)._2
  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new PgScanBuilder(schema, oids, opts)
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new PgWriteBuilder(info.schema(), opts)
}

class PgScanBuilder(fullSchema: StructType, oids: Map[String, Int],
    opts: PgOptions)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters with SupportsPushDownAggregates
    with SupportsPushDownLimit {

  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty
  // aggregate pushdown state: SQL select items + their output schema
  // + the GROUP BY columns (empty = global aggregate)
  private var aggState: Option[(Seq[String], StructType, Seq[String])] =
    None

  /** Server-type class of a column, gating what may push:
    *  - 'n' (bool/int/float8/timestamp): the Spark-side values are the
    *    same value type, so pg comparison semantics == Spark's — push
    *    anything. float4 (oid 700) is EXCLUDED: Spark decodes pg's
    *    shortest-round-trip rendering via text.toDouble, but the
    *    server compares the true float4 promoted to double — e.g.
    *    `f = 0.1` matches the decoded row in Spark yet misses on the
    *    server, and pushed filters are never re-applied;
    *  - 't' (text/varchar): equality and LIKE are bytewise under
    *    pg's (default, deterministic) collations and match Spark, but
    *    ORDER comparisons follow the database collation, which need
    *    not be Spark's binary order — push equality/LIKE only.
    *    char(n)/bpchar is EXCLUDED: pg equality ignores its trailing
    *    padding while Spark compares the padded text bytewise;
    *  - 'o' (numeric, uuid, char(n), arrays, anything else): mapped to
    *    StringType on the Spark side, so pg would compare values
    *    where Spark compares their text — pushing would return rows
    *    Spark semantics exclude (silently, since pushed filters are
    *    not re-applied). Only NULL tests push. */
  private def colClass(a: String): Char = oids.get(a) match {
    case Some(16 | 20 | 21 | 23 | 701 | 1114 | 1184) => 'n'
    case Some(25 | 1043)                             => 't'
    case _                                            => 'o' // incl. 700
  }

  private def pushable(f: Filter): Boolean = f match {
    case EqualTo(a, _)                    => colClass(a) != 'o'
    case Not(EqualTo(a, _))               => colClass(a) != 'o'
    case In(a, _)                         => colClass(a) != 'o'
    case GreaterThan(a, _)                => colClass(a) == 'n'
    case GreaterThanOrEqual(a, _)         => colClass(a) == 'n'
    case LessThan(a, _)                   => colClass(a) == 'n'
    case LessThanOrEqual(a, _)            => colClass(a) == 'n'
    case IsNull(_) | IsNotNull(_)         => true
    case StringStartsWith(a, _)           => colClass(a) == 't'
    case StringEndsWith(a, _)             => colClass(a) == 't'
    case StringContains(a, _)             => colClass(a) == 't'
    case And(l, r)                        => pushable(l) && pushable(r)
    case Or(l, r)                         => pushable(l) && pushable(r)
    case _                                => false
  }

  private var limit: Option[Int] = None

  /** LIMIT n pushes as a PER-SLICE limit (isPartiallyPushed): each
    * slice returns at most n rows and Spark applies the global limit
    * over the union — `df.limit(5)` stops the server after 5 rows per
    * slice instead of streaming the table. Sound with aggregates NOT
    * pushed on top (Spark only offers limit-after-agg when the agg
    * result is what is limited, and then it pushes to the agg scan —
    * the per-slice partials still merge before the final limit). */
  override def pushLimit(n: Int): Boolean = {
    limit = Some(n)
    true
  }
  override def isPartiallyPushed(): Boolean = true

  override def pruneColumns(requiredSchema: StructType): Unit =
    // after an aggregate push the scan's output IS the aggregate
    // schema; the later pruning phase must not narrow it again
    if (aggState.isEmpty) required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ok, rest) = filters.partition(f =>
      pushable(f) && PgScan.toSql(f).isDefined)
    pushed = ok
    rest // Spark keeps evaluating these
  }
  override def pushedFilters(): Array[Filter] = pushed

  /** Partial-merge mode, never complete: each mod-N slice returns its
    * own partial aggregate rows and Spark merges them (sum of counts,
    * min of mins, …) — the only sound contract with partitioned
    * scans, and it keeps Spark's own overflow/decimal semantics in
    * the final step. */
  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate
        .Aggregation): Boolean = false

  /** Push COUNT(*)/COUNT(col)/SUM/MIN/MAX (+ GROUP BY) down to the
    * server — at 100 TB-equivalent table sizes this is the difference
    * between shipping a TABLE and shipping one row per group. The
    * same server-type gate as filters applies: SUM/MIN/MAX only on
    * value-typed columns (pg would aggregate numerics where Spark
    * sees their text); COUNT works on anything (both engines count
    * non-null rows); AVG and DISTINCT forms are declined (their
    * partial-merge needs sum+count splitting — Spark re-plans them
    * unpushed). GROUP BY columns must be value- or text-typed so the
    * group keys round-trip faithfully. */
  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate
        .Aggregation): Boolean = {
    import org.apache.spark.sql.connector.expressions.aggregate._
    import org.apache.spark.sql.connector.expressions.{Expression, NamedReference}
    def colOf(e: Expression): Option[String] = e match {
      case n: NamedReference if n.fieldNames().length == 1 =>
        Some(n.fieldNames()(0))
      case _ => None
    }
    def sparkTypeOf(c: String): Option[DataType] =
      fullSchema.fields.find(_.name == c).map(_.dataType)
    val q = PgWire.quoteIdent _
    val groups = agg.groupByExpressions.toSeq.map(colOf)
    if (groups.exists(_.isEmpty)) return false
    val gcols = groups.flatten
    if (gcols.exists(c => colClass(c) == 'o')) return false
    val items: Seq[Option[(String, DataType)]] =
      agg.aggregateExpressions.toSeq.map {
        case _: CountStar =>
          Some(("CAST(count(*) AS bigint)", LongType))
        case c: Count if !c.isDistinct =>
          colOf(c.column).map(c0 =>
            (s"CAST(count(${q(c0)}) AS bigint)", LongType))
        case m: Min =>
          // pg has no min/max(boolean) — a 'n'-class gate alone would
          // compile SQL the server rejects at runtime
          colOf(m.column).filter(c0 => colClass(c0) == 'n' &&
              !oids.get(c0).contains(16)).flatMap(c0 =>
            sparkTypeOf(c0).map(t => (s"min(${q(c0)})", t)))
        case m: Max =>
          colOf(m.column).filter(c0 => colClass(c0) == 'n' &&
              !oids.get(c0).contains(16)).flatMap(c0 =>
            sparkTypeOf(c0).map(t => (s"max(${q(c0)})", t)))
        case sm: Sum if !sm.isDistinct =>
          // SUM(bigint) is DECLINED: pg sums bigint into numeric, and
          // a per-slice partial that overflows int64 would make the
          // CAST back raise server-side where the unpushed plan can
          // still succeed (slice overflows may cancel in the merge).
          // SUM(double) pushes only for true float8 columns (colClass
          // 'n'): pg accumulates float4 sums in float4, a different
          // rounding envelope than Spark's double accumulation.
          colOf(sm.column).filter(c0 => colClass(c0) == 'n')
            .flatMap(c0 => sparkTypeOf(c0) match {
              case Some(DoubleType) =>
                Some((s"CAST(sum(${q(c0)}) AS double precision)",
                  DoubleType))
              case _ => None
            })
        case _ => None // Avg / distinct forms: Spark keeps them
      }
    if (items.exists(_.isEmpty)) return false
    val aggFields = items.flatten.zipWithIndex.map { case ((_, t), i) =>
      StructField(s"agg_$i", t)
    }
    val gFields = gcols.map(c =>
      StructField(c, sparkTypeOf(c).getOrElse(StringType)))
    aggState = Some((
      gcols.map(q) ++ items.flatten.map(_._1),
      StructType(gFields ++ aggFields),
      gcols.map(q)))
    true
  }

  override def build(): Scan = aggState match {
    case Some((items, schema, groupBy)) =>
      new PgScan(schema, items, groupBy, limit, pushed, opts)
    case None =>
      val items =
        if (required.isEmpty) Seq("1") // count-style scan: rows only
        else required.fieldNames.toSeq.map(PgWire.quoteIdent)
      new PgScan(required, items, Seq.empty, limit, pushed, opts)
  }
}

object PgScan {
  private def quote(name: String): String = PgWire.quoteIdent(name)

  /** Catalyst source filter → pg WHERE fragment; None = cannot push
    * (Spark re-applies it post-scan, so partial support is safe). */
  def toSql(f: Filter): Option[String] = f match {
    case EqualTo(a, v)            => lit(v).map(l => s"${quote(a)} = $l")
    case GreaterThan(a, v)        => lit(v).map(l => s"${quote(a)} > $l")
    case GreaterThanOrEqual(a, v) => lit(v).map(l => s"${quote(a)} >= $l")
    case LessThan(a, v)           => lit(v).map(l => s"${quote(a)} < $l")
    case LessThanOrEqual(a, v)    => lit(v).map(l => s"${quote(a)} <= $l")
    case Not(EqualTo(a, v))       => lit(v).map(l => s"${quote(a)} <> $l")
    case In(a, vs) if vs.nonEmpty =>
      val ls = vs.map(lit)
      if (ls.forall(_.isDefined))
        Some(s"${quote(a)} IN (${ls.map(_.get).mkString(", ")})")
      else None
    case IsNull(a)    => Some(s"${quote(a)} IS NULL")
    case IsNotNull(a) => Some(s"${quote(a)} IS NOT NULL")
    case StringStartsWith(a, v) =>
      Some(s"${quote(a)} LIKE ${PgWire.sqlLiteral(escapeLike(v) + "%")}")
    case StringEndsWith(a, v) =>
      Some(s"${quote(a)} LIKE ${PgWire.sqlLiteral("%" + escapeLike(v))}")
    case StringContains(a, v) =>
      Some(
        s"${quote(a)} LIKE ${PgWire.sqlLiteral("%" + escapeLike(v) + "%")}")
    case And(l, r) =>
      for { ls <- toSql(l); rs <- toSql(r) } yield s"($ls AND $rs)"
    case Or(l, r) =>
      for { ls <- toSql(l); rs <- toSql(r) } yield s"($ls OR $rs)"
    case _ => None
  }

  private def escapeLike(s: String): String =
    s.replace("\\", "\\\\").replace("%", "\\%").replace("_", "\\_")

  private def lit(v: Any): Option[String] = v match {
    case null => None // comparisons with NULL are never pushable
    case _: String | _: java.lang.Boolean | _: java.lang.Long |
         _: java.lang.Integer | _: java.lang.Short | _: java.lang.Byte |
         _: java.lang.Double | _: java.lang.Float |
         _: java.math.BigDecimal | _: java.sql.Timestamp |
         _: java.time.Instant | _: java.sql.Date | _: java.time.LocalDate =>
      Some(PgWire.sqlLiteral(v))
    case d: scala.math.BigDecimal => Some(PgWire.sqlLiteral(d))
    case _ => None
  }
}

class PgScan(required: StructType, selectItems: Seq[String],
    groupBy: Seq[String], limit: Option[Int], pushed: Array[Filter],
    opts: PgOptions) extends Scan with Batch {

  override def readSchema(): StructType = required

  private def whereFor(slice: Option[String]): String = {
    val parts = pushed.flatMap(PgScan.toSql).toSeq ++ slice.toSeq
    if (parts.isEmpty) "" else parts.mkString(" WHERE ", " AND ", "")
  }

  /** The exact SQL a partition runs — surfaced in `.explain` via
    * [[description]] so pushdown is auditable from the plan. */
  def sqlFor(slice: Option[String]): String = {
    val grp =
      if (groupBy.isEmpty) ""
      else groupBy.mkString(" GROUP BY ", ", ", "")
    val lim = limit.map(n => s" LIMIT $n").getOrElse("")
    s"SELECT ${selectItems.mkString(", ")} FROM ${opts.table}" +
      s"${whereFor(slice)}$grp$lim"
  }

  override def description(): String =
    s"graft-pg ${sqlFor(None)} [parts=${planInputPartitions().length}]"

  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    opts.partitionColumn match {
      case Some(c) if opts.numPartitions > 1 =>
        val q = PgWire.quoteIdent(c)
        val n = opts.numPartitions
        Array.tabulate(n) { i =>
          // ((x % n) + n) % n: non-negative without abs() (pg's
          // abs(bigint-min) overflows); slice 0 additionally owns the
          // NULL partition keys — without the IS NULL arm every
          // modulus predicate is NULL for them and the rows would be
          // returned by NO slice (the classic silent-undercount bug
          // Spark's own JDBC source guards against)
          val slice = s"(($q % $n) + $n) % $n = $i"
          PgInputPartition(sqlFor(Some(
            if (i == 0) s"($slice OR $q IS NULL)" else s"($slice)")))
        }
      case _ => Array(PgInputPartition(sqlFor(None)))
    }

  override def createReaderFactory(): PartitionReaderFactory =
    PgReaderFactory(required, opts)
}

final case class PgInputPartition(sql: String) extends InputPartition

/** The WRITE half of the planner citizenship (`df.write
  * .format("graft-pg").mode("append")`): Spark's DataWriter contract —
  * write rows, then task-level commit or abort — maps EXACTLY onto
  * the per-task pg transaction: each task streams its partition as
  * one `BEGIN; COPY … FROM STDIN; COMMIT`, so `DataWriter.commit()`
  * is the COMMIT, `abort()` is a disconnect (pg rolls an open
  * transaction back), and a speculated/retried task never lands rows
  * twice. Job-level atomicity across tasks is NOT promised (same
  * contract as Spark's own JDBC sink): stage into a fresh table or
  * compose the S8/S9 idempotent merges for whole-job exactly-once. */
class PgWriteBuilder(schema: StructType, opts: PgOptions)
    extends org.apache.spark.sql.connector.write.WriteBuilder {
  import org.apache.spark.sql.connector.write._
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new BatchWrite {
      override def createBatchWriterFactory(
          info: PhysicalWriteInfo): DataWriterFactory =
        PgWriterFactory(schema, opts)
      override def commit(msgs: Array[WriterCommitMessage]): Unit = ()
      override def abort(msgs: Array[WriterCommitMessage]): Unit = ()
    }
  }
}

final case class PgTaskCommit(rows: Long)
    extends org.apache.spark.sql.connector.write.WriterCommitMessage

final case class PgWriterFactory(schema: StructType, opts: PgOptions)
    extends org.apache.spark.sql.connector.write.DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
    new org.apache.spark.sql.connector.write.DataWriter[InternalRow] {
      // connect lazily on the FIRST row: empty partitions (a small
      // frame repartitioned wide) cost zero connections/transactions,
      // and an init failure must close the socket it just opened —
      // Spark never receives a writer whose constructor threw, so
      // abort()/close() would not run and each task retry would leak
      // an idle-in-transaction backend
      private var conn: PgWire.Conn = null
      private def ensureOpen(): PgWire.Conn = {
        if (conn == null) {
          val c = new PgWire.Conn(opts.host, opts.port,
            opts.user, opts.database, opts.password)
          try {
            c.exec("SET TIME ZONE 'UTC'")
            c.exec("BEGIN")
            val cols = schema.fieldNames.map(PgWire.quoteIdent)
              .mkString(", ")
            c.copyBegin(s"COPY ${opts.table} ($cols) FROM STDIN")
          } catch { case t: Throwable => c.close(); throw t }
          conn = c
        }
        conn
      }
      private var n = 0L

      override def write(r: InternalRow): Unit = {
        val conn = ensureOpen()
        val cells = new Array[String](schema.length)
        var i = 0
        while (i < schema.length) {
          cells(i) =
            if (r.isNullAt(i)) PgWire.copyCell(null)
            else PgWire.copyCell(schema(i).dataType match {
              case BooleanType   => r.getBoolean(i)
              case LongType      => r.getLong(i)
              case IntegerType   => r.getInt(i)
              case DoubleType    => r.getDouble(i)
              case FloatType     => r.getFloat(i)
              case TimestampType =>
                // micros -> Instant without the *1000 nanos overflow
                // (timestamps past ±292y from epoch wrap a Long)
                val us = r.getLong(i)
                java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
                  java.lang.Math.floorDiv(us, 1000000L),
                  java.lang.Math.floorMod(us, 1000000L) * 1000L))
              case d: DecimalType =>
                r.getDecimal(i, d.precision, d.scale).toJavaBigDecimal
              case DateType =>
                java.time.LocalDate.ofEpochDay(r.getInt(i).toLong)
              case BinaryType => r.getBinary(i)
              case ArrayType(StringType, _) =>
                r.getArray(i).toObjectArray(StringType).toSeq
                  .map(v => if (v == null) null else v.toString)
              case _ => r.getUTF8String(i).toString
            })
          i += 1
        }
        conn.copySend(cells.mkString("\t"))
        n += 1
      }

      override def commit()
          : org.apache.spark.sql.connector.write.WriterCommitMessage = {
        if (conn != null) {
          conn.copyEnd()
          conn.exec("COMMIT")
          conn.close(); conn = null
        }
        PgTaskCommit(n)
      }

      // disconnect mid-transaction: pg rolls back — the task's rows
      // never existed, so a retry starts clean
      override def abort(): Unit =
        if (conn != null) { conn.close(); conn = null }
      override def close(): Unit =
        if (conn != null) { conn.close(); conn = null }
    }
}

final case class PgReaderFactory(schema: StructType, opts: PgOptions)
    extends PartitionReaderFactory {
  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    val sql = partition.asInstanceOf[PgInputPartition].sql
    new PartitionReader[InternalRow] {
      private val conn = new PgWire.Conn(opts.host, opts.port,
        opts.user, opts.database, opts.password)
      // a failure between connect and the first row would leak the
      // connection (Spark only close()es a reader it received)
      private val rows =
        try {
          conn.exec("SET TIME ZONE 'UTC'")
          conn.execStream(sql)
        } catch {
          case t: Throwable =>
            try conn.close() catch { case _: Throwable => () }
            throw t
        }
      private var current: InternalRow = _

      override def next(): Boolean =
        if (rows.hasNext) { current = decode(rows.next()); true }
        else false
      override def get(): InternalRow = current
      override def close(): Unit = conn.close()

      private def decode(cells: Array[String]): InternalRow = {
        val vals = new Array[Any](schema.length)
        var i = 0
        while (i < schema.length) {
          val c = cells(i)
          vals(i) =
            if (c == null) null
            else schema(i).dataType match {
              case BooleanType => c == "t"
              case LongType    => c.toLong
              case DoubleType  => c.toDouble
              case TimestampType =>
                val ts = PgWire.parseTimestampText(c)
                ts.toInstant.getEpochSecond * 1000000L +
                  ts.toInstant.getNano / 1000L
              case ArrayType(StringType, _) =>
                new GenericArrayData(PgWire.parsePgArray(c)
                  .map(e => if (e == null) null
                    else UTF8String.fromString(e)).toArray[Any])
              case _ => UTF8String.fromString(c)
            }
          i += 1
        }
        new org.apache.spark.sql.catalyst.expressions
          .GenericInternalRow(vals)
      }
    }
  }
}
