package graft.sources

import java.io.{DataInputStream, DataOutputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** S17: dependency-free PostgreSQL WIRE-PROTOCOL reader — the live-pg
  * validation of the S4 `jdbc:` seam, without a JDBC driver jar (this
  * sandbox has none and no egress to fetch one; same discipline as
  * the dependency-free xlsx and PDF implementations). Speaks protocol
  * 3.0 simple-query mode against a trust-auth server: Startup →
  * AuthenticationOk → Query → RowDescription + DataRows (text
  * format) → ReadyForQuery → Terminate. Covers exactly the types the
  * reference's DDL uses (uuid, text[], timestamptz, numeric, int —
  * /root/reference/utils/importer/backup_before_fix.sql:42-525) with
  * the dialect mapping [[pgTypeFor]]; everything arrives in pg's
  * canonical TEXT format and is decoded deterministically.
  *
  * Two read paths, mirroring the JDBC seam's scale story:
  *  - [[readTable]]: DRIVER-side, for dimension/config-sized tables
  *    (the catalog mapping, currencies, languages — the things the
  *    importer broadcasts anyway).
  *  - [[readPartitioned]]: each PARTITION's task opens its own
  *    connection and runs its own predicate-sliced query — the
  *    mod-N partitioned scan `spark.read.jdbc` does with
  *    numPartitions, expressed directly. Fact-sized tables stream
  *    through executors; the driver never sees a row.
  */
object PgWire {

  /** One simple-query round trip: (column names, column type OIDs,
    * rows as text cells; null cell = SQL NULL). */
  def query(host: String, port: Int, user: String, database: String,
      sql: String): (Seq[String], Seq[Int], Seq[Array[String]]) = {
    val sock = new Socket(host, port)
    try {
      sock.setSoTimeout(30000)
      val out = new DataOutputStream(sock.getOutputStream)
      val in = new DataInputStream(sock.getInputStream)
      // StartupMessage: no type byte; len + protocol + params
      val params = ("user\u0000" + user + "\u0000database\u0000" +
        database + "\u0000\u0000")
        .getBytes(UTF_8)
      out.writeInt(4 + 4 + params.length)
      out.writeInt(196608) // protocol 3.0
      out.write(params)
      out.flush()
      awaitReady(in)
      // Query
      val q = sql.getBytes(UTF_8)
      out.writeByte('Q')
      out.writeInt(4 + q.length + 1)
      out.write(q)
      out.writeByte(0)
      out.flush()
      var names = Seq.empty[String]
      var oids = Seq.empty[Int]
      val rows = scala.collection.mutable.ArrayBuffer.empty[Array[String]]
      var done = false
      while (!done) {
        val (tag, payload) = readMessage(in)
        tag match {
          case 'T' =>
            val b = new DataInputStream(
              new java.io.ByteArrayInputStream(payload))
            val n = b.readShort()
            val ns = scala.collection.mutable.ArrayBuffer.empty[String]
            val os = scala.collection.mutable.ArrayBuffer.empty[Int]
            for (_ <- 0 until n) {
              ns += readCString(b)
              b.readInt(); b.readShort()          // table oid, attnum
              os += b.readInt()                    // type oid
              b.readShort(); b.readInt(); b.readShort() // len, mod, fmt
            }
            names = ns.toSeq; oids = os.toSeq
          case 'D' =>
            val b = new DataInputStream(
              new java.io.ByteArrayInputStream(payload))
            val n = b.readShort()
            rows += Array.tabulate(n) { _ =>
              val len = b.readInt()
              if (len < 0) null
              else {
                val bytes = new Array[Byte](len)
                b.readFully(bytes)
                new String(bytes, UTF_8)
              }
            }
          case 'E' =>
            throw new java.io.IOException(
              "pg error: " + errorText(payload))
          case 'Z' => done = true
          case _   => // CommandComplete / NoticeResponse / ParameterStatus
        }
      }
      out.writeByte('X'); out.writeInt(4); out.flush()
      (names, oids, rows.toSeq)
    } finally sock.close()
  }

  private def readMessage(in: DataInputStream): (Char, Array[Byte]) = {
    val tag = in.readByte().toChar
    val len = in.readInt() - 4
    val payload = new Array[Byte](len)
    in.readFully(payload)
    (tag, payload)
  }

  private def awaitReady(in: DataInputStream): Unit = {
    var ready = false
    while (!ready) {
      val (tag, payload) = readMessage(in)
      tag match {
        case 'R' =>
          val code = ((payload(0) & 0xff) << 24) |
            ((payload(1) & 0xff) << 16) | ((payload(2) & 0xff) << 8) |
            (payload(3) & 0xff)
          require(code == 0,
            s"pg auth method $code unsupported (need trust)")
        case 'E' => throw new java.io.IOException(
          "pg startup error: " + errorText(payload))
        case 'Z' => ready = true
        case _   => // ParameterStatus / BackendKeyData
      }
    }
  }

  private def readCString(b: DataInputStream): String = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[Byte]
    var c = b.readByte()
    while (c != 0) { buf += c; c = b.readByte() }
    new String(buf.toArray, UTF_8)
  }

  private def errorText(payload: Array[Byte]): String = {
    val b = new DataInputStream(new java.io.ByteArrayInputStream(payload))
    val fields = scala.collection.mutable.ArrayBuffer.empty[String]
    var t = b.readByte()
    while (t != 0) { fields += s"${t.toChar}=${readCString(b)}"; t = b.readByte() }
    fields.mkString(" ")
  }

  /** Dialect mapping for the reference DDL's types (text wire format
    * → Spark type). uuid stays a 36-char string (Spark has no uuid
    * type — the same mapping every JDBC dialect makes); timestamptz
    * → TimestampType (the session is UTC and the reader pins the
    * connection to UTC); numeric → its exact decimal STRING (no
    * silent double rounding — callers cast to the precision they
    * mean); text[] → array<string> via [[parsePgArray]]. */
  def pgTypeFor(oid: Int): DataType = oid match {
    case 16           => BooleanType            // bool
    case 20           => LongType               // int8
    case 21 | 23      => LongType               // int2/int4 (widened)
    case 700 | 701    => DoubleType             // float4/8
    case 1114 | 1184  => TimestampType          // timestamp[tz]
    case 1009 | 1015  => ArrayType(StringType)  // text[]/varchar[]
    case _            => StringType             // text/varchar/uuid/numeric/...
  }

  /** Parse pg's text array literal: `{a,"b c",NULL,"q\"x"}`. */
  def parsePgArray(s: String): Seq[String] = {
    require(s.startsWith("{") && s.endsWith("}"), s"not a pg array: $s")
    val body = s.substring(1, s.length - 1)
    if (body.isEmpty) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var inQ = false; var quoted = false; var i = 0
    def flush(): Unit = {
      val v = cur.toString
      out += (if (!quoted && v == "NULL") null else v)
      cur.clear(); quoted = false
    }
    while (i < body.length) {
      val c = body.charAt(i)
      if (inQ) {
        if (c == '\\') { cur += body.charAt(i + 1); i += 1 }
        else if (c == '"') inQ = false
        else cur += c
      } else c match {
        case '"' => inQ = true; quoted = true
        case ',' => flush()
        case _   => cur += c
      }
      i += 1
    }
    flush()
    out.toSeq
  }

  /** Both pg timestamp text flavors: oid 1184 (timestamptz) prints a
    * trailing offset, oid 1114 (timestamp without time zone — the
    * flavor the reference DDL uses for created_at et al.) prints
    * none. The offset is OPTIONAL with a UTC default, which is sound
    * because every connection is pinned `SET TIME ZONE 'UTC'` before
    * any row flows: 1184 then always prints +00, and 1114 is a civil
    * time we interpret in the same UTC frame DuckDB's oracle does. */
  private val TsFmt = new java.time.format.DateTimeFormatterBuilder()
    .appendPattern("yyyy-MM-dd HH:mm:ss")
    .appendFraction(java.time.temporal.ChronoField.MICRO_OF_SECOND,
      0, 6, true)
    .optionalStart().appendPattern("X").optionalEnd()
    .parseDefaulting(java.time.temporal.ChronoField.OFFSET_SECONDS, 0)
    .toFormatter

  private def decode(cell: String, oid: Int): Any =
    if (cell == null) null
    else pgTypeFor(oid) match {
      case BooleanType => cell == "t"
      case LongType    => cell.toLong
      case DoubleType  => cell.toDouble
      case TimestampType =>
        java.sql.Timestamp.from(java.time.OffsetDateTime
          .parse(cell, TsFmt).toInstant)
      case ArrayType(StringType, _) => parsePgArray(cell)
      case _ => cell
    }

  /** DRIVER-side typed read — for dimension/config-sized tables (the
    * reader pins the connection's TimeZone to UTC first, so
    * timestamptz text is timezone-stable). */
  def readTable(spark: SparkSession, host: String, port: Int,
      user: String, database: String, sql: String): DataFrame = {
    val (names, oids, rows) = query(host, port, user, database,
      s"SET TIME ZONE 'UTC'; $sql")
    val schema = StructType(names.zip(oids).map { case (n, o) =>
      StructField(n, pgTypeFor(o))
    })
    val data = rows.map(r =>
      Row.fromSeq(r.zip(oids).map { case (c, o) => decode(c, o) }))
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(data.asJava, schema)
  }

  /** Partitioned EXECUTOR-side read: one connection + one
    * predicate-sliced query per partition (`sqlFor(i)` must be the
    * i-th disjoint slice, e.g. `... WHERE key % n = i`) — the
    * numPartitions-style parallel scan of `spark.read.jdbc`,
    * expressed directly. Cells arrive as raw text (null-safe);
    * callers project/cast with the [[pgTypeFor]] mapping in mind.
    * The driver never touches a row. */
  def readPartitioned(spark: SparkSession, host: String, port: Int,
      user: String, database: String, nParts: Int,
      sqlFor: Int => String): DataFrame = {
    import spark.implicits._
    spark.createDataset(0 until nParts)
      .repartition(nParts)
      .flatMap { i =>
        val (_, _, rows) = PgWire.query(host, port, user, database,
          s"SET TIME ZONE 'UTC'; ${sqlFor(i)}")
        rows.map(_.toSeq)
      }
      .toDF("cells")
  }
}
