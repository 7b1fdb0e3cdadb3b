package graft.sources

import java.io.{DataInputStream, DataOutputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** S17: dependency-free PostgreSQL WIRE-PROTOCOL client — the live-pg
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
  * Read paths, mirroring the JDBC seam's scale story:
  *  - [[readTable]]: DRIVER-side, for dimension/config-sized tables
  *    (the catalog mapping, currencies, languages — the things the
  *    importer broadcasts anyway).
  *  - [[readPartitioned]]: each PARTITION's task opens its own
  *    connection and runs its own predicate-sliced query — the
  *    mod-N partitioned scan `spark.read.jdbc` does with
  *    numPartitions, expressed directly. Fact-sized tables stream
  *    through executors; the driver never sees a row.
  *
  * Write path (the reference's ENTIRE load layer writes to pg —
  * /root/reference/utils/importer/ETL.py:167-203):
  *  - [[writeTable]]: executor-side — each partition's task opens ONE
  *    connection ([[Conn]]) and streams its rows as batched
  *    multi-row INSERTs, with every Spark type rendered to the pg
  *    literal dialect by [[sqlLiteral]] (escaping, arrays,
  *    UTC-pinned timestamps, bytea). The driver never sees a row.
  */
object PgWire {

  /** A LIVE session on one socket: Startup handshake in the
    * constructor, then any number of [[exec]] round trips — the
    * connection-reuse shape the partitioned writer needs (one socket
    * per TASK, not per statement). Not thread-safe; each task owns
    * its own. */
  final class Conn(host: String, port: Int, user: String,
      database: String, password: Option[String] = None)
      extends AutoCloseable {
    private val sock = new Socket(host, port)
    // everything after the socket exists runs under closeOnFailure:
    // a handshake/auth error would otherwise leak the socket AND a
    // server backend (the constructor throws before the caller ever
    // holds a reference it could close)
    private def closeOnFailure[A](body: => A): A =
      try body catch {
        case t: Throwable =>
          try sock.close() catch { case _: Throwable => () }
          throw t
      }
    private val (out, in) = closeOnFailure {
      sock.setSoTimeout(30000)
      (new DataOutputStream(sock.getOutputStream),
        new DataInputStream(sock.getInputStream))
    }

    /** Frontend Query message: tag 'Q', length, SQL, NUL. */
    private def sendQuery(sql: String): Unit = {
      val q = sql.getBytes(UTF_8)
      out.writeByte('Q')
      out.writeInt(4 + q.length + 1)
      out.write(q)
      out.writeByte(0)
      out.flush()
    }

    /** Big-endian int32 at the head of an Authentication payload. */
    private def beInt(payload: Array[Byte]): Int =
      ((payload(0) & 0xff) << 24) | ((payload(1) & 0xff) << 16) |
        ((payload(2) & 0xff) << 8) | (payload(3) & 0xff)

    /** DataRow payload -> text cells (null cell = SQL NULL). */
    private def parseDataRow(payload: Array[Byte]): Array[String] = {
      val b = new DataInputStream(
        new java.io.ByteArrayInputStream(payload))
      val n = b.readShort()
      Array.tabulate(n) { _ =>
        val len = b.readInt()
        if (len < 0) null
        else {
          val bytes = new Array[Byte](len)
          b.readFully(bytes)
          new String(bytes, UTF_8)
        }
      }
    }

    /** ErrorResponse handling: drain to ReadyForQuery so the
      * connection stays usable after the caller handles the error,
      * then throw. */
    private def drainAndThrow(prefix: String,
        payload: Array[Byte]): Nothing = {
      val msg = errorText(payload)
      var ready = false
      while (!ready) ready = readMessage(in)._1 == 'Z'
      throw new java.io.IOException(s"$prefix: $msg")
    }

    closeOnFailure {
      // StartupMessage: no type byte; len + protocol + params
      val params = ("user\u0000" + user + "\u0000database\u0000" +
        database + "\u0000\u0000")
        .getBytes(UTF_8)
      out.writeInt(4 + 4 + params.length)
      out.writeInt(196608) // protocol 3.0
      out.write(params)
      out.flush()
      var ready = false
      while (!ready) {
        val (tag, payload) = readMessage(in)
        tag match {
          case 'R' =>
            beInt(payload) match {
              case 0  => () // AuthenticationOk
              case 10 => scramAuth(payload.drop(4)) // AuthenticationSASL
              case other => throw new java.io.IOException(
                s"pg auth method $other unsupported " +
                  "(trust or SCRAM-SHA-256)")
            }
          case 'E' => throw new java.io.IOException(
            "pg startup error: " + errorText(payload))
          case 'Z' => ready = true
          case _   => // ParameterStatus / BackendKeyData
        }
      }
    }

    /** SCRAM-SHA-256 exchange (RFC 5802/7677), no channel binding
      * (gs2 = "n,,"): ClientFirst -> ServerFirst (salt, iterations) ->
      * ClientFinal (PBKDF2-derived proof) -> ServerFinal, whose
      * server signature is VERIFIED -- a wrong server cannot fake a
      * success. Dependency-free: PBKDF2/HMAC/SHA-256 from the JDK.
      * (Passwords are used as-is; apply SASLprep upstream for exotic
      * Unicode passwords.) */
    private def scramAuth(mechList: Array[Byte]): Unit = {
      val pass = password.getOrElse(throw new java.io.IOException(
        "server requires SCRAM auth but no password was provided"))
      val mechs = new String(mechList, UTF_8).split("\u0000")
        .filter(_.nonEmpty)
      require(mechs.contains("SCRAM-SHA-256"),
        s"server offers no SCRAM-SHA-256 (got ${mechs.mkString(",")})")
      val b64e = java.util.Base64.getEncoder
      val b64d = java.util.Base64.getDecoder
      val rnd = new Array[Byte](18)
      new java.security.SecureRandom().nextBytes(rnd)
      val cnonce = b64e.encodeToString(rnd)
      val clientFirstBare = s"n=,r=$cnonce" // user rides in Startup
      val initial = ("n,," + clientFirstBare).getBytes(UTF_8)
      val mech = "SCRAM-SHA-256".getBytes(UTF_8)
      out.writeByte('p')
      out.writeInt(4 + mech.length + 1 + 4 + initial.length)
      out.write(mech); out.writeByte(0)
      out.writeInt(initial.length); out.write(initial)
      out.flush()
      val serverFirst = expectSasl(11)
      val f = serverFirst.split(",").map(x => x.charAt(0) -> x.drop(2))
        .toMap
      val combined = f('r')
      require(combined.startsWith(cnonce), "server nonce mismatch")
      val salt = b64d.decode(f('s'))
      val iters = f('i').toInt
      val spec = new javax.crypto.spec.PBEKeySpec(
        pass.toCharArray, salt, iters, 256)
      val salted = javax.crypto.SecretKeyFactory
        .getInstance("PBKDF2WithHmacSHA256").generateSecret(spec)
        .getEncoded
      def hmac(key: Array[Byte], msg: String): Array[Byte] = {
        val m = javax.crypto.Mac.getInstance("HmacSHA256")
        m.init(new javax.crypto.spec.SecretKeySpec(key, "HmacSHA256"))
        m.doFinal(msg.getBytes(UTF_8))
      }
      val clientKey = hmac(salted, "Client Key")
      val storedKey = java.security.MessageDigest
        .getInstance("SHA-256").digest(clientKey)
      val clientFinalNoProof = s"c=biws,r=$combined" // biws = b64("n,,")
      val authMessage =
        clientFirstBare + "," + serverFirst + "," + clientFinalNoProof
      val clientSig = hmac(storedKey, authMessage)
      val proof = clientKey.zip(clientSig)
        .map { case (a, b) => (a ^ b).toByte }
      val finalMsg =
        (clientFinalNoProof + ",p=" + b64e.encodeToString(proof))
          .getBytes(UTF_8)
      out.writeByte('p')
      out.writeInt(4 + finalMsg.length)
      out.write(finalMsg)
      out.flush()
      val serverFinal = expectSasl(12)
      val serverSig = hmac(hmac(salted, "Server Key"), authMessage)
      val v = serverFinal.split(",").find(_.startsWith("v="))
        .map(_.drop(2))
      require(v.contains(b64e.encodeToString(serverSig)),
        "SCRAM server signature mismatch -- not the server the " +
          "password was set on")
    }

    /** Read messages until the AuthenticationSASL{Continue,Final}
      * with the given code; return its SASL payload text. */
    private def expectSasl(code: Int): String = {
      var outp: String = null
      while (outp == null) {
        val (tag, payload) = readMessage(in)
        tag match {
          case 'R' =>
            val got = beInt(payload)
            require(got == code, s"expected SASL code $code, got $got")
            outp = new String(payload.drop(4), UTF_8)
          case 'E' => throw new java.io.IOException(
            "pg auth error: " + errorText(payload))
          case _   => ()
        }
      }
      outp
    }

    /** One simple-query round trip: (column names, column type OIDs,
      * rows as text cells; null cell = SQL NULL). */
    def exec(sql: String): (Seq[String], Seq[Int], Seq[Array[String]]) = {
      sendQuery(sql)
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
          case 'D' => rows += parseDataRow(payload)
          case 'E' => drainAndThrow("pg error", payload)
          case 'Z' => done = true
          case _   => // CommandComplete / NoticeResponse / ParameterStatus
        }
      }
      (names, oids, rows.toSeq)
    }

    /** STREAMING variant of [[exec]] for result sets that must not
      * buffer in task memory: rows surface one at a time as DataRow
      * messages arrive off the socket, and the CONNECTION CLOSES
      * ITSELF when the result set is exhausted (ReadyForQuery) or on
      * a server error — the iterator owns the socket's remaining
      * lifetime, so callers must drain it (Spark's flatMap does).
      * One statement, one result set; task memory holds ONE row
      * regardless of slice size — the shape a fact-table slice needs
      * where [[exec]]'s full buffering would be per-task pressure. */
    def execStream(sql: String): Iterator[Array[String]] = {
      sendQuery(sql)
      val self = this
      new Iterator[Array[String]] {
        private var pending: Array[String] = null
        private var finished = false
        private def advance(): Unit =
          while (pending == null && !finished) {
            val (tag, payload) = readMessage(in)
            tag match {
              case 'D' => pending = parseDataRow(payload)
              case 'E' =>
                val msg = errorText(payload)
                finished = true
                self.close()
                throw new java.io.IOException("pg error: " + msg)
              case 'Z' =>
                finished = true
                self.close()
              case _ => // RowDescription / CommandComplete / Notice
            }
          }
        def hasNext: Boolean = { advance(); pending != null }
        def next(): Array[String] = {
          advance()
          if (pending == null) throw new NoSuchElementException
          val r = pending; pending = null; r
        }
      }
    }

    /** COPY … FROM STDIN round trip — the BULK half of the write
      * dialect (one streaming transfer instead of one INSERT parse
      * per batch; what the reference's pg bulk loads would use at
      * volume). `lines` are COPY text-format rows WITHOUT trailing
      * newline (render cells with [[copyCell]]). Protocol: Query →
      * CopyInResponse('G') → CopyData('d')×N → CopyDone('c') →
      * CommandComplete → ReadyForQuery. */
    def copyIn(sql: String, lines: Iterator[String]): Unit = {
      copyBegin(sql)
      lines.foreach(copySend)
      copyEnd()
    }

    // push-style COPY thirds, for writers that RECEIVE rows (the
    // DataSourceV2 DataWriter contract) instead of holding an
    // iterator: begin once, send per row, end at task commit.
    private val copyBuf = new java.io.ByteArrayOutputStream(64 * 1024)

    /** Issue `COPY … FROM STDIN` and wait for CopyInResponse. */
    def copyBegin(sql: String): Unit = {
      sendQuery(sql)
      var inCopy = false
      while (!inCopy) {
        val (tag, payload) = readMessage(in)
        tag match {
          case 'G' => inCopy = true
          case 'E' => drainAndThrow("pg copy error", payload)
          case _   => ()
        }
      }
    }

    /** Queue one COPY text line (no trailing newline); ships in
      * bounded CopyData frames (many lines per frame). */
    def copySend(line: String): Unit = {
      copyBuf.write(line.getBytes(UTF_8)); copyBuf.write('\n')
      if (copyBuf.size() >= 48 * 1024) copyFlushFrame()
    }

    private def copyFlushFrame(): Unit = if (copyBuf.size() > 0) {
      out.writeByte('d')
      out.writeInt(4 + copyBuf.size())
      copyBuf.writeTo(out)
      copyBuf.reset()
    }

    /** CopyDone + drain to ReadyForQuery (errors surface here). */
    def copyEnd(): Unit = {
      copyFlushFrame()
      out.writeByte('c'); out.writeInt(4)
      out.flush()
      var done = false
      while (!done) {
        val (tag, payload) = readMessage(in)
        tag match {
          case 'E' => drainAndThrow("pg copy error", payload)
          case 'Z' => done = true
          case _   => () // CommandComplete / NoticeResponse
        }
      }
    }

    def close(): Unit = {
      try { out.writeByte('X'); out.writeInt(4); out.flush() }
      catch { case _: java.io.IOException => () }
      sock.close()
    }
  }

  /** pg identifier quoting — THE one place escaping lives (the scan,
    * both writers, and the DSv2 reader all build SQL through it). */
  def quoteIdent(name: String): String =
    "\"" + name.replace("\"", "\"\"") + "\""

  /** One-shot convenience: connect, run `sql`, disconnect. */
  def query(host: String, port: Int, user: String, database: String,
      sql: String, password: Option[String] = None)
      : (Seq[String], Seq[Int], Seq[Array[String]]) = {
    val conn = new Conn(host, port, user, database, password)
    try conn.exec(sql) finally conn.close()
  }

  private def readMessage(in: DataInputStream): (Char, Array[Byte]) = {
    val tag = in.readByte().toChar
    val len = in.readInt() - 4
    val payload = new Array[Byte](len)
    in.readFully(payload)
    (tag, payload)
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
    * type — the same mapping every JDBC dialect makes); timestamp
    * (oid 1114) and timestamptz (1184) → TimestampType (the session
    * is UTC and the reader pins the connection to UTC, so both
    * flavors decode in one frame); numeric → its exact decimal
    * STRING (no silent double rounding — callers cast to the
    * precision they mean); text[] → array<string> via
    * [[parsePgArray]]. */
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

  /** Parse pg timestamp text (either flavor, per [[TsFmt]]). */
  def parseTimestampText(cell: String): java.sql.Timestamp =
    java.sql.Timestamp.from(java.time.OffsetDateTime
      .parse(cell, TsFmt).toInstant)

  private def decode(cell: String, oid: Int): Any =
    if (cell == null) null
    else pgTypeFor(oid) match {
      case BooleanType => cell == "t"
      case LongType    => cell.toLong
      case DoubleType  => cell.toDouble
      case TimestampType => parseTimestampText(cell)
      case ArrayType(StringType, _) => parsePgArray(cell)
      case _ => cell
    }

  /** DRIVER-side typed read — for dimension/config-sized tables (the
    * reader pins the connection's TimeZone to UTC first, so
    * timestamptz text is timezone-stable). */
  def readTable(spark: SparkSession, host: String, port: Int,
      user: String, database: String, sql: String,
      password: Option[String] = None): DataFrame = {
    val (names, oids, rows) = query(host, port, user, database,
      s"SET TIME ZONE 'UTC'; $sql", password)
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
    * expressed directly. Rows STREAM off the socket ([[Conn
    * .execStream]]): task memory holds one row, not the slice, so
    * slice sizing is a parallelism dial, not a heap dial. Cells
    * arrive as raw text (null-safe); callers project/cast with the
    * [[pgTypeFor]] mapping in mind. The driver never touches a row. */
  def readPartitioned(spark: SparkSession, host: String, port: Int,
      user: String, database: String, nParts: Int,
      sqlFor: Int => String): DataFrame = {
    import spark.implicits._
    spark.createDataset(0 until nParts)
      .repartition(nParts)
      .flatMap { i =>
        val conn = new Conn(host, port, user, database)
        // the stream closes the connection on exhaustion; the task
        // listener covers the OTHER exits (a downstream limit() that
        // abandons the iterator mid-stream, a killed task) — without
        // it every partial read leaks a socket + an active pg backend
        // until JVM exit (close() is idempotent)
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => conn.close()))
        conn.exec("SET TIME ZONE 'UTC'")
        conn.execStream(sqlFor(i)).map(_.toSeq)
      }
      .toDF("cells")
  }

  private val TsOutFmt = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS'+00'")
    .withZone(java.time.ZoneOffset.UTC)

  /** Render one Spark value as a pg SQL literal (the write half of
    * the dialect): standard_conforming_strings quoting (only `'`
    * doubles — backslashes are literal), timestamps as explicit
    * UTC-offset text (pg discards the offset on `timestamp` columns
    * and converts on `timestamptz` — both land on the same instant
    * because the session is pinned UTC), arrays as `ARRAY[...]`
    * (empty arrays need the `::text[]` cast pg demands), binary as
    * hex bytea, decimals in plain notation, NaN/Infinity quoted (pg
    * accepts them only as string literals). */
  def sqlLiteral(v: Any): String = v match {
    case null                  => "NULL"
    case s: String             => "'" + s.replace("'", "''") + "'"
    case b: Boolean            => if (b) "TRUE" else "FALSE"
    case b: Byte               => b.toString
    case x: Short              => x.toString
    case i: Int                => i.toString
    case l: Long               => l.toString
    case f: Float              => sqlLiteral(f.toDouble)
    case d: Double             =>
      if (d.isNaN) "'NaN'" else if (d.isInfinite)
        (if (d > 0) "'Infinity'" else "'-Infinity'")
      else d.toString
    case d: java.math.BigDecimal => d.toPlainString
    case d: scala.math.BigDecimal => d.bigDecimal.toPlainString
    case t: java.sql.Timestamp =>
      "'" + TsOutFmt.format(t.toInstant) + "'"
    case t: java.time.Instant  => "'" + TsOutFmt.format(t) + "'"
    case d: java.sql.Date      => "'" + d.toString + "'"
    case d: java.time.LocalDate => "'" + d.toString + "'"
    case b: Array[Byte]        =>
      "'\\x" + b.map("%02x".format(_)).mkString + "'"
    case a: scala.collection.Seq[_] =>
      if (a.isEmpty) "ARRAY[]::text[]"
      else a.map(sqlLiteral).mkString("ARRAY[", ", ", "]")
    case other => throw new IllegalArgumentException(
      s"no pg literal rendering for ${other.getClass}: $other")
  }

  private def copyEscape(s: String): String = {
    val b = new StringBuilder(s.length + 8)
    s.foreach {
      case '\\' => b.append("\\\\")
      case '\t' => b.append("\\t")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case c    => b.append(c)
    }
    b.toString
  }

  private def arrayElem(v: Any): String = v match {
    case null => "NULL"
    case s: String =>
      val needsQuote = s.isEmpty || s.equalsIgnoreCase("null") ||
        s.exists(c => c == '{' || c == '}' || c == ',' || c == '"' ||
          c == '\\' || c.isWhitespace)
      if (needsQuote)
        "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
      else s
    case other => arrayElem(other.toString)
  }

  /** Render one Spark value as a COPY text-format cell: `\N` for
    * NULL, backslash/tab/newline/CR escaped in data, booleans as
    * t/f, arrays as the pg array literal (element quoting per the
    * array grammar) COPY-escaped on top, bytea as `\x…` with its
    * backslash doubled. Same UTC timestamp text as [[sqlLiteral]]. */
  def copyCell(v: Any): String = v match {
    case null                  => "\\N"
    case s: String             => copyEscape(s)
    case b: Boolean            => if (b) "t" else "f"
    case b: Byte               => b.toString
    case x: Short              => x.toString
    case i: Int                => i.toString
    case l: Long               => l.toString
    case f: Float              => copyCell(f.toDouble)
    case d: Double             =>
      if (d.isNaN) "NaN" else if (d.isInfinite)
        (if (d > 0) "Infinity" else "-Infinity")
      else d.toString
    case d: java.math.BigDecimal  => d.toPlainString
    case d: scala.math.BigDecimal => d.bigDecimal.toPlainString
    case t: java.sql.Timestamp => TsOutFmt.format(t.toInstant)
    case t: java.time.Instant  => TsOutFmt.format(t)
    case d: java.sql.Date      => d.toString
    case d: java.time.LocalDate => d.toString
    case b: Array[Byte]        =>
      "\\\\x" + b.map("%02x".format(_)).mkString
    case a: scala.collection.Seq[_] =>
      copyEscape(a.map(arrayElem).mkString("{", ",", "}"))
    case other => throw new IllegalArgumentException(
      s"no COPY rendering for ${other.getClass}: $other")
  }

  /** EXECUTOR-side BULK write via COPY … FROM STDIN: one [[Conn]] and
    * one streaming COPY transfer per partition — no per-batch
    * statement parse, the pg bulk-load fast path ([[writeTable]]'s
    * INSERT form stays for small/config tables where DDL-adjacent
    * simplicity wins). Text format, cells via [[copyCell]]. */
  def writeTableCopy(df: DataFrame, host: String, port: Int,
      user: String, database: String, table: String): Unit = {
    val colList = df.schema.fieldNames.map(quoteIdent).mkString(", ")
    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        val conn = new Conn(host, port, user, database)
        try {
          conn.exec("SET TIME ZONE 'UTC'")
          // one transaction per task: a mid-stream failure rolls the
          // whole partition back, so a Spark task RETRY never lands a
          // partial partition twice (see [[writeTable]] on retries)
          conn.exec("BEGIN")
          conn.copyIn(s"COPY $table ($colList) FROM STDIN",
            rows.map(r => r.toSeq.map(copyCell).mkString("\t")))
          conn.exec("COMMIT"); ()
        } finally conn.close()
      }
    }
  }

  /** EXECUTOR-side write: each partition's task opens ONE [[Conn]]
    * and streams its rows as multi-row INSERT batches (`batchRows`
    * per statement — bounded statement size, one round trip per
    * batch instead of per row), all inside ONE transaction. The
    * table must exist (DDL is a one-shot [[query]] — schema is
    * config, not data). The driver never sees a row.
    *
    * Retry semantics: the per-task transaction means a failed task
    * rolls back wholesale — a Spark task RETRY re-runs the partition
    * from zero against a table that never saw its rows, so the write
    * is exactly-once per partition as long as the retried task
    * produces the same rows (deterministic input — Spark's own
    * assumption for every sink). Cross-JOB idempotence (re-running a
    * whole load) composes on top via the S8/S9 merge layers or a
    * ledger, exactly as over parquet sinks. */
  def writeTable(df: DataFrame, host: String, port: Int, user: String,
      database: String, table: String, batchRows: Int = 500): Unit = {
    require(batchRows >= 1, s"batchRows must be >= 1: $batchRows")
    val colList = df.schema.fieldNames.map(quoteIdent).mkString(", ")
    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        val conn = new Conn(host, port, user, database)
        try {
          conn.exec("SET TIME ZONE 'UTC'")
          conn.exec("BEGIN")
          rows.grouped(batchRows).foreach { batch =>
            val values = batch.iterator
              .map(r => r.toSeq.map(sqlLiteral).mkString("(", ", ", ")"))
              .mkString(", ")
            conn.exec(s"INSERT INTO $table ($colList) VALUES $values")
            ()
          }
          conn.exec("COMMIT"); ()
        } finally conn.close()
      }
    }
  }
}
