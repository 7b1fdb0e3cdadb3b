package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Services

/** Source operators (SURVEY.md §2.1, S1-S6).
  *
  * S1/S2 (CSV + mapping CSV) live in pipelines.Importer/ColumnMapping;
  * here: the filesystem binary scan (S5 — the reference's recursive
  * *.jpg walk, /root/reference/utils/details_translator/
  * 2_ocr_from_images.py:27-31) and the HTTP fetch source (S6 — the
  * per-URL image download, /root/reference/utils/
  * product_collection_img_array_processor.py:55-68).
  */
object Sources {

  /** S5: recursive binary-file scan with a glob. One row per file:
    * (path, modificationTime, length, content). Distributed read —
    * each file is a task; Spark handles listing parallelism. */
  def binaryFiles(spark: SparkSession, dir: String,
      glob: String): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .option("recursiveFileLookup", "true")
      .load(dir)

  /** S14 (read half): ORC scan — same FileScan contract as parquet
    * (PushedFilters, ReadSchema column pruning), so everything the
    * engine proves about parquet plans holds on ORC inputs too. */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** S15 (read half): JSON-lines scan with an EXPLICIT schema — one
    * pass, no inference re-read, types exactly as declared (an
    * inferred read widens integers to bigint and parses nothing as
    * timestamp — the silent-drift class S1 guards against on CSV). */
  def jsonl(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** S16: evolving-schema parquet read — `mergeSchema` unions the
    * footers of every file, so a table whose later batches ADDED
    * columns reads as one frame with the old files' missing columns
    * as NULL (the read half of M7's write-side evolution). Schema
    * merging costs a footer read per file — per-BATCH here, not
    * per-row; at 100 TB pin the merged schema once ([[ManifestTable]]
    * snapshot + explicit schema) instead of re-merging every scan. */
  def parquetEvolving(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  /** The two halves of a rejects-aware CSV read plus the handle that
    * releases their shared parse cache — call [[release]] once both
    * halves are consumed, or cached partitions accumulate for the
    * life of the session (one cache per ingested file). */
  final case class CsvSplit(good: DataFrame, rejects: DataFrame,
      raw: DataFrame) {
    def release(): Unit = { raw.unpersist(); () }
  }

  /** S1-robustness: CSV read that SEPARATES malformed rows instead of
    * silently nulling or dropping them — PERMISSIVE mode with the
    * corrupt-record column captured, split into (good, rejects). The
    * rejects frame carries the raw line for quarantine/repair, the
    * operational contract a production importer needs (the reference
    * imports hand-curated exports and crashes on surprises —
    * /root/reference/utils/importer/ETL.py:145 assumes clean input).
    * Schema must be explicit: one pass, no inference re-read. The
    * parse is cached (PERMISSIVE row materialization must happen once
    * so both halves agree on the corrupt marker) — release it via
    * [[CsvSplit.release]] when done. */
  def csvWithRejects(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType,
      delimiter: String = ";"): CsvSplit = {
    val withCorrupt = schema
      .add("_corrupt_record", org.apache.spark.sql.types.StringType)
    val raw = spark.read
      .option("header", "true")
      .option("delimiter", delimiter)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(withCorrupt)
      .csv(path)
      // PERMISSIVE parsing is lazy per row: materialize the corrupt
      // marker before splitting so both halves agree on it
      .cache()
    val good = raw.filter(col("_corrupt_record").isNull)
      .drop("_corrupt_record")
    val rejects = raw.filter(col("_corrupt_record").isNotNull)
      .select(col("_corrupt_record").as("raw_line"))
    CsvSplit(good, rejects, raw)
  }

  /** The REAL HTTP transport, BYTES-clean: one GET, the raw body with
    * NO charset decode — the reference's S6 payload is image BYTES
    * (/root/reference/utils/product_collection_img_array_processor
    * .py:55-68 writes response.content straight to disk), and a UTF-8
    * round trip corrupts any byte sequence that isn't valid UTF-8
    * (0xFF 0xD8 — the JPEG magic itself — already is not). Non-2xx
    * throws so `Services.Remote` retries transient failures and
    * surfaces permanent ones. JDK HttpURLConnection — no client
    * library, same dependency-free discipline as [[PgWire]]. */
  def httpGetBytes(url: String): Array[Byte] = {
    val conn = java.net.URI.create(url).toURL.openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setConnectTimeout(5000)
    conn.setReadTimeout(15000)
    // one connection per request, deliberately: these are PACED
    // service calls (politeness intervals dwarf a TCP handshake), and
    // persistent-connection servers can stall subsequent requests on
    // idle-state re-arms (the JDK HttpServer adds ~40 ms per
    // keep-alive request — measured; close = 1.9 ms). The
    // partition-scoped client still amortizes what matters: pacing
    // state, retry policy, DNS cache.
    conn.setRequestProperty("Connection", "close")
    readResponse(conn, url)
  }

  /** Shared response half of the transports: non-2xx throws (so
    * `Services.Remote` retries transient failures and surfaces
    * permanent ones), 2xx returns the raw body bytes. */
  private def readResponse(conn: java.net.HttpURLConnection,
      url: String): Array[Byte] = {
    val code = conn.getResponseCode
    if (code / 100 != 2) {
      Option(conn.getErrorStream).foreach(_.close())
      throw new java.io.IOException(s"HTTP $code for $url")
    }
    val in = conn.getInputStream
    try in.readAllBytes()
    finally in.close()
  }

  /** Text view of [[httpGetBytes]] for endpoints whose payload IS
    * text (the translate service, JSON APIs): UTF-8 decode at the
    * edge, transport stays the bytes-clean one. */
  def httpGet(url: String): String =
    new String(httpGetBytes(url), java.nio.charset.StandardCharsets.UTF_8)

  /** Bytes-clean POST: raw request body out (caller picks the
    * content type — octet-stream for media, text/plain for text),
    * raw response bytes back, non-2xx throws. The transport under
    * the OCR service's image uploads. */
  def httpPostBytes(url: String, body: Array[Byte],
      contentType: String = "application/octet-stream"): Array[Byte] = {
    val conn = java.net.URI.create(url).toURL.openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setConnectTimeout(5000)
    conn.setReadTimeout(15000)
    conn.setRequestMethod("POST")
    conn.setDoOutput(true)
    conn.setRequestProperty("Content-Type", contentType)
    conn.setRequestProperty("Connection", "close") // see httpGetBytes
    val out = conn.getOutputStream
    try out.write(body)
    finally out.close()
    readResponse(conn, url)
  }

  /** Text view of [[httpPostBytes]] — UTF-8 body out, UTF-8 body
    * back. The transport under [[graft.operators.Services
    * .translateHttp]]'s per-row service calls. */
  def httpPost(url: String, body: String): String =
    new String(
      httpPostBytes(url,
        body.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        "text/plain; charset=utf-8"),
      java.nio.charset.StandardCharsets.UTF_8)

  /** S6: HTTP fetch per URL row — a `Services.Remote`-wrapped call
    * (retry + politeness pacing, I3/I4) applied inside the executors;
    * the provided `fetch` does the actual I/O so tests can inject a
    * deterministic stub. Returns input plus a `body` column. */
  def httpFetch(df: DataFrame, urlCol: String,
      fetch: String => String,
      attempts: Int = 3, backoffMs: Long = 2000,
      minIntervalMs: Long = 500): DataFrame = {
    val remote = Services.Remote(fetch, attempts, backoffMs, minIntervalMs)
    val u = udf((url: String) => remote(url))
    df.withColumn("body", u(col(urlCol)))
  }

  /** S6, the reference's ACTUAL payload shape: binary fetch per URL
    * row — same `Services.Remote` retry/pacing wrapper as
    * [[httpFetch]], but the `body` column is BINARY (the downloaded
    * image bytes, ready for `graft_jpeg_dims` / [[graft.operators
    * .Multimodal.asMediaFrame]] — never a lossy text decode). */
  def httpFetchBytes(df: DataFrame, urlCol: String,
      fetch: String => Array[Byte],
      attempts: Int = 3, backoffMs: Long = 2000,
      minIntervalMs: Long = 500): DataFrame = {
    val remote = Services.Remote(fetch, attempts, backoffMs, minIntervalMs)
    val u = udf((url: String) => remote(url))
    df.withColumn("body", u(col(urlCol)))
  }
}
