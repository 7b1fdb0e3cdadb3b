package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The external-service map-operator surface (SURVEY.md §2.10, U1-U5)
  * — translation, OCR, structured extraction, name/SKU generation.
  *
  * Architecture: each service is a row-level function with TWO
  * implementations sharing one signature — a deterministic STUB (pure
  * Catalyst column expressions; codegen-friendly, hermetically
  * testable, oracle-hashable) and an optional real backend hook
  * (`Remote`) that wraps a `String => String` call with the retry and
  * rate-limit policy the reference hard-codes
  * (/root/reference/utils/universal_translator.py:28-43 — 3 attempts,
  * 2 s backoff; .../product_collection_img_array_processor.py:164 —
  * politeness delay). Real backends run inside mapPartitions-style
  * UDFs so connections amortize per partition and the driver never
  * sees a row; this container has no network, so only stubs execute
  * here.
  */
object Services {

  // ---- deterministic stubs (the test/oracle path) ----

  /** U1/U2 translate stub: tag the text with the language pair —
    * deterministic, length-preserving-ish, invertible for tests. */
  def translateStub(c: Column, src: String, dst: String): Column =
    concat(lit(s"[$src->$dst] "), coalesce(c, lit("")))

  /** U5 OCR stub: the image's "text" is read from the seed column —
    * first `maxTokens` whitespace tokens, the shape real OCR emits. */
  def ocrStub(seed: Column, maxTokens: Int): Column =
    slice(split(coalesce(seed, lit("")), " "), 1, maxTokens)

  /** U3 structured logistics extraction stub: 5 deterministic fields
    * derived from the text (the reference zips 5 answer lines,
    * /root/reference/utils/details_translator/db_orchestrator.py:135-137). */
  def extractLogisticsStub(c: Column): Column = {
    val n = length(coalesce(c, lit("")))
    struct(
      concat((n % 50).cast("string"), lit("kg")).as("weight"),
      concat((n % 9).cast("string"), lit("x"), (n % 7).cast("string"))
        .as("dims"),
      substring(coalesce(c, lit("na")), 1, 2).as("origin"),
      concat(lit("HS"), (n % 100).cast("string")).as("hs_code"),
      lit("FOB").as("incoterm"))
  }

  /** U4 name/SKU generation stub
    * (/root/reference/utils/ai-helper/art-maker/namer.py:20-45). */
  def nameSkuStub(category: Column, collection: Column): Column =
    struct(
      initcap(concat_ws(" ", category, collection)).as("name"),
      upper(substring(md5(concat_ws("|", category, collection)), 1, 8))
        .as("sku"))

  /** U1/U2 over a LIVE HTTP backend: each row's text POSTs to
    * `endpoint?src=..&dst=..` through [[Remote]]'s retry/pacing —
    * the reference's per-row translate loop
    * (utils/universal_translator.py:28-43) as an executor-side
    * service call. The sandbox backend ([[graft.sources
    * .HttpFixture]]) implements the same deterministic transform as
    * [[translateStub]], so the stub's oracle grades the live wire;
    * swapping `endpoint` to a real translate API is a config change,
    * not a code change. */
  def translateHttp(df: org.apache.spark.sql.DataFrame,
      textCol: String, src: String, dst: String, endpoint: String,
      attempts: Int = 3, backoffMs: Long = 2000,
      minIntervalMs: Long = 0): org.apache.spark.sql.DataFrame = {
    val url = s"$endpoint?src=$src&dst=$dst"
    val remote = Remote(
      (text: String) => graft.sources.Sources.httpPost(url, text),
      attempts, backoffMs, minIntervalMs)
    val u = udf((text: String) =>
      if (text == null) remote("") else remote(text))
    df.withColumn("translated", u(col(textCol)))
  }

  // ---- real-backend plumbing (I3 rate limit + I4 retry) ----

  /** Per-executor-thread token-bucket pacing + bounded retry with
    * linear backoff. Wraps any `String => String` remote call for use
    * inside a UDF/mapPartitions; deterministic stubs never touch it. */
  final case class Remote(
      call: String => String,
      attempts: Int = 3,
      backoffMs: Long = 2000,
      minIntervalMs: Long = 0) extends Serializable {
    @transient private var lastCallAt = 0L
    def apply(in: String): String = {
      var attempt = 0
      var out: Option[String] = None
      while (out.isEmpty) {
        attempt += 1
        val wait = lastCallAt + minIntervalMs - System.currentTimeMillis()
        if (wait > 0) Thread.sleep(wait)
        lastCallAt = System.currentTimeMillis()
        try out = Some(call(in))
        catch {
          case e: Exception if attempt < attempts =>
            Thread.sleep(backoffMs * attempt)
          case e: Exception => throw e
        }
      }
      out.get
    }
  }
}
