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
    * `endpoint?src=..&dst=..` — the reference's per-row translate
    * loop (utils/universal_translator.py:28-43) as an executor-side
    * service call. A PARTITION-SCOPED client (mapPartitions, per
    * SURVEY §2.1 S6's spec): one [[Remote]] — retry policy + pacing
    * token bucket — is constructed per partition and announces itself
    * with a single `/hello-translate` handshake GET (warms the
    * keep-alive connection, and makes "one client per partition"
    * observable: the fixture's hit count on that path equals the
    * non-empty partition count), then every row of the partition
    * flows through that one client. The sandbox backend
    * ([[graft.sources.HttpFixture]]) implements the same
    * deterministic transform as [[translateStub]], so the stub's
    * oracle grades the live wire; swapping `endpoint` to a real
    * translate API is a config change, not a code change. */
  def translateHttp(df: org.apache.spark.sql.DataFrame,
      textCol: String, src: String, dst: String, endpoint: String,
      attempts: Int = 3, backoffMs: Long = 2000,
      minIntervalMs: Long = 0): org.apache.spark.sql.DataFrame = {
    val url = s"$endpoint?src=$src&dst=$dst"
    val hello = java.net.URI.create(endpoint)
      .resolve("/hello-translate").toString
    val schema = df.schema.add("translated",
      org.apache.spark.sql.types.StringType)
    val idx = df.schema.fieldIndex(textCol)
    df.mapPartitions { rows =>
      if (rows.isEmpty) rows
      else {
        // ONE client per partition: the pacing bucket and the JDK
        // keep-alive socket are partition-scoped, not per-row
        val remote = Remote(
          (text: String) => graft.sources.Sources.httpPost(url, text),
          attempts, backoffMs, minIntervalMs)
        // handshake: BEST-EFFORT warm-up/liveness probe — a real
        // backend without the path (404) must not kill the partition;
        // genuine unreachability surfaces on the first row's POST,
        // which goes through the retry policy
        try graft.sources.Sources.httpGet(hello)
        catch { case _: Exception => () }
        rows.map { r =>
          val text = if (r.isNullAt(idx)) "" else r.getString(idx)
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ remote(text))
        }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** U5 over a LIVE HTTP backend — the last §2.10 service carried
    * onto the wire: each row's image BYTES post to `endpoint?max=K`
    * (octet-stream — the bytes-clean transport, never a text decode)
    * and the response is the OCR'd token text. Mirrors the
    * reference's per-image OCR upload loop
    * (/root/reference/utils/details_translator/2_ocr_from_images
    * .py:46-48). The sandbox backend implements the same
    * deterministic bytes→tokens transform as [[ocrStub]] (UTF-8
    * payload text, first K space-split tokens), so the stub's oracle
    * grades the live wire. Partition-scoped client, like
    * [[translateHttp]]. */
  def ocrHttp(df: org.apache.spark.sql.DataFrame,
      binCol: String, endpoint: String, maxTokens: Int,
      attempts: Int = 3, backoffMs: Long = 2000,
      minIntervalMs: Long = 0): org.apache.spark.sql.DataFrame = {
    val url = s"$endpoint?max=$maxTokens"
    val schema = df.schema.add("ocr_text",
      org.apache.spark.sql.types.StringType)
    val idx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      if (rows.isEmpty) rows
      else {
        val remote = Remote(
          (img: Array[Byte]) => new String(
            graft.sources.Sources.httpPostBytes(url, img),
            java.nio.charset.StandardCharsets.UTF_8),
          attempts, backoffMs, minIntervalMs)
        rows.map { r =>
          val img =
            if (r.isNullAt(idx)) Array.emptyByteArray
            else r.getAs[Array[Byte]](idx)
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ remote(img))
        }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** U2 over a LIVE HTTP backend — the BATCHED chat-translate wire:
    * the reference groups OCR lines per product and sends each group
    * as ONE chat call (utils/details_translator/
    * 4_translator_of_grouped_ocr_results.py:36-51), so the transport
    * unit is the GROUP, not the row. One keyed shuffle collects each
    * group's lines in `ordCol` order, one POST per group carries the
    * newline-joined batch, the response's lines map back 1:1 onto
    * the inputs and re-explode to rows — request count scales with
    * groups, rows never leave the executors. Lines must be
    * newline-free (the batch frame); callers strip or pre-split.
    * Partition-scoped [[Remote]] client, like [[translateHttp]].
    * Returns (keyCol, ordCol, translated). */
  def chatTranslateHttp(df: org.apache.spark.sql.DataFrame,
      keyCol: String, ordCol: String, textCol: String,
      src: String, dst: String, endpoint: String,
      attempts: Int = 3, backoffMs: Long = 2000,
      minIntervalMs: Long = 0): org.apache.spark.sql.DataFrame = {
    val url = s"$endpoint?src=$src&dst=$dst"
    val grouped = df.groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(
        col(ordCol).as("__o"),
        coalesce(col(textCol), lit("")).as("__t")))).as("__items"))
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      grouped.schema(keyCol),
      df.schema(df.schema.fieldIndex(ordCol)),
      org.apache.spark.sql.types.StructField("translated",
        org.apache.spark.sql.types.StringType)))
    grouped.mapPartitions { rows =>
      if (rows.isEmpty) Iterator.empty
      else {
        val remote = Remote(
          (body: String) => graft.sources.Sources.httpPost(url, body),
          attempts, backoffMs, minIntervalMs)
        rows.flatMap { r =>
          val key = r.get(0)
          val items = r.getSeq[org.apache.spark.sql.Row](1)
          val body = items.map(_.getString(1)).mkString("\n")
          val lines = remote(body).split("\n", -1)
          require(lines.length == items.length,
            s"chat backend returned ${lines.length} lines for " +
              s"${items.length} inputs — the batch frame broke " +
              "(newline in a source line?)")
          items.iterator.zip(lines.iterator).map { case (it, line) =>
            org.apache.spark.sql.Row(key, it.get(0), line)
          }
        }
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** U3 over a LIVE HTTP backend — structured logistics extraction
    * as a wire call (the last of the five §2.10 services to earn a
    * transport; reference posture:
    * /root/reference/utils/details_translator/
    * 5_extract_logistic_info.py:43-60 posts the description text and
    * zips five answer lines, db_orchestrator.py:122-140 applies the
    * retry/backoff policy). Each row's text POSTs to `endpoint`; the
    * five `|`-framed response fields land as the same struct columns
    * as [[extractLogisticsStub]] — the sandbox backend implements
    * that exact transform, so the stub's oracle grades the live
    * wire. Partition-scoped [[Remote]] client, like
    * [[translateHttp]]. */
  def extractLogisticsHttp(df: org.apache.spark.sql.DataFrame,
      textCol: String, endpoint: String,
      attempts: Int = 3, backoffMs: Long = 2000,
      minIntervalMs: Long = 0): org.apache.spark.sql.DataFrame = {
    val st = org.apache.spark.sql.types.StringType
    val schema = df.schema
      .add("weight", st).add("dims", st).add("origin", st)
      .add("hs_code", st).add("incoterm", st)
    val idx = df.schema.fieldIndex(textCol)
    df.mapPartitions { rows =>
      if (rows.isEmpty) rows
      else {
        val remote = Remote(
          (text: String) =>
            graft.sources.Sources.httpPost(endpoint, text),
          attempts, backoffMs, minIntervalMs)
        rows.map { r =>
          val text = if (r.isNullAt(idx)) "" else r.getString(idx)
          val parts = remote(text).split("\\|", 5)
          require(parts.length == 5,
            s"logistics backend returned ${parts.length} fields, " +
              "expected 5 (weight|dims|origin|hs_code|incoterm)")
          org.apache.spark.sql.Row.fromSeq(r.toSeq ++ parts)
        }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** U4 over a LIVE HTTP backend — the namer wire
    * (utils/ai-helper/art-maker/namer.py:20-45): each row POSTs
    * `category|collection` and the response's `Name|SKU` pair lands
    * as two columns. The sandbox backend implements the SAME
    * deterministic transform as [[nameSkuStub]], so the stub's
    * oracle grades the live wire. Partition-scoped [[Remote]]
    * client; '|' frames the wire fields (inputs must not carry it —
    * category/collection are curated identifiers). */
  def nameSkuHttp(df: org.apache.spark.sql.DataFrame,
      categoryCol: String, collectionCol: String, endpoint: String,
      attempts: Int = 3, backoffMs: Long = 2000,
      minIntervalMs: Long = 0): org.apache.spark.sql.DataFrame = {
    val schema = df.schema
      .add("name", org.apache.spark.sql.types.StringType)
      .add("sku", org.apache.spark.sql.types.StringType)
    val catI = df.schema.fieldIndex(categoryCol)
    val collI = df.schema.fieldIndex(collectionCol)
    df.mapPartitions { rows =>
      if (rows.isEmpty) rows
      else {
        val remote = Remote(
          (body: String) =>
            graft.sources.Sources.httpPost(endpoint, body),
          attempts, backoffMs, minIntervalMs)
        rows.map { r =>
          val cat = if (r.isNullAt(catI)) "" else r.getString(catI)
          val coll = if (r.isNullAt(collI)) "" else r.getString(collI)
          val parts = remote(s"$cat|$coll").split("\\|", 2)
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ parts(0) :+
            (if (parts.length > 1) parts(1) else ""))
        }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  // ---- real-backend plumbing (I3 rate limit + I4 retry) ----

  /** Per-client token-bucket pacing + bounded retry with linear
    * backoff. Wraps any `A => B` remote call (text translate, binary
    * OCR upload, image GET) for use inside mapPartitions — one
    * instance per partition, so the pacing state is per-connection,
    * not per-thread. Deterministic stubs never touch it. */
  final case class Remote[A, B](
      call: A => B,
      attempts: Int = 3,
      backoffMs: Long = 2000,
      minIntervalMs: Long = 0) extends Serializable {
    @transient private var lastCallAt = 0L
    def apply(in: A): B = {
      var attempt = 0
      var out: Option[B] = None
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
