package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media are opaque `binary` columns + typed metadata structs. The
  * Spark-side contract — schema, partition sizing, batch shape of the
  * decode stage — is real and tested; the actual decode is a STUB
  * (deterministic fake derived from the bytes) because media codecs
  * are not in this container. Swap `decodeImageStub` for a real
  * decoder (partition-level library init via mapPartitions) without
  * touching any plan shape.
  *
  * The reference's analog is its image download/OCR stage
  * (/root/reference/utils/details_translator/2_ocr_from_images.py:27-48),
  * which also treats images as opaque blobs flowing to a per-row
  * decode boundary.
  */
object Multimodal {

  /** Canonical media-row schema: (id, modality, content binary,
    * meta struct). */
  def asMediaFrame(df: DataFrame, idCol: String, binCol: String,
      modality: String): DataFrame =
    df.select(col(idCol).as("media_id"),
      lit(modality).as("modality"),
      col(binCol).as("content"),
      struct(
        octet_length(col(binCol)).as("n_bytes"),
        sha2(col(binCol), 256).as("digest")).as("meta"))

  /** Deterministic STUB for image decode: "width"/"height"/"format"
    * derived from the content digest — a stand-in with the real
    * schema. Replace with a codec call (mapPartitions) in production. */
  def decodeImageStub(content: Column): Column = {
    val digest = sha2(content, 256)
    // integer-only arithmetic (no long/long division, which Spark
    // evaluates in double) so the stub is reproducible in any engine
    val hw = graft.functions.hash31(concat(digest, lit("w")))
    val hh = graft.functions.hash31(concat(digest, lit("h")))
    struct(
      (hw % 1920L + 1L).cast("int").as("width"),
      (hh % 1080L + 1L).cast("int").as("height"),
      element_at(array(lit("jpeg"), lit("png"), lit("webp")),
        (graft.functions.hash31(digest) % 3L).cast("int") + 1).as("format"))
  }

  /** Big-endian unsigned 32-bit at 1-based byte `pos`. */
  private def beU32(c: Column, pos: Int): Column =
    conv(hex(substring(c, pos, 4)), 16, 10).cast("long")

  /** Little-endian unsigned int of `len` bytes at 1-based `pos`. */
  private def leUInt(c: Column, pos: Int, len: Int): Column =
    (0 until len).map(i =>
      conv(hex(substring(c, pos + i, 1)), 16, 10).cast("long") *
        lit(1L << (8 * i))).reduce(_ + _)

  /** REAL image metadata — no codec, no stub: PNG (IHDR, big-endian),
    * BMP (BITMAPINFOHEADER, little-endian; top-down negative heights
    * normalized) and GIF (logical screen, little-endian) carry their
    * dimensions at fixed header offsets, so width/height parse with
    * nothing but `substring`/`hex`/`conv`. JPEG's dimensions sit in a
    * variable-offset SOFn segment, beyond fixed-offset arithmetic —
    * round 7 covers it with the native `graft_jpeg_dims` marker walk
    * ([[graft.expressions.JpegDimsExpr]]): a bounded hop over segment
    * headers, still per-row inside whole-stage codegen, still zero
    * shuffle, reading header bytes only (never entropy data). The
    * reference's product images ARE JPEGs (the *.jpg OCR walk), so
    * this closes the format that matters most. Truncated/foreign
    * bytes → null struct, never a misparse (length guards per
    * format; the walker nulls on any malformation).
    *
    * REQUIRES `spark.sql.extensions=graft.plans.GraftExtensions` (like
    * [[graft.functions.pseudonymize]]/`nfcNormalize`): the JPEG arm
    * calls the registered `graft_jpeg_dims` function, and Spark
    * resolves `call_function` at analysis even when the branch never
    * fires, so a session without the extension fails analysis on
    * every imageDims call — not just on JPEG inputs. */
  def imageDims(content: Column): Column = {
    val outType = "struct<format:string,width:bigint,height:bigint>"
    val n = octet_length(content)
    val isPng = n >= 24 &&
      hex(substring(content, 1, 8)) === "89504E470D0A1A0A"
    val isBmp = n >= 26 && hex(substring(content, 1, 2)) === "424D"
    val isGif = n >= 10 && hex(substring(content, 1, 4)) === "47494638"
    val isJpg = n >= 4 && hex(substring(content, 1, 2)) === "FFD8"
    val jpg = call_function("graft_jpeg_dims", content)
    // BMP height is SIGNED (negative = top-down row order): fold the
    // two's-complement wrap back and take the magnitude
    val bmpH = leUInt(content, 23, 4)
    val bmpHAbs = when(bmpH > lit(0x7FFFFFFFL),
      lit(0x100000000L) - bmpH).otherwise(bmpH)
    when(isPng, struct(lit("png").as("format"),
        beU32(content, 17).as("width"), beU32(content, 21).as("height")))
      .when(isBmp, struct(lit("bmp").as("format"),
        leUInt(content, 19, 4).as("width"), bmpHAbs.as("height")))
      .when(isGif, struct(lit("gif").as("format"),
        leUInt(content, 7, 2).as("width"), leUInt(content, 9, 2).as("height")))
      .when(isJpg && jpg.isNotNull, struct(lit("jpeg").as("format"),
        element_at(jpg, 1).as("width"), element_at(jpg, 2).as("height")))
      .otherwise(lit(null).cast(outType))
  }

  /** REAL audio metadata for canonical PCM WAV (RIFF/WAVE with the
    * fmt chunk at its standard offset 13 and the data chunk directly
    * after): channels, sample rate, bit depth and an exact integer
    * duration_ms — all little-endian fixed-offset reads, same
    * expression-only technique as [[imageDims]]. WAVs with extra
    * chunks before fmt/data (LIST, fact) return null rather than a
    * misparse — variable chunk walking belongs at the mapPartitions
    * decode boundary, exactly like JPEG. */
  /** ISO-BMFF (MP4/MOV) container metadata — the video sibling of
    * [[imageDims]]/[[wavMeta]]: brand + movie timescale, duration
    * (native and exact floor milliseconds), and track count, parsed
    * by the native `graft_mp4_meta` box walk (headers only, zero
    * codec). Non-containers come back as a null struct, never a
    * misparse. This is the metadata a video pipeline derives its
    * frame-sampling plan from ([[sampleFrameIndexes]]) before any
    * decode is scheduled. */
  def mp4Meta(content: Column): Column = {
    val outType = "struct<brand:string,timescale:bigint," +
      "duration:bigint,duration_ms:bigint,n_tracks:bigint>"
    val m = call_function("graft_mp4_meta", content)
    when(m.isNotNull, struct(
        decode(substring(content, 9, 4), "UTF-8").as("brand"),
        element_at(m, 1).as("timescale"),
        element_at(m, 2).as("duration"),
        element_at(m, 3).as("duration_ms"),
        element_at(m, 4).as("n_tracks")))
      .otherwise(lit(null).cast(outType))
  }

  def wavMeta(content: Column): Column = {
    val outType = "struct<channels:bigint,sample_rate:bigint," +
      "bits:bigint,duration_ms:bigint>"
    val n = octet_length(content)
    val canonical = n >= 44 &&
      hex(substring(content, 1, 4)) === "52494646" &&      // "RIFF"
      hex(substring(content, 9, 4)) === "57415645" &&      // "WAVE"
      hex(substring(content, 13, 4)) === "666D7420" &&     // "fmt "
      hex(substring(content, 37, 4)) === "64617461"        // "data"
    val byteRate = leUInt(content, 29, 4)
    // exact floor division: subtract the remainder first, so the
    // double division is an exact-multiple / divisor = exact integer
    val ms = leUInt(content, 41, 4) * lit(1000L)
    val durMs = ((ms - ms.mod(byteRate)) / byteRate).cast("long")
    when(canonical && byteRate > 0, struct(
        leUInt(content, 23, 2).as("channels"),
        leUInt(content, 25, 4).as("sample_rate"),
        leUInt(content, 35, 2).as("bits"),
        durMs.as("duration_ms")))
      .otherwise(lit(null).cast(outType))
  }

  /** 16-bit mono PCM frame energy + VAD gate over canonical WAV
    * blobs — the audio-curation primitive (silence trimming /
    * speech-segment selection ahead of an ASR or audio-LM pipeline).
    * The `data` chunk splits into frames of `frameSamples` samples;
    * each frame reports its EXACT integer sum of squares and
    * mean-square (no sqrt, no float), so an energy gate
    * (`active` = mean_sq >= threshold) compares identically on any
    * engine — the classic energy VAD, with threshold calibration
    * left to the caller's noise-floor measurement.
    *
    * Parse is the [[wavMeta]] discipline — substring/hex/conv
    * arithmetic only, no codec, no UDF: canonical-44-byte-header
    * 16-bit MONO little-endian PCM (the layout a normalized audio
    * corpus actually lands in); anything else contributes no rows
    * rather than a misparse. Scale shape: ONE narrow explode
    * (file → frames) with each frame's fold running inside its own
    * row — sample reads are hex-string slices of the row's data
    * chunk, nothing shuffles until the caller aggregates. */
  def pcmFrameEnergy(df: DataFrame, idCol: String, contentCol: String,
      frameSamples: Int, threshold: Long): DataFrame = {
    require(frameSamples > 0,
      s"frameSamples must be positive: $frameSamples")
    val c = col(contentCol)
    val canonical = octet_length(c) >= 46 &&
      hex(substring(c, 1, 4)) === "52494646" &&      // "RIFF"
      hex(substring(c, 9, 4)) === "57415645" &&      // "WAVE"
      hex(substring(c, 13, 4)) === "666D7420" &&     // "fmt "
      hex(substring(c, 37, 4)) === "64617461" &&     // "data"
      leUInt(c, 21, 2) === 1 &&                      // wFormatTag: linear PCM only
      leUInt(c, 23, 2) === 1 && leUInt(c, 35, 2) === 16
    df.filter(canonical)
      .withColumn("__n",
        expr(s"least(${leUIntSql(contentCol, 41, 4)}, " +
          s"octet_length(`$contentCol`) - 44) div 2"))
      .filter(col("__n") > 0)
      .withColumn("__hx", hex(expr(
        s"substr(`$contentCol`, 45, cast(__n * 2 as int))")))
      .withColumn("frame",
        explode(sequence(lit(0L),
          expr(s"(__n - 1) div $frameSamples"))))
      .withColumn("__k0", col("frame") * frameSamples)
      .withColumn("n_samples",
        least(lit(frameSamples.toLong), col("__n") - col("__k0")))
      .withColumn("sum_sq", expr(
        s"""aggregate(
           |  transform(
           |    transform(sequence(0L, n_samples - 1), k ->
           |      CAST(conv(
           |        substr(__hx, CAST((__k0 + k) * 4 + 3 AS INT), 2) ||
           |        substr(__hx, CAST((__k0 + k) * 4 + 1 AS INT), 2),
           |        16, 10) AS BIGINT)),
           |    u -> CASE WHEN u >= 32768 THEN u - 65536 ELSE u END),
           |  0L, (acc, s) -> acc + s * s)""".stripMargin))
      .withColumn("mean_sq", expr("sum_sq div n_samples"))
      .withColumn("active", col("mean_sq") >= threshold)
      .select(col(idCol), col("frame"), col("n_samples"),
        col("sum_sq"), col("mean_sq"), col("active"))
  }

  /** SQL-text twin of [[leUInt]] for use inside `expr` strings. */
  private def leUIntSql(colName: String, pos: Int, len: Int): String =
    (0 until len).map(i =>
      s"CAST(conv(hex(substr(`$colName`, ${pos + i}, 1)), 16, 10)" +
        s" AS BIGINT) * ${1L << (8 * i)}L").mkString("(", " + ", ")")

  /** Deterministic STUB feature vector (dim floats) from content
    * bytes — stands in for an embedding model. */
  def featureStub(content: Column, dim: Int): Column =
    transform(sequence(lit(0), lit(dim - 1)), i =>
      ((graft.functions.hash31(concat(sha2(content, 256), i))
        .cast("double") / graft.functions.HashPrime31) * 2.0 - 1.0))

  /** ViT-style patch-grid plumbing for images: one row per
    * `patch`×`patch` tile of each decodable image, offsets and
    * clipped edge extents included — the (media, patch) fan-out a
    * vision-tokenizer pipeline feeds to the decoder+projector (edge
    * tiles report their TRUE pw/ph; the padding policy is the
    * consumer's). Dimensions come from the REAL header parse
    * ([[imageDims]] — PNG/BMP/GIF offsets + native JPEG SOFn walk),
    * so the grid arithmetic is exact without any codec in the loop;
    * undecodable rows drop. Pure narrow maps + two bounded explodes
    * (ceil(w/patch)·ceil(h/patch) rows per image) — no shuffle. */
  def patchGrid(df: DataFrame, idCol: String, contentCol: String,
      patch: Int): DataFrame = {
    require(patch > 0, s"patch must be > 0: $patch")
    df.withColumn("__dims", imageDims(col(contentCol)))
      .filter(col("__dims.width").isNotNull)
      .select(col(idCol), col("__dims.width").as("__w"),
        col("__dims.height").as("__h"))
      .withColumn("py",
        explode(sequence(lit(0L), expr(s"(__h - 1) div ${patch}L"))))
      .withColumn("px",
        explode(sequence(lit(0L), expr(s"(__w - 1) div ${patch}L"))))
      .select(col(idCol), col("py"), col("px"),
        (col("px") * patch).as("x_off"),
        (col("py") * patch).as("y_off"),
        least(lit(patch.toLong), col("__w") - col("px") * patch)
          .as("pw"),
        least(lit(patch.toLong), col("__h") - col("py") * patch)
          .as("ph"))
  }

  /** Frame sampling plumbing for video: every nth "frame" index up to
    * nFrames — generates the (media_id, frame_idx) fan-out rows that a
    * real decoder would fill. */
  def sampleFrameIndexes(df: DataFrame, nFramesCol: Column,
      every: Int): DataFrame =
    df.withColumn("frame_idx",
      explode(sequence(lit(0), greatest(nFramesCol - 1, lit(0)),
        lit(every))))

  /** Full stub pipeline: binary in → decoded meta + features out.
    * Plan shape: narrow maps only; no shuffle until a downstream
    * aggregation — exactly what a real decode stage must look like. */
  def enrichImages(media: DataFrame, featureDim: Int = 8): DataFrame =
    media
      .withColumn("decoded", decodeImageStub(col("content")))
      .withColumn("features", featureStub(col("content"), featureDim))

  /** Deterministic STUB perceptual hash (aHash shape): a `cells`-cell
    * fake pixel grid derived from the content digest, one bit per
    * cell, set iff the cell value is >= the grid mean
    * (cross-multiplied — g*cells >= total — so no division ever
    * runs). In production the grid is real downsampled luma from the
    * decoder; the hash layout and everything downstream (banded
    * hamming pairs via [[graft.operators.Dedup.hammingPairs]],
    * clustering, keep-best) is the real thing. Identical content
    * bytes hash identically, so re-encoded exact duplicates are
    * found at hamming 0 even under the stub. Narrow map; the grid
    * cells are staged as aliased intermediates (each md5 evaluated
    * once, not once per reference). Keep cells <= 32: the oracle
    * engine's 1<<k needs k < 63, and 32 keeps bands of 8 bits. */
  def withPerceptualHash(media: DataFrame, cells: Int = 32): DataFrame = {
    require(cells <= 32, "cells > 32 breaks the 64-bit bit-shift parity")
    val withG = media.withColumn("__dg", sha2(col("content"), 256))
    val gCols = (0 until cells).map(k =>
      (graft.functions.hash31(concat(col("__dg"), lit(s":$k"))) % 256L)
        .as(s"__g$k"))
    val staged = withG.select(withG.columns.map(col) ++ gCols: _*)
      .withColumn("__tot",
        (0 until cells).map(k => col(s"__g$k")).reduce(_ + _))
    val phash = (0 until cells).map(k =>
      when(col(s"__g$k") * cells >= col("__tot"), lit(1L << k))
        .otherwise(lit(0L))).reduce(_ + _)
    staged.withColumn("phash", phash)
      .drop(((0 until cells).map(k => s"__g$k") ++ Seq("__dg", "__tot")): _*)
  }
}
