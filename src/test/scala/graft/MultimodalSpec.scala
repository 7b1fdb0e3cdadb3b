package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.Multimodal

/** Multimodal plumbing contract: schemas, determinism, value ranges,
  * and plan shape of the decode/feature/frame stages (the decode
  * itself is a documented stub — these specs pin everything a real
  * codec swap must preserve).
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Multimodal.asMediaFrame(
    Seq((1L, "abc"), (2L, ""), (3L, "第三个")).toDF("id", "payload")
      .withColumn("bin", encode(col("payload"), "UTF-8")),
    "id", "bin", "image")

  test("asMediaFrame: canonical schema with typed metadata") {
    val schema = media.schema
    assert(schema("media_id").dataType == LongType)
    assert(schema("modality").dataType == StringType)
    assert(schema("content").dataType == BinaryType)
    val meta = schema("meta").dataType.asInstanceOf[StructType]
    assert(Set[DataType](IntegerType, LongType)(meta("n_bytes").dataType))
    assert(meta("digest").dataType == StringType)
    val row = media.filter($"media_id" === 1).collect()(0)
    assert(row.getAs[org.apache.spark.sql.Row]("meta")
      .getAs[Number]("n_bytes").longValue == 3L)
  }

  test("enrichImages: deterministic stub decode with plausible ranges") {
    val out = Multimodal.enrichImages(media, featureDim = 4)
    val rows = out.select($"media_id", $"decoded.width", $"decoded.height",
        $"decoded.format", $"features")
      .collect()
    rows.foreach { r =>
      assert(r.getInt(1) >= 1 && r.getInt(1) <= 1920)
      assert(r.getInt(2) >= 1 && r.getInt(2) <= 1080)
      assert(Set("jpeg", "png", "webp")(r.getString(3)))
      val fs = r.getSeq[Double](4)
      assert(fs.length == 4 && fs.forall(f => f >= -1.0 && f <= 1.0))
    }
    // identical bytes -> identical decode, run to run
    val again = Multimodal.enrichImages(media, featureDim = 4)
      .select($"media_id", $"decoded", $"features").collect()
    val first = out.select($"media_id", $"decoded", $"features").collect()
    assert(first.map(_.toString).sorted.toSeq ==
      again.map(_.toString).sorted.toSeq)
  }

  test("enrichImages: narrow maps only — no exchange in the plan") {
    val plan = Multimodal.enrichImages(media, 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"decode/feature stage must not shuffle:\n$plan")
  }

  test("sampleFrameIndexes: every-nth fan-out, zero-frame safe") {
    val vids = Seq((1L, 7), (2L, 1), (3L, 0)).toDF("media_id", "n_frames")
    val out = Multimodal.sampleFrameIndexes(vids, col("n_frames"), 3)
      .select("media_id", "frame_idx")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq.sorted
    assert(out == Seq((1L, 0), (1L, 3), (1L, 6), (2L, 0), (3L, 0)))
  }

  test("perceptual hash: identical bytes collide at hamming 0, plan is narrow") {
    val m = Seq((1L, "same bytes"), (2L, "same bytes"), (3L, "other"))
      .toDF("media_id", "text")
      .withColumn("content", encode(col("text"), "UTF-8"))
    val sigs = Multimodal.withPerceptualHash(m)
      .select("media_id", "phash")
    assert(!sigs.queryExecution.executedPlan.toString.contains("Exchange"),
      "phash must be a narrow map")
    val pairs = graft.operators.Dedup
      .hammingPairs(sigs, "media_id", "phash", 32, 4, 3)
      .select("id_a", "id_b", "hamming")
      .as[(Long, Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L, 0L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("imageDims: fixture headers parse exactly; truncated or foreign bytes are null, not misparsed") {
    val out = graft.sources.Sources
      .binaryFiles(spark, "/root/repo/fixtures/media", "*")
      .withColumn("dims", Multimodal.imageDims(col("content")))
      .select(element_at(split(col("path"), "/"), -1).as("file"),
        col("dims.format"), col("dims.width"), col("dims.height"))
      .as[(String, Option[String], Option[Long], Option[Long])]
      .collect().map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(out("tiny.png") == ((Some("png"), Some(640L), Some(480L))))
    // stored height is -200 (top-down); must normalize to +200
    assert(out("tiny.bmp") == ((Some("bmp"), Some(320L), Some(200L))))
    assert(out("tiny.gif") == ((Some("gif"), Some(12L), Some(34L))))
    // real ImageIO-written JFIF: dims live in a variable-offset SOF0
    // behind APP0+DQT+DHT segments — the native marker walk finds it
    assert(out("tiny.jpg") == ((Some("jpeg"), Some(31L), Some(17L))))
    assert(out("a.bin") == ((None, None, None)))
    // a PNG signature cut off before the IHDR width must be null —
    // the length guard, not a partial conv, decides
    val trunc = Seq(Tuple1(Array[Byte](0x89.toByte, 'P', 'N', 'G',
      0x0d, 0x0a, 0x1a, 0x0a, 0, 0))).toDF("content")
      .select(Multimodal.imageDims(col("content")).as("dims"))
      .select("dims.format").collect()(0)
    assert(trunc.isNullAt(0))
    // the whole parse is expression-only: no exchange, no UDF
    val plan = graft.sources.Sources
      .binaryFiles(spark, "/root/repo/fixtures/media", "*")
      .select(Multimodal.imageDims(col("content")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("BatchEvalPython"))
  }

  test("jpegDims walker: scalar kernel handles synthetic segment " +
      "layouts, truncation, and entropy-data traps") {
    import graft.expressions.MediaHeaders.jpegDims
    def seg(marker: Int, payload: Array[Byte]): Array[Byte] =
      Array(0xff.toByte, marker.toByte,
        ((payload.length + 2) >> 8).toByte,
        ((payload.length + 2) & 0xff).toByte) ++ payload
    def sof0(w: Int, h: Int): Array[Byte] =
      seg(0xc0, Array(8.toByte, (h >> 8).toByte, (h & 0xff).toByte,
        (w >> 8).toByte, (w & 0xff).toByte, 1.toByte))
    val soi = Array(0xff.toByte, 0xd8.toByte)
    // SOI + APP1 (EXIF-like filler) + SOF0 — dims found behind a
    // variable-length segment the fixed-offset technique can't cross
    val exif = soi ++ seg(0xe1, Array.fill(37)(0x55.toByte)) ++
      sof0(1234, 777)
    assert(jpegDims(exif).toSeq == Seq(1234L, 777L))
    // progressive marker (SOF2) parses too
    val prog = soi ++ seg(0xc2, Array(8.toByte, 0.toByte, 17.toByte,
      0.toByte, 31.toByte, 3.toByte))
    assert(jpegDims(prog).toSeq == Seq(31L, 17L))
    // DHT (C4) must NOT be taken for a frame header
    val dhtFirst = soi ++ seg(0xc4, Array.fill(6)(1.toByte)) ++
      sof0(9, 5)
    assert(jpegDims(dhtFirst).toSeq == Seq(9L, 5L))
    // truncated before the SOF completes -> null, not a misparse
    assert(jpegDims(exif.dropRight(4)) == null)
    // no SOI, zero-length segment, empty -> null
    assert(jpegDims(Array[Byte](1, 2, 3, 4)) == null)
    assert(jpegDims(soi ++ Array(0xff.toByte, 0xe0.toByte, 0.toByte,
      0.toByte)) == null)
    assert(jpegDims(Array.emptyByteArray) == null)
  }

  test("mp4Meta walker: fixture parses exactly; 64-bit and to-EOF " +
      "box sizes, v1 mvhd, truncation, and foreign bytes all behave") {
    import graft.expressions.MediaHeaders.mp4Meta
    def be32(v: Long): Array[Byte] = Array(
      (v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def be64(v: Long): Array[Byte] = be32(v >> 32) ++ be32(v & 0xffffffffL)
    def box(tp: String, payload: Array[Byte]): Array[Byte] =
      be32(8L + payload.length) ++ tp.getBytes("US-ASCII") ++ payload
    val ftyp = box("ftyp", "isomXXXXisom".getBytes("US-ASCII"))
    def mvhd0(ts: Long, dur: Long): Array[Byte] =
      box("mvhd", Array[Byte](0, 0, 0, 0) ++ be32(0) ++ be32(0) ++
        be32(ts) ++ be32(dur) ++ Array.fill(80)(0.toByte))
    def mvhd1(ts: Long, dur: Long): Array[Byte] =
      box("mvhd", Array[Byte](1, 0, 0, 0) ++ be64(0) ++ be64(0) ++
        be32(ts) ++ be64(dur) ++ Array.fill(80)(0.toByte))
    val trak = box("trak", Array.emptyByteArray)
    // committed fixture: 600 ts, 3000 dur -> 5000 ms, 2 tracks
    val fixture = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/repo/fixtures/media/tiny.mp4"))
    assert(mp4Meta(fixture).toSeq == Seq(600L, 3000L, 5000L, 2L))
    // v1 mvhd (64-bit times), three tracks, floor ms
    val v1 = ftyp ++ box("moov", mvhd1(90000, 123457) ++ trak ++
      trak ++ trak)
    assert(mp4Meta(v1).toSeq ==
      Seq(90000L, 123457L, 123457L * 1000 / 90000, 3L))
    // an mdat with a 64-bit largesize between ftyp and moov must be
    // hopped by size, not read
    val payload = Array.fill(64)(0x7f.toByte)
    val largeMdat = be32(1L) ++ "mdat".getBytes("US-ASCII") ++
      be64(16L + payload.length) ++ payload
    assert(mp4Meta(ftyp ++ largeMdat ++
      box("moov", mvhd0(600, 600) ++ trak)).toSeq ==
      Seq(600L, 600L, 1000L, 1L))
    // moov with size 0 extends to EOF
    val toEof = ftyp ++ (be32(0L) ++ "moov".getBytes("US-ASCII") ++
      mvhd0(1000, 2500) ++ trak)
    assert(mp4Meta(toEof).toSeq == Seq(1000L, 2500L, 2500L, 1L))
    // truncation mid-moov, missing ftyp, zero timescale, foreign
    // bytes: all null, never a misparse
    assert(mp4Meta(v1.dropRight(30)) == null)
    assert(mp4Meta(box("moov", mvhd0(600, 600))) == null)
    assert(mp4Meta(ftyp ++ box("moov", mvhd0(0, 600) ++ trak)) == null)
    assert(mp4Meta("RIFFxxxxWAVE".getBytes("US-ASCII")) == null)
    assert(mp4Meta(Array.emptyByteArray) == null)
    // expression-only plan: no exchange, no UDF
    val plan = graft.sources.Sources
      .binaryFiles(spark, "/root/repo/fixtures/media", "*.mp4")
      .select(Multimodal.mp4Meta(col("content")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("BatchEvalPython"))
  }

  test("patchGrid: tiles cover each image exactly once, edges clip " +
      "to true extents, non-images drop") {
    val files = graft.sources.Sources.binaryFiles(spark,
        "/root/repo/fixtures/media", "*")
      .select(element_at(split(col("path"), "/"), -1).as("file"),
        col("content"))
    val g = Multimodal.patchGrid(files, "file", "content", 16)
      .collect()
    val byFile = g.groupBy(_.getString(0))
    // only the four decodable images produce tiles
    assert(byFile.keySet == Set("tiny.bmp", "tiny.gif", "tiny.jpg",
      "tiny.png"), s"got ${byFile.keySet}")
    // exact cover: tile areas sum to w*h (no overlap by construction:
    // offsets are a grid)
    val dims = Map("tiny.bmp" -> (320L, 200L), "tiny.gif" -> (12L, 34L),
      "tiny.jpg" -> (31L, 17L), "tiny.png" -> (640L, 480L))
    dims.foreach { case (f, (w, h)) =>
      val tiles = byFile(f)
      assert(tiles.map(r =>
        r.getAs[Long]("pw") * r.getAs[Long]("ph")).sum == w * h,
        s"$f area cover")
      assert(tiles.length ==
        ((w + 15) / 16) * ((h + 15) / 16), s"$f tile count")
    }
    // jpg 31x17: the right column clips to 15, the bottom row to 1
    val jpg = byFile("tiny.jpg")
    assert(jpg.filter(_.getAs[Long]("px") == 1L)
      .forall(_.getAs[Long]("pw") == 15L))
    assert(jpg.filter(_.getAs[Long]("py") == 1L)
      .forall(_.getAs[Long]("ph") == 1L))
  }

  test("wavMeta: canonical PCM header parses exactly; images and truncated RIFF are null") {
    val out = graft.sources.Sources
      .binaryFiles(spark, "/root/repo/fixtures/media", "*")
      .withColumn("m", Multimodal.wavMeta(col("content")))
      .select(element_at(split(col("path"), "/"), -1).as("file"),
        col("m.channels"), col("m.sample_rate"), col("m.bits"),
        col("m.duration_ms"))
      .as[(String, Option[Long], Option[Long], Option[Long], Option[Long])]
      .collect().map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    // 400 data bytes at 16000 B/s -> exact floor 25 ms
    assert(out("tiny.wav") ==
      ((Some(1L), Some(8000L), Some(16L), Some(25L))))
    assert(out("tiny.png") == ((None, None, None, None)))
    assert(out("a.bin") == ((None, None, None, None)))
    // a RIFF/WAVE prefix without the canonical fmt/data layout must
    // be null (chunk walking is the decode boundary's job)
    val odd = Seq(Tuple1("RIFF1234WAVELIST".getBytes ++
      new Array[Byte](40))).toDF("content")
      .select(Multimodal.wavMeta(col("content")).as("m"))
      .select("m.channels").collect()(0)
    assert(odd.isNullAt(0))
  }

  test("pcmFrameEnergy: exact energies on hand-packed PCM; short " +
      "last frame; non-canonical and stereo inputs contribute no rows") {
    // 10 samples, frame = 4 -> frames of 4, 4, 2
    val samples = Array[Short](100, -100, 0, 32767, -32768, 5, -5,
      1000, -1000, 7)
    def le16(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def hdr(channels: Int, bits: Int, dataLen: Int): Array[Byte] = {
      def le32(v: Int) = Array(v & 0xff, (v >> 8) & 0xff,
        (v >> 16) & 0xff, (v >> 24) & 0xff).map(_.toByte)
      "RIFF".getBytes ++ le32(36 + dataLen) ++ "WAVE".getBytes ++
        "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(channels) ++
        le32(8000) ++ le32(16000) ++ le16(2) ++ le16(bits) ++
        "data".getBytes ++ le32(dataLen)
    }
    val pcm = samples.flatMap(s => le16(s & 0xffff))
    val good = hdr(1, 16, pcm.length) ++ pcm
    val stereo = hdr(2, 16, pcm.length) ++ pcm
    val junk = "not a wav at all, just bytes".getBytes
    val df = Seq((1L, good), (2L, stereo), (3L, junk))
      .toDF("wav_id", "content")
    val got = Multimodal
      .pcmFrameEnergy(df, "wav_id", "content", 4, 1000000L)
      .orderBy("wav_id", "frame")
      .select("wav_id", "frame", "n_samples", "sum_sq", "mean_sq",
        "active")
      .as[(Long, Long, Long, Long, Long, Boolean)].collect().toSeq
    def e(ss: Seq[Short]) = ss.map(s => s.toLong * s).sum
    val f0 = e(samples.slice(0, 4)); val f1 = e(samples.slice(4, 8))
    val f2 = e(samples.slice(8, 10))
    assert(got == Seq(
      (1L, 0L, 4L, f0, f0 / 4, f0 / 4 >= 1000000L),
      (1L, 1L, 4L, f1, f1 / 4, f1 / 4 >= 1000000L),
      (1L, 2L, 2L, f2, f2 / 2, f2 / 2 >= 1000000L)), got)
  }

  test("temperatureBudgets: T=1 is proportional, high T flattens, " +
      "budgets sum exactly, max group weighs 1e6") {
    import graft.operators.Curation
    val rows = Seq(("a", 8000L), ("b", 1000L), ("c", 1000L))
      .toDF("lang", "n")
    def run(tMilli: Long) = Curation
      .temperatureBudgets(rows, "lang", "n", 1000L, tMilli)
      .select("lang", "n_tokens", "w_micro", "budget_tokens")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val t1 = run(1000L)
    assert(t1("a")._3 == 1000000L, "largest group weighs exactly 1e6")
    assert(t1.values.map(_._4).sum == 1000L, "Hamilton total is exact")
    assert(t1("a")._4 == 800L && t1("b")._4 == 100L,
      s"T=1 is proportional: $t1")
    val flat = run(1000000L) // T=1000: near-uniform
    assert(flat.values.map(_._4).sum == 1000L)
    assert(flat("a")._4 < 400L && flat("b")._4 > 300L,
      s"high T must flatten the head: $flat")
    // T=2 reproduces the sqrt policy direction: between the two
    val t2 = run(2000L)
    assert(t2("a")._4 < t1("a")._4 && t2("a")._4 > flat("a")._4, t2)
    // frontier budgets: w_micro(1e6) x 15e12 tokens passes int64 —
    // the decimal(38,0) apportionment must stay exact, not overflow
    val big = Curation
      .temperatureBudgets(rows, "lang", "n", 15_000_000_000_000L, 1000L)
      .select("lang", "budget_tokens")
      .as[(String, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(big.values.sum == 15_000_000_000_000L, big.toString)
    // w_micro quantization (floor(exp·1e6)) shifts shares by ~1e-6
    // relative; the envelope claim is exactness of the APPORTIONMENT
    assert(math.abs(big("a") - 12_000_000_000_000L) < 100_000_000L,
      big.toString)
  }
}
