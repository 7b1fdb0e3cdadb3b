package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Native `graft_jpeg_dims(binary) -> array<long>` = [width, height],
  * or null when the bytes are not a parseable JPEG.
  *
  * JPEG stores its dimensions in a START-OF-FRAME segment at a
  * VARIABLE offset — fixed-offset substring/hex arithmetic (the
  * PNG/BMP/GIF technique in [[graft.operators.Multimodal.imageDims]])
  * cannot reach it; the parse is a bounded walk over segment headers:
  * each non-SOF segment declares its own length, so the walker hops
  * marker to marker (never decoding entropy data) until the first
  * SOFn. That loop is exactly what a native expression's static call
  * is for — the walk stays per-row inside whole-stage codegen, reads
  * only header bytes, and the hop count is bounded by the segment
  * count, not the file size. JPEG is the reference's actual image
  * format (the *.jpg OCR walk,
  * /root/reference/utils/details_translator/2_ocr_from_images.py:27-31);
  * round 7 moves it from the documented decode-boundary TODO into
  * expression space.
  *
  * Accepted SOF markers: C0–CF minus C4 (DHT), C8 (JPG extension),
  * CC (DAC) — the standard SOFn set, so baseline, progressive, and
  * arithmetic-coded files all parse. Truncated input, a missing
  * SOI, a zero/short segment length, or running off the end all
  * return null — never a misparse. */
case class JpegDimsExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_jpeg_dims requires binary, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_jpeg_dims"

  override protected def nullSafeEval(b: Any): Any = {
    val r = MediaHeaders.jpegDims(b.asInstanceOf[Array[Byte]])
    if (r == null) null else new GenericArrayData(r)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val r = ctx.freshName("dims")
      s"""
         |long[] $r = graft.expressions.MediaHeaders.jpegDims($b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($r); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : JpegDimsExpr = copy(child = newChild)
}

/** Native `graft_mp4_meta(binary) -> array<long>` =
  * [timescale, duration, duration_ms, n_tracks], or null when the
  * bytes are not a parseable ISO-BMFF (MP4/MOV) container.
  *
  * The container's movie header (mvhd) sits at a VARIABLE offset
  * behind the ftyp box and inside moov, and every box declares its
  * own 32- or 64-bit size — the same walk-the-headers shape as
  * [[JpegDimsExpr]]'s SOFn hunt, so the same native-expression
  * treatment: a bounded top-level box walk (hop count = box count,
  * never the file size; entropy/mdat bytes are skipped by size, not
  * read) finds moov, one child walk reads mvhd (v0 and v1 layouts)
  * and counts trak children. duration_ms = duration·1000 div
  * timescale (floor — exact integer law). This is the
  * duration/track metadata a video curation pipeline samples frames
  * by, extracted with zero codec involvement. Truncated boxes,
  * missing ftyp/moov/mvhd, or a zero timescale return null — never
  * a misparse. */
case class Mp4MetaExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_mp4_meta requires binary, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_mp4_meta"

  override protected def nullSafeEval(b: Any): Any = {
    val r = MediaHeaders.mp4Meta(b.asInstanceOf[Array[Byte]])
    if (r == null) null else new GenericArrayData(r)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val r = ctx.freshName("meta")
      s"""
         |long[] $r = graft.expressions.MediaHeaders.mp4Meta($b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($r); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : Mp4MetaExpr = copy(child = newChild)
}

/** Static forwarders for generated code (same pattern as [[Md5Fold]]). */
object MediaHeaders {

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff

  private def u32(b: Array[Byte], i: Int): Long =
    ((u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) |
      (u8(b, i + 2) << 8) | u8(b, i + 3)) & 0xffffffffL

  private def u64(b: Array[Byte], i: Int): Long =
    (u32(b, i) << 32) | u32(b, i + 4)

  private def boxType(b: Array[Byte], i: Int): String =
    if (i + 4 > b.length) ""
    else new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** [timescale, duration, duration_ms, n_tracks] from the moov/mvhd
    * box, or null. Handles 32-bit, 64-bit (size==1), and to-EOF
    * (size==0) box sizes, and mvhd versions 0 and 1. */
  def mp4Meta(b: Array[Byte]): Array[Long] = {
    if (b == null || b.length < 16) return null
    if (boxType(b, 4) != "ftyp") return null
    var pos = 0L
    var timescale = -1L
    var duration = -1L
    var tracks = 0L
    var sawMoov = false
    // one header per hop: size(4) type(4) [largesize(8)]
    def headerOf(p: Long, end: Long): (Long, Long, String) = {
      // returns (payload start, box end, type) or null-ish (-1 end)
      if (p + 8 > end) return (0L, -1L, "")
      val sz = u32(b, p.toInt)
      val tp = boxType(b, p.toInt + 4)
      if (sz == 1L) {
        if (p + 16 > end) return (0L, -1L, "")
        val large = u64(b, p.toInt + 8)
        if (large < 16 || p + large > end) return (0L, -1L, "")
        (p + 16, p + large, tp)
      } else if (sz == 0L) (p + 8, end, tp) // box extends to EOF
      else {
        if (sz < 8 || p + sz > end) return (0L, -1L, "")
        (p + 8, p + sz, tp)
      }
    }
    while (pos + 8 <= b.length) {
      val (payload, boxEnd, tp) = headerOf(pos, b.length.toLong)
      if (boxEnd < 0) return null
      if (tp == "moov") {
        sawMoov = true
        var cpos = payload
        while (cpos + 8 <= boxEnd) {
          val (cPayload, cEnd, ctp) = headerOf(cpos, boxEnd)
          if (cEnd < 0) return null
          if (ctp == "trak") tracks += 1
          else if (ctp == "mvhd") {
            val vp = cPayload.toInt
            if (vp + 4 > b.length) return null
            val version = u8(b, vp)
            if (version == 0) {
              if (vp + 20 > b.length) return null
              timescale = u32(b, vp + 12)
              duration = u32(b, vp + 16)
            } else if (version == 1) {
              if (vp + 32 > b.length) return null
              timescale = u32(b, vp + 20)
              duration = u64(b, vp + 24)
            } else return null
          }
          cpos = cEnd
        }
      }
      pos = boxEnd
    }
    if (!sawMoov || timescale <= 0 || duration < 0) return null
    Array(timescale, duration, duration * 1000L / timescale, tracks)
  }

  /** [width, height] from the first SOFn segment, or null. */
  def jpegDims(b: Array[Byte]): Array[Long] = {
    if (b == null || b.length < 4 ||
      u8(b, 0) != 0xff || u8(b, 1) != 0xd8) return null
    var pos = 2
    while (pos + 3 < b.length) {
      // resync: skip fill bytes; a marker is FF followed by non-FF
      if (u8(b, pos) != 0xff) return null
      var m = u8(b, pos + 1)
      while (m == 0xff && pos + 2 < b.length) { pos += 1; m = u8(b, pos + 1) }
      if (m == 0xd8) { pos += 2 }                   // nested SOI: skip
      else if (m >= 0xd0 && m <= 0xd9) { pos += 2 } // standalone RSTn/EOI
      else {
        if (pos + 3 >= b.length) return null
        val segLen = (u8(b, pos + 2) << 8) | u8(b, pos + 3)
        if (segLen < 2) return null
        val isSof = m >= 0xc0 && m <= 0xcf &&
          m != 0xc4 && m != 0xc8 && m != 0xcc
        if (isSof) {
          // segment: len(2) precision(1) height(2) width(2) ...
          if (pos + 8 >= b.length || segLen < 7) return null
          val h = (u8(b, pos + 5) << 8) | u8(b, pos + 6)
          val w = (u8(b, pos + 7) << 8) | u8(b, pos + 8)
          if (w == 0 || h == 0) return null
          return Array(w.toLong, h.toLong)
        }
        pos += 2 + segLen
      }
    }
    null
  }
}
