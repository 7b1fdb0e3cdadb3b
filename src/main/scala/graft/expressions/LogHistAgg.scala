package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Shared fixed-frame LOG-SCALE histogram kernel (`graft_log_hist`)
  * — the K7 mergeable-histogram law applied to column STATISTICS:
  * every int64-encoded value lands in one of 128 sign-mirrored
  * power-of-two buckets (bucket 64 = zero, 65..127 positive by bit
  * length, 63..1 negative, 0 = Long.MinValue), so per-file sketches
  * computed YEARS apart merge by plain vector addition — no shared
  * [lo, width) frame to negotiate, the property that makes the
  * `#ndv=` line's histogram field pure manifest arithmetic under
  * compaction. The scan folds surviving files' counts and
  * synthesizes Spark's equi-height CBO histogram from the merged
  * mass ([[graft.sources.ManifestDataSource]]): skewed join keys
  * stop estimating uniform. */
object LogHist {
  val B = 128

  def bucketOf(v: Long): Int =
    if (v == 0L) 64
    else if (v == Long.MinValue) 0
    else if (v > 0L) 64 + (64 - java.lang.Long.numberOfLeadingZeros(v))
    else 64 - (64 - java.lang.Long.numberOfLeadingZeros(-v))

  /** Inclusive value range covered by bucket `b`, as doubles (the
    * shape CBO histograms carry). */
  def loOf(b: Int): Double =
    if (b == 64) 0.0
    else if (b > 64) Math.pow(2.0, (b - 65).toDouble)
    else if (b == 0) Long.MinValue.toDouble
    else -(Math.pow(2.0, (64 - b).toDouble) - 1.0)

  def hiOf(b: Int): Double =
    if (b == 64) 0.0
    else if (b > 64) Math.pow(2.0, (b - 64).toDouble) - 1.0
    else if (b == 0) Long.MinValue.toDouble
    else -Math.pow(2.0, (63 - b).toDouble)

  /** Sparse `idx:count` encoding of a counts vector ("" = empty). */
  def encode(counts: Array[Long]): String = {
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < counts.length) {
      if (counts(i) != 0L) {
        if (sb.length > 0) sb.append(',')
        sb.append(i).append(':').append(counts(i))
      }
      i += 1
    }
    sb.toString
  }

  def decode(s: String): Array[Long] = {
    val out = new Array[Long](B)
    if (s.nonEmpty) s.split(',').foreach { pair =>
      val i = pair.indexOf(':')
      out(pair.substring(0, i).toInt) += pair.substring(i + 1).toLong
    }
    out
  }

  /** Merge = vector add (the K7 same-frame law; the frame is fixed
    * by construction). */
  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < B) { a(i) += b(i); i += 1 }
    a
  }

  /** Synthesize an equi-height histogram (numBins bins of ~equal
    * row mass) from merged log-bucket counts, clamped to the known
    * [min, max] — the catalyst `Histogram` shape CBO estimation
    * consumes. Bin boundaries interpolate linearly INSIDE a log
    * bucket (uniform-within-bucket assumption); per-bin NDV is the
    * global NDV apportioned by mass. Returns (height, bins) or None
    * when there is no mass. */
  def equiHeight(counts: Array[Long], numBins: Int, globalMin: Double,
      globalMax: Double, globalNdv: Long)
      : Option[(Double, Seq[(Double, Double, Long)])] = {
    val total = counts.sum
    if (total <= 0L || numBins <= 0) return None
    val height = total.toDouble / numBins
    val bins = scala.collection.mutable
      .ArrayBuffer.empty[(Double, Double, Long)]
    var lo = globalMin
    var seen = 0.0 // cumulative mass consumed
    var target = height
    var b = 0
    var inBucket = 0.0 // mass already consumed from bucket b
    while (bins.length < numBins - 1 && b < B) {
      val c = counts(b).toDouble
      if (c - inBucket <= 0.0 || seen + (c - inBucket) < target) {
        seen += c - inBucket
        inBucket = 0.0
        b += 1
      } else {
        // the cut lands inside bucket b: interpolate
        val need = target - seen
        inBucket += need
        seen = target
        target += height
        val bLo = Math.max(loOf(b), globalMin)
        val bHi = Math.min(hiOf(b), globalMax)
        val frac = if (c <= 0.0) 0.0 else inBucket / c
        val cut = bLo + (bHi - bLo) * frac
        val ndv = Math.max(1L,
          Math.round(globalNdv.toDouble / numBins))
        bins += ((lo, cut, ndv))
        lo = cut
      }
    }
    val lastNdv = Math.max(1L,
      Math.round(globalNdv.toDouble / numBins))
    bins += ((lo, globalMax, lastNdv))
    Some((height, bins.toSeq))
  }
}

/** One-pass log-histogram aggregation over the canonical int64
  * encoding — [[LogHist]]'s distributed builder, the exact sibling
  * of [[HllRegistersAgg]]: the buffer is the 128-long counts vector,
  * partial merge is vector addition, and the exchange carries ONE
  * kilobyte-scale buffer per partition regardless of input size.
  * NULLs contribute nothing (the `#ndv=` line's null count is
  * tracked separately). */
case class LogHistAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with ImplicitCastInputTypes {

  override def inputTypes = Seq(LongType)

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, false)
  override def prettyName: String = "graft_log_hist"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](LogHist.B)

  override def update(buffer: Array[Long],
      input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null)
      buffer(LogHist.bucketOf(v.asInstanceOf[Long])) += 1L
    buffer
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    LogHist.merge(a, b)

  override def eval(buffer: Array[Long]): Any =
    new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buffer.length * 8)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(LogHist.B)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(
      newOffset: Int): LogHistAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(
      newOffset: Int): LogHistAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): LogHistAgg =
    copy(child = newChildren(0))
}
