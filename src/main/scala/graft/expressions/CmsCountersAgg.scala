package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass count-min-sketch counter aggregation (`graft_cms`) — the
  * sibling of [[HllRegistersAgg]] for the CMS family.
  *
  * Scale rationale: the declarative build
  * ([[graft.operators.Sketches.cmsBuild]]) explodes every row into
  * `depth` (r, p) rows before the counting aggregate — map-side
  * combine bounds the SHUFFLE at width×depth counters per partition,
  * but the row stream through the hash aggregate is depth× the scan.
  * This aggregate folds each input row into a width×depth long buffer
  * with plain array increments (no per-row row expansion, no hash
  * probe per (r, p)), and the exchange carries one buffer per
  * partition; merge is counter-wise sum.
  *
  * Counter semantics are BIT-IDENTICAL to the declarative build
  * (parity spec'd): one md5 digest per row via [[Md5Fold.hash60Pair]]
  * (= hash60/hash60b hex-digit ranges), Kirsch-Mitzenmacher positions
  * p_r = (h1 + r·h2) mod width. Input arrives pre-salted/stringified
  * so cast semantics stay in Catalyst. `width`/`depth` must be
  * foldable literals; depth ≤ 7 keeps (h1 + r·h2) inside the 63-bit
  * positive range — the same bound the declarative long arithmetic
  * (and the BIGINT oracle) lives under. */
case class CmsCountersAgg(
    child: Expression,
    widthExpr: Expression,
    depthExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with ImplicitCastInputTypes {

  override def inputTypes = Seq(StringType, IntegerType, IntegerType)

  private lazy val width: Int = {
    require(widthExpr.foldable, "graft_cms: width must be a literal")
    val v = widthExpr.eval().asInstanceOf[Number].intValue()
    require(v > 0, s"graft_cms: width must be positive: $v")
    v
  }
  private lazy val depth: Int = {
    require(depthExpr.foldable, "graft_cms: depth must be a literal")
    val v = depthExpr.eval().asInstanceOf[Number].intValue()
    require(v > 0 && v <= 7,
      s"graft_cms: depth must be in [1,7] (h1 + r*h2 must stay inside " +
        s"63-bit positive longs, the declarative build's own bound): $v")
    v
  }

  override def children: Seq[Expression] =
    Seq(child, widthExpr, depthExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, false)
  override def prettyName: String = "graft_cms"

  override def createAggregationBuffer(): Array[Long] = {
    // loud product bound: a 16M-counter sketch is 128 MB PER BUFFER —
    // that is a config error, not a sketch
    require(width.toLong * depth <= (1L << 22),
      s"graft_cms: width*depth = ${width.toLong * depth} counters " +
        "exceeds 2^22 — a CMS that big defeats its purpose; widen " +
        "the error bound or shard the key space")
    new Array[Long](width * depth)
  }

  override def update(buffer: Array[Long],
      input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val (h1, h2) =
        Md5Fold.hash60Pair(v.asInstanceOf[UTF8String].getBytes)
      var r = 0
      while (r < depth) {
        val p = ((h1 + r.toLong * h2) % width).toInt
        buffer(r * width + p) += 1L
        r += 1
      }
    }
    buffer
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buffer: Array[Long]): Any =
    new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buffer.length * 8)
    bb.asLongBuffer().put(buffer)
    bb.array()
  }
  override def deserialize(storage: Array[Byte]): Array[Long] = {
    val out = new Array[Long](storage.length / 8)
    java.nio.ByteBuffer.wrap(storage).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(
      newOffset: Int): CmsCountersAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(
      newOffset: Int): CmsCountersAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmsCountersAgg =
    copy(child = newChildren(0), widthExpr = newChildren(1),
      depthExpr = newChildren(2))
}
