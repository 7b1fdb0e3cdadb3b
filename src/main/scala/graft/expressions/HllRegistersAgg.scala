package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass HyperLogLog register aggregation (`graft_hll_regs`) — the
  * custom-AGGREGATE tier of the extension surface (the scalar
  * kernels are BinaryExpression/UnaryExpression; this is a
  * TypedImperativeAggregate with partial merge).
  *
  * Scale rationale: the declarative register build
  * ([[graft.operators.Sketches.hllRegisters]]) needs a DISTINCT of
  * every salted hash before its groupBy — at 100 TB that shuffles the
  * full distinct key set. This aggregate folds rows into an m-byte
  * register buffer per partition and the exchange carries ONE buffer
  * per partition (m bytes, merge = bytewise max) — sketch-sized
  * traffic regardless of input size, the property the whole sketch
  * layer exists for.
  *
  * Register semantics are BIT-IDENTICAL to the declarative build
  * (parity spec'd): h = first 15 md5 hex digits of the input string
  * (= top 60 bits of the digest, [[Md5Fold.hash60]]), bucket = h % m,
  * rho = (60 - log2(m)) + 1 - bitlen(h div m), all-zero quotient
  * scores vBits + 1. Input arrives pre-salted/stringified so cast
  * semantics stay in Catalyst, not here. `m` must be a foldable
  * power-of-two literal. */
case class HllRegistersAgg(
    child: Expression,
    mExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]]
  with ImplicitCastInputTypes {

  // analysis-time contract: the update path blind-casts to
  // UTF8String, so a non-string child must fail in the analyzer (or
  // implicitly cast), never as an executor-side ClassCastException
  // (type ascription omitted: Seq[AbstractDataType] is private[sql])
  override def inputTypes = Seq(StringType, IntegerType)

  private lazy val m: Int = {
    require(mExpr.foldable, "graft_hll_regs: m must be a literal")
    val v = mExpr.eval().asInstanceOf[Number].intValue()
    require(v > 0 && (v & (v - 1)) == 0,
      s"graft_hll_regs: m must be a power of two: $v")
    v
  }
  private lazy val vBits: Int = 60 - Integer.numberOfTrailingZeros(m)

  override def children: Seq[Expression] = Seq(child, mExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(IntegerType, false)
  override def prettyName: String = "graft_hll_regs"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buffer: Array[Byte],
      input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = Md5Fold.hash60(v.asInstanceOf[UTF8String].getBytes)
      val bucket = (h % m).toInt
      val q = h / m
      val rho =
        if (q == 0L) vBits + 1
        else vBits + 1 - (64 - java.lang.Long.numberOfLeadingZeros(q))
      if (rho > buffer(bucket)) buffer(bucket) = rho.toByte
    }
    buffer
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) {
      if (b(i) > a(i)) a(i) = b(i)
      i += 1
    }
    a
  }

  override def eval(buffer: Array[Byte]): Any =
    new GenericArrayData(buffer.map(_.toInt))

  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(storage: Array[Byte]): Array[Byte] = storage

  override def withNewMutableAggBufferOffset(
      newOffset: Int): HllRegistersAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(
      newOffset: Int): HllRegistersAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllRegistersAgg =
    copy(child = newChildren(0), mExpr = newChildren(1))
}
