package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Native `graft_hilbert(x, y)` -> the Hilbert-curve index of a
  * 2^bits × 2^bits grid cell — the space-filling order whose
  * neighbors stay neighbors (Hilbert 1891; the xy→d walk of the
  * classic iterative formulation). Z-order (Morton,
  * [[graft.operators.Layout.zOrderValue]]) has long diagonal jumps
  * at quadrant seams; the Hilbert curve's per-level rotations remove
  * them, which is why it tightens file zone min/max ranges further
  * on the same data — Databricks' liquid clustering and Iceberg's
  * hilbert ordering ship it for exactly that reason.
  *
  * The per-level rotation makes each level's (x, y) depend on the
  * previous level's — an UNROLLED Column expression would double its
  * tree per level (2^bits nodes), so this is the native-expression
  * case: one static per-row loop over `bits` levels, inside
  * whole-stage codegen, no UDF. Callers clamp/bucket both
  * dimensions into [0, 2^bits) first, exactly as for the Morton
  * value; out-of-range inputs fail loudly rather than fold into a
  * wrong cell. */
case class HilbertIndexExpr(left: Expression, right: Expression,
    bits: Int) extends BinaryExpression {
  require(bits > 0 && bits <= 31, s"bits must be in [1, 31]: $bits")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"graft_hilbert requires (bigint, bigint), got ($a, $b)")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hilbert"

  override protected def nullSafeEval(x: Any, y: Any): Any =
    Hilbert.index(x.asInstanceOf[Long], y.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) =>
      s"graft.expressions.Hilbert.index($x, $y, $bits)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): HilbertIndexExpr =
    copy(left = newLeft, right = newRight)
}

/** Native `graft_hilbert_nd(array<bigint>, bits)` -> the Hilbert
  * index of an n-dimensional grid cell (Skilling 2004, "Programming
  * the Hilbert curve", AIP Conf. Proc. 707, 381-387) — real tables
  * cluster 3-4 columns (ingest date + business key + tenant), and
  * the 2-D walk doesn't compose: an n-D curve needs the per-level
  * reflect/exchange across ALL axes. Skilling's transpose
  * formulation is the standard compact n-D form: axes → "transpose"
  * bit-planes (inverse-undo + Gray code), then one bit interleave.
  * Same native-expression rationale as [[HilbertIndexExpr]]: the
  * per-level dependency would double an unrolled Column tree, so the
  * walk is a static per-row loop inside whole-stage codegen.
  * Constraints: 2 ≤ dims, dims·bits ≤ 62 (the index must fit a
  * signed long), every element in [0, 2^bits), no NULL elements —
  * all violations fail loudly rather than fold into a wrong cell. */
case class HilbertNdExpr(child: Expression, bits: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(bits > 0 && bits <= 31, s"bits must be in [1, 31]: $bits")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_hilbert_nd requires array<bigint>, got $other")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hilbert_nd"

  override protected def nullSafeEval(a: Any): Any =
    Hilbert.indexNdData(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      bits)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.expressions.Hilbert.indexNdData($a, $bits)")

  override protected def withNewChildInternal(
      newChild: Expression): HilbertNdExpr = copy(child = newChild)
}

/** Static forwarder for generated code (the [[MediaHeaders]]
  * pattern). */
object Hilbert {

  /** Hilbert index of (x, y) on the 2^bits grid — the iterative
    * xy→d conversion: per level from the top bit down, take the
    * quadrant (rx, ry), advance d by s²·((3rx) xor ry) cells, and
    * rotate/reflect the remaining coordinates into the quadrant's
    * frame. Exact integer arithmetic; d spans [0, 4^bits). */
  /** Inverse walk d→(x, y) — decode a cluster key back to its grid
    * cell (zone-report debugging, range-boundary inspection). Exact
    * inverse of [[index]]: per level from the bottom up, read the
    * quadrant from d's two bits, apply the same rotate/reflect, and
    * offset. Spec'd as a full round-trip bijection. */
  def xy(d0: Long, bits: Int): (Long, Long) = {
    val n = 1L << bits
    if (d0 < 0 || d0 >= n * n)
      throw new IllegalArgumentException(
        s"hilbert index out of range [0, ${n * n}): $d0")
    var x = 0L
    var y = 0L
    var t = d0
    var s = 1L
    while (s < n) {
      val rx = 1L & (t / 2)
      val ry = 1L & (t ^ rx)
      if (ry == 0L) {
        if (rx == 1L) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t /= 4
      s <<= 1
    }
    (x, y)
  }

  /** Codegen entry: ArrayData → n-D Hilbert index, loud on NULL
    * elements (a NULL coordinate has no cell). */
  def indexNdData(a: org.apache.spark.sql.catalyst.util.ArrayData,
      bits: Int): Long = {
    val n = a.numElements()
    val coords = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i))
        throw new IllegalArgumentException(
          s"graft_hilbert_nd: NULL coordinate at position $i")
      coords(i) = a.getLong(i)
      i += 1
    }
    indexNd(coords, bits)
  }

  /** n-D Hilbert index of `coords0` on the (2^bits)^n grid —
    * Skilling's AxesToTranspose (inverse-undo per level, then Gray
    * encode) followed by MSB-first bit interleave of the transpose
    * planes. Exact integer arithmetic; d spans [0, 2^(n·bits)).
    * Inverse: [[axesNd]] (spec'd as a full round-trip bijection with
    * unit Manhattan steps). */
  def indexNd(coords0: Array[Long], bits: Int): Long = {
    val n = coords0.length
    if (n < 2)
      throw new IllegalArgumentException(
        s"hilbert_nd needs at least 2 dimensions: $n")
    if (n.toLong * bits > 62)
      throw new IllegalArgumentException(
        s"hilbert_nd: dims*bits must be <= 62 ($n*$bits)")
    val max = 1L << bits
    val x = java.util.Arrays.copyOf(coords0, n)
    var i = 0
    while (i < n) {
      if (x(i) < 0 || x(i) >= max)
        throw new IllegalArgumentException(
          s"hilbert_nd input out of range [0, $max): ${x(i)}")
      i += 1
    }
    // AxesToTranspose — inverse undo
    var q = 1L << (bits - 1)
    while (q > 1) {
      val p = q - 1
      i = 0
      while (i < n) {
        if ((x(i) & q) != 0) x(0) ^= p // invert
        else { // exchange low bits of x(0) and x(i)
          val t = (x(0) ^ x(i)) & p
          x(0) ^= t
          x(i) ^= t
        }
        i += 1
      }
      q >>= 1
    }
    // Gray encode
    i = 1
    while (i < n) { x(i) ^= x(i - 1); i += 1 }
    var t = 0L
    q = 1L << (bits - 1)
    while (q > 1) {
      if ((x(n - 1) & q) != 0) t ^= q - 1
      q >>= 1
    }
    i = 0
    while (i < n) { x(i) ^= t; i += 1 }
    // interleave the transpose MSB-first: bit b of axis i lands at
    // output position (b*n + (n-1-i)) from the top
    var d = 0L
    var b = bits - 1
    while (b >= 0) {
      i = 0
      while (i < n) {
        d = (d << 1) | ((x(i) >>> b) & 1L)
        i += 1
      }
      b -= 1
    }
    d
  }

  /** Inverse n-D walk d → coords (Skilling's TransposeToAxes after
    * de-interleaving) — zone-report debugging and the round-trip
    * spec's other half. */
  def axesNd(d: Long, dims: Int, bits: Int): Array[Long] = {
    if (dims < 2)
      throw new IllegalArgumentException(
        s"hilbert_nd needs at least 2 dimensions: $dims")
    if (dims.toLong * bits > 62)
      throw new IllegalArgumentException(
        s"hilbert_nd: dims*bits must be <= 62 ($dims*$bits)")
    if (d < 0 || (bits * dims < 62 && d >= (1L << (bits * dims))))
      throw new IllegalArgumentException(
        s"hilbert_nd index out of range: $d")
    val x = new Array[Long](dims)
    // de-interleave into the transpose planes
    var pos = dims * bits - 1
    var b = bits - 1
    while (b >= 0) {
      var i = 0
      while (i < dims) {
        x(i) |= ((d >>> pos) & 1L) << b
        pos -= 1
        i += 1
      }
      b -= 1
    }
    // TransposeToAxes — Gray decode
    var t = x(dims - 1) >> 1
    var i = dims - 1
    while (i > 0) { x(i) ^= x(i - 1); i -= 1 }
    x(0) ^= t
    // undo the inverse-undo, bottom level up
    val nBig = 2L << (bits - 1)
    var q = 2L
    while (q != nBig) {
      val p = q - 1
      i = dims - 1
      while (i >= 0) {
        if ((x(i) & q) != 0) x(0) ^= p
        else {
          val tt = (x(0) ^ x(i)) & p
          x(0) ^= tt
          x(i) ^= tt
        }
        i -= 1
      }
      q <<= 1
    }
    x
  }

  def index(x0: Long, y0: Long, bits: Int): Long = {
    val n = 1L << bits
    if (x0 < 0 || y0 < 0 || x0 >= n || y0 >= n)
      throw new IllegalArgumentException(
        s"hilbert input out of range [0, $n): ($x0, $y0)")
    var x = x0
    var y = y0
    var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        val (nx, ny) =
          if (rx == 1L) (s - 1 - y, s - 1 - x) else (y, x)
        x = nx
        y = ny
      }
      s >>= 1
    }
    d
  }
}
