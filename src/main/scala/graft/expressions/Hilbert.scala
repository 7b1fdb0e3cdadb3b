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
