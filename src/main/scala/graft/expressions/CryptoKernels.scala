package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native `graft_hmac_sha256(key binary, value binary) -> string`
  * (lowercase hex) — keyed pseudonymization for governed pipelines:
  * replace a PII column with its HMAC under a secret key and joins
  * keep working (same value → same token, cross-table), while the
  * un-keyed rainbow-table attack a bare hash invites does not (RFC
  * 2104 HMAC, not sha256(key||value) — the latter is
  * length-extension-forgeable). The reference stores emails and
  * customer names in the clear (utils/importer/backup_before_fix.sql
  * DDL); this is the missing tokenization step between that store
  * and a training corpus. Graded against the RFC 4231 test vectors.
  *
  * Per-row cost is two SHA-256 compressions; the expression is a
  * narrow codegen'd map, so tokenizing a 100 TB column is a scan. */
case class HmacSha256Expr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"graft_hmac_sha256 requires (binary, binary), got ($a, $b)")
    }

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_hmac_sha256"

  override protected def nullSafeEval(k: Any, v: Any): Any =
    UTF8String.fromString(CryptoKernels.hmacSha256Hex(
      k.asInstanceOf[Array[Byte]], v.asInstanceOf[Array[Byte]]))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (k, v) =>
      s"${ev.value} = org.apache.spark.unsafe.types.UTF8String" +
        s".fromString(graft.expressions.CryptoKernels" +
        s".hmacSha256Hex($k, $v));")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): HmacSha256Expr =
    copy(left = newLeft, right = newRight)
}

/** Static forwarders for generated code (same pattern as [[Md5Fold]]).
  * One `Mac` per thread, re-keyed per call — `Mac.getInstance` per row
  * would dominate the two compressions it wraps. */
object CryptoKernels {

  private val macs =
    java.lang.ThreadLocal.withInitial[javax.crypto.Mac](() =>
      javax.crypto.Mac.getInstance("HmacSHA256"))

  private val HexChars = "0123456789abcdef".toCharArray

  def hmacSha256Hex(key: Array[Byte], value: Array[Byte]): String = {
    val mac = macs.get()
    mac.init(new javax.crypto.spec.SecretKeySpec(key, "HmacSHA256"))
    val d = mac.doFinal(value)
    val out = new Array[Char](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(2 * i) = HexChars((d(i) >> 4) & 0xf)
      out(2 * i + 1) = HexChars(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }
}
