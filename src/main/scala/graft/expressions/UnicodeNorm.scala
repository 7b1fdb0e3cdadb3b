package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native `graft_nfc(string) -> string`: Unicode NFC normalization
  * (canonical decomposition + canonical composition, UAX #15) — the
  * canonicalization step exact-dedup and join keys need on real crawl
  * text, where "é" arrives both precomposed (U+00E9) and decomposed
  * (U+0065 U+0301) and byte-equality silently misses the duplicate.
  * Spark ships no normalizer; this wraps the JDK's (ICU-equivalent
  * for the normalization forms, pinned by the Unicode stability
  * policy — normalization of assigned code points never changes
  * across versions), bit-compatible with the DuckDB oracle's
  * `nfc_normalize`. Codegen'd per row; a fast-path quick check inside
  * `Normalizer.normalize` makes already-NFC ASCII effectively free,
  * so the expression belongs in any ingest projection.
  *
  * Reference anchor: the reference lower-cases and trims import keys
  * (utils/importer/ETL.py name canonicalization) but has no Unicode
  * normalization — its pg backend compares bytes; on multilingual
  * corpus data the NFC step is the missing half of that contract.
  */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_nfc requires string, got $t")
  }

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_nfc"

  override protected def nullSafeEval(s: Any): Any =
    UTF8String.fromString(UnicodeNorm.nfc(s.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = org.apache.spark.unsafe.types.UTF8String" +
        s".fromString(graft.expressions.UnicodeNorm.nfc($s));")

  override protected def withNewChildInternal(newChild: Expression)
      : NfcNormalizeExpr = copy(child = newChild)
}

/** Static forwarder for generated code (same pattern as [[Md5Fold]]). */
object UnicodeNorm {
  def nfc(s: UTF8String): String =
    java.text.Normalizer.normalize(s.toString,
      java.text.Normalizer.Form.NFC)
}
