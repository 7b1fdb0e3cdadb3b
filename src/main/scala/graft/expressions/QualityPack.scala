package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel for the fused per-document quality signals (see
  * operators.TextAnalysis.qualitySignals): token-distribution entropy
  * and bigram repetition mass in ONE pass over the token array.
  *
  * Bit-parity contract with the relational formulation it replaces
  * (explode → groupBy(id, term) → groupBy(id) + ordered HOF fold):
  *  - the entropy fold visits term counts in ascending binary
  *    UTF8String order — exactly `sort_array(collect_list(struct(term,
  *    c)))`'s order (nulls first);
  *  - each step computes `acc - q * ln(q)` with q = (double)c/(double)n
  *    and `java.lang.StrictMath.log` — the function Spark's `log`
  *    expression generates — so the pre-floor double is bit-identical;
  *  - bigrams are the space-joined 2-token windows of
  *    functions.shingles (null tokens skipped with their separator,
  *    like array_join); repetition = max*1000 div total in exact
  *    integer arithmetic.
  */
object QualityPack {

  /** (entropy_milli, rep_milli) of one token array. Empty input gives
    * (0, 0) — matching the anchored left-join + coalesce of the
    * relational shape, where a tokenless doc has no exploded rows. */
  def qualityPack(arr: ArrayData): ArrayData = {
    val m = arr.numElements()
    // --- term counts (entropy side) ---
    val terms = new java.util.TreeMap[UTF8String, Array[Long]]()
    var nullTerms = 0L
    var i = 0
    while (i < m) {
      if (arr.isNullAt(i)) nullTerms += 1L
      else {
        val t = arr.getUTF8String(i)
        val c = terms.get(t)
        if (c == null) terms.put(t, Array(1L)) else c(0) += 1L
      }
      i += 1
    }
    val n = m.toLong
    var entropy = 0.0d
    if (n > 0L) {
      // sort_array places null structs' term group first
      if (nullTerms > 0L) {
        val q = nullTerms.toDouble / n.toDouble
        entropy = entropy - q * java.lang.StrictMath.log(q)
      }
      val it = terms.values().iterator()
      while (it.hasNext) {
        val q = it.next()(0).toDouble / n.toDouble
        entropy = entropy - q * java.lang.StrictMath.log(q)
      }
    }
    val entropyMilli = java.lang.Math.floor(entropy * 1000.0d).toLong
    // --- bigram counts (repetition side) ---
    var repMilli = 0L
    if (m >= 2) {
      val space = UTF8String.fromString(" ")
      val bigrams = new java.util.HashMap[UTF8String, Array[Long]]()
      i = 0
      while (i <= m - 2) {
        val a = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
        val b = if (arr.isNullAt(i + 1)) null else arr.getUTF8String(i + 1)
        val bg = UTF8String.concatWs(space, a, b)
        val c = bigrams.get(bg)
        if (c == null) bigrams.put(bg, Array(1L)) else c(0) += 1L
        i += 1
      }
      var mx = 0L
      val tot = (m - 1).toLong
      val it = bigrams.values().iterator()
      while (it.hasNext) {
        val c = it.next()(0)
        if (c > mx) mx = c
      }
      repMilli = mx * 1000L / tot
    }
    new GenericArrayData(Array[Any](entropyMilli, repMilli))
  }
}

/** Native `graft_quality(array<string>) -> array<long>`: both
  * Gopher-style quality signals — [entropy_milli, rep_milli] — as ONE
  * codegen'd call per row. The relational formulation pays two
  * corpus-wide explodes, four shuffled aggregations, two join-backs
  * and an interpreted per-element fold for what is a pure
  * per-document computation; this is a narrow map (oracle-checked by
  * q_t_quality_signals, parity-spec'd against the HOF shape). */
case class QualityPackExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_quality requires array<string>, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_quality"

  override protected def nullSafeEval(a: Any): Any =
    QualityPack.qualityPack(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.QualityPack.qualityPack($a);")

  override protected def withNewChildInternal(newChild: Expression)
      : QualityPackExpr = copy(child = newChild)
}
