package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.expressions.{BloomMemberExpr, BpeApplyExpr, CmsCountersAgg, DotProductFloat, HilbertIndexExpr, HilbertNdExpr, HllRegistersAgg, HmacSha256Expr, MinHashSigExpr, MinHashTextExpr, JpegDimsExpr, Mp4MetaExpr, NfcNormalizeExpr, QualityPackExpr, RollingFpArray, ShingleHashesExpr, ShinglePosHashesExpr, ShinglesExpr, SimHashExpr}

/** Session extension registering the engine's native expressions —
  * enabled with `spark.sql.extensions=graft.plans.GraftExtensions`
  * (set by Verify/Bench/tests). Functions registered here are
  * available to SQL and to `call_function` from the DataFrame API.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProductFloat].getName, "graft_dot"),
      (children: Seq[Expression]) =>
        DotProductFloat(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_rolling_fp"),
      new ExpressionInfo(classOf[RollingFpArray].getName, "graft_rolling_fp"),
      (children: Seq[Expression]) => RollingFpArray(children(0))))
    ext.injectFunction((
      new FunctionIdentifier("graft_minhash_text"),
      new ExpressionInfo(classOf[MinHashTextExpr].getName,
        "graft_minhash_text"),
      (children: Seq[Expression]) =>
        MinHashTextExpr(children(0), children(1), children(2))))
    ext.injectFunction((
      new FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[ShinglesExpr].getName, "graft_shingles"),
      (children: Seq[Expression]) =>
        ShinglesExpr(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHashExpr].getName, "graft_simhash"),
      (children: Seq[Expression]) =>
        SimHashExpr(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSigExpr].getName, "graft_minhash"),
      (children: Seq[Expression]) =>
        MinHashSigExpr(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashesExpr].getName,
        "graft_shingle_hashes"),
      (children: Seq[Expression]) =>
        ShingleHashesExpr(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_bloom_member"),
      new ExpressionInfo(classOf[BloomMemberExpr].getName,
        "graft_bloom_member"),
      (children: Seq[Expression]) =>
        BloomMemberExpr(children(0), children(1), children(2),
          children(3))))
    ext.injectFunction((
      new FunctionIdentifier("graft_quality"),
      new ExpressionInfo(classOf[QualityPackExpr].getName, "graft_quality"),
      (children: Seq[Expression]) => QualityPackExpr(children(0))))
    ext.injectFunction((
      new FunctionIdentifier("graft_bpe"),
      new ExpressionInfo(classOf[BpeApplyExpr].getName, "graft_bpe"),
      (children: Seq[Expression]) =>
        BpeApplyExpr(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_hll_regs"),
      new ExpressionInfo(classOf[HllRegistersAgg].getName,
        "graft_hll_regs"),
      (children: Seq[Expression]) =>
        HllRegistersAgg(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_log_hist"),
      new ExpressionInfo(
        classOf[graft.expressions.LogHistAgg].getName,
        "graft_log_hist"),
      (children: Seq[Expression]) =>
        graft.expressions.LogHistAgg(children(0))))
    ext.injectFunction((
      new FunctionIdentifier("graft_shingle_pos_hashes"),
      new ExpressionInfo(classOf[ShinglePosHashesExpr].getName,
        "graft_shingle_pos_hashes"),
      (children: Seq[Expression]) =>
        ShinglePosHashesExpr(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_cms"),
      new ExpressionInfo(classOf[CmsCountersAgg].getName, "graft_cms"),
      (children: Seq[Expression]) =>
        CmsCountersAgg(children(0), children(1), children(2))))
    ext.injectFunction((
      new FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[NfcNormalizeExpr].getName, "graft_nfc"),
      (children: Seq[Expression]) => NfcNormalizeExpr(children(0))))
    ext.injectFunction((
      new FunctionIdentifier("graft_hmac_sha256"),
      new ExpressionInfo(classOf[HmacSha256Expr].getName,
        "graft_hmac_sha256"),
      (children: Seq[Expression]) =>
        HmacSha256Expr(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_jpeg_dims"),
      new ExpressionInfo(classOf[JpegDimsExpr].getName,
        "graft_jpeg_dims"),
      (children: Seq[Expression]) => JpegDimsExpr(children(0))))
    ext.injectFunction((
      new FunctionIdentifier("graft_mp4_meta"),
      new ExpressionInfo(classOf[Mp4MetaExpr].getName,
        "graft_mp4_meta"),
      (children: Seq[Expression]) => Mp4MetaExpr(children(0))))
    ext.injectFunction((
      new FunctionIdentifier("graft_hilbert"),
      new ExpressionInfo(classOf[HilbertIndexExpr].getName,
        "graft_hilbert"),
      (children: Seq[Expression]) => {
        require(children.size == 3,
          "graft_hilbert(x, y, bits) takes exactly three arguments")
        val bits = children(2) match {
          case org.apache.spark.sql.catalyst.expressions
              .Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_hilbert bits must be an integer literal: $other")
        }
        HilbertIndexExpr(children(0), children(1), bits)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_hilbert_nd"),
      new ExpressionInfo(classOf[HilbertNdExpr].getName,
        "graft_hilbert_nd"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          "graft_hilbert_nd(coords, bits) takes exactly two arguments")
        val bits = children(1) match {
          case org.apache.spark.sql.catalyst.expressions
              .Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_hilbert_nd bits must be an integer literal: $other")
        }
        HilbertNdExpr(children(0), bits)
      }))
    ext.injectOptimizerRule(_ => NfcIdempotence)
  }
}

/** Optimizer rule: NFC normalization is idempotent (UAX #15 —
  * normalize(normalize(x)) == normalize(x)), so nested graft_nfc
  * calls collapse to one. Composed pipelines hit this constantly: an
  * ingest stage normalizes defensively, a dedup stage normalizes its
  * key again — without the rule every row pays the normalizer twice.
  * The engine's one algebraic-rewrite example of the
  * injectOptimizerRule seam (PlanSpec pins the collapse). */
object NfcIdempotence extends org.apache.spark.sql.catalyst.rules.Rule[
    org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  override def apply(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    plan.transformAllExpressions {
      case NfcNormalizeExpr(inner: NfcNormalizeExpr) => inner
    }
}
