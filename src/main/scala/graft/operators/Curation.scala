package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-composition operators: rebalance a skewed corpus across a
  * grouping dimension (language, source domain) before training. The
  * head group of a web corpus can be 100× the tail; training straight
  * off raw counts starves the tail, and a hard uniform cap wastes the
  * head. The standard smoothing is temperature sampling — keep
  * budgets proportional to `n_g^(1/T)` — which at T=2 (the common
  * multilingual setting) is sqrt-proportional allocation.
  *
  * Reference context: the reference corpus is single-source and needs
  * no rebalancing (its per-collection counts live in
  * /root/reference/utils/importer/verify_collections.py:34-60); this
  * operator family exists for the 100 TB multi-source regime, per
  * SURVEY.md §2.12.
  *
  * Everything is exact-integer so the result is oracle-checkable:
  * isqrt = floor(sqrt(n)) is exact for counts below 2^52 (IEEE-754
  * sqrt is correctly rounded, and every such integer is exactly
  * representable), and the budget share is integer division.
  */
object Curation {

  /** Per-group keep budgets under sqrt-temperature (T=2) rebalancing:
    * `budget_g = totalBudget * isqrt(n_g) div sum_h isqrt(n_h)`.
    * Head groups are down-weighted, tail groups keep proportionally
    * more. One count shuffle over the corpus; the result is
    * group-cardinality-sized (a broadcastable dimension table at any
    * corpus scale — languages/domains number thousands, not
    * billions). */
  def sqrtBudgets(df: DataFrame, groupCol: String,
      totalBudget: Long): DataFrame = {
    require(totalBudget > 0, s"totalBudget must be positive: $totalBudget")
    val counts = df.groupBy(groupCol).agg(count(lit(1)).as("n_docs"))
      .withColumn("isq",
        floor(sqrt(col("n_docs").cast("double"))).cast("long"))
    val tot = counts.agg(sum("isq").as("isq_tot"))
    counts.crossJoin(broadcast(tot))
      .withColumn("budget", expr(s"(${totalBudget}L * isq) div isq_tot"))
      .drop("isq_tot")
  }

  /** Apply step of [[sqrtBudgets]]: keep the first `budget_g` rows of
    * each group in `orderCol` order (pass a quality rank to keep
    * best-first; any unique column makes the cut deterministic). The
    * budget table broadcasts back onto the corpus; the only corpus-
    * wide movement is the one window shuffle on the group key. A
    * group whose budget exceeds its size keeps every row — floor
    * rounding means kept totals come in at or just under
    * `totalBudget`. */
  def rebalanceKeep(df: DataFrame, groupCol: String, orderCol: String,
      totalBudget: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(orderCol)
    df.withColumn("__rn", row_number().over(w))
      .join(broadcast(
        sqrtBudgets(df, groupCol, totalBudget).select(groupCol, "budget")),
        Seq(groupCol))
      .filter(col("__rn") <= col("budget"))
      .drop("__rn", "budget")
  }
}
