package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (the 100 TB story: one viral
  * key must not pin a single reducer).
  *
  * Two tools, composable:
  *  - AQE's skewedJoin handles moderate skew automatically (enabled
  *    by default in Spark 3.2+; nothing to do in code);
  *  - for pathological keys, `saltedJoin` shards the skewed (big)
  *    side into `salts` sub-keys deterministically and explodes the
  *    small side to every shard, so each reducer sees 1/salts of the
  *    hot key. The salt derives from a stable row fingerprint, not
  *    rand(), so re-runs produce identical partitioning (needed for
  *    deterministic retries and the engine's oracle tests).
  */
object Skew {

  /** Inner equi-join with salting: `big` is sharded on
    * (key, salt = hash(fingerprintCols) % salts); `small` is exploded
    * ×salts. Result is row-equal to big.join(small, key). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int, fingerprintCols: Seq[String]): DataFrame = {
    val saltCol = pmod(
      hash(fingerprintCols.map(col): _*), lit(salts))
    val b = big.withColumn("__salt", saltCol)
    val s = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    b.join(s, Seq(key, "__salt")).drop("__salt")
  }

  /** Hot-key skew report — the measurement that DECIDES whether a
    * join needs [[saltedJoin]]: top-k keys by row count with each
    * key's share of the table in integer millis (share_milli / 1000
    * ≈ the fraction of all rows one reducer would own if that key
    * landed alone on it; at 32 reducers anything above ~31 ‰ is a
    * straggler, at 1000 reducers ~1 ‰). One key-partitioned
    * aggregation; the grand total rides along as a broadcast 1-row
    * frame, never a global window. */
  def skewReport(df: DataFrame, key: String, topK: Int): DataFrame = {
    val counts = df.groupBy(col(key)).agg(count(lit(1)).as("n"))
    val tot = counts.agg(sum("n").as("tot"))
    counts.crossJoin(broadcast(tot))
      .select(col(key), col("n"),
        expr("n * 1000 div tot").as("share_milli"))
      .orderBy(col("n").desc, col(key)).limit(topK)
  }
}
