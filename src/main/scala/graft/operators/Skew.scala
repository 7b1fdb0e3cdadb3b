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
}
