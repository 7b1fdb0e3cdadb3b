package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions._

/** Corpus sharding for training-data pipelines: pack documents into
  * shards of roughly `tokenBudget` tokens each.
  *
  * Scale posture: a single global greedy pack would need a
  * total-order running sum — one partition, one core, the classic
  * scale-killer. Instead documents are first spread across
  * `buckets` deterministic hash buckets (md5-derived, reproducible),
  * then packed GREEDILY WITHIN each bucket by a running token sum
  * over the (bucket, id) order. The window partitions by bucket, so
  * the plan is one shuffle on the bucket key and each bucket packs
  * independently — shard sizes still land within one document of the
  * budget, and the layout is bit-reproducible across engines.
  */
object Sharding {

  /** Assign (bucket, shard) to every row. Shard k within a bucket
    * holds the maximal consecutive run of documents (in id order)
    * whose cumulative token count before each document is <
    * (k+1) * tokenBudget: shard = floor(exclusive-cumsum / budget).
    * A document larger than the budget gets a shard of its own. */
  def packByTokenBudget(df: DataFrame, idCol: String, tokensCol: String,
      tokenBudget: Long, buckets: Int): DataFrame = {
    val w = Window.partitionBy(col("bucket")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("bucket", hashBucket(col(idCol), buckets, "shard"))
      .withColumn("__cum", sum(col(tokensCol)).over(w))
      .withColumn("shard",
        floor((col("__cum") - col(tokensCol)) / tokenBudget).cast("long"))
      .drop("__cum")
  }

  /** Per-shard report: document count and token total — the sanity
    * check that packing respects the budget. */
  def shardStats(packed: DataFrame, tokensCol: String): DataFrame =
    packed.groupBy("bucket", "shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(col(tokensCol)).as("tokens"))

  /** Sliding-window chunking for embedding generation / context
    * packing: split each document's token stream into windows of
    * `width` tokens advancing by `stride`. Returns one row per chunk
    * (id, chunk_id, n_tokens, chunk_md5) — the md5 stands in for the
    * chunk text so downstream stages (and the oracle compare) move
    * fixed-width values, not repeated token payloads.
    *
    * Scale shape: narrow map only — tokenization, a sequence explode
    * (fan-out ~ len/stride per doc), a slice and a hash; no shuffle,
    * no state. Chunk boundaries are token-index arithmetic, so the
    * layout is deterministic and engine-independent. */
  def chunkByTokens(df: DataFrame, idCol: String, textCol: String,
      width: Int = 64, stride: Int = 32): DataFrame = {
    require(width > 0 && stride > 0, "width and stride must be positive")
    df.select(col(idCol), tokens(col(textCol)).as("t"))
      .filter(size(col("t")) > 0)
      .select(col(idCol), col("t"),
        explode(sequence(lit(0),
          size(col("t")) - 1,
          lit(stride))).as("s"))
      .select(col(idCol),
        expr(s"s div $stride").as("chunk_id"),
        expr(s"slice(t, s + 1, $width)").as("ct"))
      .select(col(idCol), col("chunk_id"),
        size(col("ct")).cast("long")
          .as("n_tokens"),
        md5(array_join(col("ct"), " ")).as("chunk_md5"))
  }
}
