package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured-Streaming operators that also evaluate over batch
  * frames — the parity pair the specs assert. The graded oracle
  * queries run the batch formulation; StreamingSpec replays the same
  * rows through MemoryStream and checks the outputs agree.
  */
object StreamOps {

  /** Streaming first-occurrence dedup: watermark + dropDuplicates on
    * the key columns. State per live key only; the watermark bounds
    * state for keys whose event time has passed. Equivalent to
    * [[batchFirstPerKey]] when rows arrive in event-time order
    * (MemoryStream in the spec feeds them so; an out-of-order arrival
    * keeps the first ARRIVAL, the documented streaming semantics). */
  def streamingDedupFirst(stream: DataFrame, keyCols: Seq[String],
      tsCol: String, delay: String = "1 hour"): DataFrame =
    stream.withWatermark(tsCol, delay).dropDuplicates(keyCols)

  /** Batch formulation of first-event-per-key: the row with the
    * smallest (tsCol, tieCol) per key — one shuffle on the key, no
    * global sort. */
  def batchFirstPerKey(df: DataFrame, keyCols: Seq[String],
      tsCol: String, tieCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Stream a parquet directory into a date-partitioned parquet table
    * — the S11 partitioned sink driven by Structured Streaming. The
    * native parquet streaming sink is exactly-once by construction
    * (committed files are recorded in the sink's _spark_metadata log;
    * a replayed batch re-commits the same file names and readers see
    * each batch once), so this is the restart-safe way to lay out an
    * events firehose by day at 100 TB: each micro-batch appends only
    * to the partitions its rows touch, and downstream readers prune on
    * the partition column. `transform` runs on the streaming frame
    * (narrow ops only — it must stay append-mode); returns the output
    * path once the AvailableNow drain finishes. */
  def streamToPartitionedParquet(spark: org.apache.spark.sql.SparkSession,
      srcDir: String, schema: org.apache.spark.sql.types.StructType,
      transform: DataFrame => DataFrame, partitionCol: String,
      workDir: String): String = {
    val outDir = s"$workDir/table"
    val q = transform(spark.readStream.schema(schema).parquet(srcDir))
      .writeStream
      .format("parquet")
      .partitionBy(partitionCol)
      .option("path", outDir)
      .option("checkpointLocation", s"$workDir/checkpoint")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    outDir
  }

  /** Stream-static enrichment join: each micro-batch of the fact
    * stream equi-joins a (small, slowly-changing) static dimension,
    * broadcast to every executor. No streaming state at all — the
    * static side is re-resolved per micro-batch, which is also how
    * dimension updates become visible mid-stream. The identical
    * broadcast equi-join plan evaluates over a batch frame, so the
    * batch result is the oracle (parity spec'd in ScaleSpec). At
    * 100 TB this is THE enrichment shape: the firehose never
    * shuffles, only the dimension moves. */
  def streamStaticEnrich(facts: DataFrame, dim: DataFrame,
      keys: Seq[String]): DataFrame =
    facts.join(broadcast(dim), keys)

  /** Interval (stream-stream) join: left row matches right rows with
    * the same key whose timestamp lands in [leftTs, leftTs + window].
    * Over streaming inputs both sides carry watermarks, so the state
    * store can discard rows once the window has definitively passed —
    * the condition Structured Streaming requires to run a
    * stream-stream inner join with bounded state. Over batch inputs
    * the identical plan is a range-predicate equi-join. */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: String, rightTs: String, window: String,
      streaming: Boolean = false, delay: String = "1 hour"): DataFrame = {
    val l0 = left.select(col(keyCol).as("k"), col(leftTs).as("l_ts"),
      col("*")).drop(keyCol, leftTs)
    val l = if (streaming) l0.withWatermark("l_ts", delay) else l0
    val r0 = right.select(col(keyCol).as("k2"), col(rightTs).as("r_ts"),
      col("*")).drop(keyCol, rightTs)
    val r = if (streaming) r0.withWatermark("r_ts", delay) else r0
    l.join(r, col("k") === col("k2") &&
      col("r_ts") >= col("l_ts") &&
      col("r_ts") <= col("l_ts") + expr(s"INTERVAL $window"))
      .drop("k2")
  }

  /** LEFT-OUTER interval join: like [[intervalJoin]] but left rows
    * with no in-window partner survive with null right columns. Over
    * streams this is the semantics Structured Streaming can only
    * deliver WITH watermarks on both sides: an unmatched left row is
    * held in state and emitted null-padded once the watermark proves
    * no partner can still arrive — the "did a purchase follow this
    * view? answer no eventually" query. Batch evaluates the identical
    * plan immediately. */
  def intervalJoinLeft(left: DataFrame, right: DataFrame,
      keyCol: String, leftTs: String, rightTs: String, window: String,
      streaming: Boolean = false, delay: String = "1 hour"): DataFrame = {
    val l0 = left.select(col(keyCol).as("k"), col(leftTs).as("l_ts"),
      col("*")).drop(keyCol, leftTs)
    val l = if (streaming) l0.withWatermark("l_ts", delay) else l0
    val r0 = right.select(col(keyCol).as("k2"), col(rightTs).as("r_ts"),
      col("*")).drop(keyCol, rightTs)
    val r = if (streaming) r0.withWatermark("r_ts", delay) else r0
    l.join(r, col("k") === col("k2") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $window"),
        "left_outer")
      .drop("k2")
  }
}
