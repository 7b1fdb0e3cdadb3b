package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Session-window semantics over an event stream: consecutive events
  * of one key belong to the same session while the gap between them is
  * at most `gapUs`; a larger gap starts a new session.
  *
  * Two formulations with identical results (spec'd against each
  * other):
  *  - [[batchSessions]] — the declarative batch shape: window lag to
  *    mark session starts, running sum to number them, groupBy to
  *    aggregate. Two shuffles on the key (window + groupBy reuse the
  *    same hash partitioning, so the second is exchange-free).
  *  - [[streamingSessions]] — Structured Streaming with
  *    `flatMapGroupsWithState` and event-time timeout: state holds the
  *    one open session per key, closed sessions are emitted when a new
  *    event overshoots the gap or the watermark passes session end +
  *    gap. State size is O(keys), not O(events) — the streaming scale
  *    requirement.
  */
object Sessionize {

  /** Closed session record (timestamps as epoch micros). */
  case class Session(key: Long, session_start_us: Long,
      session_end_us: Long, n_events: Long)

  /** Open-session state carried between micro-batches. */
  case class OpenSession(startUs: Long, endUs: Long, n: Long)

  /** Batch sessionization. Output: (key, session_n, session_start_us,
    * session_end_us, n_events), deterministic via the (ts, idCol)
    * tie-break. */
  def batchSessions(ev: DataFrame, keyCol: String, tsCol: String,
      idCol: String, gapUs: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__ts_us"), col(idCol))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("__ts_us", unix_micros(col(tsCol).cast("timestamp")))
      .withColumn("__is_new",
        when(lag(col("__ts_us"), 1).over(w).isNull ||
          col("__ts_us") - lag(col("__ts_us"), 1).over(w) > gapUs, 1)
          .otherwise(0))
      .withColumn("session_n", sum(col("__is_new")).over(run))
      .groupBy(col(keyCol), col("session_n"))
      .agg(min(col("__ts_us")).as("session_start_us"),
        max(col("__ts_us")).as("session_end_us"),
        count(lit(1)).as("n_events"))
  }

  /** Fold a sorted batch of event times into the open session,
    * returning (closed sessions to emit, new open session). */
  private[streaming] def advance(open: Option[OpenSession],
      sortedUs: Seq[Long], gapUs: Long): (Seq[OpenSession], OpenSession) = {
    var cur = open.orNull
    val closed = Seq.newBuilder[OpenSession]
    sortedUs.foreach { ts =>
      if (cur == null) cur = OpenSession(ts, ts, 1)
      else if (ts - cur.endUs > gapUs) {
        closed += cur
        cur = OpenSession(ts, ts, 1)
      } else cur = OpenSession(cur.startUs, math.max(cur.endUs, ts),
        cur.n + 1)
    }
    (closed.result(), cur)
  }

  /** Streaming sessionization over a stream with columns
    * (`keyCol` long, `tsCol` timestamp). The caller sets the
    * watermark on `tsCol`; closed sessions appear in Append mode once
    * the gap is overshot in-stream or the watermark passes
    * session end + gap (event-time timeout). */
  def streamingSessions(events: DataFrame, keyCol: String, tsCol: String,
      gapUs: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    // the watermarked TIMESTAMP column must survive untouched into the
    // stateful operator — even a redundant cast strips the watermark
    // metadata and fails the event-time-timeout check, so `tsCol` must
    // already be TimestampType and is selected as-is; micros are
    // extracted inside the lambda instead
    events
      .select(col(keyCol).cast("long").as("k"), col(tsCol))
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: Long, values: Iterator[(Long, java.sql.Timestamp)],
            state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            // watermark passed end + gap: the open session can never
            // extend again — emit and drop the state
            val s = state.get
            state.remove()
            Iterator.single(Session(key, s.startUs, s.endUs, s.n))
          } else {
            val us = values.map { case (_, ts) =>
              ts.getTime * 1000L + (ts.getNanos % 1000000L) / 1000L
            }.toSeq.sorted
            val (closed, open) = advance(state.getOption, us, gapUs)
            state.update(open)
            // timeout fires when event-time watermark > this instant
            state.setTimeoutTimestamp(open.endUs / 1000L + gapUs / 1000L)
            closed.iterator.map(s =>
              Session(key, s.startUs, s.endUs, s.n))
          }
      }
  }

  /** One stage attainment emitted by [[streamingFunnel]]. */
  case class StageHit(key: Long, stage: Int, ts_us: Long)

  /** Streaming form of [[funnel]]: per-user state is one Long per
    * stage (the attainment time, -1 until reached); each micro-batch
    * replays its events in event-time order and emits a [[StageHit]]
    * the moment a user first reaches a stage strictly after the
    * previous one. Parity with the batch formulation holds for
    * in-order delivery per user (the same contract as
    * [[StreamOps.streamingDedupFirst]] — an out-of-order earlier
    * event cannot retract an attainment already emitted, which is
    * the streaming semantics). State is O(users x stages) longs;
    * production deployments add a state timeout once a user's
    * funnel window closes. */
  def streamingFunnel(events: DataFrame, userCol: String,
      typeCol: String, tsCol: String,
      stages: Seq[String]): Dataset[StageHit] = {
    import events.sparkSession.implicits._
    val n = stages.length
    val stageIdx = stages.zipWithIndex.toMap
    events
      .select(col(userCol).cast("long").as("key"),
        col(typeCol).as("et"), col(tsCol).as("ts"))
      .as[(Long, String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (key: Long, it: Iterator[(Long, String, java.sql.Timestamp)],
         state: GroupState[Array[Long]]) =>
          val attained = state.getOption.getOrElse(Array.fill(n)(-1L))
          val out = Seq.newBuilder[StageHit]
          it.toSeq.sortBy(e => (e._3.getTime, e._2))
            .foreach { case (_, et, ts) =>
              val us = ts.getTime * 1000L +
                (ts.getNanos % 1000000L) / 1000L
              stageIdx.get(et).foreach { i =>
                val ok =
                  if (i == 0) attained(0) < 0
                  else attained(i) < 0 && attained(i - 1) >= 0 &&
                    us > attained(i - 1)
                if (ok) { attained(i) = us; out += StageHit(key, i, us) }
              }
            }
          state.update(attained)
          out.result().iterator
      }
  }

  /** Sequential conversion funnel: for each user, the first time of
    * stage 0, then the first occurrence of each later stage STRICTLY
    * AFTER the user's previous-stage time. Returns one row per user
    * who reached stage 0, with t0..t(n-1) timestamps (null once the
    * user drops out) — the per-user evidence table a funnel report
    * aggregates.
    *
    * Scale shape: one filtered min-aggregate per stage, each joined
    * back on the user key — N stages cost N key-partitioned
    * aggregations over ONLY that stage's events (the event table is
    * filtered by type before any join), never a per-user event sort
    * or a cross-stage window. */
  def funnel(df: DataFrame, userCol: String, typeCol: String,
      tsCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    // rows without a user or timestamp can't participate in any stage
    val ev = df.filter(col(userCol).isNotNull && col(tsCol).isNotNull)
    var result = ev.filter(col(typeCol) === stages.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("t0"))
    for ((st, i) <- stages.tail.zipWithIndex) {
      val prev = s"t$i"; val next = s"t${i + 1}"
      val nextT = ev.filter(col(typeCol) === st)
        .join(result.select(col(userCol), col(prev)), Seq(userCol))
        .filter(col(tsCol) > col(prev))
        .groupBy(col(userCol)).agg(min(col(tsCol)).as(next))
      result = result.join(nextT, Seq(userCol), "left")
    }
    result
  }
}
