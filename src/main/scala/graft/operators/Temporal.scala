package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators. Spark has no ASOF JOIN; the engine
  * composes it from existing operators (the preferred tier of custom
  * work — no Catalyst internals needed).
  */
object Temporal {

  /** Keyed range join: pair every point with the interval rows of the
    * same key that contain it (inclusive bounds). The key equality is
    * the join's shuffle key, so Catalyst plans an equi-join with the
    * range condition as a post-filter — per-key pair volume is
    * bounded by the key's own cardinality, never global. For UNKEYED
    * interval joins use [[bucketedRangeJoin]]. */
  def rangeJoin(points: DataFrame, intervals: DataFrame, key: String,
      ptCol: String, startCol: String, endCol: String): DataFrame =
    points.join(intervals, Seq(key))
      .filter(col(ptCol) >= col(startCol) && col(ptCol) <= col(endCol))

  /** Unkeyed interval-containment join at scale: slice time into
    * `bucketWidth`-sized buckets, explode each interval over the
    * buckets it covers, equi-join points on their bucket, then filter
    * exact containment. The equi-key bounds every shuffle partition;
    * a naive cross join is O(points × intervals). Intervals longer
    * than ~1000 buckets explode proportionally — pick bucketWidth
    * near the median interval length. Bounds inclusive; `ptCol` /
    * `startCol` / `endCol` must be numeric (e.g. epoch micros). */
  def bucketedRangeJoin(points: DataFrame, intervals: DataFrame,
      ptCol: String, startCol: String, endCol: String,
      bucketWidth: Long): DataFrame = {
    val ivb = intervals.withColumn("__bucket",
      explode(sequence(floor(col(startCol) / bucketWidth),
        floor(col(endCol) / bucketWidth))))
    points.withColumn("__bucket", floor(col(ptCol) / bucketWidth))
      .join(ivb, Seq("__bucket"))
      .filter(col(ptCol) >= col(startCol) && col(ptCol) <= col(endCol))
      .drop("__bucket")
  }

  /** As-of join: for every left row, attach the payload of the single
    * LATEST right row with `rightTs` <= `leftTs` within the same key
    * (null payload when no right row precedes the left row).
    *
    * Formulation: tag both inputs, union, ONE window pass per key
    * ordered by (ts, side) carrying the last non-null payload forward
    * — right rows sort before left rows at equal timestamps, so the
    * match is inclusive like DuckDB's `ASOF JOIN ... ON r.ts <= l.ts`
    * (the oracle for q_temporal_asof).
    *
    * Scale shape: one shuffle on the key, O(n log n) sort within
    * partitions, zero range cross-join blowup — the naive
    * `l JOIN r ON key AND r.ts <= l.ts` + max() formulation
    * materializes every (probe, earlier-event) pair first, which is
    * quadratic per key. Determinism needs (key, ts) unique per side;
    * pre-dedup the right side otherwise. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, payload: Seq[String]): DataFrame = {
    val payloadStruct = struct(payload.map(col): _*)
    val payloadType = right.select(payloadStruct).schema.head.dataType
    val leftStruct = struct(left.columns.map(col): _*)
    val leftType = left.select(leftStruct).schema.head.dataType
    val l = left.select(
      col(key).as("__k"), col(leftTs).cast("timestamp").as("__ts"),
      lit(1).as("__side"), leftStruct.as("__lrow"),
      lit(null).cast(payloadType).as("__p"))
    val r = right.select(
      col(key).as("__k"), col(rightTs).cast("timestamp").as("__ts"),
      lit(0).as("__side"), lit(null).cast(leftType).as("__lrow"),
      payloadStruct.as("__p"))
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val outCols = left.columns.map(c => col(s"__lrow.$c").as(c)) ++
      payload.map(c => col(s"__match.$c").as(c))
    l.unionByName(r)
      .withColumn("__match", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(outCols: _*)
  }

  /** Tolerance-bounded as-of join (pandas merge_asof(tolerance=...) /
    * kdb wj semantics): the nearest-earlier match only counts when it
    * is at most `toleranceUs` old; staler matches null out, the probe
    * row survives. Same one-window plan as [[asofJoin]] plus a narrow
    * freshness mask — no extra shuffle. `payload` must include
    * `rightTs` (the mask needs the matched timestamp). */
  def asofJoinTolerant(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, payload: Seq[String],
      toleranceUs: Long): DataFrame = {
    require(payload.contains(rightTs),
      s"payload must include the matched ts column $rightTs")
    val j = asofJoin(left, right, key, leftTs, rightTs, payload)
      .withColumn("__fresh", col(rightTs).isNotNull &&
        unix_micros(col(leftTs).cast("timestamp")) -
          unix_micros(col(rightTs).cast("timestamp")) <= toleranceUs)
    payload.foldLeft(j)((df, c) =>
        df.withColumn(c, when(col("__fresh"), col(c))))
      .drop("__fresh")
  }

  /** Forward fill (LOCF — last observation carried forward): replace
    * each null with the key's most recent non-null value at or before
    * the row, in (tsCol, tieCol) order (the tie column makes the fill
    * deterministic when timestamps repeat). One window shuffle on the
    * key; the carried state is one value per key, never a history.
    * Appends `<valueCol>_filled`; leading nulls (no earlier
    * observation) stay null — LOCF imputes forward only. */
  def forwardFill(df: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, valueCol: String): DataFrame =
    df.withColumn(s"${valueCol}_filled",
      last(col(valueCol), ignoreNulls = true).over(
        Window.partitionBy(keyCol)
          .orderBy(col(tsCol).asc, col(tieCol).asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))

  /** EWMA smoothing of a per-key ordered series: acc = acc·(1−α) +
    * x·α, folded in (orderCol) order. With α a DYADIC value (0.5,
    * 0.25 — exact binary fractions) over integer inputs every
    * intermediate is exactly representable, so the smoothed doubles
    * are bit-identical on any engine without quantization tricks.
    * One groupBy collects each key's series in order — per-key state
    * is the WHOLE series, so a key longer than `maxSeriesLen`
    * (default 100k) fails loudly instead of silently ballooning a
    * task (use [[ewmaSegmented]] for unbounded keys — its per-task
    * state is one segment). Emitted as (key, pos, ewma) rows — pos is
    * the 0-based position in (orderCol) order. */
  def ewma(df: DataFrame, keyCol: String, orderCol: String,
      valueCol: String, alpha: Double,
      maxSeriesLen: Int = 100000): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha in (0,1): $alpha")
    df.groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(col(orderCol).as("o"),
        col(valueCol).cast("double").as("x")))).as("ser"))
      .filter(assert_true(size(col("ser")) <= maxSeriesLen,
        concat(lit(s"ewma: a key's series exceeds maxSeriesLen=" +
          s"$maxSeriesLen rows — use ewmaSegmented for unbounded " +
          "keys (key="), col(keyCol).cast("string"), lit(")")))
        .isNull)
      .select(col(keyCol), posexplode(
        aggregate(col("ser"),
          array().cast("array<double>"),
          (acc, e) => {
            val prev = when(size(acc) === 0, e.getField("x"))
              .otherwise(element_at(acc, -1) * (1 - alpha)
                + e.getField("x") * alpha)
            concat(acc, array(prev))
          })))
      .withColumnRenamed("col", "ewma")
      .withColumn("pos", col("pos").cast("long"))
  }

  /** Segment-mergeable EWMA — the unbounded-key path. The fold
    * composes: a run of n values collapses to the pair
    * (p, w) = ((1−α)ⁿ, Σᵢ α·xᵢ·(1−α)^{n−i}), and a segment entered
    * with carry c emits eⱼ = c·pⱼ + wⱼ at every prefix j (the
    * original init-with-first-value is the c₀ = x₀ special case —
    * substituting c = x₀ at j = 0 reproduces x₀ exactly). So the
    * series splits into `segLen`-sized segments, each segment folds
    * its own (pⱼ, wⱼ) prefixes independently (state ≤ segLen), the
    * per-key carry chain folds over SEGMENT SUMMARIES (state ≤
    * n/segLen), and the final map is narrow. No task ever holds a
    * full series. With dyadic α over exactly-representable inputs
    * c·pⱼ + wⱼ is exact, hence bit-equal to the whole-series fold
    * (PropertySpec law); over general doubles the two can differ by
    * ulps. Emits (key, ord, x, pos, ewma) — ord and x ride along so
    * callers can join results back. */
  def ewmaSegmented(df: DataFrame, keyCol: String, orderCol: String,
      valueCol: String, alpha: Double, segLen: Int = 4096): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha in (0,1): $alpha")
    require(segLen > 0, s"segLen must be positive: $segLen")
    val wk = Window.partitionBy(keyCol).orderBy(col("__o").asc)
    val ranked = df.select(col(keyCol), col(orderCol).as("__o"),
        col(valueCol).cast("double").as("__x"))
      .withColumn("__rn", row_number().over(wk) - 1)
      .withColumn("__seg", (col("__rn") / segLen).cast("long"))
      .withColumn("__j", col("__rn") % segLen)
    // per (key, segment): ordered members + prefix arrays
    //   ws_j = uniform fold from 0:  w_j = w_{j-1}(1-α) + x_j·α
    //   ps_j = (1-α)^{j+1} by repeated multiplication (exact for
    //          dyadic α; pow() would not be)
    val bySeg = ranked.groupBy(col(keyCol), col("__seg"))
      .agg(sort_array(collect_list(struct(col("__j").as("j"),
        col("__o").as("o"), col("__x").as("x")))).as("ser"))
      .withColumn("ws", aggregate(col("ser"),
        array().cast("array<double>"),
        (acc, e) => concat(acc, array(
          when(size(acc) === 0, e.getField("x") * alpha)
            .otherwise(element_at(acc, -1) * (1 - alpha)
              + e.getField("x") * alpha)))))
      .withColumn("ps", aggregate(col("ser"),
        array().cast("array<double>"),
        (acc, _) => concat(acc, array(
          when(size(acc) === 0, lit(1 - alpha))
            .otherwise(element_at(acc, -1) * (1 - alpha))))))
    // per key: fold segment summaries (x0, P, W) into the carry each
    // segment enters with — c₀ = first segment's x₀,
    // c_{k+1} = c_k·P_k + W_k. State: one tiny struct per segment.
    val carries = bySeg
      .select(col(keyCol), col("__seg"),
        element_at(col("ser"), 1).getField("x").as("x0"),
        element_at(col("ps"), -1).as("p"),
        element_at(col("ws"), -1).as("w"))
      .groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(col("__seg").as("s"),
        col("x0"), col("p"), col("w")))).as("sgs"))
      .select(col(keyCol), posexplode(aggregate(col("sgs"),
        array().cast("array<struct<c:double,p:double,w:double>>"),
        (acc, g) => concat(acc, array(struct(
          when(size(acc) === 0, g.getField("x0"))
            .otherwise(element_at(acc, -1).getField("c")
              * element_at(acc, -1).getField("p")
              + element_at(acc, -1).getField("w")).as("c"),
          g.getField("p").as("p"), g.getField("w").as("w")))))))
      .select(col(keyCol), col("pos").cast("long").as("__seg"),
        col("col").getField("c").as("__carry"))
    bySeg.join(carries, Seq(keyCol, "__seg"))
      .select(col(keyCol), col("__seg"), col("__carry"),
        posexplode(zip_with(col("ser"),
          zip_with(col("ps"), col("ws"),
            (p, w) => struct(p.as("p"), w.as("w"))),
          (e, pw) => struct(e.getField("o").as("o"),
            e.getField("x").as("x"),
            (col("__carry") * pw.getField("p")
              + pw.getField("w")).as("e")))))
      .select(col(keyCol), col("col.o").as(orderCol),
        col("col.x").as(valueCol),
        (col("__seg") * segLen + col("pos")).cast("long").as("pos"),
        col("col.e").as("ewma"))
  }

  /** Time-series densification: per-key hourly counts with every
    * missing hour of the corpus span filled with an explicit 0 —
    * downstream window/ML code then never special-cases gaps.
    * Returns (keyCol, hr timestamp, n).
    *
    * Scale shape: the raw data passes through ONE aggregation
    * (groupBy key, hour — map-side combined); the spine is
    * |keys| x |hours| — metadata-sized, built from a broadcast 1-row
    * bounds frame and a sequence explode, never from the data. The
    * gap-fill join runs spine-LEFT-aggregates, both sides already
    * small. */
  def gapFillHourly(df: DataFrame, keyCol: String,
      tsCol: String): DataFrame = {
    val h = df.groupBy(col(keyCol),
        date_trunc("hour", col(tsCol)).as("hr"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(eager = false)
    val hrs = h.agg(min("hr").as("h0"), max("hr").as("h1"))
      .select(explode(sequence(col("h0"), col("h1"),
        expr("INTERVAL 1 HOUR"))).as("hr"))
    val spine = df.select(col(keyCol)).distinct()
      .crossJoin(broadcast(hrs))
    spine.join(h, Seq(keyCol, "hr"), "left")
      .select(col(keyCol), col("hr"),
        coalesce(col("n"), lit(0L)).as("n"))
  }

  /** Hourly rate anomalies per series: hours whose event count
    * exceeds the series mean by more than two standard deviations —
    * evaluated in EXACT integer arithmetic. c > mean + 2*sigma over
    * counts c with per-series totals n, S = sum c, Q = sum c² is
    * equivalent to (c*n - S) > 0 AND (c*n - S)² > 4*(n*Q - S²), so
    * no sqrt or double ever enters and the flag set is bit-identical
    * on every engine (the sums fit BIGINT far past any real event
    * volume). Two key-partitioned aggregations plus a per-series
    * stats join — the stats side is |series| rows and broadcasts. */
  def rateAnomalies(df: DataFrame, seriesCol: String,
      tsCol: String): DataFrame = {
    val h = df.groupBy(col(seriesCol).as("series"),
        date_trunc("hour", col(tsCol)).as("hr"))
      .agg(count(lit(1)).as("c"))
    val st = h.groupBy("series")
      .agg(count(lit(1)).as("n"), sum("c").as("s"),
        sum(col("c") * col("c")).as("q"))
    val dev = col("c") * col("n") - col("s")
    h.join(broadcast(st), Seq("series"))
      .filter(dev > 0 &&
        dev * dev > lit(4L) * (col("n") * col("q") - col("s") * col("s")))
      .select(col("series"), col("hr"), col("c"))
  }

  /** Robust MAD outliers (Hampel 1974's identifier; Leys 2013's
    * |x − med| > k·MAD rule): values whose absolute deviation from
    * the per-series lower median exceeds `k` times the lower median
    * of those deviations. Unlike [[rateAnomalies]]' mean/variance
    * z-score, both center and spread have a 50% breakdown point — a
    * burst of garbage can't drag the threshold toward itself.
    *
    * Exact-integer discipline: values quantize to micro once
    * (floor(x·10⁶), identical IEEE ops on any engine); the lower
    * median is the value at ordinal ⌊(n+1)/2⌋ of the sorted multiset
    * — an order-statistic PICK, so tie order can permute rows but
    * never the picked value — and every output cell is exact int64.
    * MAD = 0 (over half the series identical) degenerates to
    * flagging every nonzero deviation: the documented Hampel caveat,
    * loud rather than silent.
    *
    * Scale shape: two per-series sort windows (the price of an EXACT
    * median; the K-family sketch quantiles are the approximate path
    * when single series outgrow a partition) + two tiny per-series
    * median frames joined back (AQE broadcasts them). Returns the
    * flagged rows (series, id, v_micro, med_micro, mad_micro,
    * dev_micro). */
  def madOutliers(df: DataFrame, seriesCol: String, idCol: String,
      valueCol: String, k: Long = 3L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"k must be >= 1: $k")
    val q = df.select(col(seriesCol).as("series"),
      col(idCol).as("id"),
      floor(col(valueCol) * 1000000L).cast("long").as("v_micro"))
    def lowerMedian(in: DataFrame, c: String, out: String): DataFrame = {
      val w = Window.partitionBy("series")
        .orderBy(col(c).asc, col("id").asc)
      in.withColumn("__rn", row_number().over(w))
        .withColumn("__n",
          count(lit(1)).over(Window.partitionBy("series")))
        .filter(col("__rn") === expr("(__n + 1) div 2"))
        .select(col("series"), col(c).as(out))
    }
    val med = lowerMedian(q, "v_micro", "med_micro")
    val dev = q.join(med, Seq("series"))
      .withColumn("dev_micro", abs(col("v_micro") - col("med_micro")))
    val mad = lowerMedian(
      dev.select(col("series"), col("id"), col("dev_micro")),
      "dev_micro", "mad_micro")
    dev.join(mad, Seq("series"))
      .filter(col("dev_micro") > lit(k) * col("mad_micro"))
      .select(col("series"), col("id"), col("v_micro"),
        col("med_micro"), col("mad_micro"), col("dev_micro"))
  }

  /** One-sided CUSUM drift alarms (Page 1954, "Continuous inspection
    * schemes"): S_i = max(0, S_{i-1} + (x_i − ref)) per series in
    * event order, alarm where S crosses the threshold — the classic
    * sequential detector for a sustained upward shift that point
    * rules ([[rateAnomalies]], [[madOutliers]]) can't see because no
    * single observation is extreme. The recursive fold has the
    * closed reflection form S_i = c_i − min(0, min_{j≤i} c_j) over
    * the running sum c of (x − ref), so the whole detector is two
    * cumulative windows — no recursion, no driver loop, exact int64
    * after the one micro quantization (sums of micro values wrap
    * only past ~9.2e12 value-units per series).
    *
    * `refMicro` is the no-drift reference plus slack (the classic
    * target + allowance, pre-summed by the caller); `thresholdMicro`
    * is the alarm level h. Returns alarm rows
    * (series, id, v_micro, cusum_micro).
    *
    * Scale shape: one per-series sort window evaluating both
    * running aggregates in a single pass — the same shuffle the
    * event-order semantics require; nothing corpus-wide. */
  def cusumDrift(df: DataFrame, seriesCol: String, idCol: String,
      tsCol: String, valueCol: String, refMicro: Long,
      thresholdMicro: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(thresholdMicro > 0,
      s"thresholdMicro must be positive: $thresholdMicro")
    val w = Window.partitionBy("series")
      .orderBy(col("__ts").asc, col("id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(seriesCol).as("series"), col(idCol).as("id"),
        col(tsCol).as("__ts"),
        floor(col(valueCol) * 1000000L).cast("long").as("v_micro"))
      .withColumn("__cum",
        sum(col("v_micro") - lit(refMicro)).over(w))
      .withColumn("cusum_micro",
        col("__cum") - least(lit(0L), min(col("__cum")).over(w)))
      .filter(col("cusum_micro") > thresholdMicro)
      .select(col("series"), col("id"), col("v_micro"),
        col("cusum_micro"))
  }

  /** Coalesce overlapping/touching intervals per key into maximal
    * disjoint spans — availability windows, session stitching, CDC
    * validity ranges. A new span starts where an interval's start
    * exceeds the running max of all earlier ends (strictly — equal
    * endpoints touch and therefore merge); spans number per key from
    * 1 in start order. One window shuffle on the key; per-key state
    * is the running max, never the interval list. Start/end are any
    * orderable type — pass integer epoch micros for engine-exact
    * results. Ties on (start, end) are safe: identical rows produce
    * identical flags, so the grouping is order-independent. */
  def coalesceIntervals(df: DataFrame, keyCol: String,
      startCol: String, endCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCol)
      .orderBy(col(startCol).asc, col(endCol).asc)
    val prevMax = max(col(endCol))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    // a null bound cannot participate in the running-max chain — it
    // would silently corrupt span boundaries; drop, don't guess
    df.filter(col(keyCol).isNotNull && col(startCol).isNotNull &&
        col(endCol).isNotNull)
      .withColumn("__new",
        when(prevMax.isNull || col(startCol) > prevMax, 1L)
          .otherwise(0L))
      .withColumn("span", sum(col("__new")).over(w))
      .groupBy(col(keyCol), col("span"))
      .agg(min(col(startCol)).as(startCol),
        max(col(endCol)).as(endCol),
        count(lit(1)).as("n_intervals"))
  }

  /** OHLC downsampling (resample-to-bars): per (series, time bucket)
    * the first value, max, min, last value, and row count — the
    * candlestick/metrics-rollup reduction every time-series store
    * ships (pandas `resample().ohlc()`, InfluxDB windows). Open and
    * close are EXACT row picks, not arithmetic: min_by/max_by on the
    * (ts, tieCol) struct, with the explicit unique tie-break making
    * the pick engine-deterministic even when two rows share a
    * timestamp (doubles compare exactly; nothing is summed, so no
    * float-order hazard enters the hash).
    *
    * Scale shape: ONE map-side-combined aggregation over
    * (series, bucket) — min_by/max_by carry a single (key, value)
    * pair of state per group, so partials stay tiny; no window, no
    * second shuffle, nothing corpus-sized on any node. `bucket` is
    * any date_trunc unit ("hour", "day", "week"...). */
  def resampleOhlc(df: DataFrame, seriesCol: String, tsCol: String,
      valueCol: String, tieCol: String,
      bucket: String = "hour"): DataFrame = {
    val pick = struct(col(tsCol), col(tieCol))
    df.groupBy(col(seriesCol).as("series"),
        date_trunc(bucket, col(tsCol)).as("bucket"))
      .agg(
        min_by(col(valueCol), pick).as("open"),
        max(col(valueCol)).as("high"),
        min(col(valueCol)).as("low"),
        max_by(col(valueCol), pick).as("close"),
        count(lit(1)).as("n"))
  }
}
