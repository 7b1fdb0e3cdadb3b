package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{hash60, hash60b}

/** Approximate-cardinality / membership sketches, built DETERMINISTIC
  * so every run (and every engine with md5) produces bit-identical
  * sketches. At 100 TB these replace exact COUNT(DISTINCT) / semi-join
  * pre-filters: the sketch is a few KB per column, mergeable across
  * partitions with max / bit_or — both order-free — so partial
  * aggregation does all the work map-side and the shuffle carries only
  * fixed-size state.
  *
  * Reference context: the reference engine answers its audit
  * cardinality questions with exact COUNT(DISTINCT) over PostgreSQL
  * heaps (/root/reference/utils/importer/verify_collections.py:34-195);
  * that formulation stops being answerable at corpus scale, which is
  * why the sketch layer exists here as a first-class operator family.
  *
  * Spark ships HLL++ (`approx_count_distinct`) — the production
  * default — but its binary sketch is engine-private and so cannot be
  * oracle-checked across engines. These operators implement the same
  * algorithms from their public definitions (Flajolet et al. 2007;
  * Bar-Yossef et al. 2002; Bloom 1970) over the md5-derived
  * [[graft.functions.hash60]], trading HLL++'s bias tables for exact
  * reproducibility. Estimates are engine-grade (~2% at m=256 for HLL).
  */
object Sketches {

  /** 2^60 as a double — hash60's value space, the KMV unit interval. */
  private val HashSpace = 1152921504606846976.0d

  /** Per-bucket HLL registers for `col`'s distinct values: bucket =
    * h % m, rho = leading-zero count of the remaining 60-log2(m) bits
    * + 1, register = max(rho). One shuffle of at most m rows (the
    * map-side partial max has already collapsed each partition to m
    * registers). `m` must be a power of two. */
  def hllRegisters(df: DataFrame, valueCol: String, m: Int,
      salt: String = "hll"): DataFrame = {
    require(m > 0 && (m & (m - 1)) == 0, s"m must be a power of two: $m")
    val vBits = 60 - Integer.numberOfTrailingZeros(m) // quotient width
    val h = hash60(concat(lit(s"$salt:"), col(valueCol).cast("string")))
    // NULL is not a value: drop it before hashing (md5(NULL) would
    // thread a null register through bucket/rho arithmetic)
    df.filter(col(valueCol).isNotNull)
      .select(h.as("hv")).distinct()
      // `div`, not `/`: Spark's / on longs is double division
      .select((col("hv") % m).as("bucket"), expr(s"hv div $m").as("v"))
      // bin() prints without leading zeros, so length(bin(v)) is the
      // bit length; rho = vBits - bitlen + 1, and the all-zero
      // quotient scores vBits + 1 by convention
      .select(col("bucket"),
        when(col("v") === 0, lit(vBits + 1))
          .otherwise(lit(vBits + 1) - length(bin(col("v")))).as("rho"))
      .groupBy("bucket").agg(max("rho").as("rho"))
  }

  /** Raw HLL cardinality estimate from [[hllRegisters]]: one row
    * `(m, nonzero_buckets, harmonic_sum, estimate)`. The harmonic sum
    * folds pow(2, -rho) terms — exact powers of two — in bucket order
    * (ordered fold: bit-identical across engines); empty buckets
    * contribute 2^0 = 1 each, added as one exact integer-valued term.
    * Raw estimate only (no small/large-range correction): callers
    * size sketches so n >> 2.5m — the regime sketches are for — which
    * never enters the corrected ranges. */
  /** One-pass HLL register build via the native typed-imperative
    * aggregate (`graft_hll_regs`, [[graft.expressions.HllRegistersAgg]])
    * — bit-identical registers to [[hllRegisters]] (parity spec'd)
    * with a fundamentally better shuffle: each partition folds its
    * rows into an m-byte buffer and the exchange carries ONE buffer
    * per partition, where the declarative build first DISTINCTs every
    * salted hash (a full distinct-key shuffle at 100 TB). Requires
    * the GraftExtensions session. */
  def hllRegistersNative(df: DataFrame, valueCol: String, m: Int,
      salt: String = "hll"): DataFrame = {
    require(m > 0 && (m & (m - 1)) == 0, s"m must be a power of two: $m")
    df.filter(col(valueCol).isNotNull)
      .agg(call_function("graft_hll_regs",
        concat(lit(s"$salt:"), col(valueCol).cast("string")),
        lit(m)).as("regs"))
      .select(posexplode(col("regs")))
      .filter(col("col") > 0)
      .select(col("pos").cast("long").as("bucket"),
        col("col").as("rho"))
  }

  def hllEstimate(df: DataFrame, valueCol: String, m: Int,
      salt: String = "hll"): DataFrame =
    hllEstimateFrom(hllRegisters(df, valueCol, m, salt), m)

  /** Raw HLL estimate read off any (bucket, rho) register frame —
    * shared by the declarative and native register builds. */
  def hllEstimateFrom(registers: DataFrame, m: Int): DataFrame = {
    val alpha = 0.7213 / (1 + 1.079 / m)
    registers
      .agg(sort_array(collect_list(struct(col("bucket"), col("rho"))))
        .as("regs"))
      .select(
        lit(m.toLong).as("m"),
        size(col("regs")).cast("long").as("nonzero_buckets"),
        (aggregate(col("regs"), lit(0.0d),
          (acc, r) => acc + pow(lit(2.0d), -r.getField("rho")))
          + (lit(m) - size(col("regs"))).cast("double")).as("harmonic_sum"))
      .withColumn("estimate",
        lit(alpha) * lit(m.toDouble) * lit(m.toDouble) / col("harmonic_sum"))
  }

  /** Per-GROUP HLL estimates — approximate COUNT(DISTINCT v) GROUP BY
    * g, the shape that replaces an exact distinct-per-day over a
    * 100 TB history. Registers key on (group, bucket): the shuffle
    * carries at most |groups| * m rows after map-side partial max,
    * independent of row count. Same raw-regime contract as
    * [[hllEstimate]] (size m so per-group n >> 2.5m); the per-group
    * harmonic fold is bucket-ordered, so estimates are bit-identical
    * across engines. Returns (grp, nonzero_buckets, harmonic_sum,
    * estimate). */
  def hllEstimateByGroup(df: DataFrame, groupCol: String,
      valueCol: String, m: Int, salt: String = "hll"): DataFrame = {
    require(m > 0 && (m & (m - 1)) == 0, s"m must be a power of two: $m")
    val vBits = 60 - Integer.numberOfTrailingZeros(m)
    val alpha = 0.7213 / (1 + 1.079 / m)
    val h = hash60(concat(lit(s"$salt:"), col(valueCol).cast("string")))
    df.filter(col(valueCol).isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol).as("grp"), h.as("hv")).distinct()
      .select(col("grp"), (col("hv") % m).as("bucket"),
        expr(s"hv div $m").as("v"))
      .select(col("grp"), col("bucket"),
        when(col("v") === 0, lit(vBits + 1))
          .otherwise(lit(vBits + 1) - length(bin(col("v")))).as("rho"))
      .groupBy("grp", "bucket").agg(max("rho").as("rho"))
      .groupBy("grp")
      .agg(sort_array(collect_list(struct(col("bucket"), col("rho"))))
        .as("regs"))
      .select(col("grp"),
        size(col("regs")).cast("long").as("nonzero_buckets"),
        (aggregate(col("regs"), lit(0.0d),
          (acc, r) => acc + pow(lit(2.0d), -r.getField("rho")))
          + (lit(m) - size(col("regs"))).cast("double"))
          .as("harmonic_sum"))
      .withColumn("estimate",
        lit(alpha) * lit(m.toDouble) * lit(m.toDouble)
          / col("harmonic_sum"))
  }

  /** Per-group HLL through the native one-pass aggregate: ONE grouped
    * aggregation whose partial state is the m-byte buffer per group —
    * the exchange carries |groups| buffers, versus the declarative
    * [[hllEstimateByGroup]]'s distinct over every (group, hash) pair
    * followed by a |groups| × m register shuffle. The harmonic fold
    * filters to nonzero registers IN BUCKET ORDER before summing and
    * adds the empty-bucket mass as one exact term — the identical
    * summation order to the declarative path, so estimates are
    * bit-equal (parity spec'd). */
  def hllEstimateByGroupNative(df: DataFrame, groupCol: String,
      valueCol: String, m: Int, salt: String = "hll"): DataFrame = {
    require(m > 0 && (m & (m - 1)) == 0, s"m must be a power of two: $m")
    val alpha = 0.7213 / (1 + 1.079 / m)
    val nonzero = filter(col("regs"), x => x =!= 0)
    df.filter(col(valueCol).isNotNull && col(groupCol).isNotNull)
      .groupBy(col(groupCol).as("grp"))
      .agg(call_function("graft_hll_regs",
        concat(lit(s"$salt:"), col(valueCol).cast("string")),
        lit(m)).as("regs"))
      .select(col("grp"),
        size(nonzero).cast("long").as("nonzero_buckets"),
        (aggregate(nonzero, lit(0.0d),
          (acc, x) => acc + pow(lit(2.0d), -x))
          + (lit(m) - size(nonzero)).cast("double")).as("harmonic_sum"))
      .withColumn("estimate",
        lit(alpha) * lit(m.toDouble) * lit(m.toDouble)
          / col("harmonic_sum"))
  }

  /** Merge per-partition / per-day HLL register tables: union + max
    * per bucket. THE property that makes sketches the scale answer:
    * sketch once per partition/day/source, merge in O(m), estimate
    * over any union without rescanning data. Law (spec'd):
    * merge(registers(A), registers(B)) == registers(A ∪ B). */
  def hllMergeRegisters(sketches: DataFrame*): DataFrame =
    sketches.reduce(_ unionByName _)
      .groupBy("bucket").agg(max("rho").as("rho"))

  /** K11: TRAILING-window approximate distinct — "distinct users over
    * the trailing `windowDays` days, per day", the metric exact
    * distinct cannot deliver at scale (exact needs every identity
    * re-scanned per window position; COUNT(DISTINCT) isn't even a
    * legal window aggregate). The sketch answer: per-day registers
    * once (the [[hllEstimateByGroup]] build), then the trailing merge
    * is a RANGE-frame window MAX per bucket over a dense
    * days × m grid — the merge law applied as a window function.
    * Everything after the register build is sketch-sized
    * (|days| · m rows), however large the history; `dayCol` is an
    * epoch-day ordinal so the RANGE frame is integer arithmetic on
    * both engines. Missing (day, bucket) cells stay null through the
    * left join and MAX ignores them — an all-null window is an empty
    * bucket contributing its exact 2⁰ mass. Harmonic fold in bucket
    * order over the non-null merged registers, same contract as
    * [[hllEstimateFrom]]. */
  def hllTrailingDistinct(df: DataFrame, dayCol: String,
      valueCol: String, m: Int, windowDays: Int,
      salt: String = "hll"): DataFrame = {
    require(m > 0 && (m & (m - 1)) == 0, s"m must be a power of two: $m")
    require(windowDays > 0, s"windowDays must be positive: $windowDays")
    val vBits = 60 - Integer.numberOfTrailingZeros(m)
    val alpha = 0.7213 / (1 + 1.079 / m)
    val h = hash60(concat(lit(s"$salt:"), col(valueCol).cast("string")))
    val regs = df.filter(col(valueCol).isNotNull && col(dayCol).isNotNull)
      .select(col(dayCol).as("day_ord"), h.as("hv")).distinct()
      .select(col("day_ord"), (col("hv") % m).as("bucket"),
        expr(s"hv div $m").as("v"))
      .select(col("day_ord"), col("bucket"),
        when(col("v") === 0, lit(vBits + 1))
          .otherwise(lit(vBits + 1) - length(bin(col("v")))).as("rho"))
      .groupBy("day_ord", "bucket").agg(max("rho").as("rho"))
    val grid = df.filter(col(dayCol).isNotNull)
      .select(col(dayCol).as("day_ord")).distinct()
      .select(col("day_ord"),
        explode(sequence(lit(0L), lit(m - 1L))).as("bucket"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("bucket").orderBy("day_ord")
      .rangeBetween(-(windowDays - 1L), 0L)
    grid.join(regs, Seq("day_ord", "bucket"), "left")
      .withColumn("mrho", max(col("rho")).over(w))
      .groupBy("day_ord")
      .agg(sort_array(collect_list(when(col("mrho").isNotNull,
        struct(col("bucket"), col("mrho").as("rho"))))).as("regs"))
      .select(col("day_ord"),
        size(col("regs")).cast("long").as("nonzero_buckets"),
        (aggregate(col("regs"), lit(0.0d),
          (acc, r) => acc + pow(lit(2.0d), -r.getField("rho")))
          + (lit(m) - size(col("regs"))).cast("double"))
          .as("harmonic_sum"))
      .withColumn("estimate",
        lit(alpha) * lit(m.toDouble) * lit(m.toDouble)
          / col("harmonic_sum"))
  }

  /** Fixed-bin histogram sketch over an integer-valued column
    * (callers quantize doubles to integer units — cents, millis —
    * first, so the sketch is exact-integer end to end): bin =
    * clamp((v - lo) div width, 0, nBins-1), one (bin, n) row per
    * occupied bin. The mergeable-quantile primitive: same-bin counts
    * merge with SUM — order-free, partial-aggregated map-side — so
    * per-partition / per-day histograms union into the global sketch
    * without reprocessing history. Where production reaches for a
    * t-digest / KLL sketch (engine-private binaries, not
    * oracle-checkable), this keeps the identical shuffle shape
    * (≤ nBins rows cross the exchange) while staying
    * bit-reproducible; error is bounded by the bin width instead of a
    * rank epsilon. */
  def histBins(df: DataFrame, valueCol: String, lo: Long, width: Long,
      nBins: Int): DataFrame = {
    require(width > 0 && nBins > 0, s"need width>0, nBins>0: $width/$nBins")
    df.filter(col(valueCol).isNotNull)
      .select(least(greatest(
          expr(s"(CAST($valueCol AS BIGINT) - ${lo}L) div ${width}L"),
          lit(0L)), lit(nBins - 1L)).as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n"))
  }

  /** Merge histogram sketches of the same (lo, width, nBins) frame:
    * counter-wise sum. Law (spec'd): merge(hist(A), hist(B)) ==
    * hist(A ∪ B). */
  def histMerge(sketches: DataFrame*): DataFrame =
    sketches.reduce(_ unionByName _)
      .groupBy("bin").agg(sum("n").as("n"))

  /** Upper-edge quantile estimates read off a [[histBins]] sketch:
    * for each requested rank q (in milli), the smallest bin whose
    * cumulative count reaches q/1000 of the total, reported as that
    * bin's upper edge `lo + (bin+1)*width`. The rank test is the
    * cross-multiplied integer comparison `cum * 1000 >= q * total` —
    * no division, bit-identical in any engine. The cumulative window
    * sorts ≤ nBins rows on one partition: the sketch is tiny by
    * construction, that is the point (the raw data never re-enters). */
  def histQuantiles(bins: DataFrame, lo: Long, width: Long,
      qMilli: Seq[Int]): DataFrame = {
    val s = bins.sparkSession
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window.orderBy("bin")
    val cum = bins.withColumn("cum", sum("n").over(w))
    val tot = bins.agg(sum("n").as("tot"))
    cum.crossJoin(broadcast(tot))
      .crossJoin(broadcast(qMilli.toDF("q_milli")))
      .filter(col("cum") * 1000 >= col("q_milli") * col("tot"))
      .groupBy("q_milli").agg(min("bin").as("bin"))
      .withColumn("est_hi", lit(lo) + (col("bin") + 1) * lit(width))
      .orderBy("q_milli")
  }

  /** Per-GROUP histogram sketch — the grouped [[histBins]]: one
    * (grp, bin, n) row per occupied bin per group, so the exchange
    * carries at most |groups| × nBins counter rows however large the
    * input. Merge law is the same counter sum keyed by (grp, bin). */
  def histBinsByGroup(df: DataFrame, groupCol: String, valueCol: String,
      lo: Long, width: Long, nBins: Int): DataFrame = {
    require(width > 0 && nBins > 0, s"need width>0, nBins>0: $width/$nBins")
    df.filter(col(valueCol).isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol).as("grp"),
        least(greatest(
          expr(s"(CAST($valueCol AS BIGINT) - ${lo}L) div ${width}L"),
          lit(0L)), lit(nBins - 1L)).as("bin"))
      .groupBy("grp", "bin").agg(count(lit(1)).as("n"))
  }

  /** Per-group quantile estimates off a [[histBinsByGroup]] sketch:
    * the same cross-multiplied integer rank test as [[histQuantiles]],
    * with the cumulative window PARTITIONED by group — each frame is
    * ≤ nBins rows, so there is no single-partition sort anywhere. */
  def histQuantilesByGroup(bins: DataFrame, lo: Long, width: Long,
      qMilli: Seq[Int]): DataFrame = {
    val s = bins.sparkSession
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("grp").orderBy("bin")
    val cum = bins.withColumn("cum", sum("n").over(w))
    val tot = bins.groupBy("grp").agg(sum("n").as("tot"))
    cum.join(tot, Seq("grp"))
      .crossJoin(broadcast(qMilli.toDF("q_milli")))
      .filter(col("cum") * 1000 >= col("q_milli") * col("tot"))
      .groupBy("grp", "q_milli").agg(min("bin").as("bin"))
      .withColumn("est_hi", lit(lo) + (col("bin") + 1) * lit(width))
      .orderBy("grp", "q_milli")
  }

  /** K12: equi-depth quantile discretizer — assign every row a bucket
    * 0..nBuckets-1 by the histogram-derived quantile cut bins (the
    * feature-engineering step that turns a heavy-tailed numeric into
    * a balanced categorical). Cut points come from ONE histogram
    * sketch pass ([[histBins]] + [[histQuantiles]]; ≤ nBins rows
    * shuffle), then ride as a broadcast array; assignment is a
    * narrow per-row count of cut bins below the row's bin. Bucket
    * boundaries are exact at bin resolution: rows sharing a histogram
    * bin always share a bucket (ties never split), so the layout is
    * deterministic and engine-reproducible. */
  def discretizeByQuantiles(df: DataFrame, valueCol: String, lo: Long,
      width: Long, nBins: Int, nBuckets: Int): DataFrame = {
    require(nBuckets > 1, s"nBuckets must be > 1: $nBuckets")
    val permilles = (1 until nBuckets).map(i => i * 1000 / nBuckets)
    val cuts = histQuantiles(histBins(df, valueCol, lo, width, nBins),
        lo, width, permilles)
      .agg(sort_array(collect_list(col("bin"))).as("__cutbins"))
    df.crossJoin(broadcast(cuts))
      .withColumn("__bin", least(greatest(
        expr(s"(CAST($valueCol AS BIGINT) - ${lo}L) div ${width}L"),
        lit(0L)), lit(nBins - 1L)))
      .withColumn("bucket",
        size(filter(col("__cutbins"), c => col("__bin") > c))
          .cast("long"))
      .drop("__cutbins", "__bin")
  }

  /** Winsorize via the histogram sketch: clamp values into the
    * [qLo, qHi] quantile band whose edges come off [[histQuantiles]]
    * — robust-statistics clipping with no global sort anywhere. The
    * edge frame is ONE broadcast row; the clip itself is a narrow
    * map, so winsorizing a 100 TB column costs the histogram pass
    * plus a scan. Appends `<valueCol>_clipped`. */
  def clipToQuantiles(df: DataFrame, valueCol: String, lo: Long,
      width: Long, nBins: Int, qLoMilli: Int,
      qHiMilli: Int): DataFrame = {
    val edges =
      histQuantiles(histBins(df, valueCol, lo, width, nBins),
        lo, width, Seq(qLoMilli, qHiMilli))
      .agg(
        min(when(col("q_milli") === qLoMilli, col("est_hi")))
          .as("lo_edge"),
        min(when(col("q_milli") === qHiMilli, col("est_hi")))
          .as("hi_edge"))
    df.crossJoin(broadcast(edges))
      .withColumn(s"${valueCol}_clipped",
        least(greatest(col(valueCol), col("lo_edge")), col("hi_edge")))
  }

  /** K-minimum-values distinct sketch: the k smallest distinct hash
    * values of `col`. The sketch IS the rows (mergeable: union +
    * re-take-k). Spark plans the orderBy+limit as
    * TakeOrderedAndProject, so no global sort materializes and each
    * partition forwards only its own bottom k. */
  def kmvSketch(df: DataFrame, valueCol: String, k: Int,
      salt: String = "kmv"): DataFrame =
    df.filter(col(valueCol).isNotNull)
      .select(hash60(concat(lit(s"$salt:"), col(valueCol).cast("string")))
        .as("hv"))
      .distinct().orderBy("hv").limit(k)

  /** KMV estimate: (k-1) * |hash space| / kth-minimum. One row
    * `(k, kth_min, estimate)`; exact integer arithmetic until the one
    * final double division. */
  def kmvEstimate(df: DataFrame, valueCol: String, k: Int,
      salt: String = "kmv"): DataFrame =
    kmvSketch(df, valueCol, k, salt)
      .agg(count(lit(1)).as("k"), max("hv").as("kth_min"))
      .withColumn("estimate",
        (col("k") - 1).cast("double") * lit(HashSpace)
          / col("kth_min").cast("double"))

  /** Merge KMV sketches: union of the value sets, re-take the bottom
    * k. Law (spec'd): merge(kmv(A), kmv(B)) == kmv(A ∪ B) — the k
    * smallest of the union are among the per-side k smallest. */
  def kmvMerge(k: Int, sketches: DataFrame*): DataFrame =
    sketches.reduce(_ unionByName _)
      .distinct().orderBy("hv").limit(k)

  /** KMV set algebra (Beyer et al. 2007, "On synopses for distinct-
    * value estimation under multiset operations"): from two k-minimum-
    * value sketches over the SAME salt, estimate |A ∪ B|, Jaccard,
    * and |A ∩ B| — the sketch-level overlap arithmetic that prices a
    * cross-corpus dedup before anyone joins the corpora. The merged
    * sketch M = bottom-k of the value union is a valid KMV of A ∪ B
    * (the [[kmvMerge]] law); Jaccard is the EXACT integer fraction of
    * M's members present in both input sketches (Beyer's unbiased
    * p̂ = |M ∩ A ∩ B| / |M|), and the intersection estimate is that
    * fraction times the union estimate — one double multiply/divide
    * at the very end, deterministic IEEE on any engine.
    *
    * Scale: everything after the two k-row sketches is k-row
    * arithmetic — sketch once per corpus, overlap any pair for free.
    * One row (k_used, in_both, union_est, jaccard_milli, inter_est). */
  def kmvOverlap(dfA: DataFrame, dfB: DataFrame, valueCol: String,
      k: Int, salt: String = "kmv"): DataFrame = {
    val a = kmvSketch(dfA, valueCol, k, salt)
    val b = kmvSketch(dfB, valueCol, k, salt)
    val merged = kmvMerge(k, a, b)
    val inBoth = merged
      .join(a.withColumnRenamed("hv", "hv").as("sa"), Seq("hv"),
        "left_semi")
      .join(b.as("sb"), Seq("hv"), "left_semi")
    merged.agg(count(lit(1)).as("k_used"), max("hv").as("__kth"))
      .crossJoin(broadcast(
        inBoth.agg(count(lit(1)).as("in_both"))))
      .select(col("k_used"), col("in_both"),
        ((col("k_used") - 1).cast("double") * lit(HashSpace)
          / col("__kth").cast("double")).as("union_est"),
        expr("in_both * 1000 div k_used").as("jaccard_milli"),
        ((col("in_both").cast("double") / col("k_used").cast("double"))
          * ((col("k_used") - 1).cast("double") * lit(HashSpace)
            / col("__kth").cast("double"))).as("inter_est"))
  }

  /** Merge bloom filters built with the same (bits, nHashes, salt):
    * per-word bit_or. Law (spec'd): a key inserted into either input
    * is a maybe-member of the union. */
  def bloomUnion(filters: DataFrame*): DataFrame =
    filters.reduce(_ unionByName _)
      .groupBy("w").agg(bit_or(col("bits")).as("bits"))

  /** Bloom filter over `col`'s distinct values as (word, bits) rows:
    * nHashes bit positions per key from double hashing (h1 + i*h2,
    * the standard Kirsch-Mitzenmacher construction), packed into
    * 32-bit words so shifts stay far from 64-bit overflow in any
    * engine. Build is one explode (x nHashes) + groupBy(word) bit_or
    * — order-free, partial-aggregated map-side; the result is at most
    * bits/32 rows, a broadcastable few-KB table. */
  def bloomBuild(df: DataFrame, valueCol: String, bits: Int = 8192,
      nHashes: Int = 4, salt: String = "bloom"): DataFrame = {
    require(bits % 32 == 0, s"bits must pack into 32-bit words: $bits")
    bloomPositions(df, valueCol, bits, nHashes, salt)
      .select(col("w"),
        // expr: the Scala shiftleft() overload only takes a literal
        // shift amount; the SQL form shifts by a column
        expr("shiftleft(1L, CAST(p % 32 AS INT))").as("mask"))
      .groupBy("w").agg(bit_or(col("mask")).as("bits"))
  }

  /** Probe `probe(valueCol)` against a built filter: a key is a
    * maybe-member iff ALL its nHashes positions are set. Output
    * (key, maybe_member 0/1); false positives are a deterministic
    * function of the hashes, so the exact same keys false-positive in
    * every engine. The filter side is tiny and broadcast — the scan
    * side never shuffles for the membership test itself. */
  def bloomProbe(probe: DataFrame, filter: DataFrame, valueCol: String,
      bits: Int = 8192, nHashes: Int = 4,
      salt: String = "bloom"): DataFrame =
    bloomPositions(probe, valueCol, bits, nHashes, salt)
      .join(broadcast(filter), Seq("w"), "left")
      .select(col("key"),
        when(coalesce(col("bits"), lit(0L))
          .bitwiseAND(expr("shiftleft(1L, CAST(p % 32 AS INT))"))
          =!= 0L, lit(1L)).otherwise(lit(0L)).as("hit"))
      .groupBy("key").agg(min("hit").as("maybe_member"))

  /** Count-min sketch over every ROW of `valueCol` (a multiset — no
    * distinct): depth rows of width counters as (r, p, cnt) triples,
    * at most depth*width rows regardless of input size. Positions are
    * md5-derived per depth row, so the sketch — and every estimate
    * read from it — is bit-identical in any engine and at any
    * parallelism (counter increments are integer sums). The classic
    * mergeable heavy-hitter primitive: build per partition/day, sum
    * counters to merge ([[cmsMerge]]), never re-scan history. */
  def cmsBuild(df: DataFrame, valueCol: String, width: Int,
      depth: Int, salt: String = "cms"): DataFrame =
    df.filter(col(valueCol).isNotNull)
      .select(col(valueCol).cast("string").as("key"))
      // Kirsch-Mitzenmacher positions p_r = (h1 + r·h2) mod width
      // from ONE md5 digest (h1/h2 are disjoint digit ranges of the
      // same digest; codegen subexpression elimination evaluates the
      // md5 once) — the depth× per-row md5 of the naive per-row-r
      // hash was the dominant scan cost, exactly as in bloomPreJoin
      .select(hash60(concat(lit(s"$salt:"), col("key"))).as("h1"),
        hash60b(concat(lit(s"$salt:"), col("key"))).as("h2"),
        explode(sequence(lit(0), lit(depth - 1))).as("r"))
      .select(col("r"),
        ((col("h1") + col("r") * col("h2")) % width).as("p"))
      .groupBy("r", "p").agg(count(lit(1)).as("cnt"))

  /** [[cmsBuild]] through the native one-pass aggregate
    * (`graft_cms`, [[graft.expressions.CmsCountersAgg]]): same
    * counters bit-for-bit (parity spec'd), but each row folds into a
    * width×depth long buffer with array increments instead of
    * exploding depth rows through the hash aggregate, and the
    * exchange carries ONE buffer per partition. Output shape matches
    * cmsBuild — (r, p, cnt) rows, zero counters omitted — so the two
    * builds interchange under [[cmsEstimate]] / [[cmsMerge]] /
    * [[cmsJoinSizeEstimate]]. Requires the GraftExtensions session
    * config. */
  def cmsBuildNative(df: DataFrame, valueCol: String, width: Int,
      depth: Int, salt: String = "cms"): DataFrame =
    df.filter(col(valueCol).isNotNull)
      .select(concat(lit(s"$salt:"), col(valueCol).cast("string"))
        .as("k"))
      .agg(call_function("graft_cms", col("k"), lit(width), lit(depth))
        .as("buf"))
      .select(posexplode(col("buf")).as(Seq("i", "cnt")))
      .filter(col("cnt") > 0)
      .select(expr(s"CAST(i DIV $width AS INT)").as("r"),
        expr(s"CAST(i % $width AS BIGINT)").as("p"),
        col("cnt"))

  /** Merge count-min sketches of the same (width, depth, salt):
    * counter-wise sum — order-free, exact. */
  def cmsMerge(sketches: DataFrame*): DataFrame =
    sketches.reduce(_ unionByName _)
      .groupBy("r", "p").agg(sum("cnt").as("cnt"))

  /** Point-estimate counts for `keys` from a built sketch: min over
    * the depth counters each key hashes to — never an underestimate,
    * over by at most the collision mass. The sketch is broadcast
    * (KBs); the probe side stays narrow until the per-key min. */
  def cmsEstimate(keys: DataFrame, cms: DataFrame, valueCol: String,
      width: Int, depth: Int, salt: String = "cms"): DataFrame =
    keys.filter(col(valueCol).isNotNull)
      .select(col(valueCol).as("key")).distinct()
      .select(col("key"),
        hash60(concat(lit(s"$salt:"), col("key").cast("string")))
          .as("h1"),
        hash60b(concat(lit(s"$salt:"), col("key").cast("string")))
          .as("h2"),
        explode(sequence(lit(0), lit(depth - 1))).as("r"))
      .select(col("key"), col("r"),
        ((col("h1") + col("r") * col("h2")) % width).as("p"))
      .join(broadcast(cms), Seq("r", "p"), "left")
      .groupBy("key")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_n"))

  /** Join-size estimate from two [[cmsBuild]] sketches over the join
    * keys — the CMS inner-product (AMS-style) estimator: per depth
    * row r, est_r = Σ_p cntA(r,p)·cntB(r,p); the estimate is
    * min_r est_r, never below the true Σ_k a(k)·b(k) (collisions
    * only add). Planner support at 100 TB: pick shuffle strategy,
    * broadcast eligibility, or skew handling from two KB-sized
    * sketches without touching either table. Exact-integer end to
    * end, so the estimate itself is oracle-checkable. */
  def cmsJoinSizeEstimate(cmsA: DataFrame, cmsB: DataFrame): DataFrame =
    cmsA.select(col("r"), col("p"), col("cnt").as("cnt_a"))
      .join(cmsB.select(col("r"), col("p"), col("cnt").as("cnt_b")),
        Seq("r", "p"))
      .groupBy("r").agg(sum(col("cnt_a") * col("cnt_b")).as("est"))
      .agg(min("est").as("est_n"))

  /** EXACT φ-heavy hitters by candidate-then-verify (the
    * Misra–Gries 1982 summary run per partition, then one exact
    * recount): returns precisely the values with count > n/k and
    * their EXACT counts — never an estimate. Pass 1 keeps k
    * counters per partition (mapPartitions — genuine per-partition
    * imperative state); any value with global count > n/k must
    * exceed its share in at least one partition (counts sum), so
    * the union of partition candidates is a guaranteed SUPERSET of
    * the answer. Pass 2 semi-joins the corpus to the candidate set
    * and recounts exactly; the filter makes the output independent
    * of partitioning (candidates vary with layout, the answer
    * cannot — which is what lets an oracle grade it).
    *
    * The scale win over a plain groupBy-HAVING: the shuffle carries
    * only rows matching ≤ P·k candidate values (broadcast-joinable),
    * not one row per DISTINCT value — the difference between
    * shuffling a url-cardinality aggregate and a few hundred rows at
    * 100 TB. Output (v, cnt, share_milli), share as exact floor
    * milli of n. */
  def heavyHittersExact(df: DataFrame, valueCol: String,
      k: Int): DataFrame = {
    require(k >= 2 && k <= 100000, s"k must be in [2, 100000]: $k")
    val spark = df.sparkSession
    import spark.implicits._
    val vals = df.filter(col(valueCol).isNotNull)
      .select(col(valueCol).cast("string").as("v"))
      .localCheckpoint(eager = false)
    val cands = vals.as[String].mapPartitions { it =>
      val counters = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach { v =>
        counters.get(v) match {
          case Some(c) => counters(v) = c + 1
          case None if counters.size < k => counters(v) = 1L
          case None =>
            // decrement-all: one unit off every counter, zeros evicted
            counters.keys.toArray.foreach { key =>
              val c = counters(key) - 1
              if (c == 0) counters.remove(key) else counters(key) = c
            }
        }
      }
      counters.keysIterator
    }.toDF("v").distinct()
    val n = vals.count()
    require(n > 0, "heavyHittersExact needs at least one non-null row")
    // the result is PROVABLY tiny (< k rows: each survivor holds
    // > n/k of the mass), so materialize it eagerly and release the
    // corpus-sized checkpoint — returning a lazy frame over `vals`
    // would pin the whole column for the session (the dead-block
    // leak [[Lineage]] exists for)
    val out = heavyHittersRecount(vals, cands, k, n)
      .localCheckpoint(eager = true)
    Lineage.freeLocalCheckpoint(vals)
    out
  }

  /** The exact-recount stage of [[heavyHittersExact]], split out so
    * its plan shape (semi-join to the candidate sliver, never a
    * full-cardinality aggregate) stays PlanSpec-pinnable — the public
    * entry eagerly materializes the tiny result for block hygiene,
    * which hides the pipeline from the returned frame's plan. */
  private[graft] def heavyHittersRecount(vals: DataFrame,
      cands: DataFrame, k: Int, n: Long): DataFrame =
    vals.join(cands, Seq("v"), "left_semi")
      .groupBy("v").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * k > lit(n))
      .select(col("v"), col("cnt"),
        expr(s"cnt * 1000 div ${n}L").as("share_milli"))

  /** EXACT k-th order statistic WITHOUT a global sort — radix
    * bisection on the value's bits (the distributed selection
    * pattern behind exact medians at corpus scale, where a
    * single-partition ORDER BY is the thing you can't do): 4 rounds,
    * each one a filter + 65536-bucket map-side-combined count + a
    * ≤65536-row driver fold that picks the 16-bit word containing
    * the k-th value and descends. Total work is 4 narrow scans of
    * one column — no shuffle ever carries data rows, only counters.
    * Negative values order correctly via the sign-flip bijection
    * (x XOR MIN_LONG is order-isomorphic to unsigned). `k` is the
    * 1-based ascending rank; the result is the exact multiset order
    * statistic, deterministic under ties by construction (only
    * VALUES are compared, never row order).
    *
    * The column is localCheckpointed so the 8 rounds rescan
    * materialized longs, not the source; on a cluster you would skip
    * the checkpoint and let each round re-scan the pruned parquet
    * column — same plan shape, storage-free. Returns one row
    * (k, value). */
  def exactKth(df: DataFrame, valueCol: String, k: Long): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    exactKths(df, valueCol, _ => Seq(k))
  }

  /** [[exactKth]] for SEVERAL ranks over one column in one descent:
    * the per-level scan serves every rank at once (scopes union into
    * one IN-prefix filter, counters key by (prefix, word)), so three
    * quantile probes cost the same 4 column scans one does — not 12
    * plus three separate materializations. `ksOf` receives the
    * non-null row count (known for free from round 0's histogram, so
    * no separate count() job) and returns the 1-based ascending
    * ranks; the result has one (k, value) row per rank. */
  def exactKths(df: DataFrame, valueCol: String,
      ksOf: Long => Seq[Long]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val v = df.filter(col(valueCol).isNotNull)
      .select(col(valueCol).cast("long").as("__x"))
      .withColumn("__u", expr(s"__x ^ ${Long.MinValue}L"))
      .localCheckpoint(eager = false)
    // 16-bit radix (4 rounds of 65536 map-side-combined counters per
    // live prefix — still metadata-sized collects) instead of 8
    // rounds of 256: the descent's cost is the per-round SCAN, so
    // halving the rounds halves the work.
    // state per rank: (accumulated prefix, remaining rank inside it)
    var states: Seq[(Long, Long)] = Seq.empty
    var ks: Seq[Long] = Seq.empty
    var level = 0
    while (level < 4) {
      val shift = 48 - 16 * level
      // unsigned shifts: __u's top bit is live (the sign-flip moves
      // negatives below positives), so an arithmetic >> would
      // sign-extend and never equal the accumulated masked prefix.
      // Level 0 has no prefix (and >>> 64 is a no-op in the JVM), so
      // its prefix key is a literal 0.
      val preExpr =
        if (level == 0) "CAST(0 AS BIGINT)"
        else s"shiftrightunsigned(__u, ${shift + 16})"
      val scope =
        if (level == 0) v
        else {
          val live = states.map(_._1).distinct
          v.filter(expr(
            s"$preExpr IN (${live.map(p => s"${p}L").mkString(",")})"))
        }
      val counts = scope
        .groupBy(expr(preExpr).as("__pre"),
          expr(s"shiftrightunsigned(__u, $shift) & 65535").as("__b"))
        .agg(count(lit(1)).as("__c"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val byPre: Map[Long, Seq[(Long, Long)]] = counts
        .groupBy(_._1).view
        .mapValues(_.map(t => (t._2, t._3)).sortBy(_._1).toSeq).toMap
      if (level == 0) {
        val n = counts.map(_._3).sum
        ks = ksOf(n)
        require(ks.nonEmpty, "exactKths needs at least one rank")
        ks.foreach { k =>
          require(k >= 1 && k <= n,
            s"k=$k outside the non-null row count $n")
        }
        states = ks.map(k => (0L, k))
      }
      states = states.map { case (prefix, remaining) =>
        val buckets = byPre.getOrElse(prefix,
          throw new IllegalStateException(
            s"radix descent lost prefix $prefix at level $level"))
        var acc = 0L
        val (word, below) = buckets.collectFirst {
          case (b, c) if { acc += c; acc >= remaining } => (b, acc - c)
        }.getOrElse(throw new IllegalStateException(
          s"radix descent lost rank $remaining at level $level"))
        ((prefix << 16) | word, remaining - below)
      }
      level += 1
    }
    // the returned literal frame references NOTHING of `v` — release
    // the materialized column now instead of pinning it for the
    // session (dead blocks squeeze every later query's storage)
    Lineage.freeLocalCheckpoint(v)
    ks.zip(states)
      .map { case (k, (prefix, _)) => (k, prefix ^ Long.MinValue) }
      .toDF("k", "value")
  }

  /** Bloom-accelerated equi-join: build the filter on the small
    * side's keys, collect it (bits/32 longs — a few KB, the value a
    * real cluster broadcasts to every executor), and pre-filter the
    * big side with a pure narrow expression BEFORE the join shuffle.
    * Blooms have no false negatives, so the subsequent exact join
    * returns row-for-row the plain join's result; the win is that
    * non-matching big-side rows (the overwhelming majority when the
    * dim table is selective) never reach the exchange — at 100 TB
    * that is the difference between shuffling the fact table and
    * shuffling its matching sliver. False positives only cost: they
    * ride to the join and drop out there. */
  def bloomPreJoin(big: DataFrame, small: DataFrame, bigKey: String,
      smallKey: String, bits: Int = 8192, nHashes: Int = 4,
      salt: String = "bloom"): DataFrame = {
    val words = new Array[Long](bits / 32)
    bloomBuild(small, smallKey, bits, nHashes, salt).collect()
      .foreach(r => words(r.getLong(0).toInt) = r.getLong(1))
    // one native call per fact row: one md5, all positions probed
    // in-kernel (the column formulation re-evaluates the md5→conv
    // chain per probe conjunct — a per-row multiplier on the scan)
    val member = call_function("graft_bloom_member",
      concat(lit(s"$salt:"), col(bigKey).cast("string")),
      lit(words), lit(bits), lit(nHashes))
    big.filter(col(bigKey).isNotNull && member)
      .join(small, col(bigKey) === col(smallKey))
  }

  /** Shared position expansion: distinct keys x nHashes positions,
    * with the word index `w` = p / 32 precomputed. */
  private def bloomPositions(df: DataFrame, valueCol: String, bits: Int,
      nHashes: Int, salt: String): DataFrame = {
    val key = col(valueCol).cast("string")
    // both hashes come from ONE md5 digest (digits 1-15 / 16-30):
    // half the per-row digest work of two salted hashes; codegen CSE
    // evaluates the shared md5 once
    val salted = concat(lit(s"$salt:"), key)
    df.filter(col(valueCol).isNotNull)
      .select(col(valueCol).as("key"),
        hash60(salted).as("h1"),
        graft.functions.hash60b(salted).as("h2"))
      .distinct()
      .select(col("key"), col("h1"), col("h2"),
        explode(sequence(lit(0), lit(nHashes - 1))).as("i"))
      .select(col("key"),
        ((col("h1") + col("i") * col("h2")) % bits).as("p"))
      .withColumn("w", expr("p div 32"))
  }
}
