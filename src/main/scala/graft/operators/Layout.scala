package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: multi-dimensional clustering so range
  * predicates on EITHER dimension prune file-level min/max zones —
  * the lakehouse trick (Z-ORDER) expressed with plain Spark
  * primitives: a deterministic bit-interleave column +
  * repartitionByRange + sortWithinPartitions before the write.
  */
object Layout {

  /** Morton (Z-order) value of two non-negative dimensions, `bits`
    * bits each: x occupies the even bit positions, y the odd ones.
    * Pure integer bit arithmetic — codegen'd, engine-reproducible.
    * Callers clamp/bucket raw values into [0, 2^bits) first. */
  def zOrderValue(x: Column, y: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 31, s"bits must be in [1, 31]: $bits")
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** Cluster a frame for writing: add the z-value over two bucketed
    * dimensions, range-partition on it, sort within partitions — the
    * exact layout a `write.parquet` then persists, giving file-zone
    * min/max locality on both dimensions. */
  def zOrderBy(df: DataFrame, x: Column, y: Column, bits: Int,
      partitions: Int): DataFrame =
    df.withColumn("__z", zOrderValue(x, y, bits))
      .repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions(col("__z"))

  /** Hilbert-curve value of two non-negative dimensions, `bits` bits
    * each — the space-filling order whose per-level rotations remove
    * Morton's quadrant-seam jumps, tightening file zone min/max
    * ranges further on the same data (the Iceberg/liquid-clustering
    * upgrade over [[zOrderValue]]). The level-to-level coordinate
    * rotation makes an unrolled Column tree double per level, so the
    * walk is the native `graft_hilbert` expression: one per-row loop
    * inside whole-stage codegen ([[graft.expressions.Hilbert]]).
    * Callers clamp/bucket raw values into [0, 2^bits) first;
    * out-of-range inputs fail loudly rather than fold into a wrong
    * cell. */
  def hilbertValue(x: Column, y: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 31, s"bits must be in [1, 31]: $bits")
    call_function("graft_hilbert", x.cast("long"), y.cast("long"),
      lit(bits))
  }

  /** [[zOrderBy]] with the Hilbert value as the clustering key. */
  def hilbertOrderBy(df: DataFrame, x: Column, y: Column, bits: Int,
      partitions: Int): DataFrame =
    df.withColumn("__h", hilbertValue(x, y, bits))
      .repartitionByRange(partitions, col("__h"))
      .sortWithinPartitions(col("__h"))

  /** n-DIMENSIONAL Morton value — real tables cluster 3-4 columns
    * (ingest date + business key + tenant): bit i of dimension d
    * lands at interleaved position n·i + d. Same contract as
    * [[zOrderValue]]: callers clamp/bucket into [0, 2^bits) first;
    * n·bits must fit a signed long. */
  def zOrderValueNd(cols: Seq[Column], bits: Int): Column = {
    val n = cols.size
    require(n >= 2, s"need at least 2 dimensions: $n")
    require(bits > 0 && n.toLong * bits <= 62,
      s"dims*bits must be in (0, 62]: $n*$bits")
    (for {
      i <- 0 until bits
      (c, d) <- cols.zipWithIndex
    } yield shiftleft(shiftright(c, i).bitwiseAND(lit(1L)),
      n * i + d)).reduce(_ + _)
  }

  /** n-DIMENSIONAL Hilbert value (Skilling 2004's transpose walk,
    * native `graft_hilbert_nd` — [[graft.expressions.HilbertNdExpr]]):
    * the [[hilbertValue]] upgrade for 3-4 clustering columns. NULL
    * coordinates fail loudly (bucket/coalesce first). */
  def hilbertValueNd(cols: Seq[Column], bits: Int): Column = {
    val n = cols.size
    require(n >= 2, s"need at least 2 dimensions: $n")
    require(bits > 0 && n.toLong * bits <= 62,
      s"dims*bits must be in (0, 62]: $n*$bits")
    call_function("graft_hilbert_nd",
      array(cols.map(_.cast("long")): _*), lit(bits))
  }

  /** [[hilbertOrderBy]] over n dimensions — the write-side layout
    * for multi-column clustered tables. */
  def hilbertOrderByNd(df: DataFrame, cols: Seq[Column], bits: Int,
      partitions: Int): DataFrame =
    df.withColumn("__h", hilbertValueNd(cols, bits))
      .repartitionByRange(partitions, col("__h"))
      .sortWithinPartitions(col("__h"))

  /** Per-bucket zone map — the min/max statistics a writer persists
    * per file/row-group, materialized as a queryable table: one row
    * per bucket with its row count and the min/max of each stat
    * column. One partial-aggregated exchange; the result is
    * bucket-count-sized (thousands of rows for a 100 TB table), the
    * thing planners consult instead of data. */
  def zoneMap(df: DataFrame, bucket: Column,
      statCols: Seq[String]): DataFrame = {
    require(statCols.nonEmpty, "zoneMap needs at least one stat column")
    val stats = statCols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    df.groupBy(bucket.as("bucket"))
      .agg(count(lit(1)).as("n"), stats: _*)
  }

  /** The file-skipping decision over a [[zoneMap]]: zones a range
    * predicate `lo <= statCol <= hi` cannot prove empty — a zone
    * survives iff NOT (max < lo OR min > hi). Evaluated entirely on
    * the zone table; the data itself is untouched. The selected
    * bucket list is what a reader feeds back as a partition/file
    * filter — on a z-ordered layout either dimension's range
    * predicate prunes most zones. */
  def zonesToRead(zones: DataFrame, statCol: String, lo: Column,
      hi: Column): DataFrame =
    zones.filter(!(col(s"max_$statCol") < lo || col(s"min_$statCol") > hi))

  /** Data-skipping effectiveness report for a WORKLOAD — the number
    * every layout decision (Z-order vs linear, zone granularity)
    * should be justified by before a 100 TB rewrite: for each range
    * predicate (pred_id, lo, hi) in `preds`, how many zones and rows
    * the [[zonesToRead]] rule scans vs skips, as exact integer milli
    * ratios. A predicate whose row_skip_milli is near 0 on the
    * proposed layout does not pay for the rewrite.
    *
    * Scale shape: the zone table is METADATA-sized (one row per
    * file/zone — millions of rows for 100 TB, never the data) and the
    * workload is config-sized and broadcast; one keyed aggregate over
    * zones×preds plus one broadcast totals row. The data itself is
    * never touched. */
  def skippingReport(zones: DataFrame, statCol: String,
      preds: DataFrame): DataFrame = {
    val tot = zones.agg(count(lit(1)).as("zones_total"),
      sum(col("n")).as("rows_total"))
    val scan = !(col(s"max_$statCol") < col("lo") ||
      col(s"min_$statCol") > col("hi"))
    zones.crossJoin(broadcast(preds))
      .withColumn("__scan", scan)
      .groupBy(col("pred_id"), col("lo"), col("hi"))
      .agg(sum(when(col("__scan"), 1L).otherwise(0L))
          .as("zones_scanned"),
        sum(when(col("__scan"), col("n")).otherwise(0L))
          .as("rows_scanned"))
      .crossJoin(broadcast(tot))
      .withColumn("zone_skip_milli",
        expr("CASE WHEN zones_total > 0 THEN " +
          "((zones_total - zones_scanned) * 1000) div zones_total " +
          "ELSE 0L END"))
      .withColumn("row_skip_milli",
        expr("CASE WHEN rows_total > 0 THEN " +
          "((rows_total - rows_scanned) * 1000) div rows_total " +
          "ELSE 0L END"))
      .select("pred_id", "lo", "hi", "zones_scanned", "zones_total",
        "rows_scanned", "rows_total", "zone_skip_milli",
        "row_skip_milli")
  }

  /** Compaction plan for the small-files problem: given a file-stats
    * frame (one row per data file with its table partition and byte
    * size — what a catalog listing returns), assign each file to a
    * compaction group of ~`targetBytes` within its partition. Group k
    * holds the maximal run of files (in `fileCol` order) whose
    * cumulative size BEFORE each file is < (k+1)·targetBytes —
    * prefix-sum packing, so a file larger than the target gets a
    * group of its own (it is already compact). The rewrite job then
    * coalesces each (partition, group) into one output file.
    *
    * Scale shape: the input is file-COUNT-sized (metadata, millions
    * of rows for a 100 TB table, never the data); one shuffle on the
    * table partition key; the running sum's window partitions by the
    * same key, so per-partition state is one partition's file list.
    * Deterministic by (partition, file) order — replans are
    * idempotent, and a planned group maps 1:1 to one rewrite task. */
  def compactionPlan(files: DataFrame, partCol: String, fileCol: String,
      bytesCol: String, targetBytes: Long): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(partCol)).orderBy(col(fileCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    files.withColumn("__cum", sum(col(bytesCol)).over(w))
      .withColumn("grp",
        floor((col("__cum") - col(bytesCol)) / targetBytes).cast("long"))
      .drop("__cum")
  }

  /** Per-group compaction report: file count and byte total — the
    * planner's output summary (groups with n_files = 1 need no
    * rewrite; the rest each become one coalesce task). */
  def compactionStats(planned: DataFrame, partCol: String,
      bytesCol: String): DataFrame =
    planned.groupBy(col(partCol), col("grp"))
      .agg(count(lit(1)).as("n_files"),
        sum(col(bytesCol)).as("bytes"))

  /** Write `df` as a hash-BUCKETED, bucket-sorted parquet table (L4):
    * rows land in bucket `hash(key) % nBuckets`, sorted by the key
    * within each bucket, and the bucketing spec is recorded in the
    * catalog. Two tables bucketed the SAME way on their join keys
    * then sort-merge join with ZERO exchange — the shuffle happened
    * once at write time and is amortized over every subsequent join,
    * the single biggest lever for a 100 TB fact table that is joined
    * daily (see [[bucketedJoin]]; PlanSpec pins the no-Exchange
    * plan). `path` makes it an external table so the data lives
    * where the caller says, not in the session warehouse.
    *
    * MANIFEST-NATIVE sibling: lakehouse tables get the same
    * amortized-shuffle join via the `bucket(n, col)` partition
    * transform ([[graft.sources.ManifestBucket]]) — `PARTITIONED BY
    * (bucket(n, k))` on a graft catalog table routes rows by the
    * engine's canonical hash, records exact bucket-id pvals, and
    * two same-bucketed tables storage-partition join exchange-free
    * through the planner (q_z_spj_bucketed pins it). Prefer that
    * path for manifest tables; this parquet+metastore face covers
    * plain-parquet layouts. */
  def writeBucketed(df: DataFrame, table: String, path: String,
      key: String, nBuckets: Int): Unit = {
    require(nBuckets > 0, s"nBuckets must be positive: $nBuckets")
    df.write.mode("overwrite").format("parquet")
      .option("path", path)
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .saveAsTable(table)
  }

  /** Sort-merge join of two co-bucketed tables. The `merge` hint
    * pins the sort-merge strategy (a broadcast pick would hide the
    * demonstration at toy sizes; at fact×fact scale SMJ is what the
    * planner chooses anyway); because both sides' bucketing matches
    * the join keys, the plan contains NO Exchange — each task reads
    * bucket i of both tables and merges. */
  def bucketedJoin(spark: org.apache.spark.sql.SparkSession,
      leftTable: String, rightTable: String, leftKey: String,
      rightKey: String): DataFrame =
    spark.table(leftTable).hint("merge")
      .join(spark.table(rightTable),
        col(leftKey) === col(rightKey))
}
