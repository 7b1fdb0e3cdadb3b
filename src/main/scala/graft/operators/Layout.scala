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
}
