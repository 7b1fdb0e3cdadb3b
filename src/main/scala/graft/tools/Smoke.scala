package graft.tools

import org.apache.spark.sql.SparkSession

/** Replica of the driver's smoke check: a BARE session (no graft
  * extensions, no legacy flags) running SparkEntry.entry — guards
  * against the flagship query ever depending on session config the
  * driver doesn't set. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"[smoke] entry rows = $n")
    assert(n > 0, "entry must return rows")
    spark.stop()
  }
}
