package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Services

/** Source operators (SURVEY.md §2.1, S1-S6).
  *
  * S1/S2 (CSV + mapping CSV) live in pipelines.Importer/ColumnMapping;
  * here: the filesystem binary scan (S5 — the reference's recursive
  * *.jpg walk, /root/reference/utils/details_translator/
  * 2_ocr_from_images.py:27-31) and the HTTP fetch source (S6 — the
  * per-URL image download, /root/reference/utils/
  * product_collection_img_array_processor.py:55-68).
  */
object Sources {

  /** S5: recursive binary-file scan with a glob. One row per file:
    * (path, modificationTime, length, content). Distributed read —
    * each file is a task; Spark handles listing parallelism. */
  def binaryFiles(spark: SparkSession, dir: String,
      glob: String): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .option("recursiveFileLookup", "true")
      .load(dir)

  /** S6: HTTP fetch per URL row — a `Services.Remote`-wrapped call
    * (retry + politeness pacing, I3/I4) applied inside the executors;
    * the provided `fetch` does the actual I/O so tests can inject a
    * deterministic stub. Returns input plus a `body` column. */
  def httpFetch(df: DataFrame, urlCol: String,
      fetch: String => String,
      attempts: Int = 3, backoffMs: Long = 2000,
      minIntervalMs: Long = 500): DataFrame = {
    val remote = Services.Remote(fetch, attempts, backoffMs, minIntervalMs)
    val u = udf((url: String) => remote(url))
    df.withColumn("body", u(col(urlCol)))
  }
}
