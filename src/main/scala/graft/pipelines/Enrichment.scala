package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions._
import graft.operators.Services

/** The enrichment DAG (SURVEY.md §3.3) — the reference's
  * `run_orchestrator.py` → `db_orchestrator.main()` per-product loop
  * (/root/reference/utils/details_translator/db_orchestrator.py:183-319)
  * and its CSV-handoff variant (numbered scripts 1-5) as ONE Spark
  * job:
  *
  *   html → posexplode(img srcs)            (F16 + G2, script 1)
  *     → ocr tokens per image               (U5 + G3, script 2)
  *     → ORDERED group-concat per image     (A8,       script 3)
  *     → ordered doc-level concat           (A8/W3)
  *     → translate                          (U1/U2,    script 4)
  *     → structured logistics extraction    (U3,       script 5)
  *
  * Stage boundaries (two shuffles, keyed on the doc id) replace the
  * reference's five CSV files. Services are the deterministic stubs;
  * swapping in real OCR/translate backends (Services.Remote inside
  * mapPartitions) changes no plan shape.
  *
  * A8's order sensitivity is the landmine the reference steps around
  * with pandas file order (3_group_ocr_results_by_img_&_collection
  * .py:31-33): here every concat sorts an array of (index, text)
  * structs BEFORE joining, so the result is order-deterministic under
  * any partitioning.
  */
object Enrichment {

  /** Per-image OCR'd text: html → (id, image_index, url, ocr_text). */
  def ocrImages(df: DataFrame, idCol: String, htmlCol: Column,
      maxTokens: Int = 6): DataFrame =
    df.select(col(idCol), posexplode(extractImgSrcs(htmlCol))
        .as(Seq("image_index", "url")))
      .withColumn("ocr_tokens",
        Services.ocrStub(regexp_replace(col("url"), "[/:.]+", " "),
          maxTokens))
      .withColumn("ocr_text", array_join(col("ocr_tokens"), " "))

  /** Ordered doc-level concat of per-image texts (A8): sort the
    * (image_index, ocr_text) structs inside the group, then join. */
  def groupOcr(perImage: DataFrame, idCol: String): DataFrame =
    perImage.groupBy(idCol)
      .agg(
        count(lit(1)).as("n_images"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("image_index"),
              col("ocr_text")))),
            x => x.getField("ocr_text")), " | ").as("full_text"))

  /** The complete DAG: html → translated + structured logistics. */
  def run(df: DataFrame, idCol: String, htmlCol: Column): DataFrame = {
    val grouped = groupOcr(ocrImages(df, idCol, htmlCol), idCol)
    grouped
      .withColumn("translated",
        Services.translateStub(col("full_text"), "zh", "en"))
      .withColumn("logistics",
        Services.extractLogisticsStub(col("translated")))
  }
}
