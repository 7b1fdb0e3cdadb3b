package graft.model

import org.apache.spark.sql.types._

/** StructType registry for the reference's data model (SURVEY.md §1)
  * — the 33-table PostgreSQL schema of
  * /root/reference/utils/importer/backup_before_fix.sql:42-525
  * re-expressed for Parquet-at-rest. Conventions (documented
  * deviations):
  *  - uuid → StringType, deterministic sha-derived ids (F12) so
  *    results are oracle-hashable (reference uses gen_random_uuid());
  *  - numeric(price/weight) → DecimalType(12,2)/(12,3);
  *  - every table carries created_on/modified_on (the reference adds
  *    them via add_timestamp_fields.sql:10-11), stamped by the merge
  *    writer (M7) instead of triggers;
  *  - the circular entity→translation uuid pointer (e.g.
  *    category.category_name → category_translations.id,
  *    backup_before_fix.sql:42-45 + FK :29046) is kept as a plain
  *    string column; load order translations-first makes the 3-step
  *    placeholder dance (ETL.py:329-351) unnecessary.
  */
object Schemas {

  private val ts = Seq(
    StructField("created_on", TimestampType),
    StructField("modified_on", TimestampType))

  private def table(fields: StructField*): StructType =
    StructType(fields ++ ts)

  private def f(name: String, t: DataType, nullable: Boolean = true) =
    StructField(name, t, nullable)

  val id: StructField = f("id", StringType, nullable = false)

  /** lang(id, lang_code) — backup_before_fix.sql:183. */
  val lang: StructType = table(id, f("lang_code", StringType, false))

  /** category + its translation EAV — backup_before_fix.sql:42-61. */
  val category: StructType = table(id,
    f("category_name", StringType),  // uuid → category_translations.id
    f("parent_category_id", StringType))
  val categoryTranslations: StructType = table(id,
    f("category_id", StringType), f("lang_id", StringType),
    f("field_name", StringType), f("value", StringType))

  /** currency — backup_before_fix.sql:63-84. */
  val currency: StructType = table(id,
    f("currency_name", StringType), f("currency_code", StringType),
    f("currency_num", LongType))

  /** product_collection (master level) — backup_before_fix.sql:349-364. */
  val productCollection: StructType = table(id,
    f("master_code", StringType, false),
    f("collection_name", StringType),
    f("inventory", LongType),
    f("weight", DecimalType(12, 3)),
    f("images", ArrayType(StringType)),
    f("video_url", StringType),
    f("custom_attributes_raw", StringType))

  /** product (variant level) — backup_before_fix.sql:193-206. */
  val product: StructType = table(id,
    f("product_collection_sku", StringType, false),
    f("product_collection_master_code", StringType),
    f("product_attributes_raw_collection_id", StringType),
    f("product_selling_price", DecimalType(12, 2)),
    f("inventory", LongType),
    f("long", DoubleType), f("width", DoubleType), f("high", DoubleType),
    f("product_in_collection_iindex", IntegerType))

  /** EAV attribute dictionary — backup_before_fix.sql:229,268,241. */
  val productAttributeKeys: StructType = table(id,
    f("attr_key", StringType, false))
  val productAttributeValues: StructType = table(id,
    f("attr_key_id", StringType, false), f("attr_value", StringType, false))
  val productAttributeProduct: StructType = table(id,
    f("product_id", StringType, false),
    f("attr_value_id", StringType, false))

  /** per-language attribute translations — backup_before_fix.sql:215,254. */
  val productAttributeKeyTranslations: StructType = table(id,
    f("attr_key_id", StringType), f("lang_code", StringType),
    f("value", StringType))
  val productAttributeValueTranslations: StructType = table(id,
    f("attr_value_id", StringType), f("lang_code", StringType),
    f("value", StringType))

  /** older-generation attribute pipeline — backup_before_fix.sql:113,127. */
  val customAttributesRaw: StructType = table(id,
    f("custom_attributes_raw", StringType))
  val customAttributesParsed: StructType = table(id,
    f("attr_key", StringType), f("attr_value", StringType))

  /** link (bridge) tables — backup_before_fix.sql:373-486. */
  def link(a: String, b: String): StructType =
    table(id, f(a, StringType, false), f(b, StringType, false))
  val productCollectionCategory: StructType =
    link("product_collection_id", "category_id")
  val productCollectionCustomAttributesRaw: StructType =
    link("product_collection_id", "custom_attributes_raw_id")
  val productCollectionCustomAttributesParsed: StructType =
    link("product_collection_id", "custom_attributes_parsed_id")
  val productCollectionDetailsHtml: StructType =
    link("product_collection_id", "details_html_id")
  val productCollectionImgArrayLink: StructType =
    link("product_collection_id", "product_collection_img_array_id")

  /** details_html + translations — backup_before_fix.sql:166. */
  val detailsHtml: StructType = table(id, f("details_html", StringType))
  val detailsHtmlTranslations: StructType = table(id,
    f("details_html_id", StringType), f("lang_id", StringType),
    f("field_name", StringType), f("value", StringType))

  /** image ledger — backup_before_fix.sql:425-433 (I5 resumable
    * download keyed on (sku, url)). */
  val productCollectionImages: StructType = table(
    f("id", IntegerType, false),
    f("collection_sku", StringType), f("url", StringType),
    f("url_local", StringType), f("image_index", IntegerType))
  val productCollectionImgArray: StructType = table(id,
    f("product_collection_img_array", ArrayType(StringType)))

  /** collection-name translations — backup_before_fix.sql:489-516. */
  val productCollectionTranslations: StructType = table(id,
    f("product_collection_id", StringType), f("lang_id", StringType),
    f("field_name", StringType), f("value", StringType))

  /** source + translations — backup_before_fix.sql:516+. */
  val source: StructType = table(id, f("source_name", StringType))
  val sourceTranslations: StructType = table(id,
    f("source_id", StringType), f("lang_id", StringType),
    f("field_name", StringType), f("value", StringType))

  /** Every registered table, by reference name. */
  val all: Map[String, StructType] = Map(
    "lang" -> lang,
    "category" -> category,
    "category_translations" -> categoryTranslations,
    "currency" -> currency,
    "product_collection" -> productCollection,
    "product" -> product,
    "product_attribute_keys" -> productAttributeKeys,
    "product_attribute_values" -> productAttributeValues,
    "product_attribute_product" -> productAttributeProduct,
    "product_attribute_key_translations" -> productAttributeKeyTranslations,
    "product_attribute_value_translations" ->
      productAttributeValueTranslations,
    "custom_attributes_raw" -> customAttributesRaw,
    "custom_attributes_parsed" -> customAttributesParsed,
    "product_collection_category" -> productCollectionCategory,
    "product_collection_custom_attributes_raw" ->
      productCollectionCustomAttributesRaw,
    "product_collection_custom_attributes_parsed" ->
      productCollectionCustomAttributesParsed,
    "product_collection_details_html" -> productCollectionDetailsHtml,
    "product_collection_product_collection_img_array" ->
      productCollectionImgArrayLink,
    "details_html" -> detailsHtml,
    "details_html_translations" -> detailsHtmlTranslations,
    "product_collection_images" -> productCollectionImages,
    "product_collection_img_array" -> productCollectionImgArray,
    "product_collection_translations" -> productCollectionTranslations,
    "source" -> source,
    "source_translations" -> sourceTranslations)

  /** M7 schema evolution: align a frame to a target schema — missing
    * columns appear as typed nulls, extra columns are kept (Parquet
    * schema merge handles them at read). Replaces ALTER TABLE ADD
    * COLUMN IF NOT EXISTS (add_inherited_fields.sql:4-7). */
  def evolveTo(df: org.apache.spark.sql.DataFrame,
      target: StructType): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val existing = df.columns.toSet
    val added = target.fields.filterNot(fd => existing.contains(fd.name))
      .foldLeft(df)((d, fd) =>
        d.withColumn(fd.name, lit(null).cast(fd.dataType)))
    val order = target.fieldNames ++
      df.columns.filterNot(target.fieldNames.contains)
    added.select(order.map(col).toIndexedSeq: _*)
  }
}
