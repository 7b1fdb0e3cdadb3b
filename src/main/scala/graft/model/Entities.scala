package graft.model

import java.sql.Timestamp

/** Typed entity layer (Dataset[T] surface) for the core tables —
  * where compile-time safety pays: pipeline outputs and test
  * fixtures. The untyped DataFrame surface stays primary (the
  * reference's schema is mapping-driven/dynamic, SURVEY.md §1.3);
  * these case classes give `ds.as[Product]` ergonomics at the edges.
  */
object Entities {

  final case class ProductCollection(
      collection_id: String,
      master_code: String,
      collection_name: Option[String],
      images: Seq[String],
      attributes_raw: Option[String],
      video_url: Option[String])

  final case class Product(
      sku: String,
      master_code: String,
      collection_id: String,
      selling_price: Option[Double],
      inventory: Option[Long])

  final case class AttributePair(
      attr_key: String,
      attr_value: String)

  final case class Translation(
      entity_id: String,
      lang_code: String,
      field_name: String,
      value: String,
      modified_on: Option[Timestamp])
}
