package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions._
import graft.operators.Merge

/** The attribute explode + dictionary pipeline (SURVEY.md §3.2) — the
  * reference's `main.py` → parse → per-pair INSERT → per-id link loop
  * (/root/reference/main.py:27-35,
  *  /root/reference/utils/custom_attributes_parser.py:14-75,
  *  /root/reference/utils/product_attributes_etl.py:45-105) as one
  * declarative job: explode(parse) → distinct dictionaries with
  * deterministic ids (A10 get-or-create without the row-at-a-time
  * SELECT-then-INSERT) → anti-join link building (M2).
  *
  * Scale: the dictionaries are distinct-aggregations on the attribute
  * key (tiny cardinality → broadcastable); links shuffle once on the
  * entity id. No step is row-at-a-time and nothing collects.
  */
object Attributes {

  /** G1: one row per (entity, attr_key, attr_value). */
  def explodePairs(df: DataFrame, idCol: String, rawCol: Column): DataFrame =
    df.select(col(idCol), explode(attributePairs(rawCol)).as("p"))
      .select(col(idCol), col("p.attr_key"), col("p.attr_value"))

  /** A10: key dictionary — distinct attr_key, deterministic id. */
  def keyDict(pairs: DataFrame): DataFrame =
    pairs.select("attr_key").distinct()
      .select(deterministicId(lit("ak"), col("attr_key")).as("attr_key_id"),
        col("attr_key"))

  /** A10: value dictionary — distinct (key, value), deterministic id,
    * carrying the key's id. */
  def valueDict(pairs: DataFrame): DataFrame =
    pairs.select("attr_key", "attr_value").distinct()
      .select(
        deterministicId(lit("av"), col("attr_key"), col("attr_value"))
          .as("attr_value_id"),
        deterministicId(lit("ak"), col("attr_key")).as("attr_key_id"),
        col("attr_key"), col("attr_value"))

  /** M2: entity→value link rows, insert-if-absent into `existing`. */
  def links(pairs: DataFrame, idCol: String,
      existing: DataFrame): DataFrame = {
    val fresh = pairs.select(col(idCol),
        deterministicId(lit("av"), col("attr_key"), col("attr_value"))
          .as("attr_value_id"))
      .distinct()
    Merge.insertIfAbsent(existing, fresh, Seq(idCol, "attr_value_id"))
  }
}
