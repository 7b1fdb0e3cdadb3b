package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The load layer — set-based replacements for the reference's
  * row-at-a-time upsert/insert/delete loops (SURVEY.md §2.6).
  *
  * Every operation is a pure DataFrame → DataFrame transform; writers
  * decide atomicity (temp dir + rename). All merges are formulated as
  * anti-join + union so they broadcast the small side and never
  * collect to the driver — the reference's N+1 point-query pattern
  * (/root/reference/utils/importer/ETL.py:512-556) becomes one join.
  *
  * Scale notes: `existing` is assumed big (fact-table sized); `updates`
  * / `inserts` / `tombstones` are assumed small-to-medium (a batch).
  * Catalyst/AQE picks broadcast-hash for the batch side automatically;
  * when both sides are huge the same plans degrade gracefully to
  * sort-merge on the key, which is the correct 100 TB behavior.
  */
object Merge {

  /** Full-row upsert by natural key: rows of `updates` replace matching
    * rows of `existing`; unmatched update rows are inserted.
    * Reference: check-then-update-else-insert loops
    * /root/reference/utils/importer/ETL.py:167-203,559-595. */
  def upsertByKey(existing: DataFrame, updates: DataFrame,
      keys: Seq[String]): DataFrame =
    existing.join(updates.select(keys.map(col): _*).distinct(),
        keys, "left_anti")
      .unionByName(updates)

  /** Partial-column upsert: only `updateCols` are taken from `updates`
    * (null update values keep the existing value — the reference's
    * COALESCE/null-guard update semantics,
    * /root/reference/utils/importer/migrate_product_inheritance.py:96-99).
    * Unmatched update rows are inserted with nulls for the untouched
    * columns. */
  def upsertPartial(existing: DataFrame, updates: DataFrame,
      keys: Seq[String], updateCols: Seq[String]): DataFrame = {
    val e = existing.alias("e")
    val u = updates.alias("u")
    val cond = keys.map(k => col(s"e.$k") <=> col(s"u.$k")).reduce(_ && _)
    val joined = e.join(u, cond, "full_outer")
    val outCols = existing.columns.map { c =>
      if (keys.contains(c)) coalesce(col(s"e.$c"), col(s"u.$c")).as(c)
      else if (updateCols.contains(c)) coalesce(col(s"u.$c"), col(s"e.$c")).as(c)
      else col(s"e.$c").as(c)
    }
    joined.select(outCols.toSeq: _*)
  }

  /** Insert-if-absent (ON CONFLICT DO NOTHING): append only rows whose
    * key is not already present; dedup inserts on the key first.
    * Reference: /root/reference/utils/custom_attributes_parser.py:64-72. */
  def insertIfAbsent(existing: DataFrame, inserts: DataFrame,
      keys: Seq[String]): DataFrame =
    existing.unionByName(
      inserts.dropDuplicates(keys).join(existing, keys, "left_anti"))

  /** Batched DELETE by key set — as one anti-join, replacing the
    * reference's 100-row DELETE batches
    * (/root/reference/utils/importer/cleanup_incorrect_products.py:77-126). */
  def deleteByKeys(target: DataFrame, tombstones: DataFrame,
      keys: Seq[String]): DataFrame =
    target.join(tombstones.select(keys.map(col): _*).distinct(),
      keys, "left_anti")

  /** Cascading orphan cleanup: keep only target rows whose key exists
    * in ALL parent tables (the double-NOT-EXISTS delete,
    * /root/reference/utils/importer/cleanup_incorrect_products.py:128-144,
    * inverted to the surviving set). */
  def keepReferenced(target: DataFrame,
      parents: Seq[(DataFrame, String, String)]): DataFrame = {
    val kept = parents.foldLeft(target) {
      case (t, (parent, childKey, parentKey)) =>
        t.join(parent.select(col(parentKey).as(childKey)).distinct(),
          Seq(childKey), "left_semi")
    }
    // a USING-column join moves the key column first; restore the
    // target's column order so the fold is order-stable
    kept.select(target.columns.map(col).toSeq: _*)
  }

  /** Inheritance backfill: child columns get parent values where the
    * child's value is null (UPDATE ... FROM with null guard,
    * /root/reference/utils/importer/update_existing_products_inheritance.sql:4-13). */
  def inheritBackfill(child: DataFrame, parent: DataFrame,
      childKey: String, parentKey: String,
      fields: Map[String, String]): DataFrame = {
    val c = child.alias("c")
    val p = parent.alias("p")
    val joined = c.join(p, col(s"c.$childKey") === col(s"p.$parentKey"), "left")
    val outCols = child.columns.map { cc =>
      fields.get(cc) match {
        case Some(pc) => coalesce(col(s"c.$cc"), col(s"p.$pc")).as(cc)
        case None     => col(s"c.$cc").as(cc)
      }
    }
    joined.select(outCols.toSeq: _*)
  }

  /** Set difference on a key (the reference's python-set
    * `db_skus - fs_folders` check,
    * /root/reference/utils/check_sku_status.py:108-141). */
  def exceptByKey(left: DataFrame, right: DataFrame,
      keys: Seq[String]): DataFrame =
    left.select(keys.map(col): _*).distinct()
      .join(right.select(keys.map(col): _*).distinct(), keys, "left_anti")

  /** Stamp modified_on the way the reference's triggers did
    * (/root/reference/utils/importer/add_timestamp_fields_dynamic.sql:58-91)
    * — in the merge writer instead of a trigger. */
  def stampModified(df: DataFrame, at: Column = current_timestamp()): DataFrame =
    df.withColumn("modified_on", at)

  /** Slowly-changing-dimension type 2 from a change stream: compress
    * consecutive equal values per key (null-safe), then derive each
    * surviving row's validity interval [tsCol, next change) — the
    * open current row keeps valid_to null. The warehouse counterpart
    * of the reference's modified_on stamping: instead of overwriting
    * in place, history becomes queryable intervals (the as-of join's
    * natural input).
    *
    * Scale shape: two windows over the same (key / order) partitioning
    * — one shuffle, the second window reuses the first's exchange.
    * tieCol breaks order ties so compression is deterministic. */
  def scd2Intervals(df: DataFrame, keyCols: Seq[String], tsCol: String,
      tieCol: String, valueCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    df.withColumn("__prev", lag(col(valueCol), 1).over(w))
      .filter(!(col("__prev") <=> col(valueCol)))
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .drop("__prev")
  }

  /** Apply a CDC change log to a base table: the LATEST change per
    * key wins (ordered by `tsCol`, which must be unique per key —
    * feed a change sequence number when wall clocks can tie), an
    * upsert replaces or inserts the full record, a delete (`opCol`
    * value 'D') removes the key. `changes` carries the base schema
    * plus (opCol, tsCol). The Delta-merge-shaped batch apply: one
    * window over the changes (small side), one anti join to carve
    * touched keys out of the base, one union — the base table
    * streams through untouched except for its changed sliver. */
  def applyChangeLog(base: DataFrame, changes: DataFrame,
      keys: Seq[String], tsCol: String, opCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).desc)
    val latest = changes.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    val survivors = latest.filter(col(opCol) =!= "D")
      .drop(opCol, tsCol)
    base.join(latest.select(keys.map(col): _*), keys, "left_anti")
      .unionByName(survivors)
  }

  /** CDC GENERATION — derive the change log that transforms snapshot
    * `oldDf` into snapshot `newDf`, the inverse of [[applyChangeLog]]
    * (law, spec'd: applying the derived log to old rebuilds new).
    * One full-outer join on the key classifies each key: 'I' (only in
    * new), 'D' (only in old), 'U' (both present, some value column
    * differs under null-safe compare); unchanged keys emit nothing,
    * so the log is delta-sized — the cheap thing to ship/replay when
    * two 100 TB snapshots differ by a day of edits. Payload is the
    * NEW side's row (nulls for 'D'); `ts` is the caller's batch
    * stamp, constant within one generated log. */
  def changeLogFromSnapshots(oldDf: DataFrame, newDf: DataFrame,
      keys: Seq[String], tsValue: Long = 0L): DataFrame = {
    require(oldDf.columns.sameElements(newDf.columns),
      "snapshots must share one schema: " +
        s"${oldDf.columns.mkString(",")} vs ${newDf.columns.mkString(",")}")
    val valueCols = oldDf.columns.filterNot(keys.contains).toSeq
    // rename BY NAME — a positional toDF would silently swap key and
    // value columns whenever the keys aren't the schema's leading
    // columns, corrupting the derived log with no error raised
    val o = oldDf
      .select(keys.map(col) ++
        valueCols.map(c => col(c).as("__o_" + c)): _*)
      .withColumn("__in_o", lit(1))
    val n = newDf.withColumn("__in_n", lit(1))
    val changed = valueCols.map(c => !(col(c) <=> col("__o_" + c)))
      .reduceOption(_ || _).getOrElse(lit(false))
    o.join(n, keys, "full_outer")
      .withColumn("op",
        when(col("__in_o").isNull, "I")
          .when(col("__in_n").isNull, "D")
          .when(changed, "U"))
      .filter(col("op").isNotNull)
      .select((keys.map(col) ++ valueCols.map(col)
        :+ col("op") :+ lit(tsValue).as("ts")): _*)
  }
}
