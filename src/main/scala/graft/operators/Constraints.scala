package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraints — the generalization of the
  * reference's ad-hoc audit scripts
  * (/root/reference/utils/importer/verify_collections.py:34-195,
  * cleanup_incorrect_products.py:160-200): express the invariants
  * once, get a violations report as a DataFrame.
  *
  * Each rule compiles to a single aggregate subplan; the report is
  * one union of scalar counts, so a full audit of N rules is N
  * parallel scans (shared-scan via Spark's exchange reuse where
  * tables repeat) and no driver-side data movement.
  */
object Constraints {

  sealed trait Rule { def name: String }

  /** Column must never be null. */
  case class NotNull(table: String, colName: String) extends Rule {
    def name = s"not_null:$table.$colName"
  }

  /** Key must be unique; violations = rows living in oversized
    * groups (so 3 rows sharing one key count as 3, not 1). */
  case class Unique(table: String, cols: Seq[String]) extends Rule {
    def name = s"unique:$table(${cols.mkString(",")})"
  }

  /** Every child value must exist in the parent (nulls exempt, as in
    * SQL FK semantics). */
  case class RefIntegrity(child: String, childCol: String,
      parent: String, parentCol: String) extends Rule {
    def name = s"fk:$child.$childCol->$parent.$parentCol"
  }

  /** Run every rule, returning (rule, violations) — all-zero means
    * the invariants hold. */
  def check(tables: Map[String, DataFrame],
      rules: Seq[Rule]): DataFrame = {
    val reports = rules.map {
      case r @ NotNull(t, c) =>
        tables(t).filter(col(c).isNull)
          .agg(count(lit(1)).as("violations"))
          .select(lit(r.name).as("rule"), col("violations"))
      case r @ Unique(t, cs) =>
        tables(t).groupBy(cs.map(col): _*)
          .agg(count(lit(1)).as("__n"))
          .filter(col("__n") > 1)
          .agg(coalesce(sum(col("__n")), lit(0L)).as("violations"))
          .select(lit(r.name).as("rule"), col("violations"))
      case r @ RefIntegrity(c, cc, p, pc) =>
        tables(c).filter(col(cc).isNotNull)
          .join(tables(p).select(col(pc).as(cc)).distinct(),
            Seq(cc), "left_anti")
          .agg(count(lit(1)).as("violations"))
          .select(lit(r.name).as("rule"), col("violations"))
    }
    reports.reduce(_ unionByName _)
  }

  /** Row-level rules for [[enforce]] — the logical-constraint mirror
    * of the CSV reject quarantine (S1): instead of COUNTING
    * violations like [[check]], split the frame so the pipeline
    * loads the clean rows and quarantines the rest WITH their
    * reasons. */
  sealed trait RowRule { def name: String }

  /** Column must be non-null. */
  case class RowNotNull(colName: String) extends RowRule {
    def name = s"not_null:$colName"
  }

  /** Value must fall in [lo, hi] (null fails — use RowNotNull's
    * exemption semantics by composing only where meaningful). */
  case class RowInRange(colName: String, lo: Double, hi: Double)
      extends RowRule {
    def name = s"range:$colName"
  }

  /** Value must be one of the domain literals. */
  case class RowInSet(colName: String, values: Seq[String])
      extends RowRule {
    def name = s"domain:$colName"
  }

  /** Value must exist in the parent key column (nulls exempt, SQL FK
    * semantics). Compiles to ONE left join against the distinct
    * parent keys — broadcast when small, shuffled-keyed when not. */
  case class RowFk(colName: String, parent: DataFrame,
      parentCol: String) extends RowRule {
    def name = s"fk:$colName"
  }

  /** Attach a `violations` array<string> column naming every rule the
    * row breaks (empty array = clean). Row-local rules evaluate
    * inside the row (narrow, codegen'd); each FK rule adds one
    * left join marker. The quarantine split is two filters off the
    * same plan. */
  def enforce(df: DataFrame, rules: Seq[RowRule]): DataFrame = {
    require(rules.nonEmpty, "enforce needs at least one rule")
    val fks = rules.collect { case r: RowFk => r }
    val withMarkers = fks.zipWithIndex.foldLeft(df) { case (d, (r, i)) =>
      val keys = r.parent.select(col(r.parentCol).as(r.colName))
        .distinct().withColumn(s"__fk_ok_$i", lit(true))
      d.join(keys, Seq(r.colName), "left")
    }
    var fkIdx = -1
    val viol = rules.map {
      case r @ RowNotNull(c) =>
        when(col(c).isNull, lit(r.name))
      case r @ RowInRange(c, lo, hi) =>
        // try_cast, for two reasons: under ANSI mode (Spark 4's
        // default) a plain cast THROWS on a non-castable value (the
        // quarantine gate must classify corrupt rows, not crash on
        // them), and under non-ANSI it casts to NULL — without the
        // explicit isNotNull-but-cast-null arm the whole predicate
        // would be NULL, when() would yield NULL, and the corrupt row
        // would slip through the gate as CLEAN
        val d = expr(s"try_cast(`$c` AS DOUBLE)")
        when(col(c).isNull || (col(c).isNotNull && d.isNull) ||
          d < lo || d > hi, lit(r.name))
      case r @ RowInSet(c, vs) =>
        when(col(c).isNull || !col(c).isin(vs: _*), lit(r.name))
      case r: RowFk =>
        fkIdx += 1
        when(col(r.colName).isNotNull &&
          col(s"__fk_ok_$fkIdx").isNull, lit(r.name))
    }
    withMarkers
      .withColumn("violations",
        filter(array(viol: _*), v => v.isNotNull))
      .drop(fks.indices.map(i => s"__fk_ok_$i"): _*)
  }

  /** The (good, rejects) split of [[enforce]] — clean rows without
    * the audit column, rejects keeping their reasons. */
  def quarantine(df: DataFrame,
      rules: Seq[RowRule]): (DataFrame, DataFrame) = {
    val marked = enforce(df, rules)
    (marked.filter(size(col("violations")) === 0).drop("violations"),
      marked.filter(size(col("violations")) > 0))
  }

  /** Snapshot diff — classify every key of two table versions as
    * added / removed / changed / unchanged and count each class: the
    * migration-visibility report behind "what did this load actually
    * do". One full-outer join on the key; change detection is a
    * null-safe comparison over the named value columns (`<=>`, so
    * NULL-to-value transitions count as changes). Counts only — the
    * row-level drill-down is the same join re-filtered, which
    * Catalyst serves from the identical plan. */
  def snapshotDiff(before: DataFrame, after: DataFrame,
      keys: Seq[String], valueCols: Seq[String]): DataFrame = {
    val b = before.select((keys ++ valueCols).map(col): _*)
      .withColumn("__b", lit(1))
    val a = after.select((keys ++ valueCols).map(col): _*)
      .toDF(keys ++ valueCols.map("__a_" + _): _*)
      .withColumn("__a", lit(1))
    val j = b.join(a, keys, "full_outer")
    val changed = valueCols.map(c => !(col(c) <=> col("__a_" + c)))
      .reduceOption(_ || _).getOrElse(lit(false))
    j.select(
        when(col("__b").isNull, "added")
          .when(col("__a").isNull, "removed")
          .when(changed, "changed")
          .otherwise("unchanged").as("status"))
      .groupBy("status").agg(count(lit(1)).as("n"))
  }

  /** Order-free table fingerprint for migration/replication checks:
    * hash each row's chosen columns, SUM two 20-bit slices of the
    * hash — commutative integer sums, so the fingerprint is identical
    * at any partitioning/row order, and two tables compare by
    * comparing one 3-column row each (no sort, no row-by-row diff).
    * 20-bit slices keep the sums exact in BIGINT up to ~2^43 rows.
    * Collision odds are fingerprint-grade (~2^-40 per differing
    * table pair), not cryptographic. NULL columns fold as
    * concat_ws's empty contribution — include a non-null key column
    * so rows stay distinguishable. */
  def tableFingerprint(df: DataFrame,
      cols: Seq[org.apache.spark.sql.Column]): DataFrame =
    df.select(graft.functions.hash60(concat_ws("|", cols: _*)).as("hv"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("hv") % 1048576L).as("fp_lo"),
        sum(expr("hv div 1048576") % 1048576L).as("fp_hi"))

  /** Per-column Shannon-ENTROPY profile — the data-health number the
    * min/max/ndv audit can't see: a column can have healthy bounds
    * and cardinality while 99.9% of its mass sits on one value
    * (upstream default leaking in), and entropy + top-value share
    * catch exactly that. One row per requested column: non-null
    * count, null count, distinct count, entropy in exact integer
    * MICRO-nats and the modal value's share in milli.
    *
    * Integer law (the knNll ln discipline — one ⌊ln·10⁶⌋ per
    * DISTINCT value, never per row):
    *   ent_micro = ⌊ln N·10⁶⌋ − (Σ_v c_v·⌊ln c_v·10⁶⌋) div N
    * from H = ln N − (1/N)Σ c·ln c. Constant column → 0; uniform
    * over k values → ≈ ln k micro. Int64 envelope: c·⌊ln c·10⁶⌋
    * caps a single VALUE at ~5·10¹¹ rows.
    *
    * Scale shape: one map-side-combined value-count groupBy per
    * column (value-cardinality-sized result), one single-row rollup
    * each, unioned — columns audited are a config-sized list. */
  def columnEntropy(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "columnEntropy needs at least one column")
    cols.map { c =>
      val counts = df.select(col(c).as("__v"))
        .filter(col("__v").isNotNull)
        .groupBy("__v").agg(count(lit(1)).as("__c"))
      val nulls = df.filter(col(c).isNull)
        .agg(count(lit(1)).as("n_null"))
      counts.agg(
          sum(col("__c")).as("n_rows"),
          count(lit(1)).as("n_distinct"),
          sum(col("__c") *
            floor(log(col("__c").cast("double")) * 1e6).cast("long"))
            .as("__sclnc"),
          max(col("__c")).as("__cmax"))
        .crossJoin(broadcast(nulls))
        .select(lit(c).as("col_name"),
          coalesce(col("n_rows"), lit(0L)).as("n_rows"),
          col("n_null"),
          coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
          expr("CASE WHEN n_rows > 0 THEN " +
            "CAST(floor(ln(CAST(n_rows AS DOUBLE)) * 1000000) " +
            "AS BIGINT) - __sclnc div n_rows ELSE 0L END")
            .as("entropy_micro"),
          expr("CASE WHEN n_rows > 0 THEN (__cmax * 1000) div n_rows" +
            " ELSE 0L END").as("top_share_milli"))
    }.reduce(_ unionByName _)
  }

  /** k-anonymity / l-diversity privacy report (Sweeney 2002
    * "k-anonymity: a model for protecting privacy"; Machanavajjhala
    * et al. 2007 "l-diversity") — the governance number a dataset
    * release reads BEFORE publishing: group rows into equivalence
    * classes by the quasi-identifier columns, report the dataset's
    * actual k (the smallest class — any class under the target k
    * re-identifies its members by quasi-identifier lookup) and its
    * actual l (the fewest DISTINCT sensitive values in any class —
    * a class can be k-anonymous yet leak the sensitive attribute
    * when all members share one value). One row: totals, worst
    * cases, and the exact-milli shares of rows in violating
    * classes.
    *
    * Scale shape: ONE groupBy on the quasi columns (count +
    * count-distinct both partial-aggregate) followed by a single-row
    * rollup — the class table is the only shuffle and is bounded by
    * the quasi-identifier domain, not the corpus. */
  def kAnonymityReport(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, k: Long, l: Long): DataFrame = {
    require(quasiCols.nonEmpty, "quasiCols must be non-empty")
    require(k >= 1 && l >= 1, s"k and l must be positive: $k, $l")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("__sz"),
        countDistinct(col(sensitiveCol)).as("__ldiv"))
      .agg(
        // coalesce to ZEROS on an empty release: a gate testing
        // `k_anonymity >= k` must fail loudly, not evaluate NULL
        coalesce(sum(col("__sz")), lit(0L)).as("n_rows"),
        count(lit(1)).as("n_classes"),
        coalesce(min(col("__sz")), lit(0L)).as("k_anonymity"),
        coalesce(sum(when(col("__sz") < k, col("__sz")).otherwise(0L)),
          lit(0L)).as("rows_below_k"),
        coalesce(min(col("__ldiv")), lit(0L)).as("l_diversity"),
        coalesce(sum(when(col("__ldiv") < l, col("__sz"))
          .otherwise(0L)), lit(0L)).as("rows_below_l"))
      .withColumn("below_k_milli",
        expr("CASE WHEN n_rows > 0 THEN rows_below_k * 1000 div n_rows"
          + " ELSE 0L END"))
      .withColumn("below_l_milli",
        expr("CASE WHEN n_rows > 0 THEN rows_below_l * 1000 div n_rows"
          + " ELSE 0L END"))
  }

  /** The actionable half of [[kAnonymityReport]]: the SUPPRESSION
    * LIST — every equivalence class violating the k or l target,
    * with its size and sensitive-value diversity. Rows in these
    * classes get suppressed or generalized before release; the
    * report says how bad, this says WHICH. Same single class-table
    * shuffle; output bounded by the violating classes. */
  def kAnonymityViolations(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, k: Long, l: Long): DataFrame = {
    require(quasiCols.nonEmpty, "quasiCols must be non-empty")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(col(sensitiveCol)).as("l_diversity"))
      .filter(col("class_size") < k || col("l_diversity") < l)
  }
}
