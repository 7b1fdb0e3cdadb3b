package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.tokens

/** Exact substring-repeat detection via DISTRIBUTED prefix-doubling
  * suffix ranks — the Spark-native core of suffix-array substring
  * dedup (Manber & Myers 1993 "Suffix arrays: a new method for
  * on-line string searches"; applied to training-data dedup by Lee
  * et al. 2022 "Deduplicating Training Data Makes Language Models
  * Better", whose single-node tool builds one giant suffix array).
  *
  * The classic algorithm: rank every suffix by its first 2^k tokens,
  * then double — rank_{k+1}(i) = denseRank(rank_k(i), rank_k(i+2^k)).
  * After r rounds two positions share a rank IFF their next
  * min(2^r, remaining) tokens are IDENTICAL — exact, not a hash
  * collision away from exact like rolling-fingerprint spans
  * ([[Dedup.sharedSpanPairs]] is the probabilistic sibling).
  *
  * Why doubling instead of just grouping the literal L-grams: the
  * shuffled keys are TWO int64 ranks per position at every width —
  * an L-token string key moves L tokens through the exchange, ranks
  * move 16 bytes whether L is 16 or 16384, and each +1 round doubles
  * the matchable width for one more fixed-cost pass (the widths a
  * suffix-array dedup sweeps). Every stage is a standard shuffle:
  *  - dense ranking = distinct keys -> range-partitioned sort ->
  *    zipWithIndex (the one legitimate RDD primitive here: a global
  *    order materialized without a single-partition window);
  *  - the successor lookup = an equi-join on (doc, off+2^k);
  *  - per-round localCheckpoint truncates the O(rounds) lineage.
  * Suffixes never cross document boundaries (Lee et al.'s separator
  * convention), so positions stay keyed (doc, off) and rank VALUES
  * are global — cross-document matches are exactly rank collisions.
  */
object SuffixDedup {

  /** (doc, off, tok) token-position table — off is 0-based. */
  def tokenPositions(df: DataFrame, idCol: String,
      textCol: String): DataFrame =
    df.select(col(idCol).as("doc"),
        posexplode(tokens(col(textCol))).as(Seq("off", "tok")))
      .select(col("doc"), col("off").cast("long").as("off"), col("tok"))

  /** Distributed dense rank of (k1, k2) long pairs: 0-based, gapless,
    * ordered by (k1, k2). Returns (k1, k2, r). */
  private def denseRank2(keys: DataFrame): DataFrame = {
    val spark = keys.sparkSession
    val sorted = keys.select(col("k1"), col("k2")).distinct()
      .orderBy("k1", "k2")
    spark.createDataFrame(
      sorted.rdd.zipWithIndex.map { case (row, i) =>
        Row(row.getLong(0), row.getLong(1), i)
      },
      StructType(Seq(StructField("k1", LongType),
        StructField("k2", LongType), StructField("r", LongType))))
  }

  /** Suffix rank table after `rounds` doublings over a (doc, off,
    * tok) position table: (doc, off, rank) where two positions share
    * `rank` iff their forward token runs agree on the first
    * min(2^rounds, tokens-remaining) tokens. Absent successors rank
    * as the -1 sentinel (shorter suffix sorts first), the Manber-
    * Myers convention.
    *
    * CONTRACT: `positions` must carry DENSE 0-based offsets per doc
    * (exactly [[tokenPositions]]'s shape) — the successor lookup is
    * lead(rank, 2^k) over the (doc, off) order, which equals
    * rank(off + 2^k) only when no offset is missing. Sparse offsets
    * would silently rank the wrong successor. */
  def prefixDoubleRanks(positions: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 0 && rounds <= 30, s"rounds out of range: $rounds")
    val spark = positions.sparkSession
    val toks = positions.select(col("tok")).distinct().orderBy("tok")
    val tokRanks = spark.createDataFrame(
      toks.rdd.zipWithIndex.map { case (row, i) =>
        Row(row.getString(0), i)
      },
      StructType(Seq(StructField("tok", StringType),
        StructField("rank", LongType))))
    var rank = positions.join(tokRanks, Seq("tok"))
      .select(col("doc"), col("off"), col("rank"))
      .localCheckpoint(eager = false)
    var w = 1
    var r = 0
    // successor lookup rides lead() over the (doc, off) order — one
    // exchange on doc instead of a two-sided self-join, and off is
    // dense within a doc so lead(rank, w) IS rank(off + w)
    val wDoc = org.apache.spark.sql.expressions.Window
      .partitionBy("doc").orderBy("off")
    while (r < rounds) {
      val keys = rank
        .withColumn("k2",
          coalesce(lead(col("rank"), w).over(wDoc), lit(-1L)))
        .withColumnRenamed("rank", "k1")
      rank = keys.join(denseRank2(keys.select("k1", "k2")),
          Seq("k1", "k2"))
        .select(col("doc"), col("off"), col("r").as("rank"))
        .localCheckpoint(eager = false)
      w *= 2
      r += 1
    }
    rank
  }

  /** Cross-document exact repeated spans of width 2^rounds tokens:
    * for every document pair sharing at least one identical
    * full-width token window, the count of aligned window matches
    * (overlapping windows count individually — a 20-token shared run
    * at width 16 scores 5, the span-mass convention Lee et al.'s
    * overlap accounting uses). Positions with fewer than width
    * tokens remaining are excluded, so rank equality IS window
    * equality — no sentinel ties.
    *
    * Output size is the honest bound: a boilerplate window shared by
    * m documents yields m-choose-2 pairs, the same worst case every
    * exact dedup has ([[Dedup.exactTextGroups]] upstream removes the
    * degenerate mass first). */
  def repeatedSpanPairs(df: DataFrame, idCol: String, textCol: String,
      rounds: Int): DataFrame =
    repeatedSpanPairsFrom(alignedMatches(df, idCol, textCol, rounds))

  /** [[repeatedSpanPairs]] over an already-materialized
    * [[alignedMatches]] table — the matches are the expensive stage,
    * so pipelines computing several rollups share ONE build. */
  def repeatedSpanPairsFrom(matches: DataFrame): DataFrame =
    matches.groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("n_matches"))

  /** The raw cross-document aligned matches behind
    * [[repeatedSpanPairs]]: one row per position pair whose
    * full-width windows are identical — (doc_a, off_a, doc_b, off_b)
    * with doc_a < doc_b. */
  def alignedMatches(df: DataFrame, idCol: String, textCol: String,
      rounds: Int): DataFrame = {
    val width = 1L << rounds
    val pos = tokenPositions(df, idCol, textCol)
      .localCheckpoint(eager = false)
    val lens = pos.groupBy("doc").agg(count(lit(1)).as("__len"))
    val full = prefixDoubleRanks(pos, rounds)
      .join(lens, Seq("doc"))
      .filter(col("off") + width <= col("__len"))
      .select(col("doc"), col("off"), col("rank"))
    full.select(col("rank"), col("doc").as("doc_a"),
        col("off").as("off_a"))
      .join(full.select(col("rank"), col("doc").as("doc_b"),
        col("off").as("off_b")), Seq("rank"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "off_a", "doc_b", "off_b")
  }

  /** Maximal exact shared spans per document pair: consecutive
    * aligned matches on one diagonal (off_a − off_b constant, off_a
    * stepping by 1) are ONE shared run of run + width − 1 tokens —
    * the gaps-and-islands rollup of [[alignedMatches]]. Emits
    * (doc_a, doc_b, n_matches, max_span_tokens): n_matches for the
    * overlap mass, max_span_tokens for the Lee-2022 "is the longest
    * shared substring over the removal threshold" decision.
    *
    * Scale shape: one window partitioned by (pair, diagonal) — keys
    * as fine as the matches themselves, so no partition exceeds a
    * single document's length — then two partial-agg groupBys. */
  def sharedRunStats(df: DataFrame, idCol: String, textCol: String,
      rounds: Int): DataFrame =
    sharedRunStatsFrom(alignedMatches(df, idCol, textCol, rounds),
      1L << rounds)

  /** [[sharedRunStats]] over an already-materialized
    * [[alignedMatches]] table (same sharing contract as
    * [[repeatedSpanPairsFrom]]); `width` must be the 2^rounds the
    * matches were built at. */
  def sharedRunStatsFrom(matches: DataFrame, width: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_a"), col("doc_b"),
        (col("off_a") - col("off_b")).as("__diag"))
      .orderBy(col("off_a"))
    matches
      .withColumn("__isl", col("off_a") - row_number().over(w))
      .groupBy(col("doc_a"), col("doc_b"),
        (col("off_a") - col("off_b")).as("__diag"), col("__isl"))
      .agg(count(lit(1)).as("__run"))
      .groupBy("doc_a", "doc_b")
      .agg(sum(col("__run")).as("n_matches"),
        (max(col("__run")) + width - 1).as("max_span_tokens"))
  }

  /** SPAN-EXCISION substring dedup — the production form of the Lee
    * et al. 2022 recipe: instead of dropping whole documents whose
    * longest shared run crosses a threshold (the E9 composition),
    * EXCISE the repeated span and keep the document. Every document
    * survives; for each cross-document repeated width-token window,
    * the occurrence in the SMALLEST doc id is the canonical copy and
    * every other occurrence's tokens are removed (matches carry
    * doc_a < doc_b, so the doc_b side is always the excised side — a
    * span shared by m documents keeps exactly its min-doc copy).
    * Runs longer than `width` are excised in full: a shared run of S
    * tokens is covered by its S−width+1 aligned windows, whose union
    * is the whole run. Emits (id, n_toks, n_removed, clean_text) —
    * the same surgery surface as
    * [[TextAnalysis.decontaminateSpans]], which this generalizes
    * from benchmark grams to corpus-internal repeats.
    *
    * Scale shape: coverage fan-out is n_matches·width positions —
    * the duplicate mass itself, nothing corpus²; the per-doc
    * collect_list is bounded by document length (starts are
    * positions within the doc), and the rebuild is a narrow per-row
    * projection. The matches build (the expensive stage) is shared
    * via [[alignedMatches]] materialization. */
  def exciseRepeatedSpansFrom(df: DataFrame, idCol: String,
      textCol: String, matches: DataFrame, width: Long): DataFrame = {
    require(width >= 1, s"width must be >= 1: $width")
    val covered = matches
      .select(col("doc_b").as(idCol), col("off_b").as("__start"))
      .distinct()
      .groupBy(idCol).agg(collect_list(col("__start")).as("__starts"))
    df.select(col(idCol), tokens(col(textCol)).as("__t"))
      .join(covered, Seq(idCol), "left")
      .withColumn("__cov",
        when(col("__starts").isNull, array().cast("array<int>"))
          .otherwise(array_distinct(flatten(transform(col("__starts"),
            p => sequence(p.cast("int"),
              (p + lit(width - 1)).cast("int")))))))
      .select(col(idCol),
        size(col("__t")).cast("long").as("n_toks"),
        size(col("__cov")).cast("long").as("n_removed"),
        when(size(col("__t")) === 0, lit(""))
          // array_except is hash-based and order-preserving on its
          // first argument — O(len + covered) per row, where a
          // per-position array_contains scan is O(len × covered)
          .otherwise(array_join(transform(
            array_except(sequence(lit(0), size(col("__t")) - 1),
              col("__cov")),
            i => element_at(col("__t"), i + 1)), " "))
          .as("clean_text"))
  }

  /** [[exciseRepeatedSpansFrom]] building its own aligned matches —
    * the one-call form; `rounds` doublings excise repeats of
    * 2^rounds tokens and longer. */
  def exciseRepeatedSpans(df: DataFrame, idCol: String,
      textCol: String, rounds: Int): DataFrame =
    exciseRepeatedSpansFrom(df, idCol, textCol,
      alignedMatches(df, idCol, textCol, rounds), 1L << rounds)
}
