package graft.queries

import org.apache.spark.sql.functions._
import graft.functions._
import graft.operators.{Dedup, TextAnalysis}

/** Text-analysis and deduplication [Q] inventory over `documents`.
  * The oracle SQL is GENERATED from the same constants the Spark
  * operators use (language profiles, hash family, band layout), so the
  * two sides cannot drift apart silently.
  */
object Text {

  // DuckDB-side generators, mirroring graft.functions/TextAnalysis.
  private val normD = sqlNormText("text")
  private val toksD = sqlTokens("text")

  /** Width-16 aligned suffix-rank matches, built ONCE per session and
    * shared by both q_d_suffix_* rollups — the prefix doubling is the
    * cost, the rollups are cheap aggregates (the [[materialized]]
    * reuse pattern: on a cluster this is the written intermediate
    * table). */
  private def suffixMatches16(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    materialized(s, d, "suffix_matches_16") {
      graft.operators.SuffixDedup
        .alignedMatches(t(s, d, "documents"), "doc_id", "text", 4)
    }

  /** Substring-dedup cluster labels (≥20-token shared span ⇒ same
    * cluster), built ONCE per session: the connected-components
    * iteration is the expensive stage both e2e compositions
    * (q_e2e_substring_dedup, q_e2e_pretrain_prep) sit on — sharing
    * the labels frame, not just the suffix matches, keeps the CC
    * round-trips out of the second consumer entirely. */
  private def suffixClusters16(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    materialized(s, d, "suffix_clusters_16") {
      val pairs = graft.operators.SuffixDedup
        .sharedRunStatsFrom(suffixMatches16(s, d), 16L)
        .filter(col("max_span_tokens") >= 20)
        .select(col("doc_a").as("id_a"), col("doc_b").as("id_b"))
      graft.operators.Dedup.duplicateClusters(
        t(s, d, "documents").select("doc_id"), "doc_id", pairs)
    }

  // Deterministic multilingual sample strings for q_t_langid — the
  // highest-frequency characters/function words of each language
  // (public frequency-list knowledge), embedded identically in the
  // Spark plan and the oracle SQL.
  private val ZhSample = "的一是不了人我在有他这中大来上国"
  private val RuSample = "и в не на я что с по это как но из у за"
  private val JaSample = "のにはをたがでてとし"

  private def inList(lang: String): String =
    TextAnalysis.profiles(lang).map(w => s"'$w'").mkString(", ")

  /** Language score over a toks-list SQL expr. */
  private def sqlLangScore(toksE: String, lang: String): String =
    s"(CASE WHEN len($toksE) = 0 THEN 0.0 ELSE " +
      s"CAST(len(list_filter($toksE, t -> t IN (${inList(lang)}))) AS DOUBLE)" +
      s" / CAST(len($toksE) AS DOUBLE) END)"

  /** Word-n-gram shingle list over a toks-list SQL expr (matches
    * graft.functions.shingles). */
  private def sqlShingles(toksE: String, n: Int): String =
    s"(CASE WHEN len($toksE) >= $n THEN list_transform(" +
      s"range(0, len($toksE) - ${n - 1}), " +
      s"i -> array_to_string($toksE[i+1:i+$n], ' ')) ELSE [] END)"

  /** The 8 minhash signature exprs over a distinct-shingle list `s`
    * (hash family constants come from Dedup.minHashA/B, so the oracle
    * cannot drift from the operator). */
  private val sigExprs: Seq[String] = (0 until 8).map { i =>
    val a = Dedup.minHashA(i); val b = Dedup.minHashB(i)
    s"CASE WHEN len(s) = 0 THEN 2147483647 ELSE list_min(" +
      s"list_transform(s, x -> ($a * ${sqlHash31("x")} + $b) % 2147483647)) END"
  }

  private[queries] val sigCte =
    s"""WITH tok AS (SELECT doc_id, $toksD AS t FROM documents),
       |sh AS (SELECT doc_id, list_distinct(${sqlShingles("t", 3)}) AS s
       |       FROM tok),
       |sig AS (SELECT doc_id, [${sigExprs.mkString(", ")}] AS sig FROM sh)
       |""".stripMargin

  private def simCte(bits: Int): String = {
    val votes = (0 until bits).map(i =>
      s"sum(CASE WHEN (hv >> $i) % 2 = 1 THEN 1 ELSE -1 END) AS v$i")
      .mkString(", ")
    val simv = (0 until bits).map(i =>
      s"CASE WHEN v$i >= 0 THEN ${1L << i} ELSE 0 END").mkString(" + ")
    s"""WITH tok AS (SELECT doc_id, $toksD AS t FROM documents),
       |tu AS (SELECT doc_id, unnest(list_distinct(t)) AS tk FROM tok),
       |hh AS (SELECT doc_id, ${sqlHash31("tk")} AS hv FROM tu),
       |v AS (SELECT doc_id, $votes FROM hh GROUP BY doc_id),
       |sim AS (SELECT doc_id, CAST($simv AS BIGINT) AS simhash FROM v)
       |""".stripMargin
  }

  /** Shared WITH-chain ending in `clusters(doc_id, cluster_id)`:
    * minhash sigs → banded LSH buckets (size-capped) → candidate
    * pairs → recursive transitive closure → min-id label. Reused by
    * q_d_dedup_clusters and q_d_keep_best. */
  private val clusterCte: String =
    sigCte +
      """, banded AS (SELECT doc_id AS id, sig,
        |    unnest([0,1,2,3]) AS band FROM sig),
        |bkt0 AS (SELECT id, sig, band,
        |  md5(concat_ws(',', band,
        |    array_to_string(sig[band*2+1:band*2+2], ','))) AS bucket
        |  FROM banded),
        |small AS (SELECT band, bucket FROM bkt0
        |          GROUP BY 1, 2 HAVING count(*) <= 1000),
        |bkt AS (SELECT bkt0.* FROM bkt0
        |        JOIN small ON bkt0.band = small.band
        |                  AND bkt0.bucket = small.bucket),
        |pairs AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
        |          FROM bkt a JOIN bkt b
        |            ON a.band = b.band AND a.bucket = b.bucket
        |               AND a.id < b.id),
        |edges AS (SELECT id_a AS s, id_b AS t FROM pairs
        |          UNION SELECT id_b, id_a FROM pairs),
        |closure AS (
        |  WITH RECURSIVE r(s, t) AS (
        |    SELECT s, t FROM edges
        |    UNION
        |    SELECT r.s, e.t FROM r JOIN edges e ON r.t = e.s)
        |  SELECT * FROM r),
        |clusters AS (SELECT doc_id,
        |  least(doc_id,
        |    coalesce((SELECT min(t) FROM closure WHERE s = doc_id),
        |             doc_id)) AS cluster_id
        |  FROM documents)
        |""".stripMargin

  /** The full analyze() enrichment over `documents` — shared by
    * q_t_analyze and q_e2e_curation's quality stage. */
  private def analyzed(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    materialized(s, d, "analyzed_documents") {
      TextAnalysis.analyze(t(s, d, "documents"), "text")
    }

  /** MinHash-LSH candidate pairs over `documents` — one computation
    * shared by q_d_minhash_lsh_pairs and the cluster table below. */
  private def lshPairs(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    materialized(s, d, "minhash_lsh_pairs") {
      Dedup.minHashLshPairs(t(s, d, "documents"), "doc_id", "text",
        3, 8, 4, 1000)
    }

  /** Exact 4-gram Jaccard ≥ 0.5 pair table — the prefix-filter join
    * computed once per (session, sfDir): q_d_prefix_jaccard grades it
    * directly and q_d_lsh_recall uses it as ground truth. */
  private def prefixPairs4(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    materialized(s, d, "prefix_jaccard4") {
      Dedup.prefixFilterJaccardPairs(t(s, d, "documents"), "doc_id",
        "text", 4, 0.5)
    }

  /** Spark side of [[clusterCte]] — the near-dup cluster table,
    * materialized once per (session, sfDir) because THREE graded
    * queries consume it (q_d_dedup_clusters, q_d_keep_best,
    * q_e2e_curation); recomputing the LSH join + label propagation
    * per consumer tripled the bench cost of this stage. */
  private def sparkClusters(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    materialized(s, d, "dup_clusters") {
      Dedup.duplicateClusters(t(s, d, "documents"), "doc_id",
        lshPairs(s, d).select("id_a", "id_b"))
    }

  /** Unigram-LM trained vocab (maxPieceLen 3, V=32) + its corpus
    * encode, each built ONCE per (session, sfDir): three graded
    * queries (vocab, encode round-trip, fertility) sit on the same
    * train, and two on the same encode. */
  /** The 6-round BPE merge table three queries consume (train,
    * train→encode, fertility) — trained ONCE per session like every
    * other shared stage here; a production pipeline persists the
    * tokenizer artifact, it never retrains per consumer. */
  private def bpeMerges6(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    materialized(s, d, "bpe_merges_6") {
      TextAnalysis.bpeMerges(t(s, d, "documents"), "text", 6)
    }

  private def uniVocab32(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    materialized(s, d, "unigram_vocab_32") {
      TextAnalysis.unigramLmVocab(t(s, d, "documents"), "text", 3, 32)
    }

  private def uniEncoded32(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    materialized(s, d, "unigram_encoded_32") {
      TextAnalysis.unigramEncode(t(s, d, "documents"), "doc_id",
        "text", uniVocab32(s, d), 3)
    }

  private def wpEncoded32(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    materialized(s, d, "wordpiece_encoded_32") {
      TextAnalysis.wordPieceEncode(t(s, d, "documents"), "doc_id",
        "text", uniVocab32(s, d), 3)
    }

  /** Oracle lang-id CASE chain over `s_<lang>` score columns (matches
    * TextAnalysis.langIdOfScores' alphabetical fold). */
  private def langIdSqlFor(langsIn: Seq[String]): String = {
    val langs = langsIn.sorted
    def s(l: String) = s"s_$l"
    val allZero = langs.map(l => s"${s(l)} = 0.0").mkString(" AND ")
    val arms = langs.init.zipWithIndex.map { case (l, i) =>
      val later = langs.drop(i + 1)
      s"WHEN ${later.map(o => s"${s(l)} >= ${s(o)}").mkString(" AND ")} " +
        s"THEN '$l'"
    }
    s"CASE WHEN $allZero THEN 'und' ${arms.mkString(" ")} " +
      s"ELSE '${langs.last}' END"
  }

  private val langIdSql: String =
    langIdSqlFor(TextAnalysis.profiles.keys.toSeq)

  /** DuckDB equivalent of TextAnalysis.scriptRatio (same ranges, same
    * non-whitespace denominator). */
  private def sqlScriptRatio(x: String, lang: String): String = {
    val range = TextAnalysis.scriptRanges(lang)
    val t = s"coalesce($x, '')"
    val total = raw"length(regexp_replace($t, '[ \t\n\x0B\f\r]', '', 'g'))"
    val hits = s"length(regexp_replace($t, '[^$range]', '', 'g'))"
    s"(CASE WHEN $total = 0 THEN 0.0 ELSE " +
      s"CAST($hits AS DOUBLE) / CAST($total AS DOUBLE) END)"
  }

  val all: Seq[Q] = Seq(

    // TEXT: the one-call analyze() enrichment — token counts, quality
    // metrics, language id, fingerprints, all in one pass.
    Q("q_t_analyze", {
      val langs = TextAnalysis.profiles.keys.toSeq.sorted
      val scores = langs.map(l =>
        s"${sqlLangScore("toks", l)} AS s_$l").mkString(", ")
      s"""WITH base AS (
         |  SELECT doc_id, text, $normD AS norm FROM documents),
         |tok AS (SELECT doc_id, text, norm,
         |  (CASE WHEN norm = '' THEN [] ELSE string_split(norm, ' ') END)
         |    AS toks FROM base),
         |scored AS (SELECT doc_id, text, norm, toks, $scores,
         |  CAST(len(toks) AS BIGINT) AS ws_tokens,
         |  CAST(len(regexp_extract_all(text,
         |    '[\\p{L}]+|[0-9]+|[^\\p{L}0-9 \\t\\n\\x0B\\f\\r]', 0)) AS BIGINT) AS regex_tokens,
         |  (CASE WHEN length(coalesce(text,'')) = 0 THEN 0.0 ELSE
         |    CAST(length(coalesce(text,'')) - length(regexp_replace(
         |      coalesce(text,''), '[[:punct:]]', '', 'g')) AS DOUBLE)
         |    / CAST(length(coalesce(text,'')) AS DOUBLE) END) AS punct_ratio,
         |  (CASE WHEN len(toks) = 0 THEN 0.0 ELSE
         |    CAST(list_aggregate(list_transform(toks, x -> length(x)), 'sum')
         |      AS DOUBLE) / CAST(len(toks) AS DOUBLE) END) AS mean_token_len
         |  FROM tok)
         |SELECT doc_id, ws_tokens, regex_tokens, punct_ratio,
         |  s_en AS stopword_ratio, mean_token_len,
         |  least(CAST(ws_tokens AS DOUBLE) / 64.0, 1.0) * 0.4
         |    + greatest(0.0, 1.0 - punct_ratio * 4.0) * 0.3
         |    + (CASE WHEN mean_token_len >= 2.5 AND mean_token_len <= 10.0
         |       THEN 1.0 ELSE 0.5 END) * 0.3 AS quality,
         |  $langIdSql AS lang_id,
         |  md5(norm) AS fingerprint,
         |  list_reduce(list_concat([CAST(0 AS BIGINT)],
         |    list_transform(toks, t -> ${sqlHash31("t")})),
         |    (acc, h) -> (acc * 31 + h) % 2147483647) AS rolling_fp
         |FROM scored ORDER BY doc_id""".stripMargin
    }) { (s, d) =>
      analyzed(s, d)
        .select("doc_id", "ws_tokens", "regex_tokens", "punct_ratio",
          "stopword_ratio", "mean_token_len", "quality", "lang_id",
          "fingerprint", "rolling_fp")
        .orderBy("doc_id")
    },

    // TEXT: multi-script language id — token profiles for the
    // space-delimited languages + Unicode-script ratios for
    // zh/ja/ko/ru (the reference's live pair is zh/en). The corpus is
    // synthetic English, so a deterministic multilingual column is
    // synthesized from doc_id: pure zh / ru / ja rows, a zh+latin
    // MIXED row (the scored signals compete, zh's char mass wins),
    // and untouched English rows — both engines build the identical
    // column, so parity grades the full detector, not just the happy
    // path.
    Q("q_t_langid", {
      val langs =
        (TextAnalysis.profiles.keys ++ TextAnalysis.scriptRanges.keys)
          .toSeq.sorted
      val tokLangs = TextAnalysis.profiles.keys.toSeq.sorted
      val scrLangs = TextAnalysis.scriptRanges.keys.toSeq.sorted
      val scores =
        (tokLangs.map(l => s"${sqlLangScore("toks", l)} AS s_$l") ++
          scrLangs.map(l => s"${sqlScriptRatio("mtext", l)} AS s_$l"))
          .mkString(", ")
      s"""WITH ml AS (SELECT doc_id,
         |  CASE WHEN doc_id % 5 = 0 THEN '$ZhSample'
         |       WHEN doc_id % 5 = 1 THEN '$RuSample'
         |       WHEN doc_id % 5 = 2 THEN '$JaSample'
         |       WHEN doc_id % 5 = 3
         |         THEN concat('$ZhSample', ' ', substr(text, 1, 20))
         |       ELSE text END AS mtext FROM documents),
         |tok AS (SELECT doc_id, mtext, ${sqlTokens("mtext")} AS toks
         |  FROM ml),
         |scored AS (SELECT doc_id, $scores FROM tok),
         |lid AS (SELECT doc_id, ${langIdSqlFor(langs)} AS lang
         |  FROM scored)
         |SELECT lang, CAST(count(*) AS BIGINT) AS n,
         |  min(doc_id) AS first_doc
         |FROM lid GROUP BY 1 ORDER BY lang""".stripMargin
    }) { (s, d) =>
      val m = t(s, d, "documents").withColumn("mtext",
        when(col("doc_id") % 5 === 0, lit(ZhSample))
          .when(col("doc_id") % 5 === 1, lit(RuSample))
          .when(col("doc_id") % 5 === 2, lit(JaSample))
          .when(col("doc_id") % 5 === 3,
            concat(lit(ZhSample), lit(" "), substring(col("text"), 1, 20)))
          .otherwise(col("text")))
      TextAnalysis.withLangIdMulti(m, "mtext")
        .groupBy("lang")
        .agg(count(lit(1)).as("n"), min("doc_id").as("first_doc"))
        .orderBy("lang")
    },

    // TEXT EVAL: langid confusion matrix against the corpus's own
    // labels — the per-(label, prediction) count table every
    // classifier audit starts from, with the diagonal flagged. The
    // synthetic corpus is Latin-script across all five labels, so
    // off-diagonal mass is EXPECTED — the graded artifact is the
    // evaluation harness, byte-exact, not the model's accuracy.
    Q("q_t_langid_confusion", {
      val langs =
        (TextAnalysis.profiles.keys ++ TextAnalysis.scriptRanges.keys)
          .toSeq.sorted
      val tokLangs = TextAnalysis.profiles.keys.toSeq.sorted
      val scrLangs = TextAnalysis.scriptRanges.keys.toSeq.sorted
      val scores =
        (tokLangs.map(l => s"${sqlLangScore("toks", l)} AS s_$l") ++
          scrLangs.map(l => s"${sqlScriptRatio("mtext", l)} AS s_$l"))
          .mkString(", ")
      s"""WITH tok AS (SELECT doc_id, lang AS label,
         |    ${sqlTokens("text")} AS toks, text AS mtext
         |  FROM documents),
         |scored AS (SELECT doc_id, label, $scores FROM tok),
         |lid AS (SELECT doc_id, label, ${langIdSqlFor(langs)}
         |    AS lang_id FROM scored)
         |SELECT label, lang_id, CAST(count(*) AS BIGINT) AS n,
         |  CAST(CASE WHEN label = lang_id THEN 1 ELSE 0 END AS BIGINT)
         |    AS is_hit
         |FROM lid GROUP BY 1, 2 ORDER BY label, lang_id""".stripMargin
    }) { (s, d) =>
      TextAnalysis.withLangIdMulti(
          t(s, d, "documents")
            .select(col("doc_id"), col("lang").as("label"), col("text")),
          "text", "lang_id")
        .groupBy("label", "lang_id").agg(count(lit(1)).as("n"))
        .withColumn("is_hit",
          when(col("label") === col("lang_id"), 1L).otherwise(0L))
        .orderBy("label", "lang_id")
    },

    // TEXT: CJK-aware token counting over the same synthesized
    // multilingual column — each ideograph/kana/hangul char is one
    // token, word runs stay words; the counter that keeps shard
    // token budgets honest on a zh/ja corpus (whitespace counting
    // sees one "token" per zh document).
    Q("q_t_token_count_cjk", {
      val pat = TextAnalysis.cjkTokenPattern
      s"""WITH ml AS (SELECT doc_id,
         |  CASE WHEN doc_id % 5 = 0 THEN '$ZhSample'
         |       WHEN doc_id % 5 = 1 THEN '$RuSample'
         |       WHEN doc_id % 5 = 2 THEN '$JaSample'
         |       WHEN doc_id % 5 = 3
         |         THEN concat('$ZhSample', ' ', substr(text, 1, 20))
         |       ELSE text END AS mtext FROM documents),
         |cnt AS (SELECT doc_id, CAST(len(regexp_extract_all(
         |    coalesce(mtext, ''), '$pat')) AS BIGINT) AS n_toks
         |  FROM ml)
         |SELECT doc_id % 5 AS bucket, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_toks) AS BIGINT) AS total_toks, min(n_toks) AS min_toks,
         |  max(n_toks) AS max_toks
         |FROM cnt GROUP BY 1 ORDER BY bucket""".stripMargin
    }) { (s, d) =>
      val m = t(s, d, "documents").withColumn("mtext",
        when(col("doc_id") % 5 === 0, lit(ZhSample))
          .when(col("doc_id") % 5 === 1, lit(RuSample))
          .when(col("doc_id") % 5 === 2, lit(JaSample))
          .when(col("doc_id") % 5 === 3,
            concat(lit(ZhSample), lit(" "), substring(col("text"), 1, 20)))
          .otherwise(col("text")))
      m.select((col("doc_id") % 5).as("bucket"),
          TextAnalysis.cjkAwareTokenCount(col("mtext")).cast("long")
            .as("n_toks"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_docs"), sum("n_toks").as("total_toks"),
          min("n_toks").as("min_toks"), max("n_toks").as("max_toks"))
        .orderBy("bucket")
    },

    // DEDUP: exact one-representative-per-key.
    Q("q_d_exact_by_key",
      """SELECT lang, doc_id, source FROM (
        |  SELECT lang, doc_id, source,
        |    row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
        |  FROM documents)
        |WHERE rn = 1 ORDER BY lang""".stripMargin) { (s, d) =>
      Dedup.exactByKey(t(s, d, "documents"), Seq("lang"), "doc_id")
        .select("lang", "doc_id", "source")
        .orderBy("lang")
    },

    // DEDUP: exact content groups on normalized text.
    Q("q_d_exact_text_groups",
      s"""SELECT md5($normD) AS fingerprint, min(doc_id) AS rep_id,
         |  count(*) AS dup_count
         |FROM documents GROUP BY 1 ORDER BY fingerprint""".stripMargin) { (s, d) =>
      Dedup.exactTextGroups(t(s, d, "documents"), "doc_id", "text")
        .orderBy("fingerprint")
    },

    // CURATION: leakage-safe train/val split — every doc gets the
    // fold of its exact-dup-cluster representative, so duplicates
    // never straddle the split (eval "generalization" that is really
    // train-side recitation). md5-derived fold: same split on every
    // engine, run, and corpus size.
    Q("q_t_leakage_split",
      s"""WITH fp AS (SELECT doc_id, md5($normD) AS f FROM documents),
         |r AS (SELECT f, min(doc_id) AS rep_id FROM fp GROUP BY f),
         |m AS (SELECT fp.doc_id, r.rep_id FROM fp JOIN r ON fp.f = r.f)
         |SELECT doc_id, rep_id,
         |  CASE WHEN ${sqlHash31("'split:' || CAST(rep_id AS VARCHAR)")}
         |      % 100 < 10
         |    THEN 'val' ELSE 'train' END AS split
         |FROM m ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = t(s, d, "documents")
      val fps = docs.select(col("doc_id"),
        md5(graft.functions.normalizeText(col("text"))).as("f"))
      val clusters = fps
        .join(fps.groupBy("f").agg(min("doc_id").as("rep_id")), Seq("f"))
        .select("doc_id", "rep_id")
      Dedup.leakageSafeSplit(docs.select("doc_id"), "doc_id",
          clusters, "rep_id", 10)
        .select("doc_id", "rep_id", "split")
        .orderBy("doc_id")
    },

    // DEDUP: minhash signatures (k=8, 3-gram shingles).
    Q("q_d_minhash_sig",
      sigCte +
        """SELECT doc_id, array_to_string(sig, ',') AS sig
          |FROM sig ORDER BY doc_id""".stripMargin) { (s, d) =>
      Dedup.withMinHashSignature(t(s, d, "documents"), "text", 3, 8)
        .select(col("doc_id"), array_join(col("sig"), ",").as("sig"))
        .orderBy("doc_id")
    },

    // DEDUP: minhash-LSH candidate pairs (bands=4), est Jaccard.
    Q("q_d_minhash_lsh_pairs",
      sigCte +
        """, banded AS (SELECT doc_id AS id, sig,
          |    unnest([0,1,2,3]) AS band FROM sig),
          |bkt0 AS (SELECT id, sig, band,
          |  md5(concat_ws(',', band,
          |    array_to_string(sig[band*2+1:band*2+2], ','))) AS bucket
          |  FROM banded),
          |small AS (SELECT band, bucket FROM bkt0
          |          GROUP BY 1, 2 HAVING count(*) <= 1000),
          |bkt AS (SELECT bkt0.* FROM bkt0
          |        JOIN small ON bkt0.band = small.band
          |                  AND bkt0.bucket = small.bucket)
          |SELECT DISTINCT a.id AS id_a, b.id AS id_b,
          |  CAST(len(list_filter(range(1,9), i -> a.sig[i] = b.sig[i]))
          |    AS DOUBLE) / 8.0 AS est_jaccard
          |FROM bkt a JOIN bkt b
          |  ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id
          |ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
      lshPairs(s, d)
        .orderBy("id_a", "id_b")
    },

    // DEDUP DIAGNOSTIC: cross-source duplication matrix — where do
    // near-dups live? Counts LSH candidate pairs by unordered source
    // pair (off-diagonal = mirrors/scrapes across sources, diagonal =
    // in-source boilerplate). Reuses the materialized LSH pair table;
    // the matrix itself is |sources|²-bounded.
    Q("q_d_dup_matrix",
      sigCte +
        """, banded AS (SELECT doc_id AS id, sig,
          |    unnest([0,1,2,3]) AS band FROM sig),
          |bkt0 AS (SELECT id, sig, band,
          |  md5(concat_ws(',', band,
          |    array_to_string(sig[band*2+1:band*2+2], ','))) AS bucket
          |  FROM banded),
          |small AS (SELECT band, bucket FROM bkt0
          |          GROUP BY 1, 2 HAVING count(*) <= 1000),
          |bkt AS (SELECT bkt0.* FROM bkt0
          |        JOIN small ON bkt0.band = small.band
          |                  AND bkt0.bucket = small.bucket),
          |p AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
          |      FROM bkt a JOIN bkt b
          |        ON a.band = b.band AND a.bucket = b.bucket
          |        AND a.id < b.id)
          |SELECT LEAST(da.source, db.source) AS src_a,
          |  GREATEST(da.source, db.source) AS src_b,
          |  count(*) AS n_pairs
          |FROM p JOIN documents da ON p.id_a = da.doc_id
          |       JOIN documents db ON p.id_b = db.doc_id
          |GROUP BY 1, 2 ORDER BY src_a, src_b""".stripMargin) { (s, d) =>
      Dedup.dupSourceMatrix(lshPairs(s, d),
          t(s, d, "documents"), "doc_id", "source")
        .orderBy("src_a", "src_b")
    },

    // COHORT RETENTION: whole-day gap between each user's first
    // signup and first purchase (integer micros division — no
    // calendar arithmetic to disagree on), bucketed into a
    // days→users curve. Two tiny per-type aggregates and a user-keyed
    // join; the events table streams through once per leg.
    Q("q_cohort_retention",
      """WITH su AS (SELECT user_id, min(epoch_us(ts)) AS s_us
        |  FROM events WHERE event_type = 'signup' GROUP BY 1),
        |pu AS (SELECT user_id, min(epoch_us(ts)) AS p_us
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |j AS (SELECT su.user_id, (p_us - s_us) // 86400000000 AS days
        |  FROM su JOIN pu USING (user_id) WHERE p_us >= s_us)
        |SELECT days, count(*) AS n_users FROM j
        |GROUP BY 1 ORDER BY days""".stripMargin) { (s, d) =>
      val ev = events(s, d)
      val su = ev.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min(epochUs(col("ts"))).as("s_us"))
      val pu = ev.filter(col("event_type") === "purchase")
        .groupBy("user_id").agg(min(epochUs(col("ts"))).as("p_us"))
      su.join(pu, Seq("user_id"))
        .filter(col("p_us") >= col("s_us"))
        .select(expr("(p_us - s_us) div 86400000000").as("days"))
        .groupBy("days").agg(count(lit(1)).as("n_users"))
        .orderBy("days")
    },

    // DEDUP: exact bigram Jaccard with document-frequency cap.
    Q("q_d_ngram_jaccard_pairs",
      s"""WITH tok AS (SELECT doc_id, $toksD AS t FROM documents),
         |sh0 AS (SELECT doc_id AS id,
         |  unnest(list_distinct(${sqlShingles("t", 2)})) AS shingle FROM tok),
         |rare AS (SELECT shingle FROM sh0 GROUP BY shingle
         |         HAVING count(*) <= 100),
         |sh AS (SELECT id, sh0.shingle FROM sh0
         |       JOIN rare ON sh0.shingle = rare.shingle),
         |sizes AS (SELECT id, count(*) AS n_sh FROM sh GROUP BY id),
         |pairs AS (SELECT a.id AS id_a, b.id AS id_b, count(*) AS common
         |          FROM sh a JOIN sh b
         |            ON a.shingle = b.shingle AND a.id < b.id
         |          GROUP BY 1, 2)
         |SELECT id_a, id_b, common, sa.n_sh AS n_a, sb.n_sh AS n_b,
         |  CAST(common AS DOUBLE)
         |    / CAST(sa.n_sh + sb.n_sh - common AS DOUBLE) AS jaccard
         |FROM pairs JOIN sizes sa ON id_a = sa.id
         |           JOIN sizes sb ON id_b = sb.id
         |WHERE CAST(common AS DOUBLE)
         |    / CAST(sa.n_sh + sb.n_sh - common AS DOUBLE) >= 0.15
         |ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
      Dedup.ngramJaccardPairs(t(s, d, "documents"), "doc_id", "text",
          2, 0.15, 100)
        .orderBy("id_a", "id_b")
    },

    // DEDUP: exact repeated substrings (suffix-array dedup, Lee 2022)
    // — doc pairs sharing identical 16-token windows with aligned
    // match counts, found via 4 rounds of distributed prefix doubling
    // (Manber-Myers suffix ranks: the shuffled keys are two int64
    // ranks at every width, never the window text). The oracle builds
    // the literal 16-grams and joins them — graded equality proves
    // the rank tables are exact, not hash-approximate.
    Q("q_d_suffix_repeats",
      s"""WITH tok AS (SELECT doc_id, $toksD AS t FROM documents),
         |g AS (SELECT doc_id AS doc, unnest(range(0, len(t) - 15))
         |    AS off, t FROM tok),
         |gg AS (SELECT doc, off,
         |    array_to_string(t[off+1:off+16], ' ') AS gram FROM g),
         |p AS (SELECT a.doc AS doc_a, b.doc AS doc_b FROM gg a
         |      JOIN gg b ON a.gram = b.gram AND a.doc < b.doc)
         |SELECT doc_a, doc_b, CAST(count(*) AS BIGINT) AS n_matches
         |FROM p GROUP BY 1, 2 ORDER BY doc_a, doc_b""".stripMargin) {
      (s, d) =>
      graft.operators.SuffixDedup
        .repeatedSpanPairsFrom(suffixMatches16(s, d))
        .orderBy("doc_a", "doc_b")
    },

    // DEDUP: maximal exact shared spans — the gaps-and-islands rollup
    // of the suffix-rank matches: consecutive aligned width-16
    // windows on one diagonal are ONE run of run+15 tokens;
    // max_span_tokens is the Lee-2022 removal-threshold quantity.
    Q("q_d_suffix_spans",
      s"""WITH tok AS (SELECT doc_id, $toksD AS t FROM documents),
         |g AS (SELECT doc_id AS doc, unnest(range(0, len(t) - 15))
         |    AS off, t FROM tok),
         |gg AS (SELECT doc, off,
         |    array_to_string(t[off+1:off+16], ' ') AS gram FROM g),
         |m AS (SELECT a.doc AS doc_a, b.doc AS doc_b,
         |      a.off AS off_a, b.off AS off_b FROM gg a
         |      JOIN gg b ON a.gram = b.gram AND a.doc < b.doc),
         |i AS (SELECT doc_a, doc_b, off_a - off_b AS diag, off_a,
         |      off_a - row_number() OVER (PARTITION BY doc_a, doc_b,
         |        off_a - off_b ORDER BY off_a) AS isl FROM m),
         |r AS (SELECT doc_a, doc_b, CAST(count(*) AS BIGINT) AS run
         |      FROM i GROUP BY doc_a, doc_b, diag, isl)
         |SELECT doc_a, doc_b, CAST(sum(run) AS BIGINT) AS n_matches,
         |  CAST(max(run) + 15 AS BIGINT) AS max_span_tokens
         |FROM r GROUP BY 1, 2 ORDER BY doc_a, doc_b""".stripMargin) {
      (s, d) =>
      graft.operators.SuffixDedup
        .sharedRunStatsFrom(suffixMatches16(s, d), 16L)
        .orderBy("doc_a", "doc_b")
    },

    // E2E SUBSTRING DEDUP: the full Lee-2022 recipe composed from
    // graded stages — suffix-rank shared spans (D16b) thresholded at
    // 20 tokens, connected components (D5), longest-document survivor
    // per cluster. Oracle: the literal-16-gram span pipeline plus the
    // same recursive min-label closure as q_e2e_entity_res.
    Q("q_e2e_substring_dedup",
      s"""WITH tok AS (SELECT doc_id, $toksD AS t FROM documents),
         |g AS (SELECT doc_id AS doc, unnest(range(0, len(t) - 15))
         |    AS off, t FROM tok),
         |gg AS (SELECT doc, off,
         |    array_to_string(t[off+1:off+16], ' ') AS gram FROM g),
         |m AS (SELECT a.doc AS doc_a, b.doc AS doc_b,
         |      a.off AS off_a, b.off AS off_b FROM gg a
         |      JOIN gg b ON a.gram = b.gram AND a.doc < b.doc),
         |i AS (SELECT doc_a, doc_b, off_a - off_b AS diag, off_a,
         |      off_a - row_number() OVER (PARTITION BY doc_a, doc_b,
         |        off_a - off_b ORDER BY off_a) AS isl FROM m),
         |rr AS (SELECT doc_a, doc_b, CAST(count(*) AS BIGINT) AS run
         |      FROM i GROUP BY doc_a, doc_b, diag, isl),
         |pd AS (SELECT doc_a, doc_b FROM rr GROUP BY 1, 2
         |      HAVING max(run) + 15 >= 20),
         |edges AS (SELECT doc_a AS s, doc_b AS t2 FROM pd
         |          UNION SELECT doc_b, doc_a FROM pd),
         |closure AS (
         |  WITH RECURSIVE cr(s, t2) AS (
         |    SELECT s, t2 FROM edges
         |    UNION
         |    SELECT cr.s, e.t2 FROM cr JOIN edges e ON cr.t2 = e.s)
         |  SELECT s, t2 FROM cr),
         |lbl AS (SELECT s AS doc_id, least(s, min(t2)) AS cluster_id
         |        FROM closure GROUP BY s),
         |cl AS (SELECT d.doc_id,
         |        coalesce(l.cluster_id, d.doc_id) AS cluster_id,
         |        d.n_chars
         |      FROM documents d LEFT JOIN lbl l USING (doc_id)),
         |sz AS (SELECT cluster_id, CAST(count(*) AS BIGINT)
         |        AS n_members FROM cl GROUP BY 1),
         |kb AS (SELECT cluster_id, doc_id, n_chars,
         |        row_number() OVER (PARTITION BY cluster_id
         |          ORDER BY n_chars DESC, doc_id) AS rn FROM cl)
         |SELECT kb.cluster_id, sz.n_members, kb.doc_id AS kept_doc_id,
         |  CAST(kb.n_chars AS BIGINT) AS kept_n_chars
         |FROM kb JOIN sz USING (cluster_id)
         |WHERE rn = 1 AND sz.n_members >= 2
         |ORDER BY cluster_id""".stripMargin) { (s, d) =>
      val docs = t(s, d, "documents").select(col("doc_id"),
        col("n_chars"))
      val withC = docs.join(suffixClusters16(s, d), Seq("doc_id"))
      val kept = graft.operators.Dedup.keepBestPerCluster(
        withC.withColumn("__score", col("n_chars")),
        "doc_id", "cluster_id", "__score")
      val sizes = withC.groupBy("cluster_id")
        .agg(count(lit(1)).as("n_members"))
      kept.join(sizes, Seq("cluster_id"))
        .filter(col("n_members") >= 2)
        .select(col("cluster_id"), col("n_members"),
          col("doc_id").as("kept_doc_id"),
          col("n_chars").cast("long").as("kept_n_chars"))
        .orderBy("cluster_id")
    },

    // E2E SPAN-EXCISION substring dedup (E15): the Lee-2022
    // production form — E9 drops whole documents, this EXCISES the
    // repeated span and keeps the document: for every cross-document
    // repeated 16-token window, the smallest doc id keeps its copy
    // and every other occurrence's tokens are removed (runs longer
    // than 16 are covered by their overlapping windows, so the whole
    // run goes). The oracle replays the surgery relationally: literal
    // 16-gram matches → doc_b-side coverage union → positional
    // rebuild of the surviving text.
    Q("q_e2e_substring_excise",
      s"""WITH tok AS (SELECT doc_id, $toksD AS t FROM documents),
         |g AS (SELECT doc_id AS doc, unnest(range(0, len(t) - 15))
         |    AS off, t FROM tok),
         |gg AS (SELECT doc, off,
         |    array_to_string(t[off+1:off+16], ' ') AS gram FROM g),
         |m AS (SELECT DISTINCT b.doc AS doc, b.off AS off
         |      FROM gg a JOIN gg b ON a.gram = b.gram
         |                          AND a.doc < b.doc),
         |cov AS (SELECT DISTINCT doc, off + u.k AS p
         |        FROM m, range(0, 16) AS u(k)),
         |tp AS (SELECT doc_id, unnest(range(0, len(t))) AS p, t
         |       FROM tok),
         |keep AS (SELECT tp.doc_id, tp.p, tp.t[tp.p + 1] AS w
         |         FROM tp LEFT JOIN cov
         |           ON cov.doc = tp.doc_id AND cov.p = tp.p
         |         WHERE cov.p IS NULL),
         |rebuilt AS (SELECT doc_id, string_agg(w, ' ' ORDER BY p)
         |            AS clean_text FROM keep GROUP BY 1),
         |cnt AS (SELECT doc, CAST(count(*) AS BIGINT) AS n_removed
         |        FROM cov GROUP BY 1)
         |SELECT tok.doc_id, CAST(len(tok.t) AS BIGINT) AS n_toks,
         |  CAST(coalesce(cnt.n_removed, 0) AS BIGINT) AS n_removed,
         |  coalesce(rebuilt.clean_text, '') AS clean_text
         |FROM tok LEFT JOIN cnt ON cnt.doc = tok.doc_id
         |LEFT JOIN rebuilt ON rebuilt.doc_id = tok.doc_id
         |ORDER BY tok.doc_id""".stripMargin) { (s, d) =>
      graft.operators.SuffixDedup.exciseRepeatedSpansFrom(
          t(s, d, "documents"), "doc_id", "text",
          suffixMatches16(s, d), 16L)
        .orderBy("doc_id")
    },

    // E2E PRETRAIN PREP: the complete training-data preparation story
    // in ONE declarative plan, composed from graded stages —
    // substring-dedup survivors (E9) → UniMax epochs-capped language
    // mixture (CUR5) applied in deterministic doc order → contiguous
    // 256-token window packing (C6), reported per pack bucket. The
    // oracle replays every stage relationally (recursive closure,
    // waterfill, prefix-sum spans) — ~25k of the 25k-token budget
    // lands, the overshoot being exactly the kept crossing documents.
    Q("q_e2e_pretrain_prep",
      s"""WITH tok AS (SELECT doc_id, $toksD AS t FROM documents),
         |g AS (SELECT doc_id AS doc, unnest(range(0, len(t) - 15))
         |    AS off, t FROM tok),
         |gg AS (SELECT doc, off,
         |    array_to_string(t[off+1:off+16], ' ') AS gram FROM g),
         |m AS (SELECT a.doc AS doc_a, b.doc AS doc_b,
         |      a.off AS off_a, b.off AS off_b FROM gg a
         |      JOIN gg b ON a.gram = b.gram AND a.doc < b.doc),
         |i AS (SELECT doc_a, doc_b, off_a - off_b AS diag, off_a,
         |      off_a - row_number() OVER (PARTITION BY doc_a, doc_b,
         |        off_a - off_b ORDER BY off_a) AS isl FROM m),
         |rr AS (SELECT doc_a, doc_b, CAST(count(*) AS BIGINT) AS run
         |      FROM i GROUP BY doc_a, doc_b, diag, isl),
         |pd AS (SELECT doc_a, doc_b FROM rr GROUP BY 1, 2
         |      HAVING max(run) + 15 >= 20),
         |edges AS (SELECT doc_a AS s, doc_b AS t2 FROM pd
         |          UNION SELECT doc_b, doc_a FROM pd),
         |closure AS (
         |  WITH RECURSIVE cr(s, t2) AS (
         |    SELECT s, t2 FROM edges
         |    UNION
         |    SELECT cr.s, e.t2 FROM cr JOIN edges e ON cr.t2 = e.s)
         |  SELECT s, t2 FROM cr),
         |lbl AS (SELECT s AS doc_id, least(s, min(t2)) AS cluster_id
         |        FROM closure GROUP BY s),
         |cl AS (SELECT d.doc_id,
         |        coalesce(l.cluster_id, d.doc_id) AS cluster_id,
         |        d.n_chars, d.lang
         |      FROM documents d LEFT JOIN lbl l USING (doc_id)),
         |kb AS (SELECT *, row_number() OVER (PARTITION BY cluster_id
         |        ORDER BY n_chars DESC, doc_id) AS rn FROM cl),
         |kept AS (SELECT doc_id, lang FROM kb WHERE rn = 1),
         |ktok AS (SELECT k.doc_id, k.lang, CAST(len(t.t) AS BIGINT)
         |        AS n FROM kept k JOIN tok t USING (doc_id)),
         |c AS (SELECT lang, CAST(sum(n) AS BIGINT) AS nl
         |      FROM ktok GROUP BY 1),
         |cc AS (SELECT lang, nl, (nl * 1000) // 1000 AS cap FROM c),
         |tt AS (SELECT CAST(count(*) AS BIGINT) AS mm FROM cc),
         |rk AS (SELECT lang, nl, cap, mm,
         |    CAST(row_number() OVER (ORDER BY cap, lang) AS BIGINT)
         |      AS i2,
         |    CAST(sum(cap) OVER (ORDER BY cap, lang
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pincl
         |  FROM cc, tt),
         |bnd AS (SELECT *, cap * (mm - i2 + 1) <=
         |    25000 - (pincl - cap) AS binds FROM rk),
         |kk AS (SELECT coalesce(max(CASE WHEN binds THEN i2 END), 0)
         |      AS k2,
         |    coalesce(max(CASE WHEN binds THEN pincl END), 0)
         |      AS capsum FROM bnd),
         |al AS (SELECT lang, CASE WHEN binds THEN cap
         |    ELSE (25000 - capsum) // (mm - k2) + (CASE WHEN
         |      i2 - k2 <= (25000 - capsum) % (mm - k2)
         |      THEN 1 ELSE 0 END) END AS alloc FROM bnd, kk),
         |app AS (SELECT doc_id, ktok.lang, n,
         |    CAST(sum(n) OVER (PARTITION BY ktok.lang ORDER BY doc_id
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum, alloc
         |  FROM ktok JOIN al USING (lang)),
         |sel AS (SELECT doc_id, n FROM app
         |       WHERE cum - n < alloc AND n > 0),
         |b AS (SELECT doc_id, n,
         |    ${sqlHash31("'pack:' || CAST(doc_id AS VARCHAR)")} % 8
         |      AS bucket FROM sel),
         |cum2 AS (SELECT *, CAST(SUM(n) OVER (PARTITION BY bucket
         |      ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
         |      AS e FROM b),
         |sp AS (SELECT doc_id, bucket, e - n AS st, e,
         |    unnest(range((e - n) // 256, (e - 1) // 256 + 1)) AS w
         |  FROM cum2),
         |ws AS (SELECT bucket, w, CAST(sum(least(e, (w + 1) * 256)
         |      - greatest(st, w * 256)) AS BIGINT) AS toks
         |  FROM sp GROUP BY 1, 2)
         |SELECT bucket, CAST(count(*) AS BIGINT) AS n_windows,
         |  CAST(sum(toks) AS BIGINT) AS tokens,
         |  CAST(sum(CASE WHEN toks = 256 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS full_windows
         |FROM ws GROUP BY 1 ORDER BY bucket""".stripMargin) { (s, d) =>
      val docs = t(s, d, "documents")
      val kept = graft.operators.Dedup.keepBestPerCluster(
        docs.select("doc_id", "n_chars", "lang")
          .join(suffixClusters16(s, d), Seq("doc_id"))
          .withColumn("__score", col("n_chars")),
        "doc_id", "cluster_id", "__score")
        .select("doc_id", "lang")
      val ktok = kept.join(docs.select(col("doc_id"),
        size(tokens(col("text"))).cast("long").as("n")), Seq("doc_id"))
      val alloc = graft.operators.Curation
        .unimaxBudgets(ktok, "lang", "n", 25000L, 1000L)
        .select(col("lang"), col("alloc_tokens"))
      val wl = org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy("doc_id")
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, 0)
      val sel = ktok.join(broadcast(alloc), Seq("lang"))
        .withColumn("__cum", sum(col("n")).over(wl))
        .filter(col("__cum") - col("n") < col("alloc_tokens") &&
          col("n") > 0)
        .select("doc_id", "n")
      val spans = graft.operators.Sharding
        .packContiguousWindows(sel, "doc_id", "n", 256L, 8)
      graft.operators.Sharding.windowStats(spans, 256L)
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_windows"),
          sum(col("tokens")).as("tokens"),
          sum(when(col("tokens") === 256L, 1L).otherwise(0L))
            .as("full_windows"))
        .orderBy("bucket")
    },

    // DEDUP: prefix-filtered set-similarity join (SSJoin/PPJoin) —
    // EVERY pair with 3-gram Jaccard >= 0.5, no df-cap recall loss.
    // The oracle is the BRUTE-FORCE join: matching it hash-exactly is
    // the completeness theorem graded, not just the scores (the
    // prefix filter may only prune candidates the threshold would
    // reject anyway).
    Q("q_d_prefix_jaccard",
      s"""WITH tok AS (SELECT doc_id, $toksD AS t FROM documents),
         |sh AS (SELECT doc_id AS id,
         |  unnest(list_distinct(${sqlShingles("t", 4)})) AS shingle
         |  FROM tok),
         |sizes AS (SELECT id, count(*) AS n_sh FROM sh GROUP BY id),
         |pairs AS (SELECT a.id AS id_a, b.id AS id_b, count(*) AS common
         |          FROM sh a JOIN sh b
         |            ON a.shingle = b.shingle AND a.id < b.id
         |          GROUP BY 1, 2)
         |SELECT id_a, id_b, common, sa.n_sh AS n_a, sb.n_sh AS n_b,
         |  CAST(common AS DOUBLE)
         |    / CAST(sa.n_sh + sb.n_sh - common AS DOUBLE) AS jaccard
         |FROM pairs JOIN sizes sa ON id_a = sa.id
         |           JOIN sizes sb ON id_b = sb.id
         |WHERE CAST(common AS DOUBLE)
         |    / CAST(sa.n_sh + sb.n_sh - common AS DOUBLE) >= 0.5
         |ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
      prefixPairs4(s, d)
        .orderBy("id_a", "id_b")
    },

    // DEDUP PLANNER: the LSH S-curve table for every (bands, rows)
    // split of the k=8 signature budget at tau=0.5 — FP/FN masses on
    // a 5-centi grid and the error-minimizing split marked. The
    // oracle generates the SAME explicit multiply chains from the
    // same divisor list, so the curve arithmetic cannot drift.
    Q("q_d_lsh_band_plan", {
      val k = 8; val steps = 20; val tauIdx = 10
      val splits = (1 to k).filter(k % _ == 0).map(b => (b, k / b))
      val curves = splits.map { case (b, r) =>
        val s = "(CAST(i AS DOUBLE) / 20.0)"
        val sr = "(" + Seq.fill(r)(s).mkString(" * ") + ")"
        val qb = "(" + Seq.fill(b)(s"(1.0 - $sr)").mkString(" * ") + ")"
        s"""SELECT CAST($b AS BIGINT) AS bands,
           |  CAST($r AS BIGINT) AS rows,
           |  CAST((i * 100) // $steps AS BIGINT) AS s_centi,
           |  CAST(floor((1.0 - $qb) * 1000000) AS BIGINT) AS p_micro,
           |  i AS i FROM range(1, ${steps + 1}) t(i)""".stripMargin
      }.mkString("\nUNION ALL ")
      s"""WITH curve AS ($curves),
         |m AS (SELECT bands, rows,
         |    CAST(sum(CASE WHEN i < $tauIdx THEN p_micro ELSE 0 END)
         |      AS BIGINT) AS fp_micro,
         |    CAST(sum(CASE WHEN i >= $tauIdx THEN 1000000 - p_micro
         |      ELSE 0 END) AS BIGINT) AS fn_micro
         |  FROM curve GROUP BY 1, 2),
         |r AS (SELECT *, fp_micro + fn_micro AS err_micro,
         |    row_number() OVER (ORDER BY fp_micro + fn_micro, bands)
         |      = 1 AS chosen FROM m)
         |SELECT c.bands, c.rows, c.s_centi, c.p_micro, r.fp_micro,
         |  r.fn_micro, r.err_micro, r.chosen
         |FROM curve c JOIN r ON c.bands = r.bands AND c.rows = r.rows
         |ORDER BY c.bands, c.s_centi""".stripMargin
    }) { (s, d) =>
      Dedup.lshBandPlan(s, k = 8, threshold = 0.5, steps = 20)
        .orderBy("bands", "s_centi")
    },

    // DEDUP HARNESS: measured recall/precision of the MinHash-LSH
    // rung against the EXACT Jaccard >= 0.5 pair set (itself graded
    // complete in q_d_prefix_jaccard) — the numbers that validate a
    // (k, bands) choice against the S-curve before a corpus-wide run.
    Q("q_d_lsh_recall",
      s"""WITH tok AS (SELECT doc_id, $toksD AS t FROM documents),
         |sh AS (SELECT doc_id, list_distinct(${sqlShingles("t", 4)})
         |    AS s FROM tok),
         |sig AS (SELECT doc_id, [${sigExprs.mkString(", ")}] AS sig
         |        FROM sh),
         |banded AS (SELECT doc_id AS id, sig,
         |    unnest([0,1,2,3]) AS band FROM sig),
         |bkt0 AS (SELECT id, band, md5(concat_ws(',', band,
         |    array_to_string(sig[band*2+1:band*2+2], ','))) AS bucket
         |  FROM banded),
         |small AS (SELECT band, bucket FROM bkt0
         |          GROUP BY 1, 2 HAVING count(*) <= 1000),
         |bkt AS (SELECT bkt0.* FROM bkt0
         |        JOIN small ON bkt0.band = small.band
         |                  AND bkt0.bucket = small.bucket),
         |cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
         |  FROM bkt a JOIN bkt b ON a.band = b.band
         |    AND a.bucket = b.bucket AND a.id < b.id),
         |shx AS (SELECT doc_id AS id, unnest(s) AS shingle FROM sh),
         |sizes AS (SELECT id, count(*) AS n_sh FROM shx GROUP BY id),
         |pairs AS (SELECT a.id AS id_a, b.id AS id_b,
         |    count(*) AS common
         |  FROM shx a JOIN shx b
         |    ON a.shingle = b.shingle AND a.id < b.id GROUP BY 1, 2),
         |ex AS (SELECT id_a, id_b FROM pairs
         |  JOIN sizes sa ON id_a = sa.id JOIN sizes sb ON id_b = sb.id
         |  WHERE CAST(common AS DOUBLE)
         |    / CAST(sa.n_sh + sb.n_sh - common AS DOUBLE) >= 0.5),
         |h AS (SELECT count(*) AS hits FROM cand
         |      JOIN ex ON cand.id_a = ex.id_a AND cand.id_b = ex.id_b),
         |ne AS (SELECT count(*) AS n_exact FROM ex),
         |nc AS (SELECT count(*) AS n_cand FROM cand)
         |SELECT CAST(n_exact AS BIGINT) AS n_exact,
         |  CAST(n_cand AS BIGINT) AS n_cand, CAST(hits AS BIGINT)
         |    AS hits,
         |  CASE WHEN n_exact = 0 THEN 0 ELSE
         |    (CAST(hits AS BIGINT) * 1000) // CAST(n_exact AS BIGINT)
         |    END AS recall_milli,
         |  CASE WHEN n_cand = 0 THEN 0 ELSE
         |    (CAST(hits AS BIGINT) * 1000) // CAST(n_cand AS BIGINT)
         |    END AS precision_milli
         |FROM ne, nc, h""".stripMargin) { (s, d) =>
      Dedup.lshRecallReportFrom(prefixPairs4(s, d),
        Dedup.minHashLshPairs(t(s, d, "documents"), "doc_id", "text",
          shingleSize = 4, k = 8, bands = 4, maxBucket = 1000))
    },

    // DEDUP: asymmetric containment (Broder 1997) — catches subset
    // duplication (a doc wholly quoted inside a longer one) that
    // symmetric Jaccard scores near zero. Milli-quantized integer
    // containments; a pair survives when EITHER direction >= 0.35.
    Q("q_d_containment_pairs",
      s"""WITH tok AS (SELECT doc_id, $toksD AS t FROM documents),
         |sh0 AS (SELECT doc_id AS id,
         |  unnest(list_distinct(${sqlShingles("t", 2)})) AS shingle FROM tok),
         |rare AS (SELECT shingle FROM sh0 GROUP BY shingle
         |         HAVING count(*) <= 100),
         |sh AS (SELECT id, sh0.shingle FROM sh0
         |       JOIN rare ON sh0.shingle = rare.shingle),
         |sizes AS (SELECT id, count(*) AS n_sh FROM sh GROUP BY id),
         |pairs AS (SELECT a.id AS id_a, b.id AS id_b, count(*) AS common
         |          FROM sh a JOIN sh b
         |            ON a.shingle = b.shingle AND a.id < b.id
         |          GROUP BY 1, 2)
         |SELECT id_a, id_b, CAST(common AS BIGINT) AS common,
         |  CAST(sa.n_sh AS BIGINT) AS n_a, CAST(sb.n_sh AS BIGINT) AS n_b,
         |  CAST((common * 1000) // sa.n_sh AS BIGINT) AS cont_a_milli,
         |  CAST((common * 1000) // sb.n_sh AS BIGINT) AS cont_b_milli
         |FROM pairs JOIN sizes sa ON id_a = sa.id
         |           JOIN sizes sb ON id_b = sb.id
         |WHERE (common * 1000) // sa.n_sh >= 350
         |   OR (common * 1000) // sb.n_sh >= 350
         |ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
      Dedup.containmentPairs(t(s, d, "documents"), "doc_id", "text",
          2, 0.35, 100)
        .orderBy("id_a", "id_b")
    },

    // DEDUP: simhash fingerprints (16-bit).
    Q("q_d_simhash",
      simCte(16) + "SELECT doc_id, simhash FROM sim ORDER BY doc_id") {
      (s, d) =>
      Dedup.withSimHash(t(s, d, "documents"), "doc_id", "text", 16)
        .select("doc_id", "simhash")
        .orderBy("doc_id")
    },

    // DEDUP endgame: connected-component clusters over the LSH
    // candidate pairs — cluster_id = min doc id in the component
    // (oracle: recursive transitive closure, identical min-label
    // semantics at fixpoint).
    Q("q_d_dedup_clusters",
      clusterCte +
        "SELECT doc_id, cluster_id FROM clusters ORDER BY doc_id") {
      (s, d) =>
      sparkClusters(s, d).orderBy("doc_id")
    },

    // DEDUP endgame, DEEP-CHAIN regime (D8): star connected
    // components over a chain-heavy edge set — consecutive doc_ids
    // under 1024 within each residue class mod 16 form one long PATH
    // per class (diameter 64 at sf≥0.1, 31 at sf0.01 — past plain
    // propagation's default 20-iteration cap either way; the shape
    // the reference's anti-join cleanup chains take at
    // utils/cleanup_incorrect_products.py:128-144). The
    // large-star/small-star alternation contracts these chains in
    // O(log² n) rounds; the oracle is the SAME recursive-closure
    // min-label formulation that grades q_d_dedup_clusters, so the
    // equal-answer law is now CORRECTNESS-graded exactly where the
    // two CC variants differ operationally. The id cap keeps the
    // graded slice's DIAMETER (and hence round count) fixed as the
    // corpus scales — depth is the regime under test, not volume.
    Q("q_d_dedup_clusters_star",
      """WITH ch AS (SELECT doc_id,
        |    lag(doc_id) OVER (PARTITION BY doc_id % 16
        |                      ORDER BY doc_id) AS prev
        |  FROM documents WHERE doc_id < 1024),
        |cpairs AS (SELECT prev AS id_a, doc_id AS id_b FROM ch
        |           WHERE prev IS NOT NULL),
        |edges AS (SELECT id_a AS s, id_b AS t FROM cpairs
        |          UNION SELECT id_b, id_a FROM cpairs),
        |closure AS (
        |  WITH RECURSIVE r(s, t) AS (
        |    SELECT s, t FROM edges
        |    UNION
        |    SELECT r.s, e.t FROM r JOIN edges e ON r.t = e.s)
        |  SELECT * FROM r)
        |SELECT doc_id, least(doc_id,
        |    coalesce((SELECT min(t) FROM closure WHERE s = doc_id),
        |             doc_id)) AS cluster_id
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = t(s, d, "documents").select("doc_id")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id") % 16).orderBy(col("doc_id"))
      val chain = docs.filter(col("doc_id") < 1024)
        .withColumn("prev", lag(col("doc_id"), 1).over(w))
        .filter(col("prev").isNotNull)
        .select(col("prev").as("id_a"), col("doc_id").as("id_b"))
      Dedup.duplicateClustersStar(docs, "doc_id", chain)
        .orderBy("doc_id")
    },

    // DEDUP keep-policy: one surviving document per cluster — the
    // longest member (whitespace token count), ties to the smallest
    // doc_id. This is the query a 100 TB dedup pipeline actually ends
    // with: clusters in, kept corpus out.
    Q("q_d_keep_best",
      clusterCte +
        s""", toks AS (SELECT doc_id, CAST(len($toksD) AS BIGINT)
           |    AS n_toks FROM documents),
           |ranked AS (SELECT c.doc_id, c.cluster_id, toks.n_toks,
           |    row_number() OVER (PARTITION BY c.cluster_id
           |      ORDER BY toks.n_toks DESC, c.doc_id) AS rn
           |  FROM clusters c JOIN toks ON c.doc_id = toks.doc_id)
           |SELECT doc_id, cluster_id, n_toks FROM ranked WHERE rn = 1
           |ORDER BY cluster_id""".stripMargin) { (s, d) =>
      val clustered = sparkClusters(s, d)
        .join(t(s, d, "documents")
            .select(col("doc_id"),
              size(tokens(col("text"))).cast("long").as("n_toks")),
          Seq("doc_id"))
      Dedup.keepBestPerCluster(clustered, "doc_id", "cluster_id", "n_toks")
        .select("doc_id", "cluster_id", "n_toks")
        .orderBy("cluster_id")
    },

    // SOFT DEDUP (D24): keep every document, weight duplicates by
    // 1/cluster_size milli (Muennighoff 2023) — each distinct content
    // unit contributes one document's worth of training mass; feeds
    // the weighted samplers directly.
    Q("q_d_soft_dedup",
      clusterCte +
        s""", sz AS (SELECT cluster_id, CAST(count(*) AS BIGINT)
           |    AS size FROM clusters GROUP BY 1),
           |w AS (SELECT d.doc_id,
           |    coalesce(sz.size, 1) AS cluster_size,
           |    greatest(1, 1000 // coalesce(sz.size, 1)) AS weight_milli
           |  FROM documents d
           |  LEFT JOIN clusters c ON d.doc_id = c.doc_id
           |  LEFT JOIN sz ON c.cluster_id = sz.cluster_id)
           |SELECT doc_id, CAST(cluster_size AS BIGINT) AS cluster_size,
           |  CAST(weight_milli AS BIGINT) AS weight_milli
           |FROM w ORDER BY doc_id""".stripMargin) { (s, d) =>
      graft.operators.Dedup.softDedupWeights(
          t(s, d, "documents").select("doc_id"),
          sparkClusters(s, d), "doc_id", "cluster_id")
        .select("doc_id", "cluster_size", "weight_milli")
        .orderBy("doc_id")
    },

    // E2E (E14): soft-dedup-weighted resampling — D24's weights feed
    // C12's exact-size reservoir in ONE plan: duplicates survive into
    // the pool but their 1/size weights make each distinct unit
    // equally likely to land in the sample ("hard dedup = resample
    // to the mass", executable). Oracle replays clusters → weights →
    // the A-Res priority ladder.
    Q("q_e2e_soft_dedup_sample",
      clusterCte +
        s""", sz AS (SELECT cluster_id, CAST(count(*) AS BIGINT)
           |    AS size FROM clusters GROUP BY 1),
           |w AS (SELECT d.doc_id,
           |    greatest(1, 1000 // coalesce(sz.size, 1)) AS weight_milli
           |  FROM documents d
           |  LEFT JOIN clusters c ON d.doc_id = c.doc_id
           |  LEFT JOIN sz ON c.cluster_id = sz.cluster_id),
           |p AS (SELECT doc_id, weight_milli,
           |    CAST(floor(ln(
           |      (${sqlHash60("'res:soft:' || CAST(doc_id AS VARCHAR)")}
           |        + 1) / 1152921504606846976.0) * 1000000) AS BIGINT)
           |      AS lnu_micro
           |  FROM w)
           |SELECT doc_id, weight_milli AS weight, lnu_micro,
           |  CAST(lnu_micro AS DOUBLE) / CAST(weight_milli AS DOUBLE)
           |    AS priority
           |FROM p ORDER BY priority DESC, doc_id
           |LIMIT 40""".stripMargin) { (s, d) =>
      graft.operators.Curation.weightedReservoirSample(
          graft.operators.Dedup.softDedupWeights(
            t(s, d, "documents").select("doc_id"),
            sparkClusters(s, d), "doc_id", "cluster_id"),
          "doc_id", "weight_milli", 40, "soft")
    },

    // DEDUP REPORT (D19): the cluster-size histogram + headline
    // duplicate ratio over the LSH clusters — the table a dedup run
    // actually publishes ("removed X% of docs; size distribution
    // was…"); totals and the milli ratio ride on every row so a
    // threshold alert reads one row.
    Q("q_d_dedup_stats",
      clusterCte +
        s""", sz AS (SELECT cluster_id, CAST(count(*) AS BIGINT)
           |    AS size FROM clusters GROUP BY 1),
           |hist AS (SELECT size, CAST(count(*) AS BIGINT)
           |    AS n_clusters FROM sz GROUP BY 1),
           |tot AS (SELECT CAST(sum(size * n_clusters) AS BIGINT)
           |      AS docs_total,
           |    CAST(sum(n_clusters) AS BIGINT) AS clusters_total
           |  FROM hist)
           |SELECT size, n_clusters, size * n_clusters AS n_docs,
           |  docs_total, clusters_total,
           |  ((docs_total - clusters_total) * 1000) // docs_total
           |    AS dup_ratio_milli
           |FROM hist, tot ORDER BY size""".stripMargin) { (s, d) =>
      Dedup.dedupStats(sparkClusters(s, d), "doc_id", "cluster_id")
        .orderBy("size")
    },

    // E2E CURATION — the full training-corpus pipeline in ONE query:
    // analyze (quality) → threshold filter → near-dup clusters →
    // keep-best survivor per cluster → deterministic 50% sample →
    // token-budget shard packing. Every stage is an already-verified
    // operator; this proves they compose bit-exactly end to end.
    Q("q_e2e_curation",
      clusterCte +
        s""", qb AS (SELECT doc_id, text, $normD AS norm FROM documents),
           |qt AS (SELECT doc_id, text,
           |  (CASE WHEN norm = '' THEN [] ELSE string_split(norm, ' ') END)
           |    AS toks FROM qb),
           |qm AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS ws_tokens,
           |  (CASE WHEN length(coalesce(text,'')) = 0 THEN 0.0 ELSE
           |    CAST(length(coalesce(text,'')) - length(regexp_replace(
           |      coalesce(text,''), '[[:punct:]]', '', 'g')) AS DOUBLE)
           |    / CAST(length(coalesce(text,'')) AS DOUBLE) END)
           |    AS punct_ratio,
           |  (CASE WHEN len(toks) = 0 THEN 0.0 ELSE
           |    CAST(list_aggregate(list_transform(toks, x -> length(x)),
           |      'sum') AS DOUBLE) / CAST(len(toks) AS DOUBLE) END)
           |    AS mean_token_len FROM qt),
           |qq AS (SELECT doc_id, ws_tokens,
           |  least(CAST(ws_tokens AS DOUBLE) / 64.0, 1.0) * 0.4
           |    + greatest(0.0, 1.0 - punct_ratio * 4.0) * 0.3
           |    + (CASE WHEN mean_token_len >= 2.5 AND mean_token_len <= 10.0
           |       THEN 1.0 ELSE 0.5 END) * 0.3 AS quality FROM qm),
           |kept AS (SELECT q.doc_id, q.ws_tokens, q.quality, c.cluster_id
           |  FROM qq q JOIN clusters c ON q.doc_id = c.doc_id
           |  WHERE q.quality >= 0.8),
           |best AS (SELECT *, row_number() OVER (PARTITION BY cluster_id
           |    ORDER BY ws_tokens DESC, doc_id) AS rn FROM kept),
           |samp AS (SELECT doc_id, cluster_id, ws_tokens, quality
           |  FROM best WHERE rn = 1
           |    AND ${sqlHash31("'samp:' || CAST(doc_id AS VARCHAR)")}
           |        % 100 < 50),
           |sbk AS (SELECT *,
           |  ${sqlHash31("'shard:' || CAST(doc_id AS VARCHAR)")} % 4
           |    AS bucket FROM samp),
           |scum AS (SELECT *, SUM(ws_tokens) OVER (PARTITION BY bucket
           |    ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cumt FROM sbk)
           |SELECT doc_id, cluster_id, bucket,
           |  CAST(FLOOR((cumt - ws_tokens) / 2000.0) AS BIGINT) AS shard,
           |  ws_tokens, quality
           |FROM scum ORDER BY doc_id""".stripMargin) { (s, d) =>
      val an = analyzed(s, d)
        .select(col("doc_id"), col("ws_tokens"), col("quality"))
      val kept = an.join(sparkClusters(s, d), Seq("doc_id"))
        .filter(col("quality") >= 0.8)
      val best = Dedup.keepBestPerCluster(kept, "doc_id", "cluster_id",
        "ws_tokens")
      val samp = best.filter(hashBucket(col("doc_id"), 100) < 50)
      graft.operators.Sharding
        .packByTokenBudget(samp, "doc_id", "ws_tokens", 2000L, 4)
        .select("doc_id", "cluster_id", "bucket", "shard", "ws_tokens",
          "quality")
        .orderBy("doc_id")
    },

    // QUALITY: per-document character-level Shannon entropy in
    // micro-nats — the pre-tokenization "text or noise" screen
    // (repeated padding scores near zero, random bytes near
    // ln(alphabet)). One micro-floored ln per distinct (doc, char)
    // count, exact int64 everywhere else — engine-exact.
    Q("q_t_char_entropy",
      """WITH ch AS (SELECT doc_id, unnest(string_split(text, ''))
        |    AS ch FROM documents),
        |c AS (SELECT doc_id, ch, count(*) AS c FROM ch
        |  WHERE ch <> '' GROUP BY 1, 2),
        |a AS (SELECT doc_id, sum(c) AS n, count(*) AS nd,
        |    sum(c * CAST(floor(ln(CAST(c AS DOUBLE)) * 1000000)
        |      AS BIGINT)) AS s
        |  FROM c GROUP BY 1)
        |SELECT doc_id, CAST(n AS BIGINT) AS n_chars,
        |  CAST(nd AS BIGINT) AS n_distinct,
        |  CAST(CAST(floor(ln(CAST(n AS DOUBLE)) * 1000000) AS BIGINT)
        |    - s // n AS BIGINT) AS entropy_micro
        |FROM a ORDER BY doc_id""".stripMargin) { (s, d) =>
      TextAnalysis.charEntropy(t(s, d, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    },

    // VOCABULARY: token document frequencies, top-100 — the corpus
    // stats a tokenizer/BPE training step starts from. Map-side
    // distinct (array_distinct before explode) keeps the shuffle to
    // one row per (doc, distinct token).
    Q("q_t_vocab",
      s"""WITH tok AS (SELECT doc_id, $toksD AS t FROM documents),
         |tu AS (SELECT doc_id, unnest(list_distinct(t)) AS token
         |       FROM tok)
         |SELECT token, count(*) AS df FROM tu GROUP BY token
         |ORDER BY df DESC, token LIMIT 100""".stripMargin) { (s, d) =>
      t(s, d, "documents")
        .select(explode(array_distinct(tokens(col("text")))).as("token"))
        .groupBy("token").agg(count(lit(1)).as("df"))
        .orderBy(col("df").desc, col("token")).limit(100)
    },

    // HASHING-TRICK FEATURIZER (T23): vocabulary-free fixed-width
    // vectorization — index = hash31 % dim, ±1 sign from the second
    // hash's parity, value = signed occurrence sum (collisions
    // unbiased in expectation), zero-sum features dropped. No
    // dictionary pass, no vocab broadcast: the hash IS the vocab.
    Q("q_t_feature_hash",
      s"""WITH tok AS (SELECT doc_id, $toksD AS t FROM documents),
         |e AS (SELECT doc_id, unnest(t) AS tk FROM tok),
         |f AS (SELECT doc_id,
         |    ${sqlHash31("concat('fh:', tk)")} % 64 AS idx,
         |    CASE WHEN ${sqlHash60b("tk")} % 2 = 1 THEN 1 ELSE -1 END
         |      AS sgn
         |  FROM e)
         |SELECT doc_id, idx, CAST(sum(sgn) AS BIGINT) AS weight
         |FROM f GROUP BY 1, 2 HAVING sum(sgn) != 0
         |ORDER BY doc_id, idx""".stripMargin) { (s, d) =>
      graft.operators.TextAnalysis
        .featureHash(t(s, d, "documents"), "doc_id", "text", 64)
        .orderBy("doc_id", "idx")
    },

    // PII PRECISION (T24): Luhn check-digit validation of card-shaped
    // digit runs — the filter that separates a 16-digit order id
    // (fails Luhn ~90% of the time) from a real card number before
    // redaction fires. Candidates synthesized per doc; one in seven
    // is a non-digit string pinning the false-not-null contract.
    Q("q_t_luhn",
      s"""WITH cand AS (SELECT doc_id,
         |    CASE WHEN doc_id % 7 = 0 THEN '4539x0000000'
         |    ELSE concat('45390',
         |      lpad(CAST(doc_id % 100000 AS VARCHAR), 5, '0'),
         |      '1234567') END AS num
         |  FROM documents)
         |SELECT doc_id, num, ${sqlLuhnValid("num")} AS luhn_ok
         |FROM cand ORDER BY doc_id""".stripMargin) { (s, d) =>
      t(s, d, "documents")
        .withColumn("num",
          when(col("doc_id") % 7 === 0, lit("4539x0000000"))
            .otherwise(concat(lit("45390"),
              lpad((col("doc_id") % 100000).cast("string"), 5, "0"),
              lit("1234567"))))
        .select(col("doc_id"), col("num"),
          luhnValid(col("num")).as("luhn_ok"))
        .orderBy("doc_id")
    },

    // PSEUDONYMIZATION (T25): keyed HMAC-SHA256 tokenization — the
    // governance step that replaces PII with join-preserving tokens.
    // Graded against the RFC 4231 test vectors (the oracle is the
    // published expected digests; binary keys/messages via unhex).
    Q("q_t_pseudonymize",
      """SELECT * FROM (VALUES
        |  (CAST(1 AS BIGINT),
        |   'b0344c61d8db38535ca8afceaf0bf12b881dc200c9833da726e9376c2e32cff7'),
        |  (CAST(2 AS BIGINT),
        |   '5bdcc146bf60754e6a042426089575c75a003f089d2739839dec58b964ec3843'),
        |  (CAST(3 AS BIGINT),
        |   '773ea91e36800e46854db8ebd09181a72959098b3ef8c122d9635514ced565fe'),
        |  (CAST(4 AS BIGINT),
        |   '82558a389a443c0ea4cc819899f2083a85f0faa3e578f8077a2e3ff46729665b'))
        |  AS t(case_id, hmac_hex) ORDER BY case_id""".stripMargin) {
      (s, _) =>
      import s.implicits._
      def hx(b: Array[Byte]): String = b.map("%02x".format(_)).mkString
      val cases = Seq(
        (1L, "0b" * 20, hx("Hi There".getBytes("UTF-8"))),
        (2L, hx("Jefe".getBytes("UTF-8")),
          hx("what do ya want for nothing?".getBytes("UTF-8"))),
        (3L, "aa" * 20, "dd" * 50),
        (4L, (1 to 25).map("%02x".format(_)).mkString, "cd" * 50))
        .toDF("case_id", "key_hex", "val_hex")
      cases.select($"case_id",
          call_function("graft_hmac_sha256", unhex($"key_hex"),
            unhex($"val_hex")).as("hmac_hex"))
        .orderBy("case_id")
    },

    // TOKENIZER COVERAGE: per-doc out-of-vocabulary rate against the
    // top-16 df vocab (16 < the corpus's 31 distinct tokens, so the
    // OOV mass is real at every SF). Vocab broadcasts; counts
    // partial-aggregate; every doc reported, empty docs 0/0/0.
    Q("q_t_oov",
      s"""WITH tok AS (SELECT doc_id, $toksD AS t FROM documents),
         |v AS (SELECT token FROM (
         |    SELECT doc_id, unnest(list_distinct(t)) AS token FROM tok)
         |  GROUP BY token ORDER BY count(*) DESC, token LIMIT 16),
         |e AS (SELECT doc_id, unnest(t) AS tk FROM tok),
         |c AS (SELECT e.doc_id, count(*) AS n_toks,
         |    count(*) FILTER (v.token IS NULL) AS n_oov
         |  FROM e LEFT JOIN v ON e.tk = v.token GROUP BY 1)
         |SELECT tok.doc_id, CAST(coalesce(c.n_toks, 0) AS BIGINT)
         |    AS n_toks,
         |  CAST(coalesce(c.n_oov, 0) AS BIGINT) AS n_oov,
         |  CAST(CASE WHEN coalesce(c.n_toks, 0) = 0 THEN 0
         |    ELSE coalesce(c.n_oov, 0) * 1000 // c.n_toks END
         |    AS BIGINT) AS oov_milli
         |FROM tok LEFT JOIN c USING (doc_id)
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = t(s, d, "documents")
      val vocab = docs
        .select(explode(array_distinct(tokens(col("text"))))
          .as("token"))
        .groupBy("token").agg(count(lit(1)).as("df"))
        .orderBy(col("df").desc, col("token")).limit(16)
        .select("token")
      TextAnalysis.oovRate(docs, "doc_id", "text", vocab)
        .orderBy("doc_id")
    },

    // STRATIFIED SAMPLE: at most 20 docs per language, chosen by
    // md5-hash order (deterministic, unbiased within stratum) — the
    // balanced-subset op for mixed-language corpora.
    Q("q_samp_stratified",
      s"""SELECT lang, doc_id FROM (
         |  SELECT lang, doc_id, row_number() OVER (PARTITION BY lang
         |    ORDER BY ${sqlHash31("'strat:' || CAST(doc_id AS VARCHAR)")},
         |      doc_id) AS rn
         |  FROM documents)
         |WHERE rn <= 20 ORDER BY lang, doc_id""".stripMargin) { (s, d) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang"))
        .orderBy(hash31(concat(lit("strat:"),
          col("doc_id").cast("string"))), col("doc_id"))
      t(s, d, "documents")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 20)
        .select("lang", "doc_id")
        .orderBy("lang", "doc_id")
    },

    // E2E INCREMENTAL REFRESH: the arriving-batch path of a corpus
    // pipeline as ONE composed plan — ledger anti-join (only unseen
    // doc ids proceed), model-based quality filter, then exact-
    // content dedup against the existing corpus (md5 of normalized
    // text). Three stages, three scale-safe shapes: anti equi-join,
    // narrow scoring pass, fingerprint anti equi-join — the arriving
    // batch is the only side that ever re-shuffles.
    Q("q_e2e_refresh",
      s"""WITH existing AS (SELECT * FROM documents WHERE doc_id % 2 = 0),
         |batch AS (SELECT * FROM documents WHERE doc_id % 3 = 0),
         |fresh AS (SELECT b.* FROM batch b WHERE NOT EXISTS
         |  (SELECT 1 FROM existing e WHERE e.doc_id = b.doc_id)),
         |q AS (SELECT doc_id, lang, text,
         |    LEAST(len($toksD), 256) * 4
         |    + len(list_filter($toksD, t -> t IN (${inList("en")}))) * 30
         |    + len(list_distinct($toksD)) * 8
         |    - length($normD) - 200 AS score
         |  FROM fresh),
         |kept AS (SELECT * FROM q WHERE score >= 0),
         |ded AS (SELECT k.* FROM kept k WHERE NOT EXISTS
         |  (SELECT 1 FROM existing e
         |   WHERE md5(${sqlNormText("e.text")}) = md5(${sqlNormText("k.text")})))
         |SELECT doc_id, lang, CAST(score AS BIGINT) AS score
         |FROM ded ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = t(s, d, "documents")
      val existing = docs.filter(col("doc_id") % 2 === 0)
      val batch = docs.filter(col("doc_id") % 3 === 0)
      val fresh = graft.streaming.Incremental
        .newItems(batch, existing, Seq("doc_id"))
      val kept = TextAnalysis.linearQualityScore(fresh, "text")
        .filter(col("keep") === 1)
      kept.withColumn("__fp", TextAnalysis.contentFingerprint(col("text")))
        .join(existing
          .select(TextAnalysis.contentFingerprint(col("text")).as("__fp"))
          .distinct(),
          Seq("__fp"), "left_anti")
        .select(col("doc_id"), col("lang"), col("score"))
        .orderBy("doc_id")
    },

    // QUALITY MODEL: linear classifier over exact integer features —
    // the fastText-classifier role (score every doc, keep above
    // threshold) with interpretable stub weights; production swaps in
    // trained coefficients, the scoring plumbing is identical. Both
    // classes are populated at every graded SF (bias −200 splits the
    // corpus near its median raw score).
    Q("q_t_quality_lr",
      s"""WITH f AS (SELECT doc_id,
         |    LEAST(len($toksD), 256) AS f_tokens,
         |    len(list_filter($toksD, t -> t IN (${inList("en")})))
         |      AS f_stop,
         |    len(list_distinct($toksD)) AS f_distinct,
         |    length($normD) AS f_chars
         |  FROM documents)
         |SELECT doc_id, CAST(f_tokens AS BIGINT) AS f_tokens,
         |  CAST(f_stop AS BIGINT) AS f_stop,
         |  CAST(f_distinct AS BIGINT) AS f_distinct,
         |  CAST(f_chars AS BIGINT) AS f_chars,
         |  CAST(f_tokens*4 + f_stop*30 + f_distinct*8 - f_chars - 200
         |    AS BIGINT) AS score,
         |  CAST(CASE WHEN f_tokens*4 + f_stop*30 + f_distinct*8
         |    - f_chars - 200 >= 0 THEN 1 ELSE 0 END AS INTEGER) AS keep
         |FROM f ORDER BY doc_id""".stripMargin) { (s, d) =>
      TextAnalysis.linearQualityScore(t(s, d, "documents"), "text")
        .select("doc_id", "f_tokens", "f_stop", "f_distinct",
          "f_chars", "score", "keep")
        .orderBy("doc_id")
    },

    // QUALITY EVAL: exact Mann-Whitney AUC of the quality score
    // against an independent ground truth (lang = 'en'). On this
    // synthetic corpus the text carries no language signal, so the
    // honest readout is ~0.5 — the oracle grades the rank-sum
    // MACHINERY exactly (midrank ties, doubled-rank identity,
    // integer micro); TextOpsSpec pins real discrimination cases.
    // The window runs over the DISTINCT-score frame, never the corpus.
    Q("q_t_quality_auc",
      s"""WITH f AS (SELECT
         |    (CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS y,
         |    LEAST(len($toksD), 256)*4
         |      + len(list_filter($toksD, t -> t IN (${inList("en")})))*30
         |      + len(list_distinct($toksD))*8
         |      - length($normD) - 200 AS s
         |  FROM documents),
         |b AS (SELECT s, sum(y) AS np, count(*) AS n FROM f GROUP BY 1),
         |r AS (SELECT s, np, n, coalesce(sum(n) OVER (ORDER BY s
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |    AS below FROM b),
         |a AS (SELECT sum(np*(2*below+n+1)) AS r2, sum(np) AS npos,
         |    sum(n-np) AS nneg FROM r)
         |SELECT CAST(npos AS BIGINT) AS n_pos,
         |  CAST(nneg AS BIGINT) AS n_neg,
         |  CAST((1000000*(r2 - npos*(npos+1))) // (2*npos*nneg)
         |    AS BIGINT) AS auc_micro
         |FROM a""".stripMargin) { (s, d) =>
      val scored = TextAnalysis.linearQualityScore(
          t(s, d, "documents"), "text")
        .withColumn("y", (col("lang") === "en").cast("int"))
      TextAnalysis.aucExact(scored, "score", "y")
    },

    // QUALITY EVAL: reliability-diagram bins — rank-based deciles of
    // the quality score with observed positive rate per bin, exact
    // integers, tie-deterministic (whole tie groups share a bin).
    // Same collapsed-frame posture as q_t_quality_auc.
    Q("q_t_calibration",
      s"""WITH f AS (SELECT
         |    (CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS y,
         |    LEAST(len($toksD), 256)*4
         |      + len(list_filter($toksD, t -> t IN (${inList("en")})))*30
         |      + len(list_distinct($toksD))*8
         |      - length($normD) - 200 AS s
         |  FROM documents),
         |b AS (SELECT s, sum(y) AS np, count(*) AS n FROM f GROUP BY 1),
         |r AS (SELECT s, np, n,
         |    coalesce(sum(n) OVER (ORDER BY s ROWS BETWEEN UNBOUNDED
         |      PRECEDING AND 1 PRECEDING), 0) AS below,
         |    sum(n) OVER () AS tot FROM b),
         |g AS (SELECT below * 10 // tot AS bin, sum(n) AS n,
         |    sum(np) AS n_pos, min(s) AS score_min, max(s) AS score_max
         |  FROM r GROUP BY 1)
         |SELECT CAST(bin AS BIGINT) AS bin, CAST(n AS BIGINT) AS n,
         |  CAST(n_pos AS BIGINT) AS n_pos,
         |  CAST(n_pos * 1000 // n AS BIGINT) AS pos_milli,
         |  CAST(score_min AS BIGINT) AS score_min,
         |  CAST(score_max AS BIGINT) AS score_max
         |FROM g ORDER BY bin""".stripMargin) { (s, d) =>
      val scored = TextAnalysis.linearQualityScore(
          t(s, d, "documents"), "text")
        .withColumn("y", (col("lang") === "en").cast("int"))
      TextAnalysis.calibrationBins(scored, "score", "y", 10)
        .orderBy("bin")
    },

    // QUALITY: duplicate word-bigram mass — the Gopher-family
    // repetition filter (share of n-gram occurrences whose n-gram
    // repeats inside the document). Graded at n=2 because the
    // synthetic corpus has a small vocabulary (higher n never
    // repeats there — TextOpsSpec exercises n=5 on constructed
    // templated text); exact integer milli so the filter threshold
    // is engine-independent.
    Q("q_t_dup_ngrams",
      s"""WITH toks AS (SELECT doc_id, $toksD AS ts FROM documents),
         |grams AS (
         |  SELECT doc_id, unnest([array_to_string(ts[i:i+1], ' ')
         |    FOR i IN generate_series(1, len(ts) - 1)]) AS g
         |  FROM toks WHERE len(ts) >= 2),
         |cnt AS (SELECT doc_id, g, count(*) AS c
         |  FROM grams GROUP BY 1, 2),
         |agg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_grams,
         |    CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT)
         |      AS dup_grams
         |  FROM cnt GROUP BY 1)
         |SELECT d.doc_id,
         |  coalesce(a.n_grams, 0) AS n_grams,
         |  coalesce(a.dup_grams, 0) AS dup_grams,
         |  CASE WHEN coalesce(a.n_grams, 0) = 0 THEN 0
         |    ELSE (a.dup_grams * 1000) // a.n_grams END AS dup_milli
         |FROM documents d LEFT JOIN agg a USING (doc_id)
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      TextAnalysis.duplicateNgramStats(t(s, d, "documents"),
          "doc_id", "text", n = 2)
        .orderBy("doc_id")
    },

    // CURATION: sqrt-temperature (T=2) language rebalancing — keep
    // budgets ∝ isqrt(n_lang), so the head language's share shrinks
    // and tail languages keep proportionally more (the standard
    // multilingual mixture smoothing). Exact-integer throughout:
    // isqrt = floor(sqrt(n)) is exact below 2^52, shares are integer
    // division. Output is the kept (lang, doc_id) set itself.
    Q("q_cur_rebalance",
      """WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
        |i AS (SELECT lang, CAST(floor(sqrt(n)) AS BIGINT) AS isq FROM c),
        |s AS (SELECT sum(isq) AS tot FROM i),
        |b AS (SELECT lang, (250 * isq) // tot AS budget FROM i, s),
        |r AS (SELECT doc_id, lang, row_number() OVER (PARTITION BY lang
        |    ORDER BY doc_id) AS rn FROM documents)
        |SELECT r.lang, r.doc_id FROM r JOIN b USING (lang)
        |WHERE rn <= budget ORDER BY lang, doc_id""".stripMargin) { (s, d) =>
      graft.operators.Curation.rebalanceKeep(
          t(s, d, "documents"), "lang", "doc_id", 250L)
        .select("lang", "doc_id").orderBy("lang", "doc_id")
    },

    // CURATION (CUR4): cumulative-mass budget — per language, keep
    // the LONGEST documents until they hold 60% of the language's
    // total character mass (row-count budgets treat a 100-token and
    // a 100k-token doc as equal spend; mass budgets curate against
    // what actually costs tokens). The crossing row is kept; integer
    // cross-multiplication, ties to the smaller doc_id.
    Q("q_cur_mass_budget",
      """WITH r AS (SELECT doc_id, lang, n_chars,
        |    sum(n_chars) OVER (PARTITION BY lang
        |      ORDER BY n_chars DESC, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(n_chars) OVER (PARTITION BY lang) AS tot
        |  FROM documents)
        |SELECT lang, doc_id, CAST(n_chars AS BIGINT) AS n_chars
        |FROM r WHERE (cum - n_chars) * 1000 < 600 * tot
        |ORDER BY lang, doc_id""".stripMargin) { (s, d) =>
      graft.operators.Curation.keepByMassBudget(
          t(s, d, "documents"), "lang", "n_chars", "doc_id", 600)
        .select(col("lang"), col("doc_id"), col("n_chars"))
        .orderBy("lang", "doc_id")
    },

    // CURATION: max-volume exact mixture — realize a TARGET language
    // distribution (en 50% / zh 20% / de 20% / fr 10%; es unlisted →
    // dropped) at the largest total the corpus can supply. The
    // binding group is whichever runs out first
    // (T = min_g n_g·1000 div w_g); budgets are (T·w_g) div 1000 so
    // the realized mix matches the target to one floor rounding per
    // group. All exact integer.
    Q("q_cur_mix",
      """WITH w AS (SELECT * FROM (VALUES ('en', 500), ('zh', 200),
        |    ('de', 200), ('fr', 100)) AS w(lang, tw)),
        |c AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
        |j AS (SELECT w.lang, w.tw, coalesce(c.n, 0) AS n
        |      FROM w LEFT JOIN c USING (lang)),
        |t AS (SELECT min((n * 1000) // tw) AS t_tot FROM j),
        |b AS (SELECT lang, (t_tot * tw) // 1000 AS budget FROM j, t),
        |r AS (SELECT doc_id, lang, row_number() OVER (PARTITION BY lang
        |    ORDER BY doc_id) AS rn FROM documents)
        |SELECT r.lang, r.doc_id FROM r JOIN b USING (lang)
        |WHERE rn <= budget ORDER BY lang, doc_id""".stripMargin) { (s, d) =>
      val weights = s.createDataFrame(
        java.util.Arrays.asList(
          org.apache.spark.sql.Row("en", 500L),
          org.apache.spark.sql.Row("zh", 200L),
          org.apache.spark.sql.Row("de", 200L),
          org.apache.spark.sql.Row("fr", 100L)),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("lang",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("target_milli",
            org.apache.spark.sql.types.LongType))))
      graft.operators.Curation.mixKeep(
          t(s, d, "documents"), "lang", "doc_id", weights)
        .select("lang", "doc_id").orderBy("lang", "doc_id")
    },

    // CURATION (CUR5): UniMax budget allocation (Chung 2023) — split
    // a 20k-token budget across languages as uniformly as the
    // 1.5-epoch repeat cap allows. Exact integer waterfilling: sorted
    // by (cap, lang), a group binds iff cap·(groups left) fits the
    // budget left; uncapped groups split the remainder evenly with
    // the leading ones taking the odd tokens. On this corpus the four
    // non-English caps bind and English absorbs the leftover — the
    // head-vs-tail shape the algorithm exists for.
    Q("q_cur_unimax",
      s"""WITH c AS (SELECT lang, CAST(sum(len($toksD)) AS BIGINT) AS n
         |  FROM documents GROUP BY 1),
         |cc AS (SELECT lang, n, (n * 1500) // 1000 AS cap FROM c),
         |t AS (SELECT CAST(count(*) AS BIGINT) AS m FROM cc),
         |r AS (SELECT lang, n, cap, m,
         |    CAST(row_number() OVER (ORDER BY cap, lang) AS BIGINT)
         |      AS i,
         |    CAST(sum(cap) OVER (ORDER BY cap, lang
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pincl
         |  FROM cc, t),
         |b AS (SELECT *, cap * (m - i + 1) <= 30000 - (pincl - cap)
         |    AS binds FROM r),
         |k AS (SELECT coalesce(max(CASE WHEN binds THEN i END), 0)
         |      AS kk,
         |    coalesce(max(CASE WHEN binds THEN pincl END), 0)
         |      AS capsum FROM b),
         |a AS (SELECT lang, n, cap, CASE WHEN binds THEN cap
         |    ELSE (30000 - capsum) // (m - kk) + (CASE WHEN i - kk <=
         |      (30000 - capsum) % (m - kk) THEN 1 ELSE 0 END) END
         |    AS alloc
         |  FROM b, k)
         |SELECT lang, n AS n_tokens, cap AS cap_tokens,
         |  alloc AS alloc_tokens,
         |  CASE WHEN n > 0 THEN (alloc * 1000) // n ELSE 0 END
         |    AS epochs_milli
         |FROM a ORDER BY lang""".stripMargin) { (s, d) =>
      val docs = t(s, d, "documents")
        .select(col("lang"),
          size(tokens(col("text"))).cast("long").as("n_toks"))
      graft.operators.Curation.unimaxBudgets(docs, "lang", "n_toks",
          30000L, 1500L)
        .orderBy("lang")
    },

    // CURATION (CUR6): temperature-scaled sampling budgets (mT5
    // p ∝ n^(1/T), T = 3.333 ≈ the α = 0.3 literature dial) — the
    // policy UniMax replaces, shipped so one corpus can A/B both.
    // Weights are computed relative to the LARGEST group (micro ints
    // in [1, 1e6]: nothing can overflow at any corpus size) and the
    // budget is Hamilton-apportioned: Σ = 25000 exactly, graded.
    Q("q_cur_temperature",
      s"""WITH tok AS (SELECT lang, CAST(len($toksD) AS BIGINT) AS n
         |  FROM documents),
         |c AS (SELECT lang, CAST(sum(n) AS BIGINT) AS n_tokens
         |  FROM tok GROUP BY 1 HAVING sum(n) > 0),
         |mx AS (SELECT CAST(max(n_tokens) AS BIGINT) AS nmax FROM c),
         |w AS (SELECT lang, n_tokens,
         |    greatest(CAST(1 AS BIGINT), CAST(floor(exp(
         |      (ln(CAST(n_tokens AS DOUBLE)) - ln(CAST(nmax AS DOUBLE)))
         |        * (1000.0 / 3333)) * 1000000.0) AS BIGINT)) AS w_micro
         |  FROM c, mx),
         |tw AS (SELECT CAST(sum(w_micro) AS BIGINT) AS tw FROM w),
         |r AS (SELECT lang, n_tokens, w_micro,
         |    (w_micro * 25000) // tw AS fl,
         |    (w_micro * 25000) % tw AS rem,
         |    CAST(row_number() OVER (ORDER BY (w_micro * 25000) % tw
         |      DESC, lang) AS BIGINT) AS rk
         |  FROM w, tw),
         |lo AS (SELECT 25000 - CAST(sum(fl) AS BIGINT) AS leftover
         |  FROM r)
         |SELECT lang, n_tokens, w_micro,
         |  fl + (CASE WHEN rk <= leftover THEN 1 ELSE 0 END)
         |    AS budget_tokens
         |FROM r, lo ORDER BY lang""".stripMargin) { (s, d) =>
      val docs = t(s, d, "documents")
        .select(col("lang"),
          size(tokens(col("text"))).cast("long").as("n_toks"))
      graft.operators.Curation.temperatureBudgets(docs, "lang",
          "n_toks", 25000L, 3333L)
        .orderBy("lang")
    },

    // SAMPLING: deterministic md5-derived 10% sample — the same 10%
    // on every engine and every run (reproducible corpus subsets).
    Q("q_samp_hash",
      s"""SELECT doc_id FROM documents
         |WHERE ${sqlHash31("'samp:' || CAST(doc_id AS VARCHAR)")} % 100 < 10
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      t(s, d, "documents")
        .filter(hashBucket(col("doc_id"), 100) < 10)
        .select("doc_id").orderBy("doc_id")
    },

    // QUALITY SIGNALS: token-distribution entropy (low = few tokens
    // repeated) + bigram repetition mass (Gopher-style rule). The
    // entropy fold runs in token order and quantizes the sum to
    // millis; repetition is exact integer arithmetic.
    Q("q_t_quality_signals",
      s"""WITH tok AS (SELECT doc_id, unnest(${sqlTokens("text")}) AS term
         |  FROM documents),
         |tc AS (SELECT doc_id, term, count(*) AS c FROM tok
         |  GROUP BY 1, 2),
         |ag AS (SELECT doc_id, list(c ORDER BY term) AS cs,
         |    sum(c) AS n FROM tc GROUP BY 1),
         |e AS (SELECT doc_id, CAST(FLOOR(list_reduce(
         |    list_prepend(CAST(0.0 AS DOUBLE),
         |      [(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
         |        * ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
         |        for c in cs]),
         |    (a, x) -> a - x) * 1000.0) AS BIGINT) AS entropy_milli
         |  FROM ag),
         |tkn AS (SELECT doc_id, ${sqlTokens("text")} AS t FROM documents),
         |bg AS (SELECT doc_id, unnest(CASE WHEN len(t) >= 2
         |    THEN list_transform(range(0, len(t) - 1),
         |      i -> array_to_string(t[i+1:i+2], ' '))
         |    ELSE [] END) AS bg FROM tkn),
         |bc AS (SELECT doc_id, bg, count(*) AS c FROM bg GROUP BY 1, 2),
         |br AS (SELECT doc_id, max(c) * 1000 // sum(c) AS rep_milli
         |  FROM bc GROUP BY 1)
         |SELECT d.doc_id,
         |  CAST(coalesce(e.entropy_milli, 0) AS BIGINT) AS entropy_milli,
         |  CAST(coalesce(br.rep_milli, 0) AS BIGINT) AS rep_milli
         |FROM (SELECT DISTINCT doc_id FROM documents) d
         |LEFT JOIN e ON e.doc_id = d.doc_id
         |LEFT JOIN br ON br.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
      TextAnalysis.qualitySignals(t(s, d, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    },

    // SAMPLING: weighted priority sample — top-100 docs by
    // priority = w * 65536 div u (u md5-uniform in [1, 65536], w =
    // n_chars), the rand()-free weight-biased sample (Duffield
    // priority sampling). Integer-exact on both engines; see
    // functions.weightedPriority for the floor==div proof.
    Q("q_samp_weighted",
      s"""SELECT doc_id, n_chars,
         |  CAST((n_chars * 65536)
         |    // (${sqlHash31("'wsamp:' || CAST(doc_id AS VARCHAR)")} % 65536 + 1)
         |    AS BIGINT) AS priority
         |FROM documents
         |ORDER BY priority DESC, doc_id LIMIT 100""".stripMargin) { (s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), col("n_chars"),
          graft.functions.weightedPriority(col("doc_id"),
            col("n_chars")).as("priority"))
        .orderBy(col("priority").desc, col("doc_id")).limit(100)
    },

    // GOVERNANCE (CUR7): corpus concentration — HHI in micro over
    // the source dimension plus head-group share; the number that
    // catches drift toward a single crawl source. Exact per-group
    // integer floors, order-free sum.
    Q("q_cur_concentration",
      """WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS n_g
        |  FROM documents GROUP BY 1),
        |t AS (SELECT CAST(sum(n_g) AS BIGINT) AS n_docs,
        |    CAST(count(*) AS BIGINT) AS n_groups,
        |    CAST(max(n_g) AS BIGINT) AS mx FROM c)
        |SELECT n_groups, n_docs,
        |  (mx * 1000) // n_docs AS top_share_milli,
        |  CAST(sum(((n_g * 1000000 // n_docs) * n_g) // n_docs)
        |    AS BIGINT) AS hhi_micro
        |FROM c, t GROUP BY 1, 2, 3""".stripMargin) { (s, d) =>
      graft.operators.Curation.concentrationReport(
        t(s, d, "documents"), "source")
    },

    // INEQUALITY: Gini coefficient of per-source character mass —
    // the skew diagnostic next to q_cur_concentration's HHI, exact
    // rank formulation (2·Σ i·x₍ᵢ₎ − (n+1)·Σx) / (n·Σx) in
    // DECIMAL(38,0), truncated milli. Group-level input (20
    // sources), so the global rank is 20 rows, never the corpus.
    Q("q_cur_gini",
      """WITH g AS (SELECT source, CAST(sum(n_chars) AS BIGINT)
        |    AS mass FROM documents GROUP BY 1),
        |r AS (SELECT mass, row_number() OVER (ORDER BY mass) AS i
        |  FROM g),
        |a AS (SELECT count(*) AS n, sum(mass) AS t,
        |    sum(i * mass) AS s FROM r)
        |SELECT CAST(n AS BIGINT) AS n, CAST(t AS BIGINT) AS total,
        |  CAST((2 * s - (n + 1) * t) * 1000 // (n * t) AS BIGINT)
        |    AS gini_milli
        |FROM a""".stripMargin) { (s, d) =>
      graft.operators.Curation.giniIndex(
        t(s, d, "documents").groupBy("source")
          .agg(sum("n_chars").as("mass")), "mass")
    },

    // CALIBRATION: quantile normalization across sources (Bolstad
    // 2003's batch-effect correction on corpus scores) — every
    // source's length distribution is mapped onto the pooled one by
    // within-group rank → pooled ordinal ⌈r·N/n_g⌉, an
    // order-statistic pick that makes one global threshold mean the
    // same thing in every source. All integer arithmetic.
    Q("q_cur_qnorm",
      """WITH b AS (SELECT doc_id AS id, source AS grp,
        |    CAST(n_chars AS BIGINT) AS v FROM documents),
        |p AS (SELECT v AS norm, row_number() OVER (ORDER BY v) AS q
        |  FROM b),
        |t AS (SELECT count(*) AS n FROM b),
        |s AS (SELECT *, row_number() OVER (PARTITION BY grp
        |      ORDER BY v, id) AS r,
        |    count(*) OVER (PARTITION BY grp) AS ng FROM b),
        |m AS (SELECT id, grp, v,
        |    (r * (SELECT n FROM t) + ng - 1) // ng AS q FROM s)
        |SELECT m.id AS doc_id, m.grp AS source, m.v,
        |  p.norm
        |FROM m JOIN p ON p.q = m.q
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      graft.operators.Curation.quantileNormalize(
          t(s, d, "documents"), "source", "doc_id", "n_chars")
        .select(col("id").as("doc_id"), col("grp").as("source"),
          col("v"), col("norm"))
        .orderBy("doc_id")
    },

    // SAMPLING DESIGN: Neyman allocation — budget ∝ N_h·S_h, the
    // minimum-variance stratified design (variance-heavy event
    // types get more than their head count, vs q_samp_stratified's
    // proportional shares). Variance numerators exact in int128,
    // ONE IEEE-exact long→double cast into the sqrt per stratum,
    // largest-remainder integer apportionment.
    Q("q_samp_neyman",
      """WITH s AS (SELECT event_type,
        |    count(*) AS n,
        |    sum(CAST(floor(value * 1000) AS BIGINT)) AS sx,
        |    sum(CAST(floor(value * 1000) AS BIGINT)
        |      * CAST(floor(value * 1000) AS BIGINT)) AS qx
        |  FROM events WHERE value IS NOT NULL GROUP BY 1),
        |w AS (SELECT event_type, n,
        |    CASE WHEN n < 2 THEN 0
        |      ELSE CAST(floor(sqrt(CAST(n AS DOUBLE)
        |        * CAST(n * qx - sx * sx AS DOUBLE)
        |        / (CAST(n AS DOUBLE) - 1.0)) * 1000.0) AS BIGINT)
        |      END AS wm
        |  FROM s),
        |t AS (SELECT sum(wm) AS tw FROM w),
        |a AS (SELECT event_type, n, wm,
        |    CASE WHEN tw > 0 THEN 1000 * wm // tw ELSE 0 END AS fl,
        |    CASE WHEN tw > 0 THEN 1000 * wm % tw ELSE 0 END AS rem
        |  FROM w, t),
        |l AS (SELECT 1000 - sum(fl) AS leftover FROM a),
        |r AS (SELECT *, row_number() OVER (ORDER BY rem DESC,
        |    event_type) AS rk FROM a)
        |SELECT event_type, CAST(n AS BIGINT) AS n_docs,
        |  CAST(wm AS BIGINT) AS weight_milli,
        |  CAST(fl + CASE WHEN rk <= (SELECT leftover FROM l)
        |    THEN 1 ELSE 0 END AS BIGINT) AS allocated
        |FROM r ORDER BY event_type""".stripMargin) { (s, d) =>
      graft.operators.Curation.neymanAllocate(
          events(s, d).filter(col("value").isNotNull)
            .select(col("event_type"),
              floor(col("value") * 1000L).cast("long").as("vm")),
          "event_type", "vm", 1000L)
        .orderBy("event_type")
    },

    // E2E: the Neyman design REALIZED — allocation table broadcast
    // onto the stream, per-stratum deterministic hash-rank pick
    // takes exactly `allocated` rows from each event type: the
    // minimum-variance sample as one composed plan (design +
    // q_samp_stratified's pick discipline).
    Q("q_e2e_neyman_sample",
      s"""WITH s AS (SELECT event_type,
         |    count(*) AS n,
         |    sum(CAST(floor(value * 1000) AS BIGINT)) AS sx,
         |    sum(CAST(floor(value * 1000) AS BIGINT)
         |      * CAST(floor(value * 1000) AS BIGINT)) AS qx
         |  FROM events WHERE value IS NOT NULL GROUP BY 1),
         |w AS (SELECT event_type, n,
         |    CASE WHEN n < 2 THEN 0
         |      ELSE CAST(floor(sqrt(CAST(n AS DOUBLE)
         |        * CAST(n * qx - sx * sx AS DOUBLE)
         |        / (CAST(n AS DOUBLE) - 1.0)) * 1000.0) AS BIGINT)
         |      END AS wm
         |  FROM s),
         |t AS (SELECT sum(wm) AS tw FROM w),
         |a AS (SELECT event_type, wm,
         |    CASE WHEN tw > 0 THEN 1000 * wm // tw ELSE 0 END AS fl,
         |    CASE WHEN tw > 0 THEN 1000 * wm % tw ELSE 0 END AS rem
         |  FROM w, t),
         |l AS (SELECT 1000 - sum(fl) AS leftover FROM a),
         |r AS (SELECT *, row_number() OVER (ORDER BY rem DESC,
         |    event_type) AS rk FROM a),
         |alloc AS (SELECT event_type,
         |    fl + CASE WHEN rk <= (SELECT leftover FROM l)
         |      THEN 1 ELSE 0 END AS allocated FROM r),
         |picked AS (SELECT event_type, event_id,
         |    row_number() OVER (PARTITION BY event_type ORDER BY
         |      ${sqlHash31("'ney:' || CAST(event_id AS VARCHAR)")},
         |      event_id) AS rn
         |  FROM events WHERE value IS NOT NULL)
         |SELECT p.event_type, p.event_id FROM picked p
         |JOIN alloc ON alloc.event_type = p.event_type
         |WHERE p.rn <= alloc.allocated
         |ORDER BY p.event_type, p.event_id""".stripMargin) { (s, d) =>
      val ev = events(s, d).filter(col("value").isNotNull)
        .select(col("event_type"), col("event_id"),
          floor(col("value") * 1000L).cast("long").as("vm"))
      val design = graft.operators.Curation
        .neymanAllocate(ev, "event_type", "vm", 1000L)
        .select(col("event_type"), col("allocated"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type"))
        .orderBy(hash31(concat(lit("ney:"),
          col("event_id").cast("string"))), col("event_id"))
      ev.withColumn("rn", row_number().over(w))
        .join(broadcast(design), Seq("event_type"))
        .filter(col("rn") <= col("allocated"))
        .select(col("event_type"), col("event_id"))
        .orderBy("event_type", "event_id")
    },

    // SAMPLING (C14): correlated (join-preserving) sampling — the
    // AQUA join-synopsis law (Acharya 1999) graded CROSS-ENGINE:
    // Spark samples orders and customer INDEPENDENTLY on the same
    // salted custkey hash and joins the samples; the oracle filters
    // the FULL join once on that hash. Equal hashes ⇒ equal tables
    // is exactly sample(L) ⋈ sample(R) ≡ σ_hash(L ⋈ R).
    Q("q_samp_correlated",
      s"""SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
         |  CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_cust,
         |  CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT)
         |    AS sum_price
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |WHERE (${sqlHash31("'csamp:' || CAST(o_custkey AS VARCHAR)")}
         |  % 100) < 12
         |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val o = graft.operators.Curation.correlatedSample(
        t(s, d, "orders"), "o_custkey", 100, 12)
      val c = graft.operators.Curation.correlatedSample(
        t(s, d, "customer"), "c_custkey", 100, 12)
      o.join(c, col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          countDistinct(col("c_custkey")).as("n_cust"),
          sum(floor(col("o_totalprice")).cast("long")).as("sum_price"))
        .orderBy("c_mktsegment")
    },

    // SAMPLING (C12): Efraimidis-Spirakis weighted reservoir — the
    // EXACT-size without-replacement complement of q_samp_systematic
    // (expected-size) and q_samp_weighted (priority heuristic): top-k
    // by ln(u)/w with a salted-hash u, micro-floored ln (the knNll
    // cross-engine ln discipline), deterministic on any engine.
    Q("q_samp_reservoir",
      s"""WITH p AS (SELECT doc_id, n_chars AS weight,
         |    CAST(floor(ln(
         |      (${sqlHash60("'res:r10:' || CAST(doc_id AS VARCHAR)")}
         |        + 1) / 1152921504606846976.0) * 1000000) AS BIGINT)
         |      AS lnu_micro
         |  FROM documents)
         |SELECT doc_id, weight, lnu_micro,
         |  CAST(lnu_micro AS DOUBLE) / CAST(weight AS DOUBLE)
         |    AS priority
         |FROM p ORDER BY priority DESC, doc_id
         |LIMIT 50""".stripMargin) { (s, d) =>
      graft.operators.Curation.weightedReservoirSample(
          t(s, d, "documents"), "doc_id", "n_chars", 50, "r10")
        .orderBy(col("priority").desc, col("doc_id"))
    },

    // TEXT hygiene: PII redaction (emails, URLs, long digit runs) over
    // text with synthesized PII — both engines construct and scrub the
    // same strings, so the redacted output is hash-comparable.
    Q("q_t_redact",
      """SELECT doc_id,
        |  regexp_replace(
        |    regexp_replace(
        |      regexp_replace(
        |        text || ' contact user' || CAST(doc_id AS VARCHAR)
        |          || '@mail.example.com or https://ex.ample.com/u/'
        |          || CAST(doc_id AS VARCHAR) || ' id '
        |          || CAST(doc_id * 1234567 AS VARCHAR),
        |        '[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}',
        |        '[EMAIL]', 'g'),
        |      'https?://[^\s]+', '[URL]', 'g'),
        |    '[0-9]{7,}', '[NUM]', 'g') AS redacted
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      val withPii = concat(col("text"),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@mail.example.com or https://ex.ample.com/u/"),
        col("doc_id").cast("string"), lit(" id "),
        (col("doc_id") * 1234567).cast("string"))
      t(s, d, "documents")
        .select(col("doc_id"), redactPii(withPii).as("redacted"))
        .orderBy("doc_id")
    },

    // SHARDING: pack documents into ~1000-token shards within
    // deterministic hash buckets (window per bucket — never a global
    // total-order running sum).
    Q("q_pack_shards",
      s"""WITH tok AS (SELECT doc_id, CAST(len($toksD) AS BIGINT)
         |    AS n_toks FROM documents),
         |b AS (SELECT *,
         |    ${sqlHash31("'shard:' || CAST(doc_id AS VARCHAR)")} % 8
         |    AS bucket FROM tok),
         |c AS (SELECT *, SUM(n_toks) OVER (PARTITION BY bucket
         |    ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum FROM b)
         |SELECT doc_id, bucket,
         |  CAST(FLOOR((cum - n_toks) / 1000.0) AS BIGINT) AS shard,
         |  n_toks
         |FROM c ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = t(s, d, "documents")
        .select(col("doc_id"),
          size(tokens(col("text"))).cast("long").as("n_toks"))
      graft.operators.Sharding
        .packByTokenBudget(docs, "doc_id", "n_toks", 1000L, 8)
        .select("doc_id", "bucket", "shard", "n_toks")
        .orderBy("doc_id")
    },

    // TEXT: dictionary / taxonomy phrase tagging — every lexicon
    // phrase (1..3 normalized tokens) each doc contains, with hit
    // counts. Token-boundary matching, never substrings; the messy
    // ' Fast  Scan! ' lexicon entry grades the normalization path,
    // 'unobtainium' grades absence (no row).
    Q("q_t_tag_lexicon",
      s"""WITH lex0(phrase, tag) AS (VALUES
         |    (' Fast  Scan! ', 'perf'), ('spark', 'engine'),
         |    ('table table', 'dup'), ('query big query', 'shape3'),
         |    ('unobtainium', 'none')),
         |lex AS (SELECT ${sqlNormText("phrase")} AS p, tag FROM lex0
         |        WHERE ${sqlNormText("phrase")} <> ''),
         |tok AS (SELECT doc_id, $toksD AS t FROM documents),
         |g AS (SELECT doc_id, unnest(${sqlShingles("t", 1)}) AS g
         |      FROM tok
         |  UNION ALL SELECT doc_id, unnest(${sqlShingles("t", 2)})
         |  FROM tok
         |  UNION ALL SELECT doc_id, unnest(${sqlShingles("t", 3)})
         |  FROM tok)
         |SELECT doc_id, tag, p AS phrase, count(*) AS n_hits
         |FROM g JOIN lex ON g.g = lex.p GROUP BY 1, 2, 3
         |ORDER BY doc_id, tag, phrase""".stripMargin) { (s, d) =>
      import s.implicits._
      val lex = Seq(
        (" Fast  Scan! ", "perf"), ("spark", "engine"),
        ("table table", "dup"), ("query big query", "shape3"),
        ("unobtainium", "none")).toDF("phrase", "tag")
      TextAnalysis.tagByLexicon(t(s, d, "documents"), "doc_id",
          "text", lex, maxPhraseTokens = 3)
        .orderBy("doc_id", "tag", "phrase")
    },

    // TEXT: distinct-n diversity per source (Li 2016 / Zhu 2018) —
    // distinct n-grams over total occurrences for n = 1, 2, 3. The
    // template/synthetic-slice monitor: a collapsed slice shows its
    // diversity cliff here before any per-doc repetition signal fires.
    Q("q_t_distinct_n",
      s"""WITH tok AS (SELECT source, $toksD AS t FROM documents),
         |allg AS (
         |  SELECT source, CAST(1 AS BIGINT) AS n,
         |    unnest(${sqlShingles("t", 1)}) AS g FROM tok
         |  UNION ALL SELECT source, 2, unnest(${sqlShingles("t", 2)})
         |  FROM tok
         |  UNION ALL SELECT source, 3, unnest(${sqlShingles("t", 3)})
         |  FROM tok),
         |pc AS (SELECT source, n, g, count(*) AS c
         |       FROM allg GROUP BY 1, 2, 3)
         |SELECT source, n, CAST(sum(c) AS BIGINT) AS total_ngrams,
         |  CAST(count(*) AS BIGINT) AS distinct_ngrams,
         |  (CAST(count(*) AS BIGINT) * 1000) // CAST(sum(c) AS BIGINT)
         |    AS diversity_milli
         |FROM pc GROUP BY 1, 2 ORDER BY source, n""".stripMargin) {
        (s, d) =>
      TextAnalysis.ngramDiversity(
          t(s, d, "documents"), "source", "text", Seq(1, 2, 3))
        .orderBy("source", "n")
    },

    // SAMPLING: systematic weighted resampling — documents laid
    // end-to-end on the weight line per hash bucket; kept iff the
    // span crosses a stride multiple (inclusion = w/stride exactly,
    // zero randomness; heavy docs kept with n_copies > 1). The
    // selection step downstream of DSIR importance weights.
    Q("q_samp_systematic",
      s"""WITH d AS (SELECT doc_id, n_chars,
         |    ${sqlHash31("'sysres:' || CAST(doc_id AS VARCHAR)")} % 8
         |    AS bucket FROM documents),
         |c AS (SELECT *, SUM(n_chars) OVER (PARTITION BY bucket
         |    ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum FROM d)
         |SELECT doc_id, bucket, n_chars,
         |  CAST(cum // 2000 - (cum - n_chars) // 2000 AS BIGINT)
         |    AS n_copies
         |FROM c WHERE cum // 2000 > (cum - n_chars) // 2000
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      graft.operators.Curation.systematicResample(
          t(s, d, "documents").select(col("doc_id"), col("n_chars")),
          "doc_id", "n_chars", stride = 2000L, buckets = 8)
        .select("doc_id", "bucket", "n_chars", "n_copies")
        .orderBy("doc_id")
    },

    // SAMPLING: exact-size stratified sample — largest-remainder
    // (Hamilton) apportionment of a 103-row budget across sources,
    // then deterministic salted-hash pick per group. The allocation
    // law (sums to exactly 103, every group floor or floor+1, extras
    // to the largest remainders tie-broken by name) and the actual
    // selection (id_sum) are both graded.
    Q("q_samp_exact_n",
      s"""WITH d AS (SELECT doc_id, source FROM documents),
         |g AS (SELECT source, count(*) AS n_docs FROM d GROUP BY 1),
         |t AS (SELECT sum(n_docs) AS total FROM g),
         |qt AS (SELECT source, n_docs,
         |    (n_docs * 103) // total AS fl,
         |    (n_docs * 103) % total AS rem FROM g, t),
         |lo AS (SELECT 103 - sum(fl) AS leftover FROM qt),
         |rk AS (SELECT *, row_number() OVER (ORDER BY rem DESC,
         |    source) AS r FROM qt),
         |al AS (SELECT source, n_docs, fl + CASE WHEN r <=
         |    (SELECT leftover FROM lo) THEN 1 ELSE 0 END AS allocated
         |  FROM rk),
         |o AS (SELECT d.source, d.doc_id, row_number() OVER (
         |    PARTITION BY d.source ORDER BY
         |    ${sqlHash60("'strat:' || CAST(doc_id AS VARCHAR)")},
         |    doc_id) AS rn FROM d),
         |smp AS (SELECT o.source AS src, o.doc_id FROM o
         |       JOIN al ON o.source = al.source
         |       WHERE o.rn <= al.allocated)
         |SELECT al.source, CAST(al.n_docs AS BIGINT) AS n_docs,
         |  CAST(al.allocated AS BIGINT) AS allocated,
         |  CAST(sum(smp.doc_id) AS BIGINT) AS id_sum
         |FROM al JOIN smp ON al.source = smp.src
         |GROUP BY 1, 2, 3 ORDER BY al.source""".stripMargin) {
        (s, d) =>
      graft.operators.Curation.stratifiedAllocate(
          t(s, d, "documents").select(col("doc_id"), col("source")),
          "source", "doc_id", 103L)
        .groupBy("source")
        .agg(max(col("n_docs")).as("n_docs"),
          max(col("allocated")).as("allocated"),
          sum(col("doc_id")).as("id_sum"))
        .orderBy("source")
    },

    // SHARDING: rendezvous (HRW) shard assignment, graded over a
    // RESHARD — the same corpus under 4 shards and under 5. The
    // group-count matrix exhibits the minimal-movement law the
    // operator exists for: every off-diagonal cell has shard5 = 's4'
    // (keys only ever move TO the added shard, ~1/5 of them), where
    // hash-mod-N resharding would relocate 4/5 of every shard.
    Q("q_c_rendezvous",
      s"""WITH a AS (SELECT doc_id,
         |    list_reduce(list_transform(['s0','s1','s2','s3'],
         |      s -> {'h': ${sqlHash60("s || ':' || CAST(doc_id AS VARCHAR)")}, 's': s}),
         |     (x,y) -> CASE WHEN y.h > x.h OR (y.h = x.h AND y.s > x.s)
         |              THEN y ELSE x END).s AS shard4,
         |    list_reduce(list_transform(['s0','s1','s2','s3','s4'],
         |      s -> {'h': ${sqlHash60("s || ':' || CAST(doc_id AS VARCHAR)")}, 's': s}),
         |     (x,y) -> CASE WHEN y.h > x.h OR (y.h = x.h AND y.s > x.s)
         |              THEN y ELSE x END).s AS shard5
         |  FROM documents)
         |SELECT shard4, shard5, count(*) AS n
         |FROM a GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      val four = Seq("s0", "s1", "s2", "s3")
      val withA = graft.operators.Sharding.rendezvousShard(
        t(s, d, "documents").select(col("doc_id")),
        "doc_id", four, "shard4")
      graft.operators.Sharding
        .rendezvousShard(withA, "doc_id", four :+ "s4", "shard5")
        .groupBy("shard4", "shard5")
        .agg(count(lit(1)).as("n"))
        .orderBy("shard4", "shard5")
    },

    // SHARDING: INCREMENTAL window packing — pack the doc_id >= 250
    // refresh batch on top of the already-packed corpus prefix: each
    // bucket resumes at its token height, topping up its partial last
    // window first. Graded by the refresh LAW itself: for append-only
    // ids the incremental output equals the full repack restricted to
    // the new documents — which is exactly what the oracle computes.
    Q("q_pack_incremental",
      s"""WITH tok AS (SELECT doc_id, CAST(len($toksD) AS BIGINT)
         |    AS n FROM documents),
         |nz AS (SELECT * FROM tok WHERE n > 0),
         |b AS (SELECT *,
         |    ${sqlHash31("'pack:' || CAST(doc_id AS VARCHAR)")} % 8
         |    AS bucket FROM nz),
         |c AS (SELECT *, CAST(SUM(n) OVER (PARTITION BY bucket
         |    ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
         |    AS e FROM b),
         |s AS (SELECT doc_id, bucket, e - n AS st, e FROM c),
         |x AS (SELECT doc_id, bucket, st, e,
         |    unnest(range(st // 256, (e - 1) // 256 + 1)) AS w FROM s)
         |SELECT doc_id, bucket, CAST(w AS BIGINT) AS window_id,
         |  CAST(greatest(st, w * 256) - w * 256 AS BIGINT) AS win_off,
         |  CAST(greatest(0, w * 256 - st) AS BIGINT) AS doc_off,
         |  CAST(least(e, (w + 1) * 256) - greatest(st, w * 256)
         |    AS BIGINT) AS n_tokens
         |FROM x WHERE doc_id >= 250
         |ORDER BY doc_id, window_id""".stripMargin) { (s, d) =>
      val docs = t(s, d, "documents")
        .select(col("doc_id"),
          size(tokens(col("text"))).cast("long").as("n_toks"))
      val base = graft.operators.Sharding.packContiguousWindows(
        docs.filter(col("doc_id") < 250), "doc_id", "n_toks", 256L, 8)
      graft.operators.Sharding.packContiguousWindowsFrom(
          docs.filter(col("doc_id") >= 250), "doc_id", "n_toks",
          256L, 8, graft.operators.Sharding.packState(base))
        .orderBy("doc_id", "window_id")
    },

    // SHARDING: contiguous training-window packing (concat-and-chunk)
    // — documents laid end-to-end within hash buckets, the combined
    // stream cut into exact 256-token windows; one row per (document,
    // window) SPAN with both offsets, so a writer can materialize
    // input_ids from the spans alone. The oracle replays the same
    // prefix-sum + floor-division span arithmetic relationally.
    Q("q_pack_windows",
      s"""WITH tok AS (SELECT doc_id, CAST(len($toksD) AS BIGINT)
         |    AS n FROM documents),
         |nz AS (SELECT * FROM tok WHERE n > 0),
         |b AS (SELECT *,
         |    ${sqlHash31("'pack:' || CAST(doc_id AS VARCHAR)")} % 8
         |    AS bucket FROM nz),
         |c AS (SELECT *, CAST(SUM(n) OVER (PARTITION BY bucket
         |    ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
         |    AS e FROM b),
         |s AS (SELECT doc_id, bucket, e - n AS st, e FROM c),
         |x AS (SELECT doc_id, bucket, st, e,
         |    unnest(range(st // 256, (e - 1) // 256 + 1)) AS w FROM s)
         |SELECT doc_id, bucket, CAST(w AS BIGINT) AS window_id,
         |  CAST(greatest(st, w * 256) - w * 256 AS BIGINT) AS win_off,
         |  CAST(greatest(0, w * 256 - st) AS BIGINT) AS doc_off,
         |  CAST(least(e, (w + 1) * 256) - greatest(st, w * 256)
         |    AS BIGINT) AS n_tokens
         |FROM x ORDER BY doc_id, window_id""".stripMargin) { (s, d) =>
      val docs = t(s, d, "documents")
        .select(col("doc_id"),
          size(tokens(col("text"))).cast("long").as("n_toks"))
      graft.operators.Sharding
        .packContiguousWindows(docs, "doc_id", "n_toks", 256L, 8)
        .orderBy("doc_id", "window_id")
    },

    // EPOCH SHUFFLE (C15): the dataloader permutation — every row
    // gets an exact global position in salted-md5-hash order,
    // bit-reproducible on any engine with no rand(). Spark derives
    // positions via range-bucketed prefix-sum offsets (no global
    // window); the oracle is the literal one-partition row_number,
    // so the bucketed decomposition itself is what's graded.
    Q("q_pack_epoch_shuffle",
      s"""WITH h AS (SELECT doc_id,
         |    ${sqlHash31("'ep1:' || CAST(doc_id AS VARCHAR)")} AS h
         |  FROM documents)
         |SELECT doc_id, CAST(row_number()
         |    OVER (ORDER BY h, doc_id) - 1 AS BIGINT) AS pos
         |FROM h ORDER BY pos""".stripMargin) { (s, d) =>
      graft.operators.Sharding.epochShuffle(
          t(s, d, "documents").select("doc_id"), "doc_id", 1, 8)
        .select(col("doc_id"), col("pos")).orderBy("pos")
    },

    // PACKING MANIFEST (C13): the dataloader contract — one row per
    // packed window with its win_off-ordered `off:doc:doc_off:len`
    // segment CSV: exactly the block-diagonal attention-mask
    // boundaries a packed-sequence loader needs (Krell 2021), plus
    // the fill rollup. Oracle rebuilds the CSV with string_agg over
    // the same span arithmetic.
    Q("q_pack_manifest",
      s"""WITH tok AS (SELECT doc_id, CAST(len($toksD) AS BIGINT)
         |    AS n FROM documents),
         |nz AS (SELECT * FROM tok WHERE n > 0),
         |b AS (SELECT *,
         |    ${sqlHash31("'pack:' || CAST(doc_id AS VARCHAR)")} % 8
         |    AS bucket FROM nz),
         |c AS (SELECT *, CAST(SUM(n) OVER (PARTITION BY bucket
         |    ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
         |    AS e FROM b),
         |s AS (SELECT doc_id, bucket, e - n AS st, e FROM c),
         |x AS (SELECT doc_id, bucket, st, e,
         |    unnest(range(st // 256, (e - 1) // 256 + 1)) AS w FROM s),
         |sp AS (SELECT doc_id, bucket, CAST(w AS BIGINT) AS window_id,
         |    CAST(greatest(st, w * 256) - w * 256 AS BIGINT)
         |      AS win_off,
         |    CAST(greatest(0, w * 256 - st) AS BIGINT) AS doc_off,
         |    CAST(least(e, (w + 1) * 256) - greatest(st, w * 256)
         |      AS BIGINT) AS n_tokens
         |  FROM x)
         |SELECT bucket, window_id,
         |  CAST(count(*) AS BIGINT) AS n_spans,
         |  CAST(sum(n_tokens) AS BIGINT) AS tokens,
         |  (CAST(sum(n_tokens) AS BIGINT) * 1000) // 256
         |    AS fill_milli,
         |  string_agg(win_off || ':' || CAST(doc_id AS VARCHAR)
         |      || ':' || doc_off || ':' || n_tokens, ';'
         |    ORDER BY win_off) AS segments_csv
         |FROM sp GROUP BY 1, 2
         |ORDER BY bucket, window_id""".stripMargin) { (s, d) =>
      val docs = t(s, d, "documents")
        .select(col("doc_id"),
          size(tokens(col("text"))).cast("long").as("n_toks"))
      val spans = graft.operators.Sharding
        .packContiguousWindows(docs, "doc_id", "n_toks", 256L, 8)
      graft.operators.Sharding
        .windowManifest(spans, "doc_id", 256L)
        .orderBy("bucket", "window_id")
    },

    // DEDUP: banded simhash near-dup pairs (hamming <= 3) over a
    // 32-bit fingerprint: 8-bit band chunks give 256 bucket values, so
    // candidate volume stays ~n²/256 per band instead of the n²/16 a
    // 16-bit/4-band layout degenerates to — the banding-precision
    // lesson at scale.
    Q("q_d_simhash_pairs",
      simCte(32) +
        """, banded AS (SELECT doc_id AS id, simhash,
          |    unnest([0,1,2,3]) AS band FROM sim),
          |ch AS (SELECT id, simhash, band,
          |       (simhash >> (band*8)) & 255 AS chunk FROM banded)
          |SELECT DISTINCT a.id AS id_a, b.id AS id_b,
          |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
          |FROM ch a JOIN ch b
          |  ON a.band = b.band AND a.chunk = b.chunk AND a.id < b.id
          |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
          |ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
      Dedup.simHashPairs(t(s, d, "documents"), "doc_id", "text", 32, 4, 3)
        .orderBy("id_a", "id_b")
    },

    // INCREMENTAL FINGERPRINT DEDUP: an arriving batch (doc_id % 10
    // == 0) probes the persisted fingerprint index + itself without
    // self-joining the index — q_d_incremental_lsh's shape for the
    // hamming family (streaming media dedup). Combined-population
    // bucket cap.
    Q("q_d_incremental_hamming",
      simCte(32) +
        """, banded AS (SELECT doc_id AS id, simhash,
          |    unnest([0,1,2,3]) AS band FROM sim),
          |ch0 AS (SELECT id, simhash, band,
          |       (simhash >> (band*8)) & 255 AS chunk FROM banded),
          |small AS (SELECT band, chunk FROM ch0
          |          GROUP BY 1, 2 HAVING count(*) <= 1000),
          |ch AS (SELECT ch0.* FROM ch0
          |       JOIN small ON ch0.band = small.band
          |                 AND ch0.chunk = small.chunk),
          |nw AS (SELECT * FROM ch WHERE id % 10 = 0)
          |SELECT DISTINCT a.id AS new_id, b.id AS other_id,
          |  (b.id % 10 = 0) AS other_is_new,
          |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER)
          |    AS hamming
          |FROM nw a JOIN ch b
          |  ON a.band = b.band AND a.chunk = b.chunk
          |WHERE ((b.id % 10 = 0 AND a.id < b.id) OR b.id % 10 != 0)
          |  AND bit_count(xor(a.simhash, b.simhash)) <= 3
          |ORDER BY new_id, other_id""".stripMargin) { (s, d) =>
      val sigs = Dedup.withSimHash(t(s, d, "documents"),
          "doc_id", "text", 32)
        .select(col("doc_id").as("id"), col("simhash").as("fp"))
      Dedup.incrementalHammingPairs(
          sigs.filter(col("id") % 10 === 0),
          sigs.filter(col("id") % 10 =!= 0),
          "id", "fp", 32, 4, 3, 1000)
        .orderBy("new_id", "other_id")
    },

    // DEDUP (D20): winnowing fingerprint selection (Schleimer 2003,
    // MOSS) — per-doc sliding-window argmin over 4-gram hashes with
    // the rightmost-tie rule, all riding ONE int64 h*2^20+(2^20-1-pos)
    // so a plain frame min IS the paper's rule on both engines.
    Q("q_d_winnow",
      s"""WITH tok AS (SELECT doc_id, $toksD AS t FROM documents),
         |gr AS (SELECT doc_id, i AS pos,
         |    ${sqlHash31("array_to_string(list_slice(t, i + 1, i + 4), ' ')")}
         |      * 1048576 + (1048575 - i) AS key
         |  FROM (SELECT doc_id, t, unnest(range(0, len(t) - 3)) AS i
         |        FROM tok)),
         |sel AS (SELECT doc_id, pos,
         |    min(key) OVER (PARTITION BY doc_id ORDER BY pos
         |      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS s,
         |    max(pos) OVER (PARTITION BY doc_id) AS mx FROM gr)
         |SELECT DISTINCT doc_id,
         |  CAST(1048575 - (s % 1048576) AS BIGINT) AS fp_pos,
         |  CAST(s // 1048576 AS BIGINT) AS fp_hash
         |FROM sel WHERE pos >= 4 OR pos = mx
         |ORDER BY doc_id, fp_pos""".stripMargin) { (s, d) =>
      graft.operators.Dedup.winnowFingerprints(
          t(s, d, "documents"), "doc_id", "text", 4, 5)
        .orderBy("doc_id", "fp_pos")
    },

    // DEDUP (D21): the MOSS match step — pair documents by shared
    // winnowed fingerprints (cap 50, >= 2 shared). By the winnowing
    // guarantee this has FULL recall on verbatim runs >= w+k-1 tokens
    // at ~2/(w+1) of the all-grams join's cost.
    Q("q_d_winnow_pairs",
      s"""WITH tok AS (SELECT doc_id, $toksD AS t FROM documents),
         |gr AS (SELECT doc_id, i AS pos,
         |    ${sqlHash31("array_to_string(list_slice(t, i + 1, i + 4), ' ')")}
         |      * 1048576 + (1048575 - i) AS key
         |  FROM (SELECT doc_id, t, unnest(range(0, len(t) - 3)) AS i
         |        FROM tok)),
         |sel AS (SELECT doc_id, pos,
         |    min(key) OVER (PARTITION BY doc_id ORDER BY pos
         |      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS s,
         |    max(pos) OVER (PARTITION BY doc_id) AS mx FROM gr),
         |fp AS (SELECT DISTINCT doc_id,
         |    CAST(s // 1048576 AS BIGINT) AS fp_hash
         |  FROM sel WHERE pos >= 4 OR pos = mx),
         |small AS (SELECT fp_hash FROM fp GROUP BY 1
         |  HAVING count(*) <= 50),
         |k AS (SELECT f.doc_id, f.fp_hash FROM fp f
         |  JOIN small USING (fp_hash))
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CAST(count(*) AS BIGINT) AS shared_fps
         |FROM k a JOIN k b ON a.fp_hash = b.fp_hash
         |  AND a.doc_id < b.doc_id
         |GROUP BY 1, 2 HAVING count(*) >= 2
         |ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
      graft.operators.Dedup.winnowPairs(
          graft.operators.Dedup.winnowFingerprints(
            t(s, d, "documents"), "doc_id", "text", 4, 5),
          "doc_id", 2, 50)
        .orderBy("id_a", "id_b")
    },

    // E2E (E13): the crawl-curation pipeline as ONE declarative plan
    // — blocklist-tag synthesized hosts and keep the clean ones,
    // CCNet-bucket quality per language and drop the tail tercile,
    // then epoch-shuffle the survivors into dataloader order. Every
    // stage is a graded round-10 operator; the oracle replays the
    // whole composition.
    Q("q_e2e_crawl_curate",
      s"""WITH u AS (SELECT doc_id, lang, n_chars,
         |    'https://' || CASE doc_id % 4
         |    WHEN 0 THEN 'spam.example.com'
         |    WHEN 1 THEN 'a.b.badsite.org'
         |    WHEN 2 THEN 'goodsite.com'
         |    ELSE 'sub.goodsite.com' END
         |    || '/p/' || doc_id AS url FROM documents),
         |hx AS (SELECT doc_id, lang, n_chars,
         |    lower(regexp_extract(url,
         |    '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]*)',
         |    1)) AS host FROM u),
         |surv AS (SELECT doc_id, lang, n_chars FROM hx
         |  WHERE NOT EXISTS (SELECT 1 FROM (SELECT unnest(range(0,
         |      len(string_split(hx.host, '.')))) AS i) s
         |    WHERE array_to_string(list_slice(
         |        string_split(hx.host, '.'), s.i + 1,
         |        len(string_split(hx.host, '.'))), '.')
         |      IN ('badsite.org', 'spam.example.com', 'example.com'))),
         |bk AS (SELECT doc_id, lang, CASE WHEN n <= 1 THEN 0
         |    ELSE least((rk - 1) * 1000 // (n - 1) * 3 // 1000, 2)
         |    END AS bucket
         |  FROM (SELECT doc_id, lang,
         |      rank() OVER (PARTITION BY lang ORDER BY n_chars) AS rk,
         |      count(*) OVER (PARTITION BY lang) AS n FROM surv)),
         |keep AS (SELECT doc_id, lang, bucket FROM bk
         |  WHERE bucket <= 1),
         |sh AS (SELECT doc_id, lang, bucket,
         |    ${sqlHash31("'ep1:' || CAST(doc_id AS VARCHAR)")} AS h
         |  FROM keep)
         |SELECT CAST(row_number() OVER (ORDER BY h, doc_id) - 1
         |    AS BIGINT) AS pos, doc_id, lang,
         |  CAST(bucket AS BIGINT) AS bucket
         |FROM sh ORDER BY pos""".stripMargin) { (s, d) =>
      val url = concat(lit("https://"),
        when(col("doc_id") % 4 === 0, lit("spam.example.com"))
          .when(col("doc_id") % 4 === 1, lit("a.b.badsite.org"))
          .when(col("doc_id") % 4 === 2, lit("goodsite.com"))
          .otherwise(lit("sub.goodsite.com")),
        lit("/p/"), col("doc_id").cast("string"))
      val surv = graft.operators.TextAnalysis.tagByDomainBlocklist(
          t(s, d, "documents")
            .select(col("doc_id"), col("lang"), col("n_chars"),
              url.as("url")),
          "doc_id", "url",
          Seq("badsite.org", "spam.example.com", "example.com"))
        .filter(col("blocked_by").isNull)
        .select("doc_id", "lang", "n_chars")
      val kept = graft.operators.TextAnalysis.scoreBucketsByGroup(
          surv, "lang", "n_chars", 3)
        .filter(col("bucket") <= 1)
        .select("doc_id", "lang", "bucket")
      graft.operators.Sharding.epochShuffle(kept, "doc_id", 1, 8)
        .select("pos", "doc_id", "lang", "bucket").orderBy("pos")
    },

    // QUALITY (T35): CCNet per-group score terciles — rank-percentile
    // within the group, integer milli, equal-mass head/middle/tail
    // buckets; ties share the min rank so equal scores always land
    // in the same bucket on every engine.
    Q("q_t_score_buckets",
      """SELECT doc_id, lang, n_chars,
        |  CAST(CASE WHEN n <= 1 THEN 0
        |    ELSE (rk - 1) * 1000 // (n - 1) END AS BIGINT)
        |    AS prank_milli,
        |  CAST(least((CASE WHEN n <= 1 THEN 0
        |    ELSE (rk - 1) * 1000 // (n - 1) END) * 3 // 1000, 2)
        |    AS BIGINT) AS bucket
        |FROM (SELECT doc_id, lang, n_chars,
        |    rank() OVER (PARTITION BY lang ORDER BY n_chars) AS rk,
        |    count(*) OVER (PARTITION BY lang) AS n FROM documents)
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      graft.operators.TextAnalysis.scoreBucketsByGroup(
          t(s, d, "documents").select("doc_id", "lang", "n_chars"),
          "lang", "n_chars", 3)
        .select("doc_id", "lang", "n_chars", "prank_milli", "bucket")
        .orderBy("doc_id")
    },

    // FILTERING (T34): domain-blocklist tagging with registrable-
    // suffix semantics — `example.com` blocks every subdomain, the
    // LONGEST matching entry wins, and the whole operator is one
    // narrow projection (the blocklist is config, not data). Hosts
    // synthesized from doc_id per the URL-dedup pattern; oracle
    // explodes the dot-suffix chain and arg_min's the match depth.
    Q("q_t_domain_blocklist",
      """WITH u AS (SELECT doc_id, 'https://' || CASE doc_id % 4
        |    WHEN 0 THEN 'spam.example.com'
        |    WHEN 1 THEN 'a.b.badsite.org'
        |    WHEN 2 THEN 'goodsite.com'
        |    ELSE 'sub.goodsite.com' END
        |    || '/p/' || doc_id AS url FROM documents),
        |hx AS (SELECT doc_id, lower(regexp_extract(url,
        |    '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]*)',
        |    1)) AS host FROM u),
        |s AS (SELECT doc_id, host, unnest(range(0,
        |    len(string_split(host, '.')))) AS i FROM hx),
        |c AS (SELECT doc_id, host, i,
        |    array_to_string(list_slice(string_split(host, '.'),
        |      i + 1, len(string_split(host, '.'))), '.') AS suf
        |  FROM s),
        |m AS (SELECT doc_id, arg_min(suf, i) AS blocked_by FROM c
        |  WHERE suf IN ('badsite.org', 'spam.example.com',
        |    'example.com') GROUP BY 1)
        |SELECT hx.doc_id, hx.host, m.blocked_by
        |FROM hx LEFT JOIN m ON hx.doc_id = m.doc_id
        |ORDER BY hx.doc_id""".stripMargin) { (s, d) =>
      val url = concat(lit("https://"),
        when(col("doc_id") % 4 === 0, lit("spam.example.com"))
          .when(col("doc_id") % 4 === 1, lit("a.b.badsite.org"))
          .when(col("doc_id") % 4 === 2, lit("goodsite.com"))
          .otherwise(lit("sub.goodsite.com")),
        lit("/p/"), col("doc_id").cast("string"))
      graft.operators.TextAnalysis.tagByDomainBlocklist(
          t(s, d, "documents").select(col("doc_id"), url.as("url")),
          "doc_id", "url",
          Seq("badsite.org", "spam.example.com", "example.com"))
        .select("doc_id", "host", "blocked_by").orderBy("doc_id")
    },

    // DEDUP: URL-level dedup after canonicalization — three raw
    // spellings per page (case/port/tracking/fragment cruft) collapse
    // to one canonical URL; keep the smallest doc_id per page. One
    // key-shuffle (exactByKey); the canonicalization itself is a
    // narrow codegen map, so at 100 TB the only exchange is the
    // per-URL group.
    Q("q_d_url_dedup",
      s"""WITH u AS (SELECT doc_id, CASE doc_id % 3
         |  WHEN 0 THEN concat('https://Example.com/p/', doc_id % 50)
         |  WHEN 1 THEN concat('HTTPS://example.COM:443/p/', doc_id % 50,
         |    '/?utm_source=x')
         |  ELSE concat('https://example.com/p/', doc_id % 50, '/#frag')
         |  END AS u FROM documents),
         |c AS (SELECT doc_id, ${sqlCanonicalUrl("u")} AS curl FROM u)
         |SELECT curl, min(doc_id) AS doc_id FROM c GROUP BY 1
         |ORDER BY curl""".stripMargin) { (s, d) =>
      val pg = (col("doc_id") % 50).cast("string")
      val u = when(col("doc_id") % 3 === 0,
          concat(lit("https://Example.com/p/"), pg))
        .when(col("doc_id") % 3 === 1,
          concat(lit("HTTPS://example.COM:443/p/"), pg, lit("/?utm_source=x")))
        .otherwise(concat(lit("https://example.com/p/"), pg, lit("/#frag")))
      Dedup.exactByKey(
          t(s, d, "documents").select(col("doc_id"),
            graft.functions.canonicalUrl(u).as("curl")),
          Seq("curl"), "doc_id")
        .select("curl", "doc_id").orderBy("curl")
    },

    // QUALITY: C4-family boilerplate removal — drop every unit whose
    // document frequency exceeds 78% of the corpus, keep the rest in
    // order. Graded at unit = token (this corpus is single-line word
    // soup); TextOpsSpec exercises the unit = line case on
    // constructed crawl-shaped docs. Threshold is an exact integer
    // cross-multiply, so the same query is deterministic at every sf.
    Q("q_t_boilerplate",
      """WITH t0 AS (SELECT doc_id,
        |    list_filter(list_transform(string_split(text, ' '),
        |      u -> trim(u)), u -> u != '') AS us
        |  FROM documents),
        |uu AS (SELECT doc_id, unnest(generate_series(1, len(us))) AS p,
        |       unnest(us) AS u FROM t0),
        |dfq AS (SELECT u, count(DISTINCT doc_id) AS df FROM uu GROUP BY 1),
        |boiler AS (SELECT u FROM dfq
        |  WHERE df * 1000 > 780 * (SELECT count(*) FROM documents)),
        |kept AS (SELECT * FROM uu
        |  WHERE u NOT IN (SELECT u FROM boiler)),
        |agg AS (SELECT doc_id, count(*) AS n_kept,
        |    string_agg(u, ' ' ORDER BY p) AS clean_text
        |  FROM kept GROUP BY 1)
        |SELECT t0.doc_id, CAST(len(t0.us) AS BIGINT) AS n_units,
        |  CAST(coalesce(a.n_kept, 0) AS BIGINT) AS n_kept,
        |  coalesce(a.clean_text, '') AS clean_text
        |FROM t0 LEFT JOIN agg a USING (doc_id)
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      TextAnalysis.dropBoilerplateUnits(
          t(s, d, "documents"), "doc_id", "text", " ", 780L)
        .orderBy("doc_id")
    },

    // DEDUP: shared-span detection (Lee et al. 2022 substring-dedup
    // signal) — pairs sharing >= 6 consecutive tokens, with the
    // longest run per pair, via positional 3-gram fingerprints on one
    // diagonal (gaps-and-islands). Catches syndicated/quoted overlap
    // that whole-document near-dup misses. The df cap (20) bounds the
    // fingerprint join exactly like the shingle caps in the LSH
    // family.
    Q("q_d_shared_spans",
      s"""WITH tok AS (SELECT doc_id, $toksD AS t FROM documents),
         |g0 AS (SELECT doc_id, ${sqlShingles("t", 3)} AS gs FROM tok),
         |g AS (SELECT doc_id, unnest(generate_series(1, len(gs))) AS p,
         |      unnest(gs) AS gr FROM g0),
         |gh AS (SELECT doc_id, p, ${sqlHash60("gr")} AS h FROM g),
         |rare AS (SELECT h FROM (SELECT h, count(DISTINCT doc_id) AS df
         |  FROM gh GROUP BY 1) WHERE df <= 20),
         |m AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         |      a.p AS pa, a.p - b.p AS d
         |      FROM gh a JOIN gh b ON a.h = b.h AND a.doc_id < b.doc_id
         |      WHERE a.h IN (SELECT h FROM rare)),
         |r AS (SELECT id_a, id_b, d, pa - row_number() OVER (
         |      PARTITION BY id_a, id_b, d ORDER BY pa) AS isl FROM m),
         |runs AS (SELECT id_a, id_b, count(*) AS rn FROM r
         |      GROUP BY id_a, id_b, d, isl)
         |SELECT id_a, id_b, CAST(max(rn) + 2 AS BIGINT) AS span_tokens
         |FROM runs GROUP BY 1, 2 HAVING max(rn) + 2 >= 6
         |ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
      Dedup.sharedSpanPairs(t(s, d, "documents"), "doc_id", "text",
          k = 3, minSpan = 6, maxGramDf = 20)
        .orderBy("id_a", "id_b")
    },

    // CURATION: DSIR-shaped importance weights — hashed-unigram
    // likelihood ratios (target = English docs) scored per document,
    // integer milli throughout (the operator's documented log-free
    // deviation). High w_milli = "looks like the target domain";
    // selection takes the top slice.
    Q("q_t_dsir",
      s"""WITH tb AS (SELECT doc_id,
         |    ${sqlHash31("'dsir:' || tok")} % 1024 AS b,
         |    (lang = 'en') AS t
         |  FROM (SELECT doc_id, unnest($toksD) AS tok, lang
         |        FROM documents)),
         |bc AS (SELECT b, count(*) AS r,
         |    sum(CASE WHEN t THEN 1 ELSE 0 END) AS tc FROM tb GROUP BY 1),
         |tot AS (SELECT sum(r) AS rr, sum(tc) AS tt FROM bc),
         |ratio AS (SELECT b,
         |    ((tc + 1) * (rr + 1024) * 1000) // ((r + 1) * (tt + 1024))
         |      AS rm FROM bc, tot),
         |db AS (SELECT doc_id, b, count(*) AS c FROM tb GROUP BY 1, 2),
         |w AS (SELECT doc_id, sum(c) AS n_toks,
         |    sum(c * rm) // sum(c) AS w_milli
         |  FROM db JOIN ratio USING (b) GROUP BY 1)
         |SELECT d.doc_id, CAST(coalesce(w.n_toks, 0) AS BIGINT) AS n_toks,
         |  CAST(coalesce(w.w_milli, 0) AS BIGINT) AS w_milli
         |FROM documents d LEFT JOIN w USING (doc_id)
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      TextAnalysis.dsirWeights(t(s, d, "documents"), "doc_id", "text",
          target = col("lang") === "en", buckets = 1024)
        .orderBy("doc_id")
    },

    // MONITORING: Jensen-Shannon divergence between the English and
    // non-English sub-corpora's hashed-unigram distributions — the
    // snapshot-vs-snapshot drift gauge of a refreshed training set.
    // Exact int64 arithmetic around one micro-floored ln per bucket
    // (the knNll discipline); the clamp absorbs only quantization
    // undershoot, so the oracle replays every step bit-for-bit.
    Q("q_t_js_drift",
      s"""WITH tb AS (SELECT (lang = 'en') AS l,
         |    ${sqlHash31("'js:' || tok")} % 512 AS b
         |  FROM (SELECT unnest($toksD) AS tok, lang FROM documents)),
         |bc AS (SELECT b,
         |    CAST(sum(CASE WHEN l THEN 1 ELSE 0 END) AS BIGINT) AS c,
         |    CAST(sum(CASE WHEN l THEN 0 ELSE 1 END) AS BIGINT) AS d
         |  FROM tb GROUP BY 1),
         |tot AS (SELECT CAST(sum(c) AS BIGINT) AS na,
         |    CAST(sum(d) AS BIGINT) AS nb FROM bc),
         |f AS (SELECT
         |    CAST(sum(CASE WHEN c > 0 THEN c * CAST(FLOOR(LN(
         |      (2.0 * c * nb) / (c * nb + d * na)) * 1000000)
         |      AS BIGINT) ELSE 0 END) AS BIGINT) AS pa,
         |    CAST(sum(CASE WHEN d > 0 THEN d * CAST(FLOOR(LN(
         |      (2.0 * d * na) / (c * nb + d * na)) * 1000000)
         |      AS BIGINT) ELSE 0 END) AS BIGINT) AS pb,
         |    CAST(sum(CASE WHEN c > 0 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS buckets_a,
         |    CAST(sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS buckets_b,
         |    max(na) AS n_tokens_a, max(nb) AS n_tokens_b
         |  FROM bc, tot)
         |SELECT n_tokens_a, n_tokens_b, buckets_a, buckets_b,
         |  greatest(pa, 0) // n_tokens_a AS js_a_micro,
         |  greatest(pb, 0) // n_tokens_b AS js_b_micro,
         |  (greatest(pa, 0) // n_tokens_a +
         |   greatest(pb, 0) // n_tokens_b) // 2 AS js_micro
         |FROM f ORDER BY n_tokens_a""".stripMargin) { (s, d) =>
      TextAnalysis.jsDivergence(t(s, d, "documents"), "text",
          col("lang") === "en", buckets = 512)
        .orderBy("n_tokens_a")
    },

    // MONITORING: per-SOURCE JS drift — each domain's hashed-unigram
    // distribution against the rest of the corpus, one row per
    // source; the complement side derives by subtraction from the
    // global bucket margins, so all twenty comparisons cost ONE
    // (source × bucket) count table.
    Q("q_t_js_by_source",
      s"""WITH tb AS (SELECT source,
         |    ${sqlHash31("'js:' || tok")} % 256 AS b
         |  FROM (SELECT source, unnest($toksD) AS tok FROM documents)),
         |gb AS (SELECT source, b, CAST(count(*) AS BIGINT) AS c
         |  FROM tb GROUP BY 1, 2),
         |mg AS (SELECT b, CAST(sum(c) AS BIGINT) AS tbb
         |  FROM gb GROUP BY 1),
         |tt AS (SELECT CAST(sum(tbb) AS BIGINT) AS ttt FROM mg),
         |na AS (SELECT source, CAST(sum(c) AS BIGINT) AS naa
         |  FROM gb GROUP BY 1),
         |j AS (SELECT na.source, mg.b, mg.tbb, tt.ttt, na.naa,
         |      coalesce(gb.c, 0) AS c
         |  FROM mg CROSS JOIN tt CROSS JOIN na
         |  LEFT JOIN gb ON gb.source = na.source AND gb.b = mg.b),
         |jj AS (SELECT source, naa, ttt - naa AS nbb, c,
         |      tbb - c AS d FROM j),
         |f AS (SELECT source, max(naa) AS n_tokens_a,
         |    max(nbb) AS n_tokens_b,
         |    CAST(sum(CASE WHEN c > 0 THEN c * CAST(FLOOR(LN(
         |      (2.0 * c * nbb) / (c * nbb + d * naa)) * 1000000)
         |      AS BIGINT) ELSE 0 END) AS BIGINT) AS pa,
         |    CAST(sum(CASE WHEN d > 0 THEN d * CAST(FLOOR(LN(
         |      (2.0 * d * naa) / (c * nbb + d * naa)) * 1000000)
         |      AS BIGINT) ELSE 0 END) AS BIGINT) AS pb
         |  FROM jj GROUP BY 1)
         |SELECT source, n_tokens_a, n_tokens_b,
         |  CASE WHEN n_tokens_a > 0 THEN greatest(pa, 0) // n_tokens_a
         |    ELSE 0 END AS js_a_micro,
         |  CASE WHEN n_tokens_b > 0 THEN greatest(pb, 0) // n_tokens_b
         |    ELSE 0 END AS js_b_micro,
         |  (CASE WHEN n_tokens_a > 0 THEN greatest(pa, 0) // n_tokens_a
         |    ELSE 0 END +
         |   CASE WHEN n_tokens_b > 0 THEN greatest(pb, 0) // n_tokens_b
         |    ELSE 0 END) // 2 AS js_micro
         |FROM f ORDER BY source""".stripMargin) { (s, d) =>
      TextAnalysis.jsDivergenceByGroup(t(s, d, "documents"), "text",
          "source", buckets = 256)
        .orderBy("source")
    },

    // TOKENIZER: BPE merge-table training (6 rounds) — the oracle
    // replays the identical algorithm as a generated CTE chain using
    // the same space-wrapped symbol representation and the same
    // literal replace() fusion, so any drift in pair counting,
    // tie-breaking, or greedy fusion order fails the gate.
    Q("q_t_bpe_merges", bpeOracle(6)) { (s, d) =>
      bpeMerges6(s, d).orderBy("merge_rank")
    },

    // QUALITY: the rest of the Gopher repetition family — duplicate
    // unit fraction + char-weighted variant + heaviest-2-gram char
    // share, all integer milli. Graded at unit = token (single-line
    // corpus); TextOpsSpec covers unit = line. Pure narrow map on the
    // Spark side — the oracle recomputes relationally.
    Q("q_t_gopher_rep",
      s"""WITH u0 AS (SELECT doc_id,
         |    list_filter(list_transform(string_split(text, ' '),
         |      x -> trim(x)), x -> x != '') AS us FROM documents),
         |lc AS (SELECT doc_id, u, count(*) AS c
         |  FROM (SELECT doc_id, unnest(us) AS u FROM u0) GROUP BY 1, 2),
         |la AS (SELECT doc_id, sum(c) AS nu, sum(c - 1) AS dups,
         |    sum((c - 1) * length(u)) AS dupch FROM lc GROUP BY 1),
         |tok AS (SELECT doc_id, $toksD AS t FROM documents),
         |gc AS (SELECT doc_id, gr, count(*) AS c FROM
         |  (SELECT doc_id, unnest(${sqlShingles("t", 2)}) AS gr FROM tok)
         |  GROUP BY 1, 2),
         |gt AS (SELECT doc_id, max(c * length(gr)) AS topch FROM gc
         |  GROUP BY 1),
         |tc AS (SELECT doc_id, sum(c * length(u)) AS totch FROM lc
         |  GROUP BY 1),
         |nrm AS (SELECT doc_id, length($normD) AS nl FROM documents)
         |SELECT d.doc_id,
         |  CAST(coalesce(la.nu, 0) AS BIGINT) AS n_units,
         |  CAST(CASE WHEN coalesce(la.nu, 0) = 0 THEN 0
         |    ELSE (la.dups * 1000) // la.nu END AS BIGINT)
         |    AS dup_unit_milli,
         |  CAST(CASE WHEN coalesce(tc.totch, 0) = 0 THEN 0
         |    ELSE (la.dupch * 1000) // tc.totch END AS BIGINT)
         |    AS dup_unit_char_milli,
         |  CAST(CASE WHEN coalesce(gt.topch, 0) = 0 OR nrm.nl = 0 THEN 0
         |    ELSE (gt.topch * 1000) // nrm.nl END AS BIGINT)
         |    AS top_ngram_char_milli
         |FROM documents d LEFT JOIN la USING (doc_id)
         |  LEFT JOIN tc USING (doc_id) LEFT JOIN gt USING (doc_id)
         |  LEFT JOIN nrm USING (doc_id)
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      TextAnalysis.gopherRepetitionSignals(t(s, d, "documents"),
          "doc_id", "text", splitRegex = " ", n = 2)
        .orderBy("doc_id")
    },

    // QUALITY: C4 intra-document unit dedup — keep each distinct
    // unit's first occurrence, original order. Graded at unit =
    // token; TextOpsSpec covers the line case. Narrow map (contrast
    // q_t_boilerplate's cross-document broadcast anti-join).
    Q("q_t_line_dedup",
      """WITH u0 AS (SELECT doc_id,
        |    list_filter(list_transform(string_split(text, ' '),
        |      x -> trim(x)), x -> x != '') AS us FROM documents),
        |uu AS (SELECT doc_id, unnest(generate_series(1, len(us))) AS p,
        |       unnest(us) AS u FROM u0),
        |fo AS (SELECT doc_id, u, min(p) AS p FROM uu GROUP BY 1, 2),
        |agg AS (SELECT doc_id, count(*) AS n_kept,
        |    string_agg(u, ' ' ORDER BY p) AS clean_text FROM fo
        |  GROUP BY 1)
        |SELECT u0.doc_id, CAST(len(u0.us) AS BIGINT) AS n_units,
        |  CAST(coalesce(a.n_kept, 0) AS BIGINT) AS n_kept,
        |  coalesce(a.clean_text, '') AS clean_text
        |FROM u0 LEFT JOIN agg a USING (doc_id)
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      TextAnalysis.dedupUnitsWithin(t(s, d, "documents"),
          "doc_id", "text", splitRegex = " ", joinWith = " ")
        .orderBy("doc_id")
    },

    // CURATION: domain-level corpus stats — the grouping behind
    // domain blocklists and per-site quality budgets. Three URL
    // shapes per host (www, default port, userinfo+odd port) collapse
    // to one host-level domain; non-URLs land in the '' bucket. One
    // partial-agg key-shuffle on the domain.
    Q("q_t_domain_stats",
      s"""WITH u AS (SELECT doc_id, text, CASE doc_id % 4
         |  WHEN 0 THEN concat('https://www.Site', doc_id % 7,
         |    '.example.com/p/', doc_id)
         |  WHEN 1 THEN concat('http://site', doc_id % 7,
         |    '.example.com:80/q')
         |  WHEN 2 THEN concat('https://u:p@Site', doc_id % 7,
         |    '.example.com:8443/r')
         |  ELSE concat('doc ', doc_id) END AS url FROM documents),
         |d0 AS (SELECT doc_id, ${sqlDomainOf("url")} AS domain,
         |    len($toksD) AS ntok FROM u),
         |tot AS (SELECT count(*) AS n FROM d0)
         |SELECT domain, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(ntok) AS BIGINT) AS tok_sum,
         |  CAST((count(*) * 1000) // (SELECT n FROM tot) AS BIGINT)
         |    AS share_milli
         |FROM d0 GROUP BY 1 ORDER BY domain""".stripMargin) { (s, d) =>
      val k = (col("doc_id") % 7).cast("string")
      val id = col("doc_id").cast("string")
      val url = when(col("doc_id") % 4 === 0,
          concat(lit("https://www.Site"), k, lit(".example.com/p/"), id))
        .when(col("doc_id") % 4 === 1,
          concat(lit("http://site"), k, lit(".example.com:80/q")))
        .when(col("doc_id") % 4 === 2,
          concat(lit("https://u:p@Site"), k, lit(".example.com:8443/r")))
        .otherwise(concat(lit("doc "), id))
      val d0 = t(s, d, "documents")
        .select(domainOf(url).as("domain"),
          TextAnalysis.wsTokenCount(col("text")).as("ntok"))
      val tot = d0.agg(count(lit(1)).as("__n"))
      d0.groupBy("domain")
        .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).as("tok_sum"))
        .crossJoin(broadcast(tot))
        .select(col("domain"), col("n_docs"), col("tok_sum"),
          expr("(n_docs * 1000) div __n").as("share_milli"))
        .orderBy("domain")
    },

    // DEDUP: corpus-wide keep-first unit dedup (RefinedWeb exact
    // line-dedup) — a unit survives only at its globally first
    // (doc_id, pos) occurrence; every later copy anywhere in the
    // corpus is dropped. Graded at unit = token; TextOpsSpec covers
    // the line case. Contrast q_t_line_dedup (within-doc only) and
    // q_t_boilerplate (df threshold, keeps zero copies).
    Q("q_t_corpus_dedup",
      """WITH u0 AS (SELECT doc_id,
        |    list_filter(list_transform(string_split(text, ' '),
        |      x -> trim(x)), x -> x != '') AS us FROM documents),
        |uu AS (SELECT doc_id, unnest(generate_series(1, len(us))) AS p,
        |       unnest(us) AS u FROM u0),
        |fo AS (SELECT doc_id, p, u FROM (SELECT doc_id, p, u,
        |    row_number() OVER (PARTITION BY u ORDER BY doc_id, p) AS rn
        |  FROM uu) WHERE rn = 1),
        |agg AS (SELECT doc_id, count(*) AS n_kept,
        |    string_agg(u, ' ' ORDER BY p) AS clean_text FROM fo
        |  GROUP BY 1)
        |SELECT u0.doc_id, CAST(len(u0.us) AS BIGINT) AS n_units,
        |  CAST(coalesce(a.n_kept, 0) AS BIGINT) AS n_kept,
        |  coalesce(a.clean_text, '') AS clean_text
        |FROM u0 LEFT JOIN agg a USING (doc_id)
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      TextAnalysis.dedupUnitsAcross(t(s, d, "documents"),
          "doc_id", "text", splitRegex = " ", joinWith = " ")
        .orderBy("doc_id")
    },

    // TOKENIZER: train 6 BPE merges on the corpus, then ENCODE every
    // document with them — the train→apply round trip. The oracle
    // replays both halves (training CTEs + nested literal replaces).
    Q("q_t_bpe_encode", bpeEncodeOracle(6)) { (s, d) =>
      TextAnalysis.bpeEncode(t(s, d, "documents"), "doc_id", "text",
          bpeMerges6(s, d))
        .orderBy("doc_id")
    },

    // TOKENIZER FAIRNESS (T31, Petrov 2023): per-language fertility
    // (tokens per 1000 chars) under the corpus-trained BPE, plus the
    // premium each language pays vs the corpus rate — the metric a
    // multilingual curation loop reads next to the UniMax caps. The
    // oracle replays train + encode + the all-integer rate law.
    Q("q_t_fertility", bpeFertilityOracle(6)) { (s, d) =>
      val docs = t(s, d, "documents")
      val enc = TextAnalysis.bpeEncode(docs, "doc_id", "text",
        bpeMerges6(s, d))
        .join(docs.select("doc_id", "lang", "n_chars"), Seq("doc_id"))
      TextAnalysis.tokenizerFertility(enc, "lang", "n_toks", "n_chars")
        .orderBy("lang")
    },

    // CURATION (CUR8, DoReMi-flavored): excess-loss domain
    // reweighting — upweight exactly the languages whose per-token
    // cost exceeds the corpus rate (here: chars-per-token as the
    // deterministic cost signal; swap in any per-doc NLL). The
    // all-integer rate/excess/share law is the one-shot analog of
    // DoReMi's excess-loss objective.
    Q("q_cur_excess_loss",
      s"""WITH tk AS (SELECT doc_id, lang, n_chars,
         |    CAST(len($toksD) AS BIGINT) AS n_toks FROM documents),
         |g AS (SELECT lang, CAST(sum(n_toks) AS BIGINT) AS units,
         |    CAST(sum(n_chars * 1000) AS BIGINT) AS loss
         |  FROM tk GROUP BY 1 HAVING sum(n_toks) > 0),
         |c AS (SELECT CAST(sum(units) AS BIGINT) AS tu,
         |    CAST(sum(loss) AS BIGINT) AS tl FROM g),
         |r AS (SELECT lang, units,
         |    CAST(loss // units AS BIGINT) AS rate_milli,
         |    CAST(greatest(0, loss // units - tl // tu) AS BIGINT)
         |      AS excess_milli
         |  FROM g, c),
         |sx AS (SELECT CAST(sum(excess_milli) AS BIGINT) AS se,
         |    CAST(count(*) AS BIGINT) AS ng FROM r)
         |SELECT lang, units, rate_milli, excess_milli,
         |  CAST(CASE WHEN se > 0 THEN excess_milli * 1000 // se
         |    ELSE 1000 // ng END AS BIGINT) AS weight_milli
         |FROM r, sx ORDER BY lang""".stripMargin) { (s, d) =>
      graft.operators.Curation.excessLossWeights(
          t(s, d, "documents")
            .select(col("lang"),
              size(tokens(col("text"))).cast("long").as("units"),
              (col("n_chars") * 1000L).as("loss_milli")),
          "lang", "units", "loss_milli")
        .orderBy("lang")
    },

    // DATALOADER (C16): length-bucketed batching — the padded-batch
    // complement of contiguous packing: docs bin by length div 16,
    // rank within the bin, every 8 consecutive ranks form a batch;
    // pad_milli prices the padded slots in each batch's n×max token
    // rectangle. One bin-keyed shuffle, no global sort.
    Q("q_pack_length_batches",
      s"""WITH tk AS (SELECT doc_id, CAST(len($toksD) AS BIGINT)
         |    AS n_toks FROM documents),
         |b AS (SELECT doc_id, n_toks, n_toks // 16 AS bin FROM tk),
         |r AS (SELECT bin, n_toks,
         |    (row_number() OVER (PARTITION BY bin
         |       ORDER BY n_toks, doc_id) - 1) // 8 AS batch_in_bin
         |  FROM b),
         |g AS (SELECT bin, batch_in_bin,
         |    CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(max(n_toks) AS BIGINT) AS max_toks,
         |    CAST(sum(n_toks) AS BIGINT) AS sum_toks
         |  FROM r GROUP BY 1, 2)
         |SELECT bin, batch_in_bin, n_docs, max_toks, sum_toks,
         |  CASE WHEN n_docs * max_toks > 0 THEN
         |    (n_docs * max_toks - sum_toks) * 1000
         |      // (n_docs * max_toks) ELSE 0 END AS pad_milli
         |FROM g ORDER BY bin, batch_in_bin""".stripMargin) { (s, d) =>
      graft.operators.Sharding.lengthBucketedBatches(
          t(s, d, "documents")
            .select(col("doc_id"),
              size(tokens(col("text"))).cast("long").as("n_toks")),
          "doc_id", "n_toks", 16L, 8)
        .orderBy("bin", "batch_in_bin")
    },

    // TOKENIZER TRAINING, unigram-LM (T37, Kudo 2018): the OTHER
    // mainstream vocab algorithm next to BPE — seed substring counts,
    // one deterministic hard-EM round (Viterbi E-step under
    // micro-floored-ln piece costs, usage M-step), integer top-V
    // prune with single-char coverage. The oracle replays the whole
    // train: the DP runs as a recursive CTE carrying the last
    // maxPieceLen dp slots, struct-min tie-break identical to the
    // engine's array_min.
    Q("q_t_unigram_lm", uniVocabOracle(3, 32)) { (s, d) =>
      uniVocab32(s, d)
        .select(col("piece"), col("score").cast("long").as("score"))
        .orderBy(col("score").desc, col("piece").asc)
    },

    // TOKENIZER ROUND-TRIP (T38): train→encode under the unigram-LM
    // vocab, mirroring q_t_bpe_encode's surface — every distinct word
    // Viterbi-segmented once under the FINAL model, corpus
    // dictionary-joined, pieces reassembled in document order.
    Q("q_t_unigram_encode", uniEncodeOracle(3, 32)) { (s, d) =>
      uniEncoded32(s, d)
        .select(col("doc_id"), col("n_toks").cast("long").as("n_toks"),
          col("uni_text"))
        .orderBy("doc_id")
    },

    // TOKENIZER TRIAD (T40, Schuster & Nakajima 2012): WordPiece
    // greedy MaxMatch inference over the unigram-trained vocab — the
    // longest-match-first encode BERT applies, A/B-able against the
    // Viterbi encode on the same vocab (greedy differs exactly where
    // a long prefix forces a worse tail). Oracle replays the greedy
    // march as a recursive position pointer.
    Q("q_t_wordpiece_encode", wpEncodeOracle(3, 32)) { (s, d) =>
      wpEncoded32(s, d)
        .select(col("doc_id"), col("n_toks").cast("long").as("n_toks"),
          col("wp_text"))
        .orderBy("doc_id")
    },

    // TOKENIZER TRIAD FAIRNESS (T39c): the fertility rate law under
    // the WordPiece greedy encode — completing the three-way A/B
    // (BPE q_t_fertility, unigram-LM q_t_unigram_fertility, and this
    // row price the SAME corpus under all three tokenizers; greedy
    // MaxMatch pays extra tokens exactly where a long prefix forces
    // a worse tail than Viterbi).
    Q("q_t_wordpiece_fertility", wpFertilityOracle(3, 32)) { (s, d) =>
      val docs = t(s, d, "documents")
      val enc = wpEncoded32(s, d)
        .join(docs.select("doc_id", "lang", "n_chars"), Seq("doc_id"))
      TextAnalysis.tokenizerFertility(enc, "lang", "n_toks", "n_chars")
        .orderBy("lang")
    },

    // TOKENIZER FAIRNESS COMPARISON (T39): the q_t_fertility rate law
    // under the unigram-LM vocab — read next to the BPE row, this is
    // the A/B that says which tokenizer taxes which language (Petrov
    // 2023's premium, same all-integer arithmetic).
    Q("q_t_unigram_fertility", uniFertilityOracle(3, 32)) { (s, d) =>
      val docs = t(s, d, "documents")
      val enc = uniEncoded32(s, d)
        .join(docs.select("doc_id", "lang", "n_chars"), Seq("doc_id"))
      TextAnalysis.tokenizerFertility(enc, "lang", "n_toks", "n_chars")
        .orderBy("lang")
    },

    // CORPUS HEALTH (T33): Zipf rank-frequency slope over the top-25
    // vocabulary — natural text slopes ≈ −1 on the log-log line;
    // templated/synthetic slices bend it, so the least-squares slope
    // is a one-number drift monitor. Milli-floored ln per point +
    // sign-split integer division (engines disagree on negative
    // integer division, and the slope IS negative).
    Q("q_t_zipf",
      s"""WITH tk AS (SELECT unnest($toksD) AS tok FROM documents),
         |c AS (SELECT tok, CAST(count(*) AS BIGINT) AS f
         |  FROM tk GROUP BY 1),
         |r AS (SELECT tok, f,
         |    row_number() OVER (ORDER BY f DESC, tok) AS rk FROM c),
         |p AS (SELECT
         |    CAST(floor(ln(CAST(rk AS DOUBLE)) * 1000) AS BIGINT)
         |      AS x,
         |    CAST(floor(ln(CAST(f AS DOUBLE)) * 1000) AS BIGINT)
         |      AS y
         |  FROM r WHERE rk <= 25),
         |a AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT)
         |      AS sy,
         |    CAST(sum(x * y) AS BIGINT) AS sxy,
         |    CAST(sum(x * x) AS BIGINT) AS sxx FROM p),
         |b AS (SELECT n AS n_terms, n * sxy - sx * sy AS num,
         |    n * sxx - sx * sx AS den FROM a)
         |SELECT n_terms, num, den,
         |  CASE WHEN den = 0 THEN 0
         |    WHEN num >= 0 THEN (num * 1000) // den
         |    ELSE -(((0 - num) * 1000) // den) END AS slope_milli
         |FROM b""".stripMargin) { (s, d) =>
      TextAnalysis.zipfSlope(t(s, d, "documents"), "text", 25)
    },

    // QUALITY: bigram-LM surprisal (KenLM-lite perplexity filter) —
    // add-1-smoothed −ln p(w2|w1), floor-milli quantized per bigram
    // before summing (q_t_unigram_nll's discipline, one order up).
    Q("q_t_bigram_nll",
      s"""WITH tok AS (SELECT doc_id, $toksD AS t FROM documents),
         |g0 AS (SELECT doc_id, unnest(${sqlShingles("t", 2)}) AS g
         |  FROM tok),
         |c12 AS (SELECT g, count(*) AS c FROM g0 GROUP BY 1),
         |ctx AS (SELECT string_split(g, ' ')[1] AS w1, count(*) AS c1
         |  FROM g0 GROUP BY 1),
         |v AS (SELECT count(DISTINCT tk) AS vs
         |  FROM (SELECT unnest(t) AS tk FROM tok)),
         |sc AS (SELECT doc_id,
         |    CAST(floor(ln((ctx.c1 + (SELECT vs FROM v)) * 1.0
         |      / (c12.c + 1.0)) * 1000) AS BIGINT) AS m
         |  FROM g0 JOIN c12 USING (g)
         |    JOIN ctx ON ctx.w1 = string_split(g0.g, ' ')[1]),
         |agg AS (SELECT doc_id, count(*) AS nb, sum(m) AS s FROM sc
         |  GROUP BY 1)
         |SELECT tok.doc_id,
         |  CAST(coalesce(nb, 0) AS BIGINT) AS n_bigrams,
         |  CAST(coalesce(s, 0) AS BIGINT) AS nll_milli_sum,
         |  CAST(CASE WHEN coalesce(nb, 0) = 0 THEN 0
         |    ELSE s // nb END AS BIGINT) AS avg_nll_milli
         |FROM tok LEFT JOIN agg USING (doc_id)
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      TextAnalysis.bigramNll(t(s, d, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    },

    // LM NOVELTY FILTER: stupid-backoff bigram scoring (Brants 2007)
    // — even docs are the reference LM, odd docs are scored against
    // it; n_backoff counts train-unseen bigrams, avg_nll_milli ranks
    // by distance from the reference distribution. α = 0.4.
    Q("q_t_stupid_backoff",
      s"""WITH tok AS (SELECT doc_id, $toksD AS t FROM documents),
         |tr AS (SELECT doc_id, t FROM tok WHERE doc_id % 2 = 0),
         |tg AS (SELECT doc_id, t FROM tok WHERE doc_id % 2 = 1),
         |g0 AS (SELECT unnest(${sqlShingles("t", 2)}) AS g FROM tr),
         |c12 AS (SELECT g, count(*) AS c FROM g0 GROUP BY 1),
         |ctx AS (SELECT string_split(g, ' ')[1] AS w1, count(*) AS c1
         |  FROM g0 GROUP BY 1),
         |tt AS (SELECT unnest(t) AS w FROM tr),
         |uni AS (SELECT w, count(*) AS cu FROM tt GROUP BY 1),
         |nn AS (SELECT count(*) AS n FROM tt),
         |tgg AS (SELECT doc_id, unnest(${sqlShingles("t", 2)}) AS g
         |  FROM tg),
         |sc AS (SELECT tgg.doc_id,
         |    CASE WHEN c12.c IS NULL THEN 1 ELSE 0 END AS bo,
         |    CAST(CASE WHEN c12.c IS NOT NULL THEN
         |      floor(ln(CAST(ctx.c1 AS DOUBLE) / CAST(c12.c AS DOUBLE))
         |        * 1000)
         |    ELSE
         |      floor(ln(CAST((SELECT n FROM nn) * 1000 AS DOUBLE)
         |        / CAST(400 * coalesce(uni.cu, 1) AS DOUBLE)) * 1000)
         |    END AS BIGINT) AS m
         |  FROM tgg LEFT JOIN c12 USING (g)
         |    LEFT JOIN ctx ON ctx.w1 = string_split(tgg.g, ' ')[1]
         |    LEFT JOIN uni ON uni.w = string_split(tgg.g, ' ')[2]),
         |agg AS (SELECT doc_id, count(*) AS nb, sum(bo) AS nbo,
         |    sum(m) AS s FROM sc GROUP BY 1)
         |SELECT tg.doc_id,
         |  CAST(coalesce(nb, 0) AS BIGINT) AS n_bigrams,
         |  CAST(coalesce(nbo, 0) AS BIGINT) AS n_backoff,
         |  CAST(coalesce(s, 0) AS BIGINT) AS nll_milli_sum,
         |  CAST(CASE WHEN coalesce(nb, 0) = 0 THEN 0
         |    ELSE s // nb END AS BIGINT) AS avg_nll_milli
         |FROM tg LEFT JOIN agg USING (doc_id)
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = t(s, d, "documents")
      TextAnalysis.stupidBackoffNll(
          docs.filter(col("doc_id") % 2 === 0),
          docs.filter(col("doc_id") % 2 === 1),
          "doc_id", "text", 400L)
        .orderBy("doc_id")
    },

    // LM SCORING (T26): interpolated Kneser-Ney bigram NLL — the
    // canonical smoothing (continuation counts make frequent-type
    // tails cheap), same even/odd train/target split and the same
    // exact-integer-rational + one-milli-floored-ln discipline as
    // stupid backoff. D = 0.75.
    Q("q_t_kn_nll",
      s"""WITH tok AS (SELECT doc_id, $toksD AS t FROM documents),
         |tr AS (SELECT doc_id, t FROM tok WHERE doc_id % 2 = 0),
         |tg AS (SELECT doc_id, t FROM tok WHERE doc_id % 2 = 1),
         |g0 AS (SELECT unnest(${sqlShingles("t", 2)}) AS g FROM tr),
         |c12 AS (SELECT g, count(*) AS c FROM g0 GROUP BY 1),
         |ctx AS (SELECT string_split(g, ' ')[1] AS w1, count(*) AS c1
         |  FROM g0 GROUP BY 1),
         |n1f AS (SELECT string_split(g, ' ')[1] AS w1,
         |  count(*) AS nf FROM c12 GROUP BY 1),
         |n1b AS (SELECT string_split(g, ' ')[2] AS w2,
         |  count(*) AS nb FROM c12 GROUP BY 1),
         |tt AS (SELECT count(*) AS t FROM c12),
         |tgg AS (SELECT doc_id, unnest(${sqlShingles("t", 2)}) AS g
         |  FROM tg),
         |sc AS (SELECT tgg.doc_id,
         |    CASE WHEN ctx.c1 IS NULL THEN 1 ELSE 0 END AS us,
         |    CAST(CASE WHEN ctx.c1 IS NOT NULL THEN
         |      floor(ln(CAST(1000 * ctx.c1 * (SELECT t FROM tt)
         |          AS DOUBLE)
         |        / CAST(GREATEST(1000 * coalesce(c12.c, 0) - 750, 0)
         |            * (SELECT t FROM tt)
         |          + 750 * n1f.nf * GREATEST(coalesce(n1b.nb, 1), 1)
         |          AS DOUBLE)) * 1000)
         |    ELSE
         |      floor(ln(CAST((SELECT t FROM tt) AS DOUBLE)
         |        / CAST(GREATEST(coalesce(n1b.nb, 1), 1) AS DOUBLE))
         |        * 1000)
         |    END AS BIGINT) AS m
         |  FROM tgg LEFT JOIN c12 USING (g)
         |    LEFT JOIN ctx ON ctx.w1 = string_split(tgg.g, ' ')[1]
         |    LEFT JOIN n1f ON n1f.w1 = string_split(tgg.g, ' ')[1]
         |    LEFT JOIN n1b ON n1b.w2 = string_split(tgg.g, ' ')[2]),
         |agg AS (SELECT doc_id, count(*) AS nbg, sum(us) AS nus,
         |    sum(m) AS s FROM sc GROUP BY 1)
         |SELECT tg.doc_id,
         |  CAST(coalesce(nbg, 0) AS BIGINT) AS n_bigrams,
         |  CAST(coalesce(nus, 0) AS BIGINT) AS n_unseen_ctx,
         |  CAST(coalesce(s, 0) AS BIGINT) AS nll_milli_sum,
         |  CAST(CASE WHEN coalesce(nbg, 0) = 0 THEN 0
         |    ELSE s // nbg END AS BIGINT) AS avg_nll_milli
         |FROM tg LEFT JOIN agg USING (doc_id)
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = t(s, d, "documents")
      TextAnalysis.knNll(
          docs.filter(col("doc_id") % 2 === 0),
          docs.filter(col("doc_id") % 2 === 1),
          "doc_id", "text", 750L)
        .orderBy("doc_id")
    },

    // DECONTAM REPORT (T36): the per-benchmark table a decontam run
    // publishes — eval totals, hit counts both sides, pair count,
    // eval-hit rate in milli; zero-hit benchmarks still report.
    Q("q_t_contamination_report",
      s"""WITH tok AS (SELECT doc_id, $toksD AS t FROM documents),
         |tr AS (SELECT doc_id, t FROM tok WHERE doc_id % 97 != 0),
         |ev AS (SELECT doc_id, CASE WHEN doc_id % 2 = 0 THEN 'benchA'
         |    ELSE 'benchB' END AS benchmark, t FROM tok
         |  WHERE doc_id % 97 = 0),
         |eg AS (SELECT DISTINCT doc_id, benchmark,
         |    unnest(list_distinct([array_to_string(t[p+1:p+5], ' ')
         |      for p in range(0, len(t) - 4)])) AS g
         |  FROM ev WHERE len(t) >= 5),
         |tg AS (SELECT DISTINCT doc_id,
         |    unnest(list_distinct([array_to_string(t[p+1:p+5], ' ')
         |      for p in range(0, len(t) - 4)])) AS g
         |  FROM tr WHERE len(t) >= 5),
         |pairs AS (SELECT tg.doc_id AS train_id, eg.doc_id AS eval_id,
         |    eg.benchmark, count(*) AS n_shared
         |  FROM tg JOIN eg USING (g) GROUP BY 1, 2, 3),
         |tot AS (SELECT benchmark, CAST(count(*) AS BIGINT)
         |    AS n_eval_docs FROM ev GROUP BY 1),
         |h AS (SELECT benchmark,
         |    CAST(count(DISTINCT eval_id) AS BIGINT) AS n_eval_hit,
         |    CAST(count(DISTINCT train_id) AS BIGINT) AS n_train_hit,
         |    CAST(count(*) AS BIGINT) AS n_pairs
         |  FROM pairs GROUP BY 1)
         |SELECT tot.benchmark, n_eval_docs,
         |  coalesce(n_eval_hit, 0) AS n_eval_hit,
         |  coalesce(n_train_hit, 0) AS n_train_hit,
         |  coalesce(n_pairs, 0) AS n_pairs,
         |  coalesce(n_eval_hit, 0) * 1000 // n_eval_docs
         |    AS eval_hit_milli
         |FROM tot LEFT JOIN h USING (benchmark)
         |ORDER BY benchmark""".stripMargin) { (s, d) =>
      val docs = t(s, d, "documents")
      TextAnalysis.contaminationReport(
          docs.filter(col("doc_id") % 97 =!= 0),
          docs.filter(col("doc_id") % 97 === 0)
            .withColumn("benchmark",
              when(col("doc_id") % 2 === 0, lit("benchA"))
                .otherwise(lit("benchB"))),
          "doc_id", "text", "benchmark", 5)
        .select("benchmark", "n_eval_docs", "n_eval_hit",
          "n_train_hit", "n_pairs", "eval_hit_milli")
        .orderBy("benchmark")
    },

    // DECONTAM: span-level removal — excise eval-overlapping 5-gram
    // coverage from each training doc instead of dropping the doc
    // (q_t_decontam's split: doc_id % 97 = 0 is the eval side).
    Q("q_t_decontam_spans",
      s"""WITH tok AS (SELECT doc_id, $toksD AS t FROM documents),
         |tr AS (SELECT doc_id, t FROM tok WHERE doc_id % 97 != 0),
         |ev AS (SELECT doc_id, t FROM tok WHERE doc_id % 97 = 0),
         |eg AS (SELECT DISTINCT unnest(${sqlShingles("t", 5)}) AS g
         |  FROM ev),
         |sh AS (SELECT doc_id, p, array_to_string(t[p+1:p+5], ' ') AS g
         |  FROM (SELECT doc_id, t, unnest(range(0, len(t) - 4)) AS p
         |        FROM tr WHERE len(t) >= 5)),
         |m AS (SELECT doc_id, p FROM sh WHERE g IN (SELECT g FROM eg)),
         |cov AS (SELECT doc_id, list_distinct(flatten(
         |    list(generate_series(p, p + 4)))) AS cv FROM m GROUP BY 1)
         |SELECT tr.doc_id, CAST(len(t) AS BIGINT) AS n_toks,
         |  CAST(coalesce(len(cv), 0) AS BIGINT) AS n_removed,
         |  CASE WHEN len(t) = 0 THEN '' ELSE
         |    array_to_string(list_transform(
         |      list_filter(range(1, len(t) + 1), i ->
         |        NOT list_contains(coalesce(cv, CAST([] AS BIGINT[])),
         |          i - 1)),
         |      i -> t[i]), ' ') END AS clean_text
         |FROM tr LEFT JOIN cov USING (doc_id)
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = t(s, d, "documents")
      TextAnalysis.decontaminateSpans(
          docs.filter(col("doc_id") % 97 =!= 0),
          docs.filter(col("doc_id") % 97 === 0),
          "doc_id", "text", 5)
        .orderBy("doc_id")
    })

  /** Generated DuckDB CTE chain replaying [[TextAnalysis.bpeMerges]]
    * round by round: wN = vocab strings after N fusions, pN = round
    * N's weighted pair counts, bN = round N's argmax pair. */
  private def bpeCtes(k: Int): String = {
    val sb = new StringBuilder
    sb.append(
      s"""WITH w0 AS (SELECT ' ' || array_to_string(
         |    list_transform(range(1, length(w) + 1), i -> w[i:i]), '  ')
         |    || ' ' AS s, f
         |  FROM (SELECT tok AS w, count(*) AS f
         |        FROM (SELECT unnest($toksD) AS tok FROM documents)
         |        GROUP BY 1))""".stripMargin)
    for (i <- 1 to k) {
      sb.append(
        s""",
           |p$i AS (SELECT ss[j] AS lhs, ss[j+1] AS rhs, sum(f) AS cnt
           |  FROM (SELECT ss, f,
           |          unnest(generate_series(1, len(ss) - 1)) AS j
           |        FROM (SELECT string_split(trim(s), '  ') AS ss, f
           |              FROM w${i - 1}))
           |  GROUP BY 1, 2),
           |b$i AS (SELECT lhs, rhs, cnt FROM p$i
           |  ORDER BY cnt DESC, lhs, rhs LIMIT 1)""".stripMargin)
      if (i < k) sb.append(
        s""",
           |w$i AS (SELECT replace(s, ' ' || b.lhs || '  ' || b.rhs || ' ',
           |    ' ' || b.lhs || b.rhs || ' ') AS s, f
           |  FROM w${i - 1}, b$i b)""".stripMargin)
    }
    sb.toString
  }

  private def bpeOracle(k: Int): String =
    bpeCtes(k) + "\n" + (1 to k).map(i =>
      s"SELECT CAST($i AS BIGINT) AS merge_rank, lhs, rhs, " +
        s"CAST(cnt AS BIGINT) AS pair_count FROM b$i")
      .mkString("", "\nUNION ALL\n", "\nORDER BY merge_rank")

  /** Train-then-encode oracle for [[TextAnalysis.bpeEncode]]: the
    * same k training CTEs, then every document token is expanded to
    * its spaced character form and the k learned merges are replayed
    * in rank order (nested literal `replace`s — identical fusion to
    * the trainer's), symbols rejoined with single spaces. */
  private def bpeEncodeOracle(k: Int): String = {
    val spaced = "' ' || array_to_string(list_transform(" +
      "range(1, length(w) + 1), i -> w[i:i]), '  ') || ' '"
    val folded = (1 to k).foldLeft(spaced) { (acc, i) =>
      s"replace($acc, ' ' || m$i.lhs || '  ' || m$i.rhs || ' ', " +
        s"' ' || m$i.lhs || m$i.rhs || ' ')"
    }
    val froms = (1 to k).map(i => s", b$i m$i").mkString
    bpeCtes(k) +
      s""",
         |tok AS (SELECT doc_id, $toksD AS toks FROM documents)
         |SELECT doc_id,
         |  CAST(CASE WHEN len(toks) = 0 THEN 0
         |    ELSE len(string_split(enc, ' ')) END AS BIGINT) AS n_toks,
         |  enc AS bpe_text
         |FROM (SELECT t.doc_id, t.toks,
         |    array_to_string(list_transform(t.toks, w ->
         |      array_to_string(string_split(trim($folded), '  '), ' ')),
         |      ' ') AS enc
         |  FROM tok t$froms)
         |ORDER BY doc_id""".stripMargin
  }

  /** [[bpeEncodeOracle]]'s train+encode CTEs rolled up to the
    * per-language fertility/premium rate law of
    * [[TextAnalysis.tokenizerFertility]]. */
  private def bpeFertilityOracle(k: Int): String = {
    val spaced = "' ' || array_to_string(list_transform(" +
      "range(1, length(w) + 1), i -> w[i:i]), '  ') || ' '"
    val folded = (1 to k).foldLeft(spaced) { (acc, i) =>
      s"replace($acc, ' ' || m$i.lhs || '  ' || m$i.rhs || ' ', " +
        s"' ' || m$i.lhs || m$i.rhs || ' ')"
    }
    val froms = (1 to k).map(i => s", b$i m$i").mkString
    bpeCtes(k) +
      s""",
         |tok AS (SELECT doc_id, $toksD AS toks FROM documents),
         |enc AS (SELECT doc_id,
         |    CAST(CASE WHEN len(toks) = 0 THEN 0
         |      ELSE len(string_split(e, ' ')) END AS BIGINT) AS n_toks
         |  FROM (SELECT t.doc_id, t.toks,
         |      array_to_string(list_transform(t.toks, w ->
         |        array_to_string(string_split(trim($folded), '  '),
         |          ' ')), ' ') AS e
         |    FROM tok t$froms)),
         |j AS (SELECT d.lang, e.n_toks, d.n_chars FROM enc e
         |      JOIN documents d USING (doc_id)),
         |g AS (SELECT lang, CAST(sum(n_toks) AS BIGINT) AS n_toks,
         |      CAST(sum(n_chars) AS BIGINT) AS n_chars
         |  FROM j GROUP BY 1),
         |tt AS (SELECT CAST(sum(n_toks) AS BIGINT) AS tt,
         |      CAST(sum(n_chars) AS BIGINT) AS tc FROM g)
         |SELECT lang, n_toks, n_chars,
         |  (n_toks * 1000) // n_chars AS fertility_milli,
         |  ((n_toks * 1000000) // n_chars) // ((tt * 1000) // tc)
         |    AS premium_milli
         |FROM g, tt ORDER BY lang""".stripMargin
  }

  /** Generated DuckDB replay of the unigram-LM Viterbi DP
    * ([[TextAnalysis.unigramLmVocab]]'s E-step / encode kernel): a
    * recursive CTE advancing one character position per iteration,
    * carrying the last `p` dp slots (cost, segmentation) — the ≤ p
    * candidate pieces ending at the new position are looked up with
    * LEFT JOINs and the (cost, seg) struct MIN picks the winner,
    * exactly the engine's array_min tie-break. Emits
    * `name(w, f, seg)`. */
  private def uniDpCte(name: String, words: String, scores: String,
      p: Int): String = {
    val stateCols = (1 to p).map(k => s"c$k, s$k").mkString(", ")
    val baseNulls = (2 to p)
      .map(_ => "CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR)")
      .mkString(", ")
    // the recursion variable must be UNIQUE per DP: DuckDB resolves
    // two same-named nested WITH RECURSIVE CTEs in one WITH chain to
    // the FIRST definition (observed on 1.x — udp2's `r` silently
    // read udp's), so each DP recurses over its own `${name}_r`
    val rv = s"${name}_r"
    val joins = (1 to p).map { k =>
      s"LEFT JOIN ${name}_c v$k ON $rv.j >= ${k - 1} AND " +
        s"v$k.piece = $rv.w[$rv.j + ${2 - k} : $rv.j + 1]"
    }.mkString("\n      ")
    val cands = (1 to p).map { k =>
      s"{'c': $rv.c$k + v$k.c, 's': $rv.s$k || ' ' || v$k.piece}"
    }.mkString(",\n          ")
    val shift = (1 until p).map(k => s"c$k, s$k").mkString(", ")
    val carry = (1 to p).map(k => s"$rv.c$k, $rv.s$k").mkString(", ")
    s""",
       |${name}_t AS (SELECT CAST(sum(score) AS BIGINT) AS tot
       |  FROM $scores),
       |${name}_c AS (SELECT piece,
       |    -CAST(FLOOR(LN(CAST(score AS DOUBLE) / CAST(tot AS DOUBLE))
       |      * 1000000) AS BIGINT) AS c
       |  FROM $scores, ${name}_t),
       |$name AS (
       |  WITH RECURSIVE $rv(w, f, j, $stateCols) AS (
       |    SELECT w, f, 0, CAST(0 AS BIGINT), '', $baseNulls
       |    FROM $words
       |    UNION ALL
       |    SELECT w, f, j + 1, cand[1].c, cand[1].s, $shift
       |    FROM (
       |      SELECT $rv.w, $rv.f, $rv.j, $carry,
       |        list_sort(list_filter([
       |          $cands
       |        ], x -> x.c IS NOT NULL)) AS cand
       |      FROM $rv
       |      $joins
       |      WHERE $rv.j < length($rv.w)))
       |  SELECT w, f, ltrim(s1) AS seg FROM $rv
       |  WHERE j = length(w))""".stripMargin
  }

  /** Unigram-LM training CTE chain replaying
    * [[TextAnalysis.unigramLmVocab]]: distinct words → substring
    * seed counts → Viterbi E-step under the seed model → usage
    * M-step → top-V prune + single-char coverage → `ufinal(piece,
    * score)`. */
  private def uniCtes(p: Int, v: Int): String =
    s"""WITH uw AS (SELECT tok AS w, count(*) AS f
       |  FROM (SELECT unnest($toksD) AS tok FROM documents)
       |  GROUP BY 1),
       |us AS (SELECT piece, CAST(sum(f) AS BIGINT) AS score
       |  FROM (SELECT f, w[i : i + k] AS piece
       |        FROM (SELECT w, f, unnest(range(1, length(w) + 1)) AS i
       |              FROM uw), range(0, $p) t2(k)
       |        WHERE i + k <= length(w))
       |  GROUP BY 1)""".stripMargin +
      uniDpCte("udp", "uw", "us", p) +
      s""",
         |uu AS (SELECT piece, CAST(sum(f) AS BIGINT) AS score
         |  FROM (SELECT f, unnest(string_split(seg, ' ')) AS piece
         |        FROM udp)
         |  GROUP BY 1),
         |utop AS (SELECT piece, score FROM uu
         |  ORDER BY score DESC, piece LIMIT $v),
         |uch AS (SELECT DISTINCT w[i:i] AS piece
         |  FROM (SELECT w, unnest(range(1, length(w) + 1)) AS i
         |        FROM uw)),
         |ufinal AS (SELECT piece, score FROM utop
         |  UNION ALL
         |  SELECT piece, CAST(1 AS BIGINT) AS score FROM uch
         |  WHERE piece NOT IN (SELECT piece FROM utop))""".stripMargin

  /** Generated DuckDB replay of WordPiece greedy MaxMatch
    * ([[TextAnalysis.wordPieceEncode]]): a recursive CTE marching a
    * position pointer, LEFT JOINs probe the ≤ p candidate pieces and
    * a CASE picks the LONGEST hit — no costs, no sort. Unique
    * recursion variable per instance (the dup-name lesson). */
  private def wpGreedyCte(name: String, words: String, vocab: String,
      p: Int): String = {
    val rv = s"${name}_r"
    val joins = (1 to p).map { k =>
      s"LEFT JOIN $vocab v$k ON $rv.pos + $k <= length($rv.w) AND " +
        s"v$k.piece = $rv.w[$rv.pos + 1 : $rv.pos + $k]"
    }.mkString("\n      ")
    val kChoice = (p to 2 by -1)
      .map(k => s"WHEN v$k.piece IS NOT NULL THEN $k").mkString(" ")
    val pcChoice = (p to 1 by -1).map(k => s"v$k.piece").mkString(", ")
    s""",
       |$name AS (
       |  WITH RECURSIVE $rv(w, f, pos, s) AS (
       |    SELECT w, f, 0, '' FROM $words
       |    UNION ALL
       |    SELECT $rv.w, $rv.f,
       |      $rv.pos + CASE $kChoice ELSE 1 END,
       |      $rv.s || ' ' || coalesce($pcChoice)
       |    FROM $rv
       |      $joins
       |    WHERE $rv.pos < length($rv.w))
       |  SELECT w, f, ltrim(s) AS seg FROM $rv
       |  WHERE pos >= length(w))""".stripMargin
  }

  /** Greedy-encode CTEs shared by the WordPiece round-trip and
    * fertility oracles: MaxMatch per distinct word + per-document
    * positional reassembly. */
  private def wpEncodeCtes(p: Int, v: Int): String =
    uniCtes(p, v) + wpGreedyCte("wdp", "uw", "ufinal", p) +
      s""",
         |we AS (SELECT doc_id, $toksD AS toks FROM documents),
         |wtp AS (SELECT doc_id, p, toks[p] AS w
         |  FROM (SELECT doc_id, toks,
         |          unnest(range(1, len(toks) + 1)) AS p FROM we)),
         |wenc AS (SELECT wtp.doc_id, wtp.p, d.seg,
         |    CAST(len(string_split(d.seg, ' ')) AS BIGINT) AS np
         |  FROM wtp JOIN wdp d ON d.w = wtp.w),
         |wper AS (SELECT doc_id, CAST(sum(np) AS BIGINT) AS n_toks,
         |    string_agg(seg, ' ' ORDER BY p) AS wp_text
         |  FROM wenc GROUP BY 1)""".stripMargin

  private def wpEncodeOracle(p: Int, v: Int): String =
    wpEncodeCtes(p, v) +
      """
        |SELECT d.doc_id,
        |  CAST(coalesce(u.n_toks, 0) AS BIGINT) AS n_toks,
        |  coalesce(u.wp_text, '') AS wp_text
        |FROM documents d LEFT JOIN wper u USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin

  private def wpFertilityOracle(p: Int, v: Int): String =
    wpEncodeCtes(p, v) +
      """,
        |wj AS (SELECT d.lang,
        |    CAST(coalesce(u.n_toks, 0) AS BIGINT) AS n_toks, d.n_chars
        |  FROM documents d LEFT JOIN wper u USING (doc_id)),
        |wg AS (SELECT lang, CAST(sum(n_toks) AS BIGINT) AS n_toks,
        |    CAST(sum(n_chars) AS BIGINT) AS n_chars FROM wj GROUP BY 1),
        |wt AS (SELECT CAST(sum(n_toks) AS BIGINT) AS tt,
        |    CAST(sum(n_chars) AS BIGINT) AS tc FROM wg)
        |SELECT lang, n_toks, n_chars,
        |  (n_toks * 1000) // n_chars AS fertility_milli,
        |  ((n_toks * 1000000) // n_chars) // ((tt * 1000) // tc)
        |    AS premium_milli
        |FROM wg, wt ORDER BY lang""".stripMargin

  private def uniVocabOracle(p: Int, v: Int): String =
    uniCtes(p, v) +
      "\nSELECT piece, CAST(score AS BIGINT) AS score FROM ufinal " +
      "ORDER BY score DESC, piece"

  /** Train + encode CTEs: a SECOND Viterbi DP under the pruned final
    * model, then per-document positional reassembly. */
  private def uniEncodeCtes(p: Int, v: Int): String =
    uniCtes(p, v) + uniDpCte("udp2", "uw", "ufinal", p) +
      s""",
         |ue AS (SELECT doc_id, $toksD AS toks FROM documents),
         |utp AS (SELECT doc_id, p, toks[p] AS w
         |  FROM (SELECT doc_id, toks,
         |          unnest(range(1, len(toks) + 1)) AS p FROM ue)),
         |uenc AS (SELECT utp.doc_id, utp.p, d.seg,
         |    CAST(len(string_split(d.seg, ' ')) AS BIGINT) AS np
         |  FROM utp JOIN udp2 d ON d.w = utp.w),
         |uper AS (SELECT doc_id, CAST(sum(np) AS BIGINT) AS n_toks,
         |    string_agg(seg, ' ' ORDER BY p) AS uni_text
         |  FROM uenc GROUP BY 1)""".stripMargin

  private def uniEncodeOracle(p: Int, v: Int): String =
    uniEncodeCtes(p, v) +
      """
        |SELECT d.doc_id,
        |  CAST(coalesce(u.n_toks, 0) AS BIGINT) AS n_toks,
        |  coalesce(u.uni_text, '') AS uni_text
        |FROM documents d LEFT JOIN uper u USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin

  private def uniFertilityOracle(p: Int, v: Int): String =
    uniEncodeCtes(p, v) +
      """,
        |uj AS (SELECT d.lang,
        |    CAST(coalesce(u.n_toks, 0) AS BIGINT) AS n_toks, d.n_chars
        |  FROM documents d LEFT JOIN uper u USING (doc_id)),
        |g AS (SELECT lang, CAST(sum(n_toks) AS BIGINT) AS n_toks,
        |    CAST(sum(n_chars) AS BIGINT) AS n_chars FROM uj GROUP BY 1),
        |tt AS (SELECT CAST(sum(n_toks) AS BIGINT) AS tt,
        |    CAST(sum(n_chars) AS BIGINT) AS tc FROM g)
        |SELECT lang, n_toks, n_chars,
        |  (n_toks * 1000) // n_chars AS fertility_milli,
        |  ((n_toks * 1000000) // n_chars) // ((tt * 1000) // tc)
        |    AS premium_milli
        |FROM g, tt ORDER BY lang""".stripMargin
}
