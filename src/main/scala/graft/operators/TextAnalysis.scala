package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions._

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting, fingerprinting. All pure column
  * expressions (whole-stage codegen; no UDFs), deterministic, and
  * engine-reproducible for oracle testing.
  *
  * Scale posture: `analyze` materializes the normalized text, the
  * token array, and each language score ONCE as intermediate columns
  * and derives everything else from them — the naive formulation
  * (every metric calling tokens() on the raw text) inlines the
  * 2-regex-pass normalization ~25× per row after optimizer project
  * collapsing, a pure CPU multiplier at 100 TB. The aliased
  * intermediates are referenced more than once, which blocks
  * CollapseProject from re-inlining them.
  */
object TextAnalysis {

  /** Small function-word profiles per language — the n-gram/stopword
    * heuristic core of a classic language identifier. Public-knowledge
    * word lists. */
  val profiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "nicht"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es"),
    "fr" -> Seq("le", "la", "de", "et", "un", "est", "que"))

  // ---- token-column-based primitives (the cheap path) ----

  /** Score of one language over a pre-computed token array = fraction
    * of tokens in its profile (exact int counts, one double division). */
  def langScoreOfTokens(toks: Column, lang: String): Column = {
    val hits = size(filter(toks, x =>
      profiles(lang).map(w => x === w).reduce(_ || _)))
    when(size(toks) === 0, 0.0)
      .otherwise(hits.cast("double") / size(toks).cast("double"))
  }

  /** Argmax language from per-language score columns, deterministic
    * tie-break (alphabetically-first wins); "und" when all zero. */
  def langIdOfScores(scores: Map[String, Column]): Column = {
    val langs = scores.keys.toSeq.sorted
    val best = langs.init.zipWithIndex.foldRight(
        lit(langs.last): Column) { case ((l, i), elseCol) =>
      val laterLangs = langs.drop(i + 1)
      when(laterLangs.map(o => scores(l) >= scores(o)).reduce(_ && _),
        lit(l)).otherwise(elseCol)
    }
    when(langs.map(scores(_) === 0.0).reduce(_ && _), lit("und"))
      .otherwise(best)
  }

  /** Mean token length over a pre-computed token array. */
  def meanTokenLenOfTokens(toks: Column): Column =
    when(size(toks) === 0, 0.0).otherwise(
      aggregate(toks, lit(0L), (acc, x) => acc + length(x)).cast("double") /
        size(toks).cast("double"))

  /** Polynomial rolling hash over a pre-computed token array. */
  def rollingFingerprintOfTokens(toks: Column): Column =
    aggregate(toks, lit(0L),
      (acc, t) => (acc * 31L + hash31(t)) % HashPrime31)

  /** Composite quality heuristic in [0,1] from already-computed
    * metrics: long enough, low punctuation, plausible mean word
    * length. Fixed double expression tree (deterministic). */
  def qualityOf(nTokens: Column, punctRatio: Column,
      meanTokenLen: Column): Column = {
    val lenScore = least(nTokens.cast("double") / 64.0, lit(1.0))
    val punctScore = greatest(lit(0.0), lit(1.0) - punctRatio * 4.0)
    val wordScore =
      when(meanTokenLen >= 2.5 && meanTokenLen <= 10.0, 1.0).otherwise(0.5)
    lenScore * 0.4 + punctScore * 0.3 + wordScore * 0.3
  }

  // ---- raw-text convenience wrappers (standalone use) ----

  def langScore(textCol: Column, lang: String): Column =
    langScoreOfTokens(tokens(textCol), lang)

  def langId(textCol: Column): Column = {
    val toks = tokens(textCol)
    langIdOfScores(profiles.keys.map(l =>
      l -> langScoreOfTokens(toks, l)).toMap)
  }

  /** Whitespace token count of the normalized text. */
  def wsTokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish regex token count: words / numbers / single punctuation,
    * the common pre-tokenizer shape. */
  def regexTokenCount(c: Column): Column =
    size(coalesce(
      regexp_extract_all(c, lit("""[\p{L}]+|[0-9]+|[^\p{L}0-9\s]"""),
        lit(0)),
      array()))

  /** Punctuation character ratio (exact counts, one double division). */
  def punctRatio(c: Column): Column = {
    val total = length(coalesce(c, lit("")))
    val punct = total - length(regexp_replace(coalesce(c, lit("")),
      """[\p{Punct}]""", ""))
    when(total === 0, 0.0)
      .otherwise(punct.cast("double") / total.cast("double"))
  }

  /** Stopword ratio against the english profile. */
  def stopwordRatio(c: Column): Column = langScore(c, "en")

  def meanTokenLen(c: Column): Column = meanTokenLenOfTokens(tokens(c))

  def qualityScore(c: Column): Column = {
    val toks = tokens(c)
    qualityOf(size(toks), punctRatio(c), meanTokenLenOfTokens(toks))
  }

  /** Content fingerprint: md5 of normalized text. */
  def contentFingerprint(c: Column): Column = md5(normalizeText(c))

  /** Order-sensitive rolling-hash fingerprint (polynomial fold). */
  def rollingHashFingerprint(c: Column): Column = rollingFingerprint(c)

  /** One-call enrichment: attach the standard analysis columns.
    * Normalization runs once per row, not once per metric. */
  def analyze(df: DataFrame, textCol: String): DataFrame = {
    val langs = profiles.keys.toSeq.sorted
    val withInterm = df
      .withColumn("__norm", normalizeText(col(textCol)))
      .withColumn("__toks",
        when(col("__norm") === "", array())
          .otherwise(split(col("__norm"), " ")))
    val withScores = langs.foldLeft(withInterm)((d, l) =>
      d.withColumn(s"__s_$l", langScoreOfTokens(col("__toks"), l)))
    withScores
      .withColumn("ws_tokens", size(col("__toks")).cast("long"))
      .withColumn("regex_tokens", regexTokenCount(col(textCol)).cast("long"))
      .withColumn("punct_ratio", punctRatio(col(textCol)))
      .withColumn("stopword_ratio", col("__s_en"))
      .withColumn("mean_token_len", meanTokenLenOfTokens(col("__toks")))
      .withColumn("quality",
        qualityOf(col("ws_tokens"), col("punct_ratio"),
          col("mean_token_len")))
      .withColumn("lang_id",
        langIdOfScores(langs.map(l => l -> col(s"__s_$l")).toMap))
      .withColumn("fingerprint", md5(col("__norm")))
      // native expression (graft.expressions.RollingFpArray): the HOF
      // fold interprets an md5 per token per row; this is one codegen'd
      // call doing the identical fold (bit-parity spec'd + oracle-
      // checked). Requires the GraftExtensions session config.
      .withColumn("rolling_fp",
        call_function("graft_rolling_fp", col("__toks")))
      .drop(("__norm" +: "__toks" +: langs.map(l => s"__s_$l")): _*)
  }

  /** Benchmark decontamination: word-n-gram collision detection
    * between a (huge) training corpus and a (small) evaluation set —
    * the standard pre-training hygiene pass. Returns
    * (train_id, eval_id, n_shared) for every train/eval pair sharing
    * at least one distinct n-gram shingle hash.
    *
    * Scale shape: the train side reduces to distinct (doc, shingle-
    * hash) pairs — a narrow map + one local distinct — and the join
    * side that gets shuffled-or-broadcast is the EVAL set, which is
    * benchmark-sized (thousands of docs), so Spark broadcasts it and
    * the 100 TB train side streams through a BroadcastHashJoin with
    * no shuffle. The explicit broadcast() hint pins that plan. */
  def ngramContamination(train: DataFrame, eval_ : DataFrame,
      idCol: String, textCol: String, n: Int = 5): DataFrame = {
    // graft_shingle_hashes returns the PER-DOC-DISTINCT shingle hash
    // set as one narrow native call, so exploding it yields distinct
    // (id, hv) rows directly — no interpreted HOF shingle pass and,
    // critically, no full-corpus distinct shuffle on the train side
    // (12.4 s -> 1.5 s at sf0.1; at 100 TB the difference is a
    // terabyte-scale exchange vs none)
    def shingleHashes(df: DataFrame, as: String): DataFrame =
      df.select(col(idCol).as(as),
        explode(call_function("graft_shingle_hashes",
          tokens(col(textCol)), lit(n))).as("hv"))
    shingleHashes(train, "train_id")
      .join(broadcast(shingleHashes(eval_, "eval_id")), Seq("hv"))
      .groupBy("train_id", "eval_id")
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Unigram negative-log-likelihood scoring — the perplexity-style
    * quality filter (CCNet-family pipelines) reduced to its
    * deterministic core: corpus unigram LM, per-token surprisal
    * -ln p(tok) QUANTIZED to integer millis before any aggregation,
    * so the per-doc sums are exact integer sums (order-free) and the
    * result is bit-identical at any parallelism. Returns
    * (doc_id, n_toks, nll_milli_sum, avg_nll_milli) for docs with at
    * least one token.
    *
    * Scale shape: one token explode feeds both the vocab aggregation
    * and the scoring join (shuffle on token; partial aggregation
    * collapses map-side). The vocab side is left unhinted: AQE
    * broadcasts it when it fits, shuffles when a web-scale vocab
    * doesn't. */
  def unigramNll(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val toks = df.select(col(idCol),
        explode(tokens(col(textCol))).as("tk"))
      .localCheckpoint(eager = false)
    val vocab = toks.groupBy("tk").agg(count(lit(1)).as("tf"))
    // total token instances: one scalar, computed from the same
    // materialized token table
    val total = toks.count()
    toks.join(vocab, Seq("tk"))
      .select(col(idCol),
        floor(log(lit(total.toDouble) / col("tf").cast("double"))
          * 1000.0d).cast("long").as("milli"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_toks"),
        sum("milli").as("nll_milli_sum"))
      .withColumn("avg_nll_milli", expr("nll_milli_sum div n_toks"))
  }

  /** TF-IDF top-`topK` terms per document: tf = in-doc term count,
    * df = number of documents containing the term, idf = ln(N/df).
    * The score is QUANTIZED to integer millis (floor(tf * idf * 1000))
    * before ranking, so row order never hinges on the last ulp of a
    * transcendental — the one place engine libm implementations may
    * legitimately differ — and the ranked output is exact-comparable.
    *
    * Scale shape: one explode of the token stream, tf via
    * groupBy(doc, term) with map-side combine, df via groupBy(term)
    * over the distinct (doc, term) pairs ALREADY AGGREGATED for tf
    * (no second pass over raw tokens), then a broadcast-sized term →
    * df join back and a per-doc window for top-k. N is a literal
    * computed once. */
  def tfIdfTopTerms(df: DataFrame, idCol: String, textCol: String,
      topK: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val n = df.select(col(idCol)).distinct().count()
    // materialize tf once: both the df-count aggregation and the join
    // probe side consume it, and without the checkpoint Catalyst
    // re-derives each from the raw token explode (double tokenization)
    val tf = df
      .select(col(idCol), explode(tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
      .localCheckpoint(eager = false)
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score_milli").desc, col("term").asc)
    tf.join(dfreq, Seq("term"))
      .withColumn("score_milli",
        floor(col("tf").cast("double")
          * log(lit(n.toDouble) / col("df").cast("double"))
          * 1000.0d).cast("long"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= topK).drop("rn")
      .select(col(idCol), col("term"), col("tf"), col("df"),
        col("score_milli"))
  }

  /** Distribution-shape quality signals per document — the two
    * classic boilerplate/spam tells a length/punctuation score
    * misses: token-distribution ENTROPY (low = the same few tokens
    * over and over) and bigram REPETITION mass (share of the text
    * consumed by its single most frequent bigram, the Gopher-style
    * repetition rule). Entropy folds -(c/n)ln(c/n) over the doc's
    * token counts in token order and quantizes the SUM to integer
    * millis; repetition is exact integer arithmetic throughout
    * (max_count*1000 div total). Docs with < 2 tokens report
    * rep_milli 0.
    *
    * Scale shape: ONE narrow per-row kernel call (the native
    * graft_quality expression) — both signals are pure per-document
    * computations, so no explode, no shuffle, no join ever touches
    * the corpus. Requires one text per id (true of any document
    * table); for multi-row ids aggregate the text first. Bit-parity
    * with the relational [[qualitySignalsHof]] shape is spec'd. */
  def qualitySignals(df: DataFrame, idCol: String,
      textCol: String): DataFrame =
    df.select(col(idCol),
        call_function("graft_quality",
          graft.functions.tokens(col(textCol))).as("__qp"))
      .select(col(idCol),
        coalesce(element_at(col("__qp"), 1), lit(0L)).as("entropy_milli"),
        coalesce(element_at(col("__qp"), 2), lit(0L)).as("rep_milli"))

  /** The relational formulation of [[qualitySignals]] (explode →
    * groupBy → ordered HOF fold → anchored join-back) — kept as the
    * executable spec the native kernel is parity-tested against. */
  def qualitySignalsHof(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val ent = df
      .select(col(idCol), explode(tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol))
      .agg(transform(
          sort_array(collect_list(struct(col("term"), col("c")))),
          s => s.getField("c")).as("cs"),
        sum("c").as("n"))
      .select(col(idCol),
        floor(aggregate(col("cs"), lit(0.0d), (acc, c) =>
          acc - (c.cast("double") / col("n").cast("double"))
            * log(c.cast("double") / col("n").cast("double")))
          * lit(1000.0d)).cast("long").as("entropy_milli"))
    val rep = df
      .select(col(idCol),
        explode(graft.functions.shingles(col(textCol), 2)).as("bg"))
      .groupBy(col(idCol), col("bg")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol))
      .agg(max("c").as("mx"), sum("c").as("tot"))
      .select(col(idCol), expr("mx * 1000 div tot").as("rep_milli"))
    // anchor on the full doc set: a tokenless doc has no exploded
    // rows on either side, but it still IS a document — it reports
    // (0, 0), not a silently missing row
    df.select(col(idCol)).distinct()
      .join(ent, Seq(idCol), "left")
      .join(rep, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("entropy_milli"), lit(0L)).as("entropy_milli"),
        coalesce(col("rep_milli"), lit(0L)).as("rep_milli"))
  }

  /** BM25 document ranking for a bag of query terms — the lexical
    * retriever half of hybrid search (see operators.Retrieval). Per
    * (doc, term): idf(term) * tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))
    * with the Robertson-walker idf ln((N-df+0.5)/(df+0.5)+1); each
    * term score is quantized to integer millis BEFORE the per-doc sum
    * and ranking (same ulp-proofing as [[tfIdfTopTerms]] — the
    * parenthesization here is mirrored verbatim by the oracle SQL so
    * the pre-floor doubles are bit-identical).
    *
    * Scale shape: the token stream is filtered to the query terms
    * BEFORE the tf aggregation (the explode output shrinks to
    * |terms|-matching tokens immediately); doc lengths aggregate in
    * the same pass discipline as tf; df and the two scalars (N,
    * avgdl) are literal/broadcast-sized. One explode, two groupBys,
    * one broadcast join, a top-k. */
  def bm25TopDocs(df: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], topK: Int): DataFrame = {
    val dl = df.select(col(idCol),
        size(tokens(col(textCol))).as("dl"))
      .localCheckpoint(eager = false)
    val n = dl.count()
    val totTokens = dl.agg(sum("dl")).head.getLong(0)
    val avgdl = totTokens.toDouble / n.toDouble
    val tf = df
      .select(col(idCol), explode(tokens(col(textCol))).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
      .localCheckpoint(eager = false)
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfreq), Seq("term"))
      .join(dl, Seq(idCol))
      .withColumn("score_milli", floor(
        log((lit(n.toDouble) - col("df") + lit(0.5d))
            / (col("df") + lit(0.5d)) + lit(1.0d))
          * (col("tf") * (lit(1.2d) + lit(1.0d)))
          / (col("tf") + lit(1.2d)
            * ((lit(1.0d) - lit(0.75d)) + lit(0.75d) * col("dl") / lit(avgdl)))
          * lit(1000.0d)).cast("long"))
      .groupBy(idCol)
      .agg(sum("score_milli").as("bm25_milli"),
        count(lit(1)).as("n_terms"))
      .orderBy(col("bm25_milli").desc, col(idCol))
      .limit(topK)
  }

  /** Model-based quality filter: a linear classifier over exact
    * integer features, scored in one narrow pass — the fastText-
    * classifier ROLE (score every document, keep above threshold)
    * with interpretable stub coefficients standing in for trained
    * weights (this container has no model artifacts; production
    * swaps the weight vector, the plumbing is identical). Features:
    * capped token count (length prior), English function-word hits
    * (fluency), distinct-token count (lexical diversity), normalized
    * char length (penalizes unbroken blobs). Integer weights on
    * integer features — the score and the keep label are
    * engine-exact, no probability calibration floats anywhere. */
  def linearQualityScore(df: DataFrame, textCol: String,
      threshold: Long = 0L): DataFrame = {
    val toks = graft.functions.tokens(col(textCol))
    val fTokens = least(size(toks), lit(256)).cast("long")
    val fStop = size(filter(toks,
      t => t.isInCollection(profiles("en")))).cast("long")
    val fDistinct = size(array_distinct(toks)).cast("long")
    val fChars = length(graft.functions.normalizeText(col(textCol)))
      .cast("long")
    df.withColumn("f_tokens", fTokens)
      .withColumn("f_stop", fStop)
      .withColumn("f_distinct", fDistinct)
      .withColumn("f_chars", fChars)
      .withColumn("score",
        col("f_tokens") * 4 + col("f_stop") * 30 +
          col("f_distinct") * 8 - col("f_chars") - lit(200L))
      .withColumn("keep", (col("score") >= threshold).cast("int"))
  }

  /** Duplicate word-n-gram mass per document — the Gopher-family
    * repetition filter (Rae et al. 2021 §A1.1: "duplicate n-gram
    * fraction"): the share of a document's n-gram occurrences that
    * belong to an n-gram appearing more than once. A templated or
    * loop-generated page scores high; natural prose scores near 0
    * once n ≥ 2. Emits (id, n_grams, dup_grams, dup_milli) for every
    * input document (short docs with < n tokens report 0/0/0);
    * dup_milli is exact integer arithmetic (dup·1000 div total) so
    * the threshold decision is engine-independent.
    *
    * Requires one text per id (true of any document table — same
    * contract as [[qualitySignals]]); a multi-row id would count
    * cross-row grams as same-document repetition.
    *
    * Scale shape: explode to (id, gram) → two partial-agg-able
    * key-shuffles — groupBy (id, gram) then groupBy id — and one
    * keyed left join back to the id spine to resurface gram-less
    * docs. Nothing is ever collected per document (contrast the
    * `collect_list` shapes this repo retired in round 5); a 100 TB
    * corpus shuffles only count-sized rows after the first partial
    * aggregation. */
  def duplicateNgramStats(df: DataFrame, idCol: String,
      textCol: String, n: Int = 5): DataFrame = {
    require(n >= 1, s"n-gram order must be >= 1: $n")
    val grams = df.select(col(idCol),
      explode(graft.functions.shingles(col(textCol), n)).as("__g"))
    val agg = grams
      .groupBy(col(idCol), col("__g")).agg(count(lit(1)).as("__c"))
      .groupBy(col(idCol))
      .agg(sum(col("__c")).as("n_grams"),
        sum(when(col("__c") > 1, col("__c")).otherwise(0L))
          .as("dup_grams"))
    df.select(col(idCol)).join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("dup_grams"), lit(0L)).as("dup_grams"))
      .withColumn("dup_milli",
        when(col("n_grams") === 0, lit(0L))
          .otherwise(expr("(dup_grams * 1000) div n_grams")))
  }
}
