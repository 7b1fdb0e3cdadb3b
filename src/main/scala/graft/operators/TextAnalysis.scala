package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions._

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting, fingerprinting. All pure column
  * expressions (whole-stage codegen; no UDFs), deterministic, and
  * engine-reproducible for oracle testing.
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

  /** Score of one language = fraction of tokens that are in its
    * profile (exact int counts, one double division). */
  def langScore(textCol: Column, lang: String): Column = {
    val t = tokens(textCol)
    val hits = size(filter(t, x =>
      profiles(lang).map(w => x === w).reduce(_ || _)))
    when(size(t) === 0, 0.0)
      .otherwise(hits.cast("double") / size(t).cast("double"))
  }

  /** Argmax language as a chained CASE with deterministic tie-break
    * (alphabetically-first language wins ties); "und" when every score
    * is 0. Chained-comparison form is trivially oracle-translatable. */
  def langId(textCol: Column): Column = {
    val langs = profiles.keys.toSeq.sorted
    val scores = langs.map(l => l -> langScore(textCol, l)).toMap
    val best = langs.init.zipWithIndex.foldRight(
        lit(langs.last): Column) { case ((l, i), elseCol) =>
      val laterLangs = langs.drop(i + 1)
      when(laterLangs.map(o => scores(l) >= scores(o)).reduce(_ && _),
        lit(l)).otherwise(elseCol)
    }
    when(langs.map(scores(_) === 0.0).reduce(_ && _), lit("und"))
      .otherwise(best)
  }

  /** Whitespace token count of the raw (un-normalized) text. */
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

  /** Mean token length (chars of normalized text / token count). */
  def meanTokenLen(c: Column): Column = {
    val t = tokens(c)
    when(size(t) === 0, 0.0).otherwise(
      aggregate(t, lit(0L), (acc, x) => acc + length(x)).cast("double") /
        size(t).cast("double"))
  }

  /** Composite quality heuristic in [0,1]: long enough, low
    * punctuation, plausible mean word length. Weights are fixed,
    * arithmetic is a fixed double expression tree (deterministic). */
  def qualityScore(c: Column): Column = {
    val nTok = wsTokenCount(c).cast("double")
    val lenScore = least(nTok / 64.0, lit(1.0))
    val punctScore = greatest(lit(0.0), lit(1.0) - punctRatio(c) * 4.0)
    val mwl = meanTokenLen(c)
    val wordScore = when(mwl >= 2.5 && mwl <= 10.0, 1.0).otherwise(0.5)
    lenScore * 0.4 + punctScore * 0.3 + wordScore * 0.3
  }

  /** Content fingerprint: md5 of normalized text (order-insensitive
    * to whitespace/punct only). */
  def contentFingerprint(c: Column): Column = md5(normalizeText(c))

  /** Order-sensitive rolling-hash fingerprint (polynomial fold). */
  def rollingHashFingerprint(c: Column): Column = rollingFingerprint(c)

  /** One-call enrichment: attach the standard analysis columns. */
  def analyze(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("ws_tokens", wsTokenCount(col(textCol)))
      .withColumn("regex_tokens", regexTokenCount(col(textCol)))
      .withColumn("punct_ratio", punctRatio(col(textCol)))
      .withColumn("stopword_ratio", stopwordRatio(col(textCol)))
      .withColumn("mean_token_len", meanTokenLen(col(textCol)))
      .withColumn("quality", qualityScore(col(textCol)))
      .withColumn("lang_id", langId(col(textCol)))
      .withColumn("fingerprint", contentFingerprint(col(textCol)))
      .withColumn("rolling_fp", rollingFingerprint(col(textCol)))
}
