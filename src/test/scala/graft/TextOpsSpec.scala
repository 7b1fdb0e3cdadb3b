package graft

import org.apache.spark.sql.functions._

import graft.operators.{Sharding, TextAnalysis}

/** Laws for the round-4 text-pipeline operators: decontamination,
  * unigram NLL scoring, sliding-window chunking. */
class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("ngramContamination finds a verbatim overlap and only that") {
    val train = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "completely unrelated text about spark physical plans"))
      .toDF("doc_id", "text")
    val eval_ = Seq(
      (100L, "the quick brown fox jumps over the lazy dog again"))
      .toDF("doc_id", "text")
    val hits = TextAnalysis.ngramContamination(train, eval_,
      "doc_id", "text", 5).as[(Long, Long, Long)].collect()
    // docs 1 and 100 share the 5-grams of their common 9-word prefix
    assert(hits.toSeq == Seq((1L, 100L, 5L)))
  }

  test("unigramNll scores rare-token docs above common-token docs") {
    val docs = Seq(
      (1L, "common common common common"),
      (2L, "common common common rare"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.unigramNll(docs, "doc_id", "text")
      .select("doc_id", "avg_nll_milli").as[(Long, Long)]
      .collect().toMap
    // corpus: common x7, rare x1, total 8. -ln(7/8) < -ln(1/8)
    assert(r(2L) > r(1L))
    val expected1 = math.floor(math.log(8.0 / 7.0) * 1000).toLong
    assert(r(1L) == expected1)
  }

  test("jsDivergence: zero on identical halves, ln2 on disjoint " +
      "vocab, symmetric, strictly between for partial overlap") {
    def js(df: org.apache.spark.sql.DataFrame,
        left: org.apache.spark.sql.Column): (Long, Long, Long) = {
      val r = TextAnalysis.jsDivergence(df, "text", left, 64)
        .select("js_a_micro", "js_b_micro", "js_micro")
        .as[(Long, Long, Long)].collect()(0)
      r
    }
    // identical distributions on both sides -> every ratio is exactly
    // 1, every ln exactly 0
    val same = Seq((1L, "alpha beta gamma", true),
      (2L, "alpha beta gamma", false)).toDF("id", "text", "l")
    assert(js(same, col("l")) == ((0L, 0L, 0L)))
    // disjoint vocabularies -> both KL halves are exactly ln 2
    // (ratio 2 in every populated bucket), js = 693147 micro
    val disj = Seq((1L, "alpha beta gamma delta", true),
      (2L, "epsilon zeta eta theta", false)).toDF("id", "text", "l")
    val (da, dbb, dm) = js(disj, col("l"))
    assert(da == 693147L && dbb == 693147L && dm == 693147L,
      s"disjoint JS must be ln2 micro: $da $dbb $dm")
    // partial overlap lands strictly between, and swapping sides
    // mirrors a/b while js_micro is unchanged (JS symmetry)
    val mix = Seq((1L, "alpha beta gamma", true),
      (2L, "alpha delta epsilon", false)).toDF("id", "text", "l")
    val (ma, mb, mm) = js(mix, col("l"))
    assert(mm > 0 && mm < 693147L, s"partial overlap: $mm")
    val (sa, sb, sm) = js(mix, !col("l"))
    assert((sa, sb) == ((mb, ma)) && sm == mm, "JS must be symmetric")
  }

  test("jsDivergenceByGroup: each group vs rest equals the pairwise " +
      "jsDivergence when only two groups exist") {
    val df = Seq(
      (1L, "alpha beta gamma delta", "g1"),
      (2L, "alpha beta epsilon zeta", "g2"),
      (3L, "epsilon zeta eta theta", "g2"))
      .toDF("id", "text", "src")
    val per = TextAnalysis.jsDivergenceByGroup(df, "text", "src", 64)
      .select("src", "n_tokens_a", "n_tokens_b", "js_a_micro",
        "js_b_micro", "js_micro")
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val pair = TextAnalysis.jsDivergence(df, "text",
        col("src") === "g1", 64)
      .select("n_tokens_a", "n_tokens_b", "js_a_micro", "js_b_micro",
        "js_micro")
      .as[(Long, Long, Long, Long, Long)].collect()(0)
    assert(per("g1")._2 == pair._1 && per("g1")._3 == pair._2 &&
      per("g1")._4 == pair._3 && per("g1")._5 == pair._4 &&
      per("g1")._6 == pair._5,
      s"g1-vs-rest must equal pairwise: ${per("g1")} vs $pair")
    // and the mirror: g2-vs-rest is the pairwise with sides swapped
    assert(per("g2")._4 == pair._4 && per("g2")._5 == pair._3 &&
      per("g2")._6 == pair._5, s"g2 mirror: ${per("g2")} vs $pair")
  }

  test("chunkByTokens covers every token exactly once per window") {
    val doc = Seq((1L, (1 to 100).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val chunks = Sharding.chunkByTokens(doc, "doc_id", "text", 64, 32)
      .select("chunk_id", "n_tokens").as[(Long, Long)]
      .collect().sortBy(_._1)
    // starts at 0, 32, 64, 96: lengths 64, 64, 36, 4
    assert(chunks.toSeq == Seq((0L, 64L), (1L, 64L), (2L, 36L), (3L, 4L)))
  }

  test("chunkByTokens drops empty docs and keeps short ones whole") {
    val docs = Seq((1L, ""), (2L, "only three tokens"))
      .toDF("doc_id", "text")
    val chunks = Sharding.chunkByTokens(docs, "doc_id", "text", 64, 32)
      .select("doc_id", "chunk_id", "n_tokens")
      .as[(Long, Long, Long)].collect()
    assert(chunks.toSeq == Seq((2L, 0L, 3L)))
  }

  test("tagByLexicon: token-boundary phrase matching, normalized " +
      "lexicon, exact hit counts") {
    val docs = Seq(
      (1L, "we use java script and javascript daily"),
      (2L, "JAVA script!"),
      (3L, "nothing relevant here")).toDF("doc_id", "text")
    val lex = Seq((" Java  Script ", "lang"), ("daily", "freq"))
      .toDF("phrase", "tag")
    val r = TextAnalysis.tagByLexicon(docs, "doc_id", "text", lex)
      .select("doc_id", "tag", "phrase", "n_hits")
      .as[(Long, String, String, Long)].collect().toSet
    // "javascript" (one token) must NOT match the two-token phrase;
    // doc 2's casing/punctuation normalizes to a match
    assert(r == Set(
      (1L, "lang", "java script", 1L),
      (1L, "freq", "daily", 1L),
      (2L, "lang", "java script", 1L)))
  }

  test("ngramDiversity: exact counts, and a collapsed slice shows " +
      "the diversity cliff") {
    val docs = Seq(
      ("tmpl", "alpha beta alpha beta"),   // templated: repeats
      ("tmpl", "alpha beta alpha beta"),
      ("free", "one two three four")       // all-distinct
    ).toDF("source", "text")
    val r = TextAnalysis.ngramDiversity(docs, "source", "text",
        Seq(1, 2))
      .select("source", "n", "total_ngrams", "distinct_ngrams",
        "diversity_milli")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(x => (x._1, x._2) -> ((x._3, x._4, x._5))).toMap
    // tmpl unigrams: 8 occurrences, 2 distinct -> 250 milli
    assert(r(("tmpl", 1L)) == ((8L, 2L, 250L)))
    // tmpl bigrams: 6 occurrences ("alpha beta" x4, "beta alpha" x2),
    // 2 distinct -> 333 milli
    assert(r(("tmpl", 2L)) == ((6L, 2L, 333L)))
    // free side: everything distinct -> 1000 milli at both orders
    assert(r(("free", 1L)) == ((4L, 4L, 1000L)))
    assert(r(("free", 2L)) == ((3L, 3L, 1000L)))
  }

  test("rendezvousShard: minimal movement when a shard is added, " +
      "none when one key's winner is unchanged") {
    val keys = (0L until 400L).toDF("k")
    val four = Seq("s0", "s1", "s2", "s3")
    val a = Sharding.rendezvousShard(keys, "k", four, "shard4")
    val b = Sharding.rendezvousShard(a, "k", four :+ "s4", "shard5")
      .select("k", "shard4", "shard5")
      .as[(Long, String, String)].collect()
    val moved = b.filter { case (_, s4, s5) => s4 != s5 }
    // the law: a key can only move TO the added shard
    assert(moved.forall(_._3 == "s4"))
    // and roughly 1/5 of keys move (binomial, 400 trials)
    assert(moved.length > 40 && moved.length < 140,
      s"moved ${moved.length} of 400")
    // removing a shard moves ONLY that shard's keys (reverse law)
    val withoutS2 = Sharding.rendezvousShard(
        a, "k", Seq("s0", "s1", "s3"), "shard3")
      .select("k", "shard4", "shard3")
      .as[(Long, String, String)].collect()
    assert(withoutS2.forall { case (_, s4, s3) =>
      s4 == s3 || s4 == "s2" })
  }

  test("rendezvousShard rejects empty and duplicate shard lists") {
    val keys = Seq(1L).toDF("k")
    intercept[IllegalArgumentException] {
      Sharding.rendezvousShard(keys, "k", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Sharding.rendezvousShard(keys, "k", Seq("a", "a"))
    }
  }

  test("oovRate: exact milli per doc, empty docs reported as 0/0/0") {
    val docs = Seq(
      (1L, "aa bb aa bb"),        // all in vocab
      (2L, "aa bb zz ww"),        // half OOV
      (3L, "zz zz zz"),           // all OOV
      (4L, "")                    // empty -> 0/0/0, still present
    ).toDF("doc_id", "text")
    val vocab = Seq("aa", "bb").toDF("token")
    val r = TextAnalysis.oovRate(docs, "doc_id", "text", vocab)
      .select("doc_id", "n_toks", "n_oov", "oov_milli")
      .as[(Long, Long, Long, Long)].collect()
      .map(x => x._1 -> ((x._2, x._3, x._4))).toMap
    assert(r(1L) == ((4L, 0L, 0L)))
    assert(r(2L) == ((4L, 2L, 500L)))
    assert(r(3L) == ((3L, 3L, 1000L)))
    assert(r(4L) == ((0L, 0L, 0L)), s"empty doc must be reported: $r")
  }

  test("calibrationBins: equal-population bins, ties share a bin, exact rates") {
    // scores 0..9, one row each, positive iff score >= 5; 5 bins of 2
    val rows = (0 until 10).map(i => (i.toLong, if (i >= 5) 1 else 0))
    val out = TextAnalysis.calibrationBins(
        rows.toDF("score", "y"), "score", "y", 5)
      .orderBy("bin")
      .select("bin", "n", "n_pos", "pos_milli")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((0L, 2L, 0L, 0L), (1L, 2L, 0L, 0L),
      (2L, 2L, 1L, 500L), (3L, 2L, 2L, 1000L), (4L, 2L, 2L, 1000L)),
      out.toString)
    // a fully tied score lands in ONE bin regardless of bins param
    val tied = TextAnalysis.calibrationBins(
        Seq((7L, 1), (7L, 0), (7L, 0), (7L, 1)).toDF("score", "y"),
        "score", "y", 10)
      .select("bin", "n", "n_pos", "pos_milli")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(tied == Seq((0L, 4L, 2L, 500L)), tied.toString)
  }

  test("aucExact: separation 10^6, ties midrank to 1/2, known interleave exact") {
    def auc(rows: Seq[(Long, Int)]): Option[Long] = {
      val df = rows.toDF("score", "y")
      val r = TextAnalysis.aucExact(df, "score", "y").collect().head
      if (r.isNullAt(2)) None else Some(r.getLong(2))
    }
    // perfect separation: every positive outranks every negative
    assert(auc(Seq((10L, 1), (11L, 1), (1L, 0), (2L, 0))) ==
      Some(1000000L))
    // anti-separation
    assert(auc(Seq((1L, 1), (2L, 1), (10L, 0), (11L, 0))) == Some(0L))
    // all scores tied: midranks give exactly 1/2
    assert(auc(Seq((5L, 1), (5L, 1), (5L, 0), (5L, 0))) == Some(500000L))
    // pos {2,4} vs neg {1,3}: U = 3 of 4 comparisons -> 750000
    assert(auc(Seq((2L, 1), (4L, 1), (1L, 0), (3L, 0))) == Some(750000L))
    // one class empty: null, not a crash or a fake number
    assert(auc(Seq((1L, 1), (2L, 1))).isEmpty)
  }

  test("quality signals: uniform text has high entropy, repeated text low") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"), // all distinct
      (2L, "spam spam spam spam spam spam"),       // one token
      (3L, "x"),                                   // no bigrams
      (4L, "")                                     // tokenless: (0, 0)
    ).toDF("doc_id", "text")
    val r = graft.operators.TextAnalysis
      .qualitySignals(docs, "doc_id", "text")
      .as[(Long, Long, Long)].collect()
      .map(x => x._1 -> ((x._2, x._3))).toMap
    // doc 1: entropy ln(6) = 1.7917... -> 1791 millis; every bigram
    // unique -> repetition 1000/5 = 200
    assert(r(1L) == ((1791L, 200L)))
    // doc 2: zero entropy; the single repeated bigram owns the text
    assert(r(2L) == ((0L, 1000L)))
    // doc 3: one token, entropy 0, no bigrams -> rep 0
    assert(r(3L) == ((0L, 0L)))
    // doc 4: no tokens at all — still reported, not silently dropped
    assert(r(4L) == ((0L, 0L)))
  }

  test("quality signals: native kernel is bit-identical to the HOF shape") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    assertSameRows(
      graft.operators.TextAnalysis.qualitySignals(docs, "doc_id", "text"),
      graft.operators.TextAnalysis.qualitySignalsHof(docs, "doc_id", "text"))
  }

  test("linearQualityScore: fluent text beats a blob, empty text is rejected") {
    val docs = Seq(
      (1L, "the cat sat on the mat and the dog lay in the sun by a tree"),
      (2L, "zzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzz"),
      (3L, "")).toDF("doc_id", "text")
    val scored = TextAnalysis.linearQualityScore(docs, "text")
      .select("doc_id", "score", "keep")
      .as[(Long, Long, Int)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(scored(1L)._1 > scored(2L)._1, scored)
    assert(scored(1L)._2 == 1, scored)   // stopword-rich English kept
    assert(scored(2L)._2 == 0, scored)   // unbroken blob rejected
    assert(scored(3L)._1 == -200L && scored(3L)._2 == 0, scored)
  }

  test("duplicateNgramStats: templated text scores high, prose scores 0, short docs report 0/0/0") {
    // doc 1: one 6-token template repeated 5x -> every 5-gram inside
    // a repeat is duplicated; doc 2: all-distinct tokens -> no dup
    // 5-gram; doc 3: 3 tokens (< n) -> no grams at all; doc 4: the
    // exact-total law on a fully periodic doc
    val template = "buy now click here limited offer"
    val docs = Seq(
      (1L, Seq.fill(5)(template).mkString(" ")),
      (2L, (1 to 40).map(i => s"w$i").mkString(" ")),
      (3L, "too short doc"),
      (4L, "a b c d e a b c d e a b c d e")).toDF("doc_id", "text")
    val out = TextAnalysis.duplicateNgramStats(docs, "doc_id", "text", 5)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(out.size == 4)
    val (n1, d1, m1) = out(1L)
    assert(n1 == 26 && d1 > 0 && m1 > 800,
      s"templated doc must be mostly duplicate mass: $out")
    assert(out(2L) == ((36L, 0L, 0L)), out)
    assert(out(3L) == ((0L, 0L, 0L)), out)
    // doc 4: 15 tokens -> 11 5-grams, all of them instances of the 5
    // distinct rotations of (a b c d e), each appearing >= 2 times
    assert(out(4L) == ((11L, 11L, 1000L)), out)
  }

  test("dropBoilerplateUnits: line mode drops the shared banner, keeps order") {
    val docs = Seq(
      (1L, "Accept cookies\ncontent one\nunique line A"),
      (2L, "Accept cookies\ncontent two"),
      (3L, "Accept cookies\ncontent three"),
      (4L, "Accept cookies"),
      (5L, "free text\nno banner here")).toDF("doc_id", "text")
    // banner df=4 of 5 docs: 4*1000 > 700*5 -> boilerplate; every
    // other line df=1 -> kept, reassembled in original order
    val out = TextAnalysis.dropBoilerplateUnits(
        docs, "doc_id", "text", "\n", 700L)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(out(1L) == ((3L, 2L, "content one unique line A")), out)
    assert(out(2L) == ((2L, 1L, "content two")), out)
    assert(out(3L) == ((2L, 1L, "content three")), out)
    // fully-boilerplate doc comes back empty, not missing
    assert(out(4L) == ((1L, 0L, "")), out)
    assert(out(5L) == ((2L, 2L, "free text no banner here")), out)
  }

  test("dsirWeights: all-target corpus weighs exactly 1000 milli") {
    // target == raw => per-bucket ratio is 1000*(tc+1)/(r+1) with
    // tc = r, so every doc's weight is exactly 1000; empty doc is 0
    val docs = Seq(
      (1L, "alpha beta gamma"), (2L, "delta delta"), (3L, ""))
      .toDF("doc_id", "text")
    val out = TextAnalysis.dsirWeights(docs, "doc_id", "text",
        target = lit(true), buckets = 64)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1L) == ((3L, 1000L)), out)
    assert(out(2L) == ((2L, 1000L)), out)
    assert(out(3L) == ((0L, 0L)), out)
  }

  test("dsirWeights: target-like docs outscore off-target docs") {
    val docs = Seq(
      (1L, "alpha alpha alpha", true),
      (2L, "beta beta beta", false),
      (3L, "alpha beta", false)).toDF("doc_id", "text", "is_t")
    val w = TextAnalysis.dsirWeights(docs, "doc_id", "text",
        target = col("is_t"), buckets = 1024)
      .select("doc_id", "w_milli").as[(Long, Long)].collect().toMap
    assert(w(1L) > w(3L) && w(3L) > w(2L), w)
  }

  test("gopherRepetitionSignals: line mode exact fractions") {
    val docs = Seq(
      // 4 lines, "same line" x3: dups=2 of 4 -> 500 milli; dup chars
      // = 2*9 of 3*9+7=34 -> 529 milli
      (1L, "same line\nsame line\nsame line\ncontent"),
      // no repetition at all
      (2L, "alpha beta\ngamma delta"),
      (3L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.gopherRepetitionSignals(
        docs, "doc_id", "text", splitRegex = "\n", n = 2)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    val (n1, dl1, dc1, _) = out(1L)
    assert(n1 == 4 && dl1 == 500 && dc1 == 2 * 9 * 1000 / 34, out)
    val (n2, dl2, dc2, _) = out(2L)
    assert(n2 == 2 && dl2 == 0 && dc2 == 0, out)
    assert(out(3L) == ((0L, 0L, 0L, 0L)), out)
    // heaviest 2-gram: "a b a b a b" -> "a b" x3 (and "b a" x2);
    // top covers 3*3=9 chars of the 11-char normalized text -> 818
    val rep = Seq((9L, "a b a b a b")).toDF("doc_id", "text")
    val top = TextAnalysis.gopherRepetitionSignals(
        rep, "doc_id", "text", "\n", 2)
      .select("top_ngram_char_milli").as[Long].collect()(0)
    assert(top == 9 * 1000 / 11, top)
  }

  test("dedupUnitsWithin: first occurrence kept, order preserved") {
    val docs = Seq(
      (1L, "b\na\nb\nc\na"),
      (2L, "x\ny"),
      (3L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.dedupUnitsWithin(
        docs, "doc_id", "text", splitRegex = "\n", joinWith = " ")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(out(1L) == ((5L, 3L, "b a c")), out)
    assert(out(2L) == ((2L, 2L, "x y")), out)
    assert(out(3L) == ((0L, 0L, "")), out)
  }

  test("bpeMerges: classic low/lower/newest corpus, deterministic ties") {
    // words: low x3, lower x2, newest x1. Round 1 ties lo=ow=5 and
    // the lexicographic tie-break picks (l,o); then (lo,w)=5; round 3
    // ties (e,r)=(low,e)=2 and picks (e,r); then (low,er)=2
    val docs = Seq(
      (1L, "low low low"), (2L, "lower lower newest"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bpeMerges(docs, "text", 4)
      .orderBy("merge_rank")
      .as[(Long, String, String, Long)].collect().toSeq
    assert(out == Seq(
      (1L, "l", "o", 5L), (2L, "lo", "w", 5L),
      (3L, "e", "r", 2L), (4L, "low", "er", 2L)), out)
  }

  test("bpeEncode: trained merges round-trip onto the corpus, empty doc is 0/''") {
    val docs = Seq(
      (1L, "low low low"), (2L, "lower lower newest"), (3L, ""))
      .toDF("doc_id", "text")
    // after the 4 merges above: low -> [low]; lower -> l o w e r ->
    // lo w e r -> low e r -> low er -> [lower]; newest has no (l,o)/
    // (lo,w)/(e,r)/(low,er) adjacency and stays six chars
    val m = TextAnalysis.bpeMerges(docs, "text", 4)
    val out = TextAnalysis.bpeEncode(docs, "doc_id", "text", m)
      .as[(Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1L) == ((3L, "low low low")), out)
    assert(out(2L) == ((8L, "lower lower n e w e s t")), out)
    assert(out(3L) == ((0L, "")), out)
  }

  test("unigramLmVocab: frequent substrings win the prune, single " +
      "chars always covered, EM usage re-scores the seed") {
    // words: abab x3, abc x2, dd x1 — the seed counts substring mass,
    // the Viterbi E-step segments each word greedily-optimally under
    // it, and usage keeps only pieces that actually segment words
    val docs = Seq(
      (1L, "abab abab abab"), (2L, "abc abc dd")).toDF("doc_id", "text")
    val vocab = TextAnalysis.unigramLmVocab(docs, "text",
        maxPieceLen = 3, vocabSize = 4)
      .as[(String, Long)].collect().toMap
    // 'ab' is the workhorse piece: abab -> ab+ab (2 uses x3 docs),
    // abc -> ab+c or a+bc (model decides deterministically)
    assert(vocab.contains("ab"), vocab.toString)
    // every single char of the corpus is encodable
    for (c <- Seq("a", "b", "c", "d"))
      assert(vocab.contains(c) ||
        vocab.keys.exists(p => p.length > 1 && p.contains(c)),
        s"char $c must be coverable: $vocab")
    assert(Seq("a", "b", "c", "d").forall(vocab.contains),
      s"single chars must be present for coverage: $vocab")
  }

  test("unigramEncode: pieces concatenate back to the words, empty " +
      "doc is 0/'', n_toks counts pieces") {
    val docs = Seq(
      (1L, "abab abab abab"), (2L, "abc abc dd"), (3L, ""))
      .toDF("doc_id", "text")
    val vocab = TextAnalysis.unigramLmVocab(docs, "text", 3, 4)
    val out = TextAnalysis.unigramEncode(docs, "doc_id", "text", vocab, 3)
      .as[(Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(3L) == ((0L, "")), out.toString)
    // round-trip law: stripping the piece separators rebuilds the text
    assert(out(1L)._2.replace(" ", "") == "abababababab", out.toString)
    assert(out(2L)._2.replace(" ", "") == "abcabcdd", out.toString)
    assert(out(1L)._1 == out(1L)._2.split(" ").length.toLong)
  }

  test("wordPieceEncode: greedy longest prefix — and it diverges " +
      "from the unigram Viterbi exactly on the classic MaxMatch trap") {
    val docs = Seq((1L, "abc abc"), (2L, "")).toDF("doc_id", "text")
    // vocab scores make 'a bc' the Viterbi optimum while greedy must
    // take the longer prefix 'ab' first and settle for 'ab c'
    val vocab = Seq(("a", 50L), ("b", 1L), ("c", 1L),
      ("ab", 10L), ("bc", 500L)).toDF("piece", "score")
    val wp = TextAnalysis.wordPieceEncode(docs, "doc_id", "text", vocab, 3)
      .as[(Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(wp(1L) == ((4L, "ab c ab c")), wp.toString)
    assert(wp(2L) == ((0L, "")), wp.toString)
    val uni = TextAnalysis.unigramEncode(docs, "doc_id", "text", vocab, 3)
      .as[(Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(uni(1L) == ((4L, "a bc a bc")),
      s"Viterbi must repair the greedy trap: $uni")
  }

  test("bpeEncode: native kernel is bit-identical to the HOF replace chain") {
    val docs = Seq(
      (1L, "low low lower lowest newest new"),
      (2L, "aaaa aaa aa a"),           // overlap stress: merge (a,a)
      (3L, ""), (4L, "zzz unseen tokens"))
      .toDF("doc_id", "text")
    val m = TextAnalysis.bpeMerges(docs, "text", 6)
    val native = TextAnalysis.bpeEncode(docs, "doc_id", "text", m)
      .orderBy("doc_id").as[(Long, Long, String)].collect().toSeq
    val hof = TextAnalysis.bpeEncodeHof(docs, "doc_id", "text", m)
      .orderBy("doc_id").as[(Long, Long, String)].collect().toSeq
    assert(native == hof, s"native=$native hof=$hof")
  }

  test("decontaminateSpans: only eval-overlapping coverage removed, clean docs intact") {
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "totally original words nothing shared here at all"),
      (3L, "")).toDF("doc_id", "text")
    val eval_ = Seq(
      (100L, "beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val out = TextAnalysis.decontaminateSpans(
        train, eval_, "doc_id", "text", 5)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    // doc 1 matches the eval 5-gram at pos 1 → tokens 1..5 removed
    assert(out(1L) == ((8L, 5L, "alpha eta theta")), out)
    assert(out(2L) == ((8L, 0L,
      "totally original words nothing shared here at all")), out)
    assert(out(3L) == ((0L, 0L, "")), out)
  }

  test("bigramNll: repeated bigrams are cheaper than unique ones, short docs 0/0/0") {
    val docs = Seq(
      (1L, "a b a b a b"),     // bigrams all from {a b, b a} — common
      (2L, "c d e f g h"),     // five distinct singleton bigrams
      (3L, "solo")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramNll(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(out(1L)._1 == 5L, out)
    assert(out(2L)._1 == 5L, out)
    assert(out(3L) == ((0L, 0L, 0L)), out)
    // doc 1's bigrams repeat (c12 = 3 or 2); doc 2's are singletons →
    // higher average surprisal
    assert(out(2L)._3 > out(1L)._3, out)
  }

  test("stupidBackoffNll: seen bigrams score conditionally, unseen back " +
      "off through the unigram, OOV hits the uniform floor") {
    // train LM: bigrams {a b:2, b a:1, b c:1}, ctx {a:2, b:2},
    // unigrams {a:2, b:2, c:1}, N=5
    val train = Seq((10L, "a b a b c")).toDF("doc_id", "text")
    val target = Seq(
      (11L, "a b x"),  // "a b" seen: ln(2/2)=0; "b x" OOV: ln(5000/400)
      (13L, "c a"),    // "c a" unseen, a seen: ln(5000/(400*2))
      (15L, "tiny")).toDF("doc_id", "text")
    val out = TextAnalysis
      .stupidBackoffNll(train, target, "doc_id", "text", 400L)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    val oov = math.floor(math.log(5000.0 / 400.0) * 1000).toLong  // 2525
    val bka = math.floor(math.log(5000.0 / 800.0) * 1000).toLong  // 1832
    assert(out(11L) == ((2L, 1L, oov, oov / 2)), out)
    assert(out(13L) == ((1L, 1L, bka, bka)), out)
    assert(out(15L) == ((0L, 0L, 0L, 0L)), out)
    // the novelty ordering the filter exists for: the all-unseen doc
    // averages stranger than the half-seen one
    assert(out(13L)._4 > out(11L)._4)
  }

  test("dedupUnitsAcross: globally-first copy survives, later docs and later positions lose") {
    val docs = Seq(
      (1L, "a\nb\na"),   // keeps a(pos0), b; in-doc later a drops
      (2L, "b\nc"),      // b lost to doc 1; keeps c
      (3L, "a\nb"),      // everything seen before: empty
      (4L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.dedupUnitsAcross(
        docs, "doc_id", "text", splitRegex = "\n", joinWith = " ")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(out(1L) == ((3L, 2L, "a b")), out)
    assert(out(2L) == ((2L, 1L, "c")), out)
    assert(out(3L) == ((2L, 0L, "")), out)
    assert(out(4L) == ((0L, 0L, "")), out)
  }

  test("langIdMulti: script languages, token languages, mixed text " +
      "and the und fallback") {
    import graft.operators.TextAnalysis
    val rows = Seq(
      1L -> "这是一个中文句子没有空格",           // zh: no spaces at all
      2L -> "это не английский текст а русский", // ru: cyrillic script
      3L -> "の日本語のテキストです",             // ja: kana + kanji
      4L -> "the quick brown fox is in the yard", // en: stopwords
      5L -> "el perro y el gato en la casa",      // es
      6L -> "这是中文 with a few latin words",    // mixed, zh char mass wins
      7L -> "zzz qqq xxx",                        // no signal at all
      8L -> "")                                   // empty
      .toDF("id", "txt")
    val out = rows.select($"id",
        TextAnalysis.langIdMulti($"txt").as("lang"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "zh", out)
    assert(out(2L) == "ru", out)
    assert(out(3L) == "ja", out)
    assert(out(4L) == "en", out)
    assert(out(5L) == "es", out)
    assert(out(6L) == "zh", out)
    assert(out(7L) == "und", out)
    assert(out(8L) == "und", out)
    // the pipeline (materialized-intermediates) form decides
    // identically to the inline Column form
    val out2 = TextAnalysis.withLangIdMulti(rows, "txt")
      .select($"id", $"lang").as[(Long, String)].collect().toMap
    assert(out2 == out, out2)
    // and analyze()'s one-pass lang_id_multi column agrees too
    val out3 = TextAnalysis.analyze(rows, "txt")
      .select($"id", $"lang_id_multi").as[(Long, String)]
      .collect().toMap
    assert(out3 == out, out3)
  }

  test("cjkAwareTokenCount: one token per ideograph, words stay " +
      "words, ordered alternation never merges scripts") {
    import graft.operators.TextAnalysis
    val rows = Seq(
      1L -> "hello world",     // 2 word tokens
      2L -> "中文处理",         // 4 — one per ideograph
      3L -> "ab中cd",          // ab, 中, cd — the mixed-run case
      4L -> "это тест 42",     // 2 cyrillic words + 1 number
      5L -> "a,b!",            // a , b ! = 4
      6L -> "のテキスト",        // 5 kana chars (3040-30ff sits in 2e80-9fff)
      7L -> "한국어",           // 3 hangul syllables
      8L -> "")                // 0
      .toDF("id", "txt")
    val out = rows.select($"id",
        TextAnalysis.cjkAwareTokenCount($"txt").as("n"))
      .as[(Long, Int)].collect().toMap
    assert(out == Map(1L -> 2, 2L -> 4, 3L -> 3, 4L -> 3, 5L -> 4,
      6L -> 5, 7L -> 3, 8L -> 0), out)
  }

  test("knNll: hand-computed conditional, unseen-continuation, and " +
      "unseen-context millis on the toy corpus") {
    // train "a b a c": c12 all 1; c1(a)=2, c1(b)=1; n1f(a)=2, n1f(b)=1;
    // n1b(a)=n1b(b)=n1b(c)=1; T=3. With D=0.75:
    //   P(b|a) = 250·3 + 750·2·1 over 1000·2·3 = 2250/6000
    //   P(z|a) = 0 + 750·2·1 over 6000 = 1500/6000 (unseen cont. → 1)
    //   P(a|z) = n1b(a)/T = 1/3 (unseen context)
    // (and Σ_{w∈{a,b,c}} P(w|a) = .375+.25+.375 = 1 — KN normalizes)
    val train = Seq((0L, "a b a c")).toDF("doc_id", "text")
    val target = Seq((1L, "a b"), (3L, "a z"), (5L, "z a"), (7L, ""))
      .toDF("doc_id", "text")
    val out = TextAnalysis.knNll(train, target, "doc_id", "text", 750L)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((1L, 0L, 980L)),   // floor(ln(6000/2250)·1000)
      out(1L).toString)
    assert(out(3L) == ((1L, 0L, 1386L)),  // floor(ln(4)·1000)
      out(3L).toString)
    assert(out(5L) == ((1L, 1L, 1098L)),  // floor(ln(3)·1000)
      out(5L).toString)
    assert(out(7L) == ((0L, 0L, 0L)))
  }

  test("featureHash: signed sums combine collisions exactly, indices " +
      "bounded, empty/null docs vanish, zero-sums dropped") {
    import graft.functions.{hash31, hash60b}
    val dim = 8
    val df = Seq((1L, "aa aa bb cc"), (2L, ""), (3L, null: String),
      (4L, "aa")).toDF("id", "text")
    val got = TextAnalysis.featureHash(df, "id", "text", dim)
      .as[(Long, Long, Long)].collect().toSet
    // expected from the SAME hash constants the engine defines,
    // evaluated once per distinct token — the law under test is the
    // signed combination across collisions, not the md5 kernel
    // (FunctionsSpec pins that)
    def idxSgn(tok: String): (Long, Long) = (
      eval(hash31(lit(s"fh:$tok")) % dim).asInstanceOf[Long],
      if (eval(hash60b(lit(tok)) % 2).asInstanceOf[Long] == 1L) 1L
      else -1L)
    def expected(id: Long, toks: Seq[String]): Set[(Long, Long, Long)] =
      toks.map(idxSgn).groupBy(_._1).view
        .mapValues(_.map(_._2).sum).toMap
        .collect { case (i, w) if w != 0 => (id, i, w) }.toSet
    val want = expected(1L, Seq("aa", "aa", "bb", "cc")) ++
      expected(4L, Seq("aa"))
    assert(got == want, s"got $got want $want")
    assert(got.forall { case (_, i, _) => i >= 0 && i < dim })
  }

  test("charEntropy: uniform pairs give ln 2, constant text gives " +
      "zero, empty text vanishes") {
    val docs = Seq(
      (1L, "aaaa"),      // one symbol -> H = 0 exactly
      (2L, "ab"),        // uniform over 2 -> ln 2
      (3L, "aabb"),      // same distribution at double length
      (4L, ""))          // no characters -> no distribution row
      .toDF("doc_id", "text")
    val got = TextAnalysis.charEntropy(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted
    val ln2 = 693147L // floor(ln(2) * 1e6)
    assert(got == Seq(
      (1L, 4L, 1L, 0L),
      (2L, 2L, 2L, ln2),
      (3L, 4L, 2L, 693147L)), got.toString)
  }
}
