package graft

import org.apache.spark.sql.functions._

import graft.operators.{Graph, Similarity, Sketches}
import graft.streaming.StreamOps

/** Sketch accuracy/determinism laws, fixed-point PageRank invariants,
  * and streaming-vs-batch parity for the StreamOps pair. */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def range(n: Int) = spark.range(n).toDF("v")

  test("hllTrailingDistinct: every day's windowed estimate bit-equals " +
      "the flat estimate over that day range (the merge law through " +
      "a window frame)") {
    // 10 days, shifting-but-overlapping user populations, a gap day
    val rows = for {
      day <- (0L to 9L) if day != 4L
      u <- (day * 30) until (day * 30 + 80)
    } yield (day, s"u$u")
    val df = rows.toDF("day_ord", "uid")
    val trailing = Sketches
      .hllTrailingDistinct(df, "day_ord", "uid", 64, 3)
      .select($"day_ord", $"estimate").as[(Long, Double)]
      .collect().toMap
    // grid days = days present in the data (day 4 absent by design)
    assert(trailing.keySet == Set(0L, 1L, 2L, 3L, 5L, 6L, 7L, 8L, 9L))
    for (d <- trailing.keySet) {
      val flat = Sketches.hllEstimate(
          df.filter($"day_ord" >= d - 2 && $"day_ord" <= d), "uid", 64)
        .select("estimate").as[Double].head()
      assert(trailing(d) == flat,
        s"day $d: windowed ${trailing(d)} != flat $flat")
    }
  }

  test("discretizeByQuantiles: buckets are value-monotone, bin-atomic, " +
      "and near-balanced on uniform data") {
    import org.apache.spark.sql.functions._
    val df = spark.range(0, 10000).select((col("id") % 1000).as("v"))
    val stats = Sketches.discretizeByQuantiles(df, "v", 0L, 10L, 100, 4)
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), min("v").as("lo"), max("v").as("hi"))
      .orderBy("bucket")
      .as[(Long, Long, Long, Long)].collect()
    assert(stats.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L))
    // monotone and bin-atomic: bucket boundaries sit on bin edges,
    // so consecutive buckets never share a bin
    for (Array((_, _, _, hi), (_, _, lo2, _)) <- stats.sliding(2)) {
      assert(hi / 10 < lo2 / 10, s"buckets overlap: hi=$hi lo=$lo2")
    }
    // equi-depth on uniform data: each bucket 2500 ± one bin's mass
    assert(stats.forall { case (_, n, _, _) =>
      math.abs(n - 2500L) <= 100L }, stats.toSeq)
    assert(stats.map(_._2).sum == 10000L)
  }

  test("hll estimate lands within the m=256 error envelope") {
    for (n <- Seq(1000, 5000, 20000)) {
      val est = Sketches.hllEstimate(range(n), "v", 256)
        .select("estimate").as[Double].head()
      // standard error ~ 1.04/sqrt(256) = 6.5%; allow 3 sigma
      assert(math.abs(est - n) / n < 0.20, s"n=$n est=$est")
    }
  }

  test("hll rejects a non-power-of-two register count") {
    intercept[IllegalArgumentException] {
      Sketches.hllEstimate(range(10), "v", 100)
    }
  }

  test("hll registers are independent of partitioning (order-free max)") {
    val a = Sketches.hllRegisters(range(5000), "v", 64)
    val b = Sketches.hllRegisters(range(5000).repartition(7), "v", 64)
    assertSameRows(a, b)
  }

  test("native hll aggregate: non-string input casts in the analyzer, not the executor") {
    // graft_hll_regs declares (string, int) input types — a LONG
    // child arrives through an analyzer-inserted implicit cast and
    // folds the same registers as the explicit string cast; it must
    // never reach update() as a raw Long (ClassCastException)
    val longs = spark.range(500).select(col("id").as("v"))
    val viaImplicit = longs
      .selectExpr("graft_hll_regs(v, 64) AS regs")
    val viaExplicit = longs
      .selectExpr("graft_hll_regs(CAST(v AS STRING), 64) AS regs")
    assertSameRows(viaImplicit, viaExplicit)
  }

  test("native hll aggregate: registers bit-identical to the declarative build") {
    for (m <- Seq(64, 256)) {
      val declarative = Sketches.hllRegisters(range(5000), "v", m)
      val native = Sketches.hllRegistersNative(range(5000), "v", m)
      assertSameRows(declarative, native)
      // partition-independent (merge = bytewise max is order-free)
      assertSameRows(native,
        Sketches.hllRegistersNative(range(5000).repartition(7), "v", m))
    }
    // and therefore the estimates agree exactly
    val e1 = Sketches.hllEstimate(range(20000), "v", 256)
      .select("estimate").as[Double].head()
    val e2 = Sketches.hllEstimateFrom(
      Sketches.hllRegistersNative(range(20000), "v", 256), 256)
      .select("estimate").as[Double].head()
    assert(e1 == e2, s"$e1 != $e2")
    // grouped: per-group estimates bit-equal to the declarative path
    val grouped = spark.range(30000)
      .select((col("id") % 3).as("g"), col("id").as("v"))
    assertSameRows(
      Sketches.hllEstimateByGroup(grouped, "g", "v", 64)
        .select("grp", "nonzero_buckets", "harmonic_sum", "estimate"),
      Sketches.hllEstimateByGroupNative(grouped, "g", "v", 64))
  }

  test("cmsJoinSizeEstimate: never undercounts, tight when collision-free") {
    val a = spark.range(100).toDF("k")                      // each key once
    val b = spark.range(50).select((col("id") % 10).as("k")) // 0..9 ×5
    val est = Sketches.cmsJoinSizeEstimate(
        Sketches.cmsBuild(a, "k", 2048, 4),
        Sketches.cmsBuild(b, "k", 2048, 4))
      .select("est_n").as[Long].head()
    // true join size: keys 0..9 contribute 1×5 each = 50
    assert(est >= 50L, s"est=$est")
    assert(est <= 60L, s"est=$est (collision mass too large)")
  }

  test("histogram sketch: merge law — merge(hist(A), hist(B)) == hist(A ∪ B)") {
    val a = spark.range(0, 3000).toDF("v")
    val b = spark.range(2000, 7000).toDF("v")
    val merged = Sketches.histMerge(
      Sketches.histBins(a, "v", 0L, 500L, 16),
      Sketches.histBins(b, "v", 0L, 500L, 16))
    val whole = Sketches.histBins(a.unionByName(b), "v", 0L, 500L, 16)
    assertSameRows(merged, whole)
  }

  test("histogram quantiles: upper edges bound the true quantiles") {
    // uniform 0..9999, width 100: true p50 = 4999 → bin 49, edge 5000
    val bins = Sketches.histBins(spark.range(10000).toDF("v"),
      "v", 0L, 100L, 100)
    val est = Sketches.histQuantiles(bins, 0L, 100L, Seq(500, 990))
      .collect().map(r => (r.getInt(0), r.getLong(2))).toMap
    assert(est(500) == 5000L, s"p50 edge ${est(500)}")
    assert(est(990) == 9900L, s"p99 edge ${est(990)}")
  }

  test("clipToQuantiles: output stays inside the band, in-band values untouched") {
    val df = spark.range(1000).toDF("v") // uniform 0..999
    val clipped = Sketches.clipToQuantiles(df, "v", 0L, 100L, 10,
        qLoMilli = 100, qHiMilli = 900)
      .select("v", "v_clipped", "lo_edge", "hi_edge")
      .as[(Long, Long, Long, Long)].collect()
    val (lo, hi) = (clipped.head._3, clipped.head._4)
    assert(lo == 100L && hi == 900L, s"edges: $lo, $hi")
    assert(clipped.forall(r => r._2 >= lo && r._2 <= hi))
    // values already inside the band pass through unchanged
    assert(clipped.filter(r => r._1 >= lo && r._1 <= hi)
      .forall(r => r._2 == r._1))
    // out-of-band values land exactly on the edges
    assert(clipped.filter(_._1 < lo).forall(_._2 == lo))
    assert(clipped.filter(_._1 > hi).forall(_._2 == hi))
  }

  test("histogram sketch: out-of-frame values clamp to the edge bins") {
    val df = Seq(-50L, 5L, 9999L).toDF("v")
    val bins = Sketches.histBins(df, "v", 0L, 10L, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(bins(0L) == 2L) // -50 clamps into bin 0 alongside 5
    assert(bins(3L) == 1L) // 9999 clamps into the last bin
  }

  test("kmv estimate lands within the k=64 error envelope") {
    for (n <- Seq(2000, 20000)) {
      val est = Sketches.kmvEstimate(range(n), "v", 64)
        .select("estimate").as[Double].head()
      // standard error ~ 1/sqrt(k-2) = 12.7%; allow 3 sigma
      assert(math.abs(est - n) / n < 0.40, s"n=$n est=$est")
    }
  }

  test("kmv of fewer-than-k values degrades gracefully") {
    val row = Sketches.kmvEstimate(range(10), "v", 64)
      .select("k").as[Long].head()
    assert(row == 10L)
  }

  test("bloom has no false negatives and a sane false-positive rate") {
    val members = range(500)
    val filter = Sketches.bloomBuild(members, "v")
    // every member must hit
    val misses = Sketches.bloomProbe(members, filter, "v")
      .filter(col("maybe_member") === 0).count()
    assert(misses == 0L)
    // non-members (disjoint range): with m=8192, k=4, n=500 the FP
    // rate is ~0.2%; assert under 5%
    val probes = spark.range(100000, 102000).toDF("v")
    val fps = Sketches.bloomProbe(probes, filter, "v")
      .filter(col("maybe_member") === 1).count()
    assert(fps < 100, s"false positives: $fps / 2000")
  }

  test("hll merge law: merge(regs(A), regs(B)) == regs(A union B)") {
    val a = spark.range(0, 3000).toDF("v")
    val b = spark.range(2000, 6000).toDF("v") // overlapping
    val merged = Sketches.hllMergeRegisters(
      Sketches.hllRegisters(a, "v", 128),
      Sketches.hllRegisters(b, "v", 128))
    val direct = Sketches.hllRegisters(
      a.unionByName(b).distinct(), "v", 128)
    assertSameRows(merged, direct)
  }

  test("kmv merge law: merge(kmv(A), kmv(B)) == kmv(A union B)") {
    val a = spark.range(0, 3000).toDF("v")
    val b = spark.range(2000, 6000).toDF("v")
    val merged = Sketches.kmvMerge(64,
      Sketches.kmvSketch(a, "v", 64), Sketches.kmvSketch(b, "v", 64))
    val direct = Sketches.kmvSketch(a.unionByName(b), "v", 64)
    assertSameRows(merged, direct)
  }

  test("bloom union law: members of either side hit the merged filter") {
    val a = spark.range(0, 300).toDF("v")
    val b = spark.range(1000, 1300).toDF("v")
    val union = Sketches.bloomUnion(
      Sketches.bloomBuild(a, "v"), Sketches.bloomBuild(b, "v"))
    val misses = Sketches.bloomProbe(a.unionByName(b), union, "v")
      .filter(col("maybe_member") === 0).count()
    assert(misses == 0L)
  }

  test("sketches ignore null values; empty graph is rejected loudly") {
    val withNulls = Seq(Some(1L), None, Some(2L), None, Some(3L))
      .toDF("v")
    val est = Sketches.hllEstimate(withNulls, "v", 64)
      .select("nonzero_buckets").as[Long].head()
    assert(est == 3L) // three non-null distinct values -> 3 registers
    assert(Sketches.kmvSketch(withNulls, "v", 8).count() == 3L)
    intercept[IllegalArgumentException] {
      Graph.pageRank(Seq.empty[(Long, Long)].toDF("src", "dst"),
        "src", "dst")
    }
  }

  test("chunking with stride == width partitions the token stream exactly") {
    val docs = Seq((1L, (1 to 100).map("w" + _).mkString(" ")),
      (2L, "a b c"), (3L, ""))
      .toDF("doc_id", "text")
    val total = graft.operators.Sharding
      .chunkByTokens(docs, "doc_id", "text", 32, 32)
      .agg(sum("n_tokens")).as[Long].head()
    assert(total == 103L) // every token in exactly one chunk
  }

  test("pagerank on a 2-cycle is symmetric and mass-bounded") {
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val r = Graph.pageRank(edges, "src", "dst", iters = 3)
      .orderBy("node").as[(Long, Long)].collect()
    assert(r.length == 2)
    assert(r(0)._2 == r(1)._2) // symmetry: identical by exact math
    // each rank stays within [teleport, SCALE]
    assert(r.forall(x => x._2 > 0 && x._2 <= Graph.Scale))
  }

  test("pagerank sinks absorb: star a->c, b->c ranks c highest") {
    val edges = Seq((1L, 3L), (2L, 3L)).toDF("src", "dst")
    val r = Graph.pageRank(edges, "src", "dst", iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(r(3L) > r(1L) && r(1L) == r(2L))
  }

  test("pagerank is invariant to edge duplication and partitioning") {
    val base = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L))
    val a = Graph.pageRank(base.toDF("src", "dst"), "src", "dst")
    val b = Graph.pageRank(
      (base ++ base).toDF("src", "dst").repartition(5), "src", "dst")
    assertSameRows(a, b)
  }

  test("grouped hll matches the global estimator run per group") {
    val df = spark.range(3000)
      .select((col("id") % 3).as("g"), col("id").as("v"))
    val grouped = Sketches.hllEstimateByGroup(df, "g", "v", 64)
      .select("grp", "estimate").as[(Long, Double)].collect().toMap
    for (g <- 0L to 2L) {
      val solo = Sketches.hllEstimate(df.filter(col("g") === g), "v", 64)
        .select("estimate").as[Double].head()
      assert(grouped(g) == solo, s"group $g: ${grouped(g)} != $solo")
    }
  }

  test("cms never undercounts and is exact without collisions") {
    val df = (Seq.fill(7)("a") ++ Seq.fill(3)("b") ++ Seq("c"))
      .toDF("v")
    val cms = Sketches.cmsBuild(df, "v", 2048, 4)
    val est = Sketches.cmsEstimate(Seq("a", "b", "c", "zz").toDF("v"),
        cms, "v", 2048, 4)
      .as[(String, Long)].collect().toMap
    // 3 keys into 2048 counters: no collisions, estimates exact;
    // the unseen key reads 0 (min over empty counters)
    assert(est == Map("a" -> 7L, "b" -> 3L, "c" -> 1L, "zz" -> 0L))
  }

  test("native graft_cms build is bit-identical to the declarative " +
      "build and partition-independent") {
    val df = (1 to 500).map(i => (i % 37).toString).toDF("v")
    val declarative = Sketches.cmsBuild(df, "v", 64, 4)
    val native = Sketches.cmsBuildNative(df, "v", 64, 4)
    assertSameRows(declarative, native)
    // merge path: buffers fold the same at any partitioning
    assertSameRows(native,
      Sketches.cmsBuildNative(df.repartition(13), "v", 64, 4))
    // and the native build interchanges under the estimator
    val est = Sketches.cmsEstimate(Seq("1", "36", "zz").toDF("v"),
        Sketches.cmsBuildNative(df, "v", 2048, 4), "v", 2048, 4)
      .as[(String, Long)].collect().toMap
    assert(est("1") >= 13L && est("zz") == 0L, est)
  }

  test("cms merge law: merge(cms(A), cms(B)) == cms(A union B)") {
    val a = (1 to 300).map(i => (i % 17).toString).toDF("v")
    val b = (1 to 200).map(i => (i % 23).toString).toDF("v")
    val merged = Sketches.cmsMerge(
      Sketches.cmsBuild(a, "v", 64, 4), Sketches.cmsBuild(b, "v", 64, 4))
    assertSameRows(merged, Sketches.cmsBuild(a.unionAll(b), "v", 64, 4))
  }

  test("rrf fusion sums integer reciprocal ranks across lists") {
    val l1 = Seq((10L, 1), (20L, 2)).toDF("id", "rank")
    val l2 = Seq((20L, 1), (30L, 2)).toDF("id", "rank")
    val r = graft.operators.Retrieval.rrfFuse(Seq(l1, l2), "id", "rank")
      .as[(Long, Long, Long)].collect()
      .map { case (id, s, n) => id -> ((s, n)) }.toMap
    val r1 = 1000000L / 61; val r2 = 1000000L / 62
    assert(r == Map(10L -> ((r1, 1L)), 20L -> ((r2 + r1, 2L)),
      30L -> ((r2, 1L))))
  }

  test("inverted index: exact dfs, sorted CSV postings, hot terms " +
      "suppressed; conjunctive search is exact AND") {
    import graft.operators.Retrieval
    val docs = Seq(
      (3L, "alpha beta beta gamma"),   // beta repeats: df counts once
      (1L, "alpha beta"),
      (2L, "alpha delta")).toDF("doc_id", "text")
    val idx = Retrieval.invertedIndex(docs, "doc_id", "text", 2L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), Option(r.getString(2))))).toMap
    assert(idx == Map(
      "alpha" -> ((3L, None)),            // df 3 > maxDf: list withheld
      "beta"  -> ((2L, Some("1,3"))),     // sorted doc order, df once
      "gamma" -> ((1L, Some("3"))),
      "delta" -> ((1L, Some("2")))))
    // AND semantics: duplicate in-doc terms count once; duplicate
    // QUERY terms dedupe (alpha alpha beta != 3 required hits)
    val hits = Retrieval.conjunctiveSearch(docs, "doc_id", "text",
      Seq("alpha", "alpha", "beta")).as[Long].collect().toSet
    assert(hits == Set(1L, 3L))
    assert(Retrieval.conjunctiveSearch(docs, "doc_id", "text",
      Seq("alpha", "zeta")).count() == 0)
  }

  test("mergeInvertedIndexes: merged halves equal the full index, " +
      "including lists that only the COMBINED df suppresses") {
    import graft.operators.Retrieval
    val docs = Seq(
      (1L, "alpha beta"), (2L, "alpha gamma"),      // batch A
      (3L, "alpha beta"), (4L, "delta")).toDF("doc_id", "text")
    val a = docs.filter($"doc_id" <= 2)
    val b = docs.filter($"doc_id" > 2)
    // maxDf 2: alpha has df 2 in A alone (list present) but df 3
    // combined -> the MERGE must null it out
    val merged = Retrieval.mergeInvertedIndexes(
      Retrieval.invertedIndex(a, "doc_id", "text", 2L),
      Retrieval.invertedIndex(b, "doc_id", "text", 2L), 2L)
    assertSameRows(
      merged.orderBy("term"),
      Retrieval.invertedIndex(docs, "doc_id", "text", 2L)
        .orderBy("term"))
    val alpha = merged.filter($"term" === "alpha").collect()(0)
    assert(alpha.getLong(1) == 3L && alpha.isNullAt(2),
      "combined-df suppression must fire in the merge")
  }

  test("mergeInvertedIndexes preserves STRING doc ids (no long-cast " +
      "nulling) and numeric order for digit ids") {
    import graft.operators.Retrieval
    val docs = Seq(("doc-b", "alpha"), ("doc-a", "alpha"))
      .toDF("doc_id", "text")
    val merged = Retrieval.mergeInvertedIndexes(
      Retrieval.invertedIndex(docs.filter($"doc_id" === "doc-a"),
        "doc_id", "text", 5L),
      Retrieval.invertedIndex(docs.filter($"doc_id" === "doc-b"),
        "doc_id", "text", 5L), 5L)
    assert(merged.filter($"term" === "alpha")
      .select("postings_csv").as[String].head() == "doc-a,doc-b")
    // canonical digit strings (long ids) still sort NUMERICALLY:
    // 2 < 10, not the lexicographic "10" < "2"
    val nums = Seq((10L, "beta"), (2L, "beta")).toDF("doc_id", "text")
    val m2 = Retrieval.mergeInvertedIndexes(
      Retrieval.invertedIndex(nums.filter($"doc_id" === 2L),
        "doc_id", "text", 5L),
      Retrieval.invertedIndex(nums.filter($"doc_id" === 10L),
        "doc_id", "text", 5L), 5L)
    assert(m2.filter($"term" === "beta")
      .select("postings_csv").as[String].head() == "2,10")
    // mixed digit/non-digit string ids: the sort key is TOTAL (the
    // old pairwise comparator cycled on '10' > '2' > '1a' > '10'),
    // so the order is deterministic: digits numerically, then text
    val mixed = Seq(("10", "gam"), ("1a", "gam"), ("2", "gam"))
      .toDF("doc_id", "text")
    val m3 = Retrieval.mergeInvertedIndexes(
      Retrieval.invertedIndex(mixed.filter($"doc_id" =!= "2"),
        "doc_id", "text", 5L),
      Retrieval.invertedIndex(mixed.filter($"doc_id" === "2"),
        "doc_id", "text", 5L), 5L)
    assert(m3.filter($"term" === "gam")
      .select("postings_csv").as[String].head() == "2,10,1a")
  }

  test("phraseSearch: consecutive positions only, occurrence counts, " +
      "repeated-word phrases align correctly") {
    import graft.operators.Retrieval
    val docs = Seq(
      (1L, "the hash table the hash table"),  // "hash table" twice
      (2L, "hash map and table hash"),        // words present, never adjacent
      (3L, "buffalo buffalo buffalo"),        // "buffalo buffalo" twice
      (4L, "nothing here")).toDF("doc_id", "text")
    val ht = Retrieval.phraseSearch(docs, "doc_id", "text",
      Seq("hash", "table")).as[(Long, Long)].collect().toMap
    assert(ht == Map(1L -> 2L), ht.toString)
    val bb = Retrieval.phraseSearch(docs, "doc_id", "text",
      Seq("buffalo", "buffalo")).as[(Long, Long)].collect().toMap
    assert(bb == Map(3L -> 2L), bb.toString)
    assert(Retrieval.phraseSearch(docs, "doc_id", "text",
      Seq("table", "map")).count() == 0)
  }

  test("personalizedPageRank: seeds=all reduces to pageRank; a node " +
      "upstream of every seed keeps rank 0") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L))
      .toDF("src", "dst")
    val allNodes = Seq(1L, 2L, 3L).toDF("n")
    assertSameRows(
      Graph.pageRank(edges, "src", "dst", iters = 3),
      Graph.personalizedPageRank(edges, "src", "dst", allNodes, "n",
        iters = 3))
    // chain 1 -> 2 with seed {2}: node 1 has no teleport and no
    // inbound mass, so its rank is exactly 0 at every iteration
    val chain = Seq((1L, 2L)).toDF("src", "dst")
    val r = Graph.personalizedPageRank(chain, "src", "dst",
        Seq(2L).toDF("n"), "n", iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(r(1L) == 0L && r(2L) > 0L, r.toString)
  }

  test("bqBatchTopKTuned at a frame-fed radius equals the literal-" +
      "radius path") {
    import graft.operators.Similarity
    val dim = 8
    def vec(i: Int): Array[Float] = Array.tabulate(dim)(j =>
      math.cos(i * 13 + j * 5).toFloat)
    val corpus = (0 until 300).map(i => (i.toLong, vec(i)))
      .toDF("vec_id", "embedding")
    val qs = Seq((0L, vec(2)), (1L, vec(77))).toDF("qid", "qvec")
    val lit28 = Similarity.bqBatchTopK(corpus, "vec_id", "embedding",
      qs, "qid", 28, 5).select("qid", "vec_id", "hamming", "cosine")
    val tuned = Similarity.bqBatchTopKTuned(corpus, "vec_id",
        "embedding", qs, "qid",
        Seq(Tuple1(28L)).toDF("radius"), 5)
      .select("qid", "vec_id", "hamming", "cosine")
    assertSameRows(lit28, tuned)
  }

  test("zipfSlope recovers -1000 milli on an exact 1/rank corpus") {
    import graft.operators.TextAnalysis
    // token w_r appears floor(720/r) times, r = 1..6: a pure Zipf
    // line up to ln flooring
    val words = (1 to 6).flatMap(r => Seq.fill(720 / r)(s"w$r"))
    val docs = Seq(Tuple1(words.mkString(" "))).toDF("text")
    val got = TextAnalysis.zipfSlope(docs, "text", 6)
      .select("n_terms", "slope_milli").as[(Long, Long)].head()
    assert(got._1 == 6L)
    assert(got._2 <= -985L && got._2 >= -1015L, got.toString)
  }

  test("triangle counts: each triangle credits all three nodes once") {
    // two triangles sharing edge (2,3); (5,6) is triangle-free
    val edges = Seq((1L, 2L), (1L, 3L), (3L, 2L), (3L, 4L), (4L, 2L),
      (5L, 6L)).toDF("src", "dst")
    val r = Graph.triangleCounts(edges, "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(r == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
  }

  test("triangle degree cap drops hub wedges before the join") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (2L, 4L))
      .toDF("src", "dst")
    // nodes 2 and 3 have degree 3 > cap 2 — both triangles need them
    val r = Graph.triangleCounts(edges, "src", "dst", maxDegree = 2)
    assert(r.count() == 0)
    // duplicated reversed edges change nothing (canonicalized + dedup)
    val doubled = edges.unionAll(
      edges.select(col("dst").as("src"), col("src").as("dst")))
    assertSameRows(Graph.triangleCounts(edges, "src", "dst"),
      Graph.triangleCounts(doubled.repartition(5), "src", "dst"))
  }

  test("clustering coefficient: clique nodes score 1000 millis") {
    // triangle {1,2,3} plus pendant 3-4: nodes 1,2 are fully
    // clustered (deg 2, one triangle -> 2000/2 = 1000); node 3 has
    // deg 3 -> 2000/6 = 333
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))
      .toDF("src", "dst")
    val r = Graph.clusteringCoefficients(edges, "src", "dst")
      .select("node", "cc_milli").as[(Long, Long)].collect().toMap
    assert(r == Map(1L -> 1000L, 2L -> 1000L, 3L -> 333L))
  }

  test("cooccurrence lift: perfect pair scores n_baskets x 1000") {
    // items 10,11 always together (3 of 3 baskets each);
    // item 12 appears once alongside them
    val rows = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L),
      (3L, 10L), (3L, 11L), (3L, 12L)).toDF("basket", "item")
    val r = Graph.cooccurrenceLift(rows, "basket", "item", 1)
      .select("pa", "pb", "cab", "lift_milli")
      .as[(Long, Long, Long, Long)].collect()
      .map(x => (x._1, x._2) -> ((x._3, x._4))).toMap
    // lift(10,11) = 3*3/(3*3) = 1.0 -> 1000 millis
    assert(r((10L, 11L)) == ((3L, 1000L)))
    // lift(10,12) = 1*3/(3*1) = 1.0 -> 1000; support 1
    assert(r((10L, 12L)) == ((1L, 1000L)))
    // minSupport prunes the singleton pairs
    assert(Graph.cooccurrenceLift(rows, "basket", "item", 2).count() == 1)
  }

  test("null edge endpoints are dropped, not treated as a node") {
    val edges = Seq((Some(1L), Some(2L)), (Some(1L), Some(3L)),
      (Some(2L), Some(3L)), (None, Some(2L)), (Some(3L), None))
      .toDF("src", "dst")
    val r = Graph.triangleCounts(edges, "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(r == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("multi-probe LSH candidates are a superset of the single probe") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding").as("qvec"))
    val single = Similarity.lshTopK(emb, "vec_id", "embedding", q, 8, 500)
      .select("vec_id").as[Long].collect().toSet
    val multi = Similarity
      .lshMultiProbeTopK(emb, "vec_id", "embedding", q, 8, 500)
      .select("vec_id").as[Long].collect().toSet
    assert(single.subsetOf(multi),
      s"single-probe hits must survive multi-probe: ${single -- multi}")
    assert(multi.size >= single.size)
  }

  test("bloom pre-join returns row-for-row the plain join") {
    val big = (1 to 500).map(i => (i.toLong, s"o$i"))
      .toDF("k", "payload")
    val small = Seq((3L, "a"), (77L, "b"), (400L, "c"), (9999L, "d"))
      .toDF("sk", "attr")
    val pre = Sketches.bloomPreJoin(big, small, "k", "sk")
    val plain = big.join(small, col("k") === col("sk"))
    assertSameRows(pre, plain)
  }

  test("pq: encode+ADC ranks the query's own vector first") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cb = Similarity.pqCodebookFromSeeds(emb, "vec_id", "embedding",
      8, 4, 16)
    val enc = Similarity.pqEncode(emb, "vec_id", "embedding", cb, 4, 16)
    // every vector gets exactly 4 codes
    assert(enc.groupBy("vec_id").count()
      .filter(col("count") =!= 4).count() == 0L)
    // ADC with vec_id=3's own vector: itself must rank first (its
    // quantized cells are at minimal distance to its own slices)
    val q = emb.filter(col("vec_id") === 3)
      .select(col("embedding").as("qvec"))
    val top = Similarity.pqAdcTopK(enc, cb, q, "vec_id", 4, 16, 5)
      .select("vec_id").as[Long].collect()
    assert(top.length == 5)
    assert(top.head == 3L ||
      // a seed vector sharing all 4 codes with doc 3 could tie-break
      // ahead; accept top-5 membership in that (unlikely) case
      top.contains(3L))
  }

  test("zOrderValue interleaves bits (x even positions, y odd)") {
    import graft.operators.Layout
    def z(x: Long, y: Long): Long =
      spark.range(1).select(Layout.zOrderValue(lit(x), lit(y), 16))
        .as[Long].head()
    assert(z(3, 0) == 5L)   // x bits 0,1 -> z bits 0,2
    assert(z(0, 3) == 10L)  // y bits 0,1 -> z bits 1,3
    assert(z(1, 1) == 3L)
    assert(z(65535, 65535) == (1L << 32) - 1)
    // locality: nearby (x, y) cells give nearby z prefixes
    assert(z(5, 9) >> 4 == z(4, 8) >> 4)
  }

  test("kmvOverlap laws: identical sets score 1000 milli with the " +
      "kmvEstimate union, disjoint sets score 0, a half-subset " +
      "lands between") {
    import graft.operators.Sketches
    val a = (0L until 400L).toDF("v")
    val same = Sketches.kmvOverlap(a, a, "v", 64)
      .as[(Long, Long, Double, Long, Double)].head()
    assert(same._1 == 64L && same._2 == 64L && same._4 == 1000L,
      same.toString)
    val est = Sketches.kmvEstimate(a, "v", 64)
      .select("estimate").as[Double].head()
    assert(same._3 == est && same._5 == est, s"$same vs $est")
    val disjoint = Sketches.kmvOverlap(a,
        (1000L until 1400L).toDF("v"), "v", 64)
      .as[(Long, Long, Double, Long, Double)].head()
    assert(disjoint._2 == 0L && disjoint._4 == 0L && disjoint._5 == 0.0,
      disjoint.toString)
    val half = Sketches.kmvOverlap(a, (0L until 200L).toDF("v"), "v", 64)
      .as[(Long, Long, Double, Long, Double)].head()
    assert(half._4 > 0L && half._4 < 1000L, half.toString)
  }

  test("exactKth: radix bisection equals the sorted order statistic " +
      "for every rank, negatives and ties included, at any " +
      "partitioning") {
    import graft.operators.Sketches
    val xs = Seq(-5L, 3L, -7L, 10L, 0L, 2L, 2L, 2L, 1L,
      Long.MinValue + 3, Long.MaxValue - 2, -1000000L, 999999L)
    val sorted = xs.sorted
    for (parts <- Seq(1, 5)) {
      val df = xs.toDF("x").repartition(parts)
      for (k <- 1 to xs.size) {
        val got = Sketches.exactKth(df, "x", k.toLong)
          .as[(Long, Long)].head()
        assert(got == ((k.toLong, sorted(k - 1))),
          s"parts=$parts k=$k: $got want ${sorted(k - 1)}")
      }
    }
    intercept[IllegalArgumentException] {
      Sketches.exactKth(xs.toDF("x"), "x", xs.size + 1L).collect()
    }
  }

  test("heavyHittersExact equals groupBy-HAVING at any partitioning " +
      "and the > n/k bar is strict") {
    import graft.operators.Sketches
    // 100 rows: a=40, b=25, c=20 (exactly n/k for k=5), 15 singletons
    val rows = Seq.fill(40)("a") ++ Seq.fill(25)("b") ++
      Seq.fill(20)("c") ++ (0 until 15).map(i => s"s$i")
    for (parts <- Seq(1, 7, 32)) {
      val df = rows.toDF("x").repartition(parts)
      val got = Sketches.heavyHittersExact(df, "x", 5)
        .as[(String, Long, Long)].collect().toSeq.sorted
      // c sits exactly AT n/k: excluded (strict >), like the SQL
      assert(got == Seq(("a", 40L, 400L), ("b", 25L, 250L)),
        s"parts=$parts: $got")
    }
    // nulls don't count toward n and never become candidates
    val withNulls = (rows.map(Option(_)) ++ Seq.fill(50)(None))
      .toDF("x")
    val g2 = Sketches.heavyHittersExact(withNulls, "x", 5)
      .as[(String, Long, Long)].collect().toSeq.sorted
    assert(g2 == Seq(("a", 40L, 400L), ("b", 25L, 250L)), g2.toString)
  }

  test("block hygiene: exactKth frees its localCheckpoint (zero " +
      "pinned RDDs survive the call) and heavyHittersExact pins at " +
      "most its tiny result") {
    import graft.operators.Sketches
    val sc = spark.sparkContext
    def pinned: Set[Int] = sc.getPersistentRDDs.keySet.toSet
    val before = pinned
    val r = Sketches.exactKth((1L to 1000L).toDF("x"), "x", 500L)
      .as[(Long, Long)].head()
    assert(r == ((500L, 500L)))
    assert((pinned -- before).isEmpty,
      s"exactKth left pinned RDD blocks behind: ${pinned -- before}")
    val hh = Sketches.heavyHittersExact(
      (Seq.fill(50)("a") ++ (0 until 10).map(_.toString)).toDF("x"),
      "x", 3).as[(String, Long, Long)].collect()
    assert(hh.toSeq == Seq(("a", 50L, 833L)))
    // the corpus-sized vals checkpoint must be released; only the
    // provably-<k-row result frame may stay materialized
    val extra = pinned -- before
    assert(extra.size <= 1,
      s"expected at most the result RDD pinned, got $extra")
  }

  test("block hygiene: pageRank/personalizedPageRank free superseded " +
      "rounds and their prelude (at most the final ranks stay " +
      "pinned); lshRecallReportFrom pins nothing") {
    import graft.operators.Dedup
    val sc = spark.sparkContext
    def pinned: Set[Int] = sc.getPersistentRDDs.keySet.toSet
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L))
      .toDF("src", "dst")
    val b1 = pinned
    val pr = Graph.pageRank(edges, "src", "dst", iters = 3)
    assert(pr.count() == 3)
    val e1 = pinned -- b1
    assert(e1.size <= 1,
      s"pageRank left superseded-round/prelude blocks pinned: $e1")
    val b2 = pinned
    val ppr = Graph.personalizedPageRank(edges, "src", "dst",
      Seq(1L).toDF("n"), "n", iters = 3)
    assert(ppr.count() == 3)
    val e2 = pinned -- b2
    assert(e2.size <= 1,
      s"personalizedPageRank left blocks pinned: $e2")
    val b3 = pinned
    val exact = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val rep = Dedup.lshRecallReportFrom(exact, exact.limit(1))
      .as[(Long, Long, Long, Long, Long)].head()
    assert(rep == ((2L, 1L, 1L, 500L, 1000L)), rep.toString)
    assert((pinned -- b3).isEmpty,
      s"lshRecallReportFrom left blocks pinned: ${pinned -- b3}")
  }

  test("indexNd/axesNd: the n-D Hilbert walk is a unit-step " +
      "bijection over full 2-D/3-D/4-D grids, the native expression " +
      "matches the kernel, and contract violations are loud") {
    import graft.expressions.Hilbert
    for ((dims, bits) <- Seq((2, 4), (3, 3), (4, 2))) {
      val total = 1L << (dims * bits)
      // round-trip bijection over EVERY cell...
      val walk = (0L until total).map { d =>
        val ax = Hilbert.axesNd(d, dims, bits)
        assert(Hilbert.indexNd(ax, bits) == d,
          s"dims=$dims bits=$bits d=$d")
        ax
      }
      // ...and every consecutive step is Manhattan distance 1 — the
      // defining Hilbert locality (together with bijectivity this
      // characterizes a space-filling unit walk; Morton fails it)
      walk.sliding(2).foreach { case Seq(a, b) =>
        val dist = a.zip(b).map { case (u, v) => math.abs(u - v) }.sum
        assert(dist == 1, s"dims=$dims bits=$bits jump: " +
          s"${a.toSeq} -> ${b.toSeq}")
      }
    }
    // the native expression agrees with the kernel
    val cells = for (x <- 0L until 4L; y <- 0L until 4L;
      z <- 0L until 4L) yield (x, y, z)
    val got = cells.toDF("x", "y", "z")
      .select(graft.operators.Layout.hilbertValueNd(
        Seq(col("x"), col("y"), col("z")), 2).as("h"))
      .as[Long].collect().toSeq
    val want = cells.map(c => Hilbert.indexNd(Array(c._1, c._2, c._3), 2))
    assert(got == want)
    assert(got.distinct.size == 64 && got.min == 0L && got.max == 63L)
    // violations fail loudly, never fold into a wrong cell
    intercept[IllegalArgumentException] {
      Hilbert.indexNd(Array(1L << 4, 0L), 4)
    }
    intercept[IllegalArgumentException] {
      Hilbert.indexNd(Array(0L), 4)
    }
    intercept[IllegalArgumentException] {
      Hilbert.indexNd(Array.fill(9)(0L), 7) // 63 bits > 62
    }
  }

  test("zOrderValueNd: n-D Morton is a bijection whose bit layout " +
      "matches the interleave spec; 2-D agrees with zOrderValue") {
    import graft.operators.Layout
    val cells3 = for (x <- 0L until 16L; y <- 0L until 16L;
      z <- 0L until 16L) yield (x, y, z)
    val got = cells3.toDF("x", "y", "z")
      .select(Layout.zOrderValueNd(
        Seq(col("x"), col("y"), col("z")), 4).as("m"))
      .as[Long].collect().toSeq
    // bijection onto [0, 4096)
    assert(got.distinct.size == 4096)
    assert(got.min == 0L && got.max == 4095L)
    // bit layout: bit i of dim d lands at 3i + d
    def morton3(x: Long, y: Long, z: Long): Long =
      (0 until 4).map { i =>
        (((x >> i) & 1) << (3 * i)) | (((y >> i) & 1) << (3 * i + 1)) |
          (((z >> i) & 1) << (3 * i + 2))
      }.reduce(_ | _)
    assert(got == cells3.map(c => morton3(c._1, c._2, c._3)))
    // the 2-D instance reproduces the existing zOrderValue exactly
    val cells2 = for (x <- 0L until 32L; y <- 0L until 32L)
      yield (x, y)
    val a = cells2.toDF("x", "y")
      .select(Layout.zOrderValue(col("x"), col("y"), 5).as("m"))
      .as[Long].collect().toSeq
    val b = cells2.toDF("x", "y")
      .select(Layout.zOrderValueNd(Seq(col("x"), col("y")), 5).as("m"))
      .as[Long].collect().toSeq
    assert(a == b)
    intercept[IllegalArgumentException] {
      Layout.zOrderValueNd(Seq(col("x")), 4)
    }
    intercept[IllegalArgumentException] {
      Layout.zOrderValueNd(Seq.fill(9)(col("x")), 7)
    }
  }

  test("hilbertValue is a neighbor-continuous bijection on the grid") {
    import graft.expressions.Hilbert
    // bits=1 base case: the U-shaped quadrant order (0,0) (0,1)
    // (1,1) (1,0) of the classic xy->d walk
    assert(Hilbert.index(0, 0, 1) == 0L)
    assert(Hilbert.index(0, 1, 1) == 1L)
    assert(Hilbert.index(1, 1, 1) == 2L)
    assert(Hilbert.index(1, 0, 1) == 3L)
    // bits=4: bijective over all 256 cells AND every consecutive d
    // pair is a Manhattan-distance-1 step — the defining locality
    // property Morton order lacks (its quadrant seams jump)
    val cells = for (x <- 0 until 16; y <- 0 until 16)
      yield (Hilbert.index(x, y, 4), x, y)
    assert(cells.map(_._1).distinct.size == 256)
    assert(cells.map(_._1).min == 0L && cells.map(_._1).max == 255L)
    val walk = cells.sortBy(_._1)
    walk.sliding(2).foreach { case Seq((_, x1, y1), (_, x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"non-adjacent step ($x1,$y1)->($x2,$y2)")
    }
    // inverse walk: xy(index(.)) is the identity on every cell, and
    // index(xy(.)) on every d — a full round-trip bijection
    for (x <- 0 until 16; y <- 0 until 16)
      assert(Hilbert.xy(Hilbert.index(x, y, 4), 4) == ((x.toLong, y.toLong)))
    for (d <- 0 until 256) {
      val (ix, iy) = Hilbert.xy(d, 4)
      assert(Hilbert.index(ix, iy, 4) == d.toLong)
    }
    intercept[Exception] { Hilbert.xy(256, 4) }
    // codegen path: the Column API via the registered expression
    import graft.operators.Layout
    def h(x: Long, y: Long): Long =
      spark.range(1).select(Layout.hilbertValue(lit(x), lit(y), 16))
        .as[Long].head()
    assert(h(0, 0) == 0L)
    assert(h(65535, 65535) == Hilbert.index(65535, 65535, 16))
    // out-of-range inputs fail loudly rather than fold into a cell
    intercept[Exception] { h(65536, 0) }
    intercept[Exception] { Hilbert.index(-1, 0, 4) }
  }

  test("star connected components agree with label propagation") {
    import graft.operators.Dedup
    val ids = spark.range(0, 60).toDF("doc_id")
    // pseudo-random sparse graph (deterministic arithmetic)
    val pairs = (0 until 120)
      .map(i => ((i * 17 + 3) % 60L, (i * 31 + 7) % 60L))
      .filter(p => p._1 != p._2)
      .map(p => (math.min(p._1, p._2), math.max(p._1, p._2)))
      .distinct.toDF("id_a", "id_b")
    val lp = Dedup.duplicateClusters(ids, "doc_id", pairs, maxIters = 40)
    val star = Dedup.duplicateClustersStar(ids, "doc_id", pairs)
    assertSameRows(lp, star)
  }

  test("star CC closes a 100-chain that label propagation cannot") {
    import graft.operators.Dedup
    val ids = spark.range(0, 101).toDF("doc_id")
    val chain = (0 until 100).map(i => (i.toLong, i + 1L))
      .toDF("id_a", "id_b")
    // O(diameter) label propagation exceeds its round budget ...
    intercept[IllegalStateException] {
      Dedup.duplicateClusters(ids, "doc_id", chain, maxIters = 20)
        .count()
    }
    // ... the star algorithm contracts the chain in O(log^2 n) rounds
    val star = Dedup.duplicateClustersStar(ids, "doc_id", chain)
    assert(star.select("cluster_id").distinct().count() == 1L)
    assert(star.filter(col("cluster_id") =!= 0L).count() == 0L)
  }

  test("streaming dropDuplicates agrees with batchFirstPerKey") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    def t(h: Int, m: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    // event-time-ordered rows: (key, ts, id)
    val data = Seq(
      ("a", t(0, 0), 1L), ("b", t(0, 1), 2L), ("a", t(0, 5), 3L),
      ("b", t(1, 0), 4L), ("c", t(2, 0), 5L), ("a", t(3, 0), 6L))
    val mem = MemoryStream[(String, java.sql.Timestamp, Long)]
    val st = StreamOps.streamingDedupFirst(
      mem.toDF().toDF("k", "ts", "id"), Seq("k"), "ts")
    val q = st.writeStream.format("memory").queryName("dd")
      .outputMode("append").start()
    mem.addData(data.take(3): _*)
    q.processAllAvailable()
    mem.addData(data.drop(3): _*)
    q.processAllAvailable()
    val streamed = spark.table("dd").select("k", "id")
    val batch = StreamOps.batchFirstPerKey(
        data.toDF("k", "ts", "id"), Seq("k"), "ts", "id")
      .select("k", "id")
    assertSameRows(streamed, batch)
    q.stop()
  }

  test("stream-static broadcast enrichment agrees with the batch join") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("k", "tier")
    val rows = Seq((1L, 10.0), (2L, 5.0), (3L, 1.0), (1L, 2.0))
    val mem = MemoryStream[(Long, Double)]
    val enriched = mem.toDF().toDF("k", "value")
      .join(broadcast(dim), Seq("k"), "left")
    val q = enriched.writeStream.format("memory").queryName("enr")
      .outputMode("append").start()
    mem.addData(rows: _*)
    q.processAllAvailable()
    val streamed = spark.table("enr")
    val batch = rows.toDF("k", "value")
      .join(broadcast(dim), Seq("k"), "left")
    assertSameRows(streamed, batch)
    q.stop()
  }

  test("stream-stream interval join agrees with the batch range join") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    def t(h: Int, m: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val views = Seq((1L, t(0, 0), 10L), (1L, t(2, 0), 11L),
      (2L, t(0, 30), 12L))
    val buys = Seq((1L, t(0, 40), 20L), (1L, t(2, 30), 21L),
      (2L, t(3, 0), 22L), (1L, t(9, 0), 23L))
    val memV = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val memB = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val joined = StreamOps.intervalJoin(
      memV.toDF().toDF("user_id", "ts", "view_id"),
      memB.toDF().toDF("user_id", "ts", "buy_id"),
      "user_id", "ts", "ts", "1 HOUR", streaming = true)
    val q = joined.select("view_id", "buy_id").writeStream
      .format("memory").queryName("ij").outputMode("append").start()
    memV.addData(views: _*)
    memB.addData(buys: _*)
    q.processAllAvailable()
    // advance both watermarks so all matches emit
    memV.addData((9L, t(23, 0), 99L))
    memB.addData((9L, t(23, 30), 98L))
    q.processAllAvailable()
    val streamed = spark.table("ij")
      .filter(col("view_id") =!= 99L)
    val batch = StreamOps.intervalJoin(
        views.toDF("user_id", "ts", "view_id"),
        buys.toDF("user_id", "ts", "buy_id"),
        "user_id", "ts", "ts", "1 HOUR")
      .select("view_id", "buy_id")
    assertSameRows(streamed, batch)
    q.stop()
  }
}
