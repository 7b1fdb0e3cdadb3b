package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Multimodal, Retrieval, Services, Similarity}

/** Similarity-search, multimodal, and service-stub [Q] inventory over
  * `embeddings` / `documents`. Cosines are ORDERED left folds on both
  * engines, so the doubles are bit-identical.
  */
object Vectors {

  /** The k-means index four queries consume (centroid dump, SemDeDup,
    * prototypicality, trained IVF): k=8, 2 Lloyd iterations, dim 64 —
    * trained ONCE per session ([[materialized]]); a production
    * pipeline persists the trained index, it never retrains per
    * consumer. */
  private def kmeans8(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    materialized(s, d, "kmeans_8_2_64") {
      Similarity.kmeansCentroids(t(s, d, "embeddings"), "vec_id",
        "embedding", 8, 2, 64)
    }

  /** The exact cross-product bitext miner (k=4, margin 1.02) both
    * the exact-graded query and the ANN recall report consume —
    * mined ONCE per session ([[materialized]]): the report grades
    * the ANN shortlist AGAINST this frame, so recomputing the
    * cross product per consumer doubled the round's most expensive
    * vector scan. */
  private def bitextExact(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    materialized(s, d, "bitext_exact_4_102") {
      val emb = t(s, d, "embeddings")
      Similarity.bitextMarginMine(
        emb.filter(col("vec_id") % 2 === 0),
        emb.filter(col("vec_id") % 2 === 1),
        "vec_id", "embedding", k = 4, minMargin = 1.02)
    }

  /** DuckDB ordered-fold dot product (matches functions.dotProduct). */
  private def sqlDot(a: String, b: String): String =
    s"list_reduce(list_concat([CAST(0.0 AS DOUBLE)], " +
      s"list_transform(range(1, len($a)+1), " +
      s"i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))), (x,y) -> x+y)"

  private def sqlCosine(a: String, b: String): String =
    s"${sqlDot(a, b)} / (sqrt(${sqlDot(a, a)}) * sqrt(${sqlDot(b, b)}))"

  /** Ordered-fold JL projection of `v` onto one ±1 sign row (pass a
    * row of Similarity.rpSigns — the oracle embeds the same
    * driver-derived literals the Spark plan ships). */
  private def sqlRpDim(v: String, signs: Array[Double]): String = {
    val lst = signs.map(s => if (s > 0) "1.0" else "-1.0")
      .mkString("[", ", ", "]")
    s"list_reduce(list_concat([CAST(0.0 AS DOUBLE)], " +
      s"list_transform(range(1, len($v)+1), " +
      s"i -> CAST($v[i] AS DOUBLE) * CAST(($lst)[i] AS DOUBLE))), " +
      s"(x,y) -> x+y)"
  }

  /** DuckDB half-code fold for binary quantization: MSB-first acc·2 +
    * sign bit over dims `from .. from+31` (matches
    * Similarity.binaryQuantize's ordered fold; i is 1-based). */
  private def sqlBqHalf(v: String, from: Int): String =
    s"list_reduce(list_concat([CAST(0 AS BIGINT)], " +
      s"list_transform(range($from, ${from + 32}), " +
      s"i -> CAST($v[i] >= 0 AS BIGINT))), (a, b) -> a * 2 + b)"

  /** Per-dimension ordered mean fold for the k-means oracle (matches
    * Similarity.kmeansCentroids' member-order fold; j is 1-based). */
  private def sqlMeanDim(j: Int): String =
    s"list_reduce(list_concat([CAST(0.0 AS DOUBLE)], " +
      s"list_transform(ms, v -> CAST(v[$j] AS DOUBLE))), (a, b) -> a + b)" +
      s" / n"

  /** One unrolled Lloyd's iteration: assign to nearest centroid in
    * `prev` (ties to smallest cid), then recompute each centroid as
    * the id-ordered per-dimension mean of its members. */
  private def kmeansIterSql(prev: String, aN: String, mN: String,
      cN: String, dim: Int): String =
    s"""$aN AS (SELECT e.vec_id, e.embedding, c.cid,
       |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |      -(${sqlCosine("e.embedding", "c.cv")}), c.cid) AS rn
       |  FROM embeddings e, $prev c),
       |$mN AS (SELECT cid, list(embedding ORDER BY vec_id) AS ms,
       |    count(*) AS n FROM $aN WHERE rn = 1 GROUP BY cid),
       |$cN AS (SELECT cid,
       |    [${(1 to dim).map(sqlMeanDim).mkString(", ")}] AS cv, n
       |  FROM $mN)""".stripMargin

  /** Quantized squared cosine distance — the integer every k-means||
    * decision compares (matches Similarity's floor(d²·2²⁰) LONG). */
  private def sqlD2u(a: String, b: String): String =
    s"CAST(floor((1 - ${sqlCosine(a, b)}) * " +
      s"(1 - ${sqlCosine(a, b)}) * 1048576) AS BIGINT)"

  /** One k-means|| oversampling round (lock-step with
    * Similarity.kmeansParallelCandidates: md5-gated, exact-integer
    * compare in HUGEINT like Spark's decimal(38,0)). `prev` → `next`
    * = prev ∪ the round's sampled points. */
  private def kmppRoundSql(prev: String, r: Int, l: Int,
      next: String): String =
    s"""d$r AS (SELECT e.vec_id, e.embedding,
       |    min(${sqlD2u("e.embedding", "c.cv")}) AS d2u
       |  FROM embeddings e, $prev c GROUP BY 1, 2),
       |p$r AS (SELECT sum(d2u) AS phi FROM d$r),
       |s$r AS (SELECT vec_id, embedding FROM d$r, p$r
       |  WHERE CAST((${sqlHash60(
                s"(CAST(vec_id AS VARCHAR) || ':kmpp:$r')")}
       |      % 1048576) AS HUGEINT) * phi
       |    < CAST($l * d2u * 1048576 AS HUGEINT)),
       |$next AS (SELECT cid, cv FROM $prev UNION ALL
       |  SELECT vec_id, embedding FROM s$r)""".stripMargin

  /** One deterministic weighted farthest-first selection step:
    * `chosen` + the unchosen candidate maximizing w·min-d2u-to-chosen
    * (ties to the smallest cid) → `nextChosen`. */
  private def kmppPickSql(cands: String, chosen: String,
      nextChosen: String, step: Int): String =
    s"""x$step AS (SELECT c.cid, c.cv, c.w,
       |    min(${sqlD2u("c.cv", "p.cv")}) AS dmin
       |  FROM $cands c, $chosen p
       |  WHERE c.cid NOT IN (SELECT cid FROM $chosen)
       |  GROUP BY 1, 2, 3),
       |$nextChosen AS (SELECT cid, cv, w FROM $chosen UNION ALL
       |  (SELECT cid, cv, w FROM x$step
       |   ORDER BY w * dmin DESC, cid LIMIT 1))""".stripMargin

  /** Shared IVF+PQ CTE block (16 seed centroids, nProbe=4, m=4
    * subspaces of 16 dims, 8 seed codewords): ends at `sc` =
    * (vec_id, adc_dist) for the probed lists' vectors. Used by both
    * the ADC top-k and the exact-refine query. */
  private def ivfPqCteSql: String =
    s"""c AS (SELECT vec_id AS cid, embedding AS cv
       |           FROM embeddings WHERE vec_id < 16),
       |ivd AS (SELECT e.vec_id, c.cid,
       |        -(${sqlCosine("e.embedding", "c.cv")}) AS dist
       |      FROM embeddings e, c),
       |ivr AS (SELECT vec_id, cid,
       |        row_number() OVER (PARTITION BY vec_id
       |                           ORDER BY dist, cid) AS rn FROM ivd),
       |assign AS (SELECT vec_id, cid FROM ivr WHERE rn = 1),
       |qd AS (SELECT cid, row_number() OVER (ORDER BY dist, cid) AS qrn
       |       FROM ivd WHERE vec_id = 0),
       |probe AS (SELECT cid FROM qd WHERE qrn <= 4),
       |cand AS (SELECT a.vec_id FROM assign a
       |         JOIN probe p ON a.cid = p.cid),
       |seeds AS (SELECT vec_id AS cid, embedding AS v
       |  FROM embeddings ORDER BY vec_id LIMIT 8),
       |cb AS (SELECT CAST(s.range AS BIGINT) AS sub, cid,
       |    v[CAST(s.range*16+1 AS INTEGER):CAST(s.range*16+16 AS INTEGER)]
       |      AS cv
       |  FROM seeds, range(0, 4) s),
       |sl AS (SELECT vec_id, CAST(s.range AS BIGINT) AS sub,
       |    embedding[CAST(s.range*16+1 AS INTEGER):
       |      CAST(s.range*16+16 AS INTEGER)] AS sv
       |  FROM embeddings, range(0, 4) s),
       |d AS (SELECT vec_id, sl.sub, cid,
       |    list_reduce(list_concat([CAST(0.0 AS DOUBLE)],
       |      list_transform(range(1, 17), i ->
       |        (CAST(sv[i] AS DOUBLE) - CAST(cv[i] AS DOUBLE))
       |        * (CAST(sv[i] AS DOUBLE) - CAST(cv[i] AS DOUBLE)))),
       |      (a, b) -> a + b) AS dist
       |  FROM sl JOIN cb ON cb.sub = sl.sub),
       |enc AS (SELECT vec_id, sub, cid AS code FROM (
       |  SELECT *, row_number() OVER (PARTITION BY vec_id, sub
       |      ORDER BY dist, cid) AS rn FROM d) WHERE rn = 1),
       |lut AS (SELECT d.sub, d.cid AS code, d.dist AS ld FROM d
       |  WHERE d.vec_id = 0),
       |sc AS (SELECT enc.vec_id,
       |    list_reduce(list_concat([CAST(0.0 AS DOUBLE)],
       |      list(lut.ld ORDER BY enc.sub)), (a, b) -> a + b)
       |      AS adc_dist
       |  FROM enc JOIN lut ON lut.sub = enc.sub
       |    AND lut.code = enc.code
       |  WHERE enc.vec_id IN (SELECT vec_id FROM cand)
       |  GROUP BY enc.vec_id)""".stripMargin

  /** DuckDB random-hyperplane bucket (matches
    * Similarity.withLshSignature's md5-derived planes). */
  private def sqlBucket(v: String, planes: Int = 8): String =
    (0 until planes).map { p =>
      val sign = s"(CASE WHEN ${sqlHash31(s"concat($p, ':', i-1)")} % 2 = 1 " +
        s"THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END)"
      s"CASE WHEN list_reduce(list_concat([CAST(0.0 AS DOUBLE)], " +
        s"list_transform(range(1, len($v)+1), " +
        s"i -> CAST($v[i] AS DOUBLE) * $sign)), (x,y) -> x+y) >= 0 " +
        s"THEN ${1L << p} ELSE 0 END"
    }.mkString("(", " + ", ")")

  val all: Seq[Q] = Seq(

    // ANN baseline: brute-force cosine top-k against one query vector.
    Q("q_v_brute_topk",
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
         |SELECT vec_id, label,
         |  ${sqlCosine("embedding", "qv")} AS cosine
         |FROM embeddings, q
         |ORDER BY cosine DESC, vec_id LIMIT 20""".stripMargin) { (s, d) =>
      val q = t(s, d, "embeddings").filter(col("vec_id") === 0)
        .select(col("embedding").as("qvec"))
      Similarity.bruteForceTopK(t(s, d, "embeddings"), "vec_id",
          "embedding", q, 20)
        .select("vec_id", "label", "cosine")
    },

    // Native Catalyst expression path: graft_dot (codegen'd tight
    // loop, registered via SparkSessionExtensions) must be
    // bit-identical to the HOF fold — the oracle is the SAME SQL as
    // the fold-based cosine.
    Q("q_v_native_cosine_topk",
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
         |SELECT vec_id, ${sqlCosine("embedding", "qv")} AS cosine
         |FROM embeddings, q
         |ORDER BY cosine DESC, vec_id LIMIT 15""".stripMargin) { (s, d) =>
      val q = t(s, d, "embeddings").filter(col("vec_id") === 0)
        .select(col("embedding").as("qvec"))
      t(s, d, "embeddings").crossJoin(broadcast(q))
        .select(col("vec_id"),
          graft.functions.cosineSimilarityNative(col("embedding"),
            col("qvec")).as("cosine"))
        .orderBy(col("cosine").desc, col("vec_id").asc)
        .limit(15)
    },

    // ANN scale path: random-hyperplane LSH bucket per vector.
    Q("q_v_lsh_buckets",
      s"""SELECT vec_id, CAST(${sqlBucket("embedding")} AS BIGINT) AS bucket
         |FROM embeddings ORDER BY vec_id""".stripMargin) { (s, d) =>
      Similarity.withLshSignature(t(s, d, "embeddings"), "embedding", 8)
        .select(col("vec_id"), col("bucket"))
        .orderBy("vec_id")
    },

    // Embedding near-duplicate candidates: same-bucket pairs re-ranked
    // by exact cosine.
    Q("q_v_embedding_neardup",
      s"""WITH b AS (SELECT vec_id, embedding,
         |  CAST(${sqlBucket("embedding")} AS BIGINT) AS bucket
         |  FROM embeddings)
         |SELECT a.vec_id AS id_a, b2.vec_id AS id_b, a.bucket,
         |  ${sqlCosine("a.embedding", "b2.embedding")} AS cosine
         |FROM b a JOIN b b2
         |  ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
         |WHERE ${sqlCosine("a.embedding", "b2.embedding")} >= 0.2
         |ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
      Dedup.embeddingNearDupPairs(t(s, d, "embeddings"), "vec_id",
          "embedding", 8, 0.2)
        .orderBy("id_a", "id_b")
    },

    // LSH-probed top-k: only the query's bucket is scanned.
    Q("q_v_lsh_topk",
      s"""WITH b AS (SELECT vec_id, embedding,
         |  CAST(${sqlBucket("embedding")} AS BIGINT) AS bucket
         |  FROM embeddings),
         |q AS (SELECT embedding AS qv, bucket AS qb FROM b WHERE vec_id = 0)
         |SELECT vec_id, ${sqlCosine("embedding", "qv")} AS cosine
         |FROM b, q WHERE bucket = qb
         |ORDER BY cosine DESC, vec_id LIMIT 10""".stripMargin) { (s, d) =>
      val q = t(s, d, "embeddings").filter(col("vec_id") === 0)
        .select(col("embedding").as("qvec"))
      Similarity.lshTopK(t(s, d, "embeddings"), "vec_id", "embedding",
          q, 8, 10)
        .select("vec_id", "cosine")
    },

    // Multi-probe LSH: the query's bucket plus all hamming-distance-1
    // buckets (9 probes at 8 planes) — recall recovered without extra
    // hash tables; the corpus side still joins on one bucket key.
    Q("q_v_lsh_multiprobe",
      s"""WITH b AS (SELECT vec_id, embedding,
         |  CAST(${sqlBucket("embedding")} AS BIGINT) AS bucket
         |  FROM embeddings),
         |q AS (SELECT embedding AS qv, bucket AS qb FROM b
         |  WHERE vec_id = 0),
         |pr AS (SELECT qv, xor(qb, f.f) AS bucket FROM q,
         |  (SELECT unnest([0, 1, 2, 4, 8, 16, 32, 64, 128]) AS f) f)
         |SELECT vec_id, ${sqlCosine("embedding", "qv")} AS cosine
         |FROM b JOIN pr USING (bucket)
         |ORDER BY cosine DESC, vec_id LIMIT 15""".stripMargin) { (s, d) =>
      val q = t(s, d, "embeddings").filter(col("vec_id") === 0)
        .select(col("embedding").as("qvec"))
      Similarity.lshMultiProbeTopK(t(s, d, "embeddings"), "vec_id",
          "embedding", q, 8, 15)
        .select("vec_id", "cosine")
    },

    // Binary quantization (V18): sign bit per dim packed into two
    // 32-dim half codes — 32× compression, the cheapest ANN scan.
    Q("q_v_bq_codes",
      s"""SELECT vec_id, ${sqlBqHalf("embedding", 1)} AS code_a,
         |  ${sqlBqHalf("embedding", 33)} AS code_b
         |FROM embeddings ORDER BY vec_id""".stripMargin) { (s, d) =>
      Similarity.binaryQuantize(t(s, d, "embeddings"), "embedding")
        .select(col("vec_id"), col("code_a"), col("code_b"))
        .orderBy("vec_id")
    },

    // BQ top-k: Hamming shortlist over packed codes (XOR+popcount),
    // exact cosine re-rank of the 50 candidates.
    Q("q_v_bq_topk",
      s"""WITH c AS (SELECT vec_id, embedding,
         |    ${sqlBqHalf("embedding", 1)} AS ca,
         |    ${sqlBqHalf("embedding", 33)} AS cb FROM embeddings),
         |q AS (SELECT embedding AS qv, ca AS qa, cb AS qb FROM c
         |  WHERE vec_id = 0),
         |h AS (SELECT c.vec_id, c.embedding, qv,
         |    CAST(bit_count(xor(ca, qa)) + bit_count(xor(cb, qb))
         |      AS BIGINT) AS hamming
         |  FROM c, q),
         |sl AS (SELECT * FROM h ORDER BY hamming, vec_id LIMIT 50)
         |SELECT vec_id, hamming,
         |  ${sqlCosine("embedding", "qv")} AS cosine
         |FROM sl ORDER BY cosine DESC, vec_id LIMIT 10""".stripMargin) {
      (s, d) =>
      val q = t(s, d, "embeddings").filter(col("vec_id") === 0)
        .select(col("embedding").as("qvec"))
      Similarity.bqTopK(t(s, d, "embeddings"), "vec_id", "embedding",
          q, 50, 10)
        .select(col("vec_id"), col("hamming").cast("long").as("hamming"),
          col("cosine"))
    },

    // BQ recall@10 vs the brute-force ground truth (shortlist 50).
    Q("q_v_bq_recall",
      s"""WITH c AS (SELECT vec_id, embedding,
         |    ${sqlBqHalf("embedding", 1)} AS ca,
         |    ${sqlBqHalf("embedding", 33)} AS cb FROM embeddings),
         |q AS (SELECT embedding AS qv, ca AS qa, cb AS qb FROM c
         |  WHERE vec_id = 0),
         |h AS (SELECT c.vec_id, c.embedding, qv,
         |    bit_count(xor(ca, qa)) + bit_count(xor(cb, qb)) AS hamming
         |  FROM c, q),
         |sl AS (SELECT * FROM h ORDER BY hamming, vec_id LIMIT 50),
         |approx AS (SELECT vec_id,
         |    ${sqlCosine("embedding", "qv")} AS cosine
         |  FROM sl ORDER BY cosine DESC, vec_id LIMIT 10),
         |q2 AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |exact AS (SELECT e.vec_id,
         |    ${sqlCosine("e.embedding", "qv")} AS cosine
         |  FROM embeddings e, q2
         |  ORDER BY cosine DESC, e.vec_id LIMIT 10),
         |hh AS (SELECT CAST(count(*) AS BIGINT) AS hits FROM exact
         |       WHERE vec_id IN (SELECT vec_id FROM approx))
         |SELECT CAST(10 AS BIGINT) AS k, hits,
         |  (hits * 1000) // 10 AS recall_milli
         |FROM hh""".stripMargin) { (s, d) =>
      val emb = t(s, d, "embeddings")
      val q = emb.filter(col("vec_id") === 0)
        .select(col("embedding").as("qvec"))
      val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        q, 10).select("vec_id")
      val approx = Similarity.bqTopK(emb, "vec_id", "embedding",
        q, 50, 10).select("vec_id")
      Similarity.recallAtK(exact, approx, "vec_id")
    },

    // MMR diversified top-k (V19): greedy λ·rel − (1−λ)·max-sim
    // re-rank of the 20-deep relevance shortlist, λ=0.7, k=4 — the
    // oracle unrolls the four greedy steps with the same micro-int
    // arithmetic (the kmeansIterSql technique).
    Q("q_v_mmr_topk", {
      def simMicro(a: String, b: String): String =
        s"CAST(floor(${sqlCosine(a, b)} * 1000000) AS BIGINT)"
      def pick(n: Int): String = {
        val prev = (1 until n).map(i => s"SELECT * FROM p$i")
          .mkString(" UNION ALL ")
        s"""m$n AS (SELECT c.vec_id, c.embedding, c.rel,
           |    700 * c.rel - 300 * (SELECT max(${simMicro("c.embedding",
            "p.embedding")})
           |      FROM ($prev) p) AS score
           |  FROM c0 c WHERE c.vec_id NOT IN
           |    (SELECT vec_id FROM ($prev))),
           |p$n AS (SELECT vec_id, embedding, rel, score FROM m$n
           |  ORDER BY score DESC, vec_id LIMIT 1)""".stripMargin
      }
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings
         |  WHERE vec_id = 0),
         |c0 AS (SELECT vec_id, embedding,
         |    CAST(floor(${sqlCosine("embedding", "qv")} * 1000000)
         |      AS BIGINT) AS rel
         |  FROM embeddings, q
         |  ORDER BY rel DESC, vec_id LIMIT 20),
         |p1 AS (SELECT vec_id, embedding, rel, 700 * rel AS score
         |  FROM c0 ORDER BY score DESC, vec_id LIMIT 1),
         |${pick(2)},
         |${pick(3)},
         |${pick(4)}
         |SELECT CAST(1 AS BIGINT) AS rank, vec_id, rel AS rel_micro,
         |  score AS score_micro FROM p1
         |UNION ALL SELECT 2, vec_id, rel, score FROM p2
         |UNION ALL SELECT 3, vec_id, rel, score FROM p3
         |UNION ALL SELECT 4, vec_id, rel, score FROM p4
         |ORDER BY rank""".stripMargin
    }) { (s, d) =>
      val q = t(s, d, "embeddings").filter(col("vec_id") === 0)
        .select(col("embedding").as("qvec"))
      Similarity.mmrTopK(t(s, d, "embeddings"), "vec_id", "embedding",
          q, 700, 20, 4)
        .orderBy("rank")
    },

    // BATCHED BQ serving (V20): one corpus code scan amortized over
    // a 3-query workload; Hamming-radius candidates (≤28 of 64)
    // shuffle, not the N×Q cross; per-query exact re-rank to top-5,
    // then the per-query recall harness against the exact batch
    // search — the approximation priced per query, not averaged.
    Q("q_v_bq_batch_recall",
      s"""WITH c AS (SELECT vec_id, embedding,
         |    ${sqlBqHalf("embedding", 1)} AS ca,
         |    ${sqlBqHalf("embedding", 33)} AS cb FROM embeddings),
         |q AS (SELECT vec_id AS qid, embedding AS qv, ca AS qa,
         |    cb AS qb FROM c WHERE vec_id < 3),
         |cand AS (SELECT q.qid, c.vec_id, c.embedding, q.qv,
         |    bit_count(xor(c.ca, q.qa)) + bit_count(xor(c.cb, q.qb))
         |      AS ham
         |  FROM c, q),
         |near AS (SELECT * FROM cand WHERE ham <= 28),
         |approx AS (SELECT qid, vec_id, row_number() OVER (
         |    PARTITION BY qid ORDER BY
         |      ${sqlCosine("embedding", "qv")} DESC, vec_id) AS rk
         |  FROM near),
         |a5 AS (SELECT qid, vec_id FROM approx WHERE rk <= 5),
         |exact AS (SELECT q.qid, e.vec_id, row_number() OVER (
         |    PARTITION BY q.qid ORDER BY
         |      ${sqlCosine("e.embedding", "q.qv")} DESC, e.vec_id) AS rk
         |  FROM embeddings e, q),
         |e5 AS (SELECT qid, vec_id FROM exact WHERE rk <= 5),
         |h AS (SELECT e5.qid, CAST(count(a5.vec_id) AS BIGINT) AS hits
         |  FROM e5 LEFT JOIN a5 ON e5.qid = a5.qid
         |    AND e5.vec_id = a5.vec_id
         |  GROUP BY 1)
         |SELECT qid, CAST(5 AS BIGINT) AS k, hits,
         |  (hits * 1000) // 5 AS recall_milli
         |FROM h ORDER BY qid""".stripMargin) { (s, d) =>
      val emb = t(s, d, "embeddings")
      val qs = emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val approx = Similarity.bqBatchTopK(emb, "vec_id", "embedding",
        qs, "qid", 28, 5).select("qid", "vec_id")
      val exact = Similarity.batchTopK(emb, "vec_id", "embedding",
        qs, 5).select("qid", "vec_id")
      Similarity.recallAtKByQuery(exact, approx, "qid", "vec_id")
        .select(col("qid"), col("k"), col("hits"), col("recall_milli"))
        .orderBy("qid")
    },

    // BQ RADIUS TUNING CURVE (V25): recall@5 over a 3-query batch for
    // EVERY Hamming radius 0..32 from ONE code scan + ONE exact
    // scoring pass (each candidate fans out to the radii that admit
    // it) — prices the maxHamming dial the way q_v_recall_curve
    // prices nProbe; the serving path most likely to run at 100 TB
    // finally gets its dial priced from a single pass.
    Q("q_v_bq_radius_curve",
      s"""WITH c AS (SELECT vec_id, embedding,
         |    ${sqlBqHalf("embedding", 1)} AS ca,
         |    ${sqlBqHalf("embedding", 33)} AS cb FROM embeddings),
         |q AS (SELECT vec_id AS qid, embedding AS qv, ca AS qa,
         |    cb AS qb FROM c WHERE vec_id < 3),
         |cand AS (SELECT q.qid, c.vec_id,
         |    bit_count(xor(c.ca, q.qa)) + bit_count(xor(c.cb, q.qb))
         |      AS ham,
         |    ${sqlCosine("c.embedding", "q.qv")} AS cosine
         |  FROM c, q),
         |near AS (SELECT * FROM cand WHERE ham <= 32),
         |sw AS (SELECT qid, vec_id, cosine,
         |    unnest(range(ham, 33)) AS radius FROM near),
         |ap0 AS (SELECT qid, radius, vec_id, row_number() OVER (
         |    PARTITION BY qid, radius ORDER BY cosine DESC, vec_id)
         |    AS rn FROM sw),
         |ap AS (SELECT qid, radius, vec_id FROM ap0 WHERE rn <= 5),
         |ex0 AS (SELECT q.qid, e.vec_id, row_number() OVER (
         |    PARTITION BY q.qid ORDER BY
         |      ${sqlCosine("e.embedding", "q.qv")} DESC, e.vec_id)
         |    AS rn FROM embeddings e, q),
         |ex AS (SELECT qid, vec_id FROM ex0 WHERE rn <= 5),
         |h AS (SELECT radius, CAST(count(*) AS BIGINT) AS hits
         |  FROM ap JOIN ex ON ap.qid = ex.qid
         |    AND ap.vec_id = ex.vec_id
         |  GROUP BY 1),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS total FROM ex),
         |spine AS (SELECT unnest(range(0, 33)) AS radius)
         |SELECT CAST(spine.radius AS BIGINT) AS radius,
         |  coalesce(h.hits, 0) AS hits, tot.total,
         |  (coalesce(h.hits, 0) * 1000) // tot.total AS recall_milli
         |FROM spine LEFT JOIN h ON spine.radius = h.radius, tot
         |ORDER BY radius""".stripMargin) { (s, d) =>
      val emb = t(s, d, "embeddings")
      val qs = emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      Similarity.bqRecallCurve(emb, "vec_id", "embedding", qs, 32, 5)
        .orderBy("radius")
    },

    // E2E INDEX SERVING (E8): the vector corpus lives in a manifest
    // table — base commit (even ids) + delta append (odd ids) — and
    // the batched BQ search serves the LATEST snapshot: the
    // index-refresh loop (L5 commits) feeding the serving path (V20)
    // with no rebuild step, because BQ codes are computed on scan.
    // Oracle recomputes the same search over the full corpus.
    Q("q_e2e_index_serve",
      s"""WITH c AS (SELECT vec_id, embedding,
         |    ${sqlBqHalf("embedding", 1)} AS ca,
         |    ${sqlBqHalf("embedding", 33)} AS cb FROM embeddings),
         |q AS (SELECT vec_id AS qid, embedding AS qv, ca AS qa,
         |    cb AS qb FROM c WHERE vec_id < 2),
         |cand AS (SELECT q.qid, c.vec_id, c.embedding, q.qv,
         |    bit_count(xor(c.ca, q.qa)) + bit_count(xor(c.cb, q.qb))
         |      AS ham
         |  FROM c, q),
         |near AS (SELECT * FROM cand WHERE ham <= 28),
         |ranked AS (SELECT qid, vec_id, ham, row_number() OVER (
         |    PARTITION BY qid ORDER BY
         |      ${sqlCosine("embedding", "qv")} DESC, vec_id) AS rk,
         |    ${sqlCosine("embedding", "qv")} AS cosine
         |  FROM near)
         |SELECT qid, vec_id, CAST(ham AS BIGINT) AS hamming, cosine
         |FROM ranked WHERE rk <= 5
         |ORDER BY qid, cosine DESC, vec_id""".stripMargin) { (s, d) =>
      val table = workDir("graft-index-serve")
      val emb = t(s, d, "embeddings")
      graft.sources.ManifestTable.commit(
        emb.filter(col("vec_id") % 2 === 0), table, append = false)
      graft.sources.ManifestTable.commit(
        emb.filter(col("vec_id") % 2 === 1), table, append = true)
      val corpus = graft.sources.ManifestTable.read(s, table)
      val qs = emb.filter(col("vec_id") < 2)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      Similarity.bqBatchTopK(corpus, "vec_id", "embedding", qs,
          "qid", 28, 5)
        .select(col("qid"), col("vec_id"),
          col("hamming").cast("long").as("hamming"), col("cosine"))
        .orderBy(col("qid"), col("cosine").desc, col("vec_id"))
    },

    // E2E AUTO-TUNED SERVING (E12): the full tune-then-serve loop in
    // ONE declarative plan — bqRecallCurve prices every Hamming
    // radius on a calibration batch, a tiny aggregate picks the
    // CHEAPEST radius with recall@5 ≥ 0.9 (fallback: full sweep
    // width), and bqBatchTopKTuned serves the batch with that dial;
    // no driver round-trip between tuning and serving. The oracle
    // replays curve → argmin → serve relationally.
    Q("q_e2e_autotuned_serve",
      s"""WITH c AS (SELECT vec_id, embedding,
         |    ${sqlBqHalf("embedding", 1)} AS ca,
         |    ${sqlBqHalf("embedding", 33)} AS cb FROM embeddings),
         |q AS (SELECT vec_id AS qid, embedding AS qv, ca AS qa,
         |    cb AS qb FROM c WHERE vec_id < 3),
         |cand AS (SELECT q.qid, c.vec_id,
         |    bit_count(xor(c.ca, q.qa)) + bit_count(xor(c.cb, q.qb))
         |      AS ham,
         |    ${sqlCosine("c.embedding", "q.qv")} AS cosine
         |  FROM c, q),
         |near AS (SELECT * FROM cand WHERE ham <= 32),
         |sw AS (SELECT qid, vec_id, cosine,
         |    unnest(range(ham, 33)) AS radius FROM near),
         |ap0 AS (SELECT qid, radius, vec_id, row_number() OVER (
         |    PARTITION BY qid, radius ORDER BY cosine DESC, vec_id)
         |    AS rn FROM sw),
         |ap AS (SELECT qid, radius, vec_id FROM ap0 WHERE rn <= 5),
         |ex0 AS (SELECT q.qid, e.vec_id, row_number() OVER (
         |    PARTITION BY q.qid ORDER BY
         |      ${sqlCosine("e.embedding", "q.qv")} DESC, e.vec_id)
         |    AS rn FROM embeddings e, q),
         |ex AS (SELECT qid, vec_id FROM ex0 WHERE rn <= 5),
         |h AS (SELECT radius, CAST(count(*) AS BIGINT) AS hits
         |  FROM ap JOIN ex ON ap.qid = ex.qid
         |    AND ap.vec_id = ex.vec_id
         |  GROUP BY 1),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS total FROM ex),
         |dial AS (SELECT CAST(coalesce(min(radius), 32) AS BIGINT)
         |    AS radius
         |  FROM h, tot WHERE (h.hits * 1000) // tot.total >= 900),
         |serve AS (SELECT cand.qid, cand.vec_id, cand.ham,
         |    cand.cosine, dial.radius, row_number() OVER (
         |      PARTITION BY cand.qid
         |      ORDER BY cand.cosine DESC, cand.vec_id) AS rk
         |  FROM cand, dial WHERE cand.ham <= dial.radius)
         |SELECT qid, vec_id, CAST(ham AS BIGINT) AS hamming, cosine,
         |  radius
         |FROM serve WHERE rk <= 5
         |ORDER BY qid, cosine DESC, vec_id""".stripMargin) { (s, d) =>
      val emb = t(s, d, "embeddings")
      val qs = emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val curve = Similarity.bqRecallCurve(emb, "vec_id", "embedding",
        qs, 32, 5)
      val dial = curve.filter(col("recall_milli") >= 900)
        .agg(coalesce(min(col("radius")), lit(32L)).as("radius"))
      Similarity.bqBatchTopKTuned(emb, "vec_id", "embedding", qs,
          "qid", dial, 5)
        .select(col("qid"), col("vec_id"),
          col("hamming").cast("long").as("hamming"), col("cosine"),
          col("radius"))
        .orderBy(col("qid"), col("cosine").desc, col("vec_id"))
    },

    // IVF inverted-list assignment (deterministic seed centroids).
    Q("q_v_ivf_assign",
      s"""WITH c AS (SELECT vec_id AS cid, embedding AS cv
         |           FROM embeddings WHERE vec_id < 16),
         |d AS (SELECT e.vec_id, c.cid,
         |        -(${sqlCosine("e.embedding", "c.cv")}) AS dist
         |      FROM embeddings e, c),
         |r AS (SELECT vec_id, cid,
         |        row_number() OVER (PARTITION BY vec_id
         |                           ORDER BY dist, cid) AS rn FROM d)
         |SELECT vec_id, cid AS centroid_id FROM r WHERE rn = 1
         |ORDER BY vec_id""".stripMargin) { (s, d) =>
      Similarity.ivfAssign(t(s, d, "embeddings"), "vec_id", "embedding", 16)
        .orderBy("vec_id")
    },

    // IVF-probed top-k (nProbe nearest inverted lists only).
    Q("q_v_ivf_topk",
      s"""WITH c AS (SELECT vec_id AS cid, embedding AS cv
         |           FROM embeddings WHERE vec_id < 16),
         |d AS (SELECT e.vec_id, c.cid,
         |        -(${sqlCosine("e.embedding", "c.cv")}) AS dist
         |      FROM embeddings e, c),
         |r AS (SELECT vec_id, cid,
         |        row_number() OVER (PARTITION BY vec_id
         |                           ORDER BY dist, cid) AS rn FROM d),
         |assign AS (SELECT vec_id, cid FROM r WHERE rn = 1),
         |qd AS (SELECT cid, row_number() OVER (ORDER BY dist, cid) AS qrn
         |       FROM d WHERE vec_id = 0),
         |probe AS (SELECT cid FROM qd WHERE qrn <= 4),
         |cand AS (SELECT a.vec_id FROM assign a
         |         JOIN probe p ON a.cid = p.cid),
         |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
         |SELECT e.vec_id, ${sqlCosine("e.embedding", "qv")} AS cosine
         |FROM embeddings e JOIN cand ON e.vec_id = cand.vec_id, q
         |ORDER BY cosine DESC, e.vec_id LIMIT 10""".stripMargin) { (s, d) =>
      val q = t(s, d, "embeddings").filter(col("vec_id") === 0)
        .select(col("embedding").as("qvec"))
      Similarity.ivfTopK(t(s, d, "embeddings"), "vec_id", "embedding",
        q, 16, 4, 10)
    },

    // FILTERED ANN: IVF search under a metadata predicate (label = 3)
    // — the filtered-vector-search serving problem. Pre-filter
    // semantics (every hit satisfies the predicate, scores exact);
    // the probe count is raised to 6 because a selective filter thins
    // each probed list — the explicit recall dial.
    Q("q_v_ivf_filtered",
      s"""WITH c AS (SELECT vec_id AS cid, embedding AS cv
         |           FROM embeddings WHERE vec_id < 16),
         |d AS (SELECT e.vec_id, c.cid,
         |        -(${sqlCosine("e.embedding", "c.cv")}) AS dist
         |      FROM embeddings e, c),
         |r AS (SELECT vec_id, cid,
         |        row_number() OVER (PARTITION BY vec_id
         |                           ORDER BY dist, cid) AS rn FROM d),
         |assign AS (SELECT vec_id, cid FROM r WHERE rn = 1),
         |qd AS (SELECT cid, row_number() OVER (ORDER BY dist, cid) AS qrn
         |       FROM d WHERE vec_id = 0),
         |probe AS (SELECT cid FROM qd WHERE qrn <= 6),
         |cand AS (SELECT a.vec_id FROM assign a
         |         JOIN probe p ON a.cid = p.cid),
         |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
         |SELECT e.vec_id, ${sqlCosine("e.embedding", "qv")} AS cosine
         |FROM embeddings e JOIN cand ON e.vec_id = cand.vec_id, q
         |WHERE e.label = 3
         |ORDER BY cosine DESC, e.vec_id LIMIT 10""".stripMargin) {
      (s, d) =>
      val q = t(s, d, "embeddings").filter(col("vec_id") === 0)
        .select(col("embedding").as("qvec"))
      Similarity.ivfTopKFiltered(t(s, d, "embeddings"), "vec_id",
        "embedding", q, 16, 6, 10, col("label") === 3)
    },

    // BATCHED FILTERED ANN: the multi-query IVF serving surface —
    // a 3-query batch against the same filtered index, every ranking
    // window partitioned by qid (a global orderBy would pick one
    // top-nProbe across the whole batch and serialize it); one
    // assignment pass amortized over the batch.
    Q("q_v_ivf_filtered_batch",
      s"""WITH c AS (SELECT vec_id AS cid, embedding AS cv
         |           FROM embeddings WHERE vec_id < 16),
         |q AS (SELECT vec_id AS qid, embedding AS qv
         |      FROM embeddings WHERE vec_id < 3),
         |d AS (SELECT e.vec_id, c.cid,
         |        -(${sqlCosine("e.embedding", "c.cv")}) AS dist
         |      FROM embeddings e, c),
         |r AS (SELECT vec_id, cid,
         |        row_number() OVER (PARTITION BY vec_id
         |                           ORDER BY dist, cid) AS rn FROM d),
         |assign AS (SELECT vec_id, cid FROM r WHERE rn = 1),
         |qd AS (SELECT q.qid, c.cid, row_number() OVER (
         |        PARTITION BY q.qid
         |        ORDER BY -(${sqlCosine("q.qv", "c.cv")}), c.cid)
         |        AS qrn FROM q, c),
         |probe AS (SELECT qid, cid FROM qd WHERE qrn <= 6),
         |cand AS (SELECT p.qid, a.vec_id FROM assign a
         |         JOIN probe p ON a.cid = p.cid),
         |sc AS (SELECT cand.qid, e.vec_id,
         |    ${sqlCosine("e.embedding", "q.qv")} AS cosine
         |  FROM embeddings e JOIN cand ON e.vec_id = cand.vec_id
         |                    JOIN q ON q.qid = cand.qid
         |  WHERE e.label = 3),
         |rk AS (SELECT *, row_number() OVER (PARTITION BY qid
         |    ORDER BY cosine DESC, vec_id) AS rn FROM sc)
         |SELECT qid, vec_id, cosine FROM rk WHERE rn <= 5
         |ORDER BY qid, cosine DESC, vec_id""".stripMargin) { (s, d) =>
      val emb = t(s, d, "embeddings")
      val qs = emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val cents = emb.filter(col("vec_id") < 16)
        .select(col("vec_id").as("cid"), col("embedding").as("cv"))
      Similarity.ivfTopKBatch(emb, "vec_id", "embedding", qs, cents,
          6, 5, col("label") === 3)
        .orderBy(col("qid"), col("cosine").desc, col("vec_id"))
    },

    // ANN TUNING: recall@10 of the IVF(16 lists, 4 probes) search
    // against brute-force ground truth — the harness a user sweeps
    // nProbe with. Exact integer milli so a recall threshold is
    // engine-independent; the harness's own cost is k-sized.
    Q("q_v_recall_ivf",
      s"""WITH c AS (SELECT vec_id AS cid, embedding AS cv
         |           FROM embeddings WHERE vec_id < 16),
         |d AS (SELECT e.vec_id, c.cid,
         |        -(${sqlCosine("e.embedding", "c.cv")}) AS dist
         |      FROM embeddings e, c),
         |r AS (SELECT vec_id, cid,
         |        row_number() OVER (PARTITION BY vec_id
         |                           ORDER BY dist, cid) AS rn FROM d),
         |assign AS (SELECT vec_id, cid FROM r WHERE rn = 1),
         |qd AS (SELECT cid, row_number() OVER (ORDER BY dist, cid) AS qrn
         |       FROM d WHERE vec_id = 0),
         |probe AS (SELECT cid FROM qd WHERE qrn <= 4),
         |cand AS (SELECT a.vec_id FROM assign a
         |         JOIN probe p ON a.cid = p.cid),
         |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |approx AS (SELECT e.vec_id,
         |    ${sqlCosine("e.embedding", "qv")} AS cosine
         |  FROM embeddings e JOIN cand ON e.vec_id = cand.vec_id, q
         |  ORDER BY cosine DESC, e.vec_id LIMIT 10),
         |exact AS (SELECT e.vec_id,
         |    ${sqlCosine("e.embedding", "qv")} AS cosine
         |  FROM embeddings e, q
         |  ORDER BY cosine DESC, e.vec_id LIMIT 10),
         |h AS (SELECT CAST(count(*) AS BIGINT) AS hits FROM exact
         |      WHERE vec_id IN (SELECT vec_id FROM approx))
         |SELECT CAST(10 AS BIGINT) AS k, hits,
         |  (hits * 1000) // 10 AS recall_milli
         |FROM h""".stripMargin) { (s, d) =>
      val emb = t(s, d, "embeddings")
      val q = emb.filter(col("vec_id") === 0)
        .select(col("embedding").as("qvec"))
      val exact = Similarity.bruteForceTopK(emb, "vec_id",
        "embedding", q, 10)
      val approx = Similarity.ivfTopK(emb, "vec_id", "embedding",
        q, 16, 4, 10)
      Similarity.recallAtK(exact, approx, "vec_id")
    },

    // BITEXT MINING (Artetxe & Schwenk 2019): margin-scored pair
    // extraction across the even/odd embedding sides — cos normalized
    // by both endpoints' kNN-average density, which demotes hubs.
    // Forward-mined: best-margin candidate per left anchor, kept when
    // margin > 1.02. Both kNN averages fold cosines in rank order.
    Q("q_v_bitext_margin",
      s"""WITH l AS (SELECT vec_id AS lid, embedding AS lv
         |           FROM embeddings WHERE vec_id % 2 = 0),
         |r AS (SELECT vec_id AS rid, embedding AS rv
         |      FROM embeddings WHERE vec_id % 2 = 1),
         |sc AS (SELECT lid, rid, ${sqlCosine("lv", "rv")} AS cosine
         |       FROM l, r),
         |rk AS (SELECT *, row_number() OVER (PARTITION BY lid
         |      ORDER BY cosine DESC, rid) AS f,
         |    row_number() OVER (PARTITION BY rid
         |      ORDER BY cosine DESC, lid) AS b FROM sc),
         |ax AS (SELECT lid, list_reduce(
         |      list_concat([CAST(0.0 AS DOUBLE)],
         |        list(cosine ORDER BY f)), (x,y) -> x+y) / count(*)
         |      AS ax FROM rk WHERE f <= 4 GROUP BY lid),
         |ay AS (SELECT rid, list_reduce(
         |      list_concat([CAST(0.0 AS DOUBLE)],
         |        list(cosine ORDER BY b)), (x,y) -> x+y) / count(*)
         |      AS ay FROM rk WHERE b <= 4 GROUP BY rid),
         |m AS (SELECT rk.lid, rk.rid, rk.cosine,
         |    rk.cosine / ((ax.ax + ay.ay) / 2) AS margin
         |  FROM rk JOIN ax ON rk.lid = ax.lid
         |           JOIN ay ON rk.rid = ay.rid WHERE rk.f <= 4),
         |t AS (SELECT *, row_number() OVER (PARTITION BY lid
         |    ORDER BY margin DESC, rid) AS rn FROM m)
         |SELECT lid AS left_id, rid AS right_id, cosine, margin
         |FROM t WHERE rn = 1 AND margin > 1.02
         |ORDER BY left_id""".stripMargin) { (s, d) =>
      bitextExact(s, d).orderBy("left_id")
    },

    // ANN-SHORTLIST BITEXT MINING: the CCMatrix-scale path — the
    // candidate pairs come from TWO bqBatchTopK code scans (forward:
    // right corpus × left queries; backward: mirrored), unioned, and
    // the SAME margin arithmetic runs on the shortlist
    // (bitextMarginMineWith). Graded as a recall/precision report
    // against the exact cross-product miner — the approximation is
    // priced, not eyeballed (the q_d_lsh_recall discipline).
    Q("q_v_bitext_margin_ann",
      s"""WITH l AS (SELECT vec_id AS lid, embedding AS lv
         |           FROM embeddings WHERE vec_id % 2 = 0),
         |r AS (SELECT vec_id AS rid, embedding AS rv
         |      FROM embeddings WHERE vec_id % 2 = 1),
         |sc AS (SELECT lid, rid, ${sqlCosine("lv", "rv")} AS cosine
         |       FROM l, r),
         |rk AS (SELECT *, row_number() OVER (PARTITION BY lid
         |      ORDER BY cosine DESC, rid) AS f,
         |    row_number() OVER (PARTITION BY rid
         |      ORDER BY cosine DESC, lid) AS b FROM sc),
         |ax AS (SELECT lid, list_reduce(
         |      list_concat([CAST(0.0 AS DOUBLE)],
         |        list(cosine ORDER BY f)), (x,y) -> x+y) / count(*)
         |      AS ax FROM rk WHERE f <= 4 GROUP BY lid),
         |ay AS (SELECT rid, list_reduce(
         |      list_concat([CAST(0.0 AS DOUBLE)],
         |        list(cosine ORDER BY b)), (x,y) -> x+y) / count(*)
         |      AS ay FROM rk WHERE b <= 4 GROUP BY rid),
         |m AS (SELECT rk.lid, rk.rid, rk.cosine,
         |    rk.cosine / ((ax.ax + ay.ay) / 2) AS margin
         |  FROM rk JOIN ax ON rk.lid = ax.lid
         |           JOIN ay ON rk.rid = ay.rid WHERE rk.f <= 4),
         |te AS (SELECT *, row_number() OVER (PARTITION BY lid
         |    ORDER BY margin DESC, rid) AS rn FROM m),
         |ex AS (SELECT lid, rid FROM te WHERE rn = 1 AND margin > 1.02),
         |lc AS (SELECT lid, lv, ${sqlBqHalf("lv", 1)} AS la,
         |       ${sqlBqHalf("lv", 33)} AS lb FROM l),
         |rc AS (SELECT rid, rv, ${sqlBqHalf("rv", 1)} AS ra,
         |       ${sqlBqHalf("rv", 33)} AS rb FROM r),
         |near AS (SELECT lid, rid,
         |    ${sqlCosine("lv", "rv")} AS cosine
         |  FROM lc, rc
         |  WHERE bit_count(xor(la, ra)) + bit_count(xor(lb, rb)) <= 28),
         |fw AS (SELECT lid, rid, cosine, row_number() OVER (
         |    PARTITION BY lid ORDER BY cosine DESC, rid) AS rn
         |  FROM near),
         |bw AS (SELECT lid, rid, cosine, row_number() OVER (
         |    PARTITION BY rid ORDER BY cosine DESC, lid) AS rn
         |  FROM near),
         |cands AS (SELECT lid, rid, max(cosine) AS cosine FROM (
         |    SELECT lid, rid, cosine FROM fw WHERE rn <= 8
         |    UNION ALL
         |    SELECT lid, rid, cosine FROM bw WHERE rn <= 8) u
         |  GROUP BY 1, 2),
         |rk2 AS (SELECT *, row_number() OVER (PARTITION BY lid
         |      ORDER BY cosine DESC, rid) AS f,
         |    row_number() OVER (PARTITION BY rid
         |      ORDER BY cosine DESC, lid) AS b FROM cands),
         |ax2 AS (SELECT lid, list_reduce(
         |      list_concat([CAST(0.0 AS DOUBLE)],
         |        list(cosine ORDER BY f)), (x,y) -> x+y) / count(*)
         |      AS ax FROM rk2 WHERE f <= 4 GROUP BY lid),
         |ay2 AS (SELECT rid, list_reduce(
         |      list_concat([CAST(0.0 AS DOUBLE)],
         |        list(cosine ORDER BY b)), (x,y) -> x+y) / count(*)
         |      AS ay FROM rk2 WHERE b <= 4 GROUP BY rid),
         |m2 AS (SELECT rk2.lid, rk2.rid, rk2.cosine,
         |    rk2.cosine / ((ax2.ax + ay2.ay) / 2) AS margin
         |  FROM rk2 JOIN ax2 ON rk2.lid = ax2.lid
         |           JOIN ay2 ON rk2.rid = ay2.rid WHERE rk2.f <= 4),
         |ta AS (SELECT *, row_number() OVER (PARTITION BY lid
         |    ORDER BY margin DESC, rid) AS rn FROM m2),
         |ann AS (SELECT lid, rid FROM ta WHERE rn = 1 AND margin > 1.02),
         |ne AS (SELECT CAST(count(*) AS BIGINT) AS n_exact FROM ex),
         |na AS (SELECT CAST(count(*) AS BIGINT) AS n_ann FROM ann),
         |h AS (SELECT CAST(count(*) AS BIGINT) AS hits
         |      FROM ann JOIN ex ON ann.lid = ex.lid AND ann.rid = ex.rid)
         |SELECT n_exact, n_ann, hits,
         |  CASE WHEN n_exact > 0 THEN (hits * 1000) // n_exact
         |       ELSE 0 END AS recall_milli,
         |  CASE WHEN n_ann > 0 THEN (hits * 1000) // n_ann
         |       ELSE 0 END AS precision_milli
         |FROM ne, na, h""".stripMargin) { (s, d) =>
      val emb = t(s, d, "embeddings")
      val l = emb.filter(col("vec_id") % 2 === 0)
      val r = emb.filter(col("vec_id") % 2 === 1)
      val lq = l.select(col("vec_id").as("qid"),
        col("embedding").as("qvec"))
      val rq = r.select(col("vec_id").as("qid"),
        col("embedding").as("qvec"))
      val fw = Similarity.bqBatchTopK(r, "vec_id", "embedding",
          lq, "qid", 28, 8)
        .select(col("qid").as("lid"), col("vec_id").as("rid"),
          col("cosine"))
      val bw = Similarity.bqBatchTopK(l, "vec_id", "embedding",
          rq, "qid", 28, 8)
        .select(col("vec_id").as("lid"), col("qid").as("rid"),
          col("cosine"))
      // forward/backward cosines are bit-identical (commutative
      // products, same fold order), so max() is a pure dedup
      val cands = fw.unionByName(bw).groupBy("lid", "rid")
        .agg(max(col("cosine")).as("cosine"))
      val ann = Similarity.bitextMarginMineWith(cands, 4, 1.02)
        .select(col("left_id").as("lid"), col("right_id").as("rid"))
        .localCheckpoint(eager = false)
      val exact = bitextExact(s, d)
        .select(col("left_id").as("lid"), col("right_id").as("rid"))
      val hits = ann.join(exact, Seq("lid", "rid"), "left_semi")
        .agg(count(lit(1)).as("hits"))
      exact.agg(count(lit(1)).as("n_exact"))
        .crossJoin(ann.agg(count(lit(1)).as("n_ann")))
        .crossJoin(hits)
        .select(col("n_exact"), col("n_ann"), col("hits"),
          expr("CASE WHEN n_exact > 0 THEN (hits * 1000) div n_exact" +
            " ELSE 0L END").as("recall_milli"),
          expr("CASE WHEN n_ann > 0 THEN (hits * 1000) div n_ann" +
            " ELSE 0L END").as("precision_milli"))
    },

    // IVF TUNING CURVE: micro recall@10 over a 3-query batch for
    // EVERY nProbe in 1..4 from ONE assignment + scoring pass (each
    // candidate fans out to the probe depths that include it; a
    // per-(query, nprobe) window cuts the top-k) — the curve that
    // prices the serving dial, monotone by construction.
    Q("q_v_recall_curve",
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qvec
         |           FROM embeddings WHERE vec_id < 3),
         |c AS (SELECT vec_id AS cid, embedding AS cv
         |      FROM embeddings WHERE vec_id < 8),
         |a0 AS (SELECT e.vec_id, e.embedding, c.cid,
         |    row_number() OVER (PARTITION BY e.vec_id
         |      ORDER BY -(${sqlCosine("e.embedding", "c.cv")}), c.cid)
         |      AS rn
         |  FROM embeddings e, c),
         |asg AS (SELECT vec_id, embedding, cid FROM a0 WHERE rn = 1),
         |qr0 AS (SELECT q.qid, c.cid, q.qvec,
         |    row_number() OVER (PARTITION BY q.qid
         |      ORDER BY -(${sqlCosine("q.qvec", "c.cv")}), c.cid)
         |      AS crank FROM q, c),
         |qr AS (SELECT * FROM qr0 WHERE crank <= 4),
         |ex0 AS (SELECT q.qid, e.vec_id,
         |    row_number() OVER (PARTITION BY q.qid
         |      ORDER BY ${sqlCosine("e.embedding", "q.qvec")} DESC,
         |        e.vec_id) AS rn
         |  FROM embeddings e, q),
         |ex AS (SELECT qid, vec_id FROM ex0 WHERE rn <= 10),
         |cand AS (SELECT qr.qid, asg.vec_id, qr.crank,
         |    ${sqlCosine("asg.embedding", "qr.qvec")} AS cosine
         |  FROM asg JOIN qr ON asg.cid = qr.cid),
         |sw AS (SELECT qid, vec_id, cosine,
         |    unnest(range(crank, 5)) AS nprobe FROM cand),
         |ap0 AS (SELECT qid, nprobe, vec_id, row_number() OVER (
         |    PARTITION BY qid, nprobe ORDER BY cosine DESC, vec_id)
         |    AS rn FROM sw),
         |ap AS (SELECT qid, nprobe, vec_id FROM ap0 WHERE rn <= 10),
         |h AS (SELECT nprobe, count(*) AS hits FROM ap
         |  JOIN ex ON ap.qid = ex.qid AND ap.vec_id = ex.vec_id
         |  GROUP BY 1),
         |tot AS (SELECT count(*) AS total FROM ex)
         |SELECT CAST(d.range AS BIGINT) AS nprobe,
         |  CAST(coalesce(h.hits, 0) AS BIGINT) AS hits,
         |  CAST(tot.total AS BIGINT) AS total,
         |  (CAST(coalesce(h.hits, 0) AS BIGINT) * 1000)
         |    // CAST(tot.total AS BIGINT) AS recall_milli
         |FROM range(1, 5) d LEFT JOIN h ON d.range = h.nprobe, tot
         |ORDER BY nprobe""".stripMargin) { (s, d) =>
      val emb = t(s, d, "embeddings")
      val qs = emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      Similarity.ivfRecallCurve(emb, "vec_id", "embedding", qs,
          nCentroids = 8, maxProbe = 4, k = 10)
        .orderBy("nprobe")
    },

    // Johnson-Lindenstrauss random projection (Achlioptas 2001 sign
    // matrix): 64 → 4 dims as a narrow per-row map. The oracle embeds
    // the SAME driver-derived sign literals the Spark plan ships
    // (Similarity.rpSigns), so the two sides cannot drift.
    Q("q_v_rp_project", {
      val sg = Similarity.rpSigns(4, 64)
      s"""SELECT vec_id,
         |  ${sqlRpDim("embedding", sg(0))} AS p0,
         |  ${sqlRpDim("embedding", sg(1))} AS p1,
         |  ${sqlRpDim("embedding", sg(2))} AS p2,
         |  ${sqlRpDim("embedding", sg(3))} AS p3
         |FROM embeddings ORDER BY vec_id""".stripMargin
    }) { (s, d) =>
      Similarity.randomProject(t(s, d, "embeddings"), "embedding", 64, 4)
        .select(col("vec_id"), col("proj")(0).as("p0"),
          col("proj")(1).as("p1"), col("proj")(2).as("p2"),
          col("proj")(3).as("p3"))
        .orderBy("vec_id")
    },

    // JL-projected ANN quality: recall@20 of the 8-dim projected-space
    // top-k against the exact full-space top-k — the harness that
    // answers "how few dims can the shortlist stage afford" before
    // committing the 8× narrower vectors to the index.
    Q("q_v_rp_recall", {
      val sg = Similarity.rpSigns(8, 64)
      val pv = (0 until 8).map(p => sqlRpDim("e.embedding", sg(p)))
        .mkString("[", ",\n         |    ", "]")
      val pq = (0 until 8).map(p => sqlRpDim("qv", sg(p)))
        .mkString("[", ",\n         |    ", "]")
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |pr AS (SELECT e.vec_id, $pv AS pv FROM embeddings e),
         |pq AS (SELECT $pq AS pqv FROM q),
         |approx AS (SELECT vec_id, ${sqlCosine("pv", "pqv")} AS cosine
         |  FROM pr, pq ORDER BY cosine DESC, vec_id LIMIT 20),
         |exact AS (SELECT e.vec_id, ${sqlCosine("e.embedding", "qv")} AS cosine
         |  FROM embeddings e, q ORDER BY cosine DESC, e.vec_id LIMIT 20),
         |h AS (SELECT CAST(count(*) AS BIGINT) AS hits FROM exact
         |      WHERE vec_id IN (SELECT vec_id FROM approx))
         |SELECT CAST(20 AS BIGINT) AS k, hits,
         |  (hits * 1000) // 20 AS recall_milli
         |FROM h""".stripMargin
    }) { (s, d) =>
      val emb = t(s, d, "embeddings")
      val q = emb.filter(col("vec_id") === 0)
        .select(col("embedding").as("qvec"))
      val exact = Similarity.bruteForceTopK(emb, "vec_id",
        "embedding", q, 20)
      val approx = Similarity.rpTopK(emb, "vec_id", "embedding", 64,
        q, 8, 20)
      Similarity.recallAtK(exact, approx, "vec_id")
    },

    // JL two-stage: shortlist 100 in 8-dim projected space, exact
    // full-dimension rerank of only those — the production recipe
    // (generous shortlist buys back the JL distortion the bare
    // projected top-k loses; compare recall here vs q_v_rp_recall).
    Q("q_v_rp_refine", {
      val sg = Similarity.rpSigns(8, 64)
      val pv = (0 until 8).map(p => sqlRpDim("e.embedding", sg(p)))
        .mkString("[", ",\n         |    ", "]")
      val pq = (0 until 8).map(p => sqlRpDim("qv", sg(p)))
        .mkString("[", ",\n         |    ", "]")
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |pr AS (SELECT e.vec_id, $pv AS pv FROM embeddings e),
         |pq AS (SELECT $pq AS pqv FROM q),
         |cand AS (SELECT vec_id, ${sqlCosine("pv", "pqv")} AS pcos
         |  FROM pr, pq ORDER BY pcos DESC, vec_id LIMIT 100),
         |approx AS (SELECT e.vec_id, ${sqlCosine("e.embedding", "qv")} AS cosine
         |  FROM embeddings e JOIN cand USING (vec_id), q
         |  ORDER BY cosine DESC, e.vec_id LIMIT 20),
         |exact AS (SELECT e.vec_id, ${sqlCosine("e.embedding", "qv")} AS cosine
         |  FROM embeddings e, q ORDER BY cosine DESC, e.vec_id LIMIT 20),
         |h AS (SELECT CAST(count(*) AS BIGINT) AS hits FROM exact
         |      WHERE vec_id IN (SELECT vec_id FROM approx))
         |SELECT CAST(20 AS BIGINT) AS k, hits,
         |  (hits * 1000) // 20 AS recall_milli
         |FROM h""".stripMargin
    }) { (s, d) =>
      val emb = t(s, d, "embeddings")
      val q = emb.filter(col("vec_id") === 0)
        .select(col("embedding").as("qvec"))
      val exact = Similarity.bruteForceTopK(emb, "vec_id",
        "embedding", q, 20)
      val approx = Similarity.rpRefineTopK(emb, "vec_id", "embedding",
        64, q, 8, 100, 20)
      Similarity.recallAtK(exact, approx, "vec_id")
    },

    // IVF + PQ composed — the full billion-scale ANN recipe: route
    // the query to its 4 nearest inverted lists, then score only
    // those lists' vectors by asymmetric PQ distance (broadcast LUT
    // over (id, sub, code) rows). Nothing outside the probed lists is
    // read, and nothing raw-vector-sized crosses the plan after
    // encode.
    Q("q_v_ivfpq_topk",
      s"""WITH $ivfPqCteSql
         |SELECT vec_id, adc_dist FROM sc
         |ORDER BY adc_dist, vec_id LIMIT 10""".stripMargin) { (s, d) =>
      val q = t(s, d, "embeddings").filter(col("vec_id") === 0)
        .select(col("embedding").as("qvec"))
      Similarity.ivfPqTopK(t(s, d, "embeddings"), "vec_id",
        "embedding", q, 16, 4, 8, 4, 16, 10)
    },

    // IVF + PQ + exact refine — the two-stage production endgame:
    // ADC narrows the probed lists to a 50-id pool, and only that
    // pool's raw vectors are read for the exact cosine re-rank
    // (bounded regardless of corpus size).
    Q("q_v_ivfpq_refine",
      s"""WITH $ivfPqCteSql,
         |pool AS (SELECT vec_id FROM sc
         |  ORDER BY adc_dist, vec_id LIMIT 50),
         |q2 AS (SELECT embedding AS qv2 FROM embeddings WHERE vec_id = 0)
         |SELECT e.vec_id, ${sqlCosine("e.embedding", "qv2")} AS cosine
         |FROM embeddings e JOIN pool ON pool.vec_id = e.vec_id, q2
         |ORDER BY cosine DESC, e.vec_id LIMIT 10""".stripMargin) { (s, d) =>
      val q = t(s, d, "embeddings").filter(col("vec_id") === 0)
        .select(col("embedding").as("qvec"))
      Similarity.ivfPqRefineTopK(t(s, d, "embeddings"), "vec_id",
        "embedding", q, 16, 4, 8, 4, 16, 50, 10)
    },

    // RETRIEVAL: materialized inverted index — df per term plus the
    // sorted posting list as CSV for terms at or under maxDf=390;
    // hotter terms keep df with a NULL list (df counts first, so a
    // stop term's corpus-sized list never reaches an aggregation
    // buffer — the serving layer intersects around it).
    Q("q_r_inverted_index",
      s"""WITH tt AS (SELECT DISTINCT doc_id,
         |    unnest(${sqlTokens("text")}) AS term FROM documents),
         |d AS (SELECT term, CAST(count(*) AS BIGINT) AS df
         |  FROM tt GROUP BY 1),
         |p AS (SELECT term, string_agg(CAST(doc_id AS VARCHAR), ','
         |    ORDER BY doc_id) AS csv FROM tt GROUP BY 1)
         |SELECT d.term, d.df,
         |  CASE WHEN d.df <= 390 THEN p.csv ELSE NULL END
         |    AS postings_csv
         |FROM d JOIN p USING (term) ORDER BY d.term""".stripMargin) {
      (s, d) =>
      graft.operators.Retrieval
        .invertedIndex(t(s, d, "documents"), "doc_id", "text", 390L)
        .orderBy("term")
    },

    // RETRIEVAL: incremental index maintenance — the doc_id < 250 and
    // >= 250 halves are indexed separately and MERGED (term-keyed
    // join of two vocabulary-sized tables; the corpus is never
    // re-read). Graded by the merge law itself: the oracle builds the
    // full-corpus index directly.
    Q("q_r_index_merge",
      s"""WITH tt AS (SELECT DISTINCT doc_id,
         |    unnest(${sqlTokens("text")}) AS term FROM documents),
         |d AS (SELECT term, CAST(count(*) AS BIGINT) AS df
         |  FROM tt GROUP BY 1),
         |p AS (SELECT term, string_agg(CAST(doc_id AS VARCHAR), ','
         |    ORDER BY doc_id) AS csv FROM tt GROUP BY 1)
         |SELECT d.term, d.df,
         |  CASE WHEN d.df <= 390 THEN p.csv ELSE NULL END
         |    AS postings_csv
         |FROM d JOIN p USING (term) ORDER BY d.term""".stripMargin) {
      (s, d) =>
      val docs = t(s, d, "documents")
      val ia = graft.operators.Retrieval.invertedIndex(
        docs.filter(col("doc_id") < 250), "doc_id", "text", 390L)
      val ib = graft.operators.Retrieval.invertedIndex(
        docs.filter(col("doc_id") >= 250), "doc_id", "text", 390L)
      graft.operators.Retrieval.mergeInvertedIndexes(ia, ib, 390L)
        .orderBy("term")
    },

    // RETRIEVAL: conjunctive (AND) Boolean search — documents
    // containing every query term. The tiny IN filter prunes the
    // exploded terms before the shuffle, so the aggregate moves at
    // most |query| rows per candidate document.
    Q("q_r_boolean_and",
      s"""SELECT doc_id AS doc FROM documents
         |WHERE list_contains(${sqlTokens("text")}, 'spark')
         |  AND list_contains(${sqlTokens("text")}, 'vector')
         |  AND list_contains(${sqlTokens("text")}, 'merge')
         |ORDER BY doc""".stripMargin) { (s, d) =>
      graft.operators.Retrieval
        .conjunctiveSearch(t(s, d, "documents"), "doc_id", "text",
          Seq("spark", "vector", "merge"))
        .orderBy("doc")
    },

    // RETRIEVAL (R4): exact phrase search over positional postings —
    // documents with "table hash" at CONSECUTIVE token positions,
    // with occurrence counts; the postings explode prunes to the
    // phrase's own terms before any shuffle, adjacency is a keyed
    // (doc, aligned-start) join chain. The oracle scans token arrays
    // directly — so the index formulation's equivalence to the naive
    // scan is itself graded.
    Q("q_r_phrase",
      s"""WITH tok AS (SELECT doc_id, ${sqlTokens("text")} AS t
         |  FROM documents),
         |m AS (SELECT doc_id AS doc, CAST(len(list_filter(
         |    range(1, len(t)), j -> t[j] = 'table'
         |      AND t[j+1] = 'hash')) AS BIGINT) AS n_matches
         |  FROM tok)
         |SELECT doc, n_matches FROM m WHERE n_matches > 0
         |ORDER BY doc""".stripMargin) { (s, d) =>
      graft.operators.Retrieval
        .phraseSearch(t(s, d, "documents"), "doc_id", "text",
          Seq("table", "hash"))
        .orderBy("doc")
    },

    // HYBRID RETRIEVAL: reciprocal-rank fusion of a keyword ranking
    // (token-match count for "vector join") and a vector ranking
    // (cosine vs query 0) — each retriever contributes its bounded
    // top-50 (TakeOrderedAndProject; the rank window runs over the
    // 50-row candidate list, never the corpus), fused in integer
    // micro-units so the blend is ulp-proof across engines.
    Q("q_r_hybrid_rrf",
      s"""WITH tok AS (SELECT doc_id, ${sqlTokens("text")} AS tk
         |  FROM documents),
         |ts AS (SELECT doc_id, len(list_filter(tk, x -> x = 'vector'))
         |    + len(list_filter(tk, x -> x = 'join')) AS score FROM tok),
         |tr AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC,
         |    doc_id) AS rank FROM ts),
         |tcand AS (SELECT doc_id, rank FROM tr WHERE rank <= 50),
         |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |vs AS (SELECT vec_id AS doc_id,
         |    ${sqlCosine("embedding", "qv")} AS c FROM embeddings, q),
         |vr AS (SELECT doc_id, row_number() OVER (ORDER BY c DESC,
         |    doc_id) AS rank FROM vs),
         |vcand AS (SELECT doc_id, rank FROM vr WHERE rank <= 50),
         |u AS (SELECT doc_id, 1000000 // (60 + rank) AS part FROM tcand
         |  UNION ALL SELECT doc_id, 1000000 // (60 + rank) FROM vcand)
         |SELECT doc_id, CAST(sum(part) AS BIGINT) AS rrf_micro,
         |  CAST(count(*) AS BIGINT) AS n_lists
         |FROM u GROUP BY doc_id
         |ORDER BY rrf_micro DESC, doc_id LIMIT 20""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val tk = graft.functions.tokens(col("text"))
      val ts = t(s, d, "documents").select(col("doc_id"),
        (size(filter(tk, x => x === "vector"))
          + size(filter(tk, x => x === "join"))).as("score"))
      val tcand = ts.orderBy(col("score").desc, col("doc_id")).limit(50)
        .withColumn("rank", row_number().over(
          Window.orderBy(col("score").desc, col("doc_id"))))
        .select("doc_id", "rank")
      val emb = t(s, d, "embeddings")
      val q = emb.filter(col("vec_id") === 0)
        .select(col("embedding").as("qvec"))
      val vs = emb.crossJoin(broadcast(q))
        .select(col("vec_id").as("doc_id"),
          graft.functions.cosineSimilarity(col("embedding"),
            col("qvec")).as("c"))
      val vcand = vs.orderBy(col("c").desc, col("doc_id")).limit(50)
        .withColumn("rank", row_number().over(
          Window.orderBy(col("c").desc, col("doc_id"))))
        .select("doc_id", "rank")
      Retrieval.rrfFuse(Seq(tcand, vcand), "doc_id", "rank")
        .orderBy(col("rrf_micro").desc, col("doc_id")).limit(20)
    },

    // RETRIEVAL EVAL: Recall@20 / MRR@20 / AP@20 per query — the
    // TREC-style harness a retrieval change ships behind. Three
    // term queries rank the corpus by occurrence count (desc,
    // doc_id tie-break); relevance is DECORRELATED from the rank
    // signal (term present AND n_chars divisible by 3), so the run
    // interleaves relevant and non-relevant docs and all three
    // metrics move. Every metric is the documented integer milli law
    // (per-term floors, floored mean) so the hash is engine-exact —
    // no IEEE log2/ulp in the gradebook. The evaluation itself is
    // run-sized (queries × 20 rows), never corpus-sized.
    Q("q_r_eval",
      s"""WITH q(qid) AS (VALUES ('vector'), ('join'), ('scan')),
         |tok AS (SELECT doc_id, ${sqlTokens("text")} AS tk
         |  FROM documents),
         |occ AS (SELECT qid, d.doc_id, n_chars,
         |    len(list_filter(tk, x -> x = qid)) AS occ
         |  FROM tok JOIN documents d ON d.doc_id = tok.doc_id, q),
         |run AS (SELECT qid, doc_id, r FROM (
         |    SELECT qid, doc_id, row_number() OVER (PARTITION BY qid
         |      ORDER BY occ DESC, doc_id) AS r
         |    FROM occ WHERE occ > 0) WHERE r <= 20),
         |rel AS (SELECT qid, doc_id FROM occ
         |  WHERE occ >= 1 AND n_chars % 3 = 0),
         |nrel AS (SELECT qid, count(*) AS n_rel FROM rel GROUP BY qid),
         |hits AS (SELECT run.qid, r,
         |    count(*) OVER (PARTITION BY run.qid ORDER BY r) AS c
         |  FROM run JOIN rel ON run.qid = rel.qid
         |    AND run.doc_id = rel.doc_id),
         |terms AS (SELECT qid, r,
         |    CAST((1000 * c) // r AS BIGINT) AS term_milli FROM hits),
         |perq AS (SELECT qid, count(*) AS hits_at_k, min(r) AS r_first,
         |    sum(term_milli) AS ap_sum FROM terms GROUP BY qid)
         |SELECT nrel.qid, CAST(n_rel AS BIGINT) AS n_rel,
         |  CAST(coalesce(hits_at_k, 0) AS BIGINT) AS hits_at_k,
         |  CAST((1000 * coalesce(hits_at_k, 0)) // n_rel AS BIGINT)
         |    AS recall_milli,
         |  CAST(coalesce(1000 // r_first, 0) AS BIGINT) AS mrr_milli,
         |  CAST(coalesce(ap_sum, 0) // least(n_rel, 20) AS BIGINT)
         |    AS ap_milli
         |FROM nrel LEFT JOIN perq ON nrel.qid = perq.qid
         |ORDER BY nrel.qid""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      import s.implicits._
      val terms = Seq("vector", "join", "scan")
      val occ = t(s, d, "documents")
        .select(col("doc_id"), col("n_chars"),
          graft.functions.tokens(col("text")).as("tk"))
        .crossJoin(broadcast(terms.toDF("qid")))
        .select(col("qid"), col("doc_id"), col("n_chars"),
          size(filter(col("tk"), x => x === col("qid"))).as("occ"))
      val run = occ.filter(col("occ") > 0)
        .withColumn("r", row_number().over(Window.partitionBy("qid")
          .orderBy(col("occ").desc, col("doc_id"))))
        .filter(col("r") <= 20)
      val qrels = occ
        .filter(col("occ") >= 1 && col("n_chars") % 3 === 0)
        .select("qid", "doc_id")
      Retrieval.evalRanking(run, qrels, "qid", "doc_id", "r", 20)
        .orderBy("qid")
    },

    // E2E HYBRID SEARCH — the composed retrieval flagship: BM25
    // ranks the lexical top-50, exact cosine ranks the semantic
    // top-50, integer RRF fuses both candidate lists, and the fused
    // top-10 joins back to document metadata. Every stage is its own
    // graded operator (q_t_bm25, q_v_brute_topk, q_r_hybrid_rrf);
    // this proves they compose end to end.
    Q("q_e2e_search",
      s"""WITH dld AS (SELECT doc_id, len(${sqlTokens("text")}) AS dl
         |  FROM documents),
         |st AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
         |  FROM dld),
         |tok AS (SELECT doc_id, unnest(${sqlTokens("text")}) AS term
         |  FROM documents),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
         |  WHERE term IN ('vector', 'join', 'filter') GROUP BY 1, 2),
         |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         |sc AS (SELECT tf.doc_id,
         |    CAST(FLOOR(ln((CAST((SELECT n FROM st) AS DOUBLE) - df + 0.5)
         |        / (df + 0.5) + 1.0)
         |      * (tf * (1.2 + 1.0))
         |      / (tf + 1.2 * ((1.0 - 0.75)
         |        + 0.75 * dl / (SELECT avgdl FROM st)))
         |      * 1000.0) AS BIGINT) AS score_milli
         |  FROM tf JOIN dfq USING (term) JOIN dld USING (doc_id)),
         |bm AS (SELECT doc_id, CAST(sum(score_milli) AS BIGINT)
         |    AS bm25_milli FROM sc GROUP BY doc_id),
         |tr AS (SELECT doc_id, row_number() OVER (ORDER BY
         |    bm25_milli DESC, doc_id) AS rank FROM bm),
         |tcand AS (SELECT doc_id, rank FROM tr WHERE rank <= 50),
         |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |vs AS (SELECT vec_id AS doc_id,
         |    ${sqlCosine("embedding", "qv")} AS c FROM embeddings, q),
         |vr AS (SELECT doc_id, row_number() OVER (ORDER BY c DESC,
         |    doc_id) AS rank FROM vs),
         |vcand AS (SELECT doc_id, rank FROM vr WHERE rank <= 50),
         |u AS (SELECT doc_id, 1000000 // (60 + rank) AS part FROM tcand
         |  UNION ALL SELECT doc_id, 1000000 // (60 + rank) FROM vcand),
         |f AS (SELECT doc_id, CAST(sum(part) AS BIGINT) AS rrf_micro,
         |    CAST(count(*) AS BIGINT) AS n_lists FROM u GROUP BY doc_id)
         |SELECT f.doc_id, f.rrf_micro, f.n_lists, d2.lang
         |FROM f JOIN documents d2 ON d2.doc_id = f.doc_id
         |ORDER BY rrf_micro DESC, f.doc_id LIMIT 10""".stripMargin) {
      (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val docs = t(s, d, "documents")
      val lex = graft.operators.TextAnalysis.bm25TopDocs(docs,
          "doc_id", "text", Seq("vector", "join", "filter"), 50)
        .withColumn("rank", row_number().over(
          Window.orderBy(col("bm25_milli").desc, col("doc_id"))))
        .select("doc_id", "rank")
      val emb = t(s, d, "embeddings")
      val q = emb.filter(col("vec_id") === 0)
        .select(col("embedding").as("qvec"))
      val sem = emb.crossJoin(broadcast(q))
        .select(col("vec_id").as("doc_id"),
          graft.functions.cosineSimilarity(col("embedding"),
            col("qvec")).as("c"))
        .orderBy(col("c").desc, col("doc_id")).limit(50)
        .withColumn("rank", row_number().over(
          Window.orderBy(col("c").desc, col("doc_id"))))
        .select("doc_id", "rank")
      Retrieval.rrfFuse(Seq(lex, sem), "doc_id", "rank")
        .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
        .orderBy(col("rrf_micro").desc, col("doc_id")).limit(10)
        .select("doc_id", "rrf_micro", "n_lists", "lang")
    },

    // ANN batched: top-5 per EACH of 5 query vectors in one corpus
    // scan (broadcast batch + per-query window rank).
    Q("q_v_batch_topk",
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qvec
         |           FROM embeddings WHERE vec_id < 5),
         |scored AS (SELECT q.qid, e.vec_id,
         |    ${sqlCosine("e.embedding", "q.qvec")} AS cosine
         |  FROM embeddings e, q),
         |ranked AS (SELECT *, row_number() OVER (PARTITION BY qid
         |    ORDER BY cosine DESC, vec_id) AS rn FROM scored)
         |SELECT qid, vec_id, cosine FROM ranked WHERE rn <= 5
         |ORDER BY qid, cosine DESC, vec_id""".stripMargin) { (s, d) =>
      val qs = t(s, d, "embeddings").filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      Similarity.batchTopK(t(s, d, "embeddings"), "vec_id",
          "embedding", qs, 5)
        .orderBy(col("qid"), col("cosine").desc, col("vec_id"))
    },

    // Numeric histogram: fixed-width bins over order totals (engine
    // extension; deterministic integer bin arithmetic).
    Q("q_a14_histogram",
      """SELECT CAST(FLOOR(o_totalprice / 25000.0) AS BIGINT) AS bin,
        |  count(*) AS n,
        |  CAST(FLOOR(min(o_totalprice) * 100) AS BIGINT) AS min_cents,
        |  CAST(FLOOR(max(o_totalprice) * 100) AS BIGINT) AS max_cents
        |FROM orders GROUP BY 1 ORDER BY bin""".stripMargin) { (s, d) =>
      t(s, d, "orders")
        .groupBy(floor(col("o_totalprice") / 25000.0).cast("long")
          .as("bin"))
        .agg(count(lit(1)).as("n"),
          floor(min(col("o_totalprice")) * 100).cast("long")
            .as("min_cents"),
          floor(max(col("o_totalprice")) * 100).cast("long")
            .as("max_cents"))
        .orderBy("bin")
    },

    // ANN centroid TRAINING: Lloyd's k-means, 2 unrolled iterations,
    // 8 centroids — deterministic seeds (smallest ids), deterministic
    // assignment ties, id-ordered per-dimension mean folds, so the
    // trained double centroids are bit-identical across engines.
    // Output is unnested to one (cid, dim, value) row per centroid
    // component — scalar columns only, so the harness can sort/hash
    // them (a raw array<double> column is uncomparable driver-side).
    Q("q_v_kmeans",
      s"""WITH c0 AS (SELECT vec_id AS cid, embedding AS cv
         |            FROM embeddings ORDER BY vec_id LIMIT 8),
         |${kmeansIterSql("c0", "a1", "m1", "c1", 64)},
         |${kmeansIterSql("c1", "a2", "m2", "c2", 64)}
         |SELECT cid, CAST(d.range AS INTEGER) AS dim,
         |  CAST(cv[CAST(d.range AS INTEGER)] AS DOUBLE) AS v, n
         |FROM c2, range(1, 65) d
         |ORDER BY cid, dim""".stripMargin) { (s, d) =>
      kmeans8(s, d)
        .select(col("cid"), col("n"), posexplode(col("cv")))
        .select(col("cid"), (col("pos") + 1).cast("int").as("dim"),
          col("col").as("v"), col("n"))
        .orderBy("cid", "dim")
    },

    // k-means|| SEEDING (Bahmani et al. 2012), fully deterministic:
    // two md5-gated oversampling rounds (expected ~1 + 2·8
    // candidates), inverted-list weighting, then weighted
    // farthest-first down to 4 seeds — every sampling and selection
    // decision is an exact-integer compare (floor(d²·2²⁰), 20-bit
    // md5 uniforms, HUGEINT/decimal products), so the seed set is
    // bit-identical on both engines and at any partitioning. This is
    // the trainable replacement for the smallest-k-ids seed stub:
    // the corpus-side work per round is one broadcast-centers
    // distance pass with a partial-agg min.
    Q("q_v_kmeanspp_seeds",
      s"""WITH c0 AS (SELECT vec_id AS cid, embedding AS cv
         |            FROM embeddings ORDER BY vec_id LIMIT 1),
         |${kmppRoundSql("c0", 1, 8, "c1")},
         |${kmppRoundSql("c1", 2, 8, "c2")},
         |asg AS (SELECT e.vec_id, c.cid, row_number() OVER (
         |    PARTITION BY e.vec_id
         |    ORDER BY ${sqlD2u("e.embedding", "c.cv")}, c.cid) AS rn
         |  FROM embeddings e, c2 c),
         |wc AS (SELECT c.cid, c.cv, coalesce(w.w, 0) AS w
         |  FROM c2 c LEFT JOIN (SELECT cid, count(*) AS w FROM asg
         |    WHERE rn = 1 GROUP BY 1) w USING (cid)),
         |ch1 AS (SELECT cid, cv, w FROM wc
         |  ORDER BY w DESC, cid LIMIT 1),
         |${kmppPickSql("wc", "ch1", "ch2", 2)},
         |${kmppPickSql("wc", "ch2", "ch3", 3)},
         |${kmppPickSql("wc", "ch3", "ch4", 4)}
         |SELECT cid, CAST(w AS BIGINT) AS w FROM ch4
         |ORDER BY cid""".stripMargin) { (s, d) =>
      Similarity.kmeansParallelSeeds(t(s, d, "embeddings"), "vec_id",
          "embedding", 4, 2, 8)
        .select(col("cid"), col("w"))
        .orderBy("cid")
    },

    // IVF over TRAINED centroids — k-means trains the index, IVF
    // searches it (the production composition; the seed-centroid
    // q_v_ivf_topk is iteration 0 of exactly this). Probes the 3
    // nearest of 8 trained lists.
    Q("q_v_ivf_trained",
      s"""WITH c0 AS (SELECT vec_id AS cid, embedding AS cv
         |            FROM embeddings ORDER BY vec_id LIMIT 8),
         |${kmeansIterSql("c0", "a1", "m1", "c1", 64)},
         |${kmeansIterSql("c1", "a2", "m2", "c2", 64)},
         |ivd AS (SELECT e.vec_id, c.cid,
         |        -(${sqlCosine("e.embedding", "c.cv")}) AS dist
         |      FROM embeddings e, c2 c),
         |ivr AS (SELECT vec_id, cid,
         |        row_number() OVER (PARTITION BY vec_id
         |                           ORDER BY dist, cid) AS rn FROM ivd),
         |assign AS (SELECT vec_id, cid FROM ivr WHERE rn = 1),
         |qd AS (SELECT cid, row_number() OVER (ORDER BY dist, cid) AS qrn
         |       FROM ivd WHERE vec_id = 0),
         |probe AS (SELECT cid FROM qd WHERE qrn <= 3),
         |cand AS (SELECT a.vec_id FROM assign a
         |         JOIN probe p ON a.cid = p.cid),
         |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
         |SELECT e.vec_id, ${sqlCosine("e.embedding", "qv")} AS cosine
         |FROM embeddings e JOIN cand ON e.vec_id = cand.vec_id, q
         |ORDER BY cosine DESC, e.vec_id LIMIT 10""".stripMargin) { (s, d) =>
      val emb = t(s, d, "embeddings")
      val centroids = kmeans8(s, d)
      val q = emb.filter(col("vec_id") === 0)
        .select(col("embedding").as("qvec"))
      Similarity.ivfTopKWith(emb, "vec_id", "embedding", q,
        centroids, 3, 10)
    },

    // CLASS PROTOTYPES: per-label embedding centroids (the
    // prototype-classifier / drift-monitoring primitive). Same
    // id-ordered per-dimension mean fold as k-means, so the doubles
    // are bit-identical; unnested to scalar (label, dim, v, n) rows.
    Q("q_v_label_centroids",
      s"""WITH m AS (SELECT label, list(embedding ORDER BY vec_id) AS ms,
         |    count(*) AS n FROM embeddings GROUP BY label),
         |c AS (SELECT label,
         |    [${(1 to 64).map(sqlMeanDim).mkString(", ")}] AS cv, n
         |  FROM m)
         |SELECT label, CAST(d.range AS INTEGER) AS dim,
         |  CAST(cv[CAST(d.range AS INTEGER)] AS DOUBLE) AS v, n
         |FROM c, range(1, 65) d ORDER BY label, dim""".stripMargin) {
      (s, d) =>
      Similarity.groupCentroids(t(s, d, "embeddings"), "label",
          "vec_id", "embedding", 64)
        .select(col("label"), col("n"), posexplode(col("cv")))
        .select(col("label"), (col("pos") + 1).cast("int").as("dim"),
          col("col").as("v"), col("n"))
        .orderBy("label", "dim")
    },

    // CLASS PROTOTYPES, scalable accumulator: per-(label, dim) exact
    // integer SUM of micro-quantized components — the 100 TB centroid
    // path (no member-vector collect_list anywhere; the aggregation
    // is map-side combinable and order-independent by integer
    // arithmetic). Scalar (label, dim, sum_micros, n) rows.
    Q("q_v_label_centroids_sum",
      """SELECT label, CAST(d.range AS INTEGER) AS dim,
        |  CAST(sum(CAST(floor(CAST(
        |      embedding[CAST(d.range AS INTEGER)] AS DOUBLE)
        |    * 1000000) AS BIGINT)) AS BIGINT) AS sum_micros,
        |  count(*) AS n
        |FROM embeddings, range(1, 65) d
        |GROUP BY 1, 2 ORDER BY label, dim""".stripMargin) { (s, d) =>
      Similarity.groupCentroidSums(t(s, d, "embeddings"), "label",
          "embedding")
        .orderBy("label", "dim")
    },

    // HARD NEGATIVES: per anchor, the 5 most-similar vectors with a
    // DIFFERENT label — the contrastive-training miner (random
    // negatives are trivially separable; these are the ones that move
    // the loss). Anchor set broadcast; one corpus scan.
    Q("q_v_hard_negatives",
      s"""WITH a AS (SELECT vec_id AS qid, embedding AS qv,
         |    label AS qlabel FROM embeddings WHERE vec_id < 3),
         |dd AS (SELECT a.qid, e.vec_id,
         |    ${sqlCosine("e.embedding", "a.qv")} AS cosine
         |  FROM embeddings e, a
         |  WHERE e.vec_id <> a.qid AND e.label <> a.qlabel),
         |r AS (SELECT qid, vec_id, cosine, row_number() OVER (
         |    PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rn
         |  FROM dd)
         |SELECT qid, vec_id AS neg_id, cosine FROM r WHERE rn <= 5
         |ORDER BY qid, neg_id""".stripMargin) { (s, d) =>
      val emb = t(s, d, "embeddings")
      val anchors = emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
          col("label").as("qlabel"))
      Similarity.hardNegatives(emb, "vec_id", "embedding", "label",
          anchors, 5)
        .orderBy("qid", "neg_id")
    },

    // EMBEDDING DRIFT: per-label cosine between the even-id snapshot's
    // centroid and the odd-id snapshot's — the monitoring signal that
    // catches encoder retrains / poisoned batches / domain shift.
    // Centroids use the id-ordered mean fold; the drift cosine folds
    // the two double centroids left-to-right on both engines.
    Q("q_v_centroid_drift",
      s"""WITH mr AS (SELECT label, list(embedding ORDER BY vec_id) AS ms,
         |    count(*) AS n FROM embeddings WHERE vec_id % 2 = 0
         |  GROUP BY label),
         |cr AS (SELECT label,
         |    [${(1 to 64).map(sqlMeanDim).mkString(", ")}] AS cv, n
         |  FROM mr),
         |mc AS (SELECT label, list(embedding ORDER BY vec_id) AS ms,
         |    count(*) AS n FROM embeddings WHERE vec_id % 2 = 1
         |  GROUP BY label),
         |cc AS (SELECT label,
         |    [${(1 to 64).map(sqlMeanDim).mkString(", ")}] AS cv, n
         |  FROM mc)
         |SELECT r.label, CAST(r.n AS BIGINT) AS n_ref,
         |  CAST(c.n AS BIGINT) AS n_cur,
         |  ${sqlCosine("r.cv", "c.cv")} AS drift_cos
         |FROM cr r JOIN cc c USING (label)
         |ORDER BY label""".stripMargin) { (s, d) =>
      val emb = t(s, d, "embeddings")
      Similarity.centroidDrift(
          emb.filter(col("vec_id") % 2 === 0),
          emb.filter(col("vec_id") % 2 === 1),
          "label", "vec_id", "embedding", 64)
        .orderBy("label")
    },

    // KNN CLASSIFICATION: majority label of the 10 nearest neighbors
    // (self excluded, ties to the smallest label) for three query
    // vectors — similarity search composed into prediction.
    Q("q_v_knn_classify",
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv
         |  FROM embeddings WHERE vec_id < 3),
         |dd AS (SELECT q.qid, e.vec_id, e.label,
         |    ${sqlCosine("e.embedding", "q.qv")} AS cosine
         |  FROM embeddings e, q WHERE e.vec_id <> q.qid),
         |r AS (SELECT qid, label, vec_id,
         |    row_number() OVER (PARTITION BY qid
         |      ORDER BY cosine DESC, vec_id) AS rn FROM dd),
         |v AS (SELECT qid, label, count(*) AS votes FROM r
         |  WHERE rn <= 10 GROUP BY 1, 2),
         |p AS (SELECT qid, label, votes, row_number() OVER (
         |    PARTITION BY qid ORDER BY votes DESC, label) AS rk FROM v)
         |SELECT qid, label AS pred_label, CAST(votes AS BIGINT) AS votes
         |FROM p WHERE rk = 1 ORDER BY qid""".stripMargin) { (s, d) =>
      val emb = t(s, d, "embeddings")
      val q = emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      Similarity.knnClassify(emb, "vec_id", "embedding", "label", q, 10)
        .orderBy("qid")
    },

    // SemDeDup (cluster-then-cosine semantic dedup): k-means-trained
    // clusters bound the all-pairs cosine to Σ n_c² intra-cluster
    // comparisons; a vector is dropped iff a smaller-id neighbor in
    // its own cluster clears the threshold. Output is the kept ids —
    // the deterministic keep-lowest-id survivor set.
    Q("q_v_semdedup",
      s"""WITH c0 AS (SELECT vec_id AS cid, embedding AS cv
         |            FROM embeddings ORDER BY vec_id LIMIT 8),
         |${kmeansIterSql("c0", "a1", "m1", "c1", 64)},
         |${kmeansIterSql("c1", "a2", "m2", "c2", 64)},
         |asg AS (SELECT e.vec_id, e.embedding, c.cid,
         |        row_number() OVER (PARTITION BY e.vec_id ORDER BY
         |          -(${sqlCosine("e.embedding", "c.cv")}), c.cid) AS rn
         |      FROM embeddings e, c2 c),
         |a AS (SELECT vec_id, embedding, cid FROM asg WHERE rn = 1),
         |p AS (SELECT y.vec_id AS id_b
         |      FROM a x JOIN a y
         |        ON x.cid = y.cid AND x.vec_id < y.vec_id
         |      WHERE ${sqlCosine("x.embedding", "y.embedding")} >= 0.2)
         |SELECT vec_id FROM embeddings e
         |WHERE NOT EXISTS (SELECT 1 FROM p WHERE p.id_b = e.vec_id)
         |ORDER BY vec_id""".stripMargin) { (s, d) =>
      Similarity.semDedupKeepWith(t(s, d, "embeddings"), "vec_id",
          "embedding", kmeans8(s, d).select("cid", "cv"), 0.2)
        .select("vec_id").orderBy("vec_id")
    },

    // Prototypicality pruning (Sorscher 2022 / D4's SSL prototypes):
    // keep each trained cluster's 40% LEAST prototypical vectors
    // (lowest cosine to own centroid — the near-prototype mass is
    // redundant, rare examples survive). Integer cross-multiplied
    // keep counts; ranks tie on vec_id, so both engines agree even
    // on the planted exact duplicates.
    Q("q_v_prototypicality",
      s"""WITH c0 AS (SELECT vec_id AS cid, embedding AS cv
         |            FROM embeddings ORDER BY vec_id LIMIT 8),
         |${kmeansIterSql("c0", "a1", "m1", "c1", 64)},
         |${kmeansIterSql("c1", "a2", "m2", "c2", 64)},
         |asg AS (SELECT e.vec_id, e.embedding, c.cid, c.cv,
         |        row_number() OVER (PARTITION BY e.vec_id ORDER BY
         |          -(${sqlCosine("e.embedding", "c.cv")}), c.cid) AS rn
         |      FROM embeddings e, c2 c),
         |a AS (SELECT vec_id, embedding, cid, cv FROM asg WHERE rn = 1),
         |r AS (SELECT vec_id, cid,
         |      row_number() OVER (PARTITION BY cid
         |        ORDER BY proto ASC, vec_id) AS rn2,
         |      count(*) OVER (PARTITION BY cid) AS n
         |    FROM (SELECT vec_id, cid,
         |          ${sqlCosine("embedding", "cv")} AS proto FROM a))
         |SELECT vec_id, CAST(cid AS BIGINT) AS cid
         |FROM r WHERE rn2 * 1000 <= n * 400
         |ORDER BY vec_id""".stripMargin) { (s, d) =>
      Similarity.prototypicalityFilterWith(t(s, d, "embeddings"),
          "vec_id", "embedding", kmeans8(s, d).select("cid", "cv"),
          400L)
        .orderBy("vec_id")
    },

    // Semantic decontamination: train vectors within cosine 0.2 of
    // any eval vector (vec_id % 97 = 0 — the q_t_decontam split,
    // lifted to embedding space). Eval broadcasts; per-train argmax
    // picks the closest eval hit, cosine desc / eval id asc.
    Q("q_v_semantic_decontam",
      s"""WITH ev AS (SELECT vec_id AS eid, embedding AS ev
         |      FROM embeddings WHERE vec_id % 97 = 0),
         |m AS (SELECT tr.vec_id, ev.eid,
         |      ${sqlCosine("tr.embedding", "ev.ev")} AS c
         |    FROM embeddings tr, ev
         |    WHERE tr.vec_id % 97 != 0
         |      AND ${sqlCosine("tr.embedding", "ev.ev")} >= 0.2),
         |r AS (SELECT vec_id, eid, c, row_number() OVER (
         |      PARTITION BY vec_id ORDER BY c DESC, eid) AS rn
         |    FROM m)
         |SELECT vec_id, eid AS eval_id, c AS max_cos
         |FROM r WHERE rn = 1 ORDER BY vec_id""".stripMargin) { (s, d) =>
      val e = t(s, d, "embeddings")
      Similarity.decontamBySimilarity(
          e.filter(col("vec_id") % 97 =!= 0),
          e.filter(col("vec_id") % 97 === 0),
          "vec_id", "embedding", 0.2)
        .orderBy("vec_id")
    },

    // SQ8 scalar quantization — the third ANN compression next to
    // IVF (routing) and PQ (codebooks): per-vector min/max
    // calibration, 1 byte per dim. Codes emitted as scalar rows
    // (arrays are not comparator-hashable).
    Q("q_v_sq_codes",
      """WITH v AS (SELECT vec_id,
        |    CAST(list_min(embedding) AS DOUBLE) AS lo,
        |    CAST(list_max(embedding) AS DOUBLE) AS hi,
        |    embedding FROM embeddings),
        |e AS (SELECT vec_id, CAST(s.range AS BIGINT) AS dim,
        |    CAST(embedding[CAST(s.range+1 AS INTEGER)] AS DOUBLE) AS x,
        |    lo, hi
        |  FROM v, range(0, 64) s)
        |SELECT vec_id, dim,
        |  CAST(CASE WHEN hi = lo THEN 0
        |    ELSE least(floor(((x - lo) * 256.0) / (hi - lo)), 255.0)
        |    END AS BIGINT) AS code,
        |  lo, hi
        |FROM e ORDER BY vec_id, dim""".stripMargin) { (s, d) =>
      Similarity.sqEncode(t(s, d, "embeddings"), "vec_id", "embedding")
        .orderBy("vec_id", "dim")
    },

    // SQ8 reconstruction error — the quantization-quality diagnostic:
    // worst-quantized 20 vectors by summed squared error, fold in dim
    // order, quantized to micros AFTER the sum (ranking can't hinge
    // on a final-sum ulp).
    Q("q_v_sq_error",
      """WITH v AS (SELECT vec_id,
        |    CAST(list_min(embedding) AS DOUBLE) AS lo,
        |    CAST(list_max(embedding) AS DOUBLE) AS hi,
        |    embedding FROM embeddings)
        |SELECT vec_id, CAST(floor(list_reduce(
        |    list_prepend(CAST(0.0 AS DOUBLE),
        |    [dd * dd for dd in
        |      [CAST(x AS DOUBLE) - (lo +
        |        (((CASE WHEN hi = lo THEN CAST(0.0 AS DOUBLE)
        |          ELSE least(floor(((CAST(x AS DOUBLE) - lo) * 256.0)
        |            / (hi - lo)), 255.0)
        |        END) + 0.5) * (hi - lo)) / 256.0)
        |       for x in embedding]]),
        |    (a, b) -> a + b) * 1000000.0) AS BIGINT) AS err_micro
        |FROM v ORDER BY err_micro DESC, vec_id LIMIT 20""".stripMargin) {
      (s, d) =>
      Similarity.sqReconstructionError(t(s, d, "embeddings"),
          "vec_id", "embedding")
        .orderBy(col("err_micro").desc, col("vec_id")).limit(20)
    },

    // MULTIMODAL: opaque binary + typed metadata (S5-adjacent schema).
    Q("q_mm_media_meta",
      """SELECT doc_id AS media_id, 'image' AS modality,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  sha256(text) AS digest
        |FROM documents ORDER BY media_id""".stripMargin) { (s, d) =>
      Multimodal.asMediaFrame(
          t(s, d, "documents").withColumn("bin", encode(col("text"), "UTF-8")),
          "doc_id", "bin", "image")
        .select(col("media_id"), col("modality"),
          col("meta.n_bytes").cast("long").as("n_bytes"),
          col("meta.digest").as("digest"))
        .orderBy("media_id")
    },

    // MULTIMODAL: deterministic decode stub (real schema, fake codec).
    Q("q_mm_decode_stub",
      s"""SELECT doc_id AS media_id,
         |  CAST(${sqlHash31("concat(sha256(text), 'w')")} % 1920 + 1
         |    AS INTEGER) AS width,
         |  CAST(${sqlHash31("concat(sha256(text), 'h')")} % 1080 + 1
         |    AS INTEGER) AS height,
         |  (['jpeg','png','webp'])[CAST(${sqlHash31("sha256(text)")} % 3
         |    AS INTEGER) + 1] AS format
         |FROM documents ORDER BY media_id""".stripMargin) { (s, d) =>
      Multimodal.enrichImages(
          Multimodal.asMediaFrame(
            t(s, d, "documents")
              .withColumn("bin", encode(col("text"), "UTF-8")),
            "doc_id", "bin", "image"))
        .select(col("media_id"), col("decoded.width"),
          col("decoded.height"), col("decoded.format"))
        .orderBy("media_id")
    },

    // MULTIMODAL: REAL dimension parse (no codec, no stub) over the
    // committed PNG/BMP/GIF/JPEG fixtures — fixed offsets via
    // substring/hex/conv, JPEG via the native graft_jpeg_dims SOFn
    // marker walk (an ImageIO-written real JFIF file), all
    // whole-stage codegen per row. The BMP fixture's height is
    // stored NEGATIVE (top-down row order) and must normalize to
    // +200; the .bin fixtures must come back as null structs, not
    // misparses.
    Q("q_mm_image_dims",
      """SELECT * FROM (VALUES
        |  ('a.bin', CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT),
        |    CAST(NULL AS BIGINT)),
        |  ('b.bin', CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT),
        |    CAST(NULL AS BIGINT)),
        |  ('tiny.bmp', 'bmp', CAST(320 AS BIGINT), CAST(200 AS BIGINT)),
        |  ('tiny.gif', 'gif', CAST(12 AS BIGINT), CAST(34 AS BIGINT)),
        |  ('tiny.jpg', 'jpeg', CAST(31 AS BIGINT), CAST(17 AS BIGINT)),
        |  ('tiny.mp4', CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT),
        |    CAST(NULL AS BIGINT)),
        |  ('tiny.png', 'png', CAST(640 AS BIGINT), CAST(480 AS BIGINT)),
        |  ('tiny.wav', CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT),
        |    CAST(NULL AS BIGINT)))
        |  AS t(file, format, width, height)
        |ORDER BY file""".stripMargin) { (s, _) =>
      graft.sources.Sources.binaryFiles(s,
        Pipelines.fixture("fixtures/media"), "*")
        .withColumn("dims", Multimodal.imageDims(col("content")))
        .select(element_at(split(col("path"), "/"), -1).as("file"),
          col("dims.format").as("format"), col("dims.width").as("width"),
          col("dims.height").as("height"))
        .orderBy("file")
    },

    // MULTIMODAL: ViT patch-grid fan-out over the committed fixtures —
    // 16×16 tiles with offsets and TRUE clipped edge extents, driven
    // by the real header parse (no codec in the loop). The oracle
    // derives the same grid arithmetic from the pinned dimensions.
    Q("q_mm_patch_grid",
      """WITH dims AS (SELECT * FROM (VALUES
        |    ('tiny.bmp', 320, 200), ('tiny.gif', 12, 34),
        |    ('tiny.jpg', 31, 17), ('tiny.png', 640, 480))
        |    AS t(file, w, h)),
        |py AS (SELECT file, w, h,
        |    unnest(range(0, (h - 1) // 16 + 1)) AS py FROM dims),
        |p AS (SELECT file, w, h, py,
        |    unnest(range(0, (w - 1) // 16 + 1)) AS px FROM py)
        |SELECT file, CAST(py AS BIGINT) AS py, CAST(px AS BIGINT) AS px,
        |  CAST(px * 16 AS BIGINT) AS x_off,
        |  CAST(py * 16 AS BIGINT) AS y_off,
        |  CAST(least(16, w - px * 16) AS BIGINT) AS pw,
        |  CAST(least(16, h - py * 16) AS BIGINT) AS ph
        |FROM p ORDER BY file, py, px""".stripMargin) { (s, _) =>
      val files = graft.sources.Sources.binaryFiles(s,
          Pipelines.fixture("fixtures/media"), "*")
        .select(element_at(split(col("path"), "/"), -1).as("file"),
          col("content"))
      Multimodal.patchGrid(files, "file", "content", 16)
        .orderBy("file", "py", "px")
    },

    // MULTIMODAL: ISO-BMFF container metadata (video parity for
    // imageDims/wavMeta) — brand, movie timescale, duration in
    // native units and exact floor milliseconds, and track count via
    // the native graft_mp4_meta box walk over the committed fixture;
    // a JPEG must come back as a null struct, never a misparse.
    Q("q_mm_mp4_meta",
      """SELECT * FROM (VALUES
        |  ('tiny.jpg', CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT),
        |    CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
        |    CAST(NULL AS BIGINT)),
        |  ('tiny.mp4', 'isom', CAST(600 AS BIGINT),
        |    CAST(3000 AS BIGINT), CAST(5000 AS BIGINT),
        |    CAST(2 AS BIGINT)))
        |  AS t(file, brand, timescale, duration, duration_ms,
        |       n_tracks)
        |ORDER BY file""".stripMargin) { (s, _) =>
      graft.sources.Sources
        .binaryFiles(s, Pipelines.fixture("fixtures/media"),
          "tiny.{mp4,jpg}")
        .withColumn("m", Multimodal.mp4Meta(col("content")))
        .select(element_at(split(col("path"), "/"), -1).as("file"),
          col("m.brand"), col("m.timescale"), col("m.duration"),
          col("m.duration_ms"), col("m.n_tracks"))
        .orderBy("file")
    },

    // MULTIMODAL e2e: video frame-sampling PLAN from container
    // metadata alone — binary scan → mp4Meta → frame count at the
    // assumed 24 fps (exact floor: duration_ms·24 div 1000) →
    // every-24th-frame fan-out with each frame's exact floor
    // timestamp. The whole plan is header bytes + narrow arithmetic;
    // no codec runs until a decoder consumes (file, frame_idx,
    // frame_ms) — the shape a 100 TB video pipeline schedules decode
    // work in. Non-containers (the jpg) drop before the explode.
    Q("q_e2e_video_plan",
      """SELECT 'tiny.mp4' AS file,
        |  CAST(f AS BIGINT) AS frame_idx,
        |  CAST(f * 1000 // 24 AS BIGINT) AS frame_ms
        |FROM unnest(range(0, 120, 24)) AS t(f)
        |ORDER BY frame_idx""".stripMargin) { (s, _) =>
      val meta = graft.sources.Sources
        .binaryFiles(s, Pipelines.fixture("fixtures/media"),
          "tiny.{mp4,jpg}")
        .withColumn("m", Multimodal.mp4Meta(col("content")))
        .filter(col("m").isNotNull)
        .select(element_at(split(col("path"), "/"), -1).as("file"),
          ((col("m.duration_ms") * 24) -
            (col("m.duration_ms") * 24) % 1000)
            .cast("long").divide(1000).cast("long").as("n_frames"))
      Multimodal.sampleFrameIndexes(meta, col("n_frames"), 24)
        .select(col("file"), col("frame_idx").cast("long").as("frame_idx"),
          ((col("frame_idx") * 1000) - (col("frame_idx") * 1000) % 24)
            .cast("long").divide(24).cast("long").as("frame_ms"))
        .orderBy("frame_idx")
    },

    // MULTIMODAL: canonical-WAV header metadata (audio parity for
    // imageDims) — channels / sample rate / bit depth / exact
    // integer duration over the committed fixture; non-audio files
    // must come back null.
    Q("q_mm_wav_meta",
      """SELECT * FROM (VALUES
        |  ('tiny.png', CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
        |    CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)),
        |  ('tiny.wav', CAST(1 AS BIGINT), CAST(8000 AS BIGINT),
        |    CAST(16 AS BIGINT), CAST(25 AS BIGINT)))
        |  AS t(file, channels, sample_rate, bits, duration_ms)
        |ORDER BY file""".stripMargin) { (s, _) =>
      graft.sources.Sources
        .binaryFiles(s, Pipelines.fixture("fixtures/media"),
          "tiny.{wav,png}")
        .withColumn("m", Multimodal.wavMeta(col("content")))
        .select(element_at(split(col("path"), "/"), -1).as("file"),
          col("m.channels").as("channels"),
          col("m.sample_rate").as("sample_rate"),
          col("m.bits").as("bits"),
          col("m.duration_ms").as("duration_ms"))
        .orderBy("file")
    },

    // AUDIO VAD (MM8): 16-bit mono PCM frame energies + energy-gate
    // flags, parsed from REAL WAV bytes the engine itself packs from
    // a shared integer formula (hex-pack → unhex → parse → frame →
    // fold). The oracle computes the SAME energies straight from the
    // formula — so the graded hash covers the entire binary
    // round-trip, not just the arithmetic. wav 0 is full-range
    // (active frames), wav 1 is quiet (%1024 samples, inactive).
    Q("q_mm_vad",
      """WITH ids AS (SELECT unnest([CAST(0 AS BIGINT),
        |    CAST(1 AS BIGINT)]) AS wav_id),
        |js AS (SELECT unnest(range(0, 160)) AS j),
        |s AS (SELECT wav_id, j,
        |    (j*j*13 + 31*j + wav_id*7) %
        |      (CASE WHEN wav_id = 0 THEN 65536 ELSE 1024 END) AS u
        |  FROM ids, js),
        |sg AS (SELECT wav_id, j,
        |    CASE WHEN u >= 32768 THEN u - 65536 ELSE u END AS sv
        |  FROM s),
        |f AS (SELECT wav_id, j // 64 AS frame,
        |    CAST(count(*) AS BIGINT) AS n_samples,
        |    CAST(sum(sv * sv) AS BIGINT) AS sum_sq
        |  FROM sg GROUP BY 1, 2)
        |SELECT wav_id, frame, n_samples, sum_sq,
        |  sum_sq // n_samples AS mean_sq,
        |  (sum_sq // n_samples) >= 200000000 AS active
        |FROM f ORDER BY wav_id, frame""".stripMargin) { (s, d) =>
      import s.implicits._
      // canonical 44-byte header: RIFF(356) WAVE fmt(16, PCM, mono,
      // 8000 Hz, 16000 B/s, align 2, 16 bit) data(320)
      val header = "52494646" + "64010000" + "57415645" + "666D7420" +
        "10000000" + "0100" + "0100" + "401F0000" + "803E0000" +
        "0200" + "1000" + "64617461" + "40010000"
      val wavs = Seq(0L, 1L).toDF("wav_id")
        .withColumn("__mod",
          when(col("wav_id") === 0, 65536L).otherwise(1024L))
        .withColumn("__datahex", expr(
          "array_join(transform(sequence(0, 159), j -> concat(" +
            "lpad(hex(((j*j*13 + 31*j + wav_id*7) % __mod) % 256)," +
            " 2, '0'), " +
            "lpad(hex(((j*j*13 + 31*j + wav_id*7) % __mod) div 256)," +
            " 2, '0'))), '')"))
        .withColumn("content",
          unhex(concat(lit(header), col("__datahex"))))
      graft.operators.Multimodal
        .pcmFrameEnergy(wavs, "wav_id", "content", 64, 200000000L)
        .orderBy("wav_id", "frame")
    },

    // MULTIMODAL: perceptual-hash near-dup over image content — the
    // aHash stub grid (content-digest-derived) feeds the SAME banded
    // hamming machinery as text simhash (Dedup.hammingPairs), so
    // re-encoded exact duplicates surface at hamming 0: the corpus is
    // unioned with a re-labeled copy of its first 25 docs and the
    // pair set must be exactly those 25 planted duplicates.
    Q("q_mm_phash_pairs",
      s"""WITH m AS (SELECT doc_id AS media_id, text FROM documents
         |  UNION ALL SELECT doc_id + 10000, text FROM documents
         |  WHERE doc_id < 25),
         |dg AS (SELECT media_id, sha256(text) AS g FROM m),
         |gs AS (SELECT media_id,
         |    [${sqlHash31("g || ':' || CAST(k AS VARCHAR)")} % 256
         |      for k in range(0, 32)] AS cs
         |  FROM dg),
         |t AS (SELECT media_id, cs,
         |    list_reduce(cs, (a, b) -> a + b) AS tot FROM gs),
         |p AS (SELECT media_id, list_reduce(
         |    list_prepend(CAST(0 AS BIGINT),
         |    [CASE WHEN cs[k+1] * 32 >= tot THEN (CAST(1 AS BIGINT) << k)
         |      ELSE CAST(0 AS BIGINT) END for k in range(0, 32)]),
         |    (a, b) -> a + b) AS phash FROM t)
         |SELECT a.media_id AS id_a, b.media_id AS id_b,
         |  CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
         |FROM p a JOIN p b ON a.media_id < b.media_id
         |WHERE bit_count(xor(a.phash, b.phash)) <= 3
         |ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
      val docs = t(s, d, "documents")
      val media = docs.select(col("doc_id").as("media_id"), col("text"))
        .unionAll(docs.filter(col("doc_id") < 25)
          .select((col("doc_id") + 10000).as("media_id"), col("text")))
        .withColumn("content", encode(col("text"), "UTF-8"))
      val sigs = Multimodal.withPerceptualHash(media)
        .select(col("media_id"), col("phash"))
      Dedup.hammingPairs(sigs, "media_id", "phash", 32, 4, 3)
        .withColumn("hamming", col("hamming").cast("long"))
        .orderBy("id_a", "id_b")
    },

    // MULTIMODAL: video frame-sampling fan-out (every 5th frame).
    Q("q_mm_frame_sample",
      """SELECT doc_id AS media_id,
        |  CAST(unnest(range(0, n_chars % 30 + 1, 5)) AS BIGINT) AS frame_idx
        |FROM documents ORDER BY media_id, frame_idx""".stripMargin) { (s, d) =>
      Multimodal.sampleFrameIndexes(
          t(s, d, "documents")
            .select(col("doc_id").as("media_id"),
              (col("n_chars") % 30 + 1).as("n_frames")),
          col("n_frames"), 5)
        .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"))
        .orderBy("media_id", "frame_idx")
    },

    // U1/U2: translate service, deterministic stub backend.
    Q("q_u1_translate_stub",
      """SELECT doc_id, concat('[zh->en] ', substr(text, 1, 40)) AS translated
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"),
          Services.translateStub(substring(col("text"), 1, 40), "zh", "en")
            .as("translated"))
        .orderBy("doc_id")
    },

    // U1-live: the SAME translate contract through a real HTTP POST
    // round trip per row (loopback backend implements the stub's
    // deterministic transform — the oracle is identical to the stub
    // query's; swapping the endpoint to a real API is config).
    Q("q_u1_translate_http",
      """SELECT doc_id, concat('[zh->en] ', substr(text, 1, 40))
        |  AS translated
        |FROM documents WHERE doc_id < 50 ORDER BY doc_id""".stripMargin) {
      (s, d) =>
      val port = graft.sources.HttpFixture.port
      Services.translateHttp(
          t(s, d, "documents").filter(col("doc_id") < 50)
            .select(col("doc_id"),
              substring(col("text"), 1, 40).as("snippet")),
          "snippet", "zh", "en",
          s"http://127.0.0.1:$port/translate", backoffMs = 20)
        .select(col("doc_id"), col("translated"))
        .orderBy("doc_id")
    },

    // U2-live: the BATCHED chat-translate wire — one POST per
    // source-group of lines (the reference's grouped-OCR chat call),
    // responses split back 1:1 onto the rows. The endpoint is the
    // FLAKY variant: its first hit 503s, so the run also proves the
    // Remote retry policy on this wire; the oracle stays the per-row
    // stub transform because batching is pure transport.
    Q("q_u2_chat_translate_http",
      """SELECT doc_id, concat('[zh->en] ', substr(text, 1, 30))
        |  AS translated
        |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin) {
      (s, d) =>
      val port = graft.sources.HttpFixture.port
      Services.chatTranslateHttp(
          t(s, d, "documents").filter(col("doc_id") < 100)
            .select(col("source"), col("doc_id"),
              substring(col("text"), 1, 30).as("snippet")),
          "source", "doc_id", "snippet", "zh", "en",
          s"http://127.0.0.1:$port/chatflaky", backoffMs = 20)
        .select(col("doc_id"), col("translated"))
        .orderBy("doc_id")
    },

    // U3: structured logistics extraction stub (5-field struct).
    Q("q_u3_extract_logistics",
      """SELECT doc_id,
        |  concat(length(text) % 50, 'kg') AS weight,
        |  concat(length(text) % 9, 'x', length(text) % 7) AS dims,
        |  substr(text, 1, 2) AS origin,
        |  concat('HS', length(text) % 100) AS hs_code,
        |  'FOB' AS incoterm
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"),
          Services.extractLogisticsStub(col("text")).as("lg"))
        .select(col("doc_id"), col("lg.weight"), col("lg.dims"),
          col("lg.origin"), col("lg.hs_code"), col("lg.incoterm"))
        .orderBy("doc_id")
    },

    // U3-live: structured logistics extraction over the wire — the
    // fifth and last service to earn a live HTTP leg: each row's
    // text POSTs and the five '|'-framed response fields land as
    // columns; the loopback backend implements the stub transform,
    // so the stub's oracle grades the live wire. FLAKY endpoint: the
    // first hit 503s, so the run also proves the retry policy.
    Q("q_u3_extract_logistics_http",
      """SELECT doc_id,
        |  concat(length(text) % 50, 'kg') AS weight,
        |  concat(length(text) % 9, 'x', length(text) % 7) AS dims,
        |  substr(text, 1, 2) AS origin,
        |  concat('HS', length(text) % 100) AS hs_code,
        |  'FOB' AS incoterm
        |FROM documents WHERE doc_id < 40 ORDER BY doc_id""".stripMargin) {
      (s, d) =>
      val port = graft.sources.HttpFixture.port
      Services.extractLogisticsHttp(
          t(s, d, "documents").filter(col("doc_id") < 40)
            .select(col("doc_id"), col("text")),
          "text", s"http://127.0.0.1:$port/logisticsflaky",
          backoffMs = 20)
        .select(col("doc_id"), col("weight"), col("dims"),
          col("origin"), col("hs_code"), col("incoterm"))
        .orderBy("doc_id")
    },

    // U4: name/SKU generation stub.
    Q("q_u4_name_sku",
      """SELECT doc_id,
        |  concat(upper(substr(lang, 1, 1)), substr(lang, 2), ' ',
        |         upper(substr(source, 1, 1)), substr(source, 2)) AS name,
        |  upper(substr(md5(concat_ws('|', lang, source)), 1, 8)) AS sku
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"),
          Services.nameSkuStub(col("lang"), col("source")).as("ns"))
        .select(col("doc_id"), col("ns.name"), col("ns.sku"))
        .orderBy("doc_id")
    },

    // U4-live: the namer wire — each row POSTs `category|collection`,
    // the `Name|SKU` response lands as two columns; the loopback
    // backend implements the stub transform, so the stub's oracle
    // grades the live wire. FLAKY endpoint: the first hit 503s, so
    // the run also proves the retry policy on this wire.
    Q("q_u4_name_sku_http",
      """SELECT doc_id,
        |  concat(upper(substr(lang, 1, 1)), substr(lang, 2), ' ',
        |         upper(substr(source, 1, 1)), substr(source, 2)) AS name,
        |  upper(substr(md5(concat_ws('|', lang, source)), 1, 8)) AS sku
        |FROM documents WHERE doc_id < 60 ORDER BY doc_id""".stripMargin) {
      (s, d) =>
      val port = graft.sources.HttpFixture.port
      Services.nameSkuHttp(
          t(s, d, "documents").filter(col("doc_id") < 60)
            .select(col("doc_id"), col("lang"), col("source")),
          "lang", "source",
          s"http://127.0.0.1:$port/nameflaky", backoffMs = 20)
        .select(col("doc_id"), col("name"), col("sku"))
        .orderBy("doc_id")
    })
}
