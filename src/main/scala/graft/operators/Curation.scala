package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-composition operators: rebalance a skewed corpus across a
  * grouping dimension (language, source domain) before training. The
  * head group of a web corpus can be 100× the tail; training straight
  * off raw counts starves the tail, and a hard uniform cap wastes the
  * head. The standard smoothing is temperature sampling — keep
  * budgets proportional to `n_g^(1/T)` — which at T=2 (the common
  * multilingual setting) is sqrt-proportional allocation.
  *
  * Reference context: the reference corpus is single-source and needs
  * no rebalancing (its per-collection counts live in
  * /root/reference/utils/importer/verify_collections.py:34-60); this
  * operator family exists for the 100 TB multi-source regime, per
  * SURVEY.md §2.12.
  *
  * Everything is exact-integer so the result is oracle-checkable:
  * isqrt = floor(sqrt(n)) is exact for counts below 2^52 (IEEE-754
  * sqrt is correctly rounded, and every such integer is exactly
  * representable), and the budget share is integer division.
  */
object Curation {

  /** Per-group keep budgets under sqrt-temperature (T=2) rebalancing:
    * `budget_g = totalBudget * isqrt(n_g) div sum_h isqrt(n_h)`.
    * Head groups are down-weighted, tail groups keep proportionally
    * more. One count shuffle over the corpus; the result is
    * group-cardinality-sized (a broadcastable dimension table at any
    * corpus scale — languages/domains number thousands, not
    * billions). */
  def sqrtBudgets(df: DataFrame, groupCol: String,
      totalBudget: Long): DataFrame = {
    require(totalBudget > 0, s"totalBudget must be positive: $totalBudget")
    val counts = df.groupBy(groupCol).agg(count(lit(1)).as("n_docs"))
      .withColumn("isq",
        floor(sqrt(col("n_docs").cast("double"))).cast("long"))
    val tot = counts.agg(sum("isq").as("isq_tot"))
    counts.crossJoin(broadcast(tot))
      .withColumn("budget", expr(s"(${totalBudget}L * isq) div isq_tot"))
      .drop("isq_tot")
  }

  /** Apply step of [[sqrtBudgets]]: keep the first `budget_g` rows of
    * each group in `orderCol` order (pass a quality rank to keep
    * best-first; any unique column makes the cut deterministic). The
    * budget table broadcasts back onto the corpus; the only corpus-
    * wide movement is the one window shuffle on the group key. A
    * group whose budget exceeds its size keeps every row — floor
    * rounding means kept totals come in at or just under
    * `totalBudget`. */
  def rebalanceKeep(df: DataFrame, groupCol: String, orderCol: String,
      totalBudget: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(orderCol)
    df.withColumn("__rn", row_number().over(w))
      .join(broadcast(
        sqrtBudgets(df, groupCol, totalBudget).select(groupCol, "budget")),
        Seq(groupCol))
      .filter(col("__rn") <= col("budget"))
      .drop("__rn", "budget")
  }

  /** CUR4: cumulative-MASS budget — keep each group's highest-score
    * rows until their score mass reaches `fracMilli`/1000 of the
    * group's total (the row that crosses the threshold is kept, so
    * the budget is met, never undershot). Row-count budgets
    * ([[rebalanceKeep]]/[[mixKeep]]) treat a 100-token and a
    * 100k-token document as equal spend; a mass budget curates
    * against what actually costs tokens/compute. Strictly-positive
    * long scores required (a zero-score tail would ride in free
    * below any threshold). All integer arithmetic (`cum·1000 <
    * frac·total` — no division), ties broken by `idCol` — exact and
    * engine-reproducible. Two window passes over the same
    * partitioning, one shuffle. */
  def keepByMassBudget(df: DataFrame, groupCol: String,
      scoreCol: String, idCol: String, fracMilli: Int): DataFrame = {
    require(fracMilli >= 0 && fracMilli <= 1000,
      s"fracMilli must be in [0, 1000]: $fracMilli")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol)
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    val wt = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol)
    df.withColumn("__cum", sum(col(scoreCol)).over(w))
      .withColumn("__tot", sum(col(scoreCol)).over(wt))
      .filter((col("__cum") - col(scoreCol)) * 1000 <
        lit(fracMilli.toLong) * col("__tot"))
      .drop("__cum", "__tot")
  }

  /** Max-volume exact mixture: per-group keep budgets that realize a
    * TARGET distribution (`weights`: (groupCol, target_milli) rows,
    * milli-shares of the final mix) at the largest total the corpus
    * can supply. The binding group is whichever runs out first:
    * `T = min_g (n_g·1000 div w_g)`, then
    * `budget_g = (T·w_g) div 1000` — floor arithmetic guarantees
    * `budget_g ≤ n_g` for every group, so the realized mix matches
    * the target to within one floor rounding per group. Groups absent
    * from `weights` (or with weight 0) are dropped; a weighted group
    * missing from the corpus pins T to 0 (the target is
    * unsatisfiable) rather than silently re-normalizing. All exact
    * integer — oracle-checkable on any engine. The weights table is
    * config-sized; the corpus sees one count shuffle. */
  def mixBudgets(df: DataFrame, groupCol: String,
      weights: DataFrame): DataFrame = {
    val w = weights.select(col(groupCol),
      col("target_milli").cast("long").as("w"))
    // the weights table is config-sized by contract (like the mapping
    // CSV), so a driver-side uniqueness check is allowed — and a
    // duplicated group here would otherwise silently DOUBLE its kept
    // rows through the budget join
    val groups = w.select(col(groupCol)).collect().map(_.get(0))
    require(groups.distinct.length == groups.length,
      s"mixBudgets: duplicate $groupCol in weights: " +
        groups.diff(groups.distinct).distinct.mkString(", "))
    val counts = df.groupBy(groupCol).agg(count(lit(1)).as("n_docs"))
    val joined = w.join(counts, Seq(groupCol), "left")
      .na.fill(0L, Seq("n_docs"))
      .filter(col("w") > 0)
    val t = joined.agg(min(expr("(n_docs * 1000) div w")).as("t_tot"))
    joined.crossJoin(broadcast(t))
      .withColumn("budget", expr("(t_tot * w) div 1000"))
      .select(col(groupCol), col("n_docs"), col("w").as("target_milli"),
        col("budget"))
  }

  /** UniMax budget allocation (Chung et al. 2023, "UniMax: Fairer and
    * More Effective Language Sampling for Large-Scale Multilingual
    * Pretraining"): split a total token budget across groups
    * (languages) as UNIFORMLY as possible subject to a per-group
    * repeat cap — no group may contribute more than
    * `epochsMilli/1000` epochs of its own data. Temperature sampling
    * ([[sqrtBudgets]]) still over-samples the head and over-repeats
    * the tail at extreme skews; UniMax's waterfill gives every group
    * the equal share unless its cap binds first.
    *
    * Exact integer waterfilling: sort groups by (cap, group)
    * ascending. The binding set is a PREFIX of that order (caps
    * ascend while the running fair share cannot shrink past them), a
    * group binds iff cap·(groups remaining) ≤ budget remaining, and
    * the uncapped groups split the leftover evenly — share = R div u
    * with the first R mod u of them (in the same order) taking one
    * extra token, which provably never lifts an allocation past its
    * cap. Every number is int64; the result is engine-exact.
    *
    * Scale shape: ONE map-side-combined count over the corpus; all
    * waterfill arithmetic runs on the group table, which is
    * config-sized (languages/domains) by contract — the global
    * window orders tens of rows, never the corpus. */
  def unimaxBudgets(df: DataFrame, groupCol: String, tokensCol: String,
      totalBudget: Long, epochsMilli: Long): DataFrame = {
    require(totalBudget >= 0, s"totalBudget must be >= 0: $totalBudget")
    require(epochsMilli > 0, s"epochsMilli must be > 0: $epochsMilli")
    // group-table-sized result materialized ONCE — three consumers
    // (ranked, the m count, the binding aggregate) must not re-run
    // the corpus count shuffle
    val counts = df.groupBy(groupCol)
      .agg(sum(col(tokensCol)).as("n_tokens"))
      .withColumn("cap_tokens",
        expr(s"(n_tokens * ${epochsMilli}L) div 1000"))
      .localCheckpoint(eager = false)
    val wAsc = org.apache.spark.sql.expressions.Window
      .orderBy(col("cap_tokens"), col(groupCol))
    val tot = counts.agg(count(lit(1)).as("__m"))
    val ranked = counts.crossJoin(broadcast(tot))
      .withColumn("__i", row_number().over(wAsc).cast("long"))
      .withColumn("__pincl", sum(col("cap_tokens")).over(wAsc
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, 0)))
      .withColumn("__binds",
        col("cap_tokens") * (col("__m") - col("__i") + 1) <=
          lit(totalBudget) - (col("__pincl") - col("cap_tokens")))
    val kAgg = ranked.agg(
      coalesce(max(when(col("__binds"), col("__i"))), lit(0L))
        .as("__k"),
      coalesce(max(when(col("__binds"), col("__pincl"))), lit(0L))
        .as("__capsum"))
    ranked.crossJoin(broadcast(kAgg))
      .withColumn("alloc_tokens", when(col("__binds"), col("cap_tokens"))
        .otherwise(
          expr(s"(${totalBudget}L - __capsum) div (__m - __k)") +
            when(col("__i") - col("__k") <=
              expr(s"(${totalBudget}L - __capsum) % (__m - __k)"),
              lit(1L)).otherwise(lit(0L))))
      .withColumn("epochs_milli",
        when(col("n_tokens") > 0,
          expr("(alloc_tokens * 1000) div n_tokens")).otherwise(lit(0L)))
      .select(col(groupCol), col("n_tokens"), col("cap_tokens"),
        col("alloc_tokens"), col("epochs_milli"))
  }

  /** TEMPERATURE-scaled sampling budgets (Raffel et al. 2020 §3.4.3 /
    * Xue et al. 2021 mT5: p_g ∝ n_g^(1/T)) — the classic multilingual
    * rebalance [[sqrtBudgets]] generalizes to (T = 2 is the sqrt
    * case, T → ∞ uniform, T = 1 proportional) and the dial
    * [[unimaxBudgets]] was invented to replace; shipping both lets a
    * curation loop A/B the policies on one corpus.
    *
    * Determinism discipline: weights are computed RELATIVE to the
    * largest group — w_micro = max(1, ⌊exp((ln n_g − ln n_max)·1000/
    * T_milli)·10⁶⌋) ∈ [1, 10⁶] — and the apportionment numerator
    * w_micro·totalBudget runs in DECIMAL(38,0) (w_micro·B reaches
    * 10⁶·B, past int64 for frontier budgets ≥ ~9.2×10¹² tokens; the
    * 38-digit envelope holds to B = 10³² tokens). The quotient is a
    * budget share ≤ B and the remainder is < Σw_micro ≤ 10⁶·G, so
    * both cast back to int64 exactly. The two
    * ln and one exp are the file's only libm calls (micro-floored
    * once, the knNll discipline), and the max(·,1) keeps every
    * non-empty group sampleable at extreme temperatures. Budgets are
    * largest-remainder (Hamilton) apportioned from the integer
    * weights: Σ budgets = totalBudget EXACTLY, every group gets
    * floor or floor+1.
    *
    * Scale shape: ONE map-side-combined corpus count; everything
    * after runs on the config-sized group table (broadcast max +
    * totals, one tiny window for the remainder ranks). */
  def temperatureBudgets(df: DataFrame, groupCol: String,
      tokensCol: String, totalBudget: Long,
      temperatureMilli: Long): DataFrame = {
    require(totalBudget >= 0, s"totalBudget must be >= 0: $totalBudget")
    require(temperatureMilli > 0,
      s"temperatureMilli must be > 0: $temperatureMilli")
    val counts = df.groupBy(groupCol)
      .agg(sum(col(tokensCol)).as("n_tokens"))
      .filter(col("n_tokens") > 0)
      .localCheckpoint(eager = false)
    val mx = counts.agg(max(col("n_tokens")).as("__nmax"))
    val weighted = counts.crossJoin(broadcast(mx))
      .withColumn("w_micro", expr(
        "greatest(1L, CAST(floor(exp((ln(CAST(n_tokens AS DOUBLE)) " +
          "- ln(CAST(__nmax AS DOUBLE))) * (1000.0 / " +
          s"$temperatureMilli)) * 1000000.0) AS BIGINT))"))
    val tot = weighted.agg(sum(col("w_micro")).as("__tw"))
    val wr = org.apache.spark.sql.expressions.Window
      .orderBy(col("__rem").desc, col(groupCol).asc)
    val ranked = weighted.crossJoin(broadcast(tot))
      // decimal(38,0) numerator: w_micro·B overflows int64 once
      // totalBudget exceeds ~9.2e12 tokens (frontier budgets do)
      .withColumn("__num",
        expr(s"CAST(w_micro AS DECIMAL(38,0)) * ${totalBudget}L"))
      .withColumn("__fl", expr("CAST(__num div __tw AS BIGINT)"))
      .withColumn("__rem", expr("CAST(__num % __tw AS BIGINT)"))
      .withColumn("__r", row_number().over(wr).cast("long"))
    val leftover = ranked
      .agg((lit(totalBudget) - sum(col("__fl"))).as("__left"))
    ranked.crossJoin(broadcast(leftover))
      .withColumn("budget_tokens",
        col("__fl") + when(col("__r") <= col("__left"), 1L)
          .otherwise(0L))
      .select(col(groupCol), col("n_tokens"), col("w_micro"),
        col("budget_tokens"))
  }

  /** DoReMi-flavored EXCESS-LOSS domain reweighting (Xie et al.
    * 2023, "DoReMi: Optimizing Data Mixtures Speeds Up Language
    * Model Pretraining" — the one-shot integer analog of its
    * excess-loss objective): upweight exactly the domains whose
    * per-unit loss EXCEEDS the corpus rate (hard-for-the-reference
    * domains carry the learnable signal; domains at or below the
    * corpus rate contribute no excess and get weight 0 unless
    * nothing does, in which case the mixture falls back to uniform).
    *
    * Input: per-doc (group, units, loss_milli) — units = the doc's
    * token count, loss_milli = its total milli-loss (e.g. a
    * [[graft.operators.TextAnalysis]] NLL, or any per-doc cost).
    * All-integer law: rate_milli = Σloss div Σunits per group and
    * for the corpus; excess_milli = max(0, rate − corpus_rate);
    * weight_milli = excess·1000 div Σexcess (floor shares — feed
    * [[mixBudgets]]-style apportionment when exact sums matter).
    *
    * Scale shape: one keyed partial-agg groupBy (group-table-sized
    * result) + two broadcast single-row totals. Int64 envelope:
    * Σloss_milli < 2⁶³ caps a group at ~9.2e15 milli-loss — sums run
    * in decimal(38,0) so the cap is the OUTPUT's, not the fold's. */
  def excessLossWeights(df: DataFrame, groupCol: String,
      unitsCol: String, lossMilliCol: String): DataFrame = {
    val g = df.groupBy(col(groupCol))
      .agg(
        sum(col(unitsCol).cast("decimal(38,0)")).as("__u"),
        sum(col(lossMilliCol).cast("decimal(38,0)")).as("__l"))
      .filter(col("__u") > 0)
      .localCheckpoint(eager = false)
    val tot = g.agg(sum(col("__u")).as("__tu"), sum(col("__l")).as("__tl"))
    val rated = g.crossJoin(broadcast(tot))
      .withColumn("units", expr("CAST(__u AS BIGINT)"))
      .withColumn("rate_milli", expr("CAST(__l div __u AS BIGINT)"))
      .withColumn("excess_milli", expr(
        "greatest(0L, CAST(__l div __u AS BIGINT) - " +
          "CAST(__tl div __tu AS BIGINT))"))
    val sx = rated.agg(
      sum(col("excess_milli").cast("decimal(38,0)")).as("__se"),
      count(lit(1)).as("__ng"))
    rated.crossJoin(broadcast(sx))
      .withColumn("weight_milli", expr(
        "CASE WHEN __se > 0 THEN CAST(CAST(excess_milli AS " +
          "DECIMAL(38,0)) * 1000 div __se AS BIGINT) " +
          "ELSE 1000L div __ng END"))
      .select(col(groupCol), col("units"), col("rate_milli"),
        col("excess_milli"), col("weight_milli"))
  }

  /** Apply step of [[mixBudgets]] — same shape as [[rebalanceKeep]]:
    * broadcast the config-sized budget table, one window shuffle on
    * the group key, first-`budget_g` rows in `orderCol` order
    * survive. */
  def mixKeep(df: DataFrame, groupCol: String, orderCol: String,
      weights: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(orderCol)
    df.withColumn("__rn", row_number().over(w))
      .join(broadcast(mixBudgets(df, groupCol, weights)
        .select(groupCol, "budget")), Seq(groupCol))
      .filter(col("__rn") <= col("budget"))
      .drop("__rn", "budget")
  }

  /** EXACT-SIZE stratified sample: apportion a global budget of
    * `sampleSize` rows across groups proportionally by the largest
    * -remainder (Hamilton) method — every group gets floor(n_g·N/T)
    * or one more, the extras going to the largest fractional
    * remainders (ties to the smaller group name), and the allocation
    * sums to EXACTLY N (a per-group `sample(fraction)` can't promise
    * that; an eval-set builder needs it). Each group then keeps its
    * `allocated` first rows in deterministic salted-hash order, so
    * the sample is reproducible anywhere.
    *
    * Output: the sampled rows, plus `n_docs` and `allocated` for the
    * row's group. For sampleSize ≤ corpus size no group's quota can
    * exceed its population (floor(n_g·N/T) < n_g when N < T, and the
    * +1 extra still fits), so the sample totals EXACTLY N; asking for
    * more than the corpus under-fills, by construction.
    *
    * Scale shape: the apportionment runs on the GROUP table (one
    * count shuffle, then a |groups|-sized window — config-sized);
    * the sample itself is one per-group window rank in hash order.
    * Nothing global touches row data except that one keyed window. */
  /** SYSTEMATIC weighted resampling (the selection step downstream
    * of DSIR-style importance weights): lay documents end-to-end on
    * an integer weight line in deterministic (bucket, id) order and
    * keep every document whose weight span crosses a stride multiple
    * — doc i is kept iff floor(cum_i / stride) > floor((cum_i − w_i)
    * / stride). Inclusion probability is exactly w_i/stride (for
    * w_i < stride), variance far below Bernoulli sampling, zero
    * randomness: the same corpus and weights select the same rows on
    * any engine, which is what makes a resampled training set
    * reproducible and auditable.
    *
    * A document with w_i ≥ stride always crosses ≥ 1 multiple and is
    * kept (systematic sampling's deterministic "certainty unit") —
    * emitted once, with its crossing count in `n_copies` for a
    * with-replacement consumer.
    *
    * Scale shape: same as [[Sharding.packByTokenBudget]] — a global
    * prefix sum would serialize the corpus through one partition, so
    * rows hash-spread across `buckets` first and each bucket runs its
    * own running-sum window; one shuffle on the bucket key. Per-
    * bucket sample size is floor(bucket mass / stride) ± 1, so the
    * global size concentrates tightly around total mass / stride. */
  def systematicResample(df: DataFrame, idCol: String,
      weightCol: String, stride: Long, buckets: Int): DataFrame = {
    require(stride > 0, s"stride must be positive: $stride")
    require(buckets > 0, s"buckets must be positive: $buckets")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__bkt")).orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    // __w: the weight pulled through a backtick-quoted reference (a
    // name needing quoting must not be spliced raw into expr text)
    // and fail-fast-checked >= 0 — a negative weight lets the running
    // sum DECREASE, silently breaking the w/stride inclusion law, so
    // it raises instead of sampling garbage.
    val wq = col(s"`${weightCol.replace("`", "``")}`")
    df.withColumn("__w",
        when(wq < 0, raise_error(concat(
          lit("systematicResample: negative weight for id "),
          col(idCol).cast("string")))).otherwise(wq))
      .withColumn("__bkt",
        graft.functions.hashBucket(col(idCol), buckets, "sysres"))
      .withColumn("__cum", sum(col("__w")).over(w))
      .withColumn("n_copies",
        expr(s"__cum div ${stride}L - " +
          s"(__cum - __w) div ${stride}L"))
      .filter(col("n_copies") > 0)
      .drop("__cum", "__w")
      .withColumnRenamed("__bkt", "bucket")
  }

  /** Deterministic weighted sampling WITHOUT replacement of exactly
    * `k` rows (Efraimidis & Spirakis 2006, "Weighted random sampling
    * with a reservoir", the A-Res key): each row draws
    * u = (hash60(salt:id) + 1) / 2⁶⁰ ∈ (0, 1] and the k rows with
    * the LARGEST u^(1/w) — equivalently the largest ln(u)/w — win.
    * Inclusion probability rises with weight exactly as the A-Res
    * law, there is no randomness source beyond the salt, and the
    * same corpus + salt + weights select the same k rows on any
    * engine — the complement of [[systematicResample]] (that one is
    * expected-size with per-row w/stride inclusion; this one is
    * exact-size without replacement).
    *
    * Cross-engine determinism: ln(u) is floor-MICRO-quantized before
    * the division (the knNll ln discipline — one libm call per row,
    * everything after is exact int64 + one IEEE division, both
    * correctly rounded everywhere); ties break on id. Weights must
    * be strictly positive (w = 0 has no u^(1/w)) — fail fast, never
    * a silent drop.
    *
    * Scale shape: narrow per-row hash + ln, then ONE
    * TakeOrderedAndProject top-k (per-partition top-k, k-row merge)
    * — no corpus-wide window, no shuffle beyond the k-row merge. */
  def weightedReservoirSample(df: DataFrame, idCol: String,
      weightCol: String, k: Int, salt: String): DataFrame = {
    require(k >= 0, s"k must be >= 0: $k")
    val wq = col(s"`${weightCol.replace("`", "``")}`")
    df.withColumn("__w",
        when(wq <= 0, raise_error(concat(
          lit("weightedReservoirSample: non-positive weight for id "),
          col(idCol).cast("string")))).otherwise(wq))
      .withColumn("__u",
        (graft.functions.hash60(concat(lit(s"res:$salt:"),
          col(idCol).cast("string"))) + 1).cast("double") /
          lit(math.pow(2.0, 60)))
      .withColumn("lnu_micro",
        floor(log(col("__u")) * 1e6).cast("long"))
      .withColumn("priority",
        col("lnu_micro").cast("double") / col("__w").cast("double"))
      .orderBy(col("priority").desc, col(idCol).asc)
      .limit(k)
      .select(col(idCol), col("__w").as("weight"), col("lnu_micro"),
        col("priority"))
  }

  def stratifiedAllocate(df: DataFrame, groupCol: String,
      idCol: String, sampleSize: Long): DataFrame = {
    require(sampleSize >= 0, s"sampleSize must be >= 0: $sampleSize")
    val counts = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"))
    val total = counts.agg(sum(col("n_docs")).as("__t"))
    val wr = org.apache.spark.sql.expressions.Window
      .orderBy(col("__rem").desc, col(groupCol).asc)
    val alloc = counts.crossJoin(broadcast(total))
      .withColumn("__fl", expr(s"n_docs * ${sampleSize}L div __t"))
      .withColumn("__rem", expr(s"n_docs * ${sampleSize}L % __t"))
      .withColumn("__r", row_number().over(wr))
      .crossJoin(broadcast(
        counts.crossJoin(total)
          .agg((lit(sampleSize) -
            sum(expr(s"n_docs * ${sampleSize}L div __t")))
            .as("__leftover"))))
      .withColumn("allocated",
        col("__fl") + when(col("__r") <= col("__leftover"), 1L)
          .otherwise(0L))
      .select(col(groupCol), col("n_docs"), col("allocated"))
    val ws = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(graft.functions.hash60(
        concat(lit("strat:"), col(idCol).cast("string"))).asc,
        col(idCol).asc)
    df.withColumn("__rn", row_number().over(ws))
      .join(broadcast(alloc), Seq(groupCol))
      .filter(col("__rn") <= col("allocated"))
      .drop("__rn")
  }

  /** Corpus CONCENTRATION report — the governance number read next
    * to the mixture budgets: one row with group count, doc count, the
    * head group's share (milli), and the Herfindahl-Hirschman index
    * in micro (Σ share² — 10⁶ = monopoly, 10⁶/G = uniform over G
    * groups). A mixture policy (UniMax / temperature) states intent;
    * this measures the corpus that actually landed, and an alert on
    * hhi_micro is how drift toward a single crawl source gets caught.
    *
    * Integer law (order-free, int64-safe at 10¹² docs): per-group
    * share_micro = n_g·10⁶ div N, term = (share_micro·n_g) div N,
    * hhi_micro = Σ terms — each term ≤ 10⁶·n_g, and the per-group
    * floor keeps every engine bit-identical. Scale shape: one
    * map-side-combined count shuffle; everything else runs on the
    * group-cardinality table. */
  def concentrationReport(df: DataFrame, groupCol: String): DataFrame = {
    val counts = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_g"))
    val tot = counts.agg(sum("n_g").as("n_docs"),
      count(lit(1)).as("n_groups"), max("n_g").as("__mx"))
    counts.crossJoin(broadcast(tot))
      .select(col("n_groups"), col("n_docs"),
        expr("(__mx * 1000) div n_docs").as("top_share_milli"),
        expr("((n_g * 1000000 div n_docs) * n_g) div n_docs")
          .as("__term"))
      .groupBy("n_groups", "n_docs", "top_share_milli")
      .agg(sum("__term").as("hhi_micro"))
  }

  /** Neyman allocation (Neyman 1934, "On the two different aspects
    * of the representative method"): distribute a sample budget
    * across strata ∝ N_h·S_h — variance-heavy strata get more than
    * their head count, the minimum-variance design for estimating a
    * mean, vs [[stratifiedAllocate]]'s proportional shares. Weight
    * arithmetic: per-stratum variance NUMERATOR n·Σx² − (Σx)² is
    * summed exactly in DECIMAL(38,0) (caller-quantized long values —
    * milli keeps the numerator inside int64 precision so the one
    * weight conversion long→double is the IEEE-exact cast on every
    * engine), weight = ⌊sqrt(n·varnum/(n−1))·1000⌋, then the same
    * largest-remainder integer apportionment as
    * [[stratifiedAllocate]] (remainder ties broken by stratum name).
    * Singleton strata carry zero variance evidence → weight 0. When
    * the TOTAL weight is zero (every stratum degenerate), the floors
    * are all zero and the largest-remainder pass then hands the WHOLE
    * budget out one unit at a time in (remainder, name) order — i.e.
    * the first min(n_strata, sampleSize) strata alphabetically get 1
    * each; with fewer strata than budget the allocations sum to
    * n_strata, not sampleSize (the rest of the budget is
    * unassignable: no weight says where it should go). Deterministic
    * and documented, not an error. Returns the DESIGN table (group,
    * n_docs, weight_milli, allocated) — row selection composes with
    * the hash-rank pick.
    *
    * Scale shape: one map-side-combined stats shuffle; everything
    * after runs on the stratum-cardinality table with broadcast
    * 1-row totals. */
  def neymanAllocate(df: DataFrame, groupCol: String,
      valueCol: String, sampleSize: Long): DataFrame = {
    require(sampleSize >= 0, s"sampleSize must be >= 0: $sampleSize")
    val stats = df.filter(col(valueCol).isNotNull)
      .select(col(groupCol), col(valueCol).cast("long").as("__x"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__x").cast("decimal(38,0)")).as("__s"),
        sum(col("__x").cast("decimal(38,0)") * col("__x")).as("__q"))
    val w = stats.withColumn("__vn",
        expr("n_docs * __q - __s * __s"))
      .withColumn("weight_milli",
        expr("""CASE WHEN n_docs < 2 THEN 0L ELSE
          | CAST(floor(sqrt(CAST(n_docs AS DOUBLE)
          |   * CAST(__vn AS DOUBLE)
          |   / (CAST(n_docs AS DOUBLE) - 1.0)) * 1000.0) AS BIGINT)
          | END""".stripMargin))
    val tot = w.agg(
      sum(col("weight_milli").cast("decimal(38,0)")).as("__w"))
    val wr = org.apache.spark.sql.expressions.Window
      .orderBy(col("__rem").desc, col(groupCol).asc)
    w.crossJoin(broadcast(tot))
      .withColumn("__fl", expr(s"""CASE WHEN __w > 0 THEN
        | CAST(CAST(${sampleSize}L AS DECIMAL(38,0)) * weight_milli
        |   div __w AS BIGINT) ELSE 0L END""".stripMargin))
      .withColumn("__rem", expr(s"""CASE WHEN __w > 0 THEN
        | CAST(CAST(${sampleSize}L AS DECIMAL(38,0)) * weight_milli
        |   % __w AS BIGINT) ELSE 0L END""".stripMargin))
      .withColumn("__r", row_number().over(wr))
      .crossJoin(broadcast(
        w.crossJoin(tot).agg((lit(sampleSize) - sum(
          expr(s"""CASE WHEN __w > 0 THEN
            | CAST(CAST(${sampleSize}L AS DECIMAL(38,0)) * weight_milli
            |   div __w AS BIGINT) ELSE 0L END""".stripMargin)))
          .as("__leftover"))))
      .withColumn("allocated",
        col("__fl") + when(col("__r") <= col("__leftover"), 1L)
          .otherwise(0L))
      .select(col(groupCol), col("n_docs"), col("weight_milli"),
        col("allocated"))
  }

  /** Gini coefficient of a non-negative mass column — the standard
    * inequality index next to [[concentrationReport]]'s HHI (0 =
    * perfectly even, →1 = one holder has everything), the corpus
    * diagnostic behind "how skewed is my token budget across
    * domains". Exact rank formulation G = (2·Σ i·x₍ᵢ₎ − (n+1)·Σx) /
    * (n·Σx) over the ascending sort: one global rank window + one
    * single-row fold, DECIMAL(38,0) for the rank-weighted sum (i·x
    * reaches n·Σx), truncated milli out. Ties are harmless — equal
    * values contribute the same regardless of rank order within the
    * tie. Intended input is GROUP-LEVEL masses (domains, sources,
    * languages — thousands of rows, not the corpus): the global rank
    * is a single-partition sort by design, the exact-Gini price;
    * aggregate first. One row (n, total, gini_milli). */
  def giniIndex(df: DataFrame, valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = df.filter(col(valueCol).isNotNull)
      .select(col(valueCol).cast("long").as("__x"))
    val w = Window.orderBy(col("__x").asc)
    v.withColumn("__i", row_number().over(w))
      .agg(count(lit(1)).as("__n"), sum("__x").as("__t"),
        sum(col("__i").cast("decimal(38,0)") * col("__x")).as("__s"))
      .select(col("__n").cast("long").as("n"),
        col("__t").cast("long").as("total"),
        expr("""CAST((2 * __s - (CAST(__n AS DECIMAL(38,0)) + 1)
          | * __t) * 1000
          | div (CAST(__n AS DECIMAL(38,0)) * __t) AS BIGINT)"""
          .stripMargin).as("gini_milli"))
  }

  /** Quantile normalization across groups (the microarray
    * batch-effect correction of Bolstad 2003, applied to corpus
    * scores): each row's value is replaced by the POOLED
    * distribution's value at the row's within-group quantile, so
    * every group ends up with the same marginal distribution and one
    * global threshold stops meaning different things per source —
    * the calibration step before cross-domain quality cuts.
    *
    * Integer-exact mapping: within-group rank r of n_g rows (total
    * order on (value, id)) maps to pooled ordinal q = ⌈r·N/n_g⌉
    * (r=n_g hits the pooled max exactly), and the normalized value
    * is the pooled ascending sort's value at ordinal q — an
    * order-statistic pick, deterministic under ties. Values are
    * caller-quantized longs (the package micro discipline).
    *
    * Scale shape: one within-group rank window, one global-rank
    * window over the pooled column (single-partition by design —
    * same exact-order-statistic price as [[giniIndex]]; sample or
    * pre-bucket first when the corpus outgrows one partition's
    * sort), one equi-join on the ordinal. */
  def quantileNormalize(df: DataFrame, groupCol: String,
      idCol: String, valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df
      .filter(col(valueCol).isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol).as("grp"), col(idCol).as("id"),
        col(valueCol).cast("long").as("v"))
      .localCheckpoint(eager = false)
    val n = base.count()
    require(n > 0, "quantileNormalize needs at least one row")
    val pooled = base
      .withColumn("__q",
        row_number().over(Window.orderBy(col("v").asc)))
      .select(col("__q"), col("v").as("norm"))
    val sized = base
      .withColumn("__r", row_number().over(Window.partitionBy("grp")
        .orderBy(col("v").asc, col("id").asc)))
      .withColumn("__ng",
        count(lit(1)).over(Window.partitionBy("grp")))
      .withColumn("__q",
        expr(s"CAST((__r * ${n}L + __ng - 1) div __ng AS INT)"))
    sized.join(pooled, Seq("__q"))
      .select(col("id"), col("grp"), col("v"), col("norm"))
  }

  /** CORRELATED (join-preserving) sampling — the AQUA join-synopsis
    * discipline (Acharya et al., SIGMOD 1999): sample every table on
    * the SAME salted hash of its JOIN KEY, and the join of the
    * samples IS the keep-fraction sample of the join. Independent
    * Bernoulli samples of two tables joined together retain only
    * p² of the join's rows (and bias every join-side aggregate);
    * hashing the shared key keeps or drops each key's entire
    * neighborhood atomically on both sides, so join fan-out,
    * referential structure, and group-by-key statistics survive at
    * exactly keep/buckets of the keys.
    *
    * The equivalence law (and the graded oracle's formulation):
    *   sample(L) ⋈ sample(R)  ≡  σ_{hash(key) ∈ keep}(L ⋈ R).
    *
    * Scale shape: one narrow codegen'd filter per table — applied
    * BEFORE the join, so the exchange only ever moves the sampled
    * fraction. The salt decorrelates independent studies on the same
    * corpus; reuse one salt across every table that shares the key. */
  def correlatedSample(df: DataFrame, keyCol: String, buckets: Int,
      keep: Int, salt: String = "csamp"): DataFrame = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    require(keep >= 0 && keep <= buckets,
      s"keep must be in [0, $buckets]: $keep")
    df.filter(
      graft.functions.hashBucket(col(keyCol), buckets, salt) < keep)
  }
}
