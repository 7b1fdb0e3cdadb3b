package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.{Merge, Temporal}
import graft.functions.pseudonymize
import graft.streaming.{Incremental, Sessionize}

/** The mutation/merge [Q] inventory (SURVEY.md §2.6) plus the
  * incremental/streaming-shaped patterns (§2.9), exercised as
  * self-contained deterministic queries: `existing` and the batch are
  * both carved out of the testdata with key-modulus predicates, so the
  * oracle can rebuild the exact same inputs in SQL.
  *
  * Scale notes: every merge is anti-join + union — the batch side
  * broadcasts when small, and the same plan degrades to sort-merge on
  * the key when both sides are fact-sized. Nothing collects to the
  * driver.
  */
object Merges {

  val all: Seq[Q] = Seq(

    // M1/S9: full-row upsert by natural key.
    Q("q_m1_upsert_by_key",
      """WITH existing AS (
        |  SELECT o_orderkey, o_orderpriority, o_orderstatus FROM orders
        |  WHERE o_orderkey % 2 = 0),
        |updates AS (
        |  SELECT o_orderkey, 'X-UPDATED' AS o_orderpriority, o_orderstatus
        |  FROM orders WHERE o_orderkey % 3 = 0)
        |SELECT * FROM (
        |  SELECT e.* FROM existing e
        |  WHERE NOT EXISTS (SELECT 1 FROM updates u
        |                    WHERE u.o_orderkey = e.o_orderkey)
        |  UNION ALL SELECT * FROM updates)
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      val o = t(s, d, "orders")
        .select("o_orderkey", "o_orderpriority", "o_orderstatus")
      val existing = o.filter(col("o_orderkey") % 2 === 0)
      val updates = o.filter(col("o_orderkey") % 3 === 0)
        .withColumn("o_orderpriority", lit("X-UPDATED"))
      Merge.upsertByKey(existing, updates, Seq("o_orderkey"))
        .orderBy("o_orderkey")
    },

    // M2/S8: insert-if-absent (ON CONFLICT DO NOTHING).
    Q("q_m2_insert_if_absent",
      """WITH existing AS (
        |  SELECT c_custkey, c_name FROM customer WHERE c_custkey % 2 = 0),
        |inserts AS (
        |  SELECT c_custkey, 'NEW' AS c_name FROM customer
        |  WHERE c_custkey % 5 = 0)
        |SELECT * FROM (
        |  SELECT * FROM existing
        |  UNION ALL
        |  SELECT i.* FROM inserts i
        |  WHERE NOT EXISTS (SELECT 1 FROM existing e
        |                    WHERE e.c_custkey = i.c_custkey))
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      val c = t(s, d, "customer").select("c_custkey", "c_name")
      val existing = c.filter(col("c_custkey") % 2 === 0)
      val inserts = c.filter(col("c_custkey") % 5 === 0)
        .withColumn("c_name", lit("NEW"))
      Merge.insertIfAbsent(existing, inserts, Seq("c_custkey"))
        .orderBy("c_custkey")
    },

    // M3: partial-column upsert — null update values keep the existing
    // value (the COALESCE null-guard), untouched columns survive.
    Q("q_m3_upsert_partial",
      """WITH existing AS (
        |  SELECT c_custkey, c_name, c_mktsegment FROM customer),
        |updates AS (
        |  SELECT c_custkey, CAST(NULL AS VARCHAR) AS c_name,
        |    'SEG-UPDATED' AS c_mktsegment
        |  FROM customer WHERE c_custkey % 7 = 0)
        |SELECT e.c_custkey,
        |  coalesce(u.c_name, e.c_name) AS c_name,
        |  CASE WHEN u.c_custkey IS NOT NULL
        |       THEN coalesce(u.c_mktsegment, e.c_mktsegment)
        |       ELSE e.c_mktsegment END AS c_mktsegment
        |FROM existing e LEFT JOIN updates u ON e.c_custkey = u.c_custkey
        |ORDER BY e.c_custkey""".stripMargin) { (s, d) =>
      val existing = t(s, d, "customer")
        .select("c_custkey", "c_name", "c_mktsegment")
      val updates = t(s, d, "customer").filter(col("c_custkey") % 7 === 0)
        .select(col("c_custkey"),
          lit(null).cast("string").as("c_name"),
          lit("SEG-UPDATED").as("c_mktsegment"))
      Merge.upsertPartial(existing, updates, Seq("c_custkey"),
          Seq("c_name", "c_mktsegment"))
        .orderBy("c_custkey")
    },

    // M4: batched DELETE by key set as one anti-join.
    Q("q_m4_delete_by_keys",
      """SELECT o_orderkey FROM orders
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM orders t
        |  WHERE t.o_orderstatus = 'F' AND t.o_orderkey % 10 < 3
        |    AND t.o_orderkey = orders.o_orderkey)
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      val o = t(s, d, "orders")
      val tombstones = o.filter(col("o_orderstatus") === "F" &&
        col("o_orderkey") % 10 < 3)
      Merge.deleteByKeys(o, tombstones, Seq("o_orderkey"))
        .select("o_orderkey").orderBy("o_orderkey")
    },

    // M5: cascading orphan cleanup — keep only rows referenced in ALL
    // parents (double-NOT-EXISTS inverted to the surviving set).
    Q("q_m5_keep_referenced",
      """SELECT l_orderkey, l_linenumber, l_partkey FROM lineitem
        |WHERE l_suppkey % 10 = 0
        |  AND EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey
        |              AND o_orderkey % 20 = 0)
        |  AND EXISTS (SELECT 1 FROM part WHERE p_partkey = l_partkey)
        |ORDER BY l_orderkey, l_linenumber, l_partkey""".stripMargin) { (s, d) =>
      val target = t(s, d, "lineitem").filter(col("l_suppkey") % 10 === 0)
      Merge.keepReferenced(target, Seq(
          (t(s, d, "orders").filter(col("o_orderkey") % 20 === 0),
            "l_orderkey", "o_orderkey"),
          (t(s, d, "part"), "l_partkey", "p_partkey")))
        .select("l_orderkey", "l_linenumber", "l_partkey")
        .orderBy("l_orderkey", "l_linenumber", "l_partkey")
    },

    // M7: modified_on stamping in the merge writer (trigger analog);
    // fixed instant so the oracle can hash it.
    Q("q_m7_stamp_modified",
      """SELECT c_custkey,
        |  epoch_us(TIMESTAMP '2026-01-01 00:00:00') AS modified_on
        |FROM customer WHERE c_custkey % 100 = 0 ORDER BY c_custkey""".stripMargin) { (s, d) =>
      Merge.stampModified(
          t(s, d, "customer").filter(col("c_custkey") % 100 === 0)
            .select("c_custkey"),
          to_timestamp(lit("2026-01-01 00:00:00")))
        .withColumn("modified_on", epochUs(col("modified_on")))
        .orderBy("c_custkey")
    },

    // M8: dry-run mode — the pipeline runs but the sink swap is
    // skipped; the query surfaces the would-be row counts (the
    // reference's DRY_RUN rollback, ETL.py:620-626).
    Q("q_m8_dry_run",
      """SELECT 'would_upsert' AS action, count(*) AS n
        |FROM orders WHERE o_orderkey % 3 = 0
        |UNION ALL
        |SELECT 'would_delete', count(*) FROM orders
        |WHERE o_orderstatus = 'F' AND o_orderkey % 10 < 3
        |ORDER BY action""".stripMargin) { (s, d) =>
      val o = t(s, d, "orders")
      o.filter(col("o_orderkey") % 3 === 0)
        .agg(count(lit(1)).as("n"))
        .select(lit("would_upsert").as("action"), col("n"))
        .unionByName(
          o.filter(col("o_orderstatus") === "F" && col("o_orderkey") % 10 < 3)
            .agg(count(lit(1)).as("n"))
            .select(lit("would_delete").as("action"), col("n")))
        .orderBy("action")
    },

    // I1: incremental anti-join run — only unprocessed events.
    Q("q_i1_incremental_new",
      """SELECT event_id FROM events
        |WHERE NOT EXISTS (SELECT 1 FROM events l
        |  WHERE l.event_id % 4 = 0 AND l.event_id = events.event_id)
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      val e = events(s, d)
      Incremental.newItems(e, e.filter(col("event_id") % 4 === 0),
          Seq("event_id"))
        .select("event_id").orderBy("event_id")
    },

    // I2: per-item processed-set skip on a compound key.
    Q("q_i2_processed_set",
      """SELECT DISTINCT user_id, event_type FROM events
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM events l
        |  WHERE l.event_id % 2 = 0 AND l.user_id = events.user_id
        |    AND l.event_type = events.event_type)
        |ORDER BY user_id, event_type""".stripMargin) { (s, d) =>
      val e = events(s, d)
      Incremental.newItems(
          e.select("user_id", "event_type").distinct(),
          e.filter(col("event_id") % 2 === 0),
          Seq("user_id", "event_type"))
        .orderBy("user_id", "event_type")
    },

    // I5: one resumable ledger run — process only new items, return
    // per-type counts of what this run would process.
    Q("q_i5_ledger_run",
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(floor(value * 1000)) AS BIGINT) AS value_milli
        |FROM events
        |WHERE NOT EXISTS (SELECT 1 FROM events l
        |  WHERE l.event_id % 4 = 0 AND l.event_id = events.event_id)
        |GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      val e = events(s, d)
      val (results, _) = Incremental.run(e,
        e.filter(col("event_id") % 4 === 0), Seq("event_id")) { fresh =>
        fresh.groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum(floor(col("value") * 1000)).cast("long").as("value_milli"))
      }
      results.orderBy("event_type")
    },

    // I6: mergeable aggregate state — the Spark side builds TWO
    // half-corpus states (event_id parity) and MERGES them; the
    // oracle aggregates the full table directly. Equality is the
    // monoid merge law (merge(state(A), state(B)) == state(A ∪ B))
    // that makes incremental view maintenance sound; the sum is
    // integer-quantized per row BEFORE summing so it is exact and
    // partitioning-order-free.
    Q("q_i6_agg_state",
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(floor(value * 1000000.0) AS BIGINT)) AS BIGINT)
        |    AS sum_micro,
        |  min(value) AS min_v, max(value) AS max_v
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin) {
      (s, d) =>
      val e = events(s, d)
      val half = (r: Long) => Incremental.aggState(
        e.filter(col("event_id") % 2 === r), Seq("event_type"), "value")
      Incremental.mergeAggStates(Seq(half(0L), half(1L)),
          Seq("event_type"))
        .orderBy("event_type")
    },

    // INCREMENTAL: join-view delta maintenance — ΔJ = ΔA⋈B ∪ A⋈ΔB ∪
    // ΔA⋈ΔB for insert-only delta batches (orders with key % 4 == 0,
    // customers with key % 10 == 0 play the arriving batches). The
    // oracle computes the same three-term union; MergeSpec asserts
    // the law old ∪ ΔJ == full rebuild. The three terms are disjoint
    // (each order row sits in exactly one A-side, its customer in
    // exactly one B-side), so o_orderkey stays unique in the output.
    Q("q_i7_join_delta",
      """WITH oa AS (SELECT * FROM orders WHERE o_orderkey % 4 <> 0),
        |da AS (SELECT * FROM orders WHERE o_orderkey % 4 = 0),
        |ob AS (SELECT * FROM customer WHERE c_custkey % 10 <> 0),
        |db AS (SELECT * FROM customer WHERE c_custkey % 10 = 0),
        |dj AS (
        |  SELECT o_orderkey, c_custkey, c_nationkey FROM da
        |    JOIN ob ON o_custkey = c_custkey
        |  UNION ALL
        |  SELECT o_orderkey, c_custkey, c_nationkey FROM oa
        |    JOIN db ON o_custkey = c_custkey
        |  UNION ALL
        |  SELECT o_orderkey, c_custkey, c_nationkey FROM da
        |    JOIN db ON o_custkey = c_custkey)
        |SELECT o_orderkey, c_custkey, c_nationkey FROM dj
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      val ords = t(s, d, "orders")
        .withColumnRenamed("o_custkey", "c_custkey")
      val cust = t(s, d, "customer")
      Incremental.joinDelta(
          ords.filter(col("o_orderkey") % 4 =!= 0),
          ords.filter(col("o_orderkey") % 4 === 0),
          cust.filter(col("c_custkey") % 10 =!= 0),
          cust.filter(col("c_custkey") % 10 === 0),
          Seq("c_custkey"))
        .select("o_orderkey", "c_custkey", "c_nationkey")
        .orderBy("o_orderkey")
    },

    // CDC GENERATION: derive the change log between two snapshots
    // (deletes: key % 50, updates: key % 7 gets +10, inserts: key %
    // 97 re-keyed +1e6) — the delta-sized artifact to ship instead of
    // the new snapshot. MergeSpec asserts the round trip: applying
    // the derived log to old rebuilds new.
    Q("q_m11_cdc_gen",
      """WITH oldt AS (SELECT c_custkey, c_acctbal FROM customer),
        |newt AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 10
        |         ELSE c_acctbal END AS c_acctbal
        |  FROM customer WHERE c_custkey % 50 <> 0
        |  UNION ALL
        |  SELECT c_custkey + 1000000, c_acctbal FROM customer
        |  WHERE c_custkey % 97 = 0),
        |j AS (SELECT coalesce(o.c_custkey, n.c_custkey) AS c_custkey,
        |    o.c_custkey AS ok, n.c_custkey AS nk,
        |    o.c_acctbal AS oa, n.c_acctbal AS na
        |  FROM oldt o FULL OUTER JOIN newt n
        |    ON o.c_custkey = n.c_custkey)
        |SELECT c_custkey,
        |  CASE WHEN ok IS NULL THEN 'I' WHEN nk IS NULL THEN 'D'
        |       ELSE 'U' END AS op,
        |  CASE WHEN nk IS NULL THEN NULL
        |       ELSE CAST(floor(na * 100) AS BIGINT) END AS acct_cents
        |FROM j
        |WHERE ok IS NULL OR nk IS NULL OR oa IS DISTINCT FROM na
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      val old = t(s, d, "customer").select("c_custkey", "c_acctbal")
      val newSnap = old.filter(col("c_custkey") % 50 =!= 0)
        .withColumn("c_acctbal", when(col("c_custkey") % 7 === 0,
          col("c_acctbal") + 10).otherwise(col("c_acctbal")))
        .unionByName(old.filter(col("c_custkey") % 97 === 0)
          .select((col("c_custkey") + 1000000L).as("c_custkey"),
            col("c_acctbal")))
      Merge.changeLogFromSnapshots(old, newSnap, Seq("c_custkey"))
        .select(col("c_custkey"), col("op"),
          floor(col("c_acctbal") * 100).cast("long").as("acct_cents"))
        .orderBy("c_custkey")
    },

    // INCREMENTAL: signed (Z-set) aggregate state — retractions as
    // weight −1 states. Merging the full insert state with a
    // retraction state for the 'error' rows must equal aggregating
    // the surviving rows directly (the invertible-monoid law; min/max
    // deliberately absent — not maintainable under deletes). The
    // fully-retracted 'error' group leaves the view entirely.
    Q("q_i8_retract",
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(floor(value * 1000000.0) AS BIGINT)) AS BIGINT)
        |    AS sum_micro
        |FROM events WHERE event_type <> 'error'
        |GROUP BY 1 ORDER BY event_type""".stripMargin) { (s, d) =>
      val e = events(s, d)
      Incremental.mergeSignedAggStates(Seq(
          Incremental.signedAggState(e, Seq("event_type"), "value", 1),
          Incremental.signedAggState(
            e.filter(col("event_type") === "error"),
            Seq("event_type"), "value", -1)),
          Seq("event_type"))
        .orderBy("event_type")
    },

    // TEMPORAL: coalesce overlapping intervals into maximal disjoint
    // spans (30-minute activity windows per user stitched into
    // availability ranges). Pure integer micros; a new span opens
    // strictly after the running max of earlier ends.
    Q("q_temporal_coalesce",
      """WITH iv AS (SELECT user_id, epoch_us(ts) AS s_us,
        |    epoch_us(ts + INTERVAL 30 MINUTE) AS e_us FROM events),
        |f AS (SELECT user_id, s_us, e_us,
        |    CASE WHEN max(e_us) OVER w IS NULL
        |      OR s_us > max(e_us) OVER w THEN 1 ELSE 0 END AS nw
        |  FROM iv WINDOW w AS (PARTITION BY user_id ORDER BY s_us, e_us
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |g AS (SELECT user_id, s_us, e_us,
        |    CAST(sum(nw) OVER (PARTITION BY user_id ORDER BY s_us, e_us
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS span
        |  FROM f)
        |SELECT user_id, span, min(s_us) AS s_us, max(e_us) AS e_us,
        |  count(*) AS n_intervals
        |FROM g GROUP BY 1, 2 ORDER BY user_id, span""".stripMargin) {
      (s, d) =>
      val iv = events(s, d).select(col("user_id"),
        epochUs(col("ts")).as("s_us"),
        (epochUs(col("ts")) + 1800000000L).as("e_us"))
      Temporal.coalesceIntervals(iv, "user_id", "s_us", "e_us")
        .orderBy("user_id", "span")
    },

    // STREAMING (batch-equivalent): SLIDING windows — every event
    // lands in size/step windows; the oracle replicates the fan-out
    // with an explicit shift unnest.
    Q("q_st_sliding_counts",
      """SELECT window_start_us, event_type, count(*) AS n FROM (
        |  SELECT epoch_us(date_trunc('hour', ts)
        |    - to_minutes(CAST(30 * s AS BIGINT))
        |    + CASE WHEN minute(ts) >= 30 THEN INTERVAL 30 MINUTE
        |           ELSE INTERVAL 0 MINUTE END) AS window_start_us,
        |    event_type
        |  FROM events, (SELECT unnest([0, 1]) AS s))
        |GROUP BY window_start_us, event_type
        |ORDER BY window_start_us, event_type""".stripMargin) { (s, d) =>
      events(s, d)
        .groupBy(window(col("ts").cast("timestamp"), "1 hour", "30 minutes"),
          col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(epochUs(col("window.start")).as("window_start_us"),
          col("event_type"), col("n"))
        .orderBy("window_start_us", "event_type")
    },

    // STREAMING (batch-equivalent): event-time tumbling window counts —
    // the same aggregation windowedCounts runs under Structured
    // Streaming; value summed in exact floor-millis.
    Q("q_st_windowed_counts",
      """SELECT epoch_us(date_trunc('hour', ts)) AS window_start_us,
        |  event_type, count(*) AS n,
        |  CAST(sum(floor(value * 1000)) AS BIGINT) AS value_milli
        |FROM events GROUP BY 1, 2 ORDER BY window_start_us, event_type""".stripMargin) { (s, d) =>
      events(s, d)
        .groupBy(window(col("ts").cast("timestamp"), "1 hour"),
          col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col("value") * 1000)).cast("long").as("value_milli"))
        .select(epochUs(col("window.start")).as("window_start_us"),
          col("event_type"), col("n"), col("value_milli"))
        .orderBy("window_start_us", "event_type")
    },

    // TEMPORAL: keyed range join — events back into their own session
    // intervals; per-session joined counts must reproduce n_events
    // exactly, so the query is self-checking on top of the hash.
    Q("q_temporal_range",
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us
        |  FROM events),
        |m AS (SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
        |    OR ts_us - lag(ts_us) OVER w > 86400000000 THEN 1 ELSE 0 END
        |    AS is_new
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |s AS (SELECT *, CAST(SUM(is_new) OVER (
        |    PARTITION BY user_id ORDER BY ts_us, event_id
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_n FROM m),
        |sess AS (SELECT user_id, session_n, min(ts_us) AS session_start_us,
        |    max(ts_us) AS session_end_us, count(*) AS n_events
        |  FROM s GROUP BY 1, 2)
        |SELECT sess.user_id, sess.session_n, sess.n_events,
        |  count(*) AS n_joined
        |FROM sess JOIN e ON e.user_id = sess.user_id
        |  AND e.ts_us BETWEEN session_start_us AND session_end_us
        |GROUP BY 1, 2, 3 ORDER BY 1, 2""".stripMargin) {
      (s, d) =>
      val ev = events(s, d).select(col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("ts_us"))
      val sess = graft.streaming.Sessionize.batchSessions(
        events(s, d), "user_id", "ts", "event_id", 86400000000L)
      graft.operators.Temporal.rangeJoin(ev, sess, "user_id",
          "ts_us", "session_start_us", "session_end_us")
        .groupBy("user_id", "session_n", "n_events")
        .agg(count(lit(1)).as("n_joined"))
        .orderBy("user_id", "session_n")
    },

    // CONSTRAINT AUDIT: declarative invariants over the warehouse —
    // FK integrity, uniqueness, not-null — one violations report
    // (Unique over (l_orderkey,l_linenumber) is intentionally a rule
    // that FAILS on this testdata: nonzero counts prove the checker
    // counts rather than assumes).
    Q("q_audit_constraints",
      """SELECT 'fk:lineitem.l_orderkey->orders.o_orderkey' AS rule,
        |  (SELECT count(*) FROM lineitem l WHERE l_orderkey IS NOT NULL
        |   AND NOT EXISTS (SELECT 1 FROM orders o
        |                   WHERE o.o_orderkey = l.l_orderkey))
        |  AS violations
        |UNION ALL
        |SELECT 'fk:orders.o_custkey->customer.c_custkey',
        |  (SELECT count(*) FROM orders o WHERE o_custkey IS NOT NULL
        |   AND NOT EXISTS (SELECT 1 FROM customer c
        |                   WHERE c.c_custkey = o.o_custkey))
        |UNION ALL
        |SELECT 'unique:lineitem(l_orderkey,l_linenumber)',
        |  (SELECT coalesce(CAST(sum(n) AS BIGINT), 0) FROM (
        |     SELECT count(*) AS n FROM lineitem
        |     GROUP BY l_orderkey, l_linenumber HAVING count(*) > 1))
        |UNION ALL
        |SELECT 'unique:orders(o_orderkey)',
        |  (SELECT coalesce(CAST(sum(n) AS BIGINT), 0) FROM (
        |     SELECT count(*) AS n FROM orders
        |     GROUP BY o_orderkey HAVING count(*) > 1))
        |UNION ALL
        |SELECT 'not_null:orders.o_orderkey',
        |  (SELECT count(*) FROM orders WHERE o_orderkey IS NULL)
        |ORDER BY rule""".stripMargin) { (s, d) =>
      import graft.operators.Constraints._
      check(
        Map("lineitem" -> t(s, d, "lineitem"),
          "orders" -> t(s, d, "orders"),
          "customer" -> t(s, d, "customer")),
        Seq(
          RefIntegrity("lineitem", "l_orderkey", "orders", "o_orderkey"),
          RefIntegrity("orders", "o_custkey", "customer", "c_custkey"),
          Unique("lineitem", Seq("l_orderkey", "l_linenumber")),
          Unique("orders", Seq("o_orderkey")),
          NotNull("orders", "o_orderkey")))
        .orderBy("rule")
    },

    // ROW-LEVEL ENFORCEMENT: the quarantine mirror of the audit —
    // instead of counting violations, split the load into clean rows
    // and rejects carrying their reasons (range + domain + FK rules;
    // the FK parent is deliberately a sample so ~1/3 of keys orphan).
    // Graded surface: per-rule violation counts plus the clean-row
    // count, which together pin the split exactly.
    Q("q_audit_enforce",
      """WITH v AS (SELECT
        |  (o_totalprice IS NULL OR o_totalprice < 1
        |     OR o_totalprice > 200000) AS v1,
        |  (o_orderstatus IS NULL
        |     OR o_orderstatus NOT IN ('O', 'F')) AS v2,
        |  (o_custkey IS NOT NULL AND o_custkey NOT IN (
        |     SELECT c_custkey FROM customer WHERE c_custkey % 3 != 0))
        |    AS v3
        | FROM orders)
        |SELECT 'range:o_totalprice' AS rule,
        |  CAST(count(*) FILTER (v1) AS BIGINT) AS n FROM v
        |UNION ALL SELECT 'domain:o_orderstatus',
        |  CAST(count(*) FILTER (v2) AS BIGINT) FROM v
        |UNION ALL SELECT 'fk:o_custkey',
        |  CAST(count(*) FILTER (v3) AS BIGINT) FROM v
        |UNION ALL SELECT '__pass',
        |  CAST(count(*) FILTER (NOT v1 AND NOT v2 AND NOT v3) AS BIGINT)
        |  FROM v
        |ORDER BY rule""".stripMargin) { (s, d) =>
      import graft.operators.Constraints._
      val parent = t(s, d, "customer")
        .filter(col("c_custkey") % 3 =!= 0)
      val marked = enforce(t(s, d, "orders"), Seq(
        RowInRange("o_totalprice", 1, 200000),
        RowInSet("o_orderstatus", Seq("O", "F")),
        RowFk("o_custkey", parent, "c_custkey")))
      val perRule = marked
        .select(explode(col("violations")).as("rule"))
        .groupBy("rule").agg(count(lit(1)).as("n"))
      val clean = marked.filter(size(col("violations")) === 0)
        .agg(count(lit(1)).as("n"))
        .select(lit("__pass").as("rule"), col("n"))
      perRule.unionByName(clean).orderBy("rule")
    },

    // E2E GOVERNANCE (E7): quarantine → pseudonymize → load, composed
    // from the graded stages. Clean rows tokenize their customer key
    // under a secret; the oracle checks the composition through the
    // HMAC's distinct-preservation law (DuckDB cannot compute the
    // tokens, but their DISTINCT COUNT must equal the cleartext's —
    // that equality IS the join-preservation contract) plus the
    // exact clean/reject split counts.
    Q("q_e2e_governed",
      """WITH v AS (SELECT o_custkey,
        |  (o_totalprice IS NULL OR o_totalprice < 1
        |     OR o_totalprice > 200000) AS v1,
        |  (o_orderstatus IS NULL
        |     OR o_orderstatus NOT IN ('O', 'F')) AS v2
        | FROM orders)
        |SELECT CAST(count(*) FILTER (NOT v1 AND NOT v2) AS BIGINT)
        |    AS n_clean,
        |  CAST(count(*) FILTER (v1 OR v2) AS BIGINT) AS n_rejects,
        |  CAST(count(DISTINCT o_custkey)
        |    FILTER (NOT v1 AND NOT v2) AS BIGINT) AS n_tokens
        |FROM v""".stripMargin) { (s, d) =>
      import graft.operators.Constraints._
      val (good, rejects) = quarantine(t(s, d, "orders"), Seq(
        RowInRange("o_totalprice", 1, 200000),
        RowInSet("o_orderstatus", Seq("O", "F"))))
      val tokenized = good.select(
        pseudonymize(lit("governed-key"),
          col("o_custkey").cast("string")).as("cust_token"))
      tokenized.agg(count(lit(1)).as("n_clean"),
          countDistinct(col("cust_token")).as("n_tokens"))
        .crossJoin(broadcast(
          rejects.agg(count(lit(1)).as("n_rejects"))))
        .select(col("n_clean"), col("n_rejects"), col("n_tokens"))
    },

    // E2E RELEASE GATE (E16): the full dataset-publication pipeline
    // in ONE plan — quarantine (range + domain rules) → HMAC
    // pseudonymization of the direct identifier → k-anonymity /
    // l-diversity report over the RELEASED (tokenized) rows, plus
    // the reject count. The oracle replays it on cleartext: HMAC
    // preserves distinctness, so l-diversity over tokens equals
    // l-diversity over names — the same law that grades E7.
    Q("q_e2e_release_gate",
      """WITH v AS (SELECT c_nationkey, c_mktsegment, c_name,
        |    (c_acctbal IS NULL OR c_acctbal < -900
        |       OR c_acctbal > 9000) AS v1,
        |    (c_mktsegment IS NULL OR c_mktsegment NOT IN
        |       ('AUTOMOBILE', 'BUILDING', 'FURNITURE', 'HOUSEHOLD'))
        |      AS v2
        |  FROM customer),
        |clean AS (SELECT * FROM v WHERE NOT v1 AND NOT v2),
        |cls AS (SELECT c_nationkey, c_mktsegment,
        |    CAST(count(*) AS BIGINT) AS sz,
        |    CAST(count(DISTINCT c_name) AS BIGINT) AS ld
        |  FROM clean GROUP BY 1, 2),
        |rep AS (SELECT CAST(sum(sz) AS BIGINT) AS n_clean,
        |    CAST(count(*) AS BIGINT) AS n_classes,
        |    CAST(min(sz) AS BIGINT) AS k_anonymity,
        |    CAST(sum(CASE WHEN sz < 10 THEN sz ELSE 0 END) AS BIGINT)
        |      AS rows_below_k,
        |    CAST(min(ld) AS BIGINT) AS l_diversity,
        |    CAST((sum(CASE WHEN sz < 10 THEN sz ELSE 0 END) * 1000)
        |      // sum(sz) AS BIGINT) AS below_k_milli
        |  FROM cls),
        |rej AS (SELECT CAST(count(*) AS BIGINT) AS n_rejects
        |  FROM v WHERE v1 OR v2)
        |SELECT rep.*, rej.n_rejects FROM rep, rej""".stripMargin) {
      (s, d) =>
      import graft.operators.Constraints._
      val (good, rejects) = quarantine(t(s, d, "customer"), Seq(
        RowInRange("c_acctbal", -900, 9000),
        RowInSet("c_mktsegment",
          Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD"))))
      val released = good.select(col("c_nationkey"),
        col("c_mktsegment"),
        pseudonymize(lit("release-key"), col("c_name"))
          .as("name_token"))
      kAnonymityReport(released, Seq("c_nationkey", "c_mktsegment"),
          "name_token", 10L, 8L)
        .crossJoin(broadcast(
          rejects.agg(count(lit(1)).as("n_rejects"))))
        .select(col("n_rows").as("n_clean"), col("n_classes"),
          col("k_anonymity"), col("rows_below_k"),
          col("l_diversity"), col("below_k_milli"), col("n_rejects"))
    },

    // PIVOT: events per day × type matrix (engine extension — the
    // reference reports long-form only). Explicit value list keeps the
    // plan a single pass (no distinct-scan before the pivot).
    Q("q_pivot_daily",
      """SELECT epoch_us(date_trunc('day', ts)) AS day_us,
        |  CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS click,
        |  CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS error,
        |  CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS purchase,
        |  CAST(count(*) FILTER (event_type = 'signup') AS BIGINT) AS signup,
        |  CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS view
        |FROM events GROUP BY 1 ORDER BY day_us""".stripMargin) { (s, d) =>
      events(s, d)
        .groupBy(date_trunc("day", col("ts").cast("timestamp")).as("day"))
        .pivot("event_type",
          Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .select(epochUs(col("day")).as("day_us"), col("click"),
          col("error"), col("purchase"), col("signup"), col("view"))
        .orderBy("day_us")
    },

    // JSON: schema-on-read over the events.props payload (from_json
    // with an explicit schema — the semi-structured column pattern).
    Q("q_f19_json",
      """SELECT event_type,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
        |    AS BIGINT) AS k_sum,
        |  CAST(sum(CASE WHEN CAST(json_extract_string(props, '$.k')
        |    AS BIGINT) > 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
        |  count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) {
      (s, d) =>
      events(s, d)
        .withColumn("k",
          from_json(col("props"), lit("k LONG")).getField("k"))
        .groupBy("event_type")
        .agg(sum(col("k")).as("k_sum"),
          sum(when(col("k") > 50, 1L).otherwise(0L)).as("n_big"),
          count(lit(1)).as("n"))
        .orderBy("event_type")
    },

    // ARG_MAX: latest event per user as ONE aggregate (max_by) — the
    // aggregate-shaped sibling of the as-of join for "current state".
    Q("q_a16_argmax",
      """SELECT user_id,
        |  arg_max(event_type, ts) AS last_type,
        |  epoch_us(max(ts)) AS last_us,
        |  count(*) AS n
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) {
      (s, d) =>
      // (user_id, ts) is unique in the data, so no tie-break is needed
      // for determinism (DuckDB 1.0 arg_max keys must be scalar)
      events(s, d)
        .groupBy("user_id")
        .agg(
          max_by(col("event_type"), col("ts")).as("last_type"),
          epochUs(max(col("ts"))).as("last_us"),
          count(lit(1)).as("n"))
        .orderBy("user_id")
    },

    // UNPIVOT: the daily matrix melted back to long form (wide→long
    // round-trip of q_pivot_daily; Spark's native unpivot operator).
    Q("q_unpivot_daily",
      """WITH m AS (
        |  SELECT epoch_us(date_trunc('day', ts)) AS day_us,
        |    CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS click,
        |    CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS error,
        |    CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS purchase
        |  FROM events GROUP BY 1)
        |SELECT day_us, kind, n FROM m
        |UNPIVOT (n FOR kind IN (click, error, purchase))
        |ORDER BY day_us, kind""".stripMargin) { (s, d) =>
      events(s, d)
        .groupBy(date_trunc("day", col("ts").cast("timestamp")).as("day"))
        .pivot("event_type", Seq("click", "error", "purchase"))
        .agg(count(lit(1))).na.fill(0L)
        .select(epochUs(col("day")).as("day_us"), col("click"),
          col("error"), col("purchase"))
        .unpivot(Array(col("day_us")),
          Array(col("click"), col("error"), col("purchase")),
          "kind", "n")
        .orderBy("day_us", "kind")
    },

    // DECILE BINNING by percentile cutoffs — NOT a global-order
    // ntile() window (that plans as ONE partition, the canonical
    // scale-killer): one aggregate computes 9 interpolated cutoffs,
    // they broadcast as literals, and binning is a narrow map.
    Q("q_a15_decile",
      s"""WITH c AS (SELECT
         |    [${(1 to 9).map(x =>
               s"quantile_cont(o_totalprice, 0.$x)").mkString(", ")}]
         |    AS cut FROM orders)
        |SELECT decile, count(*) AS n,
        |  CAST(FLOOR(min(o_totalprice) * 100) AS BIGINT) AS lo_cents,
        |  CAST(FLOOR(max(o_totalprice) * 100) AS BIGINT) AS hi_cents
        |FROM (SELECT o_totalprice,
        |        1 + CAST(len(list_filter(c.cut, v -> o_totalprice > v))
        |          AS BIGINT) AS decile
        |      FROM orders, c)
        |GROUP BY decile ORDER BY decile""".stripMargin) { (s, d) =>
      val orders = t(s, d, "orders")
      val cuts = orders.agg(
        percentile(col("o_totalprice"),
          array((1 to 9).map(x => lit(x / 10.0)): _*)).as("cut"))
        .collect()(0).getSeq[Double](0) // 9 doubles — config-sized
      val decile = lit(1) + cuts.map(c =>
        when(col("o_totalprice") > c, 1L).otherwise(0L)).reduce(_ + _)
      orders
        .withColumn("decile", decile.cast("long"))
        .groupBy("decile")
        .agg(count(lit(1)).as("n"),
          floor(min(col("o_totalprice")) * 100).cast("long").as("lo_cents"),
          floor(max(col("o_totalprice")) * 100).cast("long").as("hi_cents"))
        .orderBy("decile")
    },

    // TEMPORAL: as-of join — daily per-user state snapshots (latest
    // event at each probe instant). Spark has no ASOF JOIN; the
    // operator composes it as tagged-union + one window pass (one
    // shuffle, no range cross-join blowup). Oracle: DuckDB's NATIVE
    // ASOF JOIN — two unrelated formulations agreeing cell-exactly.
    Q("q_temporal_asof",
      """WITH users AS (SELECT DISTINCT user_id FROM events),
        |probes AS (SELECT u.user_id, g.probe_ts FROM users u
        |           CROSS JOIN generate_series(TIMESTAMP '2024-01-01',
        |             TIMESTAMP '2024-01-31', INTERVAL 1 DAY) g(probe_ts))
        |SELECT p.user_id, epoch_us(p.probe_ts) AS probe_us,
        |  epoch_us(e.ts) AS event_us, e.event_id, e.value
        |FROM probes p ASOF LEFT JOIN events e
        |  ON p.user_id = e.user_id AND e.ts <= p.probe_ts
        |ORDER BY p.user_id, probe_us""".stripMargin) { (s, d) =>
      val ev = events(s, d)
        .select(col("user_id"), col("ts").cast("timestamp").as("ts"),
          col("event_id"), col("value"))
      val probes = ev.select("user_id").distinct()
        .select(col("user_id"), explode(sequence(
          lit("2024-01-01 00:00:00").cast("timestamp"),
          lit("2024-01-31 00:00:00").cast("timestamp"),
          expr("interval 1 day"))).as("probe_ts"))
      graft.operators.Temporal
        .asofJoin(probes, ev, "user_id", "probe_ts", "ts",
          Seq("ts", "event_id", "value"))
        .select(col("user_id"), epochUs(col("probe_ts")).as("probe_us"),
          epochUs(col("ts")).as("event_us"), col("event_id"), col("value"))
        .orderBy("user_id", "probe_us")
    },

    // TEMPORAL: tolerance-bounded as-of — the nearest-earlier event
    // counts only when at most 2 days old (pandas merge_asof
    // tolerance semantics); staler matches null out, probes survive.
    // Same plan as the plain as-of plus a narrow freshness mask.
    Q("q_temporal_asof_tol",
      """WITH users AS (SELECT DISTINCT user_id FROM events),
        |probes AS (SELECT u.user_id, g.probe_ts FROM users u
        |           CROSS JOIN generate_series(TIMESTAMP '2024-01-01',
        |             TIMESTAMP '2024-01-31', INTERVAL 1 DAY) g(probe_ts))
        |SELECT p.user_id, epoch_us(p.probe_ts) AS probe_us,
        |  CASE WHEN e.ts IS NOT NULL AND epoch_us(p.probe_ts)
        |      - epoch_us(e.ts) <= 172800000000
        |    THEN epoch_us(e.ts) END AS event_us,
        |  CASE WHEN e.ts IS NOT NULL AND epoch_us(p.probe_ts)
        |      - epoch_us(e.ts) <= 172800000000
        |    THEN e.event_id END AS event_id
        |FROM probes p ASOF LEFT JOIN events e
        |  ON p.user_id = e.user_id AND e.ts <= p.probe_ts
        |ORDER BY p.user_id, probe_us""".stripMargin) { (s, d) =>
      val ev = events(s, d)
        .select(col("user_id"), col("ts").cast("timestamp").as("ts"),
          col("event_id"))
      val probes = ev.select("user_id").distinct()
        .select(col("user_id"), explode(sequence(
          lit("2024-01-01 00:00:00").cast("timestamp"),
          lit("2024-01-31 00:00:00").cast("timestamp"),
          expr("interval 1 day"))).as("probe_ts"))
      graft.operators.Temporal
        .asofJoinTolerant(probes, ev, "user_id", "probe_ts", "ts",
          Seq("ts", "event_id"), 172800000000L)
        .select(col("user_id"), epochUs(col("probe_ts")).as("probe_us"),
          epochUs(col("ts")).as("event_us"), col("event_id"))
        .orderBy("user_id", "probe_us")
    },

    // TEMPORAL: forward-fill imputation (LOCF) — error events carry a
    // null reading; each gets the user's most recent non-null value
    // instead (leading nulls stay null). Exact integer cents.
    Q("q_ts_locf",
      """WITH v AS (SELECT event_id, user_id, ts,
        |    CASE WHEN event_type = 'error' THEN NULL
        |         ELSE CAST(round(value * 100) AS BIGINT) END AS cents
        |  FROM events),
        |f AS (SELECT event_id, user_id, cents,
        |    last_value(cents IGNORE NULLS) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS cents_filled
        |  FROM v)
        |SELECT event_id, user_id, cents, cents_filled FROM f
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      val v = events(s, d).select(col("event_id"), col("user_id"),
        col("ts"),
        when(col("event_type") === "error", lit(null))
          .otherwise(round(col("value") * 100).cast("long"))
          .as("cents"))
      graft.operators.Temporal
        .forwardFill(v, "user_id", "ts", "event_id", "cents")
        .select("event_id", "user_id", "cents", "cents_filled")
        .orderBy("event_id")
    },

    // TEMPORAL: EWMA smoothing of the hourly event-count series per
    // type (α = 0.5 — a dyadic α makes every intermediate an exact
    // binary fraction of integer counts). The oracle re-folds each
    // prefix with list_reduce, whose first-element seeding matches
    // the operator's recurrence exactly — same left fold, same
    // rounding, bit-identical doubles.
    Q("q_ts_ewma",
      """WITH h AS (SELECT event_type AS grp, date_trunc('hour', ts)
        |    AS hr, CAST(count(*) AS DOUBLE) AS x
        |  FROM events GROUP BY 1, 2),
        |l AS (SELECT grp, list(x ORDER BY hr) AS xs FROM h GROUP BY grp)
        |SELECT grp, CAST(u.i - 1 AS BIGINT) AS pos, u.ewma FROM (
        |  SELECT grp, unnest(list_transform(range(1, len(xs) + 1), i ->
        |    struct_pack(i := i, ewma := list_reduce(
        |      xs[1:CAST(i AS INTEGER)],
        |      (a, x) -> a * 0.5 + x * 0.5)))) AS u
        |  FROM l)
        |ORDER BY grp, pos""".stripMargin) { (s, d) =>
      val h = events(s, d)
        .groupBy(col("event_type").as("grp"),
          date_trunc("hour", col("ts")).as("hr"))
        .agg(count(lit(1)).cast("double").as("x"))
      Temporal.ewma(h, "grp", "hr", "x", 0.5)
        .select(col("grp"), col("pos"), col("ewma"))
        .orderBy("grp", "pos")
    },

    // Segment-mergeable EWMA over DAILY counts — the unbounded-key
    // variant: 7-row segments fold independently, the carry chain
    // folds segment summaries, no task holds a full series. The
    // oracle is the plain WHOLE-SERIES fold: with α = 0.5 (dyadic)
    // over integer day-counts a 30-step series stays exactly
    // representable, so segmented ≡ sequential BIT-EXACTLY and the
    // hash compare proves the merge law on real data (PropertySpec
    // proves it on generated series).
    Q("q_ts_ewma_seg",
      """WITH h AS (SELECT event_type AS grp,
        |    CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
        |    CAST(count(*) AS DOUBLE) AS x
        |  FROM events GROUP BY 1, 2),
        |l AS (SELECT grp, list(struct_pack(d := d, x := x)
        |    ORDER BY d) AS xs FROM h GROUP BY grp)
        |SELECT grp, u.d AS d, u.x AS x, CAST(u.i - 1 AS BIGINT) AS pos,
        |  u.ewma FROM (
        |  SELECT grp, unnest(list_transform(range(1, len(xs) + 1), i ->
        |    struct_pack(d := xs[CAST(i AS INTEGER)].d,
        |      x := xs[CAST(i AS INTEGER)].x, i := i,
        |      ewma := list_reduce(
        |        list_transform(xs[1:CAST(i AS INTEGER)], e -> e.x),
        |        (a, x) -> a * 0.5 + x * 0.5)))) AS u
        |  FROM l)
        |ORDER BY grp, pos""".stripMargin) { (s, d) =>
      val h = events(s, d)
        .groupBy(col("event_type").as("grp"),
          date_trunc("day", col("ts")).as("d"))
        .agg(count(lit(1)).cast("double").as("x"))
      Temporal.ewmaSegmented(h, "grp", "d", "x", 0.5, 7)
        .select(col("grp"), col("d"), col("x"), col("pos"), col("ewma"))
        .orderBy("grp", "pos")
    },

    // STREAMING end-to-end: readStream(AvailableNow) → foreachBatch
    // idempotent merge (insert-if-absent by event_id) → parquet table,
    // run TWICE — checkpoint offsets and merge idempotency each
    // guarantee the rerun is a no-op. Oracle: the same windowed counts
    // straight off the raw table, so any duplicate or loss in the
    // streamed ingest breaks the hash.
    Q("q_st_exactly_once",
      """SELECT epoch_us(date_trunc('hour', ts)) AS window_start_us,
        |  event_type, count(*) AS n
        |FROM events GROUP BY 1, 2 ORDER BY window_start_us, event_type""".stripMargin) {
      (s, d) =>
      val src = s"$d/events.parquet"
      val schema = s.read.parquet(src).schema
      val work = workDir("graft-eo")
      val res = graft.streaming.Incremental.exactlyOnceIngest(
        s, src, schema, Seq("event_id"), work)
      val df = s.read.parquet(res)
      val ev = df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case _ => df.withColumn("ts", col("ts").cast("timestamp"))
      }
      ev.groupBy(window(col("ts").cast("timestamp"), "1 hour"),
          col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(epochUs(col("window.start")).as("window_start_us"),
          col("event_type"), col("n"))
        .orderBy("window_start_us", "event_type")
    },

    // STREAMING MANIFEST SINK (ST7): micro-batches commit into the
    // L5 manifest table under batch-id tags; the ENTIRE stream runs
    // TWICE from fresh checkpoints, so every tagged commit replays —
    // without the idempotence handshake each count below would
    // double. Oracle = plain batch aggregate from the source parquet.
    Q("q_st_manifest_sink",
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS nu
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin) {
      (s, d) =>
      val work = workDir("graft-st-manifest")
      val table = s"$work/table"
      val schema = s.read.parquet(s"$d/events.parquet").schema
      // the file stream source only accepts directories — stage the
      // input file into one (exactlyOnceIngest's arrangement)
      val srcDir = java.nio.file.Paths.get(work, "source")
      java.nio.file.Files.createDirectories(srcDir)
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$d/events.parquet"),
        srcDir.resolve("part-0.parquet"))
      for (run <- 1 to 2) {
        val stream = s.readStream.schema(schema)
          .parquet(srcDir.toString)
        graft.sources.ManifestTable.streamCommit(stream, table,
          s"$work/ckpt$run")
      }
      graft.sources.ManifestTable.read(s, table)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          count_distinct(col("user_id")).as("nu"))
        .orderBy("event_type")
    },

    // STREAMING MERGE SINK (ST8): micro-batches UPSERT into the
    // manifest table (Delta's streaming MERGE shape) — in-batch
    // latest-per-key pick, zone-confined rewrite, and VALUE-level
    // idempotence: the whole stream runs TWICE from fresh
    // checkpoints and converges to the same latest-row-per-key table
    // with no batch tags (contrast q_st_manifest_sink's append
    // counts, which need the tag handshake). Updates hit matched
    // keys (replace), brand-new keys (insert), and one key twice in
    // the batch (latest wins). Oracle = the plain batch upsert.
    Q("q_st_merge_sink",
      """WITH base AS (SELECT o_orderkey, o_orderstatus,
        |    CAST(0 AS BIGINT) AS ver FROM orders
        |  WHERE o_orderkey % 3 != 0),
        |up AS (
        |  SELECT o_orderkey, 'A' AS o_orderstatus,
        |    CAST(1 AS BIGINT) AS ver FROM orders
        |  WHERE o_orderkey % 5 = 0
        |  UNION ALL
        |  SELECT o_orderkey, 'B', CAST(2 AS BIGINT) FROM orders
        |  WHERE o_orderkey % 10 = 0),
        |lt AS (SELECT o_orderkey, o_orderstatus, ver FROM (
        |    SELECT up.*, row_number() OVER (PARTITION BY o_orderkey
        |      ORDER BY ver DESC, o_orderkey) AS rn FROM up)
        |  WHERE rn = 1)
        |SELECT o_orderkey, o_orderstatus, ver FROM (
        |  SELECT b.* FROM base b
        |  WHERE b.o_orderkey NOT IN (SELECT o_orderkey FROM lt)
        |  UNION ALL
        |  SELECT o_orderkey, o_orderstatus, ver FROM lt)
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      val work = workDir("graft-st-merge")
      val table = s"$work/table"
      val orders = t(s, d, "orders")
      val base = orders.filter(col("o_orderkey") % 3 =!= 0)
        .select(col("o_orderkey"), col("o_orderstatus"),
          lit(0L).as("ver"))
      graft.sources.ManifestTable.commitWithStats(
        base, table, append = false, "o_orderkey")
      val updates = orders.filter(col("o_orderkey") % 5 === 0)
        .select(col("o_orderkey"), lit("A").as("o_orderstatus"),
          lit(1L).as("ver"))
        .unionByName(orders.filter(col("o_orderkey") % 10 === 0)
          .select(col("o_orderkey"), lit("B").as("o_orderstatus"),
            lit(2L).as("ver")))
      val srcDir = java.nio.file.Paths.get(work, "updates")
      updates.coalesce(1).write.parquet(srcDir.toString)
      val schema = s.read.parquet(srcDir.toString).schema
      for (run <- 1 to 2) {
        val stream = s.readStream.schema(schema)
          .parquet(srcDir.toString)
        graft.sources.ManifestTable.streamMerge(stream, table,
          s"$work/ckpt$run", "o_orderkey", "ver")
      }
      graft.sources.ManifestTable.read(s, table)
        .select("o_orderkey", "o_orderstatus", "ver")
        .orderBy("o_orderkey")
    },

    // CDC APPLY: batch change-log merge — latest op per key wins,
    // upserts replace/insert full records, deletes drop the key. The
    // change set synthesizes an update stream (keys %5 -> status 'A'
    // at ts=key) overlaid by later deletes (keys %10 at ts=key+1),
    // so latest-wins, insert-new-key, and delete all exercise.
    Q("q_m10_apply_changelog",
      """WITH base AS (SELECT o_orderkey, o_orderstatus FROM orders
        |  WHERE o_orderkey % 3 != 0),
        |ch AS (
        |  SELECT o_orderkey, 'A' AS o_orderstatus, 'U' AS op,
        |    o_orderkey AS ts FROM orders WHERE o_orderkey % 5 = 0
        |  UNION ALL
        |  SELECT o_orderkey, 'X', 'D', o_orderkey + 1 FROM orders
        |  WHERE o_orderkey % 10 = 0),
        |lt AS (SELECT * FROM (SELECT ch.*, row_number() OVER (
        |    PARTITION BY o_orderkey ORDER BY ts DESC) AS rn FROM ch)
        |  WHERE rn = 1)
        |SELECT o_orderkey, o_orderstatus FROM (
        |  SELECT b.o_orderkey, b.o_orderstatus FROM base b
        |  WHERE b.o_orderkey NOT IN (SELECT o_orderkey FROM lt)
        |  UNION ALL
        |  SELECT o_orderkey, o_orderstatus FROM lt WHERE op != 'D')
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      val orders = t(s, d, "orders")
      val base = orders.filter(col("o_orderkey") % 3 =!= 0)
        .select(col("o_orderkey"), col("o_orderstatus"))
      val chU = orders.filter(col("o_orderkey") % 5 === 0)
        .select(col("o_orderkey"), lit("A").as("o_orderstatus"),
          lit("U").as("op"), col("o_orderkey").as("ts"))
      val chD = orders.filter(col("o_orderkey") % 10 === 0)
        .select(col("o_orderkey"), lit("X").as("o_orderstatus"),
          lit("D").as("op"), (col("o_orderkey") + 1).as("ts"))
      Merge.applyChangeLog(base, chU.unionByName(chD),
          Seq("o_orderkey"), "ts", "op")
        .orderBy("o_orderkey")
    },

    // EVENT ANALYTICS: sequential conversion funnel over the first
    // two days — first view, first click AFTER that view, first
    // purchase AFTER that click, per user (null once the user drops
    // out). Each stage is one filtered min-aggregate joined back on
    // the user key; no per-user event sort anywhere.
    Q("q_funnel",
      """WITH w AS (SELECT * FROM events
        |  WHERE ts < TIMESTAMP '2024-01-03 00:00:00'),
        |v AS (SELECT user_id, min(ts) AS t0 FROM w
        |  WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT w.user_id, min(w.ts) AS t1 FROM w
        |  JOIN v ON v.user_id = w.user_id
        |  WHERE w.event_type = 'click' AND w.ts > v.t0 GROUP BY 1),
        |p AS (SELECT w.user_id, min(w.ts) AS t2 FROM w
        |  JOIN c ON c.user_id = w.user_id
        |  WHERE w.event_type = 'purchase' AND w.ts > c.t1 GROUP BY 1)
        |SELECT v.user_id, epoch_us(v.t0) AS t0_us,
        |  epoch_us(c.t1) AS t1_us, epoch_us(p.t2) AS t2_us
        |FROM v LEFT JOIN c ON c.user_id = v.user_id
        |  LEFT JOIN p ON p.user_id = v.user_id
        |ORDER BY v.user_id""".stripMargin) { (s, d) =>
      val w = events(s, d)
        .filter(col("ts") < lit("2024-01-03 00:00:00").cast("timestamp"))
      Sessionize.funnel(w, "user_id", "event_type", "ts",
          Seq("view", "click", "purchase"))
        .select(col("user_id"), epochUs(col("t0")).as("t0_us"),
          epochUs(col("t1")).as("t1_us"), epochUs(col("t2")).as("t2_us"))
        .orderBy("user_id")
    },

    // STREAMING (batch-equivalent): session windows with a 24h
    // inactivity gap — the batch formulation of
    // streaming.Sessionize.streamingSessions (flatMapGroupsWithState);
    // ScaleSpec asserts the two agree on a shared stream.
    Q("q_st_sessions",
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us
        |  FROM events),
        |m AS (SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
        |    OR ts_us - lag(ts_us) OVER w > 86400000000 THEN 1 ELSE 0 END
        |    AS is_new
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |s AS (SELECT *, CAST(SUM(is_new) OVER (
        |    PARTITION BY user_id ORDER BY ts_us, event_id
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_n FROM m)
        |SELECT user_id, session_n, min(ts_us) AS session_start_us,
        |  max(ts_us) AS session_end_us, count(*) AS n_events
        |FROM s GROUP BY 1, 2 ORDER BY user_id, session_n""".stripMargin) {
      (s, d) =>
      graft.streaming.Sessionize.batchSessions(
          events(s, d), "user_id", "ts", "event_id", 86400000000L)
        .orderBy("user_id", "session_n")
    })
}
