package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.{Merge, Predicates}

/** The relational [Q] inventory of SURVEY.md §2.2-§2.5 + §2.11 over
  * the driver testdata (TESTDATA.md): filters, joins, aggregations,
  * windows, set ops. Every query ends in ORDER BY on a unique tuple
  * and emits only bigint/string/deterministic-double columns so the
  * DuckDB oracle hash-matches bit-for-bit.
  *
  * Scale notes are per query; the common rules: aggregations are
  * partial-agg (map-side combine) by construction, joins broadcast the
  * dimension side (explicitly where we know it, via AQE elsewhere),
  * and top-k is orderBy+limit so it plans as TakeOrderedAndProject —
  * only k rows ever cross the final exchange.
  */
object Relational {

  val all: Seq[Q] = Seq(

    // S4: table scan with projection+filter pushdown — the plan must
    // show PushedFilters + a 3-column ReadSchema.
    Q("q_s4_scan_prune",
      """SELECT l_orderkey, l_linenumber, CAST(l_quantity AS BIGINT) AS qty
        |FROM lineitem WHERE l_quantity >= 45
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_quantity") >= 45)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast("long").as("qty"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // P2: equality filter.
    Q("q_p2_filter_eq",
      """SELECT o_orderkey, o_custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY o_orderkey LIMIT 1000""".stripMargin) { (s, d) =>
      t(s, d, "orders").filter(col("o_orderstatus") === "F")
        .select("o_orderkey", "o_custkey").orderBy("o_orderkey").limit(1000)
    },

    // P3: LIKE patterns (contains + prefix).
    Q("q_p3_filter_like",
      """SELECT p_partkey, p_name, p_type FROM part
        |WHERE p_name LIKE '%red%' AND p_type LIKE 'SMALL%'
        |ORDER BY p_partkey""".stripMargin) { (s, d) =>
      t(s, d, "part")
        .filter(col("p_name").like("%red%") && col("p_type").like("SMALL%"))
        .select("p_partkey", "p_name", "p_type").orderBy("p_partkey")
    },

    // P4: NULL / NOT NULL predicates (nulls synthesized via NULLIF —
    // the testdata has none at rest).
    Q("q_p4_null_pred",
      """SELECT o_orderstatus,
        |  CAST(sum(CASE WHEN NULLIF(o_orderpriority, '1-URGENT') IS NULL
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent,
        |  count(*) AS n
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (s, d) =>
      t(s, d, "orders")
        .groupBy("o_orderstatus")
        .agg(
          sum(when(nullif(col("o_orderpriority"), lit("1-URGENT")).isNull, 1)
            .otherwise(0)).as("n_urgent"),
          count(lit(1)).as("n"))
        .orderBy("o_orderstatus")
    },

    // P5: dropna / empty-string guards.
    Q("q_p5_dropna",
      """SELECT o_orderkey, p FROM (
        |  SELECT o_orderkey, NULLIF(o_orderpriority, '3-MEDIUM') AS p
        |  FROM orders)
        |WHERE p IS NOT NULL AND p <> '' ORDER BY o_orderkey LIMIT 1000""".stripMargin) { (s, d) =>
      t(s, d, "orders")
        .select(col("o_orderkey"),
          nullif(col("o_orderpriority"), lit("3-MEDIUM")).as("p"))
        .na.drop(Seq("p"))
        .filter(col("p") =!= "")
        .orderBy("o_orderkey").limit(1000)
    },

    // P6: dynamic predicate assembly — optional filters from config,
    // all pushed to the scan.
    Q("q_p6_dynamic_pred",
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_orderstatus = 'F' AND o_totalprice >= 100000.0
        |ORDER BY o_orderkey LIMIT 500""".stripMargin) { (s, d) =>
      Predicates.assemble(t(s, d, "orders"), Seq(
          Some(Predicates.Eq("o_orderstatus", "F")),
          Some(Predicates.Ge("o_totalprice", 100000.0)),
          None))
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey").limit(500)
    },

    // P7: CASE WHEN conditional value expression.
    Q("q_p7_case_when",
      """SELECT CASE WHEN c_acctbal > 5000 THEN 'high'
        |            WHEN c_acctbal > 0 THEN 'mid' ELSE 'low' END AS tier,
        |  count(*) AS n
        |FROM customer GROUP BY 1 ORDER BY tier""".stripMargin) { (s, d) =>
      t(s, d, "customer")
        .select(when(col("c_acctbal") > 5000, "high")
          .when(col("c_acctbal") > 0, "mid").otherwise("low").as("tier"))
        .groupBy("tier").agg(count(lit(1)).as("n"))
        .orderBy("tier")
    },

    // J1: inner equi-join fact⋈dim + group; dim side broadcast by AQE.
    Q("q_j1_join_inner",
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  count(DISTINCT o_custkey) AS n_cust
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (s, d) =>
      t(s, d, "orders")
        .join(t(s, d, "customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          countDistinct("o_custkey").as("n_cust"))
        .orderBy("c_mktsegment")
    },

    // J2: join on a text key.
    Q("q_j2_join_text_key",
      """SELECT p_brand, count(*) AS n, CAST(sum(l_quantity) AS BIGINT) AS qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin) { (s, d) =>
      t(s, d, "lineitem")
        .join(t(s, d, "part"), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity")).cast("long").as("qty"))
        .orderBy("p_brand")
    },

    // J3: multi-way join chain lineitem⋈orders⋈customer⋈nation⋈region.
    Q("q_j3_multiway_join",
      """SELECT r_name, n_name, count(*) AS n
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin) { (s, d) =>
      t(s, d, "lineitem")
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, d, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name").agg(count(lit(1)).as("n"))
        .orderBy("r_name", "n_name")
    },

    // J4: left outer join with null-skipping count (zero-order
    // customers keep a row with n = 0).
    Q("q_j4_left_join",
      """SELECT c_custkey, count(o_orderkey) AS n
        |FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        |GROUP BY c_custkey ORDER BY c_custkey LIMIT 1000""".stripMargin) { (s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders"), col("o_custkey") === col("c_custkey"), "left")
        .groupBy("c_custkey").agg(count(col("o_orderkey")).as("n"))
        .orderBy("c_custkey").limit(1000)
    },

    // J5: anti-join (LEFT JOIN ... IS NULL shape) — customers without
    // orders.
    Q("q_j5_anti_join",
      """SELECT c_custkey FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"),
          "left_anti")
        .select("c_custkey").orderBy("c_custkey")
    },

    // J6: anti-join (NOT EXISTS shape) — parts never ordered.
    Q("q_j6_not_exists",
      """SELECT p_partkey FROM part
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
        |ORDER BY p_partkey""".stripMargin) { (s, d) =>
      t(s, d, "part")
        .join(t(s, d, "lineitem"), col("p_partkey") === col("l_partkey"),
          "left_anti")
        .select("p_partkey").orderBy("p_partkey")
    },

    // J7: anti-join (NOT IN shape; keys are non-null so NOT IN ≡ anti).
    Q("q_j7_not_in",
      """SELECT s_suppkey FROM supplier
        |WHERE s_suppkey NOT IN (SELECT l_suppkey FROM lineitem)
        |ORDER BY s_suppkey""".stripMargin) { (s, d) =>
      t(s, d, "supplier")
        .join(t(s, d, "lineitem"), col("s_suppkey") === col("l_suppkey"),
          "left_anti")
        .select("s_suppkey").orderBy("s_suppkey")
    },

    // J8: semi-join (EXISTS shape) — customers with an open order.
    Q("q_j8_semi_join",
      """SELECT c_custkey FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
        |ORDER BY c_custkey LIMIT 1000""".stripMargin) { (s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders").filter(col("o_orderstatus") === "O"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey").orderBy("c_custkey").limit(1000)
    },

    // J9: anti-join with compound condition.
    Q("q_j9_anti_compound",
      """SELECT DISTINCT l_orderkey FROM lineitem
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_orderkey = l_orderkey AND o_orderstatus = 'F')
        |ORDER BY l_orderkey LIMIT 1000""".stripMargin) { (s, d) =>
      val o = t(s, d, "orders")
      t(s, d, "lineitem")
        .join(o, col("l_orderkey") === col("o_orderkey") &&
          col("o_orderstatus") === "F", "left_anti")
        .select("l_orderkey").distinct()
        .orderBy("l_orderkey").limit(1000)
    },

    // J10/M6: update-join with null guard (inheritance backfill).
    Q("q_j10_update_join",
      """SELECT o_orderkey,
        |  coalesce(CASE WHEN o_orderkey % 2 = 0 THEN NULL
        |                ELSE o_orderpriority END, c_mktsegment) AS o_channel
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey LIMIT 5000""".stripMargin) { (s, d) =>
      val child = t(s, d, "orders")
        .withColumn("o_channel",
          when(col("o_orderkey") % 2 === 0, lit(null))
            .otherwise(col("o_orderpriority")))
      Merge.inheritBackfill(child,
          t(s, d, "customer").select(col("c_custkey"), col("c_mktsegment")),
          "o_custkey", "c_custkey", Map("o_channel" -> "c_mktsegment"))
        .select("o_orderkey", "o_channel")
        .orderBy("o_orderkey").limit(5000)
    },

    // J11: the reference's N+1 per-row lookup as ONE broadcast join —
    // the structural win (ETL.py:512-556). broadcast() is explicit.
    Q("q_j11_broadcast_lookup",
      """SELECT n_name, count(*) AS n, CAST(sum(l_quantity) AS BIGINT) AS qty
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin) { (s, d) =>
      t(s, d, "lineitem")
        .join(broadcast(t(s, d, "supplier")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, d, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity")).cast("long").as("qty"))
        .orderBy("n_name")
    },

    // J12: small cross product.
    Q("q_j12_cross_small",
      """SELECT r_name, o_orderstatus
        |FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders)
        |ORDER BY r_name, o_orderstatus""".stripMargin) { (s, d) =>
      t(s, d, "region").select("r_name")
        .crossJoin(t(s, d, "orders").select("o_orderstatus").distinct())
        .orderBy("r_name", "o_orderstatus")
    },

    // W5: LAG-based day-over-day delta — per event type, each day's
    // count next to the previous day's and the signed difference
    // (the offset window function family, distinct from frames).
    Q("q_w5_lag_delta",
      """WITH d AS (SELECT event_type, epoch_us(date_trunc('day', ts))
        |    AS day_us, count(*) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, day_us, CAST(n AS BIGINT) AS n,
        |  CAST(lag(n) OVER (PARTITION BY event_type ORDER BY day_us)
        |    AS BIGINT) AS prev_n,
        |  CAST(n - lag(n) OVER (PARTITION BY event_type
        |    ORDER BY day_us) AS BIGINT) AS delta
        |FROM d ORDER BY event_type, day_us""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("event_type").orderBy("day_us")
      events(s, d)
        .groupBy(col("event_type"),
          epochUs(date_trunc("day", col("ts"))).as("day_us"))
        .agg(count(lit(1)).as("n"))
        .withColumn("prev_n", lag(col("n"), 1).over(w))
        .withColumn("delta", col("n") - col("prev_n"))
        .orderBy("event_type", "day_us")
    },

    // W4: RANGE-frame rolling window — per user, the trailing-hour
    // event count and cents sum at every event (value-based frame:
    // peers at the same timestamp are in-frame on both engines, so
    // the result is deterministic even with duplicate timestamps).
    // One window shuffle on the user; state per partition is the
    // sliding frame, never the history.
    Q("q_w4_rolling_range",
      """WITH v AS (SELECT user_id, event_id, epoch_us(ts) AS us,
        |    CAST(round(value * 100) AS BIGINT) AS cents FROM events)
        |SELECT user_id, event_id,
        |  CAST(count(*) OVER w AS BIGINT) AS n_1h,
        |  CAST(sum(cents) OVER w AS BIGINT) AS cents_1h
        |FROM v WINDOW w AS (PARTITION BY user_id ORDER BY us
        |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("us")
        .rangeBetween(-3600000000L, 0L)
      events(s, d)
        .select(col("user_id"), col("event_id"),
          epochUs(col("ts")).as("us"),
          round(col("value") * 100).cast("long").as("cents"))
        .withColumn("n_1h", count(lit(1)).over(w))
        .withColumn("cents_1h", sum(col("cents")).over(w))
        .select("user_id", "event_id", "n_1h", "cents_1h")
        .orderBy("event_id")
    },

    // J14: fuzzy string join — edit-distance ≤ 1 pairs over the
    // distinct brand vocabulary via deletion-neighborhood blocking
    // (FastSS): candidates share a deletion variant (equi-join, never
    // all-pairs), exact levenshtein confirms. The typo-tolerant
    // variant of the text-keyed join J2; both engines verify with
    // their native levenshtein.
    Q("q_j14_fuzzy_join",
      """WITH b AS (SELECT DISTINCT p_brand AS s FROM part),
        |v AS (SELECT DISTINCT s, unnest(list_append(
        |    list_transform(range(1, length(s) + 1),
        |      i -> substr(s, 1, i - 1) || substr(s, i + 1, length(s))),
        |    s)) AS k FROM b),
        |vc AS (SELECT k FROM v GROUP BY k HAVING count(*) <= 1000),
        |bl AS (SELECT v.s, v.k FROM v JOIN vc USING (k)),
        |p AS (SELECT DISTINCT a.s AS id_a, b2.s AS id_b
        |  FROM bl a JOIN bl b2 ON a.k = b2.k AND a.s < b2.s)
        |SELECT id_a, id_b,
        |  CAST(levenshtein(id_a, id_b) AS INTEGER) AS dist
        |FROM p WHERE levenshtein(id_a, id_b) <= 1
        |ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
      val brands = t(s, d, "part").select(col("p_brand").as("s"))
        .distinct().withColumn("bid", col("s"))
      graft.operators.Dedup.editDistancePairs(brands, "bid", "s")
        .select("id_a", "id_b", "dist")
        .orderBy("id_a", "id_b")
    },

    // E2E ENTITY RESOLUTION: the full record-linkage recipe composed
    // from graded stages — deletion-blocked ED<=1 candidate pairs
    // (J14) over supplier names, connected-component clustering (D5),
    // survivor selection (smallest suppkey), cluster cardinalities.
    // Oracle: recursive transitive closure with the same min-label
    // fixpoint semantics.
    Q("q_e2e_entity_res",
      """WITH n AS (SELECT DISTINCT s_name AS s FROM supplier),
        |v AS (SELECT DISTINCT s, unnest(list_append(
        |    list_transform(range(1, length(s) + 1),
        |      i -> substr(s, 1, i - 1) || substr(s, i + 1, length(s))),
        |    s)) AS k FROM n),
        |vc AS (SELECT k FROM v GROUP BY k HAVING count(*) <= 1000),
        |bl AS (SELECT v.s, v.k FROM v JOIN vc USING (k)),
        |p AS (SELECT DISTINCT a.s AS id_a, b2.s AS id_b
        |  FROM bl a JOIN bl b2 ON a.k = b2.k AND a.s < b2.s),
        |pd AS (SELECT id_a, id_b FROM p
        |  WHERE levenshtein(id_a, id_b) <= 1),
        |edges AS (SELECT id_a AS s, id_b AS t FROM pd
        |          UNION SELECT id_b, id_a FROM pd),
        |closure AS (
        |  WITH RECURSIVE r(s, t) AS (
        |    SELECT s, t FROM edges
        |    UNION
        |    SELECT r.s, e.t FROM r JOIN edges e ON r.t = e.s)
        |  SELECT * FROM r),
        |cl AS (SELECT n.s AS nm,
        |    least(n.s, coalesce(min(c.t), n.s)) AS cluster_id
        |  FROM n LEFT JOIN closure c ON c.s = n.s GROUP BY n.s),
        |wc AS (SELECT sup.s_suppkey, sup.s_name, cl.cluster_id
        |  FROM supplier sup JOIN cl ON sup.s_name = cl.nm),
        |sz AS (SELECT cluster_id, count(*) AS n_members FROM wc
        |  GROUP BY 1),
        |kv AS (SELECT cluster_id, min(s_suppkey) AS s_suppkey FROM wc
        |  GROUP BY 1)
        |SELECT wc.cluster_id, CAST(sz.n_members AS BIGINT) AS n_members,
        |  wc.s_suppkey, wc.s_name
        |FROM wc JOIN kv ON wc.cluster_id = kv.cluster_id
        |              AND wc.s_suppkey = kv.s_suppkey
        |JOIN sz ON wc.cluster_id = sz.cluster_id
        |ORDER BY wc.cluster_id""".stripMargin) { (s, d) =>
      val sup = t(s, d, "supplier").select(col("s_suppkey"), col("s_name"))
      val names = sup.select(col("s_name").as("nm")).distinct()
      val pairs = graft.operators.Dedup.editDistancePairs(
          names.withColumn("nid", col("nm")), "nid", "nm")
        .select("id_a", "id_b")
      val clusters = graft.operators.Dedup.duplicateClusters(
        names, "nm", pairs)
      val withC = sup.join(clusters, sup("s_name") === clusters("nm"))
        .drop("nm")
      val surv = graft.operators.Dedup.keepBestPerCluster(
          withC.withColumn("__score", -col("s_suppkey")),
          "s_suppkey", "cluster_id", "__score")
        .drop("__score")
      val sizes = withC.groupBy("cluster_id")
        .agg(count(lit(1)).as("n_members"))
      surv.join(sizes, Seq("cluster_id"))
        .select("cluster_id", "n_members", "s_suppkey", "s_name")
        .orderBy("cluster_id")
    },

    // A1: global COUNT(*).
    Q("q_a1_count_star",
      "SELECT count(*) AS n FROM lineitem") { (s, d) =>
      t(s, d, "lineitem").agg(count(lit(1)).as("n"))
    },

    // A2: COUNT(DISTINCT).
    Q("q_a2_count_distinct",
      """SELECT count(DISTINCT o_custkey) AS n_cust,
        |  count(DISTINCT o_orderpriority) AS n_prio FROM orders""".stripMargin) { (s, d) =>
      t(s, d, "orders")
        .agg(countDistinct("o_custkey").as("n_cust"),
          countDistinct("o_orderpriority").as("n_prio"))
    },

    // A3: COUNT(col) null-skipping semantics.
    Q("q_a3_count_col",
      """SELECT count(NULLIF(o_orderpriority, '5-LOW')) AS n_not_low,
        |  count(*) AS n FROM orders""".stripMargin) { (s, d) =>
      t(s, d, "orders")
        .agg(count(nullif(col("o_orderpriority"), lit("5-LOW"))).as("n_not_low"),
          count(lit(1)).as("n"))
    },

    // A4: conditional aggregation.
    Q("q_a4_cond_agg",
      """SELECT l_linestatus,
        |  CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_returned,
        |  CAST(sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_discounted,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin) { (s, d) =>
      t(s, d, "lineitem")
        .groupBy("l_linestatus")
        .agg(
          sum(when(col("l_returnflag") === "R", 1).otherwise(0)).as("n_returned"),
          sum(when(col("l_discount") > 0.05, 1).otherwise(0)).as("n_discounted"),
          count(lit(1)).as("n"))
        .orderBy("l_linestatus")
    },

    // A5: GROUP BY + count + ORDER BY count DESC + LIMIT (top-k):
    // plans as partial agg + TakeOrderedAndProject.
    Q("q_a5_topk_groups",
      """SELECT o_custkey, count(*) AS n FROM orders
        |GROUP BY o_custkey ORDER BY n DESC, o_custkey LIMIT 10""".stripMargin) { (s, d) =>
      t(s, d, "orders")
        .groupBy("o_custkey").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("o_custkey").asc).limit(10)
    },

    // A6: MIN/MAX (timestamps as epoch micros; min/max of double is
    // order-independent, so raw doubles are safe here).
    Q("q_a6_minmax",
      """SELECT o_orderstatus,
        |  min(epoch_us(o_orderdate)) AS first_us,
        |  max(epoch_us(o_orderdate)) AS last_us,
        |  min(o_totalprice) AS min_price, max(o_totalprice) AS max_price
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (s, d) =>
      t(s, d, "orders")
        .groupBy("o_orderstatus")
        .agg(min(epochUs(col("o_orderdate"))).as("first_us"),
          max(epochUs(col("o_orderdate"))).as("last_us"),
          min("o_totalprice").as("min_price"),
          max("o_totalprice").as("max_price"))
        .orderBy("o_orderstatus")
    },

    // A7: multi-key GROUP BY — the flagship TPC-H-Q1-shaped agg.
    // Doubles are summed as exact integers (qty is integral; price in
    // floor-cents) so the result hashes identically everywhere.
    Q("q_a7_multikey_agg",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
        |  CAST(sum(floor(l_extendedprice * 100)) AS BIGINT) AS sum_price_cents,
        |  count(*) AS n,
        |  CAST(sum(l_quantity) AS DOUBLE) / count(*) AS avg_qty
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      t(s, d, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity")).cast("long").as("sum_qty"),
          sum(floor(col("l_extendedprice") * 100)).cast("long")
            .as("sum_price_cents"),
          count(lit(1)).as("n"))
        .withColumn("avg_qty",
          col("sum_qty").cast("double") / col("n"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // A8: ORDERED group-concat — array_sort before join, the engine's
    // answer to pandas' file-order groupby ' '.join
    // (/root/reference/utils/details_translator/3_group_ocr_results_by_img_&_collection.py:31-33).
    Q("q_a8_group_concat",
      """SELECT l_orderkey,
        |  string_agg(CAST(l_linenumber AS VARCHAR), ' ' ORDER BY l_linenumber)
        |    AS lines,
        |  count(*) AS n
        |FROM lineitem WHERE l_orderkey % 97 = 0
        |GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin) { (s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_orderkey") % 97 === 0)
        .groupBy("l_orderkey")
        .agg(
          array_join(
            transform(array_sort(collect_list(col("l_linenumber"))),
              _.cast("string")), " ").as("lines"),
          count(lit(1)).as("n"))
        .orderBy("l_orderkey")
    },

    // A9: DISTINCT dictionary build.
    Q("q_a9_distinct",
      "SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment") { (s, d) =>
      t(s, d, "customer").select("c_mktsegment").distinct()
        .orderBy("c_mktsegment")
    },

    // A10: get-or-create keyed dictionary — distinct + deterministic
    // id, replacing the reference's per-row SELECT-then-INSERT
    // (/root/reference/utils/product_attributes_etl.py:60-80).
    Q("q_a10_dictionary",
      s"""SELECT ${sqlDetId("concat_ws('|', 'brand', p_brand)")} AS attr_id,
         |  p_brand
         |FROM (SELECT DISTINCT p_brand FROM part) ORDER BY p_brand""".stripMargin) { (s, d) =>
      t(s, d, "part").select("p_brand").distinct()
        .select(graft.functions.deterministicId(lit("brand"), col("p_brand"))
          .as("attr_id"), col("p_brand"))
        .orderBy("p_brand")
    },

    // A11: percentage reporting (bigint counts, one double division).
    Q("q_a11_pct",
      """SELECT o_orderstatus, n,
        |  CAST(n AS DOUBLE) * 100.0 / CAST(total AS DOUBLE) AS pct
        |FROM (SELECT o_orderstatus, count(*) AS n,
        |        sum(count(*)) OVER () AS total
        |      FROM orders GROUP BY o_orderstatus)
        |ORDER BY o_orderstatus""".stripMargin) { (s, d) =>
      t(s, d, "orders")
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
        .withColumn("total", sum(col("n")).over(Window.partitionBy()))
        .select(col("o_orderstatus"), col("n"),
          (col("n").cast("double") * 100.0 / col("total").cast("double"))
            .as("pct"))
        .orderBy("o_orderstatus")
    },

    // A12 (engine extension, free Spark built-in beyond the
    // reference): ROLLUP subtotals. Null group labels are coalesced
    // to a sentinel so the oracle hash treats them identically.
    Q("q_a12_rollup",
      """SELECT coalesce(o_orderstatus, '<all>') AS status,
        |  coalesce(o_orderpriority, '<all>') AS priority,
        |  count(*) AS n
        |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin) { (s, d) =>
      t(s, d, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"))
        .select(coalesce(col("o_orderstatus"), lit("<all>")).as("status"),
          coalesce(col("o_orderpriority"), lit("<all>")).as("priority"),
          col("n"))
        .orderBy("status", "priority")
    },

    // A12b (engine extension): CUBE — every grouping-set combination,
    // same sentinel treatment as the rollup.
    Q("q_a12_cube",
      """SELECT coalesce(o_orderstatus, '<all>') AS status,
        |  coalesce(o_orderpriority, '<all>') AS priority,
        |  count(*) AS n
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin) { (s, d) =>
      t(s, d, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"))
        .select(coalesce(col("o_orderstatus"), lit("<all>")).as("status"),
          coalesce(col("o_orderpriority"), lit("<all>")).as("priority"),
          col("n"))
        .orderBy("status", "priority")
    },

    // A13 (engine extension): exact interpolated percentiles — the
    // same (n-1)*p linear interpolation in Spark `percentile` and
    // DuckDB `quantile_cont`, over identical doubles.
    Q("q_a13_percentile",
      """SELECT o_orderstatus,
        |  quantile_cont(o_totalprice, 0.5) AS p50,
        |  quantile_cont(o_totalprice, 0.9) AS p90
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (s, d) =>
      t(s, d, "orders")
        .groupBy("o_orderstatus")
        .agg(percentile(col("o_totalprice"), lit(0.5)).as("p50"),
          percentile(col("o_totalprice"), lit(0.9)).as("p90"))
        .orderBy("o_orderstatus")
    },

    // W1: first row per group (master record) via row_number. The
    // window order is a UNIQUE tuple — (orderkey, linenumber) alone is
    // not unique in this testdata, and a tied row_number picks
    // different winners in different engines.
    Q("q_w1_first_per_group",
      """SELECT l_orderkey, l_linenumber, l_partkey FROM (
        |  SELECT l_orderkey, l_linenumber, l_partkey,
        |    row_number() OVER (PARTITION BY l_orderkey
        |      ORDER BY l_linenumber, l_partkey, l_suppkey) AS rn
        |  FROM lineitem)
        |WHERE rn = 1 ORDER BY l_orderkey LIMIT 2000""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("l_orderkey")
        .orderBy("l_linenumber", "l_partkey", "l_suppkey")
      t(s, d, "lineitem")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("l_orderkey", "l_linenumber", "l_partkey")
        .orderBy("l_orderkey").limit(2000)
    },

    // W2: all-but-first rows per group (variants).
    Q("q_w2_variants",
      """SELECT l_orderkey, l_linenumber FROM (
        |  SELECT l_orderkey, l_linenumber,
        |    row_number() OVER (PARTITION BY l_orderkey
        |      ORDER BY l_linenumber, l_partkey, l_suppkey) AS rn
        |  FROM lineitem)
        |WHERE rn > 1 ORDER BY l_orderkey, l_linenumber LIMIT 2000""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("l_orderkey")
        .orderBy("l_linenumber", "l_partkey", "l_suppkey")
      t(s, d, "lineitem")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") > 1)
        .select("l_orderkey", "l_linenumber")
        .orderBy("l_orderkey", "l_linenumber").limit(2000)
    },

    // W3: per-group ordinal index (deterministic tie-break by key).
    Q("q_w3_ordinal",
      """SELECT o_custkey, rn, o_orderkey FROM (
        |  SELECT o_custkey, o_orderkey,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_orderdate, o_orderkey) AS rn
        |  FROM orders)
        |WHERE o_custkey % 15 = 0
        |ORDER BY o_custkey, rn""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
      t(s, d, "orders")
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("o_custkey") % 15 === 0)
        .select("o_custkey", "rn", "o_orderkey")
        .orderBy("o_custkey", "rn")
    },

    // SET: except / set-difference on a key.
    Q("q_set_except",
      """SELECT c_custkey FROM customer
        |EXCEPT SELECT o_custkey AS c_custkey FROM orders
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      Merge.exceptByKey(t(s, d, "customer"),
          t(s, d, "orders").withColumnRenamed("o_custkey", "c_custkey"),
          Seq("c_custkey"))
        .orderBy("c_custkey")
    },

    // AUDIT: orphan detection pack — the reference's verify queries
    // (/root/reference/utils/importer/verify_etl_results.py:114-124)
    // as one labeled union; counts must be 0 on consistent data.
    Q("q_audit_orphans",
      """SELECT 'lineitem_no_order' AS check_name,
        |  (SELECT count(*) FROM lineitem WHERE NOT EXISTS
        |    (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)) AS n
        |UNION ALL
        |SELECT 'order_no_customer',
        |  (SELECT count(*) FROM orders WHERE NOT EXISTS
        |    (SELECT 1 FROM customer WHERE c_custkey = o_custkey))
        |UNION ALL
        |SELECT 'lineitem_no_part',
        |  (SELECT count(*) FROM lineitem WHERE NOT EXISTS
        |    (SELECT 1 FROM part WHERE p_partkey = l_partkey))
        |ORDER BY check_name""".stripMargin) { (s, d) =>
      val li = t(s, d, "lineitem")
      val o = t(s, d, "orders")
      def one(label: String, df: org.apache.spark.sql.DataFrame) =
        df.agg(count(lit(1)).as("n")).select(lit(label).as("check_name"),
          col("n"))
      one("lineitem_no_order",
          li.join(o, col("l_orderkey") === col("o_orderkey"), "left_anti"))
        .unionByName(one("order_no_customer",
          o.join(t(s, d, "customer"),
            col("o_custkey") === col("c_custkey"), "left_anti")))
        .unionByName(one("lineitem_no_part",
          li.join(t(s, d, "part"),
            col("l_partkey") === col("p_partkey"), "left_anti")))
        .orderBy("check_name")
    },

    // AUDIT: completeness stats (verify_collections.py:47-66 shape).
    Q("q_audit_completeness",
      """SELECT count(*) AS n,
        |  count(NULLIF(o_orderpriority, '')) AS n_priority,
        |  count(NULLIF(o_orderstatus, '')) AS n_status,
        |  CAST(count(NULLIF(o_orderpriority, '')) AS DOUBLE) * 100.0
        |    / CAST(count(*) AS DOUBLE) AS pct_priority
        |FROM orders""".stripMargin) { (s, d) =>
      t(s, d, "orders").agg(
        count(lit(1)).as("n"),
        count(nullif(col("o_orderpriority"), lit(""))).as("n_priority"),
        count(nullif(col("o_orderstatus"), lit(""))).as("n_status"))
        .withColumn("pct_priority",
          col("n_priority").cast("double") * 100.0 / col("n").cast("double"))
    },

    // AUDIT: relationship cardinality histogram
    // (verify_collections.py:172-195 shape): lines-per-order histogram.
    Q("q_audit_cardinality",
      """SELECT lines_per_order, count(*) AS n_orders FROM (
        |  SELECT l_orderkey, count(*) AS lines_per_order
        |  FROM lineitem GROUP BY l_orderkey)
        |GROUP BY lines_per_order ORDER BY lines_per_order""".stripMargin) { (s, d) =>
      t(s, d, "lineitem")
        .groupBy("l_orderkey").agg(count(lit(1)).as("lines_per_order"))
        .groupBy("lines_per_order").agg(count(lit(1)).as("n_orders"))
        .orderBy("lines_per_order")
    })
}
