package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The `spark.sql` surface (SURVEY.md §7.1 module 8): the same
  * semantic layer exposed through SQL text instead of the DataFrame
  * API. Each query here is ONE SQL string executed verbatim by BOTH
  * engines — Spark (over temp views of the testdata) and the DuckDB
  * oracle — which pins the engine to the ANSI-compatible dialect
  * subset and proves the two surfaces agree.
  */
object SqlSurface {

  /** Build a Q whose Spark side registers the named tables as temp
    * views and runs the oracle SQL itself. */
  private def sqlQ(name: String, tables: Seq[String], sql: String): Q =
    Q(name, sql) { (s: SparkSession, d: String) =>
      tables.foreach(tb => t(s, d, tb).createOrReplaceTempView(tb))
      s.sql(sql)
    }

  val all: Seq[Q] = Seq(

    // TPC-H-Q3-shaped revenue ranking; exact floor-cents arithmetic.
    sqlQ("q_sql_revenue_topk", Seq("lineitem", "orders"),
      """SELECT l_orderkey,
        |  CAST(SUM(FLOOR(l_extendedprice * (1 - l_discount) * 100))
        |    AS BIGINT) AS rev_cents,
        |  COUNT(*) AS n_lines
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderstatus = 'O'
        |GROUP BY l_orderkey
        |ORDER BY rev_cents DESC, l_orderkey LIMIT 100""".stripMargin),

    // Correlated NOT EXISTS through the SQL parser (Catalyst
    // decorrelates to an anti-join).
    sqlQ("q_sql_not_exists", Seq("customer", "orders"),
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_totalprice > 100000)
        |ORDER BY c_custkey LIMIT 500""".stripMargin),

    // Three-valued NOT IN over NULLABLE keys — the J7 hazard SURVEY
    // flags, untestable on the NOT-NULL testdata columns until NULLIF
    // manufactures the nulls. Four variants pin the full truth table
    // on BOTH engines: (a) a NULL in the list makes NOT IN yield no
    // rows at all (every comparison is FALSE or UNKNOWN); (b) the
    // same list null-stripped behaves as a plain anti-join (counts
    // custkey 37's orders); (c) a NULL probe value is excluded even
    // though it matches nothing in the list (custkey 38's orders
    // vanish); (d) the control without nulls counts both 37 and 38 —
    // c < d is the probe-NULL proof, a = 0 is the list-NULL proof.
    sqlQ("q_j7b_not_in_null", Seq("customer", "orders"),
      """SELECT 'a_null_in_list' AS variant, count(*) AS n FROM orders
        |WHERE o_custkey NOT IN (SELECT NULLIF(c_custkey, 37)
        |                        FROM customer)
        |UNION ALL
        |SELECT 'b_list_stripped', count(*) FROM orders
        |WHERE o_custkey NOT IN (SELECT NULLIF(c_custkey, 37)
        |                        FROM customer
        |                        WHERE NULLIF(c_custkey, 37) IS NOT NULL)
        |UNION ALL
        |SELECT 'c_null_probe', count(*) FROM orders
        |WHERE NULLIF(o_custkey, 38) NOT IN (SELECT c_custkey
        |                                    FROM customer
        |                                    WHERE c_custkey NOT IN (37, 38))
        |UNION ALL
        |SELECT 'd_control', count(*) FROM orders
        |WHERE o_custkey NOT IN (SELECT c_custkey FROM customer
        |                        WHERE c_custkey NOT IN (37, 38))
        |ORDER BY variant""".stripMargin),

    // Window function through SQL text.
    sqlQ("q_sql_window_top2", Seq("orders"),
      """SELECT o_custkey, o_orderkey, rn FROM (
        |  SELECT o_custkey, o_orderkey,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
        |  FROM orders)
        |WHERE rn <= 2 AND o_custkey % 10 = 0
        |ORDER BY o_custkey, rn""".stripMargin),

    // Scalar subquery + HAVING.
    sqlQ("q_sql_having", Seq("lineitem"),
      """SELECT l_partkey, COUNT(*) AS n
        |FROM lineitem
        |GROUP BY l_partkey
        |HAVING COUNT(*) > (SELECT COUNT(*) / 2500 FROM lineitem)
        |ORDER BY n DESC, l_partkey LIMIT 50""".stripMargin),

    // TPC-H-Q5-shaped: local supplier volume — a 6-table join chain
    // where the customer and supplier must share a nation; the two
    // dim legs (nation, region) broadcast, the fact chain shuffles on
    // its join keys.
    sqlQ("q_sql_local_volume",
      Seq("customer", "orders", "lineitem", "supplier", "nation",
        "region"),
      """SELECT n_name,
        |  CAST(SUM(FLOOR(l_extendedprice * (1 - l_discount) * 100))
        |    AS BIGINT) AS rev_cents,
        |  COUNT(*) AS n_lines
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |  AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name ORDER BY n_name""".stripMargin),

    // TPC-H-Q10-shaped: returned-item revenue per customer.
    sqlQ("q_sql_returned_topk", Seq("customer", "orders", "lineitem"),
      """SELECT c_custkey, c_name,
        |  CAST(SUM(FLOOR(l_extendedprice * (1 - l_discount) * 100))
        |    AS BIGINT) AS rev_cents,
        |  COUNT(*) AS n_lines
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE l_returnflag = 'R'
        |GROUP BY c_custkey, c_name
        |ORDER BY rev_cents DESC, c_custkey LIMIT 20""".stripMargin),

    // TPC-H-Q12-shaped: priority CASE sums under a timestamp range
    // predicate — pins date-literal comparison and conditional
    // aggregation in the shared dialect. The Spark view converts the
    // parquet TIMESTAMP(NANOS) column (read as long under
    // nanosAsLong) to a real timestamp so one SQL text serves both
    // engines (the same plumbing as the `events` loader).
    Q("q_sql_case_sums",
      """SELECT l_returnflag,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
        |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS low_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) {
      (s, d) =>
      val li = t(s, d, "lineitem")
      val fixed = li.schema("l_shipdate").dataType match {
        case org.apache.spark.sql.types.LongType =>
          li.withColumn("l_shipdate", org.apache.spark.sql.functions
            .timestamp_micros(org.apache.spark.sql.functions
              .expr("l_shipdate div 1000")))
        case _ => li.withColumn("l_shipdate",
          org.apache.spark.sql.functions.col("l_shipdate")
            .cast("timestamp"))
      }
      fixed.createOrReplaceTempView("lineitem")
      t(s, d, "orders").createOrReplaceTempView("orders")
      s.sql(SparkEntryHelp.sqlOf("q_sql_case_sums"))
    },

    // Set operation through SQL text: customers holding BOTH open and
    // fulfilled orders (INTERSECT dedups on both engines).
    sqlQ("q_sql_intersect", Seq("orders"),
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY o_custkey""".stripMargin),

    // EXCEPT through SQL text (the set-difference dual of INTERSECT).
    sqlQ("q_sql_except", Seq("orders"),
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY o_custkey""".stripMargin),

    // Correlated scalar subquery in the SELECT list — Catalyst
    // decorrelates it to a left outer aggregate join; the zero-order
    // customers prove the COALESCE path.
    sqlQ("q_sql_scalar_subq", Seq("customer", "orders"),
      """SELECT c_custkey,
        |  COALESCE((SELECT COUNT(*) FROM orders
        |            WHERE o_custkey = c_custkey), 0) AS n_orders
        |FROM customer
        |WHERE c_custkey <= 300
        |ORDER BY c_custkey""".stripMargin),

    // LATERAL correlated subquery — per customer, the single highest-
    // value order (the top-1-per-group idiom through the parser
    // instead of a window).
    sqlQ("q_sql_lateral", Seq("customer", "orders"),
      """SELECT c_custkey, t.o_orderkey, t.price_cents
        |FROM customer,
        |LATERAL (SELECT o_orderkey,
        |    CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS price_cents
        |  FROM orders WHERE o_custkey = c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) t
        |WHERE c_custkey <= 300
        |ORDER BY c_custkey""".stripMargin),

    // GROUPING SETS through SQL text — three explicit aggregation
    // levels in one pass (per status+priority, per status, grand
    // total); GROUPING() flags disambiguate real NULL keys from
    // superaggregate rows in the sort.
    sqlQ("q_sql_grouping_sets", Seq("orders"),
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        |  CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
        |  CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
        |  (o_orderstatus), ())
        |ORDER BY g_status, g_prio, o_orderstatus, o_orderpriority""".stripMargin))
}

/** Lookup of this module's own oracle SQL by name, so a Spark side
  * with custom view preparation can still execute the IDENTICAL
  * text the oracle runs. */
private object SparkEntryHelp {
  def sqlOf(name: String): String =
    SqlSurface.all.find(_.name == name).flatMap(_.oracle)
      .getOrElse(sys.error(s"no oracle sql for $name"))
}
