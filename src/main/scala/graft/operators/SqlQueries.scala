package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** SQL-API surface: the same engine driven through `spark.sql` text
  * (SURVEY.md §2 Part B — the B10-B30 operators compose under the SQL
  * parser exactly as under the DataFrame DSL; both lower to the same
  * Catalyst plans). Two TPC-H-shaped multi-join analytics queries prove
  * the parser → analyzer → optimizer path end-to-end.
  *
  * Scale notes: Q3 joins two large tables after selective dim filters —
  * Catalyst pushes both filters below the join and AQE picks
  * broadcast-hash once the filtered side is small. Q5 is the 6-table
  * star join; join reorder + broadcast of region/nation is the plan
  * that survives 100 TB.
  */
object SqlQueries {

  private def registerViews(s: SparkSession, d: String): Unit =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
      .foreach(t => Tables.load(s, d, t).createOrReplaceTempView(t))

  /** TPC-H Q3 shape: shipping priority — revenue of unshipped orders for
    * one market segment. */
  def q3(s: SparkSession, d: String): DataFrame = {
    registerViews(s, d)
    s.sql(
      """SELECT /*+ BROADCAST(customer) */ o_orderkey,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |           * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  CAST(o_orderdate AS DATE) AS odate, o_orderpriority
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-03-15'
        |  AND l_shipdate > TIMESTAMP '1998-03-15'
        |GROUP BY o_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, o_orderkey
        |LIMIT 20""".stripMargin)
  }

  /** TPC-H Q5 shape: local-supplier revenue per nation within one region
    * and year. */
  def q5(s: SparkSession, d: String): DataFrame = {
    registerViews(s, d)
    s.sql(
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |           * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  CAST(COUNT(*) AS BIGINT) AS n_items
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin)
  }

  /** Subquery forms: scalar aggregate subquery, IN-subquery, correlated
    * EXISTS — Catalyst decorrelates all three into joins (RewritePredicateSubquery),
    * which is what keeps them runnable at 100 TB (no per-row re-execution).
    */
  def subqueries(s: SparkSession, d: String): DataFrame = {
    registerViews(s, d)
    s.sql(
      """SELECT o_orderkey, o_orderstatus
        |FROM orders
        |WHERE o_totalprice > 1.5 * (SELECT CAST(AVG(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) FROM orders)
        |  AND o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity >= 45)
        |ORDER BY o_orderkey""".stripMargin)
  }

  /** Null semantics: null-safe equality, NULL-generating expressions,
    * coalesce-fill, and null-aware counting. */
  def nullHandling(s: SparkSession, d: String): DataFrame = {
    registerViews(s, d)
    s.sql(
      """WITH e AS (
        |  SELECT o_orderkey,
        |    NULLIF(o_orderstatus, 'P') AS st,      -- injects NULLs
        |    NULLIF(o_orderpriority, '5-LOW') AS pri
        |  FROM orders WHERE o_orderkey < 3000)
        |SELECT
        |  CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(COUNT(st) AS BIGINT) AS n_st_nonnull,
        |  CAST(SUM(CASE WHEN st IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_st_null,
        |  CAST(SUM(CASE WHEN st <=> pri THEN 1 ELSE 0 END) AS BIGINT) AS n_nullsafe_eq,
        |  CAST(COUNT(DISTINCT COALESCE(st, 'NONE')) AS BIGINT) AS n_filled
        |FROM e""".stripMargin)
  }

  /** TPC-H Q7 shape: bilateral trade volume between two nations by year —
    * a 6-table join where both nation sides broadcast and the year is
    * derived in the aggregate key. */
  def q7(s: SparkSession, d: String): DataFrame = {
    registerViews(s, d)
    s.sql(
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS INT) AS l_year,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |           * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM supplier
        |JOIN lineitem ON s_suppkey = l_suppkey
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
        |    OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3'))
        |GROUP BY 1, 2, 3
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin)
  }

  /** FILTER-clause aggregates: per-group conditional aggregation without
    * self-joins or CASE pyramids (one pass, one shuffle). */
  def aggFilter(s: SparkSession, d: String): DataFrame = {
    registerViews(s, d)
    s.sql(
      """SELECT o_orderstatus,
        |  CAST(COUNT(*) AS BIGINT) AS n_all,
        |  CAST(COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS BIGINT) AS n_urgent,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (WHERE o_totalprice > 1000) AS DOUBLE) AS big_total,
        |  CAST(COUNT(DISTINCT o_custkey) FILTER (WHERE year(o_orderdate) = 1997) AS BIGINT) AS cust_97
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_filter" -> (aggFilter(_, _)),
    "sql_q7" -> (q7(_, _)),
    "sql_q3" -> (q3(_, _)),
    "sql_q5" -> (q5(_, _)),
    "sub_queries" -> (subqueries(_, _)),
    "fn_null" -> (nullHandling(_, _))
  )

  def oracles: Map[String, String] = Map(
    "agg_filter" ->
      """SELECT o_orderstatus,
        |  CAST(COUNT(*) AS BIGINT) AS n_all,
        |  CAST(COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS BIGINT) AS n_urgent,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (WHERE o_totalprice > 1000) AS DOUBLE) AS big_total,
        |  CAST(COUNT(DISTINCT o_custkey) FILTER (WHERE year(o_orderdate) = 1997) AS BIGINT) AS cust_97
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "sql_q3" ->
      """SELECT o_orderkey,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |           * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  CAST(o_orderdate AS DATE) AS odate, o_orderpriority
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-03-15'
        |  AND l_shipdate > TIMESTAMP '1998-03-15'
        |GROUP BY o_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, o_orderkey
        |LIMIT 20""".stripMargin,
    "sql_q5" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |           * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  CAST(COUNT(*) AS BIGINT) AS n_items
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,
    "sql_q7" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS INT) AS l_year,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |           * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM supplier
        |JOIN lineitem ON s_suppkey = l_suppkey
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
        |    OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3'))
        |GROUP BY 1, 2, 3
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,
    "sub_queries" ->
      """SELECT o_orderkey, o_orderstatus
        |FROM orders
        |WHERE o_totalprice > 1.5 * (SELECT CAST(AVG(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) FROM orders)
        |  AND o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity >= 45)
        |ORDER BY o_orderkey""".stripMargin,
    "fn_null" ->
      """WITH e AS (
        |  SELECT o_orderkey,
        |    NULLIF(o_orderstatus, 'P') AS st,
        |    NULLIF(o_orderpriority, '5-LOW') AS pri
        |  FROM orders WHERE o_orderkey < 3000)
        |SELECT
        |  CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(COUNT(st) AS BIGINT) AS n_st_nonnull,
        |  CAST(SUM(CASE WHEN st IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_st_null,
        |  CAST(SUM(CASE WHEN st IS NOT DISTINCT FROM pri THEN 1 ELSE 0 END) AS BIGINT) AS n_nullsafe_eq,
        |  CAST(COUNT(DISTINCT COALESCE(st, 'NONE')) AS BIGINT) AS n_filled
        |FROM e""".stripMargin
  )
}
