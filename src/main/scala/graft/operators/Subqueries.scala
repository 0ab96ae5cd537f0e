package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.TestData

/** Subquery forms — scalar, correlated scalar, IN — exercised through
  * `spark.sql` so Catalyst's rewrite rules do the work:
  * `RewriteCorrelatedScalarSubquery` turns the correlated aggregate
  * into a left outer join against a pre-aggregated subtree, and IN
  * becomes a left-semi join — i.e., at scale these plan to the same
  * shuffle shapes as the explicit-join operators (§2.C), which is the
  * point: declarative subqueries cost nothing extra.
  */
object Subqueries {
  type Q = (SparkSession, String) => DataFrame

  private def withViews(s: SparkSession, d: String): Unit = {
    TestData.orders(s, d).createOrReplaceTempView("g_orders")
    TestData.customer(s, d).createOrReplaceTempView("g_customer")
  }

  val defs: Map[String, Q] = Map(
    "subquery_scalar" -> ((s, d) => {
      withViews(s, d)
      s.sql("""
        SELECT o_orderkey, o_totalprice FROM g_orders
        WHERE o_totalprice > 2 * (SELECT avg(o_totalprice) FROM g_orders)
        ORDER BY o_orderkey""")
    }),

    "subquery_correlated_scalar" -> ((s, d) => {
      withViews(s, d)
      s.sql("""
        SELECT c_custkey, c_nationkey, c_acctbal FROM g_customer c1
        WHERE c_acctbal > 1.5 * (SELECT avg(c2.c_acctbal) FROM g_customer c2
                                 WHERE c2.c_nationkey = c1.c_nationkey)
        ORDER BY c_custkey""")
    }),

    "subquery_in" -> ((s, d) => {
      withViews(s, d)
      s.sql("""
        SELECT o_orderkey, o_custkey FROM g_orders
        WHERE o_custkey IN (SELECT c_custkey FROM g_customer
                            WHERE c_mktsegment = 'BUILDING')
          AND o_orderpriority = '1-URGENT'
        ORDER BY o_orderkey""")
    }),

    // Correlated EXISTS → left-semi join after RewritePredicateSubquery.
    "subquery_exists" -> ((s, d) => {
      withViews(s, d)
      s.sql("""
        SELECT c_custkey, c_mktsegment FROM g_customer c
        WHERE EXISTS (SELECT 1 FROM g_orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 300000.0)
        ORDER BY c_custkey""")
    }),

    // Correlated NOT EXISTS → left-anti join ("customers who never
    // placed a big order" — every customer has SOME order in the
    // fixture, so the price predicate keeps the result non-trivial).
    "subquery_not_exists" -> ((s, d) => {
      withViews(s, d)
      s.sql("""
        SELECT c_custkey, c_acctbal FROM g_customer c
        WHERE NOT EXISTS (SELECT 1 FROM g_orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_totalprice > 300000.0)
        ORDER BY c_custkey""")
    }),

    // LATERAL correlated subquery in FROM (Spark 3.2+/DuckDB both
    // parse it): per-nation top-2 customers by balance — Catalyst
    // rewrites the lateral into a window/limit per correlation key,
    // the same shuffle shape as topk_per_group. Sort key is the RAW
    // stored double (identical bytes in both engines — not a computed
    // aggregate, so the r4 quantize rule doesn't apply); c_name
    // breaks balance ties.
    "subquery_lateral_topk" -> ((s, d) => {
      withViews(s, d)
      TestData.nation(s, d).createOrReplaceTempView("g_nation")
      s.sql("""
        SELECT n_name, t.c_name, t.c_acctbal
        FROM g_nation, LATERAL (
          SELECT c_name, c_acctbal FROM g_customer
          WHERE c_nationkey = n_nationkey
          ORDER BY c_acctbal DESC, c_name LIMIT 2) t
        ORDER BY n_name, t.c_acctbal DESC, t.c_name""")
    })
  )

  val oracles: Map[String, String] = Map(
    "subquery_scalar" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > 2 * (SELECT avg(o_totalprice) FROM orders)
        |ORDER BY o_orderkey""".stripMargin,
    "subquery_correlated_scalar" ->
      """SELECT c_custkey, c_nationkey, c_acctbal FROM customer c1
        |WHERE c_acctbal > 1.5 * (SELECT avg(c2.c_acctbal) FROM customer c2
        |                         WHERE c2.c_nationkey = c1.c_nationkey)
        |ORDER BY c_custkey""".stripMargin,
    "subquery_in" ->
      """SELECT o_orderkey, o_custkey FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer
        |                    WHERE c_mktsegment = 'BUILDING')
        |  AND o_orderpriority = '1-URGENT'
        |ORDER BY o_orderkey""".stripMargin,
    "subquery_exists" ->
      """SELECT c_custkey, c_mktsegment FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_totalprice > 300000.0)
        |ORDER BY c_custkey""".stripMargin,
    "subquery_not_exists" ->
      """SELECT c_custkey, c_acctbal FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_totalprice > 300000.0)
        |ORDER BY c_custkey""".stripMargin,
    "subquery_lateral_topk" ->
      """SELECT n_name, t.c_name, t.c_acctbal
        |FROM nation, LATERAL (
        |  SELECT c_name, c_acctbal FROM customer
        |  WHERE c_nationkey = n_nationkey
        |  ORDER BY c_acctbal DESC, c_name LIMIT 2) t
        |ORDER BY n_name, t.c_acctbal DESC, t.c_name""".stripMargin
  )
}
