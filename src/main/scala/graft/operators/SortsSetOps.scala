package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.TestData

/** §2.F sorts / limits / top-k and §2.G set operations (SURVEY.md).
  *
  * `topk_global` plans to `TakeOrderedAndProjectExec` — per-partition
  * heap + merge of k, no global sort (the only top-k shape that works
  * at 100 TB). NULLS FIRST/LAST is always explicit in both dialects
  * because the engines' defaults differ.
  */
object SortsSetOps {
  type Q = (SparkSession, String) => DataFrame

  private def richKeys(s: SparkSession, d: String): DataFrame =
    TestData.customer(s, d).filter(col("c_acctbal") > 5000.0)
      .select("c_custkey")
  private def buildingKeys(s: SparkSession, d: String): DataFrame =
    TestData.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")

  val defs: Map[String, Q] = Map(
    "sort_multi_nulls" -> ((s, d) =>
      TestData.orders(s, d)
        .withColumn("maybe_status", nullif(col("o_orderstatus"), lit("P")))
        .select("o_orderkey", "maybe_status", "o_totalprice")
        .orderBy(col("maybe_status").desc_nulls_last,
                 col("o_totalprice").asc, col("o_orderkey"))),

    "topk_global" -> ((s, d) =>
      TestData.orders(s, d)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)),

    "topk_per_group" -> ((s, d) => {
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      TestData.orders(s, d)
        .join(TestData.customer(s, d),
              col("o_custkey") === col("c_custkey"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("c_mktsegment", "rn", "o_orderkey", "o_totalprice")
        .orderBy("c_mktsegment", "rn")
    }),

    "setop_union_all" -> ((s, d) =>
      richKeys(s, d).unionAll(buildingKeys(s, d)).orderBy("c_custkey")),

    "setop_union_distinct" -> ((s, d) =>
      richKeys(s, d).union(buildingKeys(s, d)).distinct().orderBy("c_custkey")),

    "setop_intersect" -> ((s, d) =>
      richKeys(s, d).intersect(buildingKeys(s, d)).orderBy("c_custkey")),

    "setop_except" -> ((s, d) =>
      richKeys(s, d).except(buildingKeys(s, d)).orderBy("c_custkey")),

    // Bag (multiset) set-ops: inputs keep per-customer order
    // multiplicities, so INTERSECT ALL's min-count / EXCEPT ALL's
    // count-difference semantics are actually exercised (the distinct
    // customer-key inputs above would degenerate to the set forms).
    // Duplicate output rows are identical, so orderBy(key) is a total
    // order for hashing purposes.
    "setop_intersect_all" -> ((s, d) =>
      bigSpenderKeys(s, d).intersectAll(urgentKeys(s, d))
        .orderBy("o_custkey")),

    "setop_except_all" -> ((s, d) =>
      bigSpenderKeys(s, d).exceptAll(urgentKeys(s, d))
        .orderBy("o_custkey"))
  )

  private def bigSpenderKeys(s: SparkSession, d: String): DataFrame =
    TestData.orders(s, d).filter(col("o_totalprice") > 150000.0)
      .select("o_custkey")
  private def urgentKeys(s: SparkSession, d: String): DataFrame =
    TestData.orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
      .select("o_custkey")

  private val richSql = "SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0"
  private val buildingSql =
    "SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'"
  private val bigSpenderSql =
    "SELECT o_custkey FROM orders WHERE o_totalprice > 150000.0"
  private val urgentSql =
    "SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'"

  val oracles: Map[String, String] = Map(
    "sort_multi_nulls" ->
      """SELECT o_orderkey, nullif(o_orderstatus, 'P') AS maybe_status, o_totalprice
        |FROM orders
        |ORDER BY maybe_status DESC NULLS LAST, o_totalprice ASC, o_orderkey""".stripMargin,
    "topk_global" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "topk_per_group" ->
      """SELECT * FROM (
        |  SELECT c_mktsegment,
        |    row_number() OVER (PARTITION BY c_mktsegment
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn,
        |    o_orderkey, o_totalprice
        |  FROM orders JOIN customer ON o_custkey = c_custkey)
        |WHERE rn <= 3 ORDER BY c_mktsegment, rn""".stripMargin,
    "setop_union_all" ->
      s"""SELECT * FROM ($richSql UNION ALL $buildingSql) ORDER BY c_custkey""",
    "setop_union_distinct" ->
      s"""SELECT * FROM ($richSql UNION $buildingSql) ORDER BY c_custkey""",
    "setop_intersect" ->
      s"""SELECT * FROM ($richSql INTERSECT $buildingSql) ORDER BY c_custkey""",
    "setop_except" ->
      s"""SELECT * FROM ($richSql EXCEPT $buildingSql) ORDER BY c_custkey""",
    "setop_intersect_all" ->
      s"""SELECT * FROM ($bigSpenderSql INTERSECT ALL $urgentSql)
         |ORDER BY o_custkey""".stripMargin,
    "setop_except_all" ->
      s"""SELECT * FROM ($bigSpenderSql EXCEPT ALL $urgentSql)
         |ORDER BY o_custkey""".stripMargin
  )
}
