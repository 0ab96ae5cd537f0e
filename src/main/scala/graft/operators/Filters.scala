package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.TestData
import graft.TestData.r4

/** §2.B projections / filters / predicates (SURVEY.md).
  *
  * All plans are single `ProjectExec`/`FilterExec` stages inside
  * whole-stage codegen; predicates reach the parquet scan.
  * Nulls do not exist in the fixtures, so null-semantics queries
  * manufacture them with `nullif` (FIXTURES.md).
  */
object Filters {
  type Q = (SparkSession, String) => DataFrame

  val defs: Map[String, Q] = Map(
    "project_arithmetic" -> ((s, d) =>
      TestData.lineitem(s, d)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          r4(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("revenue"),
          r4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * (lit(1.0) + col("l_tax"))).as("charge"),
          when(col("l_quantity") < 10, lit("low"))
            .when(col("l_quantity") < 30, lit("mid"))
            .otherwise(lit("high")).as("qty_bucket"))
        // non-unique fixture key: sort by every output column (the
        // float keys are r4-quantized, so the order is engine-stable)
        .orderBy("l_orderkey", "l_linenumber", "revenue", "charge",
          "qty_bucket")),

    "filter_compound" -> ((s, d) =>
      TestData.orders(s, d)
        .filter(
          (col("o_orderstatus") === "F" || col("o_orderstatus") === "P")
            && !(col("o_totalprice") < 50000.0)
            && col("o_orderpriority").isin("1-URGENT", "2-HIGH")
            && col("o_orderdate").between(
                 lit("1996-01-01").cast("timestamp"),
                 lit("1999-12-31").cast("timestamp")))
        .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
        .orderBy("o_orderkey")),

    "filter_null_semantics" -> ((s, d) =>
      TestData.orders(s, d)
        .withColumn("maybe_status", nullif(col("o_orderstatus"), lit("P")))
        .select(
          col("o_orderkey"), col("maybe_status"),
          col("maybe_status").isNull.as("is_null"),
          col("maybe_status").eqNullSafe(lit("F")).as("nullsafe_eq_f"),
          coalesce(col("maybe_status"), lit("?")).as("filled"))
        .orderBy("o_orderkey")),

    "filter_like_regex" -> ((s, d) =>
      TestData.part(s, d)
        .filter(col("p_type").like("PROMO%")
          && col("p_brand").rlike("^Brand#1[0-9]$"))
        .select("p_partkey", "p_name", "p_brand", "p_type")
        .orderBy("p_partkey"))
  )

  val oracles: Map[String, String] = Map(
    "project_arithmetic" ->
      """SELECT l_orderkey, l_linenumber,
        |  floor((l_extendedprice * (1.0 - l_discount))*10000 + 0.5)/10000 AS revenue,
        |  floor((l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax))*10000 + 0.5)/10000 AS charge,
        |  CASE WHEN l_quantity < 10 THEN 'low'
        |       WHEN l_quantity < 30 THEN 'mid'
        |       ELSE 'high' END AS qty_bucket
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, revenue, charge, qty_bucket""".stripMargin,
    "filter_compound" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
        |FROM orders
        |WHERE (o_orderstatus = 'F' OR o_orderstatus = 'P')
        |  AND NOT (o_totalprice < 50000.0)
        |  AND o_orderpriority IN ('1-URGENT', '2-HIGH')
        |  AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1999-12-31'
        |ORDER BY o_orderkey""".stripMargin,
    "filter_null_semantics" ->
      """SELECT o_orderkey,
        |  nullif(o_orderstatus, 'P') AS maybe_status,
        |  nullif(o_orderstatus, 'P') IS NULL AS is_null,
        |  nullif(o_orderstatus, 'P') IS NOT DISTINCT FROM 'F' AS nullsafe_eq_f,
        |  coalesce(nullif(o_orderstatus, 'P'), '?') AS filled
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "filter_like_regex" ->
      """SELECT p_partkey, p_name, p_brand, p_type
        |FROM part
        |WHERE p_type LIKE 'PROMO%' AND regexp_matches(p_brand, '^Brand#1[0-9]$')
        |ORDER BY p_partkey""".stripMargin
  )
}
