package graft

import org.apache.spark.sql.types._

/** Fixture-schema smoke test (round-7, VERDICT r6 item 5).
  *
  * The round-6 driver regenerated `/root/testdata` and `events.ts`
  * silently changed physical type (INT64 TIMESTAMP(NANOS) →
  * timestamp[us]), killing 59 keys at analysis time. This spec pins the
  * LOADER-NORMALIZED schema of every fixture table at sf0.001 so the
  * next silent regeneration fails ONE named test with a readable diff
  * instead of 59 keys.
  *
  * Assertions are on the post-loader shape (what the operators consume),
  * not the physical parquet encoding — the loader is allowed to absorb
  * physical drift (ns→µs, TZ↔NTZ) as long as the result lands here.
  */
class FixtureSchemaSpec extends SparkSpec {

  private val d = sf("sf0.001")

  /** Timestamp-family check: operators tolerate TZ vs NTZ for the raw
    * date-valued columns (both compare/filter correctly under the UTC
    * session), but NOT a flip to DATE/string/int.
    */
  private def isTimestampFamily(t: DataType): Boolean =
    t == TimestampType || t == TimestampNTZType

  private def fields(df: org.apache.spark.sql.DataFrame): Map[String, DataType] =
    df.schema.fields.map(f => f.name -> f.dataType).toMap

  test("events loader normalizes ts to TimestampType (µs) with expected columns") {
    val f = fields(TestData.events(spark, d))
    assert(f("ts") == TimestampType, s"events.ts normalized type was ${f("ts")}")
    assert(f("event_id") == LongType)
    assert(f("user_id") == LongType)
    assert(f("event_type") == StringType)
    assert(f("value") == DoubleType)
    assert(f("props") == StringType)
    // value sanity: ts range must still be the 2024-01 fixture window
    // (catches a unit mix-up — e.g. ns read as µs lands in year 1970)
    import org.apache.spark.sql.functions._
    val r = TestData.events(spark, d)
      .agg(min(year(col("ts"))).as("y0"), max(year(col("ts"))).as("y1"))
      .head()
    assert(r.getInt(0) == 2024 && r.getInt(1) == 2024,
      s"events.ts year range ${r.getInt(0)}..${r.getInt(1)} — unit mix-up?")
  }

  test("embeddings loader yields array<double> of dim 64") {
    val f = fields(TestData.embeddings(spark, d))
    assert(f("embedding") == ArrayType(DoubleType, containsNull = true) ||
           f("embedding") == ArrayType(DoubleType, containsNull = false),
      s"embedding type was ${f("embedding")}")
    assert(f("vec_id") == LongType)
    assert(f("label").isInstanceOf[IntegerType.type] || f("label") == LongType)
    import org.apache.spark.sql.functions._
    val dims = TestData.embeddings(spark, d)
      .select(size(col("embedding"))).distinct().collect().map(_.getInt(0)).toSet
    assert(dims == Set(64), s"embedding dims $dims != {64}")
  }

  test("orders / lineitem timestamp columns stay timestamp-family") {
    val o = fields(TestData.orders(spark, d))
    val l = fields(TestData.lineitem(spark, d))
    assert(isTimestampFamily(o("o_orderdate")), s"o_orderdate was ${o("o_orderdate")}")
    assert(isTimestampFamily(l("l_shipdate")), s"l_shipdate was ${l("l_shipdate")}")
    assert(o("o_orderkey") == LongType && o("o_custkey") == LongType)
    assert(o("o_totalprice") == DoubleType)
    assert(l("l_orderkey") == LongType && l("l_quantity") == DoubleType)
    assert(l("l_linenumber") == IntegerType)
  }

  test("relational dims keep their key/name columns") {
    assert(fields(TestData.region(spark, d)).keySet == Set("r_regionkey", "r_name"))
    assert(fields(TestData.nation(spark, d)).keySet ==
      Set("n_nationkey", "n_name", "n_regionkey"))
    val c = fields(TestData.customer(spark, d))
    assert(c("c_custkey") == LongType && c("c_mktsegment") == StringType)
    val p = fields(TestData.part(spark, d))
    assert(p("p_partkey") == LongType && p("p_size") == IntegerType &&
      p("p_retailprice") == DoubleType)
    val s2 = fields(TestData.supplier(spark, d))
    assert(s2("s_suppkey") == LongType && s2("s_acctbal") == DoubleType)
  }

  test("documents keeps text/lang/source/n_chars") {
    val f = fields(TestData.documents(spark, d))
    assert(f("doc_id") == LongType)
    assert(f("text") == StringType && f("lang") == StringType &&
      f("source") == StringType && f("n_chars") == LongType)
  }
}
