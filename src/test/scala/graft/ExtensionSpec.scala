package graft

import graft.extensions.GraftExtensions
import org.apache.spark.sql.SparkSession

/** The SQL surface of the custom expressions, loaded the way a
  * cluster job would (`spark.sql.extensions`).
  */
class ExtensionSpec extends SparkSpec {

  test("extensions register cosine_similarity + sorted_intersect_count for SQL") {
    // Materialize the shared context first, then build a sibling
    // session (same SparkContext) with the extensions installed.
    spark.range(1).count()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val cos = s2.sql(
        """SELECT cosine_similarity(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c,
          |       cosine_similarity(array(1.0d, 0.0d), array(0.0d, 1.0d)) AS o,
          |       sorted_intersect_count(array(1L, 2L, 5L), array(2L, 3L, 5L)) AS i
          |""".stripMargin).collect().head
      assert(math.abs(cos.getDouble(0) - 1.0) < 1e-12)
      assert(math.abs(cos.getDouble(1)) < 1e-12)
      assert(cos.getInt(2) === 2)

      // CosineFusion: the HOF pattern must be rewritten to the fused
      // expression by the injected optimizer rule.
      import graft.functions.{VectorOps => V}
      import org.apache.spark.sql.functions._
      val df = TestData.embeddings(s2, sf("sf0.001")).limit(10)
        .select(col("vec_id"),
                V.cosineHof(col("embedding"), col("embedding")).as("c"))
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("cosine_similarity"),
        s"HOF cosine not fused:\n${optimized.take(600)}")
      val vals = df.select("c").collect().map(_.getDouble(0))
      assert(vals.forall(v => math.abs(v - 1.0) < 1e-9))

      // Negative control: a structurally similar NON-cosine pattern
      // (normalized squared distance — zip_with lambda is (x-y)*(x-y))
      // must NOT be fused.
      val dfNeg = TestData.embeddings(s2, sf("sf0.001")).limit(5)
        .select(col("vec_id"),
          (V.sqDist(col("embedding"), col("embedding"))
            / (V.l2norm(col("embedding")) * V.l2norm(col("embedding"))))
            .as("nsd"))
      val optNeg = dfNeg.queryExecution.optimizedPlan.toString
      assert(!optNeg.contains("cosine_similarity"),
        s"non-cosine pattern wrongly fused:\n${optNeg.take(600)}")
      assert(dfNeg.select("nsd").collect()
        .forall(r => math.abs(r.getDouble(0)) < 1e-12),
        "self squared-distance must be 0, not cosine 1")
    } finally {
      SparkSession.setActiveSession(spark)
      SparkSession.setDefaultSession(spark)
    }
  }
}
