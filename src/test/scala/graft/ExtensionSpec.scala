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
    } finally {
      SparkSession.setActiveSession(spark)
      SparkSession.setDefaultSession(spark)
    }
  }
}
