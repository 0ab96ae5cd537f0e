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

      // The set-core kernels are SQL-reachable too: shingle a string,
      // fold indices into a bitset, intersect two bitsets.
      val sets = s2.sql(
        """SELECT word_shingles('a b c b c', 2) AS sh,
          |       bitmap_intersect_count(
          |         bitset_from_indices(array(0, 65), 2),
          |         bitset_from_indices(array(0, 64, 65), 2)) AS bi
          |""".stripMargin).collect().head
      assert(sets.getSeq[String](0) === Seq("a b", "b c", "c b"))
      assert(sets.getInt(1) === 2)

      // minhash_sig: one-pass signature, SQL-reachable; must agree
      // with the expression the LSH core uses internally, and with
      // itself across calls (determinism).
      val mh = s2.sql(
        """SELECT minhash_sig(word_shingles('a b c b c', 2), 6) AS s1,
          |       minhash_sig(word_shingles('a b c b c', 2), 6) AS s2,
          |       minhash_sig(array('zz'), 6) AS s3
          |""".stripMargin).collect().head
      val sig1 = mh.getSeq[Long](0)
      assert(sig1.length === 6 && sig1 === mh.getSeq[Long](1))
      assert(sig1.forall(v => v >= 0 && v < graft.functions.MinHashLsh.Prime))
      assert(sig1 !== mh.getSeq[Long](2), "different sets, different sigs")

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

      // New SQL functions round 2.
      val r2 = s2.sql(
        """SELECT bounded_levenshtein('kitten', 'sitting', 3) AS b3,
          |       bounded_levenshtein('kitten', 'sitting', 2) AS b2,
          |       array_join(char_ngrams('abcab', 2), ',') AS g
          |""".stripMargin).collect().head
      assert(r2.getInt(0) === 3)
      assert(r2.getInt(1) === -1)
      assert(r2.getString(2) === "ab,bc,ca")

      // LevenshteinBanding: a thresholded builtin-levenshtein filter
      // is rewritten to the banded expression; results match the
      // un-extended session's builtin evaluation.
      val docs = TestData.documents(s2, sf("sf0.001")).limit(50)
      val predDf = docs.as("x").join(docs.as("y"),
          col("x.doc_id") < col("y.doc_id"))
        .filter(levenshtein(col("x.text"), col("y.text")) <= 20)
        .select(col("x.doc_id"), col("y.doc_id"))
      val optLev = predDf.queryExecution.optimizedPlan.toString
      assert(optLev.contains("bounded_levenshtein"),
        s"thresholded levenshtein not banded:\n${optLev.take(600)}")
      val viaRule = predDf.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val builtin = {
        val dd = TestData.documents(spark, sf("sf0.001")).limit(50)
        dd.as("x").join(dd.as("y"), col("x.doc_id") < col("y.doc_id"))
          .filter(levenshtein(col("x.text"), col("y.text")) <= 20)
          .select(col("x.doc_id"), col("y.doc_id"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      }
      assert(viaRule == builtin, "banded rewrite must not change results")

      // Supplementary-plane parity: the rewrite must agree with the
      // builtin's code-point semantics (lev('','😀') = 1, not 2).
      val emoji = s2.sql(
        """SELECT levenshtein('', '😀') <= 1 AS ok1,
          |       levenshtein('a😀', 'a') <= 1 AS ok2,
          |       bounded_levenshtein('😀', '😁', 1) AS d
          |""".stripMargin).collect().head
      assert(emoji.getBoolean(0) && emoji.getBoolean(1),
        "banded rewrite must count code points, not UTF-16 units")
      assert(emoji.getInt(2) === 1)

      // Negative control: levenshtein as a projected VALUE stays.
      val proj = docs.select(
        levenshtein(col("text"), lit("abc")).as("lv"))
      assert(!proj.queryExecution.optimizedPlan.toString
        .contains("bounded_levenshtein"),
        "projected levenshtein must not be rewritten")
    } finally {
      SparkSession.setActiveSession(spark)
      SparkSession.setDefaultSession(spark)
    }
  }
}
