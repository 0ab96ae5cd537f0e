package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.TestData
import graft.TestData.r4
import graft.functions.{VectorOps => V}

/** §2.L UDF / UDAF / UDTF surface (SURVEY.md).
  *
  * The declared queries deliberately emit the UDF result NEXT TO the
  * equivalent built-in so the oracle pins both: a wrong UDF can't
  * hide. Note the scale guidance stands: built-ins/HOFs are
  * codegen'd, a Scala UDF is a serialization boundary — UDFs here
  * exist to exercise the extension surface, not as the default path.
  */
object UserFns {
  type Q = (SparkSession, String) => DataFrame

  /** Discount-weighted mean price: Σ(p·w)/Σ(w) via typed Aggregator. */
  class WeightedAvg extends Aggregator[(Double, Double), (Double, Double), Double] {
    def zero: (Double, Double) = (0.0, 0.0)
    def reduce(b: (Double, Double), in: (Double, Double)): (Double, Double) =
      (b._1 + in._1 * in._2, b._2 + in._2)
    def merge(x: (Double, Double), y: (Double, Double)): (Double, Double) =
      (x._1 + y._1, x._2 + y._2)
    def finish(b: (Double, Double)): Double =
      if (b._2 == 0.0) 0.0 else b._1 / b._2
    def bufferEncoder = org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.scalaDouble,
      org.apache.spark.sql.Encoders.scalaDouble)
    def outputEncoder = org.apache.spark.sql.Encoders.scalaDouble
  }

  val defs: Map[String, Q] = Map(
    // Scala UDF cosine, asserted equal to the HOF built-in form by
    // emitting both (the oracle computes one expression for the two
    // columns — any divergence hash-fails).
    "udf_scalar_cosine" -> ((s, d) => {
      val cosUdf = udf { (a: Seq[Double], b: Seq[Double]) =>
        var dot = 0.0; var na = 0.0; var nb = 0.0
        var i = 0
        while (i < a.length) {
          dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
        }
        dot / (math.sqrt(na) * math.sqrt(nb))
      }
      val e = TestData.embeddings(s, d)
      val a = e.select(col("vec_id").as("id_a"), col("embedding").as("va"))
        .filter(col("id_a") < 100)
      val b = e.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
      a.join(b, col("id_b") === col("id_a") + lit(100))
        .select(col("id_a"),
          r4(cosUdf(col("va"), col("vb"))).as("udf_cos"),
          r4(V.cosineHof(col("va"), col("vb"))).as("hof_cos"))
        .orderBy("id_a")
    }),

    "udaf_weighted_avg" -> ((s, d) => {
      val wavg = udaf(new WeightedAvg)
      TestData.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(r4(wavg(col("l_extendedprice"), col("l_discount")))
          .as("disc_weighted_price"))
        .orderBy("l_returnflag")
    }),

    // Char-3-gram generator (UDTF shape): one transform + explode.
    "udtf_char_ngrams" -> ((s, d) =>
      TestData.part(s, d)
        .filter(length(col("p_name")) >= 3)
        .select(explode(expr(
          "transform(sequence(1, length(p_name)-2), i -> substring(p_name, i, 3))"))
          .as("ngram"))
        .groupBy("ngram").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("ngram"))
        .limit(30))
  )

  private val E = "embedding::DOUBLE[]"

  val oracles: Map[String, String] = Map(
    "udf_scalar_cosine" ->
      s"""SELECT a.vec_id AS id_a,
        |  floor((list_cosine_similarity(a.$E, b.$E))*10000 + 0.5)/10000 AS udf_cos,
        |  floor((list_cosine_similarity(a.$E, b.$E))*10000 + 0.5)/10000 AS hof_cos
        |FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 100
        |WHERE a.vec_id < 100 ORDER BY id_a""".stripMargin,
    "udaf_weighted_avg" ->
      """SELECT l_returnflag,
        |  floor((sum(l_extendedprice * l_discount) / sum(l_discount))*10000 + 0.5)/10000
        |    AS disc_weighted_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "udtf_char_ngrams" ->
      """SELECT ngram, count(*) AS n FROM (
        |  SELECT unnest(list_transform(range(1, length(p_name) - 1),
        |    i -> substring(p_name, i, 3))) AS ngram
        |  FROM part WHERE length(p_name) >= 3)
        |GROUP BY ngram ORDER BY n DESC, ngram LIMIT 30""".stripMargin
  )
}
