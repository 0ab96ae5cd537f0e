package graft

import org.apache.spark.sql.functions._
import graft.operators.{ProductQuantize, TrainedQuantize, Vectors}
import graft.functions.{VectorOps => V}

/** Distortion properties for the TRAINED quantizer codebooks
  * (oracle-omitted keys): training exists to reduce quantization
  * error, so trained distortion must not exceed the fixed-codebook
  * stand-in's on the same corpus.
  */
class TrainedSpec extends SparkSpec {

  private val sfDir = sf("sf0.001")

  test("trained IVF centroids reduce mean assignment distance vs fixed") {
    val e = TestData.embeddings(spark, sfDir)
    def meanDist(cents: org.apache.spark.sql.DataFrame): Double =
      V.assignToCentroids(e, cents, Seq("vec_id"))
        .agg(avg(col("dist"))).first().getDouble(0)
    val fixed = meanDist(Vectors.fixedCentroids(e))
    val trained = meanDist(TrainedQuantize.trainCentroids(e, 4, 42L))
    assert(trained <= fixed + 1e-9,
      s"trained IVF distortion $trained must be <= fixed $fixed")
  }

  test("trained PQ codebooks reduce total reconstruction error vs fixed") {
    val e = TestData.embeddings(spark, sfDir)
    def totalErr(codebook: org.apache.spark.sql.DataFrame): Double =
      TrainedQuantize.encodeErr(e, codebook)
        .agg(sum(col("dist"))).first().getDouble(0)
    val fixed = totalErr(ProductQuantize.codebook(e))
    val trained = totalErr(TrainedQuantize.trainedCodebook(e, 42L))
    assert(trained <= fixed + 1e-9,
      s"trained PQ distortion $trained must be <= fixed $fixed")
  }

  test("trained keys are deterministic across invocations (seeded)") {
    val a = SparkEntry.queries("ivf_trained_stats")(spark, sfDir).collect().toSeq
    val b = SparkEntry.queries("ivf_trained_stats")(spark, sfDir).collect().toSeq
    assert(a == b)
    val c = SparkEntry.queries("vec_pq_trained")(spark, sfDir).collect().toSeq
    val d2 = SparkEntry.queries("vec_pq_trained")(spark, sfDir).collect().toSeq
    assert(c == d2)
  }
}
