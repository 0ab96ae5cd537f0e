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
  * centroids.
  *
  * Training shape (the 100 TB design): codebooks are tiny (k ≤ 32
  * rows) and are NEVER trained on the full corpus — every production
  * IVF/PQ build trains on a bounded sample and broadcasts the result.
  * So training here is: (1) one distributed TakeOrdered pass picks a
  * deterministic sample of ≤ [[SampleCap]] vectors (smallest
  * xxhash64(vec_id) — content-addressed, so stable across runs,
  * partitionings and cluster sizes); (2) a driver-local seeded
  * Lloyd's loop fits the centroids in microseconds. The driver
  * transfer is O(SampleCap × dim) ≈ 2 MB — bounded regardless of
  * corpus size — and the ENCODE path (the part that actually scales
  * with data) stays fully distributed: a k-row broadcast join + one
  * map-side argmin pass, identical to the fixed-codebook path.
  * (The previous revision ran 9 distributed MLlib fits — ~160 Spark
  * jobs of scheduler overhead to fit 36 centroids; a driver-local
  * loop over a bounded sample is both faster and the shape you'd
  * actually run at scale.)
  *
  * Oracle-omitted (k-means is iterative/init-dependent — not
  * expressible in portable SQL); property-tested instead: trained
  * quantization error must be ≤ the fixed-codebook error
  * (TrainedSpec), which is the point of training.
  */
object TrainedQuantize {
  type Q = (SparkSession, String) => DataFrame

  /** Max training-sample size. FAISS-style guidance is ~39×k..256×k
    * points per centroid; 4096 covers k=32 with plenty of margin and
    * keeps the driver transfer ~2 MB at dim=64.
    */
  private val SampleCap = 4096

  /** Deterministic bounded training sample: the SampleCap smallest
    * rows by xxhash64(embedding) — content-addressed (no id-column
    * requirement: the facade trains on arbitrary frames), so the
    * sample is stable across runs, partition layouts, and cluster
    * sizes. TakeOrdered — one distributed pass, no full sort.
    */
  private def trainingSample(e: DataFrame): Array[Array[Double]] =
    e.select(col("embedding"))
      .orderBy(xxhash64(col("embedding")))
      .limit(SampleCap)
      .collect()
      .map(_.getSeq[Double](0).toArray)

  /** Seeded driver-local Lloyd's over the sample. Init = k points
    * drawn from the sample by a seeded shuffle; empty clusters keep
    * their previous center. Deterministic for a fixed (sample, seed).
    */
  private[graft] def localLloyd(xs: Array[Array[Double]], k: Int,
                                seed: Long, iters: Int = 20): Array[Array[Double]] = {
    require(xs.nonEmpty && xs.length >= k, s"need >= $k sample points")
    val rnd = new scala.util.Random(seed)
    val dim = xs(0).length
    val centers = rnd.shuffle(xs.indices.toVector).take(k)
      .map(i => xs(i).clone).toArray
    var it = 0
    var moved = true
    while (it < iters && moved) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Long](k)
      var i = 0
      while (i < xs.length) {
        val x = xs(i)
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          var d = 0.0; var j = 0
          val cc = centers(c)
          while (j < dim) { val t = x(j) - cc(j); d += t * t; j += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        val s = sums(best); var j = 0
        while (j < dim) { s(j) += x(j); j += 1 }
        counts(best) += 1
        i += 1
      }
      moved = false
      var c = 0
      while (c < k) {
        if (counts(c) > 0) {
          var j = 0
          while (j < dim) {
            val nv = sums(c)(j) / counts(c)
            if (math.abs(nv - centers(c)(j)) > 1e-12) moved = true
            centers(c)(j) = nv; j += 1
          }
        }
        c += 1
      }
      it += 1
    }
    centers
  }

  /** Per-(session, input-tag, kind) memo of trained codebooks: the
    * fits are pure functions of the fixture, several declared keys
    * consume them in one run (`ivf_trained_stats`, `vec_pq_trained`,
    * `ann_ivf_pq_trained_topk`), and each result is a ≤32-row
    * driver-local relation — cache the DataFrame, skip the sample
    * job on every reuse.
    */
  private val memo =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  private def memoKey(s: SparkSession, d: String, kind: String): String =
    System.identityHashCode(s) + "|" +
      graft.sources.WriteOnce.inputTag(d, "embeddings") + "|" + kind

  /** Train k centroids over an `embedding` array column; returns the
    * same (cid, cv) shape as [[Vectors.fixedCentroids]] so trained
    * and fixed codebooks are drop-in interchangeable.
    */
  def trainCentroids(e: DataFrame, k: Int, seed: Long): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    localLloyd(trainingSample(e), k, seed).zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cid", "cv")
  }

  private def fixtureCentroids(s: SparkSession, d: String): DataFrame =
    memo.computeIfAbsent(memoKey(s, d, "ivf4"),
      _ => trainCentroids(TestData.embeddings(s, d), 4, seed = 42L))

  private[graft] def fixtureCodebook(s: SparkSession, d: String): DataFrame =
    memo.computeIfAbsent(memoKey(s, d, "pq8x4"),
      _ => trainedCodebook(TestData.embeddings(s, d), seed = 42L))

  val defs: Map[String, Q] = Map(
    // IVF with trained coarse centroids: per-shard occupancy and
    // distortion. Output keyed by occupancy rank (not raw cid) so it
    // is stable under centroid relabeling.
    "ivf_trained_stats" -> ((s, d) => {
      val e = TestData.embeddings(s, d)
      V.assignToCentroids(e, fixtureCentroids(s, d), Seq("vec_id"))
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
      encodeErr(e, fixtureCodebook(s, d))
        .groupBy("vec_id")
        .agg(r4(sqrt(sum(col("dist")))).as("recon_err"))
        .orderBy("vec_id")
    })
  )

  /** Per-subspace trained (sub, code, cw) codebook — 8 seeded local
    * fits over the ONE shared training sample, split into subvectors
    * driver-side; the full codebook is a 32-row broadcast exactly
    * like the fixed one.
    */
  private[graft] def trainedCodebook(e: DataFrame, seed: Long): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val sample = trainingSample(e)
    val rows = (0 until 8).flatMap { j =>
      val subs = sample.map(v => java.util.Arrays.copyOfRange(v, j * 8, j * 8 + 8))
      localLloyd(subs, 4, seed + j).zipWithIndex
        .map { case (c, code) => (j, code, c.toSeq) }
    }
    rows.toDF("sub", "code", "cw")
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
