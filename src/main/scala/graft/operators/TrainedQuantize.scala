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
  private val memo = new graft.SessionMemo[DataFrame]

  private val sampleMemo = new graft.SessionMemo[Array[Array[Double]]]

  private def memoKey(d: String, kind: String): String =
    graft.sources.WriteOnce.inputTag(d, "embeddings") + "|" + kind

  /** One sample job per (session, fixture) serves every trained
    * codebook below (two coarse codebooks + two PQ codebooks).
    */
  private def fixtureSample(s: SparkSession, d: String): Array[Array[Double]] =
    sampleMemo.getOrElseUpdate(s, memoKey(d, "sample"),
      trainingSample(TestData.embeddings(s, d)))

  /** Train k centroids over an `embedding` array column; returns the
    * same (cid, cv) shape as [[Vectors.fixedCentroids]] so trained
    * and fixed codebooks are drop-in interchangeable.
    */
  def trainCentroids(e: DataFrame, k: Int, seed: Long): DataFrame =
    centroidsDf(e.sparkSession, localLloyd(trainingSample(e), k, seed))

  private def centroidsDf(s: SparkSession, cs: Array[Array[Double]]): DataFrame = {
    import s.implicits._
    cs.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq.toDF("cid", "cv")
  }

  private def codebookDf(s: SparkSession, sample: Array[Array[Double]],
                         k: Int, seed: Long): DataFrame = {
    import s.implicits._
    (0 until 8).flatMap { j =>
      val subs = sample.map(v => java.util.Arrays.copyOfRange(v, j * 8, j * 8 + 8))
      localLloyd(subs, k, seed + j).zipWithIndex
        .map { case (c, code) => (j, code, c.toSeq) }
    }.toDF("sub", "code", "cw")
  }

  private[graft] def fixtureCentroids(s: SparkSession, d: String, k: Int): DataFrame =
    memo.getOrElseUpdate(s, memoKey(d, s"ivf$k"),
      centroidsDf(s, localLloyd(fixtureSample(s, d), k, seed = 42L)))

  private[graft] def fixtureCodebook(s: SparkSession, d: String, k: Int): DataFrame =
    memo.getOrElseUpdate(s, memoKey(d, s"pq8x$k"),
      codebookDf(s, fixtureSample(s, d), k, seed = 42L))

  /** PQ codebook trained on RESIDUALS (x − nearest coarse centroid) —
    * the IVF-ADC form: residuals concentrate near zero, so the same
    * codeword budget spends its resolution on the part of the vector
    * the coarse quantizer didn't explain. The residual sample is
    * computed driver-side from the already-collected training sample
    * (coarse assignment of ≤4096 points — microseconds).
    */
  private def fixtureResidualCodebook(s: SparkSession, d: String,
                                      kCoarse: Int, kPq: Int): DataFrame =
    memo.getOrElseUpdate(s, memoKey(d, s"pqres${kCoarse}x$kPq"), {
      val sample = fixtureSample(s, d)
      val coarse = localLloyd(sample, kCoarse, seed = 42L)
      val resid = sample.map { x =>
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < coarse.length) {
          var ds = 0.0; var j = 0
          val cc = coarse(c)
          while (j < x.length) { val t = x(j) - cc(j); ds += t * t; j += 1 }
          if (ds < bestD) { bestD = ds; best = c }
          c += 1
        }
        val r = new Array[Double](x.length)
        var j = 0
        while (j < x.length) { r(j) = x(j) - coarse(best)(j); j += 1 }
        r
      }
      codebookDf(s, resid, kPq, seed = 42L)
    })

  val defs: Map[String, Q] = Map(
    // IVF with trained coarse centroids: per-shard occupancy and
    // distortion. Output keyed by occupancy rank (not raw cid) so it
    // is stable under centroid relabeling.
    "ivf_trained_stats" -> ((s, d) => {
      val e = TestData.embeddings(s, d)
      V.assignToCentroids(e, fixtureCentroids(s, d, 4), Seq("vec_id"))
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
      encodeErr(e, fixtureCodebook(s, d, 4))
        .groupBy("vec_id")
        .agg(r4(sqrt(sum(col("dist")))).as("recon_err"))
        .orderBy("vec_id")
    }),

    // The full TRAINED IVF-PQ search with RESIDUAL encoding — the
    // textbook IVF-ADC plan, closing the "stand-in codebook" gap
    // end-to-end. Trained coarse centroids shard the corpus (IVF,
    // k=8, probe 3); each vector's RESIDUAL (x − its coarse centroid)
    // is PQ-compressed with residual-trained codebooks (16 codewords
    // = 4 bits/subspace). The query picks the 3 nearest shards,
    // builds a PER-SHARD 8×16 ADC table from the query's residual
    // against that shard (a ≤384-row broadcast), and scans only the
    // probed shards' CODES — never the raw vectors; non-probed
    // shards fall out of the broadcast-join. Unlike `ann_ivf_pq_topk`
    // (whose K=4/no-residual form is pinned small so the whole
    // computation stays SQL-mirrorable), this key is the production
    // shape; oracle-omitted (k-means), the recall-vs-exact property
    // lives in TrainedSpec.
    "ann_ivf_pq_trained_topk" -> ((s, d) => {
      val e = TestData.embeddings(s, d)
      val cents = fixtureCentroids(s, d, 8)
      val codebook = fixtureResidualCodebook(s, d, 8, 16)
      val assigned = V.assignToCentroids(e, cents, Seq("vec_id"))
        .select("vec_id", "cluster")
      // Residual corpus: x − coarse centroid, encoded map-side.
      val resid = e.join(assigned, "vec_id")
        .join(broadcast(cents), col("cluster") === col("cid"))
        .select(col("vec_id"),
          zip_with(col("embedding"), col("cv"), (a, b) => a - b)
            .as("embedding"))
      val codes = encodeErr(resid, codebook).select("vec_id", "sub", "code")
      val qv = e.filter(col("vec_id") === 42).select(col("embedding").as("qv"))
      val probes = cents.crossJoin(broadcast(qv))
        .withColumn("qd", V.sqDist(col("cv"), col("qv")))
        .orderBy(col("qd"), col("cid")).limit(3)
        .select(col("cid").as("cluster"),
          zip_with(col("qv"), col("cv"), (a, b) => a - b).as("qr"))
      // Per-probed-shard ADC table over the query's residual:
      // (cluster, sub, code, dq).
      val qsubs = probes.select(col("cluster"), explode(expr(
          "transform(sequence(0, 7), j -> struct(j AS sub, slice(qr, j*8+1, 8) AS qsv))"))
          .as("x"))
        .select(col("cluster"), col("x.sub").as("sub"), col("x.qsv").as("qsv"))
      val dtable = qsubs.join(codebook, "sub")
        .select(col("cluster"), col("sub"), col("code"),
                V.sqDist(col("qsv"), col("cw")).as("dq"))
      codes.join(assigned, "vec_id")
        .join(broadcast(dtable), Seq("cluster", "sub", "code"))
        .groupBy("vec_id")
        .agg(r4(sqrt(sum("dq"))).as("approx_dist"))
        .filter(col("vec_id") =!= 42)
        .orderBy(col("approx_dist").asc, col("vec_id"))
        .limit(10)
        .select(col("vec_id"), col("approx_dist"))
    })
  )

  /** Per-subspace trained (sub, code, cw) codebook — 8 seeded local
    * fits over the ONE shared training sample, split into subvectors
    * driver-side; a K=4 codebook is a 32-row broadcast exactly like
    * the fixed one.
    */
  private[graft] def trainedCodebook(e: DataFrame, seed: Long,
                                     k: Int = 4): DataFrame =
    codebookDf(e.sparkSession, trainingSample(e), k, seed)

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
