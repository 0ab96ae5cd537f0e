package graft.operators

import graft.CkptOps

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import graft.TestData
import graft.TestData.r4
import graft.functions.{HyperplaneSig, VectorOps => V}

/** Embedding-cosine near-duplicate detection at scale: signed random
  * projections (SimHash for cosine) → banded bucket join → exact
  * cosine re-check. The scale path next to the brute-force baseline
  * `dup_pairs_cosine` (O(n²) within label blocks): candidates come
  * from equality joins on fixed-width (band, bits) keys, so the
  * pre-filter cost is one shuffle of n·bands tiny rows instead of n²
  * pairs — the same banded-LSH shape as `dedup_minhash_lsh`, but for
  * the embedding column.
  *
  * Parameters (H=32 planes, 4 bands × 8 bits): two vectors at cosine
  * 0.99 (θ ≈ 8.1°) agree per bit w.p. ≈ 0.974, so a band of 8 bits
  * collides w.p. ≈ 0.81 and at least one of 4 bands w.p. ≈ 0.9987 —
  * while uncorrelated vectors (bit-agreement ½) collide anywhere
  * w.p. ≈ 1.5 %. The exact re-check keeps precision at 1, so the
  * only approximation is a ~0.1 % per-pair miss chance — and because
  * the plane matrix is a fixed-seed constant, the output is fully
  * deterministic (verified against the unblocked oracle at every
  * fixture scale). At larger corpus sizes, widen the bands (more
  * planes per band) to hold the candidate rate; the plan shape is
  * unchanged.
  */
object EmbedDedup {
  type Q = (SparkSession, String) => DataFrame

  private val Bands = 4
  private val BitsPerBand = 8

  /** Packed 32-bit hyperplane signature of an ARRAY<DOUBLE> column. */
  def signature(v: Column, dim: Int, seed: Long): Column =
    Bridge.column(HyperplaneSig(Bridge.expression(v),
      HyperplaneSig.planes(Bands * BitsPerBand, dim, seed)))

  /** Near-dup pairs (id_a < id_b, cosine > `threshold`) over a
    * (id, embedding) frame via banded hyperplane LSH + exact
    * re-check.
    */
  def nearDupPairs(vecs: DataFrame, dim: Int, threshold: Double,
                   seed: Long = 7L): DataFrame = {
    // Signatures are self-joined below — checkpoint so the projection
    // pipeline runs once, not once per join branch.
    val sigs = vecs.select(col("id"),
        signature(col("embedding"), dim, seed).as("sig"))
      .ckpt()
    val banded = sigs.select(col("id"), explode(array(
        (0 until Bands).map(b => struct(lit(b).as("band"),
          shiftright(col("sig"), b * BitsPerBand)
            .bitwiseAND(lit((1L << BitsPerBand) - 1)).as("bits"))): _*))
        .as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bits").as("bits"))
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bits") === col("b.bits") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    val va = vecs.select(col("id").as("id_a"), col("embedding").as("va"))
    val vb = vecs.select(col("id").as("id_b"), col("embedding").as("vb"))
    cand.join(va, "id_a").join(vb, "id_b")
      .withColumn("cos", V.cosine(col("va"), col("vb")))
      .filter(col("cos") > threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
  }

  val defs: Map[String, Q] = Map(
    // The fixture corpus has no cosine-0.99 pairs (max pairwise cos
    // ≈ 0.52), so the query plants deterministic duplicates: every
    // 10th vector re-enters as id+1_000_000 scaled by 1.5 — same
    // direction, different magnitude, i.e. cosine exactly 1. The
    // signature is scale-invariant (sign(1.5·v·p) = sign(v·p)), so
    // the planted pairs collide in every band and the LSH output is
    // exactly the planted set — mirrored in the oracle, which runs
    // the UNBLOCKED brute force over the same planted corpus.
    "dedup_embedding_lsh" -> ((s, d) => {
      val e = TestData.embeddings(s, d)
        .select(col("vec_id").as("id"), col("embedding"))
      val planted = e.filter(col("id") % 10 === 0)
        .select((col("id") + 1000000L).as("id"),
          transform(col("embedding"), x => x * lit(1.5)).as("embedding"))
      nearDupPairs(e.unionAll(planted), dim = 64, threshold = 0.99)
        .select(col("id_a"), col("id_b"), r4(col("cos")).as("cos"))
        .orderBy("id_a", "id_b")
    }),

    // SemDeDup (Abbas et al. 2023): semantic dedup scoped to coarse
    // clusters — assign every embedding to its nearest centroid, pair
    // up ONLY within a cluster (the clustering bounds the pair work:
    // at 100 TB, k is sized so clusters stay small, and the pair join
    // shuffles on the cluster key), flag pairs above the cosine
    // threshold, drop the higher id of each flagged pair (greedy
    // keep-first). Cross-cluster near-dups are missed by design —
    // that approximation is the paper's scalability trade.
    "dedup_semantic" -> ((s, d) => {
      import graft.functions.{VectorOps => V}
      val e = TestData.embeddings(s, d)
      val assigned = V.assignToCentroids(
          e, Vectors.fixedCentroids(e), Seq("vec_id", "embedding"))
        .select(col("vec_id"), col("embedding"), col("cluster"))
        // the a/b self-join below would re-run the assignment per branch
        .ckpt()
      val a = assigned.select(col("vec_id").as("ida"),
        col("embedding").as("va"), col("cluster").as("ca"))
      val b = assigned.select(col("vec_id").as("idb"),
        col("embedding").as("vb"), col("cluster").as("cb"))
      val pairs = a.join(b.hint("shuffle_hash"),
          col("ca") === col("cb") && col("ida") < col("idb"))
        .withColumn("cos", r4(V.cosine(col("va"), col("vb"))))
        .filter(col("cos") > 0.4)
        .select(col("ca").as("cluster"), col("ida"), col("idb"))
        .ckpt() // consumed twice (pair count + drop set)
      val members = assigned.groupBy("cluster")
        .agg(count(lit(1)).as("n_members"))
      val np = pairs.groupBy("cluster")
        .agg(count(lit(1)).as("n_pairs"))
      val nd = pairs.select(col("cluster"), col("idb")).distinct()
        .groupBy("cluster").agg(count(lit(1)).as("n_dropped"))
      members.join(np, Seq("cluster"), "left")
        .join(nd, Seq("cluster"), "left")
        .select(col("cluster"), col("n_members"),
          coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
          coalesce(col("n_dropped"), lit(0L)).as("n_dropped"))
        .orderBy("cluster")
    })
  )

  private val E = "embedding::DOUBLE[]"

  // The oracle is the UNBLOCKED brute force over the same planted
  // corpus: planted pairs sit at cosine exactly 1 (scale-invariant
  // signatures collide deterministically), every other pair is below
  // 0.52 — so the LSH output matches exactly at every fixture scale;
  // DedupSpec additionally property-tests candidate recall on random
  // corpora with planted duplicates.
  val oracles: Map[String, String] = Map(
    "dedup_embedding_lsh" ->
      s"""WITH base AS (SELECT vec_id AS id, $E AS v FROM embeddings),
        |planted AS (
        |  SELECT id + 1000000 AS id, list_transform(v, x -> x * 1.5) AS v
        |  FROM base WHERE id % 10 = 0),
        |u AS (SELECT * FROM base UNION ALL SELECT * FROM planted)
        |SELECT a.id AS id_a, b.id AS id_b,
        |  floor((list_cosine_similarity(a.v, b.v))*10000 + 0.5)/10000 AS cos
        |FROM u a JOIN u b ON a.id < b.id
        |WHERE list_cosine_similarity(a.v, b.v) > 0.99
        |ORDER BY id_a, id_b""".stripMargin,
    // Same nearest-centroid assignment CTE as the IVF oracles; the
    // pair predicate quantizes BEFORE the threshold (r4 on both
    // engines) so the 0.4 boundary cannot flip.
    "dedup_semantic" ->
      s"""WITH c AS (SELECT vec_id AS cid, $E AS cv
        |           FROM embeddings WHERE vec_id < 4),
        |assigned AS (
        |  SELECT vec_id, cluster FROM (
        |    SELECT e.vec_id, c.cid AS cluster,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        list_sum(list_transform(list_zip(e.$E, c.cv),
        |          p -> (p[1] - p[2]) * (p[1] - p[2]))), c.cid) AS rn
        |    FROM embeddings e CROSS JOIN c)
        |  WHERE rn = 1),
        |ae AS (
        |  SELECT e.vec_id, e.$E AS v, s.cluster
        |  FROM embeddings e JOIN assigned s ON e.vec_id = s.vec_id),
        |pairs AS (
        |  SELECT x.cluster, x.vec_id AS ida, y.vec_id AS idb
        |  FROM ae x JOIN ae y ON x.cluster = y.cluster AND x.vec_id < y.vec_id
        |  WHERE floor((list_cosine_similarity(x.v, y.v))*10000 + 0.5)/10000 > 0.4),
        |m AS (SELECT cluster, count(*)::BIGINT AS n_members
        |      FROM assigned GROUP BY cluster),
        |np AS (SELECT cluster, count(*)::BIGINT AS n_pairs
        |       FROM pairs GROUP BY cluster),
        |nd AS (SELECT cluster, count(DISTINCT idb)::BIGINT AS n_dropped
        |       FROM pairs GROUP BY cluster)
        |SELECT m.cluster, m.n_members,
        |  coalesce(np.n_pairs, 0)::BIGINT AS n_pairs,
        |  coalesce(nd.n_dropped, 0)::BIGINT AS n_dropped
        |FROM m LEFT JOIN np ON m.cluster = np.cluster
        |LEFT JOIN nd ON m.cluster = nd.cluster
        |ORDER BY m.cluster""".stripMargin
  )
}
