package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.TestData
import graft.TestData.r4
import graft.functions.{VectorOps => V}

/** Product quantization — the vector-DB compression core (reference
  * README.md:2 "building the vectordb"): the 64-dim space is split
  * into M=8 subspaces of 8 dims; each subvector is encoded as the id
  * of its nearest codeword in a per-subspace codebook. A 256-byte
  * float vector becomes M codes (here 8 × 2 bits) plus a shared
  * codebook — at 100 TB the codebook is a 32-row broadcast and
  * encoding is one map-side pass, the same shape as scalar
  * quantization but with much better reconstruction at equal bits.
  *
  * Codebooks here are deterministic (codewords = the subvectors of
  * embeddings 0..3, standing in for a trained k-means codebook) so
  * the full encode is oracle-checkable.
  */
object ProductQuantize {
  type Q = (SparkSession, String) => DataFrame

  private val M = 8  // subspaces
  private val K = 4  // codewords per subspace (= vectors 0..3)

  /** (vec_id, sub, sv): each vector split into M subvectors. */
  private[graft] def subSplit(e: DataFrame): DataFrame =
    e.select(col("vec_id"), explode(expr(
      s"transform(sequence(0, ${M - 1}), j -> struct(j AS sub, slice(embedding, j*8+1, 8) AS sv))"))
      .as("x"))
      .select(col("vec_id"), col("x.sub"), col("x.sv"))

  /** Codebook (sub, code, cw) from vectors 0..K-1 — a 32-row broadcast. */
  private[graft] def codebook(e: DataFrame): DataFrame =
    subSplit(e.filter(col("vec_id") < K))
      .select(col("sub"), col("vec_id").as("code"), col("sv").as("cw"))

  /** Nearest-codeword assignment: (vec_id, sub, code, dist). */
  private[graft] def assignCodes(e: DataFrame): DataFrame =
    subSplit(e).join(broadcast(codebook(e)), "sub")
      .withColumn("d", V.sqDist(col("sv"), col("cw")))
      .groupBy("vec_id", "sub")
      .agg(min(struct(col("d"), col("code"))).as("m"))
      .select(col("vec_id"), col("sub"),
              col("m.code").as("code"), col("m.d").as("dist"))

  val defs: Map[String, Q] = Map(
    "vec_pq_encode" -> ((s, d) => {
      assignCodes(TestData.embeddings(s, d))
        .select(col("vec_id"), col("sub"), col("code"),
                r4(sqrt(col("dist"))).as("sub_err"))
        .orderBy("vec_id", "sub")
    }),

    // ADC search: the query stays un-quantized; a 32-entry
    // (sub, code) → distance lookup table is computed once from the
    // query, and each corpus vector's approximate distance is the sum
    // of 8 table lookups over its stored codes. At 100 TB the scan
    // touches only the 8-byte codes — never the float vectors — and
    // the lookup table is a broadcast. Top-10 for query vec_id 42.
    "ann_pq_adc_topk" -> ((s, d) => {
      val e = TestData.embeddings(s, d)
      val codes = assignCodes(e).select("vec_id", "sub", "code")
      // query distance table: (sub, code) -> sqDist(q_sub, codeword)
      val qsubs = subSplit(e.filter(col("vec_id") === 42))
        .select(col("sub"), col("sv").as("qv"))
      val dtable = qsubs.join(codebook(e), "sub")
        .select(col("sub"), col("code"), V.sqDist(col("qv"), col("cw")).as("dq"))
      // approximate distance = Σ table[sub, code_v(sub)]
      // Sort on the r4-QUANTIZED distance (not the raw double sum):
      // fp addition is non-associative, so Spark's and DuckDB's
      // accumulation orders can differ at ulp level and flip
      // near-ties; quantizing the sort key makes near-equal
      // distances exactly equal, and vec_id breaks the tie the same
      // way in both engines.
      codes.join(broadcast(dtable), Seq("sub", "code"))
        .groupBy("vec_id")
        .agg(r4(sqrt(sum("dq"))).as("approx_dist"))
        .filter(col("vec_id") =!= 42)
        .orderBy(col("approx_dist").asc, col("vec_id"))
        .limit(10)
        .select(col("vec_id"), col("approx_dist"))
    }),

    // The full modern vector-DB search: IVF + PQ combined. The query
    // probes its nProbe=2 nearest coarse centroids (at scale:
    // partition pruning on the stored inverted lists), then ADC runs
    // only over the PQ codes of vectors in the probed clusters — the
    // scan touches neither the float vectors nor the unprobed
    // clusters. Cost per query: corpus/k × nProbe code lookups.
    "ann_ivf_pq_topk" -> ((s, d) => {
      val e = TestData.embeddings(s, d)
      val cents = Vectors.fixedCentroids(e)
      val assigned = V.assignToCentroids(e, cents, Seq("vec_id"))
        .select("vec_id", "cluster")
      val qv = e.filter(col("vec_id") === 42).select(col("embedding").as("qv"))
      val probes = cents.crossJoin(broadcast(qv))
        .withColumn("qd", V.sqDist(col("cv"), col("qv")))
        .orderBy(col("qd"), col("cid")).limit(2)
        .select(col("cid").as("probe_cluster"))
      val probedVecs = assigned
        .join(broadcast(probes), col("cluster") === col("probe_cluster"))
        .select("vec_id")
      val codes = assignCodes(e).select("vec_id", "sub", "code")
      val qsubs = subSplit(e.filter(col("vec_id") === 42))
        .select(col("sub"), col("sv").as("qsv"))
      val dtable = qsubs.join(codebook(e), "sub")
        .select(col("sub"), col("code"),
                V.sqDist(col("qsv"), col("cw")).as("dq"))
      codes.join(probedVecs, "vec_id")
        .join(broadcast(dtable), Seq("sub", "code"))
        .groupBy("vec_id")
        .agg(r4(sqrt(sum("dq"))).as("approx_dist"))
        .filter(col("vec_id") =!= 42)
        .orderBy(col("approx_dist").asc, col("vec_id"))
        .limit(10)
        .select(col("vec_id"), col("approx_dist"))
    }),

    // EXACT REFINE over the ADC candidates (the FAISS `refine` stage):
    // the compressed index proposes top-10 by table-lookup distance,
    // then the FULL vectors are fetched for exactly those 10 rows and
    // exact L2 reranks the final top-5 — full-precision reads scale
    // with k, not corpus size, which is the entire point of searching
    // compressed. Candidate side broadcasts into the corpus join.
    "ann_ivf_pq_rerank_topk" -> ((s, d) => {
      val e = TestData.embeddings(s, d)
      val qv = e.filter(col("vec_id") === 42).select(col("embedding").as("qv"))
      defs("ann_ivf_pq_topk")(s, d)
        .join(e.select(col("vec_id"), col("embedding")), "vec_id")
        .crossJoin(broadcast(qv))
        .withColumn("exact_dist",
          r4(sqrt(V.sqDist(col("embedding"), col("qv")))))
        .orderBy(col("exact_dist").asc, col("vec_id"))
        .limit(5)
        .select(col("vec_id"), col("exact_dist"), col("approx_dist"))
    })
  )

  /** ADC top-10 (shared by the plain and the exact-rerank keys). */
  private val AdcTop10Sql: String =
    """WITH c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
      |           FROM embeddings WHERE vec_id < 4),
      |assigned AS (
      |  SELECT vec_id, cluster FROM (
      |    SELECT e.vec_id, c.cid AS cluster,
      |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
      |        list_sum(list_transform(list_zip(e.embedding::DOUBLE[], c.cv),
      |          p -> (p[1] - p[2]) * (p[1] - p[2]))), c.cid) AS rn
      |    FROM embeddings e CROSS JOIN c)
      |  WHERE rn = 1),
      |probes AS (
      |  SELECT cid AS probe_cluster FROM (
      |    SELECT c.cid,
      |      list_sum(list_transform(list_zip(q.embedding::DOUBLE[], c.cv),
      |        p -> (p[1] - p[2]) * (p[1] - p[2]))) AS qd
      |    FROM c, (SELECT * FROM embeddings WHERE vec_id = 42) q
      |    ORDER BY qd, cid LIMIT 2)),
      |subs AS (
      |  SELECT vec_id, j AS sub,
      |         (embedding::DOUBLE[])[j*8+1 : j*8+8] AS sv
      |  FROM embeddings, LATERAL (SELECT unnest(range(8)) AS j) r),
      |codebook AS (
      |  SELECT j AS sub, vec_id AS code,
      |         (embedding::DOUBLE[])[j*8+1 : j*8+8] AS cw
      |  FROM embeddings, LATERAL (SELECT unnest(range(8)) AS j) r
      |  WHERE vec_id < 4),
      |scored AS (
      |  SELECT s.vec_id, s.sub, c.code,
      |    list_sum(list_transform(list_zip(s.sv, c.cw),
      |      p -> (p[1] - p[2]) * (p[1] - p[2]))) AS dist
      |  FROM subs s JOIN codebook c ON s.sub = c.sub),
      |codes AS (
      |  SELECT vec_id, sub, code FROM (
      |    SELECT vec_id, sub, code,
      |      row_number() OVER (PARTITION BY vec_id, sub
      |        ORDER BY dist, code) AS rn
      |    FROM scored) WHERE rn = 1),
      |dtable AS (
      |  SELECT c.sub, c.code,
      |    list_sum(list_transform(list_zip(q.sv, c.cw),
      |      p -> (p[1] - p[2]) * (p[1] - p[2]))) AS dq
      |  FROM (SELECT sub, sv FROM subs WHERE vec_id = 42) q
      |  JOIN codebook c ON q.sub = c.sub),
      |approx AS (
      |  SELECT k.vec_id, sum(t.dq) AS adist
      |  FROM codes k
      |  JOIN assigned a ON a.vec_id = k.vec_id
      |  JOIN probes p ON a.cluster = p.probe_cluster
      |  JOIN dtable t ON k.sub = t.sub AND k.code = t.code
      |  GROUP BY k.vec_id)
      |SELECT vec_id, floor((sqrt(adist))*10000 + 0.5)/10000 AS approx_dist
      |FROM approx WHERE vec_id <> 42
      |ORDER BY approx_dist ASC, vec_id LIMIT 10""".stripMargin

  val oracles: Map[String, String] = Map(
    "vec_pq_encode" ->
      """WITH subs AS (
        |  SELECT vec_id, j AS sub,
        |         (embedding::DOUBLE[])[j*8+1 : j*8+8] AS sv
        |  FROM embeddings, LATERAL (SELECT unnest(range(8)) AS j) r),
        |codebook AS (
        |  SELECT j AS sub, vec_id AS code,
        |         (embedding::DOUBLE[])[j*8+1 : j*8+8] AS cw
        |  FROM embeddings, LATERAL (SELECT unnest(range(8)) AS j) r
        |  WHERE vec_id < 4),
        |scored AS (
        |  SELECT s.vec_id, s.sub, c.code,
        |    list_sum(list_transform(list_zip(s.sv, c.cw),
        |      p -> (p[1] - p[2]) * (p[1] - p[2]))) AS dist
        |  FROM subs s JOIN codebook c ON s.sub = c.sub),
        |best AS (
        |  SELECT vec_id, sub, code, dist,
        |    row_number() OVER (PARTITION BY vec_id, sub
        |      ORDER BY dist, code) AS rn
        |  FROM scored)
        |SELECT vec_id, sub, code,
        |  floor((sqrt(dist))*10000 + 0.5)/10000 AS sub_err
        |FROM best WHERE rn = 1 ORDER BY vec_id, sub""".stripMargin,
    "ann_pq_adc_topk" ->
      """WITH subs AS (
        |  SELECT vec_id, j AS sub,
        |         (embedding::DOUBLE[])[j*8+1 : j*8+8] AS sv
        |  FROM embeddings, LATERAL (SELECT unnest(range(8)) AS j) r),
        |codebook AS (
        |  SELECT j AS sub, vec_id AS code,
        |         (embedding::DOUBLE[])[j*8+1 : j*8+8] AS cw
        |  FROM embeddings, LATERAL (SELECT unnest(range(8)) AS j) r
        |  WHERE vec_id < 4),
        |scored AS (
        |  SELECT s.vec_id, s.sub, c.code,
        |    list_sum(list_transform(list_zip(s.sv, c.cw),
        |      p -> (p[1] - p[2]) * (p[1] - p[2]))) AS dist
        |  FROM subs s JOIN codebook c ON s.sub = c.sub),
        |codes AS (
        |  SELECT vec_id, sub, code FROM (
        |    SELECT vec_id, sub, code,
        |      row_number() OVER (PARTITION BY vec_id, sub
        |        ORDER BY dist, code) AS rn
        |    FROM scored) WHERE rn = 1),
        |dtable AS (
        |  SELECT c.sub, c.code,
        |    list_sum(list_transform(list_zip(q.sv, c.cw),
        |      p -> (p[1] - p[2]) * (p[1] - p[2]))) AS dq
        |  FROM (SELECT sub, sv FROM subs WHERE vec_id = 42) q
        |  JOIN codebook c ON q.sub = c.sub),
        |approx AS (
        |  SELECT k.vec_id, sum(t.dq) AS adist
        |  FROM codes k JOIN dtable t ON k.sub = t.sub AND k.code = t.code
        |  GROUP BY k.vec_id)
        |SELECT vec_id, floor((sqrt(adist))*10000 + 0.5)/10000 AS approx_dist
        |FROM approx WHERE vec_id <> 42
        |ORDER BY approx_dist ASC, vec_id LIMIT 10""".stripMargin,
    "ann_ivf_pq_topk" -> AdcTop10Sql,
    "ann_ivf_pq_rerank_topk" ->
      s"""WITH cand AS ($AdcTop10Sql),
        |q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings
        |      WHERE vec_id = 42)
        |SELECT cand.vec_id,
        |  floor((sqrt(list_sum(list_transform(
        |    list_zip(e.embedding::DOUBLE[], q.qv),
        |    p -> (p[1] - p[2]) * (p[1] - p[2])))))*10000 + 0.5)/10000
        |    AS exact_dist,
        |  approx_dist
        |FROM cand JOIN embeddings e ON cand.vec_id = e.vec_id, q
        |ORDER BY exact_dist ASC, cand.vec_id LIMIT 5""".stripMargin
  )
}
