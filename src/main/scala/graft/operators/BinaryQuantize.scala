package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.TestData
import graft.TestData.r4
import graft.functions.{VectorOps => V}

/** Binary (1-bit sign) quantization + Hamming-distance search — the
  * most aggressive member of the compression family for the
  * reference's S4 vector-db build (/root/reference/README.md:2) (fp32 → 1 bit per
  * dimension = 64× smaller than the raw vectors, 4× smaller than the
  * int8 SQ codes, next to PQ's 8 bytes). A 64-dim embedding becomes
  * two 32-bit words; candidate search is XOR + popcount per pair —
  * pure register arithmetic, no floats — followed by an exact cosine
  * rerank of the tiny candidate set. This is the
  * compress → coarse-rank → exact-rerank pattern every modern vector
  * DB ships (binary/int8 prefilter, float rerank).
  *
  * Scale shape: encoding is one map-side pass (no shuffle); the query
  * code and query vector are 1-row broadcasts; candidate ranking is a
  * TakeOrderedAndProject (top-50 by int Hamming distance), so the
  * full-precision vectors are fetched for only 50 rows regardless of
  * corpus size. Everything is exact-integer until the final rerank,
  * so both engines agree bit-for-bit.
  *
  * Both words keep bits 0..31 (values < 2³², never the sign bit):
  * DuckDB's `<<` range-checks BIGINT shifts, so a 63-bit pack would
  * overflow there while Spark wraps silently — two half-words are the
  * portable layout.
  */
object BinaryQuantize {
  type Q = (SparkSession, String) => DataFrame

  /** Sign-bit codes: w0 = dims 0..31, w1 = dims 32..63 (bit i of
    * word w = 1 iff embedding[32w + i] > 0).
    */
  def codes(e: DataFrame): DataFrame =
    e.select(col("vec_id"),
      expr("aggregate(sequence(0, 31), 0L, (acc, i) -> " +
        "acc + IF(element_at(embedding, i + 1) > 0D, shiftleft(1L, i), 0L))")
        .as("w0"),
      expr("aggregate(sequence(32, 63), 0L, (acc, i) -> " +
        "acc + IF(element_at(embedding, i + 1) > 0D, shiftleft(1L, i - 32), 0L))")
        .as("w1"))

  val defs: Map[String, Q] = Map(
    // The codebook-free encode: per vector its two code words and the
    // population count (number of positive dims) — the balance check
    // run after binarizing a corpus (a skewed popcount distribution
    // means the cut point is wrong).
    "vec_binary_quantize" -> ((s, d) =>
      codes(TestData.embeddings(s, d))
        .withColumn("n_pos", expr("bit_count(w0) + bit_count(w1)").cast("int"))
        .orderBy("vec_id")),

    // Hamming search: XOR + popcount against the broadcast query code
    // ranks the whole corpus with integer ops; top-50 candidates are
    // reranked by exact cosine and the top-10 returned. Candidate
    // selection is exact-integer (deterministic with the vec_id
    // tie-break); only the final rerank touches floats.
    "ann_hamming_topk" -> ((s, d) => {
      val e = TestData.embeddings(s, d)
      val c = codes(e)
      val qc = c.filter(col("vec_id") === 0)
        .select(col("w0").as("q0"), col("w1").as("q1"))
      val qv = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
      val cand = c.filter(col("vec_id") =!= 0).crossJoin(broadcast(qc))
        .withColumn("hamming",
          expr("bit_count(w0 ^ q0) + bit_count(w1 ^ q1)").cast("int"))
        .select("vec_id", "hamming")
        .orderBy(col("hamming"), col("vec_id")).limit(50)
      cand.join(e.select("vec_id", "embedding"), "vec_id")
        .crossJoin(broadcast(qv))
        .select(col("vec_id"), col("hamming"),
          r4(V.cosine(col("embedding"), col("qv"))).as("cos"))
        .orderBy(col("cos").desc, col("vec_id")).limit(10)
    })
  )

  private val W =
    """SELECT vec_id,
      |  list_sum([CASE WHEN embedding[i+1] > 0 THEN (1::BIGINT << i)
      |            ELSE 0::BIGINT END for i in range(0, 32)])::BIGINT AS w0,
      |  list_sum([CASE WHEN embedding[i+33] > 0 THEN (1::BIGINT << i)
      |            ELSE 0::BIGINT END for i in range(0, 32)])::BIGINT AS w1
      |FROM embeddings""".stripMargin

  val oracles: Map[String, String] = Map(
    "vec_binary_quantize" ->
      s"""WITH b AS ($W)
        |SELECT vec_id, w0, w1,
        |  (bit_count(w0) + bit_count(w1))::INT AS n_pos
        |FROM b ORDER BY vec_id""".stripMargin,
    "ann_hamming_topk" ->
      s"""WITH b AS ($W),
        |q AS (SELECT w0 AS q0, w1 AS q1 FROM b WHERE vec_id = 0),
        |qv AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
        |cand AS (
        |  SELECT vec_id,
        |    (bit_count(xor(w0, q0)) + bit_count(xor(w1, q1)))::INT AS hamming
        |  FROM b CROSS JOIN q WHERE vec_id <> 0
        |  ORDER BY hamming, vec_id LIMIT 50)
        |SELECT c.vec_id, c.hamming,
        |  floor((list_cosine_similarity(e.embedding::DOUBLE[], qv.qv))*10000 + 0.5)/10000 AS cos
        |FROM cand c JOIN embeddings e USING (vec_id) CROSS JOIN qv
        |ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin
  )
}
