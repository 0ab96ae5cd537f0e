package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector arithmetic over `ARRAY<DOUBLE>` columns, expressed as
  * higher-order functions so everything stays inside Catalyst (no
  * UDF serialization boundary, full codegen of the surrounding plan).
  *
  * These are the public-API building blocks for the §2.I operators
  * (SURVEY.md); the reference's domain is exactly this (README.md:2
  * "building the embeddings … building the vectordb").
  */
object VectorOps {

  /** Σ aᵢ·bᵢ */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** ‖a‖₂ */
  def l2norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, v) => acc + v))

  /** Squared L2 distance Σ (aᵢ−bᵢ)² */
  def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
              lit(0.0), (acc, v) => acc + v)

  /** cos(a, b) = a·b / (‖a‖‖b‖) — the custom codegen'd Catalyst
    * expression ([[CosineSimilarity]]); bit-identical to [[cosineHof]]
    * but one fused loop inside whole-stage codegen.
    */
  def cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      CosineSimilarity(
        org.apache.spark.sql.graft.Bridge.expression(a),
        org.apache.spark.sql.graft.Bridge.expression(b)))

  /** Pure-HOF cosine (public-API fallback; kept as the reference
    * implementation the custom expression is pinned against).
    */
  def cosineHof(a: Column, b: Column): Column =
    dot(a, b) / (l2norm(a) * l2norm(b))

  /** Assign each row's `embedding` to its nearest centroid (min
    * squared L2, ties broken by min centroid id) against a broadcast
    * centroid table with columns (cid, cv). One map-side pass over
    * the corpus — the IVF coarse-quantization shape shared by
    * `kmeans_assign_fixed`, `ivf_partition_stats`, `ann_ivf_topk`
    * and the index-build pipeline. Output: input columns (minus
    * embedding-join temporaries) + (cluster, dist).
    */
  def assignToCentroids(corpus: org.apache.spark.sql.DataFrame,
                        cents: org.apache.spark.sql.DataFrame,
                        keyCols: Seq[String]): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, min, struct, sqrt => sq}
    corpus.crossJoin(broadcast(cents))
      .withColumn("dist", sqDist(col("embedding"), col("cv")))
      .groupBy(keyCols.map(col): _*)
      .agg(min(struct(col("dist"), col("cid"))).as("m"))
      .withColumn("cluster", col("m.cid"))
      .withColumn("dist", sq(col("m.dist")))
      .drop("m")
  }
}
