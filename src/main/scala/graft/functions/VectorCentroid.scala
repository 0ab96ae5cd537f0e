package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Mutable partial-aggregation buffer: running element-wise sums and
  * row count. A case class so the Product encoder serializes it for
  * the shuffle between partial and final aggregation.
  */
case class CentroidBuf(sums: Array[Double], var n: Long)

/** Element-wise mean of `ARRAY<DOUBLE>` vectors — the §2.I centroid
  * UDAF (SURVEY.md), the aggregation the reference's S4 "build the
  * vectordb" stage needs for IVF coarse centroids (reference
  * README.md:2).
  *
  * Implemented as a typed `Aggregator` (public API) with map-side
  * partial aggregation: each task reduces its rows into one
  * dim-length buffer, so the shuffle carries one buffer per
  * (task × group), not one row per vector — the property that makes
  * this usable on 100 TB of embeddings.
  */
class VectorCentroid(dim: Int)
    extends Aggregator[Seq[Double], CentroidBuf, Seq[Double]] {

  override def zero: CentroidBuf = CentroidBuf(Array.fill(dim)(0.0), 0L)

  override def reduce(b: CentroidBuf, a: Seq[Double]): CentroidBuf = {
    var i = 0
    while (i < dim) { b.sums(i) += a(i); i += 1 }
    b.n += 1
    b
  }

  override def merge(x: CentroidBuf, y: CentroidBuf): CentroidBuf = {
    var i = 0
    while (i < dim) { x.sums(i) += y.sums(i); i += 1 }
    x.n += y.n
    x
  }

  override def finish(b: CentroidBuf): Seq[Double] =
    if (b.n == 0L) Seq.fill(dim)(0.0)
    else b.sums.iterator.map(_ / b.n).toSeq

  override def bufferEncoder: Encoder[CentroidBuf] = Encoders.product[CentroidBuf]
  override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder()
}
