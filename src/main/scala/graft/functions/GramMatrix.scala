package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Partial buffer: running Σx (length d), upper-triangular Σxxᵀ
  * (length d·(d+1)/2), and row count. */
case class GramBuf(sums: Array[Double], gram: Array[Double], var n: Long)

/** One-pass second-moment aggregation for PCA/whitening: accumulates
  * Σx and the upper triangle of Σxxᵀ in a single scan with map-side
  * combine, so the shuffle carries one ~(d²/2)-double buffer per task
  * (d=64 → 17 KB) instead of the corpus. The driver finishes
  * cov = Σxxᵀ/n − μμᵀ and runs the (d×d, corpus-size-independent)
  * eigen step locally — the same bounded-driver-work split as the
  * PQ codebook fit (TrainedQuantize.scala).
  *
  * Output: flattened (n :: Σx :: upper-tri Σxxᵀ) as one row.
  */
class GramMatrix(dim: Int)
    extends Aggregator[Seq[Double], GramBuf, Seq[Double]] {

  private val triLen = dim * (dim + 1) / 2

  override def zero: GramBuf =
    GramBuf(Array.fill(dim)(0.0), Array.fill(triLen)(0.0), 0L)

  override def reduce(b: GramBuf, a: Seq[Double]): GramBuf = {
    val x = a.toArray
    var i = 0
    var t = 0
    while (i < dim) {
      b.sums(i) += x(i)
      var j = i
      while (j < dim) { b.gram(t) += x(i) * x(j); t += 1; j += 1 }
      i += 1
    }
    b.n += 1
    b
  }

  override def merge(x: GramBuf, y: GramBuf): GramBuf = {
    var i = 0
    while (i < dim) { x.sums(i) += y.sums(i); i += 1 }
    i = 0
    while (i < triLen) { x.gram(i) += y.gram(i); i += 1 }
    x.n += y.n
    x
  }

  override def finish(b: GramBuf): Seq[Double] =
    (b.n.toDouble +: (b.sums ++ b.gram)).toSeq

  override def bufferEncoder: Encoder[GramBuf] = Encoders.product[GramBuf]
  override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder()
}

object GramMatrix {
  /** Expand the `finish` row into (n, mean, full covariance). */
  def covarianceOf(flat: Seq[Double], dim: Int)
      : (Long, Array[Double], Array[Array[Double]]) = {
    val n = flat.head.toLong
    val sums = flat.slice(1, 1 + dim).toArray
    val tri = flat.drop(1 + dim).toArray
    val mu = sums.map(_ / n)
    val cov = Array.ofDim[Double](dim, dim)
    var i = 0
    var t = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val c = tri(t) / n - mu(i) * mu(j)
        cov(i)(j) = c
        cov(j)(i) = c
        t += 1
        j += 1
      }
      i += 1
    }
    (n, mu, cov)
  }

  /** Deterministic power iteration for the dominant eigenpair:
    * fixed all-ones start, fixed iteration count, driver-local on the
    * d×d matrix. Returns (eigenvalue, unit eigenvector with a
    * sign-canonical first nonzero component > 0).
    */
  def powerIteration(cov: Array[Array[Double]], iters: Int)
      : (Double, Array[Double]) = {
    val d = cov.length
    var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    var lambda = 0.0
    var k = 0
    while (k < iters) {
      val w = Array.ofDim[Double](d)
      var i = 0
      while (i < d) {
        var s = 0.0
        var j = 0
        while (j < d) { s += cov(i)(j) * v(j); j += 1 }
        w(i) = s
        i += 1
      }
      var norm = 0.0
      var t = 0
      while (t < d) { norm += w(t) * w(t); t += 1 }
      norm = math.sqrt(norm)
      lambda = norm
      t = 0
      while (t < d) { w(t) /= norm; t += 1 }
      v = w
      k += 1
    }
    val lead = v.indexWhere(math.abs(_) > 1e-12)
    if (lead >= 0 && v(lead) < 0) {
      var t = 0
      while (t < v.length) { v(t) = -v(t); t += 1 }
    }
    (lambda, v)
  }

  /** Top-k eigenpairs via power iteration + Hotelling DEFLATION:
    * after each component converges, subtract λ·vvᵀ from the working
    * matrix and iterate again — for a symmetric matrix the deflated
    * dominant eigenpair is the original's next one, so successive
    * components come out orthogonal in descending eigenvalue order.
    * Driver cost d²·iters·k (corpus-size-independent); the corpus is
    * still read exactly once by the Gram aggregation upstream.
    */
  def topComponents(cov: Array[Array[Double]], k: Int, iters: Int)
      : Seq[(Double, Array[Double])] = {
    val d = cov.length
    val work = Array.tabulate(d, d)((i, j) => cov(i)(j))
    (0 until k).map { _ =>
      val (lambda, v) = powerIteration(work, iters)
      var i = 0
      while (i < d) {
        var j = 0
        while (j < d) { work(i)(j) -= lambda * v(i) * v(j); j += 1 }
        i += 1
      }
      (lambda, v)
    }
  }
}
