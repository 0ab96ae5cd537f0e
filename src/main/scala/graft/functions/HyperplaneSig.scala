package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Signed-random-projection (SimHash-for-cosine) signature of an
  * `ARRAY<DOUBLE>` vector: bit i of the result is set iff
  * `v · planes(i) ≥ 0`. Two vectors agree on a bit with probability
  * `1 − θ/π` (θ = their angle), which is what makes banded bucket
  * joins over these signatures an LSH for cosine similarity.
  *
  * The plane matrix is a constructor parameter (driver-side constant,
  * generated from a fixed seed — see [[HyperplaneSig.planes]]), not a
  * child expression: it is identical for every row, so shipping it
  * inside the closure beats re-evaluating a nested-array literal.
  * Runs once per document — CodegenFallback with a tight two-level
  * loop (O(H·dim) multiply-adds, zero allocation beyond the result).
  */
case class HyperplaneSig(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression with CodegenFallback {

  require(planes.nonEmpty && planes.length <= 64,
    s"signature must fit one long, got ${planes.length} planes")

  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_sig"

  override protected def withNewChildInternal(c: Expression): HyperplaneSig =
    copy(child = c)

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    var sig = 0L
    var p = 0
    while (p < planes.length) {
      val pl = planes(p)
      val n = math.min(pl.length, arr.numElements())
      var s = 0.0
      var i = 0
      while (i < n) { s += pl(i) * arr.getDouble(i); i += 1 }
      if (s >= 0.0) sig |= (1L << p)
      p += 1
    }
    sig
  }
}

object HyperplaneSig {
  /** Deterministic Gaussian plane matrix: `h` hyperplanes over `dim`
    * dimensions from a fixed seed. Generated once on the driver
    * (~h·dim doubles — 16 KB for h=32, dim=64) and closed over by the
    * expression; every executor sees the identical matrix, so the
    * signature — and therefore the whole LSH bucketing — is
    * reproducible across runs and cluster sizes.
    */
  def planes(h: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(h, dim)(rnd.nextGaussian())
  }
}
