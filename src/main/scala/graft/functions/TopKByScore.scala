package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Bounded top-k buffer: at most k (id, score) entries, kept sorted
  * by (score DESC, id ASC). A case class so the Product encoder
  * serializes it between partial and final aggregation.
  */
case class TopKBuf(ids: Seq[Long], scores: Seq[Double])

/** Top-k (id, score) pairs per group as a TWO-PHASE AGGREGATE — the
  * scale shape for "k nearest per query" that the window-function
  * form can't give: `row_number() OVER (PARTITION BY qid ORDER BY
  * score)` must shuffle and SORT every candidate row per group,
  * while this Aggregator reduces each task's candidates into a
  * k-entry buffer map-side, so the shuffle carries one k-row buffer
  * per (task × group) instead of the full candidate set — at 100 TB
  * that is the difference between shuffling n·|Q| scored pairs and
  * shuffling |tasks|·|Q|·k.
  *
  * Determinism: ties order by (score DESC, id ASC) — the same
  * protocol as every declared top-k — so the output is identical to
  * the window form and shares its oracle.
  */
class TopKByScore(k: Int)
    extends Aggregator[(Long, Double), TopKBuf, Seq[(Long, Double)]] {

  require(k > 0, s"k must be positive, got $k")

  override def zero: TopKBuf = TopKBuf(Vector.empty, Vector.empty)

  /** score DESC, id ASC — strict "a ranks before b". */
  private def before(ia: Long, sa: Double, ib: Long, sb: Double): Boolean =
    sa > sb || (sa == sb && ia < ib)

  private def insert(b: TopKBuf, id: Long, score: Double): TopKBuf = {
    val n = b.ids.length
    if (n == k && !before(id, score, b.ids(n - 1), b.scores(n - 1))) return b
    var pos = 0
    while (pos < n && before(b.ids(pos), b.scores(pos), id, score)) pos += 1
    val ids = (b.ids.take(pos) :+ id) ++ b.ids.drop(pos)
    val scores = (b.scores.take(pos) :+ score) ++ b.scores.drop(pos)
    TopKBuf(ids.take(k), scores.take(k))
  }

  override def reduce(b: TopKBuf, a: (Long, Double)): TopKBuf =
    insert(b, a._1, a._2)

  override def merge(x: TopKBuf, y: TopKBuf): TopKBuf = {
    var acc = x
    var i = 0
    while (i < y.ids.length) { acc = insert(acc, y.ids(i), y.scores(i)); i += 1 }
    acc
  }

  override def finish(b: TopKBuf): Seq[(Long, Double)] =
    b.ids.zip(b.scores)

  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[Seq[(Long, Double)]] = ExpressionEncoder()
}
