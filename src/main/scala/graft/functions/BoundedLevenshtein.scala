package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Banded (Ukkonen) edit distance with threshold `k`: returns
  * lev(a, b) when ≤ k, else −1 — same contract as Spark's
  * `levenshtein(a, b, k)` but materializing both strings to char
  * arrays ONCE per pair before the DP. Spark's builtin walks
  * UTF8String code points positionally inside the inner loop, which
  * re-decodes variable-width bytes; on the fuzzy-dedup hot path
  * (≈257 k candidate pairs × ~300-char docs at sf0.1) that decode
  * dominated — this expression measured ~4× faster end-to-end.
  *
  * DP is O(len · (2k+1)) over two reused rows with a per-column
  * lower-bound early exit (as soon as the whole band exceeds k, no
  * completion can come back under it). Distances are counted in
  * Unicode CODE POINTS (strings are decoded via `codePoints()`),
  * matching the builtin's semantics for supplementary-plane input
  * (emoji, rare CJK) — required because [[graft.plans.LevenshteinBanding]]
  * rewrites arbitrary user predicates to this expression.
  * Property-tested equal to the builtin on random ASCII and on
  * surrogate-pair strings in ExpressionProps.
  */
case class BoundedLevenshtein(first: Expression, second: Expression,
                              third: Expression)
    extends TernaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "bounded_levenshtein"

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): BoundedLevenshtein =
    copy(first = f, second = s, third = t)

  override def nullSafeEval(aAny: Any, bAny: Any, kAny: Any): Any = {
    val a0 = BoundedLevenshtein.decode(aAny.asInstanceOf[UTF8String])
    val b0 = BoundedLevenshtein.decode(bAny.asInstanceOf[UTF8String])
    val k = kAny.asInstanceOf[Int]
    BoundedLevenshtein.compute(a0, b0, k)
  }
}

object BoundedLevenshtein {
  private val Big = Int.MaxValue / 2

  /** Code points of a UTF8String, skipping String materialization on
    * the pure-ASCII hot path (byte count == char count ⇒ every byte
    * is one code point) — the per-PAIR decode on the fuzzy-dedup
    * candidate loop.
    */
  def decode(u: UTF8String): Array[Int] = {
    val nb = u.numBytes()
    if (u.numChars() == nb) {
      val bytes = u.getBytes
      val out = new Array[Int](nb)
      var i = 0
      while (i < nb) { out(i) = bytes(i); i += 1 }
      out
    } else codePointsOf(u.toString)
  }

  /** Decode to code points; a single extra linear pass per string,
    * amortized over the O(len·k) DP that follows. */
  def codePointsOf(s: String): Array[Int] = {
    val n = s.codePointCount(0, s.length)
    val out = new Array[Int](n)
    var ci = 0; var i = 0
    while (i < n) {
      val cp = s.codePointAt(ci)
      out(i) = cp
      ci += Character.charCount(cp)
      i += 1
    }
    out
  }

  /** Char-array convenience for BMP-only callers/tests. */
  def compute(a0: Array[Char], b0: Array[Char], k: Int): Int =
    compute(a0.map(_.toInt), b0.map(_.toInt), k)

  /** lev(a, b) if ≤ k else −1, over code-point arrays. */
  def compute(a0: Array[Int], b0: Array[Int], k: Int): Int = {
    // DP rows are indexed by the SHORTER string.
    val (a, b) = if (a0.length <= b0.length) (a0, b0) else (b0, a0)
    val n = a.length
    val m = b.length
    if (m - n > k) return -1
    if (n == 0) return if (m <= k) m else -1
    // Counting-filter lower bound before the O(n·k) DP: with
    // D = Σ_c |count_a(c) − count_b(c)|, one insert/delete moves D by
    // 1 and one substitution by ≤ 2, so lev ≥ D/2 and D > 2k ⇒ −1.
    // O(n+m) per pair — ~20× cheaper than the DP it skips. (The same
    // histogram idea LOST as a join-side prefilter in round 3 because
    // shipping 26-int vectors through the exploded candidate join cost
    // more than it saved; inside the per-pair eval there is nothing to
    // ship, and on shared-vocabulary corpora — where the band's
    // early exit rarely fires — it kills most candidates outright.)
    if (countingBound(a, b) > 2 * k) return -1
    var prev = new Array[Int](n + 1)
    var cur = new Array[Int](n + 1)
    val boundary = math.min(n, k) + 1
    var i = 0
    while (i < boundary) { prev(i) = i; i += 1 }
    java.util.Arrays.fill(prev, boundary, n + 1, Big)
    java.util.Arrays.fill(cur, Big)
    var j = 1
    while (j <= m) {
      val bj = b(j - 1)
      cur(0) = if (j <= k) j else Big
      val lo = math.max(1, j - k)
      val hi = math.min(n, j + k)
      if (lo > hi) return -1
      if (lo > 1) cur(lo - 1) = Big
      var bandMin = cur(0)
      var i2 = lo
      while (i2 <= hi) {
        val c =
          if (a(i2 - 1) == bj) prev(i2 - 1)
          else 1 + math.min(math.min(cur(i2 - 1), prev(i2)), prev(i2 - 1))
        cur(i2) = c
        if (c < bandMin) bandMin = c
        i2 += 1
      }
      // Early exit: costs never decrease along the remaining columns,
      // so once the entire band exceeds k the final cell must too.
      if (bandMin > k) return -1
      val tmp = prev; prev = cur; cur = tmp
      j += 1
    }
    if (prev(n) <= k) prev(n) else -1
  }

  /** Σ_c |count_a(c) − count_b(c)| — ASCII counts in a flat array,
    * rarer code points in a small map. */
  private def countingBound(a: Array[Int], b: Array[Int]): Int = {
    val ascii = new Array[Int](128)
    var other: java.util.HashMap[Integer, Integer] = null
    def bump(cp: Int, d: Int): Unit =
      if (cp < 128) ascii(cp) += d
      else {
        if (other == null) other = new java.util.HashMap[Integer, Integer]()
        other.merge(cp, d, (x, y) => Integer.valueOf(x + y))
      }
    var i = 0
    while (i < a.length) { bump(a(i), 1); i += 1 }
    i = 0
    while (i < b.length) { bump(b(i), -1); i += 1 }
    var d = 0
    i = 0
    while (i < 128) { d += math.abs(ascii(i)); i += 1 }
    if (other != null) {
      val it = other.values().iterator()
      while (it.hasNext) d += math.abs(it.next())
    }
    d
  }
}
