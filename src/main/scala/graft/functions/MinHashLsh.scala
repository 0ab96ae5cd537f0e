package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Hand-rolled MinHash + banded LSH near-duplicate detection:
  * shingle → minhash signature → band → bucket-join → exact verify.
  *
  * Why not `org.apache.spark.ml.feature.MinHashLSH`: its
  * `approxSimilarityJoin` uses one hash per band, so candidate
  * probability per band equals the pair's Jaccard itself — on a
  * corpus with high baseline similarity (this fixture: 31-token
  * vocabulary, random-pair token-Jaccard ≈ 0.5) nearly EVERY pair
  * collides in some band and the "approximate" join degenerates to
  * O(n²) (measured: 371 s at sf0.1 vs <5 s for this implementation).
  *
  * Banded MinHash with r hashes per band gives per-band collision
  * j^r: with the default numPerm=18, r=3 (→ b=6 bands) a true
  * near-dup at j=0.9 is recalled with p = 1-(1-0.9³)⁶ ≈ 0.9996 while
  * a random j=0.15 pair collides with p ≈ 2% — the candidate set
  * stays ~linear. At 100 TB this is the
  * only viable shape: the shuffle is on (band, bucket-key) and every
  * bucket is small, so no task ever sees the full corpus.
  *
  * All hashing is deterministic (md5-prefix fold + fixed odd
  * multipliers), so results are stable across runs and partitionings
  * AND exactly reproducible in DuckDB ('0x'||substring(md5(s),1,7)
  * ::BIGINT ≡ Spark conv(substring(md5(s),1,7),16,10)) — which is
  * what lets dedup_minhash_lsh be hash-verified against the oracle
  * instead of only property-tested.
  */
/** Full MinHash signature in ONE pass over the shingle array:
  * md5-prefix fold (first 7 hex nibbles = 28 bits, identical to
  * `conv(substring(md5(s),1,7),16,10)`) and ALL `numPerm` permutation
  * minima in a tight loop. The HOF form (`transform` to base hashes,
  * then numPerm × `array_min(transform(...))`) dispatches
  * numPerm·|shingles| interpreted lambdas per document — measured
  * 2.65 s at sf0.1 vs 1.9 s for the old single-rehash form; this
  * expression removes the lambda dispatch AND the per-shingle hex
  * round-trip. Runs once per document — CodegenFallback with a tight
  * eval (the repo's rule for O(docs) loops). NULL/empty shingles →
  * NULL (matching array_min-over-empty).
  */
case class MinHashSig(child: Expression, numPerm: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)

  @transient private lazy val perms = MinHashLsh.permConstants(numPerm).toArray
  @transient private lazy val md5 =
    java.security.MessageDigest.getInstance("MD5")

  override def nullSafeEval(shAny: Any): Any = {
    val sh = shAny.asInstanceOf[ArrayData]
    val n = sh.numElements()
    if (n == 0) return null
    val mins = Array.fill(numPerm)(Long.MaxValue)
    var i = 0
    while (i < n) {
      md5.reset()
      val dg = md5.digest(sh.getUTF8String(i).getBytes)
      // first 7 hex nibbles, big-endian — bit-identical to
      // conv(substring(md5(s),1,7),16,10)
      val h = ((dg(0) & 0xffL) << 20) | ((dg(1) & 0xffL) << 12) |
        ((dg(2) & 0xffL) << 4) | ((dg(3) & 0xf0L) >> 4)
      var k = 0
      while (k < numPerm) {
        val p = perms(k)
        val v = (h * p._1 + p._2) % MinHashLsh.Prime
        if (v < mins(k)) mins(k) = v
        k += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(x => x: Any))
  }
}

object MinHashLsh {

  /** 2^31 - 1 (prime) — the modulus that makes each permutation an
    * independent shuffle of the base-hash space.
    */
  val Prime = 2147483647L

  /** Per-permutation (a, b) for h_k(s) = (a_k·h + b_k) mod Prime.
    * Deterministic and shared with the DuckDB oracle generator in
    * TextOps, so both engines compute identical signatures.
    */
  def permConstants(numPerm: Int): Seq[(Long, Long)] =
    (0 until numPerm).map { k =>
      (((2 * k + 1) * 2654435761L % Prime) | 1L, 40503L * (k + 1))
    }

  /** Distinct word-2-shingles from a token-array column. Shingling
    * (vs raw tokens) makes near-dup detection order-sensitive and
    * breaks tiny-vocabulary degeneracy.
    */
  def shinglesFromTokens(toks: Column): Column =
    array_distinct(zip_with(
      slice(toks, lit(1), size(toks) - 1),
      slice(toks, lit(2), size(toks) - 1),
      (a, b) => concat(a, lit(" "), b)))

  /** Exact Jaccard between two shingle-set columns. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    inter / (size(a) + size(b) - inter)
  }

  /** Near-dup pairs with exact-verified Jaccard > `threshold`,
    * LSH-candidates only. Input must have columns (id, blockKey,
    * shingles). Output: (id_a, id_b, jac).
    *
    * @param numPerm number of minhash permutations (= r * bands)
    * @param r       hashes per band
    */
  def nearDupPairs(docs: DataFrame, threshold: Double,
                   numPerm: Int = 18, r: Int = 3): DataFrame = {
    val bands = numPerm / r
    // Signature: per permutation k, min over shingles of
    // h_k(s) = (a_k·h + b_k) mod p over the 28-bit md5-prefix fold
    // (the mod is what makes each permutation independent; the md5
    // fold, unlike xxhash64, exists in DuckDB so the oracle mirrors
    // the signature bit-for-bit; 28-bit base keeps a·h+b < 2^59 — no
    // ANSI overflow). All numPerm minima come from the ONE-pass
    // [[MinHashSig]] expression — the HOF form paid ~1 µs of lambda
    // dispatch per (perm × shingle).
    import org.apache.spark.sql.graft.Bridge
    val hashed = docs.withColumn("mhs",
      Bridge.column(MinHashSig(Bridge.expression(col("shingles")), numPerm)))
    val sigCols = (0 until numPerm).map(k =>
      element_at(col("mhs"), k + 1).as(s"mh$k"))
    val sigs = hashed.select(col("id") +: col("blockKey") +: col("shingles") +: sigCols: _*)
    // Band keys: the band's r signature values string-joined with the
    // block key. Exact tuple equality (not a rehash) — no collision
    // can inject a candidate the oracle's identical equi-join misses.
    val bandKeys = (0 until bands).map { j =>
      val cols = (0 until r).map(i => col(s"mh${j * r + i}"))
      struct(lit(j).as("band"),
             concat_ws("|", col("blockKey") +: cols: _*).as("bkey"))
    }
    // Buckets carry only (id, band, bkey): the band-join shuffle
    // moves fixed-width keys, not shingle arrays — at scale the
    // arrays are re-attached (below) only for surviving candidates.
    val buckets = sigs
      .select(col("id"), explode(array(bandKeys: _*)).as("bk"))
      .select(col("id"), col("bk.band"), col("bk.bkey"))
    // Bucket join: candidates collide in >=1 band; distinct-ify.
    val candIds = buckets.as("x").join(buckets.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey")
          && col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    val sh = docs.select(col("id"), col("shingles"))
    candIds
      .join(sh.select(col("id").as("id_a"), col("shingles").as("sa")), "id_a")
      .join(sh.select(col("id").as("id_b"), col("shingles").as("sb")), "id_b")
      .withColumn("jac", jaccard(col("sa"), col("sb")))
      .filter(col("jac") > threshold)
      .select(col("id_a"), col("id_b"), col("jac"))
  }
}
