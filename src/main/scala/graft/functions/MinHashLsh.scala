package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
    // Signature: per permutation k, min over shingles of a
    // deterministic rehash of the shingle's 28-bit md5-prefix fold.
    // 28-bit base hash keeps a*h+b < 2^59 — no ANSI overflow — and
    // the md5 fold (unlike xxhash64) exists in DuckDB, so the oracle
    // mirrors the signature bit-for-bit.
    val hashed = docs.withColumn("hs",
      transform(col("shingles"),
        s => conv(substring(md5(s), 1, 7), 16, 10).cast("long")))
    // h_k(s) = (a_k·h + b_k) mod p — the mod is what makes each
    // permutation independent (without it a·h+b is monotone in h and
    // every permutation would pick the same argmin shingle).
    val sigCols = permConstants(numPerm).zipWithIndex.map { case ((a, b), k) =>
      array_min(transform(col("hs"),
        h => pmod(h * lit(a) + lit(b), lit(Prime)))).as(s"mh$k")
    }
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
