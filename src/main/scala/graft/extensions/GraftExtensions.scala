package graft.extensions

import graft.functions.{BitmapIntersectCount, BitsetFromIndices, BoundedLevenshtein, CharNgrams, CosineSimilarity, MinHashSig, SortedIntersectCount, WordShingles}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension registering the engine's custom Catalyst
  * expressions as SQL functions, so `spark.sql` users get the same
  * codegen'd kernels as the DataFrame API:
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.extensions.GraftExtensions ...
  * SELECT cosine_similarity(a.embedding, b.embedding) FROM ...
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(clazz: Class[_], name: String, usage: String) =
    new ExpressionInfo(clazz.getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_similarity"),
      info(classOf[CosineSimilarity], "cosine_similarity",
        "cosine_similarity(a, b) - cosine of two ARRAY<DOUBLE> vectors"),
      (children: Seq[Expression]) =>
        CosineSimilarity(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("sorted_intersect_count"),
      info(classOf[SortedIntersectCount], "sorted_intersect_count",
        "sorted_intersect_count(a, b) - |A∩B| of two sorted ARRAY<BIGINT>"),
      (children: Seq[Expression]) =>
        SortedIntersectCount(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("bounded_levenshtein"),
      info(classOf[BoundedLevenshtein], "bounded_levenshtein",
        "bounded_levenshtein(a, b, k) - lev(a, b) if <= k else -1 (banded DP)"),
      (children: Seq[Expression]) =>
        BoundedLevenshtein(children(0), children(1), children(2))))
    ext.injectFunction((
      FunctionIdentifier("char_ngrams"),
      info(classOf[CharNgrams], "char_ngrams",
        "char_ngrams(s, n) - distinct character n-grams in first-occurrence order"),
      (children: Seq[Expression]) =>
        CharNgrams(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("word_shingles"),
      info(classOf[WordShingles], "word_shingles",
        "word_shingles(s, k) - distinct k-token shingles in first-occurrence order"),
      (children: Seq[Expression]) =>
        WordShingles(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("bitset_from_indices"),
      info(classOf[BitsetFromIndices], "bitset_from_indices",
        "bitset_from_indices(idxs, nwords) - ARRAY<BIGINT> bitset with the given bits"),
      (children: Seq[Expression]) =>
        BitsetFromIndices(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("bitmap_intersect_count"),
      info(classOf[BitmapIntersectCount], "bitmap_intersect_count",
        "bitmap_intersect_count(a, b) - popcount(A AND B) over ARRAY<BIGINT> bitsets"),
      (children: Seq[Expression]) =>
        BitmapIntersectCount(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("minhash_sig"),
      info(classOf[MinHashSig], "minhash_sig",
        "minhash_sig(shingles, numPerm) - ARRAY<BIGINT> MinHash signature " +
          "(md5-prefix base hash, one pass over the shingle set)"),
      (children: Seq[Expression]) => {
        require(children.length == 2 && children(1).foldable,
          "minhash_sig(shingles, numPerm) needs a literal numPerm")
        MinHashSig(children(0),
          children(1).eval().asInstanceOf[Number].intValue)
      }))
    // Rewrite the public-API HOF cosine pattern into the fused
    // codegen'd expression, and thresholded levenshtein predicates
    // into the banded bounded_levenshtein form.
    ext.injectOptimizerRule(_ => graft.plans.CosineFusion)
    ext.injectOptimizerRule(_ => graft.plans.LevenshteinBanding)
    // Custom whole-operator tier: FunnelMatch logical node → planner
    // strategy → one-pass per-key state machine (plans/FunnelMatch).
    ext.injectPlannerStrategy(_ => graft.plans.FunnelStrategy)
  }
}
