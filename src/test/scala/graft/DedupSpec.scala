package graft

import org.apache.spark.sql.functions._
import graft.operators.{TextAnalysis, TextOps}

/** Dedup-operator unit tests that the DuckDB oracle can't express
  * directly: targeted recall fixtures for the blocked fuzzy join and
  * the shared Jaccard pair stage.
  */
class DedupSpec extends SparkSpec {

  private def docsDf(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "lang", "text")
      .withColumn("n_chars", length(col("text")))
  }

  test("fuzzyPairs catches insert/delete edits that change the length bucket") {
    val base = "the quick brown fox jumps over the lazy dog four times "
    val b63 = (base + "a" * 20).substring(0, 63) // 63 chars → bucket 1
    val b64 = b63.substring(0, 30) + "X" + b63.substring(30) // 64 → bucket 2
    assert(b63.length == 63 && b64.length == 64)
    val far = "completely unrelated content with nothing in common here at all"
    val out = TextAnalysis.fuzzyPairs(docsDf(Seq(
        (1L, "en", b63),   // cross-bucket insert-edit pair (1,2): lev = 1
        (2L, "en", b64),
        (3L, "en", b63.replace('q', 'z')), // same-bucket substitution vs 1
        (10L, "en", far))))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(out.contains((1L, 2L, 1)),
      s"insert-edit pair spanning buckets must be found, got $out")
    assert(out.contains((1L, 3L, 1)), s"same-bucket pair must be found, got $out")
    assert(out.contains((2L, 3L, 2)), s"adjacent-bucket pair must be found, got $out")
    assert(!out.exists(p => p._1 == 10L || p._2 == 10L), s"far doc must not pair: $out")
  }

  test("fuzzyPairs emits each pair exactly once") {
    val t = "a" * 40 // same bucket for all three docs
    val out = TextAnalysis.fuzzyPairs(docsDf(Seq(
        (1L, "en", t), (2L, "en", t), (3L, "en", t))))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == out.distinct.toSeq, s"duplicate pairs: ${out.toSeq}")
    assert(out.toSet == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("jaccardPairs finds identical-token-set same-lang pairs, cross-lang never") {
    val out = TextOps.jaccardPairs(docsDf(Seq(
        (1L, "en", "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (2L, "en", "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (3L, "de", "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (4L, "en", "one two three four five six seven eight nine ten"))))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSet == Set((1L, 2L)), s"got ${out.toSet}")
  }
}
