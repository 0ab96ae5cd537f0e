package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.TestData

/** Tokenizer training — the BPE merge-rule learning pass of an LLM
  * data pipeline (Sennrich et al. '16: iteratively merge the most
  * frequent adjacent symbol pair).
  *
  * Scale shape: the corpus collapses to the DISTINCT-WORD table with
  * frequencies in one shuffle (vocabulary-sized, Zipf-bounded — far
  * smaller than the corpus); each merge round is one explode +
  * aggregate over that table plus a 2-string driver decision
  * (`orderBy.limit(1)` = TakeOrdered, not a sort), and the symbol
  * rewrite is a map-side HOF fold. Rounds are few (30k merges in
  * production, 3 here); every round's state is the rewritten
  * vocabulary table, checkpointed.
  *
  * Oracle-omitted: the greedy left-to-right list-accumulator rewrite
  * is not expressible in DuckDB 1.0 (`list_reduce` accumulators must
  * have the element type); BpeSpec instead pins the merges EXACTLY
  * equal to a direct Scala reference implementation.
  */
object Tokenize {
  type Q = (SparkSession, String) => DataFrame

  /** Greedy left-to-right application of merge (a, b) → a+b over a
    * symbol array column. */
  private def applyMerge(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) =>
        when(size(acc) > 0
             && element_at(acc, -1) === lit(a) && x === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(x))))

  /** Learn `rounds` BPE merges from an (id, text) corpus. Returns
    * (round, sym_a, sym_b, merged, pair_count), one row per merge,
    * ties broken lexicographically.
    */
  def bpeMerges(documents: DataFrame, rounds: Int): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    var vocab = documents
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("n"))
      .withColumn("syms", expr(
        "transform(sequence(1, length(word)), i -> substring(word, i, 1))"))
      .select("syms", "n")
      .localCheckpoint()
    val merges = Seq.newBuilder[(Int, String, String, String, Long)]
    for (r <- 1 to rounds) {
      val top = vocab
        // sequence(0, -1) auto-descends, so single-symbol words must
        // short-circuit to an empty pair list
        .select(col("n"), posexplode(expr(
          "CASE WHEN size(syms) < 2 THEN array() " +
            "ELSE transform(sequence(0, size(syms) - 2), " +
            "i -> struct(element_at(syms, i + 1) AS a, " +
            "element_at(syms, i + 2) AS b)) END")))
        .select(col("col.a"), col("col.b"), col("n"))
        .groupBy("a", "b").agg(sum(col("n")).as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1)
        .as[(String, String, Long)]
        .head()
      merges += ((r, top._1, top._2, top._1 + top._2, top._3))
      vocab = vocab
        .select(applyMerge(col("syms"), top._1, top._2).as("syms"), col("n"))
        .localCheckpoint()
    }
    merges.result()
      .toDF("round", "sym_a", "sym_b", "merged", "pair_count")
  }

  val defs: Map[String, Q] = Map(
    "pipeline_bpe_merges" -> ((s, d) =>
      bpeMerges(TestData.documents(s, d), rounds = 3).orderBy("round"))
  )

  val oracles: Map[String, String] = Map.empty
}
