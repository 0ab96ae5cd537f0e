package graft.operators

import graft.CkptOps

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
  * Oracle-checked (promoted round 7): the greedy left-to-right
  * rewrite IS expressible in DuckDB 1.0 once the accumulator is
  * encoded as a chr(1)-joined STRING — `list_reduce` requires the
  * accumulator to have the element type, and VARCHAR is the element
  * type, so the fold seeds with the first symbol and either replaces
  * the delimited last token (merge hit: x = b and the accumulator
  * ends with sep‖a) or appends sep‖x. `string_split` restores the
  * symbol list for the next round's pair count. Exactly the
  * non-overlapping greedy semantics of [[applyMerge]] ("aaa" + (a,a)
  * → [aa, a], because the merged token no longer equals `a`).
  * BpeSpec additionally pins the merges equal to a direct Scala
  * reference implementation.
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
      .ckpt()
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
        .ckpt()
    }
    merges.result()
      .toDF("round", "sym_a", "sym_b", "merged", "pair_count")
  }

  val defs: Map[String, Q] = Map(
    "pipeline_bpe_merges" -> ((s, d) =>
      bpeMerges(TestData.documents(s, d), rounds = 3).orderBy("round")),

    // TOKENIZER APPLICATION (round 7) — the encode pass that pairs
    // with the learning pass above: the 3 learned merges are applied
    // greedily (same [[applyMerge]] semantics) to every word, and the
    // corpus reports its post-BPE token count per document. Scale
    // shape: merges apply to the DISTINCT-WORD table (vocabulary-
    // sized, Zipf-bounded), which then broadcast-joins back to the
    // (doc, word) stream — the corpus itself is never folded. At
    // production merge counts (~30k) the per-word fold becomes a
    // trie-compiled custom expression; the vocab-level apply +
    // broadcast join shape is unchanged. Learned merges are a
    // 3-row driver collect (bounded).
    "pipeline_bpe_apply" -> ((s, d) => {
      val docs = TestData.documents(s, d)
      val mseq = bpeMerges(docs, rounds = 3).orderBy("round").collect()
        .map(r => (r.getString(1), r.getString(2)))
      val dw = docs
        .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
        .filter(length(col("word")) > 0)
      val vocabTok = dw.select("word").distinct()
        .withColumn("syms", expr(
          "transform(sequence(1, length(word)), i -> substring(word, i, 1))"))
      val enc = mseq.foldLeft(vocabTok) { case (df, (a, b)) =>
        df.withColumn("syms", applyMerge(col("syms"), a, b))
      }.select(col("word"), size(col("syms")).as("n_sym"))
      dw.join(broadcast(enc), "word")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_words"),
             sum(col("n_sym").cast("long")).as("n_tokens"))
        .orderBy("doc_id")
    }),

    // TOKENIZER FERTILITY (round 14): tokens-per-word and chars-per-
    // token PER LANGUAGE under the learned BPE — the tokenizer-
    // equity readout a multilingual pipeline publishes (a tokenizer
    // trained lopsidedly fragments some languages into 2–3× the
    // tokens, which directly inflates their training/serving cost —
    // the "tokenizer tax"). Same vocab-level apply + broadcast-join
    // shape as pipeline_bpe_apply, folded to the LANG grain with
    // exact integer token/char sums; two guarded r4 ratios on the
    // |langs|-row readout. Property: Σ per-lang words/tokens equals
    // the corpus totals of pipeline_bpe_apply (BpeSpec).
    "pipeline_tokenizer_fertility" -> ((s, d) => {
      val docs = TestData.documents(s, d)
      val mseq = bpeMerges(docs, rounds = 3).orderBy("round").collect()
        .map(r => (r.getString(1), r.getString(2)))
      val dw = docs
        .select(col("lang"), explode(split(col("text"), " ")).as("word"))
        .filter(length(col("word")) > 0)
      val vocabTok = dw.select("word").distinct()
        .withColumn("syms", expr(
          "transform(sequence(1, length(word)), i -> substring(word, i, 1))"))
      val enc = mseq.foldLeft(vocabTok) { case (df, (a, b)) =>
        df.withColumn("syms", applyMerge(col("syms"), a, b))
      }.select(col("word"), size(col("syms")).as("n_sym"),
        length(col("word")).as("n_ch"))
      dw.join(broadcast(enc), "word")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_words"),
          sum(col("n_sym").cast("long")).as("n_tokens"),
          sum(col("n_ch").cast("long")).as("n_chars"))
        .withColumn("fertility", when(col("n_words") > 0,
          TestData.r4(col("n_tokens").cast("double")
            / col("n_words").cast("double"))))
        .withColumn("chars_per_token", when(col("n_tokens") > 0,
          TestData.r4(col("n_chars").cast("double")
            / col("n_tokens").cast("double"))))
        .select("lang", "n_words", "n_tokens", "n_chars",
          "fertility", "chars_per_token")
        .orderBy("lang")
    })
  )

  /** One merge round in DuckDB: pair-count the current vocabulary,
    * take the (cnt DESC, a, b) top pair, and apply it with the
    * string-accumulator greedy fold (see the class scaladoc).
    */
  private def roundCtes(prev: String, t: String, next: String): String =
    s"""p$t AS (
       |  SELECT syms[i] AS a, syms[i+1] AS b, n
       |  FROM $prev, LATERAL (SELECT unnest(range(1, len(syms))) AS i)
       |  WHERE len(syms) >= 2),
       |t$t AS (
       |  SELECT a AS ma, b AS mb, sum(n)::BIGINT AS cnt FROM p$t
       |  GROUP BY 1, 2 ORDER BY cnt DESC, ma, mb LIMIT 1),
       |$next AS (
       |  SELECT string_split(list_reduce(syms, (acc, x) -> CASE
       |      WHEN x = mb AND (acc = ma OR ends_with(acc, chr(1) || ma))
       |      THEN substring(acc, 1, length(acc) - length(ma)) || ma || mb
       |      ELSE acc || chr(1) || x END), chr(1)) AS syms, n
       |  FROM $prev CROSS JOIN t$t)""".stripMargin

  /** Apply merge round t's (ma, mb) to a per-word symbol list — the
    * same string-accumulator greedy fold as [[roundCtes]], carrying
    * the word key instead of the frequency.
    */
  private def applyCte(prev: String, t: String, next: String): String =
    s"""$next AS (
       |  SELECT word, string_split(list_reduce(syms, (acc, x) -> CASE
       |      WHEN x = mb AND (acc = ma OR ends_with(acc, chr(1) || ma))
       |      THEN substring(acc, 1, length(acc) - length(ma)) || ma || mb
       |      ELSE acc || chr(1) || x END), chr(1)) AS syms
       |  FROM $prev CROSS JOIN t$t)""".stripMargin

  val oracles: Map[String, String] = Map(
    // Learn t1..t3 with the SAME CTEs as pipeline_bpe_merges, apply
    // them per DISTINCT word, then join back to the (doc, word)
    // stream — mirroring the Spark vocab-level apply exactly.
    "pipeline_bpe_apply" ->
      s"""WITH w AS (
        |  SELECT word, count(*)::BIGINT AS n
        |  FROM (SELECT unnest(string_split(text, ' ')) AS word
        |        FROM documents)
        |  WHERE length(word) > 0 GROUP BY 1),
        |v0 AS (
        |  SELECT list_transform(range(1, length(word) + 1),
        |           i -> substring(word, i, 1)) AS syms, n
        |  FROM w),
        |${roundCtes("v0", "1", "v1")},
        |${roundCtes("v1", "2", "v2")},
        |${roundCtes("v2", "3", "v3")},
        |as0 AS (
        |  SELECT word, list_transform(range(1, length(word) + 1),
        |           i -> substring(word, i, 1)) AS syms
        |  FROM w),
        |${applyCte("as0", "1", "as1")},
        |${applyCte("as1", "2", "as2")},
        |${applyCte("as2", "3", "as3")},
        |dw AS (
        |  SELECT doc_id, word
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
        |        FROM documents)
        |  WHERE length(word) > 0)
        |SELECT doc_id, count(*)::BIGINT AS n_words,
        |  sum(len(syms))::BIGINT AS n_tokens
        |FROM dw JOIN as3 USING (word)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // The apply oracle folded to LANG grain with char sums and the
    // two guarded r4 ratios.
    "pipeline_tokenizer_fertility" ->
      s"""WITH w AS (
        |  SELECT word, count(*)::BIGINT AS n
        |  FROM (SELECT unnest(string_split(text, ' ')) AS word
        |        FROM documents)
        |  WHERE length(word) > 0 GROUP BY 1),
        |v0 AS (
        |  SELECT list_transform(range(1, length(word) + 1),
        |           i -> substring(word, i, 1)) AS syms, n
        |  FROM w),
        |${roundCtes("v0", "1", "v1")},
        |${roundCtes("v1", "2", "v2")},
        |${roundCtes("v2", "3", "v3")},
        |as0 AS (
        |  SELECT word, list_transform(range(1, length(word) + 1),
        |           i -> substring(word, i, 1)) AS syms
        |  FROM w),
        |${applyCte("as0", "1", "as1")},
        |${applyCte("as1", "2", "as2")},
        |${applyCte("as2", "3", "as3")},
        |dw AS (
        |  SELECT lang, word
        |  FROM (SELECT lang, unnest(string_split(text, ' ')) AS word
        |        FROM documents)
        |  WHERE length(word) > 0),
        |agg AS (
        |  SELECT lang, count(*)::BIGINT AS n_words,
        |    sum(len(syms))::BIGINT AS n_tokens,
        |    sum(length(word))::BIGINT AS n_chars
        |  FROM dw JOIN as3 USING (word)
        |  GROUP BY lang)
        |SELECT lang, n_words, n_tokens, n_chars,
        |  CASE WHEN n_words > 0 THEN
        |    floor(n_tokens::DOUBLE / n_words::DOUBLE * 10000 + 0.5) / 10000
        |  END AS fertility,
        |  CASE WHEN n_tokens > 0 THEN
        |    floor(n_chars::DOUBLE / n_tokens::DOUBLE * 10000 + 0.5) / 10000
        |  END AS chars_per_token
        |FROM agg ORDER BY lang""".stripMargin,
    "pipeline_bpe_merges" ->
      s"""WITH w AS (
        |  SELECT word, count(*)::BIGINT AS n
        |  FROM (SELECT unnest(string_split(text, ' ')) AS word
        |        FROM documents)
        |  WHERE length(word) > 0 GROUP BY 1),
        |v0 AS (
        |  SELECT list_transform(range(1, length(word) + 1),
        |           i -> substring(word, i, 1)) AS syms, n
        |  FROM w),
        |${roundCtes("v0", "1", "v1")},
        |${roundCtes("v1", "2", "v2")},
        |${roundCtes("v2", "3", "v3")}
        |SELECT 1 AS round, ma AS sym_a, mb AS sym_b, ma || mb AS merged,
        |  cnt AS pair_count FROM t1
        |UNION ALL
        |SELECT 2, ma, mb, ma || mb, cnt FROM t2
        |UNION ALL
        |SELECT 3, ma, mb, ma || mb, cnt FROM t3
        |ORDER BY round""".stripMargin
  )
}
