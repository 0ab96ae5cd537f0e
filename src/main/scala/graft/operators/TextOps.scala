package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.TestData
import graft.TestData.r4

/** §2.J text / LLM-data-pipeline operators (SURVEY.md): tokenize
  * stats, word counts, bigrams, exact + Jaccard dedup, MinHash-LSH,
  * deterministic featurization.
  *
  * Scale notes: bigrams are built with a single array-transform pass
  * (no positional self-join — one scan, no shuffle before the count).
  * Exact dedup is one hash-groupBy (the only shape that works at
  * 100 TB). Token-set Jaccard is the exact O(pairs) baseline blocked
  * by language; `dedup_minhash_lsh` is the declared sub-quadratic
  * path: MinHash signatures + banded bucket join so only same-bucket
  * candidates are compared.
  */
object TextOps {
  type Q = (SparkSession, String) => DataFrame

  /** Canonical content hash for exact dedup (shared with the
    * index-build pipeline so both dedup identically).
    */
  def contentHash: org.apache.spark.sql.Column = md5(lower(trim(col("text"))))

  /** Exact token-set Jaccard-scored same-lang pairs (id_a < id_b) —
    * shared by `dedup_jaccard_pairs` and the component-formation edge
    * stage. Plan shape: a SHUFFLE join on the block key (lang), never
    * a broadcast of the corpus — both sides hash-partition by lang so
    * no executor ever holds the whole table (the round-1 broadcast
    * form OOMs at 100 TB). Per-pair cost is one codegen'd
    * sorted-merge intersect over pre-hashed sorted token arrays.
    * Within-block work is still O(block²) — that is what makes this
    * the *exact baseline*; `dedup_minhash_lsh` is the sub-quadratic
    * scale path.
    */
  def jaccardPairs(documents: DataFrame): DataFrame = {
    import graft.functions.SortedIntersectCount
    import org.apache.spark.sql.graft.Bridge
    def isect(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      Bridge.column(SortedIntersectCount(Bridge.expression(a), Bridge.expression(b)))
    val docs = documents
      .select(col("doc_id"), col("lang"),
        array_sort(transform(array_distinct(split(col("text"), " ")),
          t => xxhash64(t))).as("th"))
    val a = docs.select(col("doc_id").as("id_a"), col("lang").as("la"),
                        col("th").as("ta"))
    val b = docs.select(col("doc_id").as("id_b"), col("lang").as("lb"),
                        col("th").as("tb"))
    a.join(b.hint("shuffle_hash"),
        col("la") === col("lb") && col("id_a") < col("id_b"))
      .withColumn("inter", isect(col("ta"), col("tb")))
      .withColumn("jac", col("inter").cast("double")
        / (size(col("ta")) + size(col("tb")) - col("inter")))
      .filter(col("jac") > 0.9)
      .select(col("id_a"), col("id_b"), col("jac"))
  }

  val defs: Map[String, Q] = Map(
    "text_tokenize_stats" -> ((s, d) =>
      TestData.documents(s, d)
        .withColumn("toks", split(col("text"), " "))
        .select(col("doc_id"),
          size(col("toks")).as("n_tokens"),
          size(array_distinct(col("toks"))).as("n_distinct"),
          r4(aggregate(col("toks"), lit(0), (acc, t) => acc + length(t))
            .cast("double") / size(col("toks"))).as("avg_tok_len"))
        .orderBy("doc_id")),

    "text_wordcount_topk" -> ((s, d) =>
      TestData.documents(s, d)
        .select(explode(split(col("text"), " ")).as("token"))
        .groupBy("token").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token"))
        .limit(20)),

    // Bigrams in one pass: transform over positions, then explode —
    // no positional self-join, no extra shuffle.
    "text_bigram_freq" -> ((s, d) =>
      TestData.documents(s, d)
        .withColumn("toks", split(col("text"), " "))
        .filter(size(col("toks")) >= 2)
        .select(explode(expr(
          "transform(sequence(0, size(toks)-2), i -> concat(toks[i], ' ', toks[i+1]))"))
          .as("bigram"))
        .groupBy("bigram").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("bigram"))
        .limit(20)),

    "dedup_exact_hash" -> ((s, d) =>
      TestData.documents(s, d)
        .withColumn("h", contentHash)
        .groupBy("h")
        .agg(min(col("doc_id")).as("survivor_id"),
             count(lit(1)).as("group_size"))
        .select("survivor_id", "group_size")
        .orderBy("survivor_id")),

    // Exact token-set Jaccard > 0.9 among same-lang docs — the
    // ground-truth near-dup baseline the LSH variant approximates.
    // Shuffle join on the lang block key (see `jaccardPairs`).
    "dedup_jaccard_pairs" -> ((s, d) =>
      jaccardPairs(TestData.documents(s, d))
        .select(col("id_a"), col("id_b"), r4(col("jac")).as("jaccard"))
        .orderBy("id_a", "id_b")),

    // MinHash-LSH near-dup pairs over word-2-shingles: banded
    // signatures (r=3, b=6) → bucket join → exact verify. Candidate
    // count stays ~linear where ML's 1-hash-per-band
    // approxSimilarityJoin degenerates to O(n²) on this corpus (see
    // graft.functions.MinHashLsh). Oracle-omitted (hash-family-
    // specific); recall property-tested vs exact shingle Jaccard.
    "dedup_minhash_lsh" -> ((s, d) => {
      val docs = TestData.documents(s, d)
        .withColumn("toks", split(col("text"), " "))
        .filter(size(col("toks")) >= 2)
        .select(col("doc_id").as("id"), col("lang").as("blockKey"),
                graft.functions.MinHashLsh.shinglesFromTokens(col("toks"))
                  .as("shingles"))
      graft.functions.MinHashLsh.nearDupPairs(docs, 0.9)
        .select(col("id_a"), col("id_b"), r4(col("jac")).as("approx_jaccard"))
        .orderBy("id_a", "id_b")
    }),

    // S3 stand-in (zero-egress env has no encoder model): 5-dim
    // deterministic featurization = counts of tokens starting a–e.
    "text_featurize" -> ((s, d) => {
      val letters = Seq("a", "b", "c", "d", "e")
      val dims = letters.map(l =>
        size(filter(col("toks"), t => t.startsWith(l))).as(s"f_$l"))
      TestData.documents(s, d)
        .withColumn("toks", split(col("text"), " "))
        .select(col("doc_id") +: dims: _*)
        .orderBy("doc_id")
    })
  )

  val oracles: Map[String, String] = Map(
    "text_tokenize_stats" ->
      """SELECT doc_id, len(toks) AS n_tokens,
        |  len(list_distinct(toks)) AS n_distinct,
        |  floor((list_sum(list_transform(toks, t -> length(t)))::DOUBLE
        |    / len(toks))*10000 + 0.5)/10000 AS avg_tok_len
        |FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "text_wordcount_topk" ->
      """SELECT token, count(*) AS n
        |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |GROUP BY token ORDER BY n DESC, token LIMIT 20""".stripMargin,
    "text_bigram_freq" ->
      """SELECT bigram, count(*) AS n FROM (
        |  SELECT unnest(list_transform(range(1, len(toks)),
        |    i -> toks[i] || ' ' || toks[i+1])) AS bigram
        |  FROM (SELECT string_split(text, ' ') AS toks FROM documents)
        |  WHERE len(toks) >= 2)
        |GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20""".stripMargin,
    "dedup_exact_hash" ->
      """SELECT min(doc_id) AS survivor_id, count(*) AS group_size
        |FROM documents GROUP BY md5(lower(trim(text)))
        |ORDER BY survivor_id""".stripMargin,
    "dedup_jaccard_pairs" ->
      """WITH t AS (
        |  SELECT doc_id, lang, unnest(list_distinct(string_split(text, ' '))) AS token
        |  FROM documents),
        |sz AS (SELECT doc_id, count(*) AS sz FROM t GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |  FROM t a JOIN t b ON a.token = b.token AND a.lang = b.lang
        |    AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b,
        |  floor((inter::DOUBLE / (sa.sz + sb.sz - inter))*10000 + 0.5)/10000 AS jaccard
        |FROM inter
        |JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
        |WHERE inter::DOUBLE / (sa.sz + sb.sz - inter) > 0.9
        |ORDER BY id_a, id_b""".stripMargin,
    "text_featurize" ->
      """SELECT doc_id,
        |  len(list_filter(toks, t -> t LIKE 'a%')) AS f_a,
        |  len(list_filter(toks, t -> t LIKE 'b%')) AS f_b,
        |  len(list_filter(toks, t -> t LIKE 'c%')) AS f_c,
        |  len(list_filter(toks, t -> t LIKE 'd%')) AS f_d,
        |  len(list_filter(toks, t -> t LIKE 'e%')) AS f_e
        |FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
        |ORDER BY doc_id""".stripMargin
  )
}
