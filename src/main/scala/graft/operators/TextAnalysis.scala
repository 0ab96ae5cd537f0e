package graft.operators

import graft.CkptOps

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.TestData
import graft.TestData.r4

/** Text-analysis operators for a large-scale training-data pipeline
  * (north star, BASELINE.json:6): language ID, quality scoring,
  * token counting, document fingerprinting, SimHash.
  *
  * Everything is a scan + bounded joins against tiny broadcast
  * profiles — the shapes stay linear in corpus size, which is what
  * matters at 100 TB. SimHash is exact integer arithmetic on
  * md5-derived token hashes (engine-independent, deterministic).
  */
object TextAnalysis {
  type Q = (SparkSession, String) => DataFrame

  private val stopwords = Seq("the", "a", "of", "and", "in")

  /** Hamming-≤-3 simhash pair list, memoized per (session, fixture)
    * — TWO declared keys consume it (`dedup_simhash_pairs` and
    * `dedup_capture_recapture`'s detector A), the jaccard-pair-memo
    * convention. The band self-join references the signatures twice,
    * so they are checkpointed before banding.
    */
  private val simhashPairsMemo = new graft.SessionMemo[
    org.apache.spark.sql.DataFrame]

  /** 60-bit SimHash signatures over whitespace tokens (duplicates
    * counted — token FREQUENCY weights the bit sums, per Charikar).
    * Input: (doc_id, text, …); output (doc_id, simhash). Extracted
    * from `dedup_simhash` (round 14) so detector-evaluation keys can
    * sign an arbitrary (e.g. planted-dup) corpus, not just the
    * fixture. One token-grain aggregate, 60 codegen'd conditional
    * sums — no per-pair work here.
    */
  private[graft] def simhashOf(docs: DataFrame): DataFrame = {
    val toks = docs
      .select(col("doc_id"),
              explode(split(col("text"), " ")).as("token"))
      .withColumn("h", conv(substring(md5(col("token")), 1, 15), 16, 10)
        .cast("long"))
    val bitSums = (0 until 60).map { b =>
      sum(when(col("h").bitwiseAND(lit(1L << b)) =!= 0L, 1)
        .otherwise(-1)).as(s"b$b")
    }
    val sim = (0 until 60).map { b =>
      when(col(s"b$b") > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    toks.groupBy("doc_id")
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), sim.as("simhash"))
  }

  private[graft] def fixtureSimhashPairs(s: SparkSession,
                                         d: String): DataFrame =
    simhashPairsMemo.getOrElseUpdate(s,
      graft.sources.WriteOnce.inputTag(d, "documents"), {
        val sims = defs("dedup_simhash")(s, d).ckpt()
        val banded = sims.select(col("doc_id"), col("simhash"),
          posexplode(expr(
            "transform(sequence(0, 3), " +
              "i -> shiftright(simhash, 15 * i) & 32767)")))
          .select(col("doc_id"), col("simhash"),
            col("pos").as("band_i"), col("col").as("band_v"))
        val a = banded.select(col("doc_id").as("id_a"),
          col("simhash").as("sa"), col("band_i"), col("band_v"))
        val b = banded.select(col("doc_id").as("id_b"),
          col("simhash").as("sb"), col("band_i").as("bi2"),
          col("band_v").as("bv2"))
        a.join(b, col("band_i") === col("bi2")
            && col("band_v") === col("bv2")
            && col("id_a") < col("id_b"))
          .select("id_a", "id_b", "sa", "sb").distinct()
          .withColumn("hamming",
            bit_count(col("sa").bitwiseXOR(col("sb"))))
          .filter(col("hamming") <= 3)
          .select(col("id_a"), col("id_b"), col("hamming"))
          .ckpt()
      })

  /** Edit-distance (≤ 20) near-dup pairs, blocked on
    * (lang, length-bucket).
    *
    * Bucket width 32 > the 20-edit threshold, so any qualifying
    * pair's buckets differ by at most 1: blocking on own + adjacent
    * buckets loses NO pairs. (The round-1 `n_chars` *equality* block
    * silently dropped every insert/delete edit — a structural recall
    * hole.) Side a emits (bucket-1, bucket, bucket+1), turning the
    * ±1 adjacency into a plain equi key, so the join is a SHUFFLE
    * join on (lang, bucket): both sides co-partition by block key,
    * no corpus broadcast — the shape that survives 100 TB. Each pair
    * is generated exactly once (bucket_b matches exactly one of a's
    * three emitted keys). The banded `levenshtein(…, k+1)` threshold
    * overload is O(n·k) with early exit instead of O(n²) per pair.
    *
    * Blocking is sound (every ≤-k pair survives it), so the DuckDB
    * oracle uses the plain unblocked join. Input columns:
    * (doc_id, lang, text, n_chars).
    */
  def fuzzyPairs(documents: DataFrame, maxEdits: Int = 20): DataFrame =
    // r18: the DP projection sits BEHIND a checkpoint. Filtering
    // `lev >= 0` directly on the join output let the optimizer
    // substitute the alias and push the DP into the JOIN CONDITION,
    // where left-to-right evaluation ran it FIRST -- before the
    // cheap id_a < id_b and length conjuncts -- i.e. the banded DP
    // executed on ~2x the candidate set and re-ran in the survivor
    // projection (plan showed bounded_levenshtein in Join condition
    // AND Project). The checkpoint is a deliberate optimizer fence:
    // the DP runs exactly once per candidate and the readout filter
    // reads the materialized column. Persisted state is
    // (id_a, id_b, lev) -- candidate-pair-sized, never corpus text.
    fuzzyScored(documents, maxEdits)
      .ckpt()
      .filter(col("lev") >= 0)
      .orderBy("id_a", "id_b")

  /** [[fuzzyPairs]]'s candidate join + one-shot DP projection,
    * PRE-checkpoint -- exposed so PlanSpec can pin the shuffle-join
    * shape the fence hides from the declared key's plan.
    */
  private[graft] def fuzzyScored(documents: DataFrame,
                                 maxEdits: Int): DataFrame = {
    val width = math.max(32, maxEdits + 1) // must exceed the threshold
    val docs = documents
      .select(col("doc_id"), col("lang"), col("text"), col("n_chars"),
              expr(s"n_chars DIV $width").as("bucket"))
    val a = docs.select(col("doc_id").as("id_a"), col("lang").as("la"),
        col("text").as("ta"), col("n_chars").as("ca"),
        explode(array(col("bucket") - 1, col("bucket"), col("bucket") + 1))
          .as("bk"))
    val b = docs.select(col("doc_id").as("id_b"), col("lang").as("lb"),
        col("text").as("tb"), col("n_chars").as("cb"),
        col("bucket").as("bb"))
    // |len(a) − len(b)| ≤ k is a sound pre-filter (length difference
    // lower-bounds edit distance) — an integer check in the join
    // condition that halves the candidate set before the banded
    // levenshtein runs. (A 26-letter histogram counting filter was
    // measured here too: its ~90 % candidate kill rate LOST to the
    // cost of shipping the histograms through the exploded join,
    // because the banded levenshtein already early-exits cheaply on
    // distant pairs — so it was removed. Measure, don't guess.)
    // Custom banded-DP expression instead of the builtin
    // levenshtein(…, k): converts both strings to char arrays once
    // per pair — the builtin re-decodes UTF8 bytes positionally in
    // the inner loop, which dominated this hot path (measured ~4×).
    // Property-tested equal to a full DP in ExpressionProps.
    import org.apache.spark.sql.graft.Bridge
    val blev = Bridge.column(graft.functions.BoundedLevenshtein(
      Bridge.expression(col("ta")), Bridge.expression(col("tb")),
      Bridge.expression(lit(maxEdits))))
    a.join(b.hint("shuffle_hash"),
        col("la") === col("lb") && col("bk") === col("bb")
          && col("id_a") < col("id_b")
          && abs(col("ca") - col("cb")) <= maxEdits)
      .select(col("id_a"), col("id_b"), blev.as("lev"))
  }

  /** Sorted-neighborhood dedup (SNM): sort each lang block by a
    * normalized key, compare only rank-adjacent docs (window w) — a
    * hard O(n·w) comparison bound instead of the blocked join's
    * O(Σ block²), trading recall (near-dups must sort close) for
    * predictable cost: the classic cheap first pass of a dedup
    * cascade. Rank = one row_number per lang block; candidates =
    * explode rank+1..rank+w, equi-join back on (lang, rank) — a
    * co-partitioned shuffle join, no corpus broadcast. (Block key
    * here is lang — 5 values on the fixture; production SNM blocks
    * finer, e.g. lang × source, before ranking.) Ranks come from
    * [[Curation.rangedRank]] — a per-lang MONOLITHIC window would
    * funnel each language's entire corpus through one task (the
    * skewed-window killer); the hierarchical rank keeps task size
    * bounded at any skew while producing bit-identical ranks, so the
    * DuckDB oracle stays the plain `row_number()`. Output:
    * (id_a, id_b, lev) with id_a < id_b. Input columns:
    * (doc_id, lang, text).
    */
  def snmPairs(documents: DataFrame, window: Int, maxEdits: Int): DataFrame =
    // r18: same optimizer fence as [[fuzzyPairs]] — un-fenced, the
    // lev >= 0 readout was substituted into the join condition and
    // the DP ran twice per rank-adjacent candidate (join condition +
    // survivor projection).
    snmScored(documents, window, maxEdits)
      .ckpt()
      .filter(col("lev") >= 0)

  /** [[snmPairs]]'s ranked candidate join + one-shot DP projection,
    * PRE-checkpoint — exposed so PlanSpec can pin the shuffle-join
    * and rangedRank window shapes the fence hides from the key.
    */
  private[graft] def snmScored(documents: DataFrame, window: Int,
                               maxEdits: Int): DataFrame = {
    val norm = trim(regexp_replace(regexp_replace(
      lower(col("text")), "[^a-z0-9 ]", ""), " +", " "))
    val keyed = documents
      .select(col("doc_id"), col("lang"), col("text"),
              coalesce(norm, lit("")).as("skey"))
    val ranked = Curation.rangedRank(
      keyed, "lang", Seq(col("skey"), col("doc_id")), "rnk")
    val a = ranked.select(col("lang").as("la"), col("doc_id").as("id_a"),
        col("text").as("ta"),
        explode(expr(s"sequence(rnk + 1, rnk + $window)")).as("rb"))
    val b = ranked.select(col("lang").as("lb"), col("doc_id").as("id_b"),
        col("text").as("tb"), col("rnk").as("rnk_b"))
    import org.apache.spark.sql.graft.Bridge
    val blev = Bridge.column(graft.functions.BoundedLevenshtein(
      Bridge.expression(col("ta")), Bridge.expression(col("tb")),
      Bridge.expression(lit(maxEdits))))
    a.join(b.hint("shuffle_hash"),
        col("la") === col("lb") && col("rb") === col("rnk_b"))
      .select(least(col("id_a"), col("id_b")).as("id_a"),
              greatest(col("id_a"), col("id_b")).as("id_b"),
              blev.as("lev"))
  }

  /** Deflated byte count of `in` via the caller's (reused) Deflater —
    * the single code path for `text_compression_ratio` and its spec,
    * so the property tests pin the exact bytes the key emits.
    */
  private[graft] def deflatedSize(in: Array[Byte],
      deflater: java.util.zip.Deflater, buf: Array[Byte]): Long = {
    deflater.reset()
    deflater.setInput(in)
    deflater.finish()
    var out = 0L
    while (!deflater.finished()) out += deflater.deflate(buf)
    out
  }

  /** Heaps'-law fit core (see the declared key's scaladoc): input
    * (doc_id, text); shared by `text_heaps_law` and
    * `GraftEngine.heapsLaw`.
    */
  /** Zipf rank-frequency fit core (see `text_zipf_fit`): input a
    * (word, n) frequency table, output the log-log OLS slope (≈ −1
    * under Zipf's law), ln-intercept and r² — the corpus-shape
    * readout next to [[heapsFit]]'s vocabulary growth (a corpus
    * whose slope drifts shallow is template/boilerplate-heavy; a
    * steep one is dominated by few types). Ranks ride
    * [[Curation.rangedRank]] (bounded task size at any vocab — a
    * monolithic vocab window is the skewed-window killer the r12
    * win_cumulative re-plan removed); both logs quantized ×1e4 at
    * their definition sites (the bound: types·(ln V·1e4)² < 2^63 ⇒
    * V ≤ ~2e8 types — far past any real vocabulary), centered
    * moments assembled double-first (no n·Σx² BIGINT overflow, the
    * durbin_watson recipe). Degenerate single-type tables read NULL.
    * Shared with `GraftEngine.zipfFit`.
    */
  private[graft] def zipfCore(freqs: DataFrame): DataFrame = {
    val ranked = Curation.rangedRank(
      freqs.withColumn("g", lit(0)), "g",
      Seq(col("n").desc, col("word")), "rank")
    val pts = ranked
      .withColumn("x_u",
        floor(log(col("rank").cast("double")) * 10000 + 0.5).cast("long"))
      .withColumn("y_u",
        floor(log(col("n").cast("double")) * 10000 + 0.5).cast("long"))
    val a = pts.agg(count(lit(1)).as("nt"),
      sum("x_u").as("sx"), sum("y_u").as("sy"),
      sum(col("x_u") * col("y_u")).as("sxy"),
      sum(col("x_u") * col("x_u")).as("sxx"),
      sum(col("y_u") * col("y_u")).as("syy"))
    val cxy = col("nt").cast("double") * col("sxy").cast("double") -
      col("sx").cast("double") * col("sy").cast("double")
    val cxx = col("nt").cast("double") * col("sxx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double")
    val cyy = col("nt").cast("double") * col("syy").cast("double") -
      col("sy").cast("double") * col("sy").cast("double")
    a.withColumn("slope", when(cxx > 0, cxy / cxx))
      .select(col("nt").as("n_types"),
        when(col("slope").isNotNull, r4(col("slope"))).as("slope"),
        when(col("slope").isNotNull, r4(
          (col("sy").cast("double") / col("nt").cast("double")
            - col("slope")
              * (col("sx").cast("double") / col("nt").cast("double")))
            / 10000.0)).as("intercept_ln"),
        when(col("slope").isNotNull && cyy > 0,
          r4(cxy * cxy / (cxx * cyy))).as("r2"))
  }

  private[graft] def heapsFit(docs0: DataFrame): DataFrame = {
    val docs = docs0
      .select(col("doc_id"), col("text"),
        size(split(col("text"), " ")).cast("long").as("ntok"))
      .withColumn("g", lit(0))
    val ranked = Curation.rangedRank(docs, "g", Seq(col("doc_id")), "rnk")
      .ckpt() // three consumers: cumsum, tokens, total
    val cum = Curation.shardedPrefixSum(ranked, "g", "rnk", "ntok", "ct0")
      .withColumn("tokens_seen", col("ct0") + col("ntok"))
    val nd = ranked.groupBy("g").agg(max("rnk").as("nd"))
    val cp = cum.join(broadcast(nd), "g")
      .filter(expr("(rnk & (rnk - 1)) = 0") || col("rnk") === col("nd"))
      .select(col("rnk").as("rnk_c"), col("tokens_seen").as("n_tokens"))
      .ckpt()
    val tokFirst = ranked
      .select(col("rnk"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok").agg(min("rnk").as("frnk"))
    val vocab = tokFirst
      .join(broadcast(cp.select("rnk_c")), col("frnk") <= col("rnk_c"))
      .groupBy("rnk_c").agg(count(lit(1)).as("vocab"))
    cp.join(vocab, "rnk_c")
      .withColumn("x_u",
        floor(log(col("n_tokens").cast("double")) * 1000000 + 0.5)
          .cast("long"))
      .withColumn("y_u",
        floor(log(col("vocab").cast("double")) * 1000000 + 0.5)
          .cast("long"))
      .agg(count(lit(1)).as("n_points"),
        sum("x_u").as("sx"), sum("y_u").as("sy"),
        sum(col("x_u") * col("y_u")).as("sxy"),
        sum(col("x_u") * col("x_u")).as("sxx"))
      .withColumn("beta", when(
        col("n_points") * col("sxx") - col("sx") * col("sx") > 0, r4(
        (col("n_points") * col("sxy") - col("sx") * col("sy"))
          .cast("double")
          / (col("n_points") * col("sxx") - col("sx") * col("sx"))
            .cast("double"))))
      .withColumn("k_coef", when(
        col("n_points") * col("sxx") - col("sx") * col("sx") > 0, r4(
        exp(((col("sy").cast("double")
          - (col("n_points") * col("sxy") - col("sx") * col("sy"))
            .cast("double")
            / (col("n_points") * col("sxx") - col("sx") * col("sx"))
              .cast("double")
            * col("sx").cast("double"))
          / col("n_points").cast("double")) / 1000000.0))))
      .select("n_points", "sx", "sy", "beta", "k_coef")
  }

  val defs: Map[String, Q] = Map(
    // Naive-Bayes-style language ID: per-language token log-frequency
    // profiles (a 155-row broadcast) scored against each doc; output
    // is the (true lang × predicted lang) confusion matrix.
    "text_lang_id" -> ((s, d) => {
      val toks = TestData.documents(s, d)
        .select(col("doc_id"), col("lang"),
                explode(split(col("text"), " ")).as("token"))
      // lang_n = Σ tok_n within the (tiny) profile itself — one
      // aggregation pass over the tokens instead of two plus a join.
      val profile = toks.groupBy(col("lang").as("pl"), col("token").as("ptok"))
        .agg(count(lit(1)).as("tok_n"))
        .withColumn("lang_n",
          sum("tok_n").over(Window.partitionBy("pl")))
        .select(col("pl"), col("ptok"),
                r4(log(col("tok_n").cast("double") / col("lang_n"))).as("ln_p"))
      val scores = toks
        .join(broadcast(profile), col("token") === col("ptok"))
        .groupBy(col("doc_id"), col("lang"), col("pl"))
        .agg(r4(sum("ln_p")).as("score"))
      val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("pl"))
      scores.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .groupBy(col("lang"), col("pl").as("predicted"))
        .agg(count(lit(1)).as("n"))
        .orderBy("lang", "predicted")
    }),

    // Heuristic quality score from length / token / stopword stats.
    "text_quality_score" -> ((s, d) =>
      TestData.documents(s, d)
        .withColumn("toks", split(col("text"), " "))
        .withColumn("n_toks", size(col("toks")))
        .withColumn("stop_n",
          size(filter(col("toks"), t => t.isInCollection(stopwords))))
        .withColumn("avg_len",
          aggregate(col("toks"), lit(0), (a, t) => a + length(t))
            .cast("double") / col("n_toks"))
        .select(col("doc_id"), col("n_toks"),
          r4(col("stop_n").cast("double") / col("n_toks")).as("stop_ratio"),
          r4(col("avg_len")).as("avg_tok_len"),
          r4(least(col("n_toks").cast("double") / 100.0, lit(1.0)) * 0.5
            + (lit(1.0) - col("stop_n").cast("double") / col("n_toks")) * 0.3
            + least(col("avg_len") / 8.0, lit(1.0)) * 0.2).as("quality"))
        .orderBy("doc_id")),

    // Token counting: whitespace split vs BPE-ish regex tokenizer.
    "text_token_count" -> ((s, d) =>
      TestData.documents(s, d)
        .select(col("doc_id"),
          col("n_chars"),
          size(split(col("text"), " ")).as("ws_tokens"),
          size(regexp_extract_all(col("text"), lit("[a-z0-9]+"), lit(0)))
            .as("re_tokens"))
        .orderBy("doc_id")),

    // Order-insensitive content fingerprint (md5 of the sorted
    // distinct token set) + fingerprint-group size — the grouping
    // shuffle IS the dedup partition at scale.
    // COMPRESSION-RATIO QUALITY (round 9): deflate ratio per doc —
    // the Gopher-style quality signal (highly compressible ⇒
    // repetitive/boilerplate; near-incompressible ⇒ noise; natural
    // text sits in between) completing the quality family
    // (quality_score, repetition_score, ttr_richness). Runs in
    // mapPartitions with ONE Deflater per partition (the native-
    // resource amortization shape used for media decode). Level 6 +
    // default strategy is deterministic for a fixed input, but no
    // SQL engine can reproduce zlib ⇒ documented omit; PropertySpec
    // pins the signal's CONTRACT: planted repetitive text compresses
    // far better than planted random-ish text, ratios are positive,
    // and sizes are exact.
    "text_compression_ratio" -> ((s, d) => {
      import s.implicits._
      TestData.documents(s, d)
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .mapPartitions { rows =>
          val deflater = new java.util.zip.Deflater(6)
          val buf = new Array[Byte](1 << 16)
          rows.map { case (id, text) =>
            val in = text.getBytes("UTF-8")
            (id, in.length.toLong, deflatedSize(in, deflater, buf))
          }
        }
        .toDF("doc_id", "n_bytes", "n_deflated")
        .withColumn("ratio",
          r4(col("n_deflated").cast("double") / col("n_bytes")))
        .orderBy("doc_id")
    }),

    // TYPE-TOKEN RICHNESS (round 9): vocabulary-richness quality
    // signals per doc — TTR (distinct types / tokens) and the hapax
    // ratio (types seen once in the doc / types): low-richness docs
    // are boilerplate/spam, the classic pretraining-quality filter
    // next to text_quality_score and text_repetition_score. Shape:
    // explode to (doc, token) → two-level map-side-combinable
    // aggregate; the (doc, token) shuffle is the dedup partition at
    // scale. Counts exact BIGINTs, ratios r4'd once.
    "text_ttr_richness" -> ((s, d) =>
      TestData.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg(sum("c").as("n_toks"), count(lit(1)).as("n_types"),
          sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"))
        .withColumn("ttr",
          r4(col("n_types").cast("double") / col("n_toks")))
        .withColumn("hapax_ratio",
          r4(col("n_hapax").cast("double") / col("n_types")))
        .select("doc_id", "n_toks", "n_types", "n_hapax", "ttr",
          "hapax_ratio")
        .orderBy("doc_id")),

    // N-GRAM NOVELTY (round 9): how much of each doc's trigram set
    // is FIRST seen in that doc (first occurrence = min doc_id over
    // the corpus) — the incremental-crawl novelty score that ranks
    // what a near-dup filter should even look at; docs full of
    // already-seen n-grams are recombinations. Shape: distinct
    // (doc, trigram) pairs shuffle ON THE TRIGRAM to the
    // first-occurrence aggregate, then join back — both exchanges
    // trigram-sharded, nothing corpus-grain on one task. Docs with
    // < 3 tokens have no trigrams and are excluded (stated, not
    // silent).
    "text_ngram_novelty" -> ((s, d) => {
      val tri = TestData.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .filter(size(col("toks")) >= 3)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(toks) - 3), " +
            "i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2]))"))
          .as("tri"))
        .distinct()
      val first = tri.groupBy("tri").agg(min("doc_id").as("fdoc"))
      tri.join(first, "tri")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_shingles"),
          sum(when(col("fdoc") === col("doc_id"), 1L).otherwise(0L))
            .as("n_novel"))
        .withColumn("novelty",
          r4(col("n_novel").cast("double") / col("n_shingles")))
        .select("doc_id", "n_shingles", "n_novel", "novelty")
        .orderBy("doc_id")
    }),

    "text_fingerprint" -> ((s, d) => {
      val fp = md5(array_join(array_sort(array_distinct(
        split(col("text"), " "))), " "))
      val w = Window.partitionBy("fp")
      TestData.documents(s, d)
        .withColumn("fp", fp)
        .withColumn("n_same_fp", count(lit(1)).over(w))
        .select("doc_id", "fp", "n_same_fp")
        .orderBy("doc_id")
    }),

    // Order-SENSITIVE polynomial rolling hash over the token stream
    // (h = (h·31 + md5₂₈(tok)) mod p): two docs match iff their token
    // sequences match — complements the order-insensitive
    // `text_fingerprint`. md5-derived per-token values keep the fold
    // engine-independent; all arithmetic stays < 2^37 (ANSI-safe).
    "text_rolling_hash" -> ((s, d) => {
      val p = 2147483647L
      val tokHash = (t: org.apache.spark.sql.Column) =>
        conv(substring(md5(t), 1, 7), 16, 10).cast("long")
      val w = Window.partitionBy("rh")
      TestData.documents(s, d)
        .withColumn("rh",
          aggregate(transform(split(col("text"), " "), tokHash), lit(0L),
            (acc, v) => (acc * 31 + v) % p))
        .withColumn("n_same_seq", count(lit(1)).over(w))
        .select("doc_id", "rh", "n_same_seq")
        .orderBy("doc_id")
    }),

    // TF-IDF: document frequency over distinct (doc, token), idf
    // quantized (r4) so the tf·idf ranking is exact cross-engine
    // (products of identical doubles; ties broken by token). Emits
    // each doc's top-scoring term.
    "text_tfidf_top" -> ((s, d) => {
      val docs = TestData.documents(s, d)
      val n = docs.count()
      val tf = docs.select(col("doc_id"),
          explode(split(col("text"), " ")).as("token"))
        .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      val df = tf.groupBy(col("token").as("t"))
        .agg(count(lit(1)).as("df"))
      val idf = df.select(col("t"), r4(log(lit(n.toDouble) / col("df"))).as("idf"))
      val w = Window.partitionBy("doc_id")
        .orderBy(col("score").desc, col("token"))
      tf.join(broadcast(idf), col("token") === col("t"))
        .withColumn("score", col("tf") * col("idf"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("token").as("top_term"),
                r4(col("score")).as("tfidf"))
        .orderBy("doc_id")
    }),

    // Fuzzy dedup: edit-distance pairs ≤ 20, blocked by
    // (lang, length-bucket) — see `fuzzyPairs`.
    "dedup_fuzzy_pairs" -> ((s, d) => fuzzyPairs(TestData.documents(s, d))),

    // Sorted-neighborhood dedup (SNM) — see `snmPairs`.
    "dedup_sorted_neighborhood" -> ((s, d) =>
      snmPairs(TestData.documents(s, d), window = 4, maxEdits = 20)
        .orderBy("id_a", "id_b")),

    // 60-bit SimHash over md5-derived token hashes. Oracle-checked:
    // the hex→int fold is a DuckDB list comprehension over exact
    // BIGINT shifts (4·(15−i) ≤ 56 stays clear of the bit-63 range
    // check), the same technique that oracled ann_hamming_topk.
    "dedup_simhash" -> ((s, d) =>
      simhashOf(TestData.documents(s, d)).orderBy("doc_id")),

    // ZIPF EXPONENT per language: regression slope of ln(freq) on
    // ln(rank) over the word-frequency table — the distributional
    // health check for a text corpus (natural language sits near −1;
    // templated/boilerplate corpora drift off). Word table is
    // vocabulary-sized; both log inputs are r4-quantized BEFORE the
    // regression (the corr/regr precedent) and the slope r4'd after.
    // Ranks via Curation.rangedRank — a web-scale single-language
    // vocabulary is 10^8+ rows, too big for a per-lang one-task sort.
    // RAKE KEYWORD EXTRACTION (round 11): Rapid Automatic Keyword
    // Extraction (Rose et al. 2010) — candidate phrases are maximal
    // stopword-free token runs; word score = deg/freq (deg = Σ
    // phrase-length over the word's occurrences — words living in
    // long phrases score high); phrase score = Σ word scores. The
    // corpus-level keyword list a dataset card or topic drill-down
    // publishes, the extraction step between wordcount_topk's
    // unigrams and collocations_pmi's bigrams. Scale shape: tokens
    // shuffle once to (doc, phrase) grain; word stats fold to the
    // VOCABULARY; top-20 via sort+limit (TakeOrderedAndProject, the
    // mahalanobis rule — never a corpus-grain rank window; the rank
    // column is assigned on the 20-row result). Determinism: ratio =
    // deg·1e6 DIV freq (positive ⇒ DIV ≡ //), phrase scores are
    // exact BIGINT sums, phrase text assembled in POSITION order via
    // sort_array(struct) (collect_list alone is order-unstable),
    // ties broken on the phrase string. Identical phrases dedupe
    // (corpus-level scores ⇒ identical rows) per RAKE convention.
    "text_rake_keywords" -> ((s, d) => {
      val toks = TestData.documents(s, d)
        .select(col("doc_id"), posexplode(
          regexp_extract_all(col("text"), lit("[a-z0-9]+"), lit(0))))
        .select(col("doc_id"), col("pos"), col("col").as("tok"))
        .withColumn("is_stop",
          col("tok").isin(stopwords: _*).cast("int"))
      val wPos = Window.partitionBy("doc_id").orderBy("pos")
      val cand = toks
        .withColumn("pid", sum("is_stop").over(
          wPos.rowsBetween(Window.unboundedPreceding, 0)))
        .filter(col("is_stop") === 0)
        .ckpt() // consumed by word stats AND phrase build
      val plen = cand.groupBy("doc_id", "pid")
        .agg(count(lit(1)).as("plen"))
      val occ = cand.join(plen, Seq("doc_id", "pid"))
      val ratios = occ.groupBy("tok")
        .agg(count(lit(1)).as("freq"), sum("plen").as("deg"))
        .withColumn("ratio_u", expr("deg * 1000000 DIV freq"))
        .select("tok", "ratio_u")
      occ.join(ratios, "tok")
        .groupBy("doc_id", "pid")
        .agg(sort_array(collect_list(struct(col("pos"), col("tok"))))
            .as("pt"),
          sum("ratio_u").as("score_u"),
          count(lit(1)).as("n_words"))
        .withColumn("phrase",
          concat_ws(" ", expr("transform(pt, x -> x.tok)")))
        .select("phrase", "n_words", "score_u").distinct()
        .orderBy(col("score_u").desc, col("phrase")).limit(20)
        .withColumn("rk", row_number().over(
          Window.orderBy(col("score_u").desc, col("phrase"))))
        .select("rk", "phrase", "n_words", "score_u")
        .orderBy("rk")
    }),

    // HEAPS' LAW FIT (round 12): vocabulary growth V = K·N^β over the
    // corpus in doc_id order — the scaling readout that answers "how
    // big does the tokenizer vocabulary get at 100× this corpus"
    // (natural text runs β ≈ 0.5–0.8; β near 1 ⇒ noise/unique-id
    // contamination, the dataset-card number next to text_zipf_slope's
    // frequency slope). Shape: the doc rank comes from rangedRank
    // (never a corpus-grain row_number window) and the cumulative
    // token count from shardedPrefixSum; checkpoints are the
    // power-of-2 ranks + the final doc (log₂ n rows — the log-log fit
    // wants geometric spacing anyway); vocabulary at each checkpoint
    // counts tokens by FIRST-occurrence rank via a broadcast theta
    // join (corpus × log n, map-side partial aggregation — no
    // shuffle). Both logs micro-quantized before the exact-BIGINT OLS
    // sums (the retention_halflife discipline; x_u·y_u ≤ ~3e14·30
    // documented); degenerate ≤1-point fits NULL out.
    "text_heaps_law" -> ((s, d) =>
      heapsFit(TestData.documents(s, d)
        .select(col("doc_id"), col("text")))),

    // ZIPF RANK-FREQUENCY FIT (round 17): the law heaps_law's growth
    // curve presumes — log-log OLS slope over the word frequency
    // table's (rank, freq) points (≈ −1 on natural text; shallow =
    // boilerplate-heavy, steep = few-types-dominate). Full protocol
    // on [[zipfCore]] (rangedRank, ×1e4 log quantizers, double-first
    // centered moments). Planted exact power law recovers its slope
    // to r4 (PropertySpec).
    "text_zipf_fit" -> ((s, d) =>
      zipfCore(TestData.documents(s, d)
        .select(explode(split(col("text"), " ")).as("word"))
        .filter(length(col("word")) > 0)
        .groupBy("word").agg(count(lit(1)).as("n")))),

    // VOCAB COVERAGE (round 13): the tokenizer-budget curve — what
    // fraction of RUNNING TEXT does the top-N vocabulary cover, per
    // language, at N ∈ {10, 100, 1000}. This is the readout that
    // sizes a vocab: zipf_slope says the law, heaps_law says growth,
    // coverage says where the OOV mass actually lands for a concrete
    // budget (saturates at 1.0 once N ≥ vocab — expected, not a bug).
    // Frequency ranks ride Curation.rangedRank (no single-task vocab
    // sort — the zipf/heaps discipline; oracle uses the equivalent
    // monolithic per-lang rank); the three cuts expand from ONE
    // ranked frame (vocabulary-sized ×3); exact BIGINT token masses,
    // one r4'd division per output row.
    "text_vocab_coverage" -> ((s, d) => {
      val freq = TestData.documents(s, d)
        .select(col("lang"), explode(split(col("text"), " ")).as("token"))
        .groupBy("lang", "token").agg(count(lit(1)).as("n"))
      Curation.rangedRank(
          freq, "lang", Seq(col("n").desc, col("token")), "rnk")
        .select(col("lang"), col("n"), col("rnk"),
          explode(array(Seq(10, 100, 1000).map(c => lit(c.toLong)): _*))
            .as("cut"))
        .groupBy("lang", "cut")
        .agg(count(lit(1)).as("n_vocab"), sum("n").as("total_tokens"),
          sum(when(col("rnk") <= col("cut"), col("n")).otherwise(0L))
            .as("covered_tokens"))
        .withColumn("coverage", when(col("total_tokens") > 0,
          r4(col("covered_tokens").cast("double")
            / col("total_tokens").cast("double"))))
        .select("lang", "cut", "n_vocab", "total_tokens",
          "covered_tokens", "coverage")
        .orderBy("lang", "cut")
    }),

    "text_zipf_slope" -> ((s, d) => {
      val freq = TestData.documents(s, d)
        .select(col("lang"), explode(split(col("text"), " ")).as("token"))
        .groupBy("lang", "token").agg(count(lit(1)).as("n"))
      Curation.rangedRank(
          freq, "lang", Seq(col("n").desc, col("token")), "rnk")
        .select(col("lang"),
          r4(log(col("rnk").cast("double"))).as("lr"),
          r4(log(col("n").cast("double"))).as("lf"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_words"),
          r4(expr("regr_slope(lf, lr)")).as("zipf_slope"))
        .orderBy("lang")
    }),

    // SIMHASH NEAR-DUP PAIRS: documents whose 60-bit simhashes differ
    // in ≤ 3 bits, found by 4×15-bit BAND blocking — pigeonhole: ≤ 3
    // flipped bits across 4 bands leaves at least one band identical,
    // so an equi-join on (band index, band value) is a SOUND candidate
    // generator (candidates ⊇ matches) and the exact popcount verify
    // runs on candidates only. This is how simhash dedup actually
    // deploys at crawl scale (Manku et al. '07): a table-sized
    // shuffle on band values, never an all-pairs product. Bucket
    // population is corpus/2^15 per band here; at 100 TB widen the
    // bands (t+1 bands of 60/(t+1) bits generalizes the pigeonhole
    // for Hamming ≤ t) or sub-block band buckets on a second band —
    // the same equi-join shape, smaller quadratic cells. Oracle stays
    // UNBLOCKED (brute-force pairs over the simhash CTE) per the
    // blocking-soundness rule.
    "dedup_simhash_pairs" -> ((s, d) =>
      fixtureSimhashPairs(s, d).orderBy("id_a", "id_b")),

    // HASHING-TRICK featurization: token → md5-prefix bucket (mod 32),
    // per-doc bucket counts — the fixed-width sparse featurizer behind
    // linear quality classifiers (fastText-style) that never needs a
    // vocabulary broadcast: the feature id is a pure hash, so the op
    // is one map-side explode + one (doc, bucket) aggregate at any
    // corpus size. Emitted exploded (doc_id, bucket, cnt) — the
    // cross-engine-safe reshape of a sparse vector.
    "text_hash_features" -> ((s, d) =>
      TestData.documents(s, d)
        .select(col("doc_id"),
          explode(split(col("text"), " ")).as("token"))
        .withColumn("bucket",
          conv(substring(md5(col("token")), 1, 4), 16, 10)
            .cast("long") % 32)
        .groupBy("doc_id", "bucket")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("doc_id", "bucket")),

    // COLLOCATION EXTRACTION via pointwise mutual information
    // (round 8): the corpus-linguistics pass that finds multi-word
    // expressions ("new york", "machine learning") worth keeping as
    // single tokens. Sample space = the per-lang bigram table: c12 =
    // bigram count, c1/c2 = marginal counts of the left/right word
    // IN BIGRAM POSITION (derived from the same table, so the
    // distribution is self-consistent), PMI = ln(c12·N/(c1·c2)).
    // Shape: one map-side bigram explode + a (lang,w1,w2) count with
    // map-side combine (corpus-sized shuffle, the wordcount shape),
    // then every downstream table is VOCABULARY-sized (Zipf-bounded)
    // — marginals re-aggregate the bigram-type table, never the
    // corpus, and the per-lang totals broadcast. One transcendental
    // per surviving bigram, quantized to integer micro-nats before
    // emission (quantize-before-sum discipline; here there is no sum,
    // but the BIGINT keeps the compare exact).
    "text_collocations_pmi" -> ((s, d) => {
      val big = TestData.documents(s, d)
        .withColumn("toks", split(col("text"), " "))
        .filter(size(col("toks")) >= 2)
        .select(col("lang"), explode(expr(
          "transform(sequence(0, size(toks)-2), " +
            "i -> struct(toks[i] AS w1, toks[i+1] AS w2))")).as("b"))
        .select(col("lang"), col("b.w1").as("w1"), col("b.w2").as("w2"))
        .groupBy("lang", "w1", "w2").agg(count(lit(1)).as("c12"))
      val left = big.groupBy("lang", "w1").agg(sum("c12").as("c1"))
      val right = big.groupBy("lang", "w2").agg(sum("c12").as("c2"))
      val tot = big.groupBy("lang").agg(sum("c12").as("n_big"))
      big.join(left, Seq("lang", "w1")).join(right, Seq("lang", "w2"))
        .join(broadcast(tot), Seq("lang"))
        .filter(col("c12") >= 5)
        .withColumn("pmi_u",
          floor(log((col("c12").cast("double") * col("n_big"))
              / (col("c1").cast("double") * col("c2")))
            * 1000000 + 0.5).cast("long"))
        .select("lang", "w1", "w2", "c12", "pmi_u")
        .orderBy("lang", "w1", "w2")
    }),

    // FLESCH READABILITY (round 10): the classic reading-ease score
    // per doc from three exact integer counts — words (the re-token
    // regex), sentences (runs of [.!?], floor 1 — this fixture's
    // word-soup has none, so every doc is "one sentence"; the guard
    // is what matters), syllables (per word: vowel-group runs,
    // floor 1 — the standard heuristic). The per-word syllable fold
    // is one array HOF over the doc's own token list (doc-local,
    // map-side; no shuffle at all before the final sort). The score
    // is one mirrored IEEE expression over the three counts, r4'd.
    "text_readability" -> ((s, d) => {
      val words = regexp_extract_all(col("text"), lit("[a-z0-9]+"), lit(0))
      TestData.documents(s, d)
        .withColumn("n_words", size(words).cast("long"))
        .withColumn("n_sentences", greatest(lit(1L),
          size(regexp_extract_all(col("text"), lit("[.!?]+"), lit(0)))
            .cast("long")))
        .withColumn("n_syllables", aggregate(
          transform(words, w => greatest(lit(1),
            size(regexp_extract_all(w, lit("[aeiouy]+"), lit(0))))),
          lit(0L), (acc, x) => acc + x))
        .filter(col("n_words") > 0)
        .withColumn("flesch", r4(lit(206.835)
          - lit(1.015) * (col("n_words").cast("double")
            / col("n_sentences").cast("double"))
          - lit(84.6) * (col("n_syllables").cast("double")
            / col("n_words").cast("double"))))
        .select("doc_id", "n_words", "n_sentences", "n_syllables", "flesch")
        .orderBy("doc_id")
    }),

    // GUNNING FOG (round 13): the second standard readability index,
    // published next to Flesch because the two disagree exactly where
    // it matters — fog weights the COMPLEX-word RATE (≥3 vowel-group
    // syllables) while Flesch weights total syllable density, so
    // polysyllable-heavy technical text scores differently under
    // each. Same doc-local HOF fold as text_readability (one
    // filter() over the word array instead of a transform-sum); the
    // 0.4·(words/sentences + 100·complex/words) assembly is one
    // mirrored double expression r4'd, n_words > 0 filtered so no
    // division guard is needed. Embarrassingly parallel at any scale.
    "text_gunning_fog" -> ((s, d) => {
      val words = regexp_extract_all(col("text"), lit("[a-z0-9]+"), lit(0))
      TestData.documents(s, d)
        .withColumn("n_words", size(words).cast("long"))
        .withColumn("n_sentences", greatest(lit(1L),
          size(regexp_extract_all(col("text"), lit("[.!?]+"), lit(0)))
            .cast("long")))
        .withColumn("n_complex", size(filter(words, w =>
          size(regexp_extract_all(w, lit("[aeiouy]+"), lit(0))) >= 3))
          .cast("long"))
        .filter(col("n_words") > 0)
        .withColumn("fog", r4(lit(0.4)
          * (col("n_words").cast("double") / col("n_sentences").cast("double")
            + lit(100.0) * (col("n_complex").cast("double")
              / col("n_words").cast("double")))))
        .select("doc_id", "n_words", "n_sentences", "n_complex", "fog")
        .orderBy("doc_id")
    }),

    // SMOG GRADE (round 15): the polysyllable-count readability used
    // by health/legal-literacy guidelines — fog RATES complex words,
    // SMOG counts their DENSITY per 30 sentences with a √ law, so
    // the two diverge on long-sentence technical text; with Flesch/
    // fog/CLI/ARI this completes the readability panel (the spread
    // across five formulas IS the quality signal). Same [a-z0-9]+ /
    // [.!?]+ extraction; SMOG = 1.043·√(poly·30/sentences) + 3.1291
    // — the √ is IEEE correctly-rounded on an identical quotient in
    // both engines (Neyman precedent); one mirrored expression, r4.
    "text_smog" -> ((s, d) => {
      val words = regexp_extract_all(col("text"), lit("[a-z0-9]+"), lit(0))
      TestData.documents(s, d)
        .withColumn("n_words", size(words).cast("long"))
        .withColumn("n_sentences", greatest(lit(1L),
          size(regexp_extract_all(col("text"), lit("[.!?]+"), lit(0)))
            .cast("long")))
        .withColumn("n_poly", size(filter(words, w =>
          size(regexp_extract_all(w, lit("[aeiouy]+"), lit(0))) >= 3))
          .cast("long"))
        .filter(col("n_words") > 0)
        .withColumn("smog", TestData.r4(lit(1.043)
          * sqrt(col("n_poly").cast("double") * 30.0
            / col("n_sentences").cast("double"))
          + lit(3.1291)))
        .select("doc_id", "n_words", "n_sentences", "n_poly", "smog")
        .orderBy("doc_id")
    }),

    // COLEMAN-LIAU INDEX (round 15): the CHARACTER-based readability
    // grade — unlike Flesch/fog it needs no syllable heuristic (the
    // weakest part of both), so it is the cross-check a text-quality
    // gate publishes when the vowel-group syllable proxy is suspect
    // (code-mixed or transliterated text). CLI = 0.0588·L − 0.296·S
    // − 15.8 with L = letters per 100 words, S = sentences per 100
    // words; letters = Σ len(word) over the same [a-z0-9]+ word
    // extraction as Flesch (one doc-local HOF fold) — all-integer
    // per-doc counts, ONE mirrored double expression r4'd,
    // embarrassingly parallel at any scale.
    "text_coleman_liau" -> ((s, d) => {
      val words = regexp_extract_all(col("text"), lit("[a-z0-9]+"), lit(0))
      TestData.documents(s, d)
        .withColumn("n_words", size(words).cast("long"))
        .withColumn("n_sentences", greatest(lit(1L),
          size(regexp_extract_all(col("text"), lit("[.!?]+"), lit(0)))
            .cast("long")))
        .withColumn("n_letters", aggregate(
          transform(words, w => length(w).cast("long")),
          lit(0L), (acc, x) => acc + x))
        .filter(col("n_words") > 0)
        .withColumn("cli", r4(lit(0.0588)
          * (lit(100.0) * col("n_letters").cast("double")
            / col("n_words").cast("double"))
          - lit(0.296) * (lit(100.0) * col("n_sentences").cast("double")
            / col("n_words").cast("double"))
          - lit(15.8)))
        .select("doc_id", "n_words", "n_sentences", "n_letters", "cli")
        .orderBy("doc_id")
    }),

    // AUTOMATED READABILITY INDEX (round 15): the second character-
    // based grade, published next to CLI because they weight
    // OPPOSITE ratios (ARI leans on words-per-sentence, CLI on
    // letters-per-word) — together with Flesch/fog they bracket the
    // readability spread a corpus-quality dashboard reports. ARI =
    // 4.71·(letters/words) + 0.5·(words/sentences) − 21.43; same
    // integer per-doc counts, one mirrored expression, r4.
    "text_ari" -> ((s, d) => {
      val words = regexp_extract_all(col("text"), lit("[a-z0-9]+"), lit(0))
      TestData.documents(s, d)
        .withColumn("n_words", size(words).cast("long"))
        .withColumn("n_sentences", greatest(lit(1L),
          size(regexp_extract_all(col("text"), lit("[.!?]+"), lit(0)))
            .cast("long")))
        .withColumn("n_letters", aggregate(
          transform(words, w => length(w).cast("long")),
          lit(0L), (acc, x) => acc + x))
        .filter(col("n_words") > 0)
        .withColumn("ari", r4(lit(4.71)
          * (col("n_letters").cast("double") / col("n_words").cast("double"))
          + lit(0.5) * (col("n_words").cast("double")
            / col("n_sentences").cast("double"))
          - lit(21.43)))
        .select("doc_id", "n_words", "n_sentences", "n_letters", "ari")
        .orderBy("doc_id")
    }),

    // LOG-ODDS WORDS (round 13): Monroe et al.'s "Fightin' Words" —
    // which tokens distinguish English text from the rest of the
    // corpus, with the Dirichlet-prior z-score that fixes both raw
    // log-odds (explodes on rare words) and PMI (ignores evidence
    // volume). δ_w = ln((y1+1)/(n1+V−y1−1)) − ln((y2+1)/(n2+V−y2−1)),
    // z = δ/√(1/(y1+1) + 1/(y2+1)) with a flat α = 1 prior (α₀ = V).
    // Vocabulary-shaped: the corpus folds to per-token group counts
    // once; scalars (n1, n2, V) broadcast from a 1-row aggregate;
    // every transcendental is per-ROW closed form in mirrored order
    // (no float accumulation anywhere); top-20 by the r4-QUANTIZED
    // |z| sort key (float-sort rule) via TakeOrderedAndProject.
    "text_log_odds_words" -> ((s, d) => {
      val f = TestData.documents(s, d)
        .select(col("lang"),
          explode(regexp_extract_all(col("text"), lit("[a-z0-9]+"), lit(0)))
            .as("tok"))
        .groupBy("tok")
        .agg(sum(when(col("lang") === "en", 1L).otherwise(0L)).as("y1"),
          sum(when(col("lang") =!= "en", 1L).otherwise(0L)).as("y2"))
        .ckpt() // scalar totals + the per-token readout
      val tot = f.agg(sum("y1").as("n1"), sum("y2").as("n2"),
        count(lit(1)).as("v"))
      val d1 = col("n1") + col("v") - col("y1") - 1
      val d2 = col("n2") + col("v") - col("y2") - 1
      f.crossJoin(broadcast(tot))
        .withColumn("delta", when(d1 > 0 && d2 > 0,
          log((col("y1") + 1).cast("double") / d1.cast("double"))
            - log((col("y2") + 1).cast("double") / d2.cast("double"))))
        .withColumn("z_raw", col("delta")
          / sqrt(lit(1.0) / (col("y1") + 1).cast("double")
            + lit(1.0) / (col("y2") + 1).cast("double")))
        .filter(col("z_raw").isNotNull)
        .orderBy(r4(abs(col("z_raw"))).desc, col("tok"))
        .limit(20)
        .select(col("tok"), col("y1"), col("y2"),
          r4(col("delta")).as("log_odds"), r4(col("z_raw")).as("z"))
        .orderBy(r4(abs(col("z_raw"))).desc, col("tok"))
    }),

    // LANG VOCAB OVERLAP (round 13): pairwise Jaccard of the DISTINCT
    // token vocabularies across languages — the contamination /
    // shared-loanword readout next to text_js_divergence (JS compares
    // DISTRIBUTIONS; this compares SUPPORTS, which is what a
    // per-lang tokenizer-sharing decision reads). Vocabulary-shaped:
    // one distinct fold, a token equi-join for intersections (k²/2
    // output rows), a lang×lang dimension join keeps disjoint pairs
    // as explicit zeros; exact integers until one r4'd division.
    "text_lang_vocab_overlap" -> ((s, d) => {
      val types = TestData.documents(s, d)
        .select(col("lang"),
          explode(regexp_extract_all(col("text"), lit("[a-z0-9]+"), lit(0)))
            .as("tok"))
        .distinct()
        .ckpt() // sizes + both sides of the pair join
      val sz = types.groupBy("lang").agg(count(lit(1)).as("sz"))
      val inter = types.select(col("lang").as("lang_a"), col("tok"))
        .join(types.select(col("lang").as("lang_b"), col("tok")), "tok")
        .filter(col("lang_a") < col("lang_b"))
        .groupBy("lang_a", "lang_b").agg(count(lit(1)).as("n_inter"))
      sz.select(col("lang").as("lang_a"), col("sz").as("size_a"))
        .join(sz.select(col("lang").as("lang_b"), col("sz").as("size_b")),
          col("lang_a") < col("lang_b"))
        .join(inter, Seq("lang_a", "lang_b"), "left")
        .withColumn("n_inter", coalesce(col("n_inter"), lit(0L)))
        .withColumn("jaccard", when(
          col("size_a") + col("size_b") - col("n_inter") > 0,
          r4(col("n_inter").cast("double")
            / (col("size_a") + col("size_b") - col("n_inter"))
              .cast("double"))))
        .select("lang_a", "lang_b", "size_a", "size_b", "n_inter",
          "jaccard")
        .orderBy("lang_a", "lang_b")
    }),

    // GOOD-TURING MASS (round 13): the frequency-of-frequencies
    // readout per language — hapax count N₁, dis legomena N₂, and
    // the Good-Turing unseen-probability estimate p₀ = N₁/N: the
    // number a language model's smoothing layer and a corpus-growth
    // plan both start from ("how much probability mass belongs to
    // words we have not seen yet"). Complements heaps_law (growth
    // CURVE) with the single-sample point estimate. Vocabulary-folded
    // type table, exact BIGINT spectrum counts, one r4'd division.
    "text_good_turing" -> ((s, d) =>
      TestData.documents(s, d)
        .select(col("lang"),
          explode(regexp_extract_all(col("text"), lit("[a-z0-9]+"), lit(0)))
            .as("tok"))
        .groupBy("lang", "tok").agg(count(lit(1)).as("f"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_types"), sum("f").as("n_tokens"),
          sum(when(col("f") === 1, 1L).otherwise(0L)).as("n_hapax"),
          sum(when(col("f") === 2, 1L).otherwise(0L)).as("n_dis"))
        .withColumn("p_unseen", when(col("n_tokens") > 0,
          r4(col("n_hapax").cast("double") / col("n_tokens").cast("double"))))
        .select("lang", "n_types", "n_tokens", "n_hapax", "n_dis",
          "p_unseen")
        .orderBy("lang")),

    // LEXICAL DENSITY (round 13): per-language content-word share at
    // BOTH grains — token occurrences (how much of the running text
    // is content) and vocabulary types (how much of the lexicon is) —
    // the corpus-mix readout next to yule_k/simpson when comparing
    // languages whose function-word rates differ structurally.
    // text_quality_score reads a per-DOC stopword ratio; this is the
    // lang-level rollup off the VOCABULARY-SHAPED (lang, token) type
    // table (the marginals fold: corpus → type table once, everything
    // after is vocabulary-sized). Same 5-word stopword list as RAKE /
    // quality_rules, interpolated into both engines. Exact BIGINT
    // counts; two r4'd divisions on the lang-grain readout, guarded.
    "text_lexical_density" -> ((s, d) =>
      TestData.documents(s, d)
        .select(col("lang"),
          explode(regexp_extract_all(col("text"), lit("[a-z0-9]+"), lit(0)))
            .as("tok"))
        .groupBy("lang", "tok").agg(count(lit(1)).as("f"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_types"), sum("f").as("n_tokens"),
          sum(when(!col("tok").isin(stopwords: _*), col("f"))
            .otherwise(0L)).as("n_content_tokens"),
          sum(when(!col("tok").isin(stopwords: _*), 1L).otherwise(0L))
            .as("n_content_types"))
        .withColumn("token_density", when(col("n_tokens") > 0,
          r4(col("n_content_tokens").cast("double")
            / col("n_tokens").cast("double"))))
        .withColumn("type_density", when(col("n_types") > 0,
          r4(col("n_content_types").cast("double")
            / col("n_types").cast("double"))))
        .select("lang", "n_types", "n_tokens", "n_content_types",
          "n_content_tokens", "token_density", "type_density")
        .orderBy("lang")),

    // YULE'S K (round 10): the sample-size-invariant vocabulary-
    // richness constant per language — K = 10⁴·(Σf² − N)/N² over the
    // token frequency spectrum (0 for all-distinct text, →10⁴ for
    // one repeated token); the corpus-level sibling of per-doc
    // ttr_richness (TTR shrinks with N, K doesn't — that's why
    // corpus-level comparisons need it). Shape: the (lang, token)
    // TYPE table is vocabulary-sized; everything after is a
    // lang-grain rollup of exact BIGINTs; one mirrored division,
    // r4'd. Bound: Σf² ≤ N² < 2^63 for N ≲ 3e9 tokens per lang —
    // shard the token counts first past that.
    "text_yule_k" -> ((s, d) =>
      TestData.documents(s, d)
        .select(col("lang"),
          explode(regexp_extract_all(col("text"), lit("[a-z0-9]+"), lit(0)))
            .as("tok"))
        .groupBy("lang", "tok").agg(count(lit(1)).as("f"))
        .groupBy("lang")
        .agg(sum("f").as("n_tokens"), count(lit(1)).as("n_types"),
          sum(col("f") * col("f")).as("s2"))
        .withColumn("yule_k", r4(lit(10000.0)
          * (col("s2") - col("n_tokens")).cast("double")
          / (col("n_tokens").cast("double")
            * col("n_tokens").cast("double"))))
        .select("lang", "n_tokens", "n_types", "s2", "yule_k")
        .orderBy("lang")),

    // SIMPSON DIVERSITY (round 13): the collision view of lexical
    // richness per language — D = Σf(f−1)/(N(N−1)) is the exact
    // probability two tokens drawn without replacement are the SAME
    // type (0 all-distinct, →1 one token repeated), and 1/D is the
    // "effective vocabulary size" a tokenizer designer reads next
    // to text_heaps_law's growth curve. Complements yule_k (a
    // variance-form constant) with the unbiased probability form.
    // Shape: identical to yule_k — vocabulary-sized type table,
    // lang-grain exact-BIGINT rollup, one mirrored division r4'd at
    // the readout; N ≤ 1 ⇒ NULL D (definition-site guard),
    // Σf(f−1) = 0 (all types distinct) ⇒ D = 0 and NULL inverse.
    // Bound: Σf² ≤ N² < 2^63 for N ≲ 3e9 tokens/lang (yule_k's).
    "text_simpson_diversity" -> ((s, d) =>
      TestData.documents(s, d)
        .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
        .groupBy("lang", "tok").agg(count(lit(1)).as("f"))
        .groupBy("lang")
        .agg(sum("f").as("n_tokens"), count(lit(1)).as("n_types"),
          sum(col("f") * (col("f") - 1)).as("s_ff1"))
        .withColumn("simpson_d", when(col("n_tokens") > 1,
          r4(col("s_ff1").cast("double")
            / (col("n_tokens") * (col("n_tokens") - 1)).cast("double"))))
        .withColumn("inv_simpson",
          when(col("n_tokens") > 1 && col("s_ff1") > 0,
            r4((col("n_tokens") * (col("n_tokens") - 1)).cast("double")
              / col("s_ff1").cast("double"))))
        .select("lang", "n_tokens", "n_types", "s_ff1", "simpson_d",
          "inv_simpson")
        .orderBy("lang")),

    // JENSEN-SHANNON DIVERGENCE (round 10): JSD(lang ‖ corpus) over
    // token distributions per language — the bounded, symmetric
    // "how far is this slice from the mix" readout a training-mix
    // designer reads next to the temperature-sampling weights (PSI
    // needs numeric bins; JSD works on the vocabulary itself).
    // Algebra that keeps it vocabulary-shaped: tokens the lang never
    // uses contribute exactly q·ln2, so their total collapses to
    // (1 − Σ_{t∈lang} q_t)·ln2 — computed from the lang's OWN rows;
    // no lang × vocabulary completion join exists anywhere. Present-
    // token terms micro-nat-quantized before the sum (protocol);
    // the closure term and final ÷2 are one mirrored expression.
    "text_js_divergence" -> ((s, d) => {
      val c = TestData.documents(s, d)
        .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
        .groupBy("lang", "tok").agg(count(lit(1)).as("c"))
        .ckpt()
      val nl = c.groupBy("lang").agg(sum("c").as("n_lang"))
      val ct = c.groupBy("tok").agg(sum("c").as("c_tok"))
      val nAll = nl.agg(sum("n_lang").as("n_corpus"))
      c.join(broadcast(nl), "lang")
        .join(ct, "tok")
        .crossJoin(broadcast(nAll))
        .withColumn("p", col("c").cast("double")
          / col("n_lang").cast("double"))
        .withColumn("q", col("c_tok").cast("double")
          / col("n_corpus").cast("double"))
        .withColumn("term_u", floor(
          (col("p") * log(lit(2.0) * col("p") / (col("p") + col("q")))
            + col("q") * log(lit(2.0) * col("q") / (col("p") + col("q"))))
            * 1000000 + 0.5).cast("long"))
        .groupBy("lang")
        .agg(max("n_lang").as("n_lang"),
          max("n_corpus").as("n_corpus"),
          sum("term_u").as("sum_term_u"),
          sum("c_tok").as("sum_q_num"))
        .withColumn("jsd", r4(
          (col("sum_term_u") / 1000000.0
            + (lit(1.0) - col("sum_q_num").cast("double")
              / col("n_corpus")) * log(lit(2.0))) / 2.0))
        .select("lang", "n_lang", "sum_term_u", "jsd")
        .orderBy("lang")
    }),

    // DISTINCT-N DIVERSITY (round 14): distinct n-grams / total
    // n-grams for n ∈ {1, 2, 3} per language — the standard
    // generation-diversity metric (Li et al. 2016) a synthetic-data
    // pipeline reads before mixing model-generated text in (mode
    // collapse reads as a cratered distinct-2/3; TTR is its n=1
    // special case at corpus grain). ALL n's ride one tagged frame
    // (the sweep discipline): tokens n-gram via one array transform
    // per (doc, n) — no positional self-join; the count is a
    // vocabulary-shaped aggregate per (lang, n); one guarded r4
    // ratio. Exact countDistinct (no sketch — the ratio IS the
    // metric; at 100 TB swap in approx_count_distinct and declare
    // the rsd, the dau_sketch precedent).
    "text_distinct_n" -> ((s, d) => {
      import s.implicits._
      val base = TestData.documents(s, d)
        .select(col("lang"), split(col("text"), " ").as("toks"))
      val tagged = base
        .crossJoin(broadcast(Seq(1, 2, 3).toDF("n")))
        .select(col("lang"), col("n"), explode(expr(
          "CASE WHEN size(toks) < n THEN array() " +
            "ELSE transform(sequence(1, size(toks) - n + 1), " +
            "i -> array_join(slice(toks, i, n), ' ')) END")).as("g"))
      tagged.groupBy("lang", "n")
        .agg(count(lit(1)).as("total_ngrams"),
          countDistinct(col("g")).as("distinct_ngrams"))
        .withColumn("distinct_ratio", when(col("total_ngrams") > 0,
          r4(col("distinct_ngrams").cast("double")
            / col("total_ngrams").cast("double"))))
        .select("lang", "n", "total_ngrams", "distinct_ngrams",
          "distinct_ratio")
        .orderBy("lang", "n")
    }),

    // BURROWS DELTA (round 14): the stylometric distance between
    // language sub-corpora over the top-50 corpus words — the
    // authorship-attribution workhorse (Burrows 2002) repurposed as
    // the domain-similarity MATRIX a mixing pipeline reads
    // (lang_vocab_overlap counts shared types; Delta weighs shared
    // FUNCTION-WORD usage, which is what actually separates styles/
    // domains). Algebra win: z_a − z_b = (F_a − F_b)/σ_F — the mean
    // CANCELS in the pairwise delta, so no mean column exists
    // anywhere. Frequencies are integer micro-rates (c·1e6 DIV
    // n_lang — DIV ≡ // on nonnegatives), per-word variance an exact
    // BIGINT (L·ΣF² − (ΣF)²), and each |ΔF|/σ term micro-quantized
    // before the sum. Grid: 50 words × L langs completed by a
    // broadcast cross join (absent word ⇒ F = 0); pairs = C(L,2).
    // Zero-variance words contribute 0 and are excluded from the
    // divisor (n_scored). Top-50 via sort+limit
    // (TakeOrderedAndProject).
    "text_burrows_delta" -> ((s, d) => {
      val c = TestData.documents(s, d)
        .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
        .groupBy("lang", "tok").agg(count(lit(1)).as("c"))
        .ckpt() // three consumers: totals, top-50, grid
      val nl = c.groupBy("lang").agg(sum("c").as("n_lang"))
      val top = c.groupBy("tok").agg(sum("c").as("ct"))
        .orderBy(col("ct").desc, col("tok")).limit(50).select("tok")
      val grid = top.crossJoin(broadcast(nl))
        .join(c, Seq("lang", "tok"), "left")
        .withColumn("f_u", expr("coalesce(c, 0L) * 1000000 DIV n_lang"))
        .select("tok", "lang", "f_u")
        .ckpt() // stats + both pair sides
      val stats = grid.groupBy("tok")
        .agg(count(lit(1)).as("l"), sum("f_u").as("sf"),
          sum(col("f_u") * col("f_u")).as("sff"))
        .withColumn("var_num",
          col("l") * col("sff") - col("sf") * col("sf"))
        .select("tok", "l", "var_num")
      val ga = grid.select(col("tok"), col("lang").as("lang_a"),
        col("f_u").as("fa"))
      val gb = grid.select(col("tok").as("tok2"),
        col("lang").as("lang_b"), col("f_u").as("fb"))
      ga.join(gb, col("tok") === col("tok2")
          && col("lang_a") < col("lang_b"))
        .join(broadcast(stats), Seq("tok"))
        .withColumn("term_u", when(col("var_num") > 0,
          floor(abs(col("fa") - col("fb")).cast("double")
            / sqrt(col("var_num").cast("double")
              / (col("l") * (col("l") - 1)).cast("double"))
            * 1000000 + 0.5).cast("long")).otherwise(0L))
        .groupBy("lang_a", "lang_b")
        .agg(count(lit(1)).as("n_words"),
          sum(when(col("var_num") > 0, 1L).otherwise(0L)).as("n_scored"),
          sum("term_u").as("delta_sum_u"))
        .withColumn("delta", when(col("n_scored") > 0,
          r4(col("delta_sum_u").cast("double")
            / (lit(1000000.0) * col("n_scored").cast("double")))))
        .select("lang_a", "lang_b", "n_words", "n_scored", "delta")
        .orderBy("lang_a", "lang_b")
    }),

    // KL DIVERGENCE lang ‖ corpus (round 14): the DIRECTED
    // divergence next to text_js_divergence's symmetric one — KL is
    // what importance-weighting / domain-reweighting actually uses
    // (DSIR-style mixing weights are likelihood ratios against the
    // corpus-wide distribution; JS can rank drift but cannot weight
    // it). Direction matters and is the cheap one: every token of
    // the lang EXISTS in the corpus distribution (q > 0 on every
    // p > 0 row by construction), so there is NO absent-mass closure
    // term — the sum lives entirely on the lang's own vocabulary
    // rows. Each p·ln(p/q) term micro-nat-quantized BEFORE the sum
    // (PSI protocol); vocabulary-shaped grid, never corpus-grain.
    "text_kl_divergence" -> ((s, d) => {
      val c = TestData.documents(s, d)
        .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
        .groupBy("lang", "tok").agg(count(lit(1)).as("c"))
        .ckpt()
      val nl = c.groupBy("lang").agg(sum("c").as("n_lang"))
      val ct = c.groupBy("tok").agg(sum("c").as("c_tok"))
      val nAll = nl.agg(sum("n_lang").as("n_corpus"))
      c.join(broadcast(nl), "lang")
        .join(ct, "tok")
        .crossJoin(broadcast(nAll))
        .withColumn("p", col("c").cast("double")
          / col("n_lang").cast("double"))
        .withColumn("q", col("c_tok").cast("double")
          / col("n_corpus").cast("double"))
        .withColumn("term_u",
          floor(col("p") * log(col("p") / col("q")) * 1000000 + 0.5)
            .cast("long"))
        .groupBy("lang")
        .agg(max("n_lang").as("n_lang"), sum("term_u").as("sum_term_u"))
        .withColumn("kl_nats", r4(col("sum_term_u") / 1000000.0))
        .select("lang", "n_lang", "sum_term_u", "kl_nats")
        .orderBy("lang")
    }),

    // CHARACTER ENTROPY (round 10): per-doc Shannon entropy of the
    // character distribution — the Gopher-style quality gate that
    // catches what token-level stats miss (key-mash noise scores
    // HIGH, repeated-char padding scores LOW; natural text sits in a
    // narrow band). Per-(doc, char) counts shuffle on the doc (char
    // alphabet bounds the per-doc fanout); each −p·ln p term
    // quantized to integer MICRO-NATS before the order-free sum
    // (the PSI/entropy protocol); doc-grain join, never broadcast.
    "text_char_entropy" -> ((s, d) => {
      val ch = TestData.documents(s, d)
        .select(col("doc_id"),
          explode(regexp_extract_all(col("text"), lit("."), lit(0)))
            .as("ch"))
        .groupBy("doc_id", "ch").agg(count(lit(1)).as("c"))
      val tot = ch.groupBy("doc_id")
        .agg(sum("c").as("n_chars_seen"),
          count(lit(1)).as("n_distinct_chars"))
      ch.join(tot, "doc_id")
        .withColumn("p", col("c").cast("double")
          / col("n_chars_seen").cast("double"))
        .withColumn("term_u",
          floor(-(col("p") * log(col("p"))) * 1000000 + 0.5).cast("long"))
        .groupBy("doc_id")
        .agg(max("n_chars_seen").as("n_chars_seen"),
          max("n_distinct_chars").as("n_distinct_chars"),
          sum("term_u").as("entropy_micro"))
        .withColumn("entropy", r4(col("entropy_micro") / 1000000.0))
        .select("doc_id", "n_chars_seen", "n_distinct_chars",
          "entropy_micro", "entropy")
        .orderBy("doc_id")
    }),

    // TERM BURSTINESS (round 10): Church's "one sense per discourse"
    // readout — for the top-20 corpus terms, total occurrences (cf),
    // documents containing (df), burstiness cf/df (occurrences per
    // containing doc: function words ≈ uniform, topical words
    // clump), and the smoothed IDF. The spine is the (token, doc)
    // DISTINCT pair table shuffled on the token (vocabulary-sized
    // aggregate output); the top-k rank runs over the vocab-sized
    // type table (the text_wordcount_topk precedent), never the
    // corpus. IDF's ln is the only transcendental — mirrored op
    // order, r4'd.
    "text_term_burstiness" -> ((s, d) => {
      val W = org.apache.spark.sql.expressions.Window
      val toks = TestData.documents(s, d)
        .select(col("doc_id"),
          explode(regexp_extract_all(col("text"), lit("[a-z0-9]+"), lit(0)))
            .as("tok"))
      val byTok = toks.groupBy("tok")
        .agg(count(lit(1)).as("cf"), countDistinct("doc_id").as("df"))
      val nDocs = TestData.documents(s, d)
        .agg(countDistinct("doc_id").as("n_docs"))
      byTok.crossJoin(broadcast(nDocs))
        .withColumn("rk", row_number().over(
          W.orderBy(col("cf").desc, col("tok"))))
        .filter(col("rk") <= 20)
        .withColumn("burstiness",
          r4(col("cf").cast("double") / col("df").cast("double")))
        .withColumn("idf", r4(log((col("n_docs") + 1).cast("double")
          / (col("df") + 1).cast("double"))))
        .select("rk", "tok", "cf", "df", "burstiness", "idf")
        .orderBy("rk")
    })
  )

  private val stopSql = stopwords.map(w => s"'$w'").mkString("(", ", ", ")")

  val oracles: Map[String, String] = Map(
    "text_ttr_richness" ->
      """WITH t AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |c AS (SELECT doc_id, tok, count(*)::BIGINT AS c FROM t GROUP BY 1, 2)
        |SELECT doc_id, sum(c)::BIGINT AS n_toks, count(*)::BIGINT AS n_types,
        |  sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)::BIGINT AS n_hapax,
        |  floor((count(*)::DOUBLE / sum(c))*10000 + 0.5)/10000 AS ttr,
        |  floor((sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)::DOUBLE / count(*))
        |    *10000 + 0.5)/10000 AS hapax_ratio
        |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "text_ngram_novelty" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |tg AS (
        |  SELECT DISTINCT doc_id, tri FROM (
        |    SELECT doc_id, unnest(list_transform(range(1, len(toks) - 1),
        |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS tri
        |    FROM t WHERE len(toks) >= 3)),
        |f AS (SELECT tri, min(doc_id) AS fdoc FROM tg GROUP BY 1)
        |SELECT doc_id, count(*)::BIGINT AS n_shingles,
        |  sum(CASE WHEN fdoc = doc_id THEN 1 ELSE 0 END)::BIGINT AS n_novel,
        |  floor((sum(CASE WHEN fdoc = doc_id THEN 1 ELSE 0 END)::DOUBLE
        |      / count(*))*10000 + 0.5)/10000 AS novelty
        |FROM tg JOIN f USING (tri)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "text_lang_id" ->
      """WITH t AS (
        |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |lt AS (SELECT lang AS pl, count(*) AS lang_n FROM t GROUP BY 1),
        |prof AS (
        |  SELECT t.lang AS pl, token AS ptok,
        |         floor((ln(count(*)::DOUBLE / any_value(lang_n)))*10000 + 0.5)/10000 AS ln_p
        |  FROM t JOIN lt ON t.lang = lt.pl GROUP BY 1, 2),
        |sc AS (
        |  SELECT doc_id, lang, pl,
        |         floor((sum(ln_p))*10000 + 0.5)/10000 AS score
        |  FROM t JOIN prof ON t.token = prof.ptok
        |  GROUP BY 1, 2, 3),
        |best AS (
        |  SELECT doc_id, lang, pl,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, pl) AS rn
        |  FROM sc)
        |SELECT lang, pl AS predicted, count(*) AS n
        |FROM best WHERE rn = 1 GROUP BY lang, pl
        |ORDER BY lang, predicted""".stripMargin,
    "text_quality_score" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |m AS (
        |  SELECT doc_id, len(toks) AS n_toks,
        |    len(list_filter(toks, x -> x IN $stopSql)) AS stop_n,
        |    list_sum(list_transform(toks, x -> length(x)))::DOUBLE / len(toks) AS avg_len
        |  FROM t)
        |SELECT doc_id, n_toks,
        |  floor((stop_n::DOUBLE / n_toks)*10000 + 0.5)/10000 AS stop_ratio,
        |  floor((avg_len)*10000 + 0.5)/10000 AS avg_tok_len,
        |  floor((least(n_toks::DOUBLE / 100.0, 1.0) * 0.5
        |    + (1.0 - stop_n::DOUBLE / n_toks) * 0.3
        |    + least(avg_len / 8.0, 1.0) * 0.2)*10000 + 0.5)/10000 AS quality
        |FROM m ORDER BY doc_id""".stripMargin,
    "text_token_count" ->
      """SELECT doc_id, n_chars,
        |  len(string_split(text, ' ')) AS ws_tokens,
        |  len(regexp_extract_all(text, '[a-z0-9]+')) AS re_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_tfidf_top" ->
      """WITH tf AS (
        |  SELECT doc_id, token, count(*) AS tf FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |    FROM documents)
        |  GROUP BY doc_id, token),
        |idf AS (
        |  SELECT token AS t,
        |    floor((ln((SELECT count(*) FROM documents)::DOUBLE / count(*)))*10000
        |      + 0.5)/10000 AS idf
        |  FROM tf GROUP BY token),
        |scored AS (
        |  SELECT doc_id, token, tf * idf AS score,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY tf * idf DESC, token) AS rn
        |  FROM tf JOIN idf ON tf.token = idf.t)
        |SELECT doc_id, token AS top_term,
        |  floor((score)*10000 + 0.5)/10000 AS tfidf
        |FROM scored WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    // SNM is NOT sound blocking (rank adjacency is part of the
    // semantics, not a plan trick), so the oracle mirrors the rank
    // window exactly; skey stays in [a-z0-9 ] so binary string
    // ordering agrees between engines.
    "dedup_sorted_neighborhood" ->
      """WITH n AS (
        |  SELECT doc_id, lang, text,
        |    coalesce(trim(regexp_replace(regexp_replace(
        |      lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')), '') AS skey
        |  FROM documents),
        |r AS (SELECT *, row_number() OVER (PARTITION BY lang
        |        ORDER BY skey, doc_id) AS rnk FROM n),
        |p AS (SELECT a.doc_id AS ia, b.doc_id AS ib,
        |        levenshtein(a.text, b.text) AS lev
        |      FROM r a JOIN r b ON a.lang = b.lang
        |        AND b.rnk BETWEEN a.rnk + 1 AND a.rnk + 4)
        |SELECT least(ia, ib) AS id_a, greatest(ia, ib) AS id_b, lev
        |FROM p WHERE lev <= 20 ORDER BY id_a, id_b""".stripMargin,
    // Unblocked form on purpose: the Spark side's length-bucket
    // blocking is SOUND (no ≤-20 pair escapes it), so the oracle
    // checks the semantic result without mirroring the plan trick.
    "dedup_fuzzy_pairs" ->
      """SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  levenshtein(a.text, b.text) AS lev
        |FROM documents a JOIN documents b
        |  ON a.lang = b.lang AND a.doc_id < b.doc_id
        |WHERE levenshtein(a.text, b.text) <= 20
        |ORDER BY id_a, id_b""".stripMargin,
    "text_rolling_hash" ->
      """WITH f AS (
        |  SELECT doc_id, list_reduce(list_prepend(0::BIGINT,
        |    list_transform(string_split(text, ' '),
        |      t -> ('0x' || substring(md5(t), 1, 7))::BIGINT)),
        |    (a, b) -> (a * 31 + b) % 2147483647) AS rh
        |  FROM documents)
        |SELECT doc_id, rh, count(*) OVER (PARTITION BY rh) AS n_same_seq
        |FROM f ORDER BY doc_id""".stripMargin,
    "text_fingerprint" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
        |      AS fp
        |  FROM documents)
        |SELECT doc_id, fp, count(*) OVER (PARTITION BY fp) AS n_same_fp
        |FROM f ORDER BY doc_id""".stripMargin,
    // Exact-integer 60-bit fold: hex→BIGINT via the '0x' cast, bit
    // weights summed per (doc, b), recombined with shifts ≤ 59 (DuckDB
    // << range-checks bit 63; 59 is safe). sum(BIGINT) → HUGEINT, so
    // the final fold casts ::BIGINT to match Spark's LongType.
    "dedup_simhash" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |h AS (
        |  SELECT doc_id,
        |    ('0x' || substring(md5(token), 1, 15))::BIGINT AS hv
        |  FROM tok),
        |bits AS (
        |  SELECT doc_id, b,
        |    sum(CASE WHEN (hv >> b) & 1 = 1 THEN 1 ELSE -1 END) AS w
        |  FROM h, LATERAL (SELECT unnest(range(0, 60)) AS b)
        |  GROUP BY doc_id, b)
        |SELECT doc_id,
        |  sum(CASE WHEN w > 0 THEN (1::BIGINT << b) ELSE 0 END)::BIGINT AS simhash
        |FROM bits GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // Same stopword split, position-ordered phrase assembly, DIV
    // ratios and DISTINCT-phrase top-20.
    "text_rake_keywords" ->
      s"""WITH t AS (
        |  SELECT doc_id, regexp_extract_all(text, '[a-z0-9]+') AS toks
        |  FROM documents),
        |tok AS (
        |  SELECT doc_id, i AS pos, toks[i] AS tok,
        |    CASE WHEN toks[i] IN (${stopwords.map(w => s"'$w'")
                                     .mkString(", ")})
        |      THEN 1 ELSE 0 END AS is_stop
        |  FROM t, LATERAL (SELECT unnest(range(1, len(toks) + 1)) AS i)),
        |ph AS (
        |  SELECT doc_id, pos, tok, is_stop,
        |    sum(is_stop) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pid
        |  FROM tok),
        |cand AS (SELECT doc_id, pid, pos, tok FROM ph WHERE is_stop = 0),
        |plen AS (SELECT doc_id, pid, count(*)::BIGINT AS plen
        |         FROM cand GROUP BY 1, 2),
        |occ AS (SELECT c.doc_id, c.pid, c.pos, c.tok, plen.plen
        |        FROM cand c JOIN plen
        |          ON c.doc_id = plen.doc_id AND c.pid = plen.pid),
        |wr AS (SELECT tok,
        |         (sum(plen) * 1000000 // count(*))::BIGINT AS ratio_u
        |       FROM occ GROUP BY 1),
        |phr AS (
        |  SELECT occ.doc_id, occ.pid,
        |    string_agg(occ.tok, ' ' ORDER BY occ.pos) AS phrase,
        |    count(*)::BIGINT AS n_words,
        |    sum(wr.ratio_u)::BIGINT AS score_u
        |  FROM occ JOIN wr ON occ.tok = wr.tok
        |  GROUP BY 1, 2),
        |u AS (SELECT DISTINCT phrase, n_words, score_u FROM phr)
        |SELECT rk, phrase, n_words, score_u FROM (
        |  SELECT *, row_number() OVER (ORDER BY score_u DESC, phrase)
        |    AS rk
        |  FROM u)
        |WHERE rk <= 20 ORDER BY rk""".stripMargin,
    // The oracle ranks docs with a plain window (single-node DuckDB);
    // the Spark side's rangedRank/shardedPrefixSum reconstruction is
    // bit-identical by contract. Both logs micro-quantized before
    // the exact-BIGINT OLS sums; intercept mirrored op-for-op.
    // Zipf mirrored: monolithic rank window (bit-identical to
    // rangedRank by its contract), x1e4 log quantizers, double-first
    // centered moments, guarded readout.
    "text_zipf_fit" ->
      """WITH w AS (
        |  SELECT word, count(*)::BIGINT AS n FROM (
        |    SELECT unnest(string_split(text, ' ')) AS word
        |    FROM documents)
        |  WHERE length(word) > 0 GROUP BY 1),
        |r AS (
        |  SELECT n, row_number() OVER (ORDER BY n DESC, word) AS rank
        |  FROM w),
        |p AS (
        |  SELECT floor(ln(rank::DOUBLE) * 10000 + 0.5)::BIGINT AS x_u,
        |    floor(ln(n::DOUBLE) * 10000 + 0.5)::BIGINT AS y_u
        |  FROM r),
        |a AS (
        |  SELECT count(*)::BIGINT AS nt, sum(x_u)::BIGINT AS sx,
        |    sum(y_u)::BIGINT AS sy, sum(x_u * y_u)::BIGINT AS sxy,
        |    sum(x_u * x_u)::BIGINT AS sxx, sum(y_u * y_u)::BIGINT AS syy
        |  FROM p),
        |b AS (
        |  SELECT *,
        |    nt::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE AS cxy,
        |    nt::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE AS cxx,
        |    nt::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE AS cyy
        |  FROM a)
        |SELECT nt AS n_types,
        |  CASE WHEN cxx > 0 THEN
        |    floor(cxy / cxx * 10000 + 0.5) / 10000 END AS slope,
        |  CASE WHEN cxx > 0 THEN
        |    floor((sy::DOUBLE / nt::DOUBLE
        |      - (cxy / cxx) * (sx::DOUBLE / nt::DOUBLE)) / 10000.0
        |      * 10000 + 0.5) / 10000 END AS intercept_ln,
        |  CASE WHEN cxx > 0 AND cyy > 0 THEN
        |    floor(cxy * cxy / (cxx * cyy) * 10000 + 0.5) / 10000
        |    END AS r2
        |FROM b""".stripMargin,
    "text_heaps_law" ->
      """WITH d AS (
        |  SELECT doc_id, text,
        |    len(string_split(text, ' '))::BIGINT AS ntok,
        |    row_number() OVER (ORDER BY doc_id) AS rnk
        |  FROM documents),
        |nn AS (SELECT max(rnk)::BIGINT AS nd FROM d),
        |cum AS (
        |  SELECT rnk, text,
        |    (sum(ntok) OVER (ORDER BY rnk
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT
        |      AS tokens_seen
        |  FROM d),
        |cp AS MATERIALIZED (
        |  SELECT rnk AS rnk_c, tokens_seen AS n_tokens
        |  FROM cum CROSS JOIN nn
        |  WHERE (rnk & (rnk - 1)) = 0 OR rnk = nd),
        |tf AS (
        |  SELECT tok, min(rnk) AS frnk FROM (
        |    SELECT rnk, unnest(string_split(text, ' ')) AS tok FROM d)
        |  GROUP BY tok),
        |vc AS (
        |  SELECT cp.rnk_c, count(*)::BIGINT AS vocab
        |  FROM tf JOIN cp ON tf.frnk <= cp.rnk_c
        |  GROUP BY 1),
        |pts AS (
        |  SELECT floor(ln(cp.n_tokens::DOUBLE) * 1000000 + 0.5)::BIGINT
        |      AS x_u,
        |    floor(ln(vc.vocab::DOUBLE) * 1000000 + 0.5)::BIGINT AS y_u
        |  FROM cp JOIN vc USING (rnk_c)),
        |s AS (
        |  SELECT count(*)::BIGINT AS n_points, sum(x_u)::BIGINT AS sx,
        |    sum(y_u)::BIGINT AS sy, sum(x_u * y_u)::BIGINT AS sxy,
        |    sum(x_u * x_u)::BIGINT AS sxx
        |  FROM pts)
        |SELECT n_points, sx, sy,
        |  CASE WHEN n_points * sxx - sx * sx > 0 THEN
        |    floor((n_points * sxy - sx * sy)::DOUBLE
        |      / (n_points * sxx - sx * sx)::DOUBLE * 10000 + 0.5) / 10000
        |    END AS beta,
        |  CASE WHEN n_points * sxx - sx * sx > 0 THEN
        |    floor(exp(((sy::DOUBLE
        |      - (n_points * sxy - sx * sy)::DOUBLE
        |        / (n_points * sxx - sx * sx)::DOUBLE
        |        * sx::DOUBLE) / n_points::DOUBLE) / 1000000.0)
        |      * 10000 + 0.5) / 10000
        |    END AS k_coef
        |FROM s""".stripMargin,
    // Monolithic per-lang frequency rank ≡ rangedRank; cuts unnest
    // from one ranked frame.
    "text_vocab_coverage" ->
      """WITH wf AS (
        |  SELECT lang, token, count(*)::BIGINT AS n
        |  FROM (SELECT lang, unnest(string_split(text, ' ')) AS token
        |        FROM documents)
        |  GROUP BY 1, 2),
        |r AS (
        |  SELECT lang, n,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY n DESC, token)::BIGINT AS rnk
        |  FROM wf),
        |x AS (
        |  SELECT lang, n, rnk, cut
        |  FROM r, LATERAL (SELECT unnest([10, 100, 1000]) AS cut)),
        |a AS (
        |  SELECT lang, cut::BIGINT AS cut, count(*)::BIGINT AS n_vocab,
        |    sum(n)::BIGINT AS total_tokens,
        |    sum(CASE WHEN rnk <= cut THEN n ELSE 0 END)::BIGINT
        |      AS covered_tokens
        |  FROM x GROUP BY 1, 2)
        |SELECT lang, cut, n_vocab, total_tokens, covered_tokens,
        |  CASE WHEN total_tokens > 0 THEN
        |    floor(covered_tokens::DOUBLE / total_tokens::DOUBLE
        |      * 10000 + 0.5) / 10000 END AS coverage
        |FROM a ORDER BY lang, cut""".stripMargin,
    "text_zipf_slope" ->
      """WITH wf AS (
        |  SELECT lang, token, count(*)::BIGINT AS n
        |  FROM (SELECT lang, unnest(string_split(text, ' ')) AS token
        |        FROM documents)
        |  GROUP BY 1, 2),
        |r AS (
        |  SELECT lang,
        |    floor((ln(row_number() OVER (PARTITION BY lang
        |      ORDER BY n DESC, token)))*10000 + 0.5)/10000 AS lr,
        |    floor((ln(n))*10000 + 0.5)/10000 AS lf
        |  FROM wf)
        |SELECT lang, count(*)::BIGINT AS n_words,
        |  floor((regr_slope(lf, lr))*10000 + 0.5)/10000 AS zipf_slope
        |FROM r GROUP BY lang ORDER BY lang""".stripMargin,
    // UNBLOCKED brute force over the simhash CTE — the Spark side's
    // band blocking is sound, so results are identical.
    "dedup_simhash_pairs" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |h AS (
        |  SELECT doc_id,
        |    ('0x' || substring(md5(token), 1, 15))::BIGINT AS hv
        |  FROM tok),
        |bits AS (
        |  SELECT doc_id, b,
        |    sum(CASE WHEN (hv >> b) & 1 = 1 THEN 1 ELSE -1 END) AS w
        |  FROM h, LATERAL (SELECT unnest(range(0, 60)) AS b)
        |  GROUP BY doc_id, b),
        |sh AS (
        |  SELECT doc_id,
        |    sum(CASE WHEN w > 0 THEN (1::BIGINT << b) ELSE 0 END)::BIGINT
        |      AS simhash
        |  FROM bits GROUP BY doc_id)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  bit_count(xor(a.simhash, b.simhash))::INT AS hamming
        |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
        |ORDER BY id_a, id_b""".stripMargin,
    "text_hash_features" ->
      """SELECT doc_id,
        |  ('0x' || substring(md5(token), 1, 4))::BIGINT % 32 AS bucket,
        |  count(*)::BIGINT AS cnt
        |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |      FROM documents)
        |GROUP BY 1, 2 ORDER BY doc_id, bucket""".stripMargin,
    // Same marginals (from the bigram table), same single-ln op
    // order (c12·N as DOUBLE, / (c1·c2 as DOUBLE)), micro-nat
    // quantization. DuckDB lists are 1-based; range end-exclusive.
    "text_collocations_pmi" ->
      """WITH t AS (
        |  SELECT lang, string_split(text, ' ') AS toks FROM documents
        |  WHERE len(string_split(text, ' ')) >= 2),
        |b AS (
        |  SELECT lang, toks[i] AS w1, toks[i+1] AS w2
        |  FROM t, LATERAL (SELECT unnest(range(1, len(toks))) AS i)),
        |big AS (
        |  SELECT lang, w1, w2, count(*)::BIGINT AS c12
        |  FROM b GROUP BY 1, 2, 3),
        |l AS (SELECT lang, w1, sum(c12)::BIGINT AS c1 FROM big GROUP BY 1, 2),
        |r AS (SELECT lang, w2, sum(c12)::BIGINT AS c2 FROM big GROUP BY 1, 2),
        |n AS (SELECT lang, sum(c12)::BIGINT AS n_big FROM big GROUP BY 1)
        |SELECT big.lang, big.w1, big.w2, c12,
        |  floor(ln((c12::DOUBLE * n_big) / (c1::DOUBLE * c2))
        |    * 1000000 + 0.5)::BIGINT AS pmi_u
        |FROM big
        |JOIN l ON big.lang = l.lang AND big.w1 = l.w1
        |JOIN r ON big.lang = r.lang AND big.w2 = r.w2
        |JOIN n ON big.lang = n.lang
        |WHERE c12 >= 5
        |ORDER BY big.lang, big.w1, big.w2""".stripMargin,
    // Same counts (re-token words, [.!?]+ runs floor 1, per-word
    // vowel-group runs floor 1), same mirrored score expression.
    // list_sum returns DOUBLE in DuckDB — exact for these integer
    // values, cast back to BIGINT.
    "text_readability" ->
      """WITH c AS (
        |  SELECT doc_id,
        |    len(regexp_extract_all(text, '[a-z0-9]+'))::BIGINT AS n_words,
        |    greatest(1, len(regexp_extract_all(text, '[.!?]+')))::BIGINT
        |      AS n_sentences,
        |    coalesce(list_sum(list_transform(
        |      regexp_extract_all(text, '[a-z0-9]+'),
        |      w -> greatest(1, len(regexp_extract_all(w, '[aeiouy]+'))))),
        |      0)::BIGINT AS n_syllables
        |  FROM documents)
        |SELECT doc_id, n_words, n_sentences, n_syllables,
        |  floor((206.835
        |    - 1.015 * (n_words::DOUBLE / n_sentences::DOUBLE)
        |    - 84.6 * (n_syllables::DOUBLE / n_words::DOUBLE))
        |    * 10000 + 0.5) / 10000 AS flesch
        |FROM c WHERE n_words > 0 ORDER BY doc_id""".stripMargin,
    // Complex = ≥3 vowel-group syllables via list_filter; same
    // word/sentence extraction as the Flesch oracle.
    "text_gunning_fog" ->
      """WITH c AS (
        |  SELECT doc_id,
        |    len(regexp_extract_all(text, '[a-z0-9]+'))::BIGINT AS n_words,
        |    greatest(1, len(regexp_extract_all(text, '[.!?]+')))::BIGINT
        |      AS n_sentences,
        |    len(list_filter(regexp_extract_all(text, '[a-z0-9]+'),
        |      w -> len(regexp_extract_all(w, '[aeiouy]+')) >= 3))::BIGINT
        |      AS n_complex
        |  FROM documents)
        |SELECT doc_id, n_words, n_sentences, n_complex,
        |  floor(0.4 * (n_words::DOUBLE / n_sentences::DOUBLE
        |    + 100.0 * (n_complex::DOUBLE / n_words::DOUBLE))
        |    * 10000 + 0.5) / 10000 AS fog
        |FROM c WHERE n_words > 0 ORDER BY doc_id""".stripMargin,
    // Same complex-word filter as the fog oracle; IEEE sqrt on the
    // identical quotient; one mirrored expression.
    "text_smog" ->
      """WITH c AS (
        |  SELECT doc_id,
        |    len(regexp_extract_all(text, '[a-z0-9]+'))::BIGINT AS n_words,
        |    greatest(1, len(regexp_extract_all(text, '[.!?]+')))::BIGINT
        |      AS n_sentences,
        |    len(list_filter(regexp_extract_all(text, '[a-z0-9]+'),
        |      w -> len(regexp_extract_all(w, '[aeiouy]+')) >= 3))::BIGINT
        |      AS n_poly
        |  FROM documents)
        |SELECT doc_id, n_words, n_sentences, n_poly,
        |  floor((1.043 * sqrt(n_poly::DOUBLE * 30.0
        |    / n_sentences::DOUBLE) + 3.1291) * 10000 + 0.5) / 10000
        |    AS smog
        |FROM c WHERE n_words > 0 ORDER BY doc_id""".stripMargin,
    // Letters via list_transform len + list_sum; same word/sentence
    // extraction as the Flesch oracle; one mirrored expression.
    "text_coleman_liau" ->
      """WITH c AS (
        |  SELECT doc_id,
        |    len(regexp_extract_all(text, '[a-z0-9]+'))::BIGINT AS n_words,
        |    greatest(1, len(regexp_extract_all(text, '[.!?]+')))::BIGINT
        |      AS n_sentences,
        |    coalesce(list_sum(list_transform(
        |      regexp_extract_all(text, '[a-z0-9]+'), w -> len(w))),
        |      0)::BIGINT AS n_letters
        |  FROM documents)
        |SELECT doc_id, n_words, n_sentences, n_letters,
        |  floor((0.0588 * (100.0 * n_letters::DOUBLE / n_words::DOUBLE)
        |    - 0.296 * (100.0 * n_sentences::DOUBLE / n_words::DOUBLE)
        |    - 15.8) * 10000 + 0.5) / 10000 AS cli
        |FROM c WHERE n_words > 0 ORDER BY doc_id""".stripMargin,
    // Same counts, opposite ratio weights (ARI formula), mirrored.
    "text_ari" ->
      """WITH c AS (
        |  SELECT doc_id,
        |    len(regexp_extract_all(text, '[a-z0-9]+'))::BIGINT AS n_words,
        |    greatest(1, len(regexp_extract_all(text, '[.!?]+')))::BIGINT
        |      AS n_sentences,
        |    coalesce(list_sum(list_transform(
        |      regexp_extract_all(text, '[a-z0-9]+'), w -> len(w))),
        |      0)::BIGINT AS n_letters
        |  FROM documents)
        |SELECT doc_id, n_words, n_sentences, n_letters,
        |  floor((4.71 * (n_letters::DOUBLE / n_words::DOUBLE)
        |    + 0.5 * (n_words::DOUBLE / n_sentences::DOUBLE)
        |    - 21.43) * 10000 + 0.5) / 10000 AS ari
        |FROM c WHERE n_words > 0 ORDER BY doc_id""".stripMargin,
    // Per-row closed-form δ/z with the flat prior; quantized |z|
    // sort key; top-20.
    "text_log_odds_words" ->
      """WITH f AS (
        |  SELECT tok,
        |    sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS y1,
        |    sum(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END)::BIGINT AS y2
        |  FROM (SELECT lang, unnest(regexp_extract_all(text, '[a-z0-9]+'))
        |          AS tok
        |        FROM documents)
        |  GROUP BY 1),
        |t AS (
        |  SELECT sum(y1)::BIGINT AS n1, sum(y2)::BIGINT AS n2,
        |    count(*)::BIGINT AS v
        |  FROM f),
        |z AS (
        |  SELECT tok, y1, y2,
        |    CASE WHEN n1 + v - y1 - 1 > 0 AND n2 + v - y2 - 1 > 0 THEN
        |      ln((y1 + 1)::DOUBLE / (n1 + v - y1 - 1)::DOUBLE)
        |        - ln((y2 + 1)::DOUBLE / (n2 + v - y2 - 1)::DOUBLE)
        |      END AS delta
        |  FROM f CROSS JOIN t),
        |w AS (
        |  SELECT *,
        |    delta / sqrt(1.0 / (y1 + 1)::DOUBLE + 1.0 / (y2 + 1)::DOUBLE)
        |      AS z_raw
        |  FROM z),
        |top AS (
        |  SELECT * FROM w WHERE z_raw IS NOT NULL
        |  ORDER BY floor(abs(z_raw) * 10000 + 0.5) / 10000 DESC, tok
        |  LIMIT 20)
        |SELECT tok, y1, y2,
        |  floor(delta * 10000 + 0.5) / 10000 AS log_odds,
        |  floor(z_raw * 10000 + 0.5) / 10000 AS z
        |FROM top
        |ORDER BY floor(abs(z_raw) * 10000 + 0.5) / 10000 DESC, tok""".stripMargin,
    // Distinct-type fold, token equi-join intersections, lang×lang
    // dimension completion.
    "text_lang_vocab_overlap" ->
      """WITH ty AS (
        |  SELECT DISTINCT lang, tok
        |  FROM (SELECT lang, unnest(regexp_extract_all(text, '[a-z0-9]+'))
        |          AS tok
        |        FROM documents)),
        |sz AS (SELECT lang, count(*)::BIGINT AS sz FROM ty GROUP BY 1),
        |inter AS (
        |  SELECT a.lang AS lang_a, b.lang AS lang_b,
        |    count(*)::BIGINT AS n_inter
        |  FROM ty a JOIN ty b ON a.tok = b.tok AND a.lang < b.lang
        |  GROUP BY 1, 2),
        |p AS (
        |  SELECT a.lang AS lang_a, b.lang AS lang_b,
        |    a.sz AS size_a, b.sz AS size_b
        |  FROM sz a JOIN sz b ON a.lang < b.lang)
        |SELECT p.lang_a, p.lang_b, p.size_a, p.size_b,
        |  coalesce(inter.n_inter, 0)::BIGINT AS n_inter,
        |  CASE WHEN p.size_a + p.size_b - coalesce(inter.n_inter, 0) > 0
        |    THEN floor(coalesce(inter.n_inter, 0)::DOUBLE
        |      / (p.size_a + p.size_b - coalesce(inter.n_inter, 0))::DOUBLE
        |      * 10000 + 0.5) / 10000 END AS jaccard
        |FROM p LEFT JOIN inter
        |  ON p.lang_a = inter.lang_a AND p.lang_b = inter.lang_b
        |ORDER BY p.lang_a, p.lang_b""".stripMargin,
    // Same type-table fold; exact spectrum counts.
    "text_good_turing" ->
      """WITH f AS (
        |  SELECT lang, tok, count(*)::BIGINT AS f
        |  FROM (SELECT lang, unnest(regexp_extract_all(text, '[a-z0-9]+'))
        |          AS tok
        |        FROM documents)
        |  GROUP BY 1, 2),
        |a AS (
        |  SELECT lang, count(*)::BIGINT AS n_types,
        |    sum(f)::BIGINT AS n_tokens,
        |    sum(CASE WHEN f = 1 THEN 1 ELSE 0 END)::BIGINT AS n_hapax,
        |    sum(CASE WHEN f = 2 THEN 1 ELSE 0 END)::BIGINT AS n_dis
        |  FROM f GROUP BY 1)
        |SELECT lang, n_types, n_tokens, n_hapax, n_dis,
        |  CASE WHEN n_tokens > 0 THEN
        |    floor(n_hapax::DOUBLE / n_tokens::DOUBLE * 10000 + 0.5) / 10000
        |    END AS p_unseen
        |FROM a ORDER BY lang""".stripMargin,
    // Same (lang, token) type-table fold as yule_k; shared stopword
    // list interpolated.
    "text_lexical_density" ->
      s"""WITH f AS (
        |  SELECT lang, tok, count(*)::BIGINT AS f
        |  FROM (SELECT lang, unnest(regexp_extract_all(text, '[a-z0-9]+'))
        |          AS tok
        |        FROM documents)
        |  GROUP BY 1, 2),
        |a AS (
        |  SELECT lang, count(*)::BIGINT AS n_types,
        |    sum(f)::BIGINT AS n_tokens,
        |    sum(CASE WHEN tok NOT IN $stopSql THEN f ELSE 0 END)::BIGINT
        |      AS n_content_tokens,
        |    sum(CASE WHEN tok NOT IN $stopSql THEN 1 ELSE 0 END)::BIGINT
        |      AS n_content_types
        |  FROM f GROUP BY 1)
        |SELECT lang, n_types, n_tokens, n_content_types, n_content_tokens,
        |  CASE WHEN n_tokens > 0 THEN
        |    floor(n_content_tokens::DOUBLE / n_tokens::DOUBLE
        |      * 10000 + 0.5) / 10000 END AS token_density,
        |  CASE WHEN n_types > 0 THEN
        |    floor(n_content_types::DOUBLE / n_types::DOUBLE
        |      * 10000 + 0.5) / 10000 END AS type_density
        |FROM a ORDER BY lang""".stripMargin,
    "text_yule_k" ->
      """WITH f AS (
        |  SELECT lang, tok, count(*)::BIGINT AS f
        |  FROM (SELECT lang, unnest(regexp_extract_all(text, '[a-z0-9]+'))
        |          AS tok
        |        FROM documents)
        |  GROUP BY 1, 2),
        |a AS (
        |  SELECT lang, sum(f)::BIGINT AS n_tokens,
        |    count(*)::BIGINT AS n_types, sum(f * f)::BIGINT AS s2
        |  FROM f GROUP BY 1)
        |SELECT lang, n_tokens, n_types, s2,
        |  floor(10000.0 * (s2 - n_tokens)::DOUBLE
        |    / (n_tokens::DOUBLE * n_tokens::DOUBLE) * 10000 + 0.5) / 10000
        |    AS yule_k
        |FROM a ORDER BY lang""".stripMargin,
    // Same lang-grain exact-BIGINT rollup as yule_k; both divisions
    // guarded and r4'd at the readout.
    "text_simpson_diversity" ->
      """WITH f AS (
        |  SELECT lang, tok, count(*)::BIGINT AS f
        |  FROM (SELECT lang, unnest(string_split(text, ' ')) AS tok
        |        FROM documents)
        |  GROUP BY 1, 2),
        |a AS (
        |  SELECT lang, sum(f)::BIGINT AS n_tokens,
        |    count(*)::BIGINT AS n_types,
        |    sum(f * (f - 1))::BIGINT AS s_ff1
        |  FROM f GROUP BY 1)
        |SELECT lang, n_tokens, n_types, s_ff1,
        |  CASE WHEN n_tokens > 1 THEN
        |    floor(s_ff1::DOUBLE
        |      / (n_tokens * (n_tokens - 1))::DOUBLE * 10000 + 0.5) / 10000
        |  END AS simpson_d,
        |  CASE WHEN n_tokens > 1 AND s_ff1 > 0 THEN
        |    floor((n_tokens * (n_tokens - 1))::DOUBLE
        |      / s_ff1::DOUBLE * 10000 + 0.5) / 10000
        |  END AS inv_simpson
        |FROM a ORDER BY lang""".stripMargin,
    // Same vocabulary-shaped algebra: present-token terms micro-nat
    // quantized, absent-token mass as the (1 − Σq)·ln2 closure.
    // One tagged frame over n in {1,2,3}; DuckDB list slices are
    // 1-based inclusive so toks[i : i+n-1] is the n-gram.
    "text_distinct_n" ->
      """WITH t AS (
        |  SELECT lang, string_split(text, ' ') AS toks FROM documents),
        |tn AS (
        |  SELECT lang, toks, n
        |  FROM t, (SELECT unnest([1, 2, 3]) AS n) ns
        |  WHERE len(toks) >= n),
        |tagged AS (
        |  SELECT lang, n, array_to_string(toks[i : i + n - 1], ' ') AS g
        |  FROM tn,
        |    LATERAL (SELECT unnest(range(1, len(toks) - n + 2)) AS i) r)
        |SELECT lang, n, count(*)::BIGINT AS total_ngrams,
        |  count(DISTINCT g)::BIGINT AS distinct_ngrams,
        |  CASE WHEN count(*) > 0 THEN
        |    floor(count(DISTINCT g)::DOUBLE / count(*)::DOUBLE
        |      * 10000 + 0.5) / 10000 END AS distinct_ratio
        |FROM tagged GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // Mean-cancelled pairwise z: integer micro-rates, exact variance
    // numerator, micro-quantized |dF|/sigma terms, guarded divisor.
    "text_burrows_delta" ->
      """WITH c AS (
        |  SELECT lang, tok, count(*)::BIGINT AS c FROM (
        |    SELECT lang, unnest(string_split(text, ' ')) AS tok
        |    FROM documents)
        |  GROUP BY 1, 2),
        |nl AS (SELECT lang, sum(c)::BIGINT AS n_lang FROM c GROUP BY 1),
        |top AS (
        |  SELECT tok FROM (
        |    SELECT tok, sum(c)::BIGINT AS ct FROM c GROUP BY 1
        |    ORDER BY ct DESC, tok LIMIT 50)),
        |grid AS (
        |  SELECT t.tok, l.lang,
        |    (coalesce(c.c, 0) * 1000000 // l.n_lang)::BIGINT AS f_u
        |  FROM top t CROSS JOIN nl l
        |  LEFT JOIN c ON c.lang = l.lang AND c.tok = t.tok),
        |st AS (
        |  SELECT tok, count(*)::BIGINT AS l, sum(f_u)::BIGINT AS sf,
        |    sum(f_u * f_u)::BIGINT AS sff
        |  FROM grid GROUP BY 1),
        |stv AS (
        |  SELECT tok, l, (l * sff - sf * sf)::BIGINT AS var_num
        |  FROM st),
        |tm AS (
        |  SELECT a.lang AS lang_a, b.lang AS lang_b,
        |    CASE WHEN s.var_num > 0 THEN
        |      floor(abs(a.f_u - b.f_u)::DOUBLE
        |        / sqrt(s.var_num::DOUBLE / (s.l * (s.l - 1))::DOUBLE)
        |        * 1000000 + 0.5)::BIGINT
        |    ELSE 0 END AS term_u,
        |    CASE WHEN s.var_num > 0 THEN 1 ELSE 0 END AS scored
        |  FROM grid a JOIN grid b ON a.tok = b.tok AND a.lang < b.lang
        |  JOIN stv s ON s.tok = a.tok),
        |agg AS (
        |  SELECT lang_a, lang_b, count(*)::BIGINT AS n_words,
        |    sum(scored)::BIGINT AS n_scored,
        |    sum(term_u)::BIGINT AS delta_sum_u
        |  FROM tm GROUP BY 1, 2)
        |SELECT lang_a, lang_b, n_words, n_scored,
        |  CASE WHEN n_scored > 0 THEN
        |    floor(delta_sum_u::DOUBLE / (1000000.0 * n_scored::DOUBLE)
        |      * 10000 + 0.5) / 10000 END AS delta
        |FROM agg ORDER BY lang_a, lang_b""".stripMargin,
    // No closure term (q > 0 wherever p > 0); micro-nat terms in
    // identical op order, one r4 readout per lang.
    "text_kl_divergence" ->
      """WITH c AS (
        |  SELECT lang, tok, count(*)::BIGINT AS c FROM (
        |    SELECT lang, unnest(string_split(text, ' ')) AS tok
        |    FROM documents)
        |  GROUP BY 1, 2),
        |nl AS (SELECT lang, sum(c)::BIGINT AS n_lang FROM c GROUP BY 1),
        |ct AS (SELECT tok, sum(c)::BIGINT AS c_tok FROM c GROUP BY 1),
        |na AS (SELECT sum(n_lang)::BIGINT AS n_corpus FROM nl),
        |t AS (
        |  SELECT c.lang, nl.n_lang,
        |    floor((c.c::DOUBLE / nl.n_lang::DOUBLE)
        |      * ln((c.c::DOUBLE / nl.n_lang::DOUBLE)
        |        / (ct.c_tok::DOUBLE / na.n_corpus::DOUBLE))
        |      * 1000000 + 0.5)::BIGINT AS term_u
        |  FROM c JOIN nl USING (lang) JOIN ct USING (tok) CROSS JOIN na),
        |agg AS (
        |  SELECT lang, max(n_lang)::BIGINT AS n_lang,
        |    sum(term_u)::BIGINT AS sum_term_u
        |  FROM t GROUP BY 1)
        |SELECT lang, n_lang, sum_term_u,
        |  floor(sum_term_u / 1000000.0 * 10000 + 0.5) / 10000 AS kl_nats
        |FROM agg ORDER BY lang""".stripMargin,
    "text_js_divergence" ->
      """WITH c AS (
        |  SELECT lang, tok, count(*)::BIGINT AS c
        |  FROM (SELECT lang, unnest(string_split(text, ' ')) AS tok
        |        FROM documents)
        |  GROUP BY 1, 2),
        |nl AS (SELECT lang, sum(c)::BIGINT AS n_lang FROM c GROUP BY 1),
        |ct AS (SELECT tok, sum(c)::BIGINT AS c_tok FROM c GROUP BY 1),
        |na AS (SELECT sum(n_lang)::BIGINT AS n_corpus FROM nl),
        |t AS (
        |  SELECT lang, n_lang, n_corpus, c_tok,
        |    floor((p * ln(2.0 * p / (p + q))
        |      + q * ln(2.0 * q / (p + q))) * 1000000 + 0.5)::BIGINT
        |      AS term_u
        |  FROM (
        |    SELECT c.lang, nl.n_lang, na.n_corpus, ct.c_tok,
        |      c.c::DOUBLE / nl.n_lang::DOUBLE AS p,
        |      ct.c_tok::DOUBLE / na.n_corpus::DOUBLE AS q
        |    FROM c JOIN nl USING (lang) JOIN ct USING (tok)
        |    CROSS JOIN na) q1),
        |a AS (
        |  SELECT lang, max(n_lang)::BIGINT AS n_lang,
        |    max(n_corpus)::BIGINT AS n_corpus,
        |    sum(term_u)::BIGINT AS sum_term_u,
        |    sum(c_tok)::BIGINT AS sum_q_num
        |  FROM t GROUP BY 1)
        |SELECT lang, n_lang, sum_term_u,
        |  floor(((sum_term_u / 1000000.0
        |    + (1.0 - sum_q_num::DOUBLE / n_corpus) * ln(2.0)) / 2.0)
        |    * 10000 + 0.5) / 10000 AS jsd
        |FROM a ORDER BY lang""".stripMargin,
    "text_char_entropy" ->
      """WITH ch AS (
        |  SELECT doc_id, ch, count(*)::BIGINT AS c
        |  FROM (SELECT doc_id, unnest(regexp_extract_all(text, '.')) AS ch
        |        FROM documents)
        |  GROUP BY 1, 2),
        |t AS (
        |  SELECT doc_id, sum(c)::BIGINT AS n_chars_seen,
        |    count(*)::BIGINT AS n_distinct_chars
        |  FROM ch GROUP BY 1),
        |u AS (
        |  SELECT ch.doc_id, t.n_chars_seen, t.n_distinct_chars,
        |    floor(-((ch.c::DOUBLE / t.n_chars_seen::DOUBLE)
        |      * ln(ch.c::DOUBLE / t.n_chars_seen::DOUBLE))
        |      * 1000000 + 0.5)::BIGINT AS term_u
        |  FROM ch JOIN t USING (doc_id))
        |SELECT doc_id, max(n_chars_seen)::BIGINT AS n_chars_seen,
        |  max(n_distinct_chars)::BIGINT AS n_distinct_chars,
        |  sum(term_u)::BIGINT AS entropy_micro,
        |  floor((sum(term_u)::BIGINT / 1000000.0) * 10000 + 0.5) / 10000
        |    AS entropy
        |FROM u GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "text_term_burstiness" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(regexp_extract_all(text, '[a-z0-9]+'))
        |    AS tok
        |  FROM documents),
        |bt AS (
        |  SELECT tok, count(*)::BIGINT AS cf,
        |    count(DISTINCT doc_id)::BIGINT AS df
        |  FROM toks GROUP BY 1),
        |nd AS (SELECT count(DISTINCT doc_id)::BIGINT AS n_docs
        |       FROM documents),
        |rk AS (
        |  SELECT tok, cf, df, n_docs,
        |    row_number() OVER (ORDER BY cf DESC, tok) AS rk
        |  FROM bt CROSS JOIN nd)
        |SELECT rk::INT AS rk, tok, cf, df,
        |  floor(cf::DOUBLE / df::DOUBLE * 10000 + 0.5) / 10000
        |    AS burstiness,
        |  floor(ln((n_docs + 1)::DOUBLE / (df + 1)::DOUBLE)
        |    * 10000 + 0.5) / 10000 AS idf
        |FROM rk WHERE rk <= 20 ORDER BY rk""".stripMargin
  )
}
