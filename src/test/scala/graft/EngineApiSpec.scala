package graft

import graft.api.GraftEngine
import org.apache.spark.sql.functions._

/** The user-facing facade, driven the way a library consumer would
  * (caller-supplied tables with the documented (id, …) shape).
  */
class EngineApiSpec extends SparkSpec {
  import spark.implicits._

  private lazy val engine = new GraftEngine(spark)
  private lazy val emb = TestData.embeddings(spark, sf("sf0.001"))
    .select(col("vec_id").as("id"), col("embedding"), col("label")).cache()
  private lazy val docs = TestData.documents(spark, sf("sf0.001"))
    .select(col("doc_id").as("id"), col("text"), col("lang")).cache()

  test("knn returns k ranked neighbors per query, no self-matches") {
    val res = engine.knn(emb, emb.filter(col("id") < 3), 5).collect()
    assert(res.length === 15)
    val byQ = res.groupBy(_.getLong(0))
    byQ.foreach { case (qid, rows) =>
      assert(rows.map(_.getInt(1)).sorted.toSeq === Seq(1, 2, 3, 4, 5))
      assert(rows.forall(_.getLong(2) != qid))
      val scores = rows.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
  }

  test("buildIvfIndex writes a searchable cluster-partitioned index") {
    val path = "/root/repo/target/tmp/engine_ivf_index"
    val cents = operators.Vectors.fixedCentroids(
      emb.withColumnRenamed("id", "vec_id"))
    val assigned = engine.buildIvfIndex(emb, cents, path)
    val back = spark.read.parquet(path)
    assert(back.count() === emb.count())
    assert(back.select("cluster").distinct().count() === 4)
    assert(back.columns.contains("embedding"), "index must carry the vectors")
    assert(assigned.count() === emb.count())

    // and the index answers queries: ivfSearch over the written files
    val res = engine.ivfSearch(path, cents, emb.filter(col("id") < 3),
                               k = 5, nProbe = 2).collect()
    assert(res.length === 15)
    assert(res.forall(r => r.getLong(2) != r.getLong(0)), "no self-matches")
    // probing 2 of 4 partitions: results must overlap brute-force top-5
    val brute = engine.knn(emb, emb.filter(col("id") < 3), 5)
      .select("qid", "neighborId").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val hit = res.count(r => brute(r.getLong(0)).contains(r.getLong(2)))
    assert(hit >= 5, s"IVF search diverged too far from brute force: $hit/15")
  }

  test("sortedNeighborhoodDuplicates finds planted adjacent near-dups within budget") {
    // plant a 1-edit copy of each of 5 docs: normalizes to an adjacent
    // sort position, so SNM must find it
    val planted = docs.limit(5)
      .select((col("id") + 50000L).as("id"),
              concat(col("text"), lit(" x")).as("text"), col("lang"))
    val res = engine.sortedNeighborhoodDuplicates(
      docs.unionAll(planted), "lang", window = 4, maxEdits = 20)
    val pairs = res.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val found = (0 until 5).count(i =>
      pairs.exists { case (a, b) => b == a + 50000L })
    assert(found >= 1, s"planted neighbor pairs not found: $pairs")
    // pair normalization: id_a < id_b always
    assert(pairs.forall { case (a, b) => a < b })
  }

  test("funnel counts ordered steps per key, bounded by the conversion window") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    def at(m: Int) = new java.sql.Timestamp(base.getTime + m * 60000L)
    val ev = Seq(
      (1L, at(0), 1L, "a"), (1L, at(1), 2L, "b"),
      (2L, at(0), 3L, "a"), (2L, at(30), 4L, "b")
    ).toDF("k", "ts", "tie", "t")
    val unbounded = engine.funnel(ev, "k", "ts", "tie", "t", Seq("a", "b"))
      .as[(Long, Int)].collect().toMap
    assert(unbounded === Map(1L -> 2, 2L -> 2))
    val bounded = engine.funnel(ev, "k", "ts", "tie", "t", Seq("a", "b"),
        withinUs = 10L * 60 * 1000000)
      .as[(Long, Int)].collect().toMap
    assert(bounded === Map(1L -> 2, 2L -> 1))
  }

  test("trainPqCodebook yields 8 x codewords rows and lower distortion than fixed") {
    val cb = engine.trainPqCodebook(
      emb.withColumnRenamed("id", "vec_id"), codewords = 4, seed = 42L)
    assert(cb.count() === 32)
    assert(cb.select("sub").distinct().count() === 8)
  }

  test("dedupExact keeps one survivor per distinct content") {
    val withDups = docs.unionAll(docs.limit(10).withColumn("id", col("id") + 10000))
    val survivors = engine.dedupExact(withDups)
    assert(survivors.count() === docs.count())
    // survivors are the min ids — none of the 10 duplicated copies survive
    assert(survivors.filter(col("id") >= 10000).count() === 0)
  }

  test("mineTriplets honors label invariants through the typed API") {
    val triplets = engine.mineTriplets(emb, col("id") < 20).collect()
    val labels = emb.select("id", "label").as[(Long, Int)].collect().toMap
    assert(triplets.length === 20)
    triplets.foreach { t =>
      assert(labels(t.posId) === labels(t.anchorId))
      assert(labels(t.negId) !== labels(t.anchorId))
      assert(t.posScore >= t.negScore)
    }
  }

  test("nearDuplicates finds the planted duplicate pairs") {
    val planted = docs.unionAll(
      docs.filter(col("id") < 5).withColumn("id", col("id") + 20000))
    val pairs = engine.nearDuplicates(planted, "lang", 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    (0L until 5L).foreach { i =>
      assert(pairs.exists(p => p._1 == i && p._2 == i + 20000),
        s"planted duplicate ($i, ${i + 20000}) not found")
    }
  }

  test("exactJaccardDuplicates + dedupComponents collapse planted clusters") {
    // plant two copies of docs 0..4 → clusters of ≥3 nodes each
    val planted = docs.unionAll(
        docs.filter(col("id") < 5).withColumn("id", col("id") + 20000))
      .unionAll(docs.filter(col("id") < 5).withColumn("id", col("id") + 30000))
    val pairs = engine.exactJaccardDuplicates(planted, "lang", 0.9)
    val pairSet = pairs.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    (0L until 5L).foreach { i =>
      assert(pairSet.contains((i, i + 20000)) && pairSet.contains((i, i + 30000)),
        s"planted exact-jaccard cluster around $i incomplete")
    }
    val partsBefore = spark.conf.get("spark.sql.shuffle.partitions")
    val comps = engine.dedupComponents(planted.select("id"), pairs)
      .as[(Long, Long)].collect().toMap
    assert(spark.conf.get("spark.sql.shuffle.partitions") === partsBefore,
      "component loop must not mutate session-global shuffle partitions")
    (0L until 5L).foreach { i =>
      assert(comps(i + 20000) === comps(i) && comps(i + 30000) === comps(i),
        s"cluster of $i must share one component label")
    }
  }

  test("embeddingDuplicates finds planted scaled copies via the facade") {
    val planted = emb.filter(col("id") < 10)
      .select((col("id") + 50000L).as("id"),
        transform(col("embedding"), x => x * lit(2.0)).as("embedding"))
    val pairs = engine.embeddingDuplicates(
        emb.select("id", "embedding").unionAll(planted), dim = 64,
        threshold = 0.99)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs === (0L until 10L).map(i => (i, i + 50000L)).toSet,
      s"got $pairs")
  }

  test("graphSearch walks a chain graph to the far-end best neighbor") {
    // 2-D unit vectors at 10° steps; the query points at vector 9's
    // angle, the entry seed is vector 0, and the only edges form the
    // chain 0–1–…–9 — so the beam must WALK hop by hop to find the
    // global best. 9 hops with beam 3 reach it; cos to v9 decreases
    // monotonically with chain distance, so ranks are the chain order.
    val vecs = (0 to 9).map { i =>
      val th = math.toRadians(i * 10.0)
      (i.toLong, Seq(math.cos(th), math.sin(th)))
    }
    val corpus = vecs.toDF("id", "embedding")
    val edges = (0 to 8).map(i => (i.toLong, i + 1L)).toDF("a", "b")
    val th9 = math.toRadians(90.0)
    val queries = Seq((0L, Seq(math.cos(th9), math.sin(th9))))
      .toDF("qid", "qv")
    val entry = Seq((0L, 0L)).toDF("qid", "id")
    val got = engine.graphSearch(corpus, edges, queries, entry,
        hops = 9, beamWidth = 3, k = 3)
      .select("rnk", "id").as[(Int, Long)].collect().toSet
    assert(got === Set((1, 9L), (2, 8L), (3, 7L)),
      s"beam must reach the far end of the chain: $got")
  }

  test("semanticDuplicates finds exact copies inside their cluster") {
    // exact copies (not scaled): identical vectors share all centroid
    // distances, so both land in the same cluster deterministically
    // and the planted pair is guaranteed to be in-scope
    val planted = emb.filter(col("id") < 10)
      .select((col("id") + 60000L).as("id"), col("embedding"))
    val pairs = engine.semanticDuplicates(
        emb.select("id", "embedding").unionAll(planted), k = 4,
        threshold = 0.999)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert((0L until 10L).map(i => (i, i + 60000L)).toSet.subsetOf(pairs),
      s"every planted exact copy must pair with its original: $pairs")
    // nothing else in the fixture sits at cosine ≥ 0.999
    assert(pairs.size === 10, s"unexpected extra pairs: $pairs")
  }

  test("bloomPrefilter keeps every joining row and kills most others") {
    val dim = docs.filter(col("id") < 10).select(col("id").as("k"))
    val filtered = engine.bloomPrefilter(docs, "id", dim, "k",
        expectedKeys = 100)
      .select("id").as[Long].collect().toSet
    assert((0L until 10L).toSet.subsetOf(filtered),
      "no false negatives allowed — every joining key must survive")
    // 3 % fpp over 490 non-members: generous 10× slack still proves
    // the filter is doing real map-side reduction.
    assert(filtered.size <= 10 + 150, s"got ${filtered.size} survivors")
  }

  test("sampleByHash is deterministic, bounded, and monotone in fraction") {
    val s25a = engine.sampleByHash(docs, Seq("id"), 0.25)
      .select("id").as[Long].collect().toSet
    val s25b = engine.sampleByHash(docs, Seq("id"), 0.25)
      .select("id").as[Long].collect().toSet
    assert(s25a === s25b, "same fraction must select the same rows")
    val n = docs.count()
    // binomial(500, .25): mean 125, sd ~9.7 — 6 sd of slack
    assert(s25a.size > n * 0.13 && s25a.size < n * 0.37, s"got ${s25a.size}/$n")
    val s50 = engine.sampleByHash(docs, Seq("id"), 0.5)
      .select("id").as[Long].collect().toSet
    assert(s25a.subsetOf(s50), "larger fraction must be a superset")
    assert(engine.sampleByHash(docs, Seq("id"), 0.0).count() === 0)
    assert(engine.sampleByHash(docs, Seq("id"), 1.0).count() === n)
  }

  test("sessionize splits on gaps over the threshold only") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    def at(min: Int) = new java.sql.Timestamp(base.getTime + min * 60000L)
    val evs = Seq(
      (1L, at(0), 1L), (1L, at(10), 2L), (1L, at(50), 3L),  // gap 40 > 30
      (2L, at(0), 4L), (2L, at(29), 5L), (2L, at(58), 6L))  // gaps 29 ≤ 30
      .toDF("user_id", "ts", "event_id")
    val got = engine.sessionize(evs, "user_id", "ts", "event_id", 30)
      .select("event_id", "session_id").as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 2L,
                       4L -> 1L, 5L -> 1L, 6L -> 1L), s"got $got")
  }

  test("fuzzyDuplicates finds planted single-edit copies via the facade") {
    val edited = docs.filter(col("id") < 5)
      .withColumn("id", col("id") + 40000)
      .withColumn("text", concat(col("text"), lit("x"))) // one insert edit
    val pairs = engine.fuzzyDuplicates(docs.unionAll(edited), "lang", 20)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    (0L until 5L).foreach { i =>
      assert(pairs.contains((i, i + 40000)),
        s"planted 1-edit duplicate ($i, ${i + 40000}) not found")
    }
  }

  test("trainCentroids feeds buildIvfIndex/ivfSearch end-to-end") {
    val cents = engine.trainCentroids(emb, k = 4, seed = 7L)
    assert(cents.count() === 4)
    val path = "/root/repo/target/tmp/engine_ivf_trained"
    engine.buildIvfIndex(emb, cents, path)
    val res = engine.ivfSearch(path, cents, emb.filter(col("id") < 3),
                               k = 5, nProbe = 2)
    assert(res.count() === 15)
  }

  test("bm25 + rrfFuse build a hybrid ranking through the facade") {
    val lex = engine.bm25(docs, Seq("join", "scan"))
    assert(lex.count() > 0)
    // rank both arms, fuse; every fused id carries a positive rrf and
    // ids present in both arms beat the same rank in only one
    import org.apache.spark.sql.expressions.Window
    val lr = lex.withColumn("rank",
      row_number().over(Window.orderBy(col("score").desc, col("id"))))
      .select("id", "rank").limit(20)
    val vr = engine.knn(emb, emb.filter(col("id") === 0), 20)
      .select(col("neighborId").as("id"), col("rank"))
    val fused = engine.rrfFuse(lr, vr).collect()
    assert(fused.nonEmpty)
    assert(fused.forall(_.getDouble(1) > 0))
    val both = 1.0 / 61 + 1.0 / 61
    assert(fused.forall(_.getDouble(1) <= both + 1e-12))
  }

  test("hammingSearch candidates cover the exact top-1 neighbor") {
    val query = emb.filter(col("id") === 7)
    val res = engine.hammingSearch(emb, query, candidates = 50, k = 5)
      .collect()
    assert(res.length === 5)
    assert(res.forall(_.getLong(0) != 7L), "no self-match")
    val exactTop = engine.knn(emb, query, 1).select("neighborId")
      .as[Long].head()
    // 50 Hamming candidates out of 500 must retain the true top-1
    // (sign-bit codes preserve cosine neighborhoods on this fixture)
    assert(res.map(_.getLong(0)).contains(exactTop),
      s"exact top-1 $exactTop missing from rerank output")
  }

  test("mergeUpsert replaces matched rows and inserts the rest") {
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "name", "v")
    val upd = Seq((2L, "B", 200.0), (9L, "z", 90.0)).toDF("id", "name", "v")
    val got = engine.mergeUpsert(base, upd, "id")
      .as[(Long, String, Double)].collect().sortBy(_._1)
    assert(got.toSeq === Seq((1L, "a", 10.0), (2L, "B", 200.0),
      (3L, "c", 30.0), (9L, "z", 90.0)))
  }

  test("mergeUpsert lets a NULL-carrying update win on matched keys") {
    val base = Seq((1L, Some("a"), 10.0), (2L, Some("b"), 20.0))
      .toDF("id", "name", "v")
    val upd = Seq((2L, None: Option[String], 200.0)).toDF("id", "name", "v")
    val got = engine.mergeUpsert(base, upd, "id")
      .as[(Long, Option[String], Double)].collect().sortBy(_._1)
    // standard MERGE: the matched row takes ALL update columns,
    // including a legitimate NULL — not coalesce-back-to-base
    assert(got.toSeq === Seq((1L, Some("a"), 10.0), (2L, None, 200.0)))
  }

  test("mergeUpsertPartitioned rewrites only touched partitions") {
    val dir = java.nio.file.Files
      .createTempDirectory("merge_part_test").toString
    val base = Seq((1L, "a", 10.0, 0), (2L, "b", 20.0, 0),
                   (3L, "c", 30.0, 1), (4L, "d", 40.0, 2))
      .toDF("id", "name", "v", "pt")
    base.write.mode("overwrite").partitionBy("pt").parquet(dir)
    def files(p: Int): Map[String, Long] = {
      val d = new java.io.File(s"$dir/pt=$p")
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toMap
    }
    val before1 = files(1); val before2 = files(2)
    // update touches only pt=0 (match on id=2 + insert id=9)
    val upd = Seq((2L, "B", 200.0, 0), (9L, "z", 90.0, 0))
      .toDF("id", "name", "v", "pt")
    engine.mergeUpsertPartitioned(spark, dir, upd, "id", "pt")
    val got = spark.read.parquet(dir)
      .select("id", "name", "v").as[(Long, String, Double)]
      .collect().sortBy(_._1)
    assert(got.toSeq === Seq((1L, "a", 10.0), (2L, "B", 200.0),
      (3L, "c", 30.0), (4L, "d", 40.0), (9L, "z", 90.0)))
    // untouched partitions keep their exact committed files
    assert(files(1) === before1 && files(2) === before2,
      "untouched partitions must not be rewritten")
  }

  test("zOrderKey interleaves bits and bounds both dims per key range") {
    val df = spark.range(0, 1024).select(
      (col("id") % 32).as("x"), (col("id") / 32).cast("long").as("y"))
      .withColumn("z", engine.zOrderKey(col("x"), col("y"), bits = 5))
    val rows = df.as[(Long, Long, Long)].collect()
    // spot-check the interleave: x=3 (011), y=5 (101) → z = 100111 = 39
    assert(rows.find(r => r._1 == 3 && r._2 == 5).get._3 === 39L)
    // every 64-wide z bucket spans at most 8 distinct x and 8 distinct y
    val spans = rows.groupBy(_._3 / 64).values.map { g =>
      (g.map(_._1).distinct.size, g.map(_._2).distinct.size)
    }
    assert(spans.forall { case (sx, sy) => sx <= 8 && sy <= 8 },
      "z-order locality violated")
  }

  test("incrementalDedup resolves verbatim re-ingests, passes edits") {
    val batch = docs.filter(col("id") < 4)
      .withColumn("id", col("id") + 70000)
      .withColumn("text",
        when(col("id") % 2 === 0, concat(col("text"), lit(" tail")))
          .otherwise(col("text")))
    val got = engine.incrementalDedup(docs, batch)
      .select("id", "dup_of", "is_new")
      .as[(Long, Long, Int)].collect().sortBy(_._1)
    got.foreach { case (id, dupOf, isNew) =>
      if (id % 2 == 0) assert(isNew === 1 && dupOf === -1L, s"edited $id")
      else assert(isNew === 0 && dupOf === id - 70000, s"verbatim $id")
    }
  }

  test("triangleCount counts each triangle once") {
    // K4 minus one edge = 2 triangles
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L))
      .toDF("a", "b")
    assert(engine.triangleCount(edges).as[Long].head() === 2L)
  }

  test("chunkTokens covers every token with the declared overlap") {
    val doc = Seq((1L, (1 to 80).map(i => s"t$i").mkString(" ")))
      .toDF("id", "text")
    val chunks = engine.chunkTokens(doc, size = 32, stride = 24)
      .select("chunk_id", "chunk_text").as[(Int, String)].collect()
      .sortBy(_._1)
    assert(chunks.length === 3) // ceil((80-32)/24)+1
    val toks = chunks.map(_._2.split(" ").toSeq)
    assert(toks(0).head === "t1" && toks(1).head === "t25"
      && toks(2).head === "t49")
    assert(toks.flatten.toSet === (1 to 80).map(i => s"t$i").toSet,
      "chunks must cover every token")
    assert(toks(0).takeRight(8) === toks(1).take(8), "8-token overlap")
  }

  test("decontaminate flags exactly the docs overlapping the benchmark") {
    val bench = Seq(
      (900L, "alpha beta gamma delta epsilon zeta eta"),
      (901L, "one two three four five six seven eight")).toDF("id", "text")
    val corpus = Seq(
      (1L, "clean text with nothing shared at all here today"),
      (2L, "prefix words then alpha beta gamma delta epsilon tail"), // 5-run from 900
      (3L, "two three four five six stuck in the middle"),           // 5-run from 901
      (4L, "alpha beta gamma only four delta epsilon zeta")          // no 5-run
    ).toDF("id", "text")
    val got = engine.decontaminate(corpus, bench, k = 5)
      .select("id", "first_eval_id").as[(Long, Long)].collect().toMap
    assert(got === Map(2L -> 900L, 3L -> 901L), s"got $got")
  }

  test("stratifiedSampleByHash applies per-stratum rates, deterministic") {
    val s1 = engine.stratifiedSampleByHash(docs, "id", "lang",
      Map("en" -> 0.5), defaultRate = 0.1)
    val s2 = engine.stratifiedSampleByHash(docs, "id", "lang",
      Map("en" -> 0.5), defaultRate = 0.1)
    val ids1 = s1.select("id").as[Long].collect().toSet
    assert(ids1 === s2.select("id").as[Long].collect().toSet,
      "hash sampling must be reproducible")
    val byLang = s1.groupBy("lang").count().as[(String, Long)].collect().toMap
    val totals = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    // loose binomial bounds: en near 50 %, others near 10 %
    assert(byLang("en").toDouble / totals("en") > 0.3)
    assert(byLang.filterNot(_._1 == "en").forall { case (l, n) =>
      n.toDouble / totals(l) < 0.3 })
  }

  test("pageRank: ranks stay positive, high-degree hub outranks leaves") {
    // star: node 0 joined to 1..6, plus a 7-8 pendant pair
    val edges = ((1L to 6L).map(i => (0L, i)) :+ (7L, 8L)).toDF("a", "b")
    val nodes = (0L to 8L).toDF("id")
    val pr = engine.pageRank(nodes, edges, iters = 3)
      .select("id", "rank_u").as[(Long, Long)].collect().toMap
    assert(pr.values.forall(_ >= 150000L), s"damping floor violated: $pr")
    assert(pr(0L) > pr(1L), "hub must outrank a leaf")
    assert((1L to 6L).map(pr).distinct.size === 1, "leaves are symmetric")
    assert(pr(7L) === pr(8L), "pendant pair is symmetric")
  }

  test("maxSimSearch scores multi-vector docs by summed per-token max") {
    // doc 1's two tokens align with query tokens; doc 2 is orthogonal
    val dt = Seq(
      (1L, Array(1.0, 0.0, 0.0)), (1L, Array(0.0, 1.0, 0.0)),
      (2L, Array(0.0, 0.0, 1.0)), (2L, Array(0.0, 0.0, -1.0))
    ).toDF("id", "embedding")
    val qt = Seq(
      (9L, Array(1.0, 0.0, 0.0)), (9L, Array(0.0, 1.0, 0.0))
    ).toDF("id", "embedding")
    val got = engine.maxSimSearch(dt, qt, k = 2)
      .select("rnk", "id", "maxsim").as[(Int, Long, Double)].collect().sorted
    assert(got.head === ((1, 1L, 2.0)), s"got ${got.toSeq}")
    assert(got(1)._2 === 2L && got(1)._3 < 0.1, s"got ${got.toSeq}")
  }

  test("packSequences assigns contiguous non-overlapping bin spans") {
    val d = Seq((1L, "a", ("t " * 99).trim), (2L, "a", ("t " * 5).trim),
                (3L, "a", ("t " * 200).trim), (4L, "b", ("t " * 7).trim))
      .toDF("id", "lang", "text")
    val got = engine.packSequences(d, "lang", "id", budget = 100L)
      .select("id", "start_off", "bin_first", "bin_last")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got(0) === ((1L, 0L, 0L, 0L)))     // 99 tokens, bin 0
    assert(got(1) === ((2L, 99L, 0L, 1L)))    // straddles 100
    assert(got(2) === ((3L, 104L, 1L, 3L)))   // spans bins 1..3
    assert(got(3) === ((4L, 0L, 0L, 0L)))     // stream b restarts
  }

  test("scdType2 collapses runs into versioned intervals") {
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def t(h: Int) = new java.sql.Timestamp(ts0.getTime + h * 3600_000L)
    val ev = Seq((1L, t(0), "A", 10L), (1L, t(1), "A", 11L),
                 (1L, t(2), "B", 12L), (1L, t(3), "A", 13L))
      .toDF("user_id", "ts", "status", "event_id")
    val got = engine.scdType2(ev, "user_id", "ts", "status", "event_id")
      .select("version", "status", "is_current")
      .as[(Int, String, Boolean)].collect().sortBy(_._1)
    assert(got.toSeq === Seq((1, "A", false), (2, "B", false),
      (3, "A", true)), s"got ${got.toSeq}")
  }

  test("profileColumns reports nulls/distinct/min-max per column") {
    val d = Seq[(java.lang.Long, java.lang.Double)](
      (1L, 2.5), (2L, null), (2L, 7.5), (null, 2.5))
      .toDF("k", "v")
    val got = engine.profileColumns(d, Seq("k", "v"))
      .as[(String, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("k") === (("k", 1L, 2L, 1.0, 2.0)))
    assert(got("v") === (("v", 1L, 2L, 2.5, 7.5)))
  }

  test("simhashDuplicates finds single-token edits, soundly banded") {
    // plant a one-token edit of each of 5 docs — a near-identical
    // token multiset keeps the simhash within a few bits
    val planted = docs.limit(5)
      .select((col("id") + 70000L).as("id"),
        concat(col("text"), lit(" zq")).as("text"))
    val pairs = engine.simhashDuplicates(
        docs.select("id", "text").unionAll(planted), maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val found = (0L until 5L).count(i => pairs.contains((i, i + 70000L)))
    assert(found >= 3, s"planted near-dups not found via banding: $pairs")
    // banding must equal unblocked brute force over the signatures
    // (soundness): verify against direct pair filtering
    val sims = engine.simhashDuplicates(
      docs.select("id", "text").unionAll(planted), maxHamming = 3)
    assert(sims.select("hamming").as[Int].collect().forall(_ <= 3))
  }

  test("linkPredict ranks the missing triangle edge first") {
    // square 1-2-3-4-1 plus diagonal 1-3: the missing diagonal (2,4)
    // shares both neighbors 1 and 3 → highest Jaccard among non-edges
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (1L, 3L))
      .toDF("a", "b")
    val got = engine.linkPredict(edges, k = 3)
      .select("x", "y", "inter").as[(Long, Long, Long)].collect()
    assert(got.head === ((2L, 4L, 2L)), s"got ${got.toSeq}")
    // no predicted pair may already be an edge
    val es = Set((1L,2L),(2L,3L),(3L,4L),(1L,4L),(1L,3L))
    assert(got.forall(p => !es.contains((p._1, p._2))))
  }

  test("mmrRerank trades relevance for diversity as lambda falls") {
    // corpus: a near-duplicate pair OFF the query axis (so their
    // mutual sim exceeds their relevance) plus a diverse doc on the
    // other side; pure relevance keeps the pair, MMR at lambda=0.5
    // swaps the diverse doc into rank 2
    val c = Seq(
      (1L, Array(0.98, 0.199)), (2L, Array(0.9799, 0.19905)),
      (3L, Array(0.6, -0.8))
    ).toDF("id", "embedding")
    val q = Seq(Tuple1(Array(1.0, 0.0))).toDF("embedding")
    val rel = engine.mmrRerank(c, q, candidates = 3, k = 2,
        lambdaTenths = 10)
      .select("rnk", "id").as[(Int, Long)].collect().toMap
    assert(rel === Map(1 -> 1L, 2 -> 2L), s"pure relevance got $rel")
    val div = engine.mmrRerank(c, q, candidates = 3, k = 2,
        lambdaTenths = 5)
      .select("rnk", "id").as[(Int, Long)].collect().toMap
    assert(div === Map(1 -> 1L, 2 -> 3L), s"diversified got $div")
  }

  test("hashFeatures buckets are stable and counts sum to token count") {
    val d = Seq((1L, "alpha beta alpha"), (2L, "beta")).toDF("id", "text")
    val got = engine.hashFeatures(d, buckets = 8)
      .as[(Long, Long, Long)].collect()
    assert(got.filter(_._1 == 1L).map(_._3).sum === 3L)
    assert(got.forall(r => r._2 >= 0 && r._2 < 8))
    // same token, same bucket across docs
    val beta1 = got.filter(r => r._1 == 1L && r._3 == 1L).map(_._2).toSet
    val beta2 = got.filter(r => r._1 == 2L).map(_._2).toSet
    assert(beta2.subsetOf(beta1 ++ got.filter(_._1 == 1L).map(_._2)))
  }

  test("mergeUpsert inserts a NULL-keyed update row intact") {
    val base = Seq((Some(1L), "a", 10.0)).toDF("id", "name", "v")
    val upd = Seq((None: Option[Long], "z", 90.0)).toDF("id", "name", "v")
    // a full-outer join can never match a NULL key, so the row must
    // come through as an insert carrying ITS OWN values — not as a
    // row of NULLs
    val got = engine.mergeUpsert(base, upd, "id")
      .as[(Option[Long], String, Double)].collect().sortBy(_._1.getOrElse(-1L))
    assert(got.toSeq === Seq((None, "z", 90.0), (Some(1L), "a", 10.0)))
  }

  test("scdType2 facade matches the events_scd2_dim declared key") {
    val ev = TestData.events(spark, sf("sf0.001"))
    val viaFacade = engine
      .scdType2(ev, "user_id", "ts", "event_type", "event_id")
      .select("user_id", "version", "event_type",
        "valid_from_us", "valid_to_us", "is_current")
    val viaKey = SparkEntry.queries("events_scd2_dim")(spark, sf("sf0.001"))
    assert(viaFacade.exceptAll(viaKey).isEmpty
        && viaKey.exceptAll(viaFacade).isEmpty,
      "facade and declared key must not drift")
  }

  test("retentionCohorts facade matches the events_retention_cohorts key") {
    val ev = TestData.events(spark, sf("sf0.001"))
    val viaFacade = engine.retentionCohorts(ev, "user_id", "ts", "week")
      .select(col("cohort").as("cohort_week"),
        col("offset").as("week_offset"), col("n_users"))
    val viaKey = SparkEntry.queries("events_retention_cohorts")(spark, sf("sf0.001"))
      .select("cohort_week", "week_offset", "n_users")
    assert(viaFacade.exceptAll(viaKey).isEmpty
        && viaKey.exceptAll(viaFacade).isEmpty,
      "facade and declared key must not drift")
  }

  test("retentionCohorts month unit counts calendar months") {
    val ev = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-15 10:00:00")),
      (1L, java.sql.Timestamp.valueOf("2024-02-20 10:00:00")),
      (1L, java.sql.Timestamp.valueOf("2024-04-01 10:00:00")),
      (2L, java.sql.Timestamp.valueOf("2024-02-02 10:00:00")))
      .toDF("user_id", "ts")
    val got = engine.retentionCohorts(ev, "user_id", "ts", "month")
      .select("offset", "n_users").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    // user 1: months Jan,Feb,Apr → offsets 0,1,3 (calendar months, not
    // 30-day buckets); user 2: offset 0
    assert(got === Map(0L -> 2L, 1L -> 1L, 3L -> 1L), s"got $got")
  }

  test("asOfJoin picks the in-force reference per direction and tolerance") {
    def t(m: Int) = new java.sql.Timestamp(1700000000000L + m * 60_000L)
    val facts = Seq((1L, t(10), "p1"), (1L, t(30), "p2"), (2L, t(5), "p3"))
      .toDF("user_id", "ts", "fact_id")
    val refs = Seq((1L, t(8), 100.0), (1L, t(29), 200.0), (2L, t(50), 300.0))
      .toDF("user_id", "ts", "price")
    val back = engine.asOfJoin(facts, refs, "user_id", "ts", "price")
      .select("fact_id", "price", "delta_us")
      .as[(String, Option[Double], Option[Long])].collect().sortBy(_._1)
    assert(back.toSeq === Seq(
      ("p1", Some(100.0), Some(2L * 60_000_000L)),
      ("p2", Some(200.0), Some(1L * 60_000_000L)),
      ("p3", None, None)), s"got ${back.toSeq}")
    val fwd = engine.asOfJoin(facts, refs, "user_id", "ts", "price",
        direction = "forward")
      .select("fact_id", "price").as[(String, Option[Double])]
      .collect().sortBy(_._1)
    assert(fwd.toSeq === Seq(("p1", Some(200.0)), ("p2", None),
      ("p3", Some(300.0))), s"got ${fwd.toSeq}")
    val tol = engine.asOfJoin(facts, refs, "user_id", "ts", "price",
        toleranceUs = Some(90_000_000L))
      .select("fact_id", "price").as[(String, Option[Double])]
      .collect().sortBy(_._1)
    // p1's match is 2 min old > 90 s tolerance -> expired, row kept
    assert(tol.toSeq === Seq(("p1", None), ("p2", Some(200.0)),
      ("p3", None)), s"got ${tol.toSeq}")
  }

  test("substringSpans finds the planted verbatim run and only it") {
    val boiler = (1 to 30).map(i => s"b$i").mkString(" ")
    val d = Seq(
      (1L, s"u1 u2 u3 $boiler v1 v2 v3"),
      (2L, s"w1 w2 $boiler w3 w4 w5 w6"),
      (3L, (1 to 40).map(i => s"x$i").mkString(" ")))
      .toDF("id", "text")
    val got = engine.substringSpans(d, k = 13, minSpan = 20)
      .select("id", "span_start", "span_end", "span_len")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    // the 30-token boilerplate is the only cross-doc duplicate: doc 1
    // tokens 4..33, doc 2 tokens 3..32; doc 3 clean
    assert(got.toSeq === Seq((1L, 4L, 33L, 30L), (2L, 3L, 32L, 30L)),
      s"got ${got.toSeq}")
  }

  test("shardRebalancePlan flags the overloaded and starved shards") {
    val assigned = (Seq.fill(70)(0) ++ Seq.fill(10)(1) ++ Seq.fill(60)(2)
      ++ Seq.fill(60)(3)).zipWithIndex
      .map { case (c, i) => (i.toLong, c) }.toDF("vec_id", "cluster")
    val got = engine.shardRebalancePlan(assigned, 4)
      .select("cluster", "n", "target", "n_splits", "action")
      .as[(Int, Long, Long, Long, String)].collect().sortBy(_._1)
    assert(got.toSeq === Seq((0, 70L, 50L, 2L, "ok"), (1, 10L, 50L, 1L, "merge"),
      (2, 60L, 50L, 2L, "ok"), (3, 60L, 50L, 2L, "ok")), s"got ${got.toSeq}")
  }

  test("retentionCohorts builds the triangular cohort matrix") {
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00") // a Monday
    def wk(w: Int) = new java.sql.Timestamp(ts0.getTime + w * 7L * 86400_000L)
    val ev = Seq((1L, wk(0)), (1L, wk(1)), (2L, wk(1)), (1L, wk(2)))
      .toDF("user_id", "ts")
    val got = engine.retentionCohorts(ev, "user_id", "ts", "week")
      .select("offset", "n_users").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    // cohort wk0 (user 1): offsets 0,1,2; cohort wk1 (user 2): offset 0
    assert(got === Map(0L -> 2L, 1L -> 1L, 2L -> 1L), s"got $got")
  }

  test("shuffleShards facade matches the pipeline_shuffle_shards declared key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("pipeline_shuffle_shards")(spark, d)
      .collect().map(_.toSeq).toSeq
    val viaApi = engine.shuffleShards(TestData.documents(spark, d), "doc_id", 16)
      .select("doc_id", "shard", "pos").orderBy("shard", "pos")
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
    // positions are a permutation of 0..n-1 within each shard
    val byShard = viaApi.groupBy(_(1))
    byShard.foreach { case (_, rows) =>
      assert(rows.map(_(2).asInstanceOf[Int]).sorted === (0 until rows.size).toList)
    }
  }

  test("canonicalizeUrl collapses case/port/tracking/order/fragment variants") {
    val urls = Seq(
      "https://Site.Example.com:443/a/b?z=1&utm_source=x&a=2#frag",
      "HTTPS://site.example.com/a/b?a=2&z=1",
      "https://site.example.com/a/b?utm_campaign=y&z=1&a=2")
      .toDF("url")
    val canon = urls.select(engine.canonicalizeUrl($"url").as("c"))
      .distinct().as[String].collect()
    assert(canon.toSeq === Seq("https://site.example.com/a/b?a=2&z=1"),
      s"got ${canon.toSeq}")
  }

  test("canonicalizeUrl strips only the scheme's own default port") {
    val got = Seq(
      "http://h.example.com:443/x",  // real non-default port: keep
      "http://h.example.com:80/x",   // http default: strip
      "https://h.example.com:80/x",  // real non-default port: keep
      "https://h.example.com:443/x") // https default: strip
      .toDF("url").select(engine.canonicalizeUrl($"url").as("c"))
      .as[String].collect().toSeq
    assert(got === Seq(
      "http://h.example.com:443/x", "http://h.example.com/x",
      "https://h.example.com:80/x", "https://h.example.com/x"), got)
  }

  test("trainValTestSplit is exhaustive, deterministic, and growth-stable") {
    val d = sf("sf0.001")
    val docs = TestData.documents(spark, d)
    val split = engine.trainValTestSplit(docs, "doc_id")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(split.values.toSet.subsetOf(Set("train", "val", "test")))
    assert(split.size === docs.count())
    // growth stability: splitting HALF the corpus assigns the same
    // splits to the shared ids
    val half = engine.trainValTestSplit(
      docs.filter($"doc_id" < 250), "doc_id")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    half.foreach { case (id, sp) => assert(split(id) === sp) }
    // rough proportions at 500 docs (md5-uniform): train within 70-90%
    val frac = split.values.count(_ == "train").toDouble / split.size
    assert(frac > 0.7 && frac < 0.9, s"train fraction $frac")
  }

  test("trainValTestSplit default cuts match the sample_train_split key") {
    // The facade's default 80/10/10 must use the SAME floor bucket
    // arithmetic (cuts 204/230) as the declared key — a round() here
    // once assigned hash-bucket 204 to a different split.
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("sample_train_split")(spark, d)
      .collect().map(_.toSeq).toSeq
    val viaApi = engine.trainValTestSplit(TestData.documents(spark, d), "doc_id")
      .groupBy("split", "lang")
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("sum_chars"))
      .orderBy("split", "lang").collect().map(_.toSeq).toSeq
    assert(viaApi === declared, s"api $viaApi\nvs declared $declared")
  }

  test("psiDrift facade matches the profile_drift_psi declared key") {
    val d = sf("sf0.001")
    val o = TestData.orders(spark, d)
    val cut = to_timestamp(lit("1998-07-01"))
    val declared = SparkEntry.queries("profile_drift_psi")(spark, d)
      .collect().map(_.toSeq).toSeq
    val viaApi = engine.psiDrift(
        o.filter($"o_orderdate" < cut), o.filter($"o_orderdate" >= cut),
        "o_totalprice", 0.0, 500000.0, 10)
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared, s"api $viaApi\nvs declared $declared")
  }

  test("abTest facade matches the events_ab_significance declared key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("events_ab_significance")(spark, d)
      .collect().map(_.toSeq).toSeq
    val units = TestData.events(spark, d)
      .withColumn("t",
        (conv(substring(md5($"user_id".cast("string")), 1, 2), 16, 10)
          .cast("int") % 2 =!= 0).cast("int"))
      .withColumn("purch",
        when($"event_type" === "purchase", 1L).otherwise(0L))
    val viaApi = engine.abTest(units, "t", "purch")
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared, s"api $viaApi vs declared $declared")
    // a planted strong effect is detected
    val strong = (Seq.fill(200)((0, 1)) ++ Seq.fill(200)((0, 0))
      ++ Seq.fill(360)((1, 1)) ++ Seq.fill(40)((1, 0))).toDF("v", "s")
    val r = engine.abTest(strong, "v", "s").head()
    assert(r.getBoolean(5), "0.5 vs 0.9 conversion at n=400 must be significant")
  }

  test("abTest yields NULL z on degenerate inputs instead of ANSI divide-by-zero") {
    // empty treatment arm
    val oneArm = engine.abTest(Seq((0, 1), (0, 0)).toDF("v", "s"), "v", "s").head()
    assert(oneArm.isNullAt(4) && oneArm.isNullAt(5), oneArm.toString)
    // pooled rate exactly 1 (every unit converts)
    val allWin = engine.abTest(
      Seq((0, 1), (0, 1), (1, 1)).toDF("v", "s"), "v", "s").head()
    assert(allWin.isNullAt(4) && allWin.isNullAt(5), allWin.toString)
    // pooled rate exactly 0
    val noWin = engine.abTest(
      Seq((0, 0), (1, 0)).toDF("v", "s"), "v", "s").head()
    assert(noWin.isNullAt(4) && noWin.isNullAt(5), noWin.toString)
    // completely empty input still returns one well-formed row
    val empty = engine.abTest(
      Seq.empty[(Int, Int)].toDF("v", "s"), "v", "s").head()
    assert(empty.isNullAt(4), empty.toString)
  }

  test("mediaNearDupPairs facade matches the multimodal_blockhash_pairs key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("multimodal_blockhash_pairs")(spark, d)
      .collect().map(_.toSeq).toSeq
    val media = graft.multimodal.Multimodal.fromDocuments(
      TestData.documents(spark, d))
    val viaApi = engine.mediaNearDupPairs(media, 2)
      .orderBy("id_a", "id_b").collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
  }

  test("mediaBlockHashes facade matches the multimodal_blockhash declared key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("multimodal_blockhash")(spark, d)
      .select("doc_id", "blockhash").collect().map(_.toSeq).toSeq
    val media = graft.multimodal.Multimodal.fromDocuments(
      TestData.documents(spark, d))
    val viaApi = engine.mediaBlockHashes(media, 16)
      .select("doc_id", "blockhash").orderBy("doc_id")
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
  }

  test("segmentOverlap facade matches the agg_segment_overlap declared key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("agg_segment_overlap")(spark, d)
      .collect().map(_.toSeq).toSeq
    // caller-side membership: same scale-free rule as the key
    // (count of type >= across-type mean)
    val members = TestData.events(spark, d)
      .groupBy("user_id", "event_type").agg(count(lit(1)).as("c"))
      .withColumn("tot", sum("c").over(
        org.apache.spark.sql.expressions.Window.partitionBy("user_id")))
      .withColumn("nseg", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("user_id")))
      .filter($"c" * 5 >= $"tot")
      .select($"user_id", $"event_type")
    val viaApi = engine.segmentOverlap(members, "user_id", "event_type")
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared, s"api $viaApi\nvs declared $declared")
  }

  test("tCloseness facade matches the privacy_t_closeness declared key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("privacy_t_closeness")(spark, d)
      .collect().map(_.toSeq).toSeq
    val fact = TestData.orders(spark, d)
      .join(broadcast(TestData.customer(spark, d)),
        $"o_custkey" === $"c_custkey")
      .select($"c_nationkey".cast("long").as("nationkey"),
        $"c_mktsegment", $"o_orderpriority")
    val viaApi = engine.tCloseness(fact,
        Seq("nationkey", "c_mktsegment"), "o_orderpriority", 0.05)
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared, s"api $viaApi\nvs declared $declared")
  }

  test("collocationsPmi facade matches the text_collocations_pmi declared key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("text_collocations_pmi")(spark, d)
      .collect().map(_.toSeq).toSeq
    val viaApi = engine.collocationsPmi(
        TestData.documents(spark, d), "lang", "text", 5)
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
  }

  test("cusumChangepoints facade matches the ts_changepoint_cusum key " +
      "and flags a planted level shift") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("ts_changepoint_cusum")(spark, d)
      .collect().map(_.toSeq).toSeq
    val hourly = TestData.events(spark, d)
      .groupBy(date_trunc("hour", $"ts").as("hour"))
      .agg(count(lit(1)).as("n"))
    val viaApi = engine.cusumChangepoints(hourly, "hour", "n", 1.0)
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
    // a planted step change (level 10 -> 30 at t=50 of 100) must alarm
    // after the shift and never before it
    val stepped = (1 to 100).map(t => (t, if (t <= 50) 10L else 30L))
      .toDF("t", "v")
    val r = engine.cusumChangepoints(stepped, "t", "v", 1.0)
      .select("t", "alarm_up").as[(Int, Boolean)].collect().toMap
    assert((1 to 50).forall(!r(_)), "no alarm before the shift")
    assert(r(100), "sustained +2x shift must alarm by the end")
  }

  test("snapshotDiff facade matches the sink_snapshot_diff declared key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("sink_snapshot_diff")(spark, d)
      .collect().map(_.toSeq).toSeq
    val docs = TestData.documents(spark, d)
      .select($"doc_id", $"lang", $"n_chars")
    val gen2 = docs.filter(expr("doc_id % 10 != 3"))
      .withColumn("n_chars",
        when(expr("doc_id % 10 = 4"), $"n_chars" + 1000)
          .otherwise($"n_chars"))
      .unionByName(docs.filter(expr("doc_id % 10 = 5"))
        .select(($"doc_id" + 10000000L).as("doc_id"), $"lang",
          ($"n_chars" + 7).as("n_chars")))
    val viaApi = engine.snapshotDiff(docs, gen2, "doc_id", Seq("n_chars"))
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared, s"api ${viaApi.take(3)}…")
  }

  test("labelPropagation facade matches the graph_label_propagation key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("graph_label_propagation")(spark, d)
      .collect().map(_.toSeq).toSeq
    val nodes = TestData.embeddings(spark, d).select($"vec_id".as("id"))
    val edges = operators.GraphOps.fixtureKnnEdges(spark, d)
      .select($"a".as("src"), $"b".as("dst"))
    val viaApi = engine.labelPropagation(nodes, edges, 3)
      .orderBy("id").collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
  }

  test("kCore facade at k=2 matches the graph_k_core key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("graph_k_core")(spark, d)
      .collect().map(_.toSeq).toSeq
    val nodes = TestData.embeddings(spark, d).select($"vec_id".as("id"))
    val edges = operators.GraphOps.fixtureKnnEdges(spark, d)
      .select($"a".as("src"), $"b".as("dst"))
    val viaApi = engine.kCore(nodes, edges, k = 2, rounds = 3)
      .orderBy("id").collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
  }

  test("kCore facade generalizes k: 3-core is a subgraph of the 2-core") {
    val d = sf("sf0.001")
    val nodes = TestData.embeddings(spark, d).select($"vec_id".as("id"))
    val edges = operators.GraphOps.fixtureKnnEdges(spark, d)
      .select($"a".as("src"), $"b".as("dst"))
    val c2 = engine.kCore(nodes, edges, k = 2, rounds = 4)
      .filter($"in_core").select($"id").collect().map(_.getLong(0)).toSet
    val c3 = engine.kCore(nodes, edges, k = 3, rounds = 4)
      .filter($"in_core").select($"id").collect().map(_.getLong(0)).toSet
    assert(c3.nonEmpty, "fixture kNN graph should retain a 3-core")
    assert(c3.subsetOf(c2), "k-cores must be nested: 3-core within 2-core")
  }

  test("facade surface: the public method count matches the documented total") {
    // The r8 docs drifted (claimed 74, grep said 73, neither defined
    // "method"): the canonical count is PUBLIC USER-FACING methods —
    // reflection minus the `spark` constructor accessor and the
    // package-private `touchedSlice` helper (package-private is
    // public in bytecode, so it must be excluded by name).
    val internal = Set("spark", "touchedSlice")
    val names = classOf[GraftEngine].getMethods
      .filter(m => m.getDeclaringClass == classOf[GraftEngine]
        && !m.getName.contains("$"))
      .map(_.getName).distinct.filterNot(internal)
    assert(names.length === 237, "documented facade count drifted; methods: "
      + names.sorted.mkString(", "))
  }

  test("detectorAuc facade: exact hand-computed values, 1.0 on perfect separation") {
    // 3 pos at {5,4,4}, 3 neg at {4,2,1}: pairwise 2×-units AUC =
    // 6 + 5 + 5 = 16 of 18 → 0.8889; step-form AP = 1·(1/3) +
    // (3/4)·(2/3) = 5/6 → 0.8333 (micro terms 1e6 + 1.5e6 over 3e6).
    val scored = Seq(("d", 5L, 1L), ("d", 4L, 1L), ("d", 4L, 1L),
      ("d", 4L, 0L), ("d", 2L, 0L), ("d", 1L, 0L))
      .toDF("detector", "score_u", "is_pos")
    val r = engine.detectorAuc(scored).collect()
    assert(r.length === 1)
    assert(r(0).getAs[Double]("auc") === 0.8889)
    assert(r(0).getAs[Double]("pr_auc") === 0.8333)
    // perfect separation reads exactly 1.0 on both metrics
    val perfect = Seq(("p", 9L, 1L), ("p", 8L, 1L), ("p", 1L, 0L),
      ("p", 0L, 0L)).toDF("detector", "score_u", "is_pos")
    val pr = engine.detectorAuc(perfect).collect()
    assert(pr(0).getAs[Double]("auc") === 1.0)
    assert(pr(0).getAs[Double]("pr_auc") === 1.0)
    // identical pos/neg score distributions read exactly 0.5 AUC
    val coin = Seq(("c", 3L, 1L), ("c", 7L, 1L), ("c", 3L, 0L),
      ("c", 7L, 0L)).toDF("detector", "score_u", "is_pos")
    assert(engine.detectorAuc(coin).collect()(0)
      .getAs[Double]("auc") === 0.5)
  }

  test("delongAucCi: brackets the AUC, width shrinks with n, matches its key") {
    val d = sf("sf0.001")
    // facade ≡ key on the fixture scored stage
    val declared = SparkEntry.queries("eval_auc_ci")(spark, d)
      .collect()
    val viaApi = engine.delongAucCi(
        operators.TextOps.plantedDetectorScores(spark, d))
      .collect()
    assert(viaApi.map(_.toSeq).toSeq === declared.map(_.toSeq).toSeq)
    declared.foreach { r =>
      val (auc, lo, hi) = (r.getAs[Double]("auc"),
        r.getAs[Double]("ci_lo"), r.getAs[Double]("ci_hi"))
      // CI contains the point estimate and stays in [0, 1]
      assert(lo <= auc && auc <= hi, s"CI misses the point: $r")
      assert(lo >= 0.0 && hi <= 1.0)
      assert(r.getAs[Double]("se_auc") > 0.0)
    }
    // width monotone ↓ in n: the same planted generator at 4× the
    // units must read a strictly narrower interval (same AUC regime)
    def planted(nn: Int, det: String) = {
      val rows = (0 until nn).flatMap { i =>
        // noisy-but-separating scores: pos ~ 6..9, neg ~ 1..6
        Seq((det, 6L + (i % 4), 1L), (det, 1L + (i % 6), 0L))
      }
      rows.toDF("detector", "score_u", "is_pos")
    }
    val small = engine.delongAucCi(planted(25, "s")).collect()(0)
    val big = engine.delongAucCi(planted(100, "s")).collect()(0)
    def width(r: org.apache.spark.sql.Row) =
      r.getAs[Double]("ci_hi") - r.getAs[Double]("ci_lo")
    assert(width(big) < width(small),
      s"CI width must shrink with n: big $big vs small $small")
    // hand case: perfect separation ⇒ every placement = 1 ⇒ zero
    // DeLong variance ⇒ degenerate width-0 interval at AUC 1
    val perfect = Seq(("p", 9L, 1L), ("p", 8L, 1L), ("p", 1L, 0L),
      ("p", 0L, 0L)).toDF("detector", "score_u", "is_pos")
    val pr = engine.delongAucCi(perfect).collect()(0)
    assert(pr.getAs[Double]("auc") === 1.0)
    assert(pr.getAs[Double]("se_auc") === 0.0)
    assert(pr.getAs[Double]("ci_lo") === 1.0
      && pr.getAs[Double]("ci_hi") === 1.0)
  }

  test("oddsRatio facade matches the events_ab_odds_ratio key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("events_ab_odds_ratio")(spark, d)
      .collect().map(_.toSeq).toSeq
    val flags = TestData.events(spark, d)
      .withColumn("t",
        (conv(substring(md5(col("user_id").cast("string")), 1, 2),
          16, 10).cast("int") % 2 =!= 0).cast("int"))
      .withColumn("purch",
        when(col("event_type") === "purchase", 1L).otherwise(0L))
    val viaApi = engine.oddsRatio(flags, "t", "purch")
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
  }

  test("captureRecapture facade matches the dedup_capture_recapture key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("dedup_capture_recapture")(spark, d)
      .collect().map(_.toSeq).toSeq
    val viaApi = engine.captureRecapture(
        SparkEntry.queries("dedup_simhash_pairs")(spark, d)
          .select("id_a", "id_b"),
        SparkEntry.queries("dedup_jaccard_pairs")(spark, d)
          .select("id_a", "id_b"))
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
  }

  test("rakeKeywords facade matches the text_rake_keywords key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("text_rake_keywords")(spark, d)
      .collect().map(_.toSeq).toSeq
    val viaApi = engine.rakeKeywords(TestData.documents(spark, d),
        "text", Seq("the", "a", "of", "and", "in"))
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
  }

  test("modularity facade matches the graft_modularity key; 1-community Q = 0") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("graph_modularity")(spark, d)
      .collect().map(_.toSeq).toSeq
    val labels = operators.GraphOps.lpaLabels(spark, d)
    val edges = operators.GraphOps.fixtureKnnEdges(spark, d)
    val viaApi = engine.modularity(labels, "id", "label", edges)
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
    // all nodes in ONE community: e_c = m and d_c = 2m exactly, so
    // the micro-quantized term is exactly 0 (Q of the trivial
    // partition is zero — the "communities are real structure"
    // baseline the key's readout is compared against)
    val one = labels.select($"id", lit(0L).as("label"))
    val rows = engine.modularity(one, "id", "label", edges).collect()
    assert(rows.length === 1 && rows.head.getAs[Long]("q_term_u") === 0L)
  }

  test("opqEncode facade matches the vec_opq_encode key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("vec_opq_encode")(spark, d)
      .collect().map(_.toSeq).toSeq
    val viaApi = engine.opqEncode(TestData.embeddings(spark, d))
      .groupBy("vec_id")
      .agg(TestData.r4(sqrt(sum(col("dist")))).as("recon_err"))
      .orderBy("vec_id")
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
  }

  test("markovAttribution facade matches the key; removal mass is positive") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("events_attribution_markov")(spark, d)
      .collect()
    val viaApi = engine.markovAttribution(TestData.events(spark, d),
        "user_id", "ts", "event_id", "event_type", "purchase")
      .collect()
    assert(viaApi.map(_.toSeq).toSeq === declared.map(_.toSeq).toSeq)
    // Σ removal effects > 0: conversions ride through SOME channel
    // (unless every conversion were a first-event purchase)
    assert(declared.map(_.getAs[Long]("removal_u")).sum > 0L,
      "removal-effect mass collapsed to zero")
    // shares normalize to 1e6 up to DIV floor truncation
    val shares = declared.map(_.getAs[Long]("share_u")).sum
    assert(shares > 1000000L - declared.length && shares <= 1000000L,
      s"shares must sum to ~1e6: $shares")
  }

  test("weightedTopK facade matches the sample_weighted_topk key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("sample_weighted_topk")(spark, d)
      .collect().map(_.toSeq).toSeq
    val viaApi = engine.weightedTopK(TestData.orders(spark, d),
        "o_orderkey", "o_totalprice", 20)
      .select($"rk", $"id".as("o_orderkey"), $"weight", $"key_n")
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
  }

  test("waveletHash facade matches the multimodal_wavelet_hash key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("multimodal_wavelet_hash")(spark, d)
      .collect().map(_.toSeq).toSeq
    val viaApi = engine.waveletHash(
        graft.multimodal.Multimodal.fromDocuments(
          TestData.documents(spark, d)))
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
  }

  test("heapsLaw facade matches the key; beta exact on planted corpora") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("text_heaps_law")(spark, d)
      .collect().map(_.toSeq).toSeq
    val viaApi = engine.heapsLaw(TestData.documents(spark, d),
      "doc_id", "text").collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
    // every doc all-new tokens: V = N at every checkpoint => beta = 1
    val disjoint = (1L to 8L).map(i =>
      (i, (1 to 4).map(j => s"w${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    val b1 = engine.heapsLaw(disjoint, "doc_id", "text")
      .select("beta").head().getDouble(0)
    assert(b1 === 1.0, s"disjoint-token corpus must fit beta = 1: $b1")
    // single repeated token: V = 1 at every checkpoint => beta = 0
    val constant = (1L to 8L).map(i => (i, "a a a")).toDF("doc_id", "text")
    val b0 = engine.heapsLaw(constant, "doc_id", "text")
      .select("beta").head().getDouble(0)
    assert(b0 === 0.0, s"constant-vocab corpus must fit beta = 0: $b0")
  }

  test("rrEstimate facade matches the key; debias tracks truth; p=1 exact") {
    val d = sf("sf0.001")
    val users = TestData.events(spark, d)
      .groupBy("user_id")
      .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .as("truth"))
      .withColumn("variant",
        when(conv(substring(md5(col("user_id").cast("string")), 1, 2),
          16, 10).cast("int") % 2 === 0, "control").otherwise("treatment"))
    val declared = SparkEntry.queries("privacy_rr_estimate")(spark, d)
      .collect()
    val viaApi = engine.rrEstimate(users, "user_id", "truth", "variant")
      .collect()
    assert(viaApi.map(_.toSeq).toSeq === declared.map(_.toSeq).toSeq)
    // the debiased estimate must land within 4 se of the true
    // (non-private) per-variant rate — the point of the mechanism
    val truthRates = users.groupBy("variant")
      .agg((sum("truth").cast("double") / count(lit(1))).as("tr"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    declared.foreach { r =>
      val v = r.getString(0)
      val err = math.abs(r.getAs[Double]("pi_est") - truthRates(v))
      assert(err <= 4 * r.getAs[Double]("se"),
        s"$v: debiased estimate off by $err > 4*se")
    }
    // flipNum = 0 (p = 1): no coin fires, the estimate IS the rate
    val exact = engine.rrEstimate(users, "user_id", "truth", "variant", 0L)
      .collect()
    def r4d(x: Double) = math.floor(x * 10000 + 0.5) / 10000
    exact.foreach { r =>
      assert(math.abs(r.getAs[Double]("pi_est")
        - r4d(truthRates(r.getString(0)))) < 1e-9,
        "p = 1 must recover the exact rate")
    }
  }

  test("hurstExponent facade matches the key; planted series bracket it") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("ts_hurst_exponent")(spark, d)
      .collect().map(_.toSeq).toSeq
    val hourly = TestData.events(spark, d)
      .groupBy(expr("unix_micros(ts) DIV 3600000000").as("hr"))
      .agg(count(lit(1)).as("y"))
    val viaApi = engine.hurstExponent(hourly, "hr", "y")
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
    // a monotone ramp is maximally persistent: H near 1
    val ramp = (0L until 512L).map(t => (t, 100L + 3L * t))
      .toDF("hr", "y")
    val hRamp = engine.hurstExponent(ramp, "hr", "y")
      .select("hurst").head().getDouble(0)
    assert(hRamp > 0.9, s"ramp must fit H near 1: $hRamp")
    // a strict alternation is maximally mean-reverting: H near 0
    val alt = (0L until 512L).map(t => (t, if (t % 2 == 0) 100L else 104L))
      .toDF("hr", "y")
    val hAlt = engine.hurstExponent(alt, "hr", "y")
      .select("hurst").head().getDouble(0)
    assert(hAlt < 0.2, s"alternation must fit H near 0: $hAlt")
    assert(hAlt < hRamp, "persistence ordering must hold")
  }

  test("wilsonCi facade matches the agg_wilson_ci key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("agg_wilson_ci")(spark, d)
      .collect().map(_.toSeq).toSeq
    val flags = TestData.events(spark, d)
      .withColumn("variant",
        when(conv(substring(md5(col("user_id").cast("string")), 1, 2),
          16, 10).cast("int") % 2 === 0, "control").otherwise("treatment"))
      .withColumn("purch",
        when(col("event_type") === "purchase", 1L).otherwise(0L))
    val viaApi = engine.wilsonCi(flags, "variant", "purch")
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
  }

  test("ebShrink facade matches the agg_eb_shrinkage key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("agg_eb_shrinkage")(spark, d)
      .collect().map(_.toSeq).toSeq
    val g = TestData.orders(spark, d)
      .join(broadcast(TestData.customer(spark, d)
          .select($"c_custkey", $"c_nationkey".cast("long").as("nk"))),
        $"o_custkey" === $"c_custkey")
      .groupBy("nk")
      .agg(count(lit(1)).as("n"),
        sum(when($"o_orderpriority" === "1-URGENT", 1L).otherwise(0L))
          .as("x"))
    val viaApi = engine.ebShrink(g, "nk", "n", "x")
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
  }

  test("rakeWeights facade matches the key; marginals converge to target") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("sample_raking_ipf")(spark, d)
      .collect()
    val cells = TestData.customer(spark, d)
      .join(broadcast(TestData.nation(spark, d)
        .select($"n_nationkey", $"n_regionkey")),
        $"c_nationkey" === $"n_nationkey")
      .groupBy($"c_mktsegment".as("r"), $"n_regionkey".cast("long").as("c"))
      .agg(count(lit(1)).as("cnt"))
    val viaApi = engine.rakeWeights(cells, "r", "c", "cnt").collect()
    assert(viaApi.map(_.toSeq).toSeq === declared.map(_.toSeq).toSeq)
    // the final (row) round must land row marginals essentially on
    // target; col marginals within 1% after 3 rounds on this table
    val rows = declared.groupBy(_.getString(0))
      .map { case (_, rs) => rs.map(_.getAs[Long]("weighted_u")).sum }
    val cols = declared.groupBy(_.getLong(1))
      .map { case (_, rs) => rs.map(_.getAs[Long]("weighted_u")).sum }
    val tgt = declared.map(_.getAs[Long]("cnt")).sum * 1000000L /
      rows.size
    rows.foreach(rm => assert(math.abs(rm - tgt).toDouble / tgt < 1e-4,
      s"row marginal $rm far from target $tgt"))
    val tgtC = declared.map(_.getAs[Long]("cnt")).sum * 1000000L /
      cols.size
    cols.foreach(cm => assert(math.abs(cm - tgtC).toDouble / tgtC < 0.01,
      s"col marginal $cm not within 1% of target $tgtC"))
  }

  test("permutationTest facade matches the key; planted shift is significant") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("agg_permutation_pvalue")(spark, d)
      .collect().map(_.toSeq).toSeq
    val pu = TestData.events(spark, d)
      .withColumn("v_u", floor(col("value") * 1000000 + 0.5).cast("long"))
      .groupBy("user_id").agg(sum("v_u").as("sum_u"))
      .withColumn("x",
        floor(col("sum_u").cast("double") / 1000000.0).cast("long"))
      .withColumn("t",
        (conv(substring(md5(col("user_id").cast("string")), 1, 2),
          16, 10).cast("int") % 2 =!= 0).cast("long"))
    val viaApi = engine.permutationTest(pu, "user_id", "t", "x")
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
    // a planted massive shift must be detected at the resolution
    // floor: every arm-1 unit's value dwarfs arm 0's, so NO
    // permutation (which mixes arms) reaches the observed split
    val planted = (1L to 40L).map(i =>
      (i, i % 2, if (i % 2 == 1) 1000000L else 0L))
      .toDF("id", "arm", "v")
    val p = engine.permutationTest(planted, "id", "arm", "v")
      .select("p_u", "n_ge").head()
    assert(p.getLong(0) <= 200000L,
      s"planted shift must be rare under permutation: p_u=${p.getLong(0)}")
  }

  test("exponentialityKs facade matches the key; planted gaps bracket it") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("events_interarrival_ks")(spark, d)
      .collect().map(_.toSeq).toSeq
    val viaApi = engine.exponentialityKs(TestData.events(spark, d),
      "user_id", "ts", "event_id").collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
    // planted EXPONENTIAL-QUANTILE gaps (one user, 512 events at the
    // inverse-CDF grid points of Exp(1/100)) must NOT reject
    def frame(gaps: Seq[Long]) = {
      val ts = gaps.scanLeft(0L)(_ + _)
      ts.zipWithIndex.map { case (t, i) =>
        (1L, new java.sql.Timestamp(t * 1000L), i.toLong) }
        .toDF("u", "ts", "tie")
    }
    val expGaps = (1 to 512).map(i =>
      math.round(-100.0 * math.log(1.0 - (i - 0.5) / 512.0)))
    val dExp = engine.exponentialityKs(frame(expGaps), "u", "ts", "tie")
      .head()
    assert(!dExp.getAs[Boolean]("reject_95"),
      s"planted exponential gaps must pass: d_u=${dExp.getAs[Long]("d_u")}")
    // planted CONSTANT gaps are maximally non-exponential: reject
    val dConst = engine.exponentialityKs(
      frame(Seq.fill(512)(100L)), "u", "ts", "tie").head()
    assert(dConst.getAs[Boolean]("reject_95"),
      s"constant gaps must reject: d_u=${dConst.getAs[Long]("d_u")}")
  }

  test("louvainRefine facade matches the graph_louvain_refine key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("graph_louvain_refine")(spark, d)
      .collect().map(_.toSeq).toSeq
    val viaApi = engine.louvainRefine(
        operators.GraphOps.lpaLabels(spark, d), "id", "label",
        operators.GraphOps.fixtureKnnEdges(spark, d))
      .select($"id".as("vec_id"), $"label".as("community"))
      .orderBy("vec_id")
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
  }

  test("personalizedPagerank facade matches the graph_pagerank_personalized key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("graph_pagerank_personalized")(spark, d)
      .collect().map(_.toSeq).toSeq
    val nodes = TestData.embeddings(spark, d).select($"vec_id".as("id"))
    val viaApi = engine.personalizedPagerank(nodes, "id",
        operators.GraphOps.fixtureKnnEdges(spark, d),
        nodes.filter($"id" % 50 === 0), "id")
      .select($"id".as("vec_id"), $"r".as("rank_u"),
        ($"r".cast("double") / 1000000.0).as("rank"))
      .orderBy("vec_id")
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
  }

  test("fisherExact / nelsonAalen / conductance facades match their keys") {
    val d = sf("sf0.001")
    val fisherDecl = SparkEntry.queries("events_ab_fisher_exact")(spark, d)
      .collect().map(_.toSeq).toSeq
    val flags = TestData.events(spark, d)
      .withColumn("t",
        (conv(substring(md5(col("user_id").cast("string")), 1, 2),
          16, 10).cast("int") % 2 =!= 0).cast("int"))
      .withColumn("purch",
        when(col("event_type") === "purchase", 1L).otherwise(0L))
    assert(engine.fisherExact(flags, "t", "purch")
      .collect().map(_.toSeq).toSeq === fisherDecl)
    assert(engine.bayesAb(flags, "t", "purch")
      .collect().map(_.toSeq).toSeq ===
      SparkEntry.queries("events_ab_bayes")(spark, d)
        .collect().map(_.toSeq).toSeq)

    val naDecl = SparkEntry.queries("events_nelson_aalen")(spark, d)
      .collect().map(_.toSeq).toSeq
    val pu = TestData.events(spark, d)
      .withColumn("ts_us", unix_micros(col("ts")))
      .groupBy("user_id")
      .agg(min("ts_us").as("t0"),
        min(when(col("event_type") === "purchase", col("ts_us")))
          .as("tconv"),
        max("ts_us").as("tlast"))
      .withColumn("ev", when(col("tconv").isNotNull, 1L).otherwise(0L))
      .withColumn("dur", when(col("ev") === 1,
        expr("(tconv - t0) DIV 3600000000"))
        .otherwise(expr("(tlast - t0) DIV 3600000000")))
    assert(engine.nelsonAalen(pu, "dur", "ev").orderBy("t_hr")
      .collect().map(_.toSeq).toSeq === naDecl)

    val condDecl = SparkEntry.queries("graph_conductance")(spark, d)
      .collect().map(_.toSeq).toSeq
    assert(engine.conductance(operators.GraphOps.lpaLabels(spark, d),
        "id", "label", operators.GraphOps.fixtureKnnEdges(spark, d))
      .orderBy("community")
      .collect().map(_.toSeq).toSeq === condDecl)
  }

  test("holtWintersInterval facade matches the ts_holtwinters_interval key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("ts_holtwinters_interval")(spark, d)
      .collect().map(_.toSeq).toSeq
    val hourly = TestData.events(spark, d)
      .groupBy(expr("unix_micros(ts) DIV 3600000000").as("hr"))
      .agg(count(lit(1)).as("cnt"))
    val viaApi = engine.holtWintersInterval(hourly, "hr", "cnt")
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
  }

  test("riskRatio / cohensH / senSlopeCi facades match their keys") {
    val d = sf("sf0.001")
    val flags = TestData.events(spark, d)
      .withColumn("tt",
        (conv(substring(md5($"user_id".cast("string")), 1, 2),
          16, 10).cast("int") % 2 =!= 0).cast("int"))
      .withColumn("pp",
        when($"event_type" === "purchase", 1L).otherwise(0L))
    assert(engine.riskRatio(flags, "tt", "pp")
      .collect().map(_.toSeq).toSeq ===
      SparkEntry.queries("events_ab_risk_ratio")(spark, d)
        .collect().map(_.toSeq).toSeq)
    assert(engine.cohensH(flags, "tt", "pp")
      .collect().map(_.toSeq).toSeq ===
      SparkEntry.queries("events_ab_cohens_h")(spark, d)
        .collect().map(_.toSeq).toSeq)
    val hourly = TestData.events(spark, d)
      .groupBy(expr("unix_micros(ts) DIV 3600000000").as("h"))
      .agg(count(lit(1)).as("v"))
    val ci = engine.senSlopeCi(hourly, "h", "v").collect()(0)
    assert(ci.toSeq ===
      SparkEntry.queries("ts_sen_slope_ci")(spark, d).collect()(0).toSeq)
    // the CI brackets the Sen point estimate, and the point estimate
    // agrees with the standalone theil_sen key
    val sen = SparkEntry.queries("ts_theil_sen")(spark, d).collect()(0)
    assert(ci.getAs[Double]("slope_per_hour") ===
      sen.getAs[Double]("slope_per_hour"))
    assert(ci.getAs[Double]("slope_lo") <= ci.getAs[Double]("slope_per_hour"))
    assert(ci.getAs[Double]("slope_per_hour") <= ci.getAs[Double]("slope_hi"))
  }

  test("poissonDispersion facade + exact SRM consistency") {
    val d = sf("sf0.001")
    val hourly = TestData.events(spark, d)
      .groupBy(expr("unix_micros(ts) DIV 3600000000").as("h"))
      .agg(count(lit(1)).as("v"))
    assert(engine.poissonDispersion(hourly, "v")
      .collect().map(_.toSeq).toSeq ===
      SparkEntry.queries("ts_poisson_dispersion")(spark, d)
        .collect().map(_.toSeq).toSeq)
    // exact SRM key = signTestExact over the ±1 variant indicator:
    // k_pos must equal the control-user count of the md5 split
    val srm = SparkEntry.queries("events_ab_srm_exact")(spark, d)
      .collect()(0)
    val nControl = TestData.events(spark, d)
      .select("user_id").distinct()
      .filter(conv(substring(md5($"user_id".cast("string")), 1, 2),
        16, 10).cast("int") % 2 === 0)
      .count()
    assert(srm.getAs[Long]("k_pos") === nControl)
    assert(srm.getAs[Double]("p_two") > 0.0
      && srm.getAs[Double]("p_two") <= 1.0)
  }

  test("hodgesLehmann / medianCi facades match their keys") {
    val d = sf("sf0.001")
    val pu = TestData.events(spark, d)
      .withColumn("v_u", floor($"value" * 1000000 + 0.5).cast("long"))
      .groupBy("user_id").agg(sum("v_u").as("sum_u"))
      .withColumn("variant",
        when(conv(substring(md5($"user_id".cast("string")), 1, 2),
          16, 10).cast("int") % 2 === 0, "control").otherwise("treatment"))
      .withColumn("x",
        floor($"sum_u".cast("double") / 1000000.0).cast("long"))
    assert(engine.hodgesLehmann(pu, "x", "variant")
      .collect().map(_.toSeq).toSeq ===
      SparkEntry.queries("agg_hodges_lehmann")(spark, d)
        .collect().map(_.toSeq).toSeq)
    val cust = TestData.customer(spark, d)
      .select($"c_mktsegment".as("g"), $"c_custkey".as("k"),
        floor($"c_acctbal" * 100 + 0.5).cast("long").as("y"))
    val ci = engine.medianCi(cust, "g", "k", "y").collect()
    assert(ci.map(_.toSeq).toSeq ===
      SparkEntry.queries("agg_median_ci")(spark, d)
        .collect().map(_.toSeq).toSeq)
    // the CI brackets the median in every segment
    ci.foreach { r =>
      assert(r.getAs[Long]("ci_lo_cents") <= r.getAs[Long]("median_cents"))
      assert(r.getAs[Long]("median_cents") <= r.getAs[Long]("ci_hi_cents"))
    }
    // planted-shift exactness: HL of {11,12,13} vs {1,2,3} is 10
    val tiny = Seq(("b", 11L), ("b", 12L), ("b", 13L),
      ("a", 1L), ("a", 2L), ("a", 3L)).toDF("g", "v")
    val hl = engine.hodgesLehmann(tiny, "v", "g", "a", "b").collect()(0)
    assert(hl.getAs[Long]("hl_shift") === 10L)
    assert(hl.getAs[Long]("n_pairs") === 9L)
  }

  test("welchAnova / archLmTest / forecastCombination facades match their keys") {
    val d = sf("sf0.001")
    val docs = TestData.documents(spark, d)
      .select($"lang".as("g"), $"n_chars".as("y"))
    assert(engine.welchAnova(docs, "g", "y")
      .collect().map(_.toSeq).toSeq ===
      SparkEntry.queries("agg_welch_anova")(spark, d)
        .collect().map(_.toSeq).toSeq)
    val hourly = TestData.events(spark, d)
      .groupBy(expr("unix_micros(ts) DIV 3600000000").as("h"))
      .agg(count(lit(1)).as("v"))
    assert(engine.archLmTest(hourly, "h", "v")
      .collect().map(_.toSeq).toSeq ===
      SparkEntry.queries("ts_arch_lm")(spark, d)
        .collect().map(_.toSeq).toSeq)
    val combo = engine.forecastCombination(hourly, "h", "v").collect()
    assert(combo.map(_.toSeq).toSeq ===
      SparkEntry.queries("ts_forecast_combination")(spark, d)
        .collect().map(_.toSeq).toSeq)
    // triangle-inequality pin: combo MAE ≤ mean of the three
    // individual MAEs (+ quantization slack)
    val mae = combo.map(r => r.getAs[String]("model")
      -> r.getAs[Double]("mae")).toMap
    if (mae.values.forall(_ != null)) {
      val meanInd = (mae("snaive") + mae("holt") + mae("holtwinters")) / 3.0
      assert(mae("combo") <= meanInd + 1e-3,
        s"combo ${mae("combo")} vs mean $meanInd")
    }
  }

  test("bounceRate facade matches the key; MRR consistent with recall") {
    val d = sf("sf0.001")
    val W = org.apache.spark.sql.expressions.Window
    val w = W.partitionBy("user_id").orderBy("ts", "event_id")
    val sess = TestData.events(spark, d)
      .withColumn("us", expr("unix_micros(ts)"))
      .withColumn("prev_us", lag("us", 1).over(w))
      .withColumn("new_sess", when($"prev_us".isNull
        || $"us" - $"prev_us" > 1800L * 1000000L, 1).otherwise(0))
      .withColumn("session_id", sum("new_sess").over(
        w.rowsBetween(W.unboundedPreceding, 0)))
      .withColumn("rn", row_number().over(
        W.partitionBy("user_id", "session_id").orderBy("ts", "event_id")))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("ne"),
        max(when($"rn" === 1, $"event_type")).as("lt"))
    assert(engine.bounceRate(sess, "lt", "ne")
      .collect().map(_.toSeq).toSeq ===
      SparkEntry.queries("events_bounce_rate")(spark, d)
        .collect().map(_.toSeq).toSeq)
    // MRR sanity vs recall: a query with recall@5 = 1 found its true
    // NN somewhere in the list ⇒ rr > 0; rr ∈ {0, 1/k} exactly
    val mrr = SparkEntry.queries("ann_mrr_eval")(spark, d).collect()
    val recall = SparkEntry.queries("ann_recall_eval")(spark, d)
      .collect().map(r => r.getAs[Long]("qid")
        -> r.getAs[Double]("recall")).toMap
    mrr.foreach { r =>
      val rr = r.getAs[Double]("rr")
      assert(rr >= 0.0 && rr <= 1.0)
      if (recall(r.getAs[Long]("qid")) === 1.0) assert(rr > 0.0)
    }
  }

  test("quantileShape / bartlettTest / competingRisks facades match their keys") {
    val d = sf("sf0.001")
    val cust = TestData.customer(spark, d)
      .select($"c_mktsegment".as("g"), $"c_custkey".as("k"),
        floor($"c_acctbal" * 100 + 0.5).cast("long").as("y"))
    assert(engine.quantileShape(cust, "g", "k", "y")
      .collect().map(_.toSeq).toSeq ===
      SparkEntry.queries("agg_quantile_skew")(spark, d)
        .collect().map(_.toSeq).toSeq)
    val docs = TestData.documents(spark, d)
      .select($"lang".as("g"), $"n_chars".as("y"))
    assert(engine.bartlettTest(docs, "g", "y")
      .collect().map(_.toSeq).toSeq ===
      SparkEntry.queries("agg_bartlett_test")(spark, d)
        .collect().map(_.toSeq).toSeq)
    // competing risks: facade parity on the keys' cause/duration
    // frame, plus the AJ additivity identity CIF_p + CIF_e ≈ 1 − S
    val pu = TestData.events(spark, d)
      .withColumn("ts_us", expr("unix_micros(ts)"))
      .groupBy("user_id")
      .agg(min("ts_us").as("t0"),
        min(when($"event_type" === "purchase", $"ts_us")).as("tp"),
        min(when($"event_type" === "error", $"ts_us")).as("te"),
        max("ts_us").as("tlast"))
      .withColumn("cause",
        when($"tp".isNotNull && ($"te".isNull || $"tp" <= $"te"), 1L)
        .when($"te".isNotNull, 2L).otherwise(0L))
      .withColumn("tev", when($"cause" === 1L, $"tp")
        .when($"cause" === 2L, $"te").otherwise($"tlast"))
      .withColumn("dur", expr("(tev - t0) DIV 3600000000"))
    val viaApi = engine.competingRisks(pu, "dur", "cause")
      .collect().map(_.toSeq).toSeq
    val declared = SparkEntry.queries("events_competing_risks")(spark, d)
      .collect()
    assert(viaApi === declared.map(_.toSeq).toSeq)
    // additivity + monotonicity: CIFs never decrease and never sum
    // past 1 (within micro-quantization slack)
    val cifP = declared.map(_.getAs[Double]("cif_purchase"))
    val cifE = declared.map(_.getAs[Double]("cif_error"))
    assert(cifP.zip(cifP.tail).forall { case (a, b) => a <= b + 1e-9 })
    assert(cifE.zip(cifE.tail).forall { case (a, b) => a <= b + 1e-9 })
    assert(cifP.zip(cifE).forall { case (p, e) => p + e <= 1.001 })
  }

  test("adfTest / kpssTest facades match their keys + planted stationarity behavior") {
    val d = sf("sf0.001")
    val hourly = TestData.events(spark, d)
      .groupBy(expr("unix_micros(ts) DIV 3600000000").as("h"))
      .agg(count(lit(1)).as("v"))
    assert(engine.adfTest(hourly, "h", "v")
      .collect().map(_.toSeq).toSeq ===
      SparkEntry.queries("ts_adf_test")(spark, d)
        .collect().map(_.toSeq).toSeq)
    assert(engine.kpssTest(hourly, "h", "v")
      .collect().map(_.toSeq).toSeq ===
      SparkEntry.queries("ts_kpss_test")(spark, d)
        .collect().map(_.toSeq).toSeq)
    // planted mean-reverting series (period-2 square + period-3
    // wobble, no exact collinearity): ADF strongly rejects the unit
    // root, KPSS does NOT reject stationarity — the firm-stationary
    // quadrant of the ADF×KPSS decision table
    val mr = (0 until 300).map(t =>
      (t.toLong, ((t % 2) * 10 + (t % 3)).toLong)).toDF("t", "y")
    val adfMr = engine.adfTest(mr, "t", "y").collect()(0)
    assert(adfMr.getAs[Boolean]("unit_root_rejected_95") === true)
    assert(adfMr.getAs[Double]("t_gamma") < -5.0)
    val kpssMr = engine.kpssTest(mr, "t", "y").collect()(0)
    assert(kpssMr.getAs[Boolean]("stationarity_rejected_95") === false)
    // planted trend: KPSS rejects level stationarity decisively
    val ramp = (0 until 300).map(t => (t.toLong, 5L * t)).toDF("t", "y")
    val kpssRamp = engine.kpssTest(ramp, "t", "y").collect()(0)
    assert(kpssRamp.getAs[Boolean]("stationarity_rejected_95") === true)
  }

  test("wilcoxonSignedRank / signTestExact facades match their keys + hand-computed pins") {
    val d = sf("sf0.001")
    // the keys' paired-delta stage reconstructed as facade input
    val ev = TestData.events(spark, d)
      .withColumn("ts_us", expr("unix_micros(ts)"))
      .withColumn("v_u", floor($"value" * 1000000 + 0.5).cast("long"))
    val mid = ev.agg(expr("(min(ts_us) + max(ts_us)) DIV 2").as("mid"))
    val deltas = ev.crossJoin(broadcast(mid))
      .groupBy("user_id")
      .agg(sum(when($"ts_us" < $"mid", $"v_u").otherwise(0L)).as("s1"),
        sum(when($"ts_us" >= $"mid", $"v_u").otherwise(0L)).as("s2"))
      .withColumn("d_w", floor(($"s1" - $"s2").cast("double")
        / 1000000.0).cast("long"))
    assert(engine.wilcoxonSignedRank(deltas, "d_w")
      .collect().map(_.toSeq).toSeq ===
      SparkEntry.queries("agg_wilcoxon_signed_rank")(spark, d)
        .collect().map(_.toSeq).toSeq)
    assert(engine.signTestExact(deltas, "d_w")
      .collect().map(_.toSeq).toSeq ===
      SparkEntry.queries("agg_sign_test")(spark, d)
        .collect().map(_.toSeq).toSeq)
    // hand-computed pins on tiny frames: deltas {1,2,3,−4,5} ⇒
    // 2W⁺ = 22, E2 = 15, Var2 = 55, z = 7/√55 ≈ 0.9439;
    // all-positive n = 5 ⇒ exact sign p = 2·(1/32) = 0.0625.
    val tiny = Seq(1L, 2L, 3L, -4L, 5L).toDF("d_w")
    val w = engine.wilcoxonSignedRank(tiny, "d_w").collect()(0)
    assert(w.getAs[Long]("w2_plus") === 22L)
    assert(w.getAs[Double]("z_wilcoxon") === 0.9439)
    val sg = engine.signTestExact(
      Seq(1L, 2L, 3L, 4L, 5L).toDF("d_w"), "d_w").collect()(0)
    assert(sg.getAs[Double]("p_two") === 0.0625)
    assert(sg.getAs[Boolean]("significant_95") === false)
  }

  test("logisticIrls facade matches its key; planted coefficients + fitted AUC recovered") {
    val d = sf("sf0.001")
    val units = TestData.events(spark, d)
      .groupBy("user_id")
      .agg(sum(when($"event_type" === "purchase", 1L).otherwise(0L))
        .as("np"),
        sum(when($"event_type" === "click", 1L).otherwise(0L)).as("x1"),
        sum(when($"event_type" === "view", 1L).otherwise(0L)).as("x2"))
      .withColumn("y", when($"np" >= 14, 1L).otherwise(0L))
    assert(engine.logisticIrls(units, "y", "x1", "x2")
      .collect().map(_.toSeq).toSeq ===
      SparkEntry.queries("agg_logistic_irls")(spark, d)
        .collect().map(_.toSeq).toSeq)
    // Planted β = (−1, 0.5, −0.3) with deterministic Knuth-hash
    // pseudo-uniform noise; 3 IRLS rounds must land within 0.15 of
    // each planted coefficient on n = 2000.
    val planted = (1 to 2000).map { i =>
      val x1 = i % 20L; val x2 = (i * 7) % 13L
      val p = 1.0 / (1.0 + math.exp(-(-1.0 + 0.5 * x1 - 0.3 * x2)))
      val u = ((i.toLong * 2654435761L) % 4294967296L) / 4294967296.0
      (if (u < p) 1L else 0L, x1, x2)
    }.toDF("y", "x1", "x2")
    val r = engine.logisticIrls(planted, "y", "x1", "x2").collect()(0)
    val (b0, b1, b2) = (r.getAs[Double]("beta0"),
      r.getAs[Double]("beta1"), r.getAs[Double]("beta2"))
    assert(math.abs(b0 + 1.0) < 0.15, s"beta0 $b0 vs planted -1")
    assert(math.abs(b1 - 0.5) < 0.15, s"beta1 $b1 vs planted 0.5")
    assert(math.abs(b2 + 0.3) < 0.15, s"beta2 $b2 vs planted -0.3")
    // the fit → score → evaluate loop: fitted scores through the
    // r14 detectorAuc core must clear 0.9 AUC on this separation
    val scored = planted
      .withColumn("detector", lit("irls"))
      .withColumn("score_u", floor(lit(1.0) / (lit(1.0)
        + exp(-(lit(b0) + lit(b1) * $"x1" + lit(b2) * $"x2")))
        * 1000000 + 0.5).cast("long"))
      .select($"detector", $"score_u", $"y".as("is_pos"))
    val auc = engine.detectorAuc(scored).collect()(0)
      .getAs[Double]("auc")
    assert(auc > 0.9, s"fitted AUC $auc must clear 0.9")
  }

  test("logLoss / durbinWatson / partialCorr / cronbachAlpha facades match their keys") {
    val d = sf("sf0.001")
    assert(engine.logLoss(graft.operators.TextOps
        .plantedDetectorScores(spark, d)
        .filter($"detector" === "jaccard"), "score_u", "is_pos")
      .collect().map(_.toSeq).toSeq ===
      SparkEntry.queries("eval_log_loss")(spark, d)
        .collect().map(_.toSeq).toSeq)
    assert(engine.durbinWatson(TestData.events(spark, d)
        .groupBy(date_trunc("hour", $"ts").as("hour"))
        .agg(count(lit(1)).as("n"))
        .withColumn("t", expr("unix_micros(hour) DIV 3600000000")),
        "t", "n")
      .collect().map(_.toSeq).toSeq ===
      SparkEntry.queries("ts_durbin_watson")(spark, d)
        .collect().map(_.toSeq).toSeq)
    assert(engine.partialCorr(TestData.lineitem(spark, d)
        .select($"l_returnflag".as("g"),
          floor($"l_quantity" + 0.5).cast("long").as("x"),
          floor($"l_extendedprice" + 0.5).cast("long").as("y"),
          floor($"l_discount" * 100 + 0.5).cast("long").as("z")),
        "g", "x", "y", "z")
      .collect().map(_.toSeq).toSeq ===
      SparkEntry.queries("agg_partial_corr")(spark, d)
        .collect().map(_.toSeq).toSeq)
    val types = Seq("click", "view", "purchase", "signup", "error")
    val cnts = types.map(t =>
      sum(when($"event_type" === t, 1L).otherwise(0L)).as(s"c_$t"))
    assert(engine.cronbachAlpha(TestData.events(spark, d)
        .groupBy("user_id").agg(cnts.head, cnts.tail: _*),
        types.map(t => s"c_$t"))
      .collect().map(_.toSeq).toSeq ===
      SparkEntry.queries("agg_cronbach_alpha")(spark, d)
        .collect().map(_.toSeq).toSeq)
    // hand pin: perfectly-correlated 2-item scale has alpha 1
    val perfect = engine.cronbachAlpha(
      Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L)).toDF("i1", "i2"),
      Seq("i1", "i2")).collect()(0)
    assert(perfect.getAs[Double]("alpha") === 1.0)
    // hand pin: two perfectly correlated vars, z independent-ish —
    // partial correlation stays defined and near the marginal
    val pc = engine.partialCorr(
      Seq(("a", 1L, 2L, 5L), ("a", 2L, 4L, 1L), ("a", 3L, 6L, 9L),
        ("a", 4L, 8L, 4L)).toDF("g", "x", "y", "z"),
      "g", "x", "y", "z").collect()(0)
    assert(pc.getAs[Double]("corr_xy") === 1.0)
  }

  test("decisionStump facade matches its key; hand-computed split; exact McNemar parity") {
    val d = sf("sf0.001")
    val units = TestData.events(spark, d)
      .groupBy("user_id")
      .agg(sum(when($"event_type" === "purchase", 1L).otherwise(0L))
        .as("np"),
        sum(when($"event_type" === "click", 1L).otherwise(0L)).as("x"))
      .select(when($"np" >= 14, 1L).otherwise(0L).as("y"), $"x")
    assert(engine.decisionStump(units, "y", "x")
      .collect().map(_.toSeq).toSeq ===
      SparkEntry.queries("agg_decision_stump")(spark, d)
        .collect().map(_.toSeq).toSeq)
    // hand case: y perfectly separated at x <= 2 — the stump must
    // find threshold 2 with gain = parent entropy and accuracy 1
    val toy = Seq((0L, 1L), (0L, 2L), (1L, 3L), (1L, 4L), (1L, 5L),
      (0L, 2L)).toDF("y", "x")
    val st = engine.decisionStump(toy, "y", "x").collect()(0)
    assert(st.getAs[Long]("threshold") === 2L)
    assert(st.getAs[Double]("train_accuracy") === 1.0)
    assert(st.getAs[Double]("info_gain") === 0.6931)
    // exact McNemar == the sign-test chain over the +/-1 discordant
    // deltas (its fifth reuse) — parity against the composition
    val ev = TestData.events(spark, d)
      .withColumn("ts_us", expr("unix_micros(ts)"))
    val mid = ev.agg(expr("(min(ts_us) + max(ts_us)) DIV 2").as("mid"))
    val deltas = ev.crossJoin(broadcast(mid))
      .groupBy("user_id")
      .agg(max(when($"event_type" === "purchase"
          && $"ts_us" < $"mid", 1L).otherwise(0L)).as("a1"),
        max(when($"event_type" === "purchase"
          && $"ts_us" >= $"mid", 1L).otherwise(0L)).as("a2"))
      .withColumn("d_w", $"a1" - $"a2")
    assert(engine.signTestExact(deltas, "d_w")
      .collect().map(_.toSeq).toSeq ===
      SparkEntry.queries("agg_mcnemar_exact")(spark, d)
        .collect().map(_.toSeq).toSeq)
  }

  test("twoWayAnova facade matches its key; balanced-design textbook cross-check") {
    val d = sf("sf0.001")
    assert(engine.twoWayAnova(TestData.customer(spark, d)
        .select($"c_nationkey".cast("long").as("a"),
          $"c_mktsegment".as("b"),
          floor($"c_acctbal" + 0.5).cast("long").as("y")),
        "a", "b", "y")
      .collect().map(_.toSeq).toSeq ===
      SparkEntry.queries("agg_two_way_anova")(spark, d)
        .collect().map(_.toSeq).toSeq)
    // balanced 2x3 design, 2 replicates: textbook sums of squares.
    // cells (a,b) -> values: deliberately additive + one interaction
    val rows = Seq(
      (0L, "u", 10L), (0L, "u", 12L), (0L, "v", 20L), (0L, "v", 22L),
      (0L, "w", 30L), (0L, "w", 32L), (1L, "u", 15L), (1L, "u", 17L),
      (1L, "v", 25L), (1L, "v", 27L), (1L, "w", 45L), (1L, "w", 47L))
      .toDF("a", "b", "y")
    val r = engine.twoWayAnova(rows, "a", "b", "y").collect()(0)
    // exact identity in quantized units, by construction
    assert(r.getAs[Long]("ss_a") + r.getAs[Long]("ss_b")
      + r.getAs[Long]("ss_ab") + r.getAs[Long]("ss_w")
      === r.getAs[Long]("ss_t"))
    // textbook values: S = 302, Σy² = 9154, C = 302²/12 = 7600.33 ⇒
    // SS_t = 1553.67 (quantized 1554); SS_w = 12 (each cell var 2);
    // SS_a = 209, SS_b = 1267, SS_ab = 66 — hand-checked.
    assert(r.getAs[Long]("ss_w") === 12L)
    assert(math.abs(r.getAs[Long]("ss_t") - 1554L) <= 1L)
    assert(r.getAs[Long]("ss_a") === 209L)
    assert(r.getAs[Long]("ss_b") === 1267L)
    assert(r.getAs[Double]("f_a") > 0 && r.getAs[Double]("f_ab") > 0)
  }

  test("coxPh facade matches its key; planted hazard ratio recovered; label-swap antisymmetry") {
    val d = sf("sf0.001")
    val pu = TestData.events(spark, d)
      .withColumn("ts_us", expr("unix_micros(ts)"))
      .groupBy("user_id")
      .agg(min("ts_us").as("t0"),
        min(when($"event_type" === "purchase", $"ts_us")).as("tconv"),
        max("ts_us").as("tlast"))
      .withColumn("ev", when($"tconv".isNotNull, 1L).otherwise(0L))
      .withColumn("dur", when($"ev" === 1,
          expr("(tconv - t0) DIV 3600000000"))
        .otherwise(expr("(tlast - t0) DIV 3600000000")))
      .withColumn("g1",
        when(conv(substring(md5($"user_id".cast("string")), 1, 2),
          16, 10).cast("int") % 2 === 0, 1L).otherwise(0L))
    assert(engine.coxPh(pu, "dur", "ev", "g1")
      .collect().map(_.toSeq).toSeq ===
      SparkEntry.queries("events_cox_ph")(spark, d)
        .collect().map(_.toSeq).toSeq)
    // Planted hazard ratio 2: inverse-CDF exponential on a
    // deterministic uniform grid; the treated arm's scale is halved
    // (hazard doubled). All events, integer-hour durations — Breslow
    // ties and discretization allow a loose band around exp(β)=2.
    val planted = (1 to 200).flatMap { i =>
      val u = (i - 0.5) / 200.0
      Seq((math.floor(-math.log(u) * 100).toLong, 1L, 0L),
        (math.floor(-math.log(u) * 50).toLong, 1L, 1L))
    }.toDF("dur", "ev", "g1")
    val r = engine.coxPh(planted, "dur", "ev", "g1").collect()(0)
    val hr = r.getAs[Double]("hazard_ratio")
    assert(hr > 1.5 && hr < 2.6, s"planted HR 2 not recovered: $hr")
    assert(r.getAs[Double]("z_cox") > 2.0, "planted effect must be significant")
    // swapping the covariate labels negates β (the partial
    // likelihood is invariant up to β → −β for a binary covariate)
    val swapped = engine.coxPh(planted.withColumn("g1", lit(1L) - $"g1"),
      "dur", "ev", "g1").collect()(0)
    assert(math.abs(r.getAs[Double]("beta")
      + swapped.getAs[Double]("beta")) < 0.02,
      "label swap must negate beta")
  }

  test("harmonicCloseness / adamicAdar / hubness / liftCurve facades match their keys") {
    val d = sf("sf0.001")
    val edges = graft.operators.GraphOps.fixtureKnnEdges(spark, d)
    val nodes = TestData.embeddings(spark, d)
    assert(engine.harmonicCloseness(nodes, "vec_id", edges,
        nodes.filter($"vec_id" < 8).select($"vec_id".as("s")), "s")
      .collect().map(_.toSeq).toSeq ===
      SparkEntry.queries("graph_closeness_sample")(spark, d)
        .collect().map(_.toSeq).toSeq)
    assert(engine.adamicAdar(edges).collect().map(_.toSeq).toSeq ===
      SparkEntry.queries("graph_adamic_adar")(spark, d)
        .collect().map(_.toSeq).toSeq)
    val directed = graft.operators.GraphOps.directedKnnEdges(spark, d)
    assert(engine.hubness(nodes, "vec_id", directed, "nn")
      .collect().map(_.toSeq).toSeq ===
      SparkEntry.queries("vec_hubness")(spark, d)
        .collect().map(_.toSeq).toSeq)
    val scored = graft.operators.TextOps.plantedDetectorScores(spark, d)
      .filter($"detector" === "jaccard")
    assert(engine.liftCurve(scored, "score_u", "is_pos")
      .collect().map(_.toSeq).toSeq ===
      SparkEntry.queries("eval_lift_curve")(spark, d)
        .collect().map(_.toSeq).toSeq)
    // lift-curve invariants: gain monotone non-decreasing down the
    // bands, top band lift ≥ 1 when any positive exists there
    val lc = SparkEntry.queries("eval_lift_curve")(spark, d).collect()
    val gains = lc.map(_.getAs[Double]("gain"))
    assert(gains.zip(gains.tail).forall { case (a, b) => a <= b + 1e-9 })
    assert(gains.last === 1.0)
  }

  test("mean-diff CI brackets the difference; sample-size sweep monotone") {
    val d = sf("sf0.001")
    val ci = SparkEntry.queries("agg_mean_diff_ci")(spark, d).collect()(0)
    assert(ci.getAs[Double]("ci_lo") <= ci.getAs[Double]("mean_diff"))
    assert(ci.getAs[Double]("mean_diff") <= ci.getAs[Double]("ci_hi"))
    // significance ⇔ zero outside the interval (same SE, same z)
    val sig = ci.getAs[Boolean]("significant_95")
    val zeroOutside = (ci.getAs[Double]("ci_lo") > 0
      || ci.getAs[Double]("ci_hi") < 0)
    assert(sig === zeroOutside,
      s"CI/flag disagree: $ci")
    // the Welch t verdict and the CI verdict must agree at z=1.96
    val t = SparkEntry.queries("agg_welch_t")(spark, d).collect()(0)
      .getAs[Double]("t_stat")
    assert((math.abs(t) > 1.959964) === sig,
      s"t $t vs CI flag $sig")
    // sample-size sweep: n_per_arm strictly decreasing in the
    // relative MDE (quadratically — a 2x easier target needs ~4x
    // fewer users)
    val ss = SparkEntry.queries("events_ab_sample_size")(spark, d)
      .collect().map(r => (r.getAs[Long]("rel_mde_pct"),
        r.getAs[Long]("n_per_arm")))
    assert(ss.map(_._1).toSeq === Seq(5L, 10L, 20L))
    assert(ss(0)._2 > ss(1)._2 && ss(1)._2 > ss(2)._2)
    assert(ss(0)._2 >= 3 * ss(1)._2,
      s"halving the MDE must roughly quadruple n: $ss")
  }

  test("coxCIndex facade matches its key; antisymmetry; planted ordering; eta2 sane") {
    val d = sf("sf0.001")
    import spark.implicits._
    val pu = TestData.events(spark, d)
      .withColumn("ts_us", unix_micros($"ts"))
      .groupBy("user_id")
      .agg(min("ts_us").as("t0"),
        min(when($"event_type" === "purchase", $"ts_us")).as("tconv"),
        max("ts_us").as("tlast"))
      .withColumn("ev", when($"tconv".isNotNull, 1L).otherwise(0L))
      .withColumn("dur", when($"ev" === 1,
        expr("(tconv - t0) DIV 3600000000"))
        .otherwise(expr("(tlast - t0) DIV 3600000000")))
      .withColumn("g1",
        when(conv(substring(md5($"user_id".cast("string")), 1, 2),
          16, 10).cast("int") % 2 === 0, 1L).otherwise(0L))
    assert(engine.coxCIndex(pu, "dur", "ev", "g1")
      .collect().map(_.toSeq).toSeq ===
      SparkEntry.queries("events_cox_cindex")(spark, d)
        .collect().map(_.toSeq).toSeq)
    // label-swap antisymmetry: C(g) + C(1-g) = 1 exactly (concordant
    // pairs swap roles, tied-score pairs stay tied)
    val c1 = engine.coxCIndex(pu, "dur", "ev", "g1").collect()(0)
    val swapped = pu.withColumn("g1", lit(1L) - $"g1")
    val c0 = engine.coxCIndex(swapped, "dur", "ev", "g1").collect()(0)
    assert(c1.getAs[Long]("c2_num") + c0.getAs[Long]("c2_num")
      === 2 * c1.getAs[Long]("n_comparable"),
      "C(g) + C(1-g) must equal 1 in exact 2x units")
    // planted perfect ranking: ONE g1 conversion with only g0
    // subjects at risk after it ⇒ every comparable pair concordant,
    // C = 1 exactly (multiple g1 events would create score-tied
    // within-group pairs, capping C below 1 by construction)
    val planted = Seq((1L, 1L, 1L)) ++
      (11L to 15L).map(i => (i + 10, 0L, 0L))
    val p = engine.coxCIndex(planted.toDF("dur", "ev", "g1"),
      "dur", "ev", "g1").collect()(0)
    assert(p.getAs[Double]("c_index") === 1.0)
    assert(p.getAs[Long]("n_comparable") === 5L)
    // eta2 effect sizes: 0 <= omega2 <= eta2 <= 1 on the fixture
    val e2 = SparkEntry.queries("agg_eta_squared")(spark, d)
      .collect()(0)
    val (eta, om) = (e2.getAs[Double]("eta2"), e2.getAs[Double]("omega2"))
    assert(eta >= 0 && eta <= 1 && om <= eta,
      s"effect sizes inconsistent: eta2 $eta omega2 $om")
  }

  test("ksSeparation facade matches its key; KS >= |2AUC-1|; recall curve sane") {
    val d = sf("sf0.001")
    val scored = graft.operators.TextOps.plantedDetectorScores(spark, d)
    assert(engine.ksSeparation(scored, "detector", "score_u", "is_pos")
      .orderBy("detector").collect().map(_.toSeq).toSeq ===
      SparkEntry.queries("eval_ks_separation")(spark, d)
        .collect().map(_.toSeq).toSeq)
    // the classic inequality KS >= AUC - 1/2 per detector (KS is the
    // MAX of TPR - FPR over thresholds; AUC - 1/2 is its integral
    // over FPR, and max >= mean on a unit interval)
    val ks = SparkEntry.queries("eval_ks_separation")(spark, d)
      .collect().map(r => r.getAs[String]("detector") ->
        (r.getAs[Double]("ks"), r.getAs[Long]("ks_threshold_u"))).toMap
    val auc = SparkEntry.queries("eval_detector_auc")(spark, d)
      .collect().map(r => r.getAs[String]("detector") ->
        r.getAs[Double]("auc")).toMap
    auc.foreach { case (det, a) =>
      assert(ks(det)._1 >= a - 0.5 - 1e-3,
        s"$det: KS ${ks(det)._1} < $a - 0.5")
    }
    // recall@k curve: values in [0,1], k=5 row consistent with
    // ann_recall_eval's per-query hits
    val curve = SparkEntry.queries("ann_recall_curve")(spark, d)
      .collect()
    assert(curve.map(_.getAs[Long]("k")).toSeq === Seq(1L, 3L, 5L))
    curve.foreach(r => assert(r.getAs[Double]("recall") >= 0
      && r.getAs[Double]("recall") <= 1.0))
    val hits5 = SparkEntry.queries("ann_recall_eval")(spark, d)
      .collect().map(_.getAs[Long]("n_hit")).sum
    assert(curve(2).getAs[Long]("n_hits") === hits5,
      "k=5 census must match ann_recall_eval")
  }

  test("spearmanCi facade matches its key; bounds bracket rho; funnel CI sane") {
    val d = sf("sf0.001")
    import spark.implicits._
    val li = TestData.lineitem(spark, d)
      .select($"l_returnflag".as("flag"),
        floor($"l_quantity" + 0.5).cast("long").as("qx"),
        floor($"l_discount" * 100 + 0.5).cast("long").as("qy"))
    assert(engine.spearmanCi(li, "flag", "qx", "qy")
      .collect().map(_.toSeq).toSeq ===
      SparkEntry.queries("agg_spearman_ci")(spark, d)
        .collect().map(_.toSeq).toSeq)
    // the CI must bracket rho on every group
    SparkEntry.queries("agg_spearman_ci")(spark, d).collect()
      .foreach { r =>
        if (!r.isNullAt(r.fieldIndex("ci_lo"))) {
          assert(r.getAs[Double]("ci_lo") <= r.getAs[Double]("rho")
            + 1e-9)
          assert(r.getAs[Double]("rho") <= r.getAs[Double]("ci_hi")
            + 1e-9)
        }
      }
    // perfectly monotone pairs: rho = 1, bounds NULL (atanh diverges)
    val mono = (1L to 10L).map(i => ("g", i, i * 2)).toDF("g", "x", "y")
    val m = engine.spearmanCi(mono, "g", "x", "y").collect()(0)
    assert(m.getAs[Double]("rho") === 1.0)
    assert(m.isNullAt(m.fieldIndex("ci_lo")))
    // funnel dropoff: counts monotone down the ladder, CI brackets
    // the conversion, step-1 base = the distinct-user census
    val f = SparkEntry.queries("events_funnel_dropoff_ci")(spark, d)
      .collect()
    assert(f.map(_.getAs[Long]("step")).toSeq === Seq(1L, 2L, 3L))
    f.foreach { r =>
      assert(r.getAs[Long]("n_reached") <= r.getAs[Long]("n_prev"))
      assert(r.getAs[Double]("ci_lo") <= r.getAs[Double]("conv") + 1e-9)
      assert(r.getAs[Double]("conv") <= r.getAs[Double]("ci_hi") + 1e-9)
    }
    val nUsers = TestData.events(spark, d)
      .select("user_id").distinct().count()
    assert(f(0).getAs[Long]("n_prev") === nUsers)
    // the ladder chains: step i's base is step i-1's reached
    assert(f(1).getAs[Long]("n_prev") === f(0).getAs[Long]("n_reached"))
    assert(f(2).getAs[Long]("n_prev") === f(1).getAs[Long]("n_reached"))
  }

  test("negativeBinomialFit facade matches its key; dispersion verdicts") {
    val d = sf("sf0.001")
    import spark.implicits._
    val u = TestData.events(spark, d)
      .groupBy("user_id").agg(count(lit(1)).as("y"))
    assert(engine.negativeBinomialFit(u, "y")
      .collect().map(_.toSeq).toSeq ===
      SparkEntry.queries("agg_negative_binomial")(spark, d)
        .collect().map(_.toSeq).toSeq)
    // planted overdispersed (half 0, half 28): r defined and small,
    // p in (0,1)
    val over = engine.negativeBinomialFit(
      (1 to 10).flatMap(_ => Seq(0L, 28L)).toDF("y"), "y").collect()(0)
    assert(over.getAs[Boolean]("overdispersed"))
    assert(over.getAs[Double]("r_hat") > 0
      && over.getAs[Double]("r_hat") < 5)
    assert(over.getAs[Double]("p_hat") > 0
      && over.getAs[Double]("p_hat") < 1)
    // constant counts: zero variance ⇒ under-dispersed, NULL r
    val cst = engine.negativeBinomialFit(
      Seq(7L, 7L, 7L).toDF("y"), "y").collect()(0)
    assert(cst.getAs[Boolean]("overdispersed") === false)
    assert(cst.isNullAt(cst.fieldIndex("r_hat")))
  }

  test("markov absorption: purchase absorbing at 1e6; probabilities in range") {
    val d = sf("sf0.001")
    val rows = SparkEntry.queries("events_markov_absorption")(spark, d)
      .collect()
    val byType = rows.map(r => (r.getAs[String]("event_type"),
      r.getAs[Long]("absorb_micro"))).toMap
    assert(byType("purchase") === 1000000L,
      "the absorbing state must read exactly 1e6")
    assert(byType.values.forall(a => a >= 0L && a <= 1000000L))
    // some non-purchase state reaches purchase within 3 transitions
    assert(byType.exists { case (t, a) => t != "purchase" && a > 0L })
  }

  test("spectralEntropy facade matches its key; planted concentration ordering") {
    val d = sf("sf0.001")
    import spark.implicits._
    val hourly = TestData.events(spark, d)
      .groupBy(expr("unix_micros(ts) DIV 3600000000").as("hr"))
      .agg(count(lit(1)).as("n"))
    assert(engine.spectralEntropy(hourly, "hr", "n")
      .collect().map(_.toSeq).toSeq ===
      SparkEntry.queries("ts_spectral_entropy")(spark, d)
        .collect().map(_.toSeq).toSeq)
    // planted 24h square wave: period 24 dominates and entropy is
    // LOW; pseudo-noise spreads power and entropy is HIGH
    val square = (0L until 336L).map(h =>
      (h, if (h % 24 < 12) 1200L else 800L)).toDF("hr", "n")
    val sq = engine.spectralEntropy(square, "hr", "n").collect()
    val sqBest = sq.maxBy(_.getAs[Long]("w_u"))
    assert(sqBest.getAs[Int]("period") === 24,
      s"square-24 peak at ${sqBest.getAs[Int]("period")}")
    assert(sqBest.getAs[Double]("p_share") > 0.7)
    // four equal-amplitude square components at candidate periods:
    // power spreads over >= 4 cells, entropy must exceed the
    // single-season series by a wide margin
    def sqw(h: Long, t: Long): Long = if (h % t < t / 2) 100L else -100L
    val mixed = (0L until 336L).map(h =>
      (h, 1000L + sqw(h, 6) + sqw(h, 24) + sqw(h, 56) + sqw(h, 168)))
      .toDF("hr", "n")
    val nz = engine.spectralEntropy(mixed, "hr", "n").collect()
    assert(sq.head.getAs[Double]("h_norm")
      < nz.head.getAs[Double]("h_norm"),
      s"square ${sq.head.getAs[Double]("h_norm")} !< " +
        s"mixed ${nz.head.getAs[Double]("h_norm")}")
  }

  test("fisherCombined / storeyPi0 facades match their keys + hand pins") {
    val d = sf("sf0.001")
    import spark.implicits._
    val ps = graft.operators.Stats.defs("agg_bh_fdr")(spark, d)
      .select($"p_u")
    assert(engine.fisherCombined(ps, "p_u").collect().map(_.toSeq).toSeq
      === SparkEntry.queries("agg_fisher_combined")(spark, d)
        .collect().map(_.toSeq).toSeq)
    assert(engine.storeyPi0(ps, "p_u").collect().map(_.toSeq).toSeq
      === SparkEntry.queries("agg_storey_pi0")(spark, d)
        .collect().map(_.toSeq).toSeq)
    // hand pins: p = (0.01, 0.02) ⇒ X² = −2(ln.01 + ln.02) ≈ 17.034,
    // df 4, Wilson-Hilferty z ≈ 2.87 ⇒ significant
    val f = engine.fisherCombined(
      Seq(10000L, 20000L).toDF("p_u"), "p_u").collect()(0)
    assert(math.abs(f.getAs[Double]("x2") - 17.0344) < 0.01)
    assert(f.getAs[Long]("df") === 4L)
    assert(f.getAs[Boolean]("significant_95"))
    // all-flat p = 1 twice: X² = 0, verdict NULL (undefined, not sig)
    val f1 = engine.fisherCombined(
      Seq(1000000L, 1000000L).toDF("p_u"), "p_u").collect()(0)
    assert(f1.getAs[Double]("x2") === 0.0)
    assert(f1.isNullAt(f1.fieldIndex("z_wh")))
    // Storey: 1 of 4 p's above ½ ⇒ π̂0 = 2·1/4 = 0.5; all above ⇒ 1
    val s1 = engine.storeyPi0(
      Seq(100000L, 200000L, 300000L, 900000L).toDF("p_u"), "p_u")
      .collect()(0)
    assert(s1.getAs[Double]("pi0") === 0.5)
    val s2 = engine.storeyPi0(
      Seq(600000L, 900000L).toDF("p_u"), "p_u").collect()(0)
    assert(s2.getAs[Double]("pi0") === 1.0)
  }

  test("hodgesLehmannCi facade matches its key; bounds bracket the shift; hand case") {
    val d = sf("sf0.001")
    import spark.implicits._
    val rows = SparkEntry.queries("agg_hodges_lehmann_ci")(spark, d)
      .collect()
    val r = rows(0)
    // the CI must bracket the point estimate, and the point estimate
    // must agree with the standalone HL key
    assert(r.getAs[Long]("ci_lo") <= r.getAs[Long]("hl_shift"))
    assert(r.getAs[Long]("hl_shift") <= r.getAs[Long]("ci_hi"))
    val hl = SparkEntry.queries("agg_hodges_lehmann")(spark, d)
      .collect()(0)
    assert(r.getAs[Long]("hl_shift") === hl.getAs[Long]("hl_shift"))
    assert(r.getAs[Long]("n_pairs") === hl.getAs[Long]("n_pairs"))
    // hand case: c = [1,2,3], t = [4,5,10] ⇒ sorted diffs
    // [1,2,2,3,3,4,7,8,9]; median 3; k_lo = max(1, ⌊4.5 −
    // 1.96·√5.25⌋) = 1 ⇒ CI = (1st, 9th) = (1, 9)
    val tiny = (Seq((1L, "control"), (2L, "control"), (3L, "control"),
      (4L, "treatment"), (5L, "treatment"), (10L, "treatment")))
      .toDF("v", "g")
    val h = engine.hodgesLehmannCi(tiny, "v", "g").collect()(0)
    assert((h.getAs[Long]("hl_shift"), h.getAs[Long]("ci_lo"),
      h.getAs[Long]("ci_hi")) === ((3L, 1L, 9L)))
  }

  test("poissonGlm facade matches its key; planted recovery; dispersion verdicts") {
    val d = sf("sf0.001")
    import spark.implicits._
    val u = TestData.events(spark, d)
      .groupBy("user_id")
      .agg(sum(when($"event_type" === "purchase", 1L).otherwise(0L))
        .as("y"),
        sum(when($"event_type" === "click", 1L).otherwise(0L)).as("x"))
    assert(engine.poissonGlm(u, "y", "x").collect().map(_.toSeq).toSeq ===
      SparkEntry.queries("agg_poisson_glm")(spark, d)
        .collect().map(_.toSeq).toSeq)
    // the fixture is synthetic-Poisson: near-equidispersed
    val fx = SparkEntry.queries("agg_poisson_glm")(spark, d).collect()(0)
    val disp = fx.getAs[Double]("dispersion")
    assert(disp > 0.5 && disp < 1.5, s"fixture dispersion drifted: $disp")
    // planted exact-rate recovery: y = 4·2^x at x ∈ {0,1,2} has MLE
    // exactly (ln 4, ln 2); 3 rounds from the ln-mean seed land
    // within 2e-4 (measured), rate ratio reads 2 to r4, and the
    // exact fit has Pearson dispersion exactly 0
    val planted = Seq((4L, 0L), (8L, 1L), (16L, 2L)).toDF("y", "x")
    val p = engine.poissonGlm(planted, "y", "x").collect()(0)
    assert(math.abs(p.getAs[Double]("beta0") - math.log(4)) < 0.001)
    assert(math.abs(p.getAs[Double]("beta1") - math.log(2)) < 0.001)
    assert(math.abs(p.getAs[Double]("rate_ratio") - 2.0) < 0.01)
    assert(p.getAs[Double]("dispersion") === 0.0)
    // planted overdispersion (half zeros, half 2μ): dispersion ≫ 1 —
    // the readout ts_poisson_dispersion flags marginally
    val over = (1 to 5).flatMap(_ => Seq((0L, 0L), (28L, 0L),
      (0L, 1L), (28L, 1L), (0L, 2L), (28L, 2L))).toDF("y", "x")
    val o = engine.poissonGlm(over, "y", "x").collect()(0)
    assert(o.getAs[Double]("dispersion") > 5.0)
  }

  test("mean sample-size sweep quadratic; transitivity in [0,1] and wedge-consistent") {
    val d = sf("sf0.001")
    val ss = SparkEntry.queries("events_ab_sample_size_means")(spark, d)
      .collect().map(r => (r.getAs[Long]("rel_mde_pct"),
        r.getAs[Long]("n_per_arm"))).sortBy(_._1)
    assert(ss.map(_._1).toSeq === Seq(5L, 10L, 20L))
    // strictly decreasing, roughly quadratic (2x easier MDE ≈ 4x
    // fewer users; ceil slack bounded by one unit per step)
    assert(ss(0)._2 > ss(1)._2 && ss(1)._2 > ss(2)._2, ss.toSeq)
    assert(ss(0)._2 >= 3 * ss(1)._2, ss.toSeq)
    val t = SparkEntry.queries("graph_transitivity")(spark, d).collect()(0)
    val (tri, wed) = (t.getAs[Long]("n_triangles"), t.getAs[Long]("n_wedges"))
    val trans = t.getAs[Double]("transitivity")
    assert(trans >= 0.0 && trans <= 1.0)
    assert(math.abs(trans - 3.0 * tri / wed.toDouble) < 2e-4)
    // every triangle closes three wedges: 3T <= W always
    assert(3 * tri <= wed, s"3T > W impossible: $t")
  }

  test("Newcombe diff CI: brackets the difference, inside [-1, 1], counts reconcile") {
    val d = sf("sf0.001")
    val r = SparkEntry.queries("events_ab_diff_ci")(spark, d).collect()(0)
    val (lo, hi, diff) = (r.getAs[Double]("ci_lo"),
      r.getAs[Double]("ci_hi"), r.getAs[Double]("diff"))
    assert(lo <= diff && diff <= hi, s"CI must bracket: $r")
    assert(lo >= -1.0 && hi <= 1.0)
    assert(math.abs(diff - (r.getAs[Double]("p_t")
      - r.getAs[Double]("p_c"))) < 2e-4)
    // the rates reconcile with the raw counts
    assert(r.getAs[Long]("x_c") <= r.getAs[Long]("n_c"))
    assert(r.getAs[Long]("x_t") <= r.getAs[Long]("n_t"))
    // Newcombe never collapses at the boundary: the same pipeline on
    // the DEGENERATE any-purchase response (p = 1 both arms) still
    // yields a nonzero-width interval containing 0 — the Wald CI
    // would read [0, 0] there and assert certainty from p̂ = 1
    import spark.implicits._
    // (hand-check of the closed form at x = n: Wilson lo < 1 always)
    val z = 1.959964; val z2 = z * z
    val n = 8.0
    val lcAt1 = ((1.0 + z2 / (2 * n)) / (1.0 + z2 / n)) -
      (z * math.sqrt(z2 / (4 * n * n)) / (1.0 + z2 / n))
    assert(lcAt1 < 1.0 && lcAt1 > 0.5)
  }

  test("many-vs-control: Bonferroni stricter than per-comparison, k counts defined z") {
    val d = sf("sf0.001")
    val rows = SparkEntry.queries("agg_many_vs_control")(spark, d).collect()
    assert(rows.length === 24) // 25 nations minus the reference
    val k = rows(0).getAs[Long]("k")
    assert(k === rows.count(!_.isNullAt(rows(0).fieldIndex("z"))))
    // the family-wise critical is strictly stricter than the
    // per-comparison 1.96 (containment: fw-significant ⊆ raw)
    val zc = rows(0).getAs[Double]("z_crit")
    assert(zc > 1.96, s"Bonferroni critical must exceed 1.96: $zc")
    rows.foreach { r =>
      if (r.getAs[Boolean]("significant_fw"))
        assert(math.abs(r.getAs[Double]("z")) > 1.96)
    }
    // the md5 split carries no real nation effect — no nation should
    // clear the family-wise bar on this fixture
    assert(!rows.exists(_.getAs[Boolean]("significant_fw")))
  }

  test("boxCoxLambda: matches its key; planted transforms pick their own lambda") {
    val d = sf("sf0.001")
    import spark.implicits._
    val hourly = TestData.events(spark, d)
      .groupBy(expr("unix_micros(ts) DIV 3600000000").as("hr"))
      .agg(count(lit(1)).as("y"))
    assert(engine.boxCoxLambda(hourly, "y").collect().map(_.toSeq).toSeq
      === SparkEntry.queries("ts_box_cox_lambda")(spark, d)
        .collect().map(_.toSeq).toSeq)
    // exactly one argmax row flagged, and it carries the max ll
    val fx = SparkEntry.queries("ts_box_cox_lambda")(spark, d).collect()
    assert(fx.count(_.getAs[Boolean]("is_best")) === 1)
    val best = fx.filter(_.getAs[Boolean]("is_best"))(0)
    assert(fx.filter(!_.isNullAt(1))
      .forall(_.getAs[Double]("ll") <= best.getAs[Double]("ll")))
    // planted scale recovery (margins verified ≫ quantization noise
    // against an exact reference): squared-uniform data picks the
    // √ transform, multiplicative data picks ln
    def pick(ys: Seq[Long]): Double = {
      val r = engine.boxCoxLambda(ys.toDF("y"), "y").collect()
      r.filter(_.getAs[Boolean]("is_best"))(0).getAs[Double]("lam")
    }
    val squared = (0 until 400).map(i => (5L + i * 37 % 100)
      * (5L + i * 37 % 100))
    assert(pick(squared) === 0.5, "squared scale should pick sqrt")
    val lognormalish = (0 until 400)
      .map(i => math.round(math.exp(3.0 + (i * 37 % 100) / 16.0)))
    assert(pick(lognormalish) === 0.0,
      "multiplicative data should pick ln")
  }

  test("delongCompare: paired verdict, antisymmetry, matches the per-detector AUCs") {
    val d = sf("sf0.001")
    val scored = operators.TextOps.plantedDetectorScores(spark, d)
    val r = engine.delongCompare(scored, "jaccard", "simhash").collect()(0)
    assert(r.toSeq === SparkEntry.queries("eval_delong_compare")(spark, d)
      .collect()(0).toSeq)
    // the paired AUCs must equal the per-detector point AUCs
    val cis = SparkEntry.queries("eval_auc_ci")(spark, d).collect()
      .map(x => x.getAs[String]("detector") -> x.getAs[Double]("auc"))
      .toMap
    assert(r.getAs[Double]("auc_a") === cis("jaccard"))
    assert(r.getAs[Double]("auc_b") === cis("simhash"))
    // simhash dominates jaccard on the planted dups — significantly
    assert(r.getAs[Double]("auc_diff") < 0)
    assert(r.getAs[Boolean]("significant_95"))
    // swapping the detectors negates the difference and z exactly
    val sw = engine.delongCompare(scored, "simhash", "jaccard").collect()(0)
    assert(math.abs(sw.getAs[Double]("auc_diff")
      + r.getAs[Double]("auc_diff")) < 2e-4)
    assert(math.abs(sw.getAs[Double]("z") + r.getAs[Double]("z")) < 2e-3)
    assert(sw.getAs[Double]("se_diff") === r.getAs[Double]("se_diff"))
    // a detector against itself: zero difference, zero variance
    val self = engine.delongCompare(scored, "jaccard", "jaccard").collect()(0)
    assert(self.getAs[Double]("auc_diff") === 0.0)
    assert(self.getAs[Double]("se_diff") === 0.0)
    assert(self.isNullAt(self.fieldIndex("z")))
  }

  test("bayesFactorAb: matches its key; planted effect/null verdicts") {
    val d = sf("sf0.001")
    import spark.implicits._
    val u = TestData.events(spark, d)
      .groupBy("user_id")
      .agg(sum(when($"event_type" === "purchase", 1L).otherwise(0L))
        .as("np"))
      .withColumn("t",
        (conv(substring(md5($"user_id".cast("string")), 1, 2), 16, 10)
          .cast("int") % 2 =!= 0).cast("int"))
      .select($"t", when($"np" >= 14, 1L).otherwise(0L).as("conv"))
    assert(engine.bayesFactorAb(u, "t", "conv").collect().map(_.toSeq).toSeq
      === SparkEntry.queries("events_ab_bayes_factor")(spark, d)
        .collect().map(_.toSeq).toSeq)
    // planted strong effect (5% vs 60% on 100/arm): BF >> 1
    val eff = ((0 until 100).map(i => (0, if (i < 5) 1L else 0L))
      ++ (0 until 100).map(i => (1, if (i < 60) 1L else 0L)))
      .toDF("t", "conv")
    val be = engine.bayesFactorAb(eff, "t", "conv").collect()(0)
    assert(be.getAs[Boolean]("favors_effect"), be)
    assert(be.getAs[Double]("ln_bf10") > 3.0, be)
    // identical arms: BF < 1 (evidence FOR the null — the readout a
    // p-value cannot give)
    val same = (0 until 100).flatMap(i =>
      Seq((0, if (i % 4 == 0) 1L else 0L),
        (1, if (i % 4 == 0) 1L else 0L)))
    val sm = engine.bayesFactorAb(same.toDF("t", "conv"), "t", "conv")
      .collect()(0)
    assert(!sm.getAs[Boolean]("favors_effect"), sm)
    assert(sm.getAs[Double]("bf10") < 1.0, sm)
  }

  test("ancova facade matches its key; balanced covariate leaves means; exact case") {
    val d = sf("sf0.001")
    import spark.implicits._
    val u = TestData.documents(spark, d)
      .select($"lang".as("g"), $"n_chars".as("y"),
        size(split($"text", " ")).cast("long").as("x"))
    assert(engine.ancova(u, "g", "y", "x").collect().map(_.toSeq).toSeq ===
      SparkEntry.queries("agg_ancova")(spark, d)
        .collect().map(_.toSeq).toSeq)
    // exact hand case: y = 10x + group offset; the pooled slope is
    // exactly 10 and the adjusted means recover the offsets shifted
    // by the grand-mean anchoring
    val planted = Seq(
      ("a", 100L, 10L), ("a", 120L, 12L), ("a", 140L, 14L),
      ("b", 205L, 10L), ("b", 225L, 12L), ("b", 245L, 14L))
      .toDF("g", "y", "x")
    val r = engine.ancova(planted, "g", "y", "x").collect()
      .map(row => row.getAs[String]("g") -> row).toMap
    assert(r("a").getAs[Double]("slope_within") === 10.0)
    // both groups share x̄_g = x̄ ⇒ adjusted ≡ raw means exactly
    assert(r("a").getAs[Double]("adj_mean_y")
      === r("a").getAs[Double]("mean_y"))
    assert(r("b").getAs[Double]("adj_mean_y")
      - r("a").getAs[Double]("adj_mean_y") === 105.0)
    // fixture sanity: adjusted means collapse toward each other
    // (token count explains most of the raw per-lang chars spread)
    val fx = SparkEntry.queries("agg_ancova")(spark, d).collect()
    val raw = fx.map(_.getAs[Double]("mean_y"))
    val adj = fx.map(_.getAs[Double]("adj_mean_y"))
    assert(adj.max - adj.min < raw.max - raw.min,
      s"adjustment must shrink the spread: raw $raw adj $adj")
  }

  test("zipfFit facade matches its key; planted power law recovers its slope") {
    val d = sf("sf0.001")
    import spark.implicits._
    val freqs = TestData.documents(spark, d)
      .select(explode(split($"text", " ")).as("word"))
      .filter(length($"word") > 0)
      .groupBy("word").agg(count(lit(1)).as("n"))
    assert(engine.zipfFit(freqs, "word", "n").collect().map(_.toSeq).toSeq
      === SparkEntry.queries("text_zipf_fit")(spark, d)
        .collect().map(_.toSeq).toSeq)
    // planted exact Zipf: n(rank) = round(1e6 / rank) over 200 types
    // fits slope ≈ −1 with r² ≈ 1
    val planted = (1 to 200)
      .map(r => (f"w$r%04d", math.round(1e6 / r)))
      .toDF("word", "n")
    val z = engine.zipfFit(planted, "word", "n").collect()(0)
    assert(math.abs(z.getAs[Double]("slope") + 1.0) < 0.01, z)
    assert(z.getAs[Double]("r2") > 0.999, z)
    // planted slope −2 (freq ∝ rank⁻²)
    val steep = (1 to 200)
      .map(r => (f"w$r%04d", math.round(1e9 / (r.toLong * r))))
      .toDF("word", "n")
    val z2 = engine.zipfFit(steep, "word", "n").collect()(0)
    assert(math.abs(z2.getAs[Double]("slope") + 2.0) < 0.01, z2)
  }

  test("crossCorrelation: matches its key, planted lag argmax, lag-0 symmetry") {
    val d = sf("sf0.001")
    import spark.implicits._
    val hourly = TestData.events(spark, d)
      .groupBy(date_trunc("hour", $"ts").as("hour"))
      .agg(sum(when($"event_type" === "click", 1L).otherwise(0L)).as("x"),
        sum(when($"event_type" === "purchase", 1L).otherwise(0L)).as("y"))
      .withColumn("t", expr("unix_micros(hour) DIV 3600000000"))
    assert(engine.crossCorrelation(hourly, "t", "x", "y")
      .collect().map(_.toSeq).toSeq ===
      SparkEntry.queries("ts_ccf")(spark, d).collect().map(_.toSeq).toSeq)
    // planted lag: y_t = x_{t-3} exactly ⇒ r(k) peaks at k = +3
    // (x LEADS y by 3 periods) and reads exactly 1 there
    val xs = (0L until 60L).map(t => (t, 10L + (t * 7 % 13)))
    val planted = xs.map { case (t, x) =>
      (t, x, xs.find(_._1 == t - 3).map(_._2).getOrElse(0L))
    }.toDF("t", "x", "y").filter($"t" >= 3)
    val r = engine.crossCorrelation(planted, "t", "x", "y")
      .collect().map(row => (row.getAs[Long]("lag"),
        Option(row.getAs[Any]("ccf")).map(_.asInstanceOf[Double])))
    val best = r.filter(_._2.isDefined).maxBy(_._2.get)
    assert(best._1 === 3L, s"planted lag must argmax at +3: ${r.toSeq}")
    // the standard estimator keeps the FULL-series denominator, so a
    // finite exact shift reads < 1 (n−k of n pairs + window-mean
    // mismatch at the boundary) — 0.94 measured; pin a 0.9 floor
    assert(best._2.get > 0.9, s"exact shift must read near 1: $best")
    // x-vs-x CCF is symmetric: r(k) = r(-k)
    val sym = engine.crossCorrelation(
        planted.select($"t", $"x", $"x".as("y2")), "t", "x", "y2")
      .collect().map(row => row.getAs[Long]("lag")
        -> row.getAs[Double]("ccf")).toMap
    (1L to 6L).foreach { k =>
      assert(math.abs(sym(k) - sym(-k)) < 2e-4, s"symmetry at $k: $sym")
    }
    assert(sym(0L) === 1.0)
  }

  test("events_km_rmst: monotone in tau, capped by tau, equals mean duration uncensored") {
    val d = sf("sf0.001")
    import spark.implicits._
    val rows = SparkEntry.queries("events_km_rmst")(spark, d)
      .collect().sortBy(_.getAs[Long]("tau"))
    assert(rows.map(_.getAs[Long]("tau")).toSeq === Seq(168L, 336L, 100000L))
    // RMST(τ) ≤ τ and strictly monotone ↑ in τ while S > 0
    rows.foreach { r =>
      assert(r.getAs[Double]("rmst_control") <= r.getAs[Long]("tau"))
      assert(r.getAs[Double]("rmst_treatment") <= r.getAs[Long]("tau"))
      assert(r.getAs[Double]("se_control") >= 0.0)
      // diff is exactly treatment − control (integer micro subtraction)
      assert(math.abs(r.getAs[Double]("rmst_diff")
        - (r.getAs[Double]("rmst_treatment")
          - r.getAs[Double]("rmst_control"))) < 2e-4)
    }
    assert(rows(0).getAs[Double]("rmst_control")
      <= rows(1).getAs[Double]("rmst_control"))
    assert(rows(1).getAs[Double]("rmst_control")
      <= rows(2).getAs[Double]("rmst_control"))
    // uncensored fixture (every user converts): RMST at τ ≥ max
    // duration IS the mean time-to-convert per variant, up to the
    // micro-nat KM quantization (~1e-4 relative)
    val pu = TestData.events(spark, d)
      .withColumn("ts_us", unix_micros($"ts"))
      .groupBy("user_id")
      .agg(min("ts_us").as("t0"),
        min(when($"event_type" === "purchase", $"ts_us")).as("tconv"),
        max("ts_us").as("tlast"))
      .filter($"tconv".isNotNull)
      .withColumn("dur_hr", expr("(tconv - t0) DIV 3600000000"))
      .withColumn("variant",
        when(conv(substring(md5($"user_id".cast("string")), 1, 2),
          16, 10).cast("int") % 2 === 0, "control").otherwise("treatment"))
    val means = pu.groupBy("variant")
      .agg(avg($"dur_hr".cast("double")).as("mean_dur"))
      .collect().map(r => r.getAs[String]("variant")
        -> r.getAs[Double]("mean_dur")).toMap
    val far = rows(2)
    assert(math.abs(far.getAs[Double]("rmst_control")
      - means("control")) < 0.05 * means("control") + 0.5,
      s"RMST(inf) vs mean: $far vs $means")
    assert(math.abs(far.getAs[Double]("rmst_treatment")
      - means("treatment")) < 0.05 * means("treatment") + 0.5)
  }

  test("gammaGlm facade matches its key; planted recovery; Poisson misfits spend") {
    val d = sf("sf0.001")
    import spark.implicits._
    val u = TestData.events(spark, d)
      .groupBy("user_id")
      .agg(sum(when($"event_type" === "purchase",
          floor($"value" * 100 + 0.5).cast("long")).otherwise(0L)).as("y"),
        sum(when($"event_type" === "click", 1L).otherwise(0L)).as("x"))
    assert(engine.gammaGlm(u, "y", "x").collect().map(_.toSeq).toSeq ===
      SparkEntry.queries("agg_gamma_glm")(spark, d)
        .collect().map(_.toSeq).toSeq)
    // planted exact-rate recovery: y = 400·2^x at x ∈ {0,1,2} fits
    // exactly (ln 400, ln 2); exact fit ⇒ Pearson dispersion 0
    val planted = Seq((400L, 0L), (800L, 1L), (1600L, 2L)).toDF("y", "x")
    val p = engine.gammaGlm(planted, "y", "x").collect()(0)
    assert(math.abs(p.getAs[Double]("beta0") - math.log(400)) < 0.001, p)
    assert(math.abs(p.getAs[Double]("beta1") - math.log(2)) < 0.001, p)
    assert(math.abs(p.getAs[Double]("rate_ratio") - 2.0) < 0.01)
    assert(p.getAs[Double]("dispersion") === 0.0)
    // the honesty pin (the overdispersion lesson in reverse): cent-
    // scale spend run through the COUNT model reads dispersion ≫ 1
    // (Poisson variance = μ but spend variance ~ μ²/shape ≫ μ at
    // cent scale), while the Gamma fit's dispersion stays O(1) —
    // fitting spend with poissonGlm is a model error the readouts
    // expose. Multiplicative ±60 % noise around 2000·2^x:
    val noisy = (1 to 10).flatMap(i => Seq(
      (if (i % 2 == 0) 3200L else 800L, 0L),
      (if (i % 2 == 0) 6400L else 1600L, 1L),
      (if (i % 2 == 0) 12800L else 3200L, 2L))).toDF("y", "x")
    val g = engine.gammaGlm(noisy, "y", "x").collect()(0)
    val pois = engine.poissonGlm(noisy, "y", "x").collect()(0)
    assert(g.getAs[Double]("dispersion") < 1.0,
      s"gamma dispersion should be O(1): $g")
    assert(pois.getAs[Double]("dispersion") > 100.0,
      s"poisson on spend should read huge dispersion: $pois")
    // scale-free: the Gamma relative-residual dispersion is the same
    // whatever the cent multiplier (the shape readout is unitless)
    assert(g.getAs[Double]("shape_hat") > 1.0)
  }

  test("isotonicFit facade matches its key; monotone; fitted ECE <= raw ECE") {
    val d = sf("sf0.001")
    val scored = graft.operators.TextOps.plantedDetectorScores(spark, d)
      .filter($"detector" === "jaccard")
    val rows = SparkEntry.queries("eval_calibration_fit")(spark, d).collect()
    assert(engine.isotonicFit(scored, "score_u", "is_pos")
      .collect().map(_.toSeq).toSeq === rows.map(_.toSeq).toSeq)
    // monotone non-decreasing in score — the isotonic contract
    val fits = rows.map(_.getAs[Long]("fit_u"))
    assert(fits.zip(fits.tail).forall { case (a, b) => a <= b },
      "isotonic fit not monotone")
    // grid-level fitted ECE <= raw ECE on the planted scores (the
    // VERDICT r15 done-criterion): the fit corrects calibration
    val n = rows.map(_.getAs[Long]("n_pairs")).sum.toDouble
    def ece(conf: org.apache.spark.sql.Row => Double) =
      rows.map(r => math.abs(r.getAs[Long]("n_pos")
        - r.getAs[Long]("n_pairs") * conf(r))).sum / n
    val raw = ece(r => r.getAs[Long]("score_u") / 10000.0)
    val fitted = ece(r => r.getAs[Long]("fit_u") / 1e6)
    assert(fitted <= raw + 1e-9, s"fitted ECE $fitted > raw $raw")
    // pool-boundary hand case: cells (1:[0,1]) (2:[1,0,0]) (3:[0])
    // (4:[1,1]) pool the first three at 2/6, leave 4 at 1
    import spark.implicits._
    val tiny = Seq((1L, 0L), (1L, 1L), (2L, 1L), (2L, 0L), (2L, 0L),
      (3L, 0L), (4L, 1L), (4L, 1L)).toDF("s", "y")
    val hand = engine.isotonicFit(tiny, "s", "y").collect()
      .map(r => (r.getAs[Long]("score_u"), r.getAs[Long]("fit_u")))
    assert(hand.toSeq === Seq((1L, 333333L), (2L, 333333L),
      (3L, 333333L), (4L, 1000000L)))
  }

  test("turningPointTest / permutationEntropy / brierScore facades match their keys") {
    val d = sf("sf0.001")
    val hourly = TestData.events(spark, d)
      .groupBy(expr("unix_micros(ts) DIV 3600000000").as("h"))
      .agg(count(lit(1)).as("v"))
    assert(engine.turningPointTest(hourly, "h", "v")
      .collect().map(_.toSeq).toSeq ===
      SparkEntry.queries("ts_turning_points")(spark, d)
        .collect().map(_.toSeq).toSeq)
    assert(engine.permutationEntropy(hourly, "h", "v")
      .collect().map(_.toSeq).toSeq ===
      SparkEntry.queries("ts_permutation_entropy")(spark, d)
        .collect().map(_.toSeq).toSeq)
    val scored = graft.operators.TextOps.plantedDetectorScores(spark, d)
      .filter($"detector" === "jaccard")
    assert(engine.brierScore(scored, "score_u", "is_pos")
      .collect().map(_.toSeq).toSeq ===
      SparkEntry.queries("eval_brier_score")(spark, d)
        .collect().map(_.toSeq).toSeq)
    // decomposition sanity on the fixture: BS, REL, RES, UNC all
    // non-negative and BS ≈ REL − RES + UNC within binning slack
    val b = SparkEntry.queries("eval_brier_score")(spark, d).collect()(0)
    val (bs, rel, res, unc) = (b.getAs[Double]("brier"),
      b.getAs[Double]("reliability"), b.getAs[Double]("resolution"),
      b.getAs[Double]("uncertainty"))
    assert(bs >= 0 && rel >= 0 && res >= 0 && unc >= 0)
    assert(math.abs(bs - (rel - res + unc)) < 0.05,
      s"Murphy decomposition drifted: $bs vs ${rel - res + unc}")
  }

  test("colemanLiau / ariIndex / smogGrade facades match their keys") {
    val d = sf("sf0.001")
    val docs = TestData.documents(spark, d)
      .select($"doc_id".as("id"), $"text")
    assert(engine.colemanLiau(docs).collect().map(_.toSeq).toSeq ===
      SparkEntry.queries("text_coleman_liau")(spark, d)
        .collect().map(_.toSeq).toSeq)
    assert(engine.ariIndex(docs).collect().map(_.toSeq).toSeq ===
      SparkEntry.queries("text_ari")(spark, d)
        .collect().map(_.toSeq).toSeq)
    assert(engine.smogGrade(docs).collect().map(_.toSeq).toSeq ===
      SparkEntry.queries("text_smog")(spark, d)
        .collect().map(_.toSeq).toSeq)
    // MCC sanity vs the threshold sweep: same confusion cells, so
    // tp/fp agree per threshold; MCC ∈ [−1, 1]
    val mcc = SparkEntry.queries("eval_mcc_sweep")(spark, d).collect()
    val sweep = SparkEntry.queries("dedup_threshold_sweep")(spark, d)
      .collect().map(r => r.getAs[Long]("threshold_u")
        -> (r.getAs[Long]("tp"), r.getAs[Long]("fp"))).toMap
    mcc.foreach { r =>
      val (tp, fp) = sweep(r.getAs[Long]("threshold_u"))
      assert(r.getAs[Long]("tp") === tp && r.getAs[Long]("fp") === fp)
      val m = r.getAs[Double]("mcc")
      assert(m >= -1.0 && m <= 1.0)
    }
  }

  test("cliffsDelta / moodMedianTest / jarqueBera facades match their keys") {
    val d = sf("sf0.001")
    // the declared keys' per-user whole-unit value + md5 split,
    // reconstructed as the facade's (value, group) input
    val pu = TestData.events(spark, d)
      .withColumn("v_u", floor($"value" * 1000000 + 0.5).cast("long"))
      .groupBy("user_id").agg(sum("v_u").as("sum_u"))
      .withColumn("variant",
        when(conv(substring(md5($"user_id".cast("string")), 1, 2),
          16, 10).cast("int") % 2 === 0, "control").otherwise("treatment"))
      .withColumn("x",
        floor($"sum_u".cast("double") / 1000000.0).cast("long"))
    val cdRows = SparkEntry.queries("agg_cliffs_delta")(spark, d).collect()
    assert(engine.cliffsDelta(pu, "x", "variant")
      .collect().map(_.toSeq).toSeq === cdRows.map(_.toSeq).toSeq)
    // pair-count identities against the Mann-Whitney key on the
    // same grid: gt+lt+tie = n_c·n_t and 2·gt + tie = U2.
    val cd = cdRows(0)
    val mw = SparkEntry.queries("agg_mann_whitney")(spark, d).collect()(0)
    val (gt, lt, tie) = (cd.getAs[Long]("n_gt"), cd.getAs[Long]("n_lt"),
      cd.getAs[Long]("n_tie"))
    assert(gt + lt + tie ===
      cd.getAs[Long]("n_control") * cd.getAs[Long]("n_treatment"))
    assert(2 * gt + tie === mw.getAs[Long]("u2_treatment"))
    assert(engine.moodMedianTest(pu, "x", "variant")
      .collect().map(_.toSeq).toSeq ===
      SparkEntry.queries("agg_mood_median")(spark, d)
        .collect().map(_.toSeq).toSeq)
    val li = TestData.lineitem(spark, d)
      .select($"l_returnflag".as("g"),
        floor($"l_quantity" + 0.5).cast("long").as("q"))
    assert(engine.jarqueBera(li, "g", "q")
      .collect().map(_.toSeq).toSeq ===
      SparkEntry.queries("agg_jarque_bera")(spark, d)
        .collect().map(_.toSeq).toSeq)
  }

  test("huberMean / designEffect facades match their keys") {
    val d = sf("sf0.001")
    val units = TestData.customer(spark, d)
      .select($"c_mktsegment".as("g"), $"c_custkey".as("k"),
        floor($"c_acctbal" * 100 + 0.5).cast("long").as("y"))
    assert(engine.huberMean(units, "g", "k", "y").orderBy("seg")
      .collect().map(_.toSeq).toSeq ===
      SparkEntry.queries("agg_huber_mean")(spark, d)
        .collect().map(_.toSeq).toSeq)
    val cl = TestData.customer(spark, d)
      .select($"c_nationkey".as("c"),
        floor($"c_acctbal" * 100 + 0.5).cast("long").as("y"))
    assert(engine.designEffect(cl, "c", "y")
      .collect().map(_.toSeq).toSeq ===
      SparkEntry.queries("agg_design_effect")(spark, d)
        .collect().map(_.toSeq).toSeq)
  }

  test("energyDistance facade matches the vec_energy_distance key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("vec_energy_distance")(spark, d)
      .collect().map(_.toSeq).toSeq
    val sample = TestData.embeddings(spark, d)
      .filter(substring(md5($"vec_id".cast("string")), 1, 2) < "20")
    val viaApi = engine.energyDistance(
        sample.filter($"vec_id" % 2 === 0),
        sample.filter($"vec_id" % 2 === 1), "vec_id", "embedding")
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
  }

  test("intrinsicDim facade matches the vec_intrinsic_dim key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("vec_intrinsic_dim")(spark, d)
      .collect().map(_.toSeq).toSeq
    val viaApi = engine.intrinsicDim(TestData.embeddings(spark, d),
        "vec_id", "embedding",
        operators.GraphOps.directedKnnEdges(spark, d).select("qid", "nn"))
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
  }

  test("louvainCoarsen facade matches the graph_louvain_coarsen key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("graph_louvain_coarsen")(spark, d)
      .collect().map(_.toSeq).toSeq
    val viaApi = engine.louvainCoarsen(
        operators.GraphOps.lpaLabels(spark, d), "id", "label",
        operators.GraphOps.fixtureKnnEdges(spark, d))
      .select($"id".as("vec_id"), $"label".as("community"))
      .orderBy("vec_id")
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
  }

  test("holmStepDown facade reproduces the agg_holm_bonferroni columns") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("agg_holm_bonferroni")(spark, d)
      .select("nationkey", "p_u", "rk", "significant")
      .collect().map(_.toSeq).toSeq
    val viaApi = engine.holmStepDown(
        SparkEntry.queries("agg_holm_bonferroni")(spark, d)
          .select("nationkey", "p_u"), "nationkey", "p_u")
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
  }

  test("bollingerBands / rollingCorr facades match the declared keys") {
    val d = sf("sf0.001")
    val hourly = TestData.events(spark, d)
      .groupBy(expr("unix_micros(ts) DIV 3600000000").as("hr"))
      .agg(count(lit(1)).as("cnt"))
    assert(engine.bollingerBands(hourly, "hr", "cnt")
        .collect().map(_.toSeq).toSeq ===
      SparkEntry.queries("ts_bollinger_bands")(spark, d)
        .collect().map(_.toSeq).toSeq)
    val two = TestData.events(spark, d)
      .groupBy(expr("unix_micros(ts) DIV 3600000000").as("hr"))
      .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
          .as("a"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("b"))
    assert(engine.rollingCorr(two, "hr", "a", "b")
        .collect().map(_.toSeq).toSeq ===
      SparkEntry.queries("ts_rolling_corr")(spark, d)
        .collect().map(_.toSeq).toSeq)
  }

  test("mcNemar / pairedT facades match the declared paired keys") {
    val d = sf("sf0.001")
    val ev = TestData.events(spark, d)
      .withColumn("ts_us", unix_micros(col("ts")))
    val mid = ev.agg(expr("(min(ts_us) + max(ts_us)) DIV 2").as("mid"))
    val flags = ev.crossJoin(broadcast(mid))
      .groupBy("user_id")
      .agg(max(when(col("event_type") === "purchase"
          && col("ts_us") < col("mid"), 1).otherwise(0)).as("a1"),
        max(when(col("event_type") === "purchase"
          && col("ts_us") >= col("mid"), 1).otherwise(0)).as("a2"))
    assert(engine.mcNemar(flags, "a1", "a2")
        .collect().map(_.toSeq).toSeq ===
      SparkEntry.queries("agg_mcnemar")(spark, d)
        .collect().map(_.toSeq).toSeq)
    val diffs = ev.withColumn("v_u",
        floor(col("value") * 1000000 + 0.5).cast("long"))
      .crossJoin(broadcast(mid))
      .groupBy("user_id")
      .agg(sum(when(col("ts_us") < col("mid"), col("v_u")).otherwise(0L))
          .as("s1"),
        sum(when(col("ts_us") >= col("mid"), col("v_u")).otherwise(0L))
          .as("s2"))
      .withColumn("d_w", floor((col("s1") - col("s2")).cast("double")
        / 1000000.0).cast("long"))
    assert(engine.pairedT(diffs, "d_w")
        .collect().map(_.toSeq).toSeq ===
      SparkEntry.queries("agg_paired_t")(spark, d)
        .collect().map(_.toSeq).toSeq)
  }

  test("dctPerceptualHash facade matches the multimodal_dct_phash key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("multimodal_dct_phash")(spark, d)
      .collect().map(_.toSeq).toSeq
    val viaApi = engine.dctPerceptualHash(
        graft.multimodal.Multimodal.fromDocuments(
          TestData.documents(spark, d)))
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
  }

  test("bhStepUp facade reproduces the agg_bh_fdr step-up columns") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("agg_bh_fdr")(spark, d)
      .select("nationkey", "p_u", "rk", "significant")
      .collect().map(_.toSeq).toSeq
    val viaApi = engine.bhStepUp(
        SparkEntry.queries("agg_bh_fdr")(spark, d)
          .select("nationkey", "p_u"), "nationkey", "p_u")
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
  }

  test("kaplanMeierBy facade matches the events_km_variants key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("events_km_variants")(spark, d)
      .collect().map(_.toSeq).toSeq
    val pu = TestData.events(spark, d)
      .withColumn("ts_us", unix_micros(col("ts")))
      .groupBy("user_id")
      .agg(min("ts_us").as("t0"),
        min(when(col("event_type") === "purchase", col("ts_us")))
          .as("tconv"),
        max("ts_us").as("tlast"))
      .withColumn("event", when(col("tconv").isNotNull, 1L).otherwise(0L))
      .withColumn("dur_hr",
        when(col("event") === 1, expr("(tconv - t0) DIV 3600000000"))
          .otherwise(expr("(tlast - t0) DIV 3600000000")))
      .withColumn("variant",
        when(conv(substring(md5(col("user_id").cast("string")), 1, 2),
          16, 10).cast("int") % 2 === 0, "control").otherwise("treatment"))
    val viaApi = engine.kaplanMeierBy(pu, "dur_hr", "event", "variant")
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
  }

  test("assertConstraints + assertReferential compose to the declared key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("profile_assert_constraints")(spark, d)
      .collect().map(_.toSeq).toSeq
    val viaApi = engine.assertConstraints(TestData.events(spark, d),
        "events",
        acceptedValues = Map("event_type" ->
          Seq("click", "purchase", "signup", "view")),
        maxNullRatePct = Map("value" -> 1))
      .unionByName(engine.assertConstraints(TestData.orders(spark, d),
        "orders",
        unique = Seq("o_orderkey"), positive = Seq("o_totalprice")))
      .unionByName(engine.assertReferential(TestData.orders(spark, d),
        "o_custkey", "orders", TestData.customer(spark, d), "c_custkey",
        "customer").select("constraint_name", "table_name", "n_checked",
        "n_violations", "passed"))
      .orderBy("constraint_name")
      .collect().map(_.toSeq).toSeq
    // the key names its RI row referential_orders_customer — the
    // facade generates the same name from (childName, parentName)
    assert(viaApi === declared)
  }

  test("olsTwo facade matches the agg_ols_multi declared key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("agg_ols_multi")(spark, d)
      .collect().map(_.toSeq).toSeq
    val li = TestData.lineitem(spark, d)
      .select(col("l_returnflag").as("f"),
        floor(col("l_quantity") + 0.5).cast("long").as("q"),
        floor(col("l_discount") * 100 + 0.5).cast("long").as("disc"),
        floor(col("l_extendedprice") + 0.5).cast("long").as("price"))
    val viaApi = engine.olsTwo(li, "f", "q", "disc", "price")
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
  }

  test("logRank facade matches the events_logrank declared key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("events_logrank")(spark, d)
      .collect().map(_.toSeq).toSeq
    val pu = TestData.events(spark, d)
      .withColumn("ts_us", unix_micros(col("ts")))
      .groupBy("user_id")
      .agg(min("ts_us").as("t0"),
        min(when(col("event_type") === "purchase", col("ts_us")))
          .as("tconv"),
        max("ts_us").as("tlast"))
      .withColumn("event", when(col("tconv").isNotNull, 1L).otherwise(0L))
      .withColumn("dur_hr",
        when(col("event") === 1, expr("(tconv - t0) DIV 3600000000"))
          .otherwise(expr("(tlast - t0) DIV 3600000000")))
      .withColumn("variant",
        when(conv(substring(md5(col("user_id").cast("string")), 1, 2),
          16, 10).cast("int") % 2 === 0, "control").otherwise("treatment"))
    val viaApi = engine.logRank(pu, "dur_hr", "event", "variant")
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
  }

  test("sesBacktest facade matches the ts_ses_backtest declared key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("ts_ses_backtest")(spark, d)
      .collect().map(_.toSeq).toSeq
    val hourly = TestData.events(spark, d)
      .groupBy(expr("unix_micros(ts) DIV 3600000000").as("hr"))
      .agg(count(lit(1)).as("cnt"))
    val viaApi = engine.sesBacktest(hourly, "hr", "cnt")
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
  }

  test("holtBacktest facade matches the ts_holt_backtest declared key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("ts_holt_backtest")(spark, d)
      .collect().map(_.toSeq).toSeq
    val hourly = TestData.events(spark, d)
      .groupBy(expr("unix_micros(ts) DIV 3600000000").as("hr"))
      .agg(count(lit(1)).as("cnt"))
    val viaApi = engine.holtBacktest(hourly, "hr", "cnt")
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
  }

  test("holtWintersBacktest facade matches the ts_holtwinters_backtest key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("ts_holtwinters_backtest")(spark, d)
      .collect().map(_.toSeq).toSeq
    val hourly = TestData.events(spark, d)
      .groupBy(expr("unix_micros(ts) DIV 3600000000").as("hr"))
      .agg(count(lit(1)).as("cnt"))
    val viaApi = engine.holtWintersBacktest(hourly, "hr", "cnt")
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
  }

  test("ar2Backtest facade matches the ts_ar2_backtest declared key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("ts_ar2_backtest")(spark, d)
      .collect().map(_.toSeq).toSeq
    val hourly = TestData.events(spark, d)
      .groupBy(expr("unix_micros(ts) DIV 3600000000").as("hr"))
      .agg(count(lit(1)).as("cnt"))
    val viaApi = engine.ar2Backtest(hourly, "hr", "cnt")
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
  }

  test("mergedQuantiles facade matches the profile_quantile_merge key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("profile_quantile_merge")(spark, d)
      .collect().map(_.toSeq).toSeq
    val viaApi = engine.mergedQuantiles(
      TestData.lineitem(spark, d)
        .select((col("l_orderkey") % 8).as("sh"),
          floor(col("l_extendedprice") * 100 + 0.5).as("cents"),
          col("l_orderkey"), col("l_linenumber")),
      "sh", "cents", Seq("l_orderkey", "l_linenumber"))
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
  }

  test("sampledBetweenness facade matches the graph_betweenness_sample key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("graph_betweenness_sample")(spark, d)
      .collect().map(_.toSeq).toSeq
    val emb = TestData.embeddings(spark, d)
    val viaApi = engine.sampledBetweenness(
        emb.select(col("vec_id")), "vec_id",
        operators.GraphOps.fixtureKnnEdges(spark, d), "a", "b",
        emb.filter(col("vec_id") < 8).select(col("vec_id")), "vec_id")
      .select(col("id").as("vec_id"), col("bc_u"))
      .orderBy("vec_id")
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
  }

  test("msprtSequential facade matches the events_ab_sequential key; p monotone") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("events_ab_sequential")(spark, d)
      .collect()
    val flags = TestData.events(spark, d)
      .withColumn("day", expr("unix_micros(ts) DIV 86400000000"))
      .withColumn("t",
        (conv(substring(md5(col("user_id").cast("string")), 1, 2),
          16, 10).cast("int") % 2 =!= 0).cast("int"))
      .withColumn("purch",
        when(col("event_type") === "purchase", 1L).otherwise(0L))
    val viaApi = engine.msprtSequential(flags, "day", "t", "purch")
      .collect()
    assert(viaApi.map(_.toSeq).toSeq === declared.map(_.toSeq).toSeq)
    val ps = declared.map(_.getAs[Long]("p_seq_u"))
    assert(ps.zip(ps.tail).forall { case (a, b) => b <= a },
      s"always-valid p rose on the fixture: ${ps.mkString(",")}")
  }

  test("srmCheck facade matches the events_ab_srm declared key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("events_ab_srm")(spark, d)
      .collect().map(_.toSeq).toSeq
    val assignments = TestData.events(spark, d)
      .select($"user_id").distinct()
      .withColumn("t",
        (conv(substring(md5($"user_id".cast("string")), 1, 2), 16, 10)
          .cast("int") % 2 =!= 0).cast("int"))
    val viaApi = engine.srmCheck(assignments, "t")
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
    // a planted 60/40 skew at n=1000 must be flagged
    val skewed = (Seq.fill(600)(0) ++ Seq.fill(400)(1)).toDF("t")
    assert(engine.srmCheck(skewed, "t").head().getBoolean(3),
      "600/400 must trip the SRM gate")
  }

  test("weightedMedian facade matches the agg_weighted_median declared key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("agg_weighted_median")(spark, d)
      .collect().map(_.toSeq).toSeq
    val li = TestData.lineitem(spark, d)
      .select($"l_returnflag",
        TestData.r4($"l_extendedprice").as("v"), $"l_quantity")
    val viaApi = engine.weightedMedian(li, "l_returnflag", "v", "l_quantity")
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
  }

  test("contentChecksum facade matches the sink_content_checksum key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("sink_content_checksum")(spark, d)
      .collect().map(_.toSeq).toSeq
    val viaApi = engine.contentChecksum(
        TestData.documents(spark, d), "lang", "doc_id",
        Seq("doc_id", "text"))
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
  }

  test("epochQuotas facade matches the pipeline_mix_epoch_schedule key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("pipeline_mix_epoch_schedule")(spark, d)
      .select("lang", "n_tokens", "epoch_quota")
      .collect().map(_.toSeq).toSeq
    val per = TestData.documents(spark, d)
      .select($"lang", size(split($"text", " ")).as("nt"))
      .groupBy("lang").agg(sum($"nt").as("n_tokens"))
    val viaApi = engine.epochQuotas(per, "lang", "n_tokens", 1000000L)
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
  }

  test("balancedDownsample facade matches the declared key's audit") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("sample_balanced_downsample")(spark, d)
      .collect().map(_.toSeq).toSeq
    val kept = engine.balancedDownsample(
      TestData.documents(spark, d).select($"doc_id", $"lang"),
      "lang", "doc_id")
    val before = TestData.documents(spark, d)
      .groupBy("lang").agg(count(lit(1)).as("n_before"))
    val viaApi = before.join(
        kept.groupBy("lang").agg(count(lit(1)).as("n_after"),
          sum($"doc_id").as("kept_id_checksum")), Seq("lang"))
      .orderBy("lang").collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
  }

  test("dpNoisyCounts facade matches the privacy_dp_noise declared key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("privacy_dp_noise")(spark, d)
      .collect().map(_.toSeq).toSeq
    val viaApi = engine.dpNoisyCounts(
        TestData.documents(spark, d), "lang", 1.0)
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
  }

  test("giniConcentration facade matches the agg_gini_concentration key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("agg_gini_concentration")(spark, d)
      .collect().map(_.toSeq).toSeq
    val o = TestData.orders(spark, d)
      .join(broadcast(TestData.customer(spark, d)),
        $"o_custkey" === $"c_custkey")
      .select($"c_nationkey".cast("long").as("nationkey"), $"o_orderkey",
        floor($"o_totalprice" * 100 + 0.5).cast("long").as("cents"))
    val viaApi = engine.giniConcentration(o, "nationkey", "cents",
        "o_orderkey")
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
  }

  test("activeUnits facade matches the events_dau_wau_mau declared key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("events_dau_wau_mau")(spark, d)
      .collect().map(_.toSeq).toSeq
    val viaApi = engine.activeUnits(TestData.events(spark, d),
        "user_id", "ts", 7, 30)
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
  }

  test("profileQuantiles facade matches the profile_columns_quantiles key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("profile_columns_quantiles")(spark, d)
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        Seq(r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toSeq
    val viaApi = engine.profileQuantiles(
        TestData.lineitem(spark, d),
        Seq("l_orderkey", "l_partkey", "l_quantity",
          "l_extendedprice", "l_discount"),
        Seq(0.25, 0.5, 0.75, 0.9), 1000)
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getSeq[Double](2).toSeq))
      .toSeq
    assert(viaApi === declared)
  }

  test("quantileDrift facade matches the profile_drift_quantile key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("profile_drift_quantile")(spark, d)
      .collect().map(_.toSeq).toSeq
    val viaApi = engine.quantileDrift(
        TestData.lineitem(spark, d),
        col("l_shipdate") >= lit("1995-06-01"),
        Seq("l_quantity", "l_extendedprice", "l_discount"),
        Seq(0.25, 0.5, 0.75, 0.9), 1000)
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
    // drift direction sanity: every row carries both halves
    declared.foreach { r =>
      assert(r(2).asInstanceOf[Long] > 0 && r(3).asInstanceOf[Long] > 0,
        "both halves must be populated on the fixture")
    }
  }
  test("theilIndex facade matches the agg_theil_index key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("agg_theil_index")(spark, d)
      .collect().map(_.toSeq).toSeq
    val o = TestData.orders(spark, d)
      .join(broadcast(TestData.customer(spark, d)),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_nationkey").cast("long").as("nationkey"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
    val viaApi = engine.theilIndex(o, "nationkey", "cents")
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
  }

  test("benfordDeviation facade matches the agg_benford_deviation key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("agg_benford_deviation")(spark, d)
      .collect().map(_.toSeq).toSeq
    val viaApi = engine.benfordDeviation(
        TestData.orders(spark, d), "o_totalprice")
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
  }

  test("winsorizedMean facade matches the agg_winsorized_mean key values") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("agg_winsorized_mean")(spark, d)
      .collect().map(_.toSeq).toSeq
    val li = TestData.lineitem(spark, d)
      .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
        floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("cents"))
    val viaApi = engine.winsorizedMean(li, "l_returnflag", "cents",
        Seq("l_orderkey", "l_linenumber"))
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
  }

  test("ttrRichness facade matches the text_ttr_richness key values") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("text_ttr_richness")(spark, d)
      .collect().map(_.toSeq).toSeq
    val viaApi = engine.ttrRichness(
        TestData.documents(spark, d).select(col("doc_id").as("id"),
          col("text")))
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
  }

  test("ngramNovelty facade at n=3 matches the text_ngram_novelty key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("text_ngram_novelty")(spark, d)
      .collect().map(_.toSeq).toSeq
    val in = TestData.documents(spark, d)
      .select(col("doc_id").as("id"), col("text"))
    val viaApi = engine.ngramNovelty(in, 3)
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
    // generalized n: bigram novelty must cover >= trigram's doc set
    // (every doc with >= 3 tokens also has >= 2), and ratios stay in [0,1]
    val bi = engine.ngramNovelty(in, 2).collect()
    assert(bi.length >= declared.length)
    bi.foreach { r =>
      val nov = r.getDouble(3)
      assert(nov >= 0.0 && nov <= 1.0)
    }
  }

  test("degreeAssortativity facade matches the graph key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("graph_degree_assortativity")(spark, d)
      .collect().map(_.toSeq).toSeq
    val edges = operators.GraphOps.fixtureKnnEdges(spark, d)
      .select(col("a").as("src"), col("b").as("dst"))
    val viaApi = engine.degreeAssortativity(edges)
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
  }

  test("theilSen facade matches the ts_theil_sen key values") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("ts_theil_sen")(spark, d)
      .collect().map(_.toSeq).toSeq
    val hourly = TestData.events(spark, d)
      .groupBy(date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n"))
      .withColumn("xh", expr("unix_micros(hour) DIV 3600000000"))
    val viaApi = engine.theilSen(hourly, "xh", "n")
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
  }

  test("newReturning facade matches the events_new_returning key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("events_new_returning")(spark, d)
      .collect().map(_.toSeq).toSeq
    val viaApi = engine.newReturning(TestData.events(spark, d))
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
  }

  test("churnWeekly facade matches the events_churn_weekly key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("events_churn_weekly")(spark, d)
      .collect().map(_.toSeq).toSeq
    val viaApi = engine.churnWeekly(TestData.events(spark, d))
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
  }
  test("hhiConcentration facade matches the agg_hhi_concentration key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("agg_hhi_concentration")(spark, d)
      .collect().map(_.toSeq).toSeq
    val in = TestData.orders(spark, d)
      .join(broadcast(TestData.customer(spark, d)),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_nationkey").cast("long").as("nationkey"),
        col("c_custkey"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
    val viaApi = engine.hhiConcentration(in, "nationkey", "c_custkey", "cents")
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
  }

  test("generalizationLadder facade matches the privacy ladder key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("privacy_generalization_ladder")(spark, d)
      .collect().map(_.toSeq).toSeq
    val viaApi = engine.generalizationLadder(TestData.documents(spark, d),
        Seq("lang", "source"), "n_chars", Seq(10L, 100L, 1000L), 5)
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
  }

  test("seasonalStrength facade matches the ts_seasonal_strength key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("ts_seasonal_strength")(spark, d)
      .collect().map(_.toSeq).toSeq
    val hourly = TestData.events(spark, d)
      .filter(col("event_type") === "click")
      .groupBy(expr("unix_micros(ts) DIV 3600000000").as("hr"))
      .agg(count(lit(1)).as("cnt"))
    val viaApi = engine.seasonalStrength(hourly, "hr", "cnt", 24, 12)
      .collect().map(_.toSeq).toSeq
    // facade emits n_points; the key names it n_hours — values match
    assert(viaApi === declared)
  }

  test("concurrencyPeak facade matches the events_concurrency_peak key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("events_concurrency_peak")(spark, d)
      .collect().map(_.toSeq).toSeq
    val viaApi = engine.concurrencyPeak(TestData.events(spark, d),
        "event_type", 30)
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
  }
  test("compressionRatio facade matches the text_compression_ratio key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("text_compression_ratio")(spark, d)
      .collect().map(_.toSeq).toSeq
    val viaApi = engine.compressionRatio(
        TestData.documents(spark, d)
          .select(col("doc_id").as("id"), col("text")))
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
  }

  test("seasonalityHeatmap facade matches the events_seasonality_heatmap key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("events_seasonality_heatmap")(spark, d)
      .collect().map(_.toSeq).toSeq
    val viaApi = engine.seasonalityHeatmap(TestData.events(spark, d))
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
  }

  /** The round-10 keys' per-user value table (micro-quantized sums,
    * md5 variant split, whole-unit grid value) — input to the
    * Mann-Whitney / KS parity pins.
    */
  private def variantUsers(d: String) =
    TestData.events(spark, d)
      .withColumn("v_u", floor(col("value") * 1000000 + 0.5).cast("long"))
      .groupBy("user_id").agg(sum("v_u").as("sum_u"))
      .withColumn("variant",
        when(conv(substring(md5(col("user_id").cast("string")), 1, 2),
          16, 10).cast("int") % 2 === 0, "control").otherwise("treatment"))
      .withColumn("x",
        floor(col("sum_u").cast("double") / 1000000.0).cast("long"))

  test("mannWhitney facade matches the agg_mann_whitney key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("agg_mann_whitney")(spark, d)
      .collect().map(_.toSeq).toSeq
    val viaApi = engine.mannWhitney(variantUsers(d), "x", "variant")
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
  }

  test("ksTest facade matches the agg_ks_test key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("agg_ks_test")(spark, d)
      .collect().map(_.toSeq).toSeq
    val viaApi = engine.ksTest(variantUsers(d), "x", "variant")
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
  }

  test("cramersV facade matches the agg_cramers_v key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("agg_cramers_v")(spark, d)
      .collect().map(_.toSeq).toSeq
    val viaApi = engine.cramersV(
        TestData.customer(spark, d)
          .select(col("c_nationkey").cast("long").as("nationkey"),
            col("c_mktsegment")),
        "nationkey", "c_mktsegment")
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
  }

  test("spearmanRho facade matches the agg_spearman_rho key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("agg_spearman_rho")(spark, d)
      .collect().map(_.toSeq).toSeq
    val li = TestData.lineitem(spark, d)
      .select(col("l_returnflag").as("flag"),
        floor(col("l_quantity") + 0.5).cast("long").as("qx"),
        floor(col("l_discount") * 100 + 0.5).cast("long").as("qy"))
    val viaApi = engine.spearmanRho(li, "flag", "qx", "qy")
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
  }

  test("kendallTau facade matches the agg_kendall_tau key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("agg_kendall_tau")(spark, d)
      .collect().map(_.toSeq).toSeq
    val li = TestData.lineitem(spark, d)
      .select(col("l_returnflag").as("flag"),
        floor(col("l_quantity") + 0.5).cast("long").as("qx"),
        floor(col("l_discount") * 100 + 0.5).cast("long").as("qy"))
    val viaApi = engine.kendallTau(li, "flag", "qx", "qy")
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
  }

  test("anovaF facade matches the agg_anova_f key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("agg_anova_f")(spark, d)
      .collect().map(_.toSeq).toSeq
    val viaApi = engine.anovaF(
        TestData.documents(spark, d), "lang", "n_chars")
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
  }

  test("welchT facade matches the agg_welch_t key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("agg_welch_t")(spark, d)
      .collect().map(_.toSeq).toSeq
    val viaApi = engine.welchT(variantUsers(d), "x", "variant")
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
  }

  test("pacfLags3 facade matches the ts_pacf key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("ts_pacf")(spark, d)
      .collect().map(_.toSeq).toSeq
    val hourly = TestData.events(spark, d)
      .groupBy(date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n"))
    val viaApi = engine.pacfLags3(hourly, "hour", "n")
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
  }

  test("cohensD facade matches the agg_cohens_d key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("agg_cohens_d")(spark, d)
      .collect().map(_.toSeq).toSeq
    val viaApi = engine.cohensD(variantUsers(d), "x", "variant")
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
  }

  test("runsTest facade matches the ts_runs_test key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("ts_runs_test")(spark, d)
      .collect().map(_.toSeq).toSeq
    val hourly = TestData.events(spark, d)
      .groupBy(expr("unix_micros(ts) DIV 3600000000").as("hr"))
      .agg(count(lit(1)).as("n"))
    val viaApi = engine.runsTest(hourly, "hr", "n")
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
  }

  test("spectralPeak facade matches the ts_spectral_peak key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("ts_spectral_peak")(spark, d)
      .collect().map(_.toSeq).toSeq
    val hourly = TestData.events(spark, d)
      .groupBy(expr("unix_micros(ts) DIV 3600000000").as("hr"))
      .agg(count(lit(1)).as("n"))
    val viaApi = engine.spectralPeak(hourly, "hr", "n")
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
  }

  test("reciprocity facade matches the graph_reciprocity key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("graph_reciprocity")(spark, d)
      .collect().map(_.toSeq).toSeq
    val edges = graft.operators.GraphOps.directedKnnEdges(spark, d)
      .select(col("qid"), col("nn"))
    val viaApi = engine.reciprocity(edges, "qid", "nn")
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
  }

  test("contingencyStdres facade matches the agg_contingency_stdres key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("agg_contingency_stdres")(spark, d)
      .collect().map(_.toSeq).toSeq
    val f = TestData.customer(spark, d)
      .select(col("c_nationkey").cast("long").as("nationkey"),
        col("c_mktsegment"))
    val viaApi = engine.contingencyStdres(f, "nationkey", "c_mktsegment")
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
  }

  test("mutualInformation facade matches the agg_mutual_information key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("agg_mutual_information")(spark, d)
      .collect().map(_.toSeq).toSeq
    val f = TestData.customer(spark, d)
      .select(col("c_nationkey").cast("long").as("nationkey"),
        col("c_mktsegment"))
    val viaApi = engine.mutualInformation(f, "nationkey", "c_mktsegment")
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
  }

  test("markovStationary facade matches the events_markov_stationary key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("events_markov_stationary")(spark, d)
      .collect().map(_.toSeq).toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val transitions = TestData.events(spark, d)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"))
      .withColumn("next_type", lead("event_type", 1).over(w))
      .filter(col("next_type").isNotNull)
    val viaApi = engine
      .markovStationary(transitions, "event_type", "next_type")
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
  }

  test("hyperplaneLsh facade matches the vec_hyperplane_lsh key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("vec_hyperplane_lsh")(spark, d)
      .collect().map(_.toSeq).toSeq
    val viaApi = engine.hyperplaneLsh(
        TestData.embeddings(spark, d), "vec_id", "embedding")
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
  }

  test("neymanAllocation facade matches the sample_neyman_allocation key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("sample_neyman_allocation")(spark, d)
      .collect().map(_.toSeq).toSeq
    val li = TestData.lineitem(spark, d)
      .select(col("l_returnflag"),
        floor(col("l_extendedprice") + 0.5).cast("long").as("x"))
    val viaApi = engine.neymanAllocation(li, "l_returnflag", "x", 10000L)
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
  }

  test("aspectBucket facade matches the multimodal_aspect_bucket key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("multimodal_aspect_bucket")(spark, d)
      .collect().map(_.toSeq).toSeq
    val imgs = graft.multimodal.Multimodal
      .fromDocuments(TestData.documents(spark, d))
      .filter(col("mime") === "image/png")
    val viaApi = engine.aspectBucket(imgs, "doc_id", "width", "height")
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
  }

  test("conditionalEntropy facade matches the text_conditional_entropy key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("text_conditional_entropy")(spark, d)
      .collect().map(_.toSeq).toSeq
    val viaApi = engine.conditionalEntropy(
        TestData.documents(spark, d), "lang", "text")
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
  }

  test("mannKendall facade matches the ts_mann_kendall key values") {
    val d = sf("sf0.001")
    // the key emits n_distinct-free columns; facade's n_points ==
    // the key's n_hours, rest identical
    val declared = SparkEntry.queries("ts_mann_kendall")(spark, d)
      .collect().map(_.toSeq).toSeq
    val hourly = TestData.events(spark, d)
      .groupBy(date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n"))
      .withColumn("xh", expr("unix_micros(hour) DIV 3600000000"))
      .select("xh", "n")
    val viaApi = engine.mannKendall(hourly, "xh", "n")
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
  }

  test("kaplanMeier facade matches the events_survival_km key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("events_survival_km")(spark, d)
      .collect().map(_.toSeq).toSeq
    val pu = TestData.events(spark, d)
      .withColumn("ts_us", unix_micros(col("ts")))
      .groupBy("user_id")
      .agg(min("ts_us").as("t0"),
        min(when(col("event_type") === "purchase", col("ts_us")))
          .as("tconv"),
        max("ts_us").as("tlast"))
      .withColumn("event", when(col("tconv").isNotNull, 1L).otherwise(0L))
      .withColumn("dur_hr",
        when(col("event") === 1, expr("(tconv - t0) DIV 3600000000"))
          .otherwise(expr("(tlast - t0) DIV 3600000000")))
    val viaApi = engine.kaplanMeier(pu, "dur_hr", "event")
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
  }

  test("kaplanMeier handles planted censoring and the zero tail") {
    // 4 at-risk: death at t=1 (S=3/4), censor at t=2 (no drop, no
    // row), both remaining die at t=3 (n_risk = d_t ⇒ S = exactly 0).
    val dur = Seq((1L, 1L), (2L, 0L), (3L, 1L), (3L, 1L))
      .toDF("dur", "ev")
    val rows = engine.kaplanMeier(dur, "dur", "ev")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(rows.toSeq === Seq((1L, 4L, 1L, 0L, 0.75), (3L, 2L, 2L, 0L, 0.0)))
  }

  test("burstiness facade matches the events_burstiness key values") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("events_burstiness")(spark, d)
      .collect().map(_.toSeq).toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    val gaps = TestData.events(spark, d)
      .withColumn("ts_us", unix_micros(col("ts")))
      .withColumn("lag_us", lag(col("ts_us"), 1).over(w))
      .withColumn("gap_sec", expr("(ts_us - lag_us) DIV 1000000"))
    val viaApi = engine.burstiness(gaps, "event_type", "gap_sec")
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
  }

  test("levelShift facade matches the ts_level_shift key values") {
    val d = sf("sf0.01")
    val declared = SparkEntry.queries("ts_level_shift")(spark, d)
      .collect().map(_.toSeq).toSeq
    val hourly = TestData.events(spark, d)
      .groupBy(expr("unix_micros(ts) DIV 3600000000").as("hr"))
      .agg(count(lit(1)).as("cnt"))
    val viaApi = engine.levelShift(hourly, "hr", "cnt")
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
    assert(declared.nonEmpty, "sf0.01 must produce full windows")
  }

  test("clusteringCoefficient facade matches the graph_clustering_coeff key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("graph_clustering_coeff")(spark, d)
      .collect().map(_.toSeq).toSeq
    val pairs = graft.operators.GraphOps.fixtureKnnEdges(spark, d)
      .select(col("a").as("src"), col("b").as("dst"))
    val nodes = TestData.embeddings(spark, d).select(col("vec_id").as("id"))
    val viaApi = engine.clusteringCoefficient(nodes, pairs)
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
  }

  test("hits facade matches the graph_hits key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("graph_hits")(spark, d)
      .collect().map(_.toSeq).toSeq
    val edges = graft.operators.GraphOps.directedKnnEdges(spark, d)
      .select(col("qid").as("src"), col("nn").as("dst"))
    val nodes = TestData.embeddings(spark, d).select(col("vec_id").as("id"))
    val viaApi = engine.hits(nodes, edges)
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
  }

  test("centroidSilhouette facade matches the ann_centroid_silhouette key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("ann_centroid_silhouette")(spark, d)
      .collect().map(_.toSeq).toSeq
    val e = TestData.embeddings(spark, d)
    val viaApi = engine.centroidSilhouette(
        e.select(col("vec_id").as("id"), col("embedding")),
        graft.operators.Vectors.fixedCentroids(e))
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
    // contract: s ∈ [−1, 1]
    viaApi.foreach { r =>
      val s = r(4).asInstanceOf[Double]
      assert(s >= -1.0 && s <= 1.0)
    }
  }

  test("suppressionCurve facade matches the privacy_suppression_curve key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("privacy_suppression_curve")(spark, d)
      .collect().map(_.toSeq).toSeq
    val qi = TestData.documents(spark, d)
      .withColumn("len_bucket", expr("n_chars DIV 100"))
    val viaApi = engine.suppressionCurve(qi,
        Seq("lang", "source", "len_bucket"))
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
  }

  test("bootstrapCi facade matches the sample_bootstrap_ci key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("sample_bootstrap_ci")(spark, d)
      .collect().map(_.toSeq).toSeq
    val o = TestData.orders(spark, d)
      .select(col("o_orderkey"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
    val viaApi = engine.bootstrapCi(o, "o_orderkey", "cents")
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
    // the interval must bracket: lo ≤ hi
    val r = viaApi.head
    assert(r(3).asInstanceOf[Double] <= r(4).asInstanceOf[Double])
  }

  test("readability facade matches the text_readability key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("text_readability")(spark, d)
      .collect().map(_.toSeq).toSeq
    val viaApi = engine.readability(
        TestData.documents(spark, d)
          .select(col("doc_id").as("id"), col("text")))
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
  }

  test("readability counts known syllables") {
    val t = Seq((1L, "the quick banana is ok")).toDF("id", "text")
    val r = engine.readability(t).collect().head
    // the(1) quick(1: 'ui' one group... 'quick' -> 'ui' 'i'? groups:
    // "ui" counts as one run, no second vowel run) banana(3) is(1)
    // ok(1) = 7
    assert(r.getLong(1) === 5L)                     // words
    assert(r.getLong(3) === 7L)                     // syllables
  }

  test("yuleK facade matches the text_yule_k key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("text_yule_k")(spark, d)
      .collect().map(_.toSeq).toSeq
    val viaApi = engine.yuleK(
        TestData.documents(spark, d).select(col("lang"), col("text")),
        "lang")
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
  }

  test("yuleK limiting cases: all-distinct K = 0, one repeated token K→1e4") {
    val t = Seq(("a", "one two three four"), ("b", "same same same same"))
      .toDF("lang", "text")
    val rows = engine.yuleK(t, "lang").collect()
      .map(r => (r.getString(0), r.getDouble(4))).toMap
    assert(rows("a") === 0.0)
    assert(rows("b") === 10000.0 * (16 - 4) / 16.0)
  }

  test("termBurstiness facade matches the text_term_burstiness key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("text_term_burstiness")(spark, d)
      .collect().map(_.toSeq).toSeq
    val viaApi = engine.termBurstiness(
        TestData.documents(spark, d)
          .select(col("doc_id").as("id"), col("text")))
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
  }

  private def centsLineitem(d: String) =
    TestData.lineitem(spark, d)
      .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
        floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("cents"))

  test("tukeyFences facade matches the agg_tukey_fences key values") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("agg_tukey_fences")(spark, d)
      .collect().map(_.toSeq).toSeq
    val viaApi = engine.tukeyFences(centsLineitem(d), "l_returnflag",
        "cents", Seq("l_orderkey", "l_linenumber"))
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
  }

  test("trimmedMean facade matches the agg_trimmed_mean key values") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("agg_trimmed_mean")(spark, d)
      .collect().map(r => r.toSeq).toSeq
    val viaApi = engine.trimmedMean(centsLineitem(d), "l_returnflag",
        "cents", Seq("l_orderkey", "l_linenumber"))
      .collect().map(_.toSeq).toSeq
    // same column multiset, facade order: flag, n_rows, p05, p95,
    // n_kept, kept_sum(extra), mean, trimmed_mean — compare the
    // shared values by name
    val decIdx = SparkEntry.queries("agg_trimmed_mean")(spark, d)
      .columns.zipWithIndex.toMap
    val apiCols = engine.trimmedMean(centsLineitem(d), "l_returnflag",
        "cents", Seq("l_orderkey", "l_linenumber")).columns.zipWithIndex.toMap
    for ((dn, an) <- Seq("l_returnflag" -> "l_returnflag",
        "n_rows" -> "n_rows", "n_kept" -> "n_kept",
        "p05_cents" -> "p05", "p95_cents" -> "p95",
        "mean_cents" -> "mean", "trimmed_mean_cents" -> "trimmed_mean")) {
      val dcol = declared.map(_(decIdx(dn)))
      val acol = viaApi.map(_(apiCols(an)))
      assert(dcol === acol, s"$dn vs $an")
    }
  }

  test("ljungBox facade matches the ts_ljung_box key values") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("ts_ljung_box")(spark, d)
      .select("n_hours", "den", "q_stat")
      .collect().map(_.toSeq).toSeq
    val hourly = TestData.events(spark, d)
      .groupBy(date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n"))
    val viaApi = engine.ljungBox(hourly, "hour", "n")
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
  }

  test("seasonalAnomaly facade matches the ts_seasonal_anomaly key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("ts_seasonal_anomaly")(spark, d)
      .collect().map(_.toSeq).toSeq
    val hourly = TestData.events(spark, d)
      .groupBy(expr("unix_micros(ts) DIV 3600000000").as("hr"))
      .agg(count(lit(1)).as("cnt"))
    val viaApi = engine.seasonalAnomaly(hourly, "hr", "cnt")
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
  }

  test("transitionEntropy facade matches the events_transition_entropy key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("events_transition_entropy")(spark, d)
      .collect().map(_.toSeq).toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val pairs = TestData.events(spark, d)
      .withColumn("next_type", lead("event_type", 1).over(w))
      .filter(col("next_type").isNotNull)
      .select(col("event_type").as("from_type"),
        col("next_type").as("to_type"))
    val viaApi = engine.transitionEntropy(pairs, "from_type", "to_type")
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
  }

  test("charEntropy facade matches the text_char_entropy key values") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("text_char_entropy")(spark, d)
      .collect().map(_.toSeq).toSeq
    val viaApi = engine.charEntropy(
        TestData.documents(spark, d)
          .select(col("doc_id").as("id"), col("text")))
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
  }

  test("userLifecycle facade matches the events_user_lifecycle key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("events_user_lifecycle")(spark, d)
      .collect().map(_.toSeq).toSeq
    val pairs = TestData.events(spark, d)
      .select(col("user_id"),
        expr("unix_micros(ts) DIV 86400000000 DIV 7").as("wk"))
    val viaApi = engine.userLifecycle(pairs, "user_id", "wk")
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
    // growth-accounting identity: actives_w = new+retained+resurrected
    // and actives_{w-1} = retained_w + churned_w (interior weeks)
    val rows = declared.map(r => (r(0).asInstanceOf[Long],
      r(1).asInstanceOf[Long] + r(2).asInstanceOf[Long]
        + r(3).asInstanceOf[Long],
      r(2).asInstanceOf[Long], r(4).asInstanceOf[Long]))
    rows.sliding(2).foreach {
      case Seq((w0, act0, _, _), (w1, _, ret1, ch1)) if w1 == w0 + 1 =>
        assert(act0 === ret1 + ch1,
          s"week $w0 actives must equal retained+churned of week $w1")
      case _ =>
    }
  }

  test("jsDivergence facade matches the text_js_divergence key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("text_js_divergence")(spark, d)
      .collect().map(_.toSeq).toSeq
    val viaApi = engine.jsDivergence(
        TestData.documents(spark, d).select(col("lang"), col("text")),
        "lang")
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
    // JSD is bounded by ln 2
    viaApi.foreach { r =>
      val j = r(3).asInstanceOf[Double]
      assert(j >= 0.0 && j <= 0.6932, s"jsd out of [0, ln2]: $j")
    }
  }

  test("mahalanobisOutliers facade matches the vec_mahalanobis_outlier key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("vec_mahalanobis_outlier")(spark, d)
      .collect().map(_.toSeq).toSeq
    val viaApi = engine.mahalanobisOutliers(
        TestData.embeddings(spark, d)
          .select(col("vec_id").as("id"), col("embedding")))
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
  }

  test("asofInterpolate facade matches the join_asof_interpolated key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("join_asof_interpolated")(spark, d)
      .collect().map(_.toSeq).toSeq
    val series = TestData.events(spark, d)
      .filter(col("event_type") === "click")
      .groupBy(expr("unix_micros(ts) DIV 3600000000").as("hr"))
      .agg(count(lit(1)).as("cnt"))
    val probes = TestData.events(spark, d)
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("id"), unix_micros(col("ts")).as("t_us"))
    val viaApi = engine.asofInterpolate(series, probes, "hr", "cnt",
        "t_us")
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
    // interpolation stays inside the bracket values
    viaApi.foreach { r =>
      val c0 = r(2).asInstanceOf[Long].toDouble
      val c1 = r(4).asInstanceOf[Long].toDouble
      val v = r(5).asInstanceOf[Double]
      assert(v >= math.min(c0, c1) - 1e-4 && v <= math.max(c0, c1) + 1e-4)
    }
  }

  test("snaiveBacktest facade matches the ts_snaive_smape key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("ts_snaive_smape")(spark, d)
      .collect().map(_.toSeq).toSeq
    val series = TestData.events(spark, d)
      .groupBy(expr("unix_micros(ts) DIV 3600000000").as("hr"))
      .agg(count(lit(1)).as("cnt"))
    val viaApi = engine.snaiveBacktest(series, "hr", "cnt")
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
  }

  test("residualQuantize facade matches the vec_residual_quantize key") {
    val d = sf("sf0.001")
    val declared = SparkEntry.queries("vec_residual_quantize")(spark, d)
      .collect().map(_.toSeq).toSeq
    val e = TestData.embeddings(spark, d)
      .select(col("vec_id"), col("embedding").cast("array<double>")
        .as("embedding"))
    val viaApi = engine.residualQuantize(
        e.select(col("vec_id").as("id"), col("embedding")),
        e.filter(col("vec_id") < 4)
          .select(col("vec_id").as("cid"), col("embedding").as("cv")),
        e.filter(col("vec_id") >= 4 && col("vec_id") < 8)
          .select(col("vec_id").as("cid"), col("embedding").as("cv")))
      .collect().map(_.toSeq).toSeq
    assert(viaApi === declared)
    // level 2 never reports a NEGATIVE error and the improvement
    // flag is consistent with the two errors
    viaApi.foreach { r =>
      assert(r(4).asInstanceOf[Long] >= 0L)
      assert(r(5) === (r(4).asInstanceOf[Long] < r(3).asInstanceOf[Long]))
    }
  }
}
