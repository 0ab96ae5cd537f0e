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

  test("blocked fuzzyPairs equals unblocked brute force on a random corpus") {
    val rnd = new scala.util.Random(1234)
    val vocab = Vector("alpha", "bravo", "charlie", "delta", "echo", "fox",
      "golf", "hotel", "india", "julie", "kilo", "lima")
    def randDoc(): String =
      Seq.fill(5 + rnd.nextInt(25))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    def mutate(t: String): String = { // 1-8 random char edits incl. ins/del
      var x = t
      (0 until 1 + rnd.nextInt(8)).foreach { _ =>
        val i = rnd.nextInt(x.length)
        x = rnd.nextInt(3) match {
          case 0 => x.substring(0, i) + "q" + x.substring(i)          // insert
          case 1 if x.length > 1 => x.substring(0, i) + x.substring(i + 1) // delete
          case _ => x.substring(0, i) + "z" + x.substring(math.min(i + 1, x.length))
        }
      }
      x
    }
    val base = (1 to 40).map(i => (i.toLong, if (i % 2 == 0) "en" else "de", randDoc()))
    val dups = (1 to 20).map(i => (100L + i, base(i)._2, mutate(base(i)._3)))
    val docs = docsDf(base ++ dups)
    val blocked = TextAnalysis.fuzzyPairs(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val a = docs.select(col("doc_id").as("ia"), col("lang").as("la"), col("text").as("ta"))
    val b = docs.select(col("doc_id").as("ib"), col("lang").as("lb"), col("text").as("tb"))
    val brute = a.join(b, col("la") === col("lb") && col("ia") < col("ib"))
      .withColumn("lev", levenshtein(col("ta"), col("tb")))
      .filter(col("lev") <= 20)
      .select("ia", "ib", "lev")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(blocked == brute,
      s"missing=${brute.diff(blocked).take(5)} extra=${blocked.diff(brute).take(5)}")
    assert(brute.nonEmpty, "fixture must actually contain near-dup pairs")
  }

  test("blocked jaccardPairs equals unblocked brute force on a random corpus") {
    val rnd = new scala.util.Random(99)
    val vocab = (0 until 40).map(i => s"tok$i")
    def randDoc(): Seq[String] =
      Seq.fill(8 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size)))
    def mutate(t: Seq[String]): Seq[String] = // drop or add one token
      if (rnd.nextBoolean() && t.size > 2) t.drop(1)
      else t :+ vocab(rnd.nextInt(vocab.size))
    val base = (1 to 30).map(i => (i.toLong, if (i % 2 == 0) "en" else "de", randDoc()))
    val dups = (1 to 15).map(i => (100L + i, base(i)._2, mutate(base(i)._3)))
    val docs = docsDf((base ++ dups).map { case (i, l, t) => (i, l, t.mkString(" ")) })
    val blocked = TextOps.jaccardPairs(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sets = docs.select(col("doc_id"), col("lang"),
      array_distinct(split(col("text"), " ")).as("ts"))
    val a = sets.select(col("doc_id").as("ia"), col("lang").as("la"), col("ts").as("sa"))
    val b = sets.select(col("doc_id").as("ib"), col("lang").as("lb"), col("ts").as("sb"))
    val brute = a.join(b, col("la") === col("lb") && col("ia") < col("ib"))
      .withColumn("i", size(array_intersect(col("sa"), col("sb"))))
      .withColumn("jac", col("i").cast("double")
        / (size(col("sa")) + size(col("sb")) - col("i")))
      .filter(col("jac") > 0.9)
      .select("ia", "ib")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked == brute,
      s"missing=${brute.diff(blocked).take(5)} extra=${blocked.diff(brute).take(5)}")
    assert(brute.nonEmpty, "fixture must actually contain near-dup pairs")
  }

  test("prefix-filtered jaccard equals unblocked brute force on a random corpus") {
    val rnd = new scala.util.Random(7)
    val vocab = (0 until 60).map(i => s"g$i")
    def randDoc(): Seq[String] =
      Seq.fill(10 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size)))
    def mutate(t: Seq[String]): Seq[String] =
      if (rnd.nextBoolean() && t.size > 3) t.drop(1)
      else t :+ vocab(rnd.nextInt(vocab.size))
    val base = (1 to 30).map(i => (i.toLong, if (i % 3 == 0) "en" else "de", randDoc()))
    val dups = (1 to 15).map(i => (100L + i, base(i)._2, mutate(base(i)._3)))
    val all = (base ++ dups).map { case (i, l, t) => (i, l, t.distinct) }
    import spark.implicits._
    val sets = all.toDF("doc_id", "lang", "elems")
    val threshold = 0.7
    val prefixed = TextOps.jaccardPrefixSetPairs(sets, threshold)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bitmapped = TextOps.jaccardBitmapSetPairs(sets, threshold)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val a = sets.select(col("doc_id").as("ia"), col("lang").as("la"), col("elems").as("sa"))
    val b = sets.select(col("doc_id").as("ib"), col("lang").as("lb"), col("elems").as("sb"))
    val brute = a.join(b, col("la") === col("lb") && col("ia") < col("ib"))
      .withColumn("i", size(array_intersect(col("sa"), col("sb"))))
      .withColumn("jac", col("i").cast("double")
        / (size(col("sa")) + size(col("sb")) - col("i")))
      .filter(col("jac") > threshold)
      .select("ia", "ib")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(prefixed == brute,
      s"missing=${brute.diff(prefixed).take(5)} extra=${prefixed.diff(brute).take(5)}")
    assert(bitmapped == brute,
      s"bitmap: missing=${brute.diff(bitmapped).take(5)} extra=${bitmapped.diff(brute).take(5)}")
    assert(brute.nonEmpty, "fixture must actually contain near-dup pairs")
  }

  test("both containment cores equal unblocked brute force on a random corpus") {
    val rnd = new scala.util.Random(13)
    val vocab = (0 until 80).map(i => s"s$i")
    def randDoc(): Seq[String] =
      Seq.fill(12 + rnd.nextInt(25))(vocab(rnd.nextInt(vocab.size)))
    val base = (1 to 25).map(i =>
      (i.toLong, if (i % 2 == 0) "en" else "de", randDoc().distinct))
    // planted containments: a strict subset of an existing doc
    val subs = (1 to 10).map { i =>
      val (_, l, t) = base(i)
      (200L + i, l, t.take(math.max(2, (t.size * 0.95).toInt)))
    }
    import spark.implicits._
    val sets = (base ++ subs).toDF("doc_id", "lang", "elems")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val viaBitmap = pairs(TextOps.containmentBitmapPairs(sets, 0.9))
    val viaPrefix = pairs(TextOps.containmentPrefixPairs(sets, 0.9))
    val a = sets.select(col("doc_id").as("ia"), col("lang").as("la"),
      col("elems").as("sa"))
    val b = sets.select(col("doc_id").as("ib"), col("lang").as("lb"),
      col("elems").as("sb"))
    val brute = a.join(b, col("la") === col("lb") && col("ia") =!= col("ib"))
      .withColumn("i", size(array_intersect(col("sa"), col("sb"))))
      .filter(col("i") * 10 >= size(col("sa")) * 9)
      .select("ia", "ib").as[(Long, Long)].collect().toSet
    assert(viaBitmap == brute,
      s"bitmap: missing=${brute.diff(viaBitmap).take(5)} extra=${viaBitmap.diff(brute).take(5)}")
    assert(viaPrefix == brute,
      s"prefix: missing=${brute.diff(viaPrefix).take(5)} extra=${viaPrefix.diff(brute).take(5)}")
    // planted subsets must be flagged as contained in their supersets
    (1 to 10).foreach { i =>
      assert(brute.contains((200L + i, base(i)._1)), s"planted subset $i missing")
    }
  }

  test("containmentPairs auto-selects the core by measured universe size") {
    import spark.implicits._
    // Small universe (80 distinct elems): probe must stay under the
    // cap → bitmap core. Large universe (distinct elems per doc drawn
    // from 100k ids, 60 docs × 30 elems ≈ 1800 >> cap? no — need >
    // 4096 distinct): give each doc 200 unique elements → ~12k
    // distinct per lang, well past BitmapUniverseCap.
    val rnd = new scala.util.Random(7)
    val small = (1L to 20L).map(i =>
      (i, "en", Seq.fill(15)(s"s${rnd.nextInt(80)}").distinct)).toDF(
      "doc_id", "lang", "elems")
    assert(TextOps.maxLangUniverse(small) <= TextOps.BitmapUniverseCap)
    val bigBase = (1L to 40L).map { i =>
      (i, "en", Seq.fill(200)(s"w${rnd.nextInt(100000)}").distinct)
    }
    // planted containment in the large universe: 95 % subset of doc 1
    val planted = bigBase.take(5).map { case (i, l, es) =>
      (500L + i, l, es.take(math.max(2, (es.size * 0.95).toInt)))
    }
    val big = (bigBase ++ planted).toDF("doc_id", "lang", "elems")
    val u = TextOps.maxLangUniverse(big)
    assert(u > TextOps.BitmapUniverseCap, s"universe probe $u not past cap")
    // the dispatcher output (prefix core, per the probe) must equal
    // unblocked brute force — the switch changes cost, never results
    val viaAuto = TextOps.containmentPairs(big, 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val a = big.select(col("doc_id").as("ia"), col("lang").as("la"),
      col("elems").as("sa"))
    val b = big.select(col("doc_id").as("ib"), col("lang").as("lb"),
      col("elems").as("sb"))
    val brute = a.join(b, col("la") === col("lb") && col("ia") =!= col("ib"))
      .withColumn("i", size(array_intersect(col("sa"), col("sb"))))
      .filter(col("i") * 10 >= size(col("sa")) * 9)
      .select("ia", "ib").as[(Long, Long)].collect().toSet
    assert(viaAuto == brute,
      s"auto: missing=${brute.diff(viaAuto).take(5)} extra=${viaAuto.diff(brute).take(5)}")
    assert(planted.forall(p => brute.exists(_._1 == p._1)),
      "planted large-universe subsets must be flagged")
  }

  test("substringSpans equals brute force on a random small-vocab corpus") {
    import spark.implicits._
    val k = 3; val minSpan = 4
    val rnd = new scala.util.Random(20260813L)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee")
    val docs = (0L until 40L).map { id =>
      (id, (0 until (8 + rnd.nextInt(20))).map(_ => vocab(rnd.nextInt(vocab.size))))
    }
    // brute force: window at 1-based p is duplicated iff its joined
    // text appears as a window of a DIFFERENT doc; islands merge when
    // consecutive duplicated positions are <= k apart
    val winsOf = docs.map { case (id, ts) =>
      id -> ts.sliding(k).map(_.mkString(" ")).toVector
    }.toMap
    val docsPerWin = winsOf.values.flatten.toSeq.groupBy(identity)
      .map { case (w, _) => w -> winsOf.count(_._2.contains(w)) }
    val expected = winsOf.toSeq.flatMap { case (id, ws) =>
      val dupPos = ws.zipWithIndex.collect {
        case (w, i) if docsPerWin(w) >= 2 => i + 1
      }
      val spans = dupPos.foldLeft(List.empty[List[Int]]) {
        case (Nil, p) => List(List(p))
        case (cur :: done, p) =>
          if (p - cur.head <= k) (p :: cur) :: done else List(p) :: cur :: done
      }.map(g => (g.last, g.head + k - 1, g.size))
      spans.collect { case (s, e, nw) if e - s + 1 >= minSpan =>
        (id, s.toLong, e.toLong, (e - s + 1).toLong, nw.toLong)
      }
    }.sorted
    val df = docs.map { case (id, ts) => (id, ts.mkString(" ")) }
      .toDF("doc_id", "text")
    val got = graft.operators.Curation.substringSpans(df, k, minSpan)
      .as[(Long, Long, Long, Long, Long)].collect().sorted.toSeq
    assert(got === expected,
      s"spans diverge: got ${got.take(5)}… expected ${expected.take(5)}…")
    assert(expected.nonEmpty, "fixture must actually exercise spans")
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

  test("embedding LSH finds planted high-cosine pairs, plants nothing extra") {
    import graft.operators.EmbedDedup
    val rnd = new scala.util.Random(2024)
    val dim = 16
    def randVec(): Array[Double] = Array.fill(dim)(rnd.nextGaussian())
    // 40 random gaussians (pairwise cosine ≈ 0 in expectation) + 15
    // perturbed copies at cosine ≈ 0.995+ (small additive noise, NOT
    // exact scaling — exercises the probabilistic banding, not just
    // the scale-invariance shortcut; fixed seed keeps it stable).
    val base = (1 to 40).map(i => (i.toLong, randVec()))
    val dups = (1 to 15).map { i =>
      val v = base(i)._2
      val nrm = math.sqrt(v.map(x => x * x).sum)
      (100L + i, v.zipWithIndex.map { case (x, j) =>
        x + 0.02 * nrm / math.sqrt(dim.toDouble) * rnd.nextGaussian() })
    }
    import spark.implicits._
    val vecs = (base ++ dups).toSeq.toDF("id", "embedding")
    val got = EmbedDedup.nearDupPairs(vecs, dim, threshold = 0.98)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val a = vecs.select(col("id").as("ia"), col("embedding").as("va"))
    val b = vecs.select(col("id").as("ib"), col("embedding").as("vb"))
    val brute = a.join(b, col("ia") < col("ib"))
      .withColumn("cos", graft.functions.VectorOps.cosine(col("va"), col("vb")))
      .filter(col("cos") > 0.98)
      .select("ia", "ib")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.size >= 15, s"fixture must contain planted pairs, got ${brute.size}")
    assert(got == brute,
      s"missing=${brute.diff(got).take(5)} extra=${got.diff(brute).take(5)}")
  }

  test("LSH banding nesting: wider rows-per-band only SHRINK candidates") {
    // Structural half (a theorem under 18-perm alignment, checked
    // exhaustively): every r=6 band's index range contains a full
    // r=3 band, and every r=3 band contains an aligned r=2 band —
    // so a collision at larger r implies one at smaller r and the
    // candidate sets nest.
    for (j <- 0 until 3) {
      val r6 = (6 * j) to (6 * j + 5)
      assert((0 until 6).exists(k =>
        (3 * k) >= r6.start && (3 * k + 2) <= r6.end),
        s"r=6 band $j must contain a full r=3 band")
    }
    for (j <- 0 until 6) {
      val r3 = (3 * j) to (3 * j + 2)
      assert((0 until 9).exists(k =>
        (2 * k) >= r3.start && (2 * k + 1) <= r3.end),
        s"r=3 band $j must contain a full r=2 band")
    }
    // Fixture half: the declared tuning table is monotone and never
    // verifies more than it proposes.
    val rows = SparkEntry.queries("dedup_lsh_tuning")(spark, sf("sf0.001"))
      .collect().map(r => (r.getInt(0), r.getLong(3), r.getLong(4)))
    assert(rows.map(_._1).toSeq === Seq(2, 3, 6))
    val cands = rows.map(_._2)
    assert(cands(0) >= cands(1) && cands(1) >= cands(2),
      s"candidate counts must shrink with rows/band: ${cands.toSeq}")
    rows.foreach { case (r, c, v) =>
      assert(v <= c, s"r=$r verified $v exceeds candidates $c")
    }
  }
}
