package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Invariants of the multimodal pipeline whose decode step is a
  * deterministic stub (no codecs in this container): schema, batch
  * shape, determinism, and histogram normalization.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media =
    Multimodal.fromDocuments(TestData.documents(spark, sf("sf0.001"))).cache()

  test("media schema carries opaque binary + typed metadata") {
    val f = media.schema.fields.map(x => x.name -> x.dataType.typeName).toMap
    assert(f("content") === "binary")
    assert(f("mime") === "string")
    assert(f("duration_ms") === "long")
  }

  test("feature extraction is deterministic and normalized") {
    val run1 = Multimodal.extractFeatures(media).collect().sortBy(_.doc_id)
    val run2 = Multimodal.extractFeatures(media).collect().sortBy(_.doc_id)
    assert(run1.length === media.count())
    run1.zip(run2).foreach { case (a, b) =>
      assert(a.features.toSeq === b.features.toSeq, "decode must be deterministic")
      assert(math.abs(a.features.sum - 1.0) < 1e-9, "histogram must normalize to 1")
      assert(a.features.length === 8)
      assert(a.n_bytes > 0)
      assert(a.entropy_ubits === b.entropy_ubits && a.n_runs === b.n_runs)
      // real-payload invariants: entropy of n distinct-able bytes is
      // bounded by log2(min(n_bytes, 256)) bits; runs partition bytes
      assert(a.entropy_ubits > 0
        && a.entropy_ubits <= math.ceil(math.log(math.min(a.n_bytes, 256).toDouble)
             / math.log(2.0) * 1000000).toLong)
      assert(a.n_runs >= 1 && a.n_runs <= a.n_bytes)
      assert(a.max_run >= 1 && a.max_run.toLong * a.n_runs >= a.n_bytes.toLong,
        "max_run * n_runs must cover the payload")
    }
  }

  test("entropy separates planted payload classes") {
    // uniform-ish text bytes vs a degenerate single-byte payload:
    // features must carry real payload information
    val lo = Multimodal.analyzeBytes(Array.fill[Byte](512)('a'.toByte))
    val hi = Multimodal.analyzeBytes((0 until 512).map(i => (i % 97).toByte).toArray)
    assert(lo._2 === 0L, "constant payload has zero entropy")
    assert(hi._2 > 6000000L, "97 near-uniform values carry > 6 bits")
    assert(lo._4 === 512 && hi._4 === 1, "run structure mirrors the payload")
  }

  test("resize stub never upscales and preserves aspect cap") {
    val resized = Multimodal.resizeStub(media, 64, 64)
      .select("doc_id", "width", "height").as[(Long, Int, Int)].collect()
    assert(resized.forall { case (_, w, h) => w <= 64 && h <= 64 && w > 0 && h > 0 })
  }

  test("frame sampling fans out only videos at the requested cadence") {
    val frames = Multimodal.sampleFramesStub(media, 1000L).cache()
    val mimes = frames.join(media, "doc_id").select("mime").distinct()
      .as[String].collect()
    assert(mimes.toSeq === Seq("video/mp4"))
    val perDoc = frames.groupBy("doc_id").agg(count(lit(1)).as("n"),
        max("frame_ts_ms").as("mx"))
      .join(media.select("doc_id", "duration_ms"), "doc_id")
      .select("n", "mx", "duration_ms").as[(Long, Long, Long)].collect()
    perDoc.foreach { case (n, mx, dur) =>
      assert(mx < dur, "no frame beyond duration")
      assert(n === (dur + 999) / 1000, "one frame per second of duration")
    }
  }

  test("blockHash: uniform payload hashes to 0; an edit flips only its own block's bit") {
    // uniform bytes: no block mean strictly exceeds the global mean
    val uniform = Array.fill[Byte](160)(65)
    assert(Multimodal.blockHash(uniform, 16) === 0L)
    // raise bytes in exactly one interior block: that block's mean
    // rises above the global mean, every other block's falls below —
    // signature = that single bit (locality is what makes Hamming
    // distance on the signature a near-dup ranking)
    for (blk <- Seq(0, 7, 15)) {
      val edited = uniform.clone()
      val st = blk * 160 / 16; val en = (blk + 1) * 160 / 16
      (st until en).foreach(i => edited(i) = 90)
      assert(Multimodal.blockHash(edited, 16) === (1L << blk),
        s"edit in block $blk must set exactly bit $blk")
    }
    // short payload (fewer bytes than blocks): empty blocks contribute
    // 0 bits, no exception
    val tiny = Array[Byte](1, 2, 3)
    assert(Multimodal.blockHash(tiny, 16) >= 0L)
  }

  // The scale claim for media near-dup (r8 verdict item 2): at the
  // production width — 64-bit signature, 4×16-bit bands, a 65 536-way
  // universe per band — the pigeonhole band join must return EXACTLY
  // the brute-force Hamming-≤-3 pair set (blocking sound ⇒ candidates
  // ⊇ matches; popcount verify ⇒ candidates are filtered back to
  // matches). Brute force runs driver-side over the fixture sigs.
  test("64-bit/16-bit-band blockhash pairs equal brute force (pigeonhole sound)") {
    // Planted corpus: random 64-bit signatures are essentially never
    // within Hamming 3 of each other (fixture sigs at this width have
    // zero near pairs — empty-vs-empty would prove nothing), so plant
    // near-dups at every Hamming distance 1..5: distances ≤ 3 MUST be
    // found, 4..5 MUST be rejected by the popcount verify even though
    // a band may still collide.
    val rnd = new scala.util.Random(42)
    val mimes = Array("image/png", "audio/wav", "video/mp4")
    val base = (0 until 200).map(i => (i.toLong, mimes(i % 3), rnd.nextLong()))
    def flip(h: Long, k: Int): Long = {
      var out = h
      var flipped = Set.empty[Int]
      while (flipped.size < k) {
        val b = rnd.nextInt(64)
        if (!flipped(b)) { flipped += b; out ^= 1L << b }
      }
      out
    }
    val planted = (1 to 5).flatMap { h =>
      (0 until 8).map { j =>
        val (id, m, sig) = base(h * 8 + j)
        (1000L + h * 100 + j, m, flip(sig, h))
      }
    }
    val rows = base ++ planted
    val sigs = spark.createDataFrame(rows).toDF("doc_id", "mime", "blockhash")
    val got = graft.operators.MultimodalOps
      .blockHashPairs(sigs, maxHamming = 3, bits = 64, bands = 4)
      .select("id_a", "id_b", "hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val brute = (for {
      (ia, ma, ha) <- rows; (ib, mb, hb) <- rows
      if ia < ib && ma == mb
      h = java.lang.Long.bitCount(ha ^ hb) if h <= 3
    } yield (ia, ib, h)).toSet
    assert(got === brute,
      s"blocking lost or invented pairs: got ${got.size}, brute ${brute.size}")
    assert(brute.size >= 24, s"planting failed: only ${brute.size} near pairs")
  }

  // Width guard-rails: invalid band splits and unsound Hamming
  // budgets must be rejected, not silently mis-blocked.
  test("blockHashPairs rejects unsound width parameters") {
    val sigs = Multimodal.blockHashes(media, 16).toDF()
    intercept[IllegalArgumentException] {
      graft.operators.MultimodalOps.blockHashPairs(sigs, 4, 16, 4)
    }
    intercept[IllegalArgumentException] {
      graft.operators.MultimodalOps.blockHashPairs(sigs, 2, 60, 7)
    }
  }
}
