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
      assert(a.features.toSeq === b.features.toSeq, "stub decode must be deterministic")
      assert(math.abs(a.features.sum - 1.0) < 1e-9, "histogram must normalize to 1")
      assert(a.features.length === 8)
      assert(a.n_bytes > 0)
    }
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
}
