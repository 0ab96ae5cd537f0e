package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support (north star: image/audio/video at
  * 100 TB).
  *
  * Model: media is an opaque `BINARY` content column plus a typed
  * metadata struct; all pipeline stages are DataFrame→DataFrame so
  * the binary payloads stream through the same partitioned scans,
  * joins and sinks as every other column. Heavy per-item work
  * (decode, resize, frame sampling) runs in `mapPartitions` so a
  * real decoder would amortize native-library init per partition —
  * the batch shape a Pandas-UDF/`mapInPandas` pipeline has in
  * PySpark.
  *
  * The container ships no image/audio codecs (zero egress), so the
  * DECODE STEP IS A DETERMINISTIC STUB — clearly marked below. The
  * Spark-side plumbing (schema, partitioning, batch iteration,
  * feature schema) is real and is what the tests/queries exercise.
  */
object Multimodal {

  /** Typed media record: opaque bytes + metadata. */
  case class MediaRecord(doc_id: Long, mime: String, content: Array[Byte],
                         width: Int, height: Int, duration_ms: Long)

  /** Extracted features: fixed-width vector + provenance. */
  case class MediaFeatures(doc_id: Long, mime: String, n_bytes: Int,
                           features: Array[Double])

  private val Mimes = Array("image/png", "audio/wav", "video/mp4")

  /** Deterministically synthesize a media table from `documents`
    * (text bytes stand in for encoded media payloads; metadata is a
    * pure function of doc_id / n_chars so every engine can recompute
    * it).
    */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      element_at(lit(Mimes), (col("doc_id") % 3).cast("int") + 1).as("mime"),
      encode(col("text"), "UTF-8").as("content"),
      (col("n_chars") % 640 + 1).cast("int").as("width"),
      (col("n_chars") % 480 + 1).cast("int").as("height"),
      (col("n_chars") * 40).as("duration_ms"))

  /** STUB DECODER — deterministic fake. A real deployment would call
    * a native codec here (libjpeg/ffmpeg); none exists in this
    * container, so features are a byte-histogram sketch: 8 buckets of
    * byte-value counts normalized by length. Everything around it
    * (partition iteration, output schema, typed encoder) is the real
    * plumbing.
    */
  def decodeStub(bytes: Array[Byte]): Array[Double] = {
    val hist = new Array[Double](8)
    var i = 0
    while (i < bytes.length) {
      hist((bytes(i) & 0xff) >> 5) += 1.0
      i += 1
    }
    if (bytes.length > 0) { var j = 0; while (j < 8) { hist(j) /= bytes.length; j += 1 } }
    hist
  }

  /** Per-partition feature extraction over the opaque content column
    * (the `mapInPandas` batch shape, Scala-side).
    */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "mime", "content").as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition init would happen here (codec handles etc.)
        rows.map { case (id, mime, bytes) =>
          MediaFeatures(id, mime, bytes.length, decodeStub(bytes))
        }
      }
  }

  /** STUB resize: metadata-only transform (a real impl would re-encode
    * content); keeps the binary payload and rewrites dimensions.
    */
  def resizeStub(media: DataFrame, maxW: Int, maxH: Int): DataFrame =
    media.withColumn("scale",
        least(lit(1.0), least(lit(maxW) / col("width"), lit(maxH) / col("height"))))
      .withColumn("width", ceil(col("width") * col("scale")).cast("int"))
      .withColumn("height", ceil(col("height") * col("scale")).cast("int"))
      .drop("scale")

  /** STUB frame sampler: emits one row per sampled frame index at the
    * requested fps over the (fake) duration — the explode shape a
    * video pipeline uses to fan a clip out to frames.
    */
  def sampleFramesStub(media: DataFrame, everyMs: Long): DataFrame =
    media.filter(col("mime") === "video/mp4")
      // zero-length media emits zero frames (sequence() would throw on
      // start > stop, so filter first)
      .filter(col("duration_ms") > 0)
      .select(col("doc_id"), col("duration_ms"),
        explode(sequence(lit(0L), col("duration_ms") - 1, lit(everyMs)))
          .as("frame_ts_ms"))
}
