package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Text-format source/sink support (CSV, JSON-lines) with explicit
  * schemas on read — schema inference is never used (it requires an
  * extra full pass over the data and is non-deterministic under
  * sampling; at 100 TB it's simply off the table).
  */
object FileFormats {

  /** Write `df` as headered CSV and read it back with the given
    * schema. Exercises the whole text codec path: quoting, header
    * skip, typed parse.
    */
  def csvRoundTrip(spark: SparkSession, df: DataFrame, schema: StructType,
                   path: String): DataFrame = {
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)
    spark.read.schema(schema).option("header", "true").csv(path)
  }

  /** Write `df` as JSON lines and read it back with the given schema. */
  def jsonRoundTrip(spark: SparkSession, df: DataFrame, schema: StructType,
                    path: String): DataFrame = {
    df.write.mode(SaveMode.Overwrite).json(path)
    spark.read.schema(schema).json(path)
  }

  /** Write `df` as ORC and read it back with the given schema —
    * the columnar alternative to parquet (self-describing, but the
    * explicit schema keeps the no-inference rule uniform). Exercises
    * the second columnar codec path incl. its own predicate-pushdown
    * machinery.
    */
  def orcRoundTrip(spark: SparkSession, df: DataFrame, schema: StructType,
                   path: String): DataFrame = {
    df.write.mode(SaveMode.Overwrite).orc(path)
    spark.read.schema(schema).orc(path)
  }

  /** Write a single `value` string column as raw text lines and read
    * it back — the line-oriented ingest path (log shipping, one-doc-
    * per-line corpora). Caller embeds/parses any record structure;
    * text files split by line, so reads parallelize per block like
    * CSV/JSON.
    */
  def textRoundTrip(spark: SparkSession, lines: DataFrame,
                    path: String): DataFrame = {
    lines.write.mode(SaveMode.Overwrite).text(path)
    spark.read.text(path)
  }
}
