package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a driver-built Bloom filter — the
  * semi-join reduction primitive for 100 TB joins: when only a small
  * fraction of the fact side joins, a ~KB-scale filter built from the
  * dim side's keys and shipped in the task closure kills most fact
  * rows MAP-SIDE, before the shuffle. No false negatives, so an exact
  * join downstream of the probe returns exactly the unfiltered
  * result (the false-positive rate only costs a few extra shuffled
  * rows). This mirrors what Spark's own runtime row-level filtering
  * injects for DPP-ineligible joins, as an explicit, testable
  * operator.
  *
  * The serialized filter rides the closure; deserialization happens
  * once per executor via the transient lazy val, and each probe is
  * one long-hash + bit test.
  */
case class BloomMightContain(child: Expression, bytes: Array[Byte])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  override protected def withNewChildInternal(c: Expression): BloomMightContain =
    copy(child = c)

  override def nullSafeEval(v: Any): Any =
    filter.mightContainLong(v.asInstanceOf[Long])
}

object BloomMightContain {
  /** Serialize a sketch for closure shipping. */
  def serialize(bf: BloomFilter): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }
}
