package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, GenericInternalRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Ordered sequence matching over an event stream (MATCH_RECOGNIZE-
  * lite): per key, how many steps of `steps` occur in order — the
  * greedy first-match funnel every product-analytics engine ships and
  * Spark SQL lacks as an operator.
  *
  * This is the §4.3(c) tier of the custom-operator ladder: a custom
  * `LogicalPlan` planned by a custom `SparkStrategy` into a custom
  * `SparkPlan`, because no composition of built-in operators runs a
  * per-key ORDERED state machine in one pass. (The window/join
  * encoding of an n-step funnel needs n self-joins or n stacked
  * windows — one shuffle per step; this operator declares
  * `ClusteredDistribution(key)` + an in-partition (key, ts, tie)
  * sort, so Spark plans exactly ONE exchange and the state machine
  * streams each partition once, at any number of steps.)
  *
  * Semantics: events are scanned per key in (ts, tie) order; the
  * match pointer starts at step 0 and advances whenever the current
  * row's type equals the next expected step. `withinUs` bounds the
  * CONVERSION WINDOW (the product-analytics "complete within N days"
  * funnel): steps past the first only match while
  * ts - anchor_ts <= withinUs, where anchor_ts is the step-0 match
  * (greedy — the anchor never re-arms; `Long.MaxValue` = unbounded).
  * Output: one row (key: LONG, steps_completed: INT) per key present
  * in the input.
  */
case class FunnelMatch(keyCol: String, tsCol: String, tieCol: String,
                       typeCol: String, steps: Seq[String],
                       withinUs: Long,
                       output: Seq[Attribute],
                       child: LogicalPlan) extends UnaryNode {
  // `output` is a constructor parameter (not a derived val): Catalyst
  // copies this node during optimization, and re-minting
  // AttributeReferences per copy would orphan downstream references
  // to the original exprIds.

  // No Catalyst expressions of our own, but the four named child
  // columns must survive column pruning.
  override def references: AttributeSet = AttributeSet(
    child.output.filter(a =>
      a.name == keyCol || a.name == tsCol || a.name == tieCol ||
        a.name == typeCol))

  override protected def withNewChildInternal(c: LogicalPlan): FunnelMatch =
    copy(child = c)
}

object FunnelMatch {
  /** Build the funnel over an analyzed input frame. The key column
    * must be LONG; ties in `tsCol` are resolved by `tieCol`.
    */
  def of(input: DataFrame, keyCol: String, tsCol: String, tieCol: String,
         typeCol: String, steps: Seq[String],
         withinUs: Long = Long.MaxValue): DataFrame = {
    val out = Seq(
      AttributeReference("key", LongType, nullable = false)(),
      AttributeReference("steps_completed", IntegerType, nullable = false)())
    org.apache.spark.sql.graft.Bridge.dataset(input.sparkSession,
      FunnelMatch(keyCol, tsCol, tieCol, typeCol, steps, withinUs, out,
        input.queryExecution.analyzed))
  }
}

case class FunnelMatchExec(keyCol: String, tsCol: String, tieCol: String,
                           typeCol: String, steps: Seq[String],
                           withinUs: Long,
                           output: Seq[Attribute], child: SparkPlan)
    extends UnaryExecNode {

  private def keyExpr = child.output.find(_.name == keyCol).get
  private def tsExpr = child.output.find(_.name == tsCol).get
  private def tieExpr = child.output.find(_.name == tieCol).get

  // One clustering shuffle on the key, then an in-partition sort —
  // Spark's EnsureRequirements inserts both; the operator itself
  // streams each partition exactly once.
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(keyExpr)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(keyExpr, org.apache.spark.sql.catalyst.expressions.Ascending),
            SortOrder(tsExpr, org.apache.spark.sql.catalyst.expressions.Ascending),
            SortOrder(tieExpr, org.apache.spark.sql.catalyst.expressions.Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val keyIdx = child.output.indexWhere(_.name == keyCol)
    val typeIdx = child.output.indexWhere(_.name == typeCol)
    val tsIdx = child.output.indexWhere(_.name == tsCol)
    val stepBytes = steps.map(UTF8String.fromString).toArray
    val window = withinUs
    child.execute().mapPartitions { it =>
      // Explicit one-row lookahead instead of .buffered: Spark's row
      // iterators reuse the same UnsafeRow object, so a cached head
      // would alias the row just consumed — the lookahead copies the
      // three fields it needs (key + ts primitives, a cloned type).
      new Iterator[InternalRow] {
        private val proj =
          UnsafeProjection.create(Array[DataType](LongType, IntegerType))
        private val row = new GenericInternalRow(2)
        private var havePend = false
        private var pendKey = 0L
        private var pendTs = 0L
        private var pendType: UTF8String = null
        override def hasNext: Boolean = havePend || it.hasNext
        override def next(): InternalRow = {
          var key = 0L
          var stepIdx = 0
          var anchorTs = 0L
          def advance(t: UTF8String, ts: Long): Unit =
            if (stepIdx < stepBytes.length && t != null &&
                t.equals(stepBytes(stepIdx)) &&
                (stepIdx == 0 || window == Long.MaxValue ||
                 ts - anchorTs <= window)) {
              if (stepIdx == 0) anchorTs = ts
              stepIdx += 1
            }
          if (havePend) {
            key = pendKey; advance(pendType, pendTs); havePend = false
          } else {
            val r = it.next()
            key = r.getLong(keyIdx)
            advance(r.getUTF8String(typeIdx), r.getLong(tsIdx))
          }
          var sameGroup = true
          while (sameGroup && it.hasNext) {
            val r = it.next()
            val k = r.getLong(keyIdx)
            if (k == key) advance(r.getUTF8String(typeIdx), r.getLong(tsIdx))
            else {
              havePend = true
              pendKey = k
              pendTs = r.getLong(tsIdx)
              val t = r.getUTF8String(typeIdx)
              pendType = if (t == null) null else t.clone()
              sameGroup = false
            }
          }
          row.update(0, key)
          row.update(1, stepIdx)
          proj(row)
        }
      }
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): FunnelMatchExec =
    copy(child = c)
}

/** Plans [[FunnelMatch]] into [[FunnelMatchExec]]. Injected via
  * `GraftExtensions` (spark.sql.extensions) or appended to
  * `spark.experimental.extraStrategies` at runtime.
  */
object FunnelStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case f: FunnelMatch =>
      FunnelMatchExec(f.keyCol, f.tsCol, f.tieCol, f.typeCol, f.steps,
        f.withinUs, f.output, planLater(f.child)) :: Nil
    case _ => Nil
  }
}
