package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSparkSession}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType

/** Native as-of join — the whole-operator Catalyst path (SURVEY.md §2.3
  * notes the reference has no joins of its own; this is the [N]-mandated
  * time-series operator Spark's built-ins lack, implemented per the
  * custom-operator ladder: logical node + strategy + physical exec,
  * registered through `SparkSessionExtensions`).
  *
  * Semantics: for every left row, attach the greatest `rightTs` ≤
  * `leftTs` among right rows with an equal key (null when none) — i.e.
  * `ASOF LEFT JOIN` in DuckDB terms, restricted to a long timestamp
  * payload.
  *
  * Why a custom operator instead of the union+window composition in
  * `graft.ops.Analytics.asofJoin`: the composition must widen every
  * right row to the full left schema (nulls), shuffle and sort the
  * union, and run a window `last(ignoreNulls)` over it. This exec
  * instead asks Catalyst for co-partitioned children
  * (`ClusteredDistribution` on the key) each sorted by (key, ts) —
  * EnsureRequirements inserts exactly the two hash exchanges + sorts a
  * sort-merge join would need — and then streams both sides through a
  * per-partition merge that keeps ONE long of state per key: no row
  * widening, no union materialization, right rows never leave their
  * projection. At 100 TB that halves the shuffled bytes and removes the
  * window's full-partition buffering.
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Attribute,
    rightKey: Attribute,
    leftTs: Attribute,
    rightTs: Attribute,
    asofOut: AttributeReference) extends BinaryNode {
  override def output: Seq[Attribute] = left.output :+ asofOut
  // asofOut is produced here, not consumed — without this, CheckAnalysis
  // counts it as a missing input reference
  override def producedAttributes: AttributeSet = AttributeSet(asofOut)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lts, rts, out) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts, out) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Attribute,
    rightKey: Attribute,
    leftTs: Attribute,
    rightTs: Attribute,
    asofOut: AttributeReference) extends BinaryExecNode {

  require(leftTs.dataType == LongType && rightTs.dataType == LongType,
    "as-of timestamps must be long (epoch micros)")
  // equal keys must hash to the same partition on both sides — an
  // Int-vs-Long key pair would co-partition WRONG, not fail
  require(leftKey.dataType == rightKey.dataType,
    s"as-of key types must match: ${leftKey.dataType} vs ${rightKey.dataType}")

  override def output: Seq[Attribute] = left.output :+ asofOut
  override def producedAttributes: AttributeSet = AttributeSet(asofOut)

  // co-partition children on the key; EnsureRequirements inserts the
  // exchanges (and reuses an existing compatible partitioning — a
  // pre-bucketed table shuffles nothing)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  // …and sort each side by (key, ts) within partitions
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  // left rows pass through untouched, so the left child's partitioning
  // and ordering survive — downstream ops on (key, ts) reuse them
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyType = leftKey.dataType
    val leftOutput = left.output
    val rightOutput = right.output
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lkBound = BindReferences.bindReference(leftKey: Expression, leftOutput)
      val ltsBound = BindReferences.bindReference(leftTs: Expression, leftOutput)
      val rkBound = BindReferences.bindReference(rightKey: Expression, rightOutput)
      val rtsBound = BindReferences.bindReference(rightTs: Expression, rightOutput)
      val keyOrd = TypeUtils.getInterpretedOrdering(keyType)
      val proj = UnsafeProjection.create(outAttrs, leftOutput :+ asofOut)
      val joined = new JoinedRow
      val asofCell = new GenericInternalRow(1)
      val rBuf = rIter.buffered

      new Iterator[InternalRow] {
        // state for the key currently being merged: the greatest right
        // ts consumed so far (right side is sorted, so this is one long)
        private var curKey: Any = null
        private var haveKey = false
        private var lastTs = 0L
        private var hasLast = false

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val lrow = lIter.next()
          val lk = lkBound.eval(lrow)
          val ltsAny = ltsBound.eval(lrow)
          if (lk == null || ltsAny == null) {
            asofCell.update(0, null)
          } else {
            if (!haveKey || keyOrd.compare(lk, curKey) != 0) {
              // values evaluated off reused unsafe rows must be copied
              // before outliving the row (UTF8String points into it)
              curKey = InternalRow.copyValue(lk)
              haveKey = true
              hasLast = false
            }
            val lts = ltsAny.asInstanceOf[Long]
            var advance = true
            while (advance && rBuf.hasNext) {
              val rrow = rBuf.head
              val rk = rkBound.eval(rrow)
              if (rk == null) { rBuf.next() } // null keys never match
              else {
                val cmp = keyOrd.compare(rk, lk)
                if (cmp < 0) rBuf.next() // right side is behind: discard
                else if (cmp == 0) {
                  val rts = rtsBound.eval(rrow)
                  if (rts != null && rts.asInstanceOf[Long] <= lts) {
                    lastTs = rts.asInstanceOf[Long]
                    hasLast = true
                    rBuf.next()
                  } else if (rts == null) rBuf.next()
                  else advance = false
                } else advance = false // right side is ahead: stop
              }
            }
            if (hasLast) asofCell.update(0, lastTs) else asofCell.update(0, null)
          }
          proj(joined(lrow, asofCell))
        }
      }
    }
  }
}

/** DataFrame-level API for the native as-of join. */
object AsOfJoin {

  /** `left` as-of joined to `right` on `key`, attaching the greatest
    * `rightTs` ≤ `leftTs` as a new long column `outName`. Children are
    * used as-is (pre-project the right side to (key, ts) for minimal
    * shuffle width).
    */
  def asof(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, outName: String): DataFrame = {
    val lds = left.asInstanceOf[ClassicDataset[_]]
    val rds = right.asInstanceOf[ClassicDataset[_]]
    val spark = lds.sparkSession
    ensureStrategy(spark)
    val lPlan = lds.queryExecution.analyzed
    // self-joins share relation instances and exprIds across both
    // children (exactly what DeduplicateRelations repairs for built-in
    // joins); mint fresh exprIds for the right side so per-side column
    // pruning and binding can't cross-wire
    val rPlan = {
      val analyzed = rds.queryExecution.analyzed
      org.apache.spark.sql.catalyst.plans.logical.Project(
        analyzed.output.map(a => Alias(a, a.name)()), analyzed)
    }
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"no column $n in ${p.output.map(_.name)}"))
    val node = AsOfJoinNode(lPlan, rPlan,
      attr(lPlan, key), attr(rPlan, key),
      attr(lPlan, leftTs), attr(rPlan, rightTs),
      AttributeReference(outName, LongType, nullable = true)())
    org.apache.spark.sql.graftbridge.Bridge.ofRows(spark, node)
  }

  /** Make the strategy available on sessions that didn't come up with
    * `GraftExtensions` (idempotent).
    */
  def ensureStrategy(spark: ClassicSparkSession): Unit =
    if (!spark.sessionState.planner.strategies.contains(AsOfJoinStrategy) &&
        !spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
}
