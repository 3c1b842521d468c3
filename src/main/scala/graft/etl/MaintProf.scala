package graft.etl

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.LongAdder

/** Dev-only timing accumulator for the index-maintenance path
  * (enabled by `-Dgraft.prof=1`; a single cached boolean check — zero
  * cost — otherwise). Attributes wall time among the maintenance
  * sub-steps (commit-scope metadata reads, covered-head writes,
  * reconcile Spark jobs, serve-time freshness gates) so a bench move
  * on an index-bearing lifecycle can be attributed to a step instead
  * of guessed at. Not part of the engine surface.
  */
private[graft] object MaintProf {
  val enabled: Boolean = sys.props.get("graft.prof").contains("1")

  private val nanos = new ConcurrentHashMap[String, LongAdder]()
  private val calls = new ConcurrentHashMap[String, LongAdder]()

  @inline def timed[T](name: String)(f: => T): T =
    if (!enabled) f
    else {
      val t0 = System.nanoTime()
      try f
      finally {
        nanos.computeIfAbsent(name, _ => new LongAdder).add(System.nanoTime() - t0)
        calls.computeIfAbsent(name, _ => new LongAdder).increment()
      }
    }

  def dump(): Unit = if (enabled) {
    import scala.jdk.CollectionConverters._
    val rows = nanos.asScala.toSeq.sortBy(-_._2.sum())
    rows.foreach { case (n, a) =>
      println(f"[maint] $n%-34s ${a.sum() / 1e9}%8.3f s  x${calls.get(n).sum()}%d")
    }
  }

  def reset(): Unit = { nanos.clear(); calls.clear() }
}
