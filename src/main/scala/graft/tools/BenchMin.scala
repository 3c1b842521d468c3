package graft.tools

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Merge several bench run dumps into ONE per-query MIN artifact — the
  * burst-proof number history should compare against. A host burst is
  * transient: a query's minimum raw time across N same-code runs is
  * its honest cost on this host, while any single run can carry a
  * multi-× artifact (round 16: a byte-identical query at 15.2 s in the
  * committed run, 2.5–3.2 s in the round's three others). The merged
  * dump keeps each query's min raw and, beside it, the per-run spread
  * (`runs=a,b,c`) so the adjudicator sees how noisy the round was
  * without opening every file.
  *
  * Usage: runMain graft.tools.BenchMin out.txt run1.txt run2.txt ...
  */
object BenchMin {
  private val Line = """^([0-9.]+)\s+norm=([0-9.]+)\s+(\S+)\s+.*$""".r

  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: BenchMin <out.txt> <run1.txt> <run2.txt> [more runs...]")
    val out = args.head
    val runs = args.tail.toSeq
    // name -> per-run raw seconds (queries missing from a run — e.g. a
    // registry grown mid-round — min over the runs that carry them)
    val perRun: Seq[Map[String, Double]] = runs.map { p =>
      Files.readAllLines(Paths.get(p)).asScala.collect {
        case Line(raw, _, name) => name -> raw.toDouble
      }.toMap
    }
    val names = perRun.flatMap(_.keySet).distinct.sorted
    val merged = names.map { n =>
      val ts = perRun.flatMap(_.get(n))
      (n, ts.min, ts)
    }
    val total = merged.map(_._2).sum
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", v)
    val header = s"# per-query MIN across ${runs.size} runs " +
      s"(${runs.mkString(", ")})  n_queries=${names.size} " +
      s"total_min=${fmt(total)}s"
    val body = merged.sortBy(-_._2).map { case (n, m, ts) =>
      s"${fmt(m)}  $n  runs=${ts.map(fmt).mkString(",")}"
    }
    Files.writeString(Paths.get(out),
      (header +: body).mkString("", "\n", "\n"))
    println(header)
  }
}
