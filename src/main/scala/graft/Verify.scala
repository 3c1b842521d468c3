package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // dev: verify only a comma-separated subset (driver leaves this unset)
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter { case (k, _) => names(k) }
      case None => SparkEntry.queries
    }
    // subset mode must not overwrite the full run's oracle_sql.json: a
    // stale full outDir plus a narrowed oracle file would make a 1-query
    // check look like a clean full pass. The narrowed oracle goes to a
    // suffixed file the full-run checker never reads.
    if (only.isDefined)
      System.err.println(s"[verify] SUBSET mode: ${selected.size} of " +
        s"${SparkEntry.queries.size} queries; writing oracle_sql.subset.json")
    // twin discipline: every no-oracle entry must declare a live,
    // oracle-checked twin (SparkEntry.twinOf) — fail LOUDLY before any
    // query runs, so a rename can't silently orphan an exception
    locally {
      val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
      val undeclared = noOracle -- SparkEntry.twinOf.keySet
      val stale = SparkEntry.twinOf.keySet -- noOracle
      val badTwin = SparkEntry.twinOf.collect {
        case (k, t) if !SparkEntry.queries.contains(t) ||
          !SparkEntry.oracleSql.contains(t) => s"$k -> $t"
      }
      if (undeclared.nonEmpty || stale.nonEmpty || badTwin.nonEmpty) {
        System.err.println("[verify] TWIN CHECK FAILED:")
        if (undeclared.nonEmpty) System.err.println(
          s"[verify]   no-oracle entries with no declared twin: ${undeclared.toSeq.sorted.mkString(",")}")
        if (stale.nonEmpty) System.err.println(
          s"[verify]   twinOf keys that are not no-oracle entries (renamed/removed/now-oracled): ${stale.toSeq.sorted.mkString(",")}")
        if (badTwin.nonEmpty) System.err.println(
          s"[verify]   twins missing from queries/oracleSql: ${badTwin.toSeq.sorted.mkString(",")}")
        spark.stop()
        sys.exit(4)
      }
    }
    // registry-wide plan guard: fail the whole run if ANY query's
    // executed plans carry an In/InSet past the 64-literal bound (the
    // round-10 scale-killer shape) — see plans.InListCheck
    val guard = plans.InListCheck.register(spark)
    selected.foreach { case (name, fn) =>
      guard.label(name)
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // see Bench: avoid cross-query cache accretion. localCheckpoint
      // blocks (LSH candidates, dd_clusters rounds) survive clearCache —
      // over 135 queries in one session they accrete into GC pressure,
      // so drop them explicitly too
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val dumped = only match {
      case Some(names) => SparkEntry.oracleSql.filter { case (k, _) => names(k) }
      case None => SparkEntry.oracleSql
    }
    val json = dumped
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    val oracleFile =
      if (only.isDefined) "oracle_sql.subset.json" else "oracle_sql.json"
    Files.writeString(Paths.get(s"$outDir/$oracleFile"), json)
    val offenders = guard.report()
    if (offenders.nonEmpty) {
      System.err.println(
        s"[verify] PLAN GUARD FAILED — ${offenders.size} oversized In-lists:")
      offenders.foreach(o => System.err.println(s"[verify]   $o"))
      spark.stop()
      sys.exit(3)
    }
    spark.stop()
  }
}
