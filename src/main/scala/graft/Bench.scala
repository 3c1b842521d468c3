package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // ---- Warmup (untimed) -------------------------------------------------
    // Round-2 lesson: ~35 s of session/JIT/codegen startup was absorbed by
    // whichever queries happened to run first (the old Map iteration order),
    // corrupting their recorded times up to 10×. Warm every cost class the
    // timed queries hit:
    // 1. scheduler + whole-stage-codegen plumbing
    spark.range(1000000).selectExpr("sum(id)").collect()
    // 2. catalog: file listings + footer schema reads are one-time
    //    registration costs, not per-query work
    try {
      Tables.views(spark, sfDir)
      // 3. each table's parquet scan path (column readers per schema) —
      //    a small slice per table, not a full scan
      Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings").foreach { t =>
        spark.table(t).limit(64).collect()
      }
      // 4. expression-codegen families the query suite leans on (regex,
      //    md5/conv hashing, array lambdas, explode, window) — tiny inputs,
      //    the cost being warmed is janino + JIT, not data
      spark.sql(
        """SELECT regexp_replace('a  b!', '[^a-z0-9 ]', ''),
          |  md5('warm'), conv(substr(md5('warm'), 1, 15), 16, 10),
          |  aggregate(sequence(1, 8), CAST(0.0 AS DOUBLE), (a, d) -> a + d),
          |  transform(sequence(1, 4), x -> x * 2)""".stripMargin).collect()
      spark.range(256).selectExpr("id % 7 AS g", "id")
        .selectExpr("g", "id", "posexplode(array(id, id + 1)) AS (p, v)")
        .createOrReplaceTempView("warm_t")
      spark.sql(
        """SELECT g, sum(v), row_number() OVER (PARTITION BY g ORDER BY v) AS r
          |FROM warm_t GROUP BY g, v""".stripMargin).collect()
    } catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench] warmup failed: ${e.getMessage}")
    }
    // ---- Host-speed calibration -------------------------------------------
    // Round-12 lesson: byte-identical, lock-free queries swung +8–36%
    // between rounds on host load alone, so raw cross-round deltas
    // cannot gate regressions. A fixed PURE-CPU workload (no I/O, no
    // table state, no locks) is timed at bench start AND end; its ratio
    // to the pinned reference (CalibRef, measured on an idle host at
    // round 13) is the host-speed factor of THIS run. The JSON line
    // carries calib_sec; the per-query dump carries raw and
    // calib-normalized times, so a real regression is a query whose
    // NORMALIZED time moved — host weather divides out.
    def calibrate(): Double = {
      val t0 = System.nanoTime()
      spark.range(512L << 20) // bit_xor: overflow-free under ANSI
        .selectExpr("bit_xor(xxhash64(id))", "sum(id % 97)").collect()
      spark.sql(
        """SELECT count(*) FROM (
          |  SELECT id % 9973 AS g, max(md5(cast(id AS string))) AS m
          |  FROM range(2500000) GROUP BY g)""".stripMargin).collect()
      (System.nanoTime() - t0) / 1e9
    }
    val CalibRef = 0.75 // seconds, idle-host reference (round 13)
    calibrate() // discarded: JIT-warms the calibration expressions themselves
    // deliberate-slowdown plant (test of the calibration test): inflate
    // the named query's wall time by 30% INSIDE the timed window so the
    // round note can prove a 1.3× regression clears the normalized band
    val plant = sys.env.get("SPARK_GRAFT_BENCH_PLANT")
    // ---- Timed runs -------------------------------------------------------
    // dev: bench only a comma-separated subset of query names
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    // at sf 0.1 and beyond the O(n²) recall baselines leave the benched
    // set (at sf0.1 dd_embed_neardup alone was 18% of the round-4 bench;
    // past it they dominate quadratically); correctness still covers them
    // at sf0.01 — see SparkEntry.quadraticQueries
    val sf = "sf([0-9.]+)".r.findFirstMatchIn(sfDir)
      .flatMap(_.group(1).toDoubleOption)
    val scaleExcluded = SparkEntry.quadraticQueries ++ SparkEntry.nonSelectiveQueries
    val scaleGated =
      if (sf.exists(_ >= 0.1)) {
        System.err.println(
          s"[bench] sf=$sf: skipping quadratic/non-selective baselines ${scaleExcluded.mkString(",")}")
        SparkEntry.queries -- scaleExcluded
      } else SparkEntry.queries
    val selected = only match {
      case Some(names) => scaleGated.filter { case (k, _) => names(k) }
      case None => scaleGated
    }
    // deterministic name order (the old unordered Map made round-over-round
    // per-query numbers incomparable); best-of-2 per query so one GC pause /
    // host-contention spike can't masquerade as a regression
    val reps = sys.env.get("SPARK_GRAFT_BENCH_REPS")
      .flatMap(_.toIntOption).filter(_ >= 1).getOrElse(2)
    // self-diagnosing dump (round-5 lesson: a 28 s driver-vs-rerun gap was
    // unattributable from the artifact): every query line carries its
    // wall-clock offset into the run, the JVM GC-time delta across its
    // reps, and the heap level after it — so the NEXT round can tell
    // machine contention (late offsets slow, GC flat) from block/heap
    // accretion (heap climbs monotonically) from a real regression (one
    // query slow at any offset, GC proportional) without a re-run
    import scala.jdk.CollectionConverters._
    def gcMillis(): Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    def heapMb(): Long = java.lang.management.ManagementFactory
      .getMemoryMXBean.getHeapMemoryUsage.getUsed >> 20
    val benchT0 = System.nanoTime()
    // ---- Interleaved calibration (round-13 lesson: end-point-only
    // sampling missed a mid-run load burst, and the driver artifact
    // published a norm_total wrong by ~2×). A probe runs every
    // ProbeEvery queries; each query is normalized by the MIN of its
    // two bracketing probes (min = the host's observed speed ceiling
    // around that moment — under-corrects, so a planted regression
    // still shows). When ADJACENT probes disagree >20% the run's
    // normalization is self-declared unreliable (`norm_valid: false`
    // in the JSON line): a burst faster than the probe cadence can
    // still hide between two calm probes, and the flag is what keeps
    // such a run from being read as ground truth.
    val ProbeEvery = 25
    val probes = scala.collection.mutable.ArrayBuffer[(Double, Double)]()
    def probe(minOf: Int): Unit = {
      val at = (System.nanoTime() - benchT0) / 1e9
      probes += ((at, (1 to minOf).map(_ => calibrate()).min))
    }
    probe(minOf = 2) // start: min-of-2 (a cold spike must not anchor the run)
    // ---- Synthetic mid-run load (test of the calibration test):
    // SPARK_GRAFT_BENCH_BURN=<threads> spins that many busy threads for
    // the MIDDLE THIRD of the query list — the run-4/round-13 failure
    // shape. With interleaved probes the burst must either divide out
    // of the affected queries' norm= or flip norm_valid to false;
    // combined with SPARK_GRAFT_BENCH_PLANT it demonstrates a real
    // regression is still detected under load.
    val burnThreads = sys.env.get("SPARK_GRAFT_BENCH_BURN")
      .flatMap(_.toIntOption).getOrElse(0)
    val burnOn = new java.util.concurrent.atomic.AtomicBoolean(false)
    val burners = (1 to burnThreads).map { i =>
      val t = new Thread(() => {
        var x = 0x9E3779B97F4A7C15L + i
        while (!Thread.currentThread().isInterrupted) {
          if (burnOn.get()) { x = x * 6364136223846793005L + 1442695040888963407L }
          else Thread.sleep(5)
        }
        if (x == 42L) System.err.println("") // keep x live
      })
      t.setDaemon(true); t.start(); t
    }
    val nSel = selected.size
    // round-17 lesson: a 2.2× host burst shorter than the 25-query
    // probe spacing landed entirely on one 15 s query and the
    // bracketing probes (both calm) INFLATED its normalized time
    // instead of correcting it. Two fixes: (1) every query that took
    // ≥ 2 s is followed by an immediate probe, so a burst that hit an
    // expensive entry is bracketed by a probe that SAW it; (2) when a
    // query's two brackets disagree > 20% (a load edge crossed it),
    // normalization uses the SLOWER bracket — the burst-side estimate
    // — and the dump marks the query `burst-bracketed`. A real
    // regression never slows the probes, so brackets agree and the
    // conservative min path still applies (the PLANT test stays red).
    val SlowProbeSec = 2.0
    val results = selected.toSeq.sortBy(_._1).zipWithIndex.map {
      case ((name, fn), idx) =>
      if (idx > 0 && idx % ProbeEvery == 0) probe(minOf = 1)
      if (burnThreads > 0) {
        if (idx == nSel / 3) { burnOn.set(true)
          System.err.println(s"[bench] burner ON ($burnThreads threads) at query $idx") }
        if (idx == 2 * nSel / 3) { burnOn.set(false)
          System.err.println(s"[bench] burner OFF at query $idx") }
      }
      val atSec = (System.nanoTime() - benchT0) / 1e9
      val gc0 = gcMillis()
      // a failed rep records None — a near-zero failure elapsed must never
      // win the min and masquerade as a fast success
      val times = (1 to reps).flatMap { _ =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).count(); true } catch {
            case e: Throwable => // keep timing the rest, but never silently
              System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
              false
          }
        if (plant.contains(name)) // see calibration block above
          Thread.sleep(((System.nanoTime() - t0) / 1e6 * 0.3).toLong)
        val dt = (System.nanoTime() - t0) / 1e9
        // queries cache intermediates (shingle/signature reuse); drop them
        // between runs so blocks don't accrete into GC pressure.
        // clearCache only covers catalog-cached Datasets — localCheckpoint
        // blocks (LSH candidate sets, dd_clusters rounds) survive it and
        // were the round-4 cross-query slowdown; unpersist them explicitly
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        if (ok) Some(dt) else None
      }
      val diag = f"at=${atSec}%.1fs gc+${gcMillis() - gc0}ms heap=${heapMb()}MB"
      // expensive entry: close its bracket NOW so a burst inside it is
      // observed by a probe, not interpolated over (fix (1) above)
      if (times.minOption.exists(_ >= SlowProbeSec)) probe(minOf = 1)
      // every rep failed → None: kept OUT of the total (a -1.0 sentinel
      // summed in would make a broken query IMPROVE the headline number)
      // and reported explicitly in the JSON line below
      (name, times.minOption, diag, atSec)
    }
    burnOn.set(false); burners.foreach(_.interrupt())
    probe(minOf = 2) // end: min-of-2, symmetric with the start anchor
    // per-query local host factor: MIN of the two probes bracketing its
    // start offset (conservative — a regression can't hide), EXCEPT
    // when the brackets disagree > 20%: a load edge crossed this query,
    // and the min would attribute the burst to the code (the
    // wrong-direction inflation of fix (2) above) — use the slower
    // bracket and surface the choice per query.
    def localBrackets(atSec: Double): (Double, Boolean) = {
      val before = probes.filter(_._1 <= atSec).map(_._2).lastOption
      val after = probes.find(_._1 > atSec).map(_._2)
      val bs = before.toSeq ++ after.toSeq
      val edge = bs.size == 2 && bs.max / bs.min > 1.2
      (if (edge) bs.max else bs.min, edge)
    }
    def localFactor(atSec: Double): Double = localBrackets(atSec)._1 / CalibRef
    val calib = probes.map(_._2).min
    val hostFactor = calib / CalibRef // >1 = host slower than reference
    // adjacent probes disagreeing >20% = a load edge the cadence caught
    // only partially — the normalized numbers of the queries between
    // them are interpolations at best; say so in the artifact
    val normValid = probes.map(_._2).toSeq.sliding(2).forall {
      case Seq(a, b) => math.max(a: Double, b: Double) /
        math.min(a: Double, b: Double) <= 1.2
      case _ => true
    }
    val failed = results.collect { case (name, None, _, _) => name }
    val timed = results.collect { case (name, Some(t), _, _) => name -> t }
    val norms = results.collect { case (name, Some(t), _, at) =>
      name -> t / localFactor(at) }.toMap
    val bursted = results.collect { case (name, Some(_), _, at)
      if localBrackets(at)._2 => name }.toSet
    val diags = results.map { case (name, _, d, _) => name -> d }.toMap
    // The driver captures only the tail of stdout (~2 KB): a per-query map
    // over all ~130 queries overflows it and the JSON line never parses
    // (round-1 lesson). Emit the 15 slowest queries only, rounded, and keep
    // the line well under 1 KB; the total still sums EVERY query.
    // locale-independent 3dp formatting — the f-interpolator honors the
    // default JVM locale, and a comma decimal separator would corrupt
    // the driver-parsed JSON line
    def fmt(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", v)
    // full per-query history: always dumped so round N+1 can diff every
    // query, not just the 15 the driver line carries (committed as
    // bench/rN.txt at round end)
    // default is ROUND-STAMPED (wall-clock UTC) so an adjudication rerun
    // can never clobber the artifact run's dump (round-13 lesson);
    // bench/last_run.txt is maintained as a convenience mirror
    val stamp = java.time.format.DateTimeFormatter
      .ofPattern("yyyyMMdd_HHmmss").withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.now())
    val dumpPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_DUMP",
      s"bench/run_$stamp.txt")
    val normTotal = norms.values.sum
    try {
      val probesStr = probes.map { case (at, c) =>
        f"$at%.0f:${fmt(c)}" }.mkString(",")
      val lines = (s"# sf=$sfDir reps=$reps n_queries=${results.size} " +
        s"n_failed=${failed.size} total=${fmt(timed.map(_._2).sum)}s " +
        s"gc_total=${gcMillis()}ms " +
        s"host_factor=${fmt(hostFactor)} norm_valid=$normValid " +
        s"norm_total=${fmt(normTotal)}s " +
        s"probes(at:sec)=$probesStr") +:
        (failed.map(k => s"FAILED $k  ${diags(k)}") ++
          timed.sortBy(-_._2).map { case (k, v) =>
            val mark = if (bursted(k)) "  burst-bracketed" else ""
            s"${fmt(v)}  norm=${fmt(norms(k))}  $k  ${diags(k)}$mark" })
      for (path <- Seq(dumpPath, "bench/last_run.txt").distinct) {
        val p = java.nio.file.Paths.get(path)
        Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
        java.nio.file.Files.writeString(p, lines.mkString("", "\n", "\n"))
      }
    } catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench] dump failed: ${e.getMessage}")
    }
    val slowest = timed.sortBy(-_._2).take(15)
    val qs = slowest.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val probesJson = probes.map(p => fmt(p._2)).mkString("[", ",", "]")
    val total = timed.map(_._2).sum
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n_queries":${results.size},"n_failed":${failed.size},"failed":$failedJson,"calib_sec":${fmt(calib)},"calib_ref":${fmt(CalibRef)},"host_factor":${fmt(hostFactor)},"calib_probes":$probesJson,"norm_valid":$normValid,"norm_total":${fmt(normTotal)},"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
