package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths, StandardCopyOption, StandardOpenOption}
import scala.jdk.CollectionConverters._

/** Copy-on-write with a BLOOM file index — the other half of Hudi's
  * indexing story next to [[BucketTable]]'s BUCKET index (reference:
  * Hudi's default `hoodie.index.type=BLOOM`, which tags each incoming
  * record to the file groups that may already hold its key using the
  * per-file key range + bloom filter Hudi stores in parquet footers;
  * the reference pipeline exercises it implicitly through every
  * `hoodie.datasource.write.operation=upsert`,
  * pipeline_architecture.py:243-251).
  *
  * Where the bucket index prescribes file placement (`hash(key) % n`),
  * the bloom index lets data lie where ingest put it — here key-range
  * clustered — and answers the write-side question "which files might
  * contain these keys?" from an O(files) sidecar:
  *
  *   - key-range check: file's [key_min, key_max] must overlap the key
  *   - bloom check: all K Kirsch–Mitzenmacher bits of the key must be
  *     set in the file's bitmap (definitely-absent ⇒ skip the file,
  *     even when the range overlaps — the sparse-key win)
  *
  * An upsert rewrites ONLY the files some incoming key may live in;
  * a batch of brand-new keys that no file can contain is a pure
  * append — no existing file read OR written. That is what makes CoW
  * upserts affordable when batches have key locality but the table is
  * not hash-laid-out.
  *
  * Layout under `tablePath/`:
  *   - `c=N/`       data files written by commit N (immutable)
  *   - `_manifest`  one live data-file path per line (relative),
  *                  atomically replaced — the commit point
  *   - `_index/v=M/` one row per live file: key_min/key_max of the
  *                  leading key column, bloom bitmap, row_count
  *   - `_index/_latest` pointer, swapped after the manifest: the index
  *                  is an acceleration structure, so it trails the
  *                  manifest and [[reconcileIndex]] self-heals any gap
  *                  (files in the manifest but not the index get
  *                  scanned on the next upsert — never wrong results,
  *                  only lost pruning, same contract as
  *                  [[StatsIndex]])
  *   - `_props`     keys / precombine / tieBreak / mBits / numFiles
  *
  * Scale: the index is O(files) tiny rows and broadcasts; candidate
  * tagging is one broadcast probe over the BATCH (each row: one range
  * compare + K bit tests per surviving file — at very large file
  * counts, pre-partition the probe by key-range interval the way
  * Hudi's bloom-index partitioner does). The merge reads only matched
  * files; the index update scans only freshly written files.
  */
object BloomTable {

  private def manifestPath(t: String): Path = Paths.get(t, "_manifest")
  private def propsPath(t: String): Path = Paths.get(t, "_props")
  private def schemaPath(t: String): Path = Paths.get(t, "_schema")

  /** Persist the committed snapshot schema: the shape a read must
    * still serve once a delete has emptied the manifest — an emptied
    * table is a legitimate state, not a missing one (same contract as
    * `BucketTable`'s `_schema`; Hudi records schema in commit
    * metadata). Refreshed on every schema-bearing commit.
    */
  private def writeSchema(tablePath: String, df: DataFrame): Unit = {
    val tmp = Paths.get(tablePath, s"_schema.tmp${System.nanoTime()}")
    Files.writeString(tmp, df.schema.toDDL,
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    Files.move(tmp, schemaPath(tablePath), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    ()
  }

  /** Zero-row snapshot of an emptied table at the recorded schema —
    * loud when no commit ever recorded one (pre-upgrade tables).
    */
  private def emptySnapshot(spark: SparkSession, tablePath: String): DataFrame = {
    val sp = schemaPath(tablePath)
    require(Files.exists(sp),
      s"bloom table at $tablePath has no committed data and no recorded " +
        "schema (last written before schema recording); upsert a " +
        "non-empty batch first")
    spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
      org.apache.spark.sql.types.StructType.fromDDL(Files.readString(sp)))
  }
  private def indexLatest(t: String): Path = Paths.get(t, "_index", "_latest")

  final case class Props(keys: Seq[String], precombine: String,
      tieBreak: Seq[String], mBits: Int, numFiles: Int)

  def exists(tablePath: String): Boolean = Files.exists(manifestPath(tablePath))

  /** Multi-writer safety: mutators hold [[FsLock]]'s exclusive-create
    * lock file for the duration of tag→write→swap; a second writer
    * fails loudly with `ConcurrentModificationException` instead of
    * silently dropping the first writer's files (lost commits).
    */
  private def withTableLock[T](tablePath: String)(body: => T): T =
    FsLock.withTableLock(tablePath)(body)

  def props(tablePath: String): Props = {
    val m = Files.readAllLines(propsPath(tablePath)).asScala
      .map(_.split('=')).collect { case Array(k, v) => k -> v }.toMap
    Props(m("keys").split(',').toSeq.filter(_.nonEmpty), m("precombine"),
      m.getOrElse("tieBreak", "").split(',').toSeq.filter(_.nonEmpty),
      m("mBits").toInt, m("numFiles").toInt)
  }

  /** Existence of a manifest entry on disk — external (bootstrap)
    * entries are absolute and must not be joined under the table dir
    * (Paths.get concatenates; only Path.resolve passes absolutes
    * through).
    */
  private def entryExists(tablePath: String, rel: String): Boolean =
    Files.exists(Paths.get(tablePath).resolve(rel))

  /** Live data files (relative paths), in manifest order. */
  def manifest(tablePath: String): Seq[String] = {
    val p = manifestPath(tablePath)
    if (!Files.exists(p)) Seq.empty
    else Files.readAllLines(p).asScala.filter(_.nonEmpty).toSeq
  }

  private def commitsPath(t: String): Path = Paths.get(t, "_commits")

  /** Append-only commit log: one line `no kind` per manifest swing.
    * `kind` classifies what the commit could have done to EXISTING
    * rows — `write` (pure upsert/append: adds files, removes only
    * files it rewrote with every surviving row), `delete` / `rewrite`
    * / `overwrite` (may remove rows without a replacement file), and
    * `cluster` (full content-preserving rewrite). [[changedSince]]
    * serves a file-ADD feed, which cannot express a deletion — so a
    * destructive kind inside the pull window fails loudly toward a
    * snapshot re-sync instead of silently leaving the consumer with
    * rows the table no longer has.
    */
  private def parseCommitLine(l: String): Option[(Long, String)] =
    l.split(' ') match {
      case Array(no, kind, _*) if no.nonEmpty && no.forall(_.isDigit) =>
        Some((no.toLong, kind))
      case _ => None // torn trailing line from a crashed append
    }

  /** The ACTIVE commit log (bounded once [[archiveCommits]] runs). */
  def commitLog(tablePath: String): Seq[(Long, String)] = {
    val p = commitsPath(tablePath)
    if (!Files.exists(p)) Seq.empty
    else Files.readAllLines(p).asScala.toSeq.flatMap(parseCommitLine)
  }

  /** Archived + active history — the old-cursor cold path. */
  def fullCommitLog(tablePath: String): Seq[(Long, String)] =
    CommitLogFile.fullLines(tablePath).flatMap(parseCommitLine)

  /** The commit log WITH file-delta info: commit → (kind,
    * Some((removed, added)) relative files) — `None` for lines written
    * before deltas were recorded (pre-upgrade tables), which
    * [[manifestAsOf]] refuses rather than reconstruct a wrong
    * snapshot. Reads the FULL history (historical reads are the cold
    * path archival exists for). A no-change commit logs `.` so it
    * stays distinguishable from a legacy two-token line.
    */
  def commitLogFull(tablePath: String)
      : Seq[(Long, String, Option[(Seq[String], Seq[String])])] =
    CommitLogFile.fullLines(tablePath).flatMap { l =>
      l.split(' ') match {
        // a VALID delta-bearing line ends with its ts= token — a torn
        // append truncated mid-delta (possibly at a comma boundary,
        // where the remainder would parse as a smaller-but-wrong diff)
        // loses it, so torn lines classify as TORN (excluded; the head
        // validation below catches the fold gap loudly), never as a
        // legitimate smaller commit and never as pre-upgrade legacy
        case Array(no, kind, delta, ts)
            if no.nonEmpty && no.forall(_.isDigit) && ts.startsWith("ts=") =>
          val d =
            if (delta == ".") Some((Seq.empty[String], Seq.empty[String]))
            else {
              val es = delta.split(',').filter(_.nonEmpty).toSeq
              Some((es.filter(_.startsWith("-")).map(_.drop(1)),
                es.filter(_.startsWith("+")).map(_.drop(1))))
            }
          Some((no.toLong, kind, d))
        case Array(no, kind) if no.nonEmpty && no.forall(_.isDigit) =>
          Some((no.toLong, kind, None)) // legacy two-token: deltas unknown
        case _ => None // torn append
      }
    }

  /** Commit wall-clock times from the `ts=` token (None on lines
    * written before timestamps were recorded).
    */
  private def commitTimes(tablePath: String): Seq[(Long, Option[Long])] =
    CommitLogFile.fullLines(tablePath).flatMap(_.split(' ') match {
      case Array(no, _, rest @ _*) if no.nonEmpty && no.forall(_.isDigit) =>
        Some((no.toLong, rest.collectFirst {
          case t if t.startsWith("ts=") && t.drop(3).forall(_.isDigit) =>
            t.drop(3).toLong
        }))
      case _ => None
    })

  /** `TIMESTAMP AS OF` resolution — the Timeline.resolveAsOf contract
    * over the bloom commit log: newest commit at or before `tsMs`,
    * loud earlier (with a hint for pre-timestamp commits).
    */
  def resolveAsOf(tablePath: String, tsMs: Long): Long = {
    val timed = commitTimes(tablePath)
    require(timed.nonEmpty, s"no commits at $tablePath")
    val candidates = timed.collect { case (no, Some(t)) if t <= tsMs => no }
    if (candidates.isEmpty) {
      val untimed = timed.count(_._2.isEmpty)
      throw new IllegalArgumentException(
        s"no commit at or before $tsMs at $tablePath" +
          (if (untimed > 0) s" ($untimed commits predate timestamps — " +
            "resolve those with VERSION AS OF)" else ""))
    }
    candidates.max
  }

  /** The live-file set AS OF `commit`: fold every logged file delta
    * through it. Loud on upgraded tables (log doesn't cover birth),
    * legacy delta-less lines in range, and out-of-range commits —
    * same contract as [[BucketTable.manifestAsOf]].
    */
  def manifestAsOf(tablePath: String, commit: Long): Seq[String] = {
    val full = commitLogFull(tablePath)
    val head = full.map(_._1).maxOption.getOrElse(0L)
    require(commit >= 1 && commit <= head,
      s"VERSION AS OF $commit at $tablePath: commits run 1..$head")
    require(full.map(_._1).minOption.contains(1L),
      s"the commit log at $tablePath does not cover the table's birth " +
        "(created before commit logging) — historical reads need a " +
        "from-birth log")
    val upTo = full.filter(_._1 <= commit)
    val legacy = upTo.collect { case (no, _, None) => no }
    require(legacy.isEmpty,
      s"commit(s) ${legacy.mkString(",")} at $tablePath were logged " +
        "without file-delta info (pre-upgrade writes) — versions at or " +
        "after them are reconstructable, earlier ones are not")
    def fold(entries: Seq[(Long, String, Option[(Seq[String], Seq[String])])])
        : Set[String] =
      entries.sortBy(_._1).foldLeft(Set.empty[String]) {
        // a full restate (overwrite / cluster-compact) REPLACES the
        // file set — folding it as a reset (not a diff) means one
        // maintenance compaction repairs any residue an earlier torn
        // or phantom line left behind
        case (_, (_, kind, Some((_, added))))
            if kind == "overwrite" || kind == "cluster" => added.toSet
        case (fs, (_, _, Some((removed, added)))) => fs -- removed ++ added
        case (fs, _) => fs
      }
    // crash-window guard: the log line is appended BEFORE the manifest
    // swing (the incremental feed needs that order), so a crash in
    // between leaves a PHANTOM line whose diff no swing applied — and
    // a set-diff fold cannot self-heal from it. Detect: the fold at
    // the HEAD must reproduce the live manifest, else every historical
    // read refuses loudly (run a compacting `cluster` commit to reset
    // history) rather than serve a silently wrong snapshot. The log
    // legitimately LEADS the manifest between a live writer's
    // pre-swing append and its swing — both run under the table lock —
    // so a mismatch re-reads ONCE under the lock (draining any
    // in-flight writer) before declaring the history unreliable.
    if (full.forall(_._3.isDefined) &&
        fold(full) != manifest(tablePath).toSet) {
      val consistent =
        try withTableLock(tablePath) {
          val f2 = commitLogFull(tablePath)
          !f2.forall(_._3.isDefined) ||
            fold(f2) == manifest(tablePath).toSet
        } catch {
          case _: java.util.ConcurrentModificationException => false
        }
      require(consistent,
        s"the commit log at $tablePath does not fold to the live " +
          "manifest (a crash-torn or phantom line) — historical reads " +
          "are unreliable until a compaction resets history")
    }
    fold(upTo).toSeq.sorted
  }

  /** Read the table AS OF commit `commit` — `SELECT ... VERSION AS OF`
    * on the bloom layout: the historical file set folded back out of
    * the commit log's deltas, served from the (immutable) per-commit
    * file dirs. Works for any commit whose files [[clean]] hasn't
    * reclaimed; a reclaimed version fails loudly, never serves a
    * partial snapshot.
    */
  def readVersion(spark: SparkSession, tablePath: String,
      commit: Long): DataFrame = {
    val files = manifestAsOf(tablePath, commit)
    val missing = files.filterNot(entryExists(tablePath, _))
    require(missing.isEmpty,
      s"VERSION AS OF $commit at $tablePath: file(s) " +
        s"${missing.mkString(",")} were reclaimed by clean — keep " +
        "historical versions readable by cleaning less aggressively")
    if (files.isEmpty) read(spark, tablePath).limit(0)
    else readFiles(spark, tablePath, files)
  }

  /** Fold all but the newest `keepLatest` active `_commits` lines into
    * `_commits_archive` — same move as [[BucketTable.archiveCommits]].
    */
  def archiveCommits(tablePath: String, keepLatest: Int): Seq[Long] =
    FsLock.withTableLock(tablePath, FsLock.QueueWaitMs) {
      CommitLogFile.archive(tablePath, keepLatest)
    }

  /** The newest commit number — the incremental consumer's checkpoint. */
  def latestCommit(tablePath: String): Long =
    commitLog(tablePath).map(_._1).maxOption.getOrElse(0L)

  /** Appended BEFORE the manifest swing (same reasoning as
    * `BucketTable.writeManifest`: a phantom entry re-serves unchanged
    * content, a missing one hides a commit). When cdc is enabled, the
    * commit's row-level images follow [[CdcLog]]'s two-phase
    * discipline: staged before the log append, published after the
    * swing — a crash in between leaves a commit whose images are
    * missing (served loudly), never images of a commit that didn't
    * happen.
    */
  private def writeManifest(tablePath: String, files: Seq[String],
      commit: Long, kind: String, cdc: CdcLog.Action): Unit = {
    val cdcLive = CdcLog.enabled(tablePath)
    if (cdcLive) cdc match {
      case CdcLog.Action.Changes(rows) => CdcLog.stage(tablePath, commit, rows())
      case CdcLog.Action.Preserving => CdcLog.stageEmpty(tablePath, commit)
      case CdcLog.Action.Destructive => CdcLog.ratchet(tablePath, commit)
    }
    // each commit logs its file DELTAS (`-retired,+added`, `.` when
    // none) — the per-commit repointing record that makes
    // manifestAsOf/readVersion possible, exactly BucketTable's `b:g`
    val oldFiles = manifest(tablePath).toSet
    val newFiles = files.toSet
    val delta = ((oldFiles -- newFiles).toSeq.sorted.map("-" + _) ++
      (newFiles -- oldFiles).toSeq.sorted.map("+" + _)).mkString(",")
    Files.writeString(commitsPath(tablePath),
      s"$commit $kind ${if (delta.isEmpty) "." else delta} " +
        s"ts=${System.currentTimeMillis()}\n",
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    val tmp = Paths.get(tablePath, s"_manifest.tmp${System.nanoTime()}")
    Files.writeString(tmp, files.sorted.mkString("\n"),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    Files.move(tmp, manifestPath(tablePath), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    if (cdcLive) CdcLog.publish(tablePath, commit)
  }

  /** Turn on row-level CDC images (see [[CdcLog]]); commits AFTER the
    * current head get images, served by [[changesCdc]]. Unlike
    * [[changedSince]]'s file-add feed — which must refuse row-removing
    * windows — the image feed expresses deletions and update priors
    * exactly on every commit kind.
    */
  def enableCdc(tablePath: String): Unit =
    CdcLog.enable(tablePath, latestCommit(tablePath))

  /** The row-level CDC feed for `(sinceCommit, head]` — op ∈ {i,u,d},
    * before/after images, `_change_seq` = the commit number.
    */
  def changesCdc(spark: SparkSession, tablePath: String,
      sinceCommit: Long): DataFrame =
    CdcLog.changes(spark, tablePath, sinceCommit, latestCommit(tablePath))

  /** Hudi-style incremental query on the bloom CoW layout: the rows of
    * every LIVE file written by a commit after `sinceCommit` —
    * O(changes), no diff join. `write` commits compose exactly (a
    * rewritten file's surviving rows re-deliver as upserts, keyed
    * downstream converges); a destructive commit (delete / predicate
    * rewrite / overwrite) in the window raises loudly — see
    * [[commitLog]].
    */
  def changedSince(spark: SparkSession, tablePath: String,
      sinceCommit: Long): DataFrame = {
    require(Files.exists(commitsPath(tablePath)),
      s"no commit log at $tablePath (table created before incremental " +
        "reads existed) — full-read and checkpoint latestCommit after " +
        "the next commit")
    val active = commitLog(tablePath)
    val head = active.map(_._1).maxOption.getOrElse(0L)
    require(sinceCommit <= head,
      s"incremental cursor $sinceCommit past the commit head $head at " +
        s"$tablePath — checkpoint only commits the log has served")
    // cursors behind the archival boundary resolve through the archive
    // (bounded hot path, complete cold path) — same move as
    // BucketTable.changedSince
    val activeMin = active.map(_._1).minOption.getOrElse(1L)
    val log =
      if (sinceCommit >= activeMin - 1) active else fullCommitLog(tablePath)
    // lazily-created log on an upgraded table starts past the
    // pre-existing commits (create-is-commit-1 tables have
    // minLogged == 1): cursors below its first entry would silently
    // skip the uncovered files — same guard as BucketTable.changedSince
    val minLogged = log.map(_._1).minOption.getOrElse(1L)
    require(sinceCommit >= minLogged - 1,
      s"incremental cursor $sinceCommit predates the commit log at " +
        s"$tablePath (first logged commit $minLogged — table upgraded " +
        "after creation); re-sync from a snapshot read and checkpoint " +
        "latestCommit")
    val destructive = log.filter(e =>
      e._1 > sinceCommit && Set("delete", "rewrite", "overwrite", "restore")(e._2))
    require(destructive.isEmpty,
      s"incremental window ($sinceCommit, $head] at $tablePath contains " +
        s"row-removing commit(s) ${destructive.map(_._1).mkString(",")} — " +
        "a file-add feed cannot express deletions; re-sync from a " +
        "snapshot read and checkpoint latestCommit")
    val files = manifest(tablePath).filter(f =>
      "^c=(\\d+)/".r.findFirstMatchIn(f).exists(_.group(1).toLong > sinceCommit))
    if (files.isEmpty) read(spark, tablePath).limit(0)
    else readFiles(spark, tablePath, files)
  }

  // ---- key hashing (same Kirsch–Mitzenmacher md5 family as
  // BloomAggregator's other users — TextOps.decontaminateBloom) ----

  /** Composite key collapsed to one string for hashing; the control
    * separator keeps composite keys like ("ab","c") and ("a","bc")
    * from sharing bloom bits.
    */
  private def keyStr(keys: Seq[String]): Column =
    concat_ws("\u0001", keys.map(k => col(k).cast("string")): _*)

  private def withKeyHashes(df: DataFrame, keys: Seq[String]): DataFrame =
    df.withColumn("__ks", keyStr(keys))
      .withColumn("__h1",
        expr("CAST(conv(substr(md5(__ks), 1, 15), 16, 10) AS BIGINT)"))
      .withColumn("__h2",
        expr("CAST(conv(substr(md5(__ks), 17, 14), 16, 10) AS BIGINT)"))

  private def positions(m: Int): String = {
    val k = graft.functions.BloomAggregator.K
    s"transform(sequence(0, ${k - 1}), j -> (__h1 + j * __h2) % $m)"
  }

  /** One index row per data file of `df` (which must carry
    * `_metadata.file_path`-addressable provenance, i.e. be a fresh
    * parquet read of exactly the files to index): leading-key
    * min/max, row count, bloom bitmap of the full composite key.
    * One pass, map-side combined.
    */
  /** `private[graft]` so plan tooling can dump the scan shape (the
    * post-write stats pass reads ONLY the key column + file metadata —
    * column pruning makes the "re-read of just-written files" a
    * key-column scan, not a full-width one).
    */
  private[graft] def indexRowsForDump(df: DataFrame, tablePath: String): DataFrame =
    indexRows(df, props(tablePath))

  private def indexRows(df: DataFrame, p: Props): DataFrame = {
    val bloom = udaf(new graft.functions.BloomAggregator(p.mBits))
    withKeyHashes(df, p.keys)
      .select(regexp_replace(col("_metadata.file_path"), "^file:/+", "/").as("file"),
        col(p.keys.head).as("__k0"),
        explode(expr(positions(p.mBits))).as("pos"))
      .groupBy(col("file"))
      .agg(min(col("__k0")).as("key_min"), max(col("__k0")).as("key_max"),
        (count(lit(1)) / graft.functions.BloomAggregator.K).cast("long")
          .as("row_count"),
        bloom(col("pos")).as("bloom"))
  }

  private def currentIndexVersion(tablePath: String): Long =
    Files.readString(indexLatest(tablePath)).trim.toLong

  private def readIndex(spark: SparkSession, tablePath: String): DataFrame =
    spark.read.parquet(s"$tablePath/_index/v=${currentIndexVersion(tablePath)}")

  /** Next index version that cannot collide with debris: a writer that
    * died after the `v=` dir write but before the pointer swap leaves
    * an orphan version readers never see — number past it rather than
    * fail on `errorifexists`.
    */
  private def nextIndexVersion(tablePath: String): Long = {
    val dir = Paths.get(tablePath, "_index")
    val onDisk =
      if (!Files.exists(dir)) Seq.empty
      else {
        val s = Files.list(dir)
        try s.iterator().asScala.map(_.getFileName.toString)
          .collect { case n if n.startsWith("v=") => n.drop(2).toLong }.toSeq
        finally s.close()
      }
    onDisk.maxOption.getOrElse(-1L) + 1
  }

  private def writeIndex(tablePath: String, rows: DataFrame, v: Long): Unit = {
    Files.createDirectories(Paths.get(tablePath, "_index"))
    rows.coalesce(1).write.mode("errorifexists")
      .parquet(s"$tablePath/_index/v=$v")
    val tmp = Paths.get(tablePath, "_index", s"_latest.tmp${System.nanoTime()}")
    Files.writeString(tmp, v.toString,
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    Files.move(tmp, indexLatest(tablePath), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  private def listCommitFiles(tablePath: String, commit: Long): Seq[String] = {
    val dir = Paths.get(tablePath, s"c=$commit")
    val s = Files.list(dir)
    try s.iterator().asScala.map(_.getFileName.toString)
      .filter(n => n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith("."))
      .map(n => s"c=$commit/$n").toSeq.sorted
    finally s.close()
  }

  private def absFiles(tablePath: String, rel: Seq[String]): Seq[String] = {
    val base = Paths.get(tablePath).toAbsolutePath.normalize
    rel.map(r => base.resolve(r).toString)
  }

  private def relFile(tablePath: String, abs: String): String = {
    val base = Paths.get(tablePath).toAbsolutePath.normalize.toString
    // files outside the table dir (a metadata-only [[bootstrap]]'s
    // in-place source) keep their absolute identity — Path.resolve
    // passes an absolute operand through, so every read path serves
    // them unchanged
    if (abs.startsWith(base + "/")) abs.stripPrefix(base + "/") else abs
  }

  /** A file-path list as a one-column DataFrame for manifest
    * semi/anti-joins: at 10⁵–10⁶ live files an `isin(paths: _*)`
    * In-list would inflate every plan with that many literal nodes
    * (driver-side analysis/codegen blowup); a broadcast join against a
    * local relation keeps the plan O(1) whatever the manifest size.
    */
  private def fileDf(spark: SparkSession, paths: Seq[String]): DataFrame = {
    import spark.implicits._
    paths.toDF("file")
  }

  /** How the `file ∈ paths` membership test is planned — the In-list
    * bound `FileInListSpec` pins: up to [[InListMax]] paths it stays a
    * literal `isin` (codegen'd filter, no exchange, no broadcast job —
    * the hot trickle-commit path, where a broadcast join costs more
    * than it saves); past that it becomes a broadcast semi/anti-join
    * against the path list as a local relation, keeping the PLAN O(1)
    * at 10⁵–10⁶ live files instead of carrying one literal node each.
    */
  private[etl] val InListMax = 64

  private[etl] def filesIn(spark: SparkSession, df: DataFrame,
      paths: Seq[String], keep: Boolean): DataFrame =
    if (paths.isEmpty) { if (keep) df.limit(0) else df }
    else if (paths.size <= InListMax) {
      val in = col("file").isin(paths: _*)
      df.filter(if (keep) in else !in)
    } else df.join(broadcast(fileDf(spark, paths)), Seq("file"),
      if (keep) "left_semi" else "left_anti")

  /** Write `df` key-range clustered into `files` files under `c=N/`:
    * range partitioning by the leading key keeps per-file [key_min,
    * key_max] tight and non-overlapping, which is what gives the range
    * half of the index its pruning power (the bloom half works under
    * any layout).
    */
  private def writeCommit(df: DataFrame, tablePath: String, commit: Long,
      p: Props, files: Int): Seq[String] = {
    df.repartitionByRange(math.max(1, files), col(p.keys.head))
      .write.mode("errorifexists").parquet(s"$tablePath/c=$commit")
    listCommitFiles(tablePath, commit)
  }

  private def nextCommit(tablePath: String): Long = {
    val live = manifest(tablePath).flatMap(f =>
      "^c=(\\d+)/".r.findFirstMatchIn(f).map(_.group(1).toLong))
    val onDisk = {
      val s = Files.list(Paths.get(tablePath))
      try s.iterator().asScala.map(_.getFileName.toString)
        // strict c=<digits>: the cdc image dirs (cdc=N) share the
        // prefix and must not parse (or clean) as commit dirs
        .collect { case n if n.matches("c=\\d+") => n.drop(2).toLong }.toSeq
      finally s.close()
    }
    // the commit LOG must participate: a pure-retirement delete commits
    // a number with NO c=N dir, and reissuing it to the next write
    // would alias the incremental feed (a cursor at the delete's number
    // would silently skip the write that reused it)
    val logged = commitLog(tablePath).map(_._1)
    (live ++ onDisk ++ logged).maxOption.getOrElse(-1L) + 1
  }

  /** `mBits = AutoSize` at [[create]]: size each file's filter from
    * the measured table cardinality (`BloomAggregator.sizeFor` over
    * the expected per-file key count) instead of the fixture default —
    * the knob a production table MUST set, because a fixed 64 Kibit
    * filter saturates around ~10⁴ keys per file and a saturated bloom
    * degrades tagging to the range check alone (correct, but every
    * range-overlapping file gets read again). Costs one count() of the
    * deduped create batch — commit-planning work, like Hudi's
    * `hoodie.index.bloom.num_entries` auto-tuning.
    */
  val AutoSize: Int = 0

  def create(df: DataFrame, tablePath: String, keys: Seq[String],
      precombine: String, tieBreak: Seq[String] = Nil,
      mBits: Int = graft.functions.BloomAggregator.MBits,
      numFiles: Int = 8): Unit = {
    require(!exists(tablePath), s"table already exists at $tablePath")
    Files.createDirectories(Paths.get(tablePath))
    val deduped0 = HudiLike.precombineLatest(df, keys, precombine, tieBreak)
    // auto-size pays one materialize+count of the create batch; the
    // explicit-mBits path stays a single streaming write
    val (deduped, sizedBits) =
      if (mBits != AutoSize) (deduped0, mBits)
      else {
        val d = deduped0.localCheckpoint()
        (d, graft.functions.BloomAggregator.sizeFor(
          math.max(1L, (d.count() + numFiles - 1) / numFiles)))
      }
    Files.writeString(propsPath(tablePath),
      s"keys=${keys.mkString(",")}\nprecombine=$precombine\n" +
        s"tieBreak=${tieBreak.mkString(",")}\nmBits=$sizedBits\nnumFiles=$numFiles\n",
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    val p = Props(keys, precombine, tieBreak, sizedBits, numFiles)
    // the create is COMMIT 1 (like BucketTable's), so cursor 0 means
    // "before anything" on every layout: incremental_read('t', 0)
    // bootstraps the full table instead of silently skipping the
    // create's files
    val written = writeCommit(deduped, tablePath, 1L, p, numFiles)
    val spark = df.sparkSession
    writeSchema(tablePath, deduped)
    writeManifest(tablePath, written, 1L, "write",
      CdcLog.Action.Changes { () =>
        val content = readFiles(spark, tablePath, written)
        CdcLog.diff(content.limit(0), content, keys)
      })
    writeIndex(tablePath,
      indexRows(spark.read.parquet(absFiles(tablePath, written): _*), p), 0L)
  }

  /** Hudi's METADATA_ONLY bootstrap on the bloom layout: onboard an
    * existing parquet directory as a bloom table WITHOUT rewriting it.
    * The manifest lists the source files IN PLACE (absolute paths —
    * `Path.resolve` passes an absolute operand through, so every
    * existing resolution path serves them unchanged), and the
    * range∩bloom index is built over them with ONE scan and zero data
    * written — the analog of Hudi's skeleton-file key metadata. From
    * then on the table behaves like any bloom table: an upsert
    * rewrites the touched SOURCE files' survivors into owned `c=N`
    * files and swings the source files out of the manifest — the
    * source dir is never mutated, and a file is individually
    * retireable once superseded (Hudi's per-file full-record migration
    * on first rewrite). [[clean]] never reclaims external files (the
    * engine does not own them).
    *
    * Duplicate keys in the source are refused loudly: a CoW snapshot
    * read is a plain file union — nothing would merge duplicates away
    * (unlike [[MorTable.bootstrap]], whose snapshot merge resolves
    * them). Onboarding such a source needs a full-record mode
    * (`run_bootstrap(..., 'bucket')` — a keyed rewrite).
    */
  def bootstrap(spark: SparkSession, sourceDir: String, tablePath: String,
      keys: Seq[String], precombine: String, tieBreak: Seq[String] = Nil,
      numFiles: Int = 8): Unit = {
    require(!exists(tablePath), s"table already exists at $tablePath")
    val src = spark.read.parquet(sourceDir)
    val fields = src.schema.fieldNames.toSet
    val missing = ((keys :+ precombine) ++ tieBreak).filterNot(fields.contains)
    require(missing.isEmpty,
      s"source $sourceDir lacks required columns: ${missing.mkString(", ")}")
    val counts = src.agg(count(lit(1)), count_distinct(
      struct(keys.map(col): _*))).head()
    val (total, distinct) = (counts.getLong(0), counts.getLong(1))
    require(total == distinct,
      s"source $sourceDir carries ${total - distinct} duplicate key(s) — " +
        "a metadata-only bloom bootstrap serves files as-is and cannot " +
        "resolve them; onboard with a full-record bootstrap instead")
    // normalized to plain absolute paths (inputFiles yields file: URIs)
    // — the same shape indexRows records, so manifest, index and
    // candidate tagging all agree on file identity
    val files = src.inputFiles.toSeq
      .map(_.replaceFirst("^file:/+", "/")).sorted
    require(files.nonEmpty, s"source $sourceDir has no parquet files")
    Files.createDirectories(Paths.get(tablePath))
    val mBits = graft.functions.BloomAggregator.sizeFor(
      math.max(1L, (total + files.size - 1) / files.size))
    Files.writeString(propsPath(tablePath),
      s"keys=${keys.mkString(",")}\nprecombine=$precombine\n" +
        s"tieBreak=${tieBreak.mkString(",")}\nmBits=$mBits\nnumFiles=$numFiles\n",
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    val p = Props(keys, precombine, tieBreak, mBits, numFiles)
    writeSchema(tablePath, src)
    // the onboarding is COMMIT 1, like create: incremental_read('t', 0)
    // bootstraps the full table
    writeManifest(tablePath, files, 1L, "write",
      CdcLog.Action.Changes { () =>
        CdcLog.diff(src.limit(0), src, keys)
      })
    writeIndex(tablePath, indexRows(src, p), 0L)
  }

  /** Read the live table. Files are grouped by commit dir so commits
    * with evolved schemas union by name (schema-on-read, as elsewhere).
    */
  def read(spark: SparkSession, tablePath: String): DataFrame = {
    val files = manifest(tablePath)
    if (files.isEmpty) {
      require(exists(tablePath), s"no bloom table at $tablePath")
      // a delete can legitimately empty the whole table — serve the
      // zero-row snapshot at the recorded schema, not an error
      return emptySnapshot(spark, tablePath)
    }
    readFiles(spark, tablePath, files)
  }

  /** Read a set of table-relative files grouped BY COMMIT DIR with a
    * by-name union: a single flat `spark.read.parquet(all files)`
    * would take its schema from one footer and silently DROP columns
    * that only later commits carry — fatal on the merge path, where
    * the surviving rows get rewritten (schema-on-read, same contract
    * as `BucketTable.readBuckets`).
    */
  private def readFiles(spark: SparkSession, tablePath: String,
      rel: Seq[String]): DataFrame = {
    dataScans.increment()
    rel.groupBy(f => f.takeWhile(_ != '/'))
      .values.map(fs => spark.read.parquet(absFiles(tablePath, fs.toSeq): _*))
      .reduce(SchemaShim.unionByName)
  }

  /** Test seam: counts data-file scan constructions (readFiles, the
    * OCC staged read, the reconcile fold-in). The OCC spec brackets
    * the in-lock window with this to pin — timing-free — that the
    * critical section constructs NO data-file read; metadata reads
    * (manifest, index parquet) are deliberately not counted.
    */
  private[graft] val dataScans = new java.util.concurrent.atomic.LongAdder
  @volatile private[graft] var lastOccInLockDataScans: Long = -1L

  /** Index rows reconciled to the CURRENT manifest: rows for retired
    * files dropped; live files the index has not seen (a writer that
    * crashed between the manifest swap and the index swap) scanned and
    * folded in now. Correctness of candidate tagging therefore never
    * depends on the index being current — missing rows are healed
    * before they could cause a missed match.
    */
  private def reconcileIndex(spark: SparkSession, tablePath: String,
      p: Props): DataFrame = {
    val live = absFiles(tablePath, manifest(tablePath))
    val idx = filesIn(spark, readIndex(spark, tablePath), live, keep = true)
    val indexed = idx.select("file").collect().map(_.getString(0)).toSet
    val missing = live.filterNot(indexed)
    if (missing.isEmpty) idx
    else idx.unionByName(
      // the missing files may span commits whose schemas differ
      // (evolution, type widening); index rows have a fixed shape, so
      // compute per commit dir and union the RESULTS (indexRows needs
      // each group's own `_metadata.file_path`, which unions drop)
      missing.groupBy(f => f.substring(0, f.lastIndexOf('/'))).values
        .map { fs =>
          dataScans.increment()
          indexRows(spark.read.parquet(fs.toSeq.sorted: _*), p)
        }
        .reduce(_.unionByName(_)))
  }

  /** Relative paths of live files that MAY contain at least one key of
    * `batch` (range ∩ bloom tagging — Hudi's `tagLocation`). The probe
    * broadcasts the O(files) index and runs over the batch; survivors
    * come to the driver because the driver plans the merge's file list.
    */
  private def candidateFiles(tablePath: String, batch: DataFrame,
      idx: DataFrame, p: Props): Seq[String] = {
    withKeyHashes(batch, p.keys)
      .withColumn("__poss", expr(positions(p.mBits)))
      .select(col(p.keys.head).as("__k0"), col("__poss"))
      .join(broadcast(idx),
        col("__k0") >= col("key_min") && col("__k0") <= col("key_max"))
      .filter(expr(
        """forall(__poss, p ->
          | (element_at(bloom, CAST(p DIV 64 AS INT) + 1)
          |  & shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))) != 0)""".stripMargin))
      .select(col("file")).distinct()
      .collect().map(r => relFile(tablePath, r.getString(0))).toSeq.sorted
  }

  /** Bloom-routed upsert: tag the batch to candidate files, merge
    * against ONLY those, write the merged region as a new commit,
    * swing the manifest (old candidates out, new files in), then
    * refresh the index incrementally (retired rows dropped, new files
    * scanned — never the untouched ones). Returns the relative paths
    * of the files the batch actually rewrote (empty = pure append).
    */
  def upsertInto(spark: SparkSession, tablePath: String,
      incoming: DataFrame,
      validators: Seq[PreCommit.Rule] = Nil): Seq[String] =
    withTableLock(tablePath)(
      upsertIntoLocked(spark, tablePath, incoming, validators))

  /** Hudi's `insert_overwrite_table` (the replacecommit): the
    * precombine-deduped batch replaces the table — one fresh commit's
    * files become the entire manifest, and the range/bloom index is
    * rebuilt from exactly those files (tiny: O(new files) rows).
    * Previous commits' files are untouched until [[clean]]; O(batch)
    * written, zero old data read.
    */
  def overwriteTable(spark: SparkSession, tablePath: String,
      incoming: DataFrame,
      validators: Seq[PreCommit.Rule] = Nil): Seq[String] =
    withTableLock(tablePath) {
      val p = props(tablePath)
      val (batch, batchN) = Fuse.checkpointCounted(
        HudiLike.precombineLatest(incoming, p.keys, p.precombine, p.tieBreak))
      require(batchN > 0L,
        s"INSERT OVERWRITE with an empty batch at $tablePath — an empty " +
          "manifest would brick reads; DELETE the rows instead")
      PreCommit.validate(batch, validators)
      val commit = nextCommit(tablePath)
      val written = writeCommit(batch, tablePath, commit, p, p.numFiles)
      writeSchema(tablePath, batch)
      writeManifest(tablePath, written, commit, "overwrite",
        CdcLog.Action.Destructive)
      writeIndex(tablePath,
        indexRows(spark.read.parquet(absFiles(tablePath, written): _*), p),
        nextIndexVersion(tablePath))
      // bound secondary indexes are rebuilt from the replacement —
      // proportionate, the verb itself replaced the whole table
      // (createBloom re-binds and records each covered head itself)
      boundSecondaryIndexes(tablePath).foreach { case (secCols, idxPath) =>
        val numBuckets = BucketTable.props(idxPath).numBuckets
        FsUtil.deleteRecursively(Paths.get(idxPath))
        SecondaryIndex.createBloom(spark, tablePath, idxPath, secCols,
          numBuckets)
      }
      written
    }

  private def upsertIntoLocked(spark: SparkSession, tablePath: String,
      incoming: DataFrame, validators: Seq[PreCommit.Rule]): Seq[String] = {
    val p = props(tablePath)
    // the emptiness gate rides the batch checkpoint as an observed
    // count — no separate isEmpty job (guide §2.4)
    val (batch, batchN) = Fuse.checkpointCounted(
      HudiLike.precombineLatest(incoming, p.keys, p.precombine, p.tieBreak))
    if (batchN == 0L) return Seq.empty
    // gate BEFORE any tagging or write: a rejected batch leaves the
    // table byte-identical (PreCommit's contract)
    PreCommit.validate(batch, validators)
    // reconcile once, reuse for tagging AND as the base of the next
    // index version — a healed gap is persisted, not re-healed forever
    val idx = reconcileIndex(spark, tablePath, p).localCheckpoint()
    val touched = candidateFiles(tablePath, batch, idx, p)
    val commit = nextCommit(tablePath)
    val existing =
      if (touched.isEmpty) batch.limit(0)
      else readFiles(spark, tablePath, touched)
    val bound = boundSecondaryIndexes(tablePath)
    val merged = HudiLike.upsert(existing, batch, p.keys, p.precombine, p.tieBreak)
    // file budget for the rewritten region: keep the region's file
    // count (+1 when pure append) so file sizes stay level without a
    // table-wide count() job; compact() re-levels the whole table
    val written = writeCommit(merged, tablePath, commit, p,
      math.max(1, touched.size))
    val newManifest = (manifest(tablePath).toSet -- touched) ++ written
    writeSchema(tablePath, merged)
    // an upsert can only change the BATCH's keys: the region's other
    // rows are copied byte-equal into the new files and would diff to
    // filtered-out no-ops — restrict both diff sides to the batch keys
    // so the cdc join and the index reconcile aggregate O(batch) rows,
    // not O(region) (guide §2.3)
    def batchKeys = batch.select(p.keys.map(col): _*) // precombined: unique
    writeManifest(tablePath, newManifest.toSeq, commit, "write",
      CdcLog.Action.Changes { () =>
        CdcLog.diff(
          existing.join(broadcast(batchKeys), p.keys, "leftsemi"),
          readFiles(spark, tablePath, written)
            .join(broadcast(batchKeys), p.keys, "leftsemi"), p.keys)
      })
    val keptIdx = filesIn(spark, idx, absFiles(tablePath, touched),
      keep = false)
    writeIndex(tablePath,
      keptIdx.unionByName(
        indexRows(spark.read.parquet(absFiles(tablePath, written): _*), p)),
      nextIndexVersion(tablePath))
    maintainBound(spark, tablePath, bound,
      Some(existing.join(broadcast(batchKeys), p.keys, "leftsemi")),
      readFiles(spark, tablePath, written)
        .join(broadcast(batchKeys), p.keys, "leftsemi"), p, commit)
    touched
  }

  /** One FILE-level optimistic-concurrency attempt against the `m0`
    * manifest view — Hudi's file-group conflict detection applied to
    * the layout closest to vanilla Hudi CoW (the [[BucketTable]] OCC
    * design with the bucket set replaced by the candidate-file set).
    * Tag, merge and stage run OUTSIDE the lock; the short in-lock
    * window commits only if
    *   (a) every candidate file the merge read is STILL live (a
    *       concurrent commit re-pointing one means we merged against
    *       superseded content), and
    *   (b) no intervening commit ADDED a file that may contain one of
    *       our batch's keys (probed range∩bloom through the index — a
    *       false positive costs a spurious retry, never a wrong
    *       commit; a miss is impossible, the filter is only ever
    *       definite about ABSENCE). Without (b), two pure appends of
    *       the same key would both commit and leave two live versions.
    * Disjoint writers both commit even when fully overlapped in time;
    * a conflicted one gets None, its staged dir removed, the table
    * untouched. The staged dir deliberately does NOT match `c=\d+`
    * until the in-lock rename, so a crashed attempt's debris never
    * perturbs [[nextCommit]] (clean's debris sweep reclaims it).
    */
  private[graft] def attemptOccFrom(spark: SparkSession, tablePath: String,
      incoming: DataFrame, m0: Seq[String],
      validators: Seq[PreCommit.Rule] = Nil): Option[Seq[String]] = {
    val p = props(tablePath)
    val (batch, batchN) = Fuse.checkpointCounted(
      HudiLike.precombineLatest(incoming, p.keys, p.precombine, p.tieBreak))
    if (batchN == 0L) return Some(Seq.empty)
    PreCommit.validate(batch, validators)
    // tag against the m0 VIEW: live index rows restricted to m0's
    // files (an m0 file a concurrent commit already retired drops out
    // here — its rewritten content surfaces as ADDED files, which
    // check (b) probes)
    val idx = filesIn(spark, reconcileIndex(spark, tablePath, p),
      absFiles(tablePath, m0), keep = true).localCheckpoint()
    val touched = candidateFiles(tablePath, batch, idx, p)
    val existing =
      if (touched.isEmpty) batch.limit(0)
      else readFiles(spark, tablePath, touched)
    val bound = boundSecondaryIndexes(tablePath)
    val merged = HudiLike.upsert(existing, batch, p.keys, p.precombine,
      p.tieBreak)
    val staged = Paths.get(tablePath, s"_staged-occ${System.nanoTime()}")
    merged.repartitionByRange(math.max(1, touched.size), col(p.keys.head))
      .write.mode("errorifexists").parquet(staged.toString)
    // The staged files are IMMUTABLE from here: everything derivable
    // from them — the CDC row image and the per-file bloom/zone index
    // rows — is computed and MATERIALIZED before the lock, so the
    // critical section does no data-file I/O. At 100 TB the lock hold
    // must not scale with commit size; that is what OCC exists to
    // avoid, and Hudi's in-lock validation is likewise metadata-only.
    dataScans.increment()
    val stagedContent = spark.read.parquet(staged.toString)
    val cdcRows =
      if (CdcLog.enabled(tablePath))
        Some(CdcLog.diff(existing, stagedContent, p.keys).localCheckpoint())
      else None
    // index rows carry the staged paths; only the directory segment
    // changes at the in-lock rename, remapped there as a
    // one-row-per-file metadata transformation, never a re-scan
    val stagedIdx = indexRows(stagedContent, p).localCheckpoint()
    val stagedSeg = "/" + staged.getFileName.toString + "/"
    val outcome = FsLock.withTableLock(tablePath, FsLock.QueueWaitMs) {
      val scans0 = dataScans.sum()
      try {
        val m1 = manifest(tablePath)
        val removedSince = m0.toSet -- m1.toSet
        val addedSince = (m1.toSet -- m0.toSet).toSeq.sorted
        val readConflict = touched.exists(removedSince)
        lazy val addConflict = addedSince.nonEmpty && {
          val addedIdx = filesIn(spark, reconcileIndex(spark, tablePath, p),
            absFiles(tablePath, addedSince), keep = true)
          candidateFiles(tablePath, batch, addedIdx, p).nonEmpty
        }
        if (readConflict || addConflict) None
        else {
          val commit = nextCommit(tablePath)
          Files.move(staged, Paths.get(tablePath, s"c=$commit"),
            StandardCopyOption.ATOMIC_MOVE)
          val written = listCommitFiles(tablePath, commit)
          writeSchema(tablePath, merged)
          // reconcile BEFORE the manifest swing: against m1 every live
          // file is indexed, so the heal path (which would scan data
          // files) cannot trigger; after the swing it would "heal" the
          // just-written files we already have rows for in stagedIdx
          val keptIdx = filesIn(spark, reconcileIndex(spark, tablePath, p),
            absFiles(tablePath, touched), keep = false)
          writeManifest(tablePath,
            ((m1.toSet -- touched) ++ written).toSeq, commit, "write",
            CdcLog.Action.Changes { () =>
              cdcRows.getOrElse(
                // CDC flipped on between the pre-lock check and here —
                // the one (rare) case that still diffs in-lock
                CdcLog.diff(existing, readFiles(spark, tablePath, written),
                  p.keys))
            })
          writeIndex(tablePath,
            keptIdx.unionByName(stagedIdx.withColumn("file",
              regexp_replace(col("file"),
                java.util.regex.Pattern.quote(stagedSeg), s"/c=$commit/"))),
            nextIndexVersion(tablePath))
          Some((commit, written))
        }
      } finally lastOccInLockDataScans = dataScans.sum() - scans0
    }
    outcome match {
      case None =>
        FsUtil.deleteRecursively(staged)
        None
      case Some((commit, written)) =>
        maintainBound(spark, tablePath, bound, Some(existing),
          readFiles(spark, tablePath, written), p, commit)
        Some(written)
    }
  }

  /** Multi-writer upsert under optimistic concurrency control: only
    * writers whose batches tag into a COMMON candidate file (or whose
    * added files may hold a common key) contend; the loser re-merges
    * just its own batch against the fresh manifest and retries.
    * Concurrent front door — [[upsertInto]] stays the single-writer
    * serialized path.
    */
  def upsertIntoOcc(spark: SparkSession, tablePath: String,
      incoming: DataFrame, maxRetries: Int = 5): Seq[String] = {
    var attempt = 0
    while (attempt <= maxRetries) {
      attemptOccFrom(spark, tablePath, incoming, manifest(tablePath)) match {
        case Some(written) => return written
        case None => attempt += 1
      }
    }
    throw new java.util.ConcurrentModificationException(
      s"gave up after $maxRetries OCC retries at $tablePath — " +
        "another writer keeps re-pointing the touched files")
  }

  /** Row-level delete by key (Hudi's `delete` operation — the
    * reference's Hudi writer accepts it through the same upsert API,
    * `hoodie.datasource.write.operation=delete`): tag the keys to
    * candidate files exactly like an upsert, rewrite ONLY those files
    * minus the deleted keys, swing the manifest. Keys the bloom proves
    * absent cost nothing — no file read, no commit. Returns the
    * relative paths of the rewritten files.
    */
  def deleteFrom(spark: SparkSession, tablePath: String,
      keysToDelete: DataFrame): Seq[String] =
    withTableLock(tablePath)(deleteFromLocked(spark, tablePath, keysToDelete))

  private def deleteFromLocked(spark: SparkSession, tablePath: String,
      keysToDelete: DataFrame): Seq[String] = {
    val p = props(tablePath)
    val (keyRel, keyN) = Fuse.checkpointCounted(
      keysToDelete.select(p.keys.map(col): _*).distinct())
    if (keyN == 0L) return Seq.empty
    val idx = reconcileIndex(spark, tablePath, p).localCheckpoint()
    val touched = candidateFiles(tablePath, keyRel, idx, p)
    if (touched.isEmpty) return Seq.empty
    val existing = readFiles(spark, tablePath, touched)
    val bound = boundSecondaryIndexes(tablePath)
    val remaining = existing.join(keyRel, p.keys, "left_anti")
    val commit = nextCommit(tablePath)
    // the whole candidate region may empty out — then the commit is
    // pure retirement: no new files, just the manifest shrinking
    val written =
      if (remaining.isEmpty) Seq.empty
      else writeCommit(remaining, tablePath, commit, p, touched.size)
    writeSchema(tablePath, remaining)
    // a delete only changes the VICTIM keys: survivors are copied
    // byte-equal and would diff to no-ops — the before side restricts
    // to the victims (whose after side is by construction empty), so
    // the cdc join and the reconcile aggregate O(victims) rows, not
    // O(region) (guide §2.3)
    writeManifest(tablePath,
      ((manifest(tablePath).toSet -- touched) ++ written).toSeq,
      commit, "delete",
      CdcLog.Action.Changes { () =>
        val victims = existing.join(broadcast(keyRel), p.keys, "leftsemi")
        CdcLog.diff(victims, victims.limit(0), p.keys)
      })
    val keptIdx = filesIn(spark, idx, absFiles(tablePath, touched),
      keep = false)
    val nextIdx =
      if (written.isEmpty) keptIdx
      else keptIdx.unionByName(
        indexRows(spark.read.parquet(absFiles(tablePath, written): _*), p))
    writeIndex(tablePath, nextIdx, nextIndexVersion(tablePath))
    maintainBound(spark, tablePath, bound,
      Some(existing.join(broadcast(keyRel), p.keys, "leftsemi")),
      existing.limit(0), p, commit)
    touched
  }

  /** Rewrite the candidate region `keyRows`' keys tag to (range ∩
    * bloom, exactly like an upsert) through `transform` — the
    * conditional-MERGE route for bloom-layout tables: the transform
    * sees the candidate files' full current rows and returns their
    * replacement, which may also carry NEW keys (inserted rows land in
    * the rewritten region's fresh files). Keys the bloom proves absent
    * cost nothing on the read side. Returns the relative paths of the
    * files rewritten.
    */
  def rewriteKeys(spark: SparkSession, tablePath: String,
      keyRows: DataFrame)(transform: DataFrame => DataFrame): Seq[String] =
    withTableLock(tablePath)(
      rewriteKeysLocked(spark, tablePath, keyRows, transform))

  private def rewriteKeysLocked(spark: SparkSession, tablePath: String,
      keyRows: DataFrame, transform: DataFrame => DataFrame): Seq[String] = {
    val p = props(tablePath)
    val (keyRel, keyN) = Fuse.checkpointCounted(
      keyRows.select(p.keys.map(col): _*).distinct())
    if (keyN == 0L) Seq.empty
    else {
      val idx = reconcileIndex(spark, tablePath, p).localCheckpoint()
      val touched = candidateFiles(tablePath, keyRel, idx, p)
      val existing =
        if (touched.isEmpty) read(spark, tablePath).limit(0)
        else readFiles(spark, tablePath, touched)
      val bound = boundSecondaryIndexes(tablePath)
      val (next, nextN) = Fuse.checkpointCounted(transform(existing))
      val commit = nextCommit(tablePath)
      val written =
        if (nextN == 0L) Seq.empty
        else writeCommit(next, tablePath, commit, p, math.max(1, touched.size))
      writeManifest(tablePath,
        ((manifest(tablePath).toSet -- touched) ++ written).toSeq,
        commit, "rewrite",
        CdcLog.Action.Changes { () =>
          val after =
            if (written.isEmpty) existing.limit(0)
            else readFiles(spark, tablePath, written)
          CdcLog.diff(existing, after, p.keys)
        })
      val keptIdx = filesIn(spark, idx, absFiles(tablePath, touched),
        keep = false)
      val nextIdx =
        if (written.isEmpty) keptIdx
        else keptIdx.unionByName(
          indexRows(spark.read.parquet(absFiles(tablePath, written): _*), p))
      writeIndex(tablePath, nextIdx, nextIndexVersion(tablePath))
      maintainBound(spark, tablePath, bound, Some(existing), next, p, commit)
      touched
    }
  }

  /** Targeted rewrite of the rows a predicate selects: ONE
    * column-pruned discovery scan (predicate columns + file
    * provenance) finds the files holding matching rows; ONLY those
    * files are read in full, pushed through `transform`, and rewritten
    * as a new commit — the SQL UPDATE/DELETE route for bloom-layout
    * tables. Files the predicate provably misses are never read twice
    * nor written. Returns the relative paths of the rewritten files.
    */
  def rewriteWhere(spark: SparkSession, tablePath: String,
      pred: Column)(transform: DataFrame => DataFrame): Seq[String] =
    withTableLock(tablePath)(rewriteWhereLocked(spark, tablePath, pred,
      transform))

  private def rewriteWhereLocked(spark: SparkSession, tablePath: String,
      pred: Column, transform: DataFrame => DataFrame): Seq[String] = {
    val p = props(tablePath)
    val live = manifest(tablePath)
    if (live.isEmpty) return Seq.empty
    // reconcile against the PRE-rewrite manifest, reused for the index
    // update below (same shape as the delete path)
    val idx = reconcileIndex(spark, tablePath, p).localCheckpoint()
    val touched = live.groupBy(_.takeWhile(_ != '/')).values.map { fs =>
      spark.read.parquet(absFiles(tablePath, fs.toSeq): _*)
        .withColumn("__fp",
          regexp_replace(col("_metadata.file_path"), "^file:/+", "/"))
    }.reduce(SchemaShim.unionByName)
      .filter(pred).select("__fp").distinct()
      .collect().map(r => relFile(tablePath, r.getString(0))).toSeq.sorted
    if (touched.isEmpty) return Seq.empty
    val bound = boundSecondaryIndexes(tablePath)
    val (next, nextN) = Fuse.checkpointCounted(
      transform(readFiles(spark, tablePath, touched)))
    val commit = nextCommit(tablePath)
    val written =
      if (nextN == 0L) Seq.empty
      else writeCommit(next, tablePath, commit, p, touched.size)
    writeSchema(tablePath, next)
    writeManifest(tablePath,
      ((live.toSet -- touched) ++ written).toSeq, commit, "rewrite",
      CdcLog.Action.Changes { () =>
        val before = readFiles(spark, tablePath, touched)
        val after =
          if (written.isEmpty) before.limit(0)
          else readFiles(spark, tablePath, written)
        CdcLog.diff(before, after, p.keys)
      })
    val keptIdx = filesIn(spark, idx, absFiles(tablePath, touched),
      keep = false)
    val nextIdx =
      if (written.isEmpty) keptIdx
      else keptIdx.unionByName(
        indexRows(spark.read.parquet(absFiles(tablePath, written): _*), p))
    writeIndex(tablePath, nextIdx, nextIndexVersion(tablePath))
    maintainBound(spark, tablePath, bound,
      Some(readFiles(spark, tablePath, touched)), next, p, commit)
    touched
  }

  /** Multi-key point lookup: tag ALL requested keys to their candidate
    * files in one index probe, read only those files, semi-join back to
    * the requested keys — O(candidate files), never the table (the
    * [[SecondaryIndex]] second hop and the reconcile pre-probe).
    */
  def lookupMany(spark: SparkSession, tablePath: String,
      keyRows: DataFrame): DataFrame = {
    val p = props(tablePath)
    val wanted = keyRows.select(p.keys.map(col): _*).distinct()
      .localCheckpoint()
    val candidates = candidateFiles(tablePath, wanted,
      reconcileIndex(spark, tablePath, p), p)
    if (candidates.isEmpty) read(spark, tablePath).limit(0)
    else readFiles(spark, tablePath, candidates)
      .join(broadcast(wanted), p.keys, "left_semi")
  }

  // ---- bound secondary index (see SecondaryIndex.createBloom) --------

  private def secIdxPath(tablePath: String): Path =
    Paths.get(tablePath, "_secidx")

  /** The bound mapping indexes: (secondary cols, index path) per
    * index — a table may bind several, one per query pattern.
    * Engine-level (a table-dir file), so every mutation primitive
    * maintains them, programmatic writers included (the discipline
    * shared by every layout's secondary-index binding).
    */
  def boundSecondaryIndexes(tablePath: String): Seq[(Seq[String], String)] =
    SecondaryIndex.readBindings(secIdxPath(tablePath))

  def boundSecondaryIndex(tablePath: String): Option[(Seq[String], String)] =
    boundSecondaryIndexes(tablePath).headOption

  def bindSecondaryIndex(tablePath: String, secCols: Seq[String],
      indexPath: String): Unit =
    SecondaryIndex.addBinding(secIdxPath(tablePath), secCols, indexPath)

  /** Unbind every index (test/repair helper). */
  def unbindSecondaryIndex(tablePath: String): Unit = {
    Files.deleteIfExists(secIdxPath(tablePath))
    ()
  }

  /** Unbind one index by its artifact path (DROP INDEX). */
  def unbindSecondaryIndex(tablePath: String, indexPath: String): Unit =
    SecondaryIndex.removeBinding(secIdxPath(tablePath), indexPath)

  /** Reconcile every bound index from the SAME pre/post row states of
    * a commit's touched region (a superset of what changed — except()
    * drops the unchanged mappings), then record the commit covered.
    * Runs after the manifest swing; the crash window is caught by the
    * covered-head serve check ([[SecondaryIndex.ensureCurrent]]).
    */
  private def maintainBound(spark: SparkSession, tablePath: String,
      bound: Seq[(Seq[String], String)], pre: Option[DataFrame],
      post: => DataFrame, p: Props, commitNo: Long): Unit =
    for (preDf <- pre if bound.nonEmpty) {
      // sideDiff consumes post once per index — materialize it only
      // when SEVERAL indexes would each re-evaluate the probe
      val postC = if (bound.sizeIs > 1) post.localCheckpoint() else post
      for ((secCols, idxPath) <- bound)
        SecondaryIndex.withMaintLock(idxPath) {
          val mapCols = (secCols ++ p.keys).map(col)
          SecondaryIndex.reconcile(spark, idxPath,
            preDf.select(mapCols: _*), postC.select(mapCols: _*))
          SecondaryIndex.markCoveredLocked(idxPath, commitNo)
        }
    }

  /** Point lookup by full key: probe the index, read only candidate
    * files (usually one: ranges are non-overlapping per commit and the
    * bloom kills false range matches across commits), filter exact.
    */
  def lookup(spark: SparkSession, tablePath: String,
      keyValues: Seq[Any]): DataFrame = {
    val p = props(tablePath)
    require(keyValues.length == p.keys.length,
      s"expected ${p.keys.length} key values (${p.keys.mkString(",")})")
    val schema = read(spark, tablePath).schema
    val probe = p.keys.zip(keyValues).foldLeft(spark.range(1).toDF()) {
      case (df, (k, v)) => df.withColumn(k, lit(v).cast(schema(k).dataType))
    }
    val candidates = candidateFiles(tablePath, probe,
      reconcileIndex(spark, tablePath, p), p)
    if (candidates.isEmpty)
      return read(spark, tablePath).limit(0)
    // candidates may span commits whose schemas differ (evolution,
    // type widening) — group per commit dir like every other read
    val base = readFiles(spark, tablePath, candidates)
    p.keys.zip(keyValues).foldLeft(base) { case (df, (k, v)) =>
      df.filter(col(k) === lit(v).cast(schema(k).dataType))
    }
  }

  /** Rewrite the whole table key-range clustered at `numFiles` fresh
    * files in one commit — re-levels file sizes after append drift and
    * restores globally non-overlapping ranges (Hudi clustering).
    */
  def compact(spark: SparkSession, tablePath: String): Long =
    withTableLock(tablePath)(compactLocked(spark, tablePath))

  private def compactLocked(spark: SparkSession, tablePath: String): Long = {
    val p = props(tablePath)
    if (manifest(tablePath).isEmpty) {
      // an emptied table has nothing to re-level — no-op, no commit
      require(exists(tablePath), s"no bloom table at $tablePath")
      return -1L
    }
    val commit = nextCommit(tablePath)
    val written = writeCommit(read(spark, tablePath), tablePath, commit, p,
      p.numFiles)
    writeManifest(tablePath, written, commit, "cluster",
      CdcLog.Action.Preserving)
    writeIndex(tablePath,
      indexRows(spark.read.parquet(absFiles(tablePath, written): _*), p),
      nextIndexVersion(tablePath))
    // content-preserving commit: mappings unchanged, head advances
    boundSecondaryIndexes(tablePath).foreach { case (_, idxPath) =>
      SecondaryIndex.markCovered(idxPath, commit)
    }
    commit
  }

  /** The CURRENT data files (manifest-resolved, absolute) — the file
    * list a [[StatsIndex]] over the table must index.
    */
  def liveFiles(tablePath: String): Seq[String] =
    absFiles(tablePath, manifest(tablePath)).sorted

  /** Sort-clustering replacecommit for the bloom layout: rewrite the
    * live table into files RANGE-PARTITIONED by `sortCols` (instead of
    * [[writeCommit]]'s key ranges), rebuild the file index over the new
    * commit, swing the manifest. Key-range tagging across the new files
    * degrades (every file may span the key domain) but the bloom
    * filters keep point tagging exact; what the trade buys is that a
    * column-stats index over the table prunes `sortCols` range
    * predicates to a few files — Hudi's clustering trade precisely.
    * Old commits stay readable until [[clean]]. Returns the commit id.
    */
  def cluster(spark: SparkSession, tablePath: String, sortCols: Seq[String],
      targetFileRows: Long = 4000000L): Long =
    withTableLock(tablePath) {
      require(sortCols.nonEmpty, "at least one clustering sort column")
      val p = props(tablePath)
      val data = read(spark, tablePath)
      val rows = data.count()
      val files = math.max(p.numFiles.toLong,
        (rows + targetFileRows - 1) / targetFileRows).toInt
      val commit = nextCommit(tablePath)
      data.repartitionByRange(files, sortCols.map(col): _*)
        .sortWithinPartitions(sortCols.map(col): _*)
        .write.mode("errorifexists").parquet(s"$tablePath/c=$commit")
      val written = listCommitFiles(tablePath, commit)
      writeManifest(tablePath, written, commit, "cluster",
        CdcLog.Action.Preserving)
      writeIndex(tablePath,
        indexRows(spark.read.parquet(absFiles(tablePath, written): _*), p),
        nextIndexVersion(tablePath))
      boundSecondaryIndexes(tablePath).foreach { case (_, idxPath) =>
        SecondaryIndex.markCovered(idxPath, commit)
      }
      commit
    }

  /** Inline compaction trigger (Hudi's
    * `hoodie.compact.inline.max.delta.commits` analog, applied to
    * file-count drift): every pure-append trickle commit adds a file,
    * and past a few multiples of `numFiles` the manifest's small-file
    * spread degrades both candidate tagging (more ranges overlap) and
    * read fan-in. Call after upserts; compacts when the live file
    * count exceeds `maxLiveFiles` (default 3× the layout target) and
    * returns the new commit id when it did.
    */
  def maybeCompact(spark: SparkSession, tablePath: String,
      maxLiveFiles: Int = -1): Option[Long] = {
    val limit =
      if (maxLiveFiles > 0) maxLiveFiles else 3 * props(tablePath).numFiles
    if (manifest(tablePath).size <= limit) None
    else Some(compact(spark, tablePath))
  }

  /** Remove data files no longer in the manifest and index versions
    * before the latest. `keepVersions > 0` additionally retains every
    * file the newest `keepVersions` commits' snapshots reference
    * (Hudi's KEEP_LATEST_COMMITS cleaner policy) — `VERSION AS OF` is
    * then GUARANTEED within the retention window, loud outside it.
    * Returns removed paths (table-relative).
    */
  // ---- savepoints (Hudi's savepoint/restore on the bloom layout) -----

  private val SavepointPrefix = "_savepoint_"

  private def savepointPath(tablePath: String, name: String): Path = {
    require(name.matches("[A-Za-z0-9_-]+"), s"invalid savepoint name: $name")
    Paths.get(tablePath, SavepointPrefix + name)
  }

  /** Pin the CURRENT committed state under `name`: a copy of the
    * manifest's file list that [[clean]] treats as live, so later
    * upserts/deletes/clusterings can never reclaim the files this
    * state reads from — the [[BucketTable.savepoint]] design applied
    * to a file manifest instead of a bucket→generation map.
    * O(manifest) metadata, no data copied.
    */
  def savepoint(tablePath: String, name: String): Unit = {
    val p = savepointPath(tablePath, name)
    require(!Files.exists(p), s"savepoint $name already exists")
    val m = manifest(tablePath)
    require(m.nonEmpty, s"no committed state to savepoint at $tablePath")
    val tmp = Paths.get(tablePath, s"${SavepointPrefix}.tmp${System.nanoTime()}")
    Files.writeString(tmp, m.mkString("", "\n", "\n"),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE)
    ()
  }

  /** Savepoint names currently pinned. */
  def savepoints(tablePath: String): Seq[String] = {
    val s = Files.list(Paths.get(tablePath))
    try s.iterator().asScala.map(_.getFileName.toString)
      .filter(n => n.startsWith(SavepointPrefix) &&
        n.drop(SavepointPrefix.length).matches("[A-Za-z0-9_-]+"))
      .map(_.drop(SavepointPrefix.length)).toSeq.sorted
    finally s.close()
  }

  private def savepointFiles(tablePath: String, name: String): Seq[String] = {
    val p = savepointPath(tablePath, name)
    require(Files.exists(p), s"no savepoint $name at $tablePath")
    Files.readAllLines(p).asScala.filter(_.nonEmpty).toSeq
  }

  /** Read the table AS OF a savepoint — time travel to the pinned file
    * set, without touching the live manifest. Loud if any pinned file
    * vanished (only possible by external deletion — [[clean]] treats
    * pinned files as live).
    */
  def readSavepoint(spark: SparkSession, tablePath: String,
      name: String): DataFrame = {
    val files = savepointFiles(tablePath, name)
    val missing = files.filterNot(entryExists(tablePath, _))
    require(missing.isEmpty,
      s"savepoint $name at $tablePath: pinned file(s) " +
        s"${missing.mkString(",")} are gone — the savepoint no longer " +
        "resolves")
    readFiles(spark, tablePath, files)
  }

  /** Roll the table BACK to a savepoint: one manifest swing to the
    * pinned file list (Hudi's restore), logged as its own `restore`
    * commit — destructive for the incremental feed (rows may vanish
    * with no per-file ADD to express it), so [[changedSince]] windows
    * spanning it fail loudly toward a re-sync and the cdc floor
    * ratchets. The filter index is rebuilt over the restored set (the
    * current index version describes the superseded live set).
    * Commits after the savepoint become unreferenced debris for
    * [[clean]].
    */
  def restoreSavepoint(spark: SparkSession, tablePath: String,
      name: String): Unit = {
    // same contract as BucketTable.restoreSavepoint: a restore has no
    // per-row diff to reconcile a bound mapping index by — refuse
    // loudly rather than leave the index diverged
    require(boundSecondaryIndexes(tablePath).isEmpty,
      s"restore at $tablePath with a bound secondary index would leave " +
        "the index diverged — DROP INDEX first, restore, then re-create")
    val files = savepointFiles(tablePath, name)
    val missing = files.filterNot(entryExists(tablePath, _))
    require(missing.isEmpty,
      s"restore to $name at $tablePath: pinned file(s) " +
        s"${missing.mkString(",")} are gone — the savepoint no longer " +
        "resolves")
    withTableLock(tablePath) {
      val commit = nextCommit(tablePath)
      writeManifest(tablePath, files, commit, "restore",
        CdcLog.Action.Destructive)
      writeIndex(tablePath,
        indexRows(readFiles(spark, tablePath, files), props(tablePath)),
        nextIndexVersion(tablePath))
    }
  }

  /** Unpin a savepoint; its files become reclaimable by [[clean]]
    * unless still referenced by the live manifest or another savepoint.
    */
  def dropSavepoint(tablePath: String, name: String): Unit = {
    Files.deleteIfExists(savepointPath(tablePath, name))
    ()
  }

  def clean(tablePath: String, keepVersions: Int = 0): Seq[String] = {
    val head = latestCommit(tablePath)
    val retained: Set[String] =
      if (keepVersions <= 0) Set.empty
      else {
        require(head >= 1,
          s"clean($tablePath, keepVersions=$keepVersions): no commit " +
            "log (table predates commit logging) — retention needs " +
            "logged history")
        (math.max(1L, head - keepVersions + 1) to head)
          .flatMap(manifestAsOf(tablePath, _)).toSet
      }
    // savepoint-pinned files count as live — the pin IS the contract
    val pinned = savepoints(tablePath)
      .flatMap(savepointFiles(tablePath, _)).toSet
    val live = manifest(tablePath).toSet ++ retained ++ pinned
    val base = Paths.get(tablePath)
    def listDir(p: Path): Seq[Path] = {
      val s = Files.list(p)
      try s.iterator().asScala.toSeq finally s.close()
    }
    val removedData = listDir(base)
      .filter(_.getFileName.toString.matches("c=\\d+"))
      .flatMap { cdir =>
        val parts = listDir(cdir)
          .filter(_.getFileName.toString.endsWith(".parquet"))
        val (liveParts, deadParts) =
          parts.partition(f => live(s"${cdir.getFileName}/${f.getFileName}"))
        val gone = deadParts.map { f =>
          val rel = s"${cdir.getFileName}/${f.getFileName}"
          Files.delete(f); rel
        }
        // no live parquet left → the whole commit dir (markers and
        // all) is debris
        if (liveParts.isEmpty) {
          FsUtil.deleteRecursively(cdir)
          gone :+ s"${cdir.getFileName}"
        } else gone
      }
    val keep = currentIndexVersion(tablePath)
    val idxDir = Paths.get(tablePath, "_index")
    val removedIdx = {
      val s = Files.list(idxDir)
      try s.iterator().asScala
        .filter { d => val n = d.getFileName.toString
          n.startsWith("v=") && n.drop(2).toLong < keep }
        .map { d =>
          FsUtil.deleteRecursively(d)
          s"_index/${d.getFileName}"
        }.toSeq
      finally s.close()
    }
    // crashed OCC attempts' staged dirs (never referenced by any
    // manifest — the in-lock rename is what publishes them).
    // AGE-GATED: an in-flight writer sits between its stage write and
    // its in-lock ATOMIC_MOVE for at most the lock-acquire window, so
    // only dirs older than [[FsLock.LockExpiryMs]] are provably
    // crashed debris — sweeping younger ones would yank a live
    // writer's staged snapshot out from under its rename.
    val stagedCutoffMs = System.currentTimeMillis() - FsLock.LockExpiryMs
    val removedStaged = listDir(base)
      .filter(_.getFileName.toString.startsWith("_staged-occ"))
      .filter(d => Files.getLastModifiedTime(d).toMillis < stagedCutoffMs)
      .map { d => FsUtil.deleteRecursively(d); d.getFileName.toString }
    removedData ++ removedIdx ++ removedStaged
  }
}
