package graft.etl

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Properties}

/** Differential property for the CDC surface: for ANY random sequence
  * of upserts, tombstone deletes, AND COMPACTIONS — on BOTH log-backed
  * layouts (MOR and partitioned) — a consumer that checkpointed a
  * snapshot mid-history and then applies the `CALL table_changes`
  * feed (latest-per-key by precombine then commit seq, tombstones
  * removing) must either reconstruct the live snapshot EXACTLY or be
  * refused LOUDLY (only when a compaction genuinely folded its unseen
  * window — and then the demanded re-sync cursor must be servable).
  * This is the contract an incremental downstream pipeline actually
  * relies on — row-identical reconstruction, never a silently
  * renumbered feed — and it exercises the normalized cross-layout
  * feed columns (change_seq / deleted) end to end through the SQL
  * front door.
  */
object CdcReplayProps extends Properties("CdcReplay") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(
      sys.env.get("SPARK_GRAFT_STRESS").map(_ => 15).getOrElse(5))

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private sealed trait Op
  private case class Up(keys: List[Long]) extends Op
  private case class Del(keys: List[Long]) extends Op
  private case object Compact extends Op

  private val op: Gen[Op] = Gen.frequency(
    3 -> Gen.nonEmptyListOf(Gen.chooseNum(0L, 12L)).map(ks => Up(ks.distinct)),
    1 -> Gen.nonEmptyListOf(Gen.chooseNum(0L, 12L)).map(ks => Del(ks.distinct)),
    1 -> Gen.const(Compact))

  private val scenario: Gen[(List[Long], List[Op], List[Op])] = for {
    first <- Gen.nonEmptyListOf(Gen.chooseNum(0L, 12L)).map(_.distinct)
    before <- Gen.listOfN(3, op) // ops the consumer has already seen
    after <- Gen.choose(1, 4).flatMap(Gen.listOfN(_, op)) // the catch-up window
  } yield (first, before, after)

  private var run = 0

  property("snapshot(checkpoint) + table_changes feed == snapshot(now)") =
    Prop.forAllNoShrink(scenario) { case (first, before, after) =>
      run += 1
      val table = s"cdc_replay_$run"
      val path = java.nio.file.Files
        .createTempDirectory("cdcreplay").toString + "/t"
      var pc = 0L
      def rows(ks: Seq[Long]) = {
        pc += 1
        ks.map(k => (k, pc, (pc * 100 + k).toDouble)).toDF("k", "pc", "v")
      }
      def apply(o: Op): Unit = o match {
        case Up(ks) => MorTable.upsertInto(path, rows(ks)); ()
        case Del(ks) =>
          pc += 1
          MorTable.deleteFrom(path,
            ks.map(k => (k, pc)).toDF("k", "pc"))
          ()
        case Compact => MorTable.compact(spark, path); ()
      }
      MorTable.create(rows(first), path, keys = Seq("k"), precombine = "pc")
      Catalog.registerLayoutTable(spark, table, "mor", path)
      before.foreach(apply)
      // the consumer's checkpoint: snapshot + the change head it has
      // seen (GLOBAL seq — compactions anywhere in `before` must not
      // perturb it; `state._2` would alias, which is the exact bug the
      // monotonic head fixes)
      val checkpointSeq = MorTable.changeHead(path)
      val snap0 = MorTable.readSnapshot(spark, path)
        .as[(Long, Long, Double)].collect().toSeq
      after.foreach(apply)
      val snap1 = MorTable.readSnapshot(spark, path)
        .as[(Long, Long, Double)].collect().toSeq.sortBy(_._1)
      // versions and cursors share the change-seq domain: VERSION AS OF
      // the checkpoint must BE the checkpointed snapshot — even when a
      // later compaction folded the feed window (history, not the log,
      // resolves it; only clean retires history)
      val atCursor = MorTable.readVersion(spark, path, checkpointSeq)
        .as[(Long, Long, Double)].collect().toSeq
      val asOfOk = Prop(atCursor.sortBy(_._1) == snap0.sortBy(_._1)) :|
        s"readVersion($checkpointSeq) ${atCursor.sortBy(_._1)} != " +
          s"checkpointed snapshot ${snap0.sortBy(_._1)}"
      // catch up through the SQL front door and replay onto snap0:
      // latest per key by (pc, change_seq), tombstones removing. A
      // compaction in the catch-up window may have FOLDED part of it —
      // then the pull must fail LOUDLY toward a re-sync (and only
      // then), never serve a renumbered feed
      try {
        val feed = SqlCall.exec(spark,
          s"CALL table_changes('$table', $checkpointSeq)")
          .select($"k", $"pc", $"v", $"change_seq", $"deleted")
          .as[(Long, Long, Option[Double], Long, Boolean)].collect().toSeq
        val replayed = (snap0.map(r => (r._1, r._2, Option(r._3), 0L, false))
          ++ feed)
          .groupBy(_._1).values.map(_.maxBy(r => (r._2, r._4)))
          .filterNot(_._5)
          .map(r => (r._1, r._2, r._3.getOrElse(Double.NaN)))
          .toSeq.sortBy(_._1)
        asOfOk && (Prop(replayed == snap1) :|
          s"checkpoint=$checkpointSeq\n  replayed $replayed\n  snapshot $snap1")
      } catch {
        case e: IllegalArgumentException if e.getMessage.contains("re-sync") =>
          // the refusal is legitimate ONLY when a compaction (or
          // overwrite) actually folded commits past the checkpoint;
          // after the demanded re-sync the new cursor must be servable
          val floor = MorTable.compactedThrough(path)
          val resynced = SqlCall.exec(spark,
            s"CALL table_changes('$table', ${MorTable.changeHead(path)})")
          asOfOk && (Prop(floor > checkpointSeq && resynced.count() == 0L) :|
            s"loud re-sync with floor=$floor <= checkpoint=$checkpointSeq")
      }
    }

  /** The partitioned layout's twin: same random histories (keys pin
    * their partition, so identity ≡ key), same replay contract, same
    * loud-or-exact dichotomy across [[PartitionedTable.compactDeltas]]
    * — the feed flows through the OTHER delta-log implementation
    * (per-slice dgen dirs, `_dfloor` ratchet) and the SAME
    * `table_changes` front door.
    */
  property("partitioned: snapshot(checkpoint) + table_changes feed == snapshot(now)") =
    Prop.forAllNoShrink(scenario) { case (first, before, after) =>
      run += 1
      val table = s"cdc_replay_part_$run"
      val path = java.nio.file.Files
        .createTempDirectory("cdcreplayp").toString + "/t"
      var pc = 0L
      def rows(ks: Seq[Long]) = {
        pc += 1
        ks.map(k => (s"d${k % 3}", k, pc, (pc * 100 + k).toDouble))
          .toDF("day", "k", "pc", "v")
      }
      def apply(o: Op): Unit = o match {
        case Up(ks) => PartitionedTable.upsertDelta(spark, path, rows(ks)); ()
        case Del(ks) =>
          pc += 1
          PartitionedTable.deleteDelta(spark, path,
            ks.map(k => (s"d${k % 3}", k, pc)).toDF("day", "k", "pc"))
          ()
        case Compact => PartitionedTable.compactDeltas(spark, path); ()
      }
      PartitionedTable.create(rows(first), path,
        keys = Seq("k"), precombine = "pc", partitionCols = Seq("day"))
      Catalog.registerLayoutTable(spark, table, "partitioned", path)
      before.foreach(apply)
      val checkpointSeq = PartitionedTable.changeHead(path)
      val snap0 = PartitionedTable.read(spark, path)
        .select($"k", $"pc", $"v")
        .as[(Long, Long, Double)].collect().toSeq
      after.foreach(apply)
      val snap1 = PartitionedTable.read(spark, path)
        .select($"k", $"pc", $"v")
        .as[(Long, Long, Double)].collect().toSeq.sortBy(_._1)
      try {
        val feed = SqlCall.exec(spark,
          s"CALL table_changes('$table', $checkpointSeq)")
          .select($"k", $"pc", $"v", $"change_seq", $"deleted")
          .as[(Long, Long, Option[Double], Long, Boolean)].collect().toSeq
        val replayed = (snap0.map(r => (r._1, r._2, Option(r._3), 0L, false))
          ++ feed)
          .groupBy(_._1).values.map(_.maxBy(r => (r._2, r._4)))
          .filterNot(_._5)
          .map(r => (r._1, r._2, r._3.getOrElse(Double.NaN)))
          .toSeq.sortBy(_._1)
        Prop(replayed == snap1) :|
          s"checkpoint=$checkpointSeq\n  replayed $replayed\n  snapshot $snap1"
      } catch {
        case e: IllegalArgumentException if e.getMessage.contains("re-sync") =>
          val floor = PartitionedTable.compactedThrough(path)
          val resynced = SqlCall.exec(spark,
            s"CALL table_changes('$table', ${PartitionedTable.changeHead(path)})")
          Prop(floor > checkpointSeq && resynced.count() == 0L) :|
            s"loud re-sync with floor=$floor <= checkpoint=$checkpointSeq"
      }
    }

  /** Fold a cdc-image feed over the checkpoint state, asserting at
    * EVERY image that its before side equals the folded state of that
    * key (None for an insert) — the before-image contract under
    * arbitrary histories — and that the final folded state is the live
    * snapshot. Image feeds survive compaction (images live outside the
    * delta log), so unlike the post-image feeds above there is no
    * legitimate refusal in these histories (no destructive ops).
    */
  private def checkImageFold(
      feed: Seq[(Long, String, Long, Option[Long], Option[Double],
        Option[Long], Option[Double])],
      snap0: Map[Long, (Long, Double)],
      snap1: Seq[(Long, Long, Double)]): Prop = {
    var state = snap0
    val bad = scala.collection.mutable.ArrayBuffer[String]()
    feed.sortBy(_._3).foreach { case (k, op, seq, bpc, bv, apc, av) =>
      val cur = state.get(k)
      op match {
        case "i" =>
          if (cur.nonEmpty || bpc.nonEmpty || bv.nonEmpty)
            bad += s"i@$seq k=$k cur=$cur before=($bpc,$bv)"
          state += k -> ((apc.get, av.get))
        case "u" =>
          if (!cur.contains((bpc.getOrElse(-1L), bv.getOrElse(Double.NaN))))
            bad += s"u@$seq k=$k cur=$cur before=($bpc,$bv)"
          state += k -> ((apc.get, av.get))
        case "d" =>
          if (!cur.contains((bpc.getOrElse(-1L), bv.getOrElse(Double.NaN))))
            bad += s"d@$seq k=$k cur=$cur before=($bpc,$bv)"
          if (apc.nonEmpty || av.nonEmpty) bad += s"d@$seq k=$k after nonnull"
          state -= k
        case other => bad += s"op '$other'@$seq k=$k"
      }
    }
    val folded = state.toSeq.map { case (k, (p, v)) => (k, p, v) }.sortBy(_._1)
    Prop(bad.isEmpty && folded == snap1) :|
      s"violations=${bad.mkString("; ")}\n  folded $folded\n  snapshot $snap1"
  }

  private val imageCols = Seq("k", "_op", "_change_seq",
    "_before_pc", "_before_v", "_after_pc", "_after_v")

  /** MOR cdc-image arm: before/after images under random
    * upsert/delete/compact histories — images must chain exactly
    * (every before equals the folded prior state) and the fold must
    * land on the live snapshot, including windows that STRADDLE a
    * compaction (where the post-image feed above goes loud).
    */
  property("mor cdc images: befores chain, fold == snapshot") =
    Prop.forAllNoShrink(scenario) { case (first, before, after) =>
      run += 1
      val path = java.nio.file.Files
        .createTempDirectory("cdcimg").toString + "/t"
      var pc = 0L
      def rows(ks: Seq[Long]) = {
        pc += 1
        ks.map(k => (k, pc, (pc * 100 + k).toDouble)).toDF("k", "pc", "v")
      }
      def apply(o: Op): Unit = o match {
        case Up(ks) => MorTable.upsertInto(path, rows(ks)); ()
        case Del(ks) =>
          pc += 1
          MorTable.deleteFrom(path, ks.map(k => (k, pc)).toDF("k", "pc"))
          ()
        case Compact => MorTable.compact(spark, path); ()
      }
      MorTable.create(rows(first), path,
        keys = Seq("k"), precombine = "pc", cdc = true)
      before.foreach(apply)
      val checkpointSeq = MorTable.changeHead(path)
      val snap0 = MorTable.readSnapshot(spark, path)
        .as[(Long, Long, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      after.foreach(apply)
      val snap1 = MorTable.readSnapshot(spark, path)
        .as[(Long, Long, Double)].collect().toSeq.sortBy(_._1)
      val feed = MorTable.changesCdc(spark, path, checkpointSeq)
        .select(imageCols.head, imageCols.tail: _*)
        .as[(Long, String, Long, Option[Long], Option[Double],
          Option[Long], Option[Double])].collect().toSeq
      checkImageFold(feed, snap0, snap1)
    }

  /** Bucket cdc-image arm: same contract through the OTHER image
    * writer (commit-time key-diff on a CoW layout, staged inside the
    * manifest swing) — with content-preserving compactions in the
    * history contributing zero image rows.
    */
  property("bucket cdc images: befores chain, fold == snapshot") =
    Prop.forAllNoShrink(scenario) { case (first, before, after) =>
      run += 1
      val path = java.nio.file.Files
        .createTempDirectory("cdcimgb").toString + "/t"
      var pc = 0L
      def rows(ks: Seq[Long]) = {
        pc += 1
        ks.map(k => (k, pc, (pc * 100 + k).toDouble)).toDF("k", "pc", "v")
      }
      def apply(o: Op): Unit = o match {
        case Up(ks) => BucketTable.upsertInto(spark, path, rows(ks)); ()
        case Del(ks) =>
          BucketTable.deleteFrom(spark, path, ks.toDF("k")); ()
        case Compact => BucketTable.compact(spark, path); ()
      }
      BucketTable.create(rows(first), path,
        keys = Seq("k"), precombine = "pc", numBuckets = 4, cdc = true)
      before.foreach(apply)
      val checkpointSeq = BucketTable.latestCommit(path)
      val snap0 = BucketTable.read(spark, path)
        .as[(Long, Long, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      after.foreach(apply)
      val snap1 = BucketTable.read(spark, path)
        .as[(Long, Long, Double)].collect().toSeq.sortBy(_._1)
      val feed = BucketTable.changesCdc(spark, path, checkpointSeq)
        .select(imageCols.head, imageCols.tail: _*)
        .as[(Long, String, Long, Option[Long], Option[Double],
          Option[Long], Option[Double])].collect().toSeq
      checkImageFold(feed, snap0, snap1)
    }
}
