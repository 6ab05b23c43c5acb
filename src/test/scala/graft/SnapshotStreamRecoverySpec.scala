package graft

import org.apache.spark.sql.{Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.sources.Snapshot

/** r12 seam probe: streaming checkpoint RECOVERY meets the snapshot
  * sink's append semantics.
  *
  * The seam: Structured Streaming's foreachBatch contract is
  * AT-LEAST-ONCE — a crash between the checkpoint's `offsets/<id>`
  * write and its `commits/<id>` write replays batch `<id>` on restart,
  * re-invoking foreachBatch with the SAME batchId and the SAME file
  * slice (reconstructed from the offset log). A sink whose append is
  * not idempotent then commits those rows twice. The probes below
  * simulate exactly that crash window deterministically: run a
  * checkpointed 3-file stream to completion, delete the final
  * `commits/<id>` marker, restart — Spark re-runs that batch.
  *
  * Probe 1 pins the failure mode on a bare append (rows really do
  * double — the class is real, not hypothetical). Probe 2 pins the
  * guarantee: with `txnAppId`/`txnVersion` (the Delta SetTransaction
  * discipline, recorded in the manifest's per-table `txns` ledger) the
  * replayed batch is a no-op, a genuinely NEW batch afterwards still
  * commits, and no duplicate data files are left behind for vacuum.
  */
class SnapshotStreamRecoverySpec extends SparkSpec {

  private def ordersSlice = graft.sources.Tables.orders(spark, sf)
    .select(col("o_orderkey"), col("o_totalprice"))

  /** Stage `n` one-file micro-batch inputs split by key mod `of`. */
  private def stageFiles(dir: String, n: Int, of: Int): Unit =
    (0 until n).foreach { i =>
      ordersSlice.where(pmod(col("o_orderkey"), lit(of)) === i)
        .coalesce(1).write.mode("append").parquet(dir)
    }

  /** One checkpointed AvailableNow pass appending each micro-batch to
    * the snapshot table; records per-batchId row counts so the probes
    * can reason about exactly which rows a replay re-delivers.
    */
  private def runPass(inDir: String, ckpt: String, root: String,
                      withTxn: Boolean,
                      seen: scala.collection.concurrent.TrieMap[Long, Long]): Unit = {
    val schemaJson = ordersSlice.schema.json
    val sq = spark.readStream.schema(ordersSlice.schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir)
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        seen.updateWith(id) { prev => Some(prev.getOrElse(0L) + batch.count()) }
        val w = batch.toDF().write.format("graft.sources.SnapshotSource")
          .option("root", root).option("tag", "live").option("table", "orders_rec")
          .option("schema", schemaJson)
        (if (withTxn) w.option("txnAppId", "ingest-1").option("txnVersion", id.toString)
         else w).mode("append").save()
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    sq.awaitTermination()
    // awaitTermination can return a beat before the query leaves the
    // session's active registry; a restart on the same checkpoint then
    // trips the concurrent-checkpoint guard — drain before returning
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (spark.streams.active.exists(_.id == sq.id) && System.nanoTime() < deadline)
      Thread.sleep(20)
  }

  /** Simulate the crash window: drop the newest commit marker (its
    * offsets entry survives, so restart re-runs that batch). The
    * checksum sibling (`.N.crc`, Hadoop local fs) must go too — a
    * stale CRC makes the replayed batch's commit rewrite throw
    * FileAlreadyExistsException, which Spark surfaces as the
    * concurrent-checkpoint error; a real crash never wrote either file.
    */
  private def dropLastCommit(ckpt: String): Long = {
    val commits = java.nio.file.Paths.get(ckpt, "commits")
    val last = java.nio.file.Files.list(commits).toArray.map(_.toString)
      .map(p => java.nio.file.Paths.get(p))
      .filter(_.getFileName.toString.matches("\\d+"))
      .maxBy(_.getFileName.toString.toLong)
    java.nio.file.Files.delete(last)
    java.nio.file.Files.deleteIfExists(
      last.getParent.resolve(s".${last.getFileName}.crc"))
    last.getFileName.toString.toLong
  }

  private def tableCount(root: String): Long =
    spark.read.format("graft.sources.SnapshotSource")
      .option("root", root).option("tag", "live").option("table", "orders_rec")
      .load().count()

  test("PROBE: a bare append double-commits the replayed micro-batch (at-least-once, no txn)") {
    val inDir = java.nio.file.Files.createTempDirectory("rec_in_bare").toString
    val ckpt = java.nio.file.Files.createTempDirectory("rec_ck_bare").toString
    val root = java.nio.file.Files.createTempDirectory("rec_root_bare").toString
    stageFiles(inDir, 3, 3)
    val seen = scala.collection.concurrent.TrieMap.empty[Long, Long]
    runPass(inDir, ckpt, root, withTxn = false, seen)
    val total = ordersSlice.count()
    assert(tableCount(root) == total)
    val replayedId = dropLastCommit(ckpt)
    val firstDelivery = seen(replayedId)
    runPass(inDir, ckpt, root, withTxn = false, seen)
    // the replayed batch re-delivered the same slice...
    assert(seen(replayedId) == 2 * firstDelivery && firstDelivery > 0)
    // ...and the bare append committed it twice — the probed failure mode
    assert(tableCount(root) == total + firstDelivery)
  }

  test("txnAppId/txnVersion make the replay a no-op; a new batch still commits; no file leak") {
    val inDir = java.nio.file.Files.createTempDirectory("rec_in_txn").toString
    val ckpt = java.nio.file.Files.createTempDirectory("rec_ck_txn").toString
    val root = java.nio.file.Files.createTempDirectory("rec_root_txn").toString
    stageFiles(inDir, 3, 4) // slices 0..2 of mod 4 — slice 3 lands later
    val seen = scala.collection.concurrent.TrieMap.empty[Long, Long]
    runPass(inDir, ckpt, root, withTxn = true, seen)
    val replayedId = dropLastCommit(ckpt)
    runPass(inDir, ckpt, root, withTxn = true, seen)
    // replay delivered again but committed once: exact batch-form equality
    assert(seen(replayedId) > 0)
    val first3 = ordersSlice.where(pmod(col("o_orderkey"), lit(4)) < 3)
    assert(tableCount(root) == first3.count())
    val streamed = spark.read.format("graft.sources.SnapshotSource")
      .option("root", root).option("tag", "live").option("table", "orders_rec").load()
    assert(streamed.exceptAll(first3).count() == 0 && first3.exceptAll(streamed).count() == 0)
    // the skipped attempt deleted its duplicate files: every parquet
    // under the table dir is referenced by the manifest (nothing for
    // vacuum to sweep from the replay)
    assert(Snapshot.vacuum(spark, root).isEmpty)
    // a genuinely NEW batch after the recovery still commits (the
    // ledger skips only replays, it does not wedge the writer)
    ordersSlice.where(pmod(col("o_orderkey"), lit(4)) === 3)
      .coalesce(1).write.mode("append").parquet(inDir)
    runPass(inDir, ckpt, root, withTxn = true, seen)
    assert(tableCount(root) == ordersSlice.count())
    // ledger recorded: one appId at the newest batch version
    val txns = Snapshot.readManifest(spark, root, "live").tables("orders_rec").txns
    assert(txns == Map("ingest-1" -> (replayedId + 1)))
  }

  test("ledger unit semantics: same version skipped, higher commits, appIds independent") {
    val root = java.nio.file.Files.createTempDirectory("rec_unit").toString
    val df = ordersSlice.limit(10)
    def write(app: String, v: Long): Unit =
      df.write.format("graft.sources.SnapshotSource")
        .option("root", root).option("tag", "live").option("table", "t")
        .option("schema", df.schema.json)
        .option("txnAppId", app).option("txnVersion", v.toString)
        .mode("append").save()
    write("a", 5)
    write("a", 5) // exact replay → skipped
    write("a", 4) // stale version → skipped
    assert(tableCount2(root) == 10)
    write("a", 6) // progress → commits
    assert(tableCount2(root) == 20)
    write("b", 1) // different writer → independent ledger entry
    assert(tableCount2(root) == 30)
    assert(Snapshot.readManifest(spark, root, "live").tables("t").txns ==
      Map("a" -> 6L, "b" -> 1L))
    // the ledger survives an overwrite (writer progress is orthogonal
    // to data replacement): a post-overwrite replay is still skipped
    df.write.format("graft.sources.SnapshotSource")
      .option("root", root).option("tag", "live").option("table", "t")
      .option("schema", df.schema.json)
      .option("txnAppId", "a").option("txnVersion", "2")
      .mode("overwrite").save() // stale version: even the overwrite is a replay no-op
    assert(tableCount2(root) == 30)
    df.write.format("graft.sources.SnapshotSource")
      .option("root", root).option("tag", "live").option("table", "t")
      .option("schema", df.schema.json)
      .option("txnAppId", "a").option("txnVersion", "7")
      .mode("overwrite").save()
    assert(tableCount2(root) == 10)
    assert(Snapshot.readManifest(spark, root, "live").tables("t").txns ==
      Map("a" -> 7L, "b" -> 1L))
    write("a", 7) // replay against the post-overwrite ledger → skipped
    assert(tableCount2(root) == 10)
  }

  test("Snapshot.export over a live tag carries the txns ledger forward: a post-export replay still no-ops") {
    // ADVICE r12 probe: export REPLACES a tag's table set wholesale, but
    // writer progress is orthogonal to data replacement (the same
    // invariant the DSv2 overwrite already honors, pinned above). If
    // export rebuilt entries with an empty ledger, a nightly re-export
    // running beside an at-least-once streaming appender would silently
    // reset the appender's recorded versions — the next replayed
    // micro-batch then DOUBLE-COMMITS. Pre-fix this test fails at the
    // post-export ledger assertion.
    val root = java.nio.file.Files.createTempDirectory("rec_export").toString
    val df = ordersSlice.limit(10)
    def write(app: String, v: Long): Unit =
      df.write.format("graft.sources.SnapshotSource")
        .option("root", root).option("tag", "live").option("table", "t")
        .option("schema", df.schema.json)
        .option("txnAppId", app).option("txnVersion", v.toString)
        .mode("append").save()
    write("a", 5)
    assert(tableCount2(root) == 10)
    // full re-export of the SAME tag (the caller declares the complete
    // snapshot; data replaced wholesale — 10 rows either way here)
    Snapshot.export(spark, Map("t" -> df), root, "live")
    assert(Snapshot.readManifest(spark, root, "live").tables("t").txns ==
      Map("a" -> 5L), "export must carry the tag's txns ledger forward")
    write("a", 5) // replayed micro-batch arriving after the export → no-op
    assert(tableCount2(root) == 10)
    write("a", 4) // stale replay → no-op too
    assert(tableCount2(root) == 10)
    write("a", 6) // genuine progress still commits
    assert(tableCount2(root) == 20)
  }

  test("ledger retention: dropTxns removes only the named decommissioned appIds; mergeTxns never regresses") {
    val root = java.nio.file.Files.createTempDirectory("rec_drop").toString
    val df = ordersSlice.limit(10)
    def write(app: String, v: Long): Unit =
      df.write.format("graft.sources.SnapshotSource")
        .option("root", root).option("tag", "live").option("table", "t")
        .option("schema", df.schema.json)
        .option("txnAppId", app).option("txnVersion", v.toString)
        .mode("append").save()
    write("old-writer", 3); write("live-writer", 8)
    val dropped = Snapshot.dropTxns(spark, root, "live", "t", Set("old-writer", "never-existed"))
    assert(dropped == Map("old-writer" -> 3L)) // reports only what was present
    assert(Snapshot.readManifest(spark, root, "live").tables("t").txns ==
      Map("live-writer" -> 8L))
    write("live-writer", 8) // the kept writer's replay still no-ops
    assert(tableCount2(root) == 20)
    write("old-writer", 3) // documented hazard: a dropped appId's replay re-commits
    assert(tableCount2(root) == 30)
    val missing = intercept[IllegalArgumentException](
      Snapshot.dropTxns(spark, root, "live", "no_such_table", Set("x")))
    assert(missing.getMessage.contains("no table"))
    // mergeTxns: max per appId, union of keys — progress never regresses
    assert(Snapshot.mergeTxns(Map("a" -> 5L, "b" -> 1L), Map("a" -> 3L, "c" -> 9L)) ==
      Map("a" -> 5L, "b" -> 1L, "c" -> 9L))
    assert(Snapshot.mergeTxns(Map.empty, Map("a" -> Long.MaxValue)) == Map("a" -> Long.MaxValue))
  }

  test("flatMapGroupsWithState state survives a checkpoint restart: run 2 continues run 1's counts") {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import spark.implicits._
    val events = graft.sources.Tables.events(spark, sf).select(col("user_id"), col("event_id"))
    val inDir = java.nio.file.Files.createTempDirectory("rec_state_in").toString
    val ckpt = java.nio.file.Files.createTempDirectory("rec_state_ck").toString
    // run 1 sees the even event_ids only
    events.where(pmod(col("event_id"), lit(2)) === 0)
      .coalesce(1).write.mode("append").parquet(inDir)
    val fn = (uid: Long, it: Iterator[Row], state: GroupState[Long]) => {
      val n = state.getOption.getOrElse(0L) + it.size
      state.update(n)
      Iterator((uid, n))
    }
    // last emitted running count per user, re-collected per run
    val latest = scala.collection.concurrent.TrieMap.empty[Long, Long]
    def runPass(): Unit = {
      val sq = spark.readStream.schema(events.schema).parquet(inDir)
        .as[Row](org.apache.spark.sql.Encoders.row(events.schema))
        .groupByKey(_.getLong(0))
        .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout())(fn)
        .toDF("user_id", "n")
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: Dataset[Row], _: Long) =>
          b.collect().foreach(r => latest.put(r.getLong(0), r.getLong(1)))
          ()
        }
        .trigger(Trigger.AvailableNow()).start()
      sq.awaitTermination()
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (spark.streams.active.exists(_.id == sq.id) && System.nanoTime() < deadline)
        Thread.sleep(20)
    }
    runPass()
    // restart sees only the odd event_ids — emitted counts must CONTINUE
    // from recovered state, covering the full table, not restart at zero
    events.where(pmod(col("event_id"), lit(2)) === 1)
      .coalesce(1).write.mode("append").parquet(inDir)
    latest.clear()
    runPass()
    val batch = events.groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    // every user emitted in run 2 carries the A+B total
    assert(latest.nonEmpty)
    latest.foreach { case (u, n) => assert(n == batch(u),
      s"user $u: restart emitted $n, batch total ${batch(u)} — state did not recover") }
  }

  private def tableCount2(root: String): Long =
    spark.read.format("graft.sources.SnapshotSource")
      .option("root", root).option("tag", "live").option("table", "t")
      .load().count()

  private val dayMs = 24L * 3600 * 1000

  /** Backdate `app`'s ledger stamp and optionally plant an UNSTAMPED
    * legacy entry — forged through the engine's own manifest
    * read/write (same wire format, OCC generation bump), exactly what
    * a manifest written days ago / by a pre-stamp build looks like.
    */
  private def forgeLedger(root: String, app: String, stampMs: Long,
                          legacy: Option[(String, Long)]): Unit = {
    val m = Snapshot.readManifest(spark, root, "live")
    val e = m.tables("t")
    val forged = e.copy(
      txns = e.txns ++ legacy,
      txnStamps = e.txnStamps + (app -> stampMs))
    Snapshot.writeManifest(spark, root,
      m.copy(tables = m.tables + ("t" -> forged), generation = m.generation + 1),
      expectedGeneration = Some(m.generation))
  }

  test("age-based retention: commits stamp the ledger; expireTxns drops only stamped-and-old, never unstamped legacy entries") {
    val root = java.nio.file.Files.createTempDirectory("rec_expire").toString
    val df = ordersSlice.limit(10)
    def write(app: String, v: Long): Unit =
      df.write.format("graft.sources.SnapshotSource")
        .option("root", root).option("tag", "live").option("table", "t")
        .option("schema", df.schema.json)
        .option("txnAppId", app).option("txnVersion", v.toString)
        .mode("append").save()
    val t0 = System.currentTimeMillis()
    write("young", 1); write("old", 2)
    // every txn commit stamps its appId with a sane clock reading
    val stamps0 = Snapshot.readManifest(spark, root, "live").tables("t").txnStamps
    assert(stamps0.keySet == Set("young", "old"))
    assert(stamps0.values.forall(s => s >= t0 && s <= System.currentTimeMillis() + 1000))
    // age "old" by 10 days and plant "legacy" (a pre-stamp build's
    // entry: in txns, absent from txnStamps)
    forgeLedger(root, "old", t0 - 10 * dayMs, legacy = Some("legacy" -> 7L))
    val dropped = Snapshot.expireTxns(spark, root, "live", "t", retentionMs = 7 * dayMs)
    assert(dropped == Map("old" -> 2L), s"expected only 'old' expired, got $dropped")
    val e = Snapshot.readManifest(spark, root, "live").tables("t")
    assert(e.txns == Map("young" -> 1L, "legacy" -> 7L),
      "unstamped legacy entries have unknown age and MUST survive an age sweep")
    assert(e.txnStamps.keySet == Set("young"))
    // idempotent: nothing left to expire
    assert(Snapshot.expireTxns(spark, root, "live", "t", 7 * dayMs).isEmpty)
  }

  test("txnRetentionMs write option sweeps on commit; an expired live writer's replay double-commits (the documented hazard)") {
    val root = java.nio.file.Files.createTempDirectory("rec_retopt").toString
    val df = ordersSlice.limit(10)
    def write(app: String, v: Long, retention: Option[Long] = None): Unit = {
      val w = df.write.format("graft.sources.SnapshotSource")
        .option("root", root).option("tag", "live").option("table", "t")
        .option("schema", df.schema.json)
        .option("txnAppId", app).option("txnVersion", v.toString)
      retention.fold(w)(r => w.option("txnRetentionMs", r.toString))
        .mode("append").save()
    }
    write("old-writer", 3)
    forgeLedger(root, "old-writer", System.currentTimeMillis() - 10 * dayMs, None)
    // a fresh writer commits WITH retention: the piggybacked sweep
    // expires old-writer; the sweeping writer stamped `now`, so it can
    // never expire itself
    write("fresh", 1, retention = Some(7 * dayMs))
    val e = Snapshot.readManifest(spark, root, "live").tables("t")
    assert(e.txns == Map("fresh" -> 1L), s"old-writer should be swept, got ${e.txns}")
    assert(e.txnStamps.keySet == Set("fresh"))
    assert(tableCount2(root) == 20)
    // THE HAZARD, pinned: old-writer's replay of its already-committed
    // v3 is no longer recognized — it double-commits. This is why the
    // retention window must exceed any possible replay gap.
    write("old-writer", 3)
    assert(tableCount2(root) == 30,
      "an expired live writer's replay double-commits — the documented hazard")
    // option validation fails at build time, before any file is written
    val bad = intercept[IllegalArgumentException] {
      df.write.format("graft.sources.SnapshotSource")
        .option("root", root).option("tag", "live").option("table", "t")
        .option("schema", df.schema.json)
        .option("txnAppId", "x").option("txnVersion", "1")
        .option("txnRetentionMs", "soon").mode("append").save()
    }
    assert(bad.getMessage.contains("txnRetentionMs"))
    val neg = intercept[IllegalArgumentException] {
      df.write.format("graft.sources.SnapshotSource")
        .option("root", root).option("tag", "live").option("table", "t")
        .option("schema", df.schema.json)
        .option("txnAppId", "x").option("txnVersion", "1")
        .option("txnRetentionMs", "-5").mode("append").save()
    }
    assert(neg.getMessage.contains("positive"))
  }

  test("export carries txnStamps with the ledger, so age-based expiry stays correct across re-exports") {
    val root = java.nio.file.Files.createTempDirectory("rec_expstamp").toString
    val df = ordersSlice.limit(10)
    df.write.format("graft.sources.SnapshotSource")
      .option("root", root).option("tag", "live").option("table", "t")
      .option("schema", df.schema.json)
      .option("txnAppId", "a").option("txnVersion", "5")
      .mode("append").save()
    val before = Snapshot.readManifest(spark, root, "live").tables("t").txnStamps
    assert(before.contains("a"))
    Snapshot.export(spark, Map("t" -> df), root, "live")
    val after = Snapshot.readManifest(spark, root, "live").tables("t")
    assert(after.txns == Map("a" -> 5L))
    assert(after.txnStamps == before,
      "export must carry txnStamps with the ledger — a wiped stamp would turn " +
        "the entry into an unexpirable legacy row (or, merged stale, expire it early)")
  }

  test("cross-JVM replay race: the losing committer's RETRY is a no-op, not a double-append") {
    // the production restart story end-to-end: a new driver JVM replays
    // a batch another instance already committed, AND the two race.
    // Interleave via the commitRaceHook (same seam as
    // SnapshotCommitRaceSpec): session B commits the SAME (appId,
    // version) inside A's commit window → A loses on the generation
    // precondition (loud), and A's retry — the documented recovery
    // action — re-reads the manifest, finds the ledger entry, and
    // no-ops. Exactly-once holds across the whole episode.
    import graft.sources.SnapshotBatchWrite
    val df = ordersSlice.limit(10)
    val root2 = java.nio.file.Files.createTempDirectory("rec_xjvm").toString
    def append2(s: org.apache.spark.sql.SparkSession): Unit = {
      val d = s.createDataFrame(df.collectAsList(), df.schema)
      d.write.format("graft.sources.SnapshotSource")
        .option("root", root2).option("tag", "live").option("table", "t")
        .option("schema", df.schema.json)
        .option("txnAppId", "ingest-x").option("txnVersion", "7")
        .mode("append").save()
    }
    val sessionB = spark.newSession()
    @volatile var fired = false
    SnapshotBatchWrite.commitRaceHook = () => {
      if (!fired) { fired = true; append2(sessionB) }
    }
    try {
      val thrown = intercept[Throwable] { append2(spark) }
      def chain(t: Throwable): Seq[Throwable] =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(20).toSeq
      assert(chain(thrown).exists(
        _.isInstanceOf[Snapshot.ConcurrentSnapshotCommitException]))
      assert(fired)
    } finally SnapshotBatchWrite.commitRaceHook = () => ()
    // the retry: same (appId, version) against the winner's manifest → no-op
    append2(spark)
    val back = spark.read.format("graft.sources.SnapshotSource")
      .option("root", root2).option("tag", "live").option("table", "t").load()
    assert(back.count() == 10, "exactly-once across race + retry")
    assert(Snapshot.readManifest(spark, root2, "live").tables("t").txns ==
      Map("ingest-x" -> 7L))
    // and nothing unreferenced left behind for vacuum
    assert(Snapshot.vacuum(spark, root2).isEmpty)
  }

  test("malformed txn options fail driver-side at build, never as a silent bare append") {
    val root = java.nio.file.Files.createTempDirectory("rec_bad").toString
    val df = ordersSlice.limit(1)
    def attempt(opts: Map[String, String]): Throwable = intercept[Throwable] {
      val w = df.write.format("graft.sources.SnapshotSource")
        .option("root", root).option("tag", "live").option("table", "t")
        .option("schema", df.schema.json)
      opts.foldLeft(w) { case (acc, (k, v)) => acc.option(k, v) }.mode("append").save()
    }
    def rootCause(t: Throwable): Throwable =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).toSeq.last
    val missing = rootCause(attempt(Map("txnAppId" -> "a")))
    assert(missing.getMessage.contains("must be set together"))
    val junk = rootCause(attempt(Map("txnAppId" -> "a", "txnVersion" -> "not-a-long")))
    assert(junk.getMessage.contains("not a long"))
    // and nothing committed: the table was never created
    val m = intercept[Throwable](Snapshot.readManifest(spark, root, "live"))
    assert(rootCause(m).isInstanceOf[java.io.FileNotFoundException])
  }
}
