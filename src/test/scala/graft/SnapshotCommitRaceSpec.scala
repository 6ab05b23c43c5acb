package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.{Snapshot, SnapshotBatchWrite, Tables}

/** Cross-JVM commit coordination (VERDICT r10 item 2): the manifest
  * swap's in-process lock cannot see a second JVM, so two applications
  * committing one tag could each read generation g and both swap — the
  * first swap silently vanished (lost update). The generation-counter
  * precondition turns the loser into a loud
  * [[Snapshot.ConcurrentSnapshotCommitException]].
  *
  * The race is reproduced deterministically with TWO SparkSessions in
  * one JVM: the commitRaceHook fires inside session A's commit after it
  * has read the prior manifest, and runs session B's full DSv2 append
  * inline. Because intrinsic locks are reentrant, B's commit passes the
  * in-process commitLock exactly as a separate JVM would bypass it —
  * the interleave is bit-for-bit the cross-JVM lost-update window.
  */
class SnapshotCommitRaceSpec extends SparkSpec {

  private def append(s: org.apache.spark.sql.SparkSession, root: String,
                     df: org.apache.spark.sql.DataFrame): Unit =
    df.write.format("graft.sources.SnapshotSource")
      .option("root", root).option("tag", "g1").option("table", "nation_copy")
      .option("schema", df.schema.json).mode("append").save()

  test("two sessions racing append on one tag: the loser THROWS and the winner's files survive") {
    val root = Files.createTempDirectory("snap_race").toString
    val src = Tables.nation(spark, sf)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    append(spark, root, src) // generation 0, 25 rows
    assert(Snapshot.readManifest(spark, root, "g1").generation == 0L)

    val sessionB = spark.newSession()
    @volatile var fired = false
    SnapshotBatchWrite.commitRaceHook = () => {
      if (!fired) { fired = true; append(sessionB, root, src) }
    }
    try {
      val thrown = intercept[Throwable] { append(spark, root, src) }
      // Spark wraps DSv2 commit failures; the typed cause must be in the chain
      def chain(t: Throwable): Seq[Throwable] =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(20).toSeq
      assert(chain(thrown).exists(_.isInstanceOf[Snapshot.ConcurrentSnapshotCommitException]),
        s"expected ConcurrentSnapshotCommitException in the cause chain, got: $thrown")
      assert(fired, "the concurrent append must actually have run")
    } finally SnapshotBatchWrite.commitRaceHook = () => ()

    // The winner (session B) committed generation 1 with 50 rows; the
    // loser's swap must NOT have landed — its manifest would have carried
    // 50 rows too but referenced B's files as missing.
    val m = Snapshot.readManifest(spark, root, "g1")
    assert(m.generation == 1L, s"winner's generation must survive, got ${m.generation}")
    val entry = m.tables("nation_copy")
    assert(entry.rows == 50L, s"winner's rows must survive, got ${entry.rows}")
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(entry.files.forall(f => fs.exists(new org.apache.hadoop.fs.Path(f.path))),
      "every file the surviving manifest references must exist on disk")
    val back = spark.read.format("graft.sources.SnapshotSource")
      .option("root", root).option("tag", "g1").option("table", "nation_copy").load()
    assert(back.count() == 50L)
  }

  test("the UNCONDITIONED swap loses the update — the pre-fix hazard the precondition closes") {
    val root = Files.createTempDirectory("snap_race_prefix").toString
    val t = Snapshot.TableEntry(Nil, 1L, "sig-a")
    Snapshot.writeManifest(spark, root,
      Snapshot.Manifest("g1", None, Map("a" -> t), generation = 0L))
    // two writers both read generation 0
    val w1 = Snapshot.readManifest(spark, root, "g1")
    val w2 = Snapshot.readManifest(spark, root, "g1")
    // writer 2 commits first (adds table b)
    Snapshot.writeManifest(spark, root,
      w2.copy(tables = w2.tables + ("b" -> t.copy(signature = "sig-b")), generation = 1L))
    // pre-fix behavior: writer 1's unconditioned swap silently drops b
    Snapshot.writeManifest(spark, root,
      w1.copy(tables = w1.tables + ("c" -> t.copy(signature = "sig-c")), generation = 1L))
    assert(!Snapshot.readManifest(spark, root, "g1").tables.contains("b"),
      "without the precondition the winner's table is silently lost — the documented pre-fix hazard")
  }

  test("the preconditioned swap detects the same interleave and keeps the winner") {
    val root = Files.createTempDirectory("snap_race_occ").toString
    val t = Snapshot.TableEntry(Nil, 1L, "sig-a")
    Snapshot.writeManifest(spark, root,
      Snapshot.Manifest("g1", None, Map("a" -> t), generation = 0L),
      expectedGeneration = Some(-1L))
    val w1 = Snapshot.readManifest(spark, root, "g1")
    val w2 = Snapshot.readManifest(spark, root, "g1")
    Snapshot.writeManifest(spark, root,
      w2.copy(tables = w2.tables + ("b" -> t.copy(signature = "sig-b")), generation = 1L),
      expectedGeneration = Some(0L))
    val e = intercept[Snapshot.ConcurrentSnapshotCommitException] {
      Snapshot.writeManifest(spark, root,
        w1.copy(tables = w1.tables + ("c" -> t.copy(signature = "sig-c")), generation = 1L),
        expectedGeneration = Some(0L))
    }
    assert(e.getMessage.contains("generation 0") && e.getMessage.contains("generation 1"))
    val m = Snapshot.readManifest(spark, root, "g1")
    assert(m.tables.contains("b") && !m.tables.contains("c") && m.generation == 1L)
  }

  test("legacy manifest without a generation field parses as 0 and joins the protocol on next commit") {
    val root = Files.createTempDirectory("snap_race_legacy").toString
    val dir = new java.io.File(s"$root/g1"); dir.mkdirs()
    // written by pre-generation code: no generation field at all
    val legacy = """{"tag":"g1","parent":null,"tables":{}}"""
    java.nio.file.Files.write(dir.toPath.resolve("manifest.json"),
      legacy.getBytes("UTF-8"))
    assert(Snapshot.readManifest(spark, root, "g1").generation == 0L)
    val src = Tables.nation(spark, sf).select(col("n_nationkey"), col("n_name"))
    append0(root, src)
    assert(Snapshot.readManifest(spark, root, "g1").generation == 1L)
  }

  private def append0(root: String, df: org.apache.spark.sql.DataFrame): Unit =
    df.write.format("graft.sources.SnapshotSource")
      .option("root", root).option("tag", "g1").option("table", "nation_copy")
      .option("schema", df.schema.json).mode("append").save()

  test("export joins the generation protocol: fresh tag commits 0, re-export bumps, DSv2 append continues the chain") {
    val root = Files.createTempDirectory("snap_race_export").toString
    val src = Tables.nation(spark, sf).select(col("n_nationkey"), col("n_name"))
    Snapshot.export(spark, Map("nation" -> src), root, "g1")
    assert(Snapshot.readManifest(spark, root, "g1").generation == 0L)
    Snapshot.export(spark, Map("nation" -> src), root, "g1")
    assert(Snapshot.readManifest(spark, root, "g1").generation == 1L)
    append0(root, src)
    assert(Snapshot.readManifest(spark, root, "g1").generation == 2L)
  }

  test("a HELD commit marker released mid-retry lets the waiting committer through") {
    // the acquisition loop's success branch: a live committer holds the
    // marker briefly, the waiter retries and then commits — blocking
    // then succeeding, not failing
    val root = Files.createTempDirectory("snap_race_wait").toString
    val t = Snapshot.TableEntry(Nil, 1L, "sig-a")
    Snapshot.writeManifest(spark, root,
      Snapshot.Manifest("g1", None, Map("a" -> t), generation = 0L))
    val marker = new java.io.File(s"$root/g1/.manifest.json.commit-marker")
    assert(marker.createNewFile())
    val releaser = new Thread(() => { Thread.sleep(150); marker.delete(); () })
    releaser.start()
    try {
      Snapshot.writeManifest(spark, root,
        Snapshot.Manifest("g1", None, Map("a" -> t), generation = 1L),
        expectedGeneration = Some(0L))
      assert(Snapshot.readManifest(spark, root, "g1").generation == 1L)
      assert(!marker.exists(), "the committer must release its own marker after the swap")
    } finally releaser.join()
  }

  test("stale commit marker fails loudly, naming the marker") {
    val root = Files.createTempDirectory("snap_race_marker").toString
    val t = Snapshot.TableEntry(Nil, 1L, "sig-a")
    Snapshot.writeManifest(spark, root,
      Snapshot.Manifest("g1", None, Map("a" -> t), generation = 0L))
    val marker = new java.io.File(s"$root/g1/.manifest.json.commit-marker")
    assert(marker.createNewFile())
    val saved = Snapshot.commitMarkerTimeoutNanos
    Snapshot.commitMarkerTimeoutNanos = 200L * 1000 * 1000
    try {
      val e = intercept[Snapshot.ConcurrentSnapshotCommitException] {
        Snapshot.writeManifest(spark, root,
          Snapshot.Manifest("g1", None, Map("a" -> t), generation = 1L),
          expectedGeneration = Some(0L))
      }
      assert(e.getMessage.contains("commit-marker"))
    } finally {
      Snapshot.commitMarkerTimeoutNanos = saved
      marker.delete()
    }
    // with the marker gone the same commit goes through
    Snapshot.writeManifest(spark, root,
      Snapshot.Manifest("g1", None, Map("a" -> t), generation = 1L),
      expectedGeneration = Some(0L))
    assert(Snapshot.readManifest(spark, root, "g1").generation == 1L)
  }
}
