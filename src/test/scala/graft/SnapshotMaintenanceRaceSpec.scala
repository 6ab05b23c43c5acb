package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.{Snapshot, SnapshotBatchWrite, Tables}

/** r12 probe (SURVEY §7.9.9 item a): maintenance operations racing an
  * in-flight commit. retain() and vacuum() take no lock — the probes
  * below interleave them INSIDE a DSv2 commit window (via the
  * commitRaceHook seam, same technique as SnapshotCommitRaceSpec) and
  * pin what actually happens at each interleaving:
  *
  *  - retain deleting the tag an appender is mid-commit on → the
  *    appender's generation precondition reads -1 (manifest gone) and
  *    it fails with the TYPED concurrent-commit error — loud, winner
  *    (the retain) intact. No silent resurrection of a retired tag.
  *  - vacuum at grace=0 racing a truncate commit → the documented
  *    hazard is REAL: vacuum sweeps the not-yet-referenced new
  *    generation, the commit then lands a manifest pointing at deleted
  *    files, and the first read fails. This is exactly why
  *    `graceMillis` exists; the third probe shows the same interleave
  *    with a grace window is harmless.
  */
class SnapshotMaintenanceRaceSpec extends SparkSpec {

  private def src = Tables.nation(spark, sf)
    .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))

  private def write(root: String, mode: String): Unit =
    src.write.format("graft.sources.SnapshotSource")
      .option("root", root).option("tag", "g1").option("table", "t")
      .option("schema", src.schema.json).mode(mode).save()

  private def chain(t: Throwable): Seq[Throwable] =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(20).toSeq

  test("retain() deleting the tag mid-commit: the appender fails TYPED, the retirement sticks") {
    val root = Files.createTempDirectory("maint_retain").toString
    write(root, "append")
    assert(Snapshot.listTags(spark, root) == Seq("g1"))
    @volatile var fired = false
    SnapshotBatchWrite.commitRaceHook = () => {
      if (!fired) { fired = true; Snapshot.retain(spark, root, 0) }
    }
    try {
      val thrown = intercept[Throwable] { write(root, "append") }
      assert(fired)
      assert(chain(thrown).exists(_.isInstanceOf[Snapshot.ConcurrentSnapshotCommitException]),
        s"expected the typed concurrent-commit error, got: $thrown")
    } finally SnapshotBatchWrite.commitRaceHook = () => ()
    // the retirement won: no manifest, tag not listed, nothing readable
    assert(Snapshot.listTags(spark, root).isEmpty,
      "the deleted tag must not be silently resurrected by the losing commit")
    assert(!Snapshot.tagExists(spark, root, "g1"))
  }

  test("PROBE: vacuum at grace=0 inside a truncate-commit window sweeps the incoming generation (the documented hazard)") {
    val root = Files.createTempDirectory("maint_vac0").toString
    write(root, "append") // generation 0 committed
    @volatile var fired = false
    @volatile var swept: Seq[String] = Nil
    SnapshotBatchWrite.commitRaceHook = () => {
      if (!fired) { fired = true; swept = Snapshot.vacuum(spark, root) }
    }
    try write(root, "overwrite") // truncate: new files landed, then hook, then swap
    finally SnapshotBatchWrite.commitRaceHook = () => ()
    assert(fired)
    // the new generation's files were unreferenced at hook time → swept
    assert(swept.nonEmpty, "grace=0 vacuum must have swept the in-flight files")
    // the commit landed a manifest whose files are gone: the first read fails
    val m = Snapshot.readManifest(spark, root, "g1")
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(m.tables("t").files.exists(f => !fs.exists(new org.apache.hadoop.fs.Path(f.path))),
      "the committed manifest must reference at least one swept file")
    intercept[Throwable] {
      spark.read.format("graft.sources.SnapshotSource")
        .option("root", root).option("tag", "g1").option("table", "t")
        .load().count()
    }
  }

  test("retain() sweeping an export's parent mid-flight: the export fails TYPED, never commits dangling references") {
    // The retain analogue of the vacuum grace=0 hazard, with NO grace
    // escape hatch: an incremental export inherits its parent's FILES,
    // and those files are legitimately OLD — if retention sweeps the
    // parent tag in the window between the export's parent-manifest
    // read and its locked commit, an unguarded export publishes a
    // manifest referencing deleted files (silent data loss, found only
    // at read). The r18 owner-tag check inside the locked commit must
    // lose LOUDLY instead.
    val root = Files.createTempDirectory("maint_retain_export").toString
    val df = src
    Snapshot.export(spark, Map("t" -> df), root, "t1")
    @volatile var fired = false
    @volatile var doomed: Seq[String] = Nil
    Snapshot.exportRaceHook = () => {
      if (!fired) { fired = true; doomed = Snapshot.retain(spark, root, 0) }
    }
    val thrown = try {
      // same content → the 't' entry is INHERITED (points at t1's files)
      intercept[Throwable] {
        Snapshot.export(spark, Map("t" -> df), root, "t2", parent = Some("t1"))
      }
    } finally Snapshot.exportRaceHook = () => ()
    assert(fired && doomed == Seq("t1"),
      s"probe setup: retain(0) must have swept t1, got $doomed")
    assert(chain(thrown).exists(_.isInstanceOf[Snapshot.ConcurrentSnapshotCommitException]),
      s"expected the typed concurrent-commit error, got: $thrown")
    assert(chain(thrown).exists(t => String.valueOf(t.getMessage).contains("t1")),
      "the error must NAME the swept owner tag")
    // the losing export must not have published ANYTHING: no t2
    // manifest, no phantom tag — and the retirement stands
    assert(!Snapshot.tagExists(spark, root, "t2"),
      "a lost export must never commit a manifest with dangling references")
    assert(Snapshot.listTags(spark, root).isEmpty)
  }

  test("the SAME interleave under a grace window is harmless: nothing swept, commit readable") {
    val root = Files.createTempDirectory("maint_vacg").toString
    write(root, "append")
    @volatile var fired = false
    @volatile var swept: Seq[String] = Nil
    SnapshotBatchWrite.commitRaceHook = () => {
      if (!fired) { fired = true; swept = Snapshot.vacuum(spark, root, graceMillis = 10L * 60 * 1000) }
    }
    try write(root, "overwrite")
    finally SnapshotBatchWrite.commitRaceHook = () => ()
    assert(fired)
    assert(swept.isEmpty, s"young in-flight files must survive the grace window, swept: $swept")
    val back = spark.read.format("graft.sources.SnapshotSource")
      .option("root", root).option("tag", "g1").option("table", "t").load()
    assert(back.count() == src.count())
  }
}
