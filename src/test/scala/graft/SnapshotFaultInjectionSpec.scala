package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.{Snapshot, Tables}

/** Crash-consistency of the manifest swap under injected I/O faults,
  * on the `faulty:` scheme (SURVEY §7.9.14 depth): a foreign scheme
  * with no AbstractFileSystem binding routes writeManifest through the
  * LEGACY delete+rename fallback — the gs:/custom-FS branch that no
  * `file:` test can reach. Contracts pinned:
  *
  *  1. the fallback path WORKS end-to-end when healthy (new coverage:
  *     UnsupportedFileSystemException → delete+rename, read-back equal);
  *  2. a temp write that dies MID-STREAM leaves the committed manifest
  *     byte-intact (readers keep generation N) and no temp litter;
  *  3. the fallback's documented non-atomic window (destination
  *     deleted, rename refused) fails LOUDLY naming the temp as the
  *     recovery copy — and that copy genuinely parses as the manifest
  *     that failed to land, so recovery is real, not aspirational.
  */
class SnapshotFaultInjectionSpec extends SparkSpec {

  private def nation = Tables.nation(spark, sf)
    .select(col("n_nationkey"), col("n_name"))

  // the faulty: scheme registers through Hadoop's FileSystem
  // ServiceLoader (META-INF/services in test resources), so EVERY
  // Configuration instance resolves it — conf-key propagation into the
  // many newHadoopConf() copies is exactly what a test must not depend on
  private def withFaultyRoot(body: String => Unit): Unit = {
    val local = Files.createTempDirectory("snap_fault").toString
    try body(s"faulty://$local")
    finally {
      FaultyLocalFileSystem.reset()
      SessionToken.deleteDir(local)
    }
  }

  test("foreign-scheme fallback path commits and reads back (healthy run)") {
    withFaultyRoot { root =>
      Snapshot.export(spark, Map("nation" -> nation), root, "v1")
      val back = Snapshot.read(spark, root, "v1", "nation")
      assert(back.count() == nation.count())
      assert(Snapshot.listTags(spark, root) == Seq("v1"))
    }
  }

  test("temp write dying mid-stream: committed manifest survives byte-intact, no litter") {
    withFaultyRoot { root =>
      Snapshot.export(spark, Map("nation" -> nation), root, "v1")
      val before = Snapshot.readManifest(spark, root, "v1")
      FaultyLocalFileSystem.failTmpWrites = true
      val thrown = intercept[Throwable] {
        Snapshot.export(spark, Map("nation" -> nation.limit(3)), root, "v1")
      }
      FaultyLocalFileSystem.failTmpWrites = false
      assert(Iterator.iterate(thrown)(_.getCause).takeWhile(_ != null).take(10)
          .exists(_.getMessage != null)
          && String.valueOf(thrown.getMessage).nonEmpty, s"opaque failure: $thrown")
      // the OLD manifest is still the committed truth — same generation,
      // same file list, readable
      val after = Snapshot.readManifest(spark, root, "v1")
      assert(after == before,
        "a failed temp write must leave the committed manifest untouched")
      assert(Snapshot.read(spark, root, "v1", "nation").count() == nation.count())
      // and the partial temp was cleaned up (the catch deletes it)
      val tagDir = new java.io.File(new java.net.URI(root.replace("faulty:", "file:") + "/v1"))
      val litter = Option(tagDir.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.contains(".tmp-"))
      assert(litter.isEmpty, s"tmp litter left behind: ${litter.mkString(", ")}")
    }
  }

  test("fallback rename refusal: loud error NAMES the temp, and the temp IS the recovery copy") {
    withFaultyRoot { root =>
      Snapshot.export(spark, Map("nation" -> nation), root, "v1")
      FaultyLocalFileSystem.failRename = true
      val thrown = intercept[java.io.IOException] {
        Snapshot.export(spark, Map("nation" -> nation.limit(3)), root, "v1")
      }
      FaultyLocalFileSystem.failRename = false
      // the documented non-atomic window: destination deleted, rename
      // refused — the error must point at the surviving temp
      val msg = Iterator.iterate(thrown: Throwable)(_.getCause)
        .takeWhile(_ != null).take(10)
        .map(t => String.valueOf(t.getMessage)).mkString(" | ")
      assert(msg.contains("recover from") || msg.contains("tmp left for recovery"), msg)
      val tagDir = new java.io.File(new java.net.URI(root.replace("faulty:", "file:") + "/v1"))
      val tmps = Option(tagDir.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.contains(".tmp-"))
      assert(tmps.length == 1, s"expected exactly the recovery temp, got: ${tmps.mkString(", ")}")
      // recovery is REAL: the temp parses as the manifest that failed to
      // land (generation bumped, 3-row table signature)
      val recovered = new String(
        java.nio.file.Files.readAllBytes(tmps.head.toPath), "UTF-8")
      assert(recovered.contains("\"generation\"") && recovered.contains("\"nation\""),
        s"recovery copy does not parse as a manifest: ${recovered.take(200)}")
      // the tag is manifest-less until an operator recovers — listTags
      // honestly drops it rather than serving a missing manifest
      assert(Snapshot.listTags(spark, root).isEmpty)
    }
  }
}
