package graft

import java.nio.file.Files
import graft.sources.Snapshot

/** Object-store model for the commit-marker degradation (r12, VERDICT
  * item 6): a filesystem that cannot create-exclusive at all. Only the
  * marker's create(overwrite=false) refuses — ordinary writes work,
  * like a store whose PUT has no if-none-match. The attempt counter
  * proves the degradation path actually ran (vs. the marker silently
  * never being tried).
  */
class GraftNoExclusiveFs extends GraftTestFs {
  import org.apache.hadoop.fs.{FSDataOutputStream, Path}
  import org.apache.hadoop.fs.permission.FsPermission
  import org.apache.hadoop.util.Progressable
  override def getScheme: String = "graftnx"
  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
                      bufferSize: Int, replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream =
    if (!overwrite && f.getName.endsWith(".commit-marker")) {
      GraftNoExclusiveFs.markerAttempts.incrementAndGet()
      throw new UnsupportedOperationException(
        "create-exclusive not supported (object-store model)")
    } else super.create(f, permission, overwrite, bufferSize, replication,
      blockSize, progress)
}

object GraftNoExclusiveFs {
  val markerAttempts = new java.util.concurrent.atomic.AtomicInteger(0)
}

/** The documented degradation (Snapshot.writeManifest scaladoc): when
  * create-exclusive is unsupported, commits run MARKER-LESS — a narrow
  * TOCTOU window opens between the generation check and the swap, but
  * every NON-adjacent race (the lost-update class: both writers read
  * generation g, one commits g+1 before the other swaps) must still be
  * caught by the precondition re-read. This spec drives that exact
  * interleave over a filesystem whose marker create always throws
  * UnsupportedOperationException.
  */
class SnapshotNoExclusiveFsSpec extends SparkSpec {

  private lazy val root: String = {
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.graftnx.impl", classOf[GraftNoExclusiveFs].getName)
    conf.set("fs.graftnx.impl.disable.cache", "true")
    s"graftnx:${Files.createTempDirectory("snap_nx")}"
  }

  test("a store without create-exclusive still detects the non-adjacent race marker-less") {
    val t = Snapshot.TableEntry(Nil, 1L, "sig-a")
    val before = GraftNoExclusiveFs.markerAttempts.get()
    Snapshot.writeManifest(spark, root,
      Snapshot.Manifest("g1", None, Map("a" -> t), generation = 0L),
      expectedGeneration = Some(-1L))
    // the marker WAS attempted and refused — the degradation ran, the
    // commit still landed
    assert(GraftNoExclusiveFs.markerAttempts.get() > before,
      "marker acquisition was never attempted — the spec is testing nothing")
    assert(Snapshot.readManifest(spark, root, "g1").generation == 0L)

    // non-adjacent lost-update interleave: both writers read gen 0,
    // writer B commits gen 1, writer A's swap must then FAIL LOUDLY on
    // the precondition re-read even though no marker serializes them
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
    assert(m.tables.contains("b") && !m.tables.contains("c") && m.generation == 1L,
      "the winner's manifest must survive the refused-marker loser")

    // no marker litter: the refusing store never materialized one
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = f.listFiles(new org.apache.hadoop.fs.Path(root), true)
    while (it.hasNext) {
      val st = it.next()
      assert(!st.getPath.getName.endsWith(".commit-marker"),
        s"unexpected marker on a no-exclusive store: ${st.getPath}")
    }
  }

  test("adjacent-generation commits still chain normally without a marker") {
    val t = Snapshot.TableEntry(Nil, 1L, "sig-a")
    val r2 = s"graftnx:${Files.createTempDirectory("snap_nx2")}"
    Snapshot.writeManifest(spark, r2,
      Snapshot.Manifest("g1", None, Map("a" -> t), generation = 0L),
      expectedGeneration = Some(-1L))
    val m0 = Snapshot.readManifest(spark, r2, "g1")
    Snapshot.writeManifest(spark, r2,
      m0.copy(generation = 1L), expectedGeneration = Some(0L))
    assert(Snapshot.readManifest(spark, r2, "g1").generation == 1L)
  }
}
