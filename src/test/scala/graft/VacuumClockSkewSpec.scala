package graft

import java.nio.file.Files
import graft.sources.Snapshot

/** A filesystem whose reported mtimes run 10 minutes BEHIND the
  * driver's clock — the storage-vs-driver skew that silently eats a
  * vacuum grace window (r12 advice). Every status call shifts, so the
  * probe file and the data files stay on ONE clock, exactly like a
  * real store with a skewed timestamp authority.
  */
class GraftSkewFs extends GraftTestFs {
  import org.apache.hadoop.fs.{FileStatus, Path}
  override def getScheme: String = "graftskew"
  private def shift(st: FileStatus): FileStatus =
    new FileStatus(st.getLen, st.isDirectory, st.getReplication,
      st.getBlockSize, st.getModificationTime - GraftSkewFs.SkewMillis,
      st.getAccessTime, st.getPermission, st.getOwner, st.getGroup, st.getPath)
  override def getFileStatus(f: Path): FileStatus = shift(super.getFileStatus(f))
  override def listStatus(f: Path): Array[FileStatus] =
    super.listStatus(f).map(shift)
}

object GraftSkewFs { val SkewMillis = 600000L }

class VacuumClockSkewSpec extends SparkSpec {

  test("the grace window survives storage-behind-driver clock skew (probe-derived now)") {
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.graftskew.impl", classOf[GraftSkewFs].getName)
    conf.set("fs.graftskew.impl.disable.cache", "true")
    val root = s"graftskew:${Files.createTempDirectory("snap_skew")}"
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(conf)
    // a referenced table so the root is a live snapshot catalog
    Snapshot.writeManifest(spark, root,
      Snapshot.Manifest("t1", None, Map.empty))
    // an in-flight writer's data file: just landed (driver-clock now),
    // manifest not yet committed — unreferenced, but INSIDE any sane
    // grace window. The skewed store reports its mtime 10 min in the
    // past, so a driver-clock cutoff would sweep it straight through a
    // 5 s grace (the exact race graceMillis exists to close); the
    // probe-derived cutoff shares the skew and must keep it.
    val inflight = new org.apache.hadoop.fs.Path(s"$root/t1/tbl/g-new/part-0.parquet")
    f.mkdirs(inflight.getParent)
    f.create(inflight, false).close()
    val swept = Snapshot.vacuum(spark, root, graceMillis = 5000L)
    assert(swept.isEmpty,
      s"clock skew ate the grace window — in-flight file swept: $swept")
    assert(f.exists(inflight))
    // and an orphan genuinely OLDER than the window (on the storage
    // clock) still sweeps: age it by rewinding its real mtime well past
    // grace; the probe-now minus grace must stay ahead of it
    val local = java.nio.file.Paths.get(inflight.toUri.getPath)
    java.nio.file.Files.setLastModifiedTime(local,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 60000L))
    val swept2 = Snapshot.vacuum(spark, root, graceMillis = 5000L)
    assert(swept2.exists(_.endsWith("part-0.parquet")),
      s"aged orphan must sweep under the probe-derived cutoff, got $swept2")
  }
}
