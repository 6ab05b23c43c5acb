package graft

import java.net.URI

import org.apache.hadoop.fs.{FSDataOutputStream, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** Test-only fault-injection filesystem under the `faulty:` scheme —
  * a RawLocalFileSystem whose failures are switched from the companion
  * object. Two jobs:
  *
  *  - `faulty:` has NO AbstractFileSystem binding, so writeManifest's
  *    scheme dispatch takes the LEGACY delete+rename fallback (the
  *    gs:/custom-FS path) — the one branch no local `file:` test can
  *    ever reach;
  *  - the injected faults (mid-write failure on manifest temp files,
  *    rename refusal) let SnapshotFaultInjectionSpec pin the swap's
  *    crash-consistency contract: an old manifest survives a failed
  *    temp write, and the documented non-atomic fallback window leaves
  *    the temp as a loudly-named recovery copy.
  */
class FaultyLocalFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "faulty"
  override def getUri: URI = URI.create("faulty:///")

  private def maybeFaulty(f: Path, out: FSDataOutputStream): FSDataOutputStream =
    if (FaultyLocalFileSystem.failTmpWrites && f.getName.contains(".tmp-")) {
      new FSDataOutputStream(new java.io.FilterOutputStream(out) {
        override def write(b: Array[Byte], off: Int, len: Int): Unit = {
          // land HALF the payload first: the failure mode under test is
          // a PARTIAL temp file, not a clean zero-byte create
          out.write(b, off, len / 2)
          throw new java.io.IOException("injected fault: tmp write died mid-stream")
        }
      }, null)
    } else out

  // BOTH create primitives: RawLocalFileSystem routes the no-permission
  // convenience chain through the (overwrite, bufferSize, …) overload
  // directly, NOT through the permission variant
  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
                      bufferSize: Int, replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream =
    maybeFaulty(f, super.create(f, permission, overwrite, bufferSize,
      replication, blockSize, progress))

  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
                      replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream =
    maybeFaulty(f, super.create(f, overwrite, bufferSize, replication,
      blockSize, progress))

  override def rename(src: Path, dst: Path): Boolean =
    if (FaultyLocalFileSystem.failRename && dst.getName == "manifest.json") false
    else super.rename(src, dst)

  /** RawLocalFileSystem's statuses load permissions LAZILY via
    * `new File(path.toUri)`, which rejects any scheme but `file` —
    * materialize eager statuses so faulty:// paths survive
    * listFiles/LocatedFileStatus construction.
    */
  private def solid(st: org.apache.hadoop.fs.FileStatus): org.apache.hadoop.fs.FileStatus =
    new org.apache.hadoop.fs.FileStatus(st.getLen, st.isDirectory, 1,
      st.getBlockSize, st.getModificationTime, 0L,
      FsPermission.getFileDefault, "graft", "graft", st.getPath)

  override def getFileStatus(p: Path): org.apache.hadoop.fs.FileStatus =
    solid(super.getFileStatus(p))

  override def listStatus(p: Path): Array[org.apache.hadoop.fs.FileStatus] =
    super.listStatus(p).map(solid)
}

object FaultyLocalFileSystem {
  @volatile var failTmpWrites: Boolean = false
  @volatile var failRename: Boolean = false
  def reset(): Unit = { failTmpWrites = false; failRename = false }
}
