package graft

/** Serial-run lockout shared by the driver-contract mains (Bench AND
  * Verify): two measured runs sharing one host measure each other, not
  * the build — an overlapped bench pair in r12 produced two totals
  * that had to be discarded as contaminated, and a host-phase storm
  * during a Verify run would surface as spurious per-query `err`
  * entries and zero the round's correctness the same way. An OS file
  * lock (NOT a marker file: the kernel releases it on process death,
  * so a crashed run can never wedge a later one) serializes
  * invocations: a second run WAITS, loudly, rather than co-running —
  * or aborting, which would cost the caller its round sample.
  *
  * The channel and lock are pinned in OBJECT-LEVEL fields for the
  * process lifetime — as locals they would become unreachable right
  * after acquisition, and once JIT liveness analysis agrees, the JDK's
  * FileDescriptor cleaner may close the channel mid-run, silently
  * releasing the OS lock the run still depends on (ADVICE r12).
  * Deliberately never released in-process: the JVM exit is the release.
  */
object RunLock {
  @volatile private var pinned: (java.nio.channels.FileChannel, java.nio.channels.FileLock) = _

  /** True once this JVM holds the serial-run lock. */
  def isHeld: Boolean = pinned != null

  /** Path every graft measured run serializes on (one per host tmpdir).
    * `graft.runlock.path` overrides it so the spec can exercise the
    * acquire path without contending with a real bench's lock.
    */
  def lockPath: java.nio.file.Path = sys.props.get("graft.runlock.path")
    .map(java.nio.file.Paths.get(_))
    .getOrElse(java.nio.file.Paths.get(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft_bench.lock"))

  /** Acquire (idempotent within the JVM): returns immediately if free,
    * otherwise blocks until the holder exits, logging the wait so an
    * operator sees WHY the run hasn't started.
    */
  def acquire(what: String): Unit = synchronized {
    if (pinned != null) return
    val ch = java.nio.channels.FileChannel.open(lockPath,
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.WRITE)
    var lk = ch.tryLock()
    if (lk == null) {
      System.err.println(s"[$what] another measured run holds $lockPath — waiting for it " +
        "to finish (measured runs must be strictly serial: concurrent runs " +
        "contaminate each other's samples)")
      val t0 = System.nanoTime()
      lk = ch.lock() // blocks until the holder exits; kernel-released on death
      System.err.println(f"[$what] lock acquired after ${(System.nanoTime() - t0) / 1e9}%.1fs")
    }
    pinned = (ch, lk)
  }
}
