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
    * otherwise waits — loudly — up to a BOUNDED deadline
    * (SPARK_GRAFT_LOCK_WAIT_SEC, default 900) and then proceeds
    * WITHOUT the lock, also loudly. The bound exists because the
    * kernel only releases a dead holder's lock; a live-but-HUNG bench
    * JVM would otherwise wedge the driver's one Verify run forever and
    * zero the round's correctness — a worse outcome than the resource
    * contamination the lock prevents. Every normal case (holder
    * finishes, holder crashes) still serializes; only a wedged holder
    * degrades to the loud co-run.
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
      val deadlineMs =
        sys.env.getOrElse("SPARK_GRAFT_LOCK_WAIT_SEC", "900").toLong * 1000L
      val t0 = System.nanoTime()
      lk = awaitOrTimeout(ch, deadlineMs)
      if (lk == null) {
        System.err.println(f"[$what] lock STILL held after ${deadlineMs / 1000}s — the " +
          "holder is alive but not finishing (a crashed holder's lock is kernel-" +
          "released). Proceeding WITHOUT the serial-run lock: this sample may be " +
          "contaminated by the co-running holder; treat its timings accordingly.")
        ch.close()
        return
      }
      System.err.println(f"[$what] lock acquired after ${(System.nanoTime() - t0) / 1e9}%.1fs")
    }
    pinned = (ch, lk)
  }

  /** Poll tryLock until acquired or the deadline passes (null). Pulled
    * out of [[acquire]] so the timeout path is testable against a real
    * external holder (RunLockSpec holds an fcntl lock from a separate
    * process) without touching the JVM-lifetime pin.
    */
  private[graft] def awaitOrTimeout(ch: java.nio.channels.FileChannel,
                                    deadlineMs: Long): java.nio.channels.FileLock = {
    val deadline = System.nanoTime() + deadlineMs * 1000000L
    var lk = ch.tryLock()
    while (lk == null && System.nanoTime() < deadline) {
      Thread.sleep(250)
      lk = ch.tryLock()
    }
    lk
  }
}
