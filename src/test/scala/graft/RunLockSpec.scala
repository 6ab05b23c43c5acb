package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the serial-run lockout shared by Bench and Verify (VERDICT r12
  * item 4). The contract under test:
  *
  *   1. acquire() really takes the OS file lock (a second channel on
  *      the same path cannot lock it — within one JVM the JDK raises
  *      OverlappingFileLockException, which is exactly the signal that
  *      the region is held);
  *   2. acquire() is idempotent within the JVM (Bench and Verify can
  *      both call it in one sbt fork without self-deadlocking);
  *   3. the lock is pinned in object fields, not locals — asserted
  *      structurally via isHeld, which reads the pinned field the
  *      ADVICE-r12 fix introduced (a locals-only lock has no such
  *      field to read; the GC/cleaner release hazard is why).
  *
  * Cross-PROCESS blocking (a second JVM waits instead of co-running)
  * was verified live in r12 (BASELINE r12 s4: queued bench waited
  * 21.0s then completed) — a subprocess JVM here would cost more than
  * it pins, and the same-JVM OverlappingFileLockException proof covers
  * the kernel-side half: the lock is real, held, and file-scoped.
  */
class RunLockSpec extends AnyFunSuite {
  test("acquire takes a real OS lock, idempotently, pinned for the JVM lifetime") {
    val tmp = java.nio.file.Files.createTempFile("graft_runlock_spec", ".lock")
    sys.props("graft.runlock.path") = tmp.toString
    try {
      assert(RunLock.lockPath == tmp, "sys-prop override must redirect the lock path")
      RunLock.acquire("spec")
      assert(RunLock.isHeld, "after acquire the object-level pin must be populated")

      // (1) the OS lock is genuinely held: an independent channel on the
      // same file cannot take it. Same-JVM contention surfaces as
      // OverlappingFileLockException (the JVM tracks its own regions);
      // either that or a null tryLock proves the region is unavailable.
      val probe = java.nio.channels.FileChannel.open(tmp,
        java.nio.file.StandardOpenOption.WRITE)
      try {
        val denied =
          try probe.tryLock() == null
          catch { case _: java.nio.channels.OverlappingFileLockException => true }
        assert(denied, "a second channel must not be able to lock the held file")
      } finally probe.close()

      // (2) idempotent re-acquire: must return immediately, not deadlock
      // on its own lock (Verify calls acquire after Bench already did in
      // shared-JVM builder iterations).
      RunLock.acquire("spec-again")
      assert(RunLock.isHeld)
    } finally {
      sys.props -= "graft.runlock.path"
      // the pin is deliberately never released in-process (JVM exit is
      // the release); the temp file is tiny and the test JVM exits.
    }
  }
}
