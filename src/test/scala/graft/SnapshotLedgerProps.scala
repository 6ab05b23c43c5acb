package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.sources.Snapshot

/** ScalaCheck properties for the txns-ledger algebra — the pure
  * functions the at-least-once replay protection rests on. The specs
  * cover concrete scenarios (SnapshotStreamRecoverySpec, retention
  * smokes); these pin the algebra itself: a merge can only make the
  * replay check STRICTER (never re-admit a replay), and age-based
  * expiry only ever drops stamped-and-stale entries.
  */
object SnapshotLedgerProps extends Properties("SnapshotLedger") {

  private val app: Gen[String] = Gen.oneOf("a", "b", "c", "d", "e").map("app-" + _)
  private val ledger: Gen[Map[String, Long]] =
    Gen.mapOf(Gen.zip(app, Gen.chooseNum(-5L, 100L)))

  property("mergeTxns is commutative") = forAll(ledger, ledger) { (a, b) =>
    Snapshot.mergeTxns(a, b) == Snapshot.mergeTxns(b, a)
  }

  property("mergeTxns is associative") = forAll(ledger, ledger, ledger) { (a, b, c) =>
    Snapshot.mergeTxns(Snapshot.mergeTxns(a, b), c) ==
      Snapshot.mergeTxns(a, Snapshot.mergeTxns(b, c))
  }

  property("mergeTxns is idempotent and identity on empty") = forAll(ledger) { a =>
    Snapshot.mergeTxns(a, a) == a &&
      Snapshot.mergeTxns(a, Map.empty) == a && Snapshot.mergeTxns(Map.empty, a) == a
  }

  property("mergeTxns never regresses recorded progress (replay check only strictens)") =
    forAll(ledger, ledger) { (a, b) =>
      val m = Snapshot.mergeTxns(a, b)
      // every appId survives, at >= the version either side recorded —
      // so any (app, v) that was a replay before the merge stays one
      (a.keySet ++ b.keySet) == m.keySet &&
        a.forall { case (k, v) => m(k) >= v } &&
        b.forall { case (k, v) => m(k) >= v }
    }

  private val entryGen: Gen[Snapshot.TableEntry] = for {
    txns <- ledger
    // stamp only a subset: unstamped entries model pre-stamp builds
    stamped <- Gen.someOf(txns.keys.toSeq)
    stamps <- Gen.sequence[List[(String, Long)], (String, Long)](
      stamped.toList.map(k => Gen.chooseNum(0L, 1000L).map(k -> _)))
  } yield Snapshot.TableEntry(Nil, 0L, "sig", txns = txns, txnStamps = stamps.toMap)

  property("expiredTxnApps drops ONLY stamped entries strictly older than the window") =
    forAll(entryGen, Gen.chooseNum(1L, 500L), Gen.chooseNum(0L, 2000L)) { (e, ret, now) =>
      val doomed = Snapshot.expiredTxnApps(e, ret, now)
      doomed.forall(app => e.txnStamps.get(app).exists(_ < now - ret)) &&
        e.txns.keySet.forall { app =>
          val shouldExpire = e.txnStamps.get(app).exists(_ < now - ret)
          doomed.contains(app) == shouldExpire
        } &&
        // an unstamped entry (unknown age) is NEVER expired
        doomed.forall(e.txnStamps.contains)
    }

  property("expiredTxnApps is monotone: a longer retention never dooms more") =
    forAll(entryGen, Gen.chooseNum(1L, 500L), Gen.chooseNum(1L, 500L),
      Gen.chooseNum(0L, 2000L)) { (e, r1, r2, now) =>
      val (short, long) = if (r1 <= r2) (r1, r2) else (r2, r1)
      Snapshot.expiredTxnApps(e, long, now).subsetOf(
        Snapshot.expiredTxnApps(e, short, now))
    }
}
