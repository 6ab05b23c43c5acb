package graft

import org.apache.spark.sql.sources._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.sources.{Snapshot, SnapshotFilePruning}

/** Soundness of the driver-side manifest pruning: a file whose rows
  * contain ANY filter-satisfying row must never be pruned. This is the
  * one invariant a stats-pruning layer can silently violate at scale —
  * a pruned file's rows are gone with no residual filter to notice —
  * so it gets the adversarial treatment: random concrete files, stats
  * derived exactly as the writer derives them (min/max of non-null
  * values), random And/Or/comparison/In filter trees, and a reference
  * evaluator that knows nothing about pruning.
  */
object SnapshotPruningProps extends Properties("SnapshotPruning") {

  // 1000 cases, not the default 100: the killable mutants here are
  // exact-boundary bugs (pruning when v == max), and a depth-3 random
  // tree hits a specific leaf-boundary coincidence only every few
  // hundred cases — 100 demonstrably let a strict-> bound survive
  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(1000)

  private val cols = Seq("x", "y")
  // tiny value domain on purpose: boundary collisions (v == min,
  // v == max, empty In) happen constantly instead of almost never
  private val value: Gen[Long] = Gen.chooseNum(-3L, 3L)

  private type RowV = Map[String, Option[Long]] // None = NULL cell

  private val rowGen: Gen[RowV] = Gen.sequence[List[(String, Option[Long])], (String, Option[Long])](
    cols.toList.map(c => Gen.option(value).map(c -> _))).map(_.toMap)

  private val fileGen: Gen[List[RowV]] = Gen.nonEmptyListOf(rowGen)

  private def statsOf(rows: List[RowV]): Map[String, Snapshot.ColumnStats] =
    cols.flatMap { c =>
      val vs = rows.flatMap(_(c))
      if (vs.isEmpty) None
      else Some(c -> Snapshot.ColumnStats(vs.min, vs.max))
    }.toMap

  private val leafGen: Gen[Filter] = for {
    c <- Gen.oneOf(cols)
    v <- value
    f <- Gen.oneOf[Filter](
      EqualTo(c, v), GreaterThan(c, v), GreaterThanOrEqual(c, v),
      LessThan(c, v), LessThanOrEqual(c, v),
      In(c, Array.empty[Any]), In(c, Array[Any](v, v + 1, v - 3)),
      IsNull(c), IsNotNull(c))
  } yield f

  private def treeGen(depth: Int): Gen[Filter] =
    if (depth <= 0) leafGen
    else Gen.frequency(
      2 -> leafGen,
      1 -> (for { l <- treeGen(depth - 1); r <- treeGen(depth - 1) } yield And(l, r)),
      1 -> (for { l <- treeGen(depth - 1); r <- treeGen(depth - 1) } yield Or(l, r)))

  /** Reference evaluation on one concrete row — SQL ternary logic
    * collapsed to "definitely matches": null comparisons are false.
    */
  private def rowMatches(row: RowV, f: Filter): Boolean = f match {
    case And(l, r) => rowMatches(row, l) && rowMatches(row, r)
    case Or(l, r) => rowMatches(row, l) || rowMatches(row, r)
    case EqualTo(c, v) => row(c).contains(v.asInstanceOf[Long])
    case GreaterThan(c, v) => row(c).exists(_ > v.asInstanceOf[Long])
    case GreaterThanOrEqual(c, v) => row(c).exists(_ >= v.asInstanceOf[Long])
    case LessThan(c, v) => row(c).exists(_ < v.asInstanceOf[Long])
    case LessThanOrEqual(c, v) => row(c).exists(_ <= v.asInstanceOf[Long])
    case In(c, vs) => vs.exists(v => row(c).contains(v.asInstanceOf[Long]))
    case IsNull(c) => row(c).isEmpty
    case IsNotNull(c) => row(c).isDefined
    case other => sys.error(s"unexpected filter $other")
  }

  property("SOUND: a file containing a matching row is never pruned") =
    forAll(fileGen, treeGen(3)) { (rows, f) =>
      val anyMatch = rows.exists(rowMatches(_, f))
      !anyMatch || SnapshotFilePruning.mayMatch(statsOf(rows), f)
    }

  property("stat-less columns never prune (empty stats pass everything)") =
    forAll(treeGen(3)) { f =>
      SnapshotFilePruning.mayMatch(Map.empty, f)
    }

  property("EFFECTIVE: a fully-disjoint equality IS pruned (the test can fail)") =
    forAll(fileGen) { rows =>
      val st = statsOf(rows)
      // pick a value strictly above every recorded max — pruning must fire
      st.get("x").forall(s => !SnapshotFilePruning.mayMatch(st, EqualTo("x", s.max + 1)))
    }
}
