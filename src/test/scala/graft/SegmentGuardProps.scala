package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.sources.{Snapshot, SnapshotCatalog}

/** The catalog's `safeSegment` (Boolean gate → NoSuchTable/Namespace)
  * and the writers' `requireSafeSegment` (loud IllegalArgumentException
  * in Snapshot.export and the DSv2 options path) implement the SAME
  * path-segment predicate independently. If they ever drift, one side
  * accepts a name the other rejects — e.g. the catalog lists a tag the
  * export guard would never have created, or a writer commits a
  * manifest the catalog cannot address. This property pins the two
  * predicates EQUAL over strings weighted toward the dangerous shapes
  * (separators, NUL, dots, empties), so a future edit to one must
  * consciously touch both.
  */
object SegmentGuardProps extends Properties("SegmentGuard") {

  private val catalog = new SnapshotCatalog

  private val seg: Gen[String] = Gen.frequency(
    4 -> Gen.alphaNumStr,
    1 -> Gen.const(""),
    1 -> Gen.const("."),
    1 -> Gen.const(".."),
    1 -> Gen.const("..."),
    2 -> Gen.nonEmptyListOf(Gen.oneOf('a', 'Z', '0', '/', '\\', '\u0000', '.', '-', '_', ' '))
      .map(_.mkString))

  private def writerAccepts(v: String): Boolean =
    try { Snapshot.requireSafeSegment("segment", v); true }
    catch { case _: IllegalArgumentException => false }

  property("catalog safeSegment and writer requireSafeSegment agree") =
    forAll(seg) { v =>
      catalog.safeSegment(v) == writerAccepts(v)
    }

  property("the dangerous shapes are rejected by BOTH") =
    forAll(Gen.oneOf("", ".", "..", "a/b", "a\\b", "a\u0000b", "../x", "x/..")) { v =>
      !catalog.safeSegment(v) && !writerAccepts(v)
    }
}
