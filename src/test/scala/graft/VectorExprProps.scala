package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.MortonInterleave

/** ScalaCheck properties for the pure-JVM halves of the custom
  * Catalyst expressions — no Spark session. The Spark-side twin
  * (codegen vs interpreted vs HOF reference on adversarial columns)
  * is [[VectorExprSpec]]; these pin the arithmetic itself.
  */
object VectorExprProps extends Properties("VectorExpr") {

  private val u32: Gen[Long] = Gen.chooseNum(0L, 0xFFFFFFFFL)
  private val anyLong: Gen[Long] = Gen.chooseNum(Long.MinValue, Long.MaxValue)

  /** Inverse of [[MortonInterleave.spread]]: compact the even bits of
    * z back into the low 32 — an independent reimplementation (reverse
    * mask ladder), not a call back into the production code.
    */
  private def compact(z0: Long): Long = {
    var z = z0 & 0x5555555555555555L
    z = (z | (z >>> 1)) & 0x3333333333333333L
    z = (z | (z >>> 2)) & 0x0F0F0F0F0F0F0F0FL
    z = (z | (z >>> 4)) & 0x00FF00FF00FF00FFL
    z = (z | (z >>> 8)) & 0x0000FFFF0000FFFFL
    z = (z | (z >>> 16)) & 0x00000000FFFFFFFFL
    z
  }

  property("morton round-trips: compact recovers both 32-bit inputs") =
    forAll(u32, u32) { (x, y) =>
      val z = MortonInterleave.interleave(x, y)
      compact(z) == x && compact(z >>> 1) == y
    }

  property("morton ignores upper 32 input bits") =
    forAll(anyLong, anyLong) { (x, y) =>
      MortonInterleave.interleave(x, y) ==
        MortonInterleave.interleave(x & 0xFFFFFFFFL, y & 0xFFFFFFFFL)
    }

  property("morton is injective on the 32-bit domain (distinct inputs, distinct codes)") =
    forAll(u32, u32, u32, u32) { (x1, y1, x2, y2) =>
      val same = (x1, y1) == (x2, y2)
      val codesEqual =
        MortonInterleave.interleave(x1, y1) == MortonInterleave.interleave(x2, y2)
      codesEqual == same
    }

  property("morton locality: incrementing x by 1 changes only even-position bits") =
    forAll(Gen.chooseNum(0L, 0xFFFFFFFEL), u32) { (x, y) =>
      val a = MortonInterleave.interleave(x, y)
      val b = MortonInterleave.interleave(x + 1, y)
      // y's odd bits must be untouched by an x step
      (a & 0xAAAAAAAAAAAAAAAAL) == (b & 0xAAAAAAAAAAAAAAAAL)
    }
}
