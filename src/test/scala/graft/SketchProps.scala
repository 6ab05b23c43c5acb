package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.{forAll, throws}

import graft.functions.{BitmapDistinct, CountMin, HllSketch, QuantileSketch}

/** ScalaCheck properties for the sketch aggregators' merge algebra —
  * the pure-JVM core the distributed claims rest on. FrontierSpec /
  * RelationalSpec prove partition-layout independence THROUGH Spark on
  * fixture data; these pin the algebra itself on random inputs with
  * arbitrary splits, including the spots a fixture never stresses:
  * BitmapDistinct's ragged-buffer merge (the grown/short word-array
  * swap), CountMin's domain guard, and bottom-k sample merges where
  * both sides carry the same ids.
  *
  * Aggregator buffers are MUTABLE (reduce/merge update in place, the
  * Spark contract), so every property folds into fresh zero() buffers
  * and never reuses a folded buffer across sides.
  */
object SketchProps extends Properties("SketchAlgebra") {

  // ---- CountMin ------------------------------------------------------
  private val cmKeys: Gen[List[Long]] =
    Gen.listOf(Gen.chooseNum(0L, 1000000L))

  private def cmFold(keys: Seq[Long]): Array[Long] = {
    val a = new CountMin
    keys.foldLeft(a.zero)((b, k) => a.reduce(b, k))
  }

  property("countmin: split-merge grid equals the one-pass grid") =
    forAll(cmKeys, cmKeys) { (xs, ys) =>
      val m = new CountMin
      m.merge(cmFold(xs), cmFold(ys)).toSeq == cmFold(xs ++ ys).toSeq
    }

  property("countmin: merge is commutative (elementwise sum)") =
    forAll(cmKeys, cmKeys) { (xs, ys) =>
      val m = new CountMin
      m.merge(cmFold(xs), cmFold(ys)).toSeq == m.merge(cmFold(ys), cmFold(xs)).toSeq
    }

  property("countmin: row-min estimate never undercounts any key") =
    forAll(cmKeys) { xs =>
      val grid = cmFold(xs)
      val exact = xs.groupBy(identity).view.mapValues(_.size.toLong)
      exact.forall { case (k, n) =>
        (0 until CountMin.D).map(j => grid(j * CountMin.W + CountMin.bucket(j, k))).min >= n
      }
    }

  property("countmin: out-of-domain keys are rejected loudly") =
    forAll(Gen.oneOf(Gen.chooseNum(Long.MinValue, -1L),
      Gen.chooseNum(CountMin.MaxKey + 1, Long.MaxValue))) { bad =>
      throws(classOf[IllegalArgumentException]) {
        val a = new CountMin
        a.reduce(a.zero, bad)
      }
    }

  // ---- BitmapDistinct -------------------------------------------------
  // mixed magnitudes force RAGGED buffers: a side holding only small ids
  // stays at the 16-word zero() length while a side with a ~5e5 id grows
  // to ~8k words — the merge must OR into the longer array regardless of
  // argument order
  private val bmIds: Gen[List[Long]] = Gen.listOf(Gen.frequency(
    6 -> Gen.chooseNum(0L, 1000L),
    1 -> Gen.chooseNum(400000L, 500000L)))

  private def bmFold(ids: Seq[Long]): Array[Long] = {
    val a = new BitmapDistinct
    ids.foldLeft(a.zero)((b, k) => a.reduce(b, k))
  }

  property("bitmap: ragged split-merge count equals the distinct count") =
    forAll(bmIds, bmIds) { (xs, ys) =>
      val m = new BitmapDistinct
      m.finish(m.merge(bmFold(xs), bmFold(ys))) == (xs ++ ys).distinct.size.toLong
    }

  property("bitmap: merge is idempotent (duplicate delivery is harmless)") =
    forAll(bmIds) { xs =>
      val m = new BitmapDistinct
      m.finish(m.merge(bmFold(xs), bmFold(xs))) == xs.distinct.size.toLong
    }

  property("bitmap: ids outside [0, MaxId] are rejected loudly") =
    forAll(Gen.oneOf(Gen.chooseNum(Long.MinValue, -1L),
      Gen.chooseNum(BitmapDistinct.MaxId + 1, Long.MaxValue))) { bad =>
      throws(classOf[IllegalArgumentException]) {
        val a = new BitmapDistinct
        a.reduce(a.zero, bad)
      }
    }

  // ---- HllSketch -------------------------------------------------------
  private val hllIds: Gen[List[Long]] =
    Gen.listOf(Gen.chooseNum(Long.MinValue, Long.MaxValue))

  private def hllFold(ids: Seq[Long]): Array[Byte] = {
    val a = new HllSketch
    ids.foldLeft(a.zero)((b, k) => a.reduce(b, k))
  }

  property("hll: split-merge registers are BIT-EQUAL to the one-pass registers") =
    forAll(hllIds, hllIds) { (xs, ys) =>
      val m = new HllSketch
      m.merge(hllFold(xs), hllFold(ys)).toSeq == hllFold(xs ++ ys).toSeq
    }

  property("hll: registers are a pure function of the value SET") =
    forAll(hllIds) { xs =>
      hllFold(xs ++ xs).toSeq == hllFold(xs.distinct).toSeq
    }

  // ---- QuantileSketch --------------------------------------------------
  // unique ids (the documented sample-key contract); values arbitrary
  private val qsRows: Gen[List[(Long, Double)]] =
    Gen.listOf(Gen.zip(Gen.chooseNum(0L, 1000000L), Gen.chooseNum(-1e6, 1e6)))
      .map(_.groupBy(_._1).map { case (id, rs) => id -> rs.head._2 }.toList)

  private def qsFold(sk: QuantileSketch, rows: Seq[(Long, Double)]) =
    rows.foldLeft(sk.zero)((b, r) => sk.reduce(b, (r._1, r._2)))

  property("quantile sketch: any split merges to the global bottom-k sample") =
    forAll(qsRows, Gen.chooseNum(0, 20)) { (rows, cut) =>
      val sk = new QuantileSketch(16, 0.5)
      val (xs, ys) = rows.splitAt(math.min(cut, rows.length))
      val merged = sk.merge(qsFold(sk, xs), qsFold(sk, ys))
      merged == qsFold(sk, rows) &&
        sk.finish(merged) == sk.finish(qsFold(sk, scala.util.Random.javaRandomToRandom(
          new java.util.Random(42L)).shuffle(rows)))
    }
}
