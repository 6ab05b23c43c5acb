package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.operators.NearDup

/** ScalaCheck properties for the deterministic hash family behind the
  * near-dup operators (SURVEY §5.5) — pure functions, no Spark.
  */
object NearDupProps extends Properties("NearDup") {

  private val token: Gen[String] = Gen.choose(1, 8).flatMap(n =>
    Gen.stringOfN(n, Gen.alphaLowerChar))
  private val doc: Gen[String] = Gen.choose(1, 60).flatMap(n =>
    Gen.listOfN(n, token).map(_.mkString(" ")))

  property("jaccard(a, a) == 1") = forAll(doc) { d =>
    NearDup.jaccard(NearDup.shingles(d).toSet, NearDup.shingles(d).toSet) == 1.0
  }

  property("jaccard symmetric and in [0, 1]") = forAll(doc, doc) { (a, b) =>
    val sa = NearDup.shingles(a).toSet
    val sb = NearDup.shingles(b).toSet
    val j1 = NearDup.jaccard(sa, sb)
    val j2 = NearDup.jaccard(sb, sa)
    j1 == j2 && j1 >= 0.0 && j1 <= 1.0
  }

  property("minhash signature is deterministic and 64 long") = forAll(doc) { d =>
    val s1 = NearDup.minhashSignature(d)
    val s2 = NearDup.minhashSignature(d)
    s1.length == NearDup.NumHashes && s1.sameElements(s2)
  }

  property("minhash collision fraction approximates jaccard within 0.35") =
    forAll(doc, Gen.choose(0, 5)) { (d, nEdits) =>
      val toks = d.split(" ")
      val mutated = toks.zipWithIndex.map { case (t, i) =>
        if (i < nEdits) t.reverse + "x" else t
      }.mkString(" ")
      val sa = NearDup.shingles(d).toSet
      val sb = NearDup.shingles(mutated).toSet
      val j = NearDup.jaccard(sa, sb)
      val s1 = NearDup.minhashSignature(d)
      val s2 = NearDup.minhashSignature(mutated)
      val frac = s1.zip(s2).count { case (x, y) => x == y }.toDouble / s1.length
      math.abs(frac - j) <= 0.35 // 64 hashes → stddev ~ sqrt(j(1-j)/64) ≲ 0.0625; 0.35 ≈ 5σ+
    }

  property("simhash: hamming(a,a)=0, hamming symmetric, bounded by 64") =
    forAll(doc, doc) { (a, b) =>
      val ha = NearDup.simhash64(a)
      val hb = NearDup.simhash64(b)
      val d = java.lang.Long.bitCount(ha ^ hb)
      java.lang.Long.bitCount(ha ^ NearDup.simhash64(a)) == 0 && d >= 0 && d <= 64
    }

  property("shingles: k-token docs yield n-k+1 shingles; short docs yield 1") =
    forAll(doc) { d =>
      val n = d.split(" ").length
      val sh = NearDup.shingles(d)
      if (n < NearDup.ShingleK) sh.length == 1
      else sh.length == n - NearDup.ShingleK + 1
    }

  property("dedup idempotence: distinct-by-text keeps keepers stable") =
    forAll(Gen.listOf(doc)) { docs =>
      val withIds = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      def dedup(xs: Seq[(Long, String)]): Seq[(Long, String)] =
        xs.groupBy(_._2).map { case (t, g) => (g.map(_._1).min, t) }.toSeq.sortBy(_._1)
      val once = dedup(withIds)
      dedup(once) == once
    }
}
