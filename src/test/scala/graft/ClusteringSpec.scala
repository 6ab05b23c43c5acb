package graft

import org.apache.spark.sql.functions._
import graft.operators.Clustering
import graft.sources.Tables

/** Deterministic k-means invariants: Lloyd monotonicity, vector
  * conservation, and bit-identical results under any partition layout
  * (the property float-math k-means cannot have).
  */
class ClusteringSpec extends SparkSpec {

  test("kmeans: sizes conserve vectors; Lloyd iterations never increase inertia") {
    val out = q("q_cluster_kmeans").cache()
    val n = Tables.embeddings(spark, sf).count()
    assert(out.agg(sum("n_vecs")).head.getLong(0) == n)
    // inertia under init centroids >= inertia after 2 Lloyd rounds
    val pts = Clustering.points(spark, sf).cache()
    val a0 = Clustering.assign(pts, Clustering.initCentroids(spark, sf))
    val i0 = a0.agg(sum("dist")).head.getLong(0)
    val c1 = Clustering.update(pts, a0)
    val i1 = Clustering.assign(pts, c1).agg(sum("dist")).head.getLong(0)
    val iFinal = out.agg(sum("inertia_q")).head.getLong(0)
    assert(i1 <= i0, s"first Lloyd round increased inertia: $i0 -> $i1")
    assert(iFinal <= i1, s"second Lloyd round increased inertia: $i1 -> $iFinal")
  }

  test("kmeans: result is partition-layout independent") {
    val base = q("q_cluster_kmeans").collect().toSeq
    val pts = Clustering.points(spark, sf)
    Seq(1, 7).foreach { parts =>
      var cent = Clustering.initCentroids(spark, sf)
      val shuffled = pts.repartition(parts)
      for (_ <- 1 to 2) cent = Clustering.update(shuffled, Clustering.assign(shuffled, cent))
      val out = Clustering.assign(shuffled, cent)
        .groupBy(col("cid"))
        .agg(count(lit(1)).as("n_vecs"), sum(col("dist")).as("inertia_q"))
        .orderBy("cid").collect().toSeq
      assert(out == base, s"layout $parts diverged")
    }
  }

  test("kmeans on K block-cloned embeddings is the base result with counts and inertia ×K") {
    // the rehearsal's (kmeans_inflated) linearity claim as a CORRECTNESS
    // invariant: block re-keying (vec_id + rep·stride) preserves id order
    // inside clone 1, so init picks the SAME four vectors, and every clone
    // is an identical value-multiset — assignments replicate per original
    // and the integer centroid means are unchanged, so each cluster must
    // report exactly n_vecs×K and inertia_q×K
    val k = 3
    val emb = Tables.embeddings(spark, sf)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val base = rows(Clustering.kmeansImpl(emb))
    val stride = emb.agg(max("vec_id")).head.getLong(0) + 1L
    val embK = emb.withColumn("rep", explode(expr(s"sequence(1, $k)")))
      .withColumn("vec_id", col("vec_id") + col("rep") * lit(stride))
      .drop("rep")
    val got = rows(Clustering.kmeansImpl(embK))
    assert(base.nonEmpty)
    assert(got == base.map { case (cid, n, in) => (cid, n * k, in * k) },
      "clone inflation must scale every cluster's size and inertia by exactly K")
  }

  test("kmeans: emptied centroids leave the candidate set (literal-assign MaxValue path)") {
    // four identical vectors + two distant ones: init takes the four
    // identical vectors (ids 0-3), so round 1 has four coincident
    // centroids, every point ties to cid 0 (argmin breaks ties low),
    // cids 1-3 empty, and the next round's centroid map carries cid 0
    // alone — the absent-centroid MaxValue candidates must never win
    // and the loop must not throw on a shrunken map
    import spark.implicits._
    val emb = Seq(
      (0L, Array(0f, 0f)), (1L, Array(0f, 0f)), (2L, Array(0f, 0f)),
      (3L, Array(0f, 0f)), (4L, Array(10f, 10f)), (5L, Array(10f, 10f))
    ).toDF("vec_id", "embedding")
    val out = Clustering.kmeansImpl(emb).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(0L), "only cid 0 should survive")
    assert(out.head.getLong(1) == 6L, "all six vectors must land in cid 0")
  }

  test("kmeans on an empty embeddings table returns an empty report, not a plan error") {
    import spark.implicits._
    val emb = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val out = Clustering.kmeansImpl(emb)
    assert(out.columns.toSeq == Seq("cid", "n_vecs", "inertia_q"))
    assert(out.count() == 0L)
  }

  test("kmeans: a null embedding element skips the dimension, matching the frame formulation") {
    // vec 4's element 1 is null; the literal-centroid assign must charge
    // only the non-null dims — identical to the pivoted frame's
    // null-cell skip and the oracle's inner-join drop. Cross-check the
    // two formulations end-to-end on the ragged input.
    import spark.implicits._
    val emb = Seq(
      (0L, Array[java.lang.Float](0f, 0f)), (1L, Array[java.lang.Float](1f, 1f)),
      (2L, Array[java.lang.Float](10f, 10f)), (3L, Array[java.lang.Float](11f, 11f)),
      (4L, Array[java.lang.Float](10f, null))
    ).toDF("vec_id", "embedding")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val lit = rows(Clustering.kmeansImpl(emb))
    // frame formulation of the same two Lloyd rounds + final report
    val pts = Clustering.pointsOf(emb)
    var cent = Clustering.initCentroidsOf(emb)
    for (_ <- 1 to 2) cent = Clustering.update(pts, Clustering.assign(pts, cent))
    val frame = Clustering.assign(pts, cent)
      .groupBy(col("cid"))
      .agg(count(org.apache.spark.sql.functions.lit(1)).as("n_vecs"),
        sum(col("dist")).as("inertia_q"))
      .select(col("cid").cast("long").as("cid"), col("n_vecs"), col("inertia_q"))
      .orderBy("cid")
    assert(lit == rows(frame), "literal and frame formulations diverged on a null element")
  }

  test("assignLit: a present centroid null at every dim of a point loses the argmin, not wins with null dist") {
    // Centroid 1 is PRESENT in the map but its mean is null at both of
    // vec 0's dims (all-member-null column), and centroid 2's array is
    // too short for vec 1's only dim (ragged out-of-range get). In both
    // cases the point's distance sum to that centroid is null; least()
    // over structs ranks a null dist field FIRST on this Spark build,
    // so without the coalesce-to-MaxValue the degenerate centroid would
    // STEAL the argmin with dist=null — diverging from assign()'s
    // pivoted-frame coalesce and from the oracle's inner-join drop.
    import spark.implicits._
    val pts = Seq(
      (0L, 0, 2000000L), (0L, 1, 2000000L), // vec 0: dims 0,1
      (1L, 1, 3000000L)                      // vec 1: dim 1 only
    ).toDF("vec_id", "d", "q")
    val cent = Map(
      0 -> Array[java.lang.Long](2000000L, 3000000L),
      1 -> Array[java.lang.Long](null, null), // null at every dim of vec 0
      2 -> Array[java.lang.Long](9000000L)    // out-of-range for vec 1's d=1
    )
    val out = Clustering.assignLit(pts, cent).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    // vec 0: d(c0) = 0 + 1e6²; c1 null-sum must coalesce to +∞, not win
    assert(out(0L) == (0, 1000000L * 1000000L),
      s"vec 0 must go to centroid 0, got ${out(0L)}")
    // vec 1: d(c0) = 0 at dim 1; c2's short array must coalesce, not win
    assert(out(1L) == (0, 0L), s"vec 1 must go to centroid 0, got ${out(1L)}")
  }

  test("kmeans: every vector is assigned to its genuinely nearest final centroid") {
    // recompute distances naively on the driver from the quantized points
    val pts = Clustering.points(spark, sf).collect()
      .groupBy(_.getLong(0)).map { case (v, rows) =>
        v -> rows.map(r => r.getInt(1) -> r.getLong(2)).toMap
      }
    var cent = Clustering.initCentroids(spark, sf)
    val ptsDf = Clustering.points(spark, sf)
    for (_ <- 1 to 2) cent = Clustering.update(ptsDf, Clustering.assign(ptsDf, cent))
    val cents = cent.collect().groupBy(_.getInt(0)).map { case (c, rows) =>
      c -> rows.map(r => r.getInt(1) -> r.getLong(2)).toMap
    }
    val asg = Clustering.assign(ptsDf, cent).collect()
    asg.foreach { r =>
      val (v, chosen, dist) = (r.getLong(0), r.getInt(1), r.getLong(2))
      val dists = cents.map { case (c, cd) =>
        c -> pts(v).map { case (d, qv) => val df = qv - cd(d); df * df }.sum
      }
      val best = dists.minBy { case (c, dd) => (dd, c) }
      assert(best._1 == chosen && best._2 == dist,
        s"vec $v: assigned $chosen@$dist, nearest is ${best._1}@${best._2}")
    }
  }
}
