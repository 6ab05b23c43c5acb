package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Multimodal plumbing: binary columns through partition-wise typed
  * stages, on in-memory blobs and the contract query.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("extractFeatures computes byte stats over opaque blobs") {
    val blobs = Seq(
      (1L, Array[Byte](0, 1, 2, 3)),
      (2L, Array[Byte](10, 20)),
      (3L, Array.empty[Byte])
    ).toDF("id", "media")
    val feats = Multimodal.extractFeatures(spark, blobs, "id", "media")
      .orderBy("doc_id").collect()
    assert(feats.map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3))).toSeq ==
      Seq((1L, 4, 6L, 3), (2L, 2, 30L, 20), (3L, 0, 0L, 0)))
  }

  test("sampleChunks keeps every stride-th fixed-size chunk") {
    val blobs = Seq((7L, (0 until 100).map(_.toByte).toArray)).toDF("id", "media")
    val chunks = Multimodal.sampleChunks(spark, blobs, "id", "media", chunkSize = 10, stride = 3)
      .orderBy("chunk_idx").collect()
    assert(chunks.map(_.getInt(1)).toSeq == Seq(0, 3, 6, 9))
    assert(chunks.forall(_.getAs[Array[Byte]](2).length == 10))
  }

  test("content-addressed dedup reports only real duplicate groups, consistently") {
    val df = q("q_multimodal_dedup").cache()
    assert(df.where(col("n_copies") < 2).count() == 0)
    assert(df.where(col("bytes_saved") =!=
      (col("n_copies") - 1) * col("seg_bytes")).count() == 0)
    assert(df.select("digest").distinct().count() == df.count())
    // copies accounted by digest groups match a direct prefix count
    val direct = graft.sources.Tables.documents(spark, sf)
      .groupBy(substring(col("text"), 1, 64)).count()
      .where(col("count") > 1)
    assert(df.count() == direct.count())
  }

  test("resize halves the stub geometry and samples a quarter of bytes") {
    val df = q("q_multimodal_resize").cache()
    assert(df.count() > 0)
    df.collect().foreach { r =>
      val (side, newSide) = (r.getInt(1), r.getInt(2))
      val (orig, newBytes) = (r.getLong(3), r.getLong(4))
      assert(side.toLong * side <= orig && (side + 1).toLong * (side + 1) > orig,
        "side is floor(sqrt(bytes))")
      assert(newSide == side / 2 && newBytes == newSide.toLong * newSide)
      // stride-4 sample sum of printable ASCII is bounded per sampled byte
      val sampled = (orig + 3) / 4
      assert(r.getLong(5) <= sampled * 127 && r.getLong(5) >= sampled * 9)
    }
  }

  test("contract query: n_bytes equals documents.n_chars (ASCII corpus)") {
    val feats = q("q_multimodal_features")
    val joined = feats.join(graft.sources.Tables.documents(spark, sf), Seq("doc_id"))
    assert(joined.where(col("n_bytes") =!= col("n_chars")).count() == 0)
  }

  test("a null media blob fails loudly with the offending id named") {
    // an unguarded mapPartitions would NPE deep in the executor with no
    // row context; the stage contract names the id instead
    import spark.implicits._
    val df = Seq((1L, "ok".getBytes("UTF-8")), (2L, null: Array[Byte]))
      .toDF("doc_id", "media")
    val e = intercept[Exception] {
      Multimodal.extractFeatures(spark, df, "doc_id", "media").collect()
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(e).exists(m => m.contains("null media blob") && m.contains("id=2")),
      s"expected the named-blob rejection, got: ${chain(e).mkString(" | ")}")
  }

  test("phash: bands recompose the signature; hamming<=3 pairs always share a band") {
    val rows = q("q_multimodal_phash").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (hi, lo) = (r.getLong(1), r.getLong(2))
      assert((hi >> 32) == 0 && (lo >> 32) == 0, "words must be 32-bit")
      assert(r.getLong(3) == (lo & 0xffff) && r.getLong(4) == ((lo >> 16) & 0xffff) &&
        r.getLong(5) == (hi & 0xffff) && r.getLong(6) == ((hi >> 16) & 0xffff))
    }
    // the LSH guarantee the bands exist for: d(sig) <= 3 => >=1 identical band
    val sigs = rows.map(r => (r.getLong(1), r.getLong(2),
      Seq(r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
    for (i <- sigs.indices; j <- (i + 1) until sigs.length) {
      val d = java.lang.Long.bitCount(sigs(i)._1 ^ sigs(j)._1) +
        java.lang.Long.bitCount(sigs(i)._2 ^ sigs(j)._2)
      if (d <= 3)
        assert(sigs(i)._3.zip(sigs(j)._3).exists { case (a, b) => a == b },
          s"pair $i,$j hamming $d shares no band")
    }
  }

  test("phash bucket comparison is exact past the 64-bit product wrap (gigabyte blobs)") {
    // phashWords compares blockSum·L vs total·blockLen; with raw long
    // arithmetic BOTH products wrap silently once a blob passes
    // ~1.5 GB (≈4·L² crosses 2⁶³ inside the 2 GB array cap), flipping
    // signature bits with no error — wrong dedup groups at exactly the
    // blob sizes a video pipeline ships. productGreater must agree
    // with exact BigInt arithmetic over the whole reachable domain,
    // INCLUDING the wrap window no giant-array test could afford to
    // build.
    import graft.operators.Multimodal.productGreater
    def exact(s: Long, l: Long, t: Long, d: Long): Boolean =
      BigInt(s) * BigInt(l) > BigInt(t) * BigInt(d)
    // the realistic 1.9 GB-blob shape: L just under the array cap,
    // block sums ~255·L/64 — raw products ≈ 4·L² ≈ 1.6e19 > 2⁶³
    val L = 2000000000L
    val blockLen = L / 64
    val sHigh = 255L * (blockLen + 1) // all-0xff block
    val sLow = 200L * blockLen
    val totalMid = 220L * L / 64 * 64 / 64 // arbitrary mid-range total
    val cases = Seq(
      (sHigh, L, totalMid, blockLen),            // wrap on both sides, true
      (sLow, L, 255L * L, blockLen),             // wrap, false (max total)
      (sHigh, L, sHigh, L),                      // equal products under wrap → strict false
      (0L, L, 0L, blockLen),                     // zeros
      (1L, 1L, 1L, 1L),                          // trivial equal
      (3L, 5L, 7L, 2L),                          // small true
      (Long.MaxValue / 2, 3L, Long.MaxValue / 3, 4L)) // asymmetric wrap
    for ((s, l, t, d) <- cases)
      assert(productGreater(s, l, t, d) == exact(s, l, t, d),
        s"productGreater($s,$l,$t,$d) diverged from exact arithmetic")
    // seeded sweep across the reachable domain (s,t ≤ 255·L; l,d ≤ 2³¹):
    // deterministic, covers thousands of wrap and non-wrap points
    val rnd = new scala.util.Random(42)
    var i = 0
    while (i < 5000) {
      val l = math.abs(rnd.nextLong()) % 2147483647L
      val d0 = math.max(1L, l / 64)
      val s = (math.abs(rnd.nextLong()) % 256L) * math.max(1L, d0)
      val t = (math.abs(rnd.nextLong()) % 256L) * math.max(1L, l)
      assert(productGreater(s, l, t, d0) == exact(s, l, t, d0),
        s"seeded case $i: productGreater($s,$l,$t,$d0) diverged")
      i += 1
    }
  }
}
