package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Extracted feature row for an opaque media blob. */
case class MediaFeatures(doc_id: Long, n_bytes: Int, sum_bytes: Long, max_byte: Int)

/** Result row of the resize stage: original/new dimensions and the
  * sampled-byte checksum standing in for the resized payload digest.
  */
case class ResizedMedia(doc_id: Long, orig_side: Int, new_side: Int,
                        orig_bytes: Long, new_bytes: Long, sample_sum: Long)

/** Multimodal-column plumbing: media as opaque `binary` columns with
  * typed metadata, processed by per-partition batch functions — the
  * Scala analogue of a Pandas-UDF/mapInPandas stage.
  *
  * The DECODE STEP IS A STUB: this container has no image/audio
  * codecs, so `decodeStub` derives deterministic pseudo-features from
  * raw bytes (byte-count / byte-sum / max-byte). The Spark-side
  * plumbing — binary column handling, partition-wise iteration, typed
  * output schema, no driver materialization — is real and is what a
  * production decode (JNI/ImageIO inside the same mapPartitions) would
  * reuse unchanged.
  *
  * No binary fixtures exist (FIXTURES.md), so the contract query
  * derives its blob column by UTF-8-encoding `documents.text` —
  * byte-level semantics stay oracle-checkable because the corpus is
  * pure ASCII (byte value == character code).
  */
object Multimodal {

  /** Loud contract for the typed media stages: a NULL blob reaching a
    * mapPartitions decode NPEs deep inside an executor with no row
    * context — name the offending id instead. SQL-null propagation is
    * not available here (the typed outputs are primitive case-class
    * fields), so the honest library behavior is an explicit, named
    * rejection: filter nulls or coalesce a placeholder upstream.
    */
  private def requireBlob(id: Long, bytes: Array[Byte]): Array[Byte] = {
    require(bytes != null,
      s"null media blob for id=$id — filter nulls (or coalesce a placeholder) " +
        "before the decode stage")
    bytes
  }

  /** Stand-in for a real media decoder (e.g. JPEG → pixels). */
  def decodeStub(bytes: Array[Byte]): (Int, Long, Int) = {
    var sum = 0L
    var max = 0
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      sum += b
      if (b > max) max = b
      i += 1
    }
    (bytes.length, sum, max)
  }

  /** Partition-wise feature extraction over an (id, media: binary)
    * frame — the mapInPandas-shaped stage.
    */
  def extractFeatures(s: SparkSession, df: DataFrame,
                      idCol: String, mediaCol: String): DataFrame = {
    import s.implicits._
    df.select(col(idCol).cast("long"), col(mediaCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        iter.map { case (id, bytes) =>
          val (n, sum, mx) = decodeStub(requireBlob(id, bytes))
          MediaFeatures(id, n, sum, mx)
        }
      }
      .toDF()
  }

  /** Frame-sampling shape: split a blob into fixed-size chunks and
    * keep every `stride`-th one (video frame-sample analogue).
    */
  def sampleChunks(s: SparkSession, df: DataFrame, idCol: String, mediaCol: String,
                   chunkSize: Int, stride: Int): DataFrame = {
    import s.implicits._
    df.select(col(idCol).cast("long"), col(mediaCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        requireBlob(id, bytes).grouped(chunkSize).zipWithIndex.collect {
          case (chunk, idx) if idx % stride == 0 => (id, idx, chunk)
        }
      }
      .toDF("doc_id", "chunk_idx", "chunk")
  }

  /** Contract query: text → binary blob → partition-wise decode-stub
    * features.
    */
  def multimodalFeatures(s: SparkSession, dir: String): DataFrame = {
    // text.isNotNull (r19): a null-text document has no media — drop it,
    // the same "not a document" contract as the dedup family. Without
    // the filter ONE corrupt row reaches requireBlob and kills the whole
    // query: the contract query must itself demonstrate the upstream
    // filtering that requireBlob's message demands.
    val blobs = Tables.documents(s, dir)
      .where(col("text").isNotNull)
      .select(col("doc_id"), col("text").cast("binary").as("media"))
    extractFeatures(s, blobs, "doc_id", "media").orderBy("doc_id")
  }

  /** Contract query for the frame-sampling shape: 64-byte chunks,
    * every 2nd kept (video frame-sample analogue), aggregated per doc
    * so the oracle can mirror the chunk arithmetic from text length
    * alone (pure-ASCII corpus: bytes == characters).
    */
  def multimodalChunks(s: SparkSession, dir: String): DataFrame = {
    // length(text) > 0 on BOTH sides: an empty blob produces no chunk
    // rows here (flatMap of an empty array) while the oracle's
    // arithmetic would still emit a row — guard the divergence away.
    // octet_length = length on BOTH sides: the engine chunks UTF-8
    // BYTES while the oracle counts CHARACTERS, so the comparison is
    // only valid for ASCII rows — enforce that instead of assuming it.
    val blobs = Tables.documents(s, dir)
      .where(col("doc_id") < 100 && length(col("text")) > 0 &&
        octet_length(col("text")) === length(col("text")))
      .select(col("doc_id"), col("text").cast("binary").as("media"))
    sampleChunks(s, blobs, "doc_id", "media", chunkSize = 64, stride = 2)
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_kept"),
        sum(length(col("chunk")).cast("long")).as("kept_bytes"),
        max(col("chunk_idx")).cast("int").as("last_idx"))
      .orderBy("doc_id")
  }

  /** §2.13 (round-4) content-addressed blob dedup — the storage-dedup
    * pass a multimodal corpus runs before training: each media segment
    * (here the first 64 bytes of the blob, standing in for a chunk of
    * a real asset) is keyed by its md5 digest; groups holding more
    * than one copy report the canonical keeper (min doc_id) and the
    * bytes a content-addressed store saves. Digest+groupBy is a pure
    * map-side hash + one exchange on the digest — the same shape at
    * petabyte blob scale (digests shuffle, bytes never do).
    */
  def multimodalDedup(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      // NULL is not a content key (r19, the sketch-family discipline):
      // md5(NULL) is NULL and groupBy collects every null-text doc into
      // ONE digest-NULL group, so two UNRELATED corrupt documents would
      // be reported as copies with a named keeper — a phantom dup group
      // a storage-dedup pass would act on. A null-text doc has no
      // content to dedup; drop it.
      .where(col("text").isNotNull)
      .select(col("doc_id"), substring(col("text"), 1, 64).cast("binary").as("seg"))
      .groupBy(md5(col("seg")).as("digest"))
      .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keeper"),
        max(length(col("seg"))).cast("long").as("seg_bytes"))
      .where(col("n_copies") > 1)
      .withColumn("bytes_saved", (col("n_copies") - 1) * col("seg_bytes"))
      .orderBy("digest")

  /** §2.13 (round-4) resize shape: each blob is treated as a square
    * "image" (side = ⌊√bytes⌋, the decode-stub's geometry), halved in
    * each dimension; the "resized payload" is modeled by the stride-4
    * byte sample whose sum is emitted as checksum. DECODE/RESAMPLE IS
    * THE STUB (no codecs in the container) — the partition-wise typed
    * pipeline, binary handling, and per-row metadata arithmetic are
    * the real plumbing a JNI/ImageIO resize would drop into. ASCII
    * guard as in multimodalChunks so the byte arithmetic stays
    * oracle-expressible from text alone.
    */
  def resizeMedia(s: SparkSession, df: DataFrame,
                  idCol: String, mediaCol: String): DataFrame = {
    import s.implicits._
    df.select(col(idCol).cast("long"), col(mediaCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        iter.map { case (id, bytes0) =>
          val bytes = requireBlob(id, bytes0)
          val side = math.sqrt(bytes.length.toDouble).toInt
          val newSide = side / 2
          var sum = 0L
          var i = 0
          while (i < bytes.length) { sum += bytes(i) & 0xff; i += 4 }
          ResizedMedia(id, side, newSide, bytes.length.toLong,
            newSide.toLong * newSide, sum)
        }
      }
      .toDF()
  }

  def multimodalResize(s: SparkSession, dir: String): DataFrame = {
    val blobs = Tables.documents(s, dir)
      .where(col("doc_id") < 100 && length(col("text")) > 0 &&
        octet_length(col("text")) === length(col("text")))
      .select(col("doc_id"), col("text").cast("binary").as("media"))
    resizeMedia(s, blobs, "doc_id", "media").orderBy("doc_id")
  }

  /** 64-bit block-mean perceptual hash (aHash) over a media blob:
    * split the byte stream into 64 equal blocks, set bit i when block
    * i's mean byte exceeds the whole-blob mean. Comparisons are
    * CROSS-MULTIPLIED (blockSum·L > total·blockLen) so the signature
    * is exact integer arithmetic end-to-end. Returned as two 32-bit
    * words — a BIGINT sign-bit overflow trap exists in several SQL
    * engines at bit 63, and two words sidestep it portably.
    */
  /** Exact `s·l > t·d` for nonnegative operands whose 64-bit products
    * can wrap: compares the full 128-bit products (multiplyHigh + an
    * unsigned low-word comparison). The raw `s*l > t*d` long form
    * silently wraps once a blob passes ~1.5 GB — both products reach
    * ~4·L², which crosses 2⁶³ inside the JVM's 2 GB array cap — and a
    * wrapped product FLIPS phash bits (wrong dedup groups, no error):
    * the r16 reservoir/rank overflow lesson applied to the blob
    * domain. The DuckDB oracle's BIGINT mirror errors LOUDLY at the
    * same magnitudes instead of lying, and fixture blobs sit far
    * below the window, so oracle parity is unaffected.
    */
  private[graft] def productGreater(s: Long, l: Long, t: Long, d: Long): Boolean = {
    val hi1 = Math.multiplyHigh(s, l); val lo1 = s * l
    val hi2 = Math.multiplyHigh(t, d); val lo2 = t * d
    if (hi1 != hi2) hi1 > hi2 else java.lang.Long.compareUnsigned(lo1, lo2) > 0
  }

  def phashWords(bytes: Array[Byte]): (Long, Long) = {
    val L = bytes.length.toLong
    var total = 0L
    var i = 0
    while (i < bytes.length) { total += bytes(i) & 0xff; i += 1 }
    var hi = 0L
    var lo = 0L
    var b = 0
    while (b < 64) {
      val st = (b * L / 64).toInt
      val en = ((b + 1) * L / 64).toInt
      if (en > st) {
        var s = 0L
        var j = st
        while (j < en) { s += bytes(j) & 0xff; j += 1 }
        if (productGreater(s, L, total, (en - st).toLong)) {
          if (b < 32) lo |= 1L << b else hi |= 1L << (b - 32)
        }
      }
      b += 1
    }
    (hi, lo)
  }

  /** Per-blob perceptual signature + the four 16-bit LSH bands used
    * for hamming-neighbor search: blobs whose signatures differ in ≤3
    * bits MUST share at least one band (pigeonhole over 4 bands), so
    * near-dup search is a plain equi join on (band_idx, band_value) —
    * the q_dedup_simhash dataflow, but over the BINARY media path:
    * signatures come from bytes in a typed mapPartitions stage (where
    * a real pixel decode would sit), while the oracle recomputes them
    * from characters — ASCII makes the two provably identical.
    */
  def multimodalPhash(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val blobs = Tables.documents(s, dir)
      .where(length(col("text")) > 0 &&
        octet_length(col("text")) === length(col("text")))
      .select(col("doc_id"), col("text").cast("binary").as("media"))
    val sigs = blobs.as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val (hi, lo) = phashWords(requireBlob(id, bytes))
        (id, hi, lo)
      })
      .toDF("doc_id", "sig_hi", "sig_lo")
    sigs.select(col("doc_id"), col("sig_hi"), col("sig_lo"),
        expr("sig_lo & 65535").as("b0"),
        expr("(sig_lo >> 16) & 65535").as("b1"),
        expr("sig_hi & 65535").as("b2"),
        expr("(sig_hi >> 16) & 65535").as("b3"))
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_phash" -> multimodalPhash,
    "q_multimodal_resize" -> multimodalResize,
    "q_multimodal_features" -> multimodalFeatures,
    "q_multimodal_chunks" -> multimodalChunks,
    "q_multimodal_dedup" -> multimodalDedup
  )

  val oracle: Map[String, String] = Map(
    "q_multimodal_phash" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT)) AS cs,
        |    CAST(length(text) AS BIGINT) AS L
        |  FROM documents
        |  WHERE length(text) > 0 AND strlen(text) = length(text)),
        |t AS (SELECT doc_id, cs, L, list_aggregate(cs, 'sum') AS total FROM d),
        |bits AS (
        |  SELECT doc_id, i,
        |    CASE WHEN ((i + 1) * L) // 64 > (i * L) // 64
        |          AND list_aggregate(cs[(i * L) // 64 + 1 : ((i + 1) * L) // 64], 'sum') * L
        |              > total * (((i + 1) * L) // 64 - (i * L) // 64)
        |         THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS bit
        |  FROM t CROSS JOIN (SELECT unnest(range(0, 64)) AS i)),
        |w AS (
        |  SELECT doc_id,
        |    CAST(sum(CASE WHEN i >= 32 THEN bit * (CAST(1 AS BIGINT) << CAST(i - 32 AS INTEGER))
        |                  ELSE 0 END) AS BIGINT) AS sig_hi,
        |    CAST(sum(CASE WHEN i < 32 THEN bit * (CAST(1 AS BIGINT) << CAST(i AS INTEGER))
        |                  ELSE 0 END) AS BIGINT) AS sig_lo
        |  FROM bits GROUP BY doc_id)
        |SELECT doc_id, sig_hi, sig_lo,
        |  sig_lo % 65536 AS b0, (sig_lo // 65536) % 65536 AS b1,
        |  sig_hi % 65536 AS b2, (sig_hi // 65536) % 65536 AS b3
        |FROM w ORDER BY doc_id""".stripMargin,
    "q_multimodal_resize" ->
      """SELECT doc_id,
        |  CAST(floor(sqrt(CAST(length(text) AS DOUBLE))) AS INTEGER) AS orig_side,
        |  CAST(CAST(floor(sqrt(CAST(length(text) AS DOUBLE))) AS INTEGER) // 2 AS INTEGER) AS new_side,
        |  CAST(length(text) AS BIGINT) AS orig_bytes,
        |  CAST(CAST(floor(sqrt(CAST(length(text) AS DOUBLE))) AS BIGINT) // 2
        |    * (CAST(floor(sqrt(CAST(length(text) AS DOUBLE))) AS BIGINT) // 2) AS BIGINT) AS new_bytes,
        |  CAST(list_aggregate(list_transform(range(1, length(text) + 1, 4),
        |    i -> ascii(substring(text, CAST(i AS INTEGER), 1))), 'sum') AS BIGINT) AS sample_sum
        |FROM documents
        |WHERE doc_id < 100 AND length(text) > 0 AND strlen(text) = length(text)
        |ORDER BY doc_id""".stripMargin,
    "q_multimodal_dedup" ->
      """WITH seg AS (
        |  SELECT doc_id, substr(text, 1, 64) AS seg FROM documents
        |  WHERE text IS NOT NULL),
        |g AS (
        |  SELECT md5(seg) AS digest, count(*) AS n_copies,
        |    min(doc_id) AS keeper, CAST(max(strlen(seg)) AS BIGINT) AS seg_bytes
        |  FROM seg GROUP BY 1)
        |SELECT digest, n_copies, keeper, seg_bytes,
        |  (n_copies - 1) * seg_bytes AS bytes_saved
        |FROM g WHERE n_copies > 1
        |ORDER BY digest""".stripMargin,
    "q_multimodal_chunks" ->
      """WITH d AS (
        |  SELECT doc_id, length(text) AS len,
        |    CAST(ceil(length(text) / 64.0) AS BIGINT) AS nc
        |  FROM documents WHERE doc_id < 100 AND length(text) > 0
        |    AND strlen(text) = length(text))
        |SELECT doc_id,
        |  CAST((nc + 1) // 2 AS BIGINT) AS n_kept,
        |  CAST(CASE WHEN (nc - 1) % 2 = 0
        |       THEN 64 * ((nc + 1) // 2 - 1) + (len - 64 * (nc - 1))
        |       ELSE 64 * ((nc + 1) // 2) END AS BIGINT) AS kept_bytes,
        |  CAST(((nc - 1) // 2) * 2 AS INTEGER) AS last_idx
        |FROM d
        |ORDER BY doc_id""".stripMargin,
    "q_multimodal_features" ->
      """SELECT doc_id,
        |  CAST(length(text) AS INTEGER) AS n_bytes,
        |  CAST(list_aggregate(list_transform(range(1, length(text) + 1),
        |         i -> ascii(text[i])), 'sum') AS BIGINT) AS sum_bytes,
        |  CAST(list_aggregate(list_transform(range(1, length(text) + 1),
        |         i -> ascii(text[i])), 'max') AS INTEGER) AS max_byte
        |FROM documents
        |WHERE text IS NOT NULL
        |ORDER BY doc_id""".stripMargin
  )
}
