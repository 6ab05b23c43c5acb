package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** §2.13 (round-4) corpus-preparation operators for LLM training data:
  * context-window sequence packing and deterministic per-stratum
  * reservoir sampling. Both are single-exchange shapes: packing is a
  * running sum inside a bounded (lang) partition, sampling is a
  * windowed top-k by a portable hash — no global sorts, no rand().
  */
object Corpus {

  /** Sequence packing: assign documents to fixed-capacity context
    * windows (512 whitespace tokens) by contiguous running sum within
    * each language shard — a document opens in the chunk where its
    * start offset lands (chunks may overflow by one doc's tail, the
    * standard "greedy contiguous" packing). Emits per-chunk occupancy.
    *
    * Scale: ONE window exchange partitioned by lang ordered by doc_id,
    * then a map-side-combinable aggregate. Real pipelines shard the
    * stream (here: lang) so no partition's running state exceeds one
    * shard — the cumulative sum never crosses shard boundaries, which
    * is what keeps the window bounded on a 1000-executor cluster.
    */
  def packChunks(s: SparkSession, dir: String): DataFrame = {
    val cap = lit(512)
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("tok"))
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    toks
      .withColumn("cum", sum(col("tok")).over(w))
      .withColumn("chunk_id", floor((col("cum") - col("tok")) / cap))
      .groupBy(col("lang"), col("chunk_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("sum_tokens"))
      .orderBy("lang", "chunk_id")
  }

  /** Deterministic reservoir: k=10 docs per language, selected by rank
    * of a portable integer hash of doc_id — a uniform-without-
    * replacement sample that is reproducible across engines, runs and
    * cluster sizes (rand()/reservoirSample are not). One window
    * exchange on lang; at corpus scale the same shape distributes as a
    * per-shard top-k (min-heap per partition, merge k per shard).
    */
  def sampleReservoir(s: SparkSession, dir: String): DataFrame = {
    // mod-FIRST, like QuantileSketch.hash: `doc_id * 2654435761` raw
    // overflows Long once doc_id passes ~3.47e9 — a plausible doc count
    // at 100 TB (~28 KB/doc) — and Spark 4's default ANSI mode throws
    // mid-job on that legitimate input. Reducing doc_id mod 1000003
    // first keeps the product ≤ ~4.3e11 and is algebraically identical
    // mod 1000003 (2654435761 ≡ 427799), so every selected sample —
    // and the DuckDB oracle — is unchanged.
    val h = pmod(pmod(col("doc_id"), lit(1000003L)) * 427799L + 12345L, lit(1000003L))
    val w = Window.partitionBy(col("lang")).orderBy(h, col("doc_id"))
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= 10)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy("lang", "doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pack_chunks" -> packChunks,
    "q_sample_reservoir" -> sampleReservoir
  )

  val oracle: Map[String, String] = Map(
    "q_pack_chunks" ->
      """WITH t AS (
        |  SELECT doc_id, lang,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
        |  FROM documents),
        |c AS (
        |  SELECT lang, doc_id, tok,
        |    sum(tok) OVER (PARTITION BY lang ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM t)
        |SELECT lang, CAST(floor((cum - tok) / 512) AS BIGINT) AS chunk_id,
        |  count(*) AS n_docs, CAST(sum(tok) AS BIGINT) AS sum_tokens
        |FROM c
        |GROUP BY lang, chunk_id
        |ORDER BY lang, chunk_id""".stripMargin,
    "q_sample_reservoir" ->
      """WITH r AS (
        |  SELECT doc_id, lang, n_chars,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY ((doc_id % 1000003) * 427799 + 12345) % 1000003, doc_id) AS rk
        |  FROM documents)
        |SELECT doc_id, lang, n_chars FROM r WHERE rk <= 10
        |ORDER BY lang, doc_id""".stripMargin
  )
}
