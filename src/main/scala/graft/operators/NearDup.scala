package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

import scala.util.hashing.MurmurHash3

/** §2.9 near-duplicate detection: MinHash+LSH, SimHash, and exact
  * n-gram Jaccard. All three are banded/blocked dataflows — candidate
  * generation is always an equi-join on a bucket key, never a global
  * cartesian, so the same plan runs at 100 TB (bucket sizes bound the
  * quadratic term).
  *
  * Hashes are pure-Scala deterministic (MurmurHash3 / splitmix64
  * finalizer) — stable across JVMs, executors and runs; no RNG state.
  */
object NearDup {

  val NumHashes = 64
  val Bands = 16
  val RowsPerBand = 4 // 16 × 4 = 64
  val ShingleK = 3

  /** splitmix64 finalizer — the standard 64-bit avalanche mix
    * ([[graft.functions.Mix.mix64]], the single shared definition).
    */
  private def mix64(x0: Long): Long = graft.functions.Mix.mix64(x0)

  private def shingleHash(sh: String): Long =
    (MurmurHash3.stringHash(sh, 0x9747b28c).toLong << 32) |
      (MurmurHash3.stringHash(sh, 0x85ebca6b).toLong & 0xffffffffL)

  /** k-token shingles of a whitespace-tokenized doc.
    *
    * Tokenization is `split(" ", -1)` — KEEPING empty tokens — to
    * match Spark SQL's `split` and DuckDB's `string_split` exactly.
    * Scala's default `split(" ")` silently drops trailing empties, so
    * a doc with a trailing space would tokenize differently here than
    * in the oracle SQL and in [[dedupNgramJaccardPrefix]]'s SQL-side
    * shingling (dormant on the fixture corpus, which has no
    * leading/trailing whitespace, but a real divergence).
    */
  def shingles(text: String, k: Int = ShingleK): Seq[String] = {
    val toks = text.split(" ", -1)
    if (toks.length < k) Seq(toks.mkString(" "))
    else toks.sliding(k).map(_.mkString(" ")).toSeq
  }

  private val seeds: Array[Long] = Array.tabulate(NumHashes)(i => mix64(i.toLong + 1))

  /** Distinct 3-token shingle hashes in ONE pass — the map-side index
    * builder for [[dedupNgramJaccard]]. Each token is hashed once and
    * consecutive triples are combined with an order-sensitive mix64
    * chain, so no shingle strings are ever materialized; partitions
    * identically to distinct string shingles up to 64-bit collisions
    * (~n²/2⁶⁴ — the same budget the banded families already accept).
    */
  def shingleHashes(text: String): Array[Long] = {
    val toks = text.split(" ", -1) // keep empties — same tokens as [[shingles]] / SQL split
    if (toks.length < ShingleK) {
      // short doc: ONE shingle, hashed through the same order-sensitive
      // chain as the long path so that distinct short docs ("" vs " ")
      // keep distinct hashes, mirroring their distinct string shingles
      var h = 0xcbf29ce484222325L
      toks.foreach(t => h = mix64(h ^ shingleHash(t)))
      return Array(h)
    }
    val th = new Array[Long](toks.length)
    var j = 0
    while (j < toks.length) { th(j) = shingleHash(toks(j)); j += 1 }
    val n = toks.length - (ShingleK - 1)
    // dedup allocation-free in the per-document hot loop: sort the
    // primitive array, then skip adjacent equals (a HashSet here boxes
    // every probe and allocates a node per distinct shingle; output
    // ORDER is irrelevant — every consumer treats this as a set)
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = mix64(mix64(mix64(th(i)) ^ th(i + 1)) ^ th(i + 2))
      i += 1
    }
    java.util.Arrays.sort(out)
    var m = 0
    i = 0
    while (i < n) {
      if (i == 0 || out(i) != out(i - 1)) { out(m) = out(i); m += 1 }
      i += 1
    }
    java.util.Arrays.copyOf(out, m)
  }

  /** 64 minhash values: min over DISTINCT shingle hashes of
    * mix64(h ^ seed_i). Built on [[shingleHashes]], so the per-doc hot
    * loop never materializes shingle strings and only pays the 64-way
    * mix once per distinct shingle — this is the per-document hot loop
    * of corpus-scale dedup.
    */
  def minhashSignature(text: String): Array[Long] = {
    val hs = shingleHashes(text)
    val sig = Array.fill(NumHashes)(Long.MaxValue)
    var k = 0
    while (k < hs.length) {
      val h = hs(k)
      var i = 0
      while (i < NumHashes) {
        val v = mix64(h ^ seeds(i))
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      k += 1
    }
    sig
  }

  /** 64-bit SimHash over token hashes (unit weights). */
  def simhash64(text: String): Long = {
    val counts = new Array[Int](64)
    text.split(" ", -1).foreach { t =>
      val h = shingleHash(t)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
    }
    (0 until 64).foldLeft(0L)((acc, b) => if (counts(b) > 0) acc | (1L << b) else acc)
  }

  def jaccard[T](a: Set[T], b: Set[T]): Double = {
    val inter = a.intersect(b).size
    if (a.isEmpty && b.isEmpty) 1.0 else inter.toDouble / (a.size + b.size - inter)
  }

  /** MinHash+LSH near-dup pairs: shingle → 64 minhashes → 16 bands →
    * bucket equi-join → exact-Jaccard confirm at τ=0.8.
    *
    * No oracle: the hash family is not portable to DuckDB SQL;
    * NearDupSpec proves recall/precision on planted near-dups.
    */
  /** LSH bucket key for one band: mix64 chain over the band's 4
    * signature rows, seeded with the band index. Package-visible so
    * NearDupSpec can pin band SELECTIVITY directly — a broken slice
    * here degrades candidate generation to all-pairs (every doc in one
    * bucket), which the exact-Jaccard confirm silently absorbs at test
    * scale but which is quadratic death at corpus scale.
    */
  private[graft] def bandBucket(sig: Seq[Long], band: Int): Long = {
    val slice = sig.slice(band * RowsPerBand, (band + 1) * RowsPerBand)
    mix64(slice.foldLeft(band.toLong)((acc, v) => mix64(acc ^ v)))
  }

  def dedupMinhash(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sigUdf = udf((text: String) => minhashSignature(text))
    val bandHashUdf = udf((sig: Seq[Long], band: Int) => bandBucket(sig, band))
    // null text is not a document (r18 corrupt-documents probe): the
    // String UDFs here receive Scala null for a NULL column (reference
    // types are NOT null-skipped) and would NPE-kill the whole job
    val docs = Tables.documents(s, dir).where(col("text").isNotNull)
      .select(col("doc_id"), col("text"))
    val sigs = docs.withColumn("sig", sigUdf(col("text")))
    val buckets = sigs
      .select(col("doc_id"), col("sig"), explode(typedlit((0 until Bands).toArray)).as("band"))
      .withColumn("bucket", bandHashUdf(col("sig"), col("band")))
      .select(col("doc_id"), col("band"), col("bucket"))
    val cand = buckets.as("l").join(buckets.as("r"),
        col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket")
          && col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("d1"), col("r.doc_id").as("d2"))
      .distinct()
    // exact-Jaccard confirm over distinct shingle HASHES (identical to
    // string-set jaccard up to 64-bit collisions, no string sets built)
    val shingleUdf = udf((text: String) => shingleHashes(text))
    val sets = docs.select(col("doc_id"), shingleUdf(col("text")).as("sh"))
    val jacUdf = udf((a: Seq[Long], b: Seq[Long]) => jaccard(a.toSet, b.toSet))
    cand
      .join(sets.select(col("doc_id").as("d1"), col("sh").as("sh1")), Seq("d1"))
      .join(sets.select(col("doc_id").as("d2"), col("sh").as("sh2")), Seq("d2"))
      .withColumn("jac", jacUdf(col("sh1"), col("sh2")))
      .where(col("jac") >= 0.8)
      .select(col("d1"), col("d2"), col("jac").cast("decimal(9,6)").as("jaccard"))
      .orderBy("d1", "d2")
  }

  /** SimHash near-dup pairs: 64-bit signature, 4×16-bit chunk
    * banding (pigeonhole guarantees recall for hamming ≤ 3), exact
    * hamming confirm via bit_count(xor). No oracle (hash family).
    */
  def dedupSimhash(s: SparkSession, dir: String): DataFrame = {
    val shUdf = udf((text: String) => simhash64(text))
    val docs = Tables.documents(s, dir)
      .where(col("text").isNotNull) // NPE guard — see dedupMinhash
      .select(col("doc_id"), shUdf(col("text")).as("sh"))
    val chunks = docs.select(col("doc_id"), col("sh"),
        explode(typedlit((0 until 4).toArray)).as("chunk"))
      .withColumn("ckey", expr("shiftright(sh, chunk * 16)").bitwiseAND(lit(0xffffL)))
    val cand = chunks.as("l").join(chunks.as("r"),
        col("l.chunk") === col("r.chunk") && col("l.ckey") === col("r.ckey")
          && col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("d1"), col("l.sh").as("sh1"),
        col("r.doc_id").as("d2"), col("r.sh").as("sh2"))
      .distinct()
    cand.withColumn("hamming", bit_count(col("sh1").bitwiseXOR(col("sh2"))).cast("int"))
      .where(col("hamming") <= 3)
      .select(col("d1"), col("d2"), col("hamming"))
      .orderBy("d1", "d2")
  }

  /** Exact n-gram Jaccard ≥ 0.5 via an inverted shingle index:
    * distinct (doc, lang, shingle) → lang-blocked self-join on
    * shingle → intersection counts → |A|+|B|−∩. Fully
    * SQL-expressible → oracle'd.
    *
    * Measured choice: at bench scale (5k docs, small vocabulary) this
    * naive index beats the prefix-filtered variant below (4s vs 7.7s
    * at sf0.1) because the filter's df/window precomputation costs
    * more than the fanout it saves. At corpus scale the asymptotics
    * flip — [[dedupNgramJaccardPrefix]] is the 100 TB path and
    * NearDupSpec proves the two produce identical results.
    */
  def dedupNgramJaccard(s: SparkSession, dir: String): DataFrame = {
    // Index build is ONE tight map-side pass ([[shingleHashes]]): per-doc
    // distinct 8-byte shingle keys + set size, no shingle strings, no
    // global distinct shuffle, no per-doc sizes table to join (or,
    // worse, broadcast) afterwards — measured 6× faster than the
    // interpreted HOF string pipeline at sf0.1 (0.3 s vs 2.0 s warm).
    // The explicit repartition on the join key materializes the index
    // exchange ONCE; the self-join's two sides then reuse it instead of
    // re-shingling the corpus per side.
    // asNondeterministic is an OPTIMIZER FENCE, not a semantics claim —
    // shingleHashes is a pure function. Without it the explode's
    // implicit guards (size(arr)>0, isnotnull(arr)) and the join-key
    // null filters are pushed BELOW this projection and re-evaluate
    // the UDF in the Filter, so every document was shingled twice per
    // row (guide §4.4; plan showed 3 UDF calls in the pushed Filter +
    // 1 in the Project). Fenced, the filter stays above the single
    // evaluation. Results are unchanged: the fence only stops the
    // optimizer from duplicating/reordering the call.
    val sigUdf = udf((text: String) => shingleHashes(text)).asNondeterministic()
    val sh = Tables.documents(s, dir)
      .where(col("text").isNotNull) // NPE guard — see dedupMinhash
      .withColumn("arr", sigUdf(col("text")))
      .select(col("doc_id"), col("lang"),
        size(col("arr")).cast("long").as("sz"),
        explode(col("arr")).as("shingle"))
      .repartition(col("lang"), col("shingle"))
    // AllPairs size filter, exact for τ=0.5: jaccard ≥ τ forces
    // τ·|A| ≤ |B| ≤ |A|/τ, so size-incompatible pairs are pruned
    // INSIDE the self-join before they fan out — no false negatives.
    val inter = sh.as("a").join(sh.as("b"),
        col("a.lang") === col("b.lang") && col("a.shingle") === col("b.shingle")
          && col("a.doc_id") < col("b.doc_id")
          && col("b.sz") * 2 >= col("a.sz") && col("a.sz") * 2 >= col("b.sz"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("inter"),
        max(col("a.sz")).as("sz1"), max(col("b.sz")).as("sz2"))
    inter
      .withColumn("jac", col("inter").cast("double") / (col("sz1") + col("sz2") - col("inter")))
      .where(col("jac") >= 0.5)
      .select(col("d1"), col("d2"), dbl(col("jac").cast("decimal(9,6)")).as("jaccard"))
      .orderBy("d1", "d2")
  }

  /** PREFIX-FILTERED exact n-gram Jaccard (AllPairs/PPJoin family):
    * a pair with Jaccard ≥ τ must share a shingle within each doc's
    * first `n − ⌈τ·n⌉ + 1` shingles under a global rare-first
    * (ascending document-frequency) order, so only those prefixes are
    * indexed and every candidate is verified exactly. Same results as
    * [[dedupNgramJaccard]]; wins when posting lists are hot (real
    * corpora), loses at toy scale — see the scaladoc above.
    */
  def dedupNgramJaccardPrefix(s: SparkSession, dir: String): DataFrame = {
    val tau = 0.5
    val shingleArr = "transform(sequence(1, greatest(size(split(text, ' ')) - 2, 1)), " +
      "i -> concat_ws(' ', slice(split(text, ' '), i, 3)))"
    val docs = Tables.documents(s, dir)
    val sh = docs
      .select(col("doc_id"), col("lang"), explode(expr(shingleArr)).as("shingle"))
      .distinct()
    // global document frequency per shingle → rare-first ordering
    val df = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
    val ranked = sh.join(df, Seq("shingle"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
          .orderBy(col("df"), col("shingle"))))
      .withColumn("sz", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))))
    // prefix length: sz - ceil(tau*sz) + 1
    val prefix = ranked.where(col("rk") <= col("sz") - ceil(lit(tau) * col("sz")) + 1)
      .select(col("doc_id"), col("lang"), col("shingle"))
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.lang") === col("b.lang") && col("a.shingle") === col("b.shingle")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
    // exact verification over full shingle sets
    val shSets = docs.select(col("doc_id"), array_distinct(expr(shingleArr)).as("shset"))
    val jacUdf = udf((a: Seq[String], b: Seq[String]) => jaccard(a.toSet, b.toSet))
    cand
      .join(shSets.select(col("doc_id").as("d1"), col("shset").as("s1")), Seq("d1"))
      .join(shSets.select(col("doc_id").as("d2"), col("shset").as("s2")), Seq("d2"))
      .withColumn("jac", jacUdf(col("s1"), col("s2")))
      .where(col("jac") >= tau)
      .select(col("d1"), col("d2"), dbl(col("jac").cast("decimal(9,6)")).as("jaccard"))
      .orderBy("d1", "d2")
  }

  /** Benchmark decontamination — the training-pipeline op that flags
    * corpus documents overlapping an evaluation set: docs sharing ≥ 5
    * distinct 3-gram shingles with ANY benchmark doc (here: doc_id <
    * 10 plays the benchmark). The benchmark shingle set is bounded by
    * construction (eval suites are small), so broadcasting it is the
    * CORRECT scale plan — the 100 TB corpus streams map-side against
    * it, one shuffle for the per-doc overlap count, no self-join.
    */
  def decontaminate(s: SparkSession, dir: String): DataFrame = {
    val sigUdf = udf((text: String) => shingleHashes(text))
    val docs = Tables.documents(s, dir)
      .where(col("text").isNotNull) // NPE guard — see dedupMinhash
    val bench = docs.where(col("doc_id") < 10)
      .select(explode(sigUdf(col("text"))).as("shingle")).distinct()
    val corpus = docs.where(col("doc_id") >= 10)
      .select(col("doc_id"), explode(sigUdf(col("text"))).as("shingle"))
    corpus.join(broadcast(bench), Seq("shingle"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_overlap"))
      .where(col("n_overlap") >= 5)
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_decontaminate" -> decontaminate,
    "q_dedup_minhash" -> dedupMinhash,
    "q_dedup_simhash" -> dedupSimhash,
    "q_dedup_ngram_jaccard" -> dedupNgramJaccard
  )

  val oracle: Map[String, String] = Map(
    "q_decontaminate" ->
      """WITH sh AS (
        |  SELECT doc_id,
        |    unnest(list_distinct(list_transform(range(1, greatest(len(string_split(text, ' ')) - 1, 2)),
        |      i -> array_to_string(string_split(text, ' ')[i:i+2], ' ')))) AS shingle
        |  FROM documents),
        |bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id < 10),
        |corpus AS (SELECT doc_id, shingle FROM sh WHERE doc_id >= 10)
        |SELECT c.doc_id AS doc_id, count(*) AS n_overlap
        |FROM corpus c JOIN bench b ON c.shingle = b.shingle
        |GROUP BY c.doc_id
        |HAVING count(*) >= 5
        |ORDER BY doc_id""".stripMargin,
    "q_dedup_ngram_jaccard" ->
      """WITH sh AS (
        |  SELECT DISTINCT doc_id, lang, shingle FROM (
        |    SELECT doc_id, lang,
        |      unnest(list_transform(range(1, greatest(len(string_split(text, ' ')) - 1, 2)),
        |        i -> array_to_string(string_split(text, ' ')[i:i+2], ' '))) AS shingle
        |    FROM documents)),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
        |  FROM sh a JOIN sh b ON a.lang = b.lang AND a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id)
        |SELECT d1, d2,
        |  CAST(CAST(CAST(inter AS DOUBLE) / (s1.sz + s2.sz - inter) AS DECIMAL(9,6)) AS DOUBLE) AS jaccard
        |FROM inter
        |JOIN sizes s1 ON s1.doc_id = d1
        |JOIN sizes s2 ON s2.doc_id = d2
        |WHERE CAST(inter AS DOUBLE) / (s1.sz + s2.sz - inter) >= 0.5
        |ORDER BY d1, d2""".stripMargin
  )
}
