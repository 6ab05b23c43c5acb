package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** §2.12 (round-3) distributed connected components — the clustering
  * step every near-dup pipeline needs after pair generation: candidate
  * pairs are edges, and a document's canonical representative is the
  * minimum doc_id reachable through any chain of pairs (A~B, B~C ⇒
  * {A,B,C} are one cluster even if A and C never paired directly).
  *
  * Algorithm: iterative min-label propagation with pointer jumping
  * (label(v) ← label(label(v)) each round), the classic O(log d)-round
  * MapReduce CC family (Kiveris et al., "Connected Components in
  * MapReduce and Beyond", SoCC'14 — public). Each round is two
  * co-partitioned equi-joins; `localCheckpoint` truncates lineage so
  * the plan stays flat; convergence is detected by the label-sum
  * fixpoint (labels only ever decrease, so an unchanged sum IS the
  * fixpoint — one scalar per round, no row-level diff join).
  */
object Graph {

  /** Cluster documents whose (lang, n_chars) lie within 1 of each
    * other, transitively. Edge generation is a BANDED EQUI-JOIN (each
    * doc probes buckets n_chars-1/n_chars/n_chars+1), never an O(n²)
    * theta-join — the same banding trick the MinHash/LSH operators
    * use, so the edge step scales like any hash join.
    *
    * EXPLICIT BOUND: the graph is built over doc_id < 1000 at every
    * scale factor. This caps the *demo* iteration count, not the
    * algorithm — the per-round joins and the convergence rule are
    * size-independent, and the bound is stated here and in SURVEY
    * §2.12 rather than hidden in a default.
    */
  def dedupClusters(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .where(col("doc_id") < 1000)
      .select(col("doc_id"), col("lang"), col("n_chars"))
    // probes cover the ±1 band; src≠dst keeps self-loops out and makes
    // the edge list symmetric by construction (both endpoints probe)
    val probes = docs.select(col("doc_id").as("src"), col("lang").as("lang_l"),
      explode(array(col("n_chars") - 1, col("n_chars"), col("n_chars") + 1)).as("k"))
    val edges = probes
      .join(docs.select(col("doc_id").as("dst"), col("lang").as("lang_r"),
        col("n_chars").as("nc_r")),
        col("lang_l") === col("lang_r") && col("k") === col("nc_r") &&
          col("src") =!= col("dst"))
      .select(col("src"), col("dst"))
      .localCheckpoint()

    // label(v) ← label(label(v)): one shortcut-doubling hop
    def jump(l: DataFrame): DataFrame = {
      val ptr = l.select(col("id").as("jid"), col("lbl").as("jl"))
      l.join(ptr, l("lbl") === col("jid"))
        .select(l("id").as("id"), least(l("lbl"), col("jl")).as("lbl"))
    }

    // contraction at init: docs sharing an exact (lang, n_chars) value
    // form a clique — start them at the clique min instead of spending
    // propagation rounds collapsing it edge by edge
    val valMin = docs.groupBy(col("lang"), col("n_chars"))
      .agg(min(col("doc_id")).as("vmin"))
    var labels = docs.join(valMin, Seq("lang", "n_chars"))
      .select(col("doc_id").as("id"), col("vmin").as("lbl"))
      .localCheckpoint()
    var prevSum = -1L
    var curSum = labels.agg(sum(col("lbl"))).head.getLong(0)
    var iter = 0
    while (curSum != prevSum && iter < 15) {
      prevSum = curSum
      val nbrMin = edges.join(labels, col("dst") === col("id"))
        .groupBy(col("src")).agg(min(col("lbl")).as("nl"))
      val stepped = labels.join(nbrMin, labels("id") === nbrMin("src"), "left")
        .select(labels("id").as("id"),
          least(col("lbl"), coalesce(col("nl"), col("lbl"))).as("lbl"))
      // two jumps per round: shortcut distance ×4 per round, so the
      // round count (each round = fixed scheduler+checkpoint overhead)
      // shrinks ~2× vs a single jump for the same join work
      labels = jump(jump(stepped)).localCheckpoint()
      curSum = labels.agg(sum(col("lbl"))).head.getLong(0)
      iter += 1
    }
    labels.select(col("id").as("doc_id"), col("lbl").as("cluster"))
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_clusters" -> dedupClusters
  )

  /** The oracle exploits the band structure instead of recursing: with
    * edges defined by "same lang, n_chars within 1", components are
    * exactly the maximal runs of distinct n_chars values with gaps ≤ 1
    * (gaps-and-islands over the distinct value set), and the cluster
    * representative is the island's min doc_id. Same semantics, closed
    * form — it validates the iterative engine result without assuming
    * the engine's algorithm.
    */
  val oracle: Map[String, String] = Map(
    "q_dedup_clusters" ->
      """WITH d AS (
        |  SELECT doc_id, lang, n_chars FROM documents WHERE doc_id < 1000),
        |v AS (SELECT DISTINCT lang, n_chars FROM d),
        |b AS (
        |  SELECT lang, n_chars,
        |    CASE WHEN n_chars - lag(n_chars) OVER (PARTITION BY lang ORDER BY n_chars) <= 1
        |         THEN 0 ELSE 1 END AS brk
        |  FROM v),
        |i AS (
        |  SELECT lang, n_chars,
        |    sum(brk) OVER (PARTITION BY lang ORDER BY n_chars
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM b),
        |lbl AS (
        |  SELECT d.doc_id, d.lang, i.island
        |  FROM d JOIN i ON d.lang = i.lang AND d.n_chars = i.n_chars),
        |rep AS (
        |  SELECT lang, island, min(doc_id) AS cluster FROM lbl GROUP BY lang, island)
        |SELECT l.doc_id, r.cluster
        |FROM lbl l JOIN rep r ON l.lang = r.lang AND l.island = r.island
        |ORDER BY l.doc_id""".stripMargin
  )
}
