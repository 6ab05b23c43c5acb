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
  * Two-phase design, the shape the MapReduce CC literature converged
  * on (Kiveris et al., "Connected Components in MapReduce and Beyond",
  * SoCC'14 — public):
  *
  *   1. CONTRACT — collapse trivially-connected cliques (here: docs
  *      sharing an exact (lang, n_chars) value) to one node each, a
  *      single groupBy. At corpus scale this is where most of the
  *      reduction happens.
  *   2. SOLVE — if the contracted graph still exceeds
  *      `localFinishThreshold` rows, run iterative min-label
  *      propagation with pointer jumping (label(v) ← label(label(v))
  *      each round, O(log d) rounds, each round two co-partitioned
  *      equi-joins; `localCheckpoint` truncates lineage; convergence =
  *      label-sum fixpoint — labels only decrease, so an unchanged sum
  *      IS the fixpoint). If it fits under the threshold, finish with
  *      a driver-local union-find instead: a per-round distributed
  *      join costs ~0.5 s of scheduler latency regardless of data
  *      size, so once the frontier is a few thousand rows the driver
  *      solves it in microseconds — the same reason GraphFrames'
  *      production CC switches to a local finish on small remainders.
  *
  * Both phases produce identical labels (GraphSpec proves it by
  * forcing threshold 0); the threshold only decides who does the last
  * O(|contracted|) of work.
  */
object Graph {

  /** Driver-local union-find over a collected edge list: path-halving
    * find + union-by-min so every root is its component's min id.
    */
  private def unionFindLocal(ids: Array[Long], es: Array[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    ids.foreach(i => parent(i) = i)
    // getOrElseUpdate: an edge endpoint absent from `ids` becomes its own
    // singleton root instead of throwing — callers need not guarantee the
    // node list is a superset of edge endpoints
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElseUpdate(r, r) != r) { parent(r) = parent(parent(r)); r = parent(r) }
      r
    }
    es.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    ids.map(i => i -> find(i)).toMap
  }

  /** Connected components over (nodes: nid, edges: src/dst symmetric).
    * Returns (id, lbl) with lbl = min node id in the component.
    */
  private[graft] def components(s: SparkSession, nodes: DataFrame, edges: DataFrame,
                                    localFinishThreshold: Long = 100000L): DataFrame = {
    import s.implicits._
    val nNodes = nodes.count()
    val nEdges = edges.count()
    if (math.max(nNodes, nEdges) <= localFinishThreshold) {
      val ids = nodes.select(col("nid")).as[Long].collect()
      val es = edges.select(col("src"), col("dst")).as[(Long, Long)].collect()
      unionFindLocal(ids, es).toSeq.toDF("id", "lbl")
    } else {
      // label(v) ← label(label(v)): one shortcut-doubling hop
      def jump(l: DataFrame): DataFrame = {
        val ptr = l.select(col("id").as("jid"), col("lbl").as("jl"))
        l.join(ptr, l("lbl") === col("jid"))
          .select(l("id").as("id"), least(l("lbl"), col("jl")).as("lbl"))
      }
      var labels = nodes.select(col("nid").as("id"), col("nid").as("lbl"))
        .localCheckpoint()
      var prevSum = -1L
      var curSum = labels.agg(sum(col("lbl"))).head.getLong(0)
      var iter = 0
      while (curSum != prevSum && iter < 25) {
        prevSum = curSum
        val nbrMin = edges.join(labels, col("dst") === col("id"))
          .groupBy(col("src")).agg(min(col("lbl")).as("nl"))
        val stepped = labels.join(nbrMin, labels("id") === nbrMin("src"), "left")
          .select(labels("id").as("id"),
            least(col("lbl"), coalesce(col("nl"), col("lbl"))).as("lbl"))
        // two jumps per round: shortcut distance ×4 per round, so the
        // round count (each round = fixed scheduler+checkpoint
        // overhead) shrinks ~2× vs a single jump for the same join work
        labels = jump(jump(stepped)).localCheckpoint()
        curSum = labels.agg(sum(col("lbl"))).head.getLong(0)
        iter += 1
      }
      // double pointer-jumping converges in O(log d) rounds, so 25 is far
      // beyond any reachable diameter — but if the fixpoint was somehow not
      // reached, fail loudly instead of returning partially-merged labels
      if (curSum != prevSum)
        throw new IllegalStateException(
          s"connected components did not converge after $iter rounds (labelSum $prevSum -> $curSum)")
      labels
    }
  }

  /** Cluster documents whose (lang, n_chars) lie within 1 of each
    * other, transitively. Edge generation is a BANDED EQUI-JOIN (each
    * node probes buckets n_chars-1/n_chars+1), never an O(n²)
    * theta-join — the same banding trick the MinHash/LSH operators
    * use, so the edge step scales like any hash join.
    *
    * EXPLICIT BOUND: the graph is built over doc_id < 1000 at every
    * scale factor. This caps the *demo* size, not the algorithm — the
    * contraction, banded edge join, and both solve paths are
    * size-independent, and the bound is stated here and in SURVEY
    * §2.12 rather than hidden in a default.
    */
  def dedupClusters(s: SparkSession, dir: String): DataFrame =
    dedupClustersImpl(s, dir, 100000L)

  private[graft] def dedupClustersImpl(s: SparkSession, dir: String,
                                           localFinishThreshold: Long): DataFrame = {
    val docs = Tables.documents(s, dir)
      .where(col("doc_id") < 1000)
      .select(col("doc_id"), col("lang"), col("n_chars"))

    // CONTRACT: one node per distinct (lang, n_chars) clique; node id =
    // the clique's min doc_id. Docs map back with ONE join at the end.
    val nodes = docs.groupBy(col("lang"), col("n_chars"))
      .agg(min(col("doc_id")).as("nid"))
      .localCheckpoint()

    // contracted edges: values ±1 apart in the same lang. Probes cover
    // both neighbours, so the edge list is symmetric by construction
    // and self-loops are impossible (a node can't be its own ±1).
    val probes = nodes.select(col("nid").as("src"), col("lang").as("lang_l"),
      explode(array(col("n_chars") - 1, col("n_chars") + 1)).as("k"))
    val edges = probes
      .join(nodes.select(col("nid").as("dst"), col("lang").as("lang_r"),
        col("n_chars").as("nc_r")),
        col("lang_l") === col("lang_r") && col("k") === col("nc_r"))
      .select(col("src"), col("dst"))
      .localCheckpoint()

    val labels = components(s, nodes.select("nid"), edges, localFinishThreshold)
    docs.join(nodes, Seq("lang", "n_chars"))
      .join(labels, col("nid") === col("id"))
      .select(col("doc_id"), col("lbl").as("cluster"))
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
