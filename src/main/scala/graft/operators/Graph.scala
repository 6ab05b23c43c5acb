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
  private[graft] def unionFindLocal(ids: Array[Long], es: Array[(Long, Long)]): Map[Long, Long] = {
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
      // fixpoint detector: the label sum in DECIMAL(38,0), NOT a Long
      // sum — at billions of nodes with large ids the Long sum exceeds
      // 2^63 and either throws mid-job (ANSI, the Spark 4 default) or
      // wraps (non-ANSI), where a round whose label decrease is an
      // exact multiple of 2^64 collides with the previous wrapped sum
      // and the loop would return partially-merged labels as converged.
      // DECIMAL(38,0) holds 10^19 ids of 2^63 exactly — no engine this
      // side of 10^18 rows can overflow it. Labels only decrease, so an
      // unchanged exact sum IS the fixpoint.
      def labelSum(l: DataFrame): java.math.BigDecimal =
        l.agg(coalesce(sum(col("lbl").cast(org.apache.spark.sql.types.DecimalType(38, 0))),
          lit(0).cast(org.apache.spark.sql.types.DecimalType(38, 0)))).head.getDecimal(0)
      var labels = nodes.select(col("nid").as("id"), col("nid").as("lbl"))
        .localCheckpoint()
      var prevSum: java.math.BigDecimal = null
      var curSum = labelSum(labels)
      var iter = 0
      while ((prevSum == null || curSum.compareTo(prevSum) != 0) && iter < 25) {
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
        curSum = labelSum(labels)
        iter += 1
      }
      // double pointer-jumping converges in O(log d) rounds, so 25 is far
      // beyond any reachable diameter — but if the fixpoint was somehow not
      // reached, fail loudly instead of returning partially-merged labels
      if (curSum.compareTo(prevSum) != 0)
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
    * Runs over the FULL documents table (a doc_id < 1000 demo bound
    * used through round 5 is gone, so the bench prices the real
    * algorithm): the contraction collapses the corpus to one node per
    * distinct (lang, n_chars) clique BEFORE any graph work, so the CC
    * input stays ~|distinct value pairs| at every scale factor and the
    * solve path (pointer jumping, or the thresholded local union-find
    * finish) never sees corpus-sized data.
    */
  def dedupClusters(s: SparkSession, dir: String): DataFrame =
    dedupClustersImpl(s, dir, 100000L)

  private[graft] def dedupClustersImpl(s: SparkSession, dir: String,
                                           localFinishThreshold: Long): DataFrame = {
    val docs = Tables.documents(s, dir)
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

  /** §2.13 (round-4) PageRank — the canonical iterative message-passing
    * workload; the operator every graph-flavoured corpus job (site-level
    * quality propagation, link-spam scoring) reduces to.
    *
    * Graph: the (lang, source) bucket star forest, closed into one
    * functional graph — every doc points at its bucket representative
    * (min doc_id), every representative points at the global min doc
    * (which self-loops). Out-degree is EXACTLY 1 by construction, so a
    * node's whole rank flows along its single edge and the update needs
    * NO division: r'(v) = 0.15/N + 0.85 · Σ_{u→v} r(u).
    *
    * Determinism at scale (SURVEY §7.4): ranks live in DECIMAL(28,18),
    * so the only order-sensitive op — the incoming-mass SUM — is exact
    * and associative on any number of executors; the damping multiply
    * is by an exact DECIMAL(3,2) literal and the two scalar seeds
    * (1/N, 0.15/N) are single IEEE divisions each engine performs
    * identically. Each iteration is one equi-join on the edge source +
    * one exchange on dst — the standard distributed PageRank shape
    * (pregel-style message passing as joins); 3 fixed iterations keep
    * the oracle expressible as chained CTEs.
    */
  def pageRank(s: SparkSession, dir: String): DataFrame =
    pageRankImpl(Tables.documents(s, dir).select(col("doc_id"), col("lang"), col("source")))

  /** Parameterized core shared with ScaleRehearsal (pagerank_inflated)
    * so the rehearsal measures THIS algorithm, not a copy.
    */
  private[graft] def pageRankImpl(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val d28 = DecimalType(28, 18)
    val reps = docs.groupBy(col("lang"), col("source")).agg(min(col("doc_id")).as("rep"))
    val firstRow = docs.agg(min(col("doc_id")).as("g"), count(lit(1)).as("n")).head
    val n = firstRow.getLong(1)
    // an empty graph has no global-min node (min(doc_id) is NULL — the
    // getLong would throw ROW_VALUE_IS_NULL) and no well-defined 1/N
    // seed; the honest degenerate result is zero rows of the same
    // shape (EmptyInputSweepSpec, r13)
    if (n == 0L)
      return docs.select(col("doc_id"),
        dbl(lit(0).cast(DecimalType(12, 6))).as("pr")).limit(0)
    val gmin = firstRow.getLong(0)
    val edges = docs.join(reps, Seq("lang", "source"))
      .select(col("doc_id").as("src"),
        when(col("doc_id") === col("rep"), lit(gmin)).otherwise(col("rep")).as("dst"))
      .localCheckpoint()
    // r21 (optimization round; guide §3.3): materialize the node list
    // once — it is consumed 4× (the rank seed plus one left join per
    // iteration), and without the checkpoint each consumer re-plans
    // and re-scans the parquet table. (A repartition-by-id before the
    // checkpoint was tried and reverted: under AQE a checkpointed
    // Dataset reports UnknownPartitioning — AdaptiveSparkPlanExec hides
    // the final partitioning at plan-capture time — so the keyed
    // exchange bought nothing and cost one extra shuffle; measured in
    // OPTIMIZATION_r21.md.)
    val ids = docs.select(col("doc_id").as("id"))
      .localCheckpoint()
    val base = 0.15 / n // one IEEE double division, identical in the oracle
    var ranks = ids.withColumn("r", lit(1.0 / n).cast(d28))
    for (_ <- 1 to 3) {
      val contrib = edges.join(ranks, col("src") === col("id"))
        .groupBy(col("dst"))
        .agg(sum(col("r")).cast(d28).as("in_r"))
      ranks = ids.join(contrib, col("id") === col("dst"), "left")
        .select(col("id"),
          (lit(base).cast(d28) +
            (coalesce(col("in_r"), lit(0).cast(d28)) * lit(0.85).cast(DecimalType(3, 2)))
              .cast(d28)).cast(d28).as("r"))
    }
    ranks.select(col("id").as("doc_id"),
        dbl(col("r").cast(DecimalType(12, 6))).as("pr"))
      .orderBy(desc("pr"), asc("doc_id"))
  }

  /** §2.13 (round-4) triangle counting — the clustering-coefficient /
    * community-density primitive — over the part co-purchase graph
    * (parts are adjacent when one order contains both; a deterministic
    * 10% order shard keeps the toy graph's density honest —
    * ScaleRehearsal's triangles_inflated keeps the denser 20% shard so
    * the algorithm is still priced at full density).
    *
    * Algorithm: compact-forward with DEGREE ordering (Latapy,
    * "Main-memory triangle computations for very large graphs", TCS
    * 2008 — public). Each undirected edge is oriented from its
    * lower-(degree, id) endpoint, so every out-degree is O(√m) no
    * matter how skewed the raw degree distribution — a hub of degree d
    * contributes d wedges, not d². Wedges are generated by the e⋈e
    * equi-join on the source (non-equi (deg,id) conjunct only dedups
    * the pair), and close into triangles via one more equi-join on the
    * two far endpoints. Three shuffles total (degree agg, wedge join,
    * closing join) — never an all-pairs product.
    *
    * Output groups triangles by their minimum part key — an
    * orientation-free identity, so the oracle can count the SAME
    * triangles with the naive id-ordered a<b<c 3-way self-join: two
    * structurally different algorithms, one answer.
    */
  def triangles(s: SparkSession, dir: String): DataFrame =
    trianglesImpl(Tables.lineitem(s, dir)
      .where(pmod(col("l_orderkey"), lit(10)) === 0)
      .select(col("l_orderkey"), col("l_partkey")))

  /** Parameterized core shared with ScaleRehearsal (triangles_inflated)
    * so the rehearsal measures THIS algorithm, not a copy. `li` is any
    * (l_orderkey, l_partkey) co-occurrence frame.
    */
  private[graft] def trianglesImpl(li: DataFrame): DataFrame = {
    // checkpoint: e0 (the expensive self-join + distinct) feeds both the
    // degree aggregation and the orientation join — without
    // materialization the whole subplan can replay once per consumer
    val e0 = li.as("a").join(li.as("b"), Seq("l_orderkey"))
      .where(col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .distinct()
      .localCheckpoint()
    val deg = e0.select(col("u").as("k")).unionAll(e0.select(col("v")))
      .groupBy(col("k")).agg(count(lit(1)).as("d"))
    // orient: s = endpoint with the smaller (degree, id); carry t's
    // degree so the wedge join can order far endpoints without a
    // third join against deg
    val e = e0
      .join(deg.withColumnRenamed("k", "u").withColumnRenamed("d", "du"), "u")
      .join(deg.withColumnRenamed("k", "v").withColumnRenamed("d", "dv"), "v")
      .select(
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")), col("u"))
          .otherwise(col("v")).as("s"),
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")), col("v"))
          .otherwise(col("u")).as("t"),
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")), col("dv"))
          .otherwise(col("du")).as("dt"))
      .localCheckpoint()
    val tri = e.as("x").join(e.as("y"),
        col("x.s") === col("y.s") &&
          struct(col("x.dt"), col("x.t")) < struct(col("y.dt"), col("y.t")))
      .select(col("x.s").as("a"), col("x.t").as("b"), col("y.t").as("c"))
      // the far edge {b,c} is oriented b→t=c by construction (pos(b) <
      // pos(c)), so one semi probe on (s,t) closes the wedge
      .join(e.select(col("s").as("b"), col("t").as("c")), Seq("b", "c"), "left_semi")
    tri.select(least(col("a"), col("b"), col("c")).as("p_partkey"))
      .groupBy(col("p_partkey")).agg(count(lit(1)).as("n_tri"))
      .orderBy("p_partkey")
  }

  /** §2.14 (round-4, session 3) bounded-round min-label propagation
    * over the co-purchase graph — the synchronous community-seeding
    * shape (2 fixed rounds, NOT run to fixpoint: that's
    * q_dedup_clusters' job; bounded rounds are what production
    * community detection actually ships, because each round is a full
    * join over the edge list and the round count is the cost knob).
    *
    * Per round: neighbor-min messages via ONE equi join on the
    * directed edge list + a map-side-combinable min agg, then
    * least(own, incoming) — the pregel-as-joins pattern shared with
    * q_graph_pagerank. All-integer label domain, so every round is
    * exact and the oracle replays it in chained CTEs.
    */
  def labelProp(s: SparkSession, dir: String): DataFrame =
    labelPropImpl(Tables.lineitem(s, dir)
      .where(pmod(col("l_orderkey"), lit(5)) === 0)
      .select(col("l_orderkey"), col("l_partkey")))

  /** Parameterized core shared with ScaleRehearsal (label_prop_inflated)
    * so the rehearsal measures THIS dataflow, not a copy. `li` is any
    * (l_orderkey, l_partkey) co-occurrence frame.
    */
  private[graft] def labelPropImpl(li: DataFrame): DataFrame = {
    // r21 (optimization round; guide §2.4): build the symmetric
    // directed edge list in ONE pass — the a≠b self-join emits both
    // orientations of every co-purchase pair directly, so the old
    // shape's (a<b self-join → distinct → checkpoint → union of two
    // checkpoint reads → second checkpoint) collapses to one join +
    // one checkpoint. The edge DEDUP is dropped outright: the only
    // per-round consumer is min(lbl), which is duplicate-insensitive,
    // and the node list below deduplicates src itself — so duplicate
    // edges cannot change any label, only re-send a message. Measured
    // duplication on this graph is 1.0005× (480,636 raw vs 480,382
    // unique directed pairs at sf0.1), so the old distinct paid a full
    // exchange + two hash-agg passes to remove 0.05% of rows; on a
    // corpus where co-occurring pairs repeat heavily a dedup would pay
    // for itself — revisit if the pair-duplication factor grows.
    // Same label RESULT as the deduped form: min over a multiset
    // equals min over its support set.
    val e = li.as("a").join(li.as("b"), Seq("l_orderkey"))
      .where(col("a.l_partkey") =!= col("b.l_partkey"))
      .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
      .localCheckpoint()
    var lab = e.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("lbl"))
    for (round <- 1 to 2) {
      val msgs = e.join(lab.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id")).agg(min(col("lbl")).as("ml"))
      lab = lab.join(msgs, "id")
        .select(col("id"), least(col("lbl"), col("ml")).as("lbl"))
      // truncate lineage between rounds (guide §3.3): round K's lab is
      // referenced TWICE by round K+1 (message join + label join), so
      // without materialization round 1's whole subtree is planned and
      // EXECUTED twice inside round 2 — the classic iterative-lineage
      // blowup (2^K subtrees at K rounds). lab is node-sized (≪ edges),
      // so the checkpoint is cheap; the final round's result is
      // consumed once and needs no checkpoint.
      if (round < 2) lab = lab.localCheckpoint()
    }
    lab.groupBy(col("lbl").as("label"))
      .agg(count(lit(1)).as("n_nodes"))
      .orderBy("label")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_clusters" -> dedupClusters,
    "q_graph_pagerank" -> pageRank,
    "q_graph_triangles" -> triangles,
    "q_graph_label_prop" -> labelProp
  )

  /** The oracle exploits the band structure instead of recursing: with
    * edges defined by "same lang, n_chars within 1", components are
    * exactly the maximal runs of distinct n_chars values with gaps ≤ 1
    * (gaps-and-islands over the distinct value set), and the cluster
    * representative is the island's min doc_id. Same semantics, closed
    * form — it validates the iterative engine result without assuming
    * the engine's algorithm.
    */
  /** The pagerank oracle mirrors the engine op-for-op: same functional
    * edge list, same DECIMAL(28,18) rank domain, same exact-decimal SUM,
    * same 0.85 DECIMAL(3,2) damping multiply, same double seeds — so
    * equal inputs produce bit-equal DOUBLE outputs after the final
    * (12,6) presentation rounding.
    *
    * That rounding must be `round(r, 6)`, NOT `CAST(r AS DECIMAL(12,6))`:
    * DuckDB's decimal→decimal cast TRUNCATES where Spark's rounds
    * HALF_UP, so any rank with a tail past 6 decimals diverges by one
    * presentation ulp. Invisible at sf0.01 (N=500 seeds keep every rank
    * terminating within 6 decimals) but real at sf0.1 — caught by the
    * r7 full-oracle sweep at sf0.1. DuckDB round() is half-away-from-
    * zero, which equals Spark's HALF_UP cast on this all-positive
    * domain.
    */
  private def prStep(prev: String, cur: String): String =
    s"""$cur AS (
       |  SELECT d.doc_id AS id,
       |    CAST(CAST(CAST(0.15 AS DOUBLE) / (SELECT n FROM meta) AS DECIMAL(28,18)) +
       |      CAST(COALESCE(c.in_r, CAST(0 AS DECIMAL(28,18))) * CAST(0.85 AS DECIMAL(3,2))
       |           AS DECIMAL(28,18)) AS DECIMAL(28,18)) AS r
       |  FROM d LEFT JOIN (
       |    SELECT e.dst, CAST(sum($prev.r) AS DECIMAL(28,18)) AS in_r
       |    FROM e JOIN $prev ON e.src = $prev.id GROUP BY e.dst) c
       |  ON d.doc_id = c.dst)""".stripMargin

  private val pageRankSql =
    s"""WITH d AS (SELECT doc_id, lang, source FROM documents),
       |meta AS (SELECT count(*) AS n, min(doc_id) AS gmin FROM d),
       |reps AS (SELECT lang, source, min(doc_id) AS rep FROM d GROUP BY lang, source),
       |e AS (
       |  SELECT d.doc_id AS src,
       |    CASE WHEN d.doc_id = r.rep THEN (SELECT gmin FROM meta) ELSE r.rep END AS dst
       |  FROM d JOIN reps r ON d.lang = r.lang AND d.source = r.source),
       |r0 AS (SELECT doc_id AS id,
       |  CAST(CAST(1.0 AS DOUBLE) / (SELECT n FROM meta) AS DECIMAL(28,18)) AS r FROM d),
       |${prStep("r0", "r1")},
       |${prStep("r1", "r2")},
       |${prStep("r2", "r3")}
       |SELECT id AS doc_id, CAST(round(r, 6) AS DOUBLE) AS pr
       |FROM r3 ORDER BY pr DESC, doc_id""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_graph_label_prop" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_partkey FROM lineitem WHERE l_orderkey % 5 = 0),
        |e0 AS (
        |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
        |  WHERE a.l_partkey < b.l_partkey),
        |e AS (SELECT u AS src, v AS dst FROM e0
        |      UNION ALL SELECT v AS src, u AS dst FROM e0),
        |l0 AS (SELECT DISTINCT src AS id, src AS lbl FROM e),
        |m1 AS (SELECT e.dst AS id, min(l0.lbl) AS ml
        |       FROM e JOIN l0 ON e.src = l0.id GROUP BY e.dst),
        |l1 AS (SELECT l0.id, least(l0.lbl, m1.ml) AS lbl
        |       FROM l0 JOIN m1 USING (id)),
        |m2 AS (SELECT e.dst AS id, min(l1.lbl) AS ml
        |       FROM e JOIN l1 ON e.src = l1.id GROUP BY e.dst),
        |l2 AS (SELECT l1.id, least(l1.lbl, m2.ml) AS lbl
        |       FROM l1 JOIN m2 USING (id))
        |SELECT lbl AS label, count(*) AS n_nodes
        |FROM l2 GROUP BY lbl ORDER BY label""".stripMargin,
    "q_graph_triangles" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_partkey FROM lineitem WHERE l_orderkey % 10 = 0),
        |e AS (
        |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
        |  WHERE a.l_partkey < b.l_partkey)
        |SELECT e1.u AS p_partkey, count(*) AS n_tri
        |FROM e e1 JOIN e e2 ON e1.v = e2.u
        |JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
        |GROUP BY e1.u ORDER BY p_partkey""".stripMargin,
    "q_graph_pagerank" -> pageRankSql,
    "q_dedup_clusters" ->
      """WITH d AS (
        |  SELECT doc_id, lang, n_chars FROM documents),
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
