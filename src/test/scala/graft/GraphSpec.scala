package graft

import org.apache.spark.sql.functions._
import graft.operators.Graph

/** Connected components: the driver-local union-find finish and the
  * distributed pointer-jumping loop must produce identical labels —
  * the threshold only decides WHO does the last bit of work, never
  * WHAT the answer is.
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def cc(nodes: Seq[Long], edges: Seq[(Long, Long)], threshold: Long) = {
    // components expects a symmetric edge list, like the banded join builds
    val sym = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    Graph.components(spark, nodes.toDF("nid"), sym.toDF("src", "dst"), threshold)
      .orderBy("id").as[(Long, Long)].collect().toSeq
  }

  test("local union-find and distributed propagation agree on a planted graph") {
    // two chains (1-2-3-4, 10-11), a triangle (20,21,22), two isolates
    val nodes = Seq[Long](1, 2, 3, 4, 10, 11, 20, 21, 22, 30, 31)
    val edges = Seq[(Long, Long)]((1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22))
    val local = cc(nodes, edges, threshold = 1000000L)
    val dist = cc(nodes, edges, threshold = 0L)
    val expected = Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 30L -> 30L, 31L -> 31L)
    assert(local == expected)
    assert(dist == expected)
  }

  test("long chain converges within the iteration cap (pointer jumping)") {
    // path of 200 nodes: naive propagation needs ~200 rounds; pointer
    // jumping with double-jump must finish inside the 25-round cap
    val nodes = (0L until 200L)
    val edges = (0L until 199L).map(i => (i, i + 1))
    val dist = cc(nodes, edges, threshold = 0L)
    assert(dist.forall(_._2 == 0L), "every node labels to the chain min")
  }

  test("distributed fixpoint detection survives label sums past 2^63") {
    // ids chosen so the initial label sum is 2^64 + 6 and round 1's
    // total label decrease is EXACTLY 2^64: a Long-typed fixpoint sum
    // either throws mid-job (ANSI sum overflow — Spark 4 default) or
    // wraps so that sum_0 == sum_1 == 6 and the loop declares
    // convergence after round 1 with v5..v7 still carrying interior
    // labels — silent partial merge. The DECIMAL(38,0) detector sees
    // 2^64+6 != 6 and keeps jumping until the true fixpoint (all a0).
    //   path: 0 - 1 - 2 - 3 - (2^62-2) - (2^62-1) - 2^62 - (2^62+3)
    //   after round 1 (step + double jump): [a0×5, a1, a2, a3]
    //   decrease = (a4+a5+a6+a7) - 4*a0 = 4*2^62 + 0 = 2^64
    val q = 1L << 62
    val nodes = Seq[Long](0, 1, 2, 3, q - 2, q - 1, q, q + 3)
    val edges = nodes.zip(nodes.tail)
    val dist = cc(nodes, edges, threshold = 0L)
    assert(dist == nodes.map(_ -> 0L),
      "every node must label to the path min despite the 2^64 sum collision")
  }

  test("pagerank: mass conserved, global-min doc tops the ranking") {
    val df = q("q_graph_pagerank").cache()
    val docs = graft.sources.Tables.documents(spark, sf)
    val n = docs.count()
    assert(df.count() == n, "one rank row per document")
    // out-degree is exactly 1, so total mass stays 0.15 + 0.85*S = 1:
    // sum of (12,6)-rounded ranks is 1 within n * half-ulp
    val mass = df.agg(sum("pr")).head.getDouble(0)
    assert(math.abs(mass - 1.0) < n * 5e-7 + 1e-9, s"mass=$mass")
    // every rank >= the teleport floor 0.15/n (up to presentation rounding)
    assert(df.where(col("pr") < lit(0.15 / n - 1e-6)).count() == 0)
    // the global min doc (every bucket representative's sink) ranks first
    val gmin = docs.agg(min("doc_id")).head.getLong(0)
    assert(df.head.getLong(0) == gmin)
  }

  test("triangles: degree-oriented count equals the naive id-ordered join") {
    val df = q("q_graph_triangles").cache()
    val li = graft.sources.Tables.lineitem(spark, sf)
      .where(pmod(col("l_orderkey"), lit(10)) === 0)
      .select(col("l_orderkey"), col("l_partkey"))
    val e = li.as("a").join(li.as("b"), Seq("l_orderkey"))
      .where(col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .distinct().cache()
    val naive = e.as("e1")
      .join(e.as("e2"), col("e1.v") === col("e2.u"))
      .join(e.as("e3"), col("e3.u") === col("e1.u") && col("e3.v") === col("e2.v"), "left_semi")
      .groupBy(col("e1.u").as("p_partkey")).agg(count(lit(1)).as("n_tri"))
    assert(df.join(naive, Seq("p_partkey", "n_tri"), "full_outer")
      .count() == df.count() && df.count() == naive.count(),
      "per-min-vertex triangle counts must agree between algorithms")
    assert(df.agg(sum("n_tri")).head.getLong(0) > 0, "shard graph has triangles")
  }

  test("triangles: order-only clone inflation leaves the result exactly unchanged") {
    // the rehearsal's (triangles_inflated) claim as a CORRECTNESS
    // invariant: cloning orders WITHOUT re-keying parts repeats the same
    // co-occurrence pairs, so the distinct edge set — and therefore every
    // per-vertex triangle count — must be bit-identical to the base run
    // (the ×K input only stresses the pair-extraction + dedup phase)
    val k = 3
    val li = graft.sources.Tables.lineitem(spark, sf)
      .where(pmod(col("l_orderkey"), lit(10)) === 0)
      .select(col("l_orderkey"), col("l_partkey"))
    val cloned = li.withColumn("rep", explode(expr(s"sequence(1, $k)")))
      .select((col("l_orderkey") * k + col("rep")).as("l_orderkey"), col("l_partkey"))
    val base = Graph.trianglesImpl(li).collect().toSeq
    val got = Graph.trianglesImpl(cloned).collect().toSeq
    assert(base.nonEmpty && got == base,
      "repeated co-occurrence rows must dedup to the identical triangle counts")
  }

  test("label propagation is invariant under duplicate edges (r21 dedup-free edge build)") {
    // r21 dropped the edge-list distinct (one full exchange + two
    // hash-agg passes) on the argument that every per-round consumer is
    // min(lbl) — duplicate-insensitive — and the node list dedups src
    // itself. This pins that argument as a correctness invariant:
    // replaying every co-purchase row K times (same order keys, so the
    // SAME pairs repeat, k² copies each) must leave every community
    // label and size bit-identical.
    val k = 3
    val li = graft.sources.Tables.lineitem(spark, sf)
      .where(pmod(col("l_orderkey"), lit(5)) === 0)
      .select(col("l_orderkey"), col("l_partkey"))
    val duplicated = li.withColumn("rep", explode(expr(s"sequence(1, $k)"))).drop("rep")
    val base = Graph.labelPropImpl(li).collect().toSeq
    val got = Graph.labelPropImpl(duplicated).collect().toSeq
    assert(base.nonEmpty && got == base,
      "duplicate co-occurrence rows must not change any community label or size")
  }

  test("label propagation on K disjoint clone graphs is the base result ×K") {
    // the rehearsal's linearity claim as a CORRECTNESS invariant: re-keying
    // both sides of the co-purchase row with the same clone index builds K
    // structurally identical but disjoint graph copies, so clone r's
    // communities must be exactly the base communities with every min-label
    // mapped through the re-key (lbl*K + r) and sizes unchanged
    val k = 3
    val li = graft.sources.Tables.lineitem(spark, sf)
      .where(pmod(col("l_orderkey"), lit(5)) === 0)
      .select(col("l_orderkey"), col("l_partkey"))
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue))
    val base = pairs(Graph.labelPropImpl(li))
    val cloned = li.withColumn("rep", explode(expr(s"sequence(1, $k)")))
      .select((col("l_orderkey") * k + col("rep")).as("l_orderkey"),
        (col("l_partkey") * k + col("rep")).as("l_partkey"))
    val got = pairs(Graph.labelPropImpl(cloned)).toSet
    val want = (for (r <- 1 to k; (lbl, n) <- base) yield (lbl * k + r, n)).toSet
    assert(base.nonEmpty, "fixture subsample must form a non-empty graph")
    assert(got == want,
      "clone-graph communities must be the base communities re-keyed, ×K")
  }

  test("q_dedup_clusters matches between solve paths on fixture data") {
    val viaLocal = Graph.dedupClustersImpl(spark, sf, 100000L).collect().toSeq
    val viaDist = Graph.dedupClustersImpl(spark, sf, 0L).collect().toSeq
    assert(viaLocal == viaDist)
    assert(viaLocal.nonEmpty)
  }

  test("the between-query unpersist sweep drains every pinned checkpoint block") {
    // Bench/Verify run 168 queries in one JVM and sweep leftover
    // localCheckpoint storage after each; this pins that the sweep
    // actually drains the session (an iterative query pins blocks, the
    // sweep releases ALL of them) — if a future Spark version changed
    // unpersist/registry semantics, this fails before the bench drifts.
    // SAFE ONLY BECAUSE suites run sequentially in the forked test JVM
    // (sbt's Test/fork with testForkedParallel left at false): this
    // test unpersists every RDD in the SHARED test SparkSession, which
    // would destroy localCheckpoint blocks a concurrently-running suite
    // is using. If suite-level parallelism is ever enabled, move this
    // test to a dedicated SparkSession.
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true)) // clean slate from earlier tests
    SparkEntry.queries("q_dedup_clusters")(spark, sf).count()
    assert(spark.sparkContext.getPersistentRDDs.nonEmpty,
      "the iterative query should have pinned checkpoint blocks")
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "the sweep must release every block the query pinned")
  }
}
