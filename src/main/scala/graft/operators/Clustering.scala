package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** §2.14 (round-4, session 3) deterministic k-means over the
  * embeddings table — the clustering stage of a training-data
  * pipeline (corpus bucketing, PQ codebook training, topic sharding).
  *
  * Engine-portable determinism is the whole design: float math makes
  * k-means irreproducible across engines AND across partition layouts
  * (sum order perturbs centroids), so every step here is exact
  * integer arithmetic — coordinates quantize once to
  * `round(x·1e6 + 2e6)` (the +2e6 shift keeps values positive, so
  * floor-division and truncating division agree between engines),
  * distances are exact integer sums of squares (≤7.2e13 at dim 64,
  * far inside BIGINT), centroid updates are integer mean (`div`), and
  * the assignment argmin breaks ties by centroid id. The result is a
  * pure function of the value SET — identical on any executor count
  * (ClusteringSpec proves it) and replayable by DuckDB in plain SQL,
  * which makes this a fully ORACLED clustering, not a seeded one.
  *
  * Scale shape (the feature-parallel SQL formulation): points explode
  * to (vec, dim, q) once; each Lloyd iteration is the k×dim centroid
  * table BROADCAST onto the points (centroids are always tiny), a
  * map-side-combinable (vec, cid) partial-distance agg — the explode
  * ×k blowup collapses BEFORE the shuffle — then an argmin-by-struct
  * and a (cid, dim) mean agg: two exchanges per iteration, none of
  * them fact×fact. Init is the first k vectors by id (deterministic,
  * no RNG). The float-native twin (codegen float_dot, used by the
  * q_sim_* family) is faster per op but not bit-reproducible; this is
  * the auditable path.
  */
object Clustering {

  private val K = 4
  private val Iters = 2

  /** (vec_id, d, q): coordinates quantized to exact positive BIGINTs. */
  private[graft] def pointsOf(emb: DataFrame): DataFrame =
    emb
      // corrupt-embedding guard (r18/r19): one NaN/Inf/huge-finite
      // component would kill the whole job at the ANSI long cast below,
      // and a NULL component would silently yield partial-dimension
      // distances; an unclusterable (unquantizable/null-element/null/
      // empty) vector is dropped from the point set —
      // if one sits among the K lowest init ids its centroid pivots to
      // NULL and is coalesced to +inf in assign (never wins), exactly
      // the emptied-cluster path the assign scaladoc documents
      .where(finiteEmbedding(col("embedding")))
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("d", "x")))
      .select(col("vec_id"), col("d"),
        round(col("x").cast("double") * 1000000.0 + 2000000.0).cast("long").as("q"))

  private[graft] def points(s: SparkSession, dir: String): DataFrame =
    pointsOf(Tables.embeddings(s, dir))

  /** Initial centroids: the K lowest vec_ids, cid = their rank. */
  private[graft] def initCentroidsOf(emb: DataFrame): DataFrame =
    initFrom(emb, pointsOf(emb))

  /** Same, over an already-materialized points frame — kmeansImpl
    * passes its checkpointed points so init doesn't replay the
    * scan+explode lineage as a second plan.
    */
  private def initFrom(emb: DataFrame, pts: DataFrame): DataFrame = {
    val ids = emb
      .select("vec_id").orderBy("vec_id").limit(K)
      .withColumn("cid", row_number().over(Window.orderBy("vec_id")) - 1)
    pts.join(broadcast(ids), "vec_id")
      .select(col("cid"), col("d"), col("q").as("c"))
  }

  private[graft] def initCentroids(s: SparkSession, dir: String): DataFrame =
    initCentroidsOf(Tables.embeddings(s, dir))

  /** Assign each vector to its nearest centroid (exact integer
    * distance, ties to the lower cid). Emits (vec_id, cid, dist).
    *
    * The k centroids are PIVOTED to columns of a dim-sized lookup
    * table, so the k distances accumulate as k parallel sum-aggregates
    * in ONE map-side-combinable exchange on vec_id — no ×k row blowup
    * and no second argmin exchange (the argmin is a width-k `least`
    * over structs in the projection). A centroid that lost all its
    * members pivots to NULL and is coalesced to +∞, so it can never
    * win — identical to the oracle, where an emptied cluster simply
    * disappears from the candidate set.
    */
  private[graft] def assign(pts: DataFrame, cent: DataFrame): DataFrame = {
    val cw = cent.groupBy(col("d")).pivot("cid", 0 until K).agg(first(col("c")))
    val sums = (0 until K).map { j =>
      sum((col("q") - col(s"$j")) * (col("q") - col(s"$j"))).as(s"d$j")
    }
    val cands = (0 until K).map { j =>
      struct(coalesce(col(s"d$j"), lit(Long.MaxValue)).as("dist"), lit(j).as("cid"))
    }
    pts.join(broadcast(cw), "d")
      .groupBy(col("vec_id"))
      .agg(sums.head, sums.tail: _*)
      .select(col("vec_id"), least(cands: _*).as("m"))
      .select(col("vec_id"), col("m.cid").as("cid"), col("m.dist").as("dist"))
  }

  /** Integer-mean centroid update (positive sums, so floor == trunc). */
  private[graft] def update(pts: DataFrame, asg: DataFrame): DataFrame =
    pts.join(asg.select("vec_id", "cid"), "vec_id")
      .groupBy(col("cid"), col("d"))
      .agg(expr("sum(q) div count(1)").as("c"))

  /** Centroids as driver-side exact integers: cid → per-dim values.
    * Bounded by K×dim (256 longs here — same bounded-collect class as
    * the 16-row IVF centroid read, SimilarityOps), never by data size,
    * and exact BIGINTs, so the collected values are identical on any
    * executor count — the engine-portable determinism is untouched.
    */
  private def collectCentroids(cent: DataFrame): Map[Int, Array[java.lang.Long]] =
    cent.select(col("cid").cast("int"), col("d").cast("int"), col("c"))
      .collect()
      .groupBy(_.getInt(0))
      .map { case (cid, rows) =>
        // boxed with nulls, NOT zero-filled: a null mean (every member's
        // element null at this position) must SKIP the dimension in the
        // distance, exactly like the pivoted frame's null cell — a 0
        // would charge (q-0)² instead
        val dim = rows.iterator.map(_.getInt(1)).max + 1
        val arr = new Array[java.lang.Long](dim)
        rows.foreach(r => if (!r.isNullAt(2)) arr(r.getInt(1)) = r.getLong(2))
        cid -> arr
      }

  /** Assignment against LITERAL centroid arrays: the k distances are
    * k parallel sum-aggregates over `get(<const array>, d)` lookups —
    * constant-folded to one literal ArrayData each — in ONE
    * map-side-combinable exchange on vec_id. Versus the pivoted-frame
    * assign this removes the per-round pivot aggregate and broadcast
    * join (two plans and a shuffle each Lloyd round), which dominated
    * the per-round cost: the k×dim centroid table is driver-resident
    * between rounds anyway. `get()` is null on out-of-range d and
    * sum() skips nulls, so ragged dims degrade exactly like the old
    * inner join on d (excess dims drop out of the distance) — and when
    * EVERY dim of a point drops out against some present centroid the
    * sum itself is null, so the candidate coalesces to +∞ exactly like
    * the pivoted frame's emptied-pivot cell (least() over structs
    * otherwise ranks a null dist field FIRST on this Spark build,
    * which would hand the argmin to the degenerate centroid). A
    * centroid that lost all members is absent from the map and enters
    * the argmin as a MaxValue candidate — identical to the oracle,
    * where an emptied cluster disappears from the candidate set.
    */
  private[graft] def assignLit(pts: DataFrame, cent: Map[Int, Array[java.lang.Long]]): DataFrame = {
    val sums = (0 until K).flatMap { j =>
      cent.get(j).map { arr =>
        val lits = arr.map(v =>
          if (v == null) lit(null).cast("long") else lit(v.longValue()))
        val diff = col("q") - get(array(lits.toIndexedSeq: _*), col("d"))
        sum(diff * diff).as(s"d$j")
      }
    }
    val cands = (0 until K).map { j =>
      if (cent.contains(j))
        struct(coalesce(col(s"d$j"), lit(Long.MaxValue)).as("dist"), lit(j).as("cid"))
      else struct(lit(Long.MaxValue).as("dist"), lit(j).as("cid"))
    }
    pts.groupBy(col("vec_id"))
      .agg(sums.head, sums.tail: _*)
      .select(col("vec_id"), least(cands: _*).as("m"))
      .select(col("vec_id"), col("m.cid").as("cid"), col("m.dist").as("dist"))
  }

  /** Parameterized core shared with ScaleRehearsal (kmeans_inflated)
    * so the rehearsal measures THIS dataflow, not a copy.
    */
  private[graft] def kmeansImpl(emb: DataFrame): DataFrame = {
    // 5 stages reuse the exploded points; checkpoint once so each
    // Lloyd round reads the materialized (vec, d, q) table instead of
    // re-running the scan+explode lineage (same discipline as the
    // iterative graph operators)
    val pts = pointsOf(emb).localCheckpoint()
    // r11: centroids round-trip through the driver as literals (see
    // assignLit) instead of localCheckpointed frames — measured 2.0s
    // steady / 6.9s one-shot with the pivoted-frame formulation at
    // sf0.1 CPUS=32, plan-compile bound (jit+22s forensics in the r11
    // s1 bench window), since each round compiled a pivot + broadcast
    // join + two aggregates; the literal form compiles one aggregate
    // per round
    var cent = collectCentroids(initFrom(emb, pts))
    // empty input ⇒ no centroids ⇒ nothing to assign: return the empty
    // report directly (assignLit's agg needs ≥1 candidate to build)
    if (cent.isEmpty)
      return pts.select(col("vec_id").cast("long").as("cid"),
        lit(0L).as("n_vecs"), lit(0L).as("inertia_q")).where(lit(false))
    for (_ <- 1 to Iters) cent = collectCentroids(update(pts, assignLit(pts, cent)))
    assignLit(pts, cent)
      .groupBy(col("cid"))
      .agg(count(lit(1)).as("n_vecs"), sum(col("dist")).as("inertia_q"))
      // BIGINT cid to exactly match the oracle's row_number()-derived
      // int64 — the one dtype drift the driver's comparator had been
      // tolerating since r4 (flagged every round by oracle_check)
      .select(col("cid").cast("long").as("cid"), col("n_vecs"), col("inertia_q"))
      .orderBy("cid")
  }

  /** Final per-cluster report: size + exact quantized inertia. */
  def clusterKmeans(s: SparkSession, dir: String): DataFrame =
    kmeansImpl(Tables.embeddings(s, dir))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_cluster_kmeans" -> clusterKmeans)

  val oracle: Map[String, String] = Map(
    "q_cluster_kmeans" ->
      """WITH pts AS (
        |  SELECT vec_id, s.d AS d, s.q AS q FROM (
        |    SELECT vec_id, unnest(list_transform(range(1, len(embedding) + 1),
        |      i -> {'d': i, 'q': CAST(round(CAST(embedding[i] AS DOUBLE)
        |                                    * 1000000.0 + 2000000.0) AS BIGINT)})) AS s
        |    FROM embeddings)),
        |init AS (
        |  SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS cid
        |  FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 4)),
        |c0 AS (SELECT cid, d, q AS c FROM pts JOIN init USING (vec_id)),
        |a0 AS (
        |  SELECT vec_id, cid, dist FROM (
        |    SELECT vec_id, cid, dist,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
        |    FROM (SELECT p.vec_id, c.cid,
        |            CAST(sum((p.q - c.c) * (p.q - c.c)) AS BIGINT) AS dist
        |          FROM pts p JOIN c0 c USING (d) GROUP BY p.vec_id, c.cid))
        |  WHERE rn = 1),
        |c1 AS (
        |  SELECT cid, d, CAST(sum(q) AS BIGINT) // count(*) AS c
        |  FROM pts JOIN (SELECT vec_id, cid FROM a0) USING (vec_id)
        |  GROUP BY cid, d),
        |a1 AS (
        |  SELECT vec_id, cid, dist FROM (
        |    SELECT vec_id, cid, dist,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
        |    FROM (SELECT p.vec_id, c.cid,
        |            CAST(sum((p.q - c.c) * (p.q - c.c)) AS BIGINT) AS dist
        |          FROM pts p JOIN c1 c USING (d) GROUP BY p.vec_id, c.cid))
        |  WHERE rn = 1),
        |c2 AS (
        |  SELECT cid, d, CAST(sum(q) AS BIGINT) // count(*) AS c
        |  FROM pts JOIN (SELECT vec_id, cid FROM a1) USING (vec_id)
        |  GROUP BY cid, d),
        |a2 AS (
        |  SELECT vec_id, cid, dist FROM (
        |    SELECT vec_id, cid, dist,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
        |    FROM (SELECT p.vec_id, c.cid,
        |            CAST(sum((p.q - c.c) * (p.q - c.c)) AS BIGINT) AS dist
        |          FROM pts p JOIN c2 c USING (d) GROUP BY p.vec_id, c.cid))
        |  WHERE rn = 1)
        |SELECT cid, count(*) AS n_vecs, CAST(sum(dist) AS BIGINT) AS inertia_q
        |FROM a2 GROUP BY cid ORDER BY cid""".stripMargin)
}
