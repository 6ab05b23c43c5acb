package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** §2.13 (round-4) merge / change-data operators: SCD-2 dimension
  * history maintenance and snapshot-generation diff (CDC
  * classification) — the two batch-MERGE shapes a snapshot-export
  * pipeline needs around the LWW compaction that
  * `Compaction`/`Snapshot` already cover.
  *
  * Both are single full-shuffle joins on the entity key — the minimum
  * any keyed merge pays — with no windows over the full fact table and
  * no driver-side state, so they hold at 100 TB (the join key is the
  * natural partitioning; AQE handles key skew).
  *
  * Update/delete sets are synthesized deterministically from fixture
  * columns (acctbal threshold, key residues) — the fixtures carry no
  * real change feed, and a deterministic synthesis lets DuckDB state
  * the identical semantics.
  */
object Merge {

  private val t0 = lit("1995-01-01").cast("timestamp")
  private val t1 = lit("2000-01-01").cast("timestamp")

  /** SCD-2 merge: apply a segment-change feed (customers with
    * c_acctbal > 5000 move to segment PREMIUM effective 2000-01-01) to
    * a type-2 dimension. Changed keys get their current row closed
    * (valid_to set, is_current false) plus a fresh open row; unchanged
    * keys pass through. One left join against the update feed + a
    * union of the new rows — the standard "close and append"
    * formulation that avoids rewriting unchanged history at scale
    * (only touched partitions change under a real table format).
    */
  def mergeScd2(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir)
    val upd = cust.where(col("c_acctbal") > 5000)
      .select(col("c_custkey").as("u_key"), lit("PREMIUM").as("u_segment"))
    val closed = cust
      .join(upd, col("c_custkey") === col("u_key"), "left")
      .select(
        col("c_custkey"),
        col("c_mktsegment").as("segment"),
        t0.as("valid_from"),
        when(col("u_key").isNotNull, t1).as("valid_to"),
        col("u_key").isNull.as("is_current"))
    val fresh = upd.select(
      col("u_key").as("c_custkey"),
      col("u_segment").as("segment"),
      t1.as("valid_from"),
      lit(null).cast("timestamp").as("valid_to"),
      lit(true).as("is_current"))
    closed.unionByName(fresh).orderBy("c_custkey", "valid_from")
  }

  /** Snapshot-generation diff: classify every key across two snapshot
    * generations as insert / delete / update. Generations are carved
    * deterministically from orders: gen1 lacks keys ≡0 (mod 11), gen2
    * lacks keys ≡0 (mod 13) and bumps prices 10% on keys ≡0 (mod 7).
    * One full outer join on the key classifies all three cases in a
    * single pass; unchanged rows are dropped before the sort so the
    * output is only the change set — at snapshot scale the diff is a
    * co-partitioned join (both sides hash on the same key) emitting
    * the typically-tiny delta.
    */
  def snapshotDiff(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(s, dir)
      .select(col("o_orderkey"), dec("o_totalprice").as("p"))
    val gen1 = base.where(pmod(col("o_orderkey"), lit(11)) =!= 0)
      .select(col("o_orderkey").as("k1"), col("p").as("p1"))
    val gen2 = base.where(pmod(col("o_orderkey"), lit(13)) =!= 0)
      .select(col("o_orderkey").as("k2"),
        when(pmod(col("o_orderkey"), lit(7)) === 0,
          col("p") * lit(1.10).cast("decimal(18,2)")).otherwise(col("p")).as("p2"))
    diffImpl(gen1, gen2)
  }

  /** The diff core, seamed for direct testing (the contract query
    * derives both generations from ONE source, so it can never produce
    * a one-sided NULL value — but the library surface can: a column
    * nulled between snapshots IS a change). The value comparison is
    * NULL-SAFE (`<=>` / IS DISTINCT FROM): the naive `p1 =!= p2` is
    * NULL when either side is NULL, falls to the "same" branch, and a
    * CDC operator silently reports a value→NULL transition as
    * unchanged — blindness to exactly the data-loss class a diff
    * exists to catch. Both-NULL compares equal (same), mirrored in
    * the oracle.
    *
    * NULL-KEY contract: a NULL key carries no identity, so it can
    * never MATCH (the equi join is deliberately null-rejecting — a
    * `<=>` key would cross-pair every NULL-key row of one generation
    * with every NULL-key row of the other). Classification therefore
    * keys on SIDE PRESENCE (per-side lit markers surviving the full
    * outer join), not on key nullness: a gen1 NULL-key orphan is a
    * DELETE (its row left the table) and a gen2 NULL-key orphan an
    * INSERT, each with an honest NULL o_orderkey — under key-nullness
    * classification the gen1 orphan read "insert", a delete-side row
    * reported as arriving. Unreachable in the contract query
    * (o_orderkey is non-null), so the oracle is unchanged.
    */
  private[graft] def diffImpl(gen1: DataFrame, gen2: DataFrame): DataFrame =
    gen1.withColumn("_g1", lit(true))
      .join(gen2.withColumn("_g2", lit(true)), col("k1") === col("k2"), "full_outer")
      .withColumn("change_type",
        when(col("_g1").isNull, "insert")
          .when(col("_g2").isNull, "delete")
          .when(!(col("p1") <=> col("p2")), "update")
          .otherwise("same"))
      .where(col("change_type") =!= "same")
      .select(
        coalesce(col("k1"), col("k2")).as("o_orderkey"),
        col("change_type"),
        dbl(col("p1")).as("old_price"),
        dbl(col("p2")).as("new_price"))
      // change_type/price tiebreakers: NULL-key orphans share a NULL
      // o_orderkey, and identical sort keys would make their relative
      // order nondeterministic (key-unique contract data: no-op).
      .orderBy(col("o_orderkey"), col("change_type"),
        col("old_price"), col("new_price"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_merge_scd2" -> mergeScd2,
    "q_snapshot_diff" -> snapshotDiff
  )

  val oracle: Map[String, String] = Map(
    "q_merge_scd2" ->
      """WITH upd AS (
        |  SELECT c_custkey AS u_key, 'PREMIUM' AS u_segment
        |  FROM customer WHERE c_acctbal > 5000),
        |closed AS (
        |  SELECT c.c_custkey, c.c_mktsegment AS segment,
        |    TIMESTAMP '1995-01-01 00:00:00' AS valid_from,
        |    CASE WHEN u.u_key IS NOT NULL THEN TIMESTAMP '2000-01-01 00:00:00' END AS valid_to,
        |    u.u_key IS NULL AS is_current
        |  FROM customer c LEFT JOIN upd u ON c.c_custkey = u.u_key),
        |fresh AS (
        |  SELECT u_key AS c_custkey, u_segment AS segment,
        |    TIMESTAMP '2000-01-01 00:00:00' AS valid_from,
        |    CAST(NULL AS TIMESTAMP) AS valid_to, true AS is_current
        |  FROM upd)
        |SELECT * FROM closed UNION ALL SELECT * FROM fresh
        |ORDER BY c_custkey, valid_from""".stripMargin,
    "q_snapshot_diff" ->
      """WITH base AS (
        |  SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS p FROM orders),
        |gen1 AS (
        |  SELECT o_orderkey AS k1, p AS p1 FROM base WHERE o_orderkey % 11 <> 0),
        |gen2 AS (
        |  SELECT o_orderkey AS k2,
        |    CASE WHEN o_orderkey % 7 = 0 THEN p * CAST(1.10 AS DECIMAL(18,2)) ELSE p END AS p2
        |  FROM base WHERE o_orderkey % 13 <> 0),
        |d AS (
        |  SELECT coalesce(k1, k2) AS o_orderkey,
        |    CASE WHEN k1 IS NULL THEN 'insert'
        |         WHEN k2 IS NULL THEN 'delete'
        |         WHEN p1 IS DISTINCT FROM p2 THEN 'update'
        |         ELSE 'same' END AS change_type,
        |    CAST(p1 AS DOUBLE) AS old_price,
        |    CAST(p2 AS DOUBLE) AS new_price
        |  FROM gen1 FULL OUTER JOIN gen2 ON k1 = k2)
        |SELECT * FROM d WHERE change_type <> 'same'
        |ORDER BY o_orderkey""".stripMargin
  )
}
