package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.sources.Tables

/** §2.12 (round-3) snapshot-compaction operators — the semantic core of
  * a Cassandra-snapshot-to-warehouse pipeline: a table arrives as many
  * immutable generations of writes, and the engine must reduce them to
  * current state with last-write-wins (LWW) cell resolution and
  * tombstone elimination.
  *
  * Both operators are argmax-by-struct aggregates, NOT row_number
  * windows: `max(struct(version, payload))` is map-side-combinable, so
  * each executor pre-reduces its own SSTable slice before the single
  * shuffle on the partition key — the only compaction shape that holds
  * up when one key's writes are spread over hundreds of input files.
  * (The oracles state the identical semantics with the window form.)
  */
object Compaction {

  /** LWW compaction of a write log into current state: the events
    * table read as a stream of upserts keyed by user_id, ordered by
    * (ts, event_id). The latest write wins; a latest write of type
    * 'error' is a tombstone — the key is deleted from the compacted
    * view (but still counted in n_writes, like a real compaction
    * stats line).
    */
  def snapshotCompact(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(
        max(struct(col("ts").as("ts"), col("event_id").as("eid"),
          col("event_type").as("t"), col("value").as("v"))).as("last"),
        count(lit(1)).as("n_writes"))
      // null-SAFE tombstone test: only an EXPLICIT 'error' deletes a
      // key. The naive =!= is NULL when the latest write's type is
      // NULL (corrupt producer output), silently dropping the whole
      // key from the compacted view — indistinguishable from a
      // tombstone, the data-loss class a compaction must never invent.
      // The oracle mirrors IS DISTINCT FROM.
      .where(!(col("last.t") <=> "error"))
      .select(col("user_id"), col("last.eid").as("last_event_id"),
        col("last.t").as("last_type"), col("last.v").as("last_value"),
        col("n_writes"))
      .orderBy("user_id")

  /** Merge of N snapshot generations, newest generation wins per key.
    * Generation 1 is a deterministic "delta" of orders (every third
    * key re-priced +10%); the merged view must show the delta's price
    * for touched keys and the base price otherwise. The union stays
    * unsorted and unshuffled until the single argmax exchange — adding
    * a generation is O(its size), never a re-sort of history.
    */
  def snapshotMerge(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(s, dir)
      .select(col("o_orderkey"), lit(0L).as("gen"),
        dec("o_totalprice").as("price"), col("o_orderstatus").as("status"))
    val delta = Tables.orders(s, dir)
      .where(pmod(col("o_orderkey"), lit(3)) === 0)
      .select(col("o_orderkey"), lit(1L).as("gen"),
        (dec("o_totalprice") * lit(1.1).cast(DecimalType(3, 1))).as("price"),
        lit("R").as("status"))
    base.unionByName(delta)
      .groupBy(col("o_orderkey"))
      .agg(max(struct(col("gen").as("g"), col("price").as("p"),
        col("status").as("st"))).as("m"))
      .select(col("o_orderkey"), col("m.g").as("gen"),
        dbl(col("m.p")).as("price"), col("m.st").as("status"))
      .orderBy("o_orderkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_snapshot_compact" -> snapshotCompact,
    "q_snapshot_merge" -> snapshotMerge
  )

  val oracle: Map[String, String] = Map(
    "q_snapshot_compact" ->
      """WITH v AS (
        |  SELECT user_id, event_id, event_type, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn,
        |    count(*) OVER (PARTITION BY user_id) AS n_writes
        |  FROM events)
        |SELECT user_id, event_id AS last_event_id, event_type AS last_type,
        |  value AS last_value, n_writes
        |FROM v WHERE rn = 1 AND event_type IS DISTINCT FROM 'error'
        |ORDER BY user_id""".stripMargin,
    "q_snapshot_merge" ->
      """WITH g AS (
        |  SELECT o_orderkey, 0 AS gen,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS price, o_orderstatus AS status
        |  FROM orders
        |  UNION ALL
        |  SELECT o_orderkey, 1 AS gen,
        |    CAST(o_totalprice AS DECIMAL(18,2)) * CAST(1.1 AS DECIMAL(3,1)) AS price,
        |    'R' AS status
        |  FROM orders WHERE o_orderkey % 3 = 0),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY gen DESC) AS rn
        |  FROM g)
        |SELECT o_orderkey, CAST(gen AS BIGINT) AS gen,
        |  CAST(price AS DOUBLE) AS price, status
        |FROM r WHERE rn = 1
        |ORDER BY o_orderkey""".stripMargin
  )
}
