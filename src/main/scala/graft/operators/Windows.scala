package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** §2.5 window functions.
  *
  * Every window partitions on a real key (customer/user) so state per
  * partition is bounded — the shape that scales. The one global
  * window (ntile over account balances) partitions by market segment
  * for the same reason.
  */
object Windows {

  /** Top-3 most recent orders per customer; rank/dense_rank computed
    * on the (tied) order date, row_number on the unique tiebreak.
    */
  def winRank(s: SparkSession, dir: String): DataFrame = {
    val byDate = Window.partitionBy(col("o_custkey")).orderBy(desc("o_orderdate"))
    val unique = Window.partitionBy(col("o_custkey"))
      .orderBy(desc("o_orderdate"), asc("o_orderkey"))
    Tables.orders(s, dir)
      .select(
        col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        row_number().over(unique).cast("bigint").as("rn"),
        rank().over(byDate).cast("bigint").as("rk"),
        dense_rank().over(byDate).cast("bigint").as("drk"))
      .where(col("rn") <= 3)
      .orderBy("o_custkey", "rn")
  }

  /** Per-user event deltas: gap to previous event (µs) and next value. */
  def winLagLead(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .select(
        col("event_id"), col("user_id"),
        (unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w))).as("gap_us"),
        lead(col("value"), 1).over(w).as("next_value"))
      .orderBy("event_id")
  }

  /** Running revenue per customer (ROWS unbounded-preceding frame). */
  def winRunning(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, dir)
      .select(
        col("o_custkey"), col("o_orderkey"),
        dbl(sum(dec("o_totalprice")).over(w)).as("running_total"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** 7-day trailing spend per customer: RANGE frame over epoch seconds. */
  def winRangeFrame(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(unix_timestamp(col("o_orderdate")))
      .rangeBetween(-7L * 86400, 0)
    Tables.orders(s, dir)
      .select(
        col("o_custkey"), col("o_orderkey"),
        dbl(sum(dec("o_totalprice")).over(w)).as("trailing_7d"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** ntile/percent_rank/cume_dist over account balances per segment. */
  def winNtileCume(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal"), col("c_custkey"))
    Tables.customer(s, dir)
      .select(
        col("c_custkey"), col("c_mktsegment"),
        ntile(4).over(w).cast("bigint").as("quartile"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
      .orderBy("c_custkey")
  }

  /** first_value/last_value/nth_value over an explicit full-partition
    * frame (last_value over the default frame is a classic trap — it
    * sees only up to the current row).
    */
  def winFirstLast(s: SparkSession, dir: String): DataFrame = {
    val full = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(s, dir)
      .select(
        col("o_custkey"), col("o_orderkey"),
        first(col("o_orderkey")).over(full).as("first_order"),
        last(col("o_orderkey")).over(full).as("last_order"),
        nth_value(col("o_orderkey"), 2).over(full).as("second_order"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Conversion funnel (view → click-after-view → purchase-after-
    * click) per user, reduced to stage reach-counts. Three chained
    * conditional-min window passes over the SAME user partition — one
    * exchange for all three stages, no self-joins (the join
    * formulation would rescan events per stage). The final
    * multi-distinct aggregate adds its own Expand+exchange over the
    * event rows, but partial aggregation dedups (gid, user_id) pairs
    * map-side before that shuffle; the 100 TB funnel shape.
    */
  def winFunnel(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
    Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_type"))
      .withColumn("t1", min(when(col("event_type") === "view", col("ts"))).over(byUser))
      .withColumn("t2", min(when(col("event_type") === "click"
        && col("ts") >= col("t1"), col("ts"))).over(byUser))
      .withColumn("t3", min(when(col("event_type") === "purchase"
        && col("ts") >= col("t2"), col("ts"))).over(byUser))
      .agg(
        countDistinct(when(col("t1").isNotNull, col("user_id"))).as("n_view"),
        countDistinct(when(col("t2").isNotNull, col("user_id"))).as("n_view_click"),
        countDistinct(when(col("t3").isNotNull, col("user_id"))).as("n_funnel"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_win_funnel" -> winFunnel,
    "q_win_rank" -> winRank,
    "q_win_first_last" -> winFirstLast,
    "q_win_lag_lead" -> winLagLead,
    "q_win_running" -> winRunning,
    "q_win_range_frame" -> winRangeFrame,
    "q_win_ntile_cume" -> winNtileCume
  )

  val oracle: Map[String, String] = Map(
    "q_win_funnel" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
        |w1 AS (SELECT *, min(CASE WHEN event_type = 'view' THEN ts END)
        |         OVER (PARTITION BY user_id) AS t1 FROM e),
        |w2 AS (SELECT *, min(CASE WHEN event_type = 'click' AND ts >= t1 THEN ts END)
        |         OVER (PARTITION BY user_id) AS t2 FROM w1),
        |w3 AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND ts >= t2 THEN ts END)
        |         OVER (PARTITION BY user_id) AS t3 FROM w2)
        |SELECT
        |  count(DISTINCT CASE WHEN t1 IS NOT NULL THEN user_id END) AS n_view,
        |  count(DISTINCT CASE WHEN t2 IS NOT NULL THEN user_id END) AS n_view_click,
        |  count(DISTINCT CASE WHEN t3 IS NOT NULL THEN user_id END) AS n_funnel
        |FROM w3""".stripMargin,
    "q_win_rank" ->
      """SELECT * FROM (
        |  SELECT o_custkey, o_orderkey, o_orderdate,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey) AS rn,
        |    rank() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC) AS rk,
        |    dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC) AS drk
        |  FROM orders)
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,
    "q_win_first_last" ->
      """SELECT o_custkey, o_orderkey,
        |  first_value(o_orderkey) OVER w AS first_order,
        |  last_value(o_orderkey) OVER w AS last_order,
        |  nth_value(o_orderkey, 2) OVER w AS second_order
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_win_lag_lead" ->
      """SELECT event_id, user_id,
        |  epoch_us(CAST(ts AS TIMESTAMP)) - epoch_us(lag(CAST(ts AS TIMESTAMP), 1)
        |    OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)) AS gap_us,
        |  lead(value, 1) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS next_value
        |FROM events
        |ORDER BY event_id""".stripMargin,
    "q_win_running" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
        |FROM orders
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_win_range_frame" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY date_diff('second', TIMESTAMP '1970-01-01 00:00:00', o_orderdate)
        |    RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW) AS DOUBLE) AS trailing_7d
        |FROM orders
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_win_ntile_cume" ->
      """SELECT c_custkey, c_mktsegment,
        |  ntile(4) OVER w AS quartile,
        |  percent_rank() OVER w AS pr,
        |  cume_dist() OVER w AS cd
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_custkey""".stripMargin
  )
}
