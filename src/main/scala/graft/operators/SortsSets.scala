package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** §2.6 sorts / limits / top-k / set operations.
  *
  * The global top-k compiles to `TakeOrderedAndProject`: each task
  * keeps a k-row heap, the driver merges — no global sort, the only
  * top-k plan that makes sense at 100 TB.
  */
object SortsSets {

  /** Global top-20 by extendedprice with a unique tiebreak tuple. */
  def sortLimitTopK(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .orderBy(desc("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
      .limit(20)
      .select(col("l_orderkey"), col("l_linenumber"), dbl(dec("l_extendedprice")).as("price"))

  /** UNION ALL of two (overlapping) event slices, tagged per branch. */
  def setUnionAll(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val a = e.where(col("event_type") === "click")
      .select(col("event_id"), lit("a").as("src"))
    val b = e.where(col("value") > 400)
      .select(col("event_id"), lit("b").as("src"))
    a.unionAll(b).orderBy("event_id", "src")
  }

  /** INTERSECT (distinct semantics): BUILDING customers ∩ customers with orders. */
  def setIntersect(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
      .where(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val o = Tables.orders(s, dir).select(col("o_custkey"))
    c.intersect(o).orderBy("c_custkey")
  }

  /** EXCEPT (distinct): all customers minus those with urgent orders —
    * cross-checked against q_join_anti in SetOpsSpec.
    */
  def setExcept(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).select(col("c_custkey"))
    val o = Tables.orders(s, dir)
      .where(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
    c.except(o).orderBy("c_custkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sort_limit_topk" -> sortLimitTopK,
    "q_set_union_all" -> setUnionAll,
    "q_set_intersect" -> setIntersect,
    "q_set_except" -> setExcept
  )

  val oracle: Map[String, String] = Map(
    "q_sort_limit_topk" ->
      """SELECT l_orderkey, l_linenumber, CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS price
        |FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        |LIMIT 20""".stripMargin,
    "q_set_union_all" ->
      """SELECT event_id, 'a' AS src FROM events WHERE event_type = 'click'
        |UNION ALL
        |SELECT event_id, 'b' AS src FROM events WHERE value > 400
        |ORDER BY event_id, src""".stripMargin,
    "q_set_intersect" ->
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |INTERSECT
        |SELECT o_custkey FROM orders
        |ORDER BY c_custkey""".stripMargin,
    "q_set_except" ->
      """SELECT c_custkey FROM customer
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |ORDER BY c_custkey""".stripMargin
  )
}
