package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** §2.4 aggregations. Flagship first (TPC-H Q1 shape).
  *
  * Scale notes: every groupBy here is a hash aggregate with map-side
  * partial aggregation (Spark plans HashAggregate(partial) →
  * shuffle-on-group-keys → HashAggregate(final)); group cardinality is
  * tiny relative to input (6 flag×status groups, 25 nations, …) so the
  * shuffle moves only partial states — the pattern that survives 100 TB.
  */
object Aggregations {

  /** TPC-H Q1: pricing summary report. Decimal-exact aggregation,
    * total-order output (SURVEY §7.1).
    */
  def pricingSummary(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec("l_quantity")).as("sum_qty"),
        sum(dec("l_extendedprice")).as("sum_base_price"),
        sum(dec("l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec("l_discount")))
          .as("sum_disc_price"),
        avgDec(col("l_quantity"), count(lit(1))).as("avg_qty"),
        avgDec(col("l_extendedprice"), count(lit(1))).as("avg_price"),
        avgDec(col("l_discount"), count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_agg_pricing_summary" -> pricingSummary
  )

  val oracle: Map[String, String] = Map(
    "q_agg_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
        |  sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sum_base_price,
        |  sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS sum_disc_price,
        |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS DECIMAL(18,4)) AS avg_qty,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS DECIMAL(18,4)) AS avg_price,
        |  CAST(CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS DECIMAL(18,4)) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )
}
