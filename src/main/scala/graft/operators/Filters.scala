package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** §2.2 projection / filter / predicates. All predicates here are
  * plain Catalyst expressions, so they fold into the parquet scan
  * (pushdown) and stay inside whole-stage codegen.
  */
object Filters {

  /** TPC-H Q6 shape: compound range predicates + exact-decimal revenue. */
  def filterBasic(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1997-01-01").cast("timestamp")
        && col("l_discount").between(0.05, 0.07)
        && col("l_quantity") < 24)
      .agg(
        dbl(sum(dec("l_extendedprice") * dec("l_discount"))).as("revenue"),
        count(lit(1)).as("n"))

  /** IN-list, LIKE, and null-safe equality (`<=>` / IS NOT DISTINCT FROM). */
  def filterInLikeNull(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .where((col("p_type").isin("ECONOMY", "PROMO") && col("p_name").like("%a%"))
        || col("p_brand") <=> "Brand#3")
      .select(col("p_partkey"), col("p_name"), col("p_brand"), col("p_type"), col("p_size"))
      .orderBy("p_partkey")

  /** Derived-column projection: arithmetic over exact decimals + CASE WHEN. */
  def projectExpr(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .where(col("l_shipdate") >= lit("2001-01-01").cast("timestamp"))
      .select(
        col("l_orderkey"),
        col("l_linenumber"),
        dbl(dec("l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec("l_discount")))
          .as("net_price"),
        // leading null branch (the langid discipline): a NULL quantity
        // reaches no `>` truthfully, and the bare otherwise would
        // FABRICATE the "small" label from no data — in both engines,
        // since the oracle's CASE mirrored it. NULL in, NULL class out.
        when(col("l_quantity").isNull, lit(null).cast("string"))
          .when(col("l_quantity") > 25, "bulk")
          .when(col("l_quantity") > 10, "mid")
          .otherwise("small").as("size_class"))
      .orderBy("l_orderkey", "l_linenumber")

  /** Correlated scalar subquery (Catalyst decorrelates it into an
    * aggregate + join): parts priced above their brand's average.
    * The average is the exact-decimal double form on both sides so
    * the comparison is parallelism-proof.
    */
  def filterSubquery(s: SparkSession, dir: String): DataFrame = {
    Tables.part(s, dir).createOrReplaceTempView("part_sq")
    s.sql(
      """SELECT p_partkey, p_brand, CAST(CAST(p_retailprice AS DECIMAL(18,2)) AS DOUBLE) AS price
        |FROM part_sq p1
        |WHERE p_retailprice >
        |  (SELECT CAST(sum(CAST(p2.p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / count(*)
        |   FROM part_sq p2 WHERE p2.p_brand = p1.p_brand)
        |ORDER BY p_partkey""".stripMargin)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_filter_basic" -> filterBasic,
    "q_filter_subquery" -> filterSubquery,
    "q_filter_in_like_null" -> filterInLikeNull,
    "q_project_expr" -> projectExpr
  )

  val oracle: Map[String, String] = Map(
    "q_filter_basic" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  count(*) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,
    "q_filter_subquery" ->
      """SELECT p_partkey, p_brand, CAST(CAST(p_retailprice AS DECIMAL(18,2)) AS DOUBLE) AS price
        |FROM part p1
        |WHERE p_retailprice >
        |  (SELECT CAST(sum(CAST(p2.p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / count(*)
        |   FROM part p2 WHERE p2.p_brand = p1.p_brand)
        |ORDER BY p_partkey""".stripMargin,
    "q_filter_in_like_null" ->
      """SELECT p_partkey, p_name, p_brand, p_type, p_size
        |FROM part
        |WHERE (p_type IN ('ECONOMY', 'PROMO') AND p_name LIKE '%a%')
        |   OR p_brand IS NOT DISTINCT FROM 'Brand#3'
        |ORDER BY p_partkey""".stripMargin,
    "q_project_expr" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS net_price,
        |  CASE WHEN l_quantity IS NULL THEN NULL
        |       WHEN l_quantity > 25 THEN 'bulk'
        |       WHEN l_quantity > 10 THEN 'mid'
        |       ELSE 'small' END AS size_class
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '2001-01-01 00:00:00'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin
  )
}
