package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Bucketing demonstration (SURVEY §4: "bucketing for co-located
  * joins"): tables bucketed+sorted on the join key join with a
  * sort-merge plan that has NO shuffle exchange — the pre-partitioned
  * layout a 100 TB fact-fact join wants.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed fact-fact join is shuffle-free and matches the plain join") {
    Tables.lineitem(spark, sf)
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bucketed")
    Tables.orders(spark, sf)
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("o_bucketed")

    val joined = spark.table("li_bucketed").hint("merge")
      .join(spark.table("o_bucketed"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))

    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Exchange hashpartitioning(l_orderkey"),
      s"bucketed join must not shuffle the fact side:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning(o_orderkey"),
      s"bucketed join must not shuffle the orders side:\n$plan")

    val expected = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
    assert(joined.exceptAll(expected).count() == 0 && expected.exceptAll(joined).count() == 0)
  }

  test("declared q_join_bucketed plans an exchange-free sort-merge join") {
    val plan = q("q_join_bucketed").queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Exchange hashpartitioning(c_custkey"),
      s"bucketed join must not shuffle customer:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning(o_custkey"),
      s"bucketed join must not shuffle orders:\n$plan")
  }
}
