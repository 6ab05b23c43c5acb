package graft

import org.apache.spark.sql.SparkSession

/** Plan-quality audit (SURVEY mandate: iterate on explain until it's
  * the plan you'd want). For every contract query, prints one line:
  * #exchanges, join operators used, and red flags (cartesian product,
  * unexpected broadcast-nested-loop).
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        def n(p: String) = p.r.findAllIn(plan).size
        val joins = Seq(
          "BroadcastHashJoin" -> n("BroadcastHashJoin"),
          "SortMergeJoin" -> n("SortMergeJoin"),
          "BroadcastNestedLoopJoin" -> n("BroadcastNestedLoopJoin"),
          "CartesianProduct" -> n("CartesianProduct"),
          "AsOfJoin" -> n("AsOfJoin")
        ).filter(_._2 > 0).map { case (k, v) => s"$k=$v" }.mkString(",")
        println(f"$name%-28s exch=${n("Exchange ")}%2d  ${joins}")
      } catch { case e: Throwable => println(f"$name%-28s ERROR ${e.getMessage.take(60)}") }
    }
    spark.stop()
  }
}
