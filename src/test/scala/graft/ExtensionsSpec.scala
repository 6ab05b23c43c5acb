package graft

import org.apache.spark.sql.functions._
import graft.plans.DotProductFusion

/** Catalyst extension showcases: the DotProductFusion optimizer rule
  * and the BigramGenerator table function.
  */
class ExtensionsSpec extends SparkSpec {

  test("DotProductFusion rewrites the HOF dot product into float_dot") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ DotProductFusion
    try {
      val df = graft.sources.Tables.embeddings(spark, sf)
        .withColumn("d", expr(
          "aggregate(zip_with(embedding, embedding, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
            "CAST(0 AS DOUBLE), (acc, v) -> acc + v)"))
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("float_dot"), optimized)

      // and the rewrite is value-identical to the unfused form
      graft.functions.VectorExprs.register(spark)
      val direct = graft.sources.Tables.embeddings(spark, sf)
        .withColumn("d", expr("float_dot(embedding, embedding)"))
      val a = df.select(col("vec_id"), col("d")).orderBy("vec_id").collect()
      val b = direct.select(col("vec_id"), col("d")).orderBy("vec_id").collect()
      assert(a.sameElements(b))
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == DotProductFusion)
    }
  }

  test("float_dot matches HOF semantics on ragged and null-element inputs") {
    import spark.implicits._
    graft.functions.VectorExprs.register(spark)
    val df = Seq(
      (1L, Seq(1.0f, 2.0f), Seq(3.0f, 4.0f)),          // equal lengths → 11.0
      (2L, Seq(1.0f, 2.0f, 5.0f), Seq(3.0f, 4.0f)),    // ragged → HOF gives NULL
      (3L, Seq.empty[Float], Seq.empty[Float])          // empty → 0.0
    ).toDF("id", "a", "b")
    val hofExpr = "aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
      "CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    val rows = df.select(col("id"), expr(hofExpr).as("hof"), expr("float_dot(a, b)").as("fd"))
      .orderBy("id").collect()
    rows.foreach { r =>
      assert(r.isNullAt(1) == r.isNullAt(2), s"null disagreement at id=${r.getLong(0)}")
      if (!r.isNullAt(1)) assert(r.getDouble(1) == r.getDouble(2))
    }
    // null element → NULL, matching zip_with/aggregate null propagation
    val withNull = Seq((1L, Seq(Some(1.0f), None), Seq(Some(2.0f), Some(3.0f))))
      .toDF("id", "a", "b")
      .select(expr(hofExpr).as("hof"), expr("float_dot(a, b)").as("fd"))
      .collect().head
    assert(withNull.isNullAt(0) && withNull.isNullAt(1))
  }

  test("fusion does NOT fire on non-float arrays or different lambdas") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ DotProductFusion
    try {
      // double arrays → no rewrite
      val dbl = graft.sources.Tables.embeddings(spark, sf)
        .withColumn("e2", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
        .withColumn("d", expr(
          "aggregate(zip_with(e2, e2, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
            "CAST(0 AS DOUBLE), (acc, v) -> acc + v)"))
      assert(!dbl.queryExecution.optimizedPlan.toString.contains("float_dot"))
      // sum-of-elements (not a product lambda) → no rewrite
      val sums = graft.sources.Tables.embeddings(spark, sf)
        .withColumn("d", expr(
          "aggregate(embedding, CAST(0 AS DOUBLE), (acc, v) -> acc + v)"))
      assert(!sums.queryExecution.optimizedPlan.toString.contains("float_dot"))
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == DotProductFusion)
    }
  }

  test("BigramGenerator emits n-1 bigrams per doc and handles short docs") {
    import spark.implicits._
    graft.functions.BigramGenerator.register(spark)
    val df = Seq("a b c d", "solo", "x y").toDF("text")
      .select(expr("bigrams(split(text, ' '))"))
    assert(df.collect().map(_.getString(0)).toSeq == Seq("a b", "b c", "c d", "x y"))
  }
}
