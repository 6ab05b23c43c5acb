package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Adversarial-input twin of [[VectorExprProps]]: FloatDotProduct's
  * scaladoc claims bit-identical semantics to the interpreted HOF form
  * `aggregate(zip_with(a, b, (x,y) -> double(x)*double(y)), 0d, +)` —
  * including the degenerate cases the parquet fixtures never contain
  * (ragged pairs, null elements, empty arrays, NaN/±Inf, denormals).
  * The oracle only checks fixture data, so this spec is the one place
  * that claim is tested on hostile inputs, in BOTH execution modes
  * (whole-stage codegen and the interpreted eval path).
  */
class VectorExprSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("a", ArrayType(FloatType, containsNull = true), nullable = true),
    StructField("b", ArrayType(FloatType, containsNull = true), nullable = true)))

  private def fixtureRows: Seq[Row] = {
    val rng = new scala.util.Random(20260815L)
    def vec(n: Int): Seq[java.lang.Float] = Seq.fill(n) {
      val f: Float = rng.nextInt(8) match {
        case 0 => rng.nextFloat() * 2e38f          // near-overflow magnitudes
        case 1 => java.lang.Float.MIN_VALUE * rng.nextInt(100) // denormals
        case 2 => -rng.nextFloat()
        case _ => rng.nextFloat() * 100f - 50f
      }
      java.lang.Float.valueOf(f)
    }
    val random = (0 until 200).map { i =>
      val n = rng.nextInt(12)
      val a = vec(n)
      // 1-in-4 ragged, 1-in-5 with a null element slot
      val b0 = if (rng.nextInt(4) == 0) vec(n + 1 + rng.nextInt(3)) else vec(n)
      val b = if (rng.nextInt(5) == 0 && b0.nonEmpty)
        b0.updated(rng.nextInt(b0.length), null.asInstanceOf[java.lang.Float])
      else b0
      Row(i, a, b)
    }
    val edges = Seq(
      Row(1000, Seq.empty[java.lang.Float], Seq.empty[java.lang.Float]), // 0.0, not null
      Row(1001, null, vec(3)),                                           // null array
      Row(1002, vec(3), null),
      Row(1003, Seq[java.lang.Float](Float.NaN, 1f), Seq[java.lang.Float](2f, 3f)),
      Row(1004, Seq[java.lang.Float](Float.PositiveInfinity), Seq[java.lang.Float](0f)), // Inf*0 = NaN
      Row(1005, Seq[java.lang.Float](Float.PositiveInfinity, Float.NegativeInfinity),
        Seq[java.lang.Float](1f, 1f)),                                   // Inf + -Inf = NaN
      Row(1006, Seq[java.lang.Float](Float.MaxValue, Float.MaxValue),
        Seq[java.lang.Float](Float.MaxValue, Float.MaxValue)),           // finite in double
      Row(1007, Seq[java.lang.Float](null), Seq[java.lang.Float](1f)),   // null elem both sides
      Row(1008, Seq.empty[java.lang.Float], vec(2)))                     // empty vs non-empty = ragged
    random ++ edges
  }

  /** (id -> bits-or-null) for both forms under the current session conf. */
  private def bothForms(): Map[Int, (Option[Long], Option[Long])] = {
    graft.functions.VectorExprs.register(spark)
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(fixtureRows).asJava),
      schema)
    val out = df.select(col("id"),
      expr("float_dot(a, b)").as("fast"),
      expr("aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)), " +
        "cast(0 as double), (acc, v) -> acc + v)").as("ref"))
      .collect()
    out.map { r =>
      def bits(i: Int): Option[Long] =
        if (r.isNullAt(i)) None
        // doubleToLongBits canonicalizes NaN — "same value" for any NaN,
        // exact bit equality for everything else
        else Some(java.lang.Double.doubleToLongBits(r.getDouble(i)))
      r.getInt(0) -> (bits(1), bits(2))
    }.toMap
  }

  test("float_dot == HOF reference on adversarial inputs (codegen path)") {
    val m = bothForms()
    assert(m.nonEmpty)
    val bad = m.collect { case (id, (f, ref)) if f != ref => (id, f, ref) }
    assert(bad.isEmpty, s"float_dot diverged from the HOF reference: $bad")
    // the fixture genuinely exercises every class
    assert(m(1000) == (Some(java.lang.Double.doubleToLongBits(0.0)),
      Some(java.lang.Double.doubleToLongBits(0.0))), "empty×empty must be 0.0, not null")
    assert(m(1001)._1.isEmpty && m(1008)._1.isEmpty && m(1007)._1.isEmpty,
      "null array, ragged and null-element must all yield NULL")
    assert(m(1004)._1.contains(java.lang.Double.doubleToLongBits(Double.NaN)),
      "Inf×0 must be NaN")
  }

  test("float_dot == HOF reference with codegen disabled (interpreted eval path)") {
    val prior = (spark.conf.get("spark.sql.codegen.wholeStage", "true"),
      spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK"))
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val m = bothForms()
      val bad = m.collect { case (id, (f, ref)) if f != ref => (id, f, ref) }
      assert(bad.isEmpty, s"interpreted float_dot diverged: $bad")
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prior._1)
      spark.conf.set("spark.sql.codegen.factoryMode", prior._2)
    }
  }
}
