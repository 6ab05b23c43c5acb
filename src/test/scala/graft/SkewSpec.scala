package graft

import org.apache.spark.sql.functions._
import graft.operators.{dec, Skew}
import graft.sources.Tables

/** Salting utilities: results must equal the unsalted equivalents
  * while spreading hot keys over multiple reducers.
  */
class SkewSpec extends SparkSpec {

  test("AQE splits the hot partition of a skewed sort-merge join") {
    // fresh session: AQE skew-join with thresholds scaled to fixture
    // size (the production defaults are 256 MB — same mechanism,
    // smaller numbers), broadcast off so the join stays a shuffle SMJ
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "true")
    s2.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    s2.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.shuffle.partitions", "8")
    val o = Tables.orders(s2, sf).select(col("o_orderkey"), col("o_custkey"))
    val hotKey = o.agg(min("o_orderkey")).head.getLong(0)
    // fact with one pathological key: ×200k on hotKey, ×1 elsewhere
    // round-robin repartition AFTER the explode: AQE splits a skewed
    // reduce partition at MAPPER boundaries, so the hot key must span
    // several map tasks (with one mapper the skew is detected but
    // unsplittable and the rule declines)
    val fact = o
      .withColumn("m", when(col("o_orderkey") === hotKey, 200000).otherwise(1))
      .select(col("o_orderkey"), explode(expr("sequence(1, m)")).as("rep"))
      .repartition(8)
    val joined = fact.join(o.withColumnRenamed("o_orderkey", "k"),
      col("o_orderkey") === col("k"))
    // execute THIS DataFrame's QueryExecution so its adaptive plan
    // finalizes (count() would plan a separate query on top)
    val n = joined.collect().length.toLong
    val expected = o.count() - 1 + 200000
    assert(n == expected, "skew handling must not change the result")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("skew=true"),
      s"AQE must mark the skewed join for partition splitting:\n$plan")
  }

  test("saltedJoin equals plain join on a hot-keyed fact (events × type dims)") {
    import spark.implicits._
    val events = Tables.events(spark, sf) // event_type: 5 hot keys
    val dims = Seq(("click", 1), ("view", 2), ("purchase", 3), ("error", 4), ("signup", 5))
      .toDF("t", "type_code")
    val plain = events.join(dims, col("event_type") === col("t"))
      .groupBy(col("type_code")).agg(count(lit(1)).as("n"), sum(dec("value")).as("s"))
    val salted = Skew.saltedJoin(events, dims, "event_type", "t", "event_id", 8)
      .groupBy(col("type_code")).agg(count(lit(1)).as("n"), sum(dec("value")).as("s"))
    assert(salted.exceptAll(plain).count() == 0 && plain.exceptAll(salted).count() == 0)
  }

  test("salted two-stage aggregation equals direct aggregation") {
    val events = Tables.events(spark, sf)
    val direct = events.groupBy(col("event_type"))
      .agg(sum(dec("value")).as("total"), count(lit(1)).as("n"))
    val salted = Skew.saltedSumCount(events, "event_type", dec("value"), "event_id", 8)
    assert(salted.exceptAll(direct).count() == 0 && direct.exceptAll(salted).count() == 0)
  }

  test("salt actually spreads a hot key across groups in stage 1") {
    // THROUGH Skew.saltCol — the expression the operators run, not a
    // spec-side re-implementation (a dead-salt mutant in Skew would
    // pass an inline copy of the formula while the claim hollows)
    val events = Tables.events(spark, sf)
    val saltCards = events
      .withColumn("_salt", Skew.saltCol("event_id", 8))
      .where(col("event_type") === "click")
      .select(col("_salt")).distinct().count()
    assert(saltCards > 1, "hot key must occupy multiple salt buckets")
  }

  test("saltedSumCount's stage-1 exchange partitions on (key, salt) — the spread IS the plan") {
    // the result-equality tests above cannot bind the spread: salting
    // with a constant salt is still CORRECT, it just stops spreading.
    // The scale property lives in the physical plan — stage 1 must
    // shuffle on (event_type, _salt), never event_type alone.
    val events = Tables.events(spark, sf)
    val salted = Skew.saltedSumCount(events, "event_type", dec("value"), "event_id", 8)
    salted.collect() // finalize the (possibly adaptive) plan
    val plan = salted.queryExecution.executedPlan.toString
    val spread = "(?s).*hashpartitioning\\([^)]*event_type[^)]*_salt[^)]*\\).*"
    assert(plan.matches(spread),
      s"stage-1 exchange must carry the salt in its partitioning keys:\n$plan")
  }
}
