package graft

import org.apache.spark.sql.functions._
import graft.operators.{dec, Skew}
import graft.sources.Tables

/** Salting utilities: results must equal the unsalted equivalents
  * while spreading hot keys over multiple reducers.
  */
class SkewSpec extends SparkSpec {

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
    val events = Tables.events(spark, sf)
    val saltCards = events
      .withColumn("_salt", pmod(hash(col("event_id")), lit(8)))
      .where(col("event_type") === "click")
      .select(col("_salt")).distinct().count()
    assert(saltCards > 1, "hot key must occupy multiple salt buckets")
  }
}
