package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

/** All four branches of the adaptive `Tables.normalizeEventsTs` seam,
  * exercised against constructed frames. On the CURRENT fixture
  * generation only the TIMESTAMP_NTZ branch runs for real, so without
  * this spec the ns-long branch (needed the moment the driver reverts
  * the encoding) and the fail-loud branch are dead code no test
  * touches.
  */
class EventsSeamSpec extends SparkSpec {

  // one instant, three encodings: 2024-01-15T12:34:56.789012Z
  private val us = 1705322096789012L

  private def tsOf(df: org.apache.spark.sql.DataFrame): (DataType, Long) = {
    val out = graft.sources.Tables.normalizeEventsTs(df)
    val t = out.schema("ts").dataType
    val v = out.select(unix_micros(col("ts"))).head().getLong(0)
    (t, v)
  }

  test("ns-long branch: exact integer div to µs (old TIMESTAMP(NANOS) fixtures)") {
    // ns epoch ~1.7e18 — a double division would lose the low µs digits
    val ns = us * 1000L + 999L // sub-µs residue must TRUNCATE, like DuckDB's cast
    val df = spark.createDataFrame(
      java.util.List.of(Row(1L, ns)),
      StructType(Seq(StructField("event_id", LongType), StructField("ts", LongType))))
    val (t, v) = tsOf(df)
    assert(t == TimestampType)
    assert(v == us, s"expected exact µs $us, got $v")
  }

  test("TIMESTAMP_NTZ branch: instant-preserving cast under the UTC session") {
    val df = spark.createDataFrame(
      java.util.List.of(Row(1L, java.time.LocalDateTime.ofEpochSecond(
        us / 1000000L, ((us % 1000000L) * 1000L).toInt, java.time.ZoneOffset.UTC))),
      StructType(Seq(StructField("event_id", LongType),
        StructField("ts", TimestampNTZType)))) // what µs isAdjustedToUTC=false lands as
    val (t, v) = tsOf(df)
    assert(t == TimestampType)
    assert(v == us, s"NTZ cast shifted the instant: expected $us, got $v")
  }

  test("TimestampType branch: passthrough, no extra projection") {
    val df = spark.createDataFrame(
      java.util.List.of(Row(1L, java.sql.Timestamp.from(
        java.time.Instant.ofEpochSecond(us / 1000000L, (us % 1000000L) * 1000L)))),
      StructType(Seq(StructField("event_id", LongType),
        StructField("ts", TimestampType))))
    val (t, v) = tsOf(df)
    assert(t == TimestampType)
    assert(v == us)
    assert(graft.sources.Tables.normalizeEventsTs(df) eq df,
      "timestamp passthrough must not rebuild the frame")
  }

  test("unknown encoding fails with ONE named error at the seam") {
    val df = spark.createDataFrame(
      java.util.List.of(Row(1L, "2024-01-15 12:34:56")),
      StructType(Seq(StructField("event_id", LongType),
        StructField("ts", StringType))))
    val e = intercept[IllegalStateException](graft.sources.Tables.normalizeEventsTs(df))
    assert(e.getMessage.contains("fixture drift"))
    assert(e.getMessage.toLowerCase.contains("string"), e.getMessage)
  }

  test("all three accepted encodings agree on the fixture's real first instant") {
    // read the real fixture, then re-encode its ts column as ns-long and
    // as NTZ, and check the three normalized frames carry identical
    // instants row-for-row — the cross-encoding equivalence the seam
    // exists to guarantee
    val real = graft.sources.Tables.events(spark, sf)
      .select(col("event_id"), col("ts")).orderBy("event_id").limit(100)
    val asNs = real.withColumn("ts", unix_micros(col("ts")) * 1000L)
    val asNtz = real.withColumn("ts", col("ts").cast(TimestampNTZType))
    val base = real.select(col("event_id"), unix_micros(col("ts")).as("us"))
    for (variant <- Seq(asNs, asNtz)) {
      val got = graft.sources.Tables.normalizeEventsTs(variant)
        .select(col("event_id"), unix_micros(col("ts")).as("us"))
      assert(got.exceptAll(base).count() == 0 && base.exceptAll(got).count() == 0,
        "normalized instants diverged across encodings")
    }
  }
}
