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

  test("µs fixtures never enable the legacy nanosAsLong mapping") {
    // the conditional seam must not leak the legacy conf when the
    // fixture doesn't need it — a NANOS regeneration of some OTHER
    // table should still fail loudly at its own scan
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    spark.conf.unset(key)
    graft.sources.Tables.events(spark, sf).count()
    assert(spark.conf.get(key) == "false",
      "events() enabled nanosAsLong on a fixture that doesn't need it")
  }

  test("a REAL TIMESTAMP(NANOS) fixture reads end-to-end through the retry seam") {
    import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    import org.apache.parquet.schema.Type.Repetition.OPTIONAL
    val dir = java.nio.file.Files.createTempDirectory("ns_events").toString
    try {
      val schema = Types.buildMessage()
        .addField(Types.primitive(INT64, OPTIONAL).named("event_id"))
        .addField(Types.primitive(INT64, OPTIONAL)
          .as(LogicalTypeAnnotation.timestampType(false,
            LogicalTypeAnnotation.TimeUnit.NANOS)).named("ts"))
        .addField(Types.primitive(INT64, OPTIONAL).named("user_id"))
        .named("events")
      val conf = new org.apache.hadoop.conf.Configuration()
      org.apache.parquet.hadoop.example.GroupWriteSupport.setSchema(schema, conf)
      val w = org.apache.parquet.hadoop.example.ExampleParquetWriter
        .builder(new org.apache.hadoop.fs.Path(s"$dir/events.parquet"))
        .withConf(conf).withType(schema).build()
      val f = new org.apache.parquet.example.data.simple.SimpleGroupFactory(schema)
      val ns = us * 1000L + 999L // sub-µs residue must truncate
      w.write(f.newGroup().append("event_id", 1L).append("ts", ns).append("user_id", 7L))
      w.close()
      // start from a clean conf: the FIRST read must hit
      // PARQUET_TYPE_ILLEGAL and the seam's retry must recover
      spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
      val got = graft.sources.Tables.events(spark, dir)
        .select(col("event_id"), unix_micros(col("ts")).as("us"), col("user_id"))
        .head()
      assert(got.getLong(0) == 1L && got.getLong(1) == us && got.getLong(2) == 7L,
        s"ns fixture round-trip diverged: $got")
      // and the mapping stays on for the session — executors re-read
      // footers under the session conf when lazy events plans execute
      assert(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true")
      spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    } finally SessionToken.deleteDir(dir)
  }

  test("isParquetTypeIllegal matches the typed condition, wrapped or not — never message text") {
    val typed = new org.apache.spark.SparkException(
      errorClass = "PARQUET_TYPE_ILLEGAL",
      messageParameters = Map("parquetType" -> "INT64 (TIMESTAMP(NANOS,false))"),
      cause = null)
    assert(graft.sources.Tables.isParquetTypeIllegal(typed))
    // schema inference may surface the condition wrapped in a job failure
    assert(graft.sources.Tables.isParquetTypeIllegal(
      new RuntimeException("Job aborted", typed)))
    // message text quoting the class name must NOT match (the pre-fix
    // substring check did, and also caught unrelated errors)
    assert(!graft.sources.Tables.isParquetTypeIllegal(
      new RuntimeException("something mentioning PARQUET_TYPE_ILLEGAL in text")))
    assert(!graft.sources.Tables.isParquetTypeIllegal(
      new org.apache.spark.SparkException(
        errorClass = "INTERNAL_ERROR", messageParameters = Map("message" -> "x"),
        cause = null)))
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
