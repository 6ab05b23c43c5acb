package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQueryException, Trigger}

/** Drift behavior of the STREAMING events seam (r12 probe, kept as the
  * spec). `Tables.eventsStream` samples its declared schema ONCE from
  * a fixture file, but stream files keep landing afterwards and may
  * not match it — unlike the batch path, which re-reads the true
  * footer every time. Probed empirically, the mismatch matrix has
  * exactly one SILENT member, and these tests pin all four cells:
  *
  *  - ns sample + ns files: works, exact instants (the encoding the
  *    driver may revert to).
  *  - µs sample + ns file: parquet reader fails the micro-batch with
  *    [PARQUET_COLUMN_DATA_TYPE_MISMATCH] naming the file — loud,
  *    mid-stream, never wrong data.
  *  - ns sample + µs file: the reader decodes ANY INT64 into the
  *    declared LongType, so `div 1000` silently compressed every
  *    instant 1000× — fixed by the MinPlausibleNs tripwire in
  *    normalizeEventsTs (named USER_RAISED error at first touch).
  *  - junk sample: one named IllegalStateException at BUILD time.
  */
class StreamDriftProbeSpec extends SparkSpec {

  private val us = 1705322096789012L

  /** Write a single-row events parquet with a TIMESTAMP(NANOS) ts. */
  private def writeNanosFixture(dir: String): Unit = {
    import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    import org.apache.parquet.schema.Type.Repetition.OPTIONAL
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
    w.write(f.newGroup().append("event_id", 1L).append("ts", us * 1000L + 999L)
      .append("user_id", 7L))
    w.close()
  }

  private def runStream(df: org.apache.spark.sql.DataFrame, name: String) = {
    val q = df.writeStream.outputMode(OutputMode.Append()).format("memory")
      .queryName(name).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(name)
  }

  private def rootOf(t: Throwable): Throwable =
    if (t.getCause == null || (t.getCause eq t)) t else rootOf(t.getCause)

  test("ns-long streaming twin reads end-to-end with exact truncated instants") {
    val d = java.nio.file.Files.createTempDirectory("sdrift_ns").toString
    try {
      writeNanosFixture(d)
      spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
      val st = graft.sources.Tables.eventsStream(spark, s"$d/events.parquet", d)
      val out = runStream(
        st.select(col("event_id"), unix_micros(col("ts")).as("us")), "sdrift_ns")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(out == Seq((1L, us)), s"ns streaming twin diverged: $out")
      spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    } finally SessionToken.deleteDir(d)
  }

  test("µs-declared schema with an ns file landing fails the batch LOUDLY, naming the file") {
    val d = java.nio.file.Files.createTempDirectory("sdrift_us_ns").toString
    try {
      writeNanosFixture(d)
      spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
      // sample = real µs/NTZ fixture; landed = NANOS file
      val st = graft.sources.Tables.eventsStream(spark, s"$sf/events.parquet", d)
      val e = intercept[StreamingQueryException](
        runStream(st.select(col("event_id"), col("ts")), "sdrift_us_ns"))
      assert(e.getMessage.contains("PARQUET_COLUMN_DATA_TYPE_MISMATCH"),
        s"expected the typed parquet mismatch, got: ${e.getMessage.take(300)}")
      assert(e.getMessage.contains("events.parquet"),
        "the failure must name the drifted file")
    } finally SessionToken.deleteDir(d)
  }

  test("ns-declared schema with a µs file landing raises the NAMED drift error, not 1000×-compressed instants") {
    val dFix = java.nio.file.Files.createTempDirectory("sdrift_fix").toString
    val dStream = java.nio.file.Files.createTempDirectory("sdrift_str").toString
    try {
      writeNanosFixture(dFix)
      java.nio.file.Files.createSymbolicLink(
        java.nio.file.Paths.get(s"$dStream/events.parquet"),
        java.nio.file.Paths.get(s"$sf/events.parquet"))
      spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
      val st = graft.sources.Tables.eventsStream(spark, s"$dFix/events.parquet", dStream)
      val e = intercept[StreamingQueryException](
        runStream(st.select(col("event_id"), unix_micros(col("ts")).as("us")), "sdrift_ns_us"))
      val root = rootOf(e)
      assert(root.getMessage.contains("too small for a nanosecond epoch"),
        s"expected the seam's tripwire, got: ${root.getClass.getName}: ${String.valueOf(root.getMessage).take(300)}")
      assert(root.getMessage.contains("encoding drift"))
      spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    } finally { SessionToken.deleteDir(dFix); SessionToken.deleteDir(dStream) }
  }

  test("junk ts in the SAMPLE file fails at build time with the seam's one named error") {
    val d = java.nio.file.Files.createTempDirectory("sdrift_junk").toString
    try {
      spark.range(1).selectExpr("id AS event_id", "'2024-01-15' AS ts")
        .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
      val e = intercept[IllegalStateException](
        graft.sources.Tables.eventsStream(spark, s"$d/events.parquet", d))
      assert(e.getMessage.contains("fixture drift"))
    } finally SessionToken.deleteDir(d)
  }

  test("tripwire: null ts and genuine ns epochs pass; µs/ms-scale values raise") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    def norm(vs: Seq[java.lang.Long]) = {
      val rows = vs.zipWithIndex.map { case (v, i) => Row(i.toLong, v) }
      graft.sources.Tables.normalizeEventsTs(spark.createDataFrame(
        new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
        StructType(Seq(StructField("event_id", LongType), StructField("ts", LongType)))))
        .select(unix_micros(col("ts"))).collect().map(r =>
          if (r.isNullAt(0)) null else java.lang.Long.valueOf(r.getLong(0))).toSeq
    }
    assert(norm(Seq(java.lang.Long.valueOf(us * 1000L + 999L), null)) ==
      Seq(java.lang.Long.valueOf(us), null))
    val e = intercept[Exception](norm(Seq(java.lang.Long.valueOf(us)))) // µs-scale value
    assert(rootOf(e).getMessage.contains("too small for a nanosecond epoch"))
    val e2 = intercept[Exception](norm(Seq(java.lang.Long.valueOf(us / 1000L)))) // ms-scale
    assert(rootOf(e2).getMessage.contains("too small for a nanosecond epoch"))
  }
}
