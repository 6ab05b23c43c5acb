package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-generated parquet fixtures (TESTDATA.md).
  *
  * One parquet file per table under `sfDir`; schemas are fixed
  * (FIXTURES.md) and come from parquet footers — no inference. All
  * engine queries read through here so the scan layer has a single
  * seam (snapshot sources in graft.sources.Snapshot reuse it).
  */
object Tables {
  private def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, dir: String): DataFrame    = read(s, dir, "region")
  def nation(s: SparkSession, dir: String): DataFrame    = read(s, dir, "nation")
  def customer(s: SparkSession, dir: String): DataFrame  = read(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame  = read(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame      = read(s, dir, "part")
  def orders(s: SparkSession, dir: String): DataFrame    = read(s, dir, "orders")
  def lineitem(s: SparkSession, dir: String): DataFrame  = read(s, dir, "lineitem")
  /** `events.ts` has shipped in two physical parquet encodings across
    * fixture generations, so this seam adapts on the LANDED Spark type
    * instead of assuming one:
    *
    *  - TIMESTAMP(NANOS): Spark 4 rejects it ([PARQUET_TYPE_ILLEGAL])
    *    unless `nanosAsLong` maps it to a raw ns LongType — then
    *    rebuild a µs TimestampType with exact integer division
    *    (`div`; a double division would lose precision on ~1.7e18 ns
    *    epochs). Matches DuckDB's CAST(ts AS TIMESTAMP) truncation.
    *  - timestamp[µs] isAdjustedToUTC=false: Spark reads
    *    TIMESTAMP_NTZ; cast to TimestampType — instant-preserving
    *    because every entry point pins spark.sql.session.timeZone=UTC.
    *  - timestamp[µs] adjusted-to-UTC: already TimestampType; pass
    *    through.
    *
    * Any other landed type fails loudly here (one named error at the
    * seam) rather than as scattered per-query analysis errors — the
    * r8 fixture drift failure mode.
    */
  /** Read a parquet path that MAY carry TIMESTAMP(NANOS) columns.
    * The legacy `nanosAsLong` mapping is enabled ONLY when the footer
    * actually proves to need it (first read throws
    * [PARQUET_TYPE_ILLEGAL]); on the current µs fixtures no conf is
    * touched, so a NANOS regeneration of some OTHER table still fails
    * loudly at its own scan instead of landing as a surprise long.
    * Once needed, the conf must STAY set for the session — executors
    * re-resolve footers under the session conf when the (lazy) events
    * plans execute, so a set-and-restore here would pass analysis and
    * then break every events query at runtime.
    */
  /** True iff `e` (or anything on its cause chain — schema inference
    * may surface the typed error wrapped in a job failure) is Spark's
    * [PARQUET_TYPE_ILLEGAL] condition. Typed on SparkThrowable's error
    * condition, not message text: substring-on-Throwable matched
    * locale/version-dependent English and would also have caught fatal
    * VirtualMachineErrors whose message happened to quote the class.
    */
  private[graft] def isParquetTypeIllegal(e: Throwable): Boolean = {
    var t: Throwable = e
    // depth-capped like JDK printStackTrace: direct self-reference is
    // guarded below, but a MULTI-node cause cycle (a→b→a) would loop
    // forever without the cap (advice r10)
    var depth = 0
    while (t != null && depth < 100) {
      t match {
        case st: org.apache.spark.SparkThrowable
            if st.getCondition == "PARQUET_TYPE_ILLEGAL" => return true
        case _ =>
      }
      t = if (t.getCause ne t) t.getCause else null
      depth += 1
    }
    false
  }

  private def readMaybeNanos(s: SparkSession, path: String): DataFrame =
    try s.read.parquet(path)
    catch {
      case e: Exception if isParquetTypeIllegal(e) =>
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        s.read.parquet(path)
    }

  def events(s: SparkSession, dir: String): DataFrame =
    normalizeEventsTs(readMaybeNanos(s, s"$dir/events.parquet"))

  /** Streaming twin of [[events]] for specs: file-stream sources need
    * an explicit schema, so declare the LANDED footer types read from
    * `fixtureFile` batch-side, then normalize `ts` through the same
    * seam. One helper instead of per-spec copies — a fixture-encoding
    * change (the r8 failure mode) then needs exactly one edit.
    */
  private[graft] def eventsStream(s: SparkSession, fixtureFile: String,
                                  streamDir: String): DataFrame = {
    val landed = readMaybeNanos(s, fixtureFile).schema
    normalizeEventsTs(s.readStream.schema(landed).parquet(streamDir))
  }

  /** Smallest INT64 `ts` the ns-long branch accepts as a plausible
    * nanosecond epoch: 1e17 ns ≈ 1973-03. Every µs/ms/s encoding of
    * any date up to year ~5000 sits ORDERS below it (µs(5000) ≈
    * 9.5e16), while every ns epoch after 1973 sits above — so one
    * codegen'd compare cleanly separates "really nanoseconds" from
    * "some finer-grained unit landed behind an ns-declared schema".
    */
  private val MinPlausibleNs = 100000000000000000L // 1e17

  /** The one place that knows how to turn a landed `ts` column into a
    * µs TimestampType — shared by the batch reader above and the
    * streaming helper (whose `readStream.schema(...)` must declare the
    * landed type, then normalize identically).
    *
    * Streaming drift behavior (probed empirically, r12 — the declared
    * schema is sampled ONCE from `fixtureFile`, but files keep landing
    * afterwards and may not match it):
    *  - µs-declared schema, ns file lands → the parquet vectorized
    *    reader fails the micro-batch loudly with
    *    [FAILED_READ_FILE.PARQUET_COLUMN_DATA_TYPE_MISMATCH] naming
    *    the file (mid-stream, not our named error, but impossible to
    *    miss and never wrong data).
    *  - ns-declared schema, µs file lands → the reader happily decodes
    *    ANY INT64 physical column into the declared LongType, so
    *    `div 1000` would silently compress every instant 1000× — the
    *    one SILENT member of the class. The per-row tripwire below
    *    turns it into a named error at first touch.
    */
  private[graft] def normalizeEventsTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, concat, expr, lit, raise_error, timestamp_micros, when}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType =>
        // drift tripwire: see scaladoc. One codegen'd compare per row;
        // `div` keeps the exact integer division of the original form
        // (a double division would lose the low µs digits at ~1.7e18).
        val ns = when(col("ts").isNull || col("ts") >= MinPlausibleNs, col("ts"))
          .otherwise(raise_error(concat(
            lit("events.ts INT64 value "), col("ts").cast("string"),
            lit(s" is below $MinPlausibleNs — too small for a nanosecond epoch; " +
              "a µs/ms-encoded file behind an ns-declared schema? (encoding drift)"))))
        df.withColumn("ts", ns) // guarded, still LongType
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => df
      case other => throw new IllegalStateException(
        s"events.ts landed as unsupported type $other " +
          "(expected ns-long, timestamp_ntz, or timestamp) — fixture drift?")
    }
  }
  def documents(s: SparkSession, dir: String): DataFrame = read(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = read(s, dir, "embeddings")
}
