package graft

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types._

case class UserEvent(user_id: Long, event_id: Long)
case class UserCount(user_id: Long, n: Long)

/** True Structured Streaming twins of the §2.8 batch forms: the same
  * events parquet replayed through readStream with
  * Trigger.AvailableNow, asserted equal to the batch contract
  * queries. Plus the arbitrary-stateful showcase
  * (flatMapGroupsWithState).
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  /** File stream sources need a directory: stage the single fixture
    * file behind a symlink in a temp dir.
    */
  private lazy val eventsDir: String = {
    val d = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.createSymbolicLink(
      d.resolve("events.parquet"), java.nio.file.Paths.get(s"$sf/events.parquet"))
    d.toString
  }

  private def eventsStream: DataFrame =
    graft.sources.Tables.eventsStream(spark, s"$sf/events.parquet", eventsDir)

  private def runToMemory(df: DataFrame, name: String, mode: OutputMode): DataFrame = {
    val q = df.writeStream.outputMode(mode).format("memory").queryName(name)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(name)
  }

  test("foreachBatch incremental LWW maintenance converges to the batch compaction") {
    // write-log = events as keyed upserts, split across 3 files so
    // AvailableNow + maxFilesPerTrigger=1 replays them as 3 micro-batches
    // in arbitrary file order — LWW merge is commutative (argmax by
    // (ts, event_id)), so the final state must not depend on replay order.
    val log = graft.sources.Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
    val logDir = java.nio.file.Files.createTempDirectory("fb_log").toString
    (0 until 3).foreach { i =>
      log.where(pmod(col("event_id"), lit(3)) === i)
        .coalesce(1).write.mode("append").parquet(logDir)
    }
    // per-batch partial state: one (last-write struct, write count) per key
    def partial(b: DataFrame): DataFrame =
      b.groupBy(col("user_id"))
        .agg(max(struct(col("ts").as("ts"), col("event_id").as("eid"),
          col("event_type").as("t"), col("value").as("v"))).as("last"),
          count(lit(1)).as("n_writes"))
    val stateBase = java.nio.file.Files.createTempDirectory("fb_state").toString
    var stateDir: Option[String] = None
    var gen = 0
    val stream = spark.readStream.schema(log.schema)
      .option("maxFilesPerTrigger", 1).parquet(logDir)
    val sq = stream.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        // incremental maintenance: merge the batch's partial into the
        // running state with the same argmax — never a full-log rescan
        val merged = stateDir.map(d => spark.read.parquet(d))
          .map(_.unionByName(partial(batch.toDF()))).getOrElse(partial(batch.toDF()))
          .groupBy(col("user_id"))
          .agg(max(col("last")).as("last"), sum(col("n_writes")).as("n_writes"))
        gen += 1
        val next = s"$stateBase/v$gen"
        merged.write.parquet(next)
        stateDir = Some(next)
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    sq.awaitTermination()
    val finalState = spark.read.parquet(stateDir.get)
      .where(col("last.t") =!= "error")
      .select(col("user_id"), col("last.eid").as("last_event_id"),
        col("last.t").as("last_type"), col("last.v").as("last_value"), col("n_writes"))
    val batchForm = q("q_snapshot_compact")
    assert(finalState.count() == batchForm.count())
    assert(finalState.exceptAll(batchForm).count() == 0 &&
      batchForm.exceptAll(finalState).count() == 0)
  }

  test("streamed DSv2 sink: per-microbatch appends converge to the batch write") {
    // orders streamed as 3 micro-batches, each appended through the
    // SnapshotSource DSv2 writer — the streaming ingestion face of the
    // manifest-swap commit: every micro-batch lands as immutable files
    // plus one manifest update, and the final table equals the
    // one-shot batch write regardless of micro-batch boundaries.
    val src = graft.sources.Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val logDir = java.nio.file.Files.createTempDirectory("dsv2_stream_in").toString
    (0 until 3).foreach { i =>
      src.where(pmod(col("o_orderkey"), lit(3)) === i)
        .coalesce(1).write.mode("append").parquet(logDir)
    }
    val root = java.nio.file.Files.createTempDirectory("dsv2_stream_out").toString
    val sq = spark.readStream.schema(src.schema)
      .option("maxFilesPerTrigger", 1).parquet(logDir)
      .writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        batch.toDF().write.format("graft.sources.SnapshotSource")
          .option("root", root).option("tag", "live").option("table", "orders_stream")
          .option("schema", src.schema.json)
          // idempotence ledger: foreachBatch is at-least-once, so every
          // streaming append carries its batchId as the txn version
          // (replay → no-op; SnapshotStreamRecoverySpec probes this)
          .option("txnAppId", "orders-stream-demo").option("txnVersion", id.toString)
          .mode("append").save()
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    sq.awaitTermination()
    val streamed = spark.read.format("graft.sources.SnapshotSource")
      .option("root", root).option("tag", "live").option("table", "orders_stream").load()
    assert(streamed.count() == src.count())
    assert(streamed.exceptAll(src).count() == 0 && src.exceptAll(streamed).count() == 0)
    // one manifest, one generation per micro-batch: ≥3 files committed
    val entry = graft.sources.Snapshot.readManifest(spark, root, "live")
      .tables("orders_stream")
    assert(entry.files.length >= 3 && entry.rows == src.count())
  }

  test("stream-static enrichment join equals the batch form") {
    val dim = graft.sources.Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_mktsegment"))
    val streamed = runToMemory(
      eventsStream
        .join(broadcast(dim), col("user_id") === col("c_custkey"))
        .groupBy(date_trunc("DAY", col("ts")).as("bucket"), col("c_mktsegment").as("segment"))
        .agg(count(lit(1)).as("n"),
          graft.operators.dbl(sum(col("value").cast("decimal(18,2)"))).as("sum_value")),
      "stream_static_out", OutputMode.Complete())
    val batch = q("q_stream_static")
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).count() == 0 && batch.exceptAll(streamed).count() == 0)
  }

  test("streaming tumbling window (complete mode) equals the batch form") {
    val streamed = runToMemory(
      eventsStream
        .withWatermark("ts", "2 hours")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("value").cast("decimal(18,2)")).as("sum_value"))
        .select(col("w.start").as("bucket"), col("event_type"), col("n"), col("sum_value")),
      "tumbling_out", OutputMode.Complete())
    val batch = q("q_stream_tumbling")
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).count() == 0 && batch.exceptAll(streamed).count() == 0)
  }

  test("streaming dedup-within-watermark keeps one row per event_id") {
    val streamed = runToMemory(
      eventsStream.withWatermark("ts", "2 hours")
        .dropDuplicatesWithinWatermark("event_id")
        .select(col("event_id")),
      "dedup_out", OutputMode.Append())
    val expected = graft.sources.Tables.events(spark, sf).select("event_id").distinct().count()
    assert(streamed.count() == expected)
  }

  test("streaming session windows (append): finalized sessions match the batch form") {
    val streamed = runToMemory(
      eventsStream.withWatermark("ts", "2 hours")
        .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("w.start").as("s_start"), col("w.end").as("s_end"),
          col("user_id"), col("n_events")),
      "session_out", OutputMode.Append())
    val batch = q("q_stream_session")
    // append emits only watermark-finalized sessions → subset of batch
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() == 0,
      "every finalized streaming session must appear in the batch result")
  }

  /** Stage DataFrames as single parquet files with strictly increasing
    * mtimes so FileStreamSource (latestFirst=false) + maxFilesPerTrigger=1
    * replays them as ordered micro-batches — the controlled out-of-order
    * delivery the watermark-late probes need.
    */
  private def stageOrdered(parts: Seq[DataFrame]): String = {
    val d = java.nio.file.Files.createTempDirectory("late_stage")
    parts.zipWithIndex.foreach { case (p, i) =>
      val tmp = java.nio.file.Files.createTempDirectory("late_part").toString
      p.coalesce(1).write.parquet(s"$tmp/out")
      val part = new java.io.File(s"$tmp/out").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = d.resolve(f"f$i%02d.parquet")
      java.nio.file.Files.move(part.toPath, dst)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(1700000000000L + i * 60000L))
      SessionToken.deleteDir(tmp)
    }
    d.toString
  }

  private def replay(dir: String, schema: StructType, name: String,
                     mode: OutputMode)(build: DataFrame => DataFrame): DataFrame = {
    val q = build(spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
      .option("latestFirst", "false").parquet(dir))
      .writeStream.outputMode(mode).format("memory").queryName(name)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    q.recentProgress.foreach { p =>
      println(s"[replay $name] batch=${p.batchId} rows=${p.numInputRows} eventTime=${p.eventTime} " +
        s"state=${p.stateOperators.map(so => s"dropped=${so.numRowsDroppedByWatermark} out=${so.numRowsUpdated}").mkString(";")} sinkRows=${p.sink.numOutputRows}")
    }
    spark.table(name)
  }

  test("watermark-late rows: out-of-order replay DROPS them, in-order replay KEEPS them (tumbling + session)") {
    // The 2h-watermark drop contract has never been EXERCISED: every
    // existing twin replays the fixture as one micro-batch, where the
    // watermark is still at its initial value while all rows are
    // processed — nothing is ever late. Here micro-batch 1 (events
    // from Jan 6 on, incl. the Jan 30 max) advances the watermark to
    // max(ts)−2h, then a later micro-batch delivers the pre-Jan-6
    // rows — WEEKS older than the watermark. Those must be dropped by
    // the stateful aggs; the control run delivers the same rows in ONE
    // batch, where they must all be kept. Both compared against batch
    // forms — drop/keep pinned by equality, not by no-crash.
    //
    // MEASURED SEMANTICS (Spark 4.1.2, this probe's first run): the
    // late-input filter lags the reported watermark by ONE batch. A
    // 2-batch delivery [main, late] does NOT drop: batch 1 reports
    // watermark=Jan30−2h in its progress but filters against the
    // PREVIOUS batch's value (1970) — all 165 late rows were accepted
    // (numRowsDroppedByWatermark=0), opened 145 already-expired
    // windows, and emitted them (final output equaled the keep-all
    // control exactly). Only from the SECOND batch after the advance
    // is the drop real (dropped=145 partial aggregates, out=0). The
    // midBatch below exists to cross that boundary — and this comment
    // exists because "watermark advanced" does NOT mean "late rows
    // now drop": an operator feeding micro-batches must not assume
    // the advance is effective until a batch boundary has passed.
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
    val pivot = lit("2024-01-06 00:00:00").cast("timestamp")
    val late = ev.where(col("ts") < pivot)
    val main = ev.where(col("ts") >= pivot)
    assert(late.count() > 0 && main.count() > 0, "pivot must split the fixture")
    // one recent row; keeps the watermark unchanged while crossing the
    // batch boundary that makes the advance effective for filtering
    val midBatch = main.orderBy(desc("ts")).limit(1)
    val outOfOrder = stageOrdered(Seq(main, midBatch, late))
    val inOrder = stageOrdered(Seq(ev))
    def tumble(src: DataFrame): DataFrame = src
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("bucket"), col("event_type"), col("n"))
    def tumbleBatch(b: DataFrame): DataFrame = b
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("bucket"), col("event_type"), col("n"))
    // every pre-pivot window ended weeks before the final watermark, so
    // both runs have FINALIZED (append-emitted) all of them — the
    // pre-pivot slice is exactly where drop vs keep is decidable
    val xT = replay(outOfOrder, ev.schema, "late_tumble_x", OutputMode.Append())(tumble)
      .where(col("bucket") < pivot)
    val yT = replay(inOrder, ev.schema, "late_tumble_y", OutputMode.Append())(tumble)
      .where(col("bucket") < pivot)
    val mainOnly = tumbleBatch(main).where(col("bucket") < pivot) // empty by construction
    val allRows = tumbleBatch(ev).where(col("bucket") < pivot)
    assert(mainOnly.count() == 0 && allRows.count() > 0)
    assert(xT.count() == 0,
      s"late rows must be DROPPED: out-of-order replay emitted ${xT.count()} pre-pivot buckets")
    assert(yT.exceptAll(allRows).count() == 0 && allRows.exceptAll(yT).count() == 0,
      "in-order replay must KEEP the same rows and equal the batch form on the finalized slice")
    // session windows: same delivery orders, same pin — out-of-order
    // yields NO session ending before the pivot (every pre-pivot event
    // was late and dropped), in-order yields exactly the batch sessions
    def sess(src: DataFrame): DataFrame = src
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("s_start"), col("w.end").as("s_end"),
        col("user_id"), col("n_events"))
    val xS = replay(outOfOrder, ev.schema, "late_sess_x", OutputMode.Append())(sess)
      .where(col("s_end") < pivot)
    val yS = replay(inOrder, ev.schema, "late_sess_y", OutputMode.Append())(sess)
      .where(col("s_end") < pivot)
    val batchSess = graft.sources.Tables.events(spark, sf)
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("s_start"), col("w.end").as("s_end"),
        col("user_id"), col("n_events"))
      .where(col("s_end") < pivot)
    assert(batchSess.count() > 0)
    assert(xS.count() == 0,
      "late rows must be DROPPED from sessionization: no pre-pivot session can exist out-of-order")
    assert(yS.exceptAll(batchSess).count() == 0 && batchSess.exceptAll(yS).count() == 0,
      "in-order replay must produce exactly the batch sessions on the finalized slice")
  }

  test("watermark-late duplicate re-delivery: dedup state past the watermark is gone — behavior pinned") {
    // dropDuplicatesWithinWatermark guarantees dedup only WITHIN the
    // watermark delay: once the watermark passes an event's time its
    // dedup state is evicted. Could a duplicate re-delivered LATE be
    // RE-EMITTED (state gone, filter missed)? Measured: NO — the two
    // mechanisms hand over without a gap, because both are driven by
    // the SAME lagged watermark value (see the tumbling probe): in
    // the batch right after the advance the filter still passes the
    // late row BUT the state has not been evicted yet (eviction also
    // used the lagged value last batch), so it collapses against live
    // state; from the next batch on the state is gone but the filter
    // now drops the row first. One output row per id in every
    // delivery order — pinned here for both phases.
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
    val pivot = lit("2024-01-06 00:00:00").cast("timestamp")
    val dup = ev.where(col("ts") < pivot).orderBy("event_id").limit(1)
    val dupId = dup.collect()(0).getLong(0)
    val main = ev.where(col("ts") >= pivot)
    val midBatch = main.orderBy(desc("ts")).limit(1)
    def dedupQ(src: DataFrame): DataFrame =
      src.withWatermark("ts", "2 hours")
        .dropDuplicatesWithinWatermark("event_id").select(col("event_id"))
    // phase 1 — re-delivery one batch after the advance: state still
    // live (eviction lags), duplicate collapses against it
    val x1 = replay(stageOrdered(Seq(main.unionByName(dup), dup)), ev.schema,
      "late_dedup_x1", OutputMode.Append())(dedupQ)
    // phase 2 — re-delivery two batches after: state evicted, but the
    // late-input filter (now effective) drops the row before it can
    // open fresh state and re-emit
    val x2 = replay(stageOrdered(Seq(main.unionByName(dup), midBatch, dup)), ev.schema,
      "late_dedup_x2", OutputMode.Append())(dedupQ)
    // control — both copies inside one micro-batch: classic dedup
    val y = replay(stageOrdered(Seq(main.unionByName(dup).unionByName(dup))), ev.schema,
      "late_dedup_y", OutputMode.Append())(dedupQ)
    assert(y.where(col("event_id") === dupId).count() == 1,
      "same-batch duplicate must collapse to one row")
    assert(x1.where(col("event_id") === dupId).count() == 1,
      "re-delivery against still-live state must collapse")
    assert(x2.where(col("event_id") === dupId).count() == 1,
      "re-delivery past eviction must be dropped by the late-input filter, not re-emitted")
    assert(x1.count() == main.count() + 1 && y.count() == main.count() + 1)
    // x2's midBatch row is itself a duplicate delivery of a main row —
    // collapsed, so the total is unchanged
    assert(x2.count() == main.count() + 1)
  }

  test("one far-future event poisons a watermarked stream — hazard pinned, sanity-bound mitigation restores output") {
    // The corrupt-event-TIME class (r19): a clock-skewed producer —
    // millis written where micros are read, a year-9999 placeholder —
    // is routine 100 TB corruption, and Spark has NO built-in sanity
    // bound: one such event advances the watermark by millennia and
    // every subsequent normal-time row is silently dropped as late.
    // Not a crash, not a flag — the pipeline keeps running and emits
    // (almost) nothing. Pin the hazard AND the mitigation: an
    // event-time sanity filter BEFORE withWatermark (the pattern the
    // StreamingQueries scaladoc now documents) restores the undamaged
    // output exactly.
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
    val pivot = lit("2024-01-06 00:00:00").cast("timestamp")
    val early = ev.where(col("ts") < pivot)
    val rest = ev.where(col("ts") >= pivot)
    assert(early.count() > 0 && rest.count() > 0)
    // one poisoned row: a real event with its ts forced to year 9999
    // (redelivered alone as batch 2 to cross the effectiveness lag —
    // its own far-future bucket never finalizes, so the duplicate
    // delivery cannot touch the asserted slice)
    val poison = early.orderBy("event_id").limit(1)
      .withColumn("ts", lit("9999-01-01 00:00:00").cast("timestamp"))
    def tumble(src: DataFrame): DataFrame = src
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("bucket"), col("event_type"), col("n"))
    val poisonedDir = stageOrdered(Seq(early.unionByName(poison), poison, rest))
    val x = replay(poisonedDir, ev.schema, "poison_x", OutputMode.Append())(tumble)
    // hazard: the early buckets finalized (the jump emitted them), but
    // EVERY normal row delivered after the poison was dropped — not one
    // post-pivot bucket exists below the far-future horizon
    assert(x.where(col("bucket") < pivot).count() > 0,
      "early buckets must have finalized — otherwise the probe shows nothing")
    assert(x.where(col("bucket") >= pivot && col("bucket") < lit("9000-01-01")).count() == 0,
      "poisoned stream must have silently dropped every post-poison normal row")
    // mitigation: the SAME poisoned delivery with a sanity bound before
    // withWatermark equals the clean in-order replay exactly
    def tumbleBounded(src: DataFrame): DataFrame =
      tumble(src.where(col("ts") < lit("2100-01-01").cast("timestamp")))
    val fixed = replay(poisonedDir, ev.schema, "poison_fix", OutputMode.Append())(tumbleBounded)
    val clean = replay(stageOrdered(Seq(ev)), ev.schema, "poison_clean",
      OutputMode.Append())(tumble)
    assert(fixed.exceptAll(clean).count() == 0 && clean.exceptAll(fixed).count() == 0,
      "sanity-bounded replay of the poisoned delivery must equal the clean stream's output")
  }

  test("stateful showcase: flatMapGroupsWithState running per-user counts") {
    val fn = (uid: Long, events: Iterator[UserEvent], state: GroupState[Long]) => {
      val n = state.getOption.getOrElse(0L) + events.size
      state.update(n)
      Iterator(UserCount(uid, n))
    }
    val ds: Dataset[UserEvent] = eventsStream.select(col("user_id"), col("event_id")).as[UserEvent]
    val streamed = runToMemory(
      ds.groupByKey(_.user_id)
        .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout())(fn)
        .toDF(),
      "stateful_out", OutputMode.Update())
    // final state per user (last update) must equal batch counts
    val finalCounts = streamed.groupBy(col("user_id")).agg(max(col("n")).as("n"))
    val batch = graft.sources.Tables.events(spark, sf)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
    assert(finalCounts.exceptAll(batch).count() == 0 && batch.exceptAll(finalCounts).count() == 0)
  }
}

/** Spark 4-native arbitrary state: per-user running max value via
  * transformWithState (RocksDB state store required).
  */
class TransformWithStateSpec extends SparkSpec {
  import spark.implicits._

  test("transformWithState: per-user running max equals batch max") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val d = java.nio.file.Files.createTempDirectory("tws_events")
    java.nio.file.Files.createSymbolicLink(
      d.resolve("events.parquet"), java.nio.file.Paths.get(s"$sf/events.parquet"))
    // shared landed-schema helper (ts normalization gets pruned away —
    // only user_id/value are selected)
    val stream = graft.sources.Tables
      .eventsStream(spark, s"$sf/events.parquet", d.toString)
      .select(col("user_id"), col("value"))

    val processor = new org.apache.spark.sql.streaming.StatefulProcessor[Long, org.apache.spark.sql.Row, (Long, Double)] {
      @transient private var maxState: org.apache.spark.sql.streaming.ValueState[Double] = _
      override def init(outputMode: org.apache.spark.sql.streaming.OutputMode,
                        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
        maxState = getHandle.getValueState[Double]("max",
          org.apache.spark.sql.Encoders.scalaDouble,
          org.apache.spark.sql.streaming.TTLConfig.NONE)
      override def handleInputRows(key: Long, rows: Iterator[org.apache.spark.sql.Row],
          timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[(Long, Double)] = {
        val prev = if (maxState.exists()) maxState.get() else Double.MinValue
        val mx = (Iterator(prev) ++ rows.map(_.getDouble(1))).max
        maxState.update(mx)
        Iterator((key, mx))
      }
    }
    val out = stream.groupByKey(_.getLong(0))
      .transformWithState(processor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Update(),
        org.apache.spark.sql.Encoders.tuple(org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaDouble))
      .toDF("user_id", "running_max")
    val q = out.writeStream.outputMode("update").format("memory").queryName("tws_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val finalMax = spark.table("tws_out").groupBy(col("user_id"))
      .agg(max(col("running_max")).as("m"))
    val batch = graft.sources.Tables.events(spark, sf)
      .groupBy(col("user_id")).agg(max(col("value")).as("m"))
    assert(finalMax.exceptAll(batch).count() == 0 && batch.exceptAll(finalMax).count() == 0)
  }

  test("transformWithState RocksDB state survives a checkpoint restart (running count continues)") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val events = graft.sources.Tables.events(spark, sf).select(col("user_id"), col("event_id"))
    val inDir = java.nio.file.Files.createTempDirectory("tws_rec_in").toString
    val ckpt = java.nio.file.Files.createTempDirectory("tws_rec_ck").toString
    events.where(pmod(col("event_id"), lit(2)) === 0)
      .coalesce(1).write.mode("append").parquet(inDir)
    val processor = new org.apache.spark.sql.streaming.StatefulProcessor[Long, org.apache.spark.sql.Row, (Long, Long)] {
      @transient private var nState: org.apache.spark.sql.streaming.ValueState[Long] = _
      override def init(outputMode: org.apache.spark.sql.streaming.OutputMode,
                        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
        nState = getHandle.getValueState[Long]("n",
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.streaming.TTLConfig.NONE)
      override def handleInputRows(key: Long, rows: Iterator[org.apache.spark.sql.Row],
          timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[(Long, Long)] = {
        val n = (if (nState.exists()) nState.get() else 0L) + rows.size
        nState.update(n)
        Iterator((key, n))
      }
    }
    val latest = scala.collection.concurrent.TrieMap.empty[Long, Long]
    def runPass(): Unit = {
      val out = spark.readStream.schema(events.schema).parquet(inDir)
        .groupByKey((r: org.apache.spark.sql.Row) => r.getLong(0))
        .transformWithState(processor,
          org.apache.spark.sql.streaming.TimeMode.None(),
          org.apache.spark.sql.streaming.OutputMode.Update(),
          org.apache.spark.sql.Encoders.tuple(org.apache.spark.sql.Encoders.scalaLong,
            org.apache.spark.sql.Encoders.scalaLong))
        .toDF("user_id", "n")
      val sq = out.writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: Dataset[org.apache.spark.sql.Row], _: Long) =>
          b.collect().foreach(r => latest.put(r.getLong(0), r.getLong(1)))
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      sq.awaitTermination()
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (spark.streams.active.exists(_.id == sq.id) && System.nanoTime() < deadline)
        Thread.sleep(20)
    }
    runPass()
    events.where(pmod(col("event_id"), lit(2)) === 1)
      .coalesce(1).write.mode("append").parquet(inDir)
    latest.clear()
    runPass()
    import spark.implicits._
    val batch = events.groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(latest.nonEmpty)
    latest.foreach { case (u, n) => assert(n == batch(u),
      s"user $u: restart emitted $n, batch total ${batch(u)} — RocksDB state did not recover") }
  }
}

/** Stream-stream join: purchases joined to clicks of the same user
  * within a bounded look-back window, both sides watermarked — the
  * state-bounded streaming join shape.
  */
class StreamStreamJoinSpec extends SparkSpec {

  private lazy val eventsDir: String = {
    val d = java.nio.file.Files.createTempDirectory("ssj_events")
    java.nio.file.Files.createSymbolicLink(
      d.resolve("events.parquet"), java.nio.file.Paths.get(s"$sf/events.parquet"))
    d.toString
  }

  private def stream =
    graft.sources.Tables.eventsStream(spark, s"$sf/events.parquet", eventsDir)

  test("watermarked stream-stream interval join matches the batch interval join") {
    val purchases = stream.where(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "2 hours")
    val clicks = stream.where(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"), col("ts").as("c_ts"))
      .withWatermark("c_ts", "2 hours")
    val joined = purchases.join(clicks,
      col("p_user") === col("c_user")
        && col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR")
        && col("c_ts") <= col("p_ts"))
      .select(col("p_id"), col("c_id"))

    val q = joined.writeStream.outputMode("append").format("memory").queryName("ssj_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("ssj_out")

    // batch twin IS the declared q_stream_join query (oracle'd by the driver)
    val batch = SparkEntry.queries("q_stream_join")(spark, sf)
      .select(col("p_id"), col("c_id"))

    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() == 0,
      "streamed pairs must be a subset of the batch interval join")
    // single AvailableNow pass over a static source → no drops expected
    assert(streamed.count() == batch.count(),
      s"streamed=${streamed.count()} batch=${batch.count()}")
  }

  test("incremental bitmap distinct under AT-LEAST-ONCE delivery converges exactly") {
    // stream events as 3 micro-batches; maintain per-type distinct users
    // as OR-merged bitmap registers — and merge EVERY batch TWICE to
    // simulate at-least-once redelivery. OR is idempotent, so the final
    // counts must equal the exact batch countDistinct with no dedup
    // bookkeeping (the property neither exact HashSets nor counters have).
    val regs = udaf(new graft.functions.BitmapRegisters)
    val uni = udaf(new graft.functions.BitmapUnion)
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("event_id"), col("event_type"), col("user_id"))
    val logDir = java.nio.file.Files.createTempDirectory("bm_log").toString
    (0 until 3).foreach { i =>
      ev.where(pmod(col("event_id"), lit(3)) === i)
        .coalesce(1).write.mode("append").parquet(logDir)
    }
    val stateBase = java.nio.file.Files.createTempDirectory("bm_state").toString
    var stateDir: Option[String] = None
    var gen = 0
    val sq = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", 1).parquet(logDir)
      .writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val partial = batch.toDF().groupBy(col("event_type"))
          .agg(regs(col("user_id")).as("bits"))
        // append the partial TWICE (simulated redelivery); state stays a
        // bag of register partials — the roll-up ORs them at read time
        gen += 1
        val next = s"$stateBase/v$gen"
        stateDir.map(d => spark.read.parquet(d))
          .map(_.unionByName(partial).unionByName(partial))
          .getOrElse(partial.unionByName(partial))
          .write.parquet(next)
        stateDir = Some(next)
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    sq.awaitTermination()
    // final roll-up: OR all stored register partials per type
    val finalCounts = spark.read.parquet(stateDir.get)
      .groupBy(col("event_type")).agg(uni(col("bits")).as("n_users"))
    val truth = ev.groupBy("event_type").agg(countDistinct("user_id").as("want"))
    assert(finalCounts.join(truth, "event_type")
      .where(col("n_users") =!= col("want")).count() == 0,
      "at-least-once bitmap maintenance diverged from exact distinct")
  }
}
