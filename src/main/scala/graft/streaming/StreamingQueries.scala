package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.dec
import graft.sources.Tables

/** One sessionization result row (typed flatMapGroups output). */
case class UserSession(s_start: java.time.Instant, s_end: java.time.Instant,
                       user_id: Long, n_events: Long)

/** §2.8 streaming operators, contract-safe delivery: each key returns
  * the batch-equivalent DataFrame (the driver calls .count()/.write on
  * results, and a streaming DataFrame would throw). The true
  * Structured Streaming twins — readStream + watermark +
  * Trigger.AvailableNow — run in StreamingSpec and are asserted equal
  * to these batch forms.
  *
  * Late-data policy (SURVEY §2.8): watermark 2h on ts; tumbling/
  * sliding/session windows finalize when the watermark passes.
  *
  * FAR-FUTURE HAZARD (r19, probe-pinned in StreamingSpec): Spark has
  * no built-in sanity bound on event time, so ONE clock-skewed event
  * (millis written where micros are read, a year-9999 placeholder)
  * advances the watermark by millennia and every subsequent
  * normal-time row is silently dropped as late — the pipeline keeps
  * running and emits (almost) nothing, with no error anywhere. A
  * production deployment of these twins must put an event-time sanity
  * filter BEFORE withWatermark (e.g. `ts < now + tolerance` evaluated
  * against ingestion time); the probe shows that bound restoring the
  * undamaged output exactly on a poisoned delivery. Not added to the
  * contract queries themselves: any fixed horizon literal would be
  * arbitrary policy baked into oracle-checked semantics.
  */
object StreamingQueries {

  /** 1-hour tumbling counts + sums per event type. */
  def tumbling(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), graft.operators.dbl(sum(dec("value"))).as("sum_value"))
      .select(col("w.start").as("bucket"), col("event_type"), col("n"), col("sum_value"))
      .orderBy("bucket", "event_type")

  /** 1-hour window sliding every 15 minutes, per type. */
  def sliding(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("bucket"), col("event_type"), col("n"))
      .orderBy("bucket", "event_type")

  /** Session windows, 30-minute gap, per user. */
  def session(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("s_start"), col("w.end").as("s_end"),
        col("user_id"), col("n_events"))
      .orderBy("user_id", "s_start")

  /** Custom sessionization through the TYPED stateful API shape:
    * `groupByKey(user).flatMapGroups` with hand-rolled 30-minute-gap
    * state — the batch twin of `mapGroupsWithState` (whose streaming
    * form runs in StreamingSpec). Semantics identical to the
    * session_window form (q_stream_session) and checked by the SAME
    * oracle. Per-user events are materialized and sorted inside the
    * group — bounded by events-per-user, the standard sessionization
    * assumption; users partition across executors, so the shape holds
    * at corpus scale.
    */
  def sessionCustom(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val gapUs = 30L * 60 * 1000000
    def us(i: java.time.Instant): Long =
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    Tables.events(s, dir)
      // corrupt-events guard (r18): a NULL user_id hits the typed
      // encoder's non-nullable Long field ("Null value appeared in
      // non-nullable field" — whole-job kill on one bad row; null user
      // ids are ROUTINE client-bug output in real event streams), and a
      // NULL ts would NPE inside the group sort. A row lacking either
      // cannot be sessionized; the built-in session_window form drops
      // the same rows (probe-pinned equal on the corrupt fixture).
      .where(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id"), col("ts"))
      .as[(Long, java.time.Instant)]
      .groupByKey(_._1)
      .flatMapGroups { (user: Long, it: Iterator[(Long, java.time.Instant)]) =>
        val times = it.map(_._2).toArray.sortBy(us)
        val out = scala.collection.mutable.ArrayBuffer.empty[UserSession]
        var start = 0
        var i = 1
        while (i <= times.length) {
          if (i == times.length || us(times(i)) - us(times(i - 1)) >= gapUs) {
            out += UserSession(times(start),
              times(i - 1).plusSeconds(30L * 60), user, (i - start).toLong)
            start = i
          }
          i += 1
        }
        out
      }
      .toDF()
      .select(col("s_start").cast("timestamp"), col("s_end").cast("timestamp"),
        col("user_id"), col("n_events"))
      .orderBy("user_id", "s_start")
  }

  /** Duplicate-delivery dedup: the stream is simulated as the events
    * table delivered twice; the deterministic reduction keeps one row
    * per event_id (aggregation, not dropDuplicates — keeper must not
    * depend on partition order).
    */
  def dedup(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .select(col("event_id"), col("event_type"), col("ts"), col("user_id"))
    e.unionAll(e)
      .groupBy(col("event_id"))
      .agg(
        min(col("event_type")).as("event_type"),
        min(col("user_id")).as("user_id"),
        date_trunc("minute", min(col("ts"))).as("minute_bucket"),
        count(lit(1)).as("n_seen"))
      .orderBy("event_id")
  }

  /** Late-data accounting: events older than (max ts − 2h watermark)
    * counted per hour bucket. The watermark scalar comes from a
    * 1-row aggregate broadcast against the stream — no driver loop.
    */
  def late(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val wm = e.agg((max(unix_micros(col("ts"))) - lit(2L * 3600 * 1000000)).as("wm_us"))
    e.crossJoin(broadcast(wm))
      .groupBy(date_trunc("hour", col("ts")).as("bucket"))
      .agg(
        count(lit(1)).as("n_total"),
        sum(when(unix_micros(col("ts")) < col("wm_us"), 1L).otherwise(0L)).as("n_late"))
      .orderBy("bucket")
  }

  /** Stream-stream interval join, batch twin: each purchase paired
    * with the same user's clicks in the preceding hour. The true
    * Structured Streaming form (two watermarked streams, interval
    * condition) runs in StreamingSpec and is asserted equal to this
    * batch plan; state is bounded by the watermark + interval, and the
    * join shuffles both sides once on user_id — the shape that holds
    * on an unbounded stream.
    */
  def streamJoin(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val p = e.where(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"), col("ts").as("p_ts"))
    val c = e.where(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"), col("ts").as("c_ts"))
    p.join(c,
        col("p_user") === col("c_user")
          && col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR")
          && col("c_ts") <= col("p_ts"))
      .select(col("p_id"), col("c_id"), col("p_user").as("user_id"))
      .orderBy("p_id", "c_id")
  }

  /** Stream-static enrichment, batch twin: the event stream joined to
    * the static customer dimension (re-read per micro-batch in the
    * true streaming form, broadcast here), aggregated per day ×
    * segment. The streaming twin runs in StreamingSpec and is
    * asserted equal; the static side needs no watermark — exactly the
    * dimension-enrichment shape a 100 TB event pipeline runs, with
    * the dim broadcast so the unbounded side never shuffles.
    */
  def streamStatic(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .join(broadcast(Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_mktsegment"))),
        col("user_id") === col("c_custkey"))
      .groupBy(date_trunc("DAY", col("ts")).as("bucket"), col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("n"), graft.operators.dbl(sum(dec("value"))).as("sum_value"))
      .orderBy("bucket", "segment")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_stream_static" -> streamStatic,
    "q_stream_join" -> streamJoin,
    "q_stream_session_custom" -> sessionCustom,
    "q_stream_tumbling" -> tumbling,
    "q_stream_sliding" -> sliding,
    "q_stream_session" -> session,
    "q_stream_dedup" -> dedup,
    "q_stream_late" -> late
  )

  private val sessionOracleSql =
    """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
      |marked AS (
      |  SELECT user_id, ts,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |sess AS (
      |  SELECT user_id, ts,
      |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM marked)
      |SELECT min(ts) AS s_start,
      |  max(ts) + INTERVAL 30 MINUTE AS s_end,
      |  user_id, count(*) AS n_events
      |FROM sess
      |GROUP BY user_id, sid
      |ORDER BY user_id, s_start""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_stream_static" ->
      """SELECT CAST(date_trunc('day', CAST(e.ts AS TIMESTAMP)) AS TIMESTAMP) AS bucket,
        |  c.c_mktsegment AS segment, count(*) AS n,
        |  CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |GROUP BY 1, 2
        |ORDER BY bucket, segment""".stripMargin,
    "q_stream_join" ->
      """SELECT p.event_id AS p_id, c.event_id AS c_id, p.user_id AS user_id
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id
        | AND CAST(c.ts AS TIMESTAMP) >= CAST(p.ts AS TIMESTAMP) - INTERVAL 1 HOUR
        | AND CAST(c.ts AS TIMESTAMP) <= CAST(p.ts AS TIMESTAMP)
        |ORDER BY p_id, c_id""".stripMargin,
    "q_stream_tumbling" ->
      """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bucket, event_type,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY bucket, event_type""".stripMargin,
    "q_stream_sliding" ->
      """SELECT TIMESTAMP '1970-01-01 00:00:00'
        |    + ((epoch_us(CAST(ts AS TIMESTAMP)) // 1000000) // 900 - k) * 900 * INTERVAL '1 second' AS bucket,
        |  event_type, count(*) AS n
        |FROM events, (SELECT unnest([0, 1, 2, 3]) AS k)
        |GROUP BY 1, 2
        |ORDER BY bucket, event_type""".stripMargin,
    // ONE definition of session semantics — both implementations are
    // checked against literally the same oracle (no copy drift)
    "q_stream_session_custom" -> sessionOracleSql,
    "q_stream_session" -> sessionOracleSql,
    "q_stream_dedup" ->
      """SELECT event_id,
        |  min(event_type) AS event_type,
        |  min(user_id) AS user_id,
        |  date_trunc('minute', min(CAST(ts AS TIMESTAMP))) AS minute_bucket,
        |  count(*) AS n_seen
        |FROM (SELECT * FROM events UNION ALL SELECT * FROM events)
        |GROUP BY event_id
        |ORDER BY event_id""".stripMargin,
    "q_stream_late" ->
      """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bucket,
        |  count(*) AS n_total,
        |  CAST(sum(CASE WHEN epoch_us(CAST(ts AS TIMESTAMP)) <
        |        (SELECT max(epoch_us(CAST(ts AS TIMESTAMP))) - 7200000000 FROM events)
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_late
        |FROM events
        |GROUP BY 1
        |ORDER BY bucket""".stripMargin
  )
}
