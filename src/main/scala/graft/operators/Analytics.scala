package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** §2.12 (round-3) analytics operators: gaps-and-islands / SCD-style
  * run collapsing, time-series resampling with forward fill, cohort
  * retention, statistical anomaly detection, struct-ordered argmin,
  * deterministic stratified sampling, and PII redaction.
  *
  * Shared scale discipline: every window partitions on a real entity
  * key (customer/user) so per-partition state is bounded; aggregates
  * over doubles go through exact DECIMAL sums (`dec`) and present as
  * DOUBLE (`dbl`); derived statistics (mean/variance/z) are computed
  * with the identical double-op order on both engine and oracle so
  * the comparison is bit-stable.
  */
object Analytics {

  /** Gaps-and-islands: collapse each customer's consecutive same-status
    * order runs into [run_start, run_end] intervals — the SCD-2-style
    * "compress history into validity ranges" shape. One window
    * partition (o_custkey) serves both the break flag and the running
    * island id, so the whole query is a single exchange + sort, then a
    * map-side-combinable aggregate on (custkey, island).
    */
  def winIslands(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_orderstatus"))
      .withColumn("brk",
        when(lag(col("o_orderstatus"), 1).over(w) === col("o_orderstatus"), 0L).otherwise(1L))
      .withColumn("island", sum(col("brk")).over(run))
      .groupBy(col("o_custkey"), col("island"), col("o_orderstatus"))
      .agg(
        min(col("o_orderdate")).as("run_start"),
        max(col("o_orderdate")).as("run_end"),
        count(lit(1)).as("run_len"))
      .select(col("o_custkey"), col("island"), col("o_orderstatus").as("status"),
        col("run_start"), col("run_end"), col("run_len"))
      .orderBy("o_custkey", "island")
  }

  /** Daily resample + forward fill per user: aggregate events to daily
    * sums, expand each user's [min_day, max_day] span with
    * `sequence`+`explode` (distributed — no driver-side calendar), left
    * join the dense calendar back, and forward-fill gaps with
    * last-non-null over a bounded user partition. The calendar rows per
    * user are O(span days), so the explode cannot blow up on a wide
    * corpus the way a global dates×users cross join would.
    */
  def tsResample(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(col("user_id"), date_trunc("DAY", col("ts")).as("day"))
      .agg(dbl(sum(dec(col("value")))).as("day_sum"))
    val cal = daily.groupBy(col("user_id"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("user_id"),
        explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("day"))
    val fill = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cal.join(daily, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"), col("day_sum"),
        last(col("day_sum"), ignoreNulls = true).over(fill).as("filled_sum"))
      .orderBy("user_id", "day")
  }

  /** Weekly cohort retention: cohort = a user's first active ISO week;
    * cell = distinct users of that cohort active `week_offset` weeks
    * later. The cohort assignment is a window-min over the user
    * partition (one exchange), NOT a self-join back onto events — at
    * corpus scale the join formulation rescans the fact table.
    */
  def retentionCohort(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
    Tables.events(s, dir)
      .select(col("user_id"), date_trunc("WEEK", col("ts")).as("wk"))
      .withColumn("cohort", min(col("wk")).over(byUser))
      .groupBy(col("cohort"), col("wk"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .select(col("cohort"),
        expr("CAST(datediff(wk, cohort) div 7 AS BIGINT)").as("week_offset"),
        col("n_users"))
      .orderBy("cohort", "week_offset")
  }

  /** Z-score anomaly detection over event values, per event type.
    * Moments come from ONE map-side-combinable pass (count + exact
    * decimal Σx and Σx²) over 5 groups — a tiny table that is then
    * broadcast back onto the fact scan; no window over the full fact
    * table, no second scan. mean/sd/z are derived in float64 with the
    * identical operation order on both sides (each DECIMAL→DOUBLE cast
    * is one correctly-rounded conversion; sqrt/div/sub are IEEE-exact),
    * so the filtered row set is deterministic.
    */
  def anomalyZscore(s: SparkSession, dir: String): DataFrame = {
    val stats = Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        dbl(sum(dec(col("value")))).as("s1"),
        dbl(sum(dec(col("value")) * dec(col("value")))).as("s2"))
    val mean = col("s1") / col("n")
    // clamp: s2/n - mean² can round to a tiny negative for a
    // zero-variance group (sqrt → NaN in Spark, error in some engines);
    // zero-variance groups have no outliers by definition, so drop them
    val sd = sqrt(greatest(
      col("s2") / col("n") - (col("s1") / col("n")) * (col("s1") / col("n")), lit(0.0)))
    Tables.events(s, dir)
      .join(broadcast(stats), "event_type")
      .withColumn("sd", sd)
      .where(col("sd") > 0)
      .withColumn("z", (col("value") - mean) / col("sd"))
      .where(abs(col("z")) > 2.5)
      .select(col("event_id"), col("event_type"), col("value"), col("z"))
      .orderBy("event_id")
  }

  /** Argmin via struct-ordered aggregate: the cheapest order (and its
    * key) per priority class. `min(struct(price, key))` is
    * map-side-combinable — one partial-agg pass, no full sort — which
    * beats the row_number()-window formulation at scale (the oracle
    * states the same semantics with the window form).
    */
  def aggArgmin(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        min(struct(dec("o_totalprice").as("p"), col("o_orderkey").as("k"))).as("m"),
        count(lit(1)).as("n"))
      .select(col("o_orderpriority"), dbl(col("m.p")).as("min_price"),
        col("m.k").as("min_orderkey"), col("n"))
      .orderBy("o_orderpriority")

  /** Deterministic stratified sampling: per-language keep rates applied
    * through a portable integer hash (`(doc_id*48271+11) mod 100`,
    * same family as q_split_train_test) — reproducible across engines
    * and cluster sizes, unlike `sample()`/`rand()`. A pure map-side
    * filter: no shuffle, fully pushdown-friendly.
    */
  def sampleStratified(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("bucket", pmod(col("doc_id") * 48271 + 11, lit(100)))
      .where(col("bucket") <
        when(col("lang") === "en", 50).when(col("lang") === "zh", 10).otherwise(20))
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy("doc_id")

  /** PII redaction: scrub emails and phone numbers from a contact
    * string (synthesized deterministically from customer rows — the
    * fixture corpus itself contains no PII-shaped text). Single-scan
    * regexp projection, codegen'd, no shuffle — the shape of a corpus
    * scrubbing pass. Patterns stay in the RE2 ∩ Java-regex common
    * subset so engine and oracle agree.
    */
  def piiRedact(s: SparkSession, dir: String): DataFrame = {
    val contact = concat(
      col("c_name"), lit(" email "),
      lower(regexp_replace(col("c_name"), "[^A-Za-z0-9]", "")), lit("@example.com"),
      lit(" phone 555-"), lpad(col("c_custkey").cast("string"), 7, "0"))
    Tables.customer(s, dir)
      .select(col("c_custkey"), contact.as("contact"))
      .select(
        col("c_custkey"),
        regexp_replace(
          regexp_replace(col("contact"),
            "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
          "555-[0-9]{4,10}", "<PHONE>").as("redacted"))
      .withColumn("had_pii", col("redacted").contains("<EMAIL>") ||
        col("redacted").contains("<PHONE>"))
      .orderBy("c_custkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_win_islands" -> winIslands,
    "q_ts_resample" -> tsResample,
    "q_retention_cohort" -> retentionCohort,
    "q_anomaly_zscore" -> anomalyZscore,
    "q_agg_argmin" -> aggArgmin,
    "q_sample_stratified" -> sampleStratified,
    "q_text_pii_redact" -> piiRedact
  )

  val oracle: Map[String, String] = Map(
    "q_win_islands" ->
      """WITH o AS (
        |  SELECT o_custkey, o_orderkey, o_orderdate, o_orderstatus,
        |    CASE WHEN lag(o_orderstatus) OVER w = o_orderstatus THEN 0 ELSE 1 END AS brk
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
        |i AS (
        |  SELECT *, CAST(sum(brk) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS island
        |  FROM o)
        |SELECT o_custkey, island, o_orderstatus AS status,
        |  min(o_orderdate) AS run_start, max(o_orderdate) AS run_end,
        |  count(*) AS run_len
        |FROM i GROUP BY o_custkey, island, o_orderstatus
        |ORDER BY o_custkey, island""".stripMargin,
    "q_ts_resample" ->
      """WITH daily AS (
        |  SELECT user_id, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
        |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS day_sum
        |  FROM events GROUP BY 1, 2),
        |cal AS (
        |  SELECT user_id, unnest(generate_series(min(day), max(day), INTERVAL 1 DAY)) AS day
        |  FROM daily GROUP BY user_id)
        |SELECT c.user_id, c.day, d.day_sum,
        |  last_value(d.day_sum IGNORE NULLS) OVER (
        |    PARTITION BY c.user_id ORDER BY c.day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_sum
        |FROM cal c LEFT JOIN daily d ON c.user_id = d.user_id AND c.day = d.day
        |ORDER BY c.user_id, c.day""".stripMargin,
    "q_retention_cohort" ->
      """WITH e AS (
        |  SELECT user_id, CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS wk FROM events),
        |c AS (
        |  SELECT user_id, wk, min(wk) OVER (PARTITION BY user_id) AS cohort FROM e)
        |SELECT cohort, CAST(date_diff('day', cohort, wk) // 7 AS BIGINT) AS week_offset,
        |  count(DISTINCT user_id) AS n_users
        |FROM c GROUP BY cohort, wk
        |ORDER BY cohort, week_offset""".stripMargin,
    "q_anomaly_zscore" ->
      """WITH st AS (
        |  SELECT event_type, count(*) AS n,
        |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s1,
        |    CAST(sum(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s2
        |  FROM events GROUP BY event_type),
        |d AS (
        |  SELECT e.event_id, e.event_type, e.value,
        |    sqrt(greatest(s2/n - (s1/n)*(s1/n), 0)) AS sd,
        |    e.value - s1/n AS dev
        |  FROM events e JOIN st USING (event_type))
        |SELECT event_id, event_type, value, dev / sd AS z
        |FROM d
        |WHERE sd > 0 AND abs(dev / sd) > 2.5
        |ORDER BY event_id""".stripMargin,
    "q_agg_argmin" ->
      """WITH r AS (
        |  SELECT o_orderpriority, o_orderkey,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS p,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY CAST(o_totalprice AS DECIMAL(18,2)), o_orderkey) AS rn,
        |    count(*) OVER (PARTITION BY o_orderpriority) AS n
        |  FROM orders)
        |SELECT o_orderpriority, CAST(p AS DOUBLE) AS min_price,
        |  o_orderkey AS min_orderkey, n
        |FROM r WHERE rn = 1
        |ORDER BY o_orderpriority""".stripMargin,
    "q_sample_stratified" ->
      """SELECT doc_id, lang, n_chars
        |FROM documents
        |WHERE (doc_id * 48271 + 11) % 100 <
        |  CASE WHEN lang = 'en' THEN 50 WHEN lang = 'zh' THEN 10 ELSE 20 END
        |ORDER BY doc_id""".stripMargin,
    "q_text_pii_redact" ->
      """WITH c AS (
        |  SELECT c_custkey,
        |    c_name || ' email ' || lower(regexp_replace(c_name, '[^A-Za-z0-9]', '', 'g'))
        |      || '@example.com' || ' phone 555-' || lpad(CAST(c_custkey AS VARCHAR), 7, '0')
        |      AS contact
        |  FROM customer)
        |SELECT c_custkey,
        |  regexp_replace(
        |    regexp_replace(contact, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '555-[0-9]{4,10}', '<PHONE>', 'g') AS redacted,
        |  (contains(regexp_replace(
        |     regexp_replace(contact, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |     '555-[0-9]{4,10}', '<PHONE>', 'g'), '<EMAIL>')
        |   OR contains(regexp_replace(
        |     regexp_replace(contact, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |     '555-[0-9]{4,10}', '<PHONE>', 'g'), '<PHONE>')) AS had_pii
        |FROM c
        |ORDER BY c_custkey""".stripMargin
  )
}
