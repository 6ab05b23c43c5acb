package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** §2.4 aggregations. Flagship first (TPC-H Q1 shape).
  *
  * Scale notes: every groupBy here is a hash aggregate with map-side
  * partial aggregation (Spark plans HashAggregate(partial) →
  * shuffle-on-group-keys → HashAggregate(final)); group cardinality is
  * tiny relative to input (6 flag×status groups, 25 nations, …) so the
  * shuffle moves only partial states — the pattern that survives 100 TB.
  */
object Aggregations {

  /** TPC-H Q1: pricing summary report. Decimal-exact aggregation,
    * total-order output (SURVEY §7.1).
    */
  def pricingSummary(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dbl(sum(dec("l_quantity"))).as("sum_qty"),
        dbl(sum(dec("l_extendedprice"))).as("sum_base_price"),
        dbl(sum(dec("l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec("l_discount"))))
          .as("sum_disc_price"),
        avgDec(col("l_quantity"), count(lit(1))).as("avg_qty"),
        avgDec(col("l_extendedprice"), count(lit(1))).as("avg_price"),
        avgDec(col("l_discount"), count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** Exact distinct-count per group (shuffles twice: expand + final). */
  def aggDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n_parts"), count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  /** HLL++ approximate distinct — single-pass, constant memory per
    * group: the 100 TB path when exactness isn't required. No oracle
    * (sketch internals differ across engines); `AggregationSpec`
    * bounds it against the exact count instead.
    */
  def aggApproxHll(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey")).as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"))
      .orderBy("l_returnflag")

  /** ROLLUP over nation×priority with grouping_id disambiguation. */
  def aggRollup(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    val n = Tables.nation(s, dir)
    // customer is unhinted (at sf100 it is GBs — a forced broadcast
    // OOMs; AQE broadcasts it only while it actually fits); nation is
    // 25 rows, always broadcast.
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .rollup(col("n_name"), col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n"),
        dbl(sum(dec("o_totalprice"))).as("sum_price"),
        grouping_id().as("gid"))
      .orderBy(col("gid"), asc_nulls_first("n_name"), asc_nulls_first("o_orderpriority"))
  }

  /** CUBE over order status×priority. */
  def aggCube(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n"),
        dbl(sum(dec("o_totalprice"))).as("sum_price"),
        grouping_id().as("gid"))
      .orderBy(col("gid"), asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"))

  /** Explicit GROUPING SETS via the SQL entry point (temp view). */
  def aggGroupingSets(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_gs")
    s.sql(
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  grouping_id() AS gid
        |FROM lineitem_gs
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)
  }

  /** min_by/max_by (sort-agg flavor) with a tie-free ranking value:
    * totalprice is not unique, so rank on price*100 (exact cents)
    * composed with the unique orderkey.
    *
    * The composition spacing must exceed EVERY possible orderkey or the
    * tiebreak term corrupts the price ordering silently (the pre-r16
    * `cents * 1e7 + orderkey` form inverted winners once orderkeys pass
    * 1e7 — TPC-H sf100 reaches 6e11). Prices are value-bounded (cents
    * fit 10 digits at any SF) but keys GROW with the corpus, so the
    * spacing is 1e18 in DECIMAL arithmetic: product ≤ 1e28, exact in
    * DECIMAL(38,0), orderable by min_by/max_by, and HUGEINT-expressible
    * on the DuckDB side. Same (price, orderkey) lexicographic order at
    * every scale.
    */
  def aggSortFirstLast(s: SparkSession, dir: String): DataFrame = {
    val rankVal = (round(col("o_totalprice") * 100).cast("decimal(10,0)")
      * lit(1000000000000000000L).cast("decimal(19,0)")
      + col("o_orderkey").cast("decimal(19,0)")).as("v")
    Tables.orders(s, dir)
      .select(col("o_orderpriority"), col("o_orderkey"), dec("o_totalprice").as("price"), rankVal)
      .groupBy(col("o_orderpriority"))
      .agg(
        min_by(col("o_orderkey"), col("v")).as("cheapest_order"),
        max_by(col("o_orderkey"), col("v")).as("priciest_order"),
        dbl(min(col("price"))).as("min_price"),
        dbl(max(col("price"))).as("max_price"))
      .orderBy("o_orderpriority")
  }

  /** Custom typed UDAF (graft.functions.WeightedAvg): discount-weighted
    * average extended price per return flag.
    */
  def udafWeighted(s: SparkSession, dir: String): DataFrame = {
    val wavg = udaf(graft.functions.WeightedAvg)
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(dbl(wavg(dec("l_extendedprice"), dec("l_discount")).cast("decimal(18,6)")).as("wavg_price"))
      .orderBy("l_returnflag")
  }

  /** §2.13 (round-4) mergeable bounded-memory quantile sketch
    * (graft.functions.QuantileSketch): per-group median estimate from
    * a K=128 bottom-k-by-portable-hash sample. The buffer is O(K) at
    * every stage (partial, shuffle, merge) — the sketch discipline a
    * 100 TB percentile needs — yet the bottom-k construction is a pure
    * function of the data set, so the DuckDB oracle recomputes the
    * identical estimate with a global sort: streaming bounded buffer
    * vs ORDER BY/LIMIT, two algorithms, one deterministic answer.
    */
  def aggSketchQuantile(s: SparkSession, dir: String): DataFrame = {
    val sk = udaf(new graft.functions.QuantileSketch(128, 0.5))
    Tables.lineitem(s, dir)
      .select(col("l_returnflag"),
        (col("l_orderkey") * 4096 + col("l_linenumber")).as("id"),
        col("l_quantity").cast("double").as("v"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), sk(col("id"), col("v")).as("med_est"))
      .orderBy("l_returnflag")
  }

  /** §2.13 (round-4) custom HLL (graft.functions.HllSketch): per-type
    * distinct users from 1 KB of registers per group — the
    * register-array sketch sibling of the bottom-k quantile sketch,
    * with the exact distinct count alongside so every row carries its
    * own error witness. No oracle (64-bit wrapping multiply isn't
    * DuckDB-expressible); rows-only driver check + RelationalSpec
    * error/mergeability proofs.
    */
  def aggHllCustom(s: SparkSession, dir: String): DataFrame = {
    val hll = udaf(new graft.functions.HllSketch)
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_d"),
        hll(col("user_id")).as("est_d"))
      .orderBy("event_type")
  }

  /** Hot-key aggregation through the explicit two-stage salting path
    * (graft.operators.Skew): events has only 5 event_type values, the
    * canonical skew shape. Stage 1 spreads each hot key over 8 salt
    * buckets, stage 2 merges — result identical to the direct
    * aggregation (decimal sums are associative), verified by oracle.
    */
  def aggSaltedSkew(s: SparkSession, dir: String): DataFrame =
    Skew.saltedSumCount(Tables.events(s, dir), "event_type", dec("value"), "event_id", 8)
      .select(col("event_type"), dbl(col("total")).as("total"), col("n"))
      .orderBy("event_type")

  /** Pivot: order counts per status × priority, explicit pivot values
    * (never infer pivot columns from data at scale — that's an extra
    * distinct scan) renamed to stable identifiers.
    */
  def aggPivot(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderstatus"))
      .pivot("o_orderpriority",
        Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
      .agg(count(lit(1)))
      .select(col("o_orderstatus"),
        coalesce(col("`1-URGENT`"), lit(0L)).as("n_urgent"),
        coalesce(col("`2-HIGH`"), lit(0L)).as("n_high"),
        coalesce(col("`3-MEDIUM`"), lit(0L)).as("n_medium"),
        coalesce(col("`4-NOT SPECIFIED`"), lit(0L)).as("n_notspec"),
        coalesce(col("`5-LOW`"), lit(0L)).as("n_low"))
      .orderBy("o_orderstatus")

  /** Deterministic statistical aggregates: population variance/stddev
    * derived from exact decimal sums (built-in stddev aggregates raw
    * doubles whose partial-merge order is nondeterministic — never
    * hash-matchable; this form is).
    */
  def aggStats(s: SparkSession, dir: String): DataFrame = {
    val agg = Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        sum(dec("l_quantity")).as("s1"),
        sum(dec("l_quantity") * dec("l_quantity")).as("s2"),
        count(lit(1)).as("n"))
    val s1d = col("s1").cast("double")
    val s2d = col("s2").cast("double")
    agg.select(
        col("l_returnflag"),
        dbl(((s2d - s1d * s1d / col("n")) / col("n")).cast("decimal(18,6)")).as("var_pop"),
        dbl(sqrt((s2d - s1d * s1d / col("n")) / col("n")).cast("decimal(18,6)")).as("stddev_pop"),
        col("n"))
      .orderBy("l_returnflag")
  }

  /** Exact percentiles (interpolated, h = (n−1)·p indexing — same
    * formula as DuckDB quantile_cont). Integer-valued quantities make
    * the interpolation arithmetic exact; presented as DECIMAL(18,4).
    */
  def aggPercentiles(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        dbl(expr("percentile(l_quantity, 0.5)").cast("decimal(18,4)")).as("median"),
        dbl(expr("percentile(l_quantity, 0.25)").cast("decimal(18,4)")).as("q1"),
        dbl(expr("percentile(l_quantity, 0.9)").cast("decimal(18,4)")).as("p90"))
      .orderBy("l_returnflag")

  /** Column profiling — the data-quality sweep every ingest pipeline
    * runs first: per column, null count and exact distinct count, in
    * long format. ONE scan computes all profiles (count+count_distinct
    * pairs in a single agg — Spark expands the multi-distinct into one
    * Expand, still a single pass over the data), then the wide row is
    * melted client-free via stack. At 100 TB you'd swap the exact
    * distinct for approx_count_distinct; the dataflow is identical.
    */
  def aggProfile(s: SparkSession, dir: String): DataFrame = {
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
    val wide = Tables.orders(s, dir).agg(
      count(lit(1)).as("n_rows"),
      cols.flatMap(c => Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls_$c"),
        countDistinct(col(c)).as(s"dist_$c"))): _*)
    val stackExpr = cols.map(c => s"'$c', nulls_$c, dist_$c").mkString(", ")
    wide.select(col("n_rows"),
        expr(s"stack(${cols.length}, $stackExpr) AS (column_name, n_nulls, n_distinct)"))
      .select(col("column_name"), col("n_nulls"), col("n_distinct"), col("n_rows"))
      .orderBy("column_name")
  }

  /** Fixed-width numeric histogram (width_bucket shape): order totals
    * binned at 50k, count + exact decimal mass per bin. A map-side
    * projection + one exchange on the (tiny) bin key — the
    * distribution-profiling scan shape at any scale.
    */
  def aggHistogram(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .withColumn("bin", floor(col("o_totalprice") / 50000).cast("int"))
      .groupBy(col("bin"))
      .agg(
        count(lit(1)).as("n"),
        dbl(min(dec("o_totalprice"))).as("bin_min"),
        dbl(max(dec("o_totalprice"))).as("bin_max"),
        dbl(sum(dec("o_totalprice"))).as("mass"))
      .orderBy("bin")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_agg_histogram" -> aggHistogram,
    "q_agg_profile" -> aggProfile,
    "q_agg_salted_skew" -> aggSaltedSkew,
    "q_agg_pivot" -> aggPivot,
    "q_agg_stats" -> aggStats,
    "q_agg_percentiles" -> aggPercentiles,
    "q_agg_pricing_summary" -> pricingSummary,
    "q_agg_distinct" -> aggDistinct,
    "q_agg_approx_hll" -> aggApproxHll,
    "q_agg_rollup" -> aggRollup,
    "q_agg_cube" -> aggCube,
    "q_agg_grouping_sets" -> aggGroupingSets,
    "q_agg_sort_first_last" -> aggSortFirstLast,
    "q_udaf_weighted" -> udafWeighted,
    "q_agg_sketch_quantile" -> aggSketchQuantile,
    "q_agg_hll_custom" -> aggHllCustom
  )

  val oracle: Map[String, String] = Map(
    "q_agg_histogram" ->
      """SELECT CAST(floor(o_totalprice / 50000) AS INTEGER) AS bin,
        |  count(*) AS n,
        |  CAST(min(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS bin_min,
        |  CAST(max(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS bin_max,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS mass
        |FROM orders
        |GROUP BY 1
        |ORDER BY bin""".stripMargin,
    "q_agg_profile" ->
      """WITH base AS (
        |  SELECT count(*) AS n_rows,
        |    sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS nulls_o_orderkey,
        |    count(DISTINCT o_orderkey) AS dist_o_orderkey,
        |    sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS nulls_o_custkey,
        |    count(DISTINCT o_custkey) AS dist_o_custkey,
        |    sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS nulls_o_orderstatus,
        |    count(DISTINCT o_orderstatus) AS dist_o_orderstatus,
        |    sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS nulls_o_orderpriority,
        |    count(DISTINCT o_orderpriority) AS dist_o_orderpriority
        |  FROM orders)
        |SELECT column_name, CAST(n_nulls AS BIGINT) AS n_nulls,
        |  CAST(n_distinct AS BIGINT) AS n_distinct, n_rows
        |FROM (
        |  SELECT 'o_orderkey' AS column_name, nulls_o_orderkey AS n_nulls, dist_o_orderkey AS n_distinct, n_rows FROM base
        |  UNION ALL SELECT 'o_custkey', nulls_o_custkey, dist_o_custkey, n_rows FROM base
        |  UNION ALL SELECT 'o_orderstatus', nulls_o_orderstatus, dist_o_orderstatus, n_rows FROM base
        |  UNION ALL SELECT 'o_orderpriority', nulls_o_orderpriority, dist_o_orderpriority, n_rows FROM base)
        |ORDER BY column_name""".stripMargin,
    "q_agg_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
        |  CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_agg_salted_skew" ->
      """SELECT event_type,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |  count(*) AS n
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    "q_agg_pivot" ->
      """SELECT o_orderstatus,
        |  count(*) FILTER (o_orderpriority = '1-URGENT') AS n_urgent,
        |  count(*) FILTER (o_orderpriority = '2-HIGH') AS n_high,
        |  count(*) FILTER (o_orderpriority = '3-MEDIUM') AS n_medium,
        |  count(*) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS n_notspec,
        |  count(*) FILTER (o_orderpriority = '5-LOW') AS n_low
        |FROM orders
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,
    "q_agg_percentiles" ->
      """SELECT l_returnflag,
        |  CAST(CAST(quantile_cont(l_quantity, 0.5) AS DECIMAL(18,4)) AS DOUBLE) AS median,
        |  CAST(CAST(quantile_cont(l_quantity, 0.25) AS DECIMAL(18,4)) AS DOUBLE) AS q1,
        |  CAST(CAST(quantile_cont(l_quantity, 0.9) AS DECIMAL(18,4)) AS DOUBLE) AS p90
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q_agg_stats" ->
      """WITH a AS (
        |  SELECT l_returnflag,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s1d,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s2d,
        |    count(*) AS n
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag,
        |  CAST(CAST((s2d - s1d * s1d / n) / n AS DECIMAL(18,6)) AS DOUBLE) AS var_pop,
        |  CAST(CAST(sqrt((s2d - s1d * s1d / n) / n) AS DECIMAL(18,6)) AS DOUBLE) AS stddev_pop,
        |  n
        |FROM a
        |ORDER BY l_returnflag""".stripMargin,
    "q_agg_distinct" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS n_parts,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q_agg_rollup" ->
      """SELECT n_name, o_orderpriority,
        |  count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  CAST(GROUPING(n_name, o_orderpriority) AS BIGINT) AS gid
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY ROLLUP(n_name, o_orderpriority)
        |ORDER BY gid, n_name NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "q_agg_cube" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
        |FROM orders
        |GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "q_agg_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q_agg_sort_first_last" ->
      """SELECT o_orderpriority,
        |  arg_min(o_orderkey, v) AS cheapest_order,
        |  arg_max(o_orderkey, v) AS priciest_order,
        |  CAST(min(price) AS DOUBLE) AS min_price,
        |  CAST(max(price) AS DOUBLE) AS max_price
        |FROM (SELECT o_orderpriority, o_orderkey,
        |        CAST(o_totalprice AS DECIMAL(18,2)) AS price,
        |        CAST(round(o_totalprice * 100) AS HUGEINT) * 1000000000000000000 + o_orderkey AS v
        |      FROM orders)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q_agg_sketch_quantile" ->
      """WITH t AS (
        |  SELECT l_returnflag, l_orderkey * 4096 + l_linenumber AS id,
        |    CAST(l_quantity AS DOUBLE) AS v
        |  FROM lineitem),
        |counts AS (SELECT l_returnflag, count(*) AS n FROM t GROUP BY l_returnflag),
        |h AS (SELECT l_returnflag, id, v,
        |  ((id % 1000003) * 2654435761) % 4294967296 AS h FROM t),
        |samp AS (SELECT l_returnflag, v,
        |  row_number() OVER (PARTITION BY l_returnflag ORDER BY h, id) AS rk FROM h),
        |keep AS (SELECT l_returnflag, v FROM samp WHERE rk <= 128),
        |ranked AS (SELECT l_returnflag, v,
        |  row_number() OVER (PARTITION BY l_returnflag ORDER BY v) AS vr,
        |  count(*) OVER (PARTITION BY l_returnflag) AS sn FROM keep)
        |SELECT c.l_returnflag AS l_returnflag, c.n AS n, r.v AS med_est
        |FROM ranked r JOIN counts c ON r.l_returnflag = c.l_returnflag
        |WHERE r.vr = CAST(floor((r.sn - 1) * 0.5) AS BIGINT) + 1
        |ORDER BY l_returnflag""".stripMargin,
    "q_udaf_weighted" ->
      // The weight sum is PAIRED exactly like WeightedAvg.reduce (a
      // row contributes its weight only when BOTH price and weight are
      // non-null): a bare sum(l_discount) also counts weights of
      // null-price rows, so a group whose only valid-pair discounts
      // are 0 but which carries a null-price/positive-discount row
      // would read 0.0 here vs the UDAF's honest NULL. Identical on
      // null-free data.
      """SELECT l_returnflag,
        |  CASE WHEN sum(CASE WHEN l_extendedprice IS NOT NULL
        |                     THEN CAST(l_discount AS DECIMAL(18,2)) END) = 0 THEN NULL ELSE
        |    CAST(CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
        |       / CAST(sum(CASE WHEN l_extendedprice IS NOT NULL
        |                       THEN CAST(l_discount AS DECIMAL(18,2)) END) AS DOUBLE) AS DECIMAL(18,6)) AS DOUBLE)
        |  END AS wavg_price
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin
  )
}
