package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** §2.3 joins.
  *
  * Scale strategy per shape:
  *  - dimension joins broadcast the small side (no shuffle of the fact);
  *  - fact-fact joins shuffle both sides on the join key once (SMJ);
  *  - the theta/band join broadcasts the tiny band table under a
  *    nested-loop — never a fact×fact cartesian;
  *  - the as-of join is a single shuffle on the partition key + one
  *    window pass (union technique), NOT a join+filter explosion.
  */
object Joins {

  /** Fact⋈dim with an explicit broadcast hint: lineitem⋈part.
    *
    * The hint is the operator under test here (the plan spec asserts
    * BroadcastHashJoin). Scale note: part grows with SF, so on a real
    * 100 TB corpus the explicit hint belongs only on bounded dims
    * (nation/region-class); for SF-scaled dims drop the hint and let
    * AQE decide — q_join_multiway demonstrates that pattern.
    */
  def joinBroadcast(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val p = Tables.part(s, dir)
    li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(dbl(sum(dec("l_quantity"))).as("sum_qty"), count(lit(1)).as("n"))
      .orderBy("p_brand")
  }

  /** Fact⋈fact shuffled sort-merge (broadcast suppressed via merge hint). */
  def joinSortMerge(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).hint("merge")
    val o = Tables.orders(s, dir)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), dbl(sum(dec("l_extendedprice"))).as("sum_price"))
      .orderBy("o_orderpriority")
  }

  /** TPC-H Q5-shaped 4-way star join + region filter. The three
    * dimension hops (customer→nation→region) broadcast; only
    * lineitem⋈orders shuffles.
    */
  def joinMultiway(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    val n = Tables.nation(s, dir)
    val r = Tables.region(s, dir)
    // customer is NOT hinted: at sf100 it is ~15M rows (GBs) and a
    // forced broadcast would OOM the driver — AQE picks BHJ when it
    // actually fits, SMJ otherwise. nation/region stay broadcast.
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .where(col("r_name") === "ASIA")
      .groupBy(col("n_name"))
      .agg(dbl(sum(dec("l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec("l_discount"))))
        .as("revenue"))
      .orderBy("n_name")
  }

  /** Left-outer customer→orders with null-side aggregation. */
  def joinOuter(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        dbl(coalesce(sum(dec("o_totalprice")), lit(0).cast("decimal(38,2)"))).as("total_spent"))
      .orderBy("c_custkey")
  }

  /** Full-outer join of two per-user event slices (error vs purchase
    * counts) — genuine null sides both ways when a user has only one
    * of the two event types.
    */
  def joinFullOuter(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val errs = e.where(col("event_type") === "error")
      .groupBy(col("user_id").as("err_user")).agg(count(lit(1)).as("n_errors"))
    val purch = e.where(col("event_type") === "purchase")
      .groupBy(col("user_id").as("p_user")).agg(count(lit(1)).as("n_purchases"))
    errs.join(purch, errs("err_user") === purch("p_user"), "full_outer")
      .select(col("err_user"), col("p_user"), col("n_errors"), col("n_purchases"))
      .orderBy(asc_nulls_first("err_user"), asc_nulls_first("p_user"))
  }

  /** Customers WITH a big-ticket order (left semi ≡ EXISTS). */
  def joinSemi(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir).where(col("o_totalprice") > 400000)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy("c_custkey")
  }

  /** Customers WITHOUT any urgent order (left anti ≡ NOT EXISTS,
    * TPC-H Q22 flavor).
    */
  def joinAnti(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir).where(col("o_orderpriority") === "1-URGENT")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy("c_custkey")
  }

  /** Theta (non-equi) band join: parts bucketed into literal price
    * bands via `lo <= p < hi`. The band table is 4 rows → broadcast
    * nested loop, which is the correct 100 TB plan for tiny-side theta.
    */
  def joinThetaRange(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val p = Tables.part(s, dir)
    val bands = Seq(
      (900.0, 925.0, "b0"), (925.0, 950.0, "b1"),
      (950.0, 975.0, "b2"), (975.0, 1000.0, "b3")
    ).toDF("lo", "hi", "band")
    p.join(broadcast(bands), col("p_retailprice") >= col("lo") && col("p_retailprice") < col("hi"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_parts"), dbl(sum(dec("p_retailprice"))).as("sum_price"))
      .orderBy("band")
  }

  /** Interval join: repeat orders by the same customer within 30 days.
    * Equi on custkey + date-range predicate → shuffles once on the
    * customer key; per-key fanout is bounded by orders-per-customer.
    */
  def joinInterval(s: SparkSession, dir: String): DataFrame = {
    val o1 = Tables.orders(s, dir).select(
      col("o_custkey").as("custkey"), col("o_orderkey").as("first_order"),
      col("o_orderdate").as("first_date"))
    val o2 = Tables.orders(s, dir).select(
      col("o_custkey").as("custkey2"), col("o_orderkey").as("next_order"),
      col("o_orderdate").as("next_date"))
    o1.join(o2,
        col("custkey") === col("custkey2")
          && col("next_date") >= col("first_date")
          && col("next_date") < col("first_date") + expr("INTERVAL 30 DAYS")
          && col("first_order") < col("next_order"))
      .select(col("custkey"), col("first_order"), col("next_order"))
      .orderBy("custkey", "first_order", "next_order")
  }

  /** §2.13 (round-4) bin-banded range join: purchase×signup pairs
    * within ±10 minutes GLOBALLY — no equi key exists, so a naive plan
    * is a broadcast-nested-loop/cartesian theta join, O(|A|·|B|).
    * The banding trick (the same recipe behind production range-join
    * optimizations): bucket time into interval-width bins; a probe row
    * explodes into its bin ±1, the build row keeps its own bin, and
    * every true pair is guaranteed to meet on exactly one bin key —
    * a plain shuffled equi join (3× one side, never quadratic) — then
    * the exact predicate filters the band's false candidates. Each
    * true pair meets exactly once, so no dedup is needed.
    */
  def joinRangeBin(s: SparkSession, dir: String): DataFrame = {
    val winUs = 600L * 1000000L // 10 minutes, in µs
    val e = Tables.events(s, dir)
    val a = e.where(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("ts").as("p_ts"),
        expr(s"unix_micros(ts) div $winUs").as("bin"))
    val b = e.where(col("event_type") === "signup")
      .select(col("event_id").as("s_id"), col("ts").as("s_ts"),
        expr(s"unix_micros(ts) div $winUs").as("sbin"))
      .select(col("s_id"), col("s_ts"),
        explode(array(col("sbin") - 1, col("sbin"), col("sbin") + 1)).as("bin"))
    a.join(b, Seq("bin"))
      .where(col("s_ts") >= col("p_ts") - expr("INTERVAL 10 MINUTES")
        && col("s_ts") <= col("p_ts") + expr("INTERVAL 10 MINUTES"))
      .select(col("p_id"), col("s_id"), col("p_ts"), col("s_ts"))
      .orderBy("p_id", "s_id")
  }

  /** As-of (backward) join: for each purchase event, the latest click
    * by the same user at-or-before its timestamp.
    *
    * Implementation is the union-window technique: tag click rows,
    * sort each user partition once by (ts, event_id), and carry the
    * last non-null click ts forward. One shuffle on user_id, no join
    * explosion — the plan that survives 100 TB (a join+row_number
    * variant would rescan every click per purchase).
    */
  def joinAsof(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .where(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
    // clicks sort before purchases at equal ts: the as-of predicate is
    // p.ts >= c.ts (inclusive), so a click sharing a purchase's
    // timestamp must already be visible in the running last-click.
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"),
        when(col("event_type") === "click", 0).otherwise(1),
        col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.withColumn("click_ts",
        last(when(col("event_type") === "click", col("ts")), ignoreNulls = true).over(w))
      .where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts").as("p_ts"), col("click_ts"))
      .orderBy("event_id")
  }

  /** Same as-of semantics through the NATIVE custom operator
    * (graft.plans.AsOfJoin: logical node + strategy + co-partitioned
    * sort-merge exec) — one shuffle per side, O(n+m) merge per
    * partition. Oracle: DuckDB's native ASOF LEFT JOIN, and
    * AsOfSpec asserts equality with the window-technique q_join_asof.
    */
  def joinAsofCustom(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val purchases = e.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts").as("p_ts"))
    val clicks = e.where(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
    graft.plans.AsOf.join(purchases, clicks, "user_id", "c_user", "p_ts", "c_ts")
      .select(col("event_id"), col("user_id"), col("p_ts"), col("c_ts").as("click_ts"))
      .orderBy("event_id")
  }

  /** §2.13 (round-4) as-of join with tolerance: a purchase matches its
    * latest preceding click only when the click is within 1 hour —
    * stale matches become NULL (the point-in-time-correct attribution
    * semantics; a boundless as-of silently attributes to arbitrarily
    * old events). Same single-window dataflow as q_join_asof — the
    * tolerance is a post-projection on the already-found match, zero
    * extra exchanges.
    */
  def joinAsofTol(s: SparkSession, dir: String): DataFrame =
    joinAsof(s, dir)
      .withColumn("click_ts",
        when(col("click_ts") >= col("p_ts") - expr("interval 1 hour"), col("click_ts")))
      .orderBy("event_id")

  /** Bucketed co-located join: both sides written bucketBy(8) +
    * sortBy on the join key, then sort-merge joined with ZERO shuffle
    * exchanges — the pre-partitioned layout a recurring 100 TB
    * fact-fact join wants (pay the shuffle once at write time, never
    * per query). BucketingSpec asserts the exchange-free plan; the
    * oracle checks the result equals the plain join.
    *
    * Bench note: in a one-shot session (the driver's bench) the FIRST
    * invocation prices the bucketed-layout write itself — that is the
    * "pay the shuffle once" cost landing inside the first timed window
    * (observed ~4-5.7s vs ~1.3s steady; the memo makes every later
    * call exchange-free). Deliberate: amortizing the layout write is
    * the operator's whole point, and hiding it in warmup would
    * under-price the first real use.
    */
  // bucketed layout is written once per (session, sfDir) — repeated
  // query construction (PlanAudit, specs) must not rewrite the tables
  // or leak another temp copy. Keyed on sessionUUID (stable, unique —
  // identityHashCode can alias after GC), and the catalog table names
  // carry the key hash: with fixed global names, running dir A then
  // dir B would overwrite A's tables while A's memo entry still
  // pointed at them — silently wrong data on the next dir-A call.
  private val bucketedReady = scala.collection.concurrent.TrieMap.empty[(String, String), (String, String, String)]

  def joinBucketed(s: SparkSession, dir: String): DataFrame = {
    // evict entries of dead (GC'd) sessions: drop their catalog tables via
    // the shared external catalog and reclaim the temp dirs, so a
    // long-lived JVM cycling sessions does not accumulate stale copies
    graft.SessionToken.sweep(bucketedReady) { case (o, c, tmp) =>
      try { s.sql(s"DROP TABLE IF EXISTS $o"); s.sql(s"DROP TABLE IF EXISTS $c") }
      catch { case _: Exception => () }
      graft.SessionToken.deleteDir(tmp)
    }
    val (ordersTbl, custTbl, _) = bucketedReady.getOrElseUpdate((graft.SessionToken(s), dir), {
      val suffix = java.lang.Integer.toHexString(
        scala.util.hashing.MurmurHash3.stringHash(graft.SessionToken(s) + "|" + dir))
      val (o, c) = (s"orders_bkt_$suffix", s"customer_bkt_$suffix")
      val tmp = java.nio.file.Files.createTempDirectory("graft_bkt").toString
      // repartition(8, key) uses the same Murmur3 HashPartitioning as
      // bucketBy(8, key), so each write task holds exactly one bucket
      // → 8 files per table instead of tasks×buckets (256 at
      // local[32]) — the standard small-files guard for bucketed
      // layouts; at warehouse scale the same move bounds file count
      // by bucket count, not cluster width.
      // write only the columns the co-located join consumes: bucketed
      // layouts are per-workload projections, and the narrower write
      // is exactly what a real "pay the shuffle once" layout would do
      Tables.orders(s, dir).select(col("o_custkey"), col("o_totalprice"))
        .repartition(8, col("o_custkey"))
        .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
        .option("path", s"$tmp/orders").mode("overwrite").saveAsTable(o)
      Tables.customer(s, dir).select(col("c_custkey"), col("c_mktsegment"))
        .repartition(8, col("c_custkey"))
        .write.bucketBy(8, "c_custkey").sortBy("c_custkey")
        .option("path", s"$tmp/customer").mode("overwrite").saveAsTable(c)
      (o, c, tmp)
    })
    s.table(custTbl).hint("merge")
      .join(s.table(ordersTbl), col("c_custkey") === col("o_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), dbl(sum(dec("o_totalprice"))).as("total"))
      .orderBy("c_mktsegment")
  }

  /** Tiny cross product: region × nation. */
  def joinCross(s: SparkSession, dir: String): DataFrame =
    Tables.region(s, dir).crossJoin(Tables.nation(s, dir))
      .select(col("r_name"), col("n_name"))
      .orderBy("r_name", "n_name")

  /** Salted skew join: when one join key is hot enough to overflow a
    * reducer (and AQE skew splitting isn't available or the build side
    * must shuffle too), split each key across SALTS sub-partitions —
    * the probe side gets a deterministic salt, the build side is
    * exploded ×SALTS so every (key, salt) pair still meets. The result
    * is provably identical to the unsalted join (the oracle IS the
    * unsalted join); the price is SALTS× the small side, which is why
    * salting applies to dim-sized or pre-filtered build sides.
    */
  def joinSalted(s: SparkSession, dir: String): DataFrame = {
    val SALTS = 8
    val o = Tables.orders(s, dir)
      .withColumn("salt", pmod(col("o_orderkey"), lit(SALTS)).cast("int"))
    val c = Tables.customer(s, dir)
      .withColumn("salt", explode(array((0 until SALTS).map(lit): _*)))
    o.join(c, o("o_custkey") === c("c_custkey") && o("salt") === c("salt"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), dbl(sum(dec("o_totalprice"))).as("total"))
      .orderBy("c_mktsegment")
  }

  /** Lateral (correlated table-function) join: top-2 customers by
    * account balance per nation, the "top-N per outer row" shape SQL
    * expresses as a LATERAL subquery with LIMIT. Catalyst decorrelates
    * it into a window + filter, so despite the nested-loop syntax the
    * physical plan is one shuffle on the correlation key — asserted in
    * the spec. View names are (session, dir)-scoped so concurrent
    * sessions/dirs never read each other's registration.
    */
  def joinLateral(s: SparkSession, dir: String): DataFrame = {
    val h = java.lang.Integer.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(graft.SessionToken(s) + "|" + dir))
    val (nv, cv) = (s"nation_lat_$h", s"customer_lat_$h")
    Tables.nation(s, dir).createOrReplaceTempView(nv)
    Tables.customer(s, dir).createOrReplaceTempView(cv)
    s.sql(
      s"""SELECT n.n_name, t.c_custkey,
         |  CAST(CAST(t.c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS acctbal
         |FROM $nv n,
         |LATERAL (
         |  SELECT c_custkey, c_acctbal FROM $cv c
         |  WHERE c.c_nationkey = n.n_nationkey
         |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
         |ORDER BY n.n_name, acctbal DESC, t.c_custkey""".stripMargin)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_join_broadcast" -> joinBroadcast,
    "q_join_sortmerge" -> joinSortMerge,
    "q_join_multiway" -> joinMultiway,
    "q_join_outer" -> joinOuter,
    "q_join_full_outer" -> joinFullOuter,
    "q_join_semi" -> joinSemi,
    "q_join_anti" -> joinAnti,
    "q_join_theta_range" -> joinThetaRange,
    "q_join_interval" -> joinInterval,
    "q_join_asof" -> joinAsof,
    "q_join_asof_custom" -> joinAsofCustom,
    "q_join_asof_tol" -> joinAsofTol,
    "q_join_range_bin" -> joinRangeBin,
    "q_join_bucketed" -> joinBucketed,
    "q_join_cross" -> joinCross,
    "q_join_salted" -> joinSalted,
    "q_join_lateral" -> joinLateral
  )

  val oracle: Map[String, String] = Map(
    "q_join_salted" ->
      """SELECT c_mktsegment, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    "q_join_lateral" ->
      """SELECT n.n_name, t.c_custkey,
        |  CAST(CAST(t.c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS acctbal
        |FROM nation n,
        |LATERAL (
        |  SELECT c_custkey, c_acctbal FROM customer c
        |  WHERE c.c_nationkey = n.n_nationkey
        |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
        |ORDER BY n.n_name, acctbal DESC, t.c_custkey""".stripMargin,
    "q_join_broadcast" ->
      """SELECT p_brand,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  count(*) AS n
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin,
    "q_join_sortmerge" ->
      """SELECT o_orderpriority,
        |  count(*) AS n,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q_join_multiway" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin,
    "q_join_outer" ->
      """SELECT c_custkey, c_name,
        |  count(o_orderkey) AS n_orders,
        |  CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(18,2))), CAST(0 AS DECIMAL(38,2))) AS DOUBLE) AS total_spent
        |FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey, c_name
        |ORDER BY c_custkey""".stripMargin,
    "q_join_full_outer" ->
      """SELECT err_user, p_user, n_errors, n_purchases
        |FROM (SELECT user_id AS err_user, count(*) AS n_errors
        |      FROM events WHERE event_type = 'error' GROUP BY user_id) e
        |FULL OUTER JOIN
        |     (SELECT user_id AS p_user, count(*) AS n_purchases
        |      FROM events WHERE event_type = 'purchase' GROUP BY user_id) p
        |ON err_user = p_user
        |ORDER BY err_user NULLS FIRST, p_user NULLS FIRST""".stripMargin,
    "q_join_semi" ->
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer SEMI JOIN (SELECT * FROM orders WHERE o_totalprice > 400000) o
        |  ON c_custkey = o_custkey
        |ORDER BY c_custkey""".stripMargin,
    "q_join_anti" ->
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer ANTI JOIN (SELECT * FROM orders WHERE o_orderpriority = '1-URGENT') o
        |  ON c_custkey = o_custkey
        |ORDER BY c_custkey""".stripMargin,
    "q_join_theta_range" ->
      """SELECT band,
        |  count(*) AS n_parts,
        |  CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM part
        |JOIN (VALUES (900.0, 925.0, 'b0'), (925.0, 950.0, 'b1'),
        |             (950.0, 975.0, 'b2'), (975.0, 1000.0, 'b3')) AS b(lo, hi, band)
        |  ON p_retailprice >= lo AND p_retailprice < hi
        |GROUP BY band
        |ORDER BY band""".stripMargin,
    "q_join_interval" ->
      """SELECT o1.o_custkey AS custkey, o1.o_orderkey AS first_order, o2.o_orderkey AS next_order
        |FROM orders o1 JOIN orders o2
        |  ON o1.o_custkey = o2.o_custkey
        | AND o2.o_orderdate >= o1.o_orderdate
        | AND o2.o_orderdate < o1.o_orderdate + INTERVAL 30 DAY
        | AND o1.o_orderkey < o2.o_orderkey
        |ORDER BY custkey, first_order, next_order""".stripMargin,
    "q_join_asof" ->
      """SELECT p.event_id, p.user_id,
        |  CAST(p.ts AS TIMESTAMP) AS p_ts,
        |  CAST(c.ts AS TIMESTAMP) AS click_ts
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY p.event_id""".stripMargin,
    "q_join_range_bin" ->
      """SELECT a.event_id AS p_id, b.event_id AS s_id,
        |  CAST(a.ts AS TIMESTAMP) AS p_ts, CAST(b.ts AS TIMESTAMP) AS s_ts
        |FROM events a JOIN events b
        |  ON CAST(b.ts AS TIMESTAMP) >= CAST(a.ts AS TIMESTAMP) - INTERVAL 10 MINUTE
        | AND CAST(b.ts AS TIMESTAMP) <= CAST(a.ts AS TIMESTAMP) + INTERVAL 10 MINUTE
        |WHERE a.event_type = 'purchase' AND b.event_type = 'signup'
        |ORDER BY p_id, s_id""".stripMargin,
    "q_join_asof_tol" ->
      """SELECT p.event_id, p.user_id,
        |  CAST(p.ts AS TIMESTAMP) AS p_ts,
        |  CASE WHEN CAST(c.ts AS TIMESTAMP) >= CAST(p.ts AS TIMESTAMP) - INTERVAL 1 HOUR
        |       THEN CAST(c.ts AS TIMESTAMP) END AS click_ts
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY p.event_id""".stripMargin,
    "q_join_asof_custom" ->
      """SELECT p.event_id, p.user_id,
        |  CAST(p.ts AS TIMESTAMP) AS p_ts,
        |  CAST(c.ts AS TIMESTAMP) AS click_ts
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY p.event_id""".stripMargin,
    "q_join_bucketed" ->
      """SELECT c_mktsegment, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    "q_join_cross" ->
      """SELECT r_name, n_name
        |FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin
  )
}
