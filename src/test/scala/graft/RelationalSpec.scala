package graft

import org.apache.spark.sql.functions._

/** M1 relational-core invariants (SURVEY §5.4/§5.6): cheap cross-query
  * algebra on the sf0.001 fixtures plus plan-shape assertions.
  */
class RelationalSpec extends SparkSpec {

  test("flagship pricing summary: 6 groups, counts sum to filtered rows") {
    val df = q("q_agg_pricing_summary").cache()
    assert(df.count() == 6)
    val total = df.agg(sum("count_order")).head.getLong(0)
    val expected = graft.sources.Tables.lineitem(spark, sf)
      .where(col("l_shipdate") <= lit("1998-09-02").cast("timestamp")).count()
    assert(total == expected)
  }

  test("quantile sketch: partition-layout independent, estimate near the true median") {
    val sk = org.apache.spark.sql.functions.udaf(new graft.functions.QuantileSketch(128, 0.5))
    val base = graft.sources.Tables.lineitem(spark, sf)
      .select(col("l_returnflag"),
        (col("l_orderkey") * 4096 + col("l_linenumber")).as("id"),
        col("l_quantity").cast("double").as("v"))
    def run(parts: Int) = base.repartition(parts)
      .groupBy("l_returnflag").agg(sk(col("id"), col("v")).as("est"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val one = run(1)
    // bottom-k is a set function: any partitioning must give the SAME
    // sample, hence the same estimate — the mergeability proof
    assert(run(13) == one && run(4) == one)
    // estimate's rank is near the true median rank (sample error band)
    one.foreach { case (flag, est) =>
      val vals = base.where(col("l_returnflag") === flag)
        .select("v").collect().map(_.getDouble(0)).sorted
      val rank = vals.count(_ <= est).toDouble / vals.length
      assert(rank > 0.3 && rank < 0.7, s"$flag: est=$est sits at rank $rank")
    }
  }

  test("custom HLL: within error bound, register merge is layout-independent") {
    val rows = q("q_agg_hll_custom").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (exact, est) = (r.getLong(1), r.getLong(2))
      assert(math.abs(est - exact).toDouble / exact < 0.05,
        s"${r.getString(0)}: est=$est exact=$exact")
    }
    // element-wise-max merge ⇒ any partitioning yields identical registers
    val hll = org.apache.spark.sql.functions.udaf(new graft.functions.HllSketch)
    val ev = graft.sources.Tables.events(spark, sf)
    def run(parts: Int) = ev.repartition(parts)
      .groupBy("event_type").agg(hll(col("user_id")).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(run(1) == run(17) && run(1) == run(3))
  }

  test("dpp: fact scan carries a dynamic partition filter, values match filter semantics") {
    val df = q("q_scan_dpp")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"fact scan must be pruned by a runtime partition subquery, got:\n$plan")
    // join-on-distinct-keys ≡ plain filter on the fact
    val expected = graft.sources.Tables.orders(spark, sf)
      .where(substring(col("o_orderpriority"), 1, 1) === "1")
      .groupBy("o_orderpriority").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("semi + anti partition customer set per predicate") {
    val c = graft.sources.Tables.customer(spark, sf).count()
    val urgentCusts = q("q_join_anti").count()
    val withUrgent = graft.sources.Tables.customer(spark, sf)
      .join(graft.sources.Tables.orders(spark, sf).where(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_semi").count()
    assert(urgentCusts + withUrgent == c)
  }

  test("except keys == anti keys (distinct customer keys without urgent orders)") {
    val e = q("q_set_except").collect().map(_.getLong(0)).toSet
    val a = q("q_join_anti").collect().map(_.getLong(0)).toSet
    assert(e == a)
  }

  test("top-k is the prefix of the full sort") {
    val full = graft.sources.Tables.lineitem(spark, sf)
      .orderBy(desc("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
      .limit(20).select("l_orderkey", "l_linenumber")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    val topk = q("q_sort_limit_topk").collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(topk == full)
  }

  test("union all count = sum of branch counts") {
    val e = graft.sources.Tables.events(spark, sf)
    val expected = e.where(col("event_type") === "click").count() +
      e.where(col("value") > 400).count()
    assert(q("q_set_union_all").count() == expected)
  }

  test("asof: click_ts <= p_ts and user has an earlier-or-equal click") {
    val df = q("q_join_asof")
    assert(df.where(col("click_ts") > col("p_ts")).count() == 0)
    assert(df.count() == graft.sources.Tables.events(spark, sf)
      .where(col("event_type") === "purchase").count())
  }

  test("approx distinct within 10% of exact") {
    q("q_agg_approx_hll").collect().foreach { r =>
      val approx = r.getLong(1).toDouble
      val exact = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact < 0.10, s"approx=$approx exact=$exact")
    }
  }

  test("scan pruning pushes predicates and reads a narrow schema") {
    val plan = q("q_scan_pruned").queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: ["), plan)
    assert(plan.contains("l_quantity"), plan)
    // projection+filter columns only — price columns must not be read
    assert(!plan.contains("l_extendedprice"), plan)
  }

  test("partitioned write round-trip prunes partitions at planning time") {
    val plan = q("q_write_partitioned").queryExecution.executedPlan.toString
    // the priority predicate must be a partition filter on the scan —
    // directory pruning, not a row-level data filter
    assert(plan.contains("PartitionFilters: [isnotnull(o_orderpriority"), plan)
  }

  test("broadcast join plans a BroadcastHashJoin; merge hint plans SortMergeJoin") {
    val b = q("q_join_broadcast").queryExecution.executedPlan.toString
    assert(b.contains("BroadcastHashJoin"), b)
    val m = q("q_join_sortmerge").queryExecution.executedPlan.toString
    assert(m.contains("SortMergeJoin"), m)
  }

  test("outer join: customers without orders have zero-decimal totals") {
    val df = q("q_join_outer")
    assert(df.where(col("n_orders") === 0 && col("total_spent") =!= 0).count() == 0)
  }

  test("rollup row count = detail + per-nation subtotals + grand total") {
    val detail = q("q_agg_rollup").where(col("gid") === 0).count()
    val nations = q("q_agg_rollup").where(col("gid") === 1).count()
    val grand = q("q_agg_rollup").where(col("gid") === 3).count()
    assert(grand == 1 && nations == 25 && q("q_agg_rollup").count() == detail + nations + grand)
  }

  test("schema evolution: merged read conserves rows; pre-migration bucket = even keys") {
    val df = q("q_scan_schema_merge").cache()
    val orders = graft.sources.Tables.orders(spark, sf)
    assert(df.agg(sum("n")).head.getLong(0) == orders.count())
    val pre = df.where(col("status") === "<pre-migration>").agg(sum("n")).head.getLong(0)
    assert(pre == orders.where(col("o_orderkey") % 2 === 0).count())
  }
}
