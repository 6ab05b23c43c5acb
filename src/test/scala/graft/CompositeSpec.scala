package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Round-4 operator invariants: composite analytical queries (TPC-H
  * Q3/Q5 shapes), bloom-prefiltered join, SCD-2 merge, snapshot diff,
  * sequence packing, deterministic reservoir, as-of tolerance.
  */
class CompositeSpec extends SparkSpec {

  test("tpch_q3: top-10 cut, revenue strictly ordered, orders are BUILDING-segment") {
    val df = q("q_tpch_q3").cache()
    assert(df.count() <= 10)
    val revs = df.select("revenue").collect().map(_.getDouble(0))
    assert(revs.sameElements(revs.sortBy(-_)), "revenue must be descending")
  }

  test("tpch_q5: same-nation constraint holds — every revenue row is an ASIA nation") {
    val df = q("q_tpch_q5").cache()
    val asia = Tables.nation(spark, sf)
      .join(Tables.region(spark, sf).where(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_name").collect().map(_.getString(0)).toSet
    assert(df.select("n_name").collect().map(_.getString(0)).forall(asia))
  }

  test("bloom prefilter is lossless: equals the plain semi-join aggregate") {
    val plain = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf).where(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey")),
        col("o_custkey") === col("c_custkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .orderBy("o_orderpriority")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val got = q("q_join_bloom").select("o_orderpriority", "n")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.sameElements(plain))
  }

  test("scd2: exactly one current row per key; closed rows carry valid_to") {
    val df = q("q_merge_scd2").cache()
    val perKey = df.groupBy("c_custkey")
      .agg(sum(when(col("is_current"), 1).otherwise(0)).as("cur"))
    assert(perKey.where(col("cur") =!= 1).count() == 0)
    assert(df.where(!col("is_current") && col("valid_to").isNull).count() == 0)
    assert(df.where(col("is_current") && col("valid_to").isNotNull).count() == 0)
    // total rows = dim size + update-feed size
    val nCust = Tables.customer(spark, sf).count()
    val nUpd = Tables.customer(spark, sf).where(col("c_acctbal") > 5000).count()
    assert(df.count() == nCust + nUpd)
  }

  test("snapshot diff: classes are exhaustive and carry the right null sides") {
    val df = q("q_snapshot_diff").cache()
    assert(df.where(!col("change_type").isin("insert", "delete", "update")).count() == 0)
    assert(df.where(col("change_type") === "insert" && col("old_price").isNotNull).count() == 0)
    assert(df.where(col("change_type") === "delete" && col("new_price").isNotNull).count() == 0)
    assert(df.where(col("change_type") === "update" &&
      (col("old_price").isNull || col("new_price").isNull ||
        col("old_price") === col("new_price"))).count() == 0)
  }

  test("snapshot diff: a value→NULL transition is an UPDATE, never silently 'same'") {
    // The contract query derives both generations from ONE source, so
    // it can never produce a one-sided NULL — but the library surface
    // can (a column nulled between snapshots IS a change, often the
    // data-loss a diff exists to catch). The naive `p1 =!= p2` is NULL
    // when either side is NULL and falls through to 'same': the
    // transition silently vanishes from the delta. Null-safe compare:
    // one-sided NULL = update, both-NULL = same.
    import spark.implicits._
    val g1 = Seq((1L, Some("10.00")), (2L, Some("20.00")),
                 (3L, None), (4L, None))
      .toDF("k1", "s1").select(col("k1"), col("s1").cast("decimal(18,2)").as("p1"))
    val g2 = Seq((1L, Some("10.00")), (2L, None),
                 (3L, Some("30.00")), (4L, None))
      .toDF("k2", "s2").select(col("k2"), col("s2").cast("decimal(18,2)").as("p2"))
    val got = graft.operators.Merge.diffImpl(g1, g2).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(2L -> "update", 3L -> "update"),
      s"value↔NULL transitions must be updates, both-NULL must be same: $got")
  }

  test("snapshot diff: a NULL-key orphan classifies by SIDE, never by key nullness") {
    // A NULL key carries no identity: it can never MATCH (the equi
    // join is null-rejecting by design — a <=> key would cross-pair
    // every NULL-key row of gen1 with every NULL-key row of gen2).
    // But classification must key on SIDE PRESENCE, not key nullness:
    // under the naive `when(k1.isNull, "insert")` a gen1 NULL-key
    // orphan — a DELETE-side row — reads "insert" with a fabricated
    // arrival story. Contract: gen1 NULL-key = delete (old_price
    // kept), gen2 NULL-key = insert (new_price kept), both with an
    // honest NULL o_orderkey; real keys bit-identical either way.
    import spark.implicits._
    val g1 = Seq((Option(1L), Some("10.00")), (Option(2L), Some("20.00")),
                 (Option.empty[Long], Some("77.00")))
      .toDF("k1", "s1").select(col("k1"), col("s1").cast("decimal(18,2)").as("p1"))
    val g2 = Seq((Option(1L), Some("10.00")), (Option(2L), Some("25.00")),
                 (Option.empty[Long], Some("88.00")))
      .toDF("k2", "s2").select(col("k2"), col("s2").cast("decimal(18,2)").as("p2"))
    val rows = graft.operators.Merge.diffImpl(g1, g2).collect()
    val nullKey = rows.filter(_.isNullAt(0))
      .map(r => (r.getString(1),
        if (r.isNullAt(2)) null else r.getDouble(2),
        if (r.isNullAt(3)) null else r.getDouble(3))).toSet
    assert(nullKey == Set(("delete", 77.0, null), ("insert", null, 88.0)),
      s"NULL-key orphans must classify by side with their own value: ${nullKey}")
    val keyed = rows.filterNot(_.isNullAt(0))
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(keyed == Map(2L -> "update"), s"real keys must be untouched: $keyed")
  }

  test("pack_chunks: docs conserved, chunk ids non-negative and start-offset consistent") {
    val df = q("q_pack_chunks").cache()
    assert(df.agg(sum("n_docs")).head.getLong(0) ==
      Tables.documents(spark, sf).count())
    assert(df.where(col("chunk_id") < 0).count() == 0)
    // token mass is conserved per language
    val fromDocs = Tables.documents(spark, sf)
      .select(col("lang"), size(split(col("text"), " ")).cast("long").as("tok"))
      .groupBy("lang").agg(sum("tok").as("t"))
    val fromChunks = df.groupBy("lang").agg(sum("sum_tokens").as("t2"))
    assert(fromDocs.join(fromChunks, "lang")
      .where(col("t") =!= col("t2")).count() == 0)
  }

  test("reservoir: at most k per language, a subset of the corpus, stable across runs") {
    val a = q("q_sample_reservoir").collect()
    val b = q("q_sample_reservoir").collect()
    assert(a.sameElements(b), "hash-based sample must be run-stable")
    val perLang = q("q_sample_reservoir").groupBy("lang").count()
    assert(perLang.where(col("count") > 10).count() == 0)
  }

  test("reservoir: billion-scale doc_ids do not overflow the sampling hash") {
    // `doc_id * 2654435761` raw passes 2^63 once doc_id > ~3.47e9 — a
    // plausible 100 TB doc count — and ANSI mode (the Spark 4 default)
    // throws mid-job; non-ANSI wraps and silently reorders the sample.
    // The mod-first form must return, and must still agree with the raw
    // formula computed in overflow-free arithmetic (BigInt reference).
    val dir = java.nio.file.Files.createTempDirectory("corpus_bigid").toString
    try {
      import spark.implicits._
      // 25 ids in one lang so the k=10 SELECTION depends on the hash
      val ids = Seq(3470000000L, 5000000000L, Long.MaxValue / 48271,
        Long.MaxValue - 1L, 7L) ++ (1 to 20).map(i => 4000000000L + 137L * i)
      ids.map(i => (i, s"text $i", "en", "synth", 7L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val got = SparkEntry.queries("q_sample_reservoir")(spark, dir)
        .select(col("doc_id")).collect().map(_.getLong(0)).toSeq
      // which 10 survive is decided by the hash — pin the selection
      // against the RAW formula computed overflow-free in BigInt
      val expected = ids.sortBy(i =>
        ((BigInt(i) * BigInt(2654435761L) + 12345) mod BigInt(1000003L), BigInt(i)))
        .take(10).sorted
      assert(got == expected,
        s"mod-first hash diverged from the overflow-free raw formula: $got vs $expected")
    } finally SessionToken.deleteDir(dir)
  }

  test("banded range join equals the naive theta join and plans as an equi join") {
    val e = Tables.events(spark, sf)
    val naive = e.where(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("ts").as("p_ts"))
      .join(e.where(col("event_type") === "signup")
        .select(col("event_id").as("s_id"), col("ts").as("s_ts")),
        col("s_ts") >= col("p_ts") - expr("INTERVAL 10 MINUTES") &&
          col("s_ts") <= col("p_ts") + expr("INTERVAL 10 MINUTES"))
      .select("p_id", "s_id", "p_ts", "s_ts")
    val banded = q("q_join_range_bin")
    assert(banded.count() == naive.count())
    assert(banded.exceptAll(naive).count() == 0 && naive.exceptAll(banded).count() == 0)
    val plan = banded.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      "banded range join must plan as an equi join:\n" + plan)
  }

  test("sql front door: spark.sql result equals the DataFrame formulation") {
    val one = lit(1).cast("decimal(18,2)")
    val viaDf = Tables.lineitem(spark, sf)
      .where(col("l_returnflag") === "R")
      .select(col("l_orderkey"),
        (col("l_extendedprice").cast("decimal(18,2)")
          * (one - col("l_discount").cast("decimal(18,2)"))).as("rev"))
      .join(Tables.orders(spark, sf)
        .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-04-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(spark, sf), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(sum(col("rev")).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
      .select("c_custkey", "c_name", "revenue", "n_name")
      .collect()
    val viaSql = q("q_sql_api").select("c_custkey", "c_name", "revenue", "n_name").collect()
    assert(viaSql.sameElements(viaDf))
  }

  test("knn graph: at most 3 edges per source, no self loops, edges stay in label blocks") {
    val df = q("q_knn_graph").cache()
    assert(df.where(col("src") === col("dst")).count() == 0)
    assert(df.groupBy("src").count().where(col("count") > 3).count() == 0)
    assert(df.where(col("rk") < 1 || col("rk") > 3).count() == 0)
    val labels = Tables.embeddings(spark, sf).select(col("vec_id"), col("label"))
    val crossBlock = df
      .join(labels.select(col("vec_id").as("src"), col("label").as("l1")), "src")
      .join(labels.select(col("vec_id").as("dst"), col("label").as("l2")), "dst")
      .where(col("l1") =!= col("l2"))
    assert(crossBlock.count() == 0)
  }

  test("lm score: log-probs negative, tokens conserved, common-token docs score higher") {
    val df = q("q_text_lm_score").cache()
    assert(df.where(col("lm_score") >= 0).count() == 0, "unigram log-probs must be < 0")
    val corpusToks = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("tok"))
      .where(col("tok") =!= "").count()
    assert(df.agg(sum("n_toks")).head.getLong(0) == corpusToks)
    // score is a mean of per-token log-probs: bounded below by ln(1/total)
    val lower = math.log(1.0 / corpusToks)
    assert(df.where(col("lm_score") < lower).count() == 0)
  }

  test("asof tolerance: every surviving match is within the hour; stale ones nulled") {
    val tol = q("q_join_asof_tol").cache()
    assert(tol.where(col("click_ts").isNotNull &&
      (col("click_ts") > col("p_ts") ||
        col("click_ts") < col("p_ts") - expr("interval 1 hour"))).count() == 0)
    // row set (purchases) identical to the boundless as-of
    assert(tol.count() == q("q_join_asof").count())
  }

  test("tpch q12/q14: line counts conserve the join; promo share is a percentage") {
    val q12 = q("q_tpch_q12").cache()
    val joined = graft.sources.Tables.lineitem(spark, sf).count()
    assert(q12.agg(sum(col("high_line_count") + col("low_line_count"))).head.getLong(0) == joined)
    val pct = q("q_tpch_q14").head.getDouble(0)
    assert(pct >= 0.0 && pct <= 100.0, s"promo pct $pct out of range")
  }

  test("new joins avoid nested loops; dims broadcast where expected") {
    // grid join: candidate generation must be a hash equi join, never a
    // cartesian/broadcast-nested-loop plan
    val grid = q("q_join_grid_2d").queryExecution.executedPlan.toString
    assert(!grid.contains("CartesianProduct") && !grid.contains("BroadcastNestedLoopJoin"),
      s"grid join planned a nested loop:\n$grid")
    // skyline: the frontier pair set comes back via a broadcast semi join
    val sky = q("q_skyline").queryExecution.executedPlan.toString
    assert(sky.contains("BroadcastHashJoin") && sky.contains("LeftSemi"),
      s"skyline lost its broadcast semi join:\n$sky")
    // q7: both nation dims broadcast
    val q7 = q("q_tpch_q7").queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(q7).size >= 2,
      s"q7 nation dims not broadcast:\n$q7")
  }

  test("tpch q13: distribution conserves customers and keeps the zero bucket") {
    val df = q("q_tpch_q13").cache()
    val customers = graft.sources.Tables.customer(spark, sf).count()
    assert(df.agg(sum("custdist")).head.getLong(0) == customers)
    // the zero bucket is exactly the customers with no orders
    val withOrders = graft.sources.Tables.orders(spark, sf)
      .select("o_custkey").distinct().count()
    val zero = df.where(col("c_count") === 0)
      .agg(coalesce(sum("custdist"), lit(0L))).head.getLong(0)
    assert(zero == customers - withOrders)
  }

  test("tpch q22: dormant slice excludes every 1997 orderer; multi-distinct bounded by rows") {
    val df = q("q_tpch_q22").cache()
    assert(df.count() > 0)
    val orders97 = graft.sources.Tables.orders(spark, sf)
      .where(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select(col("o_custkey")).distinct().count()
    val customers = graft.sources.Tables.customer(spark, sf).count()
    // the dormant set can never exceed customers minus the 1997 orderers
    assert(df.agg(sum("n_cust")).head.getLong(0) <= customers - orders97)
    val md = q("q_agg_multi_distinct").cache()
    assert(md.where(col("d_parts") > col("n_rows") || col("d_supps") > col("n_rows") ||
      col("d_orders") > col("n_rows")).count() == 0)
    // the Expand plan shape is actually used
    val plan = q("q_agg_multi_distinct").queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), s"multi-distinct lost its Expand plan:\n$plan")
  }

  test("tpch q15/q17: max-revenue winner verified; small-quantity slice bounded") {
    import graft.sources.Tables
    // q15: the reported supplier really has the maximum revenue
    val winners = q("q_tpch_q15").collect()
    assert(winners.nonEmpty)
    val revs = Tables.lineitem(spark, sf)
      .groupBy("l_suppkey")
      .agg(sum(graft.operators.dec("l_extendedprice") *
        (lit(1).cast("decimal(18,2)") - graft.operators.dec("l_discount"))).as("rev"))
    val mx = revs.agg(max("rev")).head.getDecimal(0)
    winners.foreach(r => assert(BigDecimal(r.getDouble(2)) == BigDecimal(mx.toString)
      || math.abs(r.getDouble(2) - mx.doubleValue()) < 1e-6))
    // q17: the small-quantity rows are a strict subset of the fact table
    val row = q("q_tpch_q17").head
    assert(row.getLong(0) > 0 && row.getLong(0) < Tables.lineitem(spark, sf).count())
  }

  test("tpch q7: cross-border only, ship years bound the window, flows are directed") {
    val df = q("q_tpch_q7").cache()
    assert(df.count() > 0)
    assert(df.where(col("supp_nation") === col("cust_nation")).count() == 0)
    assert(df.where(col("l_year") < 1995 || col("l_year") > 1996).count() == 0)
    // (supp, cust, year) is a key — directed flows never collapse
    assert(df.select("supp_nation", "cust_nation", "l_year").distinct().count() == df.count())
  }
}
