package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Round-3 operator invariants: analytics (islands/resample/retention/
  * zscore/argmin/sampling/PII), compaction (LWW/generations), salted +
  * lateral joins, and connected-components clustering.
  */
class AnalyticsSpec extends SparkSpec {

  test("islands: run lengths partition the orders table, runs don't overlap") {
    val df = q("q_win_islands").cache()
    assert(df.agg(sum("run_len")).head.getLong(0) ==
      Tables.orders(spark, sf).count())
    // within a customer, islands ordered by id have non-overlapping date ranges
    assert(df.where(col("run_start") > col("run_end")).count() == 0)
    val overlaps = df.as("a").join(df.as("b"),
      col("a.o_custkey") === col("b.o_custkey") &&
        col("a.island") < col("b.island") && col("a.run_end") > col("b.run_start"))
    assert(overlaps.count() == 0)
  }

  test("resample: dense daily calendar per user, forward fill leaves no gaps") {
    val df = q("q_ts_resample").cache()
    assert(df.where(col("filled_sum").isNull).count() == 0)
    // each user's row count == span days (dense calendar)
    val spans = df.groupBy("user_id")
      .agg(count(lit(1)).as("n"), (datediff(max("day"), min("day")) + 1).as("expect"))
    assert(spans.where(col("n") =!= col("expect")).count() == 0)
    // gap days carry the previous observed sum: day_sum null => filled from past
    assert(df.where(col("day_sum").isNotNull && col("day_sum") =!= col("filled_sum")).count() == 0)
  }

  test("retention: offset-0 cell equals cohort size, users conserved") {
    val df = q("q_retention_cohort").cache()
    val week0 = df.where(col("week_offset") === 0)
      .agg(sum("n_users")).head.getLong(0)
    assert(week0 == Tables.events(spark, sf).select("user_id").distinct().count())
    assert(df.where(col("week_offset") < 0).count() == 0)
  }

  test("zscore: flagged rows exceed threshold and are rare") {
    val df = q("q_anomaly_zscore").cache()
    assert(df.where(abs(col("z")) <= 2.5).count() == 0)
    val total = Tables.events(spark, sf).count()
    assert(df.count() < total / 10) // tail of the distribution, not the bulk
  }

  test("argmin: struct-min equals per-group scalar min; keys belong to group") {
    val df = q("q_agg_argmin").cache()
    val direct = Tables.orders(spark, sf).groupBy("o_orderpriority")
      .agg(graft.operators.dbl(min(graft.operators.dec("o_totalprice"))).as("mp"))
    val joined = df.join(direct, "o_orderpriority")
    assert(joined.where(col("min_price") =!= col("mp")).count() == 0)
    val back = df.join(Tables.orders(spark, sf),
      col("min_orderkey") === col("o_orderkey"))
    assert(back.where(graft.operators.dbl(graft.operators.dec("o_totalprice"))
      =!= col("min_price")).count() == 0)
  }

  test("stratified sample: rates respected per stratum") {
    val df = q("q_sample_stratified").cache()
    val perLang = df.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = Tables.documents(spark, sf).groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    perLang.foreach { case (lang, n) =>
      val rate = lang match { case "en" => 0.50; case "zh" => 0.10; case _ => 0.20 }
      val frac = n.toDouble / totals(lang)
      assert(math.abs(frac - rate) < 0.15, s"$lang sampled at $frac, wanted ~$rate")
    }
    // deterministic: same query twice gives identical ids
    assert(q("q_sample_stratified").collect().toSeq ==
      q("q_sample_stratified").collect().toSeq)
  }

  test("pii redaction scrubs every email and phone") {
    val df = q("q_text_pii_redact").cache()
    assert(df.where(col("redacted").contains("@")).count() == 0)
    assert(df.where(col("redacted").rlike("555-[0-9]")).count() == 0)
    assert(df.where(!col("had_pii")).count() == 0) // every synthesized row had PII
    assert(df.count() == Tables.customer(spark, sf).count())
  }

  test("compact: LWW winner matches window formulation, tombstones dropped") {
    val df = q("q_snapshot_compact").cache()
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id")
      .orderBy(desc("ts"), desc("event_id"))
    val expect = Tables.events(spark, sf)
      .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .where(col("event_type") =!= "error")
    assert(df.count() == expect.count())
    val j = df.join(expect, df("last_event_id") === expect("event_id"))
    assert(j.count() == df.count()) // same winning writes
    // tombstoned users absent
    val tombstoned = Tables.events(spark, sf)
      .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .where(col("event_type") === "error").select(col("user_id"))
    assert(df.join(tombstoned, Seq("user_id"), "left_semi").count() == 0)
  }

  test("merge: delta keys show gen-1 repriced rows, others untouched") {
    val df = q("q_snapshot_merge").cache()
    assert(df.count() == Tables.orders(spark, sf).count())
    assert(df.where(pmod(col("o_orderkey"), lit(3)) === 0 && col("gen") =!= 1).count() == 0)
    assert(df.where(pmod(col("o_orderkey"), lit(3)) =!= 0 && col("gen") =!= 0).count() == 0)
    assert(df.where(col("gen") === 1 && col("status") =!= "R").count() == 0)
  }

  test("salted join result is identical to the plain join") {
    val plain = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"),
        graft.operators.dbl(sum(graft.operators.dec("o_totalprice"))).as("total"))
      .orderBy("c_mktsegment").collect().toSeq
    assert(q("q_join_salted").collect().toSeq == plain)
  }

  test("lateral: top-2 per nation, decorrelated to a group-limit plan") {
    val df = q("q_join_lateral").cache()
    val perNation = df.groupBy("n_name").count()
    assert(perNation.where(col("count") > 2).count() == 0)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), "expected decorrelated top-k plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), "lateral must not stay a nested loop")
  }

  test("inverted index: df counts postings, head is the sorted prefix") {
    val df = q("q_text_inverted_index").cache()
    // sum(df) == total distinct (doc, term) pairs in the corpus
    val pairs = Tables.documents(spark, sf)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .where(col("term") =!= "").distinct().count()
    assert(df.agg(sum("df")).head.getLong(0) == pairs)
    // postings head: |head| = min(df, 20), starts at first_doc, sorted asc;
    // when df <= 20 the head is complete and ends at last_doc
    val shaped = df.withColumn("head", split(col("postings_head"), ",").cast("array<bigint>"))
    assert(shaped.where(size(col("head")) =!= least(col("df"), lit(20L))).count() == 0)
    assert(shaped.where(element_at(col("head"), 1) =!= col("first_doc")).count() == 0)
    assert(shaped.where(col("head") =!= array_sort(col("head"))).count() == 0)
    assert(shaped.where(col("df") <= 20 &&
      element_at(col("head"), -1) =!= col("last_doc")).count() == 0)
  }

  test("bm25: scores positive, monotone in tf for fixed dl, hits bounded") {
    val df = q("q_text_bm25").cache()
    // only docs containing >= 1 query term appear, every score > 0
    assert(df.where(col("bm25") <= 0).count() == 0)
    assert(df.where(col("n_terms") > 3 || col("n_terms") < 1).count() == 0)
    assert(df.where(col("n_hits") < col("n_terms")).count() == 0)
    // output is sorted by score desc (ties broken by doc_id)
    val scores = df.select("bm25").collect().map(_.getDouble(0)).toSeq
    assert(scores == scores.sorted(Ordering[Double].reverse))
    // saturation: every per-term contribution < idf * (k1 + 1) implies
    // total < 3 * ln(1 + N) * 2.2 — a loose but real upper bound
    val n = graft.sources.Tables.documents(spark, sf).count().toDouble
    assert(df.agg(max("bm25")).head.getDouble(0) < 3 * math.log(1 + n) * 2.2)
  }

  test("clusters: labels constant across every edge, rep is member min") {
    val df = q("q_dedup_clusters").cache()
    val docs = Tables.documents(spark, sf).where(col("doc_id") < 1000)
      .select(col("doc_id"), col("lang"), col("n_chars"))
    assert(df.count() == docs.count())
    // every edge endpoint pair shares a cluster
    val lbl = df
    val a = docs.join(lbl, "doc_id")
      .select(col("lang"), col("n_chars"), col("cluster").as("ca"), col("doc_id").as("ida"))
    val b = docs.join(lbl, "doc_id")
      .select(col("lang").as("lang_b"), col("n_chars").as("nc_b"),
        col("cluster").as("cb"), col("doc_id").as("idb"))
    val crossEdges = a.join(b,
      col("lang") === col("lang_b") && col("ida") =!= col("idb") &&
        abs(col("n_chars") - col("nc_b")) <= 1 && col("ca") =!= col("cb"))
    assert(crossEdges.count() == 0, "an edge crosses two clusters")
    // representative is the minimum member id and is itself a member
    val reps = df.groupBy("cluster").agg(min("doc_id").as("min_id"))
    assert(reps.where(col("cluster") =!= col("min_id")).count() == 0)
  }

  test("sort_first_last: orderkeys past the composition spacing cannot invert winners") {
    // the pre-r16 rank value was `cents * 1e7 + orderkey`; once an
    // orderkey exceeds 1e7 its tiebreak term outgrows a 1-cent price
    // step and min_by/max_by SILENTLY return the wrong order (TPC-H
    // sf100 orderkeys reach 6e11). Pin the discriminating pair: the
    // 99.99 order with a 2e7 key must beat the 100.00 order with key 1.
    val dir = java.nio.file.Files.createTempDirectory("agg_bigkey").toString
    try {
      import spark.implicits._
      val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
      Seq(
        (1L, 1L, "O", 100.00, ts, "1-URGENT"),
        (20000000L, 2L, "O", 99.99, ts, "1-URGENT"),
        (30000000L, 3L, "O", 250.00, ts, "1-URGENT"))
        .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderdate", "o_orderpriority")
        .write.mode("overwrite").parquet(s"$dir/orders.parquet")
      val row = SparkEntry.queries("q_agg_sort_first_last")(spark, dir).head()
      assert(row.getLong(row.fieldIndex("cheapest_order")) == 20000000L,
        s"cheapest must be the 99.99 order regardless of its key magnitude: $row")
      assert(row.getLong(row.fieldIndex("priciest_order")) == 30000000L, s"$row")
      assert(row.getDouble(row.fieldIndex("min_price")) == 99.99)
      assert(row.getDouble(row.fieldIndex("max_price")) == 250.00)
    } finally SessionToken.deleteDir(dir)
  }
}
