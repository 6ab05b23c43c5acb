package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.plans.AsOf

/** Native as-of join operator (graft.plans.AsOfJoin). */
class AsOfSpec extends SparkSpec {
  import spark.implicits._

  test("custom as-of equals the window-technique implementation on fixtures") {
    val custom = q("q_join_asof_custom")
    val window = q("q_join_asof")
      .select(col("event_id"), col("user_id"), col("p_ts"), col("click_ts"))
    assert(custom.count() == window.count())
    assert(custom.exceptAll(window).count() == 0 && window.exceptAll(custom).count() == 0)
  }

  test("physical plan uses AsOfJoinExec with shuffles on the key") {
    val plan = q("q_join_asof_custom").queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
    assert(plan.contains("hashpartitioning(user_id"), plan)
  }

  test("handcrafted: backward match, tie-at-equal-ts, and no-match → nulls") {
    def ts(s: String) = Timestamp.valueOf(s)
    val lefts = Seq(
      (1L, 100L, ts("2024-01-01 10:00:00")),
      (2L, 100L, ts("2024-01-01 12:00:00")),
      (3L, 200L, ts("2024-01-01 09:00:00"))  // key with no right rows at-or-before
    ).toDF("id", "k", "t")
    val rights = Seq(
      (100L, ts("2024-01-01 09:30:00"), "a"),
      (100L, ts("2024-01-01 12:00:00"), "b"), // equal ts → eligible (<=)
      (200L, ts("2024-01-01 09:30:00"), "late"),
      (999L, ts("2024-01-01 00:00:00"), "other-key")
    ).toDF("rk", "rt", "tag")
    val out = AsOf.join(lefts, rights, "k", "rk", "t", "rt")
      .select(col("id"), col("tag")).orderBy("id").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, null)))
  }

  test("null keys/timestamps never match (no unboxing to key 0 / epoch 0)") {
    def ts(s: String) = Timestamp.valueOf(s)
    val lefts = Seq(
      (1L, Some(0L), Some(ts("2024-01-01 10:00:00"))), // key 0 — a real key
      (2L, None, Some(ts("2024-01-01 10:00:00"))),     // null key → null match
      (3L, Some(100L), None)                           // null ts → null match
    ).toDF("id", "k", "t")
    val rights = Seq(
      (Some(0L), Some(ts("2024-01-01 09:00:00")), "zero-key"),
      (None: Option[Long], Some(ts("2024-01-01 09:00:00")), "null-key"),
      (Some(100L), None: Option[Timestamp], "null-ts")
    ).toDF("rk", "rt", "tag")
    val out = AsOf.join(lefts, rights, "k", "rk", "t", "rt")
      .select(col("id"), col("tag")).orderBy("id").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "zero-key"), (2L, null), (3L, null)))
  }

  test("missing column name raises a clear error") {
    val df = Seq((1L, 2L)).toDF("a", "b")
    val e = intercept[IllegalArgumentException](AsOf.join(df, df, "nope", "a", "b", "b"))
    assert(e.getMessage.contains("nope"))
  }

  test("non-long key/ts types fail at plan build with the column named, not executor-side") {
    val longs = Seq((1L, 2L)).toDF("k", "t")
    val ints = Seq((1, 2)).toDF("k", "t") // int columns — would CCE mid-merge
    val ek = intercept[IllegalArgumentException](AsOf.join(ints, longs, "k", "k", "t", "t"))
    assert(ek.getMessage.contains("'k'") && ek.getMessage.contains("int"),
      s"key-type error must name the column and type: ${ek.getMessage}")
    val strTs = Seq((1L, "x")).toDF("k", "t")
    val et = intercept[IllegalArgumentException](AsOf.join(longs, strTs, "k", "k", "t", "t"))
    assert(et.getMessage.contains("'t'") && et.getMessage.contains("string"))
    // long-backed inputs still plan fine (timestamp covered by every other test)
    assert(AsOf.join(longs, longs, "k", "k", "t", "t").count() == 1)
  }

  test("self-join: AsOf.join(df, df, ...) dedups the shared attribute ids") {
    // both sides the SAME analyzed plan — without right-side re-aliasing
    // this dies mid-execution with INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND
    val df = Seq((1L, 10L, 100L), (2L, 10L, 200L), (3L, 20L, 150L))
      .toDF("id", "k", "t")
    val out = AsOf.join(df, df, "k", "k", "t", "t")
    assert(out.columns.toSeq == Seq("id", "k", "t", "id", "k", "t"))
    // every row's latest at-or-before partner with its own key is ITSELF
    // for the earliest row per key, and the later row sees both
    val pairs = out.collect().map(r => (r.getLong(0), r.getLong(3))).toSet
    assert(pairs == Set((1L, 1L), (2L, 2L), (3L, 3L)),
      s"self as-of must match each row to its own latest-at-or-before: $pairs")
  }

  test("native as-of equals a driver-side brute force on tie-heavy random streams") {
    // a 50-second clock over 8 users forces heavy ts collisions — exactly
    // equal left/right timestamps (inclusive boundary), multiple eligible
    // candidates per left row, and users with no history. Right-side
    // (user, ts) pairs are generated unique so "latest at-or-before" has
    // ONE well-defined answer the merge must find regardless of partition
    // or sort order.
    val rnd = new scala.util.Random(13)
    val base = 1700000000L
    (1 to 3).foreach { trial =>
      def t(sec: Long) = new Timestamp(sec * 1000L)
      val lefts = (1 to 60).map(i =>
        (i.toLong, (1 + rnd.nextInt(8)).toLong, t(base + rnd.nextInt(50))))
      val rights = rnd.shuffle((1 to 120).map(_ =>
        ((1 + rnd.nextInt(8)).toLong, base + rnd.nextInt(50).toLong)))
        .distinct.zipWithIndex
        .map { case ((u, sec), i) => (u, t(sec), s"tag$i") }
      val out = AsOf.join(
          lefts.toDF("id", "k", "t"), rights.toDF("rk", "rt", "tag"),
          "k", "rk", "t", "rt")
        .select(col("id"), col("tag")).collect()
        .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      val want = lefts.map { case (id, k, ts) =>
        val eligible = rights.filter(r => r._1 == k && !r._2.after(ts))
        id -> (if (eligible.isEmpty) None
               else Some(eligible.maxBy(_._2.getTime)._3))
      }.toMap
      assert(want.values.exists(_.isDefined) && want.values.exists(_.isEmpty),
        s"trial $trial must contain both matches and no-history rows")
      assert(out == want, s"trial $trial: native as-of diverged from brute force")
    }
  }

  test("output partitioning survives: groupBy on the as-of key adds NO third shuffle") {
    def ts(s: String) = Timestamp.valueOf(s)
    val lefts = (1 to 40).map(i => (i.toLong, (i % 5).toLong, ts("2024-01-01 10:00:00")))
      .toDF("id", "k", "t")
    val rights = (0 until 5).map(u => (u.toLong, ts("2024-01-01 09:00:00"), s"u$u"))
      .toDF("rk", "rt", "tag")
    val agg = AsOf.join(lefts, rights, "k", "rk", "t", "rt")
      .groupBy(col("k")).agg(count(lit(1)).as("n"))
    val plan = agg.queryExecution.executedPlan.toString
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    // two child exchanges only — AsOfJoinExec declares the left child's
    // hash partitioning as its own, so the aggregation reuses it; a
    // third exchange here means the override regressed and every
    // downstream keyed op re-shuffles the join output
    assert(shuffles == 2, s"expected 2 exchanges (children only), got $shuffles:\n$plan")
    // and the answer is still right
    val got = agg.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (0 until 5).map(u => u.toLong -> 8L).toMap)
  }
}
