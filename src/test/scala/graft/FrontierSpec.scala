package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Round-4 session-3 operator invariants: Pareto skyline (window
  * algorithm ≡ quadratic definition), per-group mode, PMI
  * collocations, and the count-min sketch (overcount bound, partition
  * layout independence, exact grid replay).
  */
class FrontierSpec extends SparkSpec {

  test("skyline: running-max algorithm equals the quadratic dominance definition") {
    val fast = q("q_skyline").cache()
    val part = Tables.part(spark, sf)
      .select("p_partkey", "p_name", "p_retailprice", "p_size")
    // naive: a point survives iff no dominator exists (the oracle's shape)
    val dominated = part.as("a").join(part.as("b"),
      col("b.p_retailprice") <= col("a.p_retailprice") &&
        col("b.p_size") >= col("a.p_size") &&
        (col("b.p_retailprice") < col("a.p_retailprice") ||
          col("b.p_size") > col("a.p_size")), "left_semi")
    val naive = part.except(dominated)
    assert(fast.count() > 0)
    assert(fast.except(naive).count() == 0 && naive.except(fast).count() == 0)
    // no skyline point dominates another (mutual non-dominance)
    val inner = fast.as("a").join(fast.as("b"),
      col("b.p_retailprice") <= col("a.p_retailprice") &&
        col("b.p_size") >= col("a.p_size") &&
        (col("b.p_retailprice") < col("a.p_retailprice") ||
          col("b.p_size") > col("a.p_size")))
    assert(inner.count() == 0)
  }

  test("mode: reported count is the segment max; customers conserved") {
    val df = q("q_agg_mode").cache()
    val cnts = Tables.customer(spark, sf)
      .groupBy("c_mktsegment", "c_nationkey").agg(count(lit(1)).as("cnt"))
    val maxes = cnts.groupBy("c_mktsegment").agg(max("cnt").as("mx"))
    assert(df.join(maxes, "c_mktsegment")
      .where(col("mode_cnt") =!= col("mx")).count() == 0)
    assert(df.agg(sum("n_customers")).head.getLong(0) ==
      Tables.customer(spark, sf).count())
    // the reported nation really has that count in that segment
    assert(df.join(cnts,
      df("c_mktsegment") === cnts("c_mktsegment") &&
        df("mode_nation") === cnts("c_nationkey") &&
        df("mode_cnt") === cnts("cnt"), "left_anti").count() == 0)
  }

  test("collocations: top-20 cut is totally ordered, counts clear the floor") {
    val rows = q("q_text_collocations").collect()
    assert(rows.length > 0 && rows.length <= 20)
    assert(rows.forall(_.getLong(1) >= 3))
    // (pmi desc, bigram asc) is a strict total order — engine-deterministic
    val keys = rows.map(r => (-r.getDouble(2), r.getString(0)))
    assert(keys.sameElements(keys.sorted))
    assert(keys.distinct.length == keys.length)
  }

  test("countmin: estimates never undercount and replay the exact grid") {
    val df = q("q_agg_countmin").cache()
    assert(df.count() > 0)
    assert(df.where(col("est_cnt") < col("exact_cnt")).count() == 0)
    // replay: est = min over rows j of (sum of counts of keys sharing bucket j)
    import graft.functions.CountMin
    val counts = Tables.events(spark, sf)
      .groupBy("user_id").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = counts.map { case (u, _) =>
      u -> (0 until CountMin.D).map { j =>
        val b = CountMin.bucket(j, u)
        counts.collect { case (v, c) if CountMin.bucket(j, v) == b => c }.sum
      }.min
    }
    df.collect().foreach { r =>
      assert(r.getLong(2) == expected(r.getLong(0)),
        s"user ${r.getLong(0)}: est ${r.getLong(2)} != replay ${expected(r.getLong(0))}")
    }
  }

  test("corr: coefficients lie in [-1, 1] and match a driver-side exact replay") {
    val rows = q("q_agg_corr").collect()
    assert(rows.nonEmpty)
    // replay with exact BigDecimal moments per group
    val data = Tables.lineitem(spark, sf)
      .select("l_returnflag", "l_quantity", "l_extendedprice").collect()
      .groupBy(_.getString(0))
    rows.foreach { r =>
      val c = r.getDouble(2)
      assert(c >= -1.0 && c <= 1.0, s"${r.getString(0)}: corr $c out of range")
      val g = data(r.getString(0))
      def d2(v: Double) = BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)
      val n = g.length.toDouble
      val (sx, sy, sxy, sxx, syy) = g.foldLeft((BigDecimal(0), BigDecimal(0),
        BigDecimal(0), BigDecimal(0), BigDecimal(0))) { case ((a, b, ab, aa, bb), row) =>
        val (x, y) = (d2(row.getDouble(1)), d2(row.getDouble(2)))
        (a + x, b + y, ab + x * y, aa + x * x, bb + y * y)
      }
      val expect = BigDecimal(
        (n * sxy.toDouble - sx.toDouble * sy.toDouble) /
          (math.sqrt(n * sxx.toDouble - sx.toDouble * sx.toDouble) *
            math.sqrt(n * syy.toDouble - sy.toDouble * sy.toDouble)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(c == expect, s"${r.getString(0)}: engine $c != replay $expect")
    }
  }

  test("mad: flagged deviations exceed 3*mad; median is a group element") {
    val df = q("q_anomaly_mad").cache()
    assert(df.count() > 0)
    assert(df.where(abs(col("value") - col("med")) <= lit(3.0) * col("mad")).count() == 0)
    // med really occurs as a value of its group
    val ev = Tables.events(spark, sf).select("event_type", "value")
    assert(df.select("event_type", "med").distinct()
      .join(ev, df("event_type") === ev("event_type") && col("med") === col("value"), "left_anti")
      .count() == 0)
  }

  test("grid join: banded equi-join equals the quadratic theta join") {
    val fast = q("q_join_grid_2d")
    val part = Tables.part(spark, sf)
      .select("p_partkey", "p_brand", "p_size", "p_retailprice")
    val naive = part.as("a").join(part.as("b"),
        col("a.p_partkey") < col("b.p_partkey") &&
          abs(col("a.p_size") - col("b.p_size")) <= 1 &&
          abs(col("a.p_retailprice") - col("b.p_retailprice")) <= 10.0)
      .groupBy(col("a.p_brand").as("p_brand"))
      .agg(count(lit(1)).as("n_pairs"))
    assert(fast.count() > 0)
    assert(fast.except(naive).count() == 0 && naive.except(fast).count() == 0)
  }

  test("bitmap distinct: equals countDistinct; OR-merge is duplicate-proof and layout-free") {
    val bm = udaf(new graft.functions.BitmapDistinct)
    val ev = Tables.events(spark, sf).select("event_type", "user_id")
    val exact = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("want"))
    val got = q("q_agg_bitmap_distinct")
    assert(got.join(exact, "event_type")
      .where(col("n_users") =!= col("want")).count() == 0)
    // idempotence: delivering every row twice must not change the count
    val doubled = ev.unionAll(ev).repartition(7)
      .groupBy("event_type").agg(bm(col("user_id")).as("n2"))
    assert(got.join(doubled, "event_type")
      .where(col("n_users") =!= col("n2")).count() == 0)
    // layout independence
    val one = ev.repartition(1)
      .groupBy("event_type").agg(bm(col("user_id")).as("n1"))
    assert(got.join(one, "event_type")
      .where(col("n_users") =!= col("n1")).count() == 0)
  }

  test("label prop: labels only decrease, communities conserve nodes, roots are self-labeled") {
    val df = q("q_graph_label_prop").cache()
    assert(df.count() > 0)
    val labels = df.select("label").collect().map(_.getLong(0))
    assert(labels.distinct.length == labels.length)
    // node conservation: sum of community sizes == node count of the graph
    val li = Tables.lineitem(spark, sf)
      .where(pmod(col("l_orderkey"), lit(5)) === 0)
      .select(col("l_orderkey"), col("l_partkey"))
    val nodes = li.as("a").join(li.as("b"), Seq("l_orderkey"))
      .where(col("a.l_partkey") =!= col("b.l_partkey"))
      .select(col("a.l_partkey").as("id")).distinct().count()
    assert(df.agg(sum("n_nodes")).head.getLong(0) == nodes)
    // each label is itself one of the graph's node ids
    val nodeSet = li.as("a").join(li.as("b"), Seq("l_orderkey"))
      .where(col("a.l_partkey") =!= col("b.l_partkey"))
      .select(col("a.l_partkey").as("id")).distinct()
    assert(df.join(nodeSet, df("label") === nodeSet("id"), "left_anti").count() == 0)
  }

  test("rolling slope: every order emits a row; short/degenerate windows are NULL") {
    val df = q("q_win_rolling_slope").cache()
    assert(df.count() == Tables.orders(spark, sf).count())
    // windows shorter than 3 rows must be NULL
    assert(df.where(col("n") < 3 && col("slope").isNotNull).count() == 0)
    assert(df.where(col("n") > 5).count() == 0) // trailing frame capped at 5 rows
  }

  test("entropy: bounded by ln(n_types), positive for diverse corpora") {
    val rows = q("q_agg_entropy").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (types, h) = (r.getLong(2), r.getDouble(3))
      assert(h >= 0.0 && h <= math.log(types.toDouble) + 1e-6,
        s"${r.getString(0)}: H=$h outside [0, ln($types)]")
    }
  }

  test("gini: coefficients in [0,1); uniform values give gini ~ 0") {
    val rows = q("q_agg_gini").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val g = r.getDouble(2)
      assert(g >= 0.0 && g < 1.0, s"${r.getString(0)}: gini $g out of range")
    }
    // constant distribution → (2*Σi*x - (n+1)*n*x) / (n*n*x) = 0
    import spark.implicits._
    val const = Seq.tabulate(100)(i => (i.toLong, "S", BigDecimal(10.00)))
      .toDF("o_orderkey", "c_mktsegment", "x")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("c_mktsegment")).orderBy(col("x"), col("o_orderkey"))
    val g0 = const.withColumn("i", row_number().over(w))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("i").cast("long") * col("x")).as("sixi"))
      .select(((lit(2.0) * col("sixi").cast("double") - (col("n") + 1) * col("sx").cast("double")) /
        (col("n") * col("sx").cast("double"))).as("gini"))
      .head.getDouble(0)
    assert(math.abs(g0) < 1e-12)
  }

  test("edit distance: banded top-20 equals the unblocked exhaustive top-20") {
    val fast = q("q_dedup_edit_distance").collect()
    assert(fast.length > 0)
    val d = Tables.documents(spark, sf).where(col("doc_id") < 1000)
      .select("doc_id", "lang", "n_chars", "text")
    val naive = d.as("a").join(d.as("b"),
        col("a.lang") === col("b.lang") && col("a.doc_id") < col("b.doc_id") &&
          abs(col("a.n_chars") - col("b.n_chars")) <= 1)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"), col("a.lang"),
        levenshtein(col("a.text"), col("b.text")).as("edit_dist"))
      .orderBy(col("edit_dist"), col("doc_a"), col("doc_b")).limit(20).collect()
    assert(fast.map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSeq ==
      naive.map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSeq)
  }

  test("sessionize: sessions partition events; adjacent sessions separated by >30min") {
    val df = q("q_win_sessionize").cache()
    assert(df.agg(sum("n_events")).head.getLong(0) ==
      Tables.events(spark, sf).count())
    assert(df.where(col("duration_us") < 0).count() == 0)
    // next session's start is > previous session's end + 30 minutes
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("session_id")
    val gaps = df
      .withColumn("end_us", unix_micros(col("sess_start")) + col("duration_us"))
      .withColumn("prev_end", lag(col("end_us"), 1).over(w))
      .where(col("prev_end").isNotNull &&
        unix_micros(col("sess_start")) - col("prev_end") <= 1800000000L)
    assert(gaps.count() == 0)
  }

  test("rolling DAU: explode formulation equals the naive range join") {
    val fast = q("q_win_rolling_dau")
    val ud = Tables.events(spark, sf)
      .select(date_trunc("DAY", col("ts")).as("uday"), col("user_id")).distinct()
    val days = ud.select(col("uday").as("day")).distinct()
    val naive = days.join(ud,
        col("uday") <= col("day") && col("uday") >= col("day") - expr("interval 6 days"))
      .groupBy("day").agg(countDistinct("user_id").as("dau7"))
    assert(fast.count() > 0)
    assert(fast.except(naive).count() == 0 && naive.except(fast).count() == 0)
    // rolling distinct can never be below the single-day distinct
    val daily = ud.groupBy(col("uday").as("day")).agg(countDistinct("user_id").as("d1"))
    assert(fast.join(daily, "day").where(col("dau7") < col("d1")).count() == 0)
  }

  test("running distinct: per-user final value equals the true distinct count; never decreases") {
    val df = q("q_win_running_distinct").cache()
    val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
    val finals = df.withColumn("mx", max("n_types_seen").over(w))
    val truth = Tables.events(spark, sf)
      .groupBy("user_id").agg(countDistinct("event_type").as("want"))
    assert(finals.select("user_id", "mx").distinct()
      .join(truth, "user_id").where(col("mx") =!= col("want")).count() == 0)
    assert(df.where(col("n_types_seen") < 1).count() == 0)
  }

  test("hll union: re-aggregated estimate is BIT-EQUAL to the direct sketch; error bounded") {
    val rows = q("q_agg_hll_union").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2),
        s"${r.getString(0)}: reagg ${r.getLong(1)} != direct ${r.getLong(2)}")
      val (est, exact) = (r.getLong(1).toDouble, r.getLong(3).toDouble)
      assert(math.abs(est - exact) / exact <= 0.05,
        s"${r.getString(0)}: est $est vs exact $exact > 5%")
    }
  }

  test("basket lift: pair support bounded by singles; top lift replays exactly") {
    val rows = q("q_basket_lift").collect()
    assert(rows.length > 0 && rows.length <= 20)
    val li = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val orders = li.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val singles = li.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val n = orders.size.toDouble
    rows.foreach { r =>
      val (pa, pb, ab) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(pa < pb)
      assert(ab <= math.min(singles(pa), singles(pb)))
      val abTrue = orders.valuesIterator.count(s => s.contains(pa) && s.contains(pb)).toLong
      assert(ab == abTrue, s"pair ($pa,$pb): support $ab != replay $abTrue")
      val expect = BigDecimal((ab.toDouble * n) / (singles(pa).toDouble * singles(pb).toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(3) == expect, s"pair ($pa,$pb): lift ${r.getDouble(3)} != $expect")
    }
  }

  test("interval overlap: rank-count decomposition equals the quadratic overlap join") {
    val fast = q("q_join_interval_overlap")
    def side(prefix: String) = Tables.part(spark, sf)
      .where(col("p_brand").startsWith(prefix))
      .select(col("p_brand"), col("p_retailprice").as("lo"),
        (col("p_retailprice") + col("p_size")).as("hi"))
    val naive = side("Brand#1").as("a").join(side("Brand#2").as("b"),
        col("a.lo") <= col("b.hi") && col("b.lo") <= col("a.hi"))
      .groupBy(col("a.p_brand").as("brand_a"), col("b.p_brand").as("brand_b"))
      .agg(count(lit(1)).as("n_overlaps"))
    assert(fast.count() > 0)
    assert(fast.except(naive).count() == 0 && naive.except(fast).count() == 0)
  }

  test("interval overlap plan shape: pruned scans, no cartesian, only the bounded scalar-frame BNLJ") {
    // The r19 rank-count rewrite's efficiency claims, pinned to the
    // plan. The r6 banded enumeration was Ω(true pairs) and the r19
    // fixture regen made overlaps DENSE (p_retailprice domain collapsed
    // to [900,1000) — ~half of all cross-brand pairs overlap, ~50 M
    // candidates at sf0.1, measured 27-70 s). The rewrite never
    // enumerates pairs: per-brand rank queries via quantile buckets +
    // cumulative windows. What the plan must show: (a) every part scan
    // column-pruned to ≤3 fields with the brand prefix pushed, (b) NO
    // CartesianProduct anywhere, (c) the ONLY nested-loop joins are
    // the two 1-row collected-bounds broadcasts (the documented
    // scalar-frame class — broadcast side bounded by the brand count),
    // (d) the cumulative rank windows are present (the operator's core
    // is window work, not a join product).
    val plan = q("q_join_interval_overlap").queryExecution.executedPlan.toString
    val scans = "FileScan parquet".r.findAllIn(plan).size
    assert(scans >= 4, s"expected the part slices to scan, got $scans:\n$plan")
    val pushed = "StringStartsWith\\(p_brand,Brand#[12]\\)".r.findAllIn(plan).size
    assert(pushed == scans,
      s"brand prefix filter pushed on $pushed of $scans part scans:\n$plan")
    // every part scan reads ≤3 columns (brand + price ± size) — a
    // 100 TB part table scanned unpruned would read ~2× the bytes
    val schemas = "ReadSchema: struct<([^>]*)>".r.findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(schemas.size == scans && schemas.forall(_.split(",").length <= 3),
      s"an interval-overlap scan lost column pruning:\n${schemas.mkString("\n")}")
    assert(!plan.contains("CartesianProduct"), s"cartesian product planned:\n$plan")
    assert("BroadcastNestedLoopJoin".r.findAllIn(plan).size == 2,
      s"expected exactly the two 1-row bounds-broadcast BNLJs:\n$plan")
    assert("Window".r.findAllIn(plan).size >= 4,
      s"expected the rank windows (2 cumulative + 2 bucket-prefix):\n$plan")
  }

  test("bitmap two-level: per-day registers OR-merged equal the direct exact count") {
    val regs = udaf(new graft.functions.BitmapRegisters)
    val uni = udaf(new graft.functions.BitmapUnion)
    val ev = Tables.events(spark, sf)
    val twoLevel = ev
      .groupBy(col("event_type"), date_trunc("DAY", col("ts")).as("day"))
      .agg(regs(col("user_id")).as("bits"))
      .groupBy("event_type").agg(uni(col("bits")).as("n2"))
    val direct = ev.groupBy("event_type")
      .agg(countDistinct("user_id").as("n1"))
    assert(twoLevel.join(direct, "event_type")
      .where(col("n2") =!= col("n1")).count() == 0)
  }

  test("sketch aggregators on empty input: zero counts, empty grids, no throw") {
    import spark.implicits._
    val empty = Seq.empty[Long].toDF("user_id")
    val cms = udaf(new graft.functions.CountMin)
    val bm = udaf(new graft.functions.BitmapDistinct)
    import graft.functions.CountMin.{D, W}
    val grid = empty.agg(cms(col("user_id"))).head.getSeq[Long](0)
    assert(grid.length == D * W && grid.forall(_ == 0L))
    assert(empty.agg(bm(col("user_id"))).head.getLong(0) == 0L)
    // grouped empty input produces zero groups, not null rows
    assert(empty.groupBy(col("user_id")).agg(bm(col("user_id"))).count() == 0)
  }

  test("remaining typed aggregators on empty input: defined values, no throw") {
    // At 1000 executors empty partitions are routine; every Aggregator's
    // zero() must finish to a DEFINED value. CountMin/BitmapDistinct are
    // pinned above — this covers the other four.
    import spark.implicits._
    val emptyIds = Seq.empty[Long].toDF("user_id")
    val hll = udaf(new graft.functions.HllSketch)
    assert(emptyIds.agg(hll(col("user_id"))).head.getLong(0) == 0L,
      "HLL of nothing must estimate 0 (all-zero registers → linear counting)")
    val qs = udaf(new graft.functions.QuantileSketch(128, 0.5))
    assert(emptyIds.agg(qs(col("user_id").cast("double"))).head.isNullAt(0),
      "quantile of nothing must be NULL, like percentile()")
    val wavg = udaf(graft.functions.WeightedAvg)
    val emptyPw = Seq.empty[(java.math.BigDecimal, java.math.BigDecimal)].toDF("p", "w")
    assert(emptyPw.agg(wavg(col("p"), col("w"))).head.isNullAt(0),
      "weighted avg of nothing must be NULL (zero weight), like avg()")
    // the two-level HLL path: re-aggregating ZERO register sketches
    // must union to the empty estimate, not throw on a missing buffer
    val regs = udaf(new graft.functions.HllRegisters)
    val uni = udaf(new graft.functions.HllUnion)
    val twoLevel = emptyIds.agg(regs(col("user_id")).as("r"))
      .agg(uni(col("r")))
    assert(twoLevel.head.getLong(0) == 0L,
      "union over an empty-input register sketch must estimate 0")
  }

  test("union re-aggregators: NULL stored sketch skipped, truncated register blob rejected loudly (r19)") {
    // A per-shard sketch table at 100 TB WILL contain null cells — an
    // outer join against a shard dimension, a missing partition, a
    // not-yet-backfilled day. SQL aggregate semantics: a null input
    // contributes nothing. Pre-fix, one null stored sketch NPE-killed
    // the whole re-aggregation (reference-typed Aggregator inputs are
    // NOT null-skipped — the r18 lesson, one level up).
    val ev = Tables.events(spark, sf)
    val hregs = udaf(new graft.functions.HllRegisters)
    val huni = udaf(new graft.functions.HllUnion)
    val perDay = ev.groupBy(date_trunc("DAY", col("ts")).as("day"))
      .agg(hregs(col("user_id")).as("r")).cache()
    val clean = perDay.agg(huni(col("r"))).head.getLong(0)
    val withNull = perDay.unionByName(
      perDay.limit(1).select(col("day"), lit(null).cast("binary").as("r")))
    assert(withNull.agg(huni(col("r"))).head.getLong(0) == clean,
      "a NULL stored HLL sketch must contribute nothing to the union")
    // a TRUNCATED register blob is corrupt state, not missing state:
    // silently skipping would hide data loss, and unguarded merging
    // dies as an opaque ArrayIndexOutOfBounds — the contract is a loud
    // require NAMING the corruption
    val corrupt = perDay.select(expr("substring(r, 1, 100)").as("r"))
    val e = intercept[Exception](corrupt.agg(huni(col("r"))).collect())
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8).map(
        x => Option(x.getMessage).getOrElse("")).toSeq
    assert(chain(e).exists(_.contains("corrupt HLL register blob")),
      s"truncated blob must fail NAMED, got: ${chain(e).mkString(" | ")}")
    // bitmap union: null cells skip the same way; SHORTER arrays are
    // NOT corruption there (the bitmap grows on demand — any prefix is
    // a valid state) and must keep merging fine
    val bregs = udaf(new graft.functions.BitmapRegisters)
    val buni = udaf(new graft.functions.BitmapUnion)
    val perDayB = ev.groupBy(date_trunc("DAY", col("ts")).as("day"))
      .agg(bregs(col("user_id")).as("r")).cache()
    val cleanB = perDayB.agg(buni(col("r"))).head.getLong(0)
    val withNullB = perDayB.unionByName(
      perDayB.limit(1).select(col("day"), lit(null).cast("array<bigint>").as("r")))
    assert(withNullB.agg(buni(col("r"))).head.getLong(0) == cleanB,
      "a NULL stored bitmap must contribute nothing to the union")
    val shorter = perDayB.select(expr("slice(r, 1, 4)").as("r"))
    assert(shorter.agg(buni(col("r"))).head.getLong(0) <= cleanB,
      "a prefix bitmap is a valid (smaller) state and must merge without error")
  }

  test("interpolation: observed days unchanged, gaps strictly between neighbors, no nulls") {
    val df = q("q_ts_interpolate").cache()
    assert(df.where(col("filled").isNull).count() == 0)
    // observed days keep their value (up to the DECIMAL(18,6) presentation round)
    assert(df.where(col("day_sum").isNotNull &&
      abs(col("filled") - col("day_sum")) > 1e-6).count() == 0)
    // interpolated gap values lie within [min(prev,next), max(prev,next)]
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("day")
    val past = w.rowsBetween(Window.unboundedPreceding, -1)
    val future = w.rowsBetween(1, Window.unboundedFollowing)
    val bounded = df
      .withColumn("pv", last(col("day_sum"), ignoreNulls = true).over(past))
      .withColumn("nv", first(col("day_sum"), ignoreNulls = true).over(future))
      .where(col("day_sum").isNull && col("pv").isNotNull && col("nv").isNotNull)
      .where(col("filled") < least(col("pv"), col("nv")) - 1e-6 ||
        col("filled") > greatest(col("pv"), col("nv")) + 1e-6)
    assert(bounded.count() == 0)
  }

  test("countmin: sketch grid is partition-layout independent") {
    import graft.functions.CountMin
    val agg = udaf(new CountMin)
    val ev = Tables.events(spark, sf).select("user_id")
    val grids = Seq(1, 4, 13).map { n =>
      ev.repartition(n).agg(agg(col("user_id"))).head.getSeq[Long](0)
    }
    assert(grids.forall(_ == grids.head))
  }

  test("grid join: 3×3-cell band equals the quadratic definition on seeded boundary data") {
    // same discipline as the interval-overlap random test: prices live on
    // a 0.25 grid (exact in binary, so Δ = 10.0 compares exactly), a
    // quarter snap onto ×10 cell edges, and constructed partners sit at
    // exactly Δprice = 10 / Δsize = 1 (inclusive, must match) and
    // Δsize = 2 (outside, must not) — the cells where a neighbor-explode
    // off-by-one would live
    val rnd = new scala.util.Random(11)
    (1 to 3).foreach { trial =>
      val organic = (1 to 80).map { i =>
        val p0 = (3600 + rnd.nextInt(800)) * 0.25
        val price = if (rnd.nextInt(4) == 0) (p0 / 10).toInt * 10.0 else p0
        (i.toLong, s"Brand#${1 + rnd.nextInt(3)}", 1 + rnd.nextInt(50), price)
      }
      val planted = organic.take(5).zipWithIndex.flatMap { case ((_, b, s, p), j) =>
        Seq((200L + j * 3, b, s, p + 10.0),       // exact price edge: matches
          (201L + j * 3, b, s + 1, p),            // exact size edge: matches
          (202L + j * 3, b, s + 2, p))            // one past the size band: only via others
      }
      val rows = organic ++ planted
      val df = spark.createDataFrame(rows)
        .toDF("p_partkey", "p_brand", "p_size", "p_retailprice")
      val got = graft.operators.Frontier.gridImpl(df).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val want = (for {
        (ka, ba, sa, pa) <- rows
        (kb, _, sb, pb) <- rows
        if ka < kb && (sa - sb).abs <= 1 && (pa - pb).abs <= 10.0
      } yield ba).groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      assert(want.values.sum > 0, s"trial $trial planted no pairs")
      assert(got == want, s"trial $trial: grid join diverged from the definition")
    }
  }

  test("basket lift: basket clone inflation scales counts ×K and leaves lift bit-identical") {
    // the rehearsal's (basket_inflated) claim as a CORRECTNESS invariant:
    // re-keyed order clones multiply ab, ca, cb and n_orders by exactly K,
    // and lift = (ab·K)(n·K)/((ca·K)(cb·K)) must be the SAME double as the
    // base (numerator and denominator stay exactly representable, so both
    // divisions round the same true quotient)
    val k = 3
    val li = Tables.lineitem(spark, sf).select(col("l_orderkey"), col("l_partkey"))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map { r =>
      (r.getAs[Number](r.fieldIndex("pa")).longValue,
        r.getAs[Number](r.fieldIndex("pb")).longValue) ->
        (r.getAs[Number](r.fieldIndex("ab")).longValue,
          r.getAs[Number](r.fieldIndex("ca")).longValue,
          r.getAs[Number](r.fieldIndex("cb")).longValue,
          r.getAs[Double](r.fieldIndex("lift")))
    }.toMap
    val base = rows(graft.operators.Frontier.basketImpl(li))
    val cloned = li.withColumn("rep", explode(expr(s"sequence(1, $k)")))
      .select((col("l_orderkey") * k + col("rep")).as("l_orderkey"), col("l_partkey"))
    val got = rows(graft.operators.Frontier.basketImpl(cloned))
    assert(base.nonEmpty)
    assert(got == base.map { case (key, (ab, ca, cb, lift)) =>
      key -> (ab * k, ca * k, cb * k, lift)
    }, "clone inflation must scale support counts by K and preserve lift exactly")
  }

  test("countmin: sketch of a ×K-repeated stream is the base grid ×K elementwise") {
    // sketch LINEARITY pinned as an equality: CountMin is a sum of
    // per-occurrence increments, so feeding every key K times must yield
    // exactly K times every cell — the property that makes the sketch
    // mergeable across partitions and days at scale
    import graft.functions.CountMin
    val k = 3
    val agg = udaf(new CountMin)
    val ev = Tables.events(spark, sf).select("user_id")
    val base = ev.agg(agg(col("user_id"))).head.getSeq[Long](0)
    val evK = ev.withColumn("rep", explode(expr(s"sequence(1, $k)"))).select("user_id")
    val got = evK.agg(agg(col("user_id"))).head.getSeq[Long](0)
    assert(got == base.map(_ * k),
      "count-min grid must scale elementwise by exactly K")
  }

  test("interval overlap: banded join equals the quadratic definition on seeded random intervals") {
    // the band construction's correctness argument (≤2 bins per interval,
    // start-bin meets once, strict inequality in pass 2 prevents
    // double-counting a start tie) tested against the DEFINITION on random
    // data rather than the fixed fixture: integer-heavy prices make exact
    // lo_A == lo_B ties and bin-edge landings (multiples of 50) common,
    // which is precisely where a band-assignment bug would live
    val rnd = new scala.util.Random(42)
    (1 to 5).foreach { trial =>
      val rows = (1 to 120).map { i =>
        val side = if (i % 2 == 0) 1 else 2
        // half the prices are exact integers (frequent ties), and exact
        // bin-edge multiples of 50 are common; sizes span the full 1..50
        // permitted by binW, so hi lands on edges too
        val price = 900 + rnd.nextInt(1200) + (if (rnd.nextBoolean()) 0.0 else 0.5)
        val snapped = if (rnd.nextInt(4) == 0) (price / 50).toInt * 50.0 else price
        (i.toLong, s"Brand#$side${1 + rnd.nextInt(5)}", snapped, 1 + rnd.nextInt(50))
      } ++ Seq(
        // NaN prices: every theta comparison is false (a NaN interval
        // overlaps nothing), but the rank machinery counts points
        // POSITIONALLY — without the side() NaN guard these rows land
        // in bucket-prefix totals and silently overcount for probes in
        // later buckets. The Scala-side definition below excludes them
        // naturally (NaN comparisons are false in Scala too).
        (996L, "Brand#13", Double.NaN, 10),
        (997L, "Brand#23", Double.NaN, 10),
        // inverted intervals (negative size => hi < lo): the contract
        // treats them as EMPTY (overlap nothing) because the rank
        // decomposition's subset identity requires lo <= hi on both
        // sides — an unfiltered inverted row contributes NEGATIVE
        // counts (probe: points inside (hi, lo) land in term2 but not
        // term1), silently DEFLATING its brand pair's total. Prices
        // sit mid-domain so both failure directions are exercised.
        (998L, "Brand#14", 1400.0, -50),
        (999L, "Brand#24", 1500.0, -50))
      val df = spark.createDataFrame(rows)
        .toDF("p_partkey", "p_brand", "p_retailprice", "p_size")
      val got = graft.operators.Frontier.intervalOverlapImpl(df, df).collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Number](2).longValue)
        .toMap
      val a = rows.filter(_._2.startsWith("Brand#1"))
      val b = rows.filter(_._2.startsWith("Brand#2"))
      val want = (for {
        (_, ba, pa, sa) <- a
        (_, bb, pb, sb) <- b
        if sa >= 0 && sb >= 0             // inverted = empty interval
        if pb <= pa + sa && pa <= pb + sb // closed-interval overlap
      } yield (ba, bb)).groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      assert(want.values.sum > 0, s"trial $trial generated no overlaps")
      assert(got == want, s"trial $trial: banded join diverged from the definition")
    }
  }

  test("interval overlap: one-sided ×K inflation multiplies every pair count by exactly K") {
    // the rehearsal's linearity claim as a CORRECTNESS invariant: each
    // Brand#1 clone keeps its interval, so it meets exactly the same
    // Brand#2 partners as its original — every (brand_a, brand_b) count
    // must be the base count ×K, nothing more (a band-assignment bug
    // that double-counted a boundary pair would break exactness here)
    val k = 3
    val part = Tables.part(spark, sf)
    def counts(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getAs[Number](2).longValue))
      .toMap
    val base = counts(graft.operators.Frontier.intervalOverlapImpl(part, part))
    val partA = part.withColumn("rep", explode(expr(s"sequence(1, $k)")))
      .withColumn("p_partkey", col("p_partkey") * k + col("rep"))
      .drop("rep")
    val got = counts(graft.operators.Frontier.intervalOverlapImpl(partA, part))
    assert(base.nonEmpty, "fixture brands must overlap")
    assert(got == base.map { case (key, n) => key -> n * k },
      "one-sided clone inflation must scale every pair count by exactly K")
  }
}
