package graft

import org.apache.spark.sql.types.{DataType, StructType}

/** 100 TB robustness seam (r13): at scale, EMPTY inputs are routine —
  * a predicate that matches nothing, a date partition with zero rows,
  * a tag exported from a source that hasn't filled yet. A query that
  * crashes on empty input (head()/collect()(0)/reduce on nothing,
  * greatest() with zero args from an empty bounded collect) is a
  * query that crashes in production the first quiet hour, so the
  * contract probed here is: every SparkEntry query, fed a zero-row
  * copy of EVERY fixture table, must
  *   (a) analyze and execute without throwing, and
  *   (b) produce the SAME result schema (names + types; nullability
  *       ignored — empty relations legitimately relax it) as the
  *       sf0.001 run — so downstream consumers (the driver's parquet
  *       dump, a user's next join) see a shape-stable, merely empty,
  *       table, not a shape-shifting one.
  *
  * Sweep-style (one test per operator family, all failures named at
  * once) rather than 168 micro-tests: the point is the inventory-wide
  * invariant, and a family test keeps suite overhead bounded.
  */
class EmptyInputSweepSpec extends SparkSpec {

  /** Zero-row, schema-preserving copies of every fixture table. The
    * rewrite lands Spark's logical types (e.g. events.ts as a plain
    * timestamp) — all within the encodings Fixtures.expected accepts,
    * so the same scan seams handle them.
    */
  lazy val emptyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_empty").toString
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { t =>
      spark.read.parquet(s"$sf/$t.parquet").limit(0)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  private def shape(s: StructType): Seq[(String, DataType)] =
    s.fields.toSeq.map(f => (f.name, f.dataType))

  /** Runs every query in `names` against the empty fixtures; returns
    * one message per violation (exception, or schema drift vs the
    * sf0.001 analysis-time schema). Forced through the noop DSv2 sink
    * so every output column is evaluated, same as the bench.
    */
  private def sweep(names: Seq[String]): Seq[String] = names.flatMap { name =>
    val fn = SparkEntry.queries(name)
    val refShape =
      try Right(shape(fn(spark, sf).schema))
      catch { case e: Throwable => Left(s"$name: sf0.001 ANALYSIS failed (${e.getMessage.take(120)})") }
    val res =
      try {
        val df = fn(spark, emptyDir)
        df.write.mode("overwrite").format("noop").save()
        refShape match {
          case Right(ref) if shape(df.schema) != ref =>
            Seq(s"$name: schema drift on empty input — got ${shape(df.schema)} vs $ref")
          case Left(msg) => Seq(msg)
          case _ => Nil
        }
      } catch { case e: Throwable =>
        Seq(s"$name: THREW on empty input — ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
      }
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    res
  }

  private def family(prefixes: String*): Seq[String] =
    SparkEntry.queries.keys.toSeq.sorted
      .filter(n => prefixes.exists(n.startsWith))

  private def assertClean(names: Seq[String]): Unit = {
    val bad = sweep(names)
    assert(bad.isEmpty, s"\n${bad.mkString("\n")}")
  }

  test("scans, sources, filters, projections survive empty input") {
    assertClean(family("q_scan", "q_source", "q_filter", "q_project"))
  }
  test("joins survive empty input") { assertClean(family("q_join")) }
  test("aggregations survive empty input") { assertClean(family("q_agg", "q_udaf")) }
  test("windows, sorts, sets survive empty input") {
    assertClean(family("q_win", "q_sort", "q_set"))
  }
  test("functions and UDF/UDTF showcases survive empty input") {
    assertClean(family("q_fn", "q_udf", "q_udtf"))
  }
  test("streaming queries survive empty input") { assertClean(family("q_stream")) }
  test("dedup and decontamination survive empty input") {
    assertClean(family("q_dedup", "q_decontaminate"))
  }
  test("similarity / ANN / kNN / clustering survive empty input") {
    assertClean(family("q_sim", "q_knn", "q_cluster"))
  }
  test("text analysis survives empty input") { assertClean(family("q_text")) }
  test("snapshot family survives empty input") { assertClean(family("q_snapshot")) }
  test("graph, time-series, TPC-H composites survive empty input") {
    assertClean(family("q_graph", "q_ts", "q_tpch"))
  }
  test("missing query vector / missing centroids: NON-empty embeddings, empty result") {
    // the zero-row sweep can't pin the lit(...)-gates in the
    // similarity family — an empty table is vacuously empty with or
    // without them. The input class that needs the gate is a NON-empty
    // embeddings table with no vec_id=0 (simTopK/simAnnLsh query
    // vector) or no vec_id<16 (simAnnIvf centroids): without the gate
    // those queries would emit rows scored against a zero-length
    // vector (0/0 garbage), not report "nothing to search". Planted
    // here by filtering the real fixture to vec_id >= 16.
    val dir = java.nio.file.Files.createTempDirectory("graft_noqvec").toString
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents")
    tables.foreach { t =>
      spark.read.parquet(s"$sf/$t.parquet").limit(0)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    import org.apache.spark.sql.functions.col
    spark.read.parquet(s"$sf/embeddings.parquet").where(col("vec_id") >= 16)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    for (name <- Seq("q_sim_topk", "q_sim_ann_lsh", "q_sim_ann_ivf")) {
      val df = SparkEntry.queries(name)(spark, dir)
      assert(df.count() === 0L,
        s"$name must return an empty result when its query vector/centroids are absent")
      assert(shape(df.schema) === shape(SparkEntry.queries(name)(spark, sf).schema),
        s"$name schema must not drift on the no-query-vector input")
    }
  }

  test("query vector absent but other centroids present: empty result (ADVICE r13)") {
    // the vec_id>=16 planting above removes ALL centroids, which the
    // IVF gate already caught; the subtler class is vec_ids 1-15
    // PRESENT with only vec_id 0 (the query) missing — pre-fix,
    // simAnnIvf silently promoted the lowest-id centroid to query
    // while simTopK/simAnnLsh returned empty. All three must agree:
    // no query vector, no rows, same shape.
    val dir = java.nio.file.Files.createTempDirectory("graft_noq0").toString
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents")
    tables.foreach { t =>
      spark.read.parquet(s"$sf/$t.parquet").limit(0)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    import org.apache.spark.sql.functions.col
    spark.read.parquet(s"$sf/embeddings.parquet").where(col("vec_id") >= 1)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    for (name <- Seq("q_sim_topk", "q_sim_ann_lsh", "q_sim_ann_ivf")) {
      val df = SparkEntry.queries(name)(spark, dir)
      assert(df.count() === 0L,
        s"$name must return an empty result when vec_id 0 (the query vector) is absent")
      assert(shape(df.schema) === shape(SparkEntry.queries(name)(spark, sf).schema),
        s"$name schema must not drift on the missing-vec_id-0 input")
    }
  }

  test("everything else survives empty input") {
    val covered = family("q_scan", "q_source", "q_filter", "q_project", "q_join",
      "q_agg", "q_udaf", "q_win", "q_sort", "q_set", "q_fn", "q_udf", "q_udtf",
      "q_stream", "q_dedup", "q_decontaminate", "q_sim", "q_knn", "q_cluster",
      "q_text", "q_snapshot", "q_graph", "q_ts", "q_tpch").toSet
    assertClean(SparkEntry.queries.keys.toSeq.sorted.filterNot(covered))
  }
}
