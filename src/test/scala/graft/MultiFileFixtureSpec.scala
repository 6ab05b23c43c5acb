package graft

import org.apache.spark.sql.DataFrame

/** Multi-file read-path probe (VERDICT r12 item 5). Every driver
  * fixture table is ONE parquet file, so the per-round gates exercise
  * file-parallelism, multi-file partition packing, and pushdown-over-
  * many-files only through the snapshot family's own layouts — yet the
  * 100 TB mandate assumes a table IS thousands of part files. This
  * probe splits lineitem sf0.1 into 8 part files in a temp fixture dir
  * and pins, for the flagship aggregate, the pruned scan, and a
  * broadcast join:
  *
  *  - result identity: byte-for-byte the same rows as the single-file
  *    fixture (split/pack boundaries must never change results);
  *  - plan parallelism: the multi-file scan plans >1 input partition
  *    (all 8 files are really in the plan, not coalesced to one);
  *  - pushdown survival: PushedFilters + narrow ReadSchema hold
  *    per-file exactly as they do single-file.
  *
  * The inventory stays frozen: this is a spec, not a new q_ key.
  */
class MultiFileFixtureSpec extends SparkSpec {
  private val srcSf = "/root/testdata/sf0.1"

  /** Temp fixture dir: lineitem rewritten as 8 part files; the other
    * table the probed queries read (part) copied as-is. Built once per
    * suite.
    */
  private lazy val splitDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_multifile").toString
    sources.Tables.lineitem(spark, srcSf)
      .repartition(8)
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$srcSf/part.parquet"),
      java.nio.file.Paths.get(s"$dir/part.parquet"))
    dir
  }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq.sorted

  test("the split fixture really is 8 part files and plans >1 partition") {
    val files = new java.io.File(s"$splitDir/lineitem.parquet")
      .listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.length == 8, s"expected 8 part files, found ${files.length}")
    val parts = sources.Tables.lineitem(spark, splitDir).rdd.getNumPartitions
    assert(parts > 1,
      s"multi-file scan coalesced to $parts partition(s) — no file parallelism")
  }

  test("flagship aggregate is result-identical across single-file and 8-file layouts") {
    val single = rows(SparkEntry.queries("q_agg_pricing_summary")(spark, srcSf))
    val split = rows(SparkEntry.queries("q_agg_pricing_summary")(spark, splitDir))
    assert(split == single)
  }

  test("pruned scan is result-identical and keeps pushdown + narrow schema per-file") {
    val single = rows(SparkEntry.queries("q_scan_pruned")(spark, srcSf))
    val df = SparkEntry.queries("q_scan_pruned")(spark, splitDir)
    assert(rows(df) == single)
    val plan = df.queryExecution.executedPlan.toString
    // the filter must be INSIDE the pushed list — "PushedFilters: ["
    // alone also matches an empty list (r15 mutation-smoke finding)
    assert(plan.contains("PushedFilters: ["), plan)
    val pushedStart = plan.indexOf("PushedFilters: [")
    val pushedList = plan.substring(pushedStart, plan.indexOf("]", pushedStart) + 1)
    assert(pushedList.contains("l_quantity"), s"l_quantity not pushed: $pushedList")
    // projection+filter columns only — price columns must not be read
    assert(!plan.contains("l_extendedprice"), plan)
  }

  test("broadcast join is result-identical across layouts") {
    val single = rows(SparkEntry.queries("q_join_broadcast")(spark, srcSf))
    val split = rows(SparkEntry.queries("q_join_broadcast")(spark, splitDir))
    assert(split == single)
  }
}
