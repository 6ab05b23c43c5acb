package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import graft.sources.{Snapshot, SnapshotScan, Tables}

/** Columns whose NAME literally contains a dot — parquet's column-path
  * delimiter — are the classic silent-wrong-results trap in filter and
  * aggregate pushdown (Spark's own parquet source refuses to push
  * dotted names for this reason: parquet would resolve `a.b` as nested
  * path a→b, treat it as a missing column = all-null, and record-level
  * filtering would drop matching rows BEFORE the residual filter could
  * restore them).
  *
  * This spec pins the two safety properties the snapshot DSv2 source
  * relies on:
  *
  *  1. FILTERS: Spark backtick-quotes a flat dotted name in translated
  *     source filters, so SnapshotFilters' plain-name schema lookup
  *     misses and the filter is NOT pushed — correctness then rides on
  *     Spark's residual evaluation, which this spec proves returns the
  *     exact row set. (If a Spark upgrade ever stopped quoting, the
  *     pushed-filter assertion below fails loudly and the name guard
  *     must move into SnapshotFilters itself.)
  *
  *  2. AGGREGATES: min/max pushdown IS taken for a flat dotted column
  *     (the connector reference arrives unparsed as one field name).
  *     The footer reader must therefore match column chunks by EXACT
  *     single-element path — a dot-string compare would let a nested
  *     chunk a.b (struct a, field b) shadow the flat column "a.b" and
  *     silently serve the WRONG column's statistics.
  */
class DottedColumnProbeSpec extends SparkSpec {

  /** nation-derived fixture: a struct `a{b}` whose values are offset
    * by +100 from the flat column literally named "a.b" — any
    * chunk-shadowing bug yields a visibly wrong min/max.
    */
  private lazy val root: String = {
    val r = Files.createTempDirectory("snap_dotted").toString
    val src = fixture
    src.write.format("graft.sources.SnapshotSource")
      .option("root", r).option("tag", "g1").option("table", "dotted")
      .option("schema", src.schema.json).mode("append").save()
    r
  }

  private def fixture =
    Tables.nation(spark, sf).select(
      col("n_nationkey").as("id"),
      // struct FIRST in schema order: its chunk path ["a","b"] has
      // dot-string "a.b" and precedes the flat column's ["a.b"] in the
      // footer — exactly the shadowing position
      struct((col("n_regionkey") + 100).cast("int").as("b")).as("a"),
      col("n_regionkey").cast("int").as("a.b"))

  private def readBack =
    spark.read.format("graft.sources.SnapshotSource")
      .option("root", root).option("tag", "g1").option("table", "dotted").load()

  private def snapshotScan(df: org.apache.spark.sql.DataFrame): SnapshotScan =
    df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan
    }.collectFirst { case s: SnapshotScan => s }.getOrElse(
      fail("expected a GraftSnapshotScan in the plan"))

  test("flat column named 'a.b' round-trips and filters correctly — filter NOT pushed") {
    val back = readBack
    assert(back.schema.fieldNames.toSeq == Seq("id", "a", "a.b"))
    val got = back.where(col("`a.b`") === 2)
    val expect = fixture.where(col("`a.b`") === 2)
    assert(expect.count() > 0, "fixture must exercise the filter")
    assert(got.count() == expect.count(),
      "a filter on a dotted flat column must not lose rows")
    assert(got.exceptAll(expect).count() == 0 && expect.exceptAll(got).count() == 0)
    // the quoted name `a.b` can never match a parquet column — the scan
    // must carry ZERO pushed filters (both the EqualTo and the implicit
    // IsNotNull arrive quoted)
    assert(snapshotScan(got).filters.isEmpty,
      s"dotted-name filters must not be pushed, got ${snapshotScan(got).filters.toSeq}")
  }

  test("positive control: the same filter shape on an undotted column IS pushed") {
    val got = readBack.where(col("id") === 2)
    assert(snapshotScan(got).filters.nonEmpty,
      "undotted int filter must push — otherwise assertion 1 tests nothing")
    assert(got.count() == 1)
  }

  test("footer min/max of 'a.b' matches chunks by exact path, not dot-string") {
    val back = readBack
    val agg = back.agg(min(col("`a.b`")).as("mn"), max(col("`a.b`")).as("mx"))
    // the aggregate must actually take the footer path — otherwise this
    // spec can't discriminate the chunk-matching rule
    assert(agg.queryExecution.executedPlan.toString.contains("GraftSnapshotAggScan"),
      "min/max over a flat int column must push to the footer scan")
    val row = agg.collect().head
    val direct = fixture.agg(min(col("`a.b`")), max(col("`a.b`"))).collect().head
    assert(row.getInt(0) == direct.getInt(0) && row.getInt(1) == direct.getInt(1),
      s"footer stats served the wrong chunk: got (${row.getInt(0)}, ${row.getInt(1)}), " +
        s"want (${direct.getInt(0)}, ${direct.getInt(1)}) — the struct a.b decoy is +100")
    // the decoy would have surfaced as min >= 100
    assert(row.getInt(0) < 100, "min came from the struct chunk — dot-string shadowing")
  }
}
