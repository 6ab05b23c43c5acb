package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.{Snapshot, SnapshotCatalog, Tables}

/** Catalog registration for the snapshot source: `spark.sql` over
  * `<catalog>.<tag>.<table>` names with NO hand-made temp views, and —
  * the invariant that makes registration safe at all — every query's
  * analysis re-resolves the manifest, so a snapshot re-exported between
  * two queries is seen fresh by the second (VERDICT r7 missing #1).
  */
class SnapshotCatalogSpec extends SparkSpec
    with org.scalatest.BeforeAndAfterAll {

  /** Each test root gets its own catalog NAME: Spark's CatalogManager
    * caches one plugin instance per name for the session's lifetime, so
    * reusing a name across roots would pin the first root forever —
    * names are cheap, roots are per-test.
    */
  private val roots = scala.collection.mutable.Buffer.empty[java.nio.file.Path]

  private def registerCatalog(name: String): String = {
    val root = Files.createTempDirectory(s"snap_cat_$name")
    roots += root
    spark.conf.set(s"spark.sql.catalog.$name", classOf[SnapshotCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.root", root.toString)
    root.toString
  }

  // leave no litter: the snapshot roots are throwaway per-suite fixtures
  override def afterAll(): Unit = {
    roots.foreach(r => graft.SessionToken.deleteDir(r.toString))
    super.afterAll()
  }

  test("spark.sql reads a snapshot table by name, no temp views") {
    val root = registerCatalog("snapc1")
    Snapshot.export(spark, Map(
      "nation" -> Tables.nation(spark, sf),
      "documents" -> Tables.documents(spark, sf)), root, "v1")
    val viaSql = spark.sql(
      "SELECT n_regionkey, count(*) AS n FROM snapc1.v1.nation GROUP BY 1 ORDER BY 1")
    val direct = Tables.nation(spark, sf)
      .groupBy(col("n_regionkey")).agg(count(lit(1)).as("n"))
      .orderBy(col("n_regionkey"))
    assert(viaSql.collect().toSeq == direct.collect().toSeq)
    // joins across two catalog tables work like any other relation
    val joined = spark.sql(
      """SELECT count(*) AS n FROM snapc1.v1.documents d
        |JOIN snapc1.v1.nation nt ON length(d.lang) >= 0 AND nt.n_nationkey = 0
        |""".stripMargin).collect().head.getLong(0)
    assert(joined == Tables.documents(spark, sf).count())
  }

  test("repeated catalog loads see FRESH manifests (re-export between queries)") {
    val root = registerCatalog("snapc2")
    val nation = Tables.nation(spark, sf)
    Snapshot.export(spark, Map("nation" -> nation.limit(5)), root, "live")
    val q = "SELECT count(*) AS n FROM snapc2.live.nation"
    assert(spark.sql(q).collect().head.getLong(0) == 5)
    // re-export the SAME tag with more rows: the next query must see them
    Snapshot.export(spark, Map("nation" -> nation), root, "live")
    assert(spark.sql(q).collect().head.getLong(0) == nation.count(),
      "second query served a stale manifest — the catalog must re-resolve per load")
  }

  test("catalog loads keep the DSv2 scan's pushdown (stats answer count)") {
    val root = registerCatalog("snapc3")
    Snapshot.export(spark, Map("orders" -> Tables.orders(spark, sf)), root, "v1")
    // same SnapshotTable as the options path: filters and aggregates
    // reach the same ScanBuilder, so a catalog name costs no pushdown
    val filtered = spark.sql(
      "SELECT count(*) FROM snapc3.v1.orders WHERE o_orderkey < 100")
      .collect().head.getLong(0)
    assert(filtered ==
      Tables.orders(spark, sf).where(col("o_orderkey") < 100).count())
  }

  test("SQL writes append through the catalog and the next read sees them") {
    val root = registerCatalog("snapc4")
    val nation = Tables.nation(spark, sf)
    Snapshot.export(spark, Map("nation" -> nation), root, "v1")
    val before = spark.sql("SELECT count(*) AS n FROM snapc4.v1.nation")
      .collect().head.getLong(0)
    nation.limit(3).writeTo("snapc4.v1.nation").append()
    val after = spark.sql("SELECT count(*) AS n FROM snapc4.v1.nation")
      .collect().head.getLong(0)
    assert(after == before + 3,
      "a catalog append must land in the manifest and be visible to the next query")
  }

  test("writeTo(...).option carries the txn idempotence ledger through the catalog path") {
    // the SQL INSERT front door has no write-option channel, but the
    // DataFrameWriterV2 one does — LogicalWriteInfo.options receives
    // writeTo options, so catalog-path at-least-once writers get the
    // same replay protection as the options path (SURVEY §7.9.9 item b)
    val root = registerCatalog("snapc12")
    val nation = Tables.nation(spark, sf)
    Snapshot.export(spark, Map("nation" -> nation), root, "v1")
    val base = spark.sql("SELECT count(*) AS n FROM snapc12.v1.nation")
      .collect().head.getLong(0)
    def appendTxn(v: String): Unit =
      nation.limit(3).writeTo("snapc12.v1.nation")
        .option("txnAppId", "cat-ingest").option("txnVersion", v).append()
    appendTxn("1")
    appendTxn("1") // replay → no-op
    val after = spark.sql("SELECT count(*) AS n FROM snapc12.v1.nation")
      .collect().head.getLong(0)
    assert(after == base + 3,
      s"the replayed catalog append must be a no-op (base $base, after $after)")
    appendTxn("2") // progress → commits
    assert(spark.sql("SELECT count(*) AS n FROM snapc12.v1.nation")
      .collect().head.getLong(0) == base + 6)
    assert(Snapshot.readManifest(spark, root, "v1").tables("nation").txns ==
      Map("cat-ingest" -> 2L))
  }

  test("unknown tables, tags and DDL fail loudly") {
    val root = registerCatalog("snapc5")
    Snapshot.export(spark, Map("nation" -> Tables.nation(spark, sf)), root, "v1")
    val noTable = intercept[org.apache.spark.sql.AnalysisException](
      spark.sql("SELECT * FROM snapc5.v1.no_such_table").collect())
    assert(noTable.getMessage.toLowerCase.contains("table"))
    val noTag = intercept[org.apache.spark.sql.AnalysisException](
      spark.sql("SELECT * FROM snapc5.no_such_tag.nation").collect())
    assert(noTag.getMessage.toLowerCase.contains("table") ||
      noTag.getMessage.toLowerCase.contains("not"))
    intercept[Exception](
      spark.sql("CREATE TABLE snapc5.v1.t2 (a INT) USING parquet"))
    intercept[Exception](spark.sql("DROP TABLE snapc5.v1.nation"))
  }

  test("SHOW surfaces: namespaces are tags, tables come from the manifest") {
    val root = registerCatalog("snapc6")
    Snapshot.export(spark, Map(
      "nation" -> Tables.nation(spark, sf),
      "region" -> Tables.region(spark, sf)), root, "2024-01-01")
    Snapshot.export(spark, Map("nation" -> Tables.nation(spark, sf)),
      root, "2024-02-01", parent = Some("2024-01-01"))
    // SHOW quotes dash-bearing names as `...` — strip the presentation quoting
    val namespaces = spark.sql("SHOW NAMESPACES IN snapc6")
      .collect().map(_.getString(0).stripPrefix("`").stripSuffix("`")).toSet
    assert(namespaces == Set("2024-01-01", "2024-02-01"))
    val tables = spark.sql("SHOW TABLES IN snapc6.`2024-01-01`")
      .collect().map(_.getString(1)).toSet
    assert(tables == Set("nation", "region"))
  }

  test("traversal-shaped identifiers are NOT-FOUND, never filesystem paths") {
    // backquoted SQL identifiers can contain any characters; a tag of
    // `..` or `a/b` must never reach Path construction (reading a
    // sibling root's manifest / writing one listTags can't see)
    val root = registerCatalog("snapc7")
    Snapshot.export(spark, Map("nation" -> Tables.nation(spark, sf)), root, "v1")
    // plant a readable manifest OUTSIDE the root where `..` would land
    Snapshot.export(spark, Map("region" -> Tables.region(spark, sf)),
      new java.io.File(root).getParent, "escape_tag")
    for (bad <- Seq("SELECT * FROM snapc7.`..`.nation",
                    "SELECT * FROM snapc7.`../..`.nation",
                    "SELECT * FROM snapc7.`a/b`.nation",
                    "SELECT * FROM snapc7.v1.`../v1/nation`")) {
      val e = intercept[org.apache.spark.sql.AnalysisException](spark.sql(bad).collect())
      assert(e.getMessage.toLowerCase.matches("(?s).*(table|not found|cannot be found).*"),
        s"expected a clean not-found for $bad, got: ${e.getMessage.take(120)}")
    }
  }

  test("wrong-arity namespaces get standard not-found errors, not require crashes") {
    registerCatalog("snapc8")
    // catalog-level SHOW TABLES resolves to the empty default namespace
    val e1 = intercept[org.apache.spark.sql.AnalysisException](
      spark.sql("SHOW TABLES IN snapc8").collect())
    assert(!e1.getMessage.contains("requirement failed"), e1.getMessage.take(120))
    val e2 = intercept[org.apache.spark.sql.AnalysisException](
      spark.sql("SELECT * FROM snapc8.a.b.c.t").collect())
    assert(!e2.getMessage.contains("requirement failed"), e2.getMessage.take(120))
  }

  test("unquoted identifiers resolve case-insensitively when the match is unique") {
    val root = registerCatalog("snapc9")
    Snapshot.export(spark, Map("nation" -> Tables.nation(spark, sf)), root, "v1")
    assert(spark.sql("SELECT count(*) AS n FROM snapc9.V1.NATION")
      .collect().head.getLong(0) == Tables.nation(spark, sf).count())
  }

  test("case-variant writes append to the MANIFEST's entry, never fork a new one") {
    // the loaded table's name keys the write's manifest update and data
    // dir; serving the USER's casing for a case-insensitive match would
    // make `writeTo(...NATION)` commit a brand-new "NATION" entry next
    // to "nation" (reads keep working — the fork is silent)
    val root = registerCatalog("snapc11")
    val nation = Tables.nation(spark, sf)
    Snapshot.export(spark, Map("nation" -> nation), root, "v1")
    nation.limit(3).writeTo("snapc11.v1.NATION").append()
    val manifest = Snapshot.readManifest(spark, root, "v1")
    assert(manifest.tables.keySet == Set("nation"),
      s"case-variant write forked the manifest: ${manifest.tables.keySet}")
    assert(spark.sql("SELECT count(*) AS n FROM snapc11.v1.nation")
      .collect().head.getLong(0) == nation.count() + 3)
  }

  test("TIMESTAMP AS OF renders the query instant fixed-width (whole-second vs sub-second tags)") {
    // `Instant.toString` is variable-precision: a whole-second instant
    // renders `…T10:00:00Z`, and since 'Z' > '.' that string sorts
    // AFTER every sub-second tag in the same second — so the asOf walk
    // would return a snapshot tagged up to ~1s AFTER the queried
    // instant (advice r15). The catalog renders a fixed 6-digit
    // fraction; this test plants exactly the discriminating tag.
    val root = registerCatalog("snapc13")
    val nation = Tables.nation(spark, sf)
    val older = "2024-02-01T09:00:00.000000Z"
    val newer = "2024-02-01T10:00:00.500000Z"
    Snapshot.export(spark, Map("nation" -> nation.limit(5)), root, older)
    Snapshot.export(spark, Map("nation" -> nation), root, newer, parent = Some(older))
    val cat = spark.sessionState.catalogManager.catalog("snapc13")
      .asInstanceOf[SnapshotCatalog]
    val ident = org.apache.spark.sql.connector.catalog.Identifier.of(
      Array(newer), "nation")
    // whole-second query instant 10:00:00.000000 — 0.5s BEFORE `newer`
    val micros = java.time.Instant.parse("2024-02-01T10:00:00Z")
      .getEpochSecond * 1000000L
    val t = cat.loadTable(ident, micros)
      .asInstanceOf[graft.sources.SnapshotTable]
    assert(t.tag == older,
      s"whole-second query instant resolved '${t.tag}' — a snapshot AFTER " +
        "the queried instant (variable-width rendering regression)")
    assert(t.rows == 5)
    // a query instant at/after the sub-second tag still resolves it exactly
    val t2 = cat.loadTable(ident, micros + 500000L)
      .asInstanceOf[graft.sources.SnapshotTable]
    assert(t2.tag == newer)
    assert(t2.rows == nation.count())
  }

  test("mixed-precision ISO tags resolve by INSTANT, not string order") {
    // Two discipline-violating-but-legal ISO tags: a whole-second tag
    // (natural Instant.toString output — no fraction) and a sub-second
    // one half a second LATER. Lexicographically they sort BACKWARDS
    // ('.' < 'Z' puts the later tag first), so the old string-only walk
    // (a) excluded the whole-second tag at its own exact commit instant
    // ('Z' > '.': tag sorts after the fixed 6-digit query rendering) and
    // (b) could find NO snapshot for instants between the two (advice
    // r16). tagLeq parses both sides when both parse ISO.
    val root = registerCatalog("snapc14")
    val nation = Tables.nation(spark, sf)
    val whole = "2024-03-01T10:00:00Z"          // instant 10:00:00.000000
    val sub   = "2024-03-01T10:00:00.500000Z"   // instant 10:00:00.500000
    Snapshot.export(spark, Map("nation" -> nation.limit(5)), root, whole)
    Snapshot.export(spark, Map("nation" -> nation), root, sub, parent = Some(whole))
    val cat = spark.sessionState.catalogManager.catalog("snapc14")
      .asInstanceOf[SnapshotCatalog]
    val ident = org.apache.spark.sql.connector.catalog.Identifier.of(
      Array(sub), "nation")
    val base = java.time.Instant.parse(whole).getEpochSecond * 1000000L
    // TIMESTAMP AS OF at the whole-second tag's EXACT commit instant:
    // equal timestamps are included (the string walk excluded it)
    val t0 = cat.loadTable(ident, base).asInstanceOf[graft.sources.SnapshotTable]
    assert(t0.tag == whole,
      s"exact-commit-instant query resolved '${t0.tag}' — equal timestamps must be included")
    assert(t0.rows == 5)
    // an instant strictly BETWEEN the two tags: the string walk found
    // NEITHER (whole sorts after the query, sub compares greater on the
    // fraction digit) and threw; instant order resolves the older tag
    val tMid = cat.loadTable(ident, base + 250000L)
      .asInstanceOf[graft.sources.SnapshotTable]
    assert(tMid.tag == whole, s"mid-instant query resolved '${tMid.tag}'")
    // at/after the sub-second tag: the newer snapshot, exactly
    val t1 = cat.loadTable(ident, base + 500000L)
      .asInstanceOf[graft.sources.SnapshotTable]
    assert(t1.tag == sub && t1.rows == nation.count())
    // the no-`from` catalog walk picks max-by-instant, not last-by-string
    assert(Snapshot.resolveAsOf(spark, root, "2024-03-01T10:00:00.250000Z").tag == whole)
    assert(Snapshot.resolveAsOf(spark, root, "2024-03-01T11:00:00Z").tag == sub)
  }

  test("tag ordering is a TOTAL order even with non-ISO tags interleaving") {
    // the discriminating triple for pairwise instant-vs-string
    // comparison: a < b by instant (same second, mixed precision),
    // but the non-ISO z string-sorts BETWEEN them ('.' < 'Z' puts b
    // before z before a) — pairwise comparison cycles (a<b<z<a) and
    // max-selection under a cyclic comparator can return a non-newest
    // tag. Ordering by the canonical KEY restores transitivity.
    val a = "2024-01-02T10:00:00Z"      // instant .000000000
    val b = "2024-01-02T10:00:00.5Z"    // instant .500000000 — later
    val z = "2024-01-02T10:00:00.5Zx"   // not ISO; between b and a by string
    val ord = Snapshot.tagOrdering
    assert(ord.compare(a, b) < 0, "same-second mixed precision must order by instant")
    // transitivity: whatever side z lands on, the triple must not cycle
    val all = Seq(a, b, z)
    for (x <- all; y <- all; w <- all
         if ord.compare(x, y) < 0 && ord.compare(y, w) < 0)
      assert(ord.compare(x, w) < 0, s"cycle: $x < $y < $w but compare($x,$w) >= 0")
    // antisymmetry/consistency: compare(x,y) and compare(y,x) always oppose
    for (x <- all; y <- all if x != y)
      assert(ord.compare(x, y).sign == -ord.compare(y, x).sign)
    // tagLeq agrees with the ordering and includes equal instants at
    // BOTH renderings (the 6-digit catalog query form and the bare one)
    assert(Snapshot.tagLeq(a, "2024-01-02T10:00:00.000000Z"))
    assert(Snapshot.tagLeq("2024-01-02T10:00:00.000000Z", a))
  }

  test("SQL time travel: FOR VERSION AS OF resolves the tag's parent chain read-only") {
    val root = registerCatalog("snapc10")
    val nation = Tables.nation(spark, sf)
    Snapshot.export(spark, Map("nation" -> nation.limit(5)), root, "2024-01-01")
    Snapshot.export(spark, Map("nation" -> nation), root, "2024-02-01",
      parent = Some("2024-01-01"))
    // as of an instant between the two tags → the older manifest
    val n = spark.sql(
      "SELECT count(*) AS n FROM snapc10.`2024-02-01`.nation VERSION AS OF '2024-01-15'")
      .collect().head.getLong(0)
    assert(n == 5, s"expected the 2024-01-01 snapshot's 5 rows, got $n")
    // as of its own tag → current
    val cur = spark.sql(
      "SELECT count(*) AS n FROM snapc10.`2024-02-01`.nation VERSION AS OF '2024-02-01'")
      .collect().head.getLong(0)
    assert(cur == nation.count())
  }
}
