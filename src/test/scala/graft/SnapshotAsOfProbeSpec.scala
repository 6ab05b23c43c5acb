package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.{Snapshot, Tables}

/** Adversarial probes of the asOf resolution chain (r12, VERDICT item
  * 3): manifest states the resolver can actually meet in a deployed
  * catalog — a schema-evolved history, a retention gap in the MIDDLE
  * of a parent chain, a tag that collides lexically with the
  * generation-dir naming scheme, and the tag-boundary semantics of the
  * `<=` comparison. Each test pins the empirically-probed behavior so
  * a refactor that changes it fails here first.
  */
class SnapshotAsOfProbeSpec extends SparkSpec {

  private def dsv2(root: String, asOf: String, tag: Option[String] = None,
                   schema: Option[StructType] = None) = {
    var b = spark.read.format("graft.sources.SnapshotSource")
      .option("root", root).option("table", "nation").option("asOf", asOf)
    tag.foreach(t => b = b.option("tag", t))
    schema.foreach(s => b = b.schema(s))
    b.load()
  }

  test("asOf across a schema-evolved history serves each snapshot's OWN schema") {
    val r = Files.createTempDirectory("asof_evo").toString
    val v1 = Tables.nation(spark, sf).select(col("n_nationkey"), col("n_name"))
    val v2 = v1.withColumn("n_extra", col("n_nationkey") * 2)
    Snapshot.export(spark, Map("nation" -> v1), r, "2024-01-01")
    Snapshot.export(spark, Map("nation" -> v2), r, "2024-02-01",
      parent = Some("2024-01-01"))
    // the historical read serves the HISTORICAL schema and data
    val old = dsv2(r, "2024-01-15")
    assert(old.schema.fieldNames.toSeq == v1.schema.fieldNames.toSeq,
      s"asOf read must carry the resolved snapshot's schema, got ${old.schema}")
    assert(old.exceptAll(v1).count() == 0 && v1.exceptAll(old).count() == 0)
    // the head read serves the evolved schema
    val head = dsv2(r, "2024-02-01")
    assert(head.schema.fieldNames.contains("n_extra"))
    assert(head.count() == v2.count())
  }

  test("a user read schema from the WRONG generation is rejected on an asOf read") {
    val r = Files.createTempDirectory("asof_evo_schema").toString
    val v1 = Tables.nation(spark, sf).select(col("n_nationkey"), col("n_name"))
    val v2 = v1.withColumn("n_extra", col("n_nationkey") * 2)
    Snapshot.export(spark, Map("nation" -> v1), r, "2024-01-01")
    Snapshot.export(spark, Map("nation" -> v2), r, "2024-02-01",
      parent = Some("2024-01-01"))
    // injecting the HEAD schema into a historical read would fabricate a
    // phantom column over old files — the committed-schema choke point
    // must compare against the RESOLVED manifest's entry, not the head's
    val e = intercept[Throwable](
      dsv2(r, "2024-01-15", schema = Some(v2.schema)).collect())
    val chain = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .take(20).map(t => Option(t.getMessage).getOrElse("")).mkString("|")
    assert(chain.contains("authoritative"),
      s"expected the committed-schema rejection against the HISTORICAL entry, got: $chain")
    // and the historical schema is accepted on the historical read
    assert(dsv2(r, "2024-01-15", schema = Some(v1.schema)).count() == v1.count())
  }

  test("a retention gap in the MIDDLE of the chain breaks with the named error even though the answer survives below it") {
    val r = Files.createTempDirectory("asof_gap").toString
    val v = Tables.nation(spark, sf)
    Snapshot.export(spark, Map("nation" -> v), r, "2024-01-01")
    Snapshot.export(spark, Map("nation" -> v.limit(20)), r, "2024-02-01",
      parent = Some("2024-01-01"))
    Snapshot.export(spark, Map("nation" -> v.limit(10)), r, "2024-03-01",
      parent = Some("2024-02-01"))
    val f = new org.apache.hadoop.fs.Path(r)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(new org.apache.hadoop.fs.Path(s"$r/2024-02-01"), true)
    // lineage-respecting by design: the chain from the head CANNOT
    // skip over the swept middle tag to reach 2024-01-01 — the walk
    // names the break instead of fabricating a hop it can't verify
    val e = intercept[IllegalArgumentException](
      Snapshot.resolveAsOf(spark, r, "2024-01-15", Some("2024-03-01")))
    assert(e.getMessage.contains("parent chain") &&
      e.getMessage.contains("2024-02-01"), e.getMessage)
    // catalog mode has no lineage constraint and still finds the answer
    assert(Snapshot.resolveAsOf(spark, r, "2024-01-15").tag == "2024-01-01")
  }

  test("asOf equal to a tag resolves to that tag exactly (boundary of <=), in both modes") {
    val r = Files.createTempDirectory("asof_bound").toString
    val v = Tables.nation(spark, sf)
    Snapshot.export(spark, Map("nation" -> v), r, "2024-01-01")
    Snapshot.export(spark, Map("nation" -> v.limit(5)), r, "2024-02-01",
      parent = Some("2024-01-01"))
    assert(Snapshot.resolveAsOf(spark, r, "2024-01-01").tag == "2024-01-01")
    assert(Snapshot.resolveAsOf(spark, r, "2024-01-01", Some("2024-02-01")).tag == "2024-01-01")
    // one microsecond of string after the tag still resolves to it
    assert(Snapshot.resolveAsOf(spark, r, "2024-01-01T00:00:00.000001").tag == "2024-01-01")
  }

  test("a tag named like a generation dir round-trips: export, list, read, asOf, vacuum, retain") {
    val r = Files.createTempDirectory("asof_gtag").toString
    val v = Tables.nation(spark, sf)
    Snapshot.export(spark, Map("nation" -> v), r, "2024-01-01")
    // lexically identical to the g-<uuid8> generation-dir scheme — must
    // stay a plain root-level tag, never be confused with a generation
    Snapshot.export(spark, Map("nation" -> v.limit(7)), r, "g-deadbeef",
      parent = Some("2024-01-01"))
    assert(Snapshot.listTags(spark, r).toSet == Set("2024-01-01", "g-deadbeef"))
    assert(Snapshot.read(spark, r, "g-deadbeef", "nation").count() == 7)
    // "g-" sorts after ISO dates, so catalog-mode asOf at an ISO point
    // never resolves INTO the g-tag, and an asOf at/above it does
    assert(Snapshot.resolveAsOf(spark, r, "2024-06-01").tag == "2024-01-01")
    assert(Snapshot.resolveAsOf(spark, r, "g-deadbeef").tag == "g-deadbeef")
    // vacuum must not sweep either snapshot's files (both referenced)
    val swept = Snapshot.vacuum(spark, r)
    assert(swept.isEmpty, s"vacuum swept referenced files: $swept")
    assert(Snapshot.read(spark, r, "g-deadbeef", "nation").count() == 7)
    assert(Snapshot.read(spark, r, "2024-01-01", "nation").count() == v.count())
    // retention: keeping the newest 1 keeps g-deadbeef (lexically
    // newest) and its linked parent survives only if file-referenced
    val doomed = Snapshot.retain(spark, r, 1)
    assert(!doomed.contains("g-deadbeef"))
    assert(Snapshot.read(spark, r, "g-deadbeef", "nation").count() == 7)
  }
}
