package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.{Snapshot, Tables}

/** Tags and table names are filesystem path segments. A slashed tag
  * commits `root/x/y/manifest.json` — a manifest the depth-1 listTags
  * never sees — so vacuum treats every file it references as an orphan
  * and DELETES COMMITTED DATA; `..` escapes the root entirely. The SQL
  * catalog has always rejected these (SnapshotCatalog.safeSegment);
  * this spec pins the same guard on the two programmatic writers that
  * lacked it, and demonstrates the exact data-loss sequence the guard
  * prevents.
  */
class SnapshotSegmentGuardSpec extends SparkSpec {

  private def nation = Tables.nation(spark, sf).select(col("n_nationkey"), col("n_name"))

  test("export rejects slashed / traversal tags and table names BEFORE writing") {
    val root = Files.createTempDirectory("snap_guard").toString
    try {
      for (tag <- Seq("x/y", "..", ".", "", "x\\y")) {
        val e = intercept[IllegalArgumentException](
          Snapshot.export(spark, Map("n" -> nation), root, tag))
        assert(e.getMessage.contains("path segment"), s"tag '$tag': ${e.getMessage}")
      }
      val e2 = intercept[IllegalArgumentException](
        Snapshot.export(spark, Map("a/b" -> nation), root, "ok"))
      assert(e2.getMessage.contains("table name"))
      // the guard fired before ANY file landed — the root is still empty
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(fs.listStatus(new org.apache.hadoop.fs.Path(root)).isEmpty,
        "a rejected export must leave nothing behind")
    } finally SessionToken.deleteDir(root)
  }

  test("DSv2 options path rejects slashed tag/table with the named error") {
    val root = Files.createTempDirectory("snap_guard_v2").toString
    try {
      def write(tag: String, table: String) =
        nation.write.format("graft.sources.SnapshotSource")
          .option("root", root).option("tag", tag).option("table", table)
          .option("schema", nation.schema.json).mode("append").save()
      val et = intercept[IllegalArgumentException](write("x/y", "t"))
      assert(et.getMessage.contains("path segment"))
      val eb = intercept[IllegalArgumentException](write("ok", "a/b"))
      assert(eb.getMessage.contains("path segment"))
      // reads get the same loud error, not a confusing FileNotFound
      val er = intercept[IllegalArgumentException](
        spark.read.format("graft.sources.SnapshotSource")
          .option("root", root).option("tag", "x/y").option("table", "t").load())
      assert(er.getMessage.contains("path segment"))
    } finally SessionToken.deleteDir(root)
  }

  test("export rejects slashed / traversal PARENT tags before reading any manifest") {
    // export(parent=Some("..")) would readManifest a traversal-shaped
    // path outside the root and inherit ITS file entries into the newly
    // committed manifest (advice r15) — the guard must fire first.
    // The decoy manifest ".." resolves to lives in OUR OWN outer temp
    // dir (export root = a subdirectory), never the shared system temp
    // dir, so the whole tree is cleaned in finally (advice r16).
    val outer = Files.createTempDirectory("snap_guard_p").toString
    try {
      val root = s"$outer/export_root"
      Files.createDirectory(java.nio.file.Paths.get(root))
      // plant a readable manifest where ".." would land, so a missing
      // guard manifests as silent inheritance, not a clean FileNotFound
      Snapshot.export(spark, Map("n" -> nation), outer, "escape_parent")
      for (parent <- Seq("..", "x/y", ".", "", "x\\y")) {
        val e = intercept[IllegalArgumentException](
          Snapshot.export(spark, Map("n" -> nation), root, "ok", parent = Some(parent)))
        assert(e.getMessage.contains("parent tag"), s"parent '$parent': ${e.getMessage}")
      }
      // the guard fired before ANY file landed under this root
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(fs.listStatus(new org.apache.hadoop.fs.Path(root)).isEmpty,
        "a rejected export must leave nothing behind")
    } finally SessionToken.deleteDir(outer)
  }

  test("the hazard is real: an unlisted nested manifest's files ARE vacuum bait") {
    // construct the pre-guard state by hand (manifest at depth 2) and
    // show listTags misses it — exactly why the guard must exist
    val root = Files.createTempDirectory("snap_guard_h").toString
    try {
      Snapshot.export(spark, Map("n" -> nation), root, "good")
      val nested = new org.apache.hadoop.fs.Path(s"$root/x/y")
      val fs = nested.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.mkdirs(nested)
      // a data file a nested manifest would reference
      nation.limit(3).write.mode("overwrite").parquet(s"$root/x/y/n/g-1")
      assert(Snapshot.listTags(spark, root) == Seq("good"),
        "depth-1 listing must not see the nested dir — that IS the hazard")
      val swept = Snapshot.vacuum(spark, root)
      assert(swept.nonEmpty && swept.forall(_.contains("/x/y/")),
        s"vacuum must sweep the unlisted nested files (and only them): $swept")
    } finally SessionToken.deleteDir(root)
  }
}
