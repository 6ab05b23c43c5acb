package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** A DSv2 append whose schema differs from the entry's must fail
  * loudly at commit. The provider serves external metadata, so Spark
  * hands the query's schema straight through without validating it
  * against the entry — probed pre-fix: a wider append COMMITTED, the
  * manifest stamped the new schema over the old files, `count()` still
  * worked (pruned scan), and the first read touching the new column
  * died mid-scan with an executor InvalidRecordException. The
  * commit-time check turns that silent corruption into a named error;
  * overwrite stays the schema-evolution path.
  */
class SchemaDriftAppendProbe extends SparkSpec {
  private def write(root: String, df: org.apache.spark.sql.DataFrame,
                    mode: String): Unit =
    df.write.format("graft.sources.SnapshotSource")
      .option("root", root).option("tag", "t").option("table", "n")
      .option("schema", df.schema.json).mode(mode).save()

  private def readBack(root: String) =
    spark.read.format("graft.sources.SnapshotSource")
      .option("root", root).option("tag", "t").option("table", "n").load()

  test("appending a drifted schema fails loudly; the entry stays readable as committed") {
    val root = Files.createTempDirectory("snap_drift").toString
    val v1 = Tables.nation(spark, sf).select(col("n_nationkey"), col("n_name"))
    write(root, v1, "append")
    val wider = v1.withColumn("extra", lit(42L))
    val e = intercept[Throwable] { write(root, wider, "append") }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(20).toSeq
    assert(chain(e).exists(_.getMessage != null)
      && chain(e).exists(t => Option(t.getMessage).exists(_.contains("schema mismatch"))),
      s"expected a commit-time schema-mismatch error, got: $e")
    // the committed entry is intact and fully readable
    val back = readBack(root)
    assert(back.schema.fieldNames.toSeq == Seq("n_nationkey", "n_name"))
    assert(back.count() == v1.count())
    // a retyped column is the same hazard, not just a widened one
    val retyped = v1.withColumn("n_nationkey", col("n_nationkey").cast("long"))
    val e2 = intercept[Throwable] { write(root, retyped, "append") }
    assert(chain(e2).exists(t => Option(t.getMessage).exists(_.contains("schema mismatch"))))
    // the refused commits' executor files must not linger: Spark aborts
    // the batch on commit failure (abort() deletes the part files), and
    // anything a crash could still strand is exactly vacuum's orphan
    // contract — so after a zero-grace vacuum the table dir holds only
    // the committed generation's files
    graft.sources.Snapshot.vacuum(spark, root)
    val committed = graft.sources.Snapshot.readManifest(spark, root, "t")
      .tables("n").files.map(_.path).toSet
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val onDisk = {
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(root), true)
      val b = Set.newBuilder[String]
      while (it.hasNext) { val st = it.next()
        if (st.getPath.getName.endsWith(".parquet"))
          b += fs.makeQualified(st.getPath).toString }
      b.result()
    }
    assert(onDisk == committed.map(p =>
      fs.makeQualified(new org.apache.hadoop.fs.Path(p)).toString),
      s"refused appends left stray files: ${onDisk.size} on disk vs ${committed.size} committed")
  }

  test("cross-writer: a DSv2 append onto an EXPORT-created entry passes the schema check") {
    // the commit-time check compares against the schemaJson the export
    // recorded — a same-shape append from the other writer must not be
    // falsely rejected, and the generation chain must continue
    val root = java.nio.file.Files.createTempDirectory("snap_xwriter").toString
    val v1 = Tables.nation(spark, sf).select(col("n_nationkey"), col("n_name"))
    graft.sources.Snapshot.export(spark, Map("n" -> v1), root, "t")
    v1.write.format("graft.sources.SnapshotSource")
      .option("root", root).option("tag", "t").option("table", "n")
      .option("schema", v1.schema.json).mode("append").save()
    assert(readBack(root).count() == v1.count() * 2)
    assert(graft.sources.Snapshot.readManifest(spark, root, "t").generation == 1L)
    // and a drifted cross-writer append is rejected like any other
    val wider = v1.withColumn("extra", lit(1L))
    val e = intercept[Throwable] { write(root, wider, "append") }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("|")
    assert(msgs.contains("schema mismatch"), msgs)
  }

  test("matching-schema append still works; overwrite is the schema-evolution path") {
    val root = Files.createTempDirectory("snap_drift_ok").toString
    val v1 = Tables.nation(spark, sf).select(col("n_nationkey"), col("n_name"))
    write(root, v1, "append")
    write(root, v1, "append")
    assert(readBack(root).count() == v1.count() * 2)
    val wider = v1.withColumn("extra", lit(42L))
    write(root, wider, "overwrite")
    val back = readBack(root)
    assert(back.schema.fieldNames.toSeq == Seq("n_nationkey", "n_name", "extra"))
    assert(back.count() == v1.count())
    assert(back.select("extra").distinct().head().getLong(0) == 42L)
  }
}
