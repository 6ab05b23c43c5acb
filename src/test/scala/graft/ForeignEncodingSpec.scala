package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.{Snapshot, Tables}

/** r12 decode-envelope probe (SURVEY §7.9.9 round-13 item a, closed in
  * the round tail): the DSv2 row reader decodes through parquet-mr's
  * ParquetReader + GroupReadSupport, so page/encoding variants are the
  * column readers' problem, not ours — but that claim deserves a probe,
  * because a "foreign" writer configuration (PARQUET_2_0 writer with
  * DELTA_BINARY_PACKED/DELTA_BYTE_ARRAY pages, or dictionary-heavy
  * v1 pages) is exactly what lands when another team's Spark job with
  * different parquet conf feeds a snapshot root. Both probes compare
  * the custom reader's rows (values AND filter-pushdown path) against
  * Spark's own vectorized reader over the SAME file.
  */
class ForeignEncodingSpec extends SparkSpec {

  /** Build a one-table manifest over exactly `dir`'s part files. */
  private def manifest(root: String, dir: String,
                       schema: org.apache.spark.sql.types.StructType): Unit = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(_.getPath.getName.endsWith(".parquet"))
      .map(st => Snapshot.FileEntry(st.getPath.toString, st.getLen))
      .sortBy(_.path).toSeq
    assert(files.nonEmpty)
    Snapshot.writeManifest(spark, root, Snapshot.Manifest("v1", None,
      Map("t" -> Snapshot.TableEntry(files, -1L, "probe",
        schemaJson = Some(schema.json)))))
  }

  private def dsv2(root: String) =
    spark.read.format("graft.sources.SnapshotSource")
      .option("root", root).option("tag", "v1").option("table", "t").load()

  private def probe(writerOpts: Map[String, String], label: String): Unit = {
    // The projection deliberately includes a decimal(12,2) and a DATE:
    // the fixture's orders carries neither (totalprice is double,
    // orderdate is timestamp), and the r13 mutation-smoke proved the
    // original all-long/double/string/timestamp projection let decode
    // mutants in the DecimalType and DateType branches survive — yet
    // INT64-backed decimals and INT32 dates are exactly the columns a
    // PARQUET_2_0 foreign writer puts through DELTA_BINARY_PACKED.
    val src = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderdate"),
        col("o_totalprice").cast("decimal(12,2)").as("o_price_dec"),
        col("o_orderdate").cast("date").as("o_date"))
    val dir = Files.createTempDirectory(s"enc_$label").toString + "/data"
    writerOpts.foldLeft(src.coalesce(1).write)((w, kv) => w.option(kv._1, kv._2))
      .parquet(dir)
    val root = Files.createTempDirectory(s"encroot_$label").toString
    manifest(root, dir, src.schema)
    val native = spark.read.parquet(dir)
    // full-scan value equality against Spark's own reader
    assert(dsv2(root).exceptAll(native).count() == 0 &&
      native.exceptAll(dsv2(root)).count() == 0,
      s"$label: custom reader diverges from Spark's on a full scan")
    // pushdown path: a selective filter + pruned projection decodes the
    // same rows (row-group/page filters run inside parquet-mr here)
    val f = dsv2(root).where(col("o_orderkey") < 500)
      .select(col("o_orderkey"), col("o_orderstatus"))
    val nf = native.where(col("o_orderkey") < 500)
      .select(col("o_orderkey"), col("o_orderstatus"))
    assert(f.exceptAll(nf).count() == 0 && nf.exceptAll(f).count() == 0,
      s"$label: filtered/pruned read diverges")
  }

  test("PARQUET_2_0 pages (DELTA_* encodings) decode identically to Spark's reader") {
    probe(Map("parquet.writer.version" -> "PARQUET_2_0"), "v2")
  }

  test("dictionary-heavy v1 pages (tiny dictionary page size forces fallback mid-column) decode identically") {
    probe(Map("parquet.enable.dictionary" -> "true",
      "parquet.dictionary.page.size" -> "1024"), "dict")
  }
}
