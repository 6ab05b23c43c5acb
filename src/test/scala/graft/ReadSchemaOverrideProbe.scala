package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables

/** A user `.schema(...)` on a DSv2 READ of an existing entry must be
  * rejected at scan build. The provider serves external metadata (the
  * write path needs that channel), so Spark hands a user read schema
  * straight through — probed pre-fix: a phantom column died mid-scan
  * with an executor InvalidRecordException, and a re-typed column
  * (int→bigint) would read wrong shapes silently. The committed
  * snapshot schema is authoritative on reads; overwrite-based schema
  * evolution is unaffected (write path, commit-time check).
  */
class ReadSchemaOverrideProbe extends SparkSpec {

  private def export(root: String): org.apache.spark.sql.DataFrame = {
    val v1 = Tables.nation(spark, sf).select(col("n_nationkey"), col("n_name"))
    v1.write.format("graft.sources.SnapshotSource")
      .option("root", root).option("tag", "t").option("table", "n")
      .option("schema", v1.schema.json).mode("append").save()
    v1
  }

  test("a drifted user read schema fails loudly at scan build, not mid-scan") {
    val root = Files.createTempDirectory("snap_readschema").toString
    export(root)
    val wrong = StructType(Seq(StructField("n_nationkey", LongType),
      StructField("bogus", StringType)))
    val e = intercept[Throwable] {
      spark.read.format("graft.sources.SnapshotSource")
        .schema(wrong)
        .option("root", root).option("tag", "t").option("table", "n").load()
        .collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(20).toSeq
    assert(chain(e).exists(t => Option(t.getMessage).exists(_.contains("authoritative"))),
      s"expected the committed-schema rejection, got: $e")
  }

  test("a user read schema EQUAL to the committed one is harmless") {
    val root = Files.createTempDirectory("snap_readschema_ok").toString
    val v1 = export(root)
    val back = spark.read.format("graft.sources.SnapshotSource")
      .schema(v1.schema)
      .option("root", root).option("tag", "t").option("table", "n").load()
    assert(back.count() == v1.count())
  }
}
