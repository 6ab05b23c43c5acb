package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables

/** The landed-footer-schema cache in Tables (VERDICT r15 item 2): each
  * (dir, table) pair infers its footer schema ONCE per JVM and replays
  * it as an explicit read schema afterwards — removing a per-query
  * fixed cost that an elevated driver host window multiplies. The
  * hazards this spec pins:
  *
  *  - KEY COLLAPSE: a cache keyed on table name alone would replay
  *    dir A's schema onto dir B's file — parquet's schema-evolution
  *    semantics then serve SILENT NULLS for B-only columns and hide
  *    A-unknown columns entirely (no error fires). Two same-named
  *    tables with disjoint schemas in two dirs must each read their
  *    own landed schema.
  *  - STALE/WRONG VALUE: the cache must hold what footer inference
  *    actually produced, never a synthetic schema — pinned by value
  *    equality between a cache-hit read and a fresh inference.
  */
class TablesSchemaCacheSpec extends SparkSpec {

  test("cache-hit reads serve the same schema and rows as fresh inference") {
    val fresh = spark.read.parquet(s"$sf/documents.parquet")
    // two consecutive reads: first may populate, second must hit
    Tables.documents(spark, sf)
    val hit = Tables.documents(spark, sf)
    assert(hit.schema == fresh.schema,
      s"cache-hit schema diverged from footer inference:\n${hit.schema}\nvs\n${fresh.schema}")
    assert(hit.count() == fresh.count())
    assert(hit.agg(sum(col("doc_id"))).head().getLong(0) ==
      fresh.agg(sum(col("doc_id"))).head().getLong(0))
  }

  test("the cache is keyed per DIRECTORY: same table name, different schemas") {
    val dirA = Files.createTempDirectory("tbl_cache_a").toString
    val dirB = Files.createTempDirectory("tbl_cache_b").toString
    try {
      import spark.implicits._
      // same table name, DISJOINT schemas — a name-only key replays
      // A's schema onto B and serves silent nulls, never an error
      Seq((1L, "x")).toDF("doc_id", "text")
        .write.mode("overwrite").parquet(s"$dirA/documents.parquet")
      Seq((7L, 42L)).toDF("other_id", "payload")
        .write.mode("overwrite").parquet(s"$dirB/documents.parquet")
      val a = Tables.documents(spark, dirA)
      val b = Tables.documents(spark, dirB)
      assert(a.schema.fieldNames.toSeq == Seq("doc_id", "text"))
      assert(b.schema.fieldNames.toSeq == Seq("other_id", "payload"),
        s"dir B read through dir A's cached schema: ${b.schema}")
      assert(b.head().getLong(0) == 7L && b.head().getLong(1) == 42L)
      // and the hit path (second read per dir) still serves each dir's own
      assert(Tables.documents(spark, dirA).head().getString(1) == "x")
      assert(Tables.documents(spark, dirB).head().getLong(1) == 42L)
    } finally {
      SessionToken.deleteDir(dirA); SessionToken.deleteDir(dirB)
    }
  }

  test("events stays adaptive: the ns fallback path is never cached") {
    // the ns-long landing depends on the per-session nanosAsLong conf;
    // replaying it as an explicit schema into a conf-less session would
    // switch decode paths. The µs fixture caches; a synthetic ns dir
    // must keep going through readMaybeNanos every time (observable:
    // the conf is re-set after an unset on a SECOND read).
    val dir = Files.createTempDirectory("tbl_cache_ns").toString
    try {
      val schema = org.apache.parquet.schema.MessageTypeParser.parseMessageType(
        """message events {
          |  required int64 event_id;
          |  required int64 ts (TIMESTAMP(NANOS, true));
          |  required int64 user_id;
          |}""".stripMargin)
      val conf = new org.apache.hadoop.conf.Configuration()
      org.apache.parquet.hadoop.example.GroupWriteSupport.setSchema(schema, conf)
      val w = org.apache.parquet.hadoop.example.ExampleParquetWriter
        .builder(new org.apache.hadoop.fs.Path(s"$dir/events.parquet"))
        .withConf(conf).withType(schema).build()
      val f = new org.apache.parquet.example.data.simple.SimpleGroupFactory(schema)
      w.write(f.newGroup().append("event_id", 1L)
        .append("ts", 1700000000000000000L).append("user_id", 7L))
      w.close()
      val nanosKey = "spark.sql.legacy.parquet.nanosAsLong"
      spark.conf.unset(nanosKey)
      assert(Tables.events(spark, dir).count() == 1L)
      assert(spark.conf.get(nanosKey) == "true", "fallback must have fired")
      spark.conf.unset(nanosKey)
      // second read: a cached ns-long schema would skip the fallback and
      // leave the conf unset while decoding through the wrong path
      assert(Tables.events(spark, dir).count() == 1L)
      assert(spark.conf.get(nanosKey, "false") == "true",
        "second read bypassed readMaybeNanos — the ns landing was cached")
      spark.conf.unset(nanosKey)
    } finally SessionToken.deleteDir(dir)
  }
}
