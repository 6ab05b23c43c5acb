package graft

import org.apache.spark.sql.functions._

/** The tripwire must stay SILENT on every real fixture generation it
  * claims to handle, and FIRE with a named line on a synthetic drift —
  * otherwise it is either noise or a false sense of safety.
  */
class FixtureDriftSpec extends SparkSpec {

  test("silent on the real fixtures (all SFs)") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val d = graft.sources.Fixtures.drift(spark, dir)
      assert(d.isEmpty, s"unexpected drift reported for $dir:\n${d.mkString("\n")}")
    }
  }

  test("fires on a synthetic type drift, missing column, and extra column") {
    val dir = java.nio.file.Files.createTempDirectory("drifted_fixtures").toString
    // clone the real tables so only the deliberate drift differs
    for (t <- graft.sources.Fixtures.expected.keys if t != "events" && t != "documents")
      spark.read.parquet(s"$sf/$t.parquet")
        .coalesce(1).write.parquet(s"$dir/$t.parquet")
    // events: ts re-typed to string (an encoding no seam handles)
    graft.sources.Tables.events(spark, sf)
      .withColumn("ts", col("ts").cast("string"))
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    // documents: drop one column, add one
    spark.read.parquet(s"$sf/documents.parquet")
      .drop("n_chars").withColumn("extra_col", lit(1))
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val d = graft.sources.Fixtures.drift(spark, dir)
    assert(d.exists(m => m.contains("table=events") && m.contains("column=ts")
      && m.contains("TYPE DRIFT")), d.mkString("\n"))
    assert(d.exists(m => m.contains("table=documents") && m.contains("column=n_chars")
      && m.contains("MISSING")), d.mkString("\n"))
    assert(d.exists(m => m.contains("table=documents") && m.contains("column=extra_col")
      && m.contains("UNEXPECTED")), d.mkString("\n"))
    // nothing spurious about the untouched tables
    assert(!d.exists(_.contains("table=lineitem")), d.mkString("\n"))
    SessionToken.deleteDir(dir)
  }

  test("fires UNREADABLE on an absent table") {
    val dir = java.nio.file.Files.createTempDirectory("empty_fixtures").toString
    val d = graft.sources.Fixtures.drift(spark, dir)
    assert(d.exists(m => m.contains("table=region") && m.contains("UNREADABLE")))
    SessionToken.deleteDir(dir)
  }
}
