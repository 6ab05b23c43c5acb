package graft

import org.apache.spark.sql.functions._

/** The tripwire must stay SILENT on every real fixture generation it
  * claims to handle, and FIRE with a named line on a synthetic drift —
  * otherwise it is either noise or a false sense of safety.
  */
class FixtureDriftSpec extends SparkSpec {

  test("silent on the real fixtures (all SFs, incl. Bench's default sf0.1)") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")) {
      val d = graft.sources.Fixtures.drift(spark, dir)
      assert(d.isEmpty, s"unexpected drift reported for $dir:\n${d.mkString("\n")}")
    }
  }

  test("drift() restores the nanosAsLong conf it sets for the footer reads") {
    // note: getOption on a registered conf returns the DEFAULT
    // ("false") even when unset, so assert on the effective value —
    // what matters is the legacy mapping is not left enabled
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    spark.conf.unset(key)
    graft.sources.Fixtures.drift(spark, sf)
    assert(spark.conf.get(key) == "false",
      "drift() leaked nanosAsLong=true into the session")
    // and an explicit pre-existing true must survive the restore
    spark.conf.set(key, "true")
    graft.sources.Fixtures.drift(spark, sf)
    assert(spark.conf.get(key) == "true")
    spark.conf.unset(key)
  }

  test("fires on a synthetic type drift, missing column, and extra column") {
    val dir = java.nio.file.Files.createTempDirectory("drifted_fixtures").toString
    try {
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
    } finally SessionToken.deleteDir(dir)
  }

  test("fires on an embedding-dimension drift (invisible to schemas)") {
    val dir = java.nio.file.Files.createTempDirectory("dim_drifted").toString
    try {
      for (t <- graft.sources.Fixtures.expected.keys if t != "embeddings" && t != "events")
        spark.read.parquet(s"$sf/$t.parquet")
          .coalesce(1).write.parquet(s"$dir/$t.parquet")
      graft.sources.Tables.events(spark, sf).coalesce(1).write.parquet(s"$dir/events.parquet")
      // same schema (list<float>), half the dimensionality
      spark.read.parquet(s"$sf/embeddings.parquet")
        .withColumn("embedding", slice(col("embedding"), 1, 32))
        .coalesce(1).write.parquet(s"$dir/embeddings.parquet")
      val d = graft.sources.Fixtures.drift(spark, dir)
      assert(d.exists(m => m.contains("DIM DRIFT") && m.contains("found 32")),
        d.mkString("\n"))
    } finally SessionToken.deleteDir(dir)
  }

  test("fires on a VALUE-domain drift (footer stats, invisible to schemas and row counts)") {
    // The r19 regen lesson: a distribution change (p_retailprice
    // collapsing to a 100-wide band) degenerated a plan 15x with zero
    // schema drift. The domain pass names a regen whose VALUES leave a
    // documented handling envelope — checked from footer min/max only.
    val dir = java.nio.file.Files.createTempDirectory("domain_drifted").toString
    try {
      for (t <- graft.sources.Fixtures.expected.keys if t != "embeddings" && t != "events")
        spark.read.parquet(s"$sf/$t.parquet")
          .coalesce(1).write.parquet(s"$dir/$t.parquet")
      // one embedding component past the quantizer domain (finite, so
      // only finiteEmbedding's silent-drop contract would see it)
      spark.read.parquet(s"$sf/embeddings.parquet")
        .withColumn("embedding",
          when(col("vec_id") === 5L,
            concat(slice(col("embedding"), 1, 63), array(lit(1000.0f))))
            .otherwise(col("embedding")))
        .coalesce(1).write.parquet(s"$dir/embeddings.parquet")
      // one user_id past CountMin.MaxKey (would THROW mid-job)
      graft.sources.Tables.events(spark, sf)
        .withColumn("user_id",
          when(col("event_id") === 1L, lit(Long.MaxValue / 2)).otherwise(col("user_id")))
        .coalesce(1).write.parquet(s"$dir/events.parquet")
      val d = graft.sources.Fixtures.drift(spark, dir)
      assert(d.exists(m => m.contains("table=embeddings") && m.contains("DOMAIN DRIFT")
        && m.contains("1000.0")), d.mkString("\n"))
      assert(d.exists(m => m.contains("table=events") && m.contains("column=user_id")
        && m.contains("DOMAIN DRIFT")), d.mkString("\n"))
      // events.value untouched — exactly the two planted lines, no noise
      assert(d.count(_.contains("DOMAIN DRIFT")) == 2, d.mkString("\n"))
    } finally SessionToken.deleteDir(dir)
  }

  test("fires UNREADABLE on an absent table") {
    val dir = java.nio.file.Files.createTempDirectory("empty_fixtures").toString
    try {
      val d = graft.sources.Fixtures.drift(spark, dir)
      assert(d.exists(m => m.contains("table=region") && m.contains("UNREADABLE")))
    } finally SessionToken.deleteDir(dir)
  }
}
