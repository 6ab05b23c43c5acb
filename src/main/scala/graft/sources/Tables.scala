package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-generated parquet fixtures (TESTDATA.md).
  *
  * One parquet file per table under `sfDir`; schemas are fixed
  * (FIXTURES.md) and come from parquet footers — no inference. All
  * engine queries read through here so the scan layer has a single
  * seam (snapshot sources in graft.sources.Snapshot reuse it).
  */
object Tables {
  private def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, dir: String): DataFrame    = read(s, dir, "region")
  def nation(s: SparkSession, dir: String): DataFrame    = read(s, dir, "nation")
  def customer(s: SparkSession, dir: String): DataFrame  = read(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame  = read(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame      = read(s, dir, "part")
  def orders(s: SparkSession, dir: String): DataFrame    = read(s, dir, "orders")
  def lineitem(s: SparkSession, dir: String): DataFrame  = read(s, dir, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 rejects
    * ([PARQUET_TYPE_ILLEGAL]). Read it as a raw ns long
    * (`nanosAsLong`) and rebuild a µs TimestampType with exact
    * integer division (`div` — a double division would lose precision
    * on ~1.7e18 ns epochs). Matches DuckDB's CAST(ts AS TIMESTAMP)
    * truncation, which oracle SQL must apply on its side too.
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    read(s, dir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, dir: String): DataFrame = read(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = read(s, dir, "embeddings")
}
