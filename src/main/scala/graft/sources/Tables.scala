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
  def events(s: SparkSession, dir: String): DataFrame    = read(s, dir, "events")
  def documents(s: SparkSession, dir: String): DataFrame = read(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = read(s, dir, "embeddings")
}
