package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.dec

/** Scale rehearsal (SURVEY §7.5): synthetically inflate lineitem ×K
  * via explode(sequence) — unique keys preserved by re-keying — and
  * run the heavy relational shapes, verifying wall-time scales
  * ~linearly and plans keep partial aggregation / broadcast shapes.
  * Prints one JSON line per step.
  */
object ScaleRehearsal {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val k = args.headOption.map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .withColumn("rep", explode(expr(s"sequence(1, $k)")))
      .withColumn("l_orderkey", col("l_orderkey") * k + col("rep"))
      .drop("rep")
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")

    def time(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = df.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"step":"$name","rows":$n,"sec":$sec%.2f,"inflation":$k}""")
    }

    time("inflated_scan")(li.select(col("l_orderkey")))
    time("q1_inflated")(
      li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(dec("l_quantity")).as("sum_qty"), count(lit(1)).as("n")))
    time("join_broadcast_inflated")(
      li.join(broadcast(spark.read.parquet(s"$sfDir/part.parquet")),
        col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand")).agg(count(lit(1))))
    time("topk_inflated")(
      li.orderBy(desc("l_extendedprice"), col("l_orderkey"), col("l_linenumber")).limit(20))

    // n-gram dedup stress: ×K cloned corpus (re-keyed doc_id) means each
    // doc gains K−1 exact near-dups — the candidate-pair set grows ~K²/2
    // per doc while the index build grows ×K; proves the banded dataflow
    // (hash index + size filter + single reused exchange) survives a
    // corpus where near-dup density is pathological, not sparse.
    val docsK = spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("rep", explode(expr(s"sequence(1, $k)")))
      .withColumn("doc_id", col("doc_id") * k + col("rep"))
      .drop("rep")
    val sigUdf = udf((text: String) => graft.operators.NearDup.shingleHashes(text))
    time("ngram_index_inflated")(
      docsK.withColumn("arr", sigUdf(col("text")))
        .select(col("doc_id"), col("lang"),
          size(col("arr")).cast("long").as("sz"), explode(col("arr")).as("shingle")))
    spark.stop()
  }
}
