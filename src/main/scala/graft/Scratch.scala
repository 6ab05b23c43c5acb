package graft

import org.apache.spark.sql.SparkSession

object Scratch {
  def main(a: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // shared conf block (r22, ADVICE r21): a Scratch steady-state
    // number is only comparable to a Bench slot if both sessions run
    // the same confs — GraftSession keeps them atomic
    val s = GraftSession.builder(cpus).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    s.range(1000000L).selectExpr("sum(id)").collect()
    s.range(1000L).write.mode("overwrite").format("noop").save() // warm the noop write path too
    val names = if (a.nonEmpty) a.toSeq else Seq("q_dedup_clusters")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    for (n <- names; r <- 1 to reps) {
      val t = System.nanoTime()
      // same forcing as Bench (noop sink prices every output column);
      // the frame is built ONCE per rep — iterative queries do real
      // driver-side work (checkpoint loops, bounded collects) during
      // construction, which must be timed once, not twice — and rows
      // are counted on the SAME frame OUTSIDE the timed region
      val frame = SparkEntry.queries(n)(s, dir)
      frame.write.mode("overwrite").format("noop").save()
      val sec = (System.nanoTime() - t) / 1e9
      val c = frame.count()
      // Bench parity: free the checkpoint blocks this rep pinned so
      // later reps measure steady state, not accumulated pressure
      s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      println(f"$n run$r $sec%.2fs rows=$c")
    }
    s.stop()
  }
}
