package graft

import org.apache.spark.sql.SparkSession

object Scratch {
  def main(a: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // r21 (optimization round; guide §3.1/§9): allow the planner to pick
      // a shuffled hash join where its size conditions hold instead of
      // always preferring sort-merge — skips both sides' sorts; the
      // hint-pinned SMJ demos (q_join_sortmerge/bucketed) are unaffected.
      // Env-parameterized so the local default is A/B-able in one window
      // and a deployment can revert to sort-merge-only under memory
      // pressure (OPTIMIZATION_r21.md records the measurement).
      .config("spark.sql.join.preferSortMergeJoin",
        sys.env.getOrElse("SPARK_GRAFT_PREFER_SMJ", "false"))
      // r21: companion AQE knob — convert a planned sort-merge join to a
      // shuffled hash join at RUNTIME when every post-shuffle partition
      // of the build side is under this size (default 0 = off upstream).
      // This reaches the joins the plan-time preference cannot: inputs
      // with unknown stats (localCheckpoint'd RDDs in the iterative
      // graph/cluster operators) get real sizes only after the shuffle.
      // Bounded per-partition, so the hash map is memory-safe by
      // construction; same-window A/B in OPTIMIZATION_r21.md.
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
        sys.env.getOrElse("SPARK_GRAFT_SHJ_LOCAL", "64m"))
      .config("spark.sql.session.timeZone", "UTC") // match Bench/Verify: events NTZ cast is TZ-sensitive
      .config("spark.ui.enabled", "false")
      .getOrCreate()
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
