package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  /** JSON string escape for the oracle_sql.json / queries.json dumps:
    * backslash, quote, and ALL control chars (<0x20) — a tab or CR in
    * builder-authored SQL would otherwise make the driver's json.load
    * fail and silently zero the round's correctness. Round-trip-tested
    * against a real JSON parser in VerifyEscapeSpec (r12 probe).
    */
  private[graft] def jsonEscape(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def main(args: Array[String]): Unit = {
    // args: <sfDir> <outDir> [queryName ...] — names (builder-side
    // iteration aid) restrict the dump; the driver passes exactly two.
    val Array(sfDir, outDir) = args.take(2)
    val only = args.drop(2).toSet
    val unknown = only.diff(SparkEntry.queries.keySet)
    if (unknown.nonEmpty) {
      // a typo'd name would otherwise dump nothing and exit 0 — and a
      // stale result dir from a prior run would then read as green
      System.err.println(s"[verify] unknown query name(s): ${unknown.mkString(", ")}")
      sys.exit(2)
    }
    // Same serial-run lockout as Bench (r13, VERDICT r12 item 4): the
    // driver gets ONE Verify run per round, and a bench co-running on
    // this host would surface as spurious per-query `err` entries and
    // zero the round's correctness the same way an overlapped bench
    // pair contaminated both totals in r12.
    RunLock.acquire("verify")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // shared conf block (r22, ADVICE r21): Verify had drifted from the
    // other mains (no explicit AQE line — correct only by upstream
    // default); GraftSession makes the bench/verify confs atomic, so
    // the plans this run certifies are the plans Bench times
    val spark = GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // fixture-drift tripwire: name any unhandled input encoding ONCE,
    // up front, instead of letting it surface as N scattered per-query
    // failures (the r8 events drift failure mode)
    graft.sources.Fixtures.report(spark, sfDir)
    // FULL runs start from a clean slate: a query that fails before its
    // overwrite (analysis error) must leave NO result dir — a stale dir
    // from the previous run would otherwise be compared as fresh and
    // certify a broken query green. Partial runs (`only`) deliberately
    // keep the other queries' dumps.
    if (only.isEmpty) SessionToken.deleteDir(outDir)
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // drop blocks the finished query persisted (localCheckpoints) —
      // same single-JVM hygiene as Bench: 168 dumps share this session
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    def q(s: String): String = jsonEscape(s)
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // the COMPLETE inventory, so the checker can flag a query whose dump
    // is missing even when it has no oracle entry (a failed no-oracle
    // query was previously invisible)
    Files.writeString(Paths.get(s"$outDir/queries.json"),
      SparkEntry.queries.keys.toSeq.sorted.map(q).mkString("[", ",", "]"))
    spark.stop()
  }
}
