package graft

import java.nio.file.Files
import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

import graft.sources.{Snapshot, SnapshotCatalog, Tables}

/** Catalog atomicity fuzz (round-16 roadmap probe): SQL readers under
  * a concurrently re-exporting writer must ALWAYS see a complete
  * snapshot — one of the two row counts the writer ever committed,
  * never a torn state, never a missing-manifest window. This is the
  * atomic manifest swap (NIO ATOMIC_MOVE on file:) plus the catalog's
  * whole-capture loadTable, pinned under real contention. The kill
  * mutant is the swap made delete-then-rename with the window held
  * open: readers then hit a manifest-less tag (NoSuchTable) inside the
  * window — exactly the class the scheme-aware swap exists to close.
  */
class SnapshotCatalogFuzzSpec extends SparkSpec {

  test("catalog readers under concurrent re-export always see a complete snapshot") {
    val root = Files.createTempDirectory("snap_cat_fuzz").toString
    spark.conf.set("spark.sql.catalog.snapfz", classOf[SnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.snapfz.root", root)
    val nation = Tables.nation(spark, sf)
    Snapshot.export(spark, Map("nation" -> nation.limit(5)), root, "live")

    val pool = Executors.newFixedThreadPool(5)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    @volatile var stop = false
    val anomalies = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    try {
      val writer = Future {
        // stop in a finally: a writer that THROWS mid-loop must still
        // release the readers — pool.shutdown() does not interrupt
        // running tasks, so a dangling `stop=false` is a hung suite
        // plus an unbounded anomaly queue, not a failed test (advice r16)
        try {
          for (i <- 1 to 12) {
            val rows = if (i % 2 == 0) 5 else 20
            Snapshot.export(spark, Map("nation" -> nation.limit(rows)), root, "live")
          }
        } finally stop = true
      }
      val readers = (0 until 4).map { r =>
        Future {
          var reads = 0
          while (!stop) {
            try {
              val n = spark.sql("SELECT count(*) AS n FROM snapfz.live.nation")
                .head().getLong(0)
              if (n != 5L && n != 20L)
                anomalies.add(s"reader $r saw torn count $n")
            } catch {
              case e: Exception =>
                anomalies.add(s"reader $r: ${e.getClass.getSimpleName}: " +
                  s"${Option(e.getMessage).getOrElse("").take(120)}")
            }
            reads += 1
          }
          reads
        }
      }
      Await.result(writer, 5.minutes)
      val readCounts = Await.result(Future.sequence(readers), 5.minutes)
      assert(readCounts.sum > 20,
        s"fuzz too thin to mean anything: only ${readCounts.sum} reads landed")
      assert(anomalies.isEmpty,
        s"readers saw torn/missing snapshots:\n${anomalies.toArray.mkString("\n")}")
    } finally {
      pool.shutdown()
      // Drop the catalog registration AND evict the cached instance:
      // unset alone only prevents FRESH instantiation — CatalogManager
      // keeps the already-built 'snapfz' plugin (pointing at the
      // deleted root) cached for the session's lifetime, so a later
      // same-name catalog("snapfz") lookup would still return the
      // poisoned instance (advice r17). reset() clears that cache
      // (private[sql] — reached via the test shim).
      spark.conf.unset("spark.sql.catalog.snapfz")
      spark.conf.unset("spark.sql.catalog.snapfz.root")
      org.apache.spark.sql.TestCatalogShim.resetCatalogManager(spark)
      SessionToken.deleteDir(root)
    }
  }
}
