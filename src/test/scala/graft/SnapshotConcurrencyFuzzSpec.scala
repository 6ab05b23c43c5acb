package graft

import java.nio.file.Files
import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

import org.apache.spark.sql.functions._
import graft.sources.Snapshot

/** Concurrency fuzz of the DSv2 commit path (round-16 roadmap probe):
  * the manifest commit is a read-modify-write under
  * `SnapshotBatchWrite.commitLock`, so N in-process writers hammering
  * ONE tag must lose NOTHING — not a row, not a table entry, not a txn
  * ledger record. The race suites pin specific two-party interleaves;
  * this spec pins the lock's lost-update protection under real
  * many-thread contention, where an unserialized read-modify-write
  * loses updates with near-certainty (the kill mutant is exactly
  * "remove the commitLock.synchronized": with 8 concurrent committers
  * two commits read the same base manifest and the later swap silently
  * drops the earlier one's files — or the generation precondition
  * turns it into a loud retry storm; either way this spec fails).
  */
class SnapshotConcurrencyFuzzSpec extends SparkSpec {

  private def append(root: String, table: String, app: String, version: Long,
                     rows: Long): Unit = {
    val df = spark.range(rows).select(
      col("id"), concat(lit(s"$table-"), col("id")).as("payload"))
    df.write.format("graft.sources.SnapshotSource")
      .option("root", root).option("tag", "fuzz").option("table", table)
      .option("schema", df.schema.json)
      .option("txnAppId", app).option("txnVersion", version.toString)
      .mode("append").save()
  }

  test("8 writers x 3 commits on DISTINCT tables of one tag: every entry survives") {
    val root = Files.createTempDirectory("snap_fuzz_tables").toString
    val pool = Executors.newFixedThreadPool(8)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val work = (0 until 8).map { t =>
        Future { (1L to 3L).foreach(v => append(root, s"t$t", s"app$t", v, 5L)) }
      }
      Await.result(Future.sequence(work), 5.minutes)
      val manifest = Snapshot.readManifest(spark, root, "fuzz")
      assert(manifest.tables.keySet == (0 until 8).map(t => s"t$t").toSet,
        s"a concurrent commit dropped a table entry: ${manifest.tables.keySet}")
      for (t <- 0 until 8) {
        val e = manifest.tables(s"t$t")
        assert(e.rows == 15L, s"t$t lost rows: ${e.rows} (3 appends x 5 rows expected)")
        assert(e.txns == Map(s"app$t" -> 3L), s"t$t ledger lost progress: ${e.txns}")
        val back = spark.read.format("graft.sources.SnapshotSource")
          .option("root", root).option("tag", "fuzz").option("table", s"t$t").load()
        assert(back.count() == 15L, s"t$t data files lost (manifest said 15)")
      }
      // the generation chain counted every commit exactly once
      assert(manifest.generation == 24L - 1L,
        s"24 commits must land generations 0..23, got ${manifest.generation}")
    } finally {
      pool.shutdown()
      SessionToken.deleteDir(root)
    }
  }

  test("8 writers x 2 commits on the SAME table: rows and ledgers all land") {
    val root = Files.createTempDirectory("snap_fuzz_one").toString
    val pool = Executors.newFixedThreadPool(8)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val work = (0 until 8).map { t =>
        Future { (1L to 2L).foreach(v => append(root, "shared", s"w$t", v, 3L)) }
      }
      Await.result(Future.sequence(work), 5.minutes)
      val e = Snapshot.readManifest(spark, root, "fuzz").tables("shared")
      assert(e.rows == 48L, s"lost rows under contention: ${e.rows} (8x2x3 expected)")
      assert(e.txns == (0 until 8).map(t => s"w$t" -> 2L).toMap,
        s"a writer's ledger progress was lost: ${e.txns}")
      val back = spark.read.format("graft.sources.SnapshotSource")
        .option("root", root).option("tag", "fuzz").option("table", "shared").load()
      assert(back.count() == 48L, "committed data files lost")
    } finally {
      pool.shutdown()
      SessionToken.deleteDir(root)
    }
  }
}
