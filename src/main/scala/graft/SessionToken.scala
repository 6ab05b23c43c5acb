package graft

import org.apache.spark.sql.SparkSession

/** Stable unique token per SparkSession instance, for memo keys.
  *
  * `System.identityHashCode` is NOT unique over a process lifetime: after
  * a session is stopped and GC'd, a new session can alias the same hash
  * and be served the old session's memoized temp dirs / catalog tables.
  * A `WeakHashMap` keyed on the session object identity hands out a fresh
  * UUID per live session and lets entries vanish with the session.
  */
object SessionToken {
  private val tokens =
    new java.util.WeakHashMap[SparkSession, String]()

  def apply(s: SparkSession): String = tokens.synchronized {
    var t = tokens.get(s)
    if (t == null) {
      t = java.util.UUID.randomUUID().toString
      tokens.put(s, t)
    }
    t
  }

  /** Tokens whose session object is still weakly reachable. A token
    * absent from this set belongs to a dead (stopped + GC'd) session —
    * memo maps keyed on tokens use this to evict stale entries and
    * reclaim their temp dirs in a long-lived JVM cycling many sessions.
    */
  def liveTokens: Set[String] = tokens.synchronized {
    import scala.jdk.CollectionConverters._
    tokens.values.asScala.toSet
  }

  /** Evict entries of a token-keyed memo map whose session is gone,
    * running `cleanup` on each removed value (delete temp dirs, drop
    * catalog tables via the caller's live session).
    */
  def sweep[V](memo: scala.collection.concurrent.TrieMap[(String, String), V])(
      cleanup: V => Unit): Unit = {
    val live = liveTokens
    memo.keys.filterNot(k => live.contains(k._1))
      .foreach(k => memo.remove(k).foreach(v => cleanup(v)))
  }

  /** Best-effort recursive delete for memoized temp dirs. The single
    * shared implementation — `Files.walk` returns a Stream holding open
    * directory handles, so it must be closed, not just drained.
    */
  def deleteDir(path: String): Unit = {
    val root = java.nio.file.Paths.get(path)
    if (java.nio.file.Files.exists(root)) {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(root)
      try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .iterator().asScala.foreach(p => try java.nio.file.Files.deleteIfExists(p) catch {
          case _: java.io.IOException => ()
        })
      finally walk.close()
    }
  }
}
