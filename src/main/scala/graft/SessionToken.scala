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
}
