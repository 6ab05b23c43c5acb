package org.apache.spark.sql

/** Test-only `private[sql]` bridge: CatalogManager.reset() is the only
  * way to EVICT a cached catalog plugin instance (spark.conf.unset only
  * prevents fresh instantiation — the session keeps the already-built
  * instance cached under its name). Used by catalog fuzz cleanup so a
  * plugin pointing at a deleted temp root cannot poison a later
  * same-name lookup (advice r17).
  */
object TestCatalogShim {
  def resetCatalogManager(s: SparkSession): Unit =
    s.sessionState.catalogManager.reset()
}
