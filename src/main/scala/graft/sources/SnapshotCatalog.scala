package graft.sources

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Catalog plugin for snapshot roots: registers a snapshot tree so SQL
  * users query it by NAME — no hand-made temp views, no options plumbing:
  *
  * {{{
  * spark.conf.set("spark.sql.catalog.snap", classOf[SnapshotCatalog].getName)
  * spark.conf.set("spark.sql.catalog.snap.root", "/data/snapshots")
  * spark.sql("SELECT count(*) FROM snap.v3.orders")       // tag v3
  * df.writeTo("snap.v3.orders").append()                  // DSv2 write path
  * }}}
  *
  * Identifier mapping: namespace = the snapshot TAG, table name = the
  * table inside that snapshot's manifest (`snap.<tag>.<table>`), mirroring
  * the options path's (root, tag, table) coordinates.
  *
  * FRESHNESS INVARIANT — the reason this is safe where caching the
  * options-path [[SnapshotSource]] provider would not be: every
  * `loadTable` call performs ONE fresh manifest resolution and captures
  * it whole (schema + file list + row count) in the returned
  * [[SnapshotTable]]. Spark instantiates ONE catalog instance per session
  * and calls `loadTable` during every query's analysis, so a snapshot
  * re-exported under the same tag between two queries is picked up by the
  * second query — there is no provider-level memo to go stale (the memo
  * the options path needs exists only to pair inferSchema with getTable,
  * two calls this API folds into one). Schema and files can never be
  * paired across two different manifest versions by construction.
  *
  * Writes go through the loaded table's DSv2 write path (same
  * [[SnapshotWriteBuilder]] as the options path), so
  * `INSERT INTO snap.<tag>.<table>` / `writeTo(...).append()` append to
  * the tag's manifest atomically. DDL (CREATE/ALTER/DROP) is rejected:
  * snapshot manifests are created by the export/write pipeline
  * ([[Snapshot.export]]), not by SQL DDL.
  */
class SnapshotCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var root: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = options.get("root")
    require(root != null,
      s"catalog '$name' needs spark.sql.catalog.$name.root = <snapshot root>")
  }

  override def name(): String = catalogName

  private def spark: SparkSession = SparkSession.active

  private def tagOf(ident: Identifier): String = {
    require(ident.namespace.length == 1,
      s"snapshot identifiers are <tag>.<table>, got ${ident.toString}")
    ident.namespace.head
  }

  private def noSuchTable(ident: Identifier): Nothing =
    throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
      Seq(catalogName) ++ ident.namespace :+ ident.name)

  /** ONE fresh manifest resolution per call (freshness invariant). */
  override def loadTable(ident: Identifier): Table = {
    val tag = tagOf(ident)
    val manifest =
      try Snapshot.readManifest(spark, root, tag)
      catch { case _: java.io.FileNotFoundException => noSuchTable(ident) }
    manifest.tables.get(ident.name) match {
      case Some(entry) =>
        val schema = entry.schemaJson
          .map(DataType.fromJson(_).asInstanceOf[StructType])
          .getOrElse(throw new IllegalArgumentException(
            s"snapshot entry for ${ident.name} predates schemaJson manifests"))
        SnapshotTable(ident.name, schema, entry.files,
          entry.files.map(_.size).sum, entry.rows, root, tag)
      case None => noSuchTable(ident)
    }
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    require(namespace.length == 1, s"expected <tag>, got ${namespace.mkString(".")}")
    val manifest =
      try Snapshot.readManifest(spark, root, namespace.head)
      catch {
        case _: java.io.FileNotFoundException =>
          throw new org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException(
            Seq(catalogName) ++ namespace)
      }
    manifest.tables.keys.toArray.sorted.map(Identifier.of(namespace, _))
  }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException(
      "snapshot tables are created by the export/write pipeline, not SQL DDL")

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("snapshot manifests are immutable to DDL")

  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException(
      "drop snapshots via Snapshot.retain/vacuum, not SQL DDL")

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("snapshot manifests are immutable to DDL")

  // namespaces = the snapshot tags currently on disk (fresh listing per call)
  override def listNamespaces(): Array[Array[String]] =
    Snapshot.listTags(spark, root).map(Array(_)).toArray

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    if (namespace.isEmpty) listNamespaces()
    else if (namespace.length == 1 && namespaceExists(namespace)) Array.empty
    else throw new org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException(
      Seq(catalogName) ++ namespace)
  }

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.length == 1 && Snapshot.listTags(spark, root).contains(namespace.head)

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] =
    if (namespaceExists(namespace)) new util.HashMap[String, String]()
    else throw new org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException(
      Seq(catalogName) ++ namespace)

  override def createNamespace(namespace: Array[String],
                               metadata: util.Map[String, String]): Unit =
    throw new UnsupportedOperationException(
      "snapshot tags are created by the export/write pipeline, not SQL DDL")

  override def alterNamespace(namespace: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("snapshot tags are immutable to DDL")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean =
    throw new UnsupportedOperationException(
      "drop snapshots via Snapshot.retain/vacuum, not SQL DDL")
}
