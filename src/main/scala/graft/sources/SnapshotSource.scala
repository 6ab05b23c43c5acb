package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.example.data.Group
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.api.ReadSupport
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.parquet.schema.MessageType
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** DataSource V2 face of the snapshot store — the "custom source" of
  * the project north-star: `spark.read.format("graft.sources.SnapshotSource")
  * .option("root", …).option("tag", …).option("table", …)`.
  *
  * The manifest supplies the schema (no footer sniffing on the
  * driver); each manifest file entry becomes one InputPartition, so
  * parallelism follows the snapshot's file layout; the reader applies
  * COLUMN PRUNING by handing parquet a projected read schema
  * (SupportsPushDownRequiredColumns → parquet only materializes the
  * requested columns).
  *
  * Scope: primitive column types incl. timestamp/date (Spark 4 writes
  * TIMESTAMP_MICROS as INT64, which is also Spark's internal form),
  * plus arrays (standard 3-level parquet LIST — covers the embeddings
  * table), structs and maps, recursively composed (array-of-struct,
  * struct-of-array, map values of any supported type) — full coverage
  * of Spark's parquet-writable complex types.
  */
class SnapshotSource extends TableProvider {

  override def supportsExternalMetadata(): Boolean = true

  private def coords(options: CaseInsensitiveStringMap): (String, String, String) = {
    val root = options.get("root")
    val tag = options.get("tag")
    val asOf = options.get("asOf")
    val table = options.get("table")
    require(root != null && table != null && (tag != null || asOf != null),
      "options root, table and one of tag/asOf are required")
    // tag/table become path segments under root; a slashed or
    // traversal-shaped value on a WRITE commits a manifest listTags
    // never sees — whose files vacuum then sweeps as orphans (the
    // catalog path has always rejected these; the options path must
    // too). Guarded here, the single coords chokepoint, so reads get
    // the same loud error instead of a confusing FileNotFound. asOf is
    // a comparison string, not a path — unguarded by design.
    if (tag != null) Snapshot.requireSafeSegment("snapshot tag", tag)
    Snapshot.requireSafeSegment("snapshot table name", table)
    (root, tag, table)
  }

  /** The manifest the options name: the exact `tag`, or — with
    * `asOf` — the snapshot in effect at that point (parent-chain walk
    * from `tag` when both are given, newest catalog tag <= asOf
    * otherwise). None when the snapshot doesn't exist yet — a valid
    * state only for a WRITE creating a new table.
    *
    * Memoized per provider instance, keyed on (root, tag, asOf): Spark
    * calls inferSchema and then getTable on the SAME TableProvider
    * instance for one load, so both see ONE resolution — the parent
    * chain is walked once per table load (not 3-4 times), and a
    * catalog change landing between the two calls (a backfilled tag
    * <= asOf) can no longer pair one snapshot's schema with another
    * snapshot's file list.
    *
    * HARD INVARIANT — memo lifetime is ONE load: getTable TAKES the
    * entry (atomic remove-and-use) when materializing the resolution
    * into the returned SnapshotTable. The format(...).load()/save()
    * path constructs a fresh TableProvider per load today, but this
    * class must stay correct under SEQUENTIAL reuse of one instance
    * (catalog registration): without the take, a manifest updated
    * since — or a memoized None for a table created since — would be
    * served stale, silently. Two hardenings on top of the take
    * (round 8, advice): (1) inferSchema always RE-RESOLVES and
    * overwrites — it never returns a leftover entry, so an earlier
    * load that aborted between inferSchema and getTable cannot feed
    * a later load's schema; (2) entries are stamped with the
    * resolving THREAD id and getTable consumes only a same-thread
    * entry — and leaves other threads' in-flight entries in place —
    * (Spark resolves one load's inferSchema→getTable synchronously on
    * one thread), so an external-metadata load — which skips
    * inferSchema — can never swallow an orphan another thread left
    * behind; (3) a THROWING inferSchema clears its own entry before
    * propagating, so a failed load leaves no same-thread orphan
    * either. The one remaining (theoretical) orphan window is a load
    * whose inferSchema SUCCEEDS but is abandoned before getTable —
    * Spark's load path has no such exit today, and the entry is
    * overwritten by the next inferSchema on the same coords. CONCURRENT loads sharing one instance while
    * the catalog mutates are still NOT protected: Spark's API hands
    * getTable the schema separately from this resolution, so two
    * loads interleaving on one instance could pair one resolution's
    * schema with the other's file list — that usage
    * needs one provider per load, as the stock path guarantees (the
    * catalog path, [[SnapshotCatalog]], sidesteps this class
    * entirely: one fresh manifest resolution per loadTable call).
    */
  private val resolved = scala.collection.mutable.Map
    .empty[(String, String, String), (Long, Option[Snapshot.Manifest])]

  /** One un-memoized manifest resolution (the parent-chain walk). */
  private def resolveManifest(options: CaseInsensitiveStringMap): Option[Snapshot.Manifest] = {
    val (root, tag, _) = coords(options)
    Option(options.get("asOf")) match {
      case Some(a) =>
        Some(Snapshot.resolveAsOf(SparkSession.active, root, a, Option(tag)))
      case None =>
        try Some(Snapshot.readManifest(SparkSession.active, root, tag))
        catch { case _: java.io.FileNotFoundException => None }
    }
  }

  private def manifestFor(options: CaseInsensitiveStringMap): Option[Snapshot.Manifest] = {
    val (root, tag, _) = coords(options)
    val asOf = Option(options.get("asOf"))
    // always a FRESH resolution, overwriting any orphan a previous
    // aborted load left on these coords (memo invariant above)
    val m = resolveManifest(options)
    resolved.synchronized {
      resolved.update((root, tag, asOf.orNull), (Thread.currentThread().getId, m))
    }
    m
  }

  private def entryFor(options: CaseInsensitiveStringMap): Option[Snapshot.TableEntry] =
    manifestFor(options).flatMap(_.tables.get(coords(options)._3))

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    try {
      entryFor(options) match {
        case Some(entry) =>
          entry.schemaJson.map(DataType.fromJson(_).asInstanceOf[StructType]).getOrElse(
            throw new IllegalArgumentException(
              s"snapshot entry for ${coords(options)._3} predates schemaJson manifests"))
        case None if options.get("asOf") != null =>
          // time travel is read-only: a missing table at the resolved
          // snapshot is a read error, never a write-creation target
          throw new IllegalArgumentException(
            s"table ${coords(options)._3} not in the snapshot resolved for " +
              s"asOf='${options.get("asOf")}'")
        case None =>
          // a new table being created by a write: the writer passes the
          // dataframe schema explicitly (save() offers no other channel)
          Option(options.get("schema")).map(DataType.fromJson(_).asInstanceOf[StructType])
            .getOrElse(throw new IllegalArgumentException(
              s"table ${coords(options)._3} not in snapshot ${coords(options)._2}; " +
                "to create it via a write, pass .option(\"schema\", df.schema.json)"))
      }
    } catch {
      case e: Throwable =>
        // a FAILED load must not leave its resolution behind: the memo
        // entry manifestFor just wrote would otherwise be a same-thread
        // orphan that a LATER external-metadata load (which skips
        // inferSchema) on this thread could consume — serving a stale
        // file list under a fresh schema. No getTable follows a throw
        // here, so the entry can never be legitimately claimed.
        val (root, tag, _) = coords(options)
        resolved.synchronized {
          resolved.remove((root, tag, options.get("asOf")))
        }
        throw e
    }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val options = new CaseInsensitiveStringMap(properties)
    val (root, tagOpt, table) = coords(options)
    val asOf = Option(options.get("asOf"))
    // an asOf read pins a HISTORICAL manifest — its tag is the resolved
    // one (for error messages), and the table must be read-only so a
    // time-travel handle can never append into history
    // ATOMIC TAKE of the resolution inferSchema memoized (invariant
    // above): the value is fully captured in the SnapshotTable below
    // (file list, row count, resolved tag), and removing it in the same
    // step means a sequentially-reused provider instance re-resolves on
    // its next load instead of serving a stale manifest. Only a
    // SAME-THREAD entry is consumed — one load's inferSchema→getTable
    // runs synchronously on one thread, so a thread mismatch means the
    // entry is another load's orphan, not ours. A load that reached
    // getTable without inferSchema (external metadata) resolves fresh
    // here.
    val tid = Thread.currentThread().getId
    val manifest = resolved.synchronized {
      // CONDITIONAL take: remove only OUR OWN same-thread entry.
      // Another thread's in-flight entry must be left for its owner —
      // an unconditional remove would let an external-metadata load
      // (which skips inferSchema) destroy a concurrent load's
      // resolution between ITS inferSchema and getTable, forcing that
      // load to re-resolve and potentially pair its already-returned
      // schema with a re-exported manifest's file list.
      resolved.get((root, tagOpt, asOf.orNull)) match {
        case Some((`tid`, m)) =>
          resolved.remove((root, tagOpt, asOf.orNull)); Some(m)
        case _ => None
      }
    } match {
      case Some(m) => m
      case None => resolveManifest(options)
    }
    val tag = asOf.map(_ => manifest.get.tag).getOrElse(tagOpt)
    // capture the OWNING session HERE, at load time on the loading
    // session's thread — scan/write builders and commit/abort run on
    // Spark-internal threads later, where SparkSession.active can be a
    // DIFFERENT session in a multi-session app (wrong per-session fs
    // settings, silently)
    val owner = SparkSession.active
    manifest.flatMap(_.tables.get(table)) match {
      case Some(entry) =>
        Snapshot.requireUnpartitioned(table, entry)
        SnapshotTable(table, schema, entry.files,
          entry.files.map(_.size).sum, entry.rows, root, tag,
          writable = asOf.isEmpty, entrySchemaJson = entry.schemaJson)(owner)
      // write target only: reading it must still fail loudly (see
      // newScanBuilder) — a typo'd tag/table on a READ that happens to
      // carry the schema option must not become a silent empty result
      case None => SnapshotTable(table, schema, Nil, 0L, 0L, root, tag,
        existed = false, writable = asOf.isEmpty)(owner)
    }
  }
}

/** `owner` sits in a SECOND parameter list (same convention as the
  * scans' `hconf`): case-class equality stays on the value fields, and
  * the session is threaded — not re-resolved — because builder/commit/
  * abort callbacks run on Spark-internal threads where
  * `SparkSession.active` may name a different session than the one
  * that loaded this table (advice r9).
  */
case class SnapshotTable(tableName: String, tableSchema: StructType,
                         files: Seq[Snapshot.FileEntry],
                         totalBytes: Long, rows: Long, root: String = "", tag: String = "",
                         existed: Boolean = true, writable: Boolean = true,
                         entrySchemaJson: Option[String] = None)(
                         val owner: SparkSession)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  import org.apache.spark.sql.connector.write._
  override def name(): String = s"graft_snapshot_$tableName"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    if (!existed) throw new IllegalArgumentException(
      s"table $tableName not in snapshot $tag — it exists only as a write target")
    // The provider serves external metadata (writes need that channel),
    // so a user's `.schema(...)` on a READ flows straight through to
    // this table — a drifted one would read the entry's files under the
    // wrong shape (mid-scan InvalidRecordException on a phantom column,
    // or silently re-typed values). The snapshot's committed schema is
    // authoritative on reads; reject overrides HERE, the read-only
    // choke point, so overwrite-based schema evolution (which goes
    // through newWriteBuilder + the commit-time append check) is
    // unaffected.
    entrySchemaJson.map(DataType.fromJson(_).asInstanceOf[StructType]).foreach { es =>
      if (es.catalogString != tableSchema.catalogString)
        throw new IllegalArgumentException(
          s"user-specified read schema ${tableSchema.catalogString} does not match " +
            s"snapshot table '$tableName''s committed schema ${es.catalogString} — " +
            "drop .schema(...): the snapshot's own schema is authoritative on reads")
    }
    new SnapshotScanBuilder(tableSchema, files, totalBytes, rows, owner)
  }
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    if (!writable) throw new UnsupportedOperationException(
      s"snapshot table $tableName was opened with asOf (time travel) — " +
        "history is immutable; write to a named tag instead")
    new SnapshotWriteBuilder(root, tag, tableName, info, owner)
  }
}

class SnapshotScanBuilder(dataSchema: StructType, files: Seq[Snapshot.FileEntry],
                          totalBytes: Long, rows: Long, owner: SparkSession)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters with SupportsPushDownAggregates {
  private var required: StructType = dataSchema
  private var pushed: Array[org.apache.spark.sql.sources.Filter] = Array.empty
  private var pushedAggs: Seq[SnapshotAgg] = Nil
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Metadata-only aggregation: COUNT(*)/MIN/MAX answered from parquet
    * FOOTER statistics — zero data pages read. At 100 TB this turns a
    * full scan into a footer walk. Partial pushdown contract: each
    * file contributes one pre-aggregated row; Spark plans the final
    * merge (sum of counts, min of mins). Restricted to no-filter,
    * no-groupBy plans and int/long/date columns — integer stats are
    * exact, while float (NaN) and binary (truncation) footer stats are
    * not trustworthy, and a pushed filter would invalidate the counts.
    */
  override def pushAggregation(agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    import org.apache.spark.sql.connector.expressions.NamedReference
    import org.apache.spark.sql.connector.expressions.aggregate.{CountStar, Max, Min}
    // files.isEmpty: zero partial rows would make the final merged
    // count NULL instead of 0 — serve empty tables from the row scan
    if (pushed.nonEmpty || agg.groupByExpressions.nonEmpty || files.isEmpty) return false
    def statSafeField(e: org.apache.spark.sql.connector.expressions.Expression): Option[StructField] =
      e match {
        case nr: NamedReference if nr.fieldNames.length == 1 =>
          dataSchema.fields.find(_.name == nr.fieldNames.head).filter(f => f.dataType match {
            case IntegerType | LongType | DateType => true
            case _ => false
          })
        case _ => None
      }
    val specs = agg.aggregateExpressions.toSeq.map {
      case _: CountStar => Some(SnapshotAgg("count", None, LongType))
      // count(<non-null literal>) ≡ count(*); count(col) would need
      // per-column null counts (not reliably in footers) — not pushed
      case c: org.apache.spark.sql.connector.expressions.aggregate.Count
          if !c.isDistinct && (c.column match {
            case l: org.apache.spark.sql.connector.expressions.Literal[_] => l.value != null
            case _ => false
          }) => Some(SnapshotAgg("count", None, LongType))
      case m: Min => statSafeField(m.column).map(f => SnapshotAgg("min", Some(f.name), f.dataType))
      case m: Max => statSafeField(m.column).map(f => SnapshotAgg("max", Some(f.name), f.dataType))
      case _ => None
    }
    if (specs.nonEmpty && specs.forall(_.isDefined)) {
      pushedAggs = specs.flatten
      true
    } else false
  }
  /** Push translatable comparison filters down to parquet (row-group
    * statistics skipping + record-level filtering). ALL filters are
    * also returned as residual so Spark re-evaluates them post-scan —
    * same belt-and-braces contract as the built-in parquet source:
    * pushdown is a pure I/O optimization, never a correctness
    * dependency.
    */
  override def pushFilters(filters: Array[org.apache.spark.sql.sources.Filter])
      : Array[org.apache.spark.sql.sources.Filter] = {
    pushed = filters.filter(f => SnapshotFilters.translate(f, dataSchema).isDefined)
    filters
  }
  override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] = pushed
  override def build(): Scan = {
    // capture the OWNING session's Hadoop conf DRIVER-side and ship it
    // inside the scan: executor-side readers otherwise rebuild a bare
    // `new Configuration()` and silently lose filesystem settings
    // (S3 credentials/endpoints, HA nameservices, kerberos) — works on
    // file:// test fixtures, breaks on any configured cluster fs. The
    // threaded `owner`, not SparkSession.active: build() runs on a
    // planning thread where a multi-session app's active session can
    // differ from the one that loaded the table (advice r9).
    val hconf = new SerializableConfiguration(
      owner.sessionState.newHadoopConf())
    if (pushedAggs.nonEmpty) SnapshotAggScan(files.map(_.path), pushedAggs)(hconf)
    else SnapshotScan(dataSchema, required, files, pushed, totalBytes, rows)(hconf)
  }
}

/** One pushed aggregate: `count` (no column) or `min`/`max` of an
  * int/long/date column, with the column's Spark type.
  */
case class SnapshotAgg(fn: String, column: Option[String], resultType: DataType)

/** Footer-statistics scan: each input file yields ONE row of partial
  * aggregate values read from parquet block metadata — no data pages.
  */
/** `hconf` sits in a SECOND parameter list: case-class equality then
  * covers only the value fields, so two scans of the same snapshot
  * still compare equal and Spark's scan/exchange reuse keeps working
  * (SerializableConfiguration has reference equality only). Required,
  * not defaulted — a caller forgetting it must not compile into a
  * silent bare-Configuration fallback.
  */
case class SnapshotAggScan(files: Seq[String], aggs: Seq[SnapshotAgg])(
    val hconf: SerializableConfiguration)
    extends Scan with Batch {
  override def readSchema(): StructType = StructType(aggs.map {
    case SnapshotAgg("count", _, _) => StructField("count(*)", LongType, nullable = false)
    case SnapshotAgg(fn, Some(c), t) => StructField(s"$fn($c)", t)
    case other => throw new IllegalStateException(s"bad agg spec $other")
  })
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    files.map(f => SnapshotInputPartition(f): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    SnapshotAggReaderFactory(aggs, hconf)
  override def description(): String =
    s"GraftSnapshotAggScan(files=${files.size}, " +
      s"pushedAggregates=[${aggs.map(a => s"${a.fn}(${a.column.getOrElse("*")})").mkString(", ")}])"
}

case class SnapshotAggReaderFactory(aggs: Seq[SnapshotAgg],
                                    hconf: SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new SnapshotFooterAggReader(
      partition.asInstanceOf[SnapshotInputPartition].file, aggs, hconf.value)
}

/** Reads ONLY the parquet footer and emits one partial-aggregate row.
  * If any needed column chunk lacks statistics (a foreign writer with
  * stats disabled — parquet-mr always writes exact int32/int64
  * min-max), the reader falls back to scanning THIS file's rows, so
  * pushdown stays a pure I/O optimization and never a correctness
  * dependency.
  */
class SnapshotFooterAggReader(file: String, aggs: Seq[SnapshotAgg],
                              conf: Configuration)
    extends PartitionReader[InternalRow] {
  private var done = false
  private var row: InternalRow = _

  override def next(): Boolean = {
    if (done) return false
    val inputFile = org.apache.parquet.hadoop.util.HadoopInputFile
      .fromPath(new org.apache.hadoop.fs.Path(file), conf)
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(inputFile)
    val fromFooter: Option[Array[Any]] =
      try {
        val blocks = reader.getFooter.getBlocks
        val values = new Array[Any](aggs.length)
        var ok = true
        var i = 0
        while (ok && i < aggs.length) {
          values(i) = aggs(i) match {
            case SnapshotAgg("count", _, _) =>
              var n = 0L
              blocks.forEach(b => n += b.getRowCount)
              n
            case SnapshotAgg(fn, Some(cname), _) =>
              var acc: Option[Long] = None
              val it = blocks.iterator()
              while (ok && it.hasNext) {
                val b = it.next()
                // A column chunk absent from this file's footer (schema
                // evolution, foreign file) is treated like missing
                // statistics: fall back to the row scan — which raises a
                // genuine schema error itself if the column truly doesn't
                // exist — rather than failing the query here.
                // Exact SINGLE-ELEMENT path match, not toDotString: only
                // top-level columns are ever pushed (statSafeField), and
                // a dot-string compare would let a NESTED chunk a.b
                // shadow a flat column literally named "a.b" (dots are
                // parquet's path delimiter) — find() would take whichever
                // comes first in schema order and silently serve the
                // OTHER column's min/max (DottedColumnProbeSpec).
                val st = b.getColumns.asScala.find { c =>
                  val p = c.getPath.toArray; p.length == 1 && p(0) == cname
                }.map(_.getStatistics).orNull
                if (st == null || st.isEmpty) ok = false // → row-scan fallback
                else if (st.hasNonNullValue) {
                  val v = (if (fn == "min") st.genericGetMin else st.genericGetMax) match {
                    case l: java.lang.Long => l.longValue()
                    case n: java.lang.Integer => n.longValue()
                    case _ => ok = false; 0L
                  }
                  if (ok)
                    acc = Some(acc.fold(v)(a => if (fn == "min") math.min(a, v) else math.max(a, v)))
                }
              }
              // null partial when the file has no non-null values — the
              // final min/max merge ignores nulls
              acc.map { v =>
                aggs(i).resultType match {
                  case LongType => v
                  case IntegerType | DateType => v.toInt
                  case other => throw new IllegalStateException(s"bad agg type $other")
                }
              }.orNull
            case other => throw new IllegalStateException(s"bad agg spec $other")
          }
          i += 1
        }
        if (ok) Some(values) else None
      } finally reader.close()

    row = new GenericInternalRow(fromFooter.getOrElse(rowScanPartials()))
    done = true
    true
  }

  /** Fallback: one pass over this file's rows computing the same
    * partials — correct whenever the file is readable at all.
    */
  private def rowScanPartials(): Array[Any] = {
    val cols = aggs.flatMap(_.column).distinct
    val schema = StructType(cols.map(c =>
      StructField(c, aggs.find(_.column.contains(c)).get.resultType)))
    val idx = cols.zipWithIndex.toMap
    val r = new SnapshotPartitionReader(file, schema, conf = conf)
    var n = 0L
    val mins = scala.collection.mutable.Map.empty[String, Long]
    val maxs = scala.collection.mutable.Map.empty[String, Long]
    try {
      while (r.next()) {
        val row = r.get()
        n += 1
        cols.foreach { c =>
          if (!row.isNullAt(idx(c))) {
            val v = schema(idx(c)).dataType match {
              case LongType => row.getLong(idx(c))
              case _ => row.getInt(idx(c)).toLong
            }
            mins.updateWith(c)(o => Some(o.fold(v)(math.min(_, v))))
            maxs.updateWith(c)(o => Some(o.fold(v)(math.max(_, v))))
          }
        }
      }
    } finally r.close()
    aggs.map {
      case SnapshotAgg("count", _, _) => n: Any
      case SnapshotAgg(fn, Some(c), t) =>
        (if (fn == "min") mins.get(c) else maxs.get(c)).map { v =>
          t match {
            case LongType => v: Any
            case _ => v.toInt: Any
          }
        }.orNull
      case other => throw new IllegalStateException(s"bad agg spec $other")
    }.toArray
  }

  override def get(): InternalRow = row
  override def close(): Unit = ()
}

/** Spark source.Filter → parquet FilterPredicate translation for the
  * primitive column types the reader supports. Timestamp/date columns
  * are deliberately NOT translated (their Spark filter values are
  * java.time objects whose micros/days conversion is easy to get
  * subtly wrong) — untranslated filters simply aren't pushed, and
  * Spark's residual evaluation keeps results correct.
  */
object SnapshotFilters {
  import org.apache.parquet.filter2.predicate.{FilterApi, FilterPredicate}
  import org.apache.parquet.io.api.Binary
  import org.apache.spark.sql.sources._

  private object Op extends Enumeration { val Eq, Gt, Ge, Lt, Le = Value }

  def translate(f: Filter, schema: StructType): Option[FilterPredicate] = f match {
    case And(l, r) =>
      for { lp <- translate(l, schema); rp <- translate(r, schema) }
        yield FilterApi.and(lp, rp)
    case Or(l, r) =>
      for { lp <- translate(l, schema); rp <- translate(r, schema) }
        yield FilterApi.or(lp, rp)
    case EqualTo(a, v)            => cmp(a, v, schema, Op.Eq)
    case GreaterThan(a, v)        => cmp(a, v, schema, Op.Gt)
    case GreaterThanOrEqual(a, v) => cmp(a, v, schema, Op.Ge)
    case LessThan(a, v)           => cmp(a, v, schema, Op.Lt)
    case LessThanOrEqual(a, v)    => cmp(a, v, schema, Op.Le)
    case IsNull(a)                => nullCheck(a, schema, wantNull = true)
    case IsNotNull(a)             => nullCheck(a, schema, wantNull = false)
    case _ => None
  }

  private def cmp(attr: String, value: Any, schema: StructType,
                  op: Op.Value): Option[FilterPredicate] = {
    if (value == null) return None
    schema.fields.find(_.name == attr).flatMap { field =>
      (field.dataType, value) match {
        case (LongType, v: Number) =>
          val c = FilterApi.longColumn(attr); val x = java.lang.Long.valueOf(v.longValue())
          Some(op match {
            case Op.Eq => FilterApi.eq(c, x);   case Op.Gt => FilterApi.gt(c, x)
            case Op.Ge => FilterApi.gtEq(c, x); case Op.Lt => FilterApi.lt(c, x)
            case Op.Le => FilterApi.ltEq(c, x)
          })
        case (IntegerType, v: Number) =>
          val c = FilterApi.intColumn(attr); val x = java.lang.Integer.valueOf(v.intValue())
          Some(op match {
            case Op.Eq => FilterApi.eq(c, x);   case Op.Gt => FilterApi.gt(c, x)
            case Op.Ge => FilterApi.gtEq(c, x); case Op.Lt => FilterApi.lt(c, x)
            case Op.Le => FilterApi.ltEq(c, x)
          })
        // double/float comparisons are deliberately NOT pushed: parquet
        // filters use total-order comparators (Double.compare), which
        // disagree with Spark's == on -0.0/NaN, and record-level
        // filtering drops rows BEFORE the residual filter could restore
        // them — a silent wrong-results path. Integer/string/boolean
        // orderings agree exactly, so only those are pushed.
        case (StringType, v: String) =>
          val c = FilterApi.binaryColumn(attr); val x = Binary.fromString(v)
          Some(op match {
            case Op.Eq => FilterApi.eq(c, x);   case Op.Gt => FilterApi.gt(c, x)
            case Op.Ge => FilterApi.gtEq(c, x); case Op.Lt => FilterApi.lt(c, x)
            case Op.Le => FilterApi.ltEq(c, x)
          })
        case (BooleanType, v: java.lang.Boolean) if op == Op.Eq =>
          Some(FilterApi.eq(FilterApi.booleanColumn(attr), v))
        case _ => None
      }
    }
  }

  private def nullCheck(attr: String, schema: StructType,
                        wantNull: Boolean): Option[FilterPredicate] =
    schema.fields.find(_.name == attr).flatMap { field =>
      field.dataType match {
        case LongType =>
          val c = FilterApi.longColumn(attr)
          Some(if (wantNull) FilterApi.eq(c, null.asInstanceOf[java.lang.Long])
               else FilterApi.notEq(c, null.asInstanceOf[java.lang.Long]))
        case IntegerType =>
          val c = FilterApi.intColumn(attr)
          Some(if (wantNull) FilterApi.eq(c, null.asInstanceOf[java.lang.Integer])
               else FilterApi.notEq(c, null.asInstanceOf[java.lang.Integer]))
        case StringType =>
          val c = FilterApi.binaryColumn(attr)
          Some(if (wantNull) FilterApi.eq(c, null.asInstanceOf[Binary])
               else FilterApi.notEq(c, null.asInstanceOf[Binary]))
        case _ => None
      }
    }
}

/** `hconf` in a second parameter list for the same reuse-preserving
  * reason as [[SnapshotAggScan]]. */
case class SnapshotScan(dataSchema: StructType, required: StructType,
                        files: Seq[Snapshot.FileEntry],
                        filters: Seq[org.apache.spark.sql.sources.Filter] = Nil,
                        totalBytes: Long = 0L, rows: Long = 0L)(
                        val hconf: SerializableConfiguration)
    extends Scan with Batch with SupportsReportStatistics
    with SupportsRuntimeFiltering {
  override def readSchema(): StructType = required

  /** Manifest-derived statistics for the planner: the snapshot knows
    * its exact byte size and row count without touching storage, so
    * join-side size estimation (broadcast decisions, AQE thresholds)
    * sees real numbers instead of a default guess. sizeInBytes is
    * scaled by the column-pruning fraction — the standard width
    * heuristic: a 2-of-10-column scan of a 100 TB snapshot should
    * plan like a 20 TB input, not a 100 TB one.
    */
  override def estimateStatistics(): Statistics = new Statistics {
    private val width =
      if (dataSchema.isEmpty) 1.0
      else required.length.toDouble / dataSchema.length.toDouble
    override def sizeInBytes(): util.OptionalLong =
      if (totalBytes > 0) util.OptionalLong.of(math.max(1L, (totalBytes * width).toLong))
      else util.OptionalLong.empty()
    override def numRows(): util.OptionalLong =
      if (rows > 0) util.OptionalLong.of(rows) else util.OptionalLong.empty()
  }
  override def toBatch: Batch = this

  /** Manifest-statistics file pruning: a file whose recorded
    * int-column range cannot satisfy the pushed predicates gets NO
    * input partition — the driver skips it using manifest numbers
    * alone, before any footer or data I/O. Files without stats always
    * scan (pruning is advisory, never a correctness dependency).
    */
  private lazy val staticSelected: Seq[Snapshot.FileEntry] =
    files.filter(f => filters.forall(SnapshotFilePruning.mayMatch(f.stats, _)))

  /** DSv2 runtime filtering (the snapshot twin of q_scan_dpp's native-
    * parquet dynamic pruning): at execution start Spark evaluates the
    * completed broadcast side of a selective join and hands this scan
    * the join-key set as an `In` filter — files whose manifest range
    * can't contain any key get no input partition. Pure I/O
    * optimization: the join itself still filters rows, so pruning can
    * only skip files, never change results. At 100 TB this is the
    * difference between scanning the whole fact snapshot and scanning
    * the handful of files a pruned dimension actually touches.
    */
  private var runtimeFilters: Seq[org.apache.spark.sql.sources.Filter] = Nil

  /** Only attributes the manifest can actually prune on — top-level
    * columns with recorded stats in at least one file. Advertising a
    * column we can't prune would make Spark build and broadcast a key
    * set for nothing.
    */
  override def filterAttributes(): Array[org.apache.spark.sql.connector.expressions.NamedReference] = {
    val statCols = files.iterator.flatMap(_.stats.keysIterator).toSet
    dataSchema.fields.iterator.filter(f => statCols.contains(f.name))
      .map(f => org.apache.spark.sql.connector.expressions.Expressions.column(f.name))
      .toArray
  }

  override def filter(fs: Array[org.apache.spark.sql.sources.Filter]): Unit =
    runtimeFilters = fs.toSeq

  /** Runtime-key pruning pre-sorts each In-set ONCE and range-probes it
    * per file with a binary search — O(F log V) driver work instead of
    * the naive O(F × V), which matters when a 100k-file snapshot meets
    * a 10k-key dimension. Non-integral key sets and untracked shapes
    * fall back to the conservative static check.
    */
  private def runtimePruner(fs: Seq[org.apache.spark.sql.sources.Filter])
      : Snapshot.FileEntry => Boolean = {
    import org.apache.spark.sql.sources._
    def asLong(v: Any): Option[Long] = v match {
      case n: java.lang.Long => Some(n.longValue())
      case n: java.lang.Integer => Some(n.longValue())
      case n: java.lang.Short => Some(n.longValue())
      case n: java.lang.Byte => Some(n.longValue())
      case _ => None
    }
    val checks: Seq[Snapshot.FileEntry => Boolean] = fs.map {
      case In(a, vs) if vs.nonEmpty =>
        val longs = vs.flatMap(asLong(_))
        if (longs.length != vs.length) (_: Snapshot.FileEntry) => true
        else {
          val sorted = longs.sorted
          fe => fe.stats.get(a) match {
            case Some(s) =>
              // counted so the O(F log V) claim is testable as "exactly
              // one range probe per file" (a LongAdder bump is noise
              // next to the binary search itself) — wall-clock asserts
              // flake on loaded hosts, op-counts don't
              SnapshotScanProbe.runtimeProbes.increment()
              val i = java.util.Arrays.binarySearch(sorted, s.min)
              val idx = if (i >= 0) i else -i - 1
              idx < sorted.length && sorted(idx) <= s.max
            case None => true
          }
        }
      case f => (fe: Snapshot.FileEntry) => SnapshotFilePruning.mayMatch(fe.stats, f)
    }
    fe => checks.forall(_(fe))
  }

  private def selected: Seq[Snapshot.FileEntry] =
    if (runtimeFilters.isEmpty) staticSelected
    else staticSelected.filter(runtimePruner(runtimeFilters))

  override def planInputPartitions(): Array[InputPartition] =
    selected.map(f => SnapshotInputPartition(f.path): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    SnapshotReaderFactory(required.json, dataSchema.json, filters, hconf)
  override def description(): String =
    s"GraftSnapshotScan(files=${files.size}, skippedByStats=${files.size - selected.size}, " +
      s"columns=${required.fieldNames.mkString(",")}, " +
      s"pushedFilters=[${filters.mkString(", ")}])"
}

/** Driver-side may-match test of a source filter against per-file
  * integer column ranges. Conservative by construction: unknown
  * columns, non-integral values and untracked predicate shapes all
  * return true. Null semantics: comparison predicates never match
  * null cells, so [min, max] of the non-null values bounds every row
  * a comparison could accept; IsNull/IsNotNull are not prunable from
  * min/max alone and always pass.
  */
object SnapshotFilePruning {
  import org.apache.spark.sql.sources._

  def mayMatch(stats: Map[String, Snapshot.ColumnStats], f: Filter): Boolean = f match {
    case And(l, r) => mayMatch(stats, l) && mayMatch(stats, r)
    case Or(l, r) => mayMatch(stats, l) || mayMatch(stats, r)
    case EqualTo(a, v) => bound(stats, a, v).forall { case (s, x) => s.min <= x && x <= s.max }
    case GreaterThan(a, v) => bound(stats, a, v).forall { case (s, x) => s.max > x }
    case GreaterThanOrEqual(a, v) => bound(stats, a, v).forall { case (s, x) => s.max >= x }
    case LessThan(a, v) => bound(stats, a, v).forall { case (s, x) => s.min < x }
    case LessThanOrEqual(a, v) => bound(stats, a, v).forall { case (s, x) => s.min <= x }
    case In(a, vs) => vs.isEmpty || vs.exists(v => mayMatch(stats, EqualTo(a, v)))
    case _ => true
  }

  /** The (stats, value) pair when the column has recorded stats AND
    * the comparison value is an integral number; None ⇒ can't prune.
    */
  private def bound(stats: Map[String, Snapshot.ColumnStats], attr: String,
                    v: Any): Option[(Snapshot.ColumnStats, Long)] =
    stats.get(attr).flatMap(s => v match {
      case n: java.lang.Long => Some((s, n.longValue()))
      case n: java.lang.Integer => Some((s, n.longValue()))
      case n: java.lang.Short => Some((s, n.longValue()))
      case n: java.lang.Byte => Some((s, n.longValue()))
      case _ => None
    })
}

case class SnapshotInputPartition(file: String) extends InputPartition

/** Test-observable count of per-file reader opens — how the
  * runtime-filtering spec proves FEWER FILES were actually opened
  * (local mode shares the JVM, so executor-side increments are
  * visible). One atomic add per file open; no production reads.
  */
object SnapshotScanProbe {
  private[graft] val opens = new java.util.concurrent.atomic.AtomicLong(0)
  /** Driver-side binary-search range probes performed by the runtime
    * In-pruner — the O(F log V) claim is asserted as "one probe per
    * file" on this counter instead of a load-sensitive wall-clock
    * bound (r12 advice). */
  private[graft] val runtimeProbes = new java.util.concurrent.atomic.LongAdder
}

case class SnapshotReaderFactory(requiredJson: String, dataJson: String,
                                 filters: Seq[org.apache.spark.sql.sources.Filter],
                                 hconf: SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    SnapshotScanProbe.opens.incrementAndGet()
    val file = partition.asInstanceOf[SnapshotInputPartition].file
    val required = DataType.fromJson(requiredJson).asInstanceOf[StructType]
    val dataSchema = DataType.fromJson(dataJson).asInstanceOf[StructType]
    new SnapshotPartitionReader(file, required, dataSchema, filters, hconf.value)
  }
}

/** One-file reader over the parquet Group API with a projected read
  * schema (real parquet-side column pruning) and pushed-down filter
  * predicates (row-group statistics skipping + record-level filtering
  * via parquet's FilterCompat; results are additionally re-filtered by
  * Spark since every filter is reported residual).
  */
class SnapshotPartitionReader(file: String, required: StructType,
                              dataSchema: StructType = new StructType(),
                              filters: Seq[org.apache.spark.sql.sources.Filter] = Nil,
                              conf: Configuration)
    extends PartitionReader[InternalRow] {

  private val reader: ParquetReader[Group] = {
    val path = new org.apache.hadoop.fs.Path(file)
    val inputFile = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(path, conf)
    val footerReader = org.apache.parquet.hadoop.ParquetFileReader.open(inputFile)
    val fullSchema = try footerReader.getFooter.getFileMetaData.getSchema
    finally footerReader.close()
    val fields: Seq[org.apache.parquet.schema.Type] =
      required.fieldNames.toSeq.map(n => fullSchema.getType(Seq(n): _*))
    val projected = new MessageType(fullSchema.getName, fields: _*)
    conf.set(ReadSupport.PARQUET_READ_SCHEMA, projected.toString)
    val schemaForFilters = if (dataSchema.isEmpty) required else dataSchema
    val predicate = filters.flatMap(SnapshotFilters.translate(_, schemaForFilters))
      .reduceOption(org.apache.parquet.filter2.predicate.FilterApi.and)
    val builder = ParquetReader.builder(new GroupReadSupport(), path).withConf(conf)
    predicate.fold(builder)(p =>
      builder.withFilter(org.apache.parquet.filter2.compat.FilterCompat.get(p))).build()
  }

  private var current: Group = _

  override def next(): Boolean = {
    current = reader.read()
    current != null
  }

  /** Decode field `fieldIdx` of `g` into Spark's internal value form.
    * Recursion handles nesting uniformly: arrays are standard 3-level
    * parquet LIST (`optional group x (LIST) { repeated group list {
    * <element> } }` — what Spark writes), structs are plain groups
    * whose parquet field order matches the Spark StructType (both come
    * from the same schema at export time). An absent value (repetition
    * count 0) is NULL at every level.
    */
  private def decode(g: Group, fieldIdx: Int, dt: DataType): Any = dt match {
    case LongType => g.getLong(fieldIdx, 0)
    case IntegerType => g.getInteger(fieldIdx, 0)
    case DoubleType => g.getDouble(fieldIdx, 0)
    case FloatType => g.getFloat(fieldIdx, 0)
    case BooleanType => g.getBoolean(fieldIdx, 0)
    case StringType => UTF8String.fromBytes(g.getBinary(fieldIdx, 0).getBytes)
    case BinaryType => g.getBinary(fieldIdx, 0).getBytes
    // Spark 4 writes TIMESTAMP_MICROS as INT64 — the raw long IS
    // Spark's internal representation (fixtures are NTZ: parquet
    // isAdjustedToUTC=false reads as TimestampNTZType)
    case TimestampType | TimestampNTZType => g.getLong(fieldIdx, 0)
    case DateType => g.getInteger(fieldIdx, 0)
    // decimals follow Spark's parquet convention: INT32 unscaled for
    // precision <= 9, INT64 for <= 18 (wider would be FIXED_LEN_BYTE_ARRAY
    // — out of scope, raised honestly below)
    case dt: DecimalType if dt.precision <= 9 =>
      org.apache.spark.sql.types.Decimal.createUnsafe(
        g.getInteger(fieldIdx, 0).toLong, dt.precision, dt.scale)
    case dt: DecimalType if dt.precision <= 18 =>
      org.apache.spark.sql.types.Decimal.createUnsafe(
        g.getLong(fieldIdx, 0), dt.precision, dt.scale)
    case ArrayType(et, _) =>
      val wrapper = g.getGroup(fieldIdx, 0)
      val n = wrapper.getFieldRepetitionCount(0)
      val out = new Array[Any](n)
      var j = 0
      while (j < n) {
        val entry = wrapper.getGroup(0, j)
        out(j) = if (entry.getFieldRepetitionCount(0) == 0) null
        else decode(entry, 0, et)
        j += 1
      }
      new GenericArrayData(out)
    case StructType(fields) =>
      val nested = g.getGroup(fieldIdx, 0)
      val out = new Array[Any](fields.length)
      var j = 0
      while (j < fields.length) {
        out(j) = if (nested.getFieldRepetitionCount(j) == 0) null
        else decode(nested, j, fields(j).dataType)
        j += 1
      }
      new GenericInternalRow(out)
    // standard parquet MAP: optional group m (MAP) { repeated group
    // key_value { required key; optional value } }
    case MapType(kt, vt, _) =>
      val wrapper = g.getGroup(fieldIdx, 0)
      val n = wrapper.getFieldRepetitionCount(0)
      val keys = new Array[Any](n)
      val values = new Array[Any](n)
      var j = 0
      while (j < n) {
        val entry = wrapper.getGroup(0, j)
        keys(j) = decode(entry, 0, kt)
        values(j) = if (entry.getFieldRepetitionCount(1) == 0) null
        else decode(entry, 1, vt)
        j += 1
      }
      new org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
        new GenericArrayData(keys), new GenericArrayData(values))
    case other => throw new UnsupportedOperationException(
      s"SnapshotSource supports primitive, array, struct and map columns; got $other " +
        "— use graft.sources.Snapshot.read for this table")
  }

  override def get(): InternalRow = {
    val values = new Array[Any](required.length)
    var i = 0
    while (i < required.length) {
      // projected read schema was built from required.fieldNames in
      // order, so the group field index equals the required index
      values(i) =
        if (current.getFieldRepetitionCount(i) == 0) null
        else decode(current, i, required.fields(i).dataType)
      i += 1
    }
    new GenericInternalRow(values)
  }

  override def close(): Unit = reader.close()
}

// ---------------------------------------------------------------------------
// Write path: the snapshot manifest doubles as a DSv2 commit protocol.
// ---------------------------------------------------------------------------

/** DSv2 batch write into a snapshot table. The commit protocol is the
  * metadata-swap design every table format on object storage converged
  * on (Iceberg/Delta, public docs): executors write immutable part
  * files FIRST (names unique per (partition, task) attempt, so task
  * retries and speculative duplicates can never collide or double-
  * commit), and the driver's `commit()` then writes the manifest
  * naming exactly the committed files — one O(1) metadata write, no
  * directory renames, no output-committer dance. A reader either sees
  * the old manifest or the new one; a crashed write leaves only
  * unreferenced files for retention to sweep. `truncate()` (Spark's
  * overwrite-mode path) swaps the table entry to the new file set —
  * the old generation's files stay on disk for time-travel until
  * retention removes them, exactly like the export pipeline's
  * incremental links.
  *
  * At-least-once writers (streaming foreachBatch) pass
  * `txnAppId`/`txnVersion` to make replayed micro-batches no-ops —
  * see [[graft.sources.Snapshot.TableEntry]] `txns` and the commit
  * body below (SnapshotStreamRecoverySpec probes the failure mode and
  * the guarantee).
  */
class SnapshotWriteBuilder(root: String, tag: String, table: String,
                           info: org.apache.spark.sql.connector.write.LogicalWriteInfo,
                           owner: SparkSession)
    extends org.apache.spark.sql.connector.write.WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsTruncate {
  private var truncateFirst = false

  /** Idempotent-writer identity (`txnAppId`/`txnVersion` write options
    * — see [[Snapshot.TableEntry]] `txns`). Parsed HERE, driver-side at
    * build time, so a malformed pair fails the query before any
    * executor writes a file: an at-least-once writer whose idempotence
    * key silently failed to parse would be a correctness bug dressed as
    * a fallback.
    */
  private val txn: Option[(String, Long)] = {
    val o = info.options()
    (Option(o.get("txnAppId")), Option(o.get("txnVersion"))) match {
      case (Some(app), Some(ver)) =>
        if (app.isEmpty) throw new IllegalArgumentException(
          s"txnAppId must be non-empty for an idempotent write to snapshot table '$table'")
        val v = try ver.toLong catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"txnVersion '$ver' is not a long (snapshot table '$table') — pass the " +
              "micro-batch id (or any per-writer monotonic version)")
        }
        Some(app -> v)
      case (None, None) => None
      case (app, _) => throw new IllegalArgumentException(
        s"snapshot table '$table': txnAppId and txnVersion must be set together " +
          s"(got ${if (app.isDefined) "txnAppId without txnVersion" else "txnVersion without txnAppId"})")
    }
  }

  /** Optional age-based ledger retention (`txnRetentionMs` write
    * option — Delta's setTransactionRetentionDuration analogue): each
    * commit carrying it sweeps stamped ledger entries older than the
    * window (see [[Snapshot.expiredTxnApps]] for exactly what
    * qualifies, and TableEntry's RETENTION doc for the double-commit
    * hazard of a too-short window). Validated here at build time like
    * the txn pair: a mistyped retention silently not applying would
    * let the ledger bloat unnoticed.
    */
  private val txnRetentionMs: Option[Long] =
    Option(info.options().get("txnRetentionMs")).map { r =>
      val v = try r.toLong catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"txnRetentionMs '$r' is not a long (snapshot table '$table') — pass the " +
            "retention window in milliseconds")
      }
      if (v <= 0) throw new IllegalArgumentException(
        s"txnRetentionMs must be positive (snapshot table '$table', got $v)")
      v
    }

  override def truncate(): org.apache.spark.sql.connector.write.WriteBuilder = {
    truncateFirst = true; this
  }
  override def build(): org.apache.spark.sql.connector.write.Write =
    new org.apache.spark.sql.connector.write.Write {
      override def toBatch: org.apache.spark.sql.connector.write.BatchWrite =
        // owning session's Hadoop conf captured driver-side for the
        // executors' parquet writers (same reason as the scan side);
        // the session itself rides along for commit()'s manifest
        // read-modify-write, which runs on a Spark-internal thread
        // where SparkSession.active is not trustworthy (advice r9)
        SnapshotBatchWrite(root, tag, table, info.schema().json, truncateFirst, txn,
          txnRetentionMs)(
          owner, new SerializableConfiguration(
            owner.sessionState.newHadoopConf()))
    }
}

case class SnapshotBatchWrite(root: String, tag: String, table: String,
                              schemaJson: String, truncateFirst: Boolean,
                              txn: Option[(String, Long)] = None,
                              txnRetentionMs: Option[Long] = None)(
                              val owner: SparkSession,
                              val hconf: SerializableConfiguration)
    extends org.apache.spark.sql.connector.write.BatchWrite {
  import org.apache.spark.sql.connector.write._

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    SnapshotWriterFactory(s"$root/$tag/$table", schemaJson, hconf)

  override def commit(messages: Array[WriterCommitMessage]): Unit = SnapshotBatchWrite.commitLock.synchronized {
    val s = owner
    val schema = DataType.fromJson(schemaJson).asInstanceOf[StructType]
    // rows == 0 partials never opened a file (lazy writer) — drop them
    // so empty partitions / empty micro-batches don't accrete 0-row
    // files (and scan partitions) in the manifest forever
    val committed = messages.collect { case m: SnapshotCommitMessage if m.rows > 0 => m }
    val prior =
      try Some(Snapshot.readManifest(s, root, tag))
      catch { case _: java.io.FileNotFoundException => None }
    SnapshotBatchWrite.commitRaceHook()
    // Idempotence ledger, read REGARDLESS of truncate: the recorded
    // writer versions describe writer progress, not the current file
    // set, so an overwrite consults (and below, carries forward) the
    // same ledger an append does.
    val priorLedger = prior.flatMap(_.tables.get(table))
    val isReplay = txn.exists { case (app, v) =>
      priorLedger.flatMap(_.txns.get(app)).exists(_ >= v)
    }
    if (isReplay) {
      // Replay of an already-committed transaction — the at-least-once
      // case this option exists for (a streaming micro-batch
      // re-delivered after a crash between the checkpoint's offset and
      // commit writes, possibly from a NEW driver JVM reading this
      // manifest fresh). The whole write is a no-op: no manifest swap,
      // and this attempt's data files (duplicates by construction,
      // referenced by nothing) are deleted through the same conf
      // abort() uses — not left for vacuum, or every replayed batch
      // would leak a file set.
      val conf = hconf.value
      committed.foreach { m =>
        val p = new org.apache.hadoop.fs.Path(m.path)
        // a transient delete failure leaks an unreferenced duplicate
        // that nothing else will ever sweep (vacuum only walks tags it
        // can attribute) — the commit must still succeed as a no-op,
        // but the leak has to be OBSERVABLE, not swallowed
        try p.getFileSystem(conf).delete(p, false) catch {
          case e: Exception => System.err.println(
            s"[snapshot] WARNING: replay no-op could not delete its duplicate file $p " +
              s"(${e.getClass.getSimpleName}: ${e.getMessage}) — unreferenced file leaked; remove manually")
        }
      }
    } else commitFresh(s, schema, committed, prior, priorLedger)
  }

  /** The non-replay commit body: manifest read-modify-write under the
    * caller's lock (split out only so the replay no-op above needs no
    * non-local return).
    */
  private def commitFresh(s: SparkSession, schema: StructType,
                          committed: Seq[SnapshotCommitMessage],
                          prior: Option[Snapshot.Manifest],
                          priorLedger: Option[Snapshot.TableEntry]): Unit = {
    val priorEntry = if (truncateFirst) None else prior.flatMap(_.tables.get(table))
    // Appends must match the entry's schema EXACTLY (names+types+order;
    // catalogString ignores nullability/metadata, same normalization as
    // the signature): the provider serves external metadata, so Spark
    // hands the QUERY's schema through to this write without validating
    // it against the entry — an unchecked wider append would stamp the
    // new schema over a file set whose older files lack the new
    // columns, committing a table that reads fine under pruning and
    // fails mid-scan (executor InvalidRecordException) the first time
    // the new column is touched. Checked HERE, under the commit lock,
    // where the prior entry is authoritative; overwrite (truncate)
    // replaces the file set wholesale, so a schema change there is
    // legitimate evolution.
    priorEntry.flatMap(_.schemaJson).foreach { pj =>
      val priorSchema = DataType.fromJson(pj).asInstanceOf[StructType]
      if (priorSchema.catalogString != schema.catalogString)
        throw new IllegalArgumentException(
          s"schema mismatch appending to snapshot table '$table': the entry is " +
            s"${priorSchema.catalogString} but the append writes " +
            s"${schema.catalogString} — appended files must match the entry " +
            "schema exactly; use overwrite (truncate) to change it")
    }
    val files = (priorEntry.map(_.files).getOrElse(Nil) ++
      committed.map(m => Snapshot.FileEntry(m.path, m.size, m.stats))).sortBy(_.path)
    val rows = priorEntry.map(_.rows).getOrElse(0L) + committed.map(_.rows).sum
    // carry the ledger forward (through overwrites too — see above) and
    // record this transaction's version on top, stamping the commit
    // time for age-based retention (TableEntry's RETENTION doc)
    val nowMs = System.currentTimeMillis()
    val ledger = priorLedger.map(_.txns).getOrElse(Map.empty[String, Long]) ++ txn
    val stamps = priorLedger.map(_.txnStamps).getOrElse(Map.empty[String, Long]) ++
      txn.map { case (app, _) => app -> nowMs }
    val stamped = Snapshot.TableEntry(files, rows, Snapshot.signatureOf(schema, rows),
      schemaJson = Some(schema.json), txns = ledger, txnStamps = stamps)
    // optional piggybacked sweep: this writer's own entry was stamped
    // `nowMs` above, so it can never expire itself
    val entry = txnRetentionMs.fold(stamped) { ret =>
      val doomed = Snapshot.expiredTxnApps(stamped, ret, nowMs)
      if (doomed.isEmpty) stamped
      else {
        System.err.println(s"[snapshot] txnRetentionMs sweep on '$table' expired " +
          s"${doomed.size} ledger entr${if (doomed.size == 1) "y" else "ies"}: " +
          doomed.toSeq.sorted.mkString(", "))
        stamped.copy(txns = stamped.txns -- doomed, txnStamps = stamped.txnStamps -- doomed)
      }
    }
    val m = prior.getOrElse(Snapshot.Manifest(tag, None, Map.empty))
    // OCC: state the generation this read-modify-write was based on as
    // the swap precondition — a second JVM that committed in the window
    // turns this into a loud ConcurrentSnapshotCommitException instead
    // of a silent lost update (in-process writers never conflict: the
    // enclosing commitLock serializes them)
    val readGen = prior.map(_.generation).getOrElse(-1L)
    Snapshot.writeManifest(s, root,
      m.copy(tables = m.tables + (table -> entry), generation = readGen + 1),
      expectedGeneration = Some(readGen))
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    // the executors wrote through hconf (the owning session's conf as
    // captured at build time) — clean up through the SAME conf, so the
    // delete resolves the same filesystem regardless of which session
    // is "active" on the abort thread
    val conf = hconf.value
    messages.collect { case m: SnapshotCommitMessage => m }.foreach { m =>
      val p = new org.apache.hadoop.fs.Path(m.path)
      p.getFileSystem(conf).delete(p, false)
    }
  }
}

object SnapshotBatchWrite {
  /** Serializes the manifest read-modify-write of commit() within this
    * JVM, so parallel writers in one application (e.g. two streaming
    * queries appending to the same table) never even conflict. ACROSS
    * JVMs the lock is invisible; there the manifest generation counter
    * stated as a swap precondition (Snapshot.writeManifest) detects a
    * lost update and fails the loser loudly — full cross-application
    * MUTUAL EXCLUSION (blind retry loops) would still need a
    * conditional-PUT / lock service on object stores, but an undetected
    * silent loss is no longer possible on filesystems with atomic
    * create-exclusive (local, HDFS).
    */
  private[sources] val commitLock = new Object

  /** Test seam for the cross-JVM race: invoked after commit() reads the
    * prior manifest and before it swaps the new one. A spec injects a
    * SECOND session's full append here — run on the same thread, the
    * reentrant commitLock does not stop it, which is exactly the
    * position a second JVM is in (the in-process lock is invisible to
    * it). Production never sets this; the default is a no-op.
    */
  @volatile private[graft] var commitRaceHook: () => Unit = () => ()
}

case class SnapshotCommitMessage(path: String, size: Long, rows: Long,
                                 stats: Map[String, Snapshot.ColumnStats] = Map.empty)
    extends org.apache.spark.sql.connector.write.WriterCommitMessage

case class SnapshotWriterFactory(dir: String, schemaJson: String,
                                 hconf: SerializableConfiguration)
    extends org.apache.spark.sql.connector.write.DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
    new SnapshotDataWriter(dir, partitionId, taskId,
      DataType.fromJson(schemaJson).asInstanceOf[StructType], hconf.value)
}

/** One-task parquet writer over the Group API — the mirror of
  * SnapshotPartitionReader. Scope matches the reader exactly:
  * primitives incl. timestamp/date and INT32/INT64-backed decimals,
  * plus arrays (3-level parquet LIST), structs and maps (standard
  * key_value MAP), recursively composed — so anything the source can
  * read (the embeddings table included) round-trips value-exact
  * through the sink.
  */
class SnapshotDataWriter(dir: String, partitionId: Int, taskId: Long, schema: StructType,
                         conf: Configuration)
    extends org.apache.spark.sql.connector.write.DataWriter[InternalRow] {
  import org.apache.parquet.schema.{LogicalTypeAnnotation, PrimitiveType, Type => PType, Types}
  import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
  import org.apache.parquet.io.api.Binary
  import org.apache.spark.sql.catalyst.expressions.SpecializedGetters

  // partitionId+taskId dedup retries within one application; the UUID
  // makes names collision-free across applications appending to the
  // same table from fresh JVMs (where taskIds restart at 0)
  private val path = new org.apache.hadoop.fs.Path(
    f"$dir/part-$partitionId%05d-$taskId-${java.util.UUID.randomUUID()}.parquet")

  private val parquetSchema: MessageType = {
    // Complex shapes mirror what the reader decodes (and what Spark
    // itself writes): LIST = optional group (LIST) { repeated group
    // list { optional element } }, MAP = optional group (MAP) {
    // repeated group key_value { required key; optional value } },
    // structs are plain groups in StructType field order.
    def field(name: String, dt: DataType,
              rep: PType.Repetition = PType.Repetition.OPTIONAL): PType = dt match {
      case LongType    => Types.primitive(INT64, rep).named(name)
      case IntegerType => Types.primitive(INT32, rep).named(name)
      case DoubleType  => Types.primitive(DOUBLE, rep).named(name)
      case FloatType   => Types.primitive(FLOAT, rep).named(name)
      case BooleanType => Types.primitive(BOOLEAN, rep).named(name)
      case StringType  => Types.primitive(BINARY, rep)
        .as(LogicalTypeAnnotation.stringType()).named(name)
      case BinaryType  => Types.primitive(BINARY, rep).named(name)
      case TimestampType => Types.primitive(INT64, rep)
        .as(LogicalTypeAnnotation.timestampType(true,
          LogicalTypeAnnotation.TimeUnit.MICROS)).named(name)
      case TimestampNTZType => Types.primitive(INT64, rep)
        .as(LogicalTypeAnnotation.timestampType(false,
          LogicalTypeAnnotation.TimeUnit.MICROS)).named(name)
      case DateType => Types.primitive(INT32, rep)
        .as(LogicalTypeAnnotation.dateType()).named(name)
      case d: DecimalType if d.precision <= 9 => Types.primitive(INT32, rep)
        .as(LogicalTypeAnnotation.decimalType(d.scale, d.precision)).named(name)
      case d: DecimalType if d.precision <= 18 => Types.primitive(INT64, rep)
        .as(LogicalTypeAnnotation.decimalType(d.scale, d.precision)).named(name)
      case ArrayType(et, _) =>
        Types.buildGroup(rep).as(LogicalTypeAnnotation.listType())
          .addField(Types.repeatedGroup()
            .addField(field("element", et)).named("list"))
          .named(name)
      case StructType(fields) =>
        val b = Types.buildGroup(rep)
        fields.foreach(f => b.addField(field(f.name, f.dataType)))
        b.named(name)
      case MapType(kt, vt, _) =>
        Types.buildGroup(rep).as(LogicalTypeAnnotation.mapType())
          .addField(Types.repeatedGroup()
            .addField(field("key", kt, PType.Repetition.REQUIRED))
            .addField(field("value", vt)).named("key_value"))
          .named(name)
      case other => throw new UnsupportedOperationException(
        s"SnapshotSource write supports primitive, array, struct and map columns; " +
          s"got $name: $other")
    }
    val b = Types.buildMessage()
    schema.fields.foreach(f => b.addField(field(f.name, f.dataType)))
    b.named("spark_schema")
  }

  // opened on the first row: an empty partition must leave NO file
  // behind (its commit message is dropped by BatchWrite.commit)
  private lazy val writer = {
    org.apache.parquet.hadoop.example.GroupWriteSupport.setSchema(parquetSchema, conf)
    org.apache.parquet.hadoop.example.ExampleParquetWriter
      .builder(org.apache.parquet.hadoop.util.HadoopOutputFile.fromPath(path, conf))
      .withConf(conf)
      .build()
  }
  private val factory = new org.apache.parquet.example.data.simple.SimpleGroupFactory(parquetSchema)
  private var rows = 0L
  // running min/max for int32/int64-backed columns → manifest file
  // stats, so DSv2-written files are prunable without a footer read
  private val statIdx: Seq[Int] = schema.fields.indices.filter(i =>
    schema.fields(i).dataType match {
      case LongType | IntegerType | DateType => true
      case _ => false
    })
  private val statMin = scala.collection.mutable.Map.empty[Int, Long]
  private val statMax = scala.collection.mutable.Map.empty[Int, Long]

  /** Encode value `ord` of `src` (a row or an array — both are
    * SpecializedGetters) into group field `i` — the exact inverse of
    * SnapshotPartitionReader.decode, recursive over the same shapes.
    * Callers only invoke this on non-null values; nested nulls are
    * handled here (an absent group field IS parquet's null).
    */
  private def addTo(g: Group, i: Int, dt: DataType,
                    src: SpecializedGetters, ord: Int): Unit = dt match {
    case LongType | TimestampType | TimestampNTZType => g.add(i, src.getLong(ord))
    case IntegerType | DateType => g.add(i, src.getInt(ord))
    case DoubleType  => g.add(i, src.getDouble(ord))
    case FloatType   => g.add(i, src.getFloat(ord))
    case BooleanType => g.add(i, src.getBoolean(ord))
    case StringType  =>
      g.add(i, Binary.fromConstantByteArray(src.getUTF8String(ord).getBytes))
    case BinaryType  => g.add(i, Binary.fromConstantByteArray(src.getBinary(ord)))
    case d: DecimalType if d.precision <= 9 =>
      g.add(i, src.getDecimal(ord, d.precision, d.scale).toUnscaledLong.toInt)
    case d: DecimalType if d.precision <= 18 =>
      g.add(i, src.getDecimal(ord, d.precision, d.scale).toUnscaledLong)
    case ArrayType(et, _) =>
      val arr = src.getArray(ord)
      val wrapper = g.addGroup(i) // the LIST annotation group
      var j = 0
      while (j < arr.numElements()) {
        val entry = wrapper.addGroup(0) // one repeated `list` group per element
        if (!arr.isNullAt(j)) addTo(entry, 0, et, arr, j)
        j += 1
      }
    case StructType(fields) =>
      val st = src.getStruct(ord, fields.length)
      val nested = g.addGroup(i)
      var j = 0
      while (j < fields.length) {
        if (!st.isNullAt(j)) addTo(nested, j, fields(j).dataType, st, j)
        j += 1
      }
    case MapType(kt, vt, _) =>
      val m = src.getMap(ord)
      val keys = m.keyArray(); val values = m.valueArray()
      val wrapper = g.addGroup(i) // the MAP annotation group
      var j = 0
      while (j < m.numElements()) {
        val kv = wrapper.addGroup(0) // one repeated `key_value` group per entry
        addTo(kv, 0, kt, keys, j) // map keys are never null in Spark
        if (!values.isNullAt(j)) addTo(kv, 1, vt, values, j)
        j += 1
      }
    case other => throw new IllegalStateException(s"unreachable: $other")
  }

  override def write(row: InternalRow): Unit = {
    val g = factory.newGroup()
    var i = 0
    while (i < schema.length) {
      if (!row.isNullAt(i)) addTo(g, i, schema.fields(i).dataType, row, i)
      i += 1
    }
    writer.write(g)
    statIdx.foreach { i =>
      if (!row.isNullAt(i)) {
        val v = schema.fields(i).dataType match {
          case LongType => row.getLong(i)
          case _ => row.getInt(i).toLong
        }
        statMin.updateWith(i)(o => Some(o.fold(v)(math.min(_, v))))
        statMax.updateWith(i)(o => Some(o.fold(v)(math.max(_, v))))
      }
    }
    rows += 1L
  }

  override def commit(): org.apache.spark.sql.connector.write.WriterCommitMessage = {
    if (rows == 0) return SnapshotCommitMessage(path.toString, 0L, 0L)
    writer.close()
    val fs = path.getFileSystem(conf)
    val stats = statMin.keys.map(i => schema.fields(i).name ->
      Snapshot.ColumnStats(statMin(i), statMax(i))).toMap
    SnapshotCommitMessage(path.toString, fs.getFileStatus(path).getLen, rows, stats)
  }

  override def abort(): Unit = if (rows > 0) {
    try writer.close() catch { case _: Exception => () }
    path.getFileSystem(conf).delete(path, false)
  }

  override def close(): Unit = ()
}
