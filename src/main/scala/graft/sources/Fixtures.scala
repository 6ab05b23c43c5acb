package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** Fixture-drift tripwire (FIXTURES.md is the prose twin of this
  * table). The driver regenerates `/root/testdata` between rounds and
  * has already shipped `events.ts` in three physical encodings
  * (ms, ns, µs-NTZ); r8 ended with 32 queries silently absent from the
  * correctness file because nothing diagnosed the change up front.
  * Verify and Bench call [[report]] before running any query: one loud
  * named line per drifted column beats 32 scattered analysis errors.
  *
  * Columns may accept MULTIPLE Spark types — every encoding the scan
  * seam (`Tables.events` / the oracle SQL) is known to handle. A drift
  * line therefore means "no code path handles this", not "different
  * from last round".
  */
object Fixtures {
  /** Both landings of a parquet timestamp column (adjusted-to-UTC →
    * TimestampType; NTZ → TimestampNTZType under Spark 4's default
    * inferTimestampNTZ). */
  private val anyTimestamp: Seq[DataType] = Seq(TimestampType, TimestampNTZType)
  /** events.ts additionally lands LongType when the fixture is
    * TIMESTAMP(NANOS) and `nanosAsLong` is set (see Tables.events). */
  private val eventsTs: Seq[DataType] = LongType +: anyTimestamp

  val expected: Map[String, Seq[(String, Seq[DataType])]] = Map(
    "region" -> Seq(
      "r_regionkey" -> Seq(IntegerType), "r_name" -> Seq(StringType)),
    "nation" -> Seq(
      "n_nationkey" -> Seq(IntegerType), "n_name" -> Seq(StringType),
      "n_regionkey" -> Seq(IntegerType)),
    "customer" -> Seq(
      "c_custkey" -> Seq(LongType), "c_name" -> Seq(StringType),
      "c_nationkey" -> Seq(IntegerType), "c_acctbal" -> Seq(DoubleType),
      "c_mktsegment" -> Seq(StringType)),
    "supplier" -> Seq(
      "s_suppkey" -> Seq(LongType), "s_name" -> Seq(StringType),
      "s_nationkey" -> Seq(IntegerType), "s_acctbal" -> Seq(DoubleType)),
    "part" -> Seq(
      "p_partkey" -> Seq(LongType), "p_name" -> Seq(StringType),
      "p_brand" -> Seq(StringType), "p_type" -> Seq(StringType),
      "p_size" -> Seq(IntegerType), "p_retailprice" -> Seq(DoubleType)),
    "orders" -> Seq(
      "o_orderkey" -> Seq(LongType), "o_custkey" -> Seq(LongType),
      "o_orderstatus" -> Seq(StringType), "o_totalprice" -> Seq(DoubleType),
      "o_orderdate" -> anyTimestamp, "o_orderpriority" -> Seq(StringType)),
    "lineitem" -> Seq(
      "l_orderkey" -> Seq(LongType), "l_partkey" -> Seq(LongType),
      "l_suppkey" -> Seq(LongType), "l_linenumber" -> Seq(IntegerType),
      "l_quantity" -> Seq(DoubleType), "l_extendedprice" -> Seq(DoubleType),
      "l_discount" -> Seq(DoubleType), "l_tax" -> Seq(DoubleType),
      "l_returnflag" -> Seq(StringType), "l_linestatus" -> Seq(StringType),
      "l_shipdate" -> anyTimestamp),
    "events" -> Seq(
      "event_id" -> Seq(LongType), "ts" -> eventsTs,
      "user_id" -> Seq(LongType), "event_type" -> Seq(StringType),
      "value" -> Seq(DoubleType), "props" -> Seq(StringType)),
    "documents" -> Seq(
      "doc_id" -> Seq(LongType), "text" -> Seq(StringType),
      "lang" -> Seq(StringType), "source" -> Seq(StringType),
      "n_chars" -> Seq(LongType)),
    "embeddings" -> Seq(
      "vec_id" -> Seq(LongType),
      // element nullability varies by writer; accept either
      "embedding" -> Seq(ArrayType(FloatType, containsNull = true),
        ArrayType(FloatType, containsNull = false)),
      "label" -> Seq(IntegerType))
  )

  /** The embedding dimensionality the similarity family's deterministic
    * constants assume (LSH hyperplane grid, PQ's 4×16 subspace split,
    * and their SQL oracle mirrors). A dim drift would NOT fail any
    * query — zip_with pads and both engines degrade consistently — so
    * without this probe it would silently hollow out the ANN quality. */
  val EmbeddingDim = 64

  /** One message per drift found under `sfDir`; empty = all fixtures
    * match a handled encoding. Footer-only reads, plus ONE single-row
    * column probe (embeddings dim — list length is invisible to
    * schemas). */
  def drift(spark: SparkSession, sfDir: String): Seq[String] = {
    import scala.util.control.NonFatal
    // events may be TIMESTAMP(NANOS); without this the footer read
    // itself throws on the old encoding. Scoped set-and-restore: the
    // legacy mapping must not silently leak to every later read in the
    // session (a NANOS regeneration of a NON-events column should
    // still fail loudly at its scan, not land as a surprise long)
    val nanosKey = "spark.sql.legacy.parquet.nanosAsLong"
    val prevNanos = spark.conf.getOption(nanosKey)
    spark.conf.set(nanosKey, "true")
    try expected.toSeq.sortBy(_._1).flatMap { case (table, cols) =>
      val landed =
        try Right(spark.read.parquet(s"$sfDir/$table.parquet").schema)
        catch { case NonFatal(e) => Left(e) }
      landed match {
        case Left(e) =>
          Seq(s"table=$table UNREADABLE: ${e.getClass.getSimpleName}: ${e.getMessage}")
        case Right(schema) =>
          val byName = schema.fields.map(f => f.name -> f.dataType).toMap
          val missingOrWrong = cols.flatMap { case (name, accepted) =>
            byName.get(name) match {
              case None => Seq(s"table=$table column=$name MISSING " +
                s"(expected one of ${accepted.map(_.simpleString).mkString("/")})")
              case Some(t) if !accepted.contains(t) =>
                Seq(s"table=$table column=$name TYPE DRIFT: found ${t.simpleString}, " +
                  s"handled encodings: ${accepted.map(_.simpleString).mkString("/")}")
              case _ => Nil
            }
          }
          val extra = schema.fields.map(_.name).filterNot(cols.map(_._1).toSet)
            .map(n => s"table=$table column=$n UNEXPECTED (new column in fixture)")
          missingOrWrong ++ extra
      }
    } ++ crossPartDrift(spark, sfDir) ++ embeddingDimDrift(spark, sfDir) ++
      domainDrift(spark, sfDir)
    finally prevNanos match {
      case Some(v) => spark.conf.set(nanosKey, v)
      case None    => spark.conf.unset(nanosKey)
    }
  }

  /** Cross-part column-set check for DIRECTORY-shaped tables: when a
    * fixture table is a directory of part files and one part lacks a
    * column the others carry (a mixed-generator regeneration), Spark's
    * dir-level schema comes from ONE sampled footer — the table-level
    * pass above sees nothing wrong, and rows from the short parts read
    * as SILENT NULLS in that column (or, if the sampled footer is the
    * short one, the column vanishes — file-order-dependent). One footer
    * read per part names it up front. Column NAMES only: physical/
    * logical-type detail legitimately varies across writer generations
    * (events µs vs ns), and a same-name TYPE conflict already fails
    * loudly at scan time. Depth-1 listing — fixtures are never
    * hive-partitioned (partitioned snapshot tables live behind the
    * manifest, not here).
    */
  private def crossPartDrift(spark: SparkSession, sfDir: String): Seq[String] = {
    import scala.util.control.NonFatal
    import scala.jdk.CollectionConverters._
    val conf = spark.sessionState.newHadoopConf()
    expected.keys.toSeq.sorted.flatMap { table =>
      try {
        val p = new org.apache.hadoop.fs.Path(s"$sfDir/$table.parquet")
        val fs = p.getFileSystem(conf)
        if (!fs.exists(p) || fs.getFileStatus(p).isFile) Nil
        else {
          val parts = fs.listStatus(p).filter(st =>
            st.isFile && st.getPath.getName.endsWith(".parquet"))
          val cols: Seq[(String, Set[String])] = parts.toSeq.map { st =>
            val in = org.apache.parquet.hadoop.util.HadoopInputFile
              .fromStatus(st, conf)
            val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
            try st.getPath.getName ->
              r.getFooter.getFileMetaData.getSchema.getFields.asScala
                .map(_.getName).toSet
            finally r.close()
          }
          cols.headOption.toSeq.flatMap { case (refName, refCols) =>
            cols.tail.filter(_._2 != refCols).map { case (name, c) =>
              val missing = refCols -- c
              val extra = c -- refCols
              s"table=$table CROSS-PART SCHEMA DRIFT: part $name vs $refName — " +
                (if (missing.nonEmpty) s"missing ${missing.toSeq.sorted.mkString(",")} " +
                  "(those rows would read as SILENT NULLS)" else "") +
                (if (extra.nonEmpty) s"${if (missing.nonEmpty) "; " else ""}extra " +
                  extra.toSeq.sorted.mkString(",") else "")
            }
          }
        }
      } catch { case NonFatal(_) => Nil } // unreadable is the schema pass's report
    }
  }

  private def embeddingDimDrift(spark: SparkSession, sfDir: String): Seq[String] = {
    import scala.util.control.NonFatal
    import org.apache.spark.sql.functions.{col, size}
    val readable =
      try Some(spark.read.parquet(s"$sfDir/embeddings.parquet"))
      catch { case NonFatal(_) => None } // already reported by the schema pass
    readable.toSeq.flatMap { df =>
      df.limit(1).select(size(col("embedding"))).collect().headOption match {
        // an empty-but-readable fixture can't prove the dim — that is
        // itself a drift (every similarity query would go vacuous)
        case None => Seq("table=embeddings DIM PROBE: fixture has ZERO rows — " +
          s"cannot confirm the assumed dim $EmbeddingDim")
        case Some(row) =>
          val d = if (row.isNullAt(0)) -1 else row.getInt(0)
          if (d != EmbeddingDim)
            Seq(s"table=embeddings column=embedding DIM DRIFT: found $d, " +
              s"similarity-family constants (LSH planes, PQ subspaces) and their " +
              s"oracle mirrors assume $EmbeddingDim")
          else Nil
      }
    }
  }

  /** Value-DOMAIN envelopes (r19 s9). The schema pass above catches a
    * regenerated fixture whose TYPES drifted; this pass catches one
    * whose VALUES left the engine's documented handling domain — the
    * class the r19 regen actually shipped (p_retailprice collapsed to
    * a 100-wide band and silently degenerated a banded join 15×; that
    * operator is density-proof now, but the lesson stands: a
    * distribution change should be NAMED at startup, not discovered in
    * a bench regression). Each envelope is a real handling contract
    * with a named consequence, mirroring the drift philosophy ("no
    * code path handles this"), and is checked from parquet FOOTER
    * min/max statistics only — zero data pages read.
    */
  private[graft] val domainEnvelopes: Seq[(String, Seq[String], Double, Double, String)] = Seq(
    ("embeddings", Seq("embedding", "list", "element"),
      -graft.operators.MaxQuantizableComponent, graft.operators.MaxQuantizableComponent,
      "finiteEmbedding DROPS vectors with |component| beyond the quantizer " +
        "domain — a regen past it silently hollows the kmeans/PQ/SQ8 point sets"),
    ("events", Seq("user_id"),
      0.0, graft.functions.CountMin.MaxKey.toDouble,
      "CountMin.bucket THROWS per-row outside [0, MaxKey] (overflow-safe hash " +
        "range) and BitmapDistinct sizes its bitset by the max id"),
    // NOTE the envelope's blind spot (r20, measured): parquet footer
    // min/max SKIP NaN, so a NaN value never trips this bound (±Inf
    // does — it lands in max). That class needs no tripwire: Spark 4
    // ANSI casts NaN→decimal to NULL (the row null-skips every
    // dec(value) aggregate, pinned by the AdversarialFixtureSpec NaN
    // probe), and DuckDB errors on ANY decimal cast of NaN, so a NaN
    // regen turns the driver gate red instead of silently green.
    ("events", Seq("value"),
      -1e16, 1e16,
      "the dec() DECIMAL(18,2) presentation casts ANSI-kill on values past " +
        "~1e16 — one out-of-range row fails every pricing/stats aggregate")
  )

  private def domainDrift(spark: SparkSession, sfDir: String): Seq[String] = {
    import scala.util.control.NonFatal
    import scala.jdk.CollectionConverters._
    val conf = spark.sessionState.newHadoopConf()
    domainEnvelopes.flatMap { case (table, path, lo, hi, why) =>
      try {
        val root = new org.apache.hadoop.fs.Path(s"$sfDir/$table.parquet")
        val fs = root.getFileSystem(conf)
        if (!fs.exists(root)) Nil // the schema pass reports unreadable tables
        else {
          val parts =
            if (fs.getFileStatus(root).isFile) Seq(fs.getFileStatus(root))
            else fs.listStatus(root).toSeq.filter(st =>
              st.isFile && st.getPath.getName.endsWith(".parquet"))
          var mn = Double.PositiveInfinity
          var mx = Double.NegativeInfinity
          var rows = 0L
          var statless = false
          parts.foreach { st =>
            val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(st, conf)
            val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
            try r.getFooter.getBlocks.asScala.foreach { b =>
              rows += b.getRowCount
              // exact full-path match — the DottedColumnProbeSpec lesson:
              // dot-string matching lets a nested decoy shadow a column
              b.getColumns.asScala
                .filter(c => c.getPath.toArray.toSeq == path)
                .foreach { c =>
                  val s = c.getStatistics
                  if (s == null || s.isEmpty || !s.hasNonNullValue) {
                    if (b.getRowCount > 0) statless = true
                  } else {
                    def d(v: Comparable[_]): Double = v match {
                      case n: java.lang.Number => n.doubleValue()
                      case o => o.toString.toDouble
                    }
                    mn = math.min(mn, d(s.genericGetMin()))
                    mx = math.max(mx, d(s.genericGetMax()))
                  }
                }
            } finally r.close()
          }
          val colName = path.head
          if (mn.isPosInfinity && rows > 0 && statless)
            // can't prove the domain = same class as the zero-row dim probe
            Seq(s"table=$table column=$colName DOMAIN UNPROVABLE: footer carries no " +
              s"statistics for a domain-sensitive column — handled [$lo, $hi]; $why")
          else if (!mn.isPosInfinity && (mn < lo || mx > hi))
            Seq(s"table=$table column=$colName DOMAIN DRIFT: footer range " +
              s"[$mn, $mx] outside handled [$lo, $hi] — $why")
          else Nil
        }
      } catch { case NonFatal(_) => Nil } // unreadable is the schema pass's report
    }
  }

  /** Print every drift loudly to stderr; returns the count so callers
    * can decide to proceed (Verify/Bench do — partial results still
    * beat none) while the log names the root cause up front. */
  def report(spark: SparkSession, sfDir: String): Int = {
    val d = drift(spark, sfDir)
    d.foreach(m => System.err.println(s"[fixture-drift] $m"))
    if (d.nonEmpty) System.err.println(
      s"[fixture-drift] ${d.size} drift(s) in $sfDir — queries touching these " +
        "columns will likely fail; fix the scan seam (graft.sources) first")
    d.size
  }
}
