package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Adversarial fixture mutations BEYOND FixtureDriftSpec's synthetic
  * set (round-17 roadmap / SURVEY §7.9.12): each mutation is either
  * HANDLED (drift tripwire silent, queries produce standard-SQL
  * results) or REJECTED LOUDLY (a named drift line and/or a named
  * analysis error) — never a silent wrong answer.
  *
  * The three mutation classes probed here are the ones a driver-side
  * fixture regeneration (or a real 100 TB ingest) can plausibly ship:
  *  - NULLs appearing in join keys of tables that never had them —
  *    legal data, must flow with standard null-key join semantics
  *    (inner: never matches; left-outer: left rows preserved, null
  *    keys attach nowhere; groupBy: one null group);
  *  - a zero-row table with a valid footer (empty partition/source) —
  *    query paths are pinned by EmptyInputSweepSpec; HERE the drift
  *    tripwire's dim probe must name the unprovable-dim condition;
  *  - renamed / reordered parquet columns — reorder is a non-event
  *    (by-name resolution), rename must fire MISSING + UNEXPECTED and
  *    the touching query must fail at analysis naming the column.
  */
class AdversarialFixtureSpec extends SparkSpec {

  private val allTables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Clone every sf0.001 fixture into a fresh dir, applying `mutate`
    * to the named tables. events goes through the Tables seam (the raw
    * footer may need the nanos mapping; the clone lands a plain
    * timestamp, still within the accepted encodings).
    */
  private def cloneFixtures(dir: String,
                            mutate: Map[String, DataFrame => DataFrame]): Unit =
    allTables.foreach { t =>
      val base = if (t == "events") graft.sources.Tables.events(spark, sf)
                 else spark.read.parquet(s"$sf/$t.parquet")
      mutate.getOrElse(t, identity[DataFrame] _)(base)
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }

  private def withDir(mutate: Map[String, DataFrame => DataFrame])
                     (body: String => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("adv_fixture").toString
    try { cloneFixtures(dir, mutate); body(dir) }
    finally SessionToken.deleteDir(dir)
  }

  private def rows(name: String, dir: String): Seq[org.apache.spark.sql.Row] =
    SparkEntry.queries(name)(spark, dir).collect().toSeq

  test("NULL inner-join keys: handled — nulls never match, results equal the null-free subset") {
    // plant nulls in lineitem.l_partkey (the q_join_broadcast key) on a
    // deterministic ~5% slice; the fixture never had null keys, so this
    // is exactly the adversarial regeneration the roadmap names
    val nullCond = col("l_orderkey") % 19 === 3
    withDir(Map("lineitem" ->
        ((li: DataFrame) => li.withColumn("l_partkey",
          when(nullCond, lit(null)).otherwise(col("l_partkey")))))) { dir =>
      // legal data, not drift: the tripwire must stay silent
      val d = graft.sources.Fixtures.drift(spark, dir)
      assert(d.isEmpty, s"null join keys misreported as drift:\n${d.mkString("\n")}")
      val planted = spark.read.parquet(s"$dir/lineitem.parquet")
        .where(col("l_partkey").isNull).count()
      assert(planted > 0, "mutation planted no nulls — probe is vacuous")
      // inner-join semantics: a null key matches NOTHING, so the query
      // over the mutated fixture must equal the query over a fixture
      // with those rows REMOVED entirely — no crash, no phantom matches
      val got = rows("q_join_broadcast", dir)
      withDir(Map("lineitem" ->
          ((li: DataFrame) => li.where(!nullCond)))) { filteredDir =>
        assert(got == rows("q_join_broadcast", filteredDir),
          "null-key rows changed an inner join's result — they must never match")
      }
    }
  }

  test("NULL left-outer keys: handled — every left row preserved, null keys attach nowhere") {
    val nullCond = col("o_orderkey") % 17 === 5
    withDir(Map("orders" ->
        ((o: DataFrame) => o.withColumn("o_custkey",
          when(nullCond, lit(null)).otherwise(col("o_custkey")))))) { dir =>
      assert(graft.sources.Fixtures.drift(spark, dir).isEmpty)
      val custCount = spark.read.parquet(s"$dir/customer.parquet").count()
      val got = rows("q_join_outer", dir)
      // left-outer + groupBy(left key): exactly one output row per customer
      assert(got.size == custCount,
        s"left-outer lost/duplicated customers: ${got.size} vs $custCount")
      // the null-key orders attach to NO customer — identical to dropping them
      withDir(Map("orders" ->
          ((o: DataFrame) => o.where(!nullCond)))) { filteredDir =>
        assert(got == rows("q_join_outer", filteredDir),
          "null-key right rows changed a left-outer join's result")
      }
      // and a groupBy over the nulled key forms ONE null group (standard
      // SQL), sized exactly as planted — not dropped, not exploded
      val mutOrders = spark.read.parquet(s"$dir/orders.parquet")
      val planted = mutOrders.where(col("o_custkey").isNull).count()
      val nullGroups = mutOrders.groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n")).where(col("o_custkey").isNull).collect()
      assert(planted > 0 && nullGroups.length == 1 &&
        nullGroups.head.getLong(1) == planted)
    }
  }

  test("zero-row embeddings with a valid footer: the dim probe NAMES the unprovable dim") {
    // the fixture reads fine (schema pass silent) but carries no rows:
    // the similarity family would go vacuous while the hash gate stayed
    // green — the dim probe's ZERO-rows branch is the named tripwire
    withDir(Map("embeddings" -> ((e: DataFrame) => e.limit(0)))) { dir =>
      val d = graft.sources.Fixtures.drift(spark, dir)
      assert(d.exists(m => m.contains("table=embeddings") && m.contains("ZERO rows")),
        s"zero-row embeddings went unnamed:\n${d.mkString("\n")}")
      // no OTHER line fires — the schema itself is valid
      assert(d.size == 1, d.mkString("\n"))
      // and the query path stays empty-not-crash (EmptyInputSweepSpec
      // pins the full inventory; one representative here ties the two)
      assert(rows("q_sim_topk", dir).isEmpty)
    }
  }

  test("renamed column: drift fires MISSING + UNEXPECTED, the touching query fails NAMED at analysis") {
    withDir(Map("lineitem" ->
        ((li: DataFrame) => li.withColumnRenamed("l_quantity", "quantity")))) { dir =>
      val d = graft.sources.Fixtures.drift(spark, dir)
      assert(d.exists(m => m.contains("column=l_quantity") && m.contains("MISSING")),
        d.mkString("\n"))
      assert(d.exists(m => m.contains("column=quantity") && m.contains("UNEXPECTED")),
        d.mkString("\n"))
      // the query that reads l_quantity dies at ANALYSIS naming the
      // column — loud and attributable, never a silent wrong answer
      val e = intercept[org.apache.spark.sql.AnalysisException](
        rows("q_join_broadcast", dir))
      assert(e.getMessage.contains("l_quantity"), e.getMessage.take(200))
    }
  }

  test("mixed-schema part files: the silent-nulls hazard is real AND named up front") {
    // a table regenerated as a DIRECTORY where one part was written by
    // an older generator missing a column: Spark's dir-level schema
    // comes from one sampled footer, so the table-level drift pass sees
    // a complete schema while the short part's rows read as SILENT
    // NULLS. The cross-part footer check must name it.
    val dir = java.nio.file.Files.createTempDirectory("adv_mixed_parts").toString
    try {
      cloneFixtures(dir, Map.empty)
      // rebuild documents as a 2-part dir: part A full, part B lacking
      // n_chars — materialize BOTH to the side first (the frames read
      // lazily from the dir being replaced)
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val tmp = java.nio.file.Files.createTempDirectory("adv_short_part").toString
      docs.where(col("doc_id") % 2 === 0).coalesce(1).write.parquet(s"$tmp/full")
      docs.where(col("doc_id") % 2 =!= 0).drop("n_chars")
        .coalesce(1).write.parquet(s"$tmp/short")
      def partOf(sub: String) = new java.io.File(s"$tmp/$sub").listFiles()
        .find(_.getName.endsWith(".parquet")).get.toPath
      SessionToken.deleteDir(s"$dir/documents.parquet")
      java.nio.file.Files.createDirectory(
        java.nio.file.Paths.get(s"$dir/documents.parquet"))
      java.nio.file.Files.move(partOf("full"),
        java.nio.file.Paths.get(s"$dir/documents.parquet/part-a-full.parquet"))
      java.nio.file.Files.move(partOf("short"),
        java.nio.file.Paths.get(s"$dir/documents.parquet/part-b-short.parquet"))
      SessionToken.deleteDir(tmp)
      // the hazard: IF the sampled footer is the full one, the short
      // part's rows carry silent nulls (file-order-dependent — the
      // point of naming it up front rather than relying on a query)
      val landed = spark.read.parquet(s"$dir/documents.parquet")
      if (landed.columns.contains("n_chars"))
        assert(landed.where(col("n_chars").isNull).count() > 0,
          "expected the short part's rows to read as silent nulls")
      // the tripwire names the exact part and column
      val d = graft.sources.Fixtures.drift(spark, dir)
      assert(d.exists(m => m.contains("table=documents")
          && m.contains("CROSS-PART SCHEMA DRIFT") && m.contains("n_chars")),
        s"mixed-schema parts went unnamed:\n${d.mkString("\n")}")
    } finally SessionToken.deleteDir(dir)
  }

  test("NaN / zero-norm embeddings cannot flood similarity top-k: corrupt scores sort LAST") {
    // The 100 TB hazard: ONE corrupt vector (a NaN component, or an
    // all-zero vector whose 0/0 cosine is NaN) scores NaN against
    // EVERYTHING, and Spark orders NaN as the LARGEST double — under a
    // raw-double desc ranking a single bad row floods the entire
    // top-k. The engine's decimal-rounding discipline defuses it
    // (NaN → decimal cast → NULL → desc sorts nulls last), and this
    // probe PINS that defusal: dropping the cast "for speed" would
    // silently reintroduce NaN-first flooding.
    val nanId = 777777L; val zeroId = 777778L
    withDir(Map("embeddings" -> ((e: DataFrame) => {
      val nanVec = e.where(col("vec_id") === 1)
        .select(lit(nanId).as("vec_id"),
          expr("transform(embedding, x -> float('NaN'))").as("embedding"), col("label"))
      val zeroVec = e.where(col("vec_id") === 2)
        .select(lit(zeroId).as("vec_id"),
          expr("transform(embedding, x -> float(0.0))").as("embedding"), col("label"))
      e.unionByName(nanVec).unionByName(zeroVec)
    }))) { dir =>
      val top = rows("q_sim_topk", dir)
      assert(top.size == 10, s"top-k must still return k rows, got ${top.size}")
      val ids = top.map(_.getLong(0)).toSet
      assert(!ids.contains(nanId) && !ids.contains(zeroId),
        s"corrupt vectors flooded the top-k head: $ids")
      // every surviving head score is a real (non-null) similarity
      assert(top.forall(!_.isNullAt(top.head.fieldIndex("score"))),
        "top-k head must hold only real scores — corrupt rows sort last as NULL")
      // the pair family stays no-crash, and corrupt vectors are
      // EXCLUDED: an undefined cosine is NULL, and NULL >= threshold
      // filters out — never a fabricated similarity, never a job kill
      val pairs = SparkEntry.queries("q_sim_pairs")(spark, dir)
      assert(pairs.where(col("v1").isin(nanId, zeroId) ||
          col("v2").isin(nanId, zeroId)).count() == 0,
        "a corrupt vector must never appear in the thresholded pair output")
      // and the no-threshold ranked families survive too: kNN graph
      // ranks corrupt edges LAST — every edge touching a corrupt vector
      // carries a NULL score (advice r19: the old `count() >= 0` probe
      // was vacuous; this pins the actual claim)
      val knn = SparkEntry.queries("q_knn_graph")(spark, dir).collect()
      val corruptTouched = knn.filter(r =>
        Set(nanId, zeroId)(r.getLong(r.fieldIndex("src"))) ||
        Set(nanId, zeroId)(r.getLong(r.fieldIndex("dst"))))
      assert(corruptTouched.nonEmpty, "fixture must produce corrupt-touching edges")
      assert(corruptTouched.forall(_.isNullAt(corruptTouched.head.fieldIndex("score"))),
        "every edge touching a corrupt vector must carry a NULL score")
      // ...and NULL never outranks real: within each src's head, every
      // null-scored edge ranks strictly AFTER every real-scored edge
      // (the desc-nulls-last invariant a NaN-first regression breaks)
      knn.groupBy(_.getLong(0)).foreach { case (src, edges) =>
        val nullRks = edges.filter(_.isNullAt(edges.head.fieldIndex("score")))
          .map(_.getLong(edges.head.fieldIndex("rk")))
        val realRks = edges.filterNot(_.isNullAt(edges.head.fieldIndex("score")))
          .map(_.getLong(edges.head.fieldIndex("rk")))
        assert(nullRks.forall(n => realRks.forall(_ < n)),
          s"src=$src: a NULL-scored edge outranked a real one (null rks ${nullRks.toSeq}, real rks ${realRks.toSeq})")
      }
      // the QUANTIZATION family is the harder class: each path CASTS a
      // component-derived double to an integer, and under ANSI one NaN
      // component kills the whole job at that cast (amax > 0 alone does
      // NOT exclude NaN — Spark orders NaN above every value). The
      // finite-embedding guards must make all three paths no-crash with
      // the corrupt ids absent (unquantizable vectors leave the index)
      val sq8 = rows("q_sim_quantized", dir)
      assert(!sq8.map(_.getLong(0)).toSet.exists(Set(nanId, zeroId)),
        "corrupt vectors must be excluded from the SQ8 ranking")
      val pq = rows("q_sim_ann_pq", dir)
      assert(!pq.map(_.getLong(0)).toSet.exists(Set(nanId, zeroId)),
        "corrupt vectors must be excluded from the PQ ranking")
      // kmeans: the NaN vector is unclusterable and leaves the point
      // set; the ZERO vector is a legitimate finite point and stays
      val km = SparkEntry.queries("q_cluster_kmeans")(spark, dir).collect()
      assert(km.nonEmpty, "kmeans must survive a corrupt vector in the corpus")
    }
    // a corrupt QUERY vector (vec_id 0 itself NaN): a non-finite query
    // is NOT a query. Unguarded, the float ANN paths "rank" everything
    // with NULL scores and return 10 meaningless rows in vec_id order;
    // the honest answer is the missing-query contract's EMPTY result —
    // which the integer paths (SQ8/PQ) already give because their index
    // filters drop the probe row
    withDir(Map("embeddings" -> ((e: DataFrame) =>
        e.withColumn("embedding", when(col("vec_id") === 0,
          expr("transform(embedding, x -> float('NaN'))")).otherwise(col("embedding")))))) { dir =>
      for (q <- Seq("q_sim_topk", "q_sim_ann_lsh", "q_sim_ann_ivf",
                    "q_sim_quantized", "q_sim_ann_pq")) {
        assert(rows(q, dir).isEmpty,
          s"$q must return the same-shape EMPTY result for a non-finite query vector")
      }
    }
  }

  test("huge-finite / null-element embeddings: quantizers exclude them, nothing job-kills (advice r19)") {
    // Two corrupt classes the r18 NaN/Inf guard did NOT cover:
    //  - a finite-but-huge component (1e20): passes any `<= Double.MaxValue`
    //    bound yet still overflows the ×1e6+2e6 BIGINT quantizer, killing
    //    kmeans/PQ under ANSI — the guard must bound by the QUANTIZER's
    //    domain, not by what doubles can represent;
    //  - a NULL element ([null, x, ...]): array_max SKIPS null entries, so
    //    the vector passes a max-only guard and its null q then silently
    //    computes PARTIAL-DIMENSION distances downstream — worse than a
    //    crash. It must be dropped from every integer index.
    val hugeId = 777781L; val nullElemId = 777782L
    withDir(Map("embeddings" -> ((e: DataFrame) => {
      val huge = e.where(col("vec_id") === 1).select(lit(hugeId).as("vec_id"),
        expr("transform(embedding, (x, i) -> IF(i = 0, float(1e20), x))").as("embedding"),
        col("label"))
      val nullElem = e.where(col("vec_id") === 2).select(lit(nullElemId).as("vec_id"),
        expr("transform(embedding, (x, i) -> IF(i = 0, CAST(NULL AS FLOAT), x))").as("embedding"),
        col("label"))
      e.unionByName(huge).unionByName(nullElem)
    }))) { dir =>
      // the ×1e6 quantizer family: no kill, corrupt ids out of the index
      val pq = rows("q_sim_ann_pq", dir)
      assert(!pq.map(_.getLong(0)).toSet.exists(Set(hugeId, nullElemId)),
        "huge/null-element vectors must be excluded from the PQ ranking")
      // kmeans: strongest form — the corrupt rows are NEW rows, so
      // dropping them must reproduce the clean fixture's exact result
      // (a partial-dimension distance would silently perturb counts)
      val kmClean = rows("q_cluster_kmeans", sf)
      val kmCorrupt = rows("q_cluster_kmeans", dir)
      assert(kmCorrupt == kmClean,
        s"kmeans over the corrupted fixture must equal the clean result\nclean=$kmClean\ncorrupt=$kmCorrupt")
      // SQ8 + float cosine paths: no-crash, and the null-element vector
      // (NULL dot => NULL score) never enters a thresholded/top-k head
      val sq8 = rows("q_sim_quantized", dir)
      assert(!sq8.map(_.getLong(0)).contains(nullElemId),
        "null-element vector must not reach the SQ8 head")
      val top = rows("q_sim_topk", dir)
      assert(!top.map(_.getLong(0)).contains(nullElemId),
        "null-element vector must not reach the cosine top-k head")
      val pairs = SparkEntry.queries("q_sim_pairs")(spark, dir)
      assert(pairs.where(col("v1") === nullElemId || col("v2") === nullElemId).count() == 0,
        "null-element vector must not appear in thresholded pairs")
    }
  }

  test("ragged (dimension-mismatched) embeddings: partial-dimension distances never rank, a ragged query is no query") {
    // The corrupt-embedding class the NaN/huge/null-element probes do
    // NOT cover: a TRUNCATED vector (an upstream embedding job emitting
    // the wrong dim is routine corpus corruption) is finite with no
    // null elements, so it passes finiteEmbedding — the danger is not a
    // crash but a silent wrong answer. PQ's distance is a SUM of
    // per-subspace contributions under an ASC ranking: a dim-8 vector
    // carries codes for 1 of 4 subspaces, sums a quarter-distance, and
    // WINS the head (measured under the mutant: rank 1). The float
    // paths return NULL dots on ragged inputs (float_dot's length
    // check) — those must be structurally excluded from every top-k
    // head, not merely sorted last behind enough real candidates.
    val raggedId = 666661L
    withDir(Map("embeddings" -> ((e: DataFrame) => {
      val ragged = e.where(col("vec_id") === 3).select(lit(raggedId).as("vec_id"),
        expr("slice(embedding, 1, 8)").as("embedding"), col("label"))
      e.unionByName(ragged)
    }))) { dir =>
      for (q <- Seq("q_sim_topk", "q_sim_ann_lsh", "q_sim_ann_ivf",
                    "q_sim_quantized", "q_sim_ann_pq")) {
        val out = SparkEntry.queries(q)(spark, dir).collect()
        assert(!out.map(_.getLong(0)).contains(raggedId),
          s"$q ranked the ragged vector")
        val scoreCol = if (out.isEmpty || out.head.schema.fieldNames.contains("score"))
          "score" else "pq_dist"
        assert(out.forall(r => !r.isNullAt(r.fieldIndex(scoreCol))),
          s"$q emitted a null-score row — NULL is not a ranking candidate")
      }
      // threshold families: NULL >= t is never true
      val pairs = SparkEntry.queries("q_sim_pairs")(spark, dir)
      assert(pairs.where(col("v1") === raggedId || col("v2") === raggedId).count() == 0,
        "ragged vector must not appear in thresholded pairs")
      // kmeans: the DOCUMENTED ragged semantics (assignLit scaladoc,
      // mirrored by the oracle) — the vector clusters on its present
      // dims, so total membership grows by exactly one, no kill
      val kmClean = rows("q_cluster_kmeans", sf)
      val km = rows("q_cluster_kmeans", dir)
      assert(km.map(_.getLong(1)).sum == kmClean.map(_.getLong(1)).sum + 1,
        "kmeans must cluster the ragged vector on its present dims (documented semantics)")
    }
    // kNN label vote: the rn<=5 vote window is CAPACITY-DEPENDENT, so
    // with only two real candidates a corrupt candidate's NULL-score
    // row entered the vote and FLIPPED every probe's prediction via the
    // 1-1-1 count tie + label-asc tiebreak (ragged label 1 beats real
    // labels 5 and 7). NULL score = not a voter: predictions must equal
    // the same fixture without the ragged row.
    def twoCandFixture(withRagged: Boolean)(e: DataFrame): DataFrame = {
      val lt = e.schema("label").dataType
      val base = e.where(col("vec_id") < 10)
        .unionByName(e.where(col("vec_id") === 10)
          .withColumn("label", lit(5).cast(lt)))
        .unionByName(e.where(col("vec_id") === 11)
          .withColumn("label", lit(7).cast(lt)))
      if (!withRagged) base
      else base.unionByName(e.where(col("vec_id") === 11).select(
        lit(raggedId).as("vec_id"), expr("slice(embedding, 1, 8)").as("embedding"),
        lit(1).cast(lt).as("label")))
    }
    withDir(Map("embeddings" -> (twoCandFixture(withRagged = true) _))) { dir =>
      val got = rows("q_knn_label", dir)
      withDir(Map("embeddings" -> (twoCandFixture(withRagged = false) _))) { cleanDir =>
        assert(got == rows("q_knn_label", cleanDir),
          "a NULL-score candidate changed kNN label predictions — it must never vote")
      }
    }
    // the DEGENERATE ragged case, pinned separately because its kmeans
    // semantics DIFFER from dim-8 ragged: a zero-length vector has no
    // present dims at all, so it is DROPPED from the point set where
    // ragged clusters on present dims (+1). The drop is doubly
    // guaranteed (measured: a forall-style guard mutant that admits
    // the empty array STILL passes this pin): finiteEmbedding's
    // array_max(empty) = NULL fails the bound predicate, and
    // posexplode(empty) emits zero point rows anyway — this pin holds
    // the no-phantom-member contract itself, whichever layer a future
    // refactor removes. Float paths NULL its dot (length check), so
    // the ranking exclusions are the same as ragged.
    val emptyId = 666662L
    withDir(Map("embeddings" -> ((e: DataFrame) => {
      val emptyVec = e.where(col("vec_id") === 3).select(
        lit(emptyId).as("vec_id"),
        expr("slice(embedding, 1, 0)").as("embedding"), col("label"))
      e.unionByName(emptyVec)
    }))) { dir =>
      for (q <- Seq("q_sim_topk", "q_sim_ann_lsh", "q_sim_ann_ivf",
                    "q_sim_quantized", "q_sim_ann_pq")) {
        val out = SparkEntry.queries(q)(spark, dir).collect()
        assert(!out.map(_.getLong(0)).contains(emptyId),
          s"$q ranked the zero-length vector")
      }
      assert(SparkEntry.queries("q_sim_pairs")(spark, dir)
          .where(col("v1") === emptyId || col("v2") === emptyId).count() == 0,
        "a zero-length vector must not appear in thresholded pairs")
      val kmClean = rows("q_cluster_kmeans", sf)
      val kmEmpty = rows("q_cluster_kmeans", dir)
      assert(kmEmpty.map(_.getLong(1)).sum == kmClean.map(_.getLong(1)).sum,
        "a zero-length vector has no position — kmeans membership must be UNCHANGED")
    }

    // a ragged QUERY vector is NOT a query: finite, so it passes the
    // r18 non-finite guard, but it scores every candidate NULL (float
    // paths), nulls every qdot (SQ8), and degenerates the ADC table to
    // fewer subspaces than any clean vector carries (PQ). All five must
    // return the missing-query same-shape EMPTY — pre-fix the float
    // heads returned 10 null-score rows in vec_id order and PQ silently
    // ranked every vector on ONE subspace's distance
    withDir(Map("embeddings" -> ((e: DataFrame) =>
        e.withColumn("embedding", when(col("vec_id") === 0,
          expr("slice(embedding, 1, 8)")).otherwise(col("embedding")))))) { dir =>
      for (q <- Seq("q_sim_topk", "q_sim_ann_lsh", "q_sim_ann_ivf",
                    "q_sim_quantized", "q_sim_ann_pq")) {
        assert(rows(q, dir).isEmpty,
          s"$q must return the same-shape EMPTY result for a ragged query vector")
      }
      // ...and a ragged PROBE vector gets NO prediction row instead of
      // one fabricated from all-NULL scores (probe 0 is the sliced one)
      val kl = rows("q_knn_label", dir)
      assert(!kl.map(_.getLong(0)).contains(0L),
        "a ragged probe must get no kNN label prediction")
      assert(kl.map(_.getLong(0)).toSet == (1L to 9L).toSet,
        "the other probes' predictions must be unaffected")
    }
  }

  test("corrupt documents (NULL / empty / surrogate-pair text): no job kills, null text is not a document") {
    // The text mirror of the corrupt-embeddings class: a NULL text row
    // reaches the Scala String UDFs as Scala null (Spark null-skips
    // only PRIMITIVE args — reference types are passed through) and an
    // unguarded signature UDF NPE-kills the whole dedup job on one bad
    // row. Empty text and astral-plane text (surrogate pairs) must
    // flow: deterministic signatures, standard SQL null propagation on
    // the built-in paths.
    val nullId = 888881L; val emptyId = 888882L; val emojiId = 888883L
    // a 200k-char SINGLE-token blob (base64 dump, minified JS — routine
    // in web corpora): its avg token length is legitimately 200000,
    // which overflowed the old DECIMAL(9,4) presentation cast and
    // ANSI-killed q_text_quality on one row (r19 sweep, the SQ8 class)
    val megaId = 888884L
    // TWO null-text rows (not one): the multimodal-dedup phantom-group
    // defect needs a pair — md5(NULL) groups every null-text doc into
    // ONE digest-NULL bucket, so two UNRELATED corrupt docs were
    // reported as copies with a named keeper (r19 find)
    val nullId2 = 888885L
    // null text with SUBSTANTIAL n_chars metadata (the metadata/content
    // mismatch): pre-fix, q_text_quality's composite read the metadata
    // branch and FABRICATED quality 0.5 for a contentless doc, and
    // q_text_langid's bare otherwise('fr') fabricated a language
    val nullId3 = 888886L
    withDir(Map("documents" -> ((d: DataFrame) => {
      val proto = d.limit(1)
      def planted(id: Long, text: Column, nChars: Column = lit(0L)) = proto.select(
        lit(id).as("doc_id"), text.as("text"), col("lang"),
        col("source"), nChars.as("n_chars"))
      d.unionByName(planted(nullId, lit(null).cast("string")))
        .unionByName(planted(emptyId, lit("")))
        .unionByName(planted(emojiId, lit("a 😀 b 😀 a 😀 b")))
        .unionByName(planted(megaId, expr("repeat('x', 200000)"), lit(200000L)))
        .unionByName(planted(nullId2, lit(null).cast("string")))
        .unionByName(planted(nullId3, lit(null).cast("string"), lit(500L)))
    }))) { dir =>
      // the UDF-signature dedup family: one NULL text must not NPE the
      // job, and the null row must be absent (not a document); the
      // empty/emoji rows must flow as ordinary documents
      for (q <- Seq("q_dedup_minhash", "q_dedup_simhash", "q_dedup_ngram_jaccard",
                    "q_decontaminate")) {
        val out = SparkEntry.queries(q)(spark, dir)
        val cols = out.columns.filter(c => c == "d1" || c == "d2" || c == "doc_id")
        val touched = out.where(cols.map(c => col(c) === nullId).reduce(_ || _)).count()
        assert(touched == 0, s"$q surfaced the null-text row")
      }
      // built-in-function text paths: standard null propagation, no kill
      for (q <- Seq("q_text_tokens", "q_text_stats", "q_dedup_exact", "q_udtf_bigrams",
                    "q_udf_scalar")) {
        SparkEntry.queries(q)(spark, dir).collect() // no-crash is the contract
      }
      // determinism across the surrogate-pair row: two runs, same bytes
      val r1 = rows("q_dedup_simhash", dir)
      val r2 = rows("q_dedup_simhash", dir)
      assert(r1 == r2, "simhash over astral-plane text must be deterministic")
      // the mega-token doc: q_text_quality must SURVIVE it and report
      // the honest (huge) average token length — pre-fix the
      // DECIMAL(9,4) presentation cast ANSI-killed the whole query
      val tq = SparkEntry.queries("q_text_quality")(spark, dir)
      val mega = tq.where(col("doc_id") === megaId).collect()
      assert(mega.length == 1 &&
        mega.head.getDouble(mega.head.fieldIndex("avg_tok_len")) == 200000.0,
        s"mega-token doc must report avg_tok_len 200000, got ${mega.toSeq}")
      // no content = no prediction: the null-text docs stay VISIBLE
      // rows in the per-doc reports, but every content-derived signal
      // is honest NULL — pre-fix langid fabricated 'fr' (every score
      // NULL, every >= false, bare otherwise) and quality fabricated
      // 0.5 from the n_chars metadata branch alone; both engines
      // MIRRORED the fabrication, so only this probe can catch it.
      // Empty text ties every score at 0 and predicts 'en' by the
      // fixed tie order — the documented degenerate, not a fabrication.
      val lid = SparkEntry.queries("q_text_langid")(spark, dir)
        .where(col("doc_id").isin(nullId, nullId3, emptyId)).collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(2)) null else r.getString(2))).toMap
      assert(lid.size == 3 && lid(nullId) == null && lid(nullId3) == null &&
        lid(emptyId) == "en",
        s"langid must NULL a contentless doc's prediction: $lid")
      val qual = SparkEntry.queries("q_text_quality")(spark, dir)
        .where(col("doc_id").isin(nullId, nullId3)).collect()
      assert(qual.length == 2 &&
        qual.forall(r => r.isNullAt(r.fieldIndex("quality"))),
        s"quality must be NULL for null text, even with big n_chars metadata: ${qual.toSeq}")
      // multimodal (r19): a null-text doc has no media. Pre-fix, ONE
      // null row job-killed q_multimodal_features at requireBlob — the
      // library contract is correctly loud, but the contract query must
      // itself do the upstream filtering that message demands
      val mf = SparkEntry.queries("q_multimodal_features")(spark, dir).collect()
      val mfIds = mf.map(_.getLong(0)).toSet
      assert(!mfIds(nullId) && !mfIds(nullId2),
        "null-text docs must be absent from multimodal features")
      // the empty and mega blobs flow as ordinary media with exact
      // decode-stub arithmetic ('x' = byte 120)
      val mfEmpty = mf.find(_.getLong(0) == emptyId).get
      assert(mfEmpty.getInt(1) == 0 && mfEmpty.getLong(2) == 0L && mfEmpty.getInt(3) == 0,
        s"empty blob must decode to (0,0,0), got $mfEmpty")
      val mfMega = mf.find(_.getLong(0) == megaId).get
      assert(mfMega.getInt(1) == 200000 && mfMega.getLong(2) == 200000L * 120 &&
        mfMega.getInt(3) == 120, s"mega blob decode-stub mismatch: $mfMega")
      // dedup: NULL is not a content key — pre-fix the two null-text
      // docs formed a digest-NULL dup group naming 888881 as keeper of
      // a "copy" it shares no content with
      val md = SparkEntry.queries("q_multimodal_dedup")(spark, dir)
      assert(md.where(col("digest").isNull ||
        col("keeper").isin(nullId, nullId2)).count() == 0,
        "null-text docs must not form a phantom dup group")
    }
  }

  test("malformed / wrong-typed JSON in events.props: honest NULLs, no job kills, no phantom keys") {
    // The one §1.2 semi-structured column the corrupt-row sweep had not
    // planted yet. Five corruption classes a real event pipeline ships:
    // truncated JSON, a wrong-TYPED value ({"k":"abc"} — valid JSON,
    // invalid int), an explicit null value, a NULL props, and an empty
    // string. Contract: every JSON consumer treats each as an honest
    // NULL k (standard SQL), never a job kill (ANSI cast on the
    // extracted string!) and never a phantom key/group.
    val ids = (888891L to 888895L)
    val planted = Map(
      888891L -> lit("{\"k\": 7, truncated"),       // malformed
      888892L -> lit("{\"k\": \"abc\"}"),            // wrong-typed value
      888893L -> lit("{\"k\": null}"),               // explicit null
      888894L -> lit(null).cast("string"),            // NULL props
      888895L -> lit(""))                             // empty string
    withDir(Map("events" -> ((e: DataFrame) => {
      val proto = e.limit(1)
      val extra = planted.toSeq.sortBy(_._1).map { case (id, props) =>
        proto.select(lit(id).as("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"), props.as("props"))
      }.reduce(_ unionByName _)
      e.unionByName(extra)
    }))) { dir =>
      // q_source_json: every planted row surfaces with k = NULL
      val sj = SparkEntry.queries("q_source_json")(spark, dir)
      val got = sj.where(col("event_id").isin(ids.toSeq: _*)).collect()
      assert(got.length == ids.size, s"planted rows missing from q_source_json: ${got.length}")
      assert(got.forall(_.isNullAt(got.head.fieldIndex("k"))),
        "every corrupt-props row must surface k as honest NULL")
      // q_fn_map_json: no kill; malformed rows carry NULL map columns,
      // the {"k": null} row keeps its key but null-skips the sum
      val mj = SparkEntry.queries("q_fn_map_json")(spark, dir)
      val mrows = mj.where(col("event_id").isin(ids.toSeq: _*)).collect()
      assert(mrows.length == ids.size)
      def f(r: org.apache.spark.sql.Row, c: String) =
        if (r.isNullAt(r.fieldIndex(c))) null else r.get(r.fieldIndex(c))
      val byId = mrows.map(r => r.getLong(0) -> r).toMap
      for (id <- Seq(888891L, 888894L, 888895L))
        assert(f(byId(id), "keys_csv") == null && f(byId(id), "n_keys") == null &&
          f(byId(id), "vals_sum") == null,
          s"$id: unparseable props must yield NULL map columns, got ${byId(id)}")
      // wrong-typed value: from_json PERMISSIVE nulls the WHOLE map
      // (measured), never a partial map with the bad entry dropped —
      // the oracle's `ok` CTE mirrors exactly this contract (the r20
      // list-null sweep found its old unscoped coalesce read 0 for
      // NULL props, its plain-CAST k_val was the q_source_json kill
      // class, and DuckDB TRY_CAST rounds '2.5' where Spark rejects)
      assert(Seq("keys_csv", "n_keys", "k_val", "vals_sum")
        .forall(c => f(byId(888892L), c) == null),
        s"wrong-typed value must null the whole map: ${byId(888892L)}")
      assert(f(byId(888893L), "keys_csv") == "k" && f(byId(888893L), "vals_sum") == 0,
        s"explicit-null value must keep the key and null-skip the sum: ${byId(888893L)}")
      // no phantom groups: an aggregation keyed on the TYPED extracted
      // value puts every corrupt row in the one NULL group — never a
      // fabricated key 0 (the sketch family's r18 phantom mode) and
      // never a job kill at the group-key cast
      val grouped = graft.sources.Tables.events(spark, dir)
        .where(col("event_id").isin(ids.toSeq: _*))
        .groupBy(expr("try_cast(get_json_object(props, '$.k') AS INT)").as("k"))
        .count().collect()
      assert(grouped.length == 1 && grouped.head.isNullAt(0) &&
        grouped.head.getLong(1) == ids.size,
        s"all corrupt rows must land in the single NULL group: ${grouped.mkString}")
    }
  }

  test("corrupt events (NULL user_id / NULL ts): streaming family no-crash, session twins stay equal") {
    // Null user ids and null timestamps are ROUTINE client-bug output
    // in real event streams. The built-in paths null-propagate
    // (standard SQL), but the typed sessionization twin encodes
    // user_id into a non-nullable Long — unguarded, ONE null row kills
    // the whole job ("Null value appeared in non-nullable field").
    def plantCorrupt(e: DataFrame): DataFrame = {
      val proto = e.limit(1)
      def planted(id: Long, user: Column, ts: Column) = proto.select(
        lit(id).as("event_id"), ts.as("ts"), user.as("user_id"),
        col("event_type"), col("value"), col("props"))
      e.unionByName(planted(999991L, lit(null).cast("long"), col("ts")))
        .unionByName(planted(999992L, col("user_id"), lit(null).cast("timestamp")))
    }
    withDir(Map("events" -> plantCorrupt _)) { dir =>
      // every streaming key survives the corrupt rows
      for (q <- Seq("q_stream_tumbling", "q_stream_sliding", "q_stream_session",
                    "q_stream_session_custom", "q_stream_dedup", "q_stream_late",
                    "q_stream_join", "q_stream_static")) {
        SparkEntry.queries(q)(spark, dir).collect() // no-crash is the contract
      }
      // the typed SKETCH aggregators must follow SQL null semantics: a
      // null user_id is NOT a key/member. Pre-fix, the primitive-Long
      // input encoder coerced null to 0L — BitmapDistinct counted a
      // PHANTOM distinct key 0 (measured: 3 where nulls-ignored truth
      // is 2), CountMin incremented key 0's cells, and HllSketch
      // hashed a phantom member while its paired countDistinct
      // correctly ignored the null: a silent exact-vs-estimate split.
      // Each sketch result over the corrupt fixture must equal the
      // same query over the null-rows-DROPPED fixture.
      // reference dir: the SAME planted rows minus only the null-USER
      // one — the null-ts row carries a real user and must count in
      // both, or the comparison blames the sketch for a row-count diff
      withDir(Map("events" ->
          ((e: DataFrame) => plantCorrupt(e).where(col("user_id").isNotNull)))) {
        cleanDir =>
          // n_events is a plain count(*) that legitimately sees the
          // planted row — drop it; every remaining column is
          // sketch-or-distinct-derived and must be null-blind
          def sketchCols(q: String, d: String) =
            SparkEntry.queries(q)(spark, d).drop("n_events").collect().toSeq
          for (q <- Seq("q_agg_bitmap_distinct", "q_agg_countmin", "q_agg_hll_custom")) {
            assert(sketchCols(q, dir) == sketchCols(q, cleanDir),
              s"$q diverged on a null user_id — the phantom-key-0 class")
          }
      }
      // the two session forms share one oracle and must stay EQUAL on
      // corrupt data too: rows that cannot be sessionized (null user
      // or null time) contribute to neither
      val builtIn = rows("q_stream_session", dir)
        .filter(r => !r.isNullAt(2)) // drop a null-user group if the built-in emits one
      val custom = rows("q_stream_session_custom", dir)
      assert(custom.size == builtIn.size &&
        custom.map(r => (r.getLong(2), r.getTimestamp(0))).toSet ==
          builtIn.map(r => (r.getLong(2), r.getTimestamp(0))).toSet,
        s"session twins diverged on corrupt events: builtin=${builtIn.size} custom=${custom.size}")
    }
  }

  test("corrupt events/orders in the BATCH window family: null-blind aggregates unchanged, corruption contained to the touched partition") {
    // The s8 probe covered the STREAMING family; the batch window
    // family computes over entity partitions where a null key forms
    // its own visible partition and a null ts sorts FIRST (Spark
    // window order). The contract pinned here has two halves:
    // (a) null-BLIND summaries (funnel's countDistinct skips the null
    //     user, min() skips the null ts; rolling-DAU's null day
    //     explodes to zero calendar rows) — output EQUAL to the
    //     unplanted base;
    // (b) per-row outputs change ONLY inside the partition the corrupt
    //     row touches (the null partition itself, or the planted
    //     user's/custkey's own rows) — corruption never leaks into
    //     other entities' results.
    def plantCorrupt(e: DataFrame): DataFrame = {
      val proto = e.limit(1)
      def planted(id: Long, user: Column, ts: Column) = proto.select(
        lit(id).as("event_id"), ts.as("ts"), user.as("user_id"),
        col("event_type"), col("value"), col("props"))
      e.unionByName(planted(999993L, lit(null).cast("long"), col("ts")))
        .unionByName(planted(999994L, col("user_id"), lit(null).cast("timestamp")))
    }
    val protoUser = graft.sources.Tables.events(spark, sf)
      .limit(1).select("user_id").head.getLong(0)
    withDir(Map("events" -> plantCorrupt _)) { dir =>
      for (q <- Seq("q_win_funnel", "q_win_rolling_dau"))
        assert(rows(q, dir) == rows(q, sf),
          s"$q must be null-blind — planted null-user/null-ts rows changed it")
      // (q, user_id column index): drop the null partition and the
      // planted user's rows on the corrupt side, the planted user's
      // rows on the base side; everything remaining must be identical
      for ((q, idx) <- Seq(("q_win_running_distinct", 1), ("q_win_sessionize", 0))) {
        val got = rows(q, dir).filter(r => !r.isNullAt(idx) && r.getLong(idx) != protoUser)
        val base = rows(q, sf).filter(r => r.getLong(idx) != protoUser)
        assert(got == base,
          s"$q leaked corruption outside the touched partition")
      }
    }
    // islands runs on ORDERS: a null custkey is a visible island
    // partition of its own; a null orderdate sorts first inside its
    // custkey's partition. Nothing may be lost (run lengths tile the
    // row count exactly) and untouched custkeys stay bit-identical.
    val protoCust = spark.read.parquet(s"$sf/orders.parquet")
      .limit(1).select("o_custkey").head.getLong(0)
    def plantOrders(o: DataFrame): DataFrame = {
      val proto = o.limit(1)
      o.unionByName(proto.withColumn("o_orderkey", lit(7777771L))
          .withColumn("o_custkey", lit(null).cast("long")))
        .unionByName(proto.withColumn("o_orderkey", lit(7777772L))
          .withColumn("o_orderdate", lit(null).cast("date")))
    }
    withDir(Map("orders" -> plantOrders _)) { dir =>
      val got = rows("q_win_islands", dir)
      val nOrders = spark.read.parquet(s"$dir/orders.parquet").count()
      assert(got.map(_.getLong(5)).sum == nOrders,
        "island run lengths must tile the order count exactly — a corrupt row was lost or double-counted")
      assert(got.exists(_.isNullAt(0)),
        "the null-custkey row must surface as a VISIBLE null-partition island")
      val gotOthers = got.filter(r => !r.isNullAt(0) && r.getLong(0) != protoCust)
      val baseOthers = rows("q_win_islands", sf).filter(_.getLong(0) != protoCust)
      assert(gotOthers == baseOthers,
        "q_win_islands leaked corruption outside the touched custkey partition")
    }
  }

  test("null event_type: only an explicit 'error' tombstones a key in LWW compaction") {
    // A tombstone is an EXPLICIT 'error'; a latest write with NULL type
    // (corrupt producer output) is an unknown write, not a delete. The
    // naive =!= comparison was NULL for it and silently dropped the
    // whole key from the compacted view — data loss indistinguishable
    // from a tombstone, and the oracle's <> mirrored it. The key must
    // stay visible with last_type NULL; the real tombstone path must
    // stay intact.
    def plant(e: DataFrame): DataFrame = {
      val proto = e.limit(1)
      def planted(id: Long, user: Long, tpe: Column, tsShift: Int) = proto.select(
        lit(id).as("event_id"),
        (col("ts") + expr(s"interval $tsShift days")).as("ts"),
        lit(user).as("user_id"), tpe.as("event_type"),
        col("value"), col("props"))
      e.unionByName(planted(999995L, 8888801L, lit(null).cast("string"), 4000))
        .unionByName(planted(999996L, 8888802L, lit("purchase"), 3999))
        .unionByName(planted(999997L, 8888802L, lit("error"), 4000))
    }
    withDir(Map("events" -> plant _)) { dir =>
      val out = SparkEntry.queries("q_snapshot_compact")(spark, dir)
        .where(col("user_id").isin(8888801L, 8888802L)).collect()
      assert(out.length == 1 && out.head.getLong(0) == 8888801L &&
        out.head.isNullAt(out.head.fieldIndex("last_type")),
        s"a null-type latest write must keep its key visible (and only the " +
          s"explicit tombstone user may be deleted): ${out.toSeq}")
    }
  }

  test("zero-mass segment: gini is NULL, never a DIVIDE_BY_ZERO job kill; real segments unchanged") {
    // the corr class on the gini denominator: a segment whose order
    // totals sum to EXACTLY zero (a refunded batch, a zero-placeholder
    // regen) zeroes n·Σx and one degenerate group killed the whole
    // query (measured under the mutant: ANSI [DIVIDE_BY_ZERO]). Gini
    // of a zero-mass distribution is undefined => NULL.
    def plantCust(c: DataFrame): DataFrame =
      c.unionByName(c.limit(1)
        .withColumn("c_custkey", lit(999990L))
        .withColumn("c_mktsegment", lit("ZEROMASS")))
    def plantOrders(o: DataFrame): DataFrame =
      o.unionByName(o.limit(2)
        .withColumn("o_orderkey", lit(7777781L) + monotonically_increasing_id())
        .withColumn("o_custkey", lit(999990L))
        .withColumn("o_totalprice", lit(0.0)))
    withDir(Map("customer" -> plantCust _, "orders" -> plantOrders _)) { dir =>
      val got = rows("q_agg_gini", dir)
      val z = got.filter(_.getString(0) == "ZEROMASS")
      assert(z.size == 1 && z.head.isNullAt(2),
        s"zero-mass gini must be honest NULL: $z")
      assert(got.filterNot(_.getString(0) == "ZEROMASS") == rows("q_agg_gini", sf),
        "the degenerate segment must not disturb real segments")
    }
  }

  test("null l_quantity: size_class is honest NULL, never a fabricated 'small'") {
    // the projectExpr cascade's bare otherwise: a NULL quantity makes
    // every `>` false and the row read "small" — a class label from no
    // data, mirrored by the oracle's ELSE (the langid class). The row
    // stays visible with a NULL class.
    def plant(l: DataFrame): DataFrame =
      l.unionByName(
        l.where(col("l_shipdate") >= lit("2001-01-01").cast("timestamp")).limit(1)
          .withColumn("l_orderkey", lit(9999991L))
          .withColumn("l_quantity", lit(null).cast("double")))
    withDir(Map("lineitem" -> plant _)) { dir =>
      val got = SparkEntry.queries("q_project_expr")(spark, dir)
        .where(col("l_orderkey") === 9999991L).collect()
      assert(got.length == 1 &&
        got.head.isNullAt(got.head.fieldIndex("size_class")),
        s"a null-quantity row must carry a NULL size_class: ${got.toSeq}")
    }
  }

  test("zero-variance group: corr is NULL, never a NaN decimal-cast job kill; real groups unchanged") {
    // One degenerate group (constant quantity — a stuck upstream
    // field, a single-product shard) made q_agg_corr's variance term
    // 0 and the division killed the WHOLE query (measured under the
    // mutant: ANSI [DIVIDE_BY_ZERO] at the num/den divide — Spark 4
    // ANSI throws on double division too, so the kill fires even
    // before the decimal cast could see the NaN). SQL corr()
    // semantics: zero variance => undefined => NULL, with every real
    // group untouched. Prices are
    // forced distinct so the probe exercises the one-sided case
    // (varx = 0, vary > 0) — the AND in the guard, not just both-zero.
    def plantDegenerate(l: DataFrame): DataFrame =
      l.unionByName(l.limit(3)
        .withColumn("l_returnflag", lit("Z"))
        .withColumn("l_quantity", lit(5.0))
        .withColumn("l_extendedprice", lit(100.0) + col("l_linenumber") * 7.0))
    withDir(Map("lineitem" -> plantDegenerate _)) { dir =>
      val got = rows("q_agg_corr", dir)
      val z = got.filter(_.getString(0) == "Z")
      assert(z.size == 1 && z.head.isNullAt(2),
        s"zero-variance corr must be honest NULL: $z")
      assert(got.filterNot(_.getString(0) == "Z") == rows("q_agg_corr", sf),
        "the degenerate group must not disturb real groups")
    }
  }

  test("NaN event value: decimal aggregates null-skip it exactly, never a job kill or silent total shift") {
    // The one corrupt-value shape the r19 domain tripwire CANNOT see:
    // parquet footer min/max statistics SKIP NaN (measured: a
    // [1.5, NaN, 3.0] column reports [1.5, 3.0]), so the events.value
    // envelope never fires on it — unlike ±Inf, which lands in max and
    // trips the [-1e16, 1e16] bound. Measured Spark-4-ANSI semantics:
    // cast(NaN as decimal) is NULL (no NUMERIC_VALUE_OUT_OF_RANGE kill
    // — that class starts at ~1e16 finite), so every dec(value)
    // consumer must treat a NaN-value row EXACTLY like a NULL-value
    // row: same groups, same sums, nothing dropped beyond the one
    // value. The cross-engine story stays loud, not silent: DuckDB
    // errors on ANY decimal cast of NaN (even TRY_CAST), so a NaN
    // regen turns the gate red instead of hashing green on divergent
    // totals; ordering/comparison parity holds (both engines rank NaN
    // greatest and NaN = NaN).
    // orderBy before limit (the repo's own limit-determinism
    // discipline): this plant is compared ACROSS two independently
    // cloned dirs, so the base row must be the same one in both
    def plantValue(v: Column)(e: DataFrame): DataFrame =
      e.unionByName(e.orderBy("event_id").limit(1)
        .withColumn("event_id", lit(888899L))
        .withColumn("value", v))
    withDir(Map("events" -> plantValue(lit(Double.NaN)) _)) { nanDir =>
      withDir(Map("events" -> plantValue(lit(null).cast("double")) _)) { nullDir =>
        for (q <- Seq("q_agg_salted_skew", "q_stream_tumbling"))
          assert(rows(q, nanDir) == rows(q, nullDir),
            s"$q: a NaN value must null-skip exactly like a NULL value")
      }
    }
  }

  test("NULL n_chars with REAL text: quality degrades the length component to 0, never nulls or fabricates") {
    // The r19 fabrication fixes covered NULL TEXT (no content => no
    // prediction). The INVERSE metadata corruption — real text, NULL
    // n_chars — is a different contract, pinned here: quality is a
    // CONTENT score and the content exists, so the composite still
    // emits, with the length component (a metadata read) degraded to
    // its `otherwise(0.0)` — NULL >= 100 is not true in either engine,
    // so the oracle's CASE mirrors bit-exactly. The n_chars-derived
    // avg_tok_len stays honest NULL. Two plants fix both stop_ratio
    // branches: all-stopword text => 0.5, no-stopword text => 0.0.
    def plant(d: DataFrame): DataFrame = {
      val proto = d.where(col("doc_id") === 1)
      def planted(id: Long, text: String) = proto.select(
        lit(id).as("doc_id"), lit(text).as("text"), col("lang"), col("source"),
        lit(null).cast("long").as("n_chars"))
      d.unionByName(planted(888871L, "the of and"))
        .unionByName(planted(888872L, "quartz engine rows"))
    }
    withDir(Map("documents" -> plant _)) { dir =>
      val got = rows("q_text_quality", dir)
        .filter(r => r.getLong(0) >= 888871L && r.getLong(0) <= 888872L)
        .map(r => r.getLong(0) ->
          (r.isNullAt(r.fieldIndex("avg_tok_len")),
           if (r.isNullAt(r.fieldIndex("quality"))) null
           else r.getDouble(r.fieldIndex("quality")))).toMap
      assert(got == Map(888871L -> ((true, 0.5)), 888872L -> ((true, 0.0))),
        s"real-text/null-metadata docs must score content only: $got")
    }
  }

  test("zero PAIRED weight: wavg is NULL even when a null-price row carries positive discount") {
    // WeightedAvg.reduce accumulates a row's weight only when BOTH
    // price and weight are non-null (an unpaired weight weights
    // nothing). The degenerate shape that exposes the pairing: a
    // group whose valid-pair discounts are all 0 but which carries a
    // null-price/positive-discount row. Paired weight sum = 0 =>
    // honest NULL; a bare sum(discount) reads 0.05 and would divide
    // to a fabricated 0.0 average "weighted" entirely by a row that
    // has no price. The oracle mirrors the pairing with
    // sum(CASE WHEN price IS NOT NULL THEN discount END); real
    // groups must be bit-identical to the unplanted base.
    def plantUnpaired(l: DataFrame): DataFrame =
      l.unionByName(l.limit(3)
          .withColumn("l_returnflag", lit("W"))
          .withColumn("l_discount", lit(0.0)))
        .unionByName(l.limit(1)
          .withColumn("l_returnflag", lit("W"))
          .withColumn("l_discount", lit(0.05))
          .withColumn("l_extendedprice", lit(null).cast("double")))
    withDir(Map("lineitem" -> plantUnpaired _)) { dir =>
      val got = rows("q_udaf_weighted", dir)
      val w = got.filter(_.getString(0) == "W")
      assert(w.size == 1 && w.head.isNullAt(1),
        s"zero paired weight must be honest NULL: $w")
      assert(got.filterNot(_.getString(0) == "W") == rows("q_udaf_weighted", sf),
        "the degenerate group must not disturb real groups")
    }
  }

  test("corrupt docs in the edit-distance band: null text and mega-docs are not ranking candidates") {
    // Two classes the band join (lang, n_chars ±1) lets through:
    // (a) a null-TEXT doc with real n_chars metadata (the
    //     metadata/content mismatch class) — levenshtein(NULL,·) is
    //     NULL and the ASC ranking sorts NULLS FIRST, so one corrupt
    //     doc crowds the top-20 head with meaningless pairs;
    // (b) two equal-length MEGA-docs — the DP is O(na·nb) per pair,
    //     so a 20k×20k candidate runs ~4e8 cells in ONE task (200k
    //     docs: minutes), the silent job-stall class at scale; their
    //     near-identical texts would also win the head on real
    //     distance, displacing every legitimate short-doc pair.
    // and (c) two mega-docs whose n_chars METADATA understates the
    //     real text length (the inverse of class (a)'s mismatch) —
    //     they band on the small n_chars, pass a metadata-only cap,
    //     and their near-identical 20k texts would BOTH stall a task
    //     on the quadratic DP and top the ranking at edit_dist 1;
    //     only the exact length(text) cap catches them.
    // All are excluded by contract (text.isNotNull, n_chars <= 10k,
    // length(text) <= 10k): the ranking must be bit-identical to the
    // unplanted base.
    def plantCorrupt(d: DataFrame): DataFrame = {
      val proto = d.where(col("doc_id") === 1)
      def planted(id: Long, text: Column, nChars: Column) = proto.select(
        lit(id).as("doc_id"), text.as("text"), col("lang"), col("source"),
        nChars.as("n_chars"))
      d.unionByName(planted(997L, lit(null).cast("string"), col("n_chars")))
        .unionByName(planted(998L, expr("repeat('x', 20000)"), lit(20000L)))
        .unionByName(planted(999L,
          concat(expr("repeat('x', 19999)"), lit("y")), lit(20000L)))
        .unionByName(planted(995L, expr("repeat('x', 20000)"), col("n_chars")))
        .unionByName(planted(996L,
          concat(expr("repeat('x', 19999)"), lit("y")), col("n_chars")))
    }
    withDir(Map("documents" -> plantCorrupt _)) { dir =>
      assert(rows("q_dedup_edit_distance", dir) == rows("q_dedup_edit_distance", sf),
        "a corrupt doc entered the edit-distance ranking")
    }
  }

  test("duplicate keys (two rows, one doc_id/event_id): visible fan-out or by-design collapse, never silent loss") {
    // Key-uniqueness is a GENERATOR property, not a SQL one — the
    // operators promise standard row semantics, and this probe pins
    // what that means when the property breaks: the streaming dedup
    // key COLLAPSES duplicates (its whole job), content-keyed dedup is
    // indifferent, and the id-keyed dedup families FAN OUT visibly
    // (both variants surface; ambiguous input yields ambiguous rows,
    // never a silently-chosen winner and never a crash).
    val dupDoc = 3L
    withDir(Map(
      "documents" -> ((d: DataFrame) => d.unionByName(
        d.where(col("doc_id") === dupDoc)
          .withColumn("text", concat(col("text"), lit(" extra variant words"))))),
      "events" -> ((e: DataFrame) => e.unionByName(e.limit(5))))) { dir =>
      // q_stream_dedup: re-delivered event_ids collapse to ONE row each
      val dedup = SparkEntry.queries("q_stream_dedup")(spark, dir)
      val perId = dedup.groupBy(col("event_id")).count()
        .where(col("count") > 1).count()
      assert(perId == 0, "stream dedup must emit exactly one row per event_id")
      // the planted duplicates were SEEN (n_seen counts deliveries):
      // 5 ids arrive 4x (2 copies × the query's own unionAll), rest 2x
      assert(dedup.where(col("n_seen") === 4).count() == 5)
      // q_dedup_exact groups by CONTENT — duplicate ids are irrelevant,
      // and the two text variants of doc 3 land in different groups
      SparkEntry.queries("q_dedup_exact")(spark, dir).collect()
      // q_dedup_minhash: both variants of doc 3 surface by fan-out —
      // any (3, x) pair may appear once per variant with its own score,
      // deterministically; no crash, no silent single-winner pick
      val mh = SparkEntry.queries("q_dedup_minhash")(spark, dir).collect()
      val mh2 = SparkEntry.queries("q_dedup_minhash")(spark, dir).collect()
      assert(mh.toSeq == mh2.toSeq, "duplicate-key fan-out must stay deterministic")
    }
  }

  test("NULL routing metadata (lang / source / n_chars): graph family isolates, never perturbs or crashes") {
    // The graph family's blocking keys are document METADATA, and the
    // corrupt-row sweeps so far planted corrupt CONTENT (text, props,
    // embeddings). A doc with NULL lang / n_chars cannot be in any
    // (lang, n_chars) clique: the clustering groupBy forms a phantom
    // node for it, but every edge probe (NULL±1, NULL===lang) and the
    // final map-back join are NULL-rejecting, so the node stays
    // ISOLATED and the doc is honestly absent — and the phantom node
    // must not perturb one real cluster. In PageRank a NULL lang or
    // source drops the doc from the edge join entirely: it becomes a
    // DANGLING node that keeps exactly its seed-and-damp base rank
    // (0.15/N) through every iteration — visible, deterministic, and
    // identical to the oracle's null semantics.
    val nullLangA = 888871L; val nullLangB = 888872L
    val nullChars = 888873L; val nullSource = 888874L
    withDir(Map("documents" -> ((d: DataFrame) => {
      val proto = d.limit(1)
      def planted(id: Long, lang: Column, source: Column, nChars: Column) =
        proto.select(lit(id).as("doc_id"), col("text"), lang.as("lang"),
          source.as("source"), nChars.as("n_chars"))
      val nulls = lit(null)
      d.unionByName(planted(nullLangA, nulls.cast("string"), col("source"), lit(50L)))
        .unionByName(planted(nullLangB, nulls.cast("string"), col("source"), lit(50L)))
        .unionByName(planted(nullChars, col("lang"), col("source"), nulls.cast("long")))
        .unionByName(planted(nullSource, col("lang"), nulls.cast("string"), nulls.cast("long")))
    }))) { dir =>
      // clustering: corrupt docs absent, clean clusters bit-identical —
      // the TWO same-n_chars null-lang docs are the sharp leg: a
      // null-matching join would cluster the unrelated pair together
      // (the md5(NULL) phantom-group class in metadata clothing)
      val clean = rows("q_dedup_clusters", sf)
      val corrupt = rows("q_dedup_clusters", dir)
      assert(corrupt == clean,
        "null-metadata docs must be absent and must not perturb real clusters")
      // pagerank: every doc gets a rank row; the three dangling docs
      // (null lang ×2, null source) hold EXACTLY the base rank 0.15/N —
      // computed through the same decimal ladder as the implementation
      val pr = SparkEntry.queries("q_graph_pagerank")(spark, dir)
      val n = spark.read.parquet(s"$dir/documents.parquet").count()
      import org.apache.spark.sql.types.DecimalType
      val expectedBase = spark.range(1).select(
        lit(0.15 / n).cast(DecimalType(28, 18)).cast(DecimalType(12, 6))
          .cast("double")).head.getDouble(0)
      val dangling = pr.where(col("doc_id").isin(nullLangA, nullLangB, nullSource))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(dangling.keySet == Set(nullLangA, nullLangB, nullSource),
        s"dangling docs must still be ranked, got ${dangling.keySet}")
      assert(dangling.values.forall(_ == expectedBase),
        s"dangling docs must hold the base rank $expectedBase, got $dangling")
      // the null-CHARS doc has real (lang, source): it rides its bucket
      // like any clean doc and must rank strictly above the base
      val nc = pr.where(col("doc_id") === nullChars).head.getDouble(1)
      assert(nc >= expectedBase,
        s"null-n_chars doc routes normally in pagerank, got $nc vs base $expectedBase")
    }
  }

  test("NULL label embeddings: not a block, not a voter — never a fabricated NULL prediction") {
    // The similarity family's blocking/voting key is label METADATA —
    // the corrupt-embedding sweeps planted corrupt VECTORS; this plants
    // corrupt LABELS on perfectly valid vectors. Five unlabeled clones
    // of probe 0's embedding are the sharp shape: each scores cosine
    // 1.0 against probe 0, so WITHOUT the voter guard they sweep its
    // entire rn<=5 window and the vote fabricates pred_label = NULL (a
    // prediction of nothing — asc(label) sorts NULL first, so the NULL
    // group also wins any count tie). In the pair/edge/dedup families
    // the same five identical vectors would flood the output with
    // cos-1.0 pairs if NULL labels ever matched as a block — the
    // null-rejecting equi-join must keep them isolated.
    val ids = (888801L to 888805L).toSeq
    withDir(Map("embeddings" -> ((e: DataFrame) => {
      val proto = e.where(col("vec_id") === 0L)
      ids.map(id => proto.select(lit(id).as("vec_id"), col("embedding"),
          lit(null).cast("int").as("label")))
        .foldLeft(e)(_ unionByName _)
    }))) { dir =>
      val clean = rows("q_knn_label", sf)
      val corrupt = rows("q_knn_label", dir)
      assert(corrupt == clean,
        "unlabeled candidates must not vote or perturb any prediction")
      assert(corrupt.forall(r => !r.isNullAt(1)),
        "a NULL pred_label must never be fabricated")
      for (q <- Seq("q_sim_pairs", "q_dedup_embed", "q_knn_graph")) {
        val out = SparkEntry.queries(q)(spark, dir)
        val idCols = out.columns.filter(c =>
          c == "v1" || c == "v2" || c == "src" || c == "dst" || c == "dropped_id")
        val touched = out.where(idCols.map(c => col(c).isin(ids: _*)).reduce(_ || _)).count()
        assert(touched == 0, s"$q surfaced a null-label vector (no label = no block)")
        assert(rows(q, dir) == rows(q, sf),
          s"$q results must be bit-identical to the clean fixture")
      }
    }
  }

  test("reordered columns: a non-event — drift silent, query results identical") {
    withDir(Map("lineitem" ->
        ((li: DataFrame) => li.select(li.columns.reverse.map(col).toIndexedSeq: _*)))) { dir =>
      assert(graft.sources.Fixtures.drift(spark, dir).isEmpty,
        "column order is not part of the fixture contract — by-name reads handle it")
      withDir(Map.empty) { plainDir =>
        assert(rows("q_join_broadcast", dir) == rows("q_join_broadcast", plainDir),
          "parquet column reorder changed a by-name query's result")
      }
    }
  }
}
