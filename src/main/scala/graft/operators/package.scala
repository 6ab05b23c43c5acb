package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Shared determinism helpers (SURVEY.md §7.4).
  *
  * Raw doubles must never be aggregated: parallel sum order perturbs
  * low-order bits and breaks the DuckDB hash-match, and is
  * nondeterministic run-to-run at any scale. Casting inputs to
  * DECIMAL(18,2) makes aggregation exact and associative — safe on a
  * 1000-executor cluster, not just local[4].
  */
package object operators {
  /** Cast a (2-decimal-generated) double column to exact DECIMAL(18,2). */
  def dec(c: Column): Column = c.cast(DecimalType(18, 2))
  def dec(name: String): Column = dec(col(name))

  /** Final-projection presentation cast: exact decimal → float64.
    *
    * The driver's oracle materializes DuckDB DECIMAL results as
    * float64 while Spark parquet keeps Decimal objects, so a decimal
    * output column hash-mismatches whenever a value has a trailing
    * zero. Emitting DOUBLE on both sides is representation-stable:
    * decimal→double is one correctly-rounded conversion on each
    * engine, so equal decimals become bit-equal doubles. Internal
    * aggregation stays DECIMAL (exact, associative); only the final
    * projection is cast. Oracle'd queries must never emit DecimalType
    * (or array/map) output columns — OracleShapeSpec enforces this.
    */
  def dbl(c: Column): Column = c.cast(DoubleType)

  /** Deterministic "average" presented as float64: exact decimal sum,
    * one IEEE double division (both engines perform the identical
    * correctly-rounded ops). Mirrors the oracle SQL shape
    * CAST(sum(CAST(x AS DECIMAL(18,2))) AS DOUBLE) / count(*).
    */
  def avgDec(c: Column, cnt: Column): Column =
    sum(dec(c)).cast(DoubleType) / cnt

  /** Largest |component| the ×1e6+2e6 integer-quantizer family
    * (Clustering.pointsOf, SimilarityOps.simAnnPq) admits. The binding
    * constraint is NOT the BIGINT cast (that alone would allow
    * ~9.2e12) but the downstream EXACT-INTEGER distance arithmetic:
    * both kmeans and PQ compute sum over ≤64 dims of (q−c)², which
    * must fit a Long under ANSI or one admitted row still kills the
    * job at the multiply — 64·(2B·10⁶)² ≤ 2⁶³−1 requires B ≲ 190.
    * 100.0 sits inside that envelope with margin and is still two
    * orders of magnitude above any legitimate unit-ish embedding
    * component (fixture max |x| ≈ 0.58), so the guard stays
    * constant-true on clean data (advice r19: Double.MaxValue was NOT
    * a safe bound — a corrupt-but-finite 1e20 component passed it and
    * still killed the job at the cast, and a 1e10 one would have
    * passed the cast and killed the squared-distance multiply).
    */
  private[graft] val MaxQuantizableComponent: Double = 100.0

  /** TRUE only for embedding arrays that the integer quantizers can
    * handle: every component non-NULL and |x| ≤
    * [[MaxQuantizableComponent]] (r18 + advice r19, the
    * corrupt-embedding class). The quantization paths CAST a
    * component-derived double to an integer type, and under Spark 4's
    * default ANSI mode ONE bad component kills the whole job at that
    * cast — while a NULL or empty array dies earlier with an equally
    * opaque executor error. `array_max(abs(...))` returns NaN when any
    * component is NaN (Spark orders NaN above every value) and +Inf
    * when any overflows, and both compare FALSE against the bound —
    * which is the QUANTIZER's domain, not Double.MaxValue, so huge
    * finite garbage (1e20) is rejected too, not just NaN/Inf. A NULL
    * or empty array yields NULL, which also filters out. NULL
    * *elements* need their own clause: array_max SKIPS null entries,
    * so [1.0, null] would otherwise pass and flow a null q downstream,
    * silently computing partial-dimension distances instead of being
    * dropped — `exists(_.isNull)` rejects them (and is false on the
    * empty array, whose fate the array_max clause already decides).
    * On clean data the predicate is constant-true, so oracled results
    * are unchanged. The cosine family needs no filter — its corrupt
    * rows flow to NULL scores via cosOrNull instead (kept visible at
    * the ranking tail rather than dropped, because there they cannot
    * kill the cast).
    */
  def finiteEmbedding(c: Column): Column =
    array_max(transform(c, x => abs(x.cast(DoubleType)))) <= lit(MaxQuantizableComponent) &&
      !exists(c, x => x.isNull)
}
