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

  /** Deterministic "average": exact decimal sum, one IEEE double
    * division, then a fixed-scale decimal presentation. Mirrors the
    * oracle SQL shape CAST(CAST(sum(dec) AS DOUBLE)/count AS DECIMAL(18,4)).
    */
  def avgDec(c: Column, cnt: Column): Column =
    (sum(dec(c)).cast(DoubleType) / cnt).cast(DecimalType(18, 4))
}
