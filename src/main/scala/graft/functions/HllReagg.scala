package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Two-level HLL re-aggregation — the materialized-view/cube story:
  * [[HllRegisters]] emits a group's raw 1 KB register array instead
  * of the estimate, and [[HllUnion]] merges stored register arrays
  * (element-wise max) into a coarser group's estimate WITHOUT
  * re-reading raw data. Because the merge is the SAME operation HLL
  * uses internally (associative, commutative, idempotent), estimating
  * a union of per-shard sketches is EXACTLY the register state of the
  * one-shot sketch — FrontierSpec asserts bit-equality, not
  * approximate closeness. This is how a 100 TB pipeline serves
  * distinct counts at any rollup level: sketch once per finest cell
  * at ingest, OR-merge upward forever.
  *
  * Both share [[HllSketch]]'s hashing/registers via composition, so
  * the sketch family has exactly one definition of the estimator.
  */
class HllRegisters extends Aggregator[java.lang.Long, Array[Byte], Array[Byte]] {
  private val core = new HllSketch
  override def zero: Array[Byte] = core.zero
  // boxed input: inherits [[HllSketch]]'s SQL null semantics (r18)
  override def reduce(b: Array[Byte], id: java.lang.Long): Array[Byte] = core.reduce(b, id)
  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = core.merge(a, b)
  override def finish(regs: Array[Byte]): Array[Byte] = regs
  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

class HllUnion extends Aggregator[Array[Byte], Array[Byte], Long] {
  private val core = new HllSketch
  override def zero: Array[Byte] = core.zero
  /** Stored sketches arrive from a TABLE, not from this job's own
    * buffers, so two corruption classes are real (r19): a NULL cell
    * (outer join against a shard dim, missing partition, unbackfilled
    * day) is SQL-skipped like every aggregate input — pre-fix it
    * NPE-killed the whole re-aggregation (reference-typed Aggregator
    * inputs are NOT null-skipped); a WRONG-LENGTH blob is corrupt
    * state, not missing state — silently skipping would hide data
    * loss and unguarded merging dies as an opaque
    * ArrayIndexOutOfBounds, so it fails loudly, NAMED.
    */
  override def reduce(b: Array[Byte], regs: Array[Byte]): Array[Byte] = {
    if (regs == null) return b // SQL null semantics: a missing sketch adds nothing
    require(regs.length == b.length,
      s"corrupt HLL register blob: ${regs.length} bytes, expected ${b.length} — refusing to merge")
    core.merge(b, regs)
  }
  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = core.merge(a, b)
  override def finish(regs: Array[Byte]): Long = core.finish(regs)
  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
