package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Two-level re-aggregation for the exact bitmap distinct — same
  * composition pattern as [[HllRegisters]]/[[HllUnion]], but the
  * merged state is EXACT: [[BitmapRegisters]] emits a group's raw
  * bitset words, [[BitmapUnion]] ORs stored bitsets into a coarser
  * group's exact distinct count. Because OR is idempotent, the
  * two-level path tolerates at-least-once delivery (a replayed
  * partial changes nothing) — StreamingSpec proves a micro-batch
  * pipeline that merges every batch TWICE still converges to the
  * exact batch answer, with no dedup bookkeeping.
  */
class BitmapRegisters extends Aggregator[java.lang.Long, Array[Long], Array[Long]] {
  private val core = new BitmapDistinct
  override def zero: Array[Long] = core.zero
  // boxed input: inherits [[BitmapDistinct]]'s SQL null semantics (r18)
  override def reduce(b: Array[Long], id: java.lang.Long): Array[Long] = core.reduce(b, id)
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = core.merge(a, b)
  override def finish(bits: Array[Long]): Array[Long] = bits
  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

class BitmapUnion extends Aggregator[Array[Long], Array[Long], Long] {
  private val core = new BitmapDistinct
  override def zero: Array[Long] = core.zero
  /** Stored bitmaps come from a TABLE (r19, see [[HllUnion.reduce]]):
    * a NULL cell is SQL-skipped (pre-fix it NPE-killed the union);
    * unlike the fixed-width HLL registers, a SHORTER array is a VALID
    * bitmap state (the bitset grows on demand — any prefix is the
    * same set minus high ids), so no length check belongs here.
    */
  override def reduce(b: Array[Long], bits: Array[Long]): Array[Long] = {
    if (bits == null) return b // SQL null semantics: a missing bitmap adds nothing
    core.merge(b, bits)
  }
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = core.merge(a, b)
  override def finish(bits: Array[Long]): Long = core.finish(bits)
  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
