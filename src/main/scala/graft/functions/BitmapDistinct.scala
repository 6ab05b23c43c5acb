package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Exact distinct-count as a mergeable bitmap typed Aggregator — the
  * third member of the sketch family next to [[HllSketch]] (approx,
  * O(1)) and [[CountMin]] (frequency, O(1)): EXACT cardinality in
  * O(max-id/8) bits. The buffer is a growable Long-word bitset keyed
  * by value, reduce sets one bit, and merge is an element-wise OR —
  * associative, commutative, and IDEMPOTENT, so any partition layout,
  * merge tree, or duplicate/retried delivery produces the same bits
  * (FrontierSpec proves both properties). This is the
  * Druid/ClickHouse "exact distinct over dense integer keys" shape:
  * at 100 TB a 10M-user id space is a 1.25 MB bitmap per group per
  * partial — cheap where a HashSet would be GBs — and the OR-merge
  * makes re-delivered micro-batches harmless, which approximate
  * sketches also give you but exact HashSet aggregation does not.
  *
  * Ids must lie in [0, MaxId] (fixture keys do): the word index must
  * fit an Int and the buffer is O(max-id/8) BYTES, so a sparse huge id
  * (say 2^40) would both wrap the index and try to allocate gigabytes.
  * Both failure modes are cut off by an explicit require — for wider
  * or sparse domains, pre-densify the ids or use [[HllSketch]].
  */
/* Boxed input with SQL null semantics (r18): the primitive encoder
 * coerced NULL ids to 0L, counting a PHANTOM distinct key 0 — see
 * [[CountMin]]'s note; same fix. */
class BitmapDistinct extends Aggregator[java.lang.Long, Array[Long], Long] {
  import BitmapDistinct.MaxId

  override def zero: Array[Long] = new Array[Long](16)

  private def ensure(bits: Array[Long], word: Int): Array[Long] =
    if (word < bits.length) bits
    else {
      var n = bits.length
      while (n <= word) n *= 2
      java.util.Arrays.copyOf(bits, n)
    }

  override def reduce(bits: Array[Long], boxed: java.lang.Long): Array[Long] = {
    if (boxed == null) return bits // SQL null semantics: null is not an id
    val id = boxed.longValue
    require(id >= 0L && id <= MaxId,
      s"BitmapDistinct id $id outside [0, $MaxId] — the bitmap is O(max-id/8) bytes " +
        "and indexes by id/64; densify ids first or use an approximate sketch (HllSketch)")
    val word = (id >>> 6).toInt
    val b = ensure(bits, word)
    b(word) |= 1L << (id & 63L)
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    val (big, small) = if (a.length >= b.length) (a, b) else (b, a)
    var i = 0
    while (i < small.length) { big(i) |= small(i); i += 1 }
    big
  }

  override def finish(bits: Array[Long]): Long = {
    var n = 0L
    var i = 0
    while (i < bits.length) { n += java.lang.Long.bitCount(bits(i)); i += 1 }
    n
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

object BitmapDistinct {
  /** Practical id ceiling: 2^32 keeps the word index far inside Int
    * range and caps a single bitmap at 512 MB — already a deliberate
    * choice, never an accidental allocation. Beyond this, dense
    * bitmaps are the wrong tool (see class doc).
    */
  val MaxId: Long = (1L << 32) - 1L
}
