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
  * Ids must be non-negative (fixture keys are); the buffer grows by
  * doubling to cover the max id seen, so memory tracks the actual key
  * range, not a configured ceiling.
  */
class BitmapDistinct extends Aggregator[Long, Array[Long], Long] {

  override def zero: Array[Long] = new Array[Long](16)

  private def ensure(bits: Array[Long], word: Int): Array[Long] =
    if (word < bits.length) bits
    else {
      var n = bits.length
      while (n <= word) n *= 2
      java.util.Arrays.copyOf(bits, n)
    }

  override def reduce(bits: Array[Long], id: Long): Array[Long] = {
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
