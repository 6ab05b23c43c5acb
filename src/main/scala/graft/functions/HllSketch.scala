package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom HyperLogLog as a typed `Aggregator[Long, Array[Byte], Long]`
  * (Flajolet et al. 2007, public) — the register-array sketch family:
  * the buffer is m=1024 one-byte registers, reduce is two CPU ops per
  * row (hash → bucket/rank → max), and merge is an element-wise max —
  * associative, commutative, idempotent, so ANY partition layout,
  * merge tree, or duplicate delivery produces the SAME registers
  * (RelationalSpec proves layout independence exactly). 1 KB per
  * group per partial at every stage — the cardinality shape a 100 TB
  * distinct-count needs.
  *
  * The hash is a fixed splitmix64 (public-domain finalizer), so the
  * sketch is a pure function of the value SET — deterministic across
  * runs and engines. No DuckDB oracle only because 64-bit wrapping
  * multiplication isn't expressible in DuckDB BIGINT (it raises on
  * overflow); the spec instead checks the estimate against the exact
  * distinct count (±5% at m=1024, well inside HLL's 1.04/√m ≈ 3.2%
  * plus small-range correction).
  */
/* Boxed input with SQL null semantics (r18): the primitive encoder
 * coerced NULL ids to 0L, hashing a PHANTOM member into the sketch —
 * see [[CountMin]]'s note; same fix. */
class HllSketch extends Aggregator[java.lang.Long, Array[Byte], Long] {

  private val b = 10
  private val m = 1 << b // 1024 registers

  // full splitmix64 = golden-ratio stream increment + the shared
  // finalizer ([[Mix.mix64]] — bit-identical to the previous inline copy)
  private def splitmix64(x0: Long): Long = Mix.mix64(x0 + 0x9E3779B97F4A7C15L)

  override def zero: Array[Byte] = new Array[Byte](m)

  override def reduce(regs: Array[Byte], boxed: java.lang.Long): Array[Byte] = {
    if (boxed == null) return regs // SQL null semantics: null is not a member
    val h = splitmix64(boxed.longValue)
    val idx = (h >>> (64 - b)).toInt // top b bits → register
    // rank = leading zeros of the remaining 54 bits + 1, capped by width
    val rest = h << b
    val rank = (java.lang.Long.numberOfLeadingZeros(rest | (1L << (b - 1))) + 1).toByte
    if (rank > regs(idx)) regs(idx) = rank
    regs
  }

  override def merge(a: Array[Byte], c: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (c(i) > a(i)) a(i) = c(i); i += 1 }
    a
  }

  override def finish(regs: Array[Byte]): Long = {
    val alpha = 0.7213 / (1.0 + 1.079 / m) // standard constant for m >= 128
    var invSum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      invSum += math.pow(2.0, -regs(i).toDouble)
      if (regs(i) == 0) zeros += 1
      i += 1
    }
    val raw = alpha * m * m / invSum
    // small-range correction: linear counting while registers are sparse
    val est =
      if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
      else raw
    math.round(est)
  }

  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
