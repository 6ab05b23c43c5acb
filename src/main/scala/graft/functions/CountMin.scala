package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Count-min sketch as a typed `Aggregator[Long, Array[Long], Array[Long]]`
  * (Cormode & Muthukrishnan 2005, public) — the frequency-sketch
  * counterpart to [[HllSketch]]: the buffer is a d×w grid of exact
  * counters, reduce increments one cell per hash row, and merge is an
  * element-wise SUM — associative and commutative, so any partition
  * layout or merge tree produces the identical grid (FrontierSpec
  * proves layout independence exactly). d·w·8 = 6 KB per partial at
  * every stage — the heavy-hitter shape a 100 TB frequency scan needs
  * (the exact groupBy it bounds is |keys|-sized; the sketch is O(1)).
  *
  * Unlike the HLL, the whole sketch is DuckDB-expressible: the row
  * hashes are small-constant LCGs mod a prime (no wrapping 64-bit
  * multiply — inputs are key ids, so `key*48271+11` stays far inside
  * BIGINT), and every cell is an exact integer sum. The oracle
  * replays the exact same grid in SQL and the estimates hash-match
  * bit-for-bit — a fully oracled sketch, not just a witness-bounded
  * one.
  */
/* Input is BOXED java.lang.Long with SQL null semantics (r18): the
 * primitive-Long encoder silently coerces a NULL input column to 0L,
 * so every null row incremented the PHANTOM key 0's cells — a silent
 * divergence from SQL aggregates (and the oracle), which ignore
 * nulls. Boxed input + a reduce-level skip is the [[WeightedAvg]]
 * discipline applied to the sketch family. */
class CountMin extends Aggregator[java.lang.Long, Array[Long], Array[Long]] {
  import CountMin._

  override def zero: Array[Long] = new Array[Long](D * W)

  override def reduce(grid: Array[Long], boxed: java.lang.Long): Array[Long] = {
    if (boxed == null) return grid // SQL null semantics: nulls are not keys
    val key = boxed.longValue
    var j = 0
    while (j < D) {
      grid(j * W + bucket(j, key)) += 1L
      j += 1
    }
    grid
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < D * W) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(grid: Array[Long]): Array[Long] = grid

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object CountMin {
  /** Grid shape: 3 hash rows × 256 buckets. */
  val D = 3
  val W = 256
  val P = 1000003L
  /** Per-row LCG constants (Park–Miller family multipliers). */
  val A: Array[Long] = Array(48271L, 69621L, 40692L)
  val B: Array[Long] = Array(11L, 23L, 37L)

  /** Largest key whose `key·A_j` multiply cannot wrap a JVM Long for
    * any row (~1.3e14 with A.max = 69621). Beyond it the JVM wraps
    * silently while DuckDB's BIGINT multiply raises — the bit-for-bit
    * oracle match would diverge — so the guard fails loudly on BOTH
    * engines' behalf; pre-mod wider keys (key % P) before sketching.
    */
  val MaxKey: Long = Long.MaxValue / A.max

  /** Row-j bucket of a key: ((key·A_j + B_j) mod P) mod W — positive
    * keys only (fixture ids), so `%` agrees between JVM and DuckDB.
    */
  def bucket(j: Int, key: Long): Int = {
    require(key >= 0L && key <= MaxKey,
      s"count-min key $key outside the overflow-safe range [0, $MaxKey] — " +
        "pre-mod keys (key % P) before sketching")
    (((key * A(j) + B(j)) % P) % W).toInt
  }
}
