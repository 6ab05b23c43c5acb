package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable bounded-memory quantile sketch as a typed
  * `Aggregator[IN, BUF, OUT]` — the distributed-sketch discipline
  * (bounded buffer per partial, associative merge) with a twist that
  * keeps it ORACLE-CHECKABLE: the "sample" is the K rows with the
  * smallest portable hash of their unique id (a bottom-k sample, the
  * mergeable-uniform-sample construction from the distinct-sketch
  * literature). Bottom-k of a set is a pure function of the SET —
  * independent of partitioning, merge order, or executor count — so
  * unlike a randomized t-digest the estimate is bit-reproducible and
  * the DuckDB oracle can recompute it with a global ORDER BY/LIMIT.
  * Engine and oracle use different algorithms (streaming bounded
  * buffer vs global sort) and must meet at the same answer.
  *
  * Estimate: the empirical q-quantile of the K-row sample — the value
  * at sorted index floor((n−1)·q). Memory is O(K) per group at every
  * stage; a 100 TB scan carries K rows per partial, not the column.
  */
/* Input is a BOXED pair with SQL null semantics (r18): the primitive
 * tuple encoder silently coerces a NULL id/value field to (0, 0.0),
 * planting a PHANTOM sample row — the [[CountMin]] phantom-key class.
 * A row missing either field contributes nothing, like every SQL
 * aggregate. */
class QuantileSketch(k: Int, q: Double)
    extends Aggregator[(java.lang.Long, java.lang.Double), Seq[(Long, Long, Double)], Option[Double]] {

  /** Portable hash expressible in DuckDB BIGINT arithmetic WITHOUT
    * overflow at any fixture scale: the id is reduced mod a prime
    * first, so the multiply stays ≤ 1000003·2654435761 ≈ 2.7e15 —
    * DuckDB raises on 64-bit overflow (it doesn't wrap like the JVM),
    * so `id * 2654435761` directly would error once ids pass ~3.5e9.
    * Collisions from the mod are broken by the (hash, id) ordering.
    */
  private def hash(id: Long): Long = ((id % 1000003L) * 2654435761L) & 0xffffffffL

  override def zero: Seq[(Long, Long, Double)] = Nil

  /** Insert one (id, value): keep the K smallest (hash, id) rows. The
    * buffer stays sorted by (hash, id), so trimming is a dropRight.
    */
  override def reduce(b: Seq[(Long, Long, Double)], in: (java.lang.Long, java.lang.Double)): Seq[(Long, Long, Double)] = {
    if (in._1 == null || in._2 == null) return b // SQL null semantics
    val (id, v) = (in._1.longValue, in._2.doubleValue)
    val item = (hash(id), id, v)
    if (b.length >= k && implicitly[Ordering[(Long, Long, Double)]].compare(item, b.last) >= 0) b
    else (b :+ item).sorted.take(k)
  }

  override def merge(a: Seq[(Long, Long, Double)], b: Seq[(Long, Long, Double)]): Seq[(Long, Long, Double)] =
    (a ++ b).sorted.take(k)

  override def finish(b: Seq[(Long, Long, Double)]): Option[Double] =
    if (b.isEmpty) None
    else {
      val values = b.map(_._3).sorted
      Some(values(((values.length - 1) * q).toInt))
    }

  override def bufferEncoder: Encoder[Seq[(Long, Long, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long, Double)]]()

  override def outputEncoder: Encoder[Option[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Option[Double]]()
}
