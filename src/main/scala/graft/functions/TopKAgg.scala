package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Exact top-k per group as a typed `Aggregator` — the custom-UDAF
  * extension point (SURVEY §2.10; §7.3's "demonstrate the extension
  * points"). The built-in way to get top-k per group is a window
  * `row_number <= k`, which sort-shuffles EVERY row of the group; this
  * aggregator keeps a bounded buffer per group (amortized trim at 4k
  * entries — so at most 4k-1 entries per group and partition cross the
  * shuffle, still O(k) vs every row), combines map-side, and returns
  * exactly k. The buffer is a Vector: per-row append is effectively
  * constant; a List `:+` would copy the whole buffer every row.
  * Deterministic tie-break: (value desc, id asc), identical to
  * `row_number() OVER (ORDER BY v DESC, id)`.
  *
  * Input rows are (id, value); the result is the ordered top-k as
  * (value, id) pairs for the caller to explode.
  */
case class TopKAgg(k: Int)
    extends Aggregator[(Long, Double), Seq[(Double, Long)], Seq[(Double, Long)]] {
  require(k > 0, "k must be positive")

  private def trim(b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    b.sortBy { case (v, id) => (-v, id) }.take(k)

  override def zero: Seq[(Double, Long)] = Vector.empty

  override def reduce(b: Seq[(Double, Long)], a: (Long, Double)): Seq[(Double, Long)] = {
    val nb = b :+ ((a._2, a._1))
    if (nb.size >= 4 * k) trim(nb) else nb // amortized: sort every ~3k appends
  }

  override def merge(x: Seq[(Double, Long)], y: Seq[(Double, Long)]): Seq[(Double, Long)] =
    trim(x ++ y)

  override def finish(b: Seq[(Double, Long)]): Seq[(Double, Long)] = trim(b)

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}
