package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Exact bottom-k per group as a typed `Aggregator` — [[TopKAgg]]'s
  * integer-keyed sibling, built for the salted-hash samplers
  * ([[graft.llm.LlmOps.sampleStratified]], [[graft.llm.LlmOps.domainMix]]):
  * input rows are (priority, id) long pairs, the result is the k entries
  * with the smallest (priority, id) — identical ordering to
  * `row_number() OVER (PARTITION BY … ORDER BY pri, id) <= k`.
  *
  * Why it exists: those samplers' rank window shuffles EVERY row of a
  * stratum to one partition — with few huge domains (3 domains × 100 TB)
  * that is the classic low-cardinality window skew. This aggregator keeps
  * a bounded buffer per group (amortized trim at 4k entries), combines
  * map-side, and ships at most 4k−1 entries per group and partition
  * through the shuffle (`reduce` trims only when the buffer hits 4k —
  * the amortization trade; `merge`/`finish` trim to exactly k), so the
  * biggest domain costs the same as the smallest.
  * Priorities stay `Long` end-to-end (the 56-bit hash priorities exceed a
  * double's 53-bit mantissa — [[TopKAgg]]'s double values would collide).
  */
case class MinKAgg(k: Int)
    extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {
  require(k > 0, "k must be positive")

  private def trim(b: Seq[(Long, Long)]): Seq[(Long, Long)] =
    b.sorted.take(k)

  // Vector: effectively-constant per-row append — a List `:+` would copy
  // the whole (≤4k-1 entry) buffer on every input row
  override def zero: Seq[(Long, Long)] = Vector.empty

  override def reduce(b: Seq[(Long, Long)], a: (Long, Long)): Seq[(Long, Long)] = {
    val nb = b :+ a
    if (nb.size >= 4 * k) trim(nb) else nb // amortized: sort every ~3k appends
  }

  override def merge(x: Seq[(Long, Long)], y: Seq[(Long, Long)]): Seq[(Long, Long)] =
    trim(x ++ y)

  override def finish(b: Seq[(Long, Long)]): Seq[(Long, Long)] = trim(b)

  override def bufferEncoder: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long)]]()
  override def outputEncoder: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long)]]()
}

object MinKAgg {
  /** Untyped handle for `groupBy().agg(...)`: `minK(priCol, idCol)` yields
    * `array<struct<_1: pri, _2: id>>` in (pri, id) ascending order.
    */
  def udf(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(MinKAgg(k))
}
