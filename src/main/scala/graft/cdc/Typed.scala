package graft.cdc

import org.apache.spark.sql.{Dataset, SparkSession}

/** Typed (`Dataset[T]` + case-class `Encoder`) twin of the CDC route — the
  * API surface for callers who want compile-time schemas. The transforms
  * mirror [[ops.Route]] exactly (reference hot loop,
  * `app/services/sf_pubsub.py:602-789`) but as total Scala functions over
  * case classes; `Normalize`-equivalent logic lives in companion methods so
  * the two paths cannot drift (RouteSpec-style parity is asserted in
  * TypedSpec).
  *
  * Tradeoff, stated plainly: typed `map`/`flatMap`/`filter` lambdas are
  * opaque to Catalyst (no pushdown through them, encoder round-trips at
  * the boundary), so the untyped column pipeline remains the scale path;
  * this facade is for type-safety-first call sites.
  */
object Typed {

  case class ChangeEvent(
      replay_id: Long,
      entity: String,
      change_type: String,
      record_ids: Seq[String],
      commit_raw: Option[Long],
      flash_raw: Option[String],
      subscription_topic: String,
      instance_url: String)

  case class Delivery(
      id: String,
      subscription_topic: String,
      instance_url: String,
      entity: String,
      change_type: String,
      commit_ms: Option[Long])

  /** P3 — same heuristic as the codegen'd expression. */
  def commitMs(raw: Option[Long]): Option[Long] =
    raw.map(graft.functions.NormalizeEpochMillis.normalize)

  /** P4 — same truth table AND the same trim semantics as
    * Normalize.boolNorm: Spark's `trim` strips SPACES only, so the typed
    * mirror must too — Java String.trim also eats \t/\n/\r and would
    * accept "\ttrue" here while the column path rejects it, a parity
    * drift between two routes documented as mirrored exactly. ROOT-locale
    * lowercase matches Spark's locale-independent `lower`.
    */
  def boolNorm(raw: Option[String]): Option[Boolean] =
    raw.map { s =>
      var i = 0; var j = s.length
      while (i < j && s.charAt(i) == ' ') i += 1
      while (j > i && s.charAt(j - 1) == ' ') j -= 1
      s.substring(i, j).toLowerCase(java.util.Locale.ROOT)
    }.flatMap {
      case "true" | "1" | "yes" | "y"      => Some(true)
      case "false" | "0" | "no" | "n" | "" => Some(false)
      case _                               => None
    }

  /** The full route: F2 since-filter → F3 empty-ids skip → E1 fan-out →
    * P4+F1 flash gate → P5 projection.
    */
  def deliveries(events: Dataset[ChangeEvent], cutoffMs: Long)(
      implicit spark: SparkSession): Dataset[Delivery] = {
    import spark.implicits._
    events
      .map(e => (e, commitMs(e.commit_raw)))
      .filter(t => t._2.forall(_ >= cutoffMs)) // null commit passes (F2)
      .filter(t => t._1.record_ids.nonEmpty)   // F3
      .flatMap { case (e, ms) =>
        e.record_ids.zipWithIndex.flatMap { case (rid, _) =>
          boolNorm(e.flash_raw) match {        // P4 + F1: exactly-true gate
            case Some(true) =>
              Some(Delivery(rid, e.subscription_topic, e.instance_url,
                e.entity, e.change_type, ms))
            case _ => None
          }
        }
      }
  }
}
