package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** K3 — the composed invalid-replay recovery flow.
  *
  * The reference triages a subscribe failure as "invalid replay id" when
  * the gRPC error is INVALID_ARGUMENT and mentions the replay id
  * (`app/services/sf_pubsub.py:462-486`), then clears the stored offset
  * (`_clear_saved_replay`, `:178-200`) and resubscribes from EARLIEST
  * (`:886-891`). Here the same triage runs over the failed
  * StreamingQuery's cause chain, the clear is [[Offsets.clear]], and the
  * restart is the caller's subscribe function with `earliest` — one
  * self-healing path instead of three loose pieces.
  */
object Recovery {

  /** True when the failure (anywhere in the cause chain) is the
    * invalid-replay shape: INVALID_ARGUMENT mentioning the replay id.
    */
  def isInvalidReplay(e: Throwable): Boolean = {
    var cur = e
    var depth = 0
    while (cur != null && depth < 20) {
      val m = Option(cur.getMessage).getOrElse("")
      if (m.contains("INVALID_ARGUMENT") && m.toLowerCase.contains("replay")) return true
      cur = cur.getCause
      depth += 1
    }
    false
  }

  /** The stored replay id for (client, topic) from the offsets table, if
    * any (reference `_load_replay_b64`). A one-row control-plane lookup.
    */
  def storedReplay(offsets: DataFrame, clientId: String, topicName: String): Option[String] =
    Offsets.latestPerKey(offsets)
      .filter(col("client_id") === clientId && col("topic_name") === topicName)
      .select("last_replay_b64")
      .collect().headOption.flatMap(r => Option(r.getString(0)))

  /** Run one subscribe-to-completion cycle with invalid-replay self-heal:
    * subscribe at the stored replay id (or earliest when none), and if the
    * stream dies with the invalid-replay shape, clear the stored offset and
    * resubscribe from EARLIEST. Any other failure propagates (that's
    * [[Reliability]]'s restart-policy territory, not replay recovery).
    *
    * Returns (offsets table after recovery, whether recovery fired).
    */
  def runWithReplayRecovery(offsets: DataFrame, clientId: String, topicName: String)(
      subscribe: String => StreamingQuery): (DataFrame, Boolean) = {
    val start = storedReplay(offsets, clientId, topicName).getOrElse("earliest")
    // subscribe() itself stays inside the try: a source that validates its
    // options at analysis time surfaces the invalid-replay failure
    // synchronously from start(), and that must triage identically
    try {
      subscribe(start).awaitTermination()
      (offsets, false)
    } catch {
      case e: Throwable if isInvalidReplay(e) =>
        val cleared = Offsets.clear(offsets, clientId, topicName)
        subscribe("earliest").awaitTermination()
        (cleared, true)
    }
  }
}
