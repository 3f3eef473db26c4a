package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Offset-table operations modeled as data (SURVEY §2.8 K2/K3, §2.5 A3).
  * Under Structured Streaming the real offset store is the checkpoint; this
  * module is the *relational* mirror the reference keeps in Postgres
  * (`listener_offsets`, DDL at reference `app/services/sf_pubsub.py:103-114`)
  * for introspection and manual repositioning.
  *
  * Schema: (client_id, topic_name, last_replay_b64, last_commit_ms, updated_at).
  */
object Offsets {

  /** A3 — latest offset per (client_id, topic_name), the stored-offset
    * lookup (reference `_load_replay_b64`, `app/services/sf_pubsub.py:131-138`).
    */
  def latestPerKey(offsets: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("client_id"), col("topic_name"))
      .orderBy(col("updated_at").desc)
    offsets.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** K2 — upsert one offset row (UPDATE, INSERT if absent — reference
    * `_save_replay_b64`, `app/services/sf_pubsub.py:145-176`), expressed as
    * a batch merge: updates override matching keys, new keys append.
    */
  def upsert(offsets: DataFrame, updates: DataFrame): DataFrame = {
    val keys = Seq("client_id", "topic_name")
    val kept = offsets.join(updates.select(keys.map(col): _*), keys, "left_anti")
    kept.unionByName(updates)
  }

  /** K3 — clear the stored offset for a key (invalid-replay fallback,
    * reference `_clear_saved_replay`, `app/services/sf_pubsub.py:178-200`):
    * NULL the replay id so the next start resolves to EARLIEST.
    */
  def clear(offsets: DataFrame, clientId: String, topicName: String): DataFrame =
    offsets.withColumn("last_replay_b64",
      when(col("client_id") === clientId && col("topic_name") === topicName,
        lit(null).cast("string")).otherwise(col("last_replay_b64")))
}
