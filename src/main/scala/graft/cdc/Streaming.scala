package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryListener, Trigger}
import org.apache.spark.sql.types._
import org.apache.spark.sql.functions._
import java.util.concurrent.ConcurrentLinkedQueue

/** The CDC pipeline under Structured Streaming — the reference's listener
  * runtime (`app/services/listener_manager.py` + `_subscribe_loop`,
  * `app/services/sf_pubsub.py:552-789`) re-expressed as a checkpointed
  * micro-batch stream. The *identical* batch transforms from [[Pipeline]]
  * run under `readStream`; delivery happens in `foreachBatch` with
  * **gated-commit** semantics (K2): the epoch's offset is committed only
  * after the delivery callback returns — a throwing sink leaves the
  * checkpoint untouched, so the whole micro-batch replays on restart
  * (at-least-once, whole-event replay granularity, exactly the contract at
  * reference `app/services/sf_pubsub.py:752-780`).
  *
  * Scale: the route is narrow end-to-end (no shuffle); a 1000-executor
  * cluster partitions by source split and each epoch is embarrassingly
  * parallel. Backpressure = `maxFilesPerTrigger` (the credit-based
  * `num_requested` analog, reference `:565,607`).
  */
object Streaming {

  /** Per-client pipeline config — the `ClientConfig` analog
    * (reference `app/services/sf_pubsub.py:78-87`).
    */
  case class PipelineSpec(
      clientId: String,
      sourceDir: String,
      checkpointDir: String,
      cutoffMs: Long = CdcView.SinceCutoffMs,
      maxFilesPerTrigger: Int = 1,
      dedupe: Boolean = false,
      dedupeDelay: String = "2 days")

  /** events.parquet schema with ts as epoch-nanos long (see graft.Tables). */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Build the streaming delivery DataFrame (unstarted). With
    * `spec.dedupe` set, ingest-side replay dedup
    * ([[graft.streaming.Windows.dedupStream]]) runs BEFORE the route: an
    * event_id re-delivered by the source in a later micro-batch (the
    * at-least-once replay the reference leaves to consumers, ref
    * `app/services/sf_pubsub.py:753-754`) is suppressed by watermark-
    * bounded state, so the delivery sink sees each event once.
    * `CdcView.fromEvents` selects its own columns, so the dedup's
    * event_time never leaks into the delivery schema.
    *
    * The watermark bound cuts both ways: a FIRST-TIME event arriving more
    * than `dedupeDelay` of event time behind the observed maximum is
    * dropped as late by the stateful operator — that is what bounds the
    * state, but it means `dedupe = true` trades the unconditional
    * at-least-once contract for "at-least-once within `dedupeDelay` of
    * disorder". Size `dedupeDelay` to the source's maximum out-of-order
    * skew (a replayed event arrives close to its original, so dedup
    * itself needs only a short horizon); leave `dedupe = false` where
    * late data must never be lost.
    *
    * `sourceDir` must hold at least one file at plan time: the ts
    * physical type is read off the existing files so any driver
    * generation (raw-nanos Long or TIMESTAMP(MICROS)/NTZ) normalizes to
    * the epoch-nanos Long the route expects — the [[graft.Tables.load]]
    * rule, applied to the stream.
    */
  def routed(spark: SparkSession, spec: PipelineSpec): DataFrame = {
    graft.Tables.setup(spark)
    // Declare ts with the SOURCE's physical type (read off the files
    // already present — the StreamingIngest schema discipline), then
    // normalize to the epoch-nanos Long the route expects, exactly the
    // Tables.load rule. Forcing LongType onto a TIMESTAMP(MICROS) file
    // would make the vectorized reader hand back RAW MICROS — commit_ms
    // lands on the seconds scale, the since-filter drops 100% of events,
    // and the stream silently delivers nothing.
    val tsType = spark.read.parquet(spec.sourceDir).schema("ts").dataType
    val srcSchema = org.apache.spark.sql.types.StructType(eventsSchema.map(f =>
      if (f.name == "ts") f.copy(dataType = tsType) else f))
    val src = graft.Tables.normalizeTs(spark.readStream
      .schema(srcSchema)
      .option("maxFilesPerTrigger", spec.maxFilesPerTrigger)
      .parquet(spec.sourceDir))
    val ingest = if (spec.dedupe)
      graft.streaming.Windows.dedupStream(src, spec.dedupeDelay)
    else src
    Pipeline.deliveries(CdcView.fromEvents(ingest), spec.cutoffMs)
  }

  /** Start the pipeline with a delivery callback (K1 webhook analog).
    * `deliver` receives each micro-batch; throwing aborts the epoch
    * *before* the checkpoint commit → gated at-least-once replay (K2).
    * Processes all available input then stops (AvailableNow), restartable
    * from the same checkpoint — replay positioning (S3) is the checkpoint
    * itself; a fresh checkpoint dir = EARLIEST, a kept one = stored offset.
    */
  def start(spark: SparkSession, spec: PipelineSpec)(
      deliver: (DataFrame, Long) => Unit): StreamingQuery =
    routed(spark, spec).writeStream
      .option("checkpointLocation", spec.checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        deliver(batch, epochId)
      }
      .start()

  /** Delivery into an append-only parquet log (the observable webhook sink
    * used by tests; swap the body for an HTTP POST executor in production).
    */
  def startToParquet(spark: SparkSession, spec: PipelineSpec, outDir: String): StreamingQuery =
    start(spark, spec) { (batch, _) =>
      batch.withColumn("client_id", lit(spec.clientId))
        .write.mode("append").parquet(outDir)
    }

  /** K1 — live HTTP webhook delivery: each micro-batch POSTs its payload
    * rows from the executors under the reference retry contract (see
    * [[WebhookSink]]); exhausted retries abort the epoch → gated replay.
    */
  def startToWebhook(spark: SparkSession, spec: PipelineSpec,
      webhook: WebhookSink.Config): StreamingQuery =
    start(spark, spec)(WebhookSink.deliver(webhook))

  /** Delivery-log storage layout for 100 TB: partition by entity so
    * downstream per-entity consumers read only their slice (partition
    * pruning — `PartitionFilters` in the read plan; asserted in
    * PlanQualitySpec). A date partition column derived from `commit_ms`
    * would be the second level in production.
    */
  def writePartitionedLog(deliveries: DataFrame, outDir: String): Unit =
    deliveries.write.mode("append").partitionBy("entity").parquet(outDir)

  /** Effectively-once delivery log: like [[startToParquet]] but idempotent
    * under replay — each epoch writes to a partition directory keyed by its
    * epoch id with dynamic partition overwrite, so a replayed epoch
    * *replaces* its own partial output instead of appending duplicates.
    * This upgrades the reference's at-least-once contract (duplicates on
    * replay are the consumer's problem, `app/services/sf_pubsub.py:753-754`)
    * to exactly-once observable output — the standard foreachBatch
    * idempotent-sink pattern.
    */
  def startToParquetIdempotent(spark: SparkSession, spec: PipelineSpec,
      outDir: String): StreamingQuery =
    start(spark, spec) { (batch, epochId) =>
      batch.sparkSession.conf
        .set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      batch.withColumn("client_id", lit(spec.clientId))
        .withColumn("epoch", lit(epochId))
        .write.mode("overwrite").partitionBy("epoch").parquet(outDir)
    }

  /** A4 — running per-entity counters as a stateful streaming agg
    * (`events_received`, last-seen), the only cross-event state beyond the
    * offset in the reference (`app/services/sf_pubsub.py:782-785`).
    */
  def runningCounters(deliveries: DataFrame): DataFrame =
    deliveries.groupBy(col("entity"))
      .agg(count(lit(1)).as("events_received"), max(col("commit_ms")).as("last_commit_ms"))

  /** K4 — alert sink: a StreamingQueryListener recording terminations with
    * errors (the email-notification analog, reference
    * `app/services/email_notifications.py:38-119`). Alerts are observable
    * via [[AlertListener.alerts]].
    */
  final class AlertListener extends StreamingQueryListener {
    val alerts = new ConcurrentLinkedQueue[(String, String)]()
    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = ()
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
      e.exception.foreach(msg => alerts.add(e.id.toString -> msg))
  }
}
