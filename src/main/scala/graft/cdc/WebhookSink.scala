package graft.cdc

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** K1 — the real HTTP webhook delivery executor behind the retry envelope.
  *
  * Mirrors the reference `_post_webhook` contract
  * (`app/services/sf_pubsub.py:333-356`): POST the delivery payload JSON,
  * 15 s request timeout, any 2xx is success; on failure retry up to 3
  * attempts with exponential backoff 1 s → ×2 → cap 30 s. Exhausted
  * retries throw, which aborts the foreachBatch epoch *before* the
  * checkpoint commit — the gated at-least-once replay of [[Streaming]]
  * (K2) then re-delivers the whole micro-batch on restart.
  *
  * Scale: delivery runs `foreachPartition` on the executors — each of the
  * N source partitions posts its own slice concurrently, nothing is
  * collected to the driver. The HTTP client is one per executor JVM
  * (lazy val), reused across batches.
  */
object WebhookSink {

  /** Delivery contract knobs (defaults = the reference's constants). */
  case class Config(
      url: String,
      timeoutMs: Long = 15000L,
      maxAttempts: Int = 3,
      baseDelayMs: Long = 1000L,
      capMs: Long = 30000L)

  // one client per executor JVM; HttpClient is thread-safe and pools
  // connections, so concurrent partition tasks share it.
  @transient private lazy val client: HttpClient =
    HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(10)).build()

  /** POST one payload with the reference's retry contract. Throws after
    * `maxAttempts` failures (non-2xx status or transport error).
    */
  def postWithRetry(cfg: Config, body: String): Unit = {
    var attempt = 0
    var delay = cfg.baseDelayMs
    var lastFailure: String = ""
    while (attempt < cfg.maxAttempts) {
      attempt += 1
      try {
        val req = HttpRequest.newBuilder(URI.create(cfg.url))
          .timeout(Duration.ofMillis(cfg.timeoutMs))
          .header("Content-Type", "application/json")
          .POST(HttpRequest.BodyPublishers.ofString(body))
          .build()
        val resp = client.send(req, HttpResponse.BodyHandlers.discarding())
        if (resp.statusCode() / 100 == 2) return
        lastFailure = s"HTTP ${resp.statusCode()}"
      } catch {
        case e: java.io.IOException => lastFailure = s"${e.getClass.getSimpleName}: ${e.getMessage}"
      }
      if (attempt < cfg.maxAttempts) {
        Thread.sleep(delay)
        delay = math.min(delay * 2, cfg.capMs)
      }
    }
    throw new RuntimeException(
      s"webhook delivery to ${cfg.url} failed after ${cfg.maxAttempts} attempts ($lastFailure)")
  }

  /** JSON string escape for a value column: backslash then double-quote
    * (mirrored construct-for-construct in the DuckDB oracle). Control
    * characters are assumed absent — the fields are Salesforce record ids,
    * topic paths, and instance URLs.
    */
  private def jsonEsc(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    replace(replace(c, lit("\\"), lit("\\\\")), lit("\""), lit("\\\""))

  /** P5/P7 — the webhook payload body per delivery row: the same field
    * shape the reference POSTs (`app/services/sf_pubsub.py:736-744`), with
    * quotes/backslashes in values JSON-escaped (the reference serializes
    * via json.dumps, which also escapes; exact bytes differ in separator
    * whitespace only). Shared by the `cdc_payload_json` oracle query and
    * the live sink, so the oracle checks exactly what goes over the wire.
    */
  def payloadJson(deliveries: DataFrame): DataFrame =
    deliveries.select(col("id"), concat(
      lit("""{"data":[{"Id":""""), jsonEsc(col("id")),
      lit("""","subscriptionTopic":""""), jsonEsc(col("subscription_topic")),
      lit("""","instanceUrl":""""), jsonEsc(col("instance_url")),
      lit(""""}]}""")).as("payload_json"))

  /** foreachBatch delivery function: serialize each delivery row and POST
    * it from the executors. Any exhausted-retry failure propagates and
    * aborts the epoch (gated commit).
    */
  def deliver(cfg: Config)(batch: DataFrame, epochId: Long): Unit =
    payloadJson(batch).select("payload_json").foreachPartition {
      (rows: Iterator[Row]) => rows.foreach(r => postWithRetry(cfg, r.getString(0)))
    }
}
