package graft.cdc

import org.apache.spark.sql.DataFrame

/** Delivery retry + restart policy — the reference's reliability envelope
  * (SURVEY §2.8 K1, §2.9):
  *
  *   - [[withRetry]]: per-batch delivery retry, ≤ maxAttempts with
  *     exponential backoff and a cap (reference `_post_webhook`,
  *     `app/services/sf_pubsub.py:333-356`: 3 attempts, 1s → ×2 → cap 30s).
  *     Exhausted retries rethrow → the epoch aborts uncommitted → gated
  *     replay (K2).
  *   - [[FatalConfigError]] + [[RestartPolicy]]: the manager restart loop
  *     (`app/services/listener_manager.py:96-97,168-173`; fatal
  *     classification `app/services/sf_pubsub.py:33-35,462-486`): transient
  *     failures restart with backoff up to a bound; fatal configuration
  *     errors stop immediately (restarting cannot fix a bad topic/creds).
  *
  * Backoff sleeps are injectable so specs run instantly; jitter is omitted
  * (determinism) — production callers can wrap `sleep`.
  */
object Reliability {

  /** Non-retryable error class (reference `FatalConfigError`). */
  final class FatalConfigError(msg: String, cause: Throwable = null)
      extends RuntimeException(msg, cause)

  /** Wrap a delivery function with bounded exponential-backoff retry. */
  def withRetry(
      maxAttempts: Int = 3,
      baseDelayMs: Long = 1000L,
      capMs: Long = 30000L,
      sleep: Long => Unit = Thread.sleep)(
      deliver: (DataFrame, Long) => Unit): (DataFrame, Long) => Unit =
    (batch, epoch) => {
      var attempt = 0
      var delay = baseDelayMs
      var done = false
      while (!done) {
        attempt += 1
        try { deliver(batch, epoch); done = true }
        catch {
          case e: FatalConfigError => throw e // never retried
          case e: Throwable if attempt >= maxAttempts => throw e
          case _: Throwable =>
            sleep(delay)
            delay = math.min(delay * 2, capMs)
        }
      }
    }

  /** Run (and re-run) a terminating workload under the manager restart
    * policy: transient failures restart with exponential backoff up to
    * `maxRestarts`; [[FatalConfigError]] (at any depth of the cause chain)
    * propagates immediately. Returns the number of runs performed.
    */
  def runWithRestarts(
      maxRestarts: Int = 5,
      baseDelayMs: Long = 1000L,
      capMs: Long = 60000L,
      sleep: Long => Unit = Thread.sleep)(run: () => Unit): Int = {
    var restarts = 0
    var delay = baseDelayMs
    while (true) {
      try { run(); return restarts + 1 }
      catch {
        case e: Throwable if isFatal(e) => throw e
        case e: Throwable =>
          if (restarts >= maxRestarts) throw e
          restarts += 1
          sleep(delay)
          delay = math.min(delay * 2, capMs)
      }
    }
    restarts // unreachable
  }

  @scala.annotation.tailrec
  def isFatal(e: Throwable): Boolean = e match {
    case null                 => false
    case _: FatalConfigError  => true
    case other                => isFatal(other.getCause)
  }

  /** Idle watchdog — the reference resets a stream after 300 s without
    * messages (`watchdog`, `app/services/sf_pubsub.py:588-596`; heartbeat
    * re-credits every 60 s `:579-586`). Spark analog: track per-query
    * *data* progress via StreamingQueryListener (empty micro-batches do
    * not count as liveness, matching the reference's "messages received"
    * notion) and report queries idle past the timeout so a manager can
    * restart them. The idle timer starts at query start (the reference
    * initializes `last_rx = loop.time()` at subscribe,
    * `app/services/sf_pubsub.py:557`), so a stream that never receives a
    * single row — the most common hang mode — still goes idle after the
    * timeout. Clock injectable for deterministic tests.
    */
  final class IdleWatchdog(idleTimeoutMs: Long = 300000L,
      clock: () => Long = System.currentTimeMillis)
      extends org.apache.spark.sql.streaming.StreamingQueryListener {
    import org.apache.spark.sql.streaming.StreamingQueryListener._
    private val lastData = new java.util.concurrent.ConcurrentHashMap[java.util.UUID, Long]()

    override def onQueryStarted(e: QueryStartedEvent): Unit =
      lastData.put(e.id, clock())
    override def onQueryProgress(e: QueryProgressEvent): Unit =
      if (e.progress.numInputRows > 0) lastData.put(e.progress.id, clock())
    override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
      lastData.remove(e.id)

    /** Timestamp of the last liveness event: query start, or the most
      * recent data-bearing progress.
      */
    def lastDataAt(id: java.util.UUID): Option[Long] = Option(lastData.get(id))

    def isIdle(id: java.util.UUID): Boolean =
      lastDataAt(id).exists(clock() - _ > idleTimeoutMs)
    def idleQueries(): Seq[java.util.UUID] = {
      import scala.jdk.CollectionConverters._
      lastData.keySet().asScala.filter(isIdle).toSeq
    }
  }
}
