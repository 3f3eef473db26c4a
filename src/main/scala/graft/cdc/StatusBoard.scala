package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-listener status introspection — the reference exposes a status dict
  * per listener (running flag, topic, counters, last-event times;
  * `app/services/sf_pubsub.py:382-400`) that the control plane joins onto
  * the clients list (`app/routers/clients.py:166-187`). Spark analog: a
  * snapshot DataFrame built from `spark.streams.active` + each query's
  * `status`/`lastProgress`, joinable into the J1 shape
  * (`cp_status_left_join`) with live data instead of a fixture.
  *
  * The snapshot is driver-built by construction (there are as many rows as
  * running queries — control-plane cardinality, not data volume).
  */
object StatusBoard {

  /** Listener-per-client naming convention: queries started for a client
    * are named `listener-<clientId>` so status rows join back to clients.
    */
  def queryName(clientId: String): String = s"listener-$clientId"

  /** Snapshot of all active streaming queries:
    * (client_id, query_id, run_id, status, is_data_available, batch_id,
    * num_input_rows, rows_per_second). `client_id` is parsed from the
    * query-name convention (null for unnamed/foreign queries); `status` is
    * the reference's RUNNING state string.
    */
  def statuses(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.streams.active.toSeq.map { q =>
      val p = Option(q.lastProgress)
      val client = Option(q.name).collect {
        case n if n.startsWith("listener-") => n.stripPrefix("listener-")
      }
      (client.orNull, q.id.toString, q.runId.toString,
        if (q.isActive) "running" else "stopped",
        q.status.isDataAvailable,
        p.map(_.batchId).getOrElse(-1L),
        p.map(_.numInputRows).getOrElse(0L),
        p.map(_.processedRowsPerSecond).getOrElse(0.0))
    }.toDF("client_id", "query_id", "run_id", "status", "is_data_available",
      "batch_id", "num_input_rows", "rows_per_second")
  }

  /** J1 with live data: clients ⟕ running-query status, absent side
    * defaulting to "stopped" — the same plan shape as
    * `cp_status_left_join`, the right side now fed by `spark.streams`.
    *
    * Live-side columns are aliased before the join, so a clients frame
    * that already carries a `status`/`batch_id`/`num_input_rows`/`running`
    * column (the reference's client rows do expose status fields) never
    * makes the post-join references ambiguous; such client columns are
    * preserved under a `client_` prefix and the board columns keep their
    * names.
    */
  /** [[clientStatusBoard]] augmented with a [[ListenerManager]]'s
    * lifecycle view: the manager's status wins where present (it tracks
    * `error` listeners whose failed queries are gone from
    * `spark.streams`), the live board fills the rest, absent listeners
    * stay "stopped". The reference's GET /clients status join shows
    * exactly this union of live and last-known state.
    */
  def managedStatusBoard(spark: SparkSession, clients: DataFrame,
      manager: ListenerManager, clientIdCol: String = "client_id"): DataFrame = {
    val live = clientStatusBoard(spark, clients, clientIdCol)
      .withColumnRenamed("status", "live_status")
      .withColumnRenamed("running", "live_running")
    // the clientStatusBoard defense, extended to the manager-side extras:
    // a clients frame already carrying fail_count/last_error (the
    // reference's client rows expose status fields) keeps them under the
    // client_ prefix, and the board's columns own the plain names —
    // without this the post-join references are ambiguous
    val liveSafe = Seq("fail_count", "last_error")
      .filter(live.columns.contains)
      .foldLeft(live)((d, c) => d.withColumnRenamed(c, s"client_$c"))
    val managed = manager.statusFrame(spark)
      .select(col("client_id").as("mgr_client_id"),
        col("status").as("mgr_status"),
        col("fail_count"), col("last_error"))
    liveSafe.join(broadcast(managed), col(clientIdCol) === col("mgr_client_id"), "left")
      .withColumn("status", coalesce(col("mgr_status"), col("live_status")))
      .withColumn("running", col("status") === "running")
      .drop("mgr_client_id", "mgr_status", "live_status", "live_running")
  }

  /** The reference's GET /debug/pool activity half (`app/main.py:99-130`:
    * pg_stat_activity GROUP BY state → per-state counts + total): the same
    * A2 aggregation over any status frame — [[statuses]] (live queries),
    * [[ListenerManager.statusFrame]] (lifecycle view, includes `error`
    * listeners gone from `spark.streams`), or [[managedStatusBoard]] (the
    * union). One row per state plus the reference's explicit `total`.
    */
  def activityByState(statusFrame: DataFrame,
      stateCol: String = "status"): DataFrame = {
    val byState = statusFrame.groupBy(col(stateCol).as("state"))
      .agg(count(lit(1)).as("n"))
    byState.unionByName(
      byState.agg(sum(col("n")).cast("bigint").as("n"))
        .select(lit("total").as("state"), col("n")))
  }

  /** The reference's GET /debug/pool internals half (`app/main.py:80-96`:
    * SQLAlchemy pool gauges per process) translated to the Spark runtime:
    * one row per executor with its live task/storage gauges from the
    * status tracker, plus the configured ceiling (defaultParallelism — the
    * analog of pool_size + max_overflow). Driver-built snapshot at
    * cluster cardinality (one row per executor, never data volume).
    */
  def executorPool(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val maxConc = spark.sparkContext.defaultParallelism
    spark.sparkContext.statusTracker.getExecutorInfos.toSeq.map { e =>
      (s"${e.host}:${e.port}", e.numRunningTasks(), e.cacheSize(),
        e.usedOnHeapStorageMemory(), e.totalOnHeapStorageMemory(), maxConc)
    }.toDF("executor", "running_tasks", "cache_size_bytes",
      "used_onheap_storage", "total_onheap_storage", "max_concurrency")
  }

  def clientStatusBoard(spark: SparkSession, clients: DataFrame,
      clientIdCol: String = "client_id"): DataFrame = {
    val boardCols = Seq("status", "batch_id", "num_input_rows", "running")
    val safe = boardCols.filter(clients.columns.contains)
      .foldLeft(clients)((d, c) => d.withColumnRenamed(c, s"client_$c"))
    val live = statuses(spark)
      .filter(col("client_id").isNotNull)
      .select(col("client_id").as("live_client_id"),
        col("status").as("live_status"),
        col("batch_id").as("live_batch_id"),
        col("num_input_rows").as("live_num_input_rows"))
    safe.join(broadcast(live), col(clientIdCol) === col("live_client_id"), "left")
      .withColumn("status", coalesce(col("live_status"), lit("stopped")))
      .withColumn("batch_id", col("live_batch_id"))
      .withColumn("num_input_rows", col("live_num_input_rows"))
      .withColumn("running", col("status") === "running")
      .drop("live_client_id", "live_status", "live_batch_id", "live_num_input_rows")
  }
}
