package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.cdc.ops.{Normalize, Route}
import org.apache.spark.sql.Column

/** CDC-dataflow queries (SURVEY §2.2-2.4, §2.8) with their DuckDB oracle
  * SQL. Spark and SQL sides are derived from the same `events` columns so
  * the driver's hash-compare is exact (see CdcView for the derivation).
  */
object CdcQueries {

  /** DuckDB CTEs mirroring CdcView + Route.withCommitMs/flash normalize. */
  val oracleCte: String =
    """WITH cdc_events AS (
      |  SELECT event_id, user_id,
      |    'RP' || CAST(event_id AS VARCHAR) AS replay_b64,
      |    event_type AS entity,
      |    ['CREATE','UPDATE','DELETE','UNDELETE'][CAST((event_id // 4) % 4 AS INT) + 1] AS change_type,
      |    list_transform(range(0, event_id % 4), i -> 'R' || CAST(event_id * 4 + i AS VARCHAR)) AS record_ids,
      |    CASE event_id % 4 WHEN 0 THEN epoch_ms(ts) // 1000 WHEN 1 THEN epoch_ms(ts)
      |         WHEN 2 THEN epoch_ms(ts) * 1000000 ELSE 5 END AS commit_raw,
      |    CASE WHEN event_id % 13 = 0 THEN NULL
      |         ELSE ['true','True',' TRUE ','1','yes','y','false','0','no','','maybe'][CAST(event_id % 11 AS INT) + 1]
      |    END AS flash_raw,
      |    '/data/' || event_type || 'ChangeEvent' AS subscription_topic,
      |    'https://inst' || CAST(user_id % 10 AS VARCHAR) || '.example.com' AS instance_url
      |  FROM events
      |), cdc_norm AS (
      |  SELECT *,
      |    CASE WHEN commit_raw IS NULL THEN NULL
      |         WHEN commit_raw > 100000000000000 THEN commit_raw // 1000000
      |         WHEN commit_raw > 100000000000 THEN commit_raw
      |         WHEN commit_raw > 1000000000 THEN commit_raw * 1000
      |         ELSE commit_raw END AS commit_ms,
      |    CASE WHEN flash_raw IS NULL THEN NULL
      |         WHEN lower(trim(flash_raw)) IN ('true','1','yes','y') THEN TRUE
      |         WHEN lower(trim(flash_raw)) IN ('false','0','no','n','') THEN FALSE
      |         ELSE NULL END AS flash_norm
      |  FROM cdc_events
      |)
      |""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Flagship: the full reference hot loop, P3→F2→F3→E1→P4→F1→P5.
    "cdc_route" -> ((s, d) => Pipeline.deliveries(s, d)),

    // P3 — unit-heuristic timestamp normalization over all four regimes.
    "cdc_commit_ts_norm" -> ((s, d) =>
      CdcView(s, d).transform(Route.withCommitMs)
        .select(col("event_id"), col("commit_raw"), col("commit_ms"))),

    // P4 — messy-boolean truth table over the 11 encodings + null override.
    "cdc_bool_norm" -> ((s, d) =>
      CdcView(s, d)
        .select(col("event_id"), col("flash_raw"),
          Normalize.boolNorm(col("flash_raw")).as("flash_norm"))),

    // E1 — positional list alignment: list-valued flash field aligned with
    // recordIds by index, out-of-range → null, then normalized.
    "cdc_explode_align" -> ((s, d) => {
      val flashList = slice(
        array(lit("true"), lit("0"), lit("maybe")),
        lit(1), (col("event_id") % 3).cast("int"))
      val exploded = CdcView(s, d)
        .withColumn("flash_list", flashList)
        .transform(Route.fanOut)
      exploded
        .withColumn("flash_aligned",
          Route.alignedFlash(col("flash_list"), col("idx")))
        .select(col("event_id"), col("idx").cast("bigint").as("idx"), col("record_id"),
          col("flash_aligned"),
          Normalize.boolNorm(col("flash_aligned")).as("flash_norm"))
    }),

    // P5/P7 — webhook payload projection serialized as the JSON body the
    // reference POSTs (`app/services/sf_pubsub.py:736-744`); the same
    // projection the live sink posts (WebhookSink.payloadJson), so the
    // oracle checks exactly what goes over the wire.
    "cdc_payload_json" -> ((s, d) =>
      WebhookSink.payloadJson(Pipeline.deliveries(CdcView(s, d)))),

    // A4 — running per-entity counters (batch form of the streaming agg;
    // reference `app/services/sf_pubsub.py:782-785`).
    "cdc_counters" -> ((s, d) =>
      Streaming.runningCounters(Pipeline.deliveries(CdcView(s, d)))),

    // P7 — JSON field extraction from the raw event props.
    "cdc_props_extract" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("bigint").as("k"),
          col("value"))),

    // P8 — secret masking over customer names (clients stand-in).
    "cdc_mask_secret" -> ((s, d) =>
      Tables.customer(s, d)
        .select(col("c_custkey"), Normalize.maskSecret(col("c_name")).as("masked"))),

    // P6 — base64 encode/decode round trip of replay ids.
    "cdc_b64_roundtrip" -> ((s, d) =>
      CdcView(s, d)
        .select(col("event_id"), Normalize.b64(encode(col("replay_b64"), "UTF-8")).as("b64"))
        .withColumn("back", decode(Normalize.unb64(col("b64")), "UTF-8"))),

    // P9 — validation scalars: URL normalization, topic + email shape.
    "cdc_validate" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val rawUrl = when(col("c_custkey") % 3 === 0,
        concat(lit("https://h"), col("c_custkey").cast("string"), lit(".com")))
        .when(col("c_custkey") % 3 === 1,
          concat(lit("h"), col("c_custkey").cast("string"), lit(".com")))
        .otherwise(concat(lit("http://h"), col("c_custkey").cast("string"), lit(".com")))
      val email = when(col("c_custkey") % 2 === 0,
        concat(lit("u"), col("c_custkey").cast("string"), lit("@example.com")))
        .otherwise(concat(lit("u"), col("c_custkey").cast("string"), lit("-example.com")))
      c.select(
        col("c_custkey"),
        Normalize.normalizeUrl(rawUrl).as("url_norm"),
        Normalize.validTopic(concat(lit("/data/"), col("c_mktsegment"), lit("ChangeEvent"))).as("topic_ok"),
        Normalize.validEmail(email).as("email_ok"),
        Normalize.validHostPort(
          when(col("c_custkey") % 5 === 0, lit("api.pubsub.example.com"))
            .otherwise(lit("api.pubsub.example.com:7443"))).as("host_ok"))
    })
  )

  /** Verify-dump sort keys (applied by [[graft.Verify]], not the operators). */
  def dumpOrder: Map[String, Seq[Column]] = Map(
    "cdc_route"          -> Seq(col("id")),
    "cdc_commit_ts_norm" -> Seq(col("event_id")),
    "cdc_bool_norm"      -> Seq(col("event_id")),
    "cdc_explode_align"  -> Seq(col("event_id"), col("idx")),
    "cdc_payload_json"   -> Seq(col("id")),
    "cdc_counters"       -> Seq(col("entity")),
    "cdc_props_extract"  -> Seq(col("event_id")),
    "cdc_mask_secret"    -> Seq(col("c_custkey")),
    "cdc_b64_roundtrip"  -> Seq(col("event_id")),
    "cdc_validate"       -> Seq(col("c_custkey"))
  )

  def oracle: Map[String, String] = Map(
    "cdc_route" -> (oracleCte +
      """SELECT record_id AS id, subscription_topic, instance_url, entity, change_type, commit_ms
        |FROM (
        |  SELECT c.*, c.record_ids[CAST(u.i AS INT) + 1] AS record_id
        |  FROM cdc_norm c, UNNEST(range(0, len(c.record_ids))) AS u(i)
        |  WHERE (c.commit_ms IS NULL OR c.commit_ms >= 1704412800000) AND len(c.record_ids) > 0 AND c.flash_norm = TRUE
        |) ORDER BY id""".stripMargin),

    "cdc_commit_ts_norm" -> (oracleCte +
      "SELECT event_id, commit_raw, commit_ms FROM cdc_norm ORDER BY event_id"),

    "cdc_bool_norm" -> (oracleCte +
      "SELECT event_id, flash_raw, flash_norm FROM cdc_norm ORDER BY event_id"),

    "cdc_explode_align" -> (oracleCte +
      """SELECT event_id, idx, record_id, flash_aligned,
        |  CASE WHEN flash_aligned IS NULL THEN NULL
        |       WHEN lower(trim(flash_aligned)) IN ('true','1','yes','y') THEN TRUE
        |       WHEN lower(trim(flash_aligned)) IN ('false','0','no','n','') THEN FALSE
        |       ELSE NULL END AS flash_norm
        |FROM (
        |  SELECT c.event_id, CAST(u.i AS BIGINT) AS idx,
        |    c.record_ids[CAST(u.i AS INT) + 1] AS record_id,
        |    CASE WHEN len(fl.flash_list) > u.i THEN fl.flash_list[CAST(u.i AS INT) + 1] ELSE NULL END AS flash_aligned
        |  FROM cdc_norm c
        |  CROSS JOIN LATERAL (SELECT list_slice(['true','0','maybe'], 1, CAST(c.event_id % 3 AS INT)) AS flash_list) fl,
        |  UNNEST(range(0, len(c.record_ids))) AS u(i)
        |) ORDER BY event_id, idx""".stripMargin),

    "cdc_payload_json" -> (oracleCte +
      """SELECT id, '{"data":[{"Id":"' || replace(replace(id, '\', '\\'), '"', '\"') || '","subscriptionTopic":"' || replace(replace(subscription_topic, '\', '\\'), '"', '\"') || '","instanceUrl":"' || replace(replace(instance_url, '\', '\\'), '"', '\"') || '"}]}' AS payload_json
        |FROM (
        |  SELECT c.record_ids[CAST(u.i AS INT) + 1] AS id, c.subscription_topic, c.instance_url
        |  FROM cdc_norm c, UNNEST(range(0, len(c.record_ids))) AS u(i)
        |  WHERE (c.commit_ms IS NULL OR c.commit_ms >= 1704412800000) AND len(c.record_ids) > 0 AND c.flash_norm = TRUE
        |) ORDER BY id""".stripMargin),

    "cdc_counters" -> (oracleCte +
      """SELECT entity, CAST(count(*) AS BIGINT) AS events_received, max(commit_ms) AS last_commit_ms
        |FROM (
        |  SELECT c.entity, c.commit_ms
        |  FROM cdc_norm c, UNNEST(range(0, len(c.record_ids))) AS u(i)
        |  WHERE (c.commit_ms IS NULL OR c.commit_ms >= 1704412800000) AND len(c.record_ids) > 0 AND c.flash_norm = TRUE
        |) GROUP BY entity ORDER BY entity""".stripMargin),

    "cdc_props_extract" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, "value"
        |FROM events ORDER BY event_id""".stripMargin,

    "cdc_mask_secret" ->
      """SELECT c_custkey,
        |  CASE WHEN c_name IS NULL OR c_name = '' THEN c_name
        |       WHEN length(c_name) <= 4 THEN repeat('*', length(c_name))
        |       ELSE repeat('*', length(c_name) - 4) || right(c_name, 4) END AS masked
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "cdc_b64_roundtrip" ->
      """SELECT event_id, to_base64(encode('RP' || CAST(event_id AS VARCHAR))) AS b64,
        |  decode(from_base64(to_base64(encode('RP' || CAST(event_id AS VARCHAR))))) AS back
        |FROM events ORDER BY event_id""".stripMargin,

    "cdc_validate" ->
      """SELECT c_custkey,
        |  CASE WHEN raw_url LIKE 'http://%' OR raw_url LIKE 'https://%' THEN raw_url
        |       ELSE 'https://' || raw_url END AS url_norm,
        |  TRUE AS topic_ok,
        |  CASE WHEN c_custkey % 2 = 0 THEN TRUE ELSE FALSE END AS email_ok,
        |  CASE WHEN c_custkey % 5 = 0 THEN FALSE ELSE TRUE END AS host_ok
        |FROM (
        |  SELECT c_custkey, c_mktsegment,
        |    CASE WHEN c_custkey % 3 = 0 THEN 'https://h' || CAST(c_custkey AS VARCHAR) || '.com'
        |         WHEN c_custkey % 3 = 1 THEN 'h' || CAST(c_custkey AS VARCHAR) || '.com'
        |         ELSE 'http://h' || CAST(c_custkey AS VARCHAR) || '.com' END AS raw_url
        |  FROM customer
        |) ORDER BY c_custkey""".stripMargin
  )
}
