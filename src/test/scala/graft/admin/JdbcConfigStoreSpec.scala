package graft.admin

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Control-plane query shapes over a real JDBC backend (embedded Derby):
  * read path (S5), J1 join over JDBC relations, and transactional upserts
  * (K5) — batch and per-epoch streaming.
  */
class JdbcConfigStoreSpec extends SparkSpec {
  import spark.implicits._

  System.setProperty("derby.stream.error.file", "/tmp/derby.log")
  private def freshUrl(name: String): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-derby").toString
    s"jdbc:derby:$dir/$name;create=true"
  }

  test("S5: config tables round-trip through JDBC and back") {
    val url = freshUrl("cfg")
    val clients = graft.Tables.customer(spark, "/root/testdata/sf0.001")
      .select(col("c_custkey").as("client_id"), col("c_name").as("client_name"))
      .limit(50)
    JdbcConfigStore.write(clients, url, "clients", SaveMode.Overwrite)
    val back = JdbcConfigStore.read(spark, url, "clients")
    assert(back.count() === 50L)
    assert(back.columns.map(_.toLowerCase).toSet === Set("client_id", "client_name"))
  }

  test("J1 over JDBC: clients left-join listener status matches the parquet-backed result") {
    val url = freshUrl("j1")
    val customer = graft.Tables.customer(spark, "/root/testdata/sf0.001")
    JdbcConfigStore.write(
      customer.select(col("c_custkey"), col("c_name")), url, "clients", SaveMode.Overwrite)
    JdbcConfigStore.write(
      ControlPlane.listenerStatus(customer), url, "listener_status", SaveMode.Overwrite)
    val c = JdbcConfigStore.read(spark, url, "clients")
    val s = JdbcConfigStore.read(spark, url, "listener_status")
    val overJdbc = c.join(broadcast(s), col("c_custkey") === col("client_id"), "left")
      .select(col("c_custkey"),
        coalesce(col("status"), lit("stopped")).as("status"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val overParquet = ControlPlane.queries("cp_status_left_join")(spark, "/root/testdata/sf0.001")
      .select(col("c_custkey"), col("status"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(overJdbc === overParquet)
  }

  test("K5: upsert updates matched keys and inserts new ones, transactionally") {
    val url = freshUrl("ups")
    val base = Seq(
      ("c1", "/data/A", 10L), ("c1", "/data/B", 20L), ("c2", "/data/A", 30L))
      .toDF("client_id", "topic_name", "last_replay")
    JdbcConfigStore.write(base, url, "offsets", SaveMode.Overwrite)
    val updates = Seq(
      ("c1", "/data/A", 111L),  // update
      ("c3", "/data/A", 999L))  // insert
      .toDF("client_id", "topic_name", "last_replay")
    JdbcConfigStore.upsert(updates, url, "offsets", keys = Seq("client_id", "topic_name"))
    val got = JdbcConfigStore.read(spark, url, "offsets")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === Map(
      ("c1", "/data/A") -> 111L, ("c1", "/data/B") -> 20L,
      ("c2", "/data/A") -> 30L, ("c3", "/data/A") -> 999L))
  }

  test("K5: upserting a null column value binds as typed NULL (K3 cleared offset)") {
    val url = freshUrl("nulls")
    val base = Seq(("c1", "/data/A", "cmVwbGF5"))
      .toDF("client_id", "topic_name", "last_replay_b64")
    JdbcConfigStore.write(base, url, "offsets", SaveMode.Overwrite)
    // the K3 recovery flow clears the stored offset → null last_replay_b64;
    // Derby rejects an untyped setObject(null) (ERROR 22005), so this row
    // exercises the setNull(sqlType) path for update AND insert
    val cleared = Seq(
      ("c1", "/data/A", null.asInstanceOf[String]),   // update → null
      ("c9", "/data/Z", null.asInstanceOf[String]))   // insert with null
      .toDF("client_id", "topic_name", "last_replay_b64")
    JdbcConfigStore.upsert(cleared, url, "offsets", keys = Seq("client_id", "topic_name"))
    val got = JdbcConfigStore.read(spark, url, "offsets")
      .collect().map(r => (r.getString(0), r.getString(1)) -> Option(r.getString(2))).toMap
    assert(got === Map(
      ("c1", "/data/A") -> None, ("c9", "/data/Z") -> None))
  }

  test("K5 streaming: per-epoch counter upserts land in JDBC and replay idempotently") {
    val url = freshUrl("stream")
    val src = java.nio.file.Files.createTempDirectory("graft-jdbc-src").toString
    val ckp = java.nio.file.Files.createTempDirectory("graft-jdbc-ckp").toString
    graft.Tables.events(spark, "/root/testdata/sf0.001")
      .coalesce(1).write.mode("overwrite").parquet(src)
    // seed the table's DDL (Derby can't create-on-upsert)
    JdbcConfigStore.write(
      Seq.empty[(String, Long, Long)].toDF("entity", "events_received", "last_commit_ms"),
      url, "counters", SaveMode.Overwrite)
    val spec = graft.cdc.Streaming.PipelineSpec("c1", src, ckp)
    graft.cdc.Streaming.start(spark, spec) { (batch, epoch) =>
      val counters = graft.cdc.Streaming.runningCounters(batch)
      JdbcConfigStore.upsertSink(url, "counters", Seq("entity"))(counters, epoch)
    }.awaitTermination()
    val expected = graft.cdc.Streaming.runningCounters(
      graft.cdc.Pipeline.deliveries(spark, "/root/testdata/sf0.001"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val got = JdbcConfigStore.read(spark, url, "counters")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === expected)
  }
}
