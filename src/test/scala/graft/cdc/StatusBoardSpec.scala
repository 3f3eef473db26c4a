package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Live per-listener status joined into the J1 shape: running queries show
  * as "running", clients without a listener default to "stopped".
  */
class StatusBoardSpec extends SparkSpec {
  import spark.implicits._

  test("statuses reflects active named listeners; join defaults absent clients to stopped") {
    val src = java.nio.file.Files.createTempDirectory("graft-sb-src").toString
    graft.Tables.events(spark, "/root/testdata/sf0.001")
      .coalesce(1).write.mode("overwrite").parquet(src)
    def startListener(clientId: String) = {
      val ckp = java.nio.file.Files.createTempDirectory(s"graft-sb-ckp-$clientId").toString
      Streaming.routed(spark, Streaming.PipelineSpec(clientId, src, ckp))
        .writeStream.queryName(StatusBoard.queryName(clientId))
        .option("checkpointLocation", ckp)
        .trigger(Trigger.ProcessingTime("500 milliseconds"))
        .format("noop").start()
    }
    val q1 = startListener("c1")
    val q3 = startListener("c3")
    try {
      val live = StatusBoard.statuses(spark)
      val byClient = live.filter(col("client_id").isNotNull)
        .collect().map(r => r.getString(0) -> r.getString(3)).toMap
      assert(byClient.keySet === Set("c1", "c3"))
      assert(byClient.values.forall(_ == "running"))

      val clients = Seq("c1", "c2", "c3", "c4").toDF("client_id")
      val board = StatusBoard.clientStatusBoard(spark, clients)
        .select("client_id", "status", "running")
        .collect().map(r => r.getString(0) -> ((r.getString(1), r.getBoolean(2)))).toMap
      assert(board("c1") === ("running", true))
      assert(board("c3") === ("running", true))
      assert(board("c2") === ("stopped", false))
      assert(board("c4") === ("stopped", false))
    } finally { q1.stop(); q3.stop() }
  }

  test("clients frame with its own status column joins unambiguously, data preserved") {
    // the reference's client rows expose status fields — a clients frame
    // carrying `status` must not make the post-join reference ambiguous
    val clients = Seq(("c1", "active"), ("c2", "suspended"))
      .toDF("client_id", "status")
    val board = StatusBoard.clientStatusBoard(spark, clients)
    val rows = board.select("client_id", "client_status", "status", "running")
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getString(2), r.getBoolean(3)))).toMap
    assert(rows("c1") === ("active", "stopped", false))
    assert(rows("c2") === ("suspended", "stopped", false))
  }

  test("status board over the real clients table keeps the cp_status_left_join shape") {
    val clients = graft.Tables.customer(spark, "/root/testdata/sf0.001")
      .select(concat(lit("c"), col("c_custkey")).as("client_id"), col("c_name"))
    val board = StatusBoard.clientStatusBoard(spark, clients)
    assert(board.columns.toSet ===
      Set("client_id", "c_name", "status", "batch_id", "num_input_rows", "running"))
    // no listeners running → every client defaults to stopped
    assert(board.filter(col("status") =!= "stopped").count() === 0L)
    assert(board.count() === clients.count())
  }
}
