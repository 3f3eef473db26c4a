package graft.cdc

import graft.SparkSpec
import graft.sources.ReplayLogSourceProvider
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files
import scala.collection.mutable

/** K3 end-to-end: a poisoned stored replay id self-heals — classify the
  * INVALID_ARGUMENT subscribe failure, clear the stored offset, restart
  * from EARLIEST, re-deliver.
  */
class RecoverySpec extends SparkSpec {
  import spark.implicits._

  private def writeLog(n: Int): String = {
    val f = Files.createTempFile("graft-recovery-log", ".jsonl")
    val lines = (0 until n).map { i =>
      s"""{"entity":"Account","change_type":"UPDATE","record_ids":["R$i"],"commit_raw":${1704067200L + i},"flash_raw":"true"}"""
    }
    Files.write(f, lines.mkString("\n").getBytes)
    f.toString
  }

  private def offsetsTable(replay: String): DataFrame =
    Seq(("c1", "/data/AccountChangeEvent", replay, 5L, 100L))
      .toDF("client_id", "topic_name", "last_replay_b64", "last_commit_ms", "updated_at")

  test("triage: INVALID_ARGUMENT + replay anywhere in the cause chain") {
    val inner = new IllegalArgumentException(
      "INVALID_ARGUMENT: requested replay id 99 is not valid for this stream")
    assert(Recovery.isInvalidReplay(inner))
    assert(Recovery.isInvalidReplay(new RuntimeException("query failed", inner)))
    assert(!Recovery.isInvalidReplay(new RuntimeException("INVALID_ARGUMENT: bad topic")))
    assert(!Recovery.isInvalidReplay(new RuntimeException("replay looks fine but transport died")))
  }

  test("poisoned stored replay id → clear → restart from earliest → full re-delivery") {
    val log = writeLog(6)
    val offsets = offsetsTable(replay = "99") // far past the 6-event log
    val got = mutable.ArrayBuffer.empty[Long]
    var subscribes = 0
    def subscribe(startingReplay: String) = {
      subscribes += 1
      val ckp = Files.createTempDirectory(s"graft-rec-ckp-$subscribes").toString
      spark.readStream.format(classOf[ReplayLogSourceProvider].getName)
        .option("path", log)
        .option("startingReplay", startingReplay)
        .option("validateReplay", "true")
        .load()
        .writeStream.trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckp)
        .foreachBatch { (b: DataFrame, _: Long) =>
          got ++= b.select("replay_id").collect().map(_.getLong(0)); ()
        }.start()
    }
    val (healed, recovered) =
      Recovery.runWithReplayRecovery(offsets, "c1", "/data/AccountChangeEvent")(subscribe)
    assert(recovered, "the poisoned replay id must trigger recovery")
    assert(subscribes === 2)
    assert(got.sorted.toSeq === (0L until 6L), "restart from EARLIEST re-delivers the stream")
    // the stored offset row survives but its replay id is cleared (K3)
    val row = healed.filter(col("client_id") === "c1").collect()(0)
    assert(row.isNullAt(row.fieldIndex("last_replay_b64")))
  }

  test("valid stored replay id → no recovery, resumes mid-stream") {
    val log = writeLog(6)
    val offsets = offsetsTable(replay = "4")
    val got = mutable.ArrayBuffer.empty[Long]
    def subscribe(startingReplay: String) = {
      val ckp = Files.createTempDirectory("graft-rec2-ckp").toString
      spark.readStream.format(classOf[ReplayLogSourceProvider].getName)
        .option("path", log)
        .option("startingReplay", startingReplay)
        .option("validateReplay", "true")
        .load()
        .writeStream.trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckp)
        .foreachBatch { (b: DataFrame, _: Long) =>
          got ++= b.select("replay_id").collect().map(_.getLong(0)); ()
        }.start()
    }
    val (after, recovered) =
      Recovery.runWithReplayRecovery(offsets, "c1", "/data/AccountChangeEvent")(subscribe)
    assert(!recovered)
    assert(got.sorted.toSeq === Seq(4L, 5L))
    assert(after.filter(col("last_replay_b64").isNotNull).count() === 1L)
  }
}
