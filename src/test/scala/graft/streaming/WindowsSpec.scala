package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import java.nio.file.Files

/** Watermarked windows + custom keyed state, end-to-end over a file-source
  * stream with controlled micro-batch order.
  */
class WindowsSpec extends SparkSpec {
  import spark.implicits._

  private val DayMs = 86400000L
  private def nanos(dayOfJan2024: Int): Long =
    (1704067200000L + (dayOfJan2024 - 1) * DayMs) * 1000000L

  /** (event_id, ts-nanos, user_id, event_type, value, props) rows. */
  private def row(id: Long, day: Int, user: Long, typ: String, v: Double) =
    (id, nanos(day), user, typ, v, """{"k": 1}""")

  private def writeBatches(dir: String): Unit = {
    // batch A: days 10..20 — establishes watermark at day 18 (delay 2d)
    val batches = Seq(
      Seq(row(1, 10, 1, "click", 1.0), row(2, 15, 1, "click", 2.0),
        row(3, 20, 2, "view", 3.0)),
      // batch B: day 21 — watermark advances to day 19
      Seq(row(5, 21, 1, "view", 5.0)),
      // batch C: a too-late day-5 row (the late-event watermark — which
      // lags the eviction watermark by one batch since SPARK-42376 — is
      // now day 18, so it is dropped) + day 22
      Seq(row(4, 5, 2, "click", 4.0), row(6, 22, 1, "view", 7.0)))
    val d = new java.io.File(dir)
    for ((rows, i) <- batches.zipWithIndex) {
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.parquet(s"$dir/tmp$i")
      val part = new java.io.File(d, s"tmp$i").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(d, s"b$i.parquet")
      Files.move(part.toPath, dst.toPath)
      // explicit mod-times pin micro-batch order (file source sorts by them)
      dst.setLastModified(1000000000000L + i * 60000L)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d, s"tmp$i"))
    }
  }

  private def stream(dir: String) =
    spark.readStream.schema(graft.cdc.Streaming.eventsSchema)
      .option("maxFilesPerTrigger", 1).parquet(dir)

  test("append mode: watermark-closed windows emit once, too-late rows dropped") {
    // watermark after batch A (max day 20, delay 2d) = day 18; final = day 19.
    // Append emits only windows whose end ≤ watermark: day 10 + day 15.
    // The day-5 row in batch B is beyond the watermark → dropped (the
    // guaranteed direction; update mode may still admit it since its state
    // was already evicted). Day 20/21 windows stay open → unemitted.
    val dir = Files.createTempDirectory("graft-win").toString
    writeBatches(dir)
    val q = Windows.tumblingCounts(stream(dir))
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("win_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val out = spark.sql(
      "SELECT date_format(win_start, 'dd') AS d, event_type, n FROM win_out")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out === Map(("10", "click") -> 1L, ("15", "click") -> 1L))
  }

  test("batch twin: same windowed agg without watermark sees all rows") {
    val dir = Files.createTempDirectory("graft-win2").toString
    writeBatches(dir)
    val batch = Windows.tumblingCounts(spark.read
      .schema(graft.cdc.Streaming.eventsSchema).parquet(dir))
    assert(batch.count() === 6L) // batch mode: watermark is a no-op
  }

  test("session windows merge activity bursts and close at the gap") {
    val dir = Files.createTempDirectory("graft-sess").toString
    writeBatches(dir) // user 1 active days 10,15,21,22; user 2 days 20 (+late 5)
    // gap 5d merges days 10+15 into one session ending day 20; delay 1d
    // pushes the final watermark to day 21 so that session closes+emits.
    val q = Windows.sessionCounts(stream(dir), gap = "5 days", delay = "1 day")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("sess_win_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val rows = spark.sql(
      "SELECT user_id, n, date_format(sess_start, 'dd') d FROM sess_win_out")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    // user 1: days 10 and 15 merge into one session; it closes once the
    // watermark passes its end — emitted in append mode. Later sessions
    // (days 20-22) are still open, the day-5 row is too late → dropped.
    assert(rows === Set((1L, 2L, "10")), s"got $rows")
  }

  test("streaming dedup drops replayed event_ids within the watermark") {
    val dir = Files.createTempDirectory("graft-dedup").toString
    // batch 0: events 1,2; batch 1: replay of 2 + new 3 (same event times)
    val batches = Seq(
      Seq(row(1, 10, 1, "click", 1.0), row(2, 11, 1, "click", 2.0)),
      Seq(row(2, 11, 1, "click", 2.0), row(3, 12, 2, "view", 3.0)))
    val d = new java.io.File(dir)
    for ((rows, i) <- batches.zipWithIndex) {
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.parquet(s"$dir/tmp$i")
      val part = new java.io.File(d, s"tmp$i").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(d, s"b$i.parquet")
      Files.move(part.toPath, dst.toPath)
      dst.setLastModified(1000000000000L + i * 60000L)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d, s"tmp$i"))
    }
    val q = Windows.dedupStream(stream(dir))
      .select("event_id")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("dedup_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val ids = spark.sql("SELECT event_id FROM dedup_out")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids === Seq(1L, 2L, 3L)) // the replayed 2 appears exactly once
  }

  test("flatMapGroupsWithState accumulates per-user state across micro-batches") {
    val dir = Files.createTempDirectory("graft-fmgs").toString
    writeBatches(dir)
    val q = Windows.userSessions(spark, stream(dir))
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("sess_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // last emitted summary per user reflects total running state
    val finalRows = spark.sql(
      """SELECT user_id, n, sum_value FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY n DESC) rn
        |  FROM sess_out) WHERE rn = 1""".stripMargin)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(finalRows(1L) === ((4L, 15.0))) // events 1,2,5,6
    assert(finalRows(2L) === ((2L, 7.0)))  // events 3,4 (state has no watermark)
  }
}
