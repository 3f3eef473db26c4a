package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** End-to-end streaming semantics (SURVEY §5 item 4): checkpointed
  * micro-batch run over events slices, failure-injected sink → replay
  * (at-least-once), checkpoint-resume parity with a cold batch run,
  * terminated-with-error alert capture (K4).
  */
class StreamingSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  /** Two single-file micro-batches of CdcView-shaped events. */
  private def writeSlices(srcDir: String): Unit = {
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
    ev.filter(col("event_id") < 500).coalesce(1).write.parquet(s"$srcDir/s1")
    ev.filter(col("event_id") >= 500).coalesce(1).write.parquet(s"$srcDir/s2")
    // flatten: move part files up so the dir is a flat file source
    val d = new java.io.File(srcDir)
    for (sub <- Seq("s1", "s2"); f <- new java.io.File(d, sub).listFiles()
         if f.getName.endsWith(".parquet")) {
      Files.move(f.toPath, new java.io.File(d, s"$sub.parquet").toPath)
    }
    Seq("s1", "s2").foreach { sub =>
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d, sub))
    }
  }

  test("streamed deliveries == batch deliveries (checkpoint parity)") {
    val src = tmp("graft-src"); val ckp = tmp("graft-ckp"); val out = tmp("graft-out")
    writeSlices(src)
    val spec = Streaming.PipelineSpec("c1", src, ckp)
    val q = Streaming.startToParquet(spark, spec, out)
    q.awaitTermination()
    val streamed = spark.read.parquet(out).drop("client_id")
    val batch = Pipeline.deliveries(CdcView(spark, "/root/testdata/sf0.001"))
    assert(streamed.count() === batch.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("routed streams a TIMESTAMP(MICROS) events generation — ts normalizes like the batch loader") {
    // The driver's current events.parquet stores ts as timestamp[us]. A
    // schema forced to LongType would hand the route RAW MICROS — every
    // commit_ms lands on the seconds scale, the since-filter drops 100%
    // of events, and the stream silently delivers nothing while the
    // batch twin (Tables.load, which normalizes per physical type)
    // delivers everything. routed must read the file's own ts type and
    // apply the same normalization.
    val src = tmp("graft-src-us"); val ckp = tmp("graft-ckp-us"); val out = tmp("graft-out-us")
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .filter(col("event_id") < 500)
    ev.withColumn("ts", expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
      .coalesce(1).write.parquet(s"$src/s1")
    val d = new java.io.File(src)
    for (f <- new java.io.File(d, "s1").listFiles() if f.getName.endsWith(".parquet"))
      Files.move(f.toPath, new java.io.File(d, "s1.parquet").toPath)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d, "s1"))
    // fixture sanity: the written file really is timestamp-typed
    assert(spark.read.parquet(src).schema("ts").dataType
      === org.apache.spark.sql.types.TimestampNTZType)

    val q = Streaming.startToParquet(spark,
      Streaming.PipelineSpec("c1", src, ckp), out)
    q.awaitTermination()
    val streamed = spark.read.parquet(out).drop("client_id")
    val batch = Pipeline.deliveries(CdcView.fromEvents(ev))
    assert(streamed.count() > 0, "a micros-generation source must deliver rows")
    assert(streamed.count() === batch.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      "micros-typed streaming must equal the nanos-Long batch twin row-for-row")
  }

  test("gated commit: failing sink leaves offset uncommitted, batch replays on restart") {
    val src = tmp("graft-src2"); val ckp = tmp("graft-ckp2"); val out = tmp("graft-out2")
    writeSlices(src)
    val spec = Streaming.PipelineSpec("c1", src, ckp)
    val delivered = new java.util.concurrent.atomic.AtomicInteger(0)
    @volatile var failedOnce = false

    // first run: sink throws on the second micro-batch → epoch NOT committed
    val q1 = Streaming.start(spark, spec) { (batch, epoch) =>
      if (epoch >= 1 && !failedOnce) { failedOnce = true; sys.error("webhook down") }
      batch.write.mode("append").parquet(out)
    }
    intercept[Exception] { q1.awaitTermination() }
    assert(failedOnce, "failure was injected")
    val afterFail = spark.read.parquet(out).count()

    // restart from the same checkpoint: ONLY the failed batch replays
    val q2 = Streaming.start(spark, spec) { (batch, _) =>
      delivered.addAndGet(batch.count().toInt)
      batch.write.mode("append").parquet(out)
    }
    q2.awaitTermination()
    val total = spark.read.parquet(out).count()
    val expected = Pipeline.deliveries(CdcView(spark, "/root/testdata/sf0.001")).count()
    // at-least-once: everything delivered; committed batch 0 NOT re-sent
    assert(total === expected)
    assert(delivered.get() === (expected - afterFail))
  }

  test("effectively-once: replayed epoch overwrites its own partial output") {
    val src = tmp("graft-src4"); val ckp = tmp("graft-ckp4"); val out = tmp("graft-out4")
    writeSlices(src)
    val spec = Streaming.PipelineSpec("c1", src, ckp)
    // run 1: epoch 1 writes its files, THEN fails → partial output exists
    @volatile var failedOnce = false
    val q1 = Streaming.start(spark, spec) { (batch, epoch) =>
      batch.sparkSession.conf
        .set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      batch.withColumn("client_id", lit("c1")).withColumn("epoch", lit(epoch))
        .write.mode("overwrite").partitionBy("epoch").parquet(out)
      if (epoch >= 1 && !failedOnce) { failedOnce = true; sys.error("post-write crash") }
    }
    intercept[Exception] { q1.awaitTermination() }
    val afterCrash = spark.read.parquet(out).count()
    // restart: epoch 1 replays and OVERWRITES its partition — no duplicates
    val q2 = Streaming.startToParquetIdempotent(spark, spec, out)
    q2.awaitTermination()
    val streamed = spark.read.parquet(out).drop("client_id", "epoch")
    val batchRun = Pipeline.deliveries(CdcView(spark, "/root/testdata/sf0.001"))
    assert(streamed.count() === batchRun.count(), s"afterCrash=$afterCrash")
    assert(streamed.exceptAll(batchRun).isEmpty && batchRun.exceptAll(streamed).isEmpty)
  }

  test("ingest dedup in the delivery path: cross-batch replayed events delivered once") {
    // The source re-delivers events 400-499 in the second micro-batch —
    // the at-least-once replay the reference leaves to consumers. With
    // spec.dedupe the pipeline suppresses them before the route, so the
    // parquet sink holds each delivery exactly once; without it the
    // duplicates flow through (control, proves the fixture is real).
    // dedupeDelay is made huge so the assertion isolates duplicate
    // suppression from late-row drops (watermark semantics are covered by
    // WindowsSpec).
    val src = tmp("graft-src6"); val out = tmp("graft-out6"); val outDup = tmp("graft-out6d")
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
    ev.filter(col("event_id") < 500).coalesce(1).write.parquet(s"$src/s1")
    ev.filter(col("event_id") >= 400).coalesce(1).write.parquet(s"$src/s2")
    val d = new java.io.File(src)
    for (sub <- Seq("s1", "s2"); f <- new java.io.File(d, sub).listFiles()
         if f.getName.endsWith(".parquet")) {
      Files.move(f.toPath, new java.io.File(d, s"$sub.parquet").toPath)
    }
    Seq("s1", "s2").foreach { sub =>
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d, sub))
    }

    val deduped = Streaming.PipelineSpec("c1", src, tmp("graft-ckp6"),
      dedupe = true, dedupeDelay = "36500 days")
    Streaming.startToParquet(spark, deduped, out).awaitTermination()
    val streamed = spark.read.parquet(out).drop("client_id")
    val batch = Pipeline.deliveries(CdcView(spark, "/root/testdata/sf0.001"))
    assert(streamed.count() === batch.count(), "each replayed event delivered exactly once")
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)

    // control: same source without dedupe delivers the replayed slice twice
    val plain = Streaming.PipelineSpec("c1", src, tmp("graft-ckp6d"))
    Streaming.startToParquet(spark, plain, outDup).awaitTermination()
    val dupCount = spark.read.parquet(outDup).count()
    assert(dupCount > batch.count(),
      "fixture invalid: the overlap slice produced no duplicate deliveries")
  }

  test("K4 alert listener captures terminated-with-error") {
    val src = tmp("graft-src3"); val ckp = tmp("graft-ckp3")
    writeSlices(src)
    val listener = new Streaming.AlertListener
    spark.streams.addListener(listener)
    try {
      val q = Streaming.start(spark, Streaming.PipelineSpec("c1", src, ckp)) {
        (_, _) => sys.error("fatal config")
      }
      intercept[Exception] { q.awaitTermination() }
      // listener events are async — poll briefly
      val deadline = System.currentTimeMillis() + 10000
      while (listener.alerts.isEmpty && System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(!listener.alerts.isEmpty)
      assert(listener.alerts.peek()._2.contains("fatal config"))
    } finally spark.streams.removeListener(listener)
  }

  test("A4 running counters as a live update-mode streaming aggregation") {
    val src = tmp("graft-src5"); val ckp = tmp("graft-ckp5")
    writeSlices(src)
    val routed = Streaming.routed(spark, Streaming.PipelineSpec("c1", src, ckp))
    val q = Streaming.runningCounters(routed)
      .writeStream.outputMode("update")
      .option("checkpointLocation", ckp)
      .format("memory").queryName("counters_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // last update per entity == the batch totals
    val last = spark.sql(
      """SELECT entity, events_received FROM (
        |  SELECT *, row_number() OVER (PARTITION BY entity ORDER BY events_received DESC) rn
        |  FROM counters_out) WHERE rn = 1""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = Streaming.runningCounters(
      Pipeline.deliveries(CdcView(spark, "/root/testdata/sf0.001")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(last === batch)
  }

  test("A4 running counters over the delivery stream (batch form)") {
    val out = Streaming.runningCounters(
      Pipeline.deliveries(CdcView(spark, "/root/testdata/sf0.001")))
    val m = out.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m.values.sum === 327L) // total deliveries at sf0.001
    assert(m.keys.forall(_.nonEmpty))
  }

  test("offset table: upsert overrides matching key, clear nulls replay id") {
    import spark.implicits._
    val offsets = Seq(("c1", "/data/AChangeEvent", "RP1", 100L, 1L),
        ("c2", "/data/BChangeEvent", "RP9", 900L, 1L))
      .toDF("client_id", "topic_name", "last_replay_b64", "last_commit_ms", "updated_at")
    val up = Seq(("c1", "/data/AChangeEvent", "RP5", 500L, 2L))
      .toDF("client_id", "topic_name", "last_replay_b64", "last_commit_ms", "updated_at")
    val merged = Offsets.upsert(offsets, up)
    assert(merged.count() === 2)
    assert(merged.filter($"client_id" === "c1").select("last_replay_b64").as[String].head() === "RP5")
    val cleared = Offsets.clear(merged, "c1", "/data/AChangeEvent")
    assert(cleared.filter($"client_id" === "c1").select("last_replay_b64").head().isNullAt(0))
    assert(cleared.filter($"client_id" === "c2").select("last_replay_b64").as[String].head() === "RP9")
    // A3 latest-per-key picks the newest updated_at
    val hist = offsets.unionByName(up)
    val latest = Offsets.latestPerKey(hist).filter($"client_id" === "c1")
    assert(latest.select("last_replay_b64").as[String].head() === "RP5")
  }
}
