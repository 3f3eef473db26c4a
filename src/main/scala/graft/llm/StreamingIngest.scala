package graft.llm

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The near-dup ingest gate as a LIVE pipeline — the production
  * steady-state the materialized LSH index exists for, wired end-to-end
  * over Structured Streaming: document batches arrive as files, each
  * micro-batch probes the stored band/signature index
  * ([[LlmOps.incrementalDedupMinHashIndexed]] — base corpus text is never
  * touched), survivors append to the output corpus AND to the index
  * ([[LlmOps.appendMinHashIndex]]), so a near-copy arriving in a LATER
  * batch is caught against a survivor admitted earlier. Delivery and
  * index maintenance run inside `foreachBatch` behind the checkpoint — the
  * same gated-commit discipline as [[graft.cdc.Streaming]]. An epoch that
  * fails mid-write is replayed whole, and every crash point lands
  * consistent: the corpus write is effectively-once (epoch-keyed dynamic
  * partition overwrite — a replayed epoch replaces its own output), and a
  * replay whose index append already committed SELF-CANCELS — the gate
  * sees the batch's own docs in the index (a doc is an exact copy of
  * itself, always over threshold) and drops the whole batch, appending
  * nothing twice. Index duplicates can only arise from a PARTIAL append
  * (signatures committed, bands not); they are output-harmless
  * (candidates and dup sets are distinct-ed) and the next compaction
  * erases them (`dedupRows`) — the loop as a whole is effectively-once
  * at its maintenance cadence.
  *
  * At 100 TB this is the shape that holds: per-batch cost is the batch's
  * own signature derivation plus a narrow columnar probe of the index —
  * flat-ish in corpus size — and each epoch appends files ∝ batch size;
  * nothing ever rewrites or re-reads the admitted corpus. Intra-batch
  * near-dups are deliberately out of scope for the gate (batches are
  * small; compose [[LlmOps.dedupMinHash]] inside the batch when they
  * matter) — exactly the contract of the batch variant.
  */
object StreamingIngest {

  /** Start the gate: `srcDir` is a parquet file-stream of document
    * batches (schema inferred from the files already present),
    * `indexDir` a [[LlmOps.buildMinHashIndex]] artifact, `outDir` the
    * admitted corpus, `ckpDir` the checkpoint. One file per micro-batch
    * (credit-based admission, as the CDC source); AvailableNow drains the
    * backlog then terminates — production swaps the trigger, nothing
    * else. `compactEvery` > 0 folds the index's accumulated append files
    * ([[LlmOps.compactMinHashIndex]]) after every Nth epoch — the
    * maintenance cadence a long-running ingest schedules so probe-file
    * counts stay bounded by the cadence, not the epoch count.
    */
  def start(spark: SparkSession, srcDir: String, indexDir: String,
      outDir: String, ckpDir: String, threshold: Double = 0.6,
      idCol: String = "doc_id", textCol: String = "text",
      compactEvery: Int = 0,
      epochHook: Long => Unit = _ => ()): StreamingQuery = {
    val schema = spark.read.parquet(srcDir).schema
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(srcDir)
      .writeStream
      .option("checkpointLocation", ckpDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, epoch: Long) =>
        // the gate returns canonical doc_id — rename back for the semi join
        val survivors = LlmOps.incrementalDedupMinHashIndexed(
          batch, indexDir, idCol, textCol, threshold)
          .withColumnRenamed("doc_id", idCol)
        val kept = batch.join(survivors, Seq(idCol), "left_semi")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // effectively-once corpus: epoch-keyed dynamic partition overwrite
        // (the cdc.Streaming.startToParquetIdempotent discipline) — a
        // replayed epoch overwrites its own partition instead of
        // re-appending. Set on the BATCH's session: foreachBatch runs the
        // function against a cloned session with isolated conf.
        kept.sparkSession.conf
          .set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        kept.withColumn("epoch", org.apache.spark.sql.functions.lit(epoch))
          .write.mode("overwrite").partitionBy("epoch").parquet(outDir)
        LlmOps.appendMinHashIndex(kept, indexDir, idCol, textCol)
        kept.unpersist()
        // failure-injection seam: runs AFTER both writes, BEFORE the epoch
        // commits — a throw here forces the exact replay the idempotence
        // claims above are about (spec'd in StreamingIngestSpec)
        epochHook(epoch)
        if (compactEvery > 0 && epoch % compactEvery == (compactEvery - 1))
          LlmOps.compactMinHashIndex(spark, indexDir)
        ()
      }
      .start()
  }
}
