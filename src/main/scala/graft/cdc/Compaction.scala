package graft.cdc

import org.apache.spark.sql.SparkSession

/** Delivery-log compaction — the operational answer to the small-files
  * problem every streaming parquet sink produces: each micro-batch
  * appends its own files, and after days of 1-second epochs a 100 TB log
  * is millions of KB-sized files whose open/footer cost dominates reads.
  * Compaction rewrites the log with the same `entity` partitioning but
  * `maxRecordsPerFile`-bounded files, then swaps directories.
  *
  * The swap is rename-based (not crash-atomic): a reader racing the swap
  * can observe the old or new directory, and a crash inside the swap
  * window leaves a state that [[recoverDir]] resolves mechanically
  * (rollback to the original if the swap didn't complete, cleanup if it
  * did) — run at every compaction entry and at ingest-loop startup. The
  * transactional upgrade is a table format (Delta/Iceberg) or a metastore
  * pointer flip; this operator keeps the data layout mechanics honest
  * without those dependencies. Content is preserved row-for-row (asserted
  * in CompactionSpec); only file boundaries change.
  */
object Compaction {

  /** Rewrite `dir` (an entity-partitioned delivery log) with at most
    * `maxRecordsPerFile` rows per file and one write task per output
    * split. Returns (files before, files after), counting data files.
    */
  def compactDeliveryLog(spark: SparkSession, dir: String,
      maxRecordsPerFile: Long = 1L << 20): (Long, Long) =
    compactDir(spark, dir, Seq("entity"), Seq("entity"), maxRecordsPerFile)

  /** Recover `dir` from a compaction that crashed mid-swap — idempotent,
    * call before reading or re-compacting a directory that a possibly-
    * interrupted compaction owns. The swap is two renames with three
    * crash windows, each of which this resolves:
    *   - crash during the tmp write: `dir` intact, a partial
    *     `<dir>.compacted` left behind → delete the tmp.
    *   - crash between the renames: `dir` ABSENT, `<dir>.pre-compaction`
    *     holds the original → roll BACK (move it into place) and delete
    *     the tmp. Rolling back is always correct because compaction
    *     preserves content — re-running it later converges to the same
    *     state; rolling forward would require trusting a tmp whose write
    *     completion we can't prove here.
    *   - crash after the second rename: `dir` is the compacted output,
    *     the stale `.pre-compaction` remains → delete it (roll forward).
    */
  def recoverDir(dir: String): Unit = {
    val d = new java.io.File(dir)
    val pre = new java.io.File(dir + ".pre-compaction")
    val tmp = new java.io.File(dir + ".compacted")
    if (!d.exists() && pre.exists())
      java.nio.file.Files.move(pre.toPath, d.toPath)
    else if (d.exists() && pre.exists())
      org.apache.commons.io.FileUtils.deleteDirectory(pre)
    if (tmp.exists())
      org.apache.commons.io.FileUtils.deleteDirectory(tmp)
  }

  /** Replace `dir` with freshly-built content through the rename swap:
    * run `build` against a sibling tmp path (the old directory stays
    * readable throughout), then two renames put the result in place.
    * Every crash window resolves mechanically via [[recoverDir]] (run
    * here on entry, and by any reader that owns the directory at
    * startup): a crash during the build leaves `dir` untouched, between
    * the renames rolls BACK to the original, after the second rename
    * rolls forward. Rollback is correct for any builder whose re-run
    * converges (compaction trivially; an index REBUILD too — the old
    * generation stays valid, the rebuild is just repaid later). Using
    * one swap at the PARENT level is what makes a multi-table artifact
    * (e.g. a PQ index's codebooks/ + codes/) change generation
    * atomically — swapping the tables one by one could crash into a
    * MIXED generation, which for codes encoded against a different
    * codebook reads wrong, not stale.
    */
  def swapDir(dir: String)(build: String => Unit): Unit = {
    recoverDir(dir)
    val tmp = dir + ".compacted"
    build(tmp)
    val old = dir + ".pre-compaction"
    val dirPath = java.nio.file.Paths.get(dir)
    // create-or-replace: on a bootstrap build there is no old generation
    // to step aside (a crash before the move just leaves a tmp that
    // recoverDir deletes — re-running converges, as always)
    if (new java.io.File(dir).exists())
      java.nio.file.Files.move(dirPath, java.nio.file.Paths.get(old))
    java.nio.file.Files.move(java.nio.file.Paths.get(tmp), dirPath)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(old))
  }

  /** Generic append-log compaction: rewrite the parquet directory `dir`
    * hash-clustered by `clusterCols` (restoring the locality layout an
    * `append`-mode writer erodes — new files never co-group with old
    * ones), `partitionBy(partitionCols)` when given, then swap. The same
    * rename-based mechanics and caveats as [[compactDeliveryLog]];
    * content preserved row-for-row, only file boundaries change — unless
    * `dedupRows` is set, which collapses EXACT duplicate rows during the
    * rewrite (only valid when the table's rows are a deterministic
    * function of their keys, so a duplicate can only be a replayed
    * append — the LSH-index tables' contract).
    *
    * Every entry first runs [[recoverDir]], so a directory orphaned by a
    * crashed earlier compaction heals on the next attempt; a long-running
    * loop that schedules compaction ([[graft.llm.StreamingIngest]]) also
    * runs recovery at startup so a probe never reads a half-swapped
    * directory.
    */
  def compactDir(spark: SparkSession, dir: String,
      clusterCols: Seq[String], partitionCols: Seq[String] = Nil,
      maxRecordsPerFile: Long = 1L << 20,
      dedupRows: Boolean = false): (Long, Long) = {
    recoverDir(dir)
    def dataFiles(d: java.io.File): Seq[java.io.File] =
      if (!d.exists()) Seq.empty
      else d.listFiles().toSeq.flatMap {
        case f if f.isDirectory => dataFiles(f)
        case f if f.getName.endsWith(".parquet") => Seq(f)
        case _ => Seq.empty
      }
    val before = dataFiles(new java.io.File(dir)).size.toLong

    swapDir(dir) { tmp =>
      val read0 = spark.read.parquet(dir)
      val read = if (dedupRows) read0.distinct() else read0
      val clustered =
        if (clusterCols.nonEmpty)
          read.repartition(clusterCols.map(org.apache.spark.sql.functions.col): _*)
        else read.coalesce(spark.sparkContext.defaultParallelism)
      val writer = clustered.write.mode("overwrite")
        .option("maxRecordsPerFile", maxRecordsPerFile)
      (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer)
        .parquet(tmp)
    }

    (before, dataFiles(new java.io.File(dir)).size.toLong)
  }
}
