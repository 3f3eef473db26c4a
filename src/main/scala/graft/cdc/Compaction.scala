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
  * can observe the old or new directory, and a crash between the two
  * renames leaves the compacted output under `<dir>.compacted` for manual
  * recovery — the transactional upgrade is a table format (Delta/Iceberg)
  * or a metastore pointer flip; this operator keeps the data layout
  * mechanics honest without those dependencies. Content is preserved
  * row-for-row (asserted in CompactionSpec); only file boundaries change.
  */
object Compaction {

  /** Rewrite `dir` (an entity-partitioned delivery log) with at most
    * `maxRecordsPerFile` rows per file and one write task per output
    * split. Returns (files before, files after), counting data files.
    */
  def compactDeliveryLog(spark: SparkSession, dir: String,
      maxRecordsPerFile: Long = 1L << 20): (Long, Long) =
    compactDir(spark, dir, Seq("entity"), Seq("entity"), maxRecordsPerFile)

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
    */
  def compactDir(spark: SparkSession, dir: String,
      clusterCols: Seq[String], partitionCols: Seq[String] = Nil,
      maxRecordsPerFile: Long = 1L << 20,
      dedupRows: Boolean = false): (Long, Long) = {
    def dataFiles(d: java.io.File): Seq[java.io.File] =
      if (!d.exists()) Seq.empty
      else d.listFiles().toSeq.flatMap {
        case f if f.isDirectory => dataFiles(f)
        case f if f.getName.endsWith(".parquet") => Seq(f)
        case _ => Seq.empty
      }
    val before = dataFiles(new java.io.File(dir)).size.toLong

    val tmp = dir + ".compacted"
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

    val old = dir + ".pre-compaction"
    val dirPath = java.nio.file.Paths.get(dir)
    java.nio.file.Files.move(dirPath, java.nio.file.Paths.get(old))
    java.nio.file.Files.move(java.nio.file.Paths.get(tmp), dirPath)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(old))

    (before, dataFiles(new java.io.File(dir)).size.toLong)
  }
}
