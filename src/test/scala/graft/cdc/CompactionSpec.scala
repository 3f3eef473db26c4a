package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Compaction rewrites the many-small-files delivery log into few files,
  * preserving rows, partitioning, and readability.
  */
class CompactionSpec extends SparkSpec {

  test("compaction shrinks the file count and preserves every row") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString + "/log"
    // simulate many tiny epoch appends: 12 writes of a small slice each
    val deliveries = Pipeline.deliveries(spark, "/root/testdata/sf0.001")
    (0 until 12).foreach { i =>
      Streaming.writePartitionedLog(
        deliveries.filter(pmod(col("event_id"), lit(12)) === i), dir)
    }
    val expected = spark.read.parquet(dir).collect()
      .map(_.toString).sorted.toSeq

    val (before, after) = Compaction.compactDeliveryLog(spark, dir)
    assert(before > after, s"expected fewer files, got $before -> $after")

    val got = spark.read.parquet(dir).collect().map(_.toString).sorted.toSeq
    assert(got === expected)
    // entity partitioning survives (partition pruning still works)
    val entities = spark.read.parquet(dir).select("entity").distinct().count()
    assert(new java.io.File(dir).listFiles().count(_.getName.startsWith("entity=")) ===
      entities.toInt)
  }
}
