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

  test("recoverDir resolves every compaction crash window") {
    import spark.implicits._
    def freshLog(): (String, Seq[String]) = {
      val dir = java.nio.file.Files.createTempDirectory("graft-recover").toString + "/log"
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
        .write.parquet(dir)
      (dir, spark.read.parquet(dir).collect().map(_.toString).sorted.toSeq)
    }
    def rows(dir: String) =
      spark.read.parquet(dir).collect().map(_.toString).sorted.toSeq

    // window 1: crash during the tmp write — partial tmp left, dir intact
    val (d1, want1) = freshLog()
    new java.io.File(d1 + ".compacted").mkdirs() // partial, unreadable
    Compaction.recoverDir(d1)
    assert(!new java.io.File(d1 + ".compacted").exists())
    assert(rows(d1) === want1)

    // window 2: crash between the renames — dir ABSENT, original under
    // .pre-compaction, complete tmp present → roll back
    val (d2, want2) = freshLog()
    java.nio.file.Files.move(
      java.nio.file.Paths.get(d2), java.nio.file.Paths.get(d2 + ".pre-compaction"))
    new java.io.File(d2 + ".compacted").mkdirs()
    Compaction.recoverDir(d2)
    assert(rows(d2) === want2, "original content must be rolled back into place")
    assert(!new java.io.File(d2 + ".pre-compaction").exists())
    assert(!new java.io.File(d2 + ".compacted").exists())
    // a compaction after recovery converges normally
    val (b2, a2) = Compaction.compactDir(spark, d2, Nil)
    assert(b2 >= a2 && rows(d2) === want2)

    // window 3: crash after the swap, before cleanup — stale
    // .pre-compaction next to the live dir → roll forward
    val (d3, want3) = freshLog()
    val pre3 = new java.io.File(d3 + ".pre-compaction")
    pre3.mkdirs()
    Compaction.recoverDir(d3)
    assert(!pre3.exists())
    assert(rows(d3) === want3)

    // recovery is idempotent on a healthy directory
    Compaction.recoverDir(d3)
    assert(rows(d3) === want3)
  }
}
