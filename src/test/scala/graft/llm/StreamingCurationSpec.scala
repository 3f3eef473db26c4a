package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** The LLM curation pipeline run as Structured Streaming, unchanged: a
  * document stream (continuous crawl ingest) flows through content-hash
  * dedup with cross-micro-batch state (dropDuplicatesWithinWatermark,
  * checkpoint-resumed) into the C4/Gopher quality gate — the same
  * stateless projections the batch path uses. Proves the batch operators
  * ARE the streaming operators for the curation story.
  */
class StreamingCurationSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("ts", TimestampType)))

  private def writeBatch(dir: String, name: String, rows: Seq[(Long, String)]): Unit = {
    val lines = rows.map { case (id, text) =>
      s"""{"doc_id":$id,"text":"$text","ts":"2026-01-01T00:00:00.000Z"}"""
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, name),
      lines.mkString("\n").getBytes)
  }

  test("streaming curation: quality gate + cross-batch content dedup, one pipeline") {
    val src = tmp("graft-curate-src")
    val ckp = tmp("graft-curate-ckp")
    val out = tmp("graft-curate-out")
    val good1 = (1 to 15).map(i => s"alpha$i").mkString(" ")
    val good2 = (1 to 15).map(i => s"beta$i").mkString(" ")
    val good3 = (1 to 15).map(i => s"gamma$i").mkString(" ")

    def runOnce(): Unit = {
      val stream = spark.readStream.schema(schema).json(src)
      val deduped = stream
        .withColumn("content_hash", md5(col("text")))
        .withWatermark("ts", "36500 days")
        .dropDuplicatesWithinWatermark("content_hash")
      val curated = TextAnalysis.qualityFilter(deduped).filter(col("keep"))
      val q = curated.writeStream
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckp)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    // batch 1: two keepers + one quality reject (too short)
    writeBatch(src, "b1.json", Seq(1L -> good1, 2L -> "a b", 3L -> good2))
    runOnce()
    // batch 2: a cross-batch exact dup of doc 1 (must be suppressed by the
    // checkpointed dedup state) + a fresh keeper
    writeBatch(src, "b2.json", Seq(4L -> good1, 5L -> good3))
    runOnce()

    val ids = spark.read.parquet(out).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(ids === Set(1L, 3L, 5L),
      "doc 2 fails the quality gate, doc 4 is a cross-batch duplicate")
  }

  test("streaming ingest composes the near-dup gate per micro-batch (foreachBatch)") {
    // the production ingest shape for NEAR dups: exact dedup runs in-stream
    // (hash state above), but LSH near-dup needs the corpus signature index
    // — so each micro-batch gates through incrementalDedupMinHash against
    // the accumulated base inside foreachBatch, exactly how the batch
    // operator is meant to be composed (base text never re-read per batch
    // beyond its signature derivation; survivors append to the base).
    val src = tmp("graft-neargate-src")
    val ckp = tmp("graft-neargate-ckp")
    val out = tmp("graft-neargate-out")
    val baseDir = tmp("graft-neargate-base")
    val textA = (1 to 30).map(i => s"alpha$i").mkString(" ")
    val textB = (1 to 30).map(i => s"beta$i").mkString(" ")
    import spark.implicits._
    Seq((100L, textA)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(baseDir)

    def runOnce(): Unit = {
      val stream = spark.readStream.schema(schema).json(src)
      val q = stream.writeStream
        .option("checkpointLocation", ckp)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          val base = spark.read.parquet(baseDir)
          val survivors = LlmOps.incrementalDedupMinHash(base,
              batch.select("doc_id", "text"))
            .join(batch.select("doc_id", "text"), Seq("doc_id"))
          survivors.write.mode("append").parquet(out)
          survivors.write.mode("append").parquet(baseDir)
          ()
        }
        .start()
      q.awaitTermination()
    }

    // batch 1: a tail-edited near-copy of the base doc (drop) + fresh (keep)
    writeBatch(src, "b1.json", Seq(
      10L -> (textA + " tiny appended tail"), 11L -> textB))
    runOnce()
    // batch 2: a near-copy of batch 1's survivor — the base grew, so the
    // gate must now drop it too; plus one genuinely fresh doc
    val textC = (1 to 30).map(i => s"delta$i").mkString(" ")
    writeBatch(src, "b2.json", Seq(
      20L -> (textB + " another small tail"), 21L -> textC))
    runOnce()

    val kept = spark.read.parquet(out).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(11L, 21L),
      "near-copies of base (10) and of an earlier survivor (20) must drop")
  }
}
