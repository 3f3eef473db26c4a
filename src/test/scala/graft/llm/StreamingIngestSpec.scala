package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The live near-dup ingest gate end-to-end: micro-batches probe the
  * materialized LSH index, survivors append to corpus AND index, so a
  * near-copy arriving in a LATER micro-batch is dropped against a
  * survivor admitted earlier — the cross-batch property only the index
  * append provides.
  */
class StreamingIngestSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("bigint"))

  private def mk(seed: String) = (1 to 30).map(i => s"$seed$i").mkString(" ")

  test("streamed ingest gate: per-batch probe, survivor append, cross-batch drop") {
    val idx = Files.createTempDirectory("graft-si-idx").toString
    val src = Files.createTempDirectory("graft-si-src").toString
    val out = Files.createTempDirectory("graft-si-out").toString
    val ckp = Files.createTempDirectory("graft-si-ckp").toString

    val base = docs(1L -> mk("alpha"), 2L -> mk("beta"))
    LlmOps.buildMinHashIndex(base, idx)

    // slice 1: a tailed near-copy of BASE doc 1 (drops) + a novel doc
    // slice 2: a tailed near-copy of slice-1's SURVIVOR (drops only if the
    //          gate appended it) + a novel doc
    def writeSlice(name: String, d: org.apache.spark.sql.DataFrame, ts: Long): Unit = {
      val tmp = s"$src/_$name"
      d.coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(src, s"$name.parquet")
      Files.move(part.toPath, dst.toPath)
      dst.setLastModified(ts)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
    val t0 = System.currentTimeMillis() - 60000
    writeSlice("s1", docs(100L -> (mk("alpha") + " tail27"), 101L -> mk("delta")), t0)
    writeSlice("s2", docs(200L -> (mk("delta") + " tail27"), 201L -> mk("omega")), t0 + 30000)

    // compactEvery=2 exercises the in-loop maintenance: epoch 1 (second
    // micro-batch) folds the appended index files before the drain ends
    StreamingIngest.start(spark, src, idx, out, ckp, compactEvery = 2)
      .awaitTermination()

    val admitted = spark.read.parquet(out)
    assert(admitted.columns.toSeq === base.columns.toSeq,
      "admitted corpus keeps the full document schema")
    assert(admitted.select("doc_id").collect().map(_.getLong(0)).toSet
      === Set(101L, 201L),
      "base near-copy and cross-batch near-copy drop; novel docs admitted")
    // the index grew by exactly the survivors, bands stay in lockstep
    val sig = spark.read.parquet(s"$idx/signatures")
    assert(sig.select("doc_id").collect().map(_.getLong(0)).toSet
      === Set(1L, 2L, 101L, 201L))
    assert(spark.read.parquet(s"$idx/bands").count() === sig.count() * LlmOps.Bands)
  }
}
