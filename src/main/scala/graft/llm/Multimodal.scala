package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column handling: image/audio/video as opaque `binary`
  * payloads with typed metadata. The container has no media codecs, so the
  * *decode step is a clearly-marked deterministic fake* (see
  * [[decodeStub]]); the Spark-side plumbing — binary columns, metadata
  * schema, per-partition batch iteration, frame-sampling fan-out — is real
  * and oracle-tested where SQL-expressible.
  */
object Multimodal {

  /** Synthesize a media table from `documents`: the UTF-8 bytes of the text
    * stand in for the encoded payload; codec/width/height derive from
    * doc_id. At 100 TB the payload column stays opaque binary — only
    * metadata participates in filters/joins, so scans prune it unless the
    * decode stage is reached.
    */
  def media(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      element_at(array(lit("png"), lit("jpeg"), lit("mp4")),
        (col("doc_id") % 3).cast("int") + 1).as("codec"),
      (lit(64L) + (col("doc_id") % 16) * 8).as("width"),
      (expr("64 + ((doc_id div 16) % 16) * 8")).as("height"),
      col("text"))

  /** Metadata projection: sizes + content checksum, payload pruned. */
  def mediaMeta(docs: DataFrame): DataFrame =
    media(docs).select(
        col("doc_id"), col("codec"), col("width"), col("height"),
        octet_length(col("payload")).cast("bigint").as("n_bytes"),
        md5(col("payload")).as("checksum"))

  /** Frame sampling: each media row fans out to 1+doc_id%4 evenly-spaced
    * "frames"; the frame signature is a deterministic fake (a 12-char
    * window of the payload at the frame offset). The *shape* — generator
    * fan-out with per-frame offsets — is exactly what a real video
    * frame-sampler produces.
    */
  def frameSample(docs: DataFrame): DataFrame =
    media(docs)
      .withColumn("n_frames", (col("doc_id") % 4 + 1).cast("int"))
      .withColumn("step", expr("octet_length(payload) div n_frames"))
      .select(col("doc_id"), col("n_frames"), col("step"), col("text"),
        explode(expr("sequence(0, n_frames - 1)")).as("frame_idx"))
      .select(
        col("doc_id"), col("frame_idx").cast("bigint").as("frame_idx"),
        (col("frame_idx").cast("bigint") * col("step")).as("frame_off"),
        expr("substr(text, frame_idx * step + 1, 12)").as("frame_sig"))

  /** The decode stage: typed per-partition batch iteration over binary
    * payloads — the Scala analog of `mapInPandas`. The actual pixel decode
    * is STUBBED with a deterministic fake (byte-sum "luma" over the first
    * 32 payload bytes); a real deployment swaps only the lambda body for a
    * codec call, keeping schema/partitioning/batch shape identical.
    * Not SQL-expressible → no oracle entry (rows-only check).
    */
  def decodeStub(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    media(docs)
      .select(col("doc_id"), col("payload"), col("width"), col("height"))
      .as[(Long, Array[Byte], Long, Long)]
      .mapPartitions { rows =>
        rows.map { case (id, payload, w, h) =>
          // STUB: stands in for image decode + feature extraction.
          val fakeLuma = payload.take(32).map(_ & 0xff).sum % 256
          (id, fakeLuma, w, h, payload.length.toLong)
        }
      }
      .toDF("doc_id", "fake_luma", "width", "height", "n_bytes")
  }
}
