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

  // ------------------------------------------------- media payload dedup

  /** Harness fixture for the payload-dedup pair: the media corpus ∪ exact
    * byte copies of every 10th payload (id +70000000) ∪ near copies of
    * every 13th (ONE byte overwritten at offset 10 — byte-level, since
    * payload = UTF-8(text) the oracle mirrors it as a char substitution).
    * Id offsets disjoint from every other injection fixture.
    */
  def payloadDupCorpus(docs: DataFrame): DataFrame =
    media(docs).select("doc_id", "payload")
      .unionByName(docs.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 70000000L).as("doc_id"),
          encode(col("text"), "UTF-8").as("payload")))
      .unionByName(docs.filter(col("doc_id") % 13 === 0)
        .select((col("doc_id") + 80000000L).as("doc_id"),
          encode(concat(substring(col("text"), 1, 10), lit("x"),
            expr("substr(text, 12)")), "UTF-8").as("payload")))

  /** Exact media dedup — the FIRST multimodal operation of a training-data
    * pipeline: group by the payload's content hash, keep the lowest id.
    * [[graft.llm.LlmOps.dedupExact]] over bytes instead of text: one
    * map-side-combinable groupBy on a 32-hex key, the payload itself never
    * crosses the shuffle — the only shape that stands at 100 TB of media.
    */
  def payloadDedup(docs: DataFrame): DataFrame =
    payloadDupCorpus(docs)
      .groupBy(md5(col("payload")).as("payload_hash"))
      .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("n_copies"))
      .select("keeper_id", "n_copies", "payload_hash")

  /** SimHash width for [[payloadNearDedup]] — wider than the 16-bit text
    * simhash: byte-gram sets of same-domain media correlate heavily, and
    * at 16 bits random pairs pile up at low Hamming distance (measured:
    * hundreds of distance-0 collisions on the sf0.01 fixture); at 32 the
    * distance distribution separates cleanly.
    */
  val PayloadSimBits   = 32
  /** Blocking chunks: 4 × 8 bits, so any pair within Hamming distance
    * [[PayloadMaxHamming]] (= 3) agrees on ≥1 whole chunk — pigeonhole —
    * and blocking recall is 1.0 by construction.
    */
  val PayloadSimChunks = 4
  val PayloadMaxHamming = 3

  /** Make `payload_simhash` resolvable on any session: no-op when
    * GraftExtensions already registered the native expression; otherwise a
    * value-identical UDF fallback (no codegen, but correct).
    */
  def ensurePayloadSimHash(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    if (!s.catalog.functionExists("payload_simhash"))
      s.udf.register("payload_simhash", (payload: Array[Byte]) =>
        if (payload == null) null
        else java.lang.Long.valueOf(graft.functions.PayloadSimHash.simhash(payload)))
    df
  }

  /** Near-dup detection over binary payloads — simhash over byte 4-grams:
    * slide a 4-byte (stride one) window, hash each distinct gram (as its
    * uppercase-hex string through the 56-bit md5 prefix), per-bit ±1
    * votes → 32-bit simhash; candidate pairs agree on ≥1 of 4 8-bit
    * simhash chunks (the banded-LSH idea of
    * [[graft.llm.LlmOps.dedupMinHash]] applied to Hamming space), verified
    * by `bit_count(xor) ≤ 3`. Catches re-encodes/retouches that change a
    * few bytes — exactly what [[payloadDedup]]'s exact hash misses. The
    * whole signature derives inside the scan's codegen stage via the fused
    * [[graft.functions.PayloadSimHash]] expression (one pass per payload —
    * the SQL form exploded ~one gram row per payload byte and funneled
    * them through a 32-aggregate groupBy; at 100 TB that shuffle is the
    * corpus, the fused form shuffles one long per document). The self-join
    * runs on chunk buckets only (256 values per chunk — candidate mass is
    * bounded by near-dup density plus the chunk collision rate, never
    * all-pairs).
    */
  def payloadNearDedup(docs: DataFrame,
      maxHamming: Int = PayloadMaxHamming): DataFrame = {
    val chunkBits = PayloadSimBits / PayloadSimChunks
    // persisted: both sides of the chunk self-join read it (the
    // minHashCandidates band-table discipline)
    val sims = ensurePayloadSimHash(payloadDupCorpus(docs))
      .select(col("doc_id"), expr("payload_simhash(payload)").as("simhash"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val chunks = sims.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until PayloadSimChunks).map(c =>
        expr(s"(simhash div ${1L << (c * chunkBits)}) % ${1L << chunkBits}")): _*))
        .as(Seq("chunk_idx", "chunk_val")))
    chunks.as("x").join(chunks.as("y"),
        col("x.chunk_idx") === col("y.chunk_idx") &&
          col("x.chunk_val") === col("y.chunk_val") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"),
        col("x.simhash").as("sh_a"), col("y.simhash").as("sh_b"))
      .distinct()
      .withColumn("hamming", expr("bit_count(sh_a ^ sh_b)").cast("bigint"))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** Terminal media dedup — the [[graft.llm.LlmOps.dedupApply]] step over
    * payload pairs: exact byte copies pair at Hamming 0 (identical bytes →
    * identical simhash), so [[payloadNearDedup]]'s pair set subsumes
    * [[payloadDedup]]'s groups; connected components collapse transitive
    * copy chains and the cluster-min keeper survives. Output is (doc_id,
    * n_bytes) — identity plus a size witness, the payload itself never
    * enters the compare. Same scale shape as the text pipeline: chunk-
    * bucketed pair generation, adaptive CC, one anti-join.
    */
  def payloadDedupApply(docs: DataFrame): DataFrame =
    graft.llm.LlmOps.dedupApply(
        payloadDupCorpus(docs),
        payloadNearDedup(docs).select("id_a", "id_b"))
      .select(col("doc_id"),
        octet_length(col("payload")).cast("bigint").as("n_bytes"))

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
