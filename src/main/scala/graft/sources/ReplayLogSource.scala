package graft.sources

import java.util
import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DSv2 micro-batch source modeling the reference's Pub/Sub subscribe
  * protocol (SURVEY §2.1 S1-S3) as a first-class Spark connector:
  *
  *   - **offsets are replay ids** (reference `ConsumerEvent.replay_id`,
  *     `app/sfproto/pubsub_api_pb2.py:27`): the checkpoint persists the
  *     replay position exactly like the reference's `listener_offsets` row,
  *     and restart resumes from the committed replay id (S3 "stored").
  *   - **credit-based flow control** (S2, reference `num_requested`
  *     `app/services/sf_pubsub.py:565,607`): `maxEventsPerTrigger` caps how
  *     far `latestOffset` advances per micro-batch.
  *   - **replay presets** (S3, `ReplayPreset` LATEST/EARLIEST/CUSTOM
  *     `app/services/sf_pubsub.py:848-894`): option `startingReplay` =
  *     `earliest` | `latest` | a numeric replay id. With
  *     `validateReplay=true` a CUSTOM id outside the stream's range fails
  *     subscription with the INVALID_ARGUMENT shape the reference triages
  *     (`app/services/sf_pubsub.py:462-486`) — see [[graft.cdc.Recovery]]
  *     for the composed clear-and-restart flow (K3).
  *
  * The backing store is a JSON-lines changelog file (one decoded change
  * event per line) readable from any executor — the harness stand-in for
  * the remote gRPC feed. Replay ids are Long line numbers. IO is indexed:
  * [[ReplayLogIndex]] keeps a per-file stride index (byte offset of every
  * 1024th line) built by scanning only *appended* bytes, so
  * `latestOffset`/`reportLatestOffset` never re-read the file, and each
  * partition reader seeks to the checkpoint at/below its slice and skips at
  * most `Stride` lines instead of re-reading the whole prefix — per-reader
  * work is O(slice + Stride), not O(file).
  *
  * Usage:
  * {{{
  *   spark.readStream.format(classOf[ReplayLogSourceProvider].getName)
  *     .option("path", log).option("maxEventsPerTrigger", 100)
  *     .option("startingReplay", "earliest").load()
  * }}}
  */
class ReplayLogSourceProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ReplayLogSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ReplayLogTable(new CaseInsensitiveStringMap(properties))
}

object ReplayLogSource {
  /** Decoded change-event schema (§1.3): header fields + flash payload. */
  val schema: StructType = StructType(Seq(
    StructField("replay_id", LongType),
    StructField("entity", StringType),
    StructField("change_type", StringType),
    StructField("record_ids", ArrayType(StringType)),
    StructField("commit_raw", LongType),
    StructField("flash_raw", StringType)))

  /** Total events in the log (indexed — reads only appended bytes). */
  def countLines(path: String): Long = ReplayLogIndex.lines(path)
}

/** Driver-side incremental line index per log file: total line count plus
  * the byte offset of every `Stride`-th line. Each snapshot scans only the
  * bytes appended since the last one, so repeated `latestOffset` polls are
  * a stat + delta scan, and planned partitions carry a (seekLine, seekByte)
  * checkpoint for their readers. A trailing line without a newline counts
  * as a line (matching `Source.getLines`); index memory is 8 bytes per
  * `Stride` lines — ~8 MB per billion events.
  */
object ReplayLogIndex {
  val Stride: Long = 1024L

  private final class State {
    var scannedBytes = 0L
    var fullLines = 0L // newline-terminated lines seen so far
    var lastByteIsNewline = true
    val checkpoints = scala.collection.mutable.ArrayBuffer[Long](0L)
  }
  private val states = new java.util.concurrent.ConcurrentHashMap[String, State]()

  /** (total lines, checkpoint byte offsets: entry k = offset of line k·Stride). */
  def snapshot(path: String): (Long, IndexedSeq[Long]) = {
    val st = states.computeIfAbsent(path, _ => new State)
    st.synchronized {
      val f = new java.io.File(path)
      val len = if (f.exists()) f.length() else 0L
      if (len < st.scannedBytes) { // truncated/replaced → rebuild
        st.scannedBytes = 0L; st.fullLines = 0L; st.lastByteIsNewline = true
        st.checkpoints.clear(); st.checkpoints += 0L
      }
      if (len > st.scannedBytes) {
        val in = new java.io.FileInputStream(path)
        try {
          in.getChannel.position(st.scannedBytes)
          val buf = new Array[Byte](1 << 16)
          var pos = st.scannedBytes
          var n = in.read(buf)
          while (n > 0 && pos < len) {
            val lim = math.min(n.toLong, len - pos).toInt
            var i = 0
            while (i < lim) {
              if (buf(i) == '\n') {
                st.fullLines += 1
                if (st.fullLines % Stride == 0L) st.checkpoints += pos + i + 1
                st.lastByteIsNewline = true
              } else st.lastByteIsNewline = false
              i += 1
            }
            pos += lim
            n = if (pos < len) in.read(buf) else 0
          }
          st.scannedBytes = len
        } finally in.close()
      }
      val total = st.fullLines + (if (st.scannedBytes > 0 && !st.lastByteIsNewline) 1L else 0L)
      (total, st.checkpoints.toIndexedSeq)
    }
  }

  def lines(path: String): Long = snapshot(path)._1

  /** Greatest indexed line ≤ `line`, as (seekLine, seekByte). */
  def seekFor(path: String, line: Long): (Long, Long) = {
    val (_, cps) = snapshot(path)
    val k = math.min(line / Stride, (cps.size - 1).toLong).toInt
    (k * Stride, cps(k))
  }
}

class ReplayLogTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = s"replaylog(${options.get("path")})"
  override def schema(): StructType = ReplayLogSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new ReplayLogScanBuilder(opts)
}

/** Batch-scan builder with replay-id range pushdown and column pruning:
  * comparison predicates on `replay_id` (the line number, so the mapping
  * is exact) collapse into a [lo, hi) scan range that
  * [[ReplayLogStream.splitRange]] plans directly — the readers seek via
  * the stride index and never touch the rest of the file, and Spark drops
  * the handled predicates instead of re-applying them. Everything else
  * stays a post-scan filter. An unsatisfiable range plans zero
  * partitions. Pruned columns never materialize: the reader builds rows
  * with exactly the requested fields (a 2-column projection decodes 2
  * fields per event, not 6).
  */
class ReplayLogScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder
    with org.apache.spark.sql.connector.read.SupportsPushDownFilters
    with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns {
  import org.apache.spark.sql.sources._

  private var lo = 0L
  private var hi = Long.MaxValue
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = ReplayLogSource.schema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (handled, rest) = filters.partition {
      case EqualTo("replay_id", _: Number) => true
      case GreaterThan("replay_id", _: Number) => true
      case GreaterThanOrEqual("replay_id", _: Number) => true
      case LessThan("replay_id", _: Number) => true
      case LessThanOrEqual("replay_id", _: Number) => true
      case _ => false
    }
    handled.foreach {
      case EqualTo(_, v: Number) =>
        lo = math.max(lo, v.longValue); hi = math.min(hi, v.longValue + 1)
      case GreaterThan(_, v: Number) => lo = math.max(lo, v.longValue + 1)
      case GreaterThanOrEqual(_, v: Number) => lo = math.max(lo, v.longValue)
      case LessThan(_, v: Number) => hi = math.min(hi, v.longValue)
      case LessThanOrEqual(_, v: Number) => hi = math.min(hi, v.longValue + 1)
      case _ => ()
    }
    pushed = handled
    rest
  }

  override def pushedFilters(): Array[Filter] = pushed
  override def build(): Scan = new ReplayLogScan(options, lo, hi, required)
}

/** Offset = the replay id of the next unread event (0-based line number). */
case class ReplayOffset(replay: Long) extends Offset {
  override def json(): String = s"""{"replay":$replay}"""
}

class ReplayLogScan(options: CaseInsensitiveStringMap,
    lo: Long = 0L, hi: Long = Long.MaxValue,
    required: StructType = ReplayLogSource.schema) extends Scan {
  private val path = options.get("path")
  override def readSchema(): StructType = required
  override def description(): String =
    s"ReplayLogScan($path, replay∈[$lo,${if (hi == Long.MaxValue) "∞" else hi}), " +
      s"cols=[${required.fieldNames.mkString(",")}])"

  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] = {
      val end = math.min(hi, ReplayLogSource.countLines(path))
      ReplayLogStream.splitRange(path, math.max(0L, lo), end, 4)
    }
    override def createReaderFactory(): PartitionReaderFactory =
      new ReplayLogReaderFactory(required)
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new ReplayLogStream(path, options, required)
}

class ReplayLogStream(path: String, options: CaseInsensitiveStringMap,
    required: StructType = ReplayLogSource.schema)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {
  private val credit: Long =
    Option(options.get("maxEventsPerTrigger")).map(_.toLong).getOrElse(100L)
  // AvailableNow: the end-of-input target captured at query start.
  @volatile private var target: Long = -1L

  override def initialOffset(): Offset =
    Option(options.get("startingReplay")).getOrElse("earliest") match {
      case "earliest" => ReplayOffset(0L)
      case "latest"   => ReplayOffset(ReplayLogSource.countLines(path))
      case custom     => // CUSTOM replay id
        val replay = custom.toLong
        // validateReplay: model the server rejecting an expired/garbage
        // replay id at subscribe (INVALID_ARGUMENT, reference
        // sf_pubsub.py:462-486). Default off = the lenient past-end clamp.
        if (options.getBoolean("validateReplay", false)) {
          val avail = ReplayLogSource.countLines(path)
          if (replay < 0L || replay > avail)
            throw new IllegalArgumentException(
              s"INVALID_ARGUMENT: requested replay id $replay is not valid for this stream " +
                s"(valid range 0..$avail) — the stored replay id may have expired")
        }
        ReplayOffset(replay)
    }

  override def prepareForTriggerAvailableNow(): Unit =
    target = ReplayLogSource.countLines(path)

  /** The credit (`num_requested` analog) surfaces as the default read
    * limit; the engine hands it back per micro-batch.
    */
  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(credit)

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val avail = if (target >= 0L) target else ReplayLogSource.countLines(path)
    val s = start.asInstanceOf[ReplayOffset].replay
    val max = limit match {
      case r: ReadMaxRows => r.maxRows()
      case _              => credit
    }
    // clamp to ≥ start: a CUSTOM replay id past the end of the log must
    // yield an empty batch, not an end offset before the start.
    ReplayOffset(math.max(s, math.min(avail, s + max)))
  }

  override def reportLatestOffset(): Offset =
    ReplayOffset(ReplayLogSource.countLines(path))

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "ReplayLogStream uses SupportsAdmissionControl.latestOffset(start, limit)")

  override def commit(end: Offset): Unit = () // checkpoint log is the ledger

  override def deserializeOffset(json: String): Offset =
    ReplayOffset(new ObjectMapper().readTree(json).get("replay").asLong())

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    ReplayLogStream.splitRange(path,
      start.asInstanceOf[ReplayOffset].replay,
      end.asInstanceOf[ReplayOffset].replay, 2)

  override def createReaderFactory(): PartitionReaderFactory =
    new ReplayLogReaderFactory(required)
  override def stop(): Unit = ()
}

object ReplayLogStream {
  def splitRange(path: String, start: Long, end: Long, parts: Int): Array[InputPartition] = {
    val n = math.max(0L, end - start)
    if (n == 0) return Array.empty
    val per = math.max(1L, (n + parts - 1) / parts)
    (start until end by per).map { s =>
      val (seekLine, seekByte) = ReplayLogIndex.seekFor(path, s)
      ReplayLogPartition(path, s, math.min(end, s + per), seekLine, seekByte): InputPartition
    }.toArray
  }
}

/** A slice of replay ids plus the index checkpoint its reader seeks to:
  * `seekByte` is the byte offset of line `seekLine`, the greatest indexed
  * line ≤ `start` — the reader skips ≤ Stride lines from there.
  */
case class ReplayLogPartition(path: String, start: Long, end: Long,
    seekLine: Long, seekByte: Long) extends InputPartition

class ReplayLogReaderFactory(required: StructType = ReplayLogSource.schema)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[ReplayLogPartition]
    new PartitionReader[InternalRow] {
      private val mapper = new ObjectMapper()
      private val fields = required.fieldNames
      private val in = new java.io.FileInputStream(p.path)
      in.getChannel.position(p.seekByte)
      private val reader = new java.io.BufferedReader(
        new java.io.InputStreamReader(in, java.nio.charset.StandardCharsets.UTF_8))
      private var lineNo: Long = {
        var l = p.seekLine
        while (l < p.start && reader.readLine() != null) l += 1
        l
      }
      private var row: InternalRow = _

      override def next(): Boolean = {
        if (lineNo >= p.end) return false
        val txt = reader.readLine()
        if (txt == null) return false
        row = parse(txt, lineNo)
        lineNo += 1
        true
      }

      // materializes ONLY the pruned columns, in the requested order
      private def parse(txt: String, replay: Long): InternalRow = {
        val node = mapper.readTree(txt)
        new GenericInternalRow(fields.map[Any] {
          case "replay_id" => replay
          case "entity" => UTF8String.fromString(node.get("entity").asText())
          case "change_type" => UTF8String.fromString(node.get("change_type").asText())
          case "record_ids" =>
            val ids = Option(node.get("record_ids")).map { arr =>
              (0 until arr.size()).map(i => UTF8String.fromString(arr.get(i).asText()))
            }.getOrElse(Seq.empty)
            new GenericArrayData(ids.toArray[Any])
          case "commit_raw" =>
            if (node.hasNonNull("commit_raw")) node.get("commit_raw").asLong() else null
          case "flash_raw" =>
            if (node.hasNonNull("flash_raw")) UTF8String.fromString(node.get("flash_raw").asText()) else null
          case other => throw new IllegalArgumentException(s"unknown column $other")
        })
      }

      override def get(): InternalRow = row
      override def close(): Unit = reader.close()
    }
  }
}
