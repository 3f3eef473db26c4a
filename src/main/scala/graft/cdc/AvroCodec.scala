package graft.cdc

import java.io.ByteArrayOutputStream
import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** P1/S4 — Avro binary decode against a dynamic schema registry, the heart
  * of the reference's event decoding (`AvroDecoder`,
  * `app/services/sf_pubsub.py:308-330`): each event carries a `schema_id`;
  * the schema JSON is resolved from a registry and **memoized per
  * decoder** (the `_schema_cache` analog), so a mixed-schema stream decodes
  * without per-event registry hits.
  *
  * Decode runs as a typed `mapPartitions` stage: one decoder cache per
  * partition, no driver round-trips — on a 1000-executor cluster each task
  * materializes only the schemas its partition actually sees. (The
  * spark-avro `from_avro` connector is the plan-time alternative when every
  * event shares one schema; this path handles the registry/evolution case.)
  */
object AvroCodec {

  /** The change-event Avro schema (v1) mirroring §1.3. */
  val SchemaV1Json: String =
    """{"type":"record","name":"ChangeEvent","fields":[
      |{"name":"entity","type":"string"},
      |{"name":"change_type","type":"string"},
      |{"name":"record_ids","type":{"type":"array","items":"string"}},
      |{"name":"commit_raw","type":["null","long"],"default":null},
      |{"name":"flash_raw","type":["null","string"],"default":null}]}""".stripMargin

  /** v2 adds an optional source field with a default — the
    * forward-compatible evolution shape a registry serves.
    */
  val SchemaV2Json: String =
    """{"type":"record","name":"ChangeEvent","fields":[
      |{"name":"entity","type":"string"},
      |{"name":"change_type","type":"string"},
      |{"name":"record_ids","type":{"type":"array","items":"string"}},
      |{"name":"commit_raw","type":["null","long"],"default":null},
      |{"name":"flash_raw","type":["null","string"],"default":null},
      |{"name":"source_org","type":["null","string"],"default":null}]}""".stripMargin

  /** Encode one event with the given writer schema (test/fixture path). */
  def encode(schemaJson: String, entity: String, changeType: String,
      recordIds: Seq[String], commitRaw: Option[Long],
      flashRaw: Option[String], extra: Map[String, String] = Map.empty): Array[Byte] = {
    val schema = new Schema.Parser().parse(schemaJson)
    val rec = new GenericData.Record(schema)
    rec.put("entity", entity)
    rec.put("change_type", changeType)
    rec.put("record_ids", recordIds.asJava)
    commitRaw.foreach(v => rec.put("commit_raw", java.lang.Long.valueOf(v)))
    flashRaw.foreach(v => rec.put("flash_raw", v))
    extra.foreach { case (k, v) => if (schema.getField(k) != null) rec.put(k, v) }
    val out = new ByteArrayOutputStream()
    val enc = EncoderFactory.get().binaryEncoder(out, null)
    new GenericDatumWriter[GenericRecord](schema).write(rec, enc)
    enc.flush()
    out.toByteArray
  }

  case class Decoded(replay_id: Long, schema_id: String, entity: String,
      change_type: String, record_ids: Seq[String],
      commit_raw: Option[Long], flash_raw: Option[String])

  /** Decode (replay_id, schema_id, payload) rows against `registry`
    * (schema_id → writer-schema JSON), reading with `readerSchemaJson` so
    * mixed schema versions normalize to one projection — the reference's
    * fixed header+flash projection makes this safe (SURVEY §1.2).
    */
  /** `permissive = true` reproduces the reference's per-event error
    * isolation (a corrupt payload marks the error and the loop continues,
    * `app/services/sf_pubsub.py:786-788`): undecodable events are dropped.
    * `permissive = false` fails the task — for feeds where corruption must
    * halt the pipeline. An unknown schema_id always fails (config error,
    * not data corruption).
    */
  def decode(spark: SparkSession, events: DataFrame,
      registry: Map[String, String],
      readerSchemaJson: String = SchemaV1Json,
      permissive: Boolean = false): DataFrame = {
    import spark.implicits._
    events.select("replay_id", "schema_id", "payload")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition decoder cache — the reference's _schema_cache
        val readerSchema = new Schema.Parser().parse(readerSchemaJson)
        val readers = mutable.Map.empty[String, GenericDatumReader[GenericRecord]]
        rows.flatMap { case (replay, schemaId, payload) =>
          val reader = readers.getOrElseUpdate(schemaId, {
            val writerJson = registry.getOrElse(schemaId,
              throw new IllegalArgumentException(s"unknown schema_id $schemaId"))
            new GenericDatumReader[GenericRecord](
              new Schema.Parser().parse(writerJson), readerSchema)
          })
          try {
            val rec = reader.read(null, DecoderFactory.get().binaryDecoder(payload, null))
            def optStr(f: String): Option[String] =
              Option(rec.get(f)).map(_.toString)
            Some(Decoded(
              replay, schemaId,
              rec.get("entity").toString,
              rec.get("change_type").toString,
              rec.get("record_ids").asInstanceOf[java.util.List[Object]]
                .asScala.map(_.toString).toSeq,
              Option(rec.get("commit_raw")).map(_.asInstanceOf[Long]),
              optStr("flash_raw")))
          } catch {
            case e: IllegalArgumentException => throw e
            case _: Throwable if permissive  => None
          }
        }
      }
      .toDF()
  }
}
