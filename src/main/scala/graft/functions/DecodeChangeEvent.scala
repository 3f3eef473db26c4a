package graft.functions

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.avro.io.DecoderFactory
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import scala.jdk.CollectionConverters._

/** P1/S4 — registry-backed Avro binary decode as a native Catalyst
  * expression (replaces the round-1 `mapPartitions` stage, which paid a
  * Dataset-encoder round-trip per event — SURVEY §9's named candidate).
  *
  * Decodes `(payload: binary, schema_id: string)` into the change-event
  * struct, resolving the writer schema from the (broadcast-small,
  * task-serialized) registry map and reading with a fixed reader schema so
  * mixed schema versions normalize to one projection — the reference's
  * `AvroDecoder` with its per-decoder `_schema_cache`
  * (`app/services/sf_pubsub.py:308-330`); here the cache is a transient
  * lazy map, one per task-deserialized expression instance.
  *
  * Codegen follows the built-in `from_avro` pattern (a fused call into the
  * expression object, same as spark-avro's `AvroDataToCatalyst`): the
  * surrounding project/filter pipeline stays inside one WholeStageCodegen
  * stage with no SerializeFromObject/DeserializeToObject boundary.
  * `permissive = true` maps a corrupt payload to null (caller filters) —
  * the reference's per-event error isolation (`:786-788`); an unknown
  * schema_id always throws (config error, not data corruption).
  */
case class DecodeChangeEvent(
    payload: Expression,
    schemaId: Expression,
    registry: Map[String, String],
    readerSchemaJson: String,
    permissive: Boolean) extends BinaryExpression {

  override def left: Expression = payload
  override def right: Expression = schemaId
  override def prettyName: String = "decode_change_event"
  override def dataType: DataType = DecodeChangeEvent.schema
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (payload.dataType == BinaryType && schemaId.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"decode_change_event requires (BINARY, STRING), got " +
        s"(${payload.dataType.sql}, ${schemaId.dataType.sql})")

  @transient private lazy val readerSchema = new Schema.Parser().parse(readerSchemaJson)
  @transient private lazy val readers =
    scala.collection.mutable.Map.empty[String, GenericDatumReader[GenericRecord]]

  /** Public so generated code can call it through the referenced object. */
  def decode(payloadBytes: Array[Byte], sid: UTF8String): InternalRow = {
    val reader = readers.getOrElseUpdate(sid.toString, {
      val writerJson = registry.getOrElse(sid.toString,
        throw new IllegalArgumentException(s"unknown schema_id $sid"))
      new GenericDatumReader[GenericRecord](
        new Schema.Parser().parse(writerJson), readerSchema)
    })
    try {
      val rec = reader.read(null, DecoderFactory.get().binaryDecoder(payloadBytes, null))
      val ids = rec.get("record_ids").asInstanceOf[java.util.List[Object]]
        .asScala.map(o => UTF8String.fromString(o.toString)).toArray[Any]
      new GenericInternalRow(Array[Any](
        UTF8String.fromString(rec.get("entity").toString),
        UTF8String.fromString(rec.get("change_type").toString),
        new GenericArrayData(ids),
        rec.get("commit_raw").asInstanceOf[java.lang.Long],
        Option(rec.get("flash_raw")).map(o => UTF8String.fromString(o.toString)).orNull))
    } catch {
      case e: IllegalArgumentException => throw e
      case _: Throwable if permissive  => null
    }
  }

  override def nullSafeEval(payloadAny: Any, schemaIdAny: Any): Any =
    decode(payloadAny.asInstanceOf[Array[Byte]], schemaIdAny.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("decoder", this, classOf[DecodeChangeEvent].getName)
    nullSafeCodeGen(ctx, ev, (p, s) =>
      s"""
         |org.apache.spark.sql.catalyst.InternalRow r = $ref.decode($p, $s);
         |if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r; }
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DecodeChangeEvent =
    copy(payload = newLeft, schemaId = newRight)
}

object DecodeChangeEvent {
  /** The decoded change-event projection (fixed reader shape, SURVEY §1.2). */
  val schema: StructType = StructType(Seq(
    StructField("entity", StringType, nullable = false),
    StructField("change_type", StringType, nullable = false),
    StructField("record_ids", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("commit_raw", LongType, nullable = true),
    StructField("flash_raw", StringType, nullable = true)))

  /** FunctionRegistry builder (registered by
    * [[graft.plans.GraftExtensions]]):
    * `decode_change_event(payload, schema_id, registry_map, reader_schema_json,
    * permissive)`. Config args must be foldable — the same contract as the
    * built-in `from_avro(child, jsonFormatSchema, options)`, whose schema
    * and options are literal at plan time.
    */
  def builder(children: Seq[Expression]): Expression = children match {
    case Seq(p, s, reg, rdr, perm)
        if reg.foldable && rdr.foldable && perm.foldable =>
      val m = reg.eval(InternalRow.empty)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.MapData]
      val keys = m.keyArray.toArray[UTF8String](StringType).map(_.toString)
      val vals = m.valueArray.toArray[UTF8String](StringType).map(_.toString)
      DecodeChangeEvent(p, s, keys.zip(vals).toMap,
        rdr.eval(InternalRow.empty).toString,
        perm.eval(InternalRow.empty).asInstanceOf[Boolean])
    case _ => throw new IllegalArgumentException(
      "decode_change_event(payload, schema_id, registry_map, " +
        "reader_schema_json, permissive) requires 5 args with foldable config")
  }
}
