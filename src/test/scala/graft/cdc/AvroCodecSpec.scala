package graft.cdc

import graft.SparkSpec
import graft.cdc.ops.Route
import org.apache.spark.sql.functions._

/** P1/S4: Avro binary decode against a registry with schema evolution,
  * composed with the CDC route.
  */
class AvroCodecSpec extends SparkSpec {
  import spark.implicits._

  private val registry = Map(
    "v1" -> AvroCodec.SchemaV1Json,
    "v2" -> AvroCodec.SchemaV2Json)

  private def fixture = Seq(
    (1L, "v1", AvroCodec.encode(AvroCodec.SchemaV1Json, "Account", "UPDATE",
      Seq("r1", "r2"), Some(1704067200000L), Some("true"))),
    (2L, "v2", AvroCodec.encode(AvroCodec.SchemaV2Json, "Contact", "CREATE",
      Seq("r3"), Some(1704067200L), Some("no"), Map("source_org" -> "org9"))),
    (3L, "v1", AvroCodec.encode(AvroCodec.SchemaV1Json, "Account", "DELETE",
      Seq.empty, None, None))
  ).toDF("replay_id", "schema_id", "payload")

  test("mixed-schema stream decodes against the registry (cache per partition)") {
    val out = AvroCodec.decode(spark, fixture, registry)
      .orderBy("replay_id").collect()
    assert(out.length === 3)
    assert(out(0).getAs[String]("entity") === "Account")
    assert(out(0).getAs[Seq[String]]("record_ids") === Seq("r1", "r2"))
    assert(out(1).getAs[String]("entity") === "Contact") // v2 writer, v1 reader
    assert(out(2).getAs[Seq[String]]("record_ids") === Seq.empty)
    assert(out(2).isNullAt(out(2).fieldIndex("flash_raw")))
  }

  test("unknown schema_id fails loudly (fatal-config classification)") {
    val bad = Seq((9L, "v9", AvroCodec.encode(AvroCodec.SchemaV1Json,
      "X", "CREATE", Seq("r"), None, None))).toDF("replay_id", "schema_id", "payload")
    val e = intercept[Exception] {
      AvroCodec.decode(spark, bad, registry).collect()
    }
    // walk the wrap chain (Spark wraps task failures) and require the
    // error to NAME the offending id — "some exception occurred" would
    // pass a disjunction like `msg.contains("v9") || cause != null` for
    // any unrelated crash, making the fails-loudly claim untestable
    val chain = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).take(10).toSeq
    assert(chain.exists(c => Option(c.getMessage)
        .exists(m => m.contains("unknown schema_id") && m.contains("v9"))),
      s"failure must name the offending schema id, got: ${e.getMessage}")
  }

  test("permissive mode drops corrupt payloads, keeps the rest (per-event isolation)") {
    val corrupt = Seq((7L, "v1", Array[Byte](1, 2, 3)))
      .toDF("replay_id", "schema_id", "payload")
    val mixed = fixture.unionByName(corrupt)
    val out = AvroCodec.decode(spark, mixed, registry, permissive = true)
    assert(out.count() === 3L) // the 3 good events; corrupt one dropped
    // strict mode fails the batch instead
    intercept[Exception] {
      AvroCodec.decode(spark, mixed, registry).collect()
    }
  }

  test("decode plans as one codegen stage: no object round-trip, no mapPartitions") {
    // repartition keeps ConvertToLocalRelation from pre-evaluating the whole
    // local fixture at optimization time, so the executed plan shows the
    // real distributed shape
    val out = AvroCodec.decode(spark, fixture.repartition(2), registry)
    out.collect() // finalize the adaptive plan before inspecting it
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("SerializeFromObject"), plan)
    assert(!plan.contains("DeserializeToObject"), plan)
    assert(!plan.contains("MapPartitions"), plan)
    // "*(n)" is the WholeStageCodegen marker in AQE's condensed plan print;
    // the decode Project must carry it
    assert(plan.linesIterator.exists(l =>
      l.contains("decode_change_event") && l.trim.startsWith("+- *(")), plan)
  }

  test("interpreted eval parity: codegen and no-codegen paths agree row-for-row") {
    def rows() = AvroCodec.decode(spark, fixture, registry)
      .orderBy("replay_id").collect().map(_.toString).toSeq
    val codegen = rows()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(rows() === codegen)
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("decoded events compose with the route transforms") {
    val routed = AvroCodec.decode(spark, fixture, registry)
      .transform(Route.withCommitMs)
      .transform(Route.nonEmptyIds)
      .transform(Route.fanOut)
      .transform(Route.flashGate)
    val ids = routed.select("record_id").as[String].collect().toSet
    assert(ids === Set("r1", "r2")) // event 2 flash=no, event 3 empty ids
  }
}
