package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The typed Dataset route must agree row-for-row with the untyped column
  * pipeline on the full sf0.001 CdcView — the two API surfaces cannot
  * drift.
  */
class TypedSpec extends SparkSpec {
  import spark.implicits._

  test("typed route == untyped route on the harness corpus") {
    implicit val s = spark
    val view = CdcView(spark, "/root/testdata/sf0.001")
    val typedIn = view.select(
        expr("cast(event_id as bigint)").as("replay_id"),
        col("entity"), col("change_type"), col("record_ids"),
        col("commit_raw").cast("long").as("commit_raw"),
        col("flash_raw"), col("subscription_topic"), col("instance_url"))
      .as[Typed.ChangeEvent]
    val typed = Typed.deliveries(typedIn, CdcView.SinceCutoffMs).toDF()
    val untyped = Pipeline.deliveries(view)
      .select("id", "subscription_topic", "instance_url", "entity", "change_type", "commit_ms")
    assert(typed.count() === untyped.count())
    assert(typed.exceptAll(untyped).isEmpty && untyped.exceptAll(typed).isEmpty)
  }

  test("typed normalizers match the column functions on edge inputs") {
    assert(Typed.commitMs(Some(1704067200L)) === Some(1704067200000L))
    assert(Typed.commitMs(None) === None)
    assert(Typed.boolNorm(Some(" TRUE ")) === Some(true))
    assert(Typed.boolNorm(Some("")) === Some(false))
    assert(Typed.boolNorm(Some("maybe")) === None)
    assert(Typed.boolNorm(None) === None)
  }
}
