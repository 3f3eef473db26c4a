package graft.rel

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariants of the event-time operators (sessionize, bucketed range
  * join) over the real events table at sf0.001.
  */
class EventOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val GapMs = 6L * 3600 * 1000

  test("sessionize: sessions partition the events and respect the 6h gap rule") {
    val sessions = Relational.queries("q_sessionize")(spark, sf).collect()
    val totalEvents = graft.Tables.events(spark, sf).count()
    assert(sessions.map(_.getAs[Long]("n_events")).sum === totalEvents)
    sessions.foreach { r =>
      assert(r.getAs[Long]("session_start") <= r.getAs[Long]("session_end"))
    }
    // consecutive sessions of a user are separated by more than the gap
    sessions.groupBy(_.getAs[Long]("user_id")).values.foreach { ss =>
      val ordered = ss.sortBy(_.getAs[Long]("session_seq"))
      ordered.zip(ordered.drop(1)).foreach { case (a, b) =>
        assert(b.getAs[Long]("session_start") - a.getAs[Long]("session_end") > GapMs)
      }
    }
  }

  test("typed top-k aggregator agrees row-for-row with the window form") {
    import org.apache.spark.sql.expressions.Window
    val viaAgg = Relational.queries("q_topk_agg")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice").cast("double").desc, col("o_orderkey"))
    val viaWindow = graft.Tables.orders(spark, sf)
      .select(col("o_orderstatus"), col("o_orderkey"),
        col("o_totalprice").cast("double").as("o_totalprice"))
      .withColumn("rnk", row_number().over(w).cast("bigint"))
      .filter(col("rnk") <= 3)
      .select("o_orderstatus", "rnk", "o_orderkey", "o_totalprice")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(viaAgg === viaWindow)
    // exactly min(k, group size) rows per group
    viaAgg.groupBy(_._1).values.foreach(g => assert(g.size <= 3))
  }

  test("range join: one row per window, each containing at least its opener") {
    val out = Relational.queries("q_range_join")(spark, sf).collect()
    val nWindows = graft.Tables.events(spark, sf)
      .filter(col("event_id") % 50 === 0).count()
    assert(out.length.toLong === nWindows)
    out.foreach { r =>
      assert(r.getAs[Long]("n_events") >= 1L) // the opening event itself
    }
  }
}
