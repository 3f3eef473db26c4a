package graft.rel

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The union+window as-of join form used by q_asof_join, on a controlled
  * frame: <= tie inclusion, null before the first build row, and the
  * latest-not-any build row winning.
  */
class AsofSpec extends SparkSpec {
  import spark.implicits._

  test("as-of semantics: latest at-or-before build row per probe, else null") {
    // build rows for key 1 at t=10 (v=100) and t=20 (v=200)
    val build = Seq((1L, 10L, 100L), (1L, 20L, 200L)).toDF("k", "t", "bv")
      .withColumn("tag", lit(0))
      .withColumn("pid", lit(null).cast("bigint"))
    // probes: t=5 (before any → null), t=10 (tie → 100), t=15 (→ 100),
    // t=25 (→ 200); key 2 has no build rows at all (→ null)
    val probe = Seq((1L, 5L, 1L), (1L, 10L, 2L), (1L, 15L, 3L), (1L, 25L, 4L),
        (2L, 15L, 5L))
      .toDF("k", "t", "pid")
      .withColumn("tag", lit(1))
      .withColumn("bv", lit(null).cast("bigint"))
    val w = Window.partitionBy(col("k")).orderBy(col("t"), col("tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = probe.unionByName(build)
      .withColumn("asof_bv", last(col("bv"), ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .select("pid", "asof_bv")
      .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
    assert(out === Map(
      1L -> None,        // before the first build row
      2L -> Some(100L),  // exact-t tie: build sorts first → included (<=)
      3L -> Some(100L),
      4L -> Some(200L),
      5L -> None))       // key with no build side
  }
}
