package graft.rel

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Relational.asofJoin]] — the production union+window as-of operator —
  * on a controlled frame: <= tie inclusion, null before the first build
  * row, and the latest-not-any build row winning. The spec calls the
  * shared helper the q_asof_join query runs, not a re-statement of the
  * technique, so a semantics change in the operator fails here.
  */
class AsofSpec extends SparkSpec {
  import spark.implicits._

  test("as-of semantics: latest at-or-before build row per probe, else null") {
    // build rows for key 1 at t=10 (v=100) and t=20 (v=200)
    val build = Seq((1L, 10L, 100L), (1L, 20L, 200L)).toDF("k", "t", "bv")
    // probes: t=5 (before any → null), t=10 (tie → 100), t=15 (→ 100),
    // t=25 (→ 200); key 2 has no build rows at all (→ null)
    val probe = Seq((1L, 5L, 1L), (1L, 10L, 2L), (1L, 15L, 3L), (1L, 25L, 4L),
        (2L, 15L, 5L))
      .toDF("k", "t", "pid")
    val out = Relational.asofJoin(probe, build, "k", "t")
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
