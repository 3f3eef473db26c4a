package graft.cdc

import graft.SparkSpec
import graft.cdc.ops.Normalize
import org.apache.spark.sql.functions._

/** P3/P4/P6/P8/P9 scalar semantics vs the reference's helpers
  * (`app/services/sf_pubsub.py:215-227, 691-716`; `app/models.py:26-31`).
  */
class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  private def normOne(v: java.lang.Long): java.lang.Long =
    Seq(Option(v).map(Long.unbox)).toDF("v")
      .select(Normalize.commitMsLong(col("v")).as("r"))
      .collect()(0).getAs[java.lang.Long]("r")

  test("P3 commit-ms heuristic: ns / ms / s / small / null regimes") {
    // > 1e14 → nanoseconds, integer-divided by 1e6
    assert(normOne(1704067200000000000L) === 1704067200000L)
    // > 1e11 → already millis, passthrough
    assert(normOne(1704067200000L) === 1704067200000L)
    // > 1e9 → seconds, × 1000
    assert(normOne(1704067200L) === 1704067200000L)
    // small test value → passthrough (reference keeps it)
    assert(normOne(5L) === 5L)
    assert(normOne(null) === null)
    // exact boundary: 1e14 is NOT > 1e14 → ms branch (passthrough)
    assert(normOne(100000000000000L) === 100000000000000L)
    // 1e11 is NOT > 1e11 → seconds branch
    assert(normOne(100000000000L) === 100000000000000L)
  }

  test("P3 stringly input: non-integral → null") {
    val r = Seq("1704067200", "garbage", null).toDF("s")
      .select(Normalize.commitMs(col("s")).as("r")).collect().map(x => Option(x.get(0)))
    assert(r(0) === Some(1704067200000L))
    assert(r(1) === None)
    assert(r(2) === None)
  }

  test("P4 boolean truth table incl. messy encodings") {
    val cases = Seq(
      "true" -> Some(true), "True" -> Some(true), " TRUE " -> Some(true),
      "1" -> Some(true), "yes" -> Some(true), "y" -> Some(true), "Y " -> Some(true),
      "false" -> Some(false), "0" -> Some(false), "no" -> Some(false),
      "n" -> Some(false), "" -> Some(false), "  " -> Some(false),
      "maybe" -> None, "2" -> None, "truthy" -> None)
    val got = cases.map(_._1).toDF("s")
      .select(col("s"), Normalize.boolNorm(col("s")).as("b"))
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    cases.foreach { case (in, want) => assert(got(in) === want, s"input '$in'") }
    // null → null
    val n = Seq(Option.empty[String]).toDF("s")
      .select(Normalize.boolNorm(col("s"))).collect()(0)
    assert(n.isNullAt(0))
  }

  test("P4 numeric branch: bool(x) semantics") {
    val r = Seq[(java.lang.Long, Int)]((0L, 0), (2L, 1), (-1L, 2), (null, 3)).toDF("v", "i")
      .orderBy("i").select(Normalize.boolNormNumeric(col("v"))).collect()
    assert(r(0).getBoolean(0) === false)
    assert(r(1).getBoolean(0) === true)
    assert(r(2).getBoolean(0) === true)
    assert(r(3).isNullAt(0))
  }

  test("P8 secret masking keeps last 4, stars the rest") {
    val r = Seq("supersecret", "abcd", "ab", "", null).toDF("s")
      .select(Normalize.maskSecret(col("s"))).collect().map(x => Option(x.getString(0)))
    assert(r(0) === Some("*******cret"))
    assert(r(1) === Some("****"))
    assert(r(2) === Some("**"))
    assert(r(3) === Some(""))
    assert(r(4) === None)
  }

  test("P9 url normalization and shape checks") {
    val r = Seq(("login.example.com", "/data/AccountChangeEvent", "a@b.co", "h:7443"),
        ("https://x.com", "/other/Topic", "bad-email", "hostonly"))
      .toDF("u", "t", "e", "h")
      .select(Normalize.normalizeUrl(col("u")), Normalize.validTopic(col("t")),
        Normalize.validEmail(col("e")), Normalize.validHostPort(col("h")))
      .collect()
    assert(r(0).getString(0) === "https://login.example.com")
    assert(r(0).getBoolean(1) === true)
    assert(r(0).getBoolean(2) === true)
    assert(r(0).getBoolean(3) === true)
    assert(r(1).getString(0) === "https://x.com")
    assert(r(1).getBoolean(1) === false)
    assert(r(1).getBoolean(2) === false)
    assert(r(1).getBoolean(3) === false)
  }
}
