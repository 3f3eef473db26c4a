package graft.rel

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Plan-asserted scale techniques: bucketed joins eliminate the shuffle,
  * salted aggregation preserves results under skew.
  */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed co-located join plans with no shuffle exchange") {
    for (t <- Seq("b_orders", "b_customer")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
          .stripPrefix("file:"), t))
    }
    val orders = graft.Tables.orders(spark, "/root/testdata/sf0.001")
    val customer = graft.Tables.customer(spark, "/root/testdata/sf0.001")
    Scale.writeBucketed(orders.select("o_orderkey", "o_custkey", "o_totalprice")
      .withColumnRenamed("o_custkey", "custkey"), "b_orders", "custkey")
    Scale.writeBucketed(customer.select(col("c_custkey").as("custkey"), col("c_name")),
      "b_customer", "custkey")
    // the small side would be broadcast at this SF — force the SMJ path the
    // bucketing exists for (fact/fact joins where broadcast is impossible)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Scale.bucketedJoin(spark, "b_orders", "b_customer", "custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected shuffle-free bucketed join:\n$plan")
      val expected = orders.join(customer, orders("o_custkey") === customer("c_custkey")).count()
      assert(joined.count() === expected)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("salted aggregation equals direct aggregation under a hot key") {
    // 10k rows of one hot key + scattered keys, integer values → exact sums
    val hot = (1 to 10000).map(i => ("hot", i.toLong))
    val rest = (1 to 500).map(i => (s"k${i % 50}", i.toLong))
    val df = (hot ++ rest).toDF("k", "v")
    val direct = df.groupBy("k").agg(sum("v").as("total"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Scale.saltedSum(df, col("k"), col("v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted === direct)
    // the spreading claim must be asserted against saltedSum's OWN plan,
    // not a re-statement of the salt formula inside the test (a salted
    // sum that stopped salting still sums correctly, so the equality
    // above can't catch the skew regression): the salt expression must
    // content-hash the FULL row — a key-only (or constant) salt keeps
    // every hot-key row on one reducer
    // the ANALYZED plan: the optimizer constant-folds a local fixture
    // into a LocalRelation, erasing the salt projection it evaluated
    val saltedPlan = Scale.saltedSum(df, col("k"), col("v"))
      .queryExecution.analyzed.toString
    assert("""xxhash64\(k#\d+, v#\d+""".r.findFirstIn(saltedPlan).isDefined,
      s"salt must hash key AND value columns:\n${saltedPlan.take(800)}")
    assert(saltedPlan.sliding("Aggregate".length).count(_ == "Aggregate") >= 2,
      "two-level (partial-per-salt, then per-key) aggregation expected")
  }
}
