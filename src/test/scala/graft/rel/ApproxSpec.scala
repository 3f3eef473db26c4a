package graft.rel

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** approx_count_distinct has no cross-engine oracle (sketches differ);
  * its contract — bounded relative error vs exact — is asserted here.
  */
class ApproxSpec extends SparkSpec {
  test("HLL++ distinct is within the configured error of exact") {
    val orders = graft.Tables.orders(spark, "/root/testdata/sf0.01")
    val exact = orders.groupBy(col("o_orderstatus"))
      .agg(countDistinct(col("o_custkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = orders.groupBy(col("o_orderstatus"))
      .agg(approx_count_distinct(col("o_custkey"), 0.02).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      val a = approx(k)
      assert(math.abs(a - n).toDouble / n < 0.05, s"$k: exact=$n approx=$a")
    }
  }
}
