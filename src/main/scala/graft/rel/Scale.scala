package graft.rel

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale techniques as reusable operators (the 100 TB toolbox the harness
  * tables are too small to force, demonstrated + plan-asserted in
  * ScaleSpec):
  *
  *   - **bucketed co-located join**: both sides written bucketed on the
  *     join key join WITHOUT a shuffle exchange — the layout a 100 TB
  *     fact/fact join needs (broadcast is off the table, and an on-the-fly
  *     shuffle of both sides per query is the cost being amortized).
  *   - **salted aggregation**: two-stage groupBy for reduce-side key skew —
  *     partials spread over (key, salt), finals combine per key. Spark's
  *     hash aggregate already map-side-combines; salting is for the case
  *     where single hot keys overflow one reducer's memory/time.
  */
object Scale {

  /** Write `df` bucketed by `key` into the session catalog as `table`. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int = 8): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)

  /** Join two same-bucketed catalog tables on `key` — with matching bucket
    * specs Catalyst plans a SortMergeJoin with NO ShuffleExchange on either
    * side.
    */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  /** Skew-safe sum: stage 1 aggregates per (key, salt), stage 2 combines
    * per key. The salt must NOT depend only on the key (that would keep the
    * hot key on one reducer); it is derived from a content hash of the full
    * row, so it is deterministic under task retries — a
    * partition-id/row-index salt regenerates differently when a map task is
    * recomputed after a partial shuffle fetch, which can double- or
    * drop-count rows. Fully identical rows co-locate on one salt;
    * acceptable, since the spread only has to break up hot keys whose rows
    * differ somewhere.
    */
  def saltedSum(df: DataFrame, key: Column, value: Column,
      salts: Int = 16): DataFrame = {
    val salted = df
      .withColumn("salt", pmod(xxhash64(df.columns.map(col): _*), lit(salts)))
      .select(key.as("k"), value.as("v"), col("salt"))
    salted.groupBy(col("k"), col("salt"))
      .agg(sum(col("v")).as("partial"))
      .groupBy(col("k"))
      .agg(sum(col("partial")).as("total"))
  }
}
