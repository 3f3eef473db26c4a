package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic main: runs the `/debug/pool` analog
  * ([[graft.cdc.StatusBoard.executorPool]]) on a REAL multi-executor
  * scheduler — `local-cluster[2,1,1024]` forks two worker JVMs from
  * SPARK_HOME — and drives one genuine shuffle across them, so the gauge
  * is proven per-executor, not just against local mode's single driver
  * row (the ListenerManagerSpec case). Driver-side only: the job uses
  * Spark classes exclusively, so no app jar needs shipping. Run:
  *
  *   SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
  *     sbt "runMain graft.ClusterSmoke"
  *
  * (SPARK_SCALA_VERSION is required: the binary dist's worker launcher
  * cannot infer the Scala version without a source-build layout.)
  *
  * Prints one JSON line with the executor count and per-executor rows.
  */
object ClusterSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local-cluster[2,1,1024]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // one real shuffle spread over both executors
    val groups = spark.range(0, 100000, 1, 8).selectExpr("id % 97 AS k")
      .groupBy("k").count().count()
    val pool = graft.cdc.StatusBoard.executorPool(spark).collect()
    println(s"""{"metric":"cluster_smoke","executors":${pool.length},"groups":$groups,"max_concurrency":${pool.map(_.getAs[Int]("max_concurrency")).max}}""")
    pool.foreach(r => println(s"[cluster-smoke] $r"))
    spark.stop()
  }
}
