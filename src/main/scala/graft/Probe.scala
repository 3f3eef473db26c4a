package graft
import org.apache.spark.sql.SparkSession

/** Ad-hoc plan/timing probe: runMain graft.Probe <queryName> [sfDir] [explain] */
object Probe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (name == "_micro") {
      for (i <- 1 to 4) {
        var t0 = System.nanoTime()
        spark.range(10).write.format("noop").mode("overwrite").save()
        println(f"[probe] range-noop run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
        t0 = System.nanoTime()
        spark.read.parquet(s"$sfDir/documents.parquet").write.format("noop").mode("overwrite").save()
        println(f"[probe] docs-noop run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
        t0 = System.nanoTime()
        val n = spark.read.parquet(s"$sfDir/documents.parquet").count()
        println(f"[probe] docs-count run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n)")
      }
      spark.stop(); return
    }
    val fn = SparkEntry.queries(name)
    if (args.contains("explain")) fn(spark, sfDir).explain("formatted")
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[probe] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      spark.sqlContext.clearCache()
    }
    spark.stop()
  }
}
