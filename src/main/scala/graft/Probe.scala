package graft
import org.apache.spark.sql.SparkSession
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.printSchema()
    ev.show(3, false)
    import org.apache.spark.sql.functions._
    ev.select(unix_millis(col("ts"))).show(3, false)
    spark.stop()
  }
}
