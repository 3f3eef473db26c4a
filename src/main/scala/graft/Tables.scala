package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * `events.parquet` stores `ts` as parquet TIMESTAMP(NANOS), which Spark 4
  * rejects by default; we read it as a Long of epoch-nanoseconds via
  * `spark.sql.legacy.parquet.nanosAsLong` — the CDC view (graft.cdc.CdcView)
  * derives epoch-millis from it with exact integer division, matching what
  * the DuckDB oracle computes with `epoch_ms(ts)`.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Idempotent session conf for oracle parity. Safe to call per query. */
  def setup(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
  }

  /** Memoized per (session, dir, table): re-listing the file and re-reading
    * parquet footers/schema for every query costs ~100-200ms each — the
    * resolved relation (metadata only; scans still read the files) is
    * reused across queries in a process.
    */
  private val relCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, String, String), DataFrame]()

  def load(spark: SparkSession, sfDir: String, table: String): DataFrame = {
    setup(spark)
    relCache.computeIfAbsent((System.identityHashCode(spark), sfDir, table),
      _ => spark.read.parquet(s"$sfDir/$table.parquet"))
  }

  /** Register every harness table as a SQL temp view — the spark.sql front
    * door (`SELECT ... FROM lineitem`) for library users.
    */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(t => load(spark, sfDir, t).createOrReplaceTempView(t))

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
