package graft.admin

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}

/** S5/K5 over a real JDBC backend — the reference runs every control-plane
  * query against Postgres (`app/db.py:16-35`, asyncpg pool;
  * `app/services/listener_manager.py:179-183`); here the same query shapes
  * run over `spark.read.jdbc` relations, and config upserts execute as
  * UPDATE-else-INSERT inside one transaction per batch — the
  * `_save_replay_b64` contract (`app/services/sf_pubsub.py:145-176`).
  *
  * Tests use embedded Derby (in the Spark distribution); any JDBC database
  * is a URL swap. Scale posture: config/offset tables are control-plane
  * data — thousands of rows, not data-plane volume — so the deliberate
  * single-connection transactional upsert is correct even on a 1000-executor
  * cluster (the data plane never goes through JDBC; deliveries flow to the
  * webhook/parquet sinks). Reading config via JDBC yields a single-partition
  * scan, which Spark then broadcasts into J1-style joins exactly like the
  * parquet-backed [[ControlPlane]] plans.
  */
object JdbcConfigStore {

  /** A JDBC relation as a DataFrame (`spark.read.jdbc`). */
  def read(spark: SparkSession, url: String, table: String): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .load()

  /** Replace/append a small config table over JDBC. String columns are
    * created as VARCHAR(512), not the dialect's LOB default — config keys
    * must be comparable/indexable (Derby CLOBs, e.g., can't appear in a
    * WHERE clause).
    */
  def write(df: DataFrame, url: String, table: String,
      mode: SaveMode = SaveMode.Append): Unit = {
    val varchars = df.schema.fields
      .filter(_.dataType == org.apache.spark.sql.types.StringType)
      .map(f => s"${f.name} VARCHAR(512)")
    val w = df.write.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .mode(mode)
    (if (varchars.nonEmpty) w.option("createTableColumnTypes", varchars.mkString(", ")) else w)
      .save()
  }

  /** K5 — transactional upsert: for each row UPDATE by key, INSERT when no
    * row matched, one transaction per batch (all-or-nothing, like the
    * reference's per-statement asyncpg transaction). The frame is collapsed
    * to one partition first: config upserts are tiny and a single ordered
    * transaction avoids cross-partition key deadlocks.
    */
  def upsert(df: DataFrame, url: String, table: String, keys: Seq[String]): Unit = {
    val cols = df.columns.toSeq
    val setCols = cols.filterNot(keys.contains)
    require(setCols.nonEmpty, s"upsert into $table needs at least one non-key column")
    // quote identifiers: Spark's JDBC writer creates case-preserved quoted
    // columns, which unquoted SQL would otherwise upcase (Derby/Postgres).
    def q(c: String) = "\"" + c + "\""
    val updateSql =
      s"UPDATE $table SET ${setCols.map(c => s"${q(c)} = ?").mkString(", ")} " +
        s"WHERE ${keys.map(c => s"${q(c)} = ?").mkString(" AND ")}"
    val insertSql =
      s"INSERT INTO $table (${cols.map(q).mkString(", ")}) VALUES (${cols.map(_ => "?").mkString(", ")})"
    df.coalesce(1).foreachPartition { (rows: Iterator[Row]) =>
      if (rows.nonEmpty) {
        val conn = java.sql.DriverManager.getConnection(url)
        try {
          conn.setAutoCommit(false)
          val up = conn.prepareStatement(updateSql)
          val ins = conn.prepareStatement(insertSql)
          rows.foreach { r =>
            setCols.zipWithIndex.foreach { case (c, i) => up.setObject(i + 1, r.getAs[Any](c)) }
            keys.zipWithIndex.foreach { case (c, i) => up.setObject(setCols.size + i + 1, r.getAs[Any](c)) }
            if (up.executeUpdate() == 0) {
              cols.zipWithIndex.foreach { case (c, i) => ins.setObject(i + 1, r.getAs[Any](c)) }
              ins.executeUpdate()
            }
          }
          conn.commit()
        } catch {
          case e: Throwable => conn.rollback(); throw e
        } finally conn.close()
      }
    }
  }

  /** foreachBatch sink upserting each epoch's rows by key — the streaming
    * form of K5 (offset/counter tables maintained transactionally per
    * micro-batch; idempotent under epoch replay because upsert is
    * by-key, not append).
    */
  def upsertSink(url: String, table: String, keys: Seq[String])(
      batch: DataFrame, epochId: Long): Unit =
    upsert(batch, url, table, keys)
}
