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

  /** java.sql.Types code per column, derived from the frame's schema — a
    * null value must bind via `setNull(i, sqlType)`: Derby (the test
    * backend) rejects an untyped `setObject(i, null)` with ERROR 22005,
    * and the K3 recovery flow legitimately upserts a cleared (null)
    * `last_replay_b64`.
    */
  private def sqlTypesOf(df: DataFrame): Map[String, Int] = {
    import org.apache.spark.sql.types._
    df.schema.fields.map { f =>
      f.name -> (f.dataType match {
        case StringType => java.sql.Types.VARCHAR
        case LongType => java.sql.Types.BIGINT
        case IntegerType => java.sql.Types.INTEGER
        case ShortType => java.sql.Types.SMALLINT
        case DoubleType => java.sql.Types.DOUBLE
        case FloatType => java.sql.Types.FLOAT
        case BooleanType => java.sql.Types.BOOLEAN
        case TimestampType => java.sql.Types.TIMESTAMP
        case DateType => java.sql.Types.DATE
        case BinaryType => java.sql.Types.BINARY
        case _: DecimalType => java.sql.Types.DECIMAL
        case _ => java.sql.Types.OTHER
      })
    }.toMap
  }

  /** K5 — transactional upsert: for each row UPDATE by key, INSERT when no
    * row matched, one transaction per batch (all-or-nothing, like the
    * reference's per-statement asyncpg transaction). The frame is collapsed
    * to one partition first: config upserts are tiny and a single ordered
    * transaction avoids cross-partition key deadlocks. `connProps` carries
    * driver properties (user/password) for backends that need them.
    */
  def upsert(df: DataFrame, url: String, table: String, keys: Seq[String],
      connProps: Map[String, String] = Map.empty): Unit = {
    val cols = df.columns.toSeq
    val setCols = cols.filterNot(keys.contains)
    require(setCols.nonEmpty, s"upsert into $table needs at least one non-key column")
    val sqlTypes = sqlTypesOf(df)
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
        val props = new java.util.Properties()
        connProps.foreach { case (k, v) => props.setProperty(k, v) }
        val conn = java.sql.DriverManager.getConnection(url, props)
        def bind(ps: java.sql.PreparedStatement, i: Int, c: String, r: Row): Unit = {
          val v = r.getAs[Any](c)
          if (v == null) ps.setNull(i, sqlTypes(c)) else ps.setObject(i, v)
        }
        try {
          conn.setAutoCommit(false)
          val up = conn.prepareStatement(updateSql)
          val ins = conn.prepareStatement(insertSql)
          rows.foreach { r =>
            setCols.zipWithIndex.foreach { case (c, i) => bind(up, i + 1, c, r) }
            keys.zipWithIndex.foreach { case (c, i) => bind(up, setCols.size + i + 1, c, r) }
            if (up.executeUpdate() == 0) {
              cols.zipWithIndex.foreach { case (c, i) => bind(ins, i + 1, c, r) }
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
  def upsertSink(url: String, table: String, keys: Seq[String],
      connProps: Map[String, String] = Map.empty)(
      batch: DataFrame, epochId: Long): Unit =
    upsert(batch, url, table, keys, connProps)
}
