package graft.admin

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import org.apache.spark.sql.Column

/** Control-plane/relational queries (SURVEY §2.3 F4/F5, §2.5 A1-A3,
  * §2.6 J1, §2.7 O1/O2, §2.8 K5). The reference ships these to Postgres
  * (`app/routers/clients.py`, `app/services/listener_manager.py`); here
  * they are plain Catalyst plans over the harness tables, with `customer`
  * standing in for the `clients` table and `orders` for operational rows.
  */
object ControlPlane {

  /** Derived listener-status table: rows exist for every third client only,
    * so the left join exercises the missing-side default (reference
    * `app/routers/clients.py:166-187`).
    */
  def listenerStatus(customer: DataFrame): DataFrame =
    customer.filter(col("c_custkey") % 3 === 0)
      .select(
        col("c_custkey").as("client_id"),
        element_at(
          array(lit("running"), lit("error"), lit("stopped"), lit("starting")),
          (graft.cdc.ops.Normalize.intDiv(col("c_custkey"), lit(3L)) % 4).cast("int") + 1).as("status"))

  /** Users-table stand-in (reference `app/models.py:229-239`: id, unique
    * email, role enum admin|user|amsa, is_active, created_at), derived
    * deterministically from `customer` so the DuckDB oracle rebuilds the
    * identical frame. Every 50th user re-uses user 1's email — the
    * duplicate the reference's create/update uniqueness guard exists to
    * catch (`app/routers/auth.py:55-58`).
    */
  def users(customer: DataFrame): DataFrame =
    customer.select(
      col("c_custkey").as("user_id"),
      concat(lit("user"),
        when(col("c_custkey") % 50 === 0, lit(1L)).otherwise(col("c_custkey"))
          .cast("string"),
        lit("@example.com")).as("email"),
      element_at(array(lit("admin"), lit("user"), lit("amsa")),
        (col("c_custkey") % 3).cast("int") + 1).as("role"),
      (col("c_custkey") % 7 =!= 0).as("is_active"),
      (lit(1704067200000L) + col("c_custkey") * 1000).as("created_at_ms"))

  private val usersCte: String =
    """users AS (
      |  SELECT c_custkey AS user_id,
      |    'user' || CAST(CASE WHEN c_custkey % 50 = 0 THEN 1 ELSE c_custkey END AS VARCHAR) || '@example.com' AS email,
      |    ['admin','user','amsa'][CAST(c_custkey % 3 AS INT) + 1] AS role,
      |    c_custkey % 7 <> 0 AS is_active,
      |    1704067200000 + c_custkey * 1000 AS created_at_ms
      |  FROM customer
      |)""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // F4/O1 — admin users list, ordered by id (reference
    // `app/routers/auth.py:78-82` list_users).
    "cp_users_list" -> ((s, d) =>
      users(Tables.customer(s, d)).orderBy(col("user_id"))),

    // F5 — duplicate-email guard: the existence probe behind the
    // reference's "Email already registered" 400 (`auth.py:55-58`),
    // run corpus-wide as a uniqueness audit.
    "cp_users_dup_email" -> ((s, d) =>
      users(Tables.customer(s, d))
        .groupBy(col("email")).agg(count(lit(1)).as("n"))
        .filter(col("n") > 1)),

    // F4 — role + active filter (require_roles(admin) ∧ is_active, the
    // reference's login/authorization predicate, `auth.py:17-27,75`).
    "cp_users_role_filter" -> ((s, d) =>
      users(Tables.customer(s, d))
        .filter(col("role") === "admin" && col("is_active"))
        .select(col("user_id"), col("email"), col("role"))),

    // O1 — order_by + limit + offset pagination (clients list).
    "cp_pagination" -> ((s, d) =>
      Tables.customer(s, d)
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
        .offset(20).limit(10)),

    // O1 at scale — keyset (cursor) pagination: WHERE id > cursor ORDER BY
    // id LIMIT n. OFFSET-pagination cost grows with the offset (every
    // page re-sorts the prefix); the keyset form is a pushed range filter
    // + TakeOrdered regardless of page depth — the only pagination that
    // survives a 100 TB table. Cursor fixed at the page-2 boundary so the
    // result set mirrors cp_pagination's page.
    "cp_pagination_keyset" -> ((s, d) =>
      Tables.customer(s, d)
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .filter(col("c_custkey") > 20)
        .orderBy(col("c_custkey"))
        .limit(10)),

    // P10 — ILIKE pattern search (reference `client_name ILIKE '%q%'`,
    // `app/routers/clients.py:208-211`), via Spark's native ilike.
    "cp_search_ilike" -> ((s, d) =>
      Tables.customer(s, d)
        .filter(col("c_name").ilike("%CUSTOMER#00000001%"))
        .select(col("c_custkey"), col("c_name"))),

    // A1 + P10 — filtered count with ilike-style search (pagination total).
    "cp_count_filtered" -> ((s, d) =>
      Tables.customer(s, d)
        .filter(lower(col("c_name")).contains("1") && col("c_acctbal") > 0)
        .agg(count(lit(1)).as("total"))),

    // A2 — group-by state count (pool diagnostics shape).
    "cp_groupby_count" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total_price"))),

    // A3 / O2 — latest row per key (stored-offset lookup shape).
    "cp_latest_per_key" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey").as("last_orderkey"),
          unix_millis(col("o_orderdate").cast("timestamp")).as("last_orderdate_ms"))
    }),

    // J1 — clients ⟕ listener-status with missing-side default "stopped".
    "cp_status_left_join" -> ((s, d) => {
      val c = Tables.customer(s, d)
      // no broadcast hint: the status side is |customer|/3 rows — grows
      // with SF, so forcing it violates the bounded-by-construction hint
      // policy (Relational.scala); AQE broadcasts it while it fits
      c.join(listenerStatus(c), col("c_custkey") === col("client_id"), "left")
        .select(col("c_custkey"), col("c_name"),
          coalesce(col("status"), lit("stopped")).as("status"),
          (coalesce(col("status"), lit("stopped")) === "running").as("running"))
    }),

    // F5 — duplicate-key existence check (uniqueness guard shape).
    "cp_dup_check" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_custkey"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
        .filter(col("n") > 1)),

    // K5 — config upsert as a batch merge: updates override base rows.
    "cp_upsert_merge" -> ((s, d) => {
      val base = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_acctbal").cast("decimal(18,2)").as("bal"))
      val updates = base.filter(col("c_custkey") % 10 === 0)
        .select(col("c_custkey"), (col("bal") + 100).as("new_bal"))
      base.join(updates, Seq("c_custkey"), "full_outer")
        .select(col("c_custkey"),
          coalesce(col("new_bal").cast("decimal(19,2)"), col("bal").cast("decimal(19,2)"))
            .cast("double").as("bal"))
    })
  )

  /** Verify-dump sort keys (applied by [[graft.Verify]], not the operators). */
  def dumpOrder: Map[String, Seq[Column]] = Map(
    "cp_users_list"       -> Seq(col("user_id")),
    "cp_users_dup_email"  -> Seq(col("email")),
    "cp_users_role_filter" -> Seq(col("user_id")),
    "cp_search_ilike"     -> Seq(col("c_custkey")),
    "cp_groupby_count"    -> Seq(col("o_orderstatus")),
    "cp_latest_per_key"   -> Seq(col("o_custkey")),
    "cp_status_left_join" -> Seq(col("c_custkey")),
    "cp_dup_check"        -> Seq(col("o_custkey"), col("o_orderstatus")),
    "cp_upsert_merge"     -> Seq(col("c_custkey"))
  )

  def oracle: Map[String, String] = Map(
    "cp_users_list" ->
      s"""WITH $usersCte
         |SELECT user_id, email, role, is_active, created_at_ms
         |FROM users ORDER BY user_id""".stripMargin,

    "cp_users_dup_email" ->
      s"""WITH $usersCte
         |SELECT email, count(*) AS n FROM users
         |GROUP BY email HAVING count(*) > 1 ORDER BY email""".stripMargin,

    "cp_users_role_filter" ->
      s"""WITH $usersCte
         |SELECT user_id, email, role FROM users
         |WHERE role = 'admin' AND is_active ORDER BY user_id""".stripMargin,

    "cp_pagination" ->
      "SELECT c_custkey, c_name, c_mktsegment FROM customer ORDER BY c_custkey LIMIT 10 OFFSET 20",

    "cp_pagination_keyset" ->
      "SELECT c_custkey, c_name, c_mktsegment FROM customer WHERE c_custkey > 20 ORDER BY c_custkey LIMIT 10",

    "cp_search_ilike" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_name ILIKE '%CUSTOMER#00000001%' ORDER BY c_custkey""".stripMargin,

    "cp_count_filtered" ->
      "SELECT count(*) AS total FROM customer WHERE lower(c_name) LIKE '%1%' AND c_acctbal > 0",

    "cp_groupby_count" ->
      """SELECT o_orderstatus, count(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "cp_latest_per_key" ->
      """SELECT o_custkey, o_orderkey AS last_orderkey, epoch_ms(o_orderdate) AS last_orderdate_ms
        |FROM (
        |  SELECT *, row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders
        |) WHERE rn = 1 ORDER BY o_custkey""".stripMargin,

    "cp_status_left_join" ->
      """SELECT c.c_custkey, c.c_name,
        |  COALESCE(s.status, 'stopped') AS status,
        |  COALESCE(s.status, 'stopped') = 'running' AS running
        |FROM customer c
        |LEFT JOIN (
        |  SELECT c_custkey AS client_id,
        |    ['running','error','stopped','starting'][CAST((c_custkey // 3) % 4 AS INT) + 1] AS status
        |  FROM customer WHERE c_custkey % 3 = 0
        |) s ON c.c_custkey = s.client_id
        |ORDER BY c.c_custkey""".stripMargin,

    "cp_dup_check" ->
      """SELECT o_custkey, o_orderstatus, count(*) AS n FROM orders
        |GROUP BY 1, 2 HAVING count(*) > 1 ORDER BY 1, 2""".stripMargin,

    "cp_upsert_merge" ->
      """SELECT b.c_custkey,
        |  CAST(COALESCE(u.new_bal, b.bal) AS DOUBLE) AS bal
        |FROM (SELECT c_custkey, CAST(c_acctbal AS DECIMAL(18,2)) AS bal FROM customer) b
        |FULL OUTER JOIN (
        |  SELECT c_custkey, CAST(c_acctbal AS DECIMAL(18,2)) + 100 AS new_bal
        |  FROM customer WHERE c_custkey % 10 = 0
        |) u ON b.c_custkey = u.c_custkey
        |ORDER BY b.c_custkey""".stripMargin
  )
}
