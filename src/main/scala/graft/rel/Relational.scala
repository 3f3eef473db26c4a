package graft.rel

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Relational capability queries beyond the reference's own surface
  * (SURVEY §7.2 step 5): multi-way equi-joins, aggregations, windows,
  * top-k, set ops, rollup — exercised on the TPC-H-ish tables so BENCH
  * measures real shuffle/join behavior at sf0.1.
  *
  * Cross-engine numeric policy: money aggregates are exact and cast to
  * DOUBLE only at the output boundary, so the driver's hash compare is
  * bit-exact. Two equivalent exact paths are exercised:
  *   - DECIMAL(18,2)-cast inputs (q3/q5/q6/q19/rollup/cube/window) — the
  *     declarative form;
  *   - fixed-point long cents (q1/q17/q_topk_parts, the scan-heavy money
  *     queries): 2-decimal money doubles → `round(x*100)` longs per row,
  *     per-row arithmetic as integer multiplies inside codegen (no per-row
  *     decimal scale management), aggregated as DECIMAL(38,0) — the
  *     128-bit-exact analog of DuckDB's SUM(BIGINT)→HUGEINT, so no long
  *     overflow at any SF. Both engines sum identical integers and divide
  *     identical correctly-rounded doubles ⇒ bit-exact.
  */
object Relational {

  private def dec(c: Column): Column = c.cast("decimal(18,2)")
  /** revenue term: extendedprice * (1 - discount), exact decimal. */
  private def revenue: Column = dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount")))

  /** 2-decimal money double → exact long cents (values sit within ~1e-9 of
    * integer cents, so the round never lands on a .5 boundary — both
    * engines agree).
    */
  private def cents(c: Column): Column = round(c * 100).cast("long")
  /** Overflow-safe exact sum of a long fixed-point column (decimal-128
    * accumulator, long-backed until it actually overflows).
    */
  private def sumFx(c: Column): Column = sum(c.cast("decimal(38,0)"))

  /** Generic as-of join by the union+window technique — the time-series
    * operator Spark lacks natively, in its scale-correct form: tag both
    * sides, ONE shuffle on the key, per-partition sort by (ts, tag) —
    * builds before probes at equal ts gives `<=` tie semantics — and
    * `last(ignoreNulls)` carries the latest at-or-before build row
    * forward. No range join, no per-row subquery; linear at any SF.
    * `build`'s non-key/ts columns surface as `asof_<c>`; probe rows
    * before their key's first build row (or with no build side at all)
    * carry nulls. The build side should be unique per (key, ts) for a
    * deterministic match — pre-aggregate it like `q_asof_join` does.
    * Shared by the q_asof_join query (oracle-pinned vs DuckDB ASOF LEFT
    * JOIN) and AsofSpec's semantic fixtures, so the spec exercises the
    * production operator, not a copy of the technique.
    */
  def asofJoin(probe: DataFrame, build: DataFrame,
      key: String, ts: String): DataFrame = {
    val payload = build.columns.toSeq.filterNot(c => c == key || c == ts)
    val carry = probe.columns.toSeq.filterNot(c => c == key || c == ts)
    val pSide = payload.foldLeft(probe.withColumn("tag", lit(1)))((d, c) =>
      d.withColumn(s"b_$c", lit(null).cast(build.schema(c).dataType)))
    val bSide = carry.foldLeft(
        payload.foldLeft(build)((d, c) => d.withColumnRenamed(c, s"b_$c"))
          .withColumn("tag", lit(0)))((d, c) =>
      d.withColumn(c, lit(null).cast(probe.schema(c).dataType)))
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col("tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    payload.foldLeft(pSide.unionByName(bSide))((d, c) =>
        d.withColumn(s"asof_$c", last(col(s"b_$c"), ignoreNulls = true).over(w)))
      .filter(col("tag") === 1)
      .select((Seq(key, ts).map(col) ++ carry.map(col) ++
        payload.map(c => col(s"asof_$c"))): _*)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1 shape: scan-heavy grouped aggregation, fixed-point money
    // path — narrow long-cents projection feeds the two-phase hash agg;
    // disc_price in 10^-4 units, charge in 10^-6 units.
    "q1_agg" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .select(col("l_returnflag"), col("l_linestatus"),
          cents(col("l_quantity")).as("qty_c"),
          cents(col("l_extendedprice")).as("price_c"),
          cents(col("l_discount")).as("disc_c"),
          cents(col("l_tax")).as("tax_c"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          (sumFx(col("qty_c")).cast("double") / 100.0).as("sum_qty"),
          (sumFx(col("price_c")).cast("double") / 100.0).as("sum_base_price"),
          (sumFx(col("price_c") * (lit(100L) - col("disc_c"))).cast("double") / 10000.0).as("sum_disc_price"),
          (sumFx(col("price_c") * (lit(100L) - col("disc_c")) * (lit(100L) + col("tax_c")))
            .cast("double") / 1000000.0).as("sum_charge"),
          (sumFx(col("qty_c")).cast("double") / 100.0 / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))),

    // TPC-H Q3 shape: 3-way join + grouped top-k. Broadcast-hint policy
    // (applies to every query here): explicit broadcast() only on relations
    // whose size is BOUNDED by construction (nation/region, tiny query
    // sets); SF-growing tables (customer/supplier/part) are left to the
    // AQE/threshold decision — at harness scale Catalyst still broadcasts
    // them (PlanQualitySpec asserts it), at 100 TB it correctly won't.
    "q3_topk_orders" -> ((s, d) => {
      val cust = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      val ord = Tables.orders(s, d).filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val li = Tables.lineitem(s, d).filter(col("l_shipdate") > lit("1996-06-30").cast("timestamp"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_orderkey"), col("o_orderpriority"))
        .agg(sum(revenue).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    }),

    // TPC-H Q5 shape: 6-way join through region→nation→customer→orders→
    // lineitem→supplier with the co-nation constraint.
    "q5_nation_revenue" -> ((s, d) => {
      val region = Tables.region(s, d).filter(col("r_name") === "ASIA")
      val nation = Tables.nation(s, d)
      val cust = Tables.customer(s, d)
      val ord = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val li = Tables.lineitem(s, d)
      val supp = Tables.supplier(s, d)
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(supp, col("l_suppkey") === col("s_suppkey"))
        .join(cust, col("o_custkey") === col("c_custkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(sum(revenue).cast("double").as("revenue"))
    }),

    // Window functions: per-customer order sequence + running spend.
    "q_window_running" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          row_number().over(w).cast("bigint").as("rn"),
          sum(dec(col("o_totalprice")))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double").as("running_spend"))
    }),

    // Top-k with dimension join: top 10 parts by revenue. Fixed-point
    // path; the revenue term is collapsed to one long column BEFORE the
    // join, so only (key, rev_c4) crosses the shuffle.
    "q_topk_parts" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_partkey"),
          (cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))).as("rev_c4"))
        .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_partkey"), col("p_name"))
        .agg((sumFx(col("rev_c4")).cast("double") / 10000.0).as("revenue"))
        .orderBy(col("revenue").desc, col("p_partkey"))
        .limit(10)),

    // Set operations: INTERSECT and EXCEPT over key sets.
    "q_setops" -> ((s, d) => {
      val building = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("custkey"))
      // no pre-distinct: INTERSECT/EXCEPT already have set semantics, so
      // deduping the orders keys first would just add an exchange + agg
      val withOrders = Tables.orders(s, d).select(col("o_custkey").as("custkey"))
      building.intersect(withOrders).withColumn("op", lit("intersect"))
        .unionAll(building.except(withOrders).withColumn("op", lit("except")))
        .select(col("op"), col("custkey"))
    }),

    // Semi join: active customers that have at least one order (EXISTS).
    "q_semi_join" -> ((s, d) => {
      val c = Tables.customer(s, d).filter(col("c_acctbal") < 0)
      c.join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
    }),

    // Anti join: customers with no pending ('P') order (NOT EXISTS shape;
    // filtered build side keeps the result non-trivial at every SF).
    "q_anti_join" -> ((s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d).filter(col("o_orderstatus") === "P"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))),

    // Rollup: subtotals over (status, priority); null markers normalized.
    "q_rollup_sales" -> ((s, d) =>
      Tables.orders(s, d)
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(dec(col("o_totalprice"))).cast("double").as("total_price"))
        .select(
          coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
          coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
          col("n"), col("total_price"))),

    // TPC-H Q6 shape through the spark.sql front door: temp view + SQL text
    // (the DataFrame DSL and SQL surface compile to the same Catalyst plan).
    "q6_sql_interface" -> ((s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem_v")
      s.sql(
        """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
          |       COUNT(*) AS n
          |FROM lineitem_v
          |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
          |  AND CAST(l_discount AS DECIMAL(18,2)) BETWEEN 0.03 AND 0.07
          |  AND CAST(l_quantity AS DECIMAL(18,2)) < 24""".stripMargin)
    }),

    // TPC-H Q19 shape: disjunctive multi-column predicate — Catalyst pushes
    // the common conjuncts into the scan and keeps the OR residual.
    "q19_disjunctive" -> ((s, d) =>
      Tables.lineitem(s, d)
        .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
            dec(col("l_quantity")).cast("double") >= 1 && dec(col("l_quantity")).cast("double") <= 30) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(10, 30) &&
            dec(col("l_quantity")).cast("double") >= 10 && dec(col("l_quantity")).cast("double") <= 40))
        .agg(sum(revenue).cast("double").as("revenue"),
          count(lit(1)).as("n"))),

    // GROUPING SETS — the general form rollup/cube specialize: exactly
    // the requested aggregation levels, one shuffle, partial+final agg
    // per set (no cost for levels nobody asked for).
    "q_grouping_sets" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders_gs")
      s.sql(
        """SELECT COALESCE(o_orderstatus, '(all)') AS status,
          |       COALESCE(o_orderpriority, '(all)') AS priority,
          |       COUNT(*) AS n,
          |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
          |FROM orders_gs
          |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin)
    }),

    // Cube: all grouping-set combinations over (status, priority).
    "q_cube_sales" -> ((s, d) =>
      Tables.orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(dec(col("o_totalprice"))).cast("double").as("total_price"))
        .select(
          coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
          coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
          col("n"), col("total_price"))),

    // HLL++ approximate distinct — sketch values are engine-specific, so
    // no SQL oracle (rows-only check); accuracy vs exact is bounded in
    // ApproxSpec. At 100 TB this replaces the exact-distinct shuffle with
    // a constant-size mergeable sketch.
    "q_approx_distinct" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_orderstatus"))
        .agg(approx_count_distinct(col("o_custkey"), 0.02).as("approx_custs"))),

    // Exact lower-median order value per status via deterministic rank
    // indexing (no interpolation arithmetic → bit-exact cross-engine).
    "q_median_manual" -> ((s, d) => {
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .withColumn("cnt", count(lit(1)).over(Window.partitionBy(col("o_orderstatus"))))
        .filter(expr("rn = (cnt + 1) div 2"))
        .select(col("o_orderstatus"), col("o_totalprice").as("median_price"))
    }),

    // lag/lead analytics: days since the customer's previous order.
    "q_window_lag" -> ((s, d) => {
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          unix_millis(col("o_orderdate").cast("timestamp")).as("ms"))
        .withColumn("prev_ms", lag(col("ms"), 1).over(
          Window.partitionBy(col("o_custkey")).orderBy(col("ms"), col("o_orderkey"))))
        .select(col("o_custkey"), col("o_orderkey"),
          ((col("ms") - col("prev_ms")) / 86400000L).cast("bigint").as("days_since_prev"))
    }),

    // Distinct aggregation: exact distinct customers per order status.
    "q_distinct_agg" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_orderstatus"))
        .agg(countDistinct(col("o_custkey")).as("n_custs"),
          count(lit(1)).as("n_orders"))),

    // TPC-H Q17 shape: correlated aggregate (below 20% of per-part avg
    // quantity), decorrelated as a pre-aggregated broadcast join.
    // Fixed-point path: the threshold is a double derived from exact
    // long-cents sums, mirrored in the oracle, so the comparison is
    // bit-identical cross-engine.
    "q17_small_qty_revenue" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(col("l_partkey"),
        cents(col("l_quantity")).as("qty_c"),
        cents(col("l_extendedprice")).as("price_c"))
      val avgQty = li.groupBy(col("l_partkey").as("ap_partkey"))
        .agg((sumFx(col("qty_c")).cast("double") / 100.0 / count(lit(1))).as("avg_qty"))
      val smallParts = Tables.part(s, d).filter(col("p_size") <= 5)
      li.join(smallParts, col("l_partkey") === col("p_partkey"))
        .join(avgQty, col("l_partkey") === col("ap_partkey"))
        .filter(col("qty_c").cast("double") / 100.0 < lit(0.2) * col("avg_qty"))
        .agg((sumFx(col("price_c")).cast("double") / 100.0 / 7.0).as("avg_yearly"))
    }),

    // As-of join (the time-series operator Spark lacks natively): each
    // event joined to the latest at-or-before profile snapshot of its
    // user (snapshots = every 20th event; events before a user's first
    // snapshot get nulls). Implemented with the scale-correct union+window
    // form: tag both sides, one shuffle on the key, per-partition sort by
    // (t, tag) — builds before probes at equal t gives <= semantics — and
    // last(ignoreNulls) carries the most recent build row forward. No
    // range join, no per-row subquery; linear at any SF. The build side
    // is pre-aggregated to one row per (key, t) so the match is
    // deterministic in both engines (DuckDB mirrors with ASOF LEFT JOIN).
    "q_asof_join" -> ((s, d) => {
      val evs = Tables.events(s, d)
      val probe = evs
        .select(col("user_id").as("k"), expr("ts div 1000000").as("t"), col("event_id"))
      val build = evs.filter(col("event_id") % 20 === 0)
        .select(col("user_id").as("k"), expr("ts div 1000000").as("t"),
          col("event_id").as("snap_id"), col("value").as("snap_value"))
        .groupBy(col("k"), col("t"))
        .agg(max(col("snap_id")).as("snap_id"),
          max_by(col("snap_value"), col("snap_id")).as("snap_value"))
      asofJoin(probe, build, "k", "t")
        .select(col("event_id"), col("k").as("user_id"), col("t").as("event_ms"),
          col("asof_snap_id"), col("asof_snap_value"))
    }),

    // Sessionization: gap-based session assignment (> 6 h of silence opens
    // a new session) via lag + running sum of boundary markers — one
    // shuffle on the user key, two window passes over the same sort, then
    // a per-session rollup. The batch twin of the streaming session
    // windows in streaming/Windows.scala.
    "q_sessionize" -> ((s, d) => {
      val gapMs = 6L * 3600 * 1000
      val w = Window.partitionBy(col("user_id")).orderBy(col("t"), col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), expr("ts div 1000000").as("t"))
        .withColumn("prev_t", lag(col("t"), 1).over(w))
        .withColumn("new_sess",
          when(col("prev_t").isNull || col("t") - col("prev_t") > gapMs, 1L).otherwise(0L))
        .withColumn("session_seq", sum(col("new_sess"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("session_seq"))
        .agg(min(col("t")).as("session_start"), max(col("t")).as("session_end"),
          count(lit(1)).as("n_events"))
    }),

    // Range (interval) join without the O(n·m) blowup: per-user
    // maintenance windows [t, t+6h] (opened by every 50th event) matched
    // to the events inside them. Both sides are keyed by (user, hour
    // bucket) — a window spans ≤ 7 buckets, so it is exploded into its
    // buckets and the join is a plain equi-join; the exact containment
    // predicate filters the bucket-boundary false positives. Each (event,
    // window) pair matches in exactly one bucket (the event's), so no
    // dedup is needed. This is the bucketed interval-join form that keeps
    // range joins linear at 100 TB.
    "q_range_join" -> ((s, d) => {
      val bucketMs = 3600L * 1000
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), expr("ts div 1000000").as("t"))
      val wins = ev.filter(col("event_id") % 50 === 0)
        .select(col("user_id"), col("event_id").as("win_id"),
          col("t").as("w_start"), (col("t") + 6L * 3600 * 1000).as("w_end"))
      val winB = wins.withColumn("bucket",
        explode(sequence(expr(s"w_start div $bucketMs"), expr(s"w_end div $bucketMs"))))
      val evB = ev.withColumn("bucket", expr(s"t div $bucketMs"))
      evB.join(winB, Seq("user_id", "bucket"))
        .filter(col("t") >= col("w_start") && col("t") <= col("w_end"))
        .groupBy(col("win_id"), col("w_start"))
        .agg(count(lit(1)).as("n_events"), min(col("event_id")).as("first_event"))
    }),

    // Top-k per group via the typed Aggregator extension point (§2.10):
    // bounded per-group buffer, map-side combine, ≤ k entries per group
    // and partition cross the shuffle — vs the window form, which
    // sort-shuffles every row. Same output contract as a
    // row_number-over-window ≤ k query; the oracle uses that form.
    "q_topk_agg" -> ((s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .select(col("o_orderstatus"), col("o_orderkey"),
          col("o_totalprice").cast("double"))
        .as[(String, Long, Double)]
        .groupByKey(_._1)
        .mapValues(r => (r._2, r._3))
        .agg(graft.functions.TopKAgg(3).toColumn.name("topk"))
        .flatMap { case (status, top) =>
          top.zipWithIndex.map { case ((price, key), i) =>
            (status, (i + 1).toLong, key, price)
          }
        }
        .toDF("o_orderstatus", "rnk", "o_orderkey", "o_totalprice")
    }),

    // Pivot-style conditional aggregation: priority counts per status.
    "q_pivot_priority" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_orderstatus"))
        .agg(
          sum(when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L)).as("urgent"),
          sum(when(col("o_orderpriority") === "2-HIGH", 1L).otherwise(0L)).as("high"),
          sum(when(col("o_orderpriority") === "3-MEDIUM", 1L).otherwise(0L)).as("medium"),
          sum(when(col("o_orderpriority") === "4-NOT SPECIFIED", 1L).otherwise(0L)).as("notspec"),
          sum(when(col("o_orderpriority") === "5-LOW", 1L).otherwise(0L)).as("low")))
  )

  /** Verify-dump sort keys (see [[graft.Ord]]) — ordering is a property of
    * the oracle dump, not of the operators, so library callers get fully
    * parallel outputs (no SinglePartition funnel at 100 TB).
    */
  def dumpOrder: Map[String, Seq[Column]] = Map(
    "q1_agg"            -> Seq(col("l_returnflag"), col("l_linestatus")),
    "q5_nation_revenue" -> Seq(col("revenue").desc, col("n_name")),
    "q_window_running"  -> Seq(col("o_custkey"), col("rn")),
    "q_setops"          -> Seq(col("op"), col("custkey")),
    "q_semi_join"       -> Seq(col("c_custkey")),
    "q_anti_join"       -> Seq(col("c_custkey")),
    "q_rollup_sales"    -> Seq(col("status"), col("priority")),
    "q_cube_sales"      -> Seq(col("status"), col("priority")),
    "q_grouping_sets"   -> Seq(col("status"), col("priority")),
    "q_approx_distinct" -> Seq(col("o_orderstatus")),
    "q_median_manual"   -> Seq(col("o_orderstatus")),
    "q_window_lag"      -> Seq(col("o_custkey"), col("o_orderkey")),
    "q_distinct_agg"    -> Seq(col("o_orderstatus")),
    "q_pivot_priority"  -> Seq(col("o_orderstatus")),
    "q_asof_join"       -> Seq(col("event_id")),
    "q_sessionize"      -> Seq(col("user_id"), col("session_seq")),
    "q_range_join"      -> Seq(col("win_id")),
    "q_topk_agg"        -> Seq(col("o_orderstatus"), col("rnk"))
  )

  private val rev = "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"
  /** DuckDB long-cents conversion (mirrors the Spark `cents` helper). */
  private def centsDuck(c: String): String = s"CAST(round($c*100) AS BIGINT)"

  def oracle: Map[String, String] = Map(
    "q1_agg" ->
      s"""WITH li AS (
         |  SELECT l_returnflag, l_linestatus,
         |    ${centsDuck("l_quantity")} AS qty_c,
         |    ${centsDuck("l_extendedprice")} AS price_c,
         |    ${centsDuck("l_discount")} AS disc_c,
         |    ${centsDuck("l_tax")} AS tax_c
         |  FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02')
         |SELECT l_returnflag, l_linestatus,
         |  CAST(SUM(qty_c) AS DOUBLE) / CAST(100.0 AS DOUBLE) AS sum_qty,
         |  CAST(SUM(price_c) AS DOUBLE) / CAST(100.0 AS DOUBLE) AS sum_base_price,
         |  CAST(SUM(price_c * (100 - disc_c)) AS DOUBLE) / CAST(10000.0 AS DOUBLE) AS sum_disc_price,
         |  CAST(SUM(price_c * (100 - disc_c) * (100 + tax_c)) AS DOUBLE) / CAST(1000000.0 AS DOUBLE) AS sum_charge,
         |  CAST(SUM(qty_c) AS DOUBLE) / CAST(100.0 AS DOUBLE) / COUNT(*) AS avg_qty,
         |  COUNT(*) AS count_order
         |FROM li
         |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q3_topk_orders" ->
      s"""SELECT o_orderkey, o_orderpriority, CAST(SUM($rev) AS DOUBLE) AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-01-01'
         |  AND l_shipdate > TIMESTAMP '1996-06-30'
         |GROUP BY o_orderkey, o_orderpriority
         |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,

    "q5_nation_revenue" ->
      s"""SELECT n_name, CAST(SUM($rev) AS DOUBLE) AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
         |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,

    "q_window_running" ->
      """SELECT o_custkey, o_orderkey,
        |  row_number() OVER w AS rn,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, rn""".stripMargin,

    "q_topk_parts" ->
      s"""SELECT p_partkey, p_name,
         |  CAST(SUM(${centsDuck("l_extendedprice")} * (100 - ${centsDuck("l_discount")})) AS DOUBLE) / CAST(10000.0 AS DOUBLE) AS revenue
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |GROUP BY p_partkey, p_name
         |ORDER BY revenue DESC, p_partkey LIMIT 10""".stripMargin,

    "q_setops" ->
      """SELECT 'intersect' AS op, custkey FROM (
        |  SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |  INTERSECT SELECT o_custkey FROM orders
        |)
        |UNION ALL
        |SELECT 'except' AS op, custkey FROM (
        |  SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |  EXCEPT SELECT o_custkey FROM orders
        |)
        |ORDER BY op, custkey""".stripMargin,

    "q_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_acctbal < 0 AND EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
        |ORDER BY c_custkey""".stripMargin,

    "q_rollup_sales" ->
      """SELECT COALESCE(o_orderstatus, '(all)') AS status,
        |  COALESCE(o_orderpriority, '(all)') AS priority,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,

    "q6_sql_interface" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |       COUNT(*) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND CAST(l_discount AS DECIMAL(18,2)) BETWEEN 0.03 AND 0.07
        |  AND CAST(l_quantity AS DECIMAL(18,2)) < 24""".stripMargin,

    "q19_disjunctive" ->
      s"""SELECT CAST(SUM($rev) AS DOUBLE) AS revenue, COUNT(*) AS n
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
         |        AND CAST(CAST(l_quantity AS DECIMAL(18,2)) AS DOUBLE) >= 1
         |        AND CAST(CAST(l_quantity AS DECIMAL(18,2)) AS DOUBLE) <= 30)
         |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 30
         |        AND CAST(CAST(l_quantity AS DECIMAL(18,2)) AS DOUBLE) >= 10
         |        AND CAST(CAST(l_quantity AS DECIMAL(18,2)) AS DOUBLE) <= 40)""".stripMargin,

    "q_grouping_sets" ->
      """SELECT COALESCE(o_orderstatus, '(all)') AS status,
        |  COALESCE(o_orderpriority, '(all)') AS priority,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY status, priority""".stripMargin,

    "q_cube_sales" ->
      """SELECT COALESCE(o_orderstatus, '(all)') AS status,
        |  COALESCE(o_orderpriority, '(all)') AS priority,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,

    "q_median_manual" ->
      """SELECT o_orderstatus, median_price FROM (
        |  SELECT o_orderstatus, o_totalprice AS median_price,
        |    row_number() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey) AS rn,
        |    count(*) OVER (PARTITION BY o_orderstatus) AS cnt
        |  FROM orders
        |) WHERE rn = (cnt + 1) // 2 ORDER BY o_orderstatus""".stripMargin,

    "q_window_lag" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST((ms - prev_ms) / 86400000 AS BIGINT) AS days_since_prev
        |FROM (
        |  SELECT o_custkey, o_orderkey, epoch_ms(o_orderdate) AS ms,
        |    lag(epoch_ms(o_orderdate), 1) OVER (PARTITION BY o_custkey ORDER BY epoch_ms(o_orderdate), o_orderkey) AS prev_ms
        |  FROM orders
        |) ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_distinct_agg" ->
      """SELECT o_orderstatus, CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_custs, COUNT(*) AS n_orders
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q17_small_qty_revenue" ->
      s"""WITH li AS (
         |  SELECT l_partkey, ${centsDuck("l_quantity")} AS qty_c,
         |    ${centsDuck("l_extendedprice")} AS price_c
         |  FROM lineitem)
         |SELECT CAST(SUM(price_c) AS DOUBLE) / CAST(100.0 AS DOUBLE) / 7.0 AS avg_yearly
         |FROM li
         |JOIN part ON l_partkey = p_partkey
         |JOIN (
         |  SELECT l_partkey AS ap_partkey,
         |    CAST(SUM(qty_c) AS DOUBLE) / CAST(100.0 AS DOUBLE) / COUNT(*) AS avg_qty
         |  FROM li GROUP BY l_partkey
         |) ON l_partkey = ap_partkey
         |WHERE p_size <= 5
         |  AND CAST(qty_c AS DOUBLE) / CAST(100.0 AS DOUBLE) < 0.2 * avg_qty""".stripMargin,

    "q_topk_agg" ->
      """SELECT o_orderstatus, rnk, o_orderkey, o_totalprice FROM (
        |  SELECT o_orderstatus, o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice,
        |    CAST(row_number() OVER (PARTITION BY o_orderstatus ORDER BY CAST(o_totalprice AS DOUBLE) DESC, o_orderkey) AS BIGINT) AS rnk
        |  FROM orders
        |) WHERE rnk <= 3 ORDER BY o_orderstatus, rnk""".stripMargin,

    "q_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS t FROM events),
        |l AS (SELECT user_id, event_id, t,
        |        lag(t, 1) OVER (PARTITION BY user_id ORDER BY t, event_id) AS prev_t
        |      FROM e),
        |s AS (SELECT user_id, event_id, t,
        |        CAST(SUM(CASE WHEN prev_t IS NULL OR t - prev_t > 21600000 THEN 1 ELSE 0 END)
        |          OVER (PARTITION BY user_id ORDER BY t, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
        |      FROM l)
        |SELECT user_id, session_seq, min(t) AS session_start, max(t) AS session_end, count(*) AS n_events
        |FROM s GROUP BY user_id, session_seq ORDER BY user_id, session_seq""".stripMargin,

    "q_range_join" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS t FROM events),
        |w AS (SELECT user_id, event_id AS win_id, t AS w_start, t + 21600000 AS w_end
        |      FROM e WHERE event_id % 50 = 0)
        |SELECT w.win_id, w.w_start, count(*) AS n_events, min(e.event_id) AS first_event
        |FROM w JOIN e ON e.user_id = w.user_id AND e.t >= w.w_start AND e.t <= w.w_end
        |GROUP BY w.win_id, w.w_start ORDER BY win_id""".stripMargin,

    "q_asof_join" ->
      """WITH ev AS (SELECT event_id, user_id AS k, epoch_ms(ts) AS t FROM events),
        |b AS (
        |  SELECT user_id AS k, epoch_ms(ts) AS t,
        |    max(event_id) AS snap_id, arg_max("value", event_id) AS snap_value
        |  FROM events WHERE event_id % 20 = 0 GROUP BY 1, 2
        |)
        |SELECT e.event_id, e.k AS user_id, e.t AS event_ms,
        |  b.snap_id AS asof_snap_id, b.snap_value AS asof_snap_value
        |FROM ev e ASOF LEFT JOIN b ON e.k = b.k AND e.t >= b.t
        |ORDER BY event_id""".stripMargin,

    "q_pivot_priority" ->
      """SELECT o_orderstatus,
        |  CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS urgent,
        |  CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS high,
        |  CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS medium,
        |  CAST(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END) AS BIGINT) AS notspec,
        |  CAST(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS low
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin
  )
}
