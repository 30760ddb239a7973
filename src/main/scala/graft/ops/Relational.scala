package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational operator coverage over the TPC-H-ish testdata: scan+filter,
  * hash/broadcast joins, partial aggregation, windows, sort+limit, semi/anti
  * joins, distinct aggregation, conditional aggregation, union.
  *
  * Scale notes (100 TB design): dimension tables (region/nation/supplier and
  * sf-scaled customer) are broadcast explicitly so the big fact joins never
  * shuffle the small side; aggregations rely on Spark's partial (map-side)
  * aggregation; sort+limit uses TakeOrderedAndProject (no full sort).
  */
object Relational {
  import Tables.t

  private def lineitem(s: SparkSession, d: String) = t(s, d, "lineitem")
  private def orders(s: SparkSession, d: String)   = t(s, d, "orders")

  /** q20's grouped-quantile aggregation with the 100 TB swap: `approx =
    * true` selects `approx_percentile` at [[Sampling.ApproxAccuracy]] (a
    * bounded-memory sketch with map-side partials) over the exact
    * `percentile` (a per-group O(n) sorted buffer) — same plan shape,
    * same output columns. The exact path stays the oracle; the approx
    * path's rank-error band (each returned value is an actual price whose
    * rank sits within ±1/accuracy quantiles of the target) is pinned in
    * SamplingSpec, the sp15 convention.
    *
    * Raw doubles, no round(): both engines interpolate lo + (hi-lo)*frac
    * on identical inputs, so the values agree to the last ulp, while a
    * 2dp round can flip on a value 1 ulp below a .xx5 boundary (seen at
    * sf0.001: 52724.244999999995 rounded .24 by Spark, .25 by DuckDB).
    * The driver compares floats at 6dp, which absorbs ulp-level noise. */
  private[ops] def priceQuantiles(li: DataFrame, approx: Boolean = false): DataFrame = {
    // one percentile aggregate with an array of targets: a single
    // per-group buffer (or sketch) instead of four
    val ps =
      if (approx) expr("approx_percentile(l_extendedprice, " +
        s"array(0.25D, 0.5D, 0.75D, 0.95D), ${Sampling.ApproxAccuracy})")
      else expr("percentile(l_extendedprice, array(0.25D, 0.5D, 0.75D, 0.95D))")
    li.groupBy(col("l_returnflag"))
      .agg(ps.as("ps"))
      .select(col("l_returnflag"),
        get(col("ps"), lit(0)).cast("double").as("p25"),
        get(col("ps"), lit(1)).cast("double").as("p50"),
        get(col("ps"), lit(2)).cast("double").as("p75"),
        get(col("ps"), lit(3)).cast("double").as("p95"))
      .orderBy(col("l_returnflag"))
  }

  val entries: Seq[Q] = Seq(
    // ---- q01: TPC-H Q1-style pricing summary (partial agg, single shuffle) ----
    Q("q01_pricing_summary",
      (s, d) => {
        val l = lineitem(s, d).filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        l.groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            round(sum(col("l_quantity")), 2).as("sum_qty"),
            round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
            round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
            round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
            round(avg(col("l_quantity")), 4).as("avg_qty"),
            round(avg(col("l_extendedprice")), 4).as("avg_price"),
            round(avg(col("l_discount")), 4).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
        round(sum(l_quantity),2) AS sum_qty,
        round(sum(l_extendedprice),2) AS sum_base_price,
        round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
        round(sum(l_extendedprice*(1-l_discount)*(1+l_tax)),2) AS sum_charge,
        round(avg(l_quantity),4) AS avg_qty,
        round(avg(l_extendedprice),4) AS avg_price,
        round(avg(l_discount),4) AS avg_disc,
        count(*) AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""")),

    // ---- q02: cheapest supplier per (filtered) part — broadcast dims + ----
    // ---- one window shuffle keyed on the part ----
    Q("q02_cheapest_supplier",
      (s, d) => {
        val li = lineitem(s, d).select(col("l_partkey"), col("l_suppkey"),
          (col("l_extendedprice") / col("l_quantity")).as("unit_price"))
        val pt = t(s, d, "part").filter(col("p_size") >= 40)
          .select(col("p_partkey"), col("p_name"))
        val sup = t(s, d, "supplier").select(col("s_suppkey"), col("s_name"))
        val w = Window.partitionBy(col("p_partkey"))
          .orderBy(col("unit_price"), col("l_suppkey"))
        li.join(broadcast(pt), col("l_partkey") === col("p_partkey"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .select(col("p_partkey"), col("p_name"), col("s_name"), col("unit_price"))
          .orderBy(col("p_partkey"))
      },
      Some("""WITH j AS (
          SELECT p_partkey, p_name, l_suppkey,
            l_extendedprice / l_quantity AS unit_price,
            row_number() OVER (PARTITION BY p_partkey
              ORDER BY l_extendedprice / l_quantity, l_suppkey) AS rn
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE p_size >= 40)
        SELECT p_partkey, p_name, s_name, unit_price
        FROM j JOIN supplier ON l_suppkey = s_suppkey
        WHERE rn = 1 ORDER BY p_partkey""")),

    // ---- q04: EXISTS-subquery as a left-semi join — orders with a late ----
    // ---- shipment (> 60 days after order date), counted per priority ----
    Q("q04_late_shipment_priority",
      (s, d) => {
        val o = orders(s, d)
        val li = lineitem(s, d).select(col("l_orderkey"), col("l_shipdate"))
        o.join(li, col("o_orderkey") === col("l_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"), "left_semi")
          .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("order_count"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""SELECT o_orderpriority, count(*) AS order_count
        FROM orders o WHERE EXISTS (SELECT 1 FROM lineitem
          WHERE l_orderkey = o.o_orderkey
            AND l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ---- q06: forecast revenue — scan-with-pushed-filters + single agg, ----
    // ---- no join at all (the pure filter-agg shape) ----
    Q("q06_forecast_revenue",
      (s, d) => lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        // rounded 2dp: a 12k-term double SUM is summation-order-dependent
        // (partial-agg merge order), unlike the bit-identical per-row values
        // elsewhere — same convention as every other SUM oracle in this file
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue")),
      Some("""SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""")),

    // ---- q03: shipping priority (broadcast dim join + agg + top-k) ----
    Q("q03_shipping_priority",
      (s, d) => {
        val c = broadcast(t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING"))
        val o = orders(s, d).filter(col("o_orderdate") < lit("1998-03-15").cast("timestamp"))
        val l = lineitem(s, d).filter(col("l_shipdate") > lit("1998-03-15").cast("timestamp"))
        c.join(o, col("c_custkey") === col("o_custkey"))
          .join(l, col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
          .select(col("o_orderkey"), col("revenue"),
            col("o_orderdate").cast("date").as("orderdate"), col("o_orderpriority"))
          .orderBy(col("revenue").desc, col("o_orderkey")).limit(10)
      },
      Some("""SELECT o_orderkey, round(sum(l_extendedprice*(1-l_discount)),2) AS revenue,
        CAST(o_orderdate AS DATE) AS orderdate, o_orderpriority
        FROM customer JOIN orders ON c_custkey = o_custkey JOIN lineitem ON o_orderkey = l_orderkey
        WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-03-15' AND l_shipdate > TIMESTAMP '1998-03-15'
        GROUP BY o_orderkey, orderdate, o_orderpriority
        ORDER BY revenue DESC, o_orderkey LIMIT 10""")),

    // ---- q05: 5-way join, revenue by customer nation in ASIA ----
    Q("q05_region_revenue",
      (s, d) => {
        val r = broadcast(t(s, d, "region").filter(col("r_name") === "ASIA"))
        val n = broadcast(t(s, d, "nation"))
        // customer scales with SF (15M rows at sf100) — no forced hint; the
        // planner/AQE broadcasts while it fits the threshold and degrades to a
        // shuffle join beyond it instead of OOMing the driver. region/nation
        // are constant-size (5/25 rows) at every SF, so their hints are safe.
        val c = t(s, d, "customer")
        val o = orders(s, d).filter(
          col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") <  lit("1998-01-01").cast("timestamp"))
        r.join(n, col("n_regionkey") === col("r_regionkey"))
          .join(c, col("c_nationkey") === col("n_nationkey"))
          .join(o, col("o_custkey") === col("c_custkey"))
          .join(lineitem(s, d), col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("n_name"))
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
          .orderBy(col("revenue").desc, col("n_name"))
      },
      Some("""SELECT n_name, round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
        FROM region JOIN nation ON n_regionkey = r_regionkey
          JOIN customer ON c_nationkey = n_nationkey
          JOIN orders ON o_custkey = c_custkey
          JOIN lineitem ON l_orderkey = o_orderkey
        WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY n_name ORDER BY revenue DESC, n_name""")),

    // ---- q07: window function — each customer's single largest order ----
    Q("q07_top_order_per_customer",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        orders(s, d)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("o_custkey").as("custkey"), col("o_orderkey").as("orderkey"),
            round(col("o_totalprice"), 2).as("total"))
          .orderBy(col("custkey"))
      },
      Some("""SELECT o_custkey AS custkey, o_orderkey AS orderkey, round(o_totalprice,2) AS total
        FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders)
        WHERE rn = 1 ORDER BY custkey""")),

    // ---- q08: global sort + limit (TakeOrderedAndProject, no full sort at scale) ----
    Q("q08_top_orders",
      (s, d) => orders(s, d)
        .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("total"), col("o_orderstatus"))
        .orderBy(col("total").desc, col("o_orderkey")).limit(20),
      Some("""SELECT o_orderkey, round(o_totalprice,2) AS total, o_orderstatus
        FROM orders ORDER BY total DESC, o_orderkey LIMIT 20""")),

    // ---- q09: distinct aggregation ----
    Q("q09_distinct_customers",
      (s, d) => orders(s, d).groupBy(col("o_orderstatus"))
        .agg(countDistinct(col("o_custkey")).as("n_cust"), count(lit(1)).as("n_orders"))
        .orderBy(col("o_orderstatus")),
      Some("""SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_cust, count(*) AS n_orders
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // ---- q10: anti join — customers with no orders ----
    Q("q10_customers_without_orders",
      (s, d) => t(s, d, "customer")
        .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey, c_name FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders) ORDER BY c_custkey""")),

    // ---- q11: semi join — customers with a pending order ----
    Q("q11_customers_with_pending",
      (s, d) => t(s, d, "customer")
        .join(orders(s, d).filter(col("o_orderstatus") === "P"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey, c_name FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
        ORDER BY c_custkey""")),

    // ---- q12: group + having ----
    Q("q12_frequent_customers",
      (s, d) => orders(s, d).groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("order_count"), round(sum(col("o_totalprice")), 2).as("total_spent"))
        .filter(col("order_count") > 12)
        .orderBy(col("o_custkey")),
      Some("""SELECT o_custkey, count(*) AS order_count, round(sum(o_totalprice),2) AS total_spent
        FROM orders GROUP BY o_custkey HAVING count(*) > 12 ORDER BY o_custkey""")),

    // ---- q13: conditional aggregation ----
    Q("q13_conditional_agg",
      (s, d) => lineitem(s, d).groupBy(col("l_returnflag"))
        .agg(
          round(sum(when(col("l_discount") > 0.05, col("l_extendedprice")).otherwise(lit(0.0))), 2).as("high_disc_price"),
          sum(when(col("l_quantity") > 25, lit(1L)).otherwise(lit(0L))).as("big_qty_cnt"))
        .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag,
        round(sum(CASE WHEN l_discount > 0.05 THEN l_extendedprice ELSE 0 END),2) AS high_disc_price,
        CAST(sum(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END) AS BIGINT) AS big_qty_cnt
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- q14: union all ----
    Q("q14_union_entities",
      (s, d) => t(s, d, "customer").select(col("c_custkey").as("id"), lit("customer").as("kind"))
        .unionAll(t(s, d, "supplier").select(col("s_suppkey").as("id"), lit("supplier").as("kind")))
        .orderBy(col("kind"), col("id")),
      Some("""SELECT c_custkey AS id, 'customer' AS kind FROM customer
        UNION ALL SELECT s_suppkey AS id, 'supplier' AS kind FROM supplier
        ORDER BY kind, id""")),

    // ---- q17: small-quantity revenue vs per-part average (TPC-H Q17 shape:
    //      self-join against an aggregated subquery; both sides shuffle on
    //      l_partkey once, AQE picks the join strategy) ----
    Q("q17_small_quantity",
      (s, d) => {
        val l = lineitem(s, d)
        val avgQ = l.groupBy(col("l_partkey").as("pk"))
          .agg((avg(col("l_quantity")) * 0.2).as("lim"))
        l.join(avgQ, col("l_partkey") === col("pk"))
          .filter(col("l_quantity") < col("lim"))
          .agg(round(sum(col("l_extendedprice")) / 7.0, 2).as("avg_yearly"))
      },
      Some("""SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
        FROM lineitem, (SELECT l_partkey AS pk, 0.2 * avg(l_quantity) AS lim
                        FROM lineitem GROUP BY l_partkey) a
        WHERE l_partkey = pk AND l_quantity < lim""")),

    // ---- q18: running total per customer (window frame: rows unbounded preceding) ----
    Q("q18_running_total",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        orders(s, d)
          .filter(col("o_custkey") <= 100)
          .select(col("o_custkey").as("custkey"), col("o_orderkey").as("orderkey"),
            round(sum(col("o_totalprice")).over(w), 2).as("running"))
          .orderBy(col("custkey"), col("orderkey"))
      },
      Some("""SELECT o_custkey AS custkey, o_orderkey AS orderkey,
        round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running
        FROM orders WHERE o_custkey <= 100 ORDER BY custkey, orderkey""")),

    // ---- q16: hierarchical rollup (GROUPING SETS — one shuffle, Expand) ----
    Q("q16_rollup",
      (s, d) => orders(s, d)
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
        .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first),
      Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        round(sum(o_totalprice),2) AS total
        FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""")),

    // ---- q19: skew-mitigated fact-dim join via explicit salting ----
    // events.user_id is a skewable join key: the dim side is replicated
    // SALT times with a salt column, the fact side hashes into a salt bucket,
    // and the join runs on (key, salt) — the manual form of what AQE's skew
    // join does, kept explicit here so the oracle pins correctness of the
    // technique (results identical to the unsalted join).
    Q("q19_salted_join",
      (s, d) => {
        val salt = 8
        val fact = t(s, d, "events")
          .withColumn("salt", pmod(xxhash64(col("event_id")), lit(salt)).cast("int"))
        val dim = t(s, d, "customer")
          .select(col("c_custkey"), col("c_mktsegment"),
            explode(sequence(lit(0), lit(salt - 1))).as("salt"))
        fact.join(dim, col("user_id") === col("c_custkey") && fact("salt") === dim("salt"))
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
          .orderBy(col("c_mktsegment"))
      },
      Some("""SELECT c_mktsegment, count(*) AS n, round(sum(value),2) AS sum_value
        FROM events JOIN customer ON user_id = c_custkey
        GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    // ---- q15: event-time daily rollup (streaming-shaped agg in batch) ----
    Q("q15_events_daily",
      (s, d) => {
        val ev = t(s, d, "events")
        // normalize ts to a UTC-instant timestamp from the fixture's actual
        // type (Tables.eventsTsTimestamp handles both generations)
        ev.withColumn("ts", Tables.eventsTsTimestamp(ev))
      }
        .groupBy(date_trunc("day", col("ts")).cast("date").as("day"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
        .orderBy(col("day"), col("event_type")),
      Some("""SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
        count(*) AS n, round(sum(value),2) AS sum_value
        FROM events GROUP BY day, event_type ORDER BY day, event_type""")),

    // ---- q20: exact grouped quantiles (continuous interpolation) ----
    // Exact `percentile` rather than approx_percentile so DuckDB's
    // quantile_cont (same linear-interpolation definition) is an exact oracle;
    // partial aggregation still applies (per-group sorted buffers merge
    // map-side). For 100 TB pipelines `approx = true` is the drop-in swap
    // on the same plan shape ([[priceQuantiles]] — rank band pinned in
    // SamplingSpec, the sp15 convention).
    Q("q20_quantiles",
      (s, d) => priceQuantiles(t(s, d, "lineitem")),
      Some("""SELECT l_returnflag,
          quantile_cont(l_extendedprice, 0.25) AS p25,
          quantile_cont(l_extendedprice, 0.5) AS p50,
          quantile_cont(l_extendedprice, 0.75) AS p75,
          quantile_cont(l_extendedprice, 0.95) AS p95
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- q21: per-customer order momentum (lag + sliding-frame average) ----
    // The remaining window-function family q18's prefix sum doesn't cover:
    // offset functions (lag) and a BOUNDED sliding frame (3-order moving
    // average) over the same per-customer sequence — the order-velocity
    // report shape. One shuffle on o_custkey; every window is partitioned
    // (parallel at any customer count, no global frame). The customer
    // filter pushes to the parquet scan. prev_price uses a 0.0 sentinel,
    // not NULL: a nullable double would NaN-poison the driver's float
    // compare (the dd12 lesson). Raw doubles, no round() — both engines
    // average the same 3 values; the driver's 6dp compare absorbs ulp noise
    // (the q20 argument).
    Q("q21_order_momentum",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        val wm = w.rowsBetween(-2, Window.currentRow)
        orders(s, d)
          .filter(col("o_custkey") <= 100)
          .select(col("o_custkey").as("custkey"), col("o_orderkey").as("orderkey"),
            col("o_totalprice").as("price"),
            coalesce(lag(col("o_totalprice"), 1).over(w), lit(0.0)).as("prev_price"),
            avg(col("o_totalprice")).over(wm).as("ma3"))
          .withColumn("delta", col("price") - col("prev_price"))
          .orderBy(col("custkey"), col("orderkey"))
      },
      Some("""SELECT o_custkey AS custkey, o_orderkey AS orderkey,
          o_totalprice AS price,
          coalesce(lag(o_totalprice) OVER (PARTITION BY o_custkey
            ORDER BY o_orderdate, o_orderkey), 0.0) AS prev_price,
          avg(o_totalprice) OVER (PARTITION BY o_custkey
            ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS ma3,
          o_totalprice - coalesce(lag(o_totalprice) OVER (PARTITION BY o_custkey
            ORDER BY o_orderdate, o_orderkey), 0.0) AS delta
        FROM orders WHERE o_custkey <= 100
        ORDER BY custkey, orderkey""")),

    // ---- q22: pivot (groupBy().pivot() — the Expand-based reshape) ----
    // The reporting reshape the DataFrame API compiles into ONE pass:
    // explicit pivot values keep the plan static (no extra collect job to
    // discover them — at 100 TB value discovery is a full scan; a reporting
    // pivot always knows its columns). na.fill(0.0) mirrors the oracle's
    // coalesce so no nullable double reaches the driver hasher (dd12 note).
    Q("q22_status_pivot",
      (s, d) => orders(s, d)
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(round(sum(col("o_totalprice")), 2))
        .na.fill(0.0, Seq("F", "O", "P"))
        .orderBy(col("o_orderpriority")),
      Some("""SELECT o_orderpriority,
          coalesce(round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2), 0.0) AS F,
          coalesce(round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2), 0.0) AS O,
          coalesce(round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 2), 0.0) AS P
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ---- q23: q20's 100 TB APPROX path, driver-gated ----
    // q20's oracle checks only the exact-percentile aggregation; the
    // `approx = true` swap (approx_percentile's bounded-memory sketch with
    // map-side partials — what a 100 TB deployment actually runs) had only
    // a spec pin. This row RUNS it and emits the sketch's rank-band
    // contract as bf03-style within_bound booleans: the 3-row approx
    // result broadcasts back onto lineitem, one conditional-sum pass
    // collects lt/le rank stats per (flag, quantile), and
    // Sampling.withinRankBand applies the published ±1/accuracy band —
    // deterministic on fixed data, so the oracle is per-flag group sizes
    // plus literal TRUEs. Two shuffles total (the sketch agg + the stats
    // agg), both partial-aggregated; nothing holds a per-group buffer.
    Q("q23_quantile_band",
      (s, d) => {
        val li = lineitem(s, d).select(col("l_returnflag"), col("l_extendedprice"))
        val ap = priceQuantiles(li, approx = true)
        val qs = Seq("p25" -> 0.25, "p50" -> 0.5, "p75" -> 0.75, "p95" -> 0.95)
        val stats = qs.flatMap { case (c, _) =>
          val (lt, le) = Sampling.rankStats(col("l_extendedprice"), col(c))
          Seq(lt.as(s"lt_$c"), le.as(s"le_$c"))
        }
        val g = li.join(broadcast(ap), Seq("l_returnflag"))
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"), stats: _*)
        g.select(col("l_returnflag") +: col("n") +: qs.map { case (c, q) =>
            Sampling.withinRankBand(q, col(s"lt_$c"), col(s"le_$c"),
              col("n")).as(s"wb_$c")
          }: _*)
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag, count(*) AS n,
          TRUE AS wb_p25, TRUE AS wb_p50, TRUE AS wb_p75, TRUE AS wb_p95
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))
  )
}
