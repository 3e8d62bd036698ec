package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Composite analytics in the classic TPC-H shapes, adapted to the
  * driver's star schema — full multi-join + aggregate + order + limit
  * programs, the queries a reference user would actually run over the
  * archive. All joins follow the broadcast-dims / shuffle-facts split;
  * AQE reorders and sizes the rest. */
object Analytics {

  private def t(n: String)(implicit s: SparkSession, d: String) =
    Tables.t(s, d, n)

  /** Q3 shape — unshipped-order revenue by order for one segment. */
  val qTpchQ3 = Q(
    "q_tpch_q3",
    (sp, dir) => {
      implicit val s: SparkSession = sp
      implicit val d: String = dir
      t("customer").filter(col("c_mktsegment") === "BUILDING")
        .join(t("orders"),
          col("c_custkey") === col("o_custkey") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp_ntz"))
        .join(t("lineitem"),
          col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > lit("1998-01-01").cast("timestamp_ntz"))
        .groupBy(col("o_orderkey"), col("o_orderdate"))
        .agg(round(sum(col("l_extendedprice") *
          (lit(1.0) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    },
    Some("""SELECT o_orderkey, o_orderdate,
              round(sum(l_extendedprice * (1.0 - l_discount)), 2)
                AS revenue
            FROM customer
              JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON o_orderkey = l_orderkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1998-01-01'
              AND l_shipdate > TIMESTAMP '1998-01-01'
            GROUP BY o_orderkey, o_orderdate
            ORDER BY revenue DESC NULLS LAST, o_orderkey NULLS FIRST
            LIMIT 10"""))

  /** Q5 shape — local-supplier revenue per nation inside one region. */
  val qTpchQ5 = Q(
    "q_tpch_q5",
    (sp, dir) => {
      implicit val s: SparkSession = sp
      implicit val d: String = dir
      t("customer")
        .join(t("orders"), col("c_custkey") === col("o_custkey"))
        .join(t("lineitem"), col("o_orderkey") === col("l_orderkey"))
        .join(t("supplier"),
          col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(t("nation")),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t("region")),
          col("n_regionkey") === col("r_regionkey") &&
          col("r_name") === "ASIA")
        .groupBy(col("n_name"))
        .agg(round(sum(col("l_extendedprice") *
          (lit(1.0) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },
    Some("""SELECT n_name,
              round(sum(l_extendedprice * (1.0 - l_discount)), 2)
                AS revenue
            FROM customer
              JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON o_orderkey = l_orderkey
              JOIN supplier ON l_suppkey = s_suppkey
                           AND c_nationkey = s_nationkey
              JOIN nation ON s_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
            GROUP BY n_name
            ORDER BY revenue DESC NULLS LAST, n_name NULLS FIRST"""))

  /** Q10 shape — returned-item revenue attribution per customer. */
  val qTpchQ10 = Q(
    "q_tpch_q10",
    (sp, dir) => {
      implicit val s: SparkSession = sp
      implicit val d: String = dir
      t("customer")
        .join(t("orders"), col("c_custkey") === col("o_custkey"))
        .join(t("lineitem"),
          col("o_orderkey") === col("l_orderkey") &&
          col("l_returnflag") === "R")
        .join(broadcast(t("nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"),
          col("c_acctbal"))
        .agg(round(sum(col("l_extendedprice") *
          (lit(1.0) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },
    Some("""SELECT c_custkey, c_name, n_name, c_acctbal,
              round(sum(l_extendedprice * (1.0 - l_discount)), 2)
                AS revenue
            FROM customer
              JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON o_orderkey = l_orderkey
              JOIN nation ON c_nationkey = n_nationkey
            WHERE l_returnflag = 'R'
            GROUP BY c_custkey, c_name, n_name, c_acctbal
            ORDER BY revenue DESC NULLS LAST, c_custkey NULLS FIRST
            LIMIT 20"""))

  /** Re-aggregatable distinct via HLL sketches (q_agg_hll_merge): build
    * one sketch per event_type, then UNION the sketches for the global
    * estimate — the 100 TB pattern where per-partition/per-day sketches
    * are stored once and merged at query time instead of re-scanning raw
    * keys. No oracle (sketch bytes are estimator-specific); ScalaTest
    * bounds the union estimate against the exact distinct count. */
  val qAggHllMerge = Q(
    "q_agg_hll_merge",
    (sp, dir) => {
      val sketches = Tables.t(sp, dir, "events")
        .groupBy(col("event_type"))
        .agg(expr("hll_sketch_agg(user_id)").as("sk"))
      val perType = sketches
        .select(col("event_type").as("scope"),
          expr("hll_sketch_estimate(sk)").as("est_users"))
      val overall = sketches
        .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est_users"))
        .select(lit("__union__").as("scope"), col("est_users"))
      perType.unionAll(overall).orderBy(col("scope"))
    },
    None)

  /** Time-series resample + forward fill (q_resample_ffill): snap each
    * board's signal to an hourly grid over its own [first, last] span
    * and carry the last observation forward through empty hours — the
    * gap-filling step before any rate/trend analytic. Grid generation is
    * a per-key sequence explode (no cross join against a calendar
    * table); the fill is one window pass. */
  val qResampleFfill = Q(
    "q_resample_ffill",
    (sp, dir) => {
      import org.apache.spark.sql.expressions.Window
      val hourly = Tables.t(sp, dir, "events")
        .filter(col("user_id") < 8)
        .groupBy(col("user_id"),
          date_trunc("hour", col("ts")).cast("timestamp_ntz").as("h"))
        .agg(round(avg(col("value")), 6).as("v"),
          count(lit(1)).as("n_obs"))
      val grid = hourly.groupBy(col("user_id"))
        .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
        .select(col("user_id"),
          explode(expr("sequence(h0, h1, interval 1 hour)")).as("h"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("h"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(hourly, Seq("user_id", "h"), "left")
        .select(col("user_id"), col("h"),
          last(col("v"), ignoreNulls = true).over(w).as("v_ffill"),
          coalesce(col("n_obs"), lit(0L)).as("n_obs"))
        .orderBy(col("user_id"), col("h"))
    },
    Some("""WITH hourly AS (
              SELECT user_id, time_bucket(INTERVAL '1 hour', ts) AS h,
                round(avg(value), 6) AS v, count(*) AS n_obs
              FROM events WHERE user_id < 8
              GROUP BY user_id, h),
            grid AS (
              SELECT user_id, unnest(generate_series(min(h), max(h),
                INTERVAL '1 hour')) AS h
              FROM hourly GROUP BY user_id)
            SELECT g.user_id, g.h,
              last_value(v IGNORE NULLS) OVER (
                PARTITION BY g.user_id ORDER BY g.h
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS v_ffill,
              coalesce(n_obs, 0) AS n_obs
            FROM grid g LEFT JOIN hourly USING (user_id, h)
            ORDER BY g.user_id NULLS FIRST, g.h NULLS FIRST"""))

  /** SCD2 validity intervals (q_scd2): collapse each board's event-type
    * stream into change rows with [valid_from, valid_to) windows and an
    * is_current flag — the slowly-changing-dimension shape a warehouse
    * merge emits. Two window passes (change detection, then interval
    * close-off), both over the same (user_id | ts, event_id) shuffle. */
  val qScd2 = Q(
    "q_scd2",
    (sp, dir) => {
      import org.apache.spark.sql.expressions.Window
      val wLag = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val changes = Tables.t(sp, dir, "events")
        .filter(col("user_id") < 50)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"))
        .withColumn("prev_type", lag(col("event_type"), 1).over(wLag))
        .filter(col("prev_type").isNull ||
          col("prev_type") =!= col("event_type"))
      changes
        .withColumn("valid_to", lead(col("ts"), 1).over(wLag))
        .select(col("user_id"), col("event_type"),
          col("ts").as("valid_from"), col("valid_to"),
          col("valid_to").isNull.as("is_current"))
        .orderBy(col("user_id"), col("valid_from"), col("event_type"))
    },
    Some("""WITH changes AS (
              SELECT user_id, ts, event_id, event_type
              FROM (SELECT user_id, ts, event_id, event_type,
                      lag(event_type) OVER w AS prev_type
                    FROM events WHERE user_id < 50
                    WINDOW w AS (PARTITION BY user_id
                                 ORDER BY ts, event_id))
              WHERE prev_type IS NULL OR prev_type != event_type)
            SELECT user_id, event_type, ts AS valid_from,
              lead(ts) OVER w AS valid_to,
              lead(ts) OVER w IS NULL AS is_current
            FROM changes
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ORDER BY user_id NULLS FIRST, valid_from NULLS FIRST,
              event_type NULLS FIRST"""))

  /** Q1 shape — the pricing-summary report: one full-fact scan into a
    * grouped aggregate over a 6-value key. THE map-side-combine
    * benchmark: partial aggregation collapses each partition to ≤6
    * rows before the shuffle, so the exchange is constant-size at any
    * scale. */
  val qTpchQ1 = Q(
    "q_tpch_q1",
    (sp, dir) => {
      implicit val s: SparkSession = sp
      implicit val d: String = dir
      t("lineitem")
        .filter(col("l_shipdate") <=
          lit("1998-09-01").cast("timestamp_ntz"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
            .as("sum_disc_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * (lit(1.0) + col("l_tax"))), 2).as("sum_charge"),
          round(avg(col("l_quantity")), 6).as("avg_qty"),
          round(avg(col("l_extendedprice")), 6).as("avg_price"),
          round(avg(col("l_discount")), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    Some("""SELECT l_returnflag, l_linestatus,
              round(sum(l_quantity), 2) AS sum_qty,
              round(sum(l_extendedprice), 2) AS sum_base_price,
              round(sum(l_extendedprice * (1.0 - l_discount)), 2)
                AS sum_disc_price,
              round(sum(l_extendedprice * (1.0 - l_discount)
                * (1.0 + l_tax)), 2) AS sum_charge,
              round(avg(l_quantity), 6) AS avg_qty,
              round(avg(l_extendedprice), 6) AS avg_price,
              round(avg(l_discount), 6) AS avg_disc,
              count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-01'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"""))

  /** Q18 shape — large-volume customers: aggregate the fact table,
    * filter on the aggregate (HAVING), then join the qualifying keys
    * BACK to the dimensions. The having-set is tiny, so the join back
    * is a broadcast — the scale contract is one fact shuffle (the
    * per-order agg) and no second fact pass. */
  val qTpchQ18 = Q(
    "q_tpch_q18",
    (sp, dir) => {
      implicit val s: SparkSession = sp
      implicit val d: String = dir
      val bigOrders = t("lineitem")
        .groupBy(col("l_orderkey"))
        .agg(round(sum(col("l_quantity")), 2).as("sum_qty"))
        .filter(col("sum_qty") > 300.0)
      t("orders")
        .join(org.apache.spark.sql.functions.broadcast(bigOrders),
          col("o_orderkey") === col("l_orderkey"))
        .join(t("customer"), col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20)
    },
    Some("""SELECT c_custkey, c_name, o_orderkey, o_orderdate,
              o_totalprice, sum_qty
            FROM (SELECT l_orderkey, round(sum(l_quantity), 2) AS sum_qty
                  FROM lineitem GROUP BY l_orderkey
                  HAVING round(sum(l_quantity), 2) > 300.0) big
              JOIN orders ON o_orderkey = l_orderkey
              JOIN customer ON o_custkey = c_custkey
            ORDER BY o_totalprice DESC NULLS LAST, o_orderkey NULLS FIRST
            LIMIT 20"""))

  /** Ordered conversion funnel (q_funnel): view → click → purchase,
    * each stage's timestamp strictly after the previous stage's — the
    * product-analytics query behind every activation dashboard. Shape:
    * three keyed min-aggregates chained by per-user joins; every join
    * key is user_id, so at scale the three stages co-partition on one
    * shuffle key and the stage tables only ever shrink. */
  val qFunnel = Q(
    "q_funnel",
    (sp, dir) => {
      implicit val s: SparkSession = sp
      implicit val d: String = dir
      val ev = t("events").select(col("user_id"), col("event_type"),
        col("ts"))
      val v = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("v_ts"))
      val c = ev.filter(col("event_type") === "click")
        .join(v, "user_id").filter(col("ts") > col("v_ts"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("c_ts"))
      val p = ev.filter(col("event_type") === "purchase")
        .join(c, "user_id").filter(col("ts") > col("c_ts"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("p_ts"))
      val stages = Seq(("1_view", v), ("2_click", c), ("3_purchase", p))
      stages.map { case (name, df) =>
        df.agg(count(lit(1)).as("n_users"))
          .select(lit(name).as("stage"), col("n_users"))
      }.reduce(_ unionAll _).orderBy(col("stage"))
    },
    Some("""WITH v AS (
              SELECT user_id, min(ts) AS v_ts FROM events
              WHERE event_type = 'view' GROUP BY user_id),
            c AS (
              SELECT e.user_id, min(e.ts) AS c_ts
              FROM events e JOIN v ON e.user_id = v.user_id
              WHERE e.event_type = 'click' AND e.ts > v.v_ts
              GROUP BY e.user_id),
            p AS (
              SELECT e.user_id, min(e.ts) AS p_ts
              FROM events e JOIN c ON e.user_id = c.user_id
              WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
              GROUP BY e.user_id)
            SELECT '1_view' AS stage, count(*) AS n_users FROM v
            UNION ALL
            SELECT '2_click', count(*) FROM c
            UNION ALL
            SELECT '3_purchase', count(*) FROM p
            ORDER BY stage NULLS FIRST"""))

  /** Weekly cohort retention (q_retention): users grouped by
    * first-activity week, counted per (cohort_week, weeks-since-cohort)
    * — the retention-matrix query. Two keyed aggregates: first-activity
    * per user (one shuffle by user), then a distinct count per
    * (cohort, offset) cell; the matrix output is weeks² rows whatever
    * the event volume. */
  val qRetention = Q(
    "q_retention",
    (sp, dir) => {
      implicit val s: SparkSession = sp
      implicit val d: String = dir
      val acts = t("events")
        .select(col("user_id"),
          expr("datediff(CAST(ts AS DATE), DATE'2024-01-01') div 7")
            .cast("long").as("week"))
        .distinct()
      val cohorts = acts.groupBy(col("user_id"))
        .agg(min(col("week")).as("cohort_week"))
      acts.join(cohorts, "user_id")
        .groupBy(col("cohort_week"),
          (col("week") - col("cohort_week")).as("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("cohort_week"), col("week_offset"))
    },
    Some("""WITH acts AS (
              SELECT DISTINCT user_id,
                CAST(date_diff('day', DATE '2024-01-01',
                  CAST(ts AS DATE)) // 7 AS BIGINT) AS week
              FROM events),
            cohorts AS (
              SELECT user_id, min(week) AS cohort_week
              FROM acts GROUP BY user_id)
            SELECT c.cohort_week, a.week - c.cohort_week AS week_offset,
              count(DISTINCT a.user_id) AS n_users
            FROM acts a JOIN cohorts c ON a.user_id = c.user_id
            GROUP BY c.cohort_week, week_offset
            ORDER BY c.cohort_week NULLS FIRST, week_offset NULLS FIRST"""))

  val all: Seq[Q] = Seq(qTpchQ3, qTpchQ5, qTpchQ10, qAggHllMerge,
    qResampleFfill, qScd2, qTpchQ1, qTpchQ18, qFunnel, qRetention)
}
