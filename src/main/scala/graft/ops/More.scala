package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Completion sweep beyond the SURVEY §2 minimum: the remaining join
  * shapes (full outer, cross), reshaping operators (pivot/unpivot),
  * collected aggregates, ranking-distribution windows, scalar
  * subqueries — everything a reference user would reach for next. */
object More {

  private def ev(s: SparkSession, d: String) = Tables.t(s, d, "events")
  private def ord(s: SparkSession, d: String) = Tables.t(s, d, "orders")

  /** Full outer join: per-user click vs purchase counts, nulls on both
    * sides — the complete reconciliation shape. */
  val qJoinFull = Q(
    "q_join_full",
    (s, d) => {
      val e = ev(s, d)
      val clicks = e.filter(col("event_type") === "click")
        .groupBy(col("user_id").as("cu")).agg(count(lit(1)).as("n_clicks"))
      val purchases = e.filter(col("event_type") === "purchase")
        .groupBy(col("user_id").as("pu")).agg(count(lit(1)).as("n_purchases"))
      clicks.join(purchases, col("cu") === col("pu"), "full_outer")
        .select(
          coalesce(col("cu"), col("pu")).as("user_id"),
          coalesce(col("n_clicks"), lit(0L)).as("n_clicks"),
          coalesce(col("n_purchases"), lit(0L)).as("n_purchases"))
        .orderBy(col("user_id"))
    },
    Some("""SELECT coalesce(cu, pu) AS user_id,
              coalesce(n_clicks, 0) AS n_clicks,
              coalesce(n_purchases, 0) AS n_purchases
            FROM (SELECT user_id AS cu, count(*) AS n_clicks FROM events
                  WHERE event_type = 'click' GROUP BY user_id) c
            FULL OUTER JOIN
                 (SELECT user_id AS pu, count(*) AS n_purchases FROM events
                  WHERE event_type = 'purchase' GROUP BY user_id) p
              ON cu = pu
            ORDER BY user_id NULLS FIRST"""))

  /** Explicit cartesian product over two tiny dims (region × the
    * event-type domain) — the only place a cross join belongs. */
  val qJoinCross = Q(
    "q_join_cross",
    (s, d) => {
      val r = Tables.t(s, d, "region").select(col("r_name"))
      val t = ev(s, d).select(col("event_type")).distinct()
      r.crossJoin(t).orderBy(col("r_name"), col("event_type"))
    },
    Some("""SELECT r_name, event_type
            FROM region CROSS JOIN
                 (SELECT DISTINCT event_type FROM events) t
            ORDER BY r_name NULLS FIRST, event_type NULLS FIRST"""))

  /** Pivot: users × event-type count matrix — the 16×16-matrix packed
    * form (SURVEY §1.2 D4: "pivot only at the edge"). */
  val qPivot = Q(
    "q_pivot",
    (s, d) =>
      ev(s, d)
        .groupBy(col("user_id"))
        .pivot("event_type",
          Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy(col("user_id")),
    Some("""SELECT user_id,
              count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
              count(CASE WHEN event_type = 'error' THEN 1 END) AS error,
              count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
              count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
              count(CASE WHEN event_type = 'view' THEN 1 END) AS "view"
            FROM events GROUP BY user_id
            ORDER BY user_id NULLS FIRST"""))

  /** Unpivot (stack): wide per-pixel calibration back to long rows —
    * the inverse edge transform. */
  val qUnpivot = Q(
    "q_unpivot",
    (s, d) =>
      ev(s, d)
        .groupBy(col("user_id"))
        .agg(
          round(min(col("value")), 2).as("v_min"),
          round(max(col("value")), 2).as("v_max"),
          round(avg(col("value")), 6).as("v_avg"))
        .select(col("user_id"), expr(
          """stack(3, 'min', v_min, 'max', v_max, 'avg', v_avg)
             AS (stat, v)"""))
        .orderBy(col("user_id"), col("stat")),
    Some("""SELECT user_id, stat, v FROM (
              SELECT user_id, 'min' AS stat, round(min(value), 2) AS v
                FROM events GROUP BY user_id
              UNION ALL
              SELECT user_id, 'max', round(max(value), 2)
                FROM events GROUP BY user_id
              UNION ALL
              SELECT user_id, 'avg', round(avg(value), 6)
                FROM events GROUP BY user_id)
            ORDER BY user_id NULLS FIRST, stat NULLS FIRST"""))

  /** Collected aggregate: deterministic ordered set-collection rendered
    * as a string (the run-log "which types did this user emit" field). */
  val qAggCollect = Q(
    "q_agg_collect",
    (s, d) =>
      ev(s, d)
        .groupBy(col("user_id"))
        .agg(array_join(array_sort(collect_set(col("event_type"))), ",")
          .as("types_seen"))
        .orderBy(col("user_id")),
    Some("""SELECT user_id,
              string_agg(DISTINCT event_type, ',' ORDER BY event_type)
                AS types_seen
            FROM events GROUP BY user_id
            ORDER BY user_id NULLS FIRST"""))

  /** Distribution windows: ntile quartiles + percent_rank + cume_dist
    * over order value per priority class. */
  val qWinNtile = Q(
    "q_win_ntile",
    (s, d) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      ord(s, d)
        .select(
          col("o_orderkey"), col("o_orderpriority"),
          ntile(4).over(w).cast("long").as("quartile"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cume"))
        .orderBy(col("o_orderkey"))
    },
    Some("""SELECT o_orderkey, o_orderpriority,
              CAST(ntile(4) OVER w AS BIGINT) AS quartile,
              round(percent_rank() OVER w, 6) AS pct_rank,
              round(cume_dist() OVER w, 6) AS cume
            FROM orders
            WINDOW w AS (PARTITION BY o_orderpriority
                         ORDER BY o_totalprice, o_orderkey)
            ORDER BY o_orderkey NULLS FIRST"""))

  /** Scalar + correlated subqueries via Spark SQL: orders above their
    * priority class's average. */
  val qSubqueryScalar = Q(
    "q_subquery_scalar",
    (s, d) => {
      ord(s, d).createOrReplaceTempView("sq_orders")
      s.sql("""
        SELECT o_orderkey, o_orderpriority, o_totalprice
        FROM sq_orders o
        WHERE o_totalprice > 2.0 * (SELECT avg(o_totalprice)
                                    FROM sq_orders i
                                    WHERE i.o_orderpriority = o.o_orderpriority)
        ORDER BY o_orderkey NULLS FIRST""")
    },
    Some("""SELECT o_orderkey, o_orderpriority, o_totalprice
            FROM orders o
            WHERE o_totalprice > 2.0 * (SELECT avg(o_totalprice)
                                        FROM orders i
                                        WHERE i.o_orderpriority = o.o_orderpriority)
            ORDER BY o_orderkey NULLS FIRST"""))

  /** Latest-wins upsert merge (q_upsert_latest): the CDC/state-table
    * compaction every incremental pipeline runs — one row per key, the
    * version with the newest timestamp wins (event_id tie-break). */
  val qUpsertLatest = Q(
    "q_upsert_latest",
    (s, d) => {
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts").desc, col("event_id").desc)
      ev(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type"), col("event_id"),
          col("value"))
        .orderBy(col("user_id"), col("event_type"))
    },
    Some("""SELECT user_id, event_type, event_id, value
            FROM (SELECT *, row_number() OVER (
                    PARTITION BY user_id, event_type
                    ORDER BY ts DESC, event_id DESC) AS rn
                  FROM events)
            WHERE rn = 1
            ORDER BY user_id NULLS FIRST, event_type NULLS FIRST"""))

  /** Column profiler (q_profile): per-column null/distinct/min/max —
    * the data-quality scan run before any pipeline stage. One pass,
    * wide aggregates, long output via stack. */
  val qProfile = Q(
    "q_profile",
    (s, d) => {
      val li = Tables.t(s, d, "lineitem")
      li.agg(
          count(lit(1)).as("n_rows"),
          count(when(col("l_quantity").isNull, 1)).as("nn_qty"),
          countDistinct(col("l_partkey")).as("nd_part"),
          countDistinct(col("l_returnflag")).as("nd_flag"),
          round(min(col("l_extendedprice")), 2).as("min_price"),
          round(max(col("l_extendedprice")), 2).as("max_price"),
          round(avg(col("l_discount")), 6).as("avg_disc"))
        .select(expr(
          """stack(7,
               'n_rows', CAST(n_rows AS DOUBLE),
               'null_quantity', CAST(nn_qty AS DOUBLE),
               'distinct_partkey', CAST(nd_part AS DOUBLE),
               'distinct_returnflag', CAST(nd_flag AS DOUBLE),
               'min_extendedprice', min_price,
               'max_extendedprice', max_price,
               'avg_discount', avg_disc) AS (stat, v)"""))
        .orderBy(col("stat"))
    },
    Some("""SELECT stat, v FROM (
              SELECT 'n_rows' AS stat, CAST(count(*) AS DOUBLE) AS v
                FROM lineitem
              UNION ALL SELECT 'null_quantity',
                CAST(count(CASE WHEN l_quantity IS NULL THEN 1 END)
                     AS DOUBLE) FROM lineitem
              UNION ALL SELECT 'distinct_partkey',
                CAST(count(DISTINCT l_partkey) AS DOUBLE) FROM lineitem
              UNION ALL SELECT 'distinct_returnflag',
                CAST(count(DISTINCT l_returnflag) AS DOUBLE) FROM lineitem
              UNION ALL SELECT 'min_extendedprice',
                round(min(l_extendedprice), 2) FROM lineitem
              UNION ALL SELECT 'max_extendedprice',
                round(max(l_extendedprice), 2) FROM lineitem
              UNION ALL SELECT 'avg_discount',
                round(avg(l_discount), 6) FROM lineitem)
            ORDER BY stat NULLS FIRST"""))

  /** Mode / argmax aggregate (q_agg_mode): each user's most frequent
    * event type, deterministic tie-break (count desc, type asc). */
  val qAggMode = Q(
    "q_agg_mode",
    (s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("n").desc, col("event_type"))
      ev(s, d)
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type").as("mode_type"), col("n"))
        .orderBy(col("user_id"))
    },
    Some("""SELECT user_id, event_type AS mode_type, n
            FROM (SELECT user_id, event_type, count(*) AS n,
                    row_number() OVER (PARTITION BY user_id
                      ORDER BY count(*) DESC, event_type) AS rn
                  FROM events GROUP BY user_id, event_type)
            WHERE rn = 1
            ORDER BY user_id NULLS FIRST"""))

  /** Deterministic sampling (q_sample_mod): hash-mod sampling — unlike
    * TABLESAMPLE, reproducible across engines, runs and partitionings;
    * the sampling idiom a 100 TB pipeline uses for held-out splits. */
  val qSampleMod = Q(
    "q_sample_mod",
    (s, d) =>
      ev(s, d)
        .filter(expr(
          "CAST(conv(substring(md5(CAST(event_id AS STRING)), 1, 8), 16, 10) AS BIGINT) % 20 = 0"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_sampled"),
          round(avg(col("value")), 6).as("avg_value"))
        .orderBy(col("event_type")),
    Some("""SELECT event_type, count(*) AS n_sampled,
              round(avg(value), 6) AS avg_value
            FROM events
            WHERE CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8)
                       AS BIGINT) % 20 = 0
            GROUP BY event_type
            ORDER BY event_type NULLS FIRST"""))

  /** Stratified deterministic sampling (q_sample_stratified): per-class
    * rates — keep half the rare 'purchase' rows, 10% of 'click', 5% of
    * everything else — decided row-locally by the same cross-engine
    * md5 hash q_sample_mod uses, so the sample is reproducible on any
    * partitioning and NEVER needs a shuffle or a count pass first (the
    * class-rebalancing step of a training-data mix). */
  val qSampleStratified = Q(
    "q_sample_stratified",
    (s, d) =>
      ev(s, d)
        .withColumn("bucket", expr(
          "CAST(conv(substring(md5(CAST(event_id AS STRING)), 1, 8), 16, 10) AS BIGINT) % 100"))
        .filter(expr(
          """bucket < CASE event_type WHEN 'purchase' THEN 50
                                      WHEN 'click' THEN 10
                                      ELSE 5 END"""))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_sampled"),
          round(avg(col("value")), 6).as("avg_value"),
          min(col("event_id")).as("min_id"))
        .orderBy(col("event_type")),
    Some("""SELECT event_type, count(*) AS n_sampled,
              round(avg(value), 6) AS avg_value,
              min(event_id) AS min_id
            FROM (SELECT *,
                    CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8)
                         AS BIGINT) % 100 AS bucket
                  FROM events)
            WHERE bucket < CASE event_type WHEN 'purchase' THEN 50
                                           WHEN 'click' THEN 10
                                           ELSE 5 END
            GROUP BY event_type
            ORDER BY event_type NULLS FIRST"""))

  /** Weighted reservoir sample, top-10 per source (q_sample_weighted):
    * algorithm A-ES — each doc draws an exponential race key
    * e = −ln(u)/w with weight w = n_chars and u a DETERMINISTIC
    * md5-derived uniform in (0,1); the 10 smallest keys per source are
    * the sample. Longer docs win proportionally more often, the draw is
    * reproducible on any partitioning (no RNG), and the per-source
    * top-10 is a keyed window — the length-weighted subsampling step of
    * a training-mix build. The race key itself is NOT output (ln is
    * libm math; last-ulp cross-engine differences are fine for ORDERING
    * — uniform keys are ~1/n² apart — but not for hashing). */
  val qSampleWeighted = Q(
    "q_sample_weighted",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      Tables.t(s, d, "documents")
        .withColumn("h", expr(
          "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT)"))
        .withColumn("e",
          expr("-ln((h + 0.5) / 4294967296.0) / n_chars"))
        .withColumn("sample_rank", row_number().over(
          Window.partitionBy(col("source"))
            .orderBy(col("e"), col("doc_id"))))
        .filter(col("sample_rank") <= 10)
        .select(col("source"), col("sample_rank").cast("long")
          .as("sample_rank"), col("doc_id"), col("n_chars"))
        .orderBy(col("source"), col("sample_rank"))
    },
    Some("""SELECT source, sample_rank, doc_id, n_chars FROM (
              SELECT source, doc_id, n_chars,
                CAST(row_number() OVER (PARTITION BY source
                  ORDER BY -ln((CAST('0x' ||
                      substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                      AS BIGINT) + 0.5) / 4294967296.0) / n_chars,
                    doc_id) AS BIGINT) AS sample_rank
              FROM documents) r
            WHERE sample_rank <= 10
            ORDER BY source NULLS FIRST, sample_rank NULLS FIRST"""))

  /** Neyman-optimal stratified allocation (q_sample_neyman): given a
    * fixed label/annotation budget of 1000 rows, how many to draw per
    * event_type stratum — n_h ∝ N_h·σ_h (the minimum-variance
    * allocation for estimating the overall mean), next to the naive
    * proportional n_h ∝ N_h for comparison. This is the budgeting
    * step upstream of q_sample_stratified's rate-based draw: decide
    * the counts here, then convert to per-class hash-gate rates.
    *
    * Engine-exactness: σ_h comes from exact DECIMAL/HUGEINT cent sums
    * converted to double once (sqrt and IEEE ops are correctly
    * rounded, so both engines produce the identical double); the
    * weight micro-quantizes to a BIGINT, and the largest-remainder
    * apportionment runs on INTEGER floor/mod arithmetic — ties and
    * boundaries cannot diverge. Cost: ONE scan, one stratum aggregate,
    * then everything — the weight total, the floor-sum, both remainder
    * ranks — is windows over the #strata-row table (bounded by the
    * type domain, never rows; r17: the crossJoin'd scalar-total form
    * re-ran the stratum aggregate per consumption, 4 events scans
    * where this runs 1). */
  val qSampleNeyman = Q(
    "q_sample_neyman",
    (s, d) => {
      val all = Window.partitionBy()
      val st = ev(s, d)
        .select(col("event_type"),
          floor(col("value") * 100 + 0.5).cast("long").as("c"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("c").cast("decimal(38,0)")).as("sc"),
          sum((col("c") * col("c")).cast("decimal(38,0)")).as("qc"))
        .withColumn("sigma", sqrt(
          (col("qc").cast("double") -
            col("sc").cast("double") * col("sc").cast("double") /
              col("n_rows")) / (col("n_rows") - 1) / lit(10000.0)))
        .withColumn("wq",
          floor(col("n_rows") * col("sigma") * 1e6 + 0.5).cast("long"))
      st
        .withColumn("w_tot", sum(col("wq")).over(all))
        .withColumn("n_tot", sum(col("n_rows")).over(all))
        .withColumn("fl", expr("1000 * wq div w_tot"))
        .withColumn("rem", expr("(1000 * wq) % w_tot"))
        .withColumn("flp", expr("1000 * n_rows div n_tot"))
        .withColumn("remp", expr("(1000 * n_rows) % n_tot"))
        .withColumn("f_tot", sum(col("fl")).over(all))
        .withColumn("fp_tot", sum(col("flp")).over(all))
        .withColumn("rk", row_number().over(
          Window.orderBy(col("rem").desc, col("event_type"))))
        .withColumn("rkp", row_number().over(
          Window.orderBy(col("remp").desc, col("event_type"))))
        .select(col("event_type"), col("n_rows"),
          round(col("sigma"), 6).as("sigma"),
          (col("fl") + when(col("rk") <= lit(1000) - col("f_tot"), 1L)
            .otherwise(0L)).as("n_neyman"),
          (col("flp") + when(col("rkp") <= lit(1000) - col("fp_tot"), 1L)
            .otherwise(0L)).as("n_prop"))
        .orderBy(col("event_type"))
    },
    Some("""WITH st AS (
              SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
                sum(CAST(CAST(floor(value * 100 + 0.5) AS BIGINT)
                  AS HUGEINT)) AS sc,
                sum(CAST(CAST(floor(value * 100 + 0.5) AS BIGINT)
                  AS HUGEINT) * CAST(floor(value * 100 + 0.5) AS BIGINT))
                  AS qc
              FROM events GROUP BY event_type),
            sg AS (
              SELECT event_type, n_rows,
                sqrt((CAST(qc AS DOUBLE)
                    - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE) / n_rows)
                  / (n_rows - 1) / 10000.0) AS sigma
              FROM st),
            wq AS (
              SELECT event_type, n_rows, sigma,
                CAST(floor(n_rows * sigma * 1e6 + 0.5) AS BIGINT) AS wq
              FROM sg),
            tot AS (
              SELECT CAST(sum(wq) AS BIGINT) AS w_tot,
                CAST(sum(n_rows) AS BIGINT) AS n_tot
              FROM wq),
            a AS (
              SELECT event_type, n_rows, sigma,
                1000 * wq // w_tot AS fl, (1000 * wq) % w_tot AS rem,
                1000 * n_rows // n_tot AS flp,
                (1000 * n_rows) % n_tot AS remp
              FROM wq, tot),
            fsum AS (
              SELECT CAST(sum(fl) AS BIGINT) AS f_tot,
                CAST(sum(flp) AS BIGINT) AS fp_tot
              FROM a),
            rk AS (
              SELECT a.*, f_tot, fp_tot,
                row_number() OVER (ORDER BY rem DESC, event_type) AS rk,
                row_number() OVER (ORDER BY remp DESC, event_type)
                  AS rkp
              FROM a, fsum)
            SELECT event_type, n_rows, round(sigma, 6) AS sigma,
              CAST(fl + CASE WHEN rk <= 1000 - f_tot THEN 1 ELSE 0 END
                AS BIGINT) AS n_neyman,
              CAST(flp + CASE WHEN rkp <= 1000 - fp_tot THEN 1 ELSE 0
                END AS BIGINT) AS n_prop
            FROM rk
            ORDER BY event_type NULLS FIRST"""))

  /** Class-balanced downsample (q_sample_balanced): exactly 300 rows
    * per event type — the majority classes cut to parity with the
    * rarest, the standard rebalancing step before classifier training.
    * Unlike the rate-gated q_sample_stratified (approximate counts, no
    * shuffle), parity needs EXACT counts, so each class takes its 300
    * smallest md5 priorities via one rank window partitioned by class
    * — a single exchange on the class key, heap-bounded per partition,
    * deterministic on any layout. Emits the per-class census plus an
    * exact-cents mean of the kept rows. */
  val qSampleBalanced = Q(
    "q_sample_balanced",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      ev(s, d)
        .withColumn("pri", expr(
          """CAST(conv(substring(md5(CAST(event_id AS STRING)), 1, 8),
             16, 10) AS BIGINT)"""))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("event_type"))
            .orderBy(col("pri"), col("event_id"))))
        .filter(col("rk") <= 300)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_kept"),
          sum(floor(col("value") * 100 + 0.5).cast("long")).as("cents"),
          min(col("pri")).as("min_pri"))
        .selectExpr("event_type", "n_kept", "cents",
          "round(CAST(cents AS DOUBLE) / n_kept / 100, 6) AS mean_value",
          "min_pri")
        .orderBy(col("event_type"))
    },
    Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS n_kept,
        CAST(sum(c) AS BIGINT) AS cents,
        round(CAST(sum(c) AS DOUBLE) / count(*) / 100, 6) AS mean_value,
        min(pri) AS min_pri
      FROM (
        SELECT event_type, value,
          CAST(floor(value * 100 + 0.5e0) AS BIGINT) AS c, pri,
          row_number() OVER (PARTITION BY event_type
            ORDER BY pri, event_id) AS rk
        FROM (SELECT *,
                CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8)
                  AS BIGINT) AS pri
              FROM events) h) x
      WHERE rk <= 300
      GROUP BY event_type
      ORDER BY event_type NULLS FIRST"""))

  val all: Seq[Q] = Seq(
    qJoinFull, qJoinCross, qPivot, qUnpivot, qAggCollect, qWinNtile,
    qSubqueryScalar, qUpsertLatest, qProfile, qAggMode, qSampleMod,
    qSampleStratified, qSampleWeighted, qSampleNeyman, qSampleBalanced)
}
