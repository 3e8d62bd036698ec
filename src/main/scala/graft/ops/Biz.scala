package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Business-analytics shapes: corpus-overlap matrices, RFM customer
  * scoring, market-basket affinity. Exact-integer discipline
  * throughout — every ratio divides once at the end. */
object Biz {

  private def t(n: String)(implicit s: SparkSession, d: String) =
    Tables.t(s, d, n)

  /** Pairwise source-vocabulary overlap (q_source_overlap): exact
    * Jaccard between every two sources' distinct term sets. The
    * intersection comes from ONE term-keyed equi-join of the (term,
    * source) distinct table with itself — vocabulary-sized, never
    * doc-sized — and set sizes broadcast back. The corpus-comparison
    * matrix a mixing pipeline consults before weighting sources. */
  val qSourceOverlap = Q(
    "q_source_overlap",
    (sp, dir) => {
      implicit val s: SparkSession = sp
      implicit val d: String = dir
      val vocab = t("documents")
        .select(col("source"), explode(split(col("text"), " ")).as("term"))
        .distinct()
      // BOTH set-size lookups ride ONE 1-row source→size MAP (bounded
      // by the source domain): joining the sizes table back twice
      // re-derived it twice, and its lineage is the full vocab
      // distinct — two extra fact scans for |sources| numbers.
      val sizeMap = vocab.groupBy(col("source").as("sz_src"))
        .agg(count(lit(1)).as("sz"))
        .agg(map_from_entries(
          collect_list(struct(col("sz_src"), col("sz")))).as("szm"))
      val inter = vocab.select(col("source").as("sa"), col("term"))
        .join(vocab.select(col("source").as("sb"),
          col("term").as("rterm")),
          col("term") === col("rterm") && col("sa") < col("sb"))
        .groupBy(col("sa"), col("sb"))
        .agg(count(lit(1)).as("inter"))
      inter
        .crossJoin(broadcast(sizeMap))
        .select(col("sa"), col("sb"), col("inter"),
          round(col("inter").cast("double") /
            (expr("szm[sa]") + expr("szm[sb]") - col("inter")), 6)
            .as("jaccard"))
        .orderBy(col("sa"), col("sb"))
    },
    Some("""WITH vocab AS (
              SELECT DISTINCT source, term
              FROM (SELECT source,
                      unnest(string_split(text, ' ')) AS term
                    FROM documents)),
            sizes AS (
              SELECT source AS sz_src, CAST(count(*) AS BIGINT) AS sz
              FROM vocab GROUP BY source),
            inter AS (
              SELECT l.source AS sa, r.source AS sb,
                CAST(count(*) AS BIGINT) AS inter
              FROM vocab l JOIN vocab r
                ON l.term = r.term AND l.source < r.source
              GROUP BY l.source, r.source)
            SELECT sa, sb, inter,
              round(CAST(inter AS DOUBLE) / (a.sz + b.sz - inter), 6)
                AS jaccard
            FROM inter
              JOIN sizes a ON sa = a.sz_src
              JOIN sizes b ON sb = b.sz_src
            ORDER BY sa NULLS FIRST, sb NULLS FIRST"""))

  /** RFM customer scoring (q_events_rfm): per user, recency (days
    * since last purchase relative to the corpus max day), frequency
    * (purchase count), monetary (cents sum) — each cut into VALUE
    * quintiles against the exact 20/40/60/80th-percentile boundaries,
    * concatenated into the classic three-digit segment (5 = best:
    * most recent, most frequent, highest spend; ties share a bucket).
    * The per-user aggregate is one shuffle; the 12 cut doubles come
    * from ONE two-phase percentile aggregate and are broadcast back —
    * never a global ntile sort, which is a single-partition window
    * over the users table at 100 TB (the q_agg_equidepth discipline,
    * Audit.scala). Cut doubles are identical across engines (same
    * (n−1)p interpolation), so bucket membership is exact.
    *
    * Buffer bound (the Audit.scala grid rule): exact `percentile`
    * accumulates a (value → count) map, one entry per DISTINCT input.
    * Here the input is the per-user ROLLUP, never the fact table:
    * recency is day-grid-bounded, frequency is a small-integer count,
    * and the cent sums contribute at most one entry per user — so the
    * buffer is capped by the user dimension (the operator's own output
    * size), merged tree-wise as a single long→count map. These cuts
    * are SEMANTIC (the oracle mirrors them with quantile_cont), so
    * they cannot move to approx_percentile without breaking
    * cross-engine parity; the dimension bound is what licenses exact.
    * PlanSpec asserts the bound mechanically. */
  val qEventsRfm = Q(
    "q_events_rfm",
    (sp, dir) => {
      implicit val s: SparkSession = sp
      implicit val d: String = dir
      val purchases = t("events")
        .filter(col("event_type") === "purchase")
        .select(col("user_id"),
          unix_micros(col("ts").cast("timestamp")).as("us"),
          floor(col("value") * 100 + 0.5).cast("long").as("cents"))
      val mx = purchases.agg(max(col("us")).as("max_us"))
      val byUser = purchases
        .crossJoin(broadcast(mx))
        .groupBy(col("user_id"))
        .agg(
          ((first(col("max_us")) - max(col("us"))) / 86400000000L)
            .cast("long").as("recency_days"),
          count(lit(1)).as("frequency"),
          sum(col("cents")).as("monetary_cents"))
      val cuts = byUser.agg(
        expr("percentile(recency_days, array(0.2, 0.4, 0.6, 0.8))")
          .as("r_cuts"),
        expr("percentile(frequency, array(0.2, 0.4, 0.6, 0.8))")
          .as("f_cuts"),
        expr("percentile(monetary_cents, array(0.2, 0.4, 0.6, 0.8))")
          .as("m_cuts"))
      // bucket = #cuts strictly below the metric (0..4); recency is
      // inverted so 5 always means best
      byUser
        .crossJoin(broadcast(cuts))
        .select(col("user_id"), col("recency_days"), col("frequency"),
          col("monetary_cents"),
          (lit(5) - expr("""aggregate(r_cuts, 0, (acc, c) ->
             acc + CASE WHEN recency_days > c THEN 1 ELSE 0 END)"""))
            .cast("long").as("r_score"),
          (lit(1) + expr("""aggregate(f_cuts, 0, (acc, c) ->
             acc + CASE WHEN frequency > c THEN 1 ELSE 0 END)"""))
            .cast("long").as("f_score"),
          (lit(1) + expr("""aggregate(m_cuts, 0, (acc, c) ->
             acc + CASE WHEN monetary_cents > c THEN 1 ELSE 0 END)"""))
            .cast("long").as("m_score"))
        .withColumn("segment",
          concat(col("r_score"), col("f_score"), col("m_score")))
        .orderBy(col("user_id"))
    },
    Some("""WITH purchases AS (
              SELECT user_id, epoch_us(ts) AS us,
                CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
              FROM events WHERE event_type = 'purchase'),
            mx AS (SELECT max(us) AS max_us FROM purchases),
            by_user AS (
              SELECT user_id,
                CAST((any_value(max_us) - max(us)) // 86400000000
                  AS BIGINT) AS recency_days,
                CAST(count(*) AS BIGINT) AS frequency,
                CAST(sum(cents) AS BIGINT) AS monetary_cents
              FROM purchases, mx
              GROUP BY user_id),
            cuts AS (
              SELECT
                [quantile_cont(recency_days, 0.2),
                 quantile_cont(recency_days, 0.4),
                 quantile_cont(recency_days, 0.6),
                 quantile_cont(recency_days, 0.8)] AS r_cuts,
                [quantile_cont(frequency, 0.2),
                 quantile_cont(frequency, 0.4),
                 quantile_cont(frequency, 0.6),
                 quantile_cont(frequency, 0.8)] AS f_cuts,
                [quantile_cont(monetary_cents, 0.2),
                 quantile_cont(monetary_cents, 0.4),
                 quantile_cont(monetary_cents, 0.6),
                 quantile_cont(monetary_cents, 0.8)] AS m_cuts
              FROM by_user)
            SELECT user_id, recency_days, frequency, monetary_cents,
              r_score, f_score, m_score,
              CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
                || CAST(m_score AS VARCHAR) AS segment
            FROM (SELECT user_id, recency_days, frequency,
                    monetary_cents,
                    CAST(5 - len(list_filter(r_cuts,
                      c -> recency_days > c)) AS BIGINT) AS r_score,
                    CAST(1 + len(list_filter(f_cuts,
                      c -> frequency > c)) AS BIGINT) AS f_score,
                    CAST(1 + len(list_filter(m_cuts,
                      c -> monetary_cents > c)) AS BIGINT) AS m_score
                  FROM by_user, cuts)
            ORDER BY user_id NULLS FIRST"""))

  /** Market-basket brand affinity (q_basket_lift): brand pairs
    * co-occurring in the same order, with support and lift. The basket
    * is bounded by order size (an order has ~7 lines), so pairs are
    * generated IN-ROW from each order's sorted distinct-brand set —
    * one groupBy(order) exchange replaces the old distinct + self-join
    * + pair-agg chain (4 wide stages → 2); the ≤(7·6/2)-element pair
    * explode per order is map-side. lift = n·N/(na·nb) is integer
    * until one division. Top 20 by lift over a minimum-support floor. */
  val qBasketLift = Q(
    "q_basket_lift",
    (sp, dir) => {
      implicit val s: SparkSession = sp
      implicit val d: String = dir
      // per-order sorted distinct-brand baskets: collect_set dedups
      // within the one exchange; two consumers (pair explode + brand
      // marginals) read the materialized baskets, not the fact
      val baskets = t("lineitem")
        .join(broadcast(t("part").select(col("p_partkey"),
          col("p_brand"))), col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_set(col("p_brand"))).as("bs"))
        .select(col("bs"))
        .localCheckpoint()
      val nOrders = t("orders").agg(count(lit(1)).as("n_orders"))
      val brandCounts = baskets
        .select(explode(col("bs")).as("bc_brand"))
        .groupBy(col("bc_brand")).agg(count(lit(1)).as("n_brand"))
      // all (ba < bb) pairs of a sorted basket, generated in-row
      val pairs = baskets
        .select(explode(expr(
          """flatten(transform(bs, (x, i) ->
               transform(slice(bs, i + 2, size(bs)),
                 y -> struct(x AS ba, y AS bb))))""")).as("p"))
        .select(col("p.ba"), col("p.bb"))
        .groupBy(col("ba"), col("bb"))
        .agg(count(lit(1)).as("n_both"))
      pairs
        .filter(col("n_both") >= 20)
        .join(broadcast(brandCounts).withColumnRenamed("bc_brand", "ka"),
          col("ba") === col("ka"))
        .withColumnRenamed("n_brand", "na")
        .join(broadcast(brandCounts).withColumnRenamed("bc_brand", "kb"),
          col("bb") === col("kb"))
        .withColumnRenamed("n_brand", "nb")
        .crossJoin(broadcast(nOrders))
        .select(col("ba"), col("bb"), col("n_both"),
          round(col("n_both").cast("double") * col("n_orders") /
            (col("na") * col("nb")), 6).as("lift"))
        .orderBy(col("lift").desc, col("ba"), col("bb"))
        .limit(20)
    },
    Some("""WITH lines AS (
              SELECT DISTINCT l_orderkey AS ok, p_brand
              FROM lineitem JOIN part ON l_partkey = p_partkey),
            n_orders AS (
              SELECT CAST(count(*) AS BIGINT) AS n_orders FROM orders),
            brand_counts AS (
              SELECT p_brand AS bc_brand, CAST(count(*) AS BIGINT)
                AS n_brand
              FROM lines GROUP BY p_brand),
            pairs AS (
              SELECT l.p_brand AS ba, r.p_brand AS bb,
                CAST(count(*) AS BIGINT) AS n_both
              FROM lines l JOIN lines r
                ON l.ok = r.ok AND l.p_brand < r.p_brand
              GROUP BY l.p_brand, r.p_brand)
            SELECT ba, bb, n_both,
              round(CAST(n_both AS DOUBLE) * n_orders / (na.n_brand *
                nb.n_brand), 6) AS lift
            FROM pairs
              JOIN brand_counts na ON ba = na.bc_brand
              JOIN brand_counts nb ON bb = nb.bc_brand
              CROSS JOIN n_orders
            WHERE n_both >= 20
            ORDER BY lift DESC NULLS LAST, ba NULLS FIRST, bb NULLS FIRST
            LIMIT 20"""))

  /** Supplier reliability ranking (q_stats_wilson): per-supplier
    * return rate with the Wilson score lower bound — the statistically
    * sound way to rank proportions with unequal sample sizes (a
    * 1-return/2-lines supplier must not outrank 30/1000). Counts are
    * exact integers; the Wilson formula is one fixed double expression
    * per supplier row (z = 1.96 pinned), so ranking is engine-stable.
    * One fact aggregate, supplier-sized everything after. */
  val qStatsWilson = Q(
    "q_stats_wilson",
    (sp, dir) => {
      implicit val s: SparkSession = sp
      implicit val d: String = dir
      val perSupp = t("lineitem")
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("n_lines"),
          sum(when(col("l_returnflag") === "R", 1L).otherwise(0L))
            .as("n_returned"))
      val z2 = 1.96 * 1.96
      val p = col("n_returned").cast("double") / col("n_lines")
      val n = col("n_lines").cast("double")
      val lower = (p + lit(z2) / (n * 2) -
        lit(1.96) * sqrt((p * (lit(1.0) - p) + lit(z2) / (n * 4)) / n)) /
        (lit(1.0) + lit(z2) / n)
      perSupp
        .join(t("supplier").select(col("s_suppkey"), col("s_name")),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_name"), col("n_lines"), col("n_returned"),
          round(lower, 6).as("wilson_lower"))
        .orderBy(col("wilson_lower").desc, col("s_name"))
        .limit(25)
    },
    Some("""WITH per_supp AS (
              SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n_lines,
                CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_returned
              FROM lineitem GROUP BY l_suppkey)
            SELECT s_name, n_lines, n_returned,
              round((p + z2 / (2 * n) -
                     1.96e0 * sqrt((p * (1.0e0 - p) + z2 / (4 * n)) / n))
                    / (1.0e0 + z2 / n), 6) AS wilson_lower
            FROM (SELECT s_name, n_lines, n_returned,
                    CAST(n_returned AS DOUBLE) / n_lines AS p,
                    CAST(n_lines AS DOUBLE) AS n,
                    1.96e0 * 1.96e0 AS z2
                  FROM per_supp
                    JOIN supplier ON l_suppkey = s_suppkey)
            ORDER BY wilson_lower DESC NULLS LAST, s_name NULLS FIRST
            LIMIT 25"""))

  /** Cohort lifetime-value curve (q_cohort_ltv): users grouped by
    * first-seen week, purchase revenue accumulated over cohort age in
    * weeks — the LTV ramp every growth team plots. First-seen is a
    * per-user min; revenue stays integer cents through the cumulative
    * window and divides once on output. */
  val qCohortLtv = Q(
    "q_cohort_ltv",
    (sp, dir) => {
      implicit val s: SparkSession = sp
      implicit val d: String = dir
      val ev = t("events")
      val anchor = lit("2024-01-01").cast("timestamp_ntz")
      val weekOf = (c: org.apache.spark.sql.Column) =>
        floor(datediff(c.cast("date"), anchor.cast("date")) / 7.0)
          .cast("long")
      val firstSeen = ev.groupBy(col("user_id").as("fs_user"))
        .agg(min(col("ts")).as("first_ts"))
        .select(col("fs_user"), weekOf(col("first_ts")).as("cohort_week"))
      val rev = ev.filter(col("event_type") === "purchase")
        .join(broadcast(firstSeen), col("user_id") === col("fs_user"))
        .select(col("cohort_week"),
          (weekOf(col("ts")) - col("cohort_week")).as("age_week"),
          floor(col("value") * 100 + 0.5).cast("long").as("cents"))
        .groupBy(col("cohort_week"), col("age_week"))
        .agg(sum(col("cents")).as("week_cents"))
      val w = Window.partitionBy(col("cohort_week"))
        .orderBy(col("age_week"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      rev
        .select(col("cohort_week"), col("age_week"),
          (sum(col("week_cents")).over(w) / 100.0).as("cum_revenue"))
        .orderBy(col("cohort_week"), col("age_week"))
    },
    Some("""WITH first_seen AS (
              SELECT user_id AS fs_user,
                CAST((CAST(min(ts) AS DATE) - DATE '2024-01-01') // 7
                  AS BIGINT) AS cohort_week
              FROM events GROUP BY user_id),
            rev AS (
              SELECT cohort_week,
                CAST((CAST(ts AS DATE) - DATE '2024-01-01') // 7
                  AS BIGINT) - cohort_week AS age_week,
                CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS week_cents
              FROM events JOIN first_seen ON user_id = fs_user
              WHERE event_type = 'purchase'
              GROUP BY cohort_week, age_week)
            SELECT cohort_week, age_week,
              CAST(sum(week_cents) OVER (PARTITION BY cohort_week
                ORDER BY age_week
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) / 100.0 AS cum_revenue
            FROM rev
            ORDER BY cohort_week NULLS FIRST, age_week NULLS FIRST"""))

  /** Longest daily-activity streak per user (q_events_streaks): the
    * gaps-and-islands pattern — consecutive active days collapse into
    * islands via the day − dense_rank trick (one window per user, all
    * integer arithmetic), and the longest island per user survives.
    * The fact reduces to (user, day) distinct rows first, so the
    * window input is bounded by users × active days. */
  val qEventsStreaks = Q(
    "q_events_streaks",
    (sp, dir) => {
      implicit val s: SparkSession = sp
      implicit val d: String = dir
      val days = t("events")
        .select(col("user_id"),
          datediff(col("ts").cast("date"),
            lit("2024-01-01").cast("date")).cast("long").as("day"))
        .distinct()
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      val islands = days
        .withColumn("grp", col("day") -
          row_number().over(w).cast("long"))
        .groupBy(col("user_id"), col("grp"))
        .agg(count(lit(1)).as("len"), min(col("day")).as("start_day"))
      islands
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("user_id"))
            .orderBy(col("len").desc, col("start_day"))))
        .filter(col("rk") === 1)
        .select(col("user_id"), col("len").as("longest_streak"),
          col("start_day"))
        .orderBy(col("user_id"))
    },
    Some("""WITH days AS (
              SELECT DISTINCT user_id,
                CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT)
                  AS day
              FROM events),
            islands AS (
              SELECT user_id, CAST(count(*) AS BIGINT) AS len,
                min(day) AS start_day
              FROM (SELECT user_id, day,
                      day - row_number() OVER (PARTITION BY user_id
                        ORDER BY day) AS grp
                    FROM days)
              GROUP BY user_id, grp)
            SELECT user_id, len AS longest_streak, start_day
            FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                    ORDER BY len DESC, start_day) AS rk
                  FROM islands)
            WHERE rk = 1
            ORDER BY user_id NULLS FIRST"""))

  /** Customer reorder cadence (q_orders_cadence): per customer, the
    * days between consecutive orders (lag window over the per-customer
    * order sequence) summarized as count / mean gap / max gap — the
    * repeat-purchase heartbeat. Gaps are integer day differences;
    * means divide once. */
  val qOrdersCadence = Q(
    "q_orders_cadence",
    (sp, dir) => {
      implicit val s: SparkSession = sp
      implicit val d: String = dir
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val gaps = t("orders")
        .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
        .withColumn("prev_date", lag(col("o_orderdate"), 1).over(w))
        .filter(col("prev_date").isNotNull)
        .select(col("o_custkey"),
          datediff(col("o_orderdate").cast("date"),
            col("prev_date").cast("date")).cast("long").as("gap_days"))
      gaps
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_gaps"),
          sum(col("gap_days")).as("sum_gap"),
          max(col("gap_days")).as("max_gap"))
        .select(col("o_custkey"), col("n_gaps"),
          round(col("sum_gap").cast("double") / col("n_gaps"), 6)
            .as("mean_gap_days"),
          col("max_gap"))
        .orderBy(col("o_custkey"))
    },
    Some("""WITH gaps AS (
              SELECT o_custkey,
                CAST(CAST(o_orderdate AS DATE) -
                  CAST(lag(o_orderdate) OVER (PARTITION BY o_custkey
                    ORDER BY o_orderdate, o_orderkey) AS DATE)
                  AS BIGINT) AS gap_days
              FROM orders)
            SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_gaps,
              round(CAST(sum(gap_days) AS DOUBLE) / count(*), 6)
                AS mean_gap_days,
              max(gap_days) AS max_gap
            FROM gaps WHERE gap_days IS NOT NULL
            GROUP BY o_custkey
            ORDER BY o_custkey NULLS FIRST"""))

  /** Revenue-concentration Gini coefficient (q_agg_gini): how unequal
    * customer spend is, from the rank-weighted identity
    * G = 2·Σᵢ i·xᵢ / (n·Σx) − (n+1)/n over per-customer revenue sorted
    * ascending. Revenue stays integer cents; Σ i·x is exact BIGINT
    * (rank ≤ |customers|, cents < 2^40), so G is one fixed double
    * expression. The global rank is SHARDED, never a single-partition
    * window: rows bucket against 31 broadcast percentile cuts of cents
    * (order-preserving — ties share a bucket, so the per-bucket
    * (cents, o_custkey) sort concatenates to the exact total order),
    * rank within each bucket with a PARTITIONED row_number, and add
    * each bucket's exact prefix offset from a ≤32-row self-joined
    * count table (the q_event_count cross-shard carry, Daq.scala). */
  /** The un-checkpointed bucket build — factored out so PlanSpec can
    * assert its shape (GK-sketch cuts, no exact percentile) on the
    * build stage itself: the registered query checkpoints this frame,
    * so the final plan starts at the checkpoint RDD. */
  private[graft] def giniBucketed(sp: SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame = {
    implicit val s: SparkSession = sp
    implicit val d: String = dir
    val perCust = t("orders")
      .select(col("o_custkey"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
      .groupBy(col("o_custkey"))
      .agg(sum(col("cents")).as("cents"))
    val fracs = (1 to 31).map(i => i / 32.0).mkString(", ")
    // the cuts only SHARD the rank — their exact position is
    // irrelevant to the result (ties share a bucket by construction,
    // and the per-bucket sort + prefix offsets stitch the exact
    // global order whatever the cuts are). So the derivation can use
    // approx_percentile, whose GK sketch keeps the aggregation
    // buffer FIXED-SIZE (O(accuracy)), where exact percentile's
    // (value → count) map would grow with the near-unique
    // per-customer cent sums — the Audit.scala grid rule. The final
    // gini doubles are exact either way.
    val cuts = perCust.agg(
      expr(s"approx_percentile(cents, array($fracs), 10000)")
        .as("cuts"))
    perCust.crossJoin(broadcast(cuts))
      .select(col("o_custkey"), col("cents"), expr(
        """aggregate(cuts, 0, (acc, c) ->
             acc + CASE WHEN cents > c THEN 1 ELSE 0 END)""")
        .cast("long").as("bkt"))
  }

  val qAggGini = Q(
    "q_agg_gini",
    (sp, dir) => {
      implicit val s: SparkSession = sp
      implicit val d: String = dir
      // one row per customer; checkpointed because THREE consumers walk
      // it (bucket census, prefix offsets, the ranked sum) and each
      // would otherwise re-enter the scan + groupBy + sketch lineage
      // (6 logical copies of the orders scan in the un-cut form)
      val bucketed = giniBucketed(sp, dir).localCheckpoint()
      val bcounts = bucketed.groupBy(col("bkt"))
        .agg(count(lit(1)).as("bn"))
      val offsets = bcounts
        .join(bcounts.select(col("bkt").as("pb"), col("bn").as("pn")),
          col("pb") < col("bkt"), "left")
        .groupBy(col("bkt"))
        .agg(coalesce(sum(col("pn")), lit(0L)).as("off"))
      val ranked = bucketed
        .withColumn("li", row_number().over(
          Window.partitionBy(col("bkt"))
            .orderBy(col("cents"), col("o_custkey"))).cast("long"))
        .join(broadcast(offsets), "bkt")
        .select(col("cents"), (col("off") + col("li")).as("i"))
      ranked
        .agg(count(lit(1)).as("n"),
          sum(col("cents")).as("sx"),
          sum(col("i") * col("cents")).as("six"))
        .select(col("n"),
          round(col("six").cast("double") * 2 /
            (col("n") * col("sx").cast("double")) -
            (col("n") + 1).cast("double") / col("n"), 6).as("gini"))
    },
    Some("""WITH per_cust AS (
              SELECT o_custkey,
                CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS cents
              FROM orders GROUP BY o_custkey),
            ranked AS (
              SELECT cents, CAST(row_number() OVER (
                ORDER BY cents, o_custkey) AS BIGINT) AS i
              FROM per_cust)
            SELECT CAST(count(*) AS BIGINT) AS n,
              round(CAST(sum(i * cents) AS DOUBLE) * 2 /
                (count(*) * CAST(sum(cents) AS DOUBLE)) -
                CAST(count(*) + 1 AS DOUBLE) / count(*), 6) AS gini
            FROM ranked"""))

  /** Engagement stickiness (q_events_dau_mau): per day, distinct
    * active users that day over distinct users in the trailing 30
    * days. ONE fact scan (r15 derivation lens, retro-applied to this
    * allowlisted 3-scan id): the fact reduces to per-USER sorted
    * active-day sets (calendar-bounded arrays), each user then emits
    * their COVERED reference days in-row — the distinct union of
    * [day, day+29] windows over their active days — so a user counts
    * toward a ref day's MAU exactly once BY CONSTRUCTION and the
    * day-grain rollup is a plain count: no 30× range self-join, no
    * countDistinct expands, no re-derived day grid. DAU rides the same
    * rows as an in-row membership flag (is the ref day itself one of
    * the user's active days). Ref days with zero active users are
    * filtered exactly as the old dau⋈mau inner join did. Per-user work
    * is bounded by the CALENDAR span, never event volume. */
  val qEventsDauMau = Q(
    "q_events_dau_mau",
    (sp, dir) => {
      implicit val s: SparkSession = sp
      implicit val d: String = dir
      t("events")
        .select(
          datediff(col("ts").cast("date"),
            lit("2024-01-01").cast("date")).cast("long").as("day"),
          col("user_id"))
        .groupBy(col("user_id"))
        .agg(sort_array(collect_set(col("day"))).as("acts"))
        .select(col("user_id"), col("acts"),
          explode(expr(
            """array_distinct(flatten(transform(acts,
                 a -> sequence(a, a + 29))))""")).as("ref_day"))
        .groupBy(col("ref_day").as("day"))
        .agg(
          sum(expr("CAST(array_contains(acts, ref_day) AS BIGINT)"))
            .as("dau"),
          count(lit(1)).as("mau"))
        .filter(col("dau") > 0)
        .select(col("day"), col("dau"), col("mau"),
          round(col("dau").cast("double") / col("mau"), 6)
            .as("stickiness"))
        .orderBy(col("day"))
    },
    Some("""WITH days AS (
              SELECT DISTINCT
                CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT)
                  AS day,
                user_id
              FROM events),
            dau AS (
              SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS dau
              FROM days GROUP BY day),
            mau AS (
              SELECT d.day AS ref_day,
                CAST(count(DISTINCT a.user_id) AS BIGINT) AS mau
              FROM dau d JOIN days a
                ON a.day <= d.day AND a.day > d.day - 30
              GROUP BY d.day)
            SELECT day, dau, mau,
              round(CAST(dau AS DOUBLE) / mau, 6) AS stickiness
            FROM dau JOIN mau ON day = ref_day
            ORDER BY day NULLS FIRST"""))

  /** Fulfillment lead time by priority (q_orders_leadtime): the
    * ship-minus-order delay distribution per order priority — median,
    * p90 and max in integer days. Exact percentile over the integer
    * day counts keeps both engines on the same (n−1)p interpolation;
    * one fact join + one 5-row aggregate. The SLA report every ops
    * dashboard opens with. */
  val qOrdersLeadtime = Q(
    "q_orders_leadtime",
    (sp, dir) => {
      implicit val s: SparkSession = sp
      implicit val d: String = dir
      t("lineitem")
        .join(t("orders"), col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderpriority"),
          datediff(col("l_shipdate").cast("date"),
            col("o_orderdate").cast("date")).cast("long").as("days"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_lines"),
          round(expr("percentile(days, 0.5)"), 6).as("p50_days"),
          round(expr("percentile(days, 0.9)"), 6).as("p90_days"),
          max(col("days")).as("max_days"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""SELECT o_orderpriority,
              CAST(count(*) AS BIGINT) AS n_lines,
              round(quantile_cont(days, 0.5), 6) AS p50_days,
              round(quantile_cont(days, 0.9), 6) AS p90_days,
              max(days) AS max_days
            FROM (SELECT o_orderpriority,
                    CAST(CAST(l_shipdate AS DATE) -
                         CAST(o_orderdate AS DATE) AS BIGINT) AS days
                  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
            GROUP BY o_orderpriority
            ORDER BY o_orderpriority NULLS FIRST"""))

  /** Daily open-order backlog (q_orders_backlog): interval accounting —
    * an order opens at o_orderdate and closes when its LAST line ships
    * (max l_shipdate per order); the backlog curve is
    * cum(opened) − cum(closed) over the day grid. Two keyed aggregates
    * over the facts (orders by day; lineitem collapsed per order then
    * by close day), one full-outer align on the bounded day grid,
    * integer window sums — the WIP/inventory census shape that stays
    * two scans at any corpus size. */
  val qOrdersBacklog = Q(
    "q_orders_backlog",
    (s, d) => {
      val opens = Tables.t(s, d, "orders")
        .groupBy(col("o_orderdate").cast("date").as("day"))
        .agg(count(lit(1)).as("n_open"))
      val closes = Tables.t(s, d, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(max(col("l_shipdate")).as("ship"))
        .groupBy(col("ship").cast("date").as("day"))
        .agg(count(lit(1)).as("n_close"))
      val wCum = Window.orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      opens.join(closes, Seq("day"), "full_outer")
        .select(col("day"),
          coalesce(col("n_open"), lit(0L)).as("opened"),
          coalesce(col("n_close"), lit(0L)).as("closed"))
        .withColumn("backlog",
          sum(col("opened")).over(wCum) - sum(col("closed")).over(wCum))
        .orderBy(col("day"))
    },
    Some("""WITH opens AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
          CAST(count(*) AS BIGINT) AS n_open
        FROM orders GROUP BY 1),
      closes AS (
        SELECT CAST(ship AS DATE) AS day,
          CAST(count(*) AS BIGINT) AS n_close
        FROM (SELECT l_orderkey, max(l_shipdate) AS ship
              FROM lineitem GROUP BY l_orderkey) x
        GROUP BY 1),
      grid AS (
        SELECT coalesce(o.day, c.day) AS day,
          coalesce(n_open, 0) AS opened,
          coalesce(n_close, 0) AS closed
        FROM opens o FULL JOIN closes c ON o.day = c.day)
      SELECT day, opened, closed,
        CAST(sum(opened) OVER w - sum(closed) OVER w AS BIGINT)
          AS backlog
      FROM grid
      WINDOW w AS (ORDER BY day
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      ORDER BY day NULLS FIRST"""))

  // ---- q_events_cooccur -------------------------------------------------

  /** Event-type co-occurrence projection (q_events_cooccur): project
    * the user ↔ event-type bipartite graph onto type-type edges — for
    * every type pair, how many users touch both, with cosine
    * (n∩/√(n_a·n_b)) and lift (n∩·N/(n_a·n_b)) from exact integer user
    * counts — the item-item collaborative-filtering primitive at the
    * type granularity. r17: ONE events scan — each user's distinct
    * type set is collected per user (bounded by the type domain) and
    * the pair / single / user-marker rows are generated IN-ROW from
    * the sorted set (the q_basket_lift discipline), so one keyed count
    * aggregate feeds everything; the per-type sizes and the
    * distinct-user total then ride bounded-grid windows over the
    * ≤(k²+k+1)-row count table. The previous self-join + three
    * re-derivations of the distinct (user, type) frame scanned the
    * fact 4 times for the same counts. Per-user fan-out stays bounded
    * by the TYPE GRID (≤ k² pairs per user), never raw event counts;
    * lift rides an integer micro-division, cosine is one IEEE sqrt of
    * exact integers. */
  val qEventsCooccur = Q(
    "q_events_cooccur",
    (sp, dir) => {
      implicit val s: SparkSession = sp
      implicit val d: String = dir
      val all = Window.partitionBy()
      val g = t("events")
        .groupBy(col("user_id"))
        .agg(array_sort(collect_set(col("event_type"))).as("ts"))
        .select(explode(expr(
          """concat(
               array(named_struct('kind', 0, 'ka', '', 'kb', '')),
               transform(ts, x -> named_struct('kind', 1, 'ka', x, 'kb', '')),
               flatten(transform(ts, (x, i) ->
                 transform(slice(ts, i + 2, size(ts)),
                   y -> named_struct('kind', 2, 'ka', x, 'kb', y)))))"""))
          .as("it"))
        .groupBy(col("it.kind").as("kind"), col("it.ka").as("ka"),
          col("it.kb").as("kb"))
        .agg(count(lit(1)).as("n"))
      g
        .withColumn("ptm", map_from_entries(collect_list(
          when(col("kind") === 1, struct(col("ka"), col("n"))))
          .over(all)))
        .withColumn("n_total",
          sum(when(col("kind") === 0, col("n"))).over(all))
        .filter(col("kind") === 2)
        .select(col("ka").as("type_a"), col("kb").as("type_b"),
          col("n").as("n_both"), col("ptm"), col("n_total"))
        .withColumn("na", expr("ptm[type_a]"))
        .withColumn("nb", expr("ptm[type_b]"))
        .select(col("type_a"), col("type_b"), col("n_both"),
          col("na"), col("nb"),
          round(col("n_both") /
            sqrt(col("na").cast("double") * col("nb")), 6).as("cosine"),
          // the 1e6·n∩·N product rides in DECIMAL(38,0)/HUGEINT: at
          // fleet-scale user counts it exceeds BIGINT (overflow rule)
          expr("(CAST(1000000 AS DECIMAL(38,0)) * n_both * n_total)" +
            " div (CAST(na AS DECIMAL(38,0)) * nb)").as("lift_micro"))
        .orderBy(col("type_a"), col("type_b"))
    },
    Some("""WITH ut AS (
              SELECT DISTINCT user_id, event_type FROM events),
            per_type AS (
              SELECT event_type, CAST(count(*) AS BIGINT) AS n_users
              FROM ut GROUP BY event_type),
            tot AS (
              SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_total
              FROM ut),
            pairs AS (
              SELECT x.event_type AS type_a, y.event_type AS type_b,
                CAST(count(*) AS BIGINT) AS n_both
              FROM ut x JOIN ut y ON x.user_id = y.user_id
                AND x.event_type < y.event_type
              GROUP BY 1, 2)
            SELECT type_a, type_b, n_both, na.n_users AS na,
              nb.n_users AS nb,
              round(n_both / sqrt(CAST(na.n_users AS DOUBLE)
                * nb.n_users), 6) AS cosine,
              CAST((CAST(1000000 AS HUGEINT) * n_both * n_total)
                // (CAST(na.n_users AS HUGEINT) * nb.n_users)
                AS BIGINT) AS lift_micro
            FROM pairs
            JOIN per_type na ON type_a = na.event_type
            JOIN per_type nb ON type_b = nb.event_type
            CROSS JOIN tot
            ORDER BY type_a NULLS FIRST, type_b NULLS FIRST"""))

  /** Pairwise Jensen-Shannon divergence between source unigram
    * DISTRIBUTIONS (q_text_jsd): the frequency-aware companion to
    * q_source_overlap's set Jaccard — two sources can share most of
    * their vocabulary yet weight it very differently, and JSD is the
    * symmetric, bounded (≤ ln 2) divergence a mixture planner reads.
    * Decomposition keeps it one vocabulary-sized inner join: for
    * shared terms the contribution p·ln(2p/(p+q)) + q·ln(2q/(p+q)) is
    * a PER-ROW double over integer counts (bit-identical across
    * engines) nano-quantized BEFORE the pair aggregate; terms private
    * to one side contribute exactly (1 − Σp_shared)·ln 2, recovered
    * from the shared-count sums — so no outer join and no
    * per-missing-term rows ever materialize. Candidates are bounded
    * by vocabulary × source-pairs, never documents. */
  val qTextJsd = Q(
    "q_text_jsd",
    (sp, dir) => {
      implicit val s: SparkSession = sp
      implicit val d: String = dir
      val tok = t("documents")
        .select(col("source"), explode(split(col("text"), " ")).as("term"))
        .groupBy(col("source"), col("term"))
        .agg(count(lit(1)).as("cnt"))
      val sizes = tok.groupBy(col("source").as("sz_src"))
        .agg(sum(col("cnt")).as("ntok"))
      val shared = tok
        .select(col("source").as("sa"), col("term"), col("cnt").as("ca"))
        .join(tok.select(col("source").as("sb"),
          col("term").as("tb"), col("cnt").as("cb")),
          col("term") === col("tb") && col("sa") < col("sb"))
        .join(broadcast(sizes.withColumnRenamed("sz_src", "ka")
          .withColumnRenamed("ntok", "na")), col("sa") === col("ka"))
        .join(broadcast(sizes.withColumnRenamed("sz_src", "kb")
          .withColumnRenamed("ntok", "nb")), col("sb") === col("kb"))
        .withColumn("t_nano", expr(
          """CAST(floor((
               (CAST(ca AS DOUBLE) / na)
                 * ln(2.0D * (CAST(ca AS DOUBLE) / na)
                     / (CAST(ca AS DOUBLE) / na + CAST(cb AS DOUBLE) / nb))
               + (CAST(cb AS DOUBLE) / nb)
                 * ln(2.0D * (CAST(cb AS DOUBLE) / nb)
                     / (CAST(ca AS DOUBLE) / na + CAST(cb AS DOUBLE) / nb))
             ) * 1e12 + 0.5D) AS BIGINT)"""))
      shared.groupBy(col("sa"), col("sb"))
        .agg(count(lit(1)).as("n_shared"),
          first(col("na")).as("na"), first(col("nb")).as("nb"),
          sum(col("t_nano")).as("st"),
          sum(col("ca")).as("sca"), sum(col("cb")).as("scb"))
        .select(col("sa"), col("sb"), col("n_shared"),
          round(expr(
            """0.5D * (CAST(st AS DOUBLE) / 1e12
                 + (1.0D - CAST(sca AS DOUBLE) / na) * ln(2.0D)
                 + (1.0D - CAST(scb AS DOUBLE) / nb) * ln(2.0D))"""), 6)
            .as("jsd"))
        .orderBy(col("sa"), col("sb"))
    },
    Some("""WITH tok AS (
              SELECT source, term, CAST(count(*) AS BIGINT) AS cnt
              FROM (SELECT source,
                      unnest(string_split(text, ' ')) AS term
                    FROM documents) x
              GROUP BY source, term),
            sizes AS (
              SELECT source AS sz_src, CAST(sum(cnt) AS BIGINT) AS ntok
              FROM tok GROUP BY source),
            shared AS (
              SELECT a.source AS sa, b.source AS sb,
                a.cnt AS ca, b.cnt AS cb, za.ntok AS na, zb.ntok AS nb,
                CAST(floor((
                  (CAST(a.cnt AS DOUBLE) / za.ntok)
                    * ln(2.0e0 * (CAST(a.cnt AS DOUBLE) / za.ntok)
                        / (CAST(a.cnt AS DOUBLE) / za.ntok
                           + CAST(b.cnt AS DOUBLE) / zb.ntok))
                  + (CAST(b.cnt AS DOUBLE) / zb.ntok)
                    * ln(2.0e0 * (CAST(b.cnt AS DOUBLE) / zb.ntok)
                        / (CAST(a.cnt AS DOUBLE) / za.ntok
                           + CAST(b.cnt AS DOUBLE) / zb.ntok))
                ) * 1e12 + 0.5e0) AS BIGINT) AS t_nano
              FROM tok a
              JOIN tok b ON a.term = b.term AND a.source < b.source
              JOIN sizes za ON a.source = za.sz_src
              JOIN sizes zb ON b.source = zb.sz_src)
            SELECT sa, sb, CAST(count(*) AS BIGINT) AS n_shared,
              round(0.5e0 * (CAST(sum(t_nano) AS DOUBLE) / 1e12
                + (1.0e0 - CAST(sum(ca) AS DOUBLE) / any_value(na))
                    * ln(2.0e0)
                + (1.0e0 - CAST(sum(cb) AS DOUBLE) / any_value(nb))
                    * ln(2.0e0)), 6) AS jsd
            FROM shared
            GROUP BY sa, sb
            ORDER BY sa NULLS FIRST, sb NULLS FIRST"""))

  /** Fano-factor overdispersion census (q_events_fano): per event
    * type, variance/mean of the DAILY event counts — 1 for a Poisson
    * arrival process, > 1 for bursty traffic — the load-model check a
    * capacity planner runs next to q_events_interarrival's gap fit.
    * Daily counts are exact integers; the variance rides (d, Σn, Σn²)
    * sufficient sums (DECIMAL(38,0)/HUGEINT squares), and both ratios
    * divide once. One (type × day)-grid aggregate after one scan. */
  /** (type, day) count cells — commutative, shared with the streaming
    * twin. */
  private[graft] def fanoCells(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    df.select(col("event_type"), to_date(col("ts")).as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"))

  /** The dispersion finisher over settled (type, day, n) cells. */
  private[graft] def fanoFromCells(cells: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    cells.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days"),
          sum(col("n")).as("s1"),
          sum(expr("CAST(n AS DECIMAL(38,0)) * n")).as("s2"))
        .select(col("event_type"), col("n_days"),
          round(expr("CAST(s1 AS DOUBLE) / n_days"), 6)
            .as("mean_daily"),
          round(expr(
            """(CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n_days)
               / (n_days - 1) / (CAST(s1 AS DOUBLE) / n_days)"""), 6)
            .as("fano"))
        .orderBy(col("event_type"))

  private[graft] val fanoOracleSql: String = """WITH cells AS (
              SELECT event_type, CAST(ts AS DATE) AS day,
                CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY event_type, day),
            st AS (
              SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
                CAST(sum(n) AS BIGINT) AS s1,
                CAST(sum(CAST(n AS HUGEINT) * n) AS HUGEINT) AS s2
              FROM cells GROUP BY event_type)
            SELECT event_type, n_days,
              round(CAST(s1 AS DOUBLE) / n_days, 6) AS mean_daily,
              round((CAST(s2 AS DOUBLE)
                  - CAST(s1 AS DOUBLE) * s1 / n_days)
                / (n_days - 1) / (CAST(s1 AS DOUBLE) / n_days), 6)
                AS fano
            FROM st
            ORDER BY event_type NULLS FIRST"""

  val qEventsFano = Q(
    "q_events_fano",
    (sp, dir) => fanoFromCells(fanoCells(Tables.t(sp, dir, "events"))),
    Some(fanoOracleSql))

  val all: Seq[Q] = Seq(qSourceOverlap, qEventsRfm, qBasketLift,
    qStatsWilson, qCohortLtv, qEventsStreaks, qOrdersCadence,
    qAggGini, qEventsDauMau, qOrdersLeadtime, qOrdersBacklog,
    qEventsCooccur, qTextJsd, qEventsFano)
}
