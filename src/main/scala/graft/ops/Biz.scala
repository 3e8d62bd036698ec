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
      val sizes = vocab.groupBy(col("source").as("sz_src"))
        .agg(count(lit(1)).as("sz"))
      val inter = vocab.select(col("source").as("sa"), col("term"))
        .join(vocab.select(col("source").as("sb"),
          col("term").as("rterm")),
          col("term") === col("rterm") && col("sa") < col("sb"))
        .groupBy(col("sa"), col("sb"))
        .agg(count(lit(1)).as("inter"))
      inter
        .join(broadcast(sizes).withColumnRenamed("sz_src", "ka"),
          col("sa") === col("ka"))
        .withColumnRenamed("sz", "sza")
        .join(broadcast(sizes).withColumnRenamed("sz_src", "kb"),
          col("sb") === col("kb"))
        .withColumnRenamed("sz", "szb")
        .select(col("sa"), col("sb"), col("inter"),
          round(col("inter").cast("double") /
            (col("sza") + col("szb") - col("inter")), 6).as("jaccard"))
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
    * (purchase count), monetary (cents sum) — each cut into quintiles
    * by ntile over a (metric, user) total order, concatenated into the
    * classic three-digit segment. The per-user aggregate is one
    * shuffle; the three ntile windows run over the users table (not
    * the fact), which is the RFM cost model at any scale. */
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
      val rW = Window.orderBy(col("recency_days"), col("user_id"))
      val fW = Window.orderBy(col("frequency").desc, col("user_id"))
      val mW = Window.orderBy(col("monetary_cents").desc, col("user_id"))
      byUser
        .withColumn("r_score", ntile(5).over(rW).cast("long"))
        .withColumn("f_score", ntile(5).over(fW).cast("long"))
        .withColumn("m_score", ntile(5).over(mW).cast("long"))
        .select(col("user_id"), col("recency_days"), col("frequency"),
          col("monetary_cents"), col("r_score"), col("f_score"),
          col("m_score"),
          concat(col("r_score"), col("f_score"), col("m_score"))
            .as("segment"))
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
              GROUP BY user_id)
            SELECT user_id, recency_days, frequency, monetary_cents,
              r_score, f_score, m_score,
              CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
                || CAST(m_score AS VARCHAR) AS segment
            FROM (SELECT *,
                    CAST(ntile(5) OVER (ORDER BY recency_days, user_id)
                      AS BIGINT) AS r_score,
                    CAST(ntile(5) OVER (ORDER BY frequency DESC, user_id)
                      AS BIGINT) AS f_score,
                    CAST(ntile(5) OVER (ORDER BY monetary_cents DESC,
                      user_id) AS BIGINT) AS m_score
                  FROM by_user)
            ORDER BY user_id NULLS FIRST"""))

  /** Market-basket brand affinity (q_basket_lift): brand pairs
    * co-occurring in the same order, with support and lift. The pair
    * explode is bounded by order size (an order has ~7 lines), so the
    * self-join on l_orderkey is linear in the fact, never quadratic in
    * the catalog; lift = n·N/(na·nb) is integer until one division.
    * Top 20 by lift over a minimum-support floor. */
  val qBasketLift = Q(
    "q_basket_lift",
    (sp, dir) => {
      implicit val s: SparkSession = sp
      implicit val d: String = dir
      val lines = t("lineitem")
        .join(broadcast(t("part").select(col("p_partkey"),
          col("p_brand"))), col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey").as("ok"), col("p_brand")).distinct()
      val nOrders = t("orders").agg(count(lit(1)).as("n_orders"))
      val brandCounts = lines.groupBy(col("p_brand").as("bc_brand"))
        .agg(count(lit(1)).as("n_brand"))
      val pairs = lines.select(col("ok"), col("p_brand").as("ba"))
        .join(lines.select(col("ok").as("rok"), col("p_brand").as("bb")),
          col("ok") === col("rok") && col("ba") < col("bb"))
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

  val all: Seq[Q] = Seq(qSourceOverlap, qEventsRfm, qBasketLift)
}
