package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Round-8 additions: robust/order statistics, privacy auditing, corpus
  * novelty, and sketch-based cross-source overlap — the QA surface a
  * large-scale training-data pipeline runs AROUND the core curation
  * operators (reference scope: the DAQ manuals' rate/consistency
  * characterization generalized to corpus health checks;
  * Manuals/Testing/DAQ_self-triggering.md:194-239 motivates the
  * "characterize before you trust" tier).
  *
  * Shared scale discipline (SURVEY §4): every aggregate here is a
  * map-side-combinable pass over the fact table; windows only ever run
  * over DOMAIN-BOUNDED distinct-value tables (quantity grid ≤ 50 rows,
  * discount grid ≤ 11, sketch rows ≤ sources² × 128), never over
  * grow-with-corpus partitions; higher moments accumulate in
  * DECIMAL(38,0) so 100 TB row counts cannot overflow a BIGINT sum. */
object Refine {

  private def li(s: SparkSession, d: String) = Tables.t(s, d, "lineitem")
  private def ev(s: SparkSession, d: String) = Tables.t(s, d, "events")
  private def cust(s: SparkSession, d: String) = Tables.t(s, d, "customer")
  private def docs(s: SparkSession, d: String) = Tables.t(s, d, "documents")

  // ---- q_agg_trimmed ----------------------------------------------------

  /** Trimmed + winsorized means (q_agg_trimmed): the robust-mean pair
    * every metrics pipeline wants next to avg() once heavy tails show
    * up. Per return flag: exact interpolated P10/P90 cuts over WHOLE-
    * DOLLAR prices (the grid quantization that keeps the exact-
    * percentile aggregation buffer domain-bounded at ~1e5 distinct
    * values — the Audit.scala exact-vs-approx rule), then
    *   trimmed_mean  = mean of rows inside [p10, p90]  (exact integer
    *                   sum of in-range dollars / count), and
    *   winsor_mean   = (sum_mid + n_low·p10 + n_high·p90) / n,
    * assembled ALGEBRAICALLY from exact integer aggregates and the two
    * per-group cut scalars — never a data-order float reduction, so
    * both engines compute bit-identical doubles. Cut table is 3 rows
    * (flag domain is literal-bounded) → broadcast join-back. */
  val qAggTrimmed = Q(
    "q_agg_trimmed",
    (s, d) => {
      val base = li(s, d).select(col("l_returnflag").as("rf"),
        floor(col("l_extendedprice") + 0.5).cast("long").as("c"))
      val cuts = base.groupBy(col("rf").as("cf"))
        .agg(expr("percentile(c, 0.1)").as("p10"),
          expr("percentile(c, 0.9)").as("p90"))
      base.join(broadcast(cuts), col("rf") === col("cf"))
        .groupBy(col("rf"))
        .agg(
          count(lit(1)).as("n_rows"),
          max(col("p10")).as("cut10"),
          max(col("p90")).as("cut90"),
          sum(when(col("c") >= col("p10") && col("c") <= col("p90"),
            col("c")).otherwise(lit(0L))).as("sum_mid"),
          sum(when(col("c") >= col("p10") && col("c") <= col("p90"), 1L)
            .otherwise(0L)).as("n_mid"),
          sum(when(col("c") < col("p10"), 1L).otherwise(0L)).as("n_low"),
          sum(when(col("c") > col("p90"), 1L).otherwise(0L)).as("n_high"))
        .select(col("rf").as("l_returnflag"),
          round(col("cut10"), 6).as("p10"),
          round(col("cut90"), 6).as("p90"),
          round(col("sum_mid").cast("double") / col("n_mid"), 6)
            .as("trimmed_mean"),
          round((col("sum_mid").cast("double") +
              col("n_low") * col("cut10") +
              col("n_high") * col("cut90")) / col("n_rows"), 6)
            .as("winsor_mean"))
        .orderBy(col("l_returnflag"))
    },
    Some("""WITH base AS (
              SELECT l_returnflag AS rf,
                CAST(floor(l_extendedprice + 0.5) AS BIGINT) AS c
              FROM lineitem),
            cuts AS (
              SELECT rf AS cf, quantile_cont(c, 0.1) AS p10,
                quantile_cont(c, 0.9) AS p90
              FROM base GROUP BY rf),
            agg AS (
              SELECT rf, count(*) AS n_rows,
                max(p10) AS cut10, max(p90) AS cut90,
                CAST(sum(CASE WHEN c >= p10 AND c <= p90 THEN c
                         ELSE 0 END) AS BIGINT) AS sum_mid,
                CAST(sum(CASE WHEN c >= p10 AND c <= p90 THEN 1
                         ELSE 0 END) AS BIGINT) AS n_mid,
                CAST(sum(CASE WHEN c < p10 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_low,
                CAST(sum(CASE WHEN c > p90 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_high
              FROM base JOIN cuts ON rf = cf
              GROUP BY rf)
            SELECT rf AS l_returnflag,
              round(cut10, 6) AS p10, round(cut90, 6) AS p90,
              round(CAST(sum_mid AS DOUBLE) / n_mid, 6) AS trimmed_mean,
              round((CAST(sum_mid AS DOUBLE) + n_low * cut10
                + n_high * cut90) / n_rows, 6) AS winsor_mean
            FROM agg
            ORDER BY l_returnflag NULLS FIRST"""))

  // ---- q_agg_spearman ---------------------------------------------------

  /** Spearman rank correlation (q_agg_spearman) between quantity and
    * discount per return flag — the tie-aware average-rank formulation,
    * computed WITHOUT ranking individual rows: both variables live on
    * literal-bounded grids (quantity 1..50, discount per-cent 0..10),
    * so the average rank of every grid value is derived on the
    * per-(flag, value) COUNT table — a window over ≤ 50 rows per group,
    * never over the fact — and joined back broadcast. Doubled ranks
    * 2·rank_avg = 2·n_below + cnt + 1 are exact BIGINTs; the Pearson-
    * on-ranks correlation assembles from five DECIMAL(38,0) sufficient
    * sums cast to double once — deterministic at any row count (the
    * Gini/RFM broadcast-cuts discipline applied to rank transforms). */
  val qAggSpearman = Q(
    "q_agg_spearman",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val base = li(s, d).select(col("l_returnflag").as("rf"),
        col("l_quantity").cast("long").as("x"),
        floor(col("l_discount") * 100 + 0.5).cast("long").as("y"))
      def rankTab(vcol: String): DataFrame = {
        val w = Window.partitionBy(col("rf")).orderBy(col(vcol))
        base.groupBy(col("rf"), col(vcol))
          .agg(count(lit(1)).as("cnt"))
          .withColumn("below",
            coalesce(sum(col("cnt")).over(
              w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select(col("rf").as(s"${vcol}_rf"), col(vcol).as(s"${vcol}_v"),
            (col("below") * 2 + col("cnt") + 1).as(s"r2_$vcol"))
      }
      base
        .join(broadcast(rankTab("x")),
          col("rf") === col("x_rf") && col("x") === col("x_v"))
        .join(broadcast(rankTab("y")),
          col("rf") === col("y_rf") && col("y") === col("y_v"))
        .groupBy(col("rf"))
        .agg(count(lit(1)).as("n"),
          sum(col("r2_x").cast("decimal(38,0)")).as("sx"),
          sum(col("r2_y").cast("decimal(38,0)")).as("sy"),
          sum((col("r2_x") * col("r2_x")).cast("decimal(38,0)")).as("sxx"),
          sum((col("r2_y") * col("r2_y")).cast("decimal(38,0)")).as("syy"),
          sum((col("r2_x") * col("r2_y")).cast("decimal(38,0)")).as("sxy"))
        .select(col("rf").as("l_returnflag"), col("n"),
          round((col("n").cast("double") * col("sxy").cast("double") -
              col("sx").cast("double") * col("sy").cast("double")) /
            sqrt((col("n").cast("double") * col("sxx").cast("double") -
                col("sx").cast("double") * col("sx").cast("double")) *
              (col("n").cast("double") * col("syy").cast("double") -
                col("sy").cast("double") * col("sy").cast("double"))), 6)
            .as("spearman"))
        .orderBy(col("l_returnflag"))
    },
    Some("""WITH base AS (
              SELECT l_returnflag AS rf,
                CAST(l_quantity AS BIGINT) AS x,
                CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS y
              FROM lineitem),
            rx AS (
              SELECT rf, x AS v,
                2 * coalesce(sum(cnt) OVER (PARTITION BY rf ORDER BY x
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                + cnt + 1 AS r2
              FROM (SELECT rf, x, CAST(count(*) AS BIGINT) AS cnt
                    FROM base GROUP BY rf, x) g),
            ry AS (
              SELECT rf, y AS v,
                2 * coalesce(sum(cnt) OVER (PARTITION BY rf ORDER BY y
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                + cnt + 1 AS r2
              FROM (SELECT rf, y, CAST(count(*) AS BIGINT) AS cnt
                    FROM base GROUP BY rf, y) g),
            joined AS (
              SELECT b.rf, rx.r2 AS r2x, ry.r2 AS r2y
              FROM base b
              JOIN rx ON b.rf = rx.rf AND b.x = rx.v
              JOIN ry ON b.rf = ry.rf AND b.y = ry.v),
            stats AS (
              SELECT rf, CAST(count(*) AS BIGINT) AS n,
                sum(r2x) AS sx, sum(r2y) AS sy,
                sum(r2x * r2x) AS sxx, sum(r2y * r2y) AS syy,
                sum(r2x * r2y) AS sxy
              FROM joined GROUP BY rf)
            SELECT rf AS l_returnflag, n,
              round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                  * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                    - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
                AS spearman
            FROM stats
            ORDER BY l_returnflag NULLS FIRST"""))

  // ---- q_agg_skew_kurt --------------------------------------------------

  /** Higher central moments (q_agg_skew_kurt): population skewness and
    * excess kurtosis per event type, from the four raw power sums over
    * integer cents — the one-pass sufficient-statistics shape
    * (q_ml_linreg discipline). Per-row powers stay in BIGINT range
    * (cents ≤ ~5e4 → c⁴ ≤ 5.8e18); the SUMS accumulate in
    * DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) so any corpus size is
    * exact, and each sum converts to double exactly once before the
    * closed-form moment algebra — no engine-order float reduction
    * anywhere. Built-in skewness()/kurtosis() are deliberately NOT
    * used: Spark's are population moments, DuckDB's are sample-
    * corrected, so the portable formulation IS the operator. */
  val qAggSkewKurt = Q(
    "q_agg_skew_kurt",
    (s, d) => {
      val base = ev(s, d).select(col("event_type"),
        floor(col("value") * 100 + 0.5).cast("long").as("c"))
      val n = col("n").cast("double")
      val Seq(s1, s2, s3, s4) =
        Seq("s1", "s2", "s3", "s4").map(c => col(c).cast("double"))
      val mean = s1 / n
      val m2 = s2 / n - mean * mean
      val m3 = s3 / n - lit(3.0) * mean * (s2 / n) +
        lit(2.0) * mean * mean * mean
      val m4 = s4 / n - lit(4.0) * mean * (s3 / n) +
        lit(6.0) * mean * mean * (s2 / n) -
        lit(3.0) * mean * mean * mean * mean
      base.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("c").cast("decimal(38,0)")).as("s1"),
          sum((col("c") * col("c")).cast("decimal(38,0)")).as("s2"),
          sum((col("c") * col("c") * col("c")).cast("decimal(38,0)"))
            .as("s3"),
          sum((col("c") * col("c") * col("c") * col("c"))
            .cast("decimal(38,0)")).as("s4"))
        .select(col("event_type"), col("n"),
          round(mean / 100.0, 6).as("mean_value"),
          round(m3 / pow(m2, 1.5), 6).as("skewness"),
          round(m4 / (m2 * m2) - 3.0, 6).as("kurtosis_excess"))
        .orderBy(col("event_type"))
    },
    Some("""WITH base AS (
              SELECT event_type,
                CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
              FROM events),
            sums AS (
              SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                sum(c) AS s1, sum(c * c) AS s2,
                sum(c * c * c) AS s3, sum(c * c * c * c) AS s4
              FROM base GROUP BY event_type),
            m AS (
              SELECT event_type, n,
                CAST(s1 AS DOUBLE) / n AS mean,
                CAST(s2 AS DOUBLE) / n AS e2,
                CAST(s3 AS DOUBLE) / n AS e3,
                CAST(s4 AS DOUBLE) / n AS e4
              FROM sums)
            SELECT event_type, n,
              round(mean / 100.0, 6) AS mean_value,
              round((e3 - 3.0 * mean * e2 + 2.0 * mean * mean * mean)
                / pow(e2 - mean * mean, 1.5), 6) AS skewness,
              round((e4 - 4.0 * mean * e3 + 6.0 * mean * mean * e2
                  - 3.0 * mean * mean * mean * mean)
                / pow(e2 - mean * mean, 2.0) - 3.0, 6)
                AS kurtosis_excess
            FROM m
            ORDER BY event_type NULLS FIRST"""))

  // ---- q_audit_kanon ----------------------------------------------------

  /** k-anonymity audit (q_audit_kanon): the privacy gate a dataset
    * release runs — bucket every customer into its quasi-identifier
    * equivalence class (nation, market segment, account-balance
    * thousand-band) and report, per segment, how many classes exist,
    * how many are smaller than k = 5, and what fraction of rows sit in
    * those re-identifiable classes. Two hash aggregates (rows → classes
    * → per-segment rollup), output bounded by the QI domain — the
    * 100 TB cost is one scan. */
  val qAuditKanon = Q(
    "q_audit_kanon",
    (s, d) => {
      val classes = cust(s, d)
        .select(col("c_mktsegment"), col("c_nationkey"),
          floor(col("c_acctbal") / 1000).cast("long").as("bal_band"))
        .groupBy(col("c_mktsegment"), col("c_nationkey"), col("bal_band"))
        .agg(count(lit(1)).as("cnt"))
      classes.groupBy(col("c_mktsegment"))
        .agg(
          sum(col("cnt")).as("n_rows"),
          count(lit(1)).as("n_classes"),
          sum(when(col("cnt") < 5, 1L).otherwise(0L)).as("n_small"),
          sum(when(col("cnt") < 5, col("cnt")).otherwise(0L))
            .as("rows_at_risk"))
        .select(col("c_mktsegment"), col("n_rows"), col("n_classes"),
          col("n_small"),
          col("rows_at_risk"),
          round(col("rows_at_risk").cast("double") / col("n_rows"), 6)
            .as("risk_frac"))
        .orderBy(col("c_mktsegment"))
    },
    Some("""WITH classes AS (
              SELECT c_mktsegment, c_nationkey,
                CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
                CAST(count(*) AS BIGINT) AS cnt
              FROM customer
              GROUP BY c_mktsegment, c_nationkey, bal_band)
            SELECT c_mktsegment,
              CAST(sum(cnt) AS BIGINT) AS n_rows,
              count(*) AS n_classes,
              CAST(sum(CASE WHEN cnt < 5 THEN 1 ELSE 0 END) AS BIGINT)
                AS n_small,
              CAST(sum(CASE WHEN cnt < 5 THEN cnt ELSE 0 END) AS BIGINT)
                AS rows_at_risk,
              round(CAST(sum(CASE WHEN cnt < 5 THEN cnt ELSE 0 END)
                AS DOUBLE) / sum(cnt), 6) AS risk_frac
            FROM classes
            GROUP BY c_mktsegment
            ORDER BY c_mktsegment NULLS FIRST"""))

  // ---- q_text_novelty ---------------------------------------------------

  /** N-gram novelty profile (q_text_novelty): how much genuinely NEW
    * text each source contributes, processed in doc_id (ingest) order —
    * the diversity counterpart of the dedup tier. A bigram's owner is
    * the minimum doc_id containing it; a document's novelty is the
    * fraction of its distinct bigrams it owns. Per-doc fractions are
    * exact micro-quantized integers (novel·1e6 div nb — the
    * q_text_contrast integral-division discipline) so the per-source
    * mean is a deterministic integer sum. Plan: one bigram explode, one
    * (w1,w2)-keyed min aggregate, one vocabulary-keyed equi-join back
    * (UNHINTED — vocab grows with the corpus), two bounded rollups.
    * No windows, nothing corpus-sized is ever broadcast. */
  val qTextNovelty = Q(
    "q_text_novelty",
    (s, d) => {
      val bd = Corpus.bigramRows(docs(s, d))
        .select(col("doc_id"), col("source"), col("w1"), col("w2"))
        .distinct()
      val owner = bd.groupBy(col("w1"), col("w2"))
        .agg(min(col("doc_id")).as("first_doc"))
      val perDoc = bd.join(owner, Seq("w1", "w2"))
        .groupBy(col("doc_id"), col("source"))
        .agg(count(lit(1)).as("nb"),
          sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
            .as("novel"))
        .withColumn("nov_micro", expr("(novel * 1000000) div nb"))
      perDoc.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("nb")).as("n_bigrams"),
          sum(col("novel")).as("n_novel"),
          sum(col("nov_micro")).as("sum_micro"))
        .select(col("source"), col("n_docs"), col("n_bigrams"),
          col("n_novel"),
          round(col("sum_micro").cast("double") / 1e6 / col("n_docs"), 6)
            .as("avg_novelty"))
        .orderBy(col("source"))
    },
    Some("""WITH tk AS (
              SELECT doc_id, source, string_split(text, ' ') AS w
              FROM documents
              WHERE len(string_split(text, ' ')) >= 2),
            bd AS (
              SELECT DISTINCT doc_id, source, w[i] AS w1, w[i + 1] AS w2
              FROM tk, LATERAL (
                SELECT unnest(generate_series(1, len(w) - 1)) AS i) g),
            owner AS (
              SELECT w1, w2, min(doc_id) AS first_doc
              FROM bd GROUP BY w1, w2),
            per_doc AS (
              SELECT bd.doc_id, bd.source,
                CAST(count(*) AS BIGINT) AS nb,
                CAST(sum(CASE WHEN o.first_doc = bd.doc_id THEN 1
                         ELSE 0 END) AS BIGINT) AS novel
              FROM bd JOIN owner o ON bd.w1 = o.w1 AND bd.w2 = o.w2
              GROUP BY bd.doc_id, bd.source),
            md AS (
              SELECT doc_id, source, nb, novel,
                (novel * 1000000) // nb AS nov_micro
              FROM per_doc)
            SELECT source, count(*) AS n_docs,
              CAST(sum(nb) AS BIGINT) AS n_bigrams,
              CAST(sum(novel) AS BIGINT) AS n_novel,
              round(CAST(sum(nov_micro) AS DOUBLE) / 1e6 / count(*), 6)
                AS avg_novelty
            FROM md
            GROUP BY source
            ORDER BY source NULLS FIRST"""))

  // ---- q_agg_kmv --------------------------------------------------------

  /** KMV sketch overlap (q_agg_kmv): cross-source distinct-document and
    * Jaccard estimation from k-minimum-values sketches — the
    * constant-memory answer to "how much do my crawl snapshots
    * overlap?" that q_source_overlap's exact join cannot give at
    * 100 TB. Per source, the sketch is the k = 64 smallest 32-bit text
    * hashes (the portable first-8-hex-of-md5 hash the dedup tier
    * already shares with DuckDB); the per-source top-k plans as a
    * partial WindowGroupLimit (map-side keeps ≤ 64 per source — the
    * q_topk/zipf idiom), so the full corpus never reaches one task.
    * Pair stage runs entirely on sketches: ≤ sources²·2k rows.
    * Estimators (both engines, same CASE): D̂ = (k−1)·2³²/τ_k when the
    * sketch saturates (else the exact sketch count), Jaccard from the
    * k smallest of the MERGED sketch — shared fraction within it. */
  val qAggKmv = Q(
    "q_agg_kmv",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val k = 64
      val hashes = docs(s, d)
        .select(col("source"),
          expr("CAST(conv(substring(md5(lower(trim(text))), 1, 8), 16, 10) AS BIGINT)")
            .as("h"))
        .distinct()
      val sk = hashes
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("source")).orderBy(col("h"))))
        .filter(col("rn") <= k)
      val est = sk.groupBy(col("source"))
        .agg(count(lit(1)).as("sk_n"), max(col("h")).as("tau"))
        .select(col("source"),
          when(col("sk_n") < k, col("sk_n").cast("double"))
            .otherwise((lit(k - 1) * lit(4294967296.0)) / col("tau"))
            .as("d_est"))
      val srcs = sk.select(col("source")).distinct()
      val pairs = srcs.as("pa").join(srcs.as("pb"),
          col("pa.source") < col("pb.source"))
        .select(col("pa.source").as("sa"), col("pb.source").as("sb"))
      val pe = pairs.join(sk.select(col("source").as("es"), col("h")),
          col("es") === col("sa") || col("es") === col("sb"))
        .groupBy(col("sa"), col("sb"), col("h"))
        .agg(max(when(col("es") === col("sa"), 1L).otherwise(0L)).as("in_a"),
          max(when(col("es") === col("sb"), 1L).otherwise(0L)).as("in_b"))
      val merged = pe
        .withColumn("mrn", row_number().over(
          Window.partitionBy(col("sa"), col("sb")).orderBy(col("h"))))
        .filter(col("mrn") <= k)
      merged.groupBy(col("sa"), col("sb"))
        .agg(count(lit(1)).as("k_used"),
          sum(when(col("in_a") === 1 && col("in_b") === 1, 1L)
            .otherwise(0L)).as("n_shared"))
        .join(broadcast(est).select(col("source").as("ea"),
          round(col("d_est"), 2).as("est_a")), col("sa") === col("ea"))
        .join(broadcast(est).select(col("source").as("eb"),
          round(col("d_est"), 2).as("est_b")), col("sb") === col("eb"))
        .select(col("sa"), col("sb"), col("est_a"), col("est_b"),
          col("k_used"), col("n_shared"),
          round(col("n_shared").cast("double") / col("k_used"), 6)
            .as("jaccard_est"))
        .orderBy(col("sa"), col("sb"))
    },
    Some("""WITH hashes AS (
              SELECT DISTINCT source,
                CAST('0x' || substr(md5(lower(trim(text))), 1, 8)
                  AS BIGINT) AS h
              FROM documents),
            sk AS (
              SELECT source, h FROM (
                SELECT source, h, row_number() OVER (
                  PARTITION BY source ORDER BY h) AS rn
                FROM hashes) z WHERE rn <= 64),
            est AS (
              SELECT source,
                CASE WHEN count(*) < 64
                  THEN CAST(count(*) AS DOUBLE)
                  ELSE 63 * 4294967296.0 / max(h) END AS d_est
              FROM sk GROUP BY source),
            srcs AS (SELECT DISTINCT source FROM sk),
            pairs AS (
              SELECT a.source AS sa, b.source AS sb
              FROM srcs a JOIN srcs b ON a.source < b.source),
            pe AS (
              SELECT p.sa, p.sb, e.h,
                CAST(max(CASE WHEN e.source = p.sa THEN 1 ELSE 0 END)
                  AS BIGINT) AS in_a,
                CAST(max(CASE WHEN e.source = p.sb THEN 1 ELSE 0 END)
                  AS BIGINT) AS in_b
              FROM pairs p JOIN sk e
                ON e.source = p.sa OR e.source = p.sb
              GROUP BY p.sa, p.sb, e.h),
            merged AS (
              SELECT sa, sb, h, in_a, in_b FROM (
                SELECT sa, sb, h, in_a, in_b, row_number() OVER (
                  PARTITION BY sa, sb ORDER BY h) AS mrn
                FROM pe) z WHERE mrn <= 64)
            SELECT m.sa, m.sb,
              round(ea.d_est, 2) AS est_a, round(eb.d_est, 2) AS est_b,
              count(*) AS k_used,
              CAST(sum(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_shared,
              round(CAST(sum(CASE WHEN in_a = 1 AND in_b = 1 THEN 1
                  ELSE 0 END) AS DOUBLE) / count(*), 6) AS jaccard_est
            FROM merged m
            JOIN est ea ON m.sa = ea.source
            JOIN est eb ON m.sb = eb.source
            GROUP BY m.sa, m.sb, ea.d_est, eb.d_est
            ORDER BY sa NULLS FIRST, sb NULLS FIRST"""))

  val all: Seq[Q] = Seq(
    qAggTrimmed, qAggSpearman, qAggSkewKurt, qAuditKanon,
    qTextNovelty, qAggKmv)
}
