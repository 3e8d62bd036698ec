package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Statistical-inference tier (round 9): the hypothesis tests and
  * effect-size measures a data-quality/drift platform runs ON TOP of the
  * grouped telemetry the rest of the engine produces — one-way ANOVA,
  * Kruskal-Wallis, Kendall tau-b, Cramér's V, ROC AUC, winsorized means,
  * readability scoring and HITS authority.
  *
  * Scale discipline shared by every op here: the raw table is touched by
  * exactly ONE keyed aggregate (or rank window over the bounded distinct
  * grid — the q_agg_equidepth argument); everything after is algebra over
  * group/cell tables whose size is domain-bounded (event types, cent
  * grid, quantity×discount cells), so a 100× corpus changes only the
  * first aggregate's input. Rank statistics accumulate INTEGER-exact
  * (doubled average ranks in DECIMAL(38,0)/HUGEINT — the
  * q_stats_mannwhitney idiom) so both engines reach the identical
  * sufficient statistics before the single double conversion. */
object Inference {

  private def ev(s: SparkSession, d: String): DataFrame =
    Tables.t(s, d, "events")

  // ---- q_stats_anova ----------------------------------------------------

  /** One-way ANOVA F over event-type value distributions
    * (q_stats_anova): the parametric sibling of q_stats_mannwhitney —
    * does mean monetary value differ across event types? Sufficient
    * statistics only: per-group (n, Σc, Σc²) on the cent grid in
    * BIGINT/DECIMAL(38,0), so SSB/SSW are exact rationals until the
    * final F division. One keyed aggregate over the corpus; the rollup
    * is k rows. */
  val qStatsAnova = Q(
    "q_stats_anova",
    (s, d) => {
      val g = ev(s, d)
        .select(col("event_type"),
          floor(col("value") * 100 + 0.5).cast("long").as("c"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("c").cast("decimal(38,0)")).as("sc"),
          sum(col("c").cast("decimal(38,0)") * col("c")).as("sc2"))
      // SSW = Σ_g (sc2_g - sc_g²/n_g); SSB = Σ_g sc_g²/n_g - (Σsc)²/N
      // Each group's sc²/n term is quantized to integer micro-units
      // BEFORE the cross-group sum (the q_surv_logrank discipline): a
      // raw double sum is partial-aggregation-order-dependent in Spark
      // and differs from DuckDB's ordering on a rounding boundary.
      val st = g.agg(
        count(lit(1)).as("k"),
        sum(col("n")).as("nn"),
        sum(col("sc")).as("tsc"),
        sum(col("sc2")).as("tsc2"),
        sum(expr("CAST(floor(CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE)" +
          " / n * 1e6 + 0.5D) AS DECIMAL(38,0))")).as("sgr_micro"))
      st.withColumn("sgr", col("sgr_micro").cast("double") / lit(1e6))
        .select(
          col("k"), col("nn").as("n"),
          round(
            ((col("sgr") - col("tsc").cast("double") *
              col("tsc").cast("double") / col("nn")) / (col("k") - 1)) /
              ((col("tsc2").cast("double") - col("sgr")) /
                (col("nn") - col("k"))), 6).as("f"))
    },
    Some("""WITH g AS (
              SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                sum(CAST(CAST(floor(value * 100 + 0.5) AS BIGINT)
                    AS HUGEINT)) AS sc,
                sum(CAST(CAST(floor(value * 100 + 0.5) AS BIGINT)
                    AS HUGEINT)
                  * CAST(floor(value * 100 + 0.5) AS BIGINT)) AS sc2
              FROM events GROUP BY event_type),
            st AS (
              SELECT CAST(count(*) AS BIGINT) AS k,
                CAST(sum(n) AS BIGINT) AS nn,
                sum(sc) AS tsc, sum(sc2) AS tsc2,
                CAST(sum(CAST(floor(CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE)
                    / n * 1e6 + 0.5e0) AS DECIMAL(38,0))) AS DOUBLE) / 1e6
                  AS sgr
              FROM g)
            SELECT k, nn AS n,
              round(
                ((sgr - CAST(tsc AS DOUBLE) * CAST(tsc AS DOUBLE) / nn)
                   / (k - 1))
                / ((CAST(tsc2 AS DOUBLE) - sgr) / (nn - k)), 6) AS f
            FROM st"""))

  // ---- q_stats_kruskal --------------------------------------------------

  /** Kruskal-Wallis H across ALL event types (q_stats_kruskal): the
    * k-group extension of the Mann-Whitney rank machinery — tie-corrected
    * H over the doubled-average-rank grid. The rank window runs over the
    * DISTINCT cent grid (grid-bounded), never raw rows; per-group
    * doubled rank sums accumulate in DECIMAL(38,0)/HUGEINT; with
    * rank2 = 2·rank, H = 3·(12·Σ R2_j²/n_j − N·(N+1)²) / (N(N+1)) / 12
    * simplifies to using R2²/4 — kept explicit below so both engines
    * run the identical expression. */
  val qStatsKruskal = Q(
    "q_stats_kruskal",
    (s, d) => {
      val vc = ev(s, d)
        .select(col("event_type"),
          floor(col("value") * 100 + 0.5).cast("long").as("c"))
        .groupBy(col("c"), col("event_type"))
        .agg(count(lit(1)).as("ng"))
      // Every per-cent and whole-grid quantity folds onto the vc frame
      // itself (r15 window-derivation discipline — the old perC/ranked/
      // ties chain re-derived the grid, and with it the fact scan,
      // three times): na rides a per-cent partition window, the
      // doubled-rank cum a RANGE frame ordered by c (ties of one cent
      // accumulate together, exactly the per-cent cum), and the
      // tie/total sums ride a global window that counts each cent ONCE
      // via a first-row-per-cent flag. All window inputs are the
      // (cent × type) grid — value-domain-bounded, never the fact.
      val wc = Window.partitionBy(col("c"))
      val wRange = Window.orderBy(col("c"))
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
      val wg = Window.partitionBy()
      val ranked = vc
        .withColumn("na", sum(col("ng")).over(wc))
        .withColumn("cum", sum(col("ng")).over(wRange))
        .withColumn("rank2",
          lit(2) * (col("cum") - col("na")) + col("na") + 1)
        .withColumn("one_per_c", row_number().over(
          Window.partitionBy(col("c")).orderBy(col("event_type"))) === 1)
        .withColumn("tt", sum(when(col("one_per_c"),
          col("na") * col("na") * col("na") - col("na"))).over(wg))
        .withColumn("nn",
          sum(when(col("one_per_c"), col("na"))).over(wg))
      val st = ranked
        .groupBy(col("event_type"))
        .agg(sum(col("ng")).as("nj"),
          sum(col("ng").cast("decimal(38,0)") * col("rank2")).as("r2j"),
          first(col("tt")).as("tt"), first(col("nn")).as("nn"))
        .agg(
          count(lit(1)).as("k"),
          first(col("nn")).as("nn"),
          first(col("tt")).as("tt"),
          // Σ (R2_j/2)² / n_j  with R2 exact → doubles at the last step
          sum(col("r2j").cast("double") * col("r2j").cast("double") /
            (lit(4.0) * col("nj"))).as("srj"))
      st.select(col("k"), col("nn").as("n"),
        round(
          (lit(12.0) * col("srj") /
            (col("nn").cast("double") * (col("nn") + 1)) -
            lit(3.0) * (col("nn") + 1)) /
            (lit(1.0) - col("tt").cast("double") /
              (col("nn").cast("double") * col("nn") * col("nn") -
                col("nn"))), 6).as("h"))
    },
    Some("""WITH vc AS (
              SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS c,
                event_type, CAST(count(*) AS BIGINT) AS ng
              FROM events GROUP BY c, event_type),
            per_c AS (
              SELECT c, CAST(sum(ng) AS BIGINT) AS na
              FROM vc GROUP BY c),
            ranked AS (
              SELECT c, na,
                2 * (sum(na) OVER (ORDER BY c
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     - na) + na + 1 AS rank2
              FROM per_c),
            grp AS (
              SELECT vc.event_type, CAST(sum(vc.ng) AS BIGINT) AS nj,
                sum(CAST(vc.ng AS HUGEINT) * r.rank2) AS r2j
              FROM vc JOIN ranked r ON vc.c = r.c
              GROUP BY vc.event_type),
            ties AS (
              SELECT CAST(sum(na*na*na - na) AS BIGINT) AS tt,
                CAST(sum(na) AS BIGINT) AS nn
              FROM ranked),
            st AS (
              SELECT CAST(count(*) AS BIGINT) AS k,
                any_value(nn) AS nn, any_value(tt) AS tt,
                sum(CAST(r2j AS DOUBLE) * CAST(r2j AS DOUBLE)
                    / (4.0 * nj)) AS srj
              FROM grp, ties)
            SELECT k, nn AS n,
              round(
                (12.0 * srj / (CAST(nn AS DOUBLE) * (nn + 1))
                   - 3.0 * (nn + 1))
                / (1.0 - CAST(tt AS DOUBLE)
                    / (CAST(nn AS DOUBLE) * nn * nn - nn)), 6) AS h
            FROM st"""))

  // ---- q_stats_kendall --------------------------------------------------

  /** Kendall tau-b between order quantity and discount percent
    * (q_stats_kendall): rank correlation on a DOMAIN-BOUNDED grid —
    * lineitem collapses to ≤ 50×11 (quantity, disc_pct) cells by one
    * keyed count, then concordant/discordant/tied pair masses come from
    * the cell-table self-join (≤ 550² comparisons — constant whatever
    * the corpus size; the raw-row formulation would be O(n²) and is the
    * trap). All pair masses are products of BIGINT counts accumulated in
    * DECIMAL(38,0)/HUGEINT — exact until the final sqrt. */
  val qStatsKendall = Q(
    "q_stats_kendall",
    (s, d) => {
      val cells = Tables.t(s, d, "lineitem")
        .select(col("l_quantity").cast("long").as("x"),
          round(col("l_discount") * 100).cast("long").as("y"))
        .groupBy(col("x"), col("y"))
        .agg(count(lit(1)).as("cnt"))
      // n/tie-mass totals ride the a-side as unbounded windows over the
      // ≤550-cell grid (r15 window-derivation discipline) — the old
      // third aggregate re-derived the grid and re-scanned the fact
      import org.apache.spark.sql.expressions.Window
      val wg = Window.partitionBy()
      val a = cells.select(col("x").as("xa"), col("y").as("ya"),
        col("cnt").as("ca"))
        .withColumn("nn", sum(col("ca")).over(wg))
        .withColumn("within", sum(col("ca").cast("decimal(38,0)") *
          (col("ca") - 1) / 2).over(wg))
      val b = cells.select(col("x").as("xb"), col("y").as("yb"),
        col("cnt").as("cb"))
      // every UNORDERED cell pair once: (a,b) with a-cell before b-cell
      // in (x, y) lexicographic order, plus the within-cell tie mass.
      // LEFT join (ADVICE r16): on a <2-cell grid the inner form went
      // empty and silently nulled n/within; the left join keeps every
      // a-row (null b-side rows contribute 0 to every pair mass via the
      // otherwise(0) arms, so populated-grid values are identical) and
      // the windowed totals always survive to the final aggregate
      val pairs = a.join(b,
        col("xa") < col("xb") ||
          (col("xa") === col("xb") && col("ya") < col("yb")), "left")
      val cross = pairs.agg(
        sum(when((col("xa") < col("xb") && col("ya") < col("yb")) ||
          (col("xa") > col("xb") && col("ya") > col("yb")),
          col("ca").cast("decimal(38,0)") * col("cb"))
          .otherwise(lit(0).cast("decimal(38,0)"))).as("conc"),
        sum(when((col("xa") < col("xb") && col("ya") > col("yb")) ||
          (col("xa") > col("xb") && col("ya") < col("yb")),
          col("ca").cast("decimal(38,0)") * col("cb"))
          .otherwise(lit(0).cast("decimal(38,0)"))).as("disc"),
        sum(when(col("xa") === col("xb"),
          col("ca").cast("decimal(38,0)") * col("cb"))
          .otherwise(lit(0).cast("decimal(38,0)"))).as("tx"),
        sum(when(col("ya") === col("yb"),
          col("ca").cast("decimal(38,0)") * col("cb"))
          .otherwise(lit(0).cast("decimal(38,0)"))).as("ty"),
        first(col("nn")).as("nn"),
        first(col("within")).as("within"))
      cross
        .select(
          col("nn").as("n"),
          col("conc").cast("double").as("concordant"),
          col("disc").cast("double").as("discordant"),
          round((col("conc").cast("double") - col("disc").cast("double")) /
            sqrt(
              (col("nn").cast("double") * (col("nn") - 1) / 2 -
                (col("tx").cast("double") + col("within").cast("double"))) *
              (col("nn").cast("double") * (col("nn") - 1) / 2 -
                (col("ty").cast("double") + col("within").cast("double")))),
            6).as("tau_b"))
    },
    Some("""WITH cells AS (
              SELECT CAST(l_quantity AS BIGINT) AS x,
                CAST(round(l_discount * 100) AS BIGINT) AS y,
                CAST(count(*) AS BIGINT) AS cnt
              FROM lineitem GROUP BY x, y),
            pairs AS (
              SELECT a.x AS xa, a.y AS ya, a.cnt AS ca,
                b.x AS xb, b.y AS yb, b.cnt AS cb
              FROM cells a JOIN cells b
                ON a.x < b.x OR (a.x = b.x AND a.y < b.y)),
            cross_m AS (
              SELECT
                sum(CASE WHEN (xa < xb AND ya < yb)
                        OR (xa > xb AND ya > yb)
                    THEN CAST(ca AS HUGEINT) * cb
                    ELSE CAST(0 AS HUGEINT) END) AS conc,
                sum(CASE WHEN (xa < xb AND ya > yb)
                        OR (xa > xb AND ya < yb)
                    THEN CAST(ca AS HUGEINT) * cb
                    ELSE CAST(0 AS HUGEINT) END) AS disc,
                sum(CASE WHEN xa = xb
                    THEN CAST(ca AS HUGEINT) * cb
                    ELSE CAST(0 AS HUGEINT) END) AS tx,
                sum(CASE WHEN ya = yb
                    THEN CAST(ca AS HUGEINT) * cb
                    ELSE CAST(0 AS HUGEINT) END) AS ty
              FROM pairs),
            nt AS (
              SELECT CAST(sum(cnt) AS BIGINT) AS nn,
                sum(CAST(cnt AS HUGEINT) * (cnt - 1) // 2) AS within
              FROM cells)
            SELECT nn AS n,
              CAST(conc AS DOUBLE) AS concordant,
              CAST(disc AS DOUBLE) AS discordant,
              round((CAST(conc AS DOUBLE) - CAST(disc AS DOUBLE))
                / sqrt(
                  (CAST(nn AS DOUBLE) * (nn - 1) / 2
                    - (CAST(tx AS DOUBLE) + CAST(within AS DOUBLE)))
                  * (CAST(nn AS DOUBLE) * (nn - 1) / 2
                    - (CAST(ty AS DOUBLE) + CAST(within AS DOUBLE)))),
                6) AS tau_b
            FROM cross_m, nt"""))

  // ---- q_stats_cramer ---------------------------------------------------

  /** Cramér's V between order status and priority (q_stats_cramer): the
    * normalized effect size on top of the chi-squared machinery
    * (q_stats_chisq reports the raw statistic; a drift dashboard wants
    * the 0..1 strength). One keyed count over orders; margins, the full
    * R×C grid (zero cells included) and V are cell algebra. */
  val qStatsCramer = Q(
    "q_stats_cramer",
    (s, d) => {
      val o = Tables.t(s, d, "orders")
        .groupBy(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).cast("double").as("obs"))
      val r = o.groupBy(col("o_orderstatus")).agg(sum(col("obs")).as("rl"))
      val c = o.groupBy(col("o_orderpriority")).agg(sum(col("obs")).as("cs"))
      val t = o.agg(sum(col("obs")).as("nn"))
      val chi = r.crossJoin(broadcast(c))
        .join(o, Seq("o_orderstatus", "o_orderpriority"), "left")
        .na.fill(Map("obs" -> 0.0))
        .crossJoin(broadcast(t))
        .agg(
          sum((col("obs") - col("rl") * col("cs") / col("nn")) *
            (col("obs") - col("rl") * col("cs") / col("nn")) /
            (col("rl") * col("cs") / col("nn"))).as("chi2"),
          first(col("nn")).as("nn"))
        .crossJoin(broadcast(r.agg(count(lit(1)).as("nr"))))
        .crossJoin(broadcast(c.agg(count(lit(1)).as("nc"))))
      chi.select(
        round(col("chi2"), 6).as("chi2"),
        col("nn").cast("long").as("n"),
        round(sqrt(col("chi2") / (col("nn") *
          least(col("nr") - 1, col("nc") - 1))), 6).as("cramer_v"))
    },
    Some("""WITH o AS (
              SELECT o_orderstatus, o_orderpriority,
                CAST(count(*) AS DOUBLE) AS obs
              FROM orders GROUP BY o_orderstatus, o_orderpriority),
            r AS (SELECT o_orderstatus, sum(obs) AS rl
                  FROM o GROUP BY o_orderstatus),
            c AS (SELECT o_orderpriority, sum(obs) AS cs
                  FROM o GROUP BY o_orderpriority),
            t AS (SELECT sum(obs) AS nn FROM o),
            fo AS (
              SELECT g.rl, g.cs, coalesce(o.obs, 0) AS obs, t.nn
              FROM (SELECT r.o_orderstatus, c.o_orderpriority, r.rl, c.cs
                    FROM r CROSS JOIN c) g
              LEFT JOIN o ON g.o_orderstatus = o.o_orderstatus
                AND g.o_orderpriority = o.o_orderpriority
              CROSS JOIN t),
            chi AS (
              SELECT sum((obs - rl*cs/nn)*(obs - rl*cs/nn)
                       / (rl*cs/nn)) AS chi2,
                any_value(nn) AS nn
              FROM fo)
            SELECT round(chi2, 6) AS chi2,
              CAST(nn AS BIGINT) AS n,
              round(sqrt(chi2 / (nn * least(
                (SELECT count(*) FROM r) - 1,
                (SELECT count(*) FROM c) - 1))), 6) AS cramer_v
            FROM chi"""))

  // ---- q_ml_auc ---------------------------------------------------------

  /** ROC AUC via the rank-sum identity (q_ml_auc): does document length
    * predict English? AUC(score=n_chars, label=lang='en') =
    * U₁/(n₁·n₀) with midrank tie handling — the Mann-Whitney doubled-rank
    * grid reused as a model-evaluation metric, so the WHOLE curve-free
    * AUC needs one keyed count over the corpus plus a window over the
    * distinct length grid. The classifier-eval shape for 100 TB: no
    * sort of raw scores, no per-threshold sweep. */
  val qMlAuc = Q(
    "q_ml_auc",
    (s, d) => {
      val base = Tables.t(s, d, "documents")
        .select(col("n_chars").as("c"), (col("lang") === "en").as("pos"))
      val vc = base.groupBy(col("c"))
        .agg(count(lit(1)).as("na"),
          sum(when(col("pos"), 1L).otherwise(0L)).as("n1c"))
      val w = Window.orderBy(col("c"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val ranked = vc
        .withColumn("cum", sum(col("na")).over(w))
        .withColumn("rank2",
          lit(2) * (col("cum") - col("na")) + col("na") + 1)
      val st = ranked.agg(
        sum(col("n1c")).as("n1"),
        sum(col("na") - col("n1c")).as("n0"),
        sum(col("n1c").cast("decimal(38,0)") * col("rank2")).as("r1_2"))
      st.select(col("n1"), col("n0"),
        round((col("r1_2").cast("double") / 2 -
          col("n1").cast("double") * (col("n1") + 1) / 2) /
          (col("n1").cast("double") * col("n0")), 6).as("auc"))
    },
    Some("""WITH base AS (
              SELECT n_chars AS c, lang = 'en' AS pos FROM documents),
            vc AS (
              SELECT c, CAST(count(*) AS BIGINT) AS na,
                CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT)
                  AS n1c
              FROM base GROUP BY c),
            ranked AS (
              SELECT c, na, n1c,
                2 * (sum(na) OVER (ORDER BY c
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     - na) + na + 1 AS rank2
              FROM vc),
            st AS (
              SELECT CAST(sum(n1c) AS BIGINT) AS n1,
                CAST(sum(na - n1c) AS BIGINT) AS n0,
                sum(CAST(n1c AS HUGEINT) * rank2) AS r1_2
              FROM ranked)
            SELECT n1, n0,
              round((CAST(r1_2 AS DOUBLE) / 2
                  - CAST(n1 AS DOUBLE) * (n1 + 1) / 2)
                / (CAST(n1 AS DOUBLE) * n0), 6) AS auc
            FROM st"""))

  // ---- q_agg_winsorized -------------------------------------------------

  /** Winsorized mean per event type (q_agg_winsorized): the
    * clamp-don't-drop sibling of q_agg_trimmed — outliers are pulled to
    * the p05/p95 fences instead of discarded. Decomposed EXACTLY so no
    * engine ever sums clamped doubles in its own order: mean_w =
    * (n_below·lo + n_above·hi + Σ_mid c) / n where the interior sum and
    * the boundary counts are BIGINT on the cent grid and only lo/hi are
    * (interpolated-percentile) doubles. Two keyed aggregates + a
    * broadcast fence join. */
  val qAggWinsorized = Q(
    "q_agg_winsorized",
    (s, d) => {
      val base = ev(s, d).select(col("event_type"),
        floor(col("value") * 100 + 0.5).cast("long").as("c"))
      val fences = base.groupBy(col("event_type"))
        .agg(expr("percentile(c, 0.05)").as("lo"),
          expr("percentile(c, 0.95)").as("hi"))
      base.join(broadcast(fences), "event_type")
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          first(col("lo")).as("lo_f"),
          first(col("hi")).as("hi_f"),
          sum(when(col("c") < col("lo"), 1L).otherwise(0L)).as("nb"),
          sum(when(col("c") > col("hi"), 1L).otherwise(0L)).as("na_"),
          sum(when(col("c") >= col("lo") && col("c") <= col("hi"),
            col("c")).otherwise(0L)).as("smid"))
        .select(col("event_type"), col("n"),
          round(col("lo_f") / 100, 6).as("lo"),
          round(col("hi_f") / 100, 6).as("hi"),
          round((col("nb") * col("lo_f") + col("na_") * col("hi_f") +
            col("smid")) / (col("n") * lit(100.0)), 6).as("mean_w"))
        .orderBy(col("event_type"))
    },
    Some("""WITH base AS (
              SELECT event_type,
                CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
              FROM events),
            fences AS (
              SELECT event_type, quantile_cont(c, 0.05) AS lo,
                quantile_cont(c, 0.95) AS hi
              FROM base GROUP BY event_type)
            SELECT b.event_type, CAST(count(*) AS BIGINT) AS n,
              round(any_value(f.lo) / 100, 6) AS lo,
              round(any_value(f.hi) / 100, 6) AS hi,
              round((sum(CASE WHEN b.c < f.lo THEN 1 ELSE 0 END)
                       * any_value(f.lo)
                     + sum(CASE WHEN b.c > f.hi THEN 1 ELSE 0 END)
                       * any_value(f.hi)
                     + sum(CASE WHEN b.c >= f.lo AND b.c <= f.hi
                           THEN b.c ELSE 0 END))
                    / (count(*) * 100.0), 6) AS mean_w
            FROM base b JOIN fences f ON b.event_type = f.event_type
            GROUP BY b.event_type
            ORDER BY b.event_type NULLS FIRST"""))

  // ---- q_text_readability -----------------------------------------------

  /** Flesch reading-ease per source (q_text_readability): the
    * text-quality gate's readability axis — words, sentence marks and
    * vowel-group syllable estimates counted as INTEGER per-row regex
    * algebra (group count = len difference under replace-with-one-char
    * vs replace-with-nothing, a regex-engine-neutral formulation), then
    * one keyed rollup and a single double expression per source. Scan
    * once, no explode. */
  val qTextReadability = Q(
    "q_text_readability",
    (s, d) => {
      val t = Tables.t(s, d, "documents")
        .select(col("source"),
          size(split(col("text"), " ")).cast("long").as("wrd"),
          (length(regexp_replace(lower(col("text")), "[aeiouy]+", "#")) -
            length(regexp_replace(lower(col("text")), "[aeiouy]+", "")))
            .cast("long").as("syl"),
          greatest(
            (length(regexp_replace(col("text"), "[.!?]+", "#")) -
              length(regexp_replace(col("text"), "[.!?]+", "")))
              .cast("long"), lit(1L)).as("sen"))
      t.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("wrd")).as("words"),
          sum(col("syl")).as("syllables"),
          sum(col("sen")).as("sentences"))
        .select(col("source"), col("n_docs"), col("words"),
          col("syllables"), col("sentences"),
          round(lit(206.835) -
            lit(1.015) * col("words").cast("double") / col("sentences") -
            lit(84.6) * col("syllables").cast("double") / col("words"),
            6).as("flesch"))
        .orderBy(col("source"))
    },
    Some("""WITH t AS (
              SELECT source,
                CAST(len(string_split(text, ' ')) AS BIGINT) AS wrd,
                CAST(length(regexp_replace(lower(text),
                       '[aeiouy]+', '#', 'g'))
                   - length(regexp_replace(lower(text),
                       '[aeiouy]+', '', 'g')) AS BIGINT) AS syl,
                greatest(CAST(length(regexp_replace(text,
                       '[.!?]+', '#', 'g'))
                   - length(regexp_replace(text,
                       '[.!?]+', '', 'g')) AS BIGINT), 1) AS sen
              FROM documents)
            SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(wrd) AS BIGINT) AS words,
              CAST(sum(syl) AS BIGINT) AS syllables,
              CAST(sum(sen) AS BIGINT) AS sentences,
              round(206.835
                - 1.015 * CAST(sum(wrd) AS DOUBLE) / sum(sen)
                - 84.6 * CAST(sum(syl) AS DOUBLE) / sum(wrd), 6)
                AS flesch
            FROM t GROUP BY source
            ORDER BY source NULLS FIRST"""))

  // ---- q_graph_hits -----------------------------------------------------

  /** HITS hubs & authorities (q_graph_hits): the bidirectional sibling
    * of q_graph_pagerank on the same deterministic link graph — 2
    * unrolled mutual-reinforcement rounds (authority from in-links' hub
    * mass, hub from out-links' authority mass, L1-normalized), each new
    * score ROUNDED to 10 decimals so both engines carry bit-identical
    * state across iterations. Per round: two edge-keyed shuffled
    * aggregates + a broadcast normalizer — O(|E|), never quadratic. */
  val qGraphHits = Q(
    "q_graph_hits",
    (s, d) => {
      val docs = Tables.t(s, d, "documents")
      // shared persisted generator (Insights) — the inline build
      // re-entered EVERY join of the 2-round unroll (238 logical
      // copies of the documents scan; planning cost, not data)
      val edges = graft.ops.Insights.directedDistinctEdges(s, d)
      // lazy plan cuts (the BFS-loop discipline): each half-round
      // references the score table THREE times (the mass aggregate,
      // its normalizer, and the update join), so an un-cut lineage
      // still tripled per half-round after the edge fixpoint
      var scores = docs.select(col("doc_id"),
        lit(1.0).as("hub"), lit(1.0).as("auth"))
        .localCheckpoint(false)
      for (_ <- 0 until 2) {
        // authority <- sum of in-neighbors' hub; then L1-normalize
        val aRaw = scores
          .join(edges, col("doc_id") === col("src"))
          .groupBy(col("dst")).agg(sum(col("hub")).as("a_raw"))
        val aTot = aRaw.agg(sum(col("a_raw")).as("a_sum"))
        val withA = scores
          .join(aRaw, col("doc_id") === col("dst"), "left")
          .crossJoin(broadcast(aTot))
          .select(col("doc_id"), col("hub"),
            round(coalesce(col("a_raw"), lit(0.0)) / col("a_sum"), 10)
              .as("auth"))
          .localCheckpoint(false)
        // hub <- sum of out-neighbors' authority; then L1-normalize
        val hRaw = withA
          .join(edges, col("doc_id") === col("dst"))
          .groupBy(col("src")).agg(sum(col("auth")).as("h_raw"))
        val hTot = hRaw.agg(sum(col("h_raw")).as("h_sum"))
        scores = withA
          .join(hRaw, col("doc_id") === col("src"), "left")
          .crossJoin(broadcast(hTot))
          .select(col("doc_id"),
            round(coalesce(col("h_raw"), lit(0.0)) / col("h_sum"), 10)
              .as("hub"),
            col("auth"))
          .localCheckpoint(false)
      }
      scores
        .select(col("doc_id"), round(col("hub"), 8).as("hub"),
          round(col("auth"), 8).as("auth"))
        .orderBy(col("doc_id"))
    },
    Some {
      def roundCtes(i: Int): String =
        s"""a${i + 1}_raw AS (
              SELECT e.dst, sum(s$i.hub) AS a_raw
              FROM s$i JOIN e ON s$i.doc_id = e.src
              GROUP BY e.dst),
            a${i + 1} AS (
              SELECT n.doc_id, s$i.hub,
                round(coalesce(r.a_raw, 0)
                  / (SELECT sum(a_raw) FROM a${i + 1}_raw), 10) AS auth
              FROM nodes n
              JOIN s$i ON n.doc_id = s$i.doc_id
              LEFT JOIN a${i + 1}_raw r ON n.doc_id = r.dst),
            h${i + 1}_raw AS (
              SELECT e.src, sum(a${i + 1}.auth) AS h_raw
              FROM a${i + 1} JOIN e ON a${i + 1}.doc_id = e.dst
              GROUP BY e.src),
            s${i + 1} AS (
              SELECT a.doc_id,
                round(coalesce(r.h_raw, 0)
                  / (SELECT sum(h_raw) FROM h${i + 1}_raw), 10) AS hub,
                a.auth
              FROM a${i + 1} a
              LEFT JOIN h${i + 1}_raw r ON a.doc_id = r.src)"""
      s"""WITH s AS (
            SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM documents),
          nodes AS (SELECT doc_id, n_nodes FROM documents, s),
          e AS (
            SELECT DISTINCT src, dst FROM (
              SELECT doc_id AS src,
                unnest([doc_id // 2,
                        (doc_id * 31 + 17) % n_nodes,
                        (doc_id * doc_id + 1) % n_nodes]) AS dst
              FROM nodes) u
            WHERE dst <> src),
          s0 AS (SELECT doc_id, 1.0 AS hub, 1.0 AS auth FROM nodes),
          ${(0 until 2).map(roundCtes).mkString(",\n")}
          SELECT doc_id, round(hub, 8) AS hub, round(auth, 8) AS auth
          FROM s2
          ORDER BY doc_id NULLS FIRST"""
    })

  // ---- q_stats_fdr ------------------------------------------------------

  /** One-vs-rest Welch z per event type, assembled from the exact cent
    * sufficient statistics. Division/multiply/sqrt are IEEE-exact, so
    * both engines produce the identical double before the 6dp round. */
  private val fdrZSql =
    """round((CAST(sc AS DOUBLE) / n - CAST(tsc - sc AS DOUBLE) / (nn - n))
       / sqrt(
           (CAST(sc2 AS DOUBLE) / n
             - (CAST(sc AS DOUBLE) / n) * (CAST(sc AS DOUBLE) / n)) / n
         + (CAST(tsc2 - sc2 AS DOUBLE) / (nn - n)
             - (CAST(tsc - sc AS DOUBLE) / (nn - n))
               * (CAST(tsc - sc AS DOUBLE) / (nn - n))) / (nn - n)), 6)"""

  /** Abramowitz-Stegun 7.1.26 normal-tail polynomial in t = 1/(1+0.2316419|z|),
    * e-notation double constants so neither engine parses DECIMAL. */
  private val fdrTSql = "1e0 / (1e0 + 0.2316419e0 * az)"
  private val fdrPSql =
    """CAST(floor(2e0 * 0.3989422804014327e0 * exp(-(az * az) / 2e0)
         * (((((1.330274429e0 * tt - 1.821255978e0) * tt
             + 1.781477937e0) * tt - 0.356563782e0) * tt
             + 0.319381530e0) * tt)
         * 1000000e0 + 0.5e0) AS BIGINT)"""

  /** Benjamini-Hochberg FDR control (q_stats_fdr): m one-vs-rest
    * "does this event type's mean value differ?" hypotheses tested at
    * once — the multiple-testing correction every metrics dashboard
    * needs before it flags segments. Welch z from exact integer cent
    * sufficient statistics ([[fdrZSql]]); two-sided p via the shared
    * A&S normal-tail polynomial, floor-quantized to micro-units; the
    * BH step-up decision is then EXACT integer arithmetic on both
    * engines: reject ranks 1..i* where i* = max{i : p_micro·m ≤
    * i·50000} (α = 0.05). The rank window runs over the event-type
    * grid (k rows), never the corpus — the q_stats_kruskal bounded-
    * window discipline. */
  /** BH machinery over settled (event_type, n, sc, sc2) sufficient
    * statistics — shared by the batch query and its streaming twin so
    * the decision logic has ONE definition. */
  private[graft] def fdrFromStats(g: DataFrame): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      // Every "whole-grid" scalar (the one-vs-rest totals, the
      // hypothesis count m, the BH cutoff i*) is an unbounded window
      // over the K-TYPE GRID — k rows, bounded by the type domain —
      // not a separate aggregate cross-joined back: each of those
      // aggregates RE-DERIVED the grid, and since the grid's lineage
      // is a corpus-wide groupBy, every re-derivation re-scanned the
      // fact (ScanCensus had this id at events=8; it is 1 by
      // construction now, with identical values — the r15
      // window-derivation discipline applied to sub-aggregates).
      val wAll = Window.partitionBy()
      val p = g
        .withColumn("nn", sum(col("n")).over(wAll))
        .withColumn("tsc", sum(col("sc")).over(wAll))
        .withColumn("tsc2", sum(col("sc2")).over(wAll))
        .withColumn("zr", expr(fdrZSql))
        .withColumn("az", expr("abs(zr)"))
        .withColumn("tt", expr(fdrTSql))
        .withColumn("p_micro", expr(fdrPSql))
        .select(col("event_type"), col("n"), col("zr"), col("p_micro"))
      // rank window over the k-type grid only (grid-bounded, never rows)
      p.withColumn("rnk", row_number().over(
          Window.orderBy(col("p_micro"), col("event_type"))).cast("long"))
        .withColumn("m", count(lit(1)).over(wAll))
        .withColumn("imax", coalesce(
          max(when(expr("p_micro * m <= rnk * 50000"), col("rnk")))
            .over(wAll), lit(0L)))
        .select(col("event_type"), col("n"), col("zr"), col("p_micro"),
          col("rnk"), (col("rnk") <= col("imax")).as("rejected"))
        .orderBy(col("rnk"))
  }

  /** Exact cent sufficient statistics per event type — the input both
    * the batch FDR and its streaming twin feed to [[fdrFromStats]]. */
  private[graft] val fdrStatsAggs = Seq(
    count(lit(1)).as("n"),
    sum(col("c").cast("decimal(38,0)")).as("sc"),
    sum(col("c").cast("decimal(38,0)") * col("c")).as("sc2"))

  val qStatsFdr = Q(
    "q_stats_fdr",
    (s, d) => fdrFromStats(
      ev(s, d)
        .select(col("event_type"),
          floor(col("value") * 100 + 0.5).cast("long").as("c"))
        .groupBy(col("event_type"))
        .agg(fdrStatsAggs.head, fdrStatsAggs.tail: _*)),
    Some(s"""WITH base AS (
              SELECT event_type,
                CAST(floor(value * 100 + 0.5e0) AS BIGINT) AS c
              FROM events),
            g AS (
              SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                sum(CAST(c AS HUGEINT)) AS sc,
                sum(CAST(c AS HUGEINT) * c) AS sc2
              FROM base GROUP BY event_type),
            tot AS (
              SELECT CAST(sum(n) AS BIGINT) AS nn,
                sum(sc) AS tsc, sum(sc2) AS tsc2
              FROM g),
            z AS (SELECT event_type, n, $fdrZSql AS zr
                  FROM g CROSS JOIN tot),
            a AS (SELECT *, abs(zr) AS az FROM z),
            t AS (SELECT *, $fdrTSql AS tt FROM a),
            p AS (SELECT event_type, n, zr, $fdrPSql AS p_micro FROM t),
            ranked AS (
              SELECT *,
                CAST(row_number() OVER (ORDER BY p_micro, event_type)
                  AS BIGINT) AS rnk,
                CAST(count(*) OVER () AS BIGINT) AS m
              FROM p),
            cut AS (
              SELECT coalesce(max(rnk), 0) AS imax FROM ranked
              WHERE p_micro * m <= rnk * 50000)
            SELECT event_type, n, zr, p_micro, rnk,
              rnk <= imax AS rejected
            FROM ranked CROSS JOIN cut
            ORDER BY rnk NULLS FIRST"""))

  // ---- q_stats_cmh ------------------------------------------------------

  /** Cochran-Mantel-Haenszel test (q_stats_cmh): is the
    * morning-hour ↔ purchase association real once you control for the
    * WEEK? — the stratified 2×2 test that separates a true effect from
    * Simpson confounding across strata. Per ISO-week stratum the 2×2
    * cells (a = morning purchase … d = other non-purchase) are exact
    * integer counts; E[a] = r1·c1/n and the hypergeometric variance
    * V = r1·r2·c1·c2 / (n²(n−1)) ride their four-count products in
    * DECIMAL(38,0)/HUGEINT (the n⁴ product wraps BIGINT near n ≈ 55k —
    * the q_agg_skew_kurt overflow rule), quantize to micro-units per
    * stratum, and the continuity-corrected χ² = (|Σa−ΣE|−½)²/ΣV
    * divides once at the end. One corpus aggregate; the stratum rollup
    * is calendar-bounded. */
  val qStatsCmh = Q(
    "q_stats_cmh",
    (s, d) => {
      val cells = ev(s, d)
        .select(weekofyear(col("ts")).cast("long").as("wk"),
          (hour(col("ts")) < 12).cast("long").as("morning"),
          (col("event_type") === "purchase").cast("long").as("pur"))
        .groupBy(col("wk"))
        .agg(
          sum(col("morning") * col("pur")).as("a"),
          sum(col("morning") * (lit(1L) - col("pur"))).as("b"),
          sum((lit(1L) - col("morning")) * col("pur")).as("c"),
          sum((lit(1L) - col("morning")) * (lit(1L) - col("pur")))
            .as("dd"))
        .withColumn("n", expr("a + b + c + dd"))
        .filter(col("n") > 1)
        .withColumn("e_micro", expr(
          """CAST(floor(CAST(CAST(a + b AS DECIMAL(38,0)) * (a + c)
               AS DOUBLE) / n * 1e6 + 0.5D) AS BIGINT)"""))
        .withColumn("v_micro", expr(
          """CAST(floor(CAST(CAST(a + b AS DECIMAL(38,0)) * (c + dd)
               * (a + c) * (b + dd) AS DOUBLE)
               / (CAST(n AS DOUBLE) * n * (n - 1)) * 1e6 + 0.5D)
             AS BIGINT)"""))
      cells.agg(
          count(lit(1)).as("k_strata"),
          sum(col("a")).as("sum_a"),
          sum(col("e_micro")).as("sum_e_micro"),
          sum(col("v_micro")).as("sum_v_micro"))
        .selectExpr("k_strata", "sum_a",
          "round(sum_e_micro / 1e6, 6) AS sum_e",
          "round(sum_v_micro / 1e6, 6) AS sum_v",
          """round(CAST(abs(1000000 * sum_a - sum_e_micro) / 1e6 - 0.5D
             AS DOUBLE) * (abs(1000000 * sum_a - sum_e_micro) / 1e6
             - 0.5D) / (sum_v_micro / 1e6), 6) AS chi2""")
    },
    Some("""WITH base AS (
              SELECT CAST(weekofyear(ts) AS BIGINT) AS wk,
                CAST(hour(ts) < 12 AS BIGINT) AS morning,
                CAST(event_type = 'purchase' AS BIGINT) AS pur
              FROM events),
            cells AS (
              SELECT wk,
                CAST(sum(morning * pur) AS BIGINT) AS a,
                CAST(sum(morning * (1 - pur)) AS BIGINT) AS b,
                CAST(sum((1 - morning) * pur) AS BIGINT) AS c,
                CAST(sum((1 - morning) * (1 - pur)) AS BIGINT) AS dd
              FROM base GROUP BY wk),
            scored AS (
              SELECT wk, a, b, c, dd, a + b + c + dd AS n,
                CAST(floor(CAST(CAST(a + b AS HUGEINT) * (a + c)
                  AS DOUBLE) / (a + b + c + dd) * 1e6 + 0.5e0)
                  AS BIGINT) AS e_micro,
                CAST(floor(CAST(CAST(a + b AS HUGEINT) * (c + dd)
                  * (a + c) * (b + dd) AS DOUBLE)
                  / (CAST(a + b + c + dd AS DOUBLE) * (a + b + c + dd)
                    * (a + b + c + dd - 1)) * 1e6 + 0.5e0)
                  AS BIGINT) AS v_micro
              FROM cells WHERE a + b + c + dd > 1)
            SELECT CAST(count(*) AS BIGINT) AS k_strata,
              CAST(sum(a) AS BIGINT) AS sum_a,
              round(CAST(sum(e_micro) AS BIGINT) / 1e6, 6) AS sum_e,
              round(CAST(sum(v_micro) AS BIGINT) / 1e6, 6) AS sum_v,
              round((abs(1000000 * CAST(sum(a) AS BIGINT)
                  - CAST(sum(e_micro) AS BIGINT)) / 1e6 - 0.5e0)
                * (abs(1000000 * CAST(sum(a) AS BIGINT)
                  - CAST(sum(e_micro) AS BIGINT)) / 1e6 - 0.5e0)
                / (CAST(sum(v_micro) AS BIGINT) / 1e6), 6) AS chi2
            FROM scored"""))

  // ---- q_stats_runs -----------------------------------------------------

  /** Wald-Wolfowitz runs test (q_stats_runs): is the daily-revenue
    * series above/below its median in RANDOM order, or does it
    * streak? — the nonparametric trend/clustering alarm on the same
    * day grid the changepoint scan reads. Signs come from exact
    * integer cent totals vs the interpolated median; the run count is
    * one lag comparison over the calendar-bounded day window; μ and σ²
    * assemble from n₁·n₂ products ridden in DECIMAL(38,0)/HUGEINT and
    * divide once into the z. */
  val qStatsRuns = Q(
    "q_stats_runs",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val days = ev(s, d)
        .select(to_date(col("ts")).as("day"),
          floor(col("value") * 100 + 0.5).cast("long").as("c"))
        .groupBy(col("day")).agg(sum(col("c")).as("rev"))
      val med = days.agg(expr("percentile(rev, 0.5D)").as("med"))
      val signed = days.crossJoin(broadcast(med))
        .select(col("day"),
          (col("rev") > col("med")).cast("long").as("sgn"))
      // lag over the day grid: calendar-bounded, never rows
      val w = Window.orderBy(col("day"))
      val runs = signed
        .withColumn("chg",
          when(lag(col("sgn"), 1).over(w).isNull, 1L)
            .otherwise((col("sgn") =!= lag(col("sgn"), 1).over(w))
              .cast("long")))
        .agg(sum(col("chg")).as("r"),
          sum(col("sgn")).as("n1"),
          sum(lit(1L) - col("sgn")).as("n2"))
      runs.selectExpr("n1", "n2", "r AS runs",
        """round((r - (CAST(CAST(2 AS DECIMAL(38,0)) * n1 * n2 AS DOUBLE)
             / (n1 + n2) + 1.0D))
           / sqrt(CAST(CAST(2 AS DECIMAL(38,0)) * n1 * n2
               * (CAST(2 AS DECIMAL(38,0)) * n1 * n2 - n1 - n2)
             AS DOUBLE)
             / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2) * (n1 + n2 - 1))),
           6) AS z""")
    },
    Some("""WITH days AS (
              SELECT CAST(ts AS DATE) AS day,
                CAST(sum(CAST(floor(value * 100 + 0.5e0) AS BIGINT))
                  AS BIGINT) AS rev
              FROM events GROUP BY 1),
            med AS (SELECT quantile_cont(rev, 0.5e0) AS med FROM days),
            signed AS (
              SELECT day, CAST(rev > med AS BIGINT) AS sgn
              FROM days CROSS JOIN med),
            chg AS (
              SELECT day, sgn,
                CASE WHEN lag(sgn) OVER (ORDER BY day) IS NULL THEN 1
                  ELSE CAST(sgn <> lag(sgn) OVER (ORDER BY day)
                    AS BIGINT) END AS chg
              FROM signed),
            agg AS (
              SELECT CAST(sum(chg) AS BIGINT) AS r,
                CAST(sum(sgn) AS BIGINT) AS n1,
                CAST(sum(1 - sgn) AS BIGINT) AS n2
              FROM chg)
            SELECT n1, n2, r AS runs,
              round((r - (CAST(CAST(2 AS HUGEINT) * n1 * n2 AS DOUBLE)
                  / (n1 + n2) + 1.0e0))
                / sqrt(CAST(CAST(2 AS HUGEINT) * n1 * n2
                    * (CAST(2 AS HUGEINT) * n1 * n2 - n1 - n2)
                  AS DOUBLE)
                  / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2)
                    * (n1 + n2 - 1))), 6) AS z
            FROM agg"""))

  // ---- q_stats_levene ---------------------------------------------------

  /** Brown-Forsythe variance-homogeneity test (q_stats_levene): the
    * check that must pass before q_stats_anova's equal-variance F is
    * trusted — an ANOVA on the absolute deviations from each group's
    * MEDIAN (the robust Levene variant). Per-group medians come from
    * one exact-percentile aggregate over the cent grid and broadcast
    * back; each deviation quantizes to integer micro-cents, so the
    * per-group deviation sums are exact and the sgr term reuses the
    * q_stats_anova micro-quantized discipline. Two scans (one for
    * medians, one for deviations), grid-bounded rollups. */
  val qStatsLevene = Q(
    "q_stats_levene",
    (s, d) => {
      val base = ev(s, d)
        .select(col("event_type"),
          floor(col("value") * 100 + 0.5).cast("long").as("c"))
      val med = base.groupBy(col("event_type").as("et"))
        .agg(expr("percentile(c, 0.5D)").as("med"))
      // doubled deviations: |c − med| has half-cent granularity (the
      // median interpolates), so 2·|c − med| is an EXACT integer; W is
      // a variance ratio, invariant to the scaling
      val z = base.join(broadcast(med), col("event_type") === col("et"))
        .select(col("event_type"),
          expr("CAST(floor(abs(c - med) * 2 + 0.5D) AS BIGINT)")
            .as("zm"))
      val g = z.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("zm").cast("decimal(38,0)")).as("sz"),
          sum(col("zm").cast("decimal(38,0)") * col("zm")).as("sz2"))
      val st = g.agg(
        count(lit(1)).as("k"),
        sum(col("n")).as("nn"),
        sum(col("sz")).as("tsz"),
        sum(col("sz2")).as("tsz2"),
        // sz²/n as EXACT integer division in DECIMAL(38,0): no float
        // crosses the cross-group sum, and (unlike a floor() of the
        // double product) nothing saturates — Spark floor() returns
        // BIGINT and silently pins at Long.MaxValue near 9.2e18
        sum(expr("(sz * sz) div n").cast("decimal(38,0)"))
          .as("sgr_q"))
      st.withColumn("sgr", col("sgr_q").cast("double"))
        .select(
          col("k"), col("nn").as("n"),
          round(
            ((col("sgr") - col("tsz").cast("double") *
              col("tsz").cast("double") / col("nn")) / (col("k") - 1)) /
              ((col("tsz2").cast("double") - col("sgr")) /
                (col("nn") - col("k"))), 6).as("w_stat"))
    },
    Some("""WITH base AS (
              SELECT event_type,
                CAST(floor(value * 100 + 0.5e0) AS BIGINT) AS c
              FROM events),
            med AS (
              SELECT event_type AS et, quantile_cont(c, 0.5e0) AS med
              FROM base GROUP BY event_type),
            z AS (
              SELECT event_type,
                CAST(floor(abs(c - med) * 2 + 0.5e0) AS BIGINT) AS zm
              FROM base JOIN med ON event_type = et),
            g AS (
              SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                sum(CAST(zm AS HUGEINT)) AS sz,
                sum(CAST(zm AS HUGEINT) * zm) AS sz2
              FROM z GROUP BY event_type),
            st AS (
              SELECT CAST(count(*) AS BIGINT) AS k,
                CAST(sum(n) AS BIGINT) AS nn,
                sum(sz) AS tsz, sum(sz2) AS tsz2,
                CAST(sum((sz * sz) // n) AS DOUBLE) AS sgr
              FROM g)
            SELECT k, nn AS n,
              round(
                ((sgr - CAST(tsz AS DOUBLE) * CAST(tsz AS DOUBLE) / nn)
                   / (k - 1))
                / ((CAST(tsz2 AS DOUBLE) - sgr) / (nn - k)), 6)
                AS w_stat
            FROM st"""))

  // ---- q_ml_gains --------------------------------------------------------

  /** Cumulative gains / lift table (q_ml_gains): rank documents by the
    * q_ml_auc score (n_chars predicting lang = 'en'), cut into ten
    * score-threshold buckets, and report how fast the positives are
    * captured walking down the ranking — the model-triage curve a
    * labeling budget is planned against. Bucket fences are the exact
    * interpolated deciles (both engines share (n−1)·p interpolation),
    * so NO per-row ranking window ever materializes — rows bucket by
    * nine broadcast scalar compares, one hash aggregate, and a 10-row
    * running sum. Lift and capture are single double divisions over
    * exact BIGINT cumulative counts. */
  val qMlGains = Q(
    "q_ml_gains",
    (s, d) => {
      val base = Tables.t(s, d, "documents")
        .select(col("n_chars").as("c"),
          when(col("lang") === "en", 1L).otherwise(0L).as("pos"))
      val thr = base.agg(
        expr("percentile(c, 0.1)").as("t1"),
        expr("percentile(c, 0.2)").as("t2"),
        expr("percentile(c, 0.3)").as("t3"),
        expr("percentile(c, 0.4)").as("t4"),
        expr("percentile(c, 0.5)").as("t5"),
        expr("percentile(c, 0.6)").as("t6"),
        expr("percentile(c, 0.7)").as("t7"),
        expr("percentile(c, 0.8)").as("t8"),
        expr("percentile(c, 0.9)").as("t9"))
      val buckets = base.crossJoin(broadcast(thr))
        .withColumn("decile", expr(
          """9L - (IF(c > t1, 1L, 0L) + IF(c > t2, 1L, 0L)
               + IF(c > t3, 1L, 0L) + IF(c > t4, 1L, 0L)
               + IF(c > t5, 1L, 0L) + IF(c > t6, 1L, 0L)
               + IF(c > t7, 1L, 0L) + IF(c > t8, 1L, 0L)
               + IF(c > t9, 1L, 0L))"""))
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n"), sum(col("pos")).as("n_pos"))
      val tot = buckets.agg(sum(col("n")).as("nn"),
        sum(col("n_pos")).as("pp"))
      val w = Window.orderBy(col("decile"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      buckets.crossJoin(broadcast(tot))
        .withColumn("cum_n", sum(col("n")).over(w))
        .withColumn("cum_pos", sum(col("n_pos")).over(w))
        .select(col("decile"), col("n"), col("n_pos"),
          col("cum_n"), col("cum_pos"),
          round(expr(
            "CAST(cum_pos AS DOUBLE) * nn / (CAST(cum_n AS DOUBLE) * pp)"),
            6).as("lift"),
          round(expr("CAST(cum_pos AS DOUBLE) / pp"), 6).as("capture"))
        .orderBy(col("decile"))
    },
    Some("""WITH base AS (
              SELECT n_chars AS c,
                CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
              FROM documents),
            thr AS (
              SELECT quantile_cont(c, 0.1) AS t1,
                quantile_cont(c, 0.2) AS t2, quantile_cont(c, 0.3) AS t3,
                quantile_cont(c, 0.4) AS t4, quantile_cont(c, 0.5) AS t5,
                quantile_cont(c, 0.6) AS t6, quantile_cont(c, 0.7) AS t7,
                quantile_cont(c, 0.8) AS t8, quantile_cont(c, 0.9) AS t9
              FROM base),
            buckets AS (
              SELECT 9 - ((CASE WHEN c > t1 THEN 1 ELSE 0 END)
                  + (CASE WHEN c > t2 THEN 1 ELSE 0 END)
                  + (CASE WHEN c > t3 THEN 1 ELSE 0 END)
                  + (CASE WHEN c > t4 THEN 1 ELSE 0 END)
                  + (CASE WHEN c > t5 THEN 1 ELSE 0 END)
                  + (CASE WHEN c > t6 THEN 1 ELSE 0 END)
                  + (CASE WHEN c > t7 THEN 1 ELSE 0 END)
                  + (CASE WHEN c > t8 THEN 1 ELSE 0 END)
                  + (CASE WHEN c > t9 THEN 1 ELSE 0 END)) AS decile,
                CAST(count(*) AS BIGINT) AS n,
                CAST(sum(pos) AS BIGINT) AS n_pos
              FROM base, thr
              GROUP BY 1),
            tot AS (
              SELECT CAST(sum(n) AS BIGINT) AS nn,
                CAST(sum(n_pos) AS BIGINT) AS pp FROM buckets),
            cum AS (
              SELECT decile, n, n_pos,
                CAST(sum(n) OVER w AS BIGINT) AS cum_n,
                CAST(sum(n_pos) OVER w AS BIGINT) AS cum_pos
              FROM buckets
              WINDOW w AS (ORDER BY decile
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
            SELECT CAST(decile AS BIGINT) AS decile, n, n_pos,
              cum_n, cum_pos,
              round(CAST(cum_pos AS DOUBLE) * nn
                / (CAST(cum_n AS DOUBLE) * pp), 6) AS lift,
              round(CAST(cum_pos AS DOUBLE) / pp, 6) AS capture
            FROM cum, tot
            ORDER BY decile NULLS FIRST"""))

  // ---- q_ml_brier --------------------------------------------------------

  /** Brier score + reliability table (q_ml_brier): calibration of the
    * rank model p̂ = cume-dist(n_chars) against lang = 'en', binned by
    * predicted probability — the companion diagnostic to q_ml_auc
    * (AUC measures ordering, Brier measures calibration). p̂ is an
    * exact integer ratio (1e6·cum div N over the distinct-score
    * cumulative table, ONE bounded window over distinct values, never
    * rows), so every per-bin statistic — mean p̂, empirical positive
    * rate, Brier contribution n1·(1e6−p)² + n0·p² — is built from
    * BIGINT/DECIMAL(38,0) sums with a single final division. */
  /** Shared finisher: the reliability/Brier table from a settled
    * (c, na, n1c) value-count table — used by the batch q_ml_brier and
    * its streaming twin (which maintains the counts commutatively on
    * ingest), so both settle to the identical oracle. */
  private[graft] def brierFromCounts(vc: DataFrame): DataFrame = {
      val tot = vc.agg(sum(col("na")).as("nn"))
      val w = Window.orderBy(col("c"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      vc.crossJoin(broadcast(tot))
        .withColumn("cum", sum(col("na")).over(w))
        .withColumn("p_micro", expr("(1000000L * cum) div nn"))
        .withColumn("bin", least(lit(9L), expr("p_micro div 100000")))
        .groupBy(col("bin"))
        .agg(sum(col("na")).as("n"),
          sum(col("n1c")).as("n1"),
          sum(expr("CAST(na * p_micro AS DECIMAL(38,0))")).as("sp"),
          sum(expr(
            """CAST(n1c AS DECIMAL(38,0))
                 * (1000000 - p_micro) * (1000000 - p_micro)
               + CAST(na - n1c AS DECIMAL(38,0)) * p_micro * p_micro"""))
            .as("sq"))
        .select(col("bin"), col("n"), col("n1").cast("long").as("n_pos"),
          round(expr("CAST(sp AS DOUBLE) / n / 1e6"), 6).as("mean_p"),
          round(expr("CAST(n1 AS DOUBLE) / n"), 6).as("frac_pos"),
          round(expr("CAST(sq AS DOUBLE) / n / 1e12"), 6).as("brier"))
        .orderBy(col("bin"))
  }

  /** The (c, na, n1c) value-count table both Brier variants settle to. */
  private[graft] def brierCountAggs(df: DataFrame): DataFrame =
    df.select(col("n_chars").as("c"), (col("lang") === "en").as("pos"))
      .groupBy(col("c"))
      .agg(count(lit(1)).as("na"),
        sum(when(col("pos"), 1L).otherwise(0L)).as("n1c"))

  private[graft] val brierOracleSql: String = """WITH base AS (
              SELECT n_chars AS c, lang = 'en' AS pos FROM documents),
            vc AS (
              SELECT c, CAST(count(*) AS BIGINT) AS na,
                CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT)
                  AS n1c
              FROM base GROUP BY c),
            tot AS (SELECT CAST(sum(na) AS BIGINT) AS nn FROM vc),
            pm AS (
              SELECT na, n1c,
                (1000000 * CAST(sum(na) OVER (ORDER BY c
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT)) // nn AS p_micro
              FROM vc, tot),
            binned AS (
              SELECT least(9, p_micro // 100000) AS bin, na, n1c, p_micro
              FROM pm)
            SELECT CAST(bin AS BIGINT) AS bin,
              CAST(sum(na) AS BIGINT) AS n,
              CAST(sum(n1c) AS BIGINT) AS n_pos,
              round(CAST(sum(CAST(na AS HUGEINT) * p_micro) AS DOUBLE)
                / sum(na) / 1e6, 6) AS mean_p,
              round(CAST(sum(n1c) AS DOUBLE) / sum(na), 6) AS frac_pos,
              round(CAST(sum(CAST(n1c AS HUGEINT)
                    * (1000000 - p_micro) * (1000000 - p_micro)
                  + CAST(na - n1c AS HUGEINT) * p_micro * p_micro)
                  AS DOUBLE) / sum(na) / 1e12, 6) AS brier
            FROM binned
            GROUP BY bin
            ORDER BY bin NULLS FIRST"""

  val qMlBrier = Q(
    "q_ml_brier",
    (s, d) => brierFromCounts(brierCountAggs(Tables.t(s, d, "documents"))),
    Some(brierOracleSql))

  // ---- q_stats_friedman --------------------------------------------------

  /** Friedman test (q_stats_friedman): do the event types rank the
    * same across weekday blocks, or does some type systematically
    * dominate? Blocks are the 7 weekdays, treatments the event types,
    * cell metric the exact cent total; within each COMPLETE block
    * (all k treatments present — incomplete blocks are excluded, the
    * textbook requirement) treatments get DOUBLED midranks
    * (2·rank + ties − 1, the Mann-Whitney integer-rank discipline),
    * and the statistic collapses to Fr = 3·Σ_j (R2_j − n(k+1))² /
    * (n·k·(k+1)) — the ×2 rank scaling clears the midrank halves, so
    * everything is integer until ONE final division. The rank windows
    * are (7-block × k)-bounded, never corpus-sized. */
  val qStatsFriedman = Q(
    "q_stats_friedman",
    (s, d) => {
      val cells = ev(s, d)
        .select(expr("dayofweek(CAST(ts AS DATE))").as("blk"),
          col("event_type"),
          floor(col("value") * 100 + 0.5).cast("long").as("c"))
        .groupBy(col("blk"), col("event_type"))
        .agg(sum(col("c")).as("v"))
      // k and the per-block sizes as windows over the (7 x k)-bounded
      // cell grid (r15 window-derivation discipline): the kdf/bsz
      // aggregates re-derived the grid, each re-scanning the fact.
      // collect_set stands in for countDistinct (not a window fn);
      // cast to long so the emitted k keeps its BIGINT type.
      val ranked = cells
        .withColumn("k", size(collect_set(col("event_type")).over(
          Window.partitionBy())).cast("long"))
        .withColumn("bn", count(lit(1)).over(
          Window.partitionBy(col("blk"))))
        .filter(col("bn") === col("k"))
        .withColumn("rnk", rank().over(
          Window.partitionBy(col("blk")).orderBy(col("v"))))
        .withColumn("ceq", count(lit(1)).over(
          Window.partitionBy(col("blk"), col("v"))))
        .withColumn("rank2",
          lit(2L) * col("rnk") + col("ceq") - lit(1L))
      val rj = ranked.groupBy(col("event_type"))
        .agg(count(lit(1)).as("nb"), sum(col("rank2")).as("r2"),
          first(col("k")).as("k"))
      rj.agg(first(col("k")).as("k"), first(col("nb")).as("n"),
          sum(expr("""CAST(r2 - nb * (k + 1) AS DECIMAL(38,0))
                      * (r2 - nb * (k + 1))""")).as("ssq"))
        .select(col("n").as("n_blocks"), col("k"),
          (col("k") - 1).cast("long").as("df"),
          round(expr(
            "3.0D * CAST(ssq AS DOUBLE) / (n * k * (k + 1))"), 6)
            .as("fr_stat"))
    },
    Some("""WITH cells AS (
              SELECT dayofweek(CAST(ts AS DATE)) AS blk, event_type,
                CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS v
              FROM events GROUP BY blk, event_type),
            kd AS (
              SELECT CAST(count(DISTINCT event_type) AS BIGINT) AS k
              FROM cells),
            bsz AS (
              SELECT blk, CAST(count(*) AS BIGINT) AS bn
              FROM cells GROUP BY blk),
            full_ AS (
              SELECT cells.*, kd.k FROM cells
              JOIN bsz ON cells.blk = bsz.blk
              CROSS JOIN kd
              WHERE bsz.bn = kd.k),
            ranked AS (
              SELECT event_type, k,
                2 * CAST(rank() OVER (PARTITION BY blk ORDER BY v)
                    AS BIGINT)
                  + CAST(count(*) OVER (PARTITION BY blk, v) AS BIGINT)
                  - 1 AS rank2
              FROM full_),
            rj AS (
              SELECT event_type, CAST(count(*) AS BIGINT) AS nb,
                CAST(sum(rank2) AS BIGINT) AS r2,
                any_value(k) AS k
              FROM ranked GROUP BY event_type)
            SELECT any_value(nb) AS n_blocks, any_value(k) AS k,
              CAST(any_value(k) - 1 AS BIGINT) AS df,
              round(3.0e0 * CAST(sum(
                  CAST(r2 - nb * (k + 1) AS HUGEINT)
                  * (r2 - nb * (k + 1))) AS DOUBLE)
                / (any_value(nb) * any_value(k) * (any_value(k) + 1)), 6)
                AS fr_stat
            FROM rj"""))

  // ---- q_stats_cochran_q -------------------------------------------------

  /** Cochran's Q test (q_stats_cochran_q): across users, is the
    * PROBABILITY of having triggered each event type the same — the
    * k-treatment binary generalization of McNemar. The incidence
    * matrix is one distinct over (user, type); with column totals C_j,
    * row totals R_i, N = ΣR, the statistic cross-multiplies to
    * Q = (k−1)·Σ_j (k·C_j − N)² / (k·Σ_i (k·R_i − R_i²)) — column
    * squares ride DECIMAL(38,0)/HUGEINT (k·C − N is corpus-sized),
    * and all-zero / all-one rows cancel identically on both sides of
    * the fraction, so no row filtering is needed. The outcome is
    * "triggered type t above value 90" — thresholded so the incidence
    * matrix actually varies (every user fires every type at SOME
    * value); a fully-saturated matrix zeroes the denominator, which
    * both engines guard to NULL. Two user/type-grid aggregates; scale
    * cost is the distinct. */
  val qStatsCochranQ = Q(
    "q_stats_cochran_q",
    (s, d) => {
      val ut = ev(s, d).filter(col("value") > 90.0)
        .select(col("user_id"), col("event_type")).distinct()
      val cj = ut.groupBy(col("event_type"))
        .agg(count(lit(1)).as("cj"))
      val ri = ut.groupBy(col("user_id")).agg(count(lit(1)).as("r"))
      // k/nn as windows over the type grid and the denominator
      // separated as k·Σr − Σr² (r15 derivation lens): the old kdf
      // aggregate and its two cross-join consumers re-derived the
      // cj/ri chains — four fact scans for two 1-row frames. The two
      // remaining scans are the two groupings of ut (by type, by
      // user) — intrinsic different keys.
      val wg = Window.partitionBy()
      val a = cj
        .withColumn("k", count(lit(1)).over(wg))
        .withColumn("nn", sum(col("cj")).over(wg))
        .agg(first(col("k")).as("k"), first(col("nn")).as("nn"),
          sum(expr(
            "CAST(k * cj - nn AS DECIMAL(38,0)) * (k * cj - nn)"))
            .as("nums"))
      val b = ri.agg(count(lit(1)).as("n_users"),
        sum(col("r")).as("s1r"), sum(expr("r * r")).as("s2r"))
      a.crossJoin(broadcast(b))
        .withColumn("dens", expr("k * s1r - s2r"))
        .select(col("n_users"), col("k"),
          (col("k") - 1).cast("long").as("df"),
          round(expr(
            """CASE WHEN dens = 0 THEN NULL
               ELSE CAST(k - 1 AS DOUBLE) * CAST(nums AS DOUBLE)
                 / (k * CAST(dens AS DOUBLE)) END"""), 6).as("q_stat"))
    },
    Some("""WITH ut AS (
              SELECT DISTINCT user_id, event_type FROM events
              WHERE value > 90),
            cj AS (
              SELECT event_type, CAST(count(*) AS BIGINT) AS cj
              FROM ut GROUP BY event_type),
            ri AS (
              SELECT user_id, CAST(count(*) AS BIGINT) AS r
              FROM ut GROUP BY user_id),
            kd AS (
              SELECT CAST(count(*) AS BIGINT) AS k,
                CAST(sum(cj) AS BIGINT) AS nn FROM cj),
            dens AS (
              SELECT any_value(kd.k) AS k, any_value(kd.nn) AS nn,
                CAST(count(*) AS BIGINT) AS n_users,
                CAST(sum(kd.k * r - r * r) AS BIGINT) AS dens
              FROM ri, kd),
            nums AS (
              SELECT sum(CAST(kd.k * cj - kd.nn AS HUGEINT)
                * (kd.k * cj - kd.nn)) AS nums
              FROM cj, kd)
            SELECT n_users, k, CAST(k - 1 AS BIGINT) AS df,
              round(CASE WHEN dens = 0 THEN NULL
                ELSE CAST(k - 1 AS DOUBLE) * CAST(nums AS DOUBLE)
                  / (k * CAST(dens AS DOUBLE)) END, 6) AS q_stat
            FROM dens, nums"""))

  // ---- q_stats_jarque_bera ----------------------------------------------

  /** Jarque-Bera normality test (q_stats_jarque_bera): per event type,
    * JB = n/6 · (S² + K²/4) from the same exact four power sums as
    * q_agg_skew_kurt (DECIMAL(38,0)/HUGEINT from the first factor —
    * the c⁴ overflow rule), with the χ²(2) tail p = e^(−JB/2) in
    * closed form. One map-side-combined aggregate per type; every
    * double derives from the integer sums by a fixed expression. */
  val qStatsJarqueBera = Q(
    "q_stats_jarque_bera",
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
      val sk = m3 / pow(m2, 1.5)
      val ku = m4 / (m2 * m2) - lit(3.0)
      val jb = n / lit(6.0) * (sk * sk + ku * ku / lit(4.0))
      base.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("c").cast("decimal(38,0)")).as("s1"),
          sum((col("c") * col("c")).cast("decimal(38,0)")).as("s2"),
          sum(col("c").cast("decimal(38,0)") * col("c") * col("c"))
            .as("s3"),
          sum(col("c").cast("decimal(38,0)") * col("c") * col("c") *
            col("c")).as("s4"))
        .select(col("event_type"), col("n"),
          round(jb, 6).as("jb_stat"),
          round(exp(-jb / lit(2.0)), 6).as("p_value"))
        .orderBy(col("event_type"))
    },
    Some("""WITH base AS (
              SELECT event_type,
                CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
              FROM events),
            sums AS (
              SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                sum(c) AS s1, sum(c * c) AS s2,
                sum(CAST(c AS HUGEINT) * c * c) AS s3,
                sum(CAST(c AS HUGEINT) * c * c * c) AS s4
              FROM base GROUP BY event_type),
            m AS (
              SELECT event_type, n, CAST(n AS DOUBLE) AS nd,
                CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
                CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS e2,
                CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS e3,
                CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) AS e4
              FROM sums),
            sm AS (
              SELECT event_type, n, nd,
                (e3 - 3.0e0 * mean * e2 + 2.0e0 * mean * mean * mean)
                  / pow(e2 - mean * mean, 1.5e0) AS sk,
                (e4 - 4.0e0 * mean * e3 + 6.0e0 * mean * mean * e2
                  - 3.0e0 * mean * mean * mean * mean)
                  / ((e2 - mean * mean) * (e2 - mean * mean))
                  - 3.0e0 AS ku
              FROM m)
            SELECT event_type, n,
              round(nd / 6.0e0 * (sk * sk + ku * ku / 4.0e0), 6)
                AS jb_stat,
              round(exp(-(nd / 6.0e0 * (sk * sk + ku * ku / 4.0e0))
                / 2.0e0), 6) AS p_value
            FROM sm
            ORDER BY event_type NULLS FIRST"""))

  // ---- q_ml_pr_curve ----------------------------------------------------

  /** Precision-recall curve (q_ml_pr_curve): TP/FP/FN and
    * precision/recall/F1 at the nine decile fences of the q_ml_auc
    * rank model — the operating-point table read next to the gains
    * chart when picking a filter threshold. Reuses the gains-table
    * shape: exact interpolated fences, value-count cumulative sums
    * (distinct-score-bounded), and integer counts everywhere; the
    * three ratios are single double divisions per fence row. */
  val qMlPrCurve = Q(
    "q_ml_pr_curve",
    (s, d) => {
      val base = Tables.t(s, d, "documents")
        .select(col("n_chars").as("c"),
          when(col("lang") === "en", 1L).otherwise(0L).as("pos"))
      val thr = base.agg(
        expr("percentile(c, 0.1)").as("t1"),
        expr("percentile(c, 0.2)").as("t2"),
        expr("percentile(c, 0.3)").as("t3"),
        expr("percentile(c, 0.4)").as("t4"),
        expr("percentile(c, 0.5)").as("t5"),
        expr("percentile(c, 0.6)").as("t6"),
        expr("percentile(c, 0.7)").as("t7"),
        expr("percentile(c, 0.8)").as("t8"),
        expr("percentile(c, 0.9)").as("t9"))
        .select(expr("""stack(9, 1L, t1, 2L, t2, 3L, t3, 4L, t4,
          5L, t5, 6L, t6, 7L, t7, 8L, t8, 9L, t9)""")
          .as(Seq("k", "t")))
      base.crossJoin(broadcast(thr))
        .groupBy(col("k"), col("t"))
        .agg(sum(when(col("c") > col("t"), col("pos")).otherwise(0L))
            .as("tp"),
          sum(when(col("c") > col("t"), lit(1L) - col("pos"))
            .otherwise(0L)).as("fp"),
          sum(when(col("c") <= col("t"), col("pos")).otherwise(0L))
            .as("fn"))
        .select(col("k").as("fence"), col("tp"), col("fp"), col("fn"),
          round(expr("CAST(tp AS DOUBLE) / (tp + fp)"), 6)
            .as("precision"),
          round(expr("CAST(tp AS DOUBLE) / (tp + fn)"), 6)
            .as("recall"),
          round(expr("2.0D * tp / (2.0D * tp + fp + fn)"), 6)
            .as("f1"))
        .orderBy(col("fence"))
    },
    Some("""WITH base AS (
              SELECT n_chars AS c,
                CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
              FROM documents),
            thr0 AS (
              SELECT quantile_cont(c, 0.1) AS t1,
                quantile_cont(c, 0.2) AS t2, quantile_cont(c, 0.3) AS t3,
                quantile_cont(c, 0.4) AS t4, quantile_cont(c, 0.5) AS t5,
                quantile_cont(c, 0.6) AS t6, quantile_cont(c, 0.7) AS t7,
                quantile_cont(c, 0.8) AS t8, quantile_cont(c, 0.9) AS t9
              FROM base),
            thr AS (
              SELECT k,
                CASE k WHEN 1 THEN t1 WHEN 2 THEN t2 WHEN 3 THEN t3
                       WHEN 4 THEN t4 WHEN 5 THEN t5 WHEN 6 THEN t6
                       WHEN 7 THEN t7 WHEN 8 THEN t8 ELSE t9 END AS t
              FROM thr0 CROSS JOIN
                (SELECT unnest([1, 2, 3, 4, 5, 6, 7, 8, 9]) AS k)),
            cnt AS (
              SELECT k, t,
                CAST(sum(CASE WHEN c > t THEN pos ELSE 0 END)
                  AS BIGINT) AS tp,
                CAST(sum(CASE WHEN c > t THEN 1 - pos ELSE 0 END)
                  AS BIGINT) AS fp,
                CAST(sum(CASE WHEN c <= t THEN pos ELSE 0 END)
                  AS BIGINT) AS fn
              FROM base, thr
              GROUP BY k, t)
            SELECT CAST(k AS BIGINT) AS fence, tp, fp, fn,
              round(CAST(tp AS DOUBLE) / (tp + fp), 6) AS precision,
              round(CAST(tp AS DOUBLE) / (tp + fn), 6) AS recall,
              round(2.0e0 * tp / (2.0e0 * tp + fp + fn), 6) AS f1
            FROM cnt
            ORDER BY fence NULLS FIRST"""))

  // ---- q_stats_welch ----------------------------------------------------

  /** Welch's heteroscedastic ANOVA (q_stats_welch): the q_stats_anova
    * question without the equal-variance assumption — the test to
    * reach for when q_stats_levene/Brown-Forsythe REJECTS. Per-group
    * (n, Σc, Σc²) are exact; the group weights w = n/s², the weighted
    * means w·m, and the Λ terms (1 − w/W)²/(n−1) are per-GROUP fixed
    * doubles quantized (1e9/1e9/1e6/1e12) BEFORE the cross-group
    * sums, honoring the file's "no raw double crosses an aggregate"
    * rule even over the 5-row group grid. F and df2 are closed double
    * expressions over the integer sums. */
  val qStatsWelch = Q(
    "q_stats_welch",
    (s, d) => {
      val g = ev(s, d)
        .select(col("event_type"),
          floor(col("value") * 100 + 0.5).cast("long").as("c"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("c").cast("decimal(38,0)")).as("s1"),
          sum((col("c") * col("c")).cast("decimal(38,0)")).as("s2"))
        .withColumn("m", expr("CAST(s1 AS DOUBLE) / n"))
        .withColumn("v", expr(
          "(CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1)"))
        .withColumn("wq", expr(
          "CAST(floor(n / v * 1e9 + 0.5D) AS BIGINT)"))
        .withColumn("wmq", expr(
          "CAST(floor(n / v * m * 1e9 + 0.5D) AS BIGINT)"))
        .withColumn("wm2q", expr(
          "CAST(floor(n / v * m * m * 1e6 + 0.5D) AS BIGINT)"))
      val t1 = g.agg(count(lit(1)).as("k"), sum(col("wq")).as("ww"),
        sum(col("wmq")).as("sm"), sum(col("wm2q")).as("sm2"))
      val lam = g.crossJoin(broadcast(t1.select(col("ww").as("wt"))))
        .withColumn("lq", expr(
          """CAST(floor((1.0D - CAST(wq AS DOUBLE) / wt)
               * (1.0D - CAST(wq AS DOUBLE) / wt) / (n - 1) * 1e12
               + 0.5D) AS BIGINT)"""))
        .agg(sum(col("lq")).as("sl"))
      t1.crossJoin(lam)
        .select(col("k"),
          round(expr(
            """((CAST(sm2 AS DOUBLE) / 1e6
                 - CAST(sm AS DOUBLE) * sm / 1e9 / ww) / (k - 1))
               / (1.0D + 2.0D * (k - 2) / (k * k - 1)
                  * (CAST(sl AS DOUBLE) / 1e12))"""), 6)
            .as("f_welch"),
          round(expr(
            """(CAST(k AS DOUBLE) * k - 1)
               / (3.0D * CAST(sl AS DOUBLE) / 1e12)"""), 6).as("df2"))
    },
    Some("""WITH base AS (
              SELECT event_type,
                CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
              FROM events),
            sums AS (
              SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(c) AS HUGEINT) AS s1,
                CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT) AS s2
              FROM base GROUP BY event_type),
            gq AS (
              SELECT n,
                CAST(floor(n / ((CAST(s2 AS DOUBLE)
                    - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1))
                  * 1e9 + 0.5) AS BIGINT) AS wq,
                CAST(floor(n / ((CAST(s2 AS DOUBLE)
                    - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1))
                  * (CAST(s1 AS DOUBLE) / n) * 1e9 + 0.5) AS BIGINT)
                  AS wmq,
                CAST(floor(n / ((CAST(s2 AS DOUBLE)
                    - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1))
                  * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
                  * 1e6 + 0.5) AS BIGINT) AS wm2q
              FROM sums),
            t1 AS (
              SELECT CAST(count(*) AS BIGINT) AS k,
                CAST(sum(wq) AS BIGINT) AS ww,
                CAST(sum(wmq) AS BIGINT) AS sm,
                CAST(sum(wm2q) AS BIGINT) AS sm2
              FROM gq),
            lam AS (
              SELECT CAST(sum(CAST(floor(
                  (1.0e0 - CAST(wq AS DOUBLE) / t1.ww)
                  * (1.0e0 - CAST(wq AS DOUBLE) / t1.ww) / (n - 1)
                  * 1e12 + 0.5) AS BIGINT)) AS BIGINT) AS sl
              FROM gq, t1)
            SELECT k,
              round(((CAST(sm2 AS DOUBLE) / 1e6
                  - CAST(sm AS DOUBLE) * sm / 1e9 / ww) / (k - 1))
                / (1.0e0 + 2.0e0 * (k - 2) / (k * k - 1)
                   * (CAST(sl AS DOUBLE) / 1e12)), 6) AS f_welch,
              round((CAST(k AS DOUBLE) * k - 1)
                / (3.0e0 * CAST(sl AS DOUBLE) / 1e12), 6) AS df2
            FROM t1, lam"""))

  // ---- q_stats_trend_ca -------------------------------------------------

  /** Cochran-Armitage trend test (q_stats_trend_ca): does the DAILY
    * proportion of high-value events (value > 90) drift over the
    * calendar? Scores are the day indexes, counts and positives exact
    * integers, and the statistic cross-multiplies to
    * χ² = (N·Σsr − R·Σsn)² / (R·(N−R)·(N·Σns² − (Σns)²)/N) — every
    * product is integer in DECIMAL(38,0)/HUGEINT and only the final
    * square + division run in double (both engines square the same
    * exact value). One calendar-bounded day grid after one scan. */
  val qStatsTrendCa = Q(
    "q_stats_trend_ca",
    (s, d) => {
      val days = ev(s, d)
        .select(to_date(col("ts")).as("day"),
          when(col("value") > 90.0, 1L).otherwise(0L).as("hi"))
        .groupBy(col("day"))
        .agg(count(lit(1)).as("n"), sum(col("hi")).as("r"))
        .withColumn("sidx", row_number()
          .over(Window.orderBy(col("day"))).cast("long"))
      days.agg(count(lit(1)).as("n_days"),
          sum(col("n")).as("nn"), sum(col("r")).as("rr"),
          sum(expr("CAST(sidx * n AS DECIMAL(38,0))")).as("sn"),
          sum(expr("CAST(sidx * r AS DECIMAL(38,0))")).as("sr"),
          sum(expr("CAST(sidx * sidx AS DECIMAL(38,0)) * n")).as("sn2"))
        .select(col("n_days"), col("nn").cast("long").as("n_total"),
          col("rr").cast("long").as("n_pos"),
          round(expr(
            """CAST(nn * sr - rr * sn AS DOUBLE)
               * CAST(nn * sr - rr * sn AS DOUBLE)
               / (CAST(rr AS DOUBLE) * (nn - rr)
                  * CAST(nn * sn2 - sn * sn AS DOUBLE) / nn)"""), 6)
            .as("chi2_trend"),
          round(expr(
            """CAST(nn * sr - rr * sn AS DOUBLE)
               / sqrt(CAST(rr AS DOUBLE) * (nn - rr)
                  * CAST(nn * sn2 - sn * sn AS DOUBLE) / nn)"""), 6)
            .as("z_trend"))
    },
    Some("""WITH days AS (
              SELECT CAST(ts AS DATE) AS day,
                CAST(count(*) AS BIGINT) AS n,
                CAST(sum(CASE WHEN value > 90 THEN 1 ELSE 0 END)
                  AS BIGINT) AS r
              FROM events GROUP BY day),
            idxed AS (
              SELECT n, r,
                CAST(row_number() OVER (ORDER BY day) AS BIGINT)
                  AS sidx
              FROM days),
            st AS (
              SELECT CAST(count(*) AS BIGINT) AS n_days,
                CAST(sum(n) AS BIGINT) AS nn,
                CAST(sum(r) AS BIGINT) AS rr,
                CAST(sum(CAST(sidx AS HUGEINT) * n) AS HUGEINT) AS sn,
                CAST(sum(CAST(sidx AS HUGEINT) * r) AS HUGEINT) AS sr,
                CAST(sum(CAST(sidx AS HUGEINT) * sidx * n) AS HUGEINT)
                  AS sn2
              FROM idxed)
            SELECT n_days, nn AS n_total, rr AS n_pos,
              round(CAST(nn * sr - rr * sn AS DOUBLE)
                  * CAST(nn * sr - rr * sn AS DOUBLE)
                / (CAST(rr AS DOUBLE) * (nn - rr)
                   * CAST(nn * sn2 - sn * sn AS DOUBLE) / nn), 6)
                AS chi2_trend,
              round(CAST(nn * sr - rr * sn AS DOUBLE)
                / sqrt(CAST(rr AS DOUBLE) * (nn - rr)
                   * CAST(nn * sn2 - sn * sn AS DOUBLE) / nn), 6)
                AS z_trend
            FROM st"""))

  // ---- q_stats_cronbach -------------------------------------------------

  /** Cronbach's alpha (q_stats_cronbach): internal-consistency
    * reliability of the k = 3 per-document "quality items" (char
    * count, whitespace token count, distinct-token count) — do the
    * cheap length proxies measure one underlying construct, i.e. can
    * a curation pipeline substitute one for the others?
    * α = k/(k−1) · (1 − Σᵢvarᵢ / var_total). Every item is an exact
    * integer per doc, so each variance numerator rides as
    * n·Σx² − (Σx)² in DECIMAL(38,0)/HUGEINT (the n² denominators
    * cancel in the ratio) — ONE map-side-combined aggregate over the
    * corpus, one double division at the end. */
  /** The commutative sufficient-moment row for Cronbach's alpha — the
    * shared ingest aggregate of the batch op and its streaming twin. */
  private[graft] def cronbachStatsAggs(docs: DataFrame): DataFrame =
    docs
      .withColumn("toks", split(col("text"), " "))
      .select(col("n_chars").as("x1"),
        size(col("toks")).cast("long").as("x2"),
        size(array_distinct(col("toks"))).cast("long").as("x3"))
      .withColumn("xt", expr("x1 + x2 + x3"))
      .agg(count(lit(1)).as("n"),
        sum(col("x1")).as("s1"),
        sum(expr("CAST(x1 * x1 AS DECIMAL(38,0))")).as("q1"),
        sum(col("x2")).as("s2"),
        sum(expr("CAST(x2 * x2 AS DECIMAL(38,0))")).as("q2"),
        sum(col("x3")).as("s3"),
        sum(expr("CAST(x3 * x3 AS DECIMAL(38,0))")).as("q3"),
        sum(col("xt")).as("st"),
        sum(expr("CAST(xt * xt AS DECIMAL(38,0))")).as("qt"))

  /** Finisher: moments row → (n_docs, k_items, alpha). */
  private[graft] def cronbachFromStats(st: DataFrame): DataFrame =
    st.select(col("n").as("n_docs"), lit(3L).as("k_items"),
      round(expr(
        // s·s rides DECIMAL(38,0): a BIGINT square wraps silently
        // past 9.2e18 under Spark's non-ANSI arithmetic
        """(3.0D / 2.0D) * (1.0D -
             (CAST(n * q1 - CAST(s1 AS DECIMAL(38,0)) * s1 AS DOUBLE)
              + CAST(n * q2 - CAST(s2 AS DECIMAL(38,0)) * s2 AS DOUBLE)
              + CAST(n * q3 - CAST(s3 AS DECIMAL(38,0)) * s3 AS DOUBLE))
             / CAST(n * qt - CAST(st AS DECIMAL(38,0)) * st AS DOUBLE))"""),
        6).as("alpha"))

  val qStatsCronbach = Q(
    "q_stats_cronbach",
    (s, d) =>
      cronbachFromStats(cronbachStatsAggs(Tables.t(s, d, "documents"))),
    Some(cronbachOracleSql))

  // def, not val: referenced by the Q above it (object init order)
  private[graft] def cronbachOracleSql: String = """WITH items AS (
              SELECT n_chars AS x1,
                CAST(len(string_split(text, ' ')) AS BIGINT) AS x2,
                CAST(len(list_distinct(string_split(text, ' ')))
                  AS BIGINT) AS x3,
                n_chars + CAST(len(string_split(text, ' ')) AS BIGINT)
                  + CAST(len(list_distinct(string_split(text, ' ')))
                    AS BIGINT) AS xt
              FROM documents),
            st AS (
              SELECT CAST(count(*) AS BIGINT) AS n,
                CAST(sum(x1) AS HUGEINT) AS s1,
                CAST(sum(CAST(x1 AS HUGEINT) * x1) AS HUGEINT) AS q1,
                CAST(sum(x2) AS HUGEINT) AS s2,
                CAST(sum(CAST(x2 AS HUGEINT) * x2) AS HUGEINT) AS q2,
                CAST(sum(x3) AS HUGEINT) AS s3,
                CAST(sum(CAST(x3 AS HUGEINT) * x3) AS HUGEINT) AS q3,
                CAST(sum(xt) AS HUGEINT) AS st,
                CAST(sum(CAST(xt AS HUGEINT) * xt) AS HUGEINT) AS qt
              FROM items)
            SELECT n AS n_docs, CAST(3 AS BIGINT) AS k_items,
              round((3.0e0 / 2.0e0) * (1.0e0 -
                  (CAST(n * q1 - s1 * s1 AS DOUBLE)
                   + CAST(n * q2 - s2 * s2 AS DOUBLE)
                   + CAST(n * q3 - s3 * s3 AS DOUBLE))
                  / CAST(n * qt - st * st AS DOUBLE)), 6) AS alpha
            FROM st"""

  // ---- q_stats_mcnemar --------------------------------------------------

  /** McNemar's paired test (q_stats_mcnemar): do two curation gates
    * applied to the SAME documents — the char-length gate
    * (n_chars ≥ 250) and the token-length gate (≥ 45 whitespace
    * tokens) — disagree symmetrically, or does one systematically
    * pass docs the other rejects? The test conditions on the
    * discordant pairs only: χ² = (|b−c|−1)²/(b+c) with continuity
    * correction, where b = pass-A/fail-B and c = fail-A/pass-B.
    * The whole op is ONE 4-cell count aggregate over the corpus
    * (map-side combined) and a fixed double expression — the
    * cheapest possible shape at any scale. */
  /** The commutative 4-cell counter row for McNemar — the shared
    * ingest aggregate of the batch op and its streaming twin. */
  private[graft] def mcnemarCellAggs(docs: DataFrame): DataFrame =
    docs
      .select((col("n_chars") >= 250).as("ga"),
        (size(split(col("text"), " ")) >= 45).as("gb"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(ga AND gb AS LONG)")).as("n_both"),
        sum(expr("CAST(ga AND NOT gb AS LONG)")).as("b"),
        sum(expr("CAST(NOT ga AND gb AS LONG)")).as("c"))

  /** Finisher: cell row → the continuity-corrected statistic. */
  private[graft] def mcnemarFromCells(cells: DataFrame): DataFrame =
    cells.select(col("n"), col("n_both"), col("b"), col("c"),
      round(expr(
        """CASE WHEN b + c > 0 THEN
             CAST((abs(b - c) - 1) * (abs(b - c) - 1) AS DOUBLE)
               / (b + c)
           ELSE 0.0D END"""), 6).as("chi2"))

  val qStatsMcnemar = Q(
    "q_stats_mcnemar",
    (s, d) =>
      mcnemarFromCells(mcnemarCellAggs(Tables.t(s, d, "documents"))),
    Some(mcnemarOracleSql))

  // def, not val: referenced by the Q above it (object init order)
  private[graft] def mcnemarOracleSql: String = """WITH g AS (
              SELECT n_chars >= 250 AS ga,
                len(string_split(text, ' ')) >= 45 AS gb
              FROM documents),
            st AS (
              SELECT CAST(count(*) AS BIGINT) AS n,
                CAST(sum(CASE WHEN ga AND gb THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_both,
                CAST(sum(CASE WHEN ga AND NOT gb THEN 1 ELSE 0 END)
                  AS BIGINT) AS b,
                CAST(sum(CASE WHEN NOT ga AND gb THEN 1 ELSE 0 END)
                  AS BIGINT) AS c
              FROM g)
            SELECT n, n_both, b, c,
              round(CASE WHEN b + c > 0 THEN
                  CAST((abs(b - c) - 1) * (abs(b - c) - 1) AS DOUBLE)
                    / (b + c)
                ELSE 0.0e0 END, 6) AS chi2
            FROM st"""

  // ---- q_stats_cohend ---------------------------------------------------

  /** Per-source effect-size panel (q_stats_cohend): Cohen's d of each
    * source's document length against the REST of the corpus — the
    * standardized "how different is this source, in pooled-σ units"
    * table a mixture planner reads next to q_text_jsd's lexical view
    * (d ≈ 0.2 small / 0.5 medium / 0.8 large, scale-free where a raw
    * mean gap is not). ONE (source) moment aggregate touches the
    * corpus; the corpus totals are the SUM of the source grid (exact
    * integers, order-free), and d is a fixed double expression per
    * grid row: d = (m₁ − m₂) / √(((n₁q₁−s₁²)/n₁ + (n₂q₂−s₂²)/n₂)
    * / (n₁+n₂−2)). */
  /** The commutative per-source (n, Σx, Σx²) length-moment grid —
    * the shared ingest aggregate of q_stats_cohend, q_stats_bartlett,
    * and both their streaming twins. ONE map-side-combined (source)
    * aggregate; the sum-of-squares rides DECIMAL(38,0). */
  private[graft] def sourceLenMoments(docs: DataFrame): DataFrame =
    docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n"),
        sum(col("n_chars")).as("sx"),
        sum(expr("CAST(n_chars * n_chars AS DECIMAL(38,0))"))
          .as("qx"))

  /** Finisher: source grid → per-source Cohen's d panel. The corpus
    * totals are the SUM of the grid (exact integers, order-free). */
  private[graft] def cohendFromMoments(grid: DataFrame): DataFrame = {
      val tot = grid.agg(sum(col("n")).as("tn"),
        sum(col("sx")).as("ts"), sum(col("qx")).as("tq"))
      grid.crossJoin(broadcast(tot))
        .select(col("source"), col("n").as("n_docs"),
          round(expr(
            """(CAST(sx AS DOUBLE) / n
                - CAST(ts - sx AS DOUBLE) / (tn - n))
               / sqrt((CAST(n * qx - CAST(sx AS DECIMAL(38,0)) * sx
                         AS DOUBLE) / n
                       + CAST((tn - n) * (tq - qx)
                           - CAST(ts - sx AS DECIMAL(38,0)) * (ts - sx)
                         AS DOUBLE) / (tn - n))
                      / (tn - 2))"""), 6).as("cohen_d"))
        .orderBy(col("source"))
  }

  val qStatsCohend = Q(
    "q_stats_cohend",
    (s, d) =>
      cohendFromMoments(sourceLenMoments(Tables.t(s, d, "documents"))),
    Some(cohendOracleSql))

  // def, not val: referenced by the Q above it (object init order)
  private[graft] def cohendOracleSql: String = """WITH grid AS (
              SELECT source, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(n_chars) AS HUGEINT) AS sx,
                CAST(sum(CAST(n_chars AS HUGEINT) * n_chars) AS HUGEINT)
                  AS qx
              FROM documents GROUP BY source),
            tot AS (
              SELECT CAST(sum(n) AS BIGINT) AS tn,
                CAST(sum(sx) AS HUGEINT) AS ts,
                CAST(sum(qx) AS HUGEINT) AS tq
              FROM grid)
            SELECT source, n AS n_docs,
              round((CAST(sx AS DOUBLE) / n
                  - CAST(ts - sx AS DOUBLE) / (tn - n))
                / sqrt((CAST(n * qx - sx * sx AS DOUBLE) / n
                        + CAST((tn - n) * (tq - qx)
                            - (ts - sx) * (ts - sx) AS DOUBLE) / (tn - n))
                       / (tn - 2)), 6) AS cohen_d
            FROM grid, tot
            ORDER BY source NULLS FIRST"""

  // ---- q_stats_bartlett -------------------------------------------------

  /** Finisher: source grid ([[sourceLenMoments]]) → Bartlett's
    * homogeneity-of-variance χ².
    * Each source's term is quantized BEFORE the k-sum (t1 = pooled-SS
    * contribution in micro units, t2 = (n−1)·ln v in nano units,
    * t3 = 1/(n−1) in pico units) so the grid aggregate is order-free;
    * the sample SS n·Σx²−(Σx)² stays exact DECIMAL(38,0) until one
    * double division per source.
    *
    * Degenerate sources are dropped BEFORE the term math: n = 1 makes
    * t3's 1e12/(n−1) and t2's ln(ssd/(n·(n−1))) blow up (Spark's
    * non-ANSI CAST clamps Infinity to Long.MaxValue silently while
    * DuckDB raises on CAST(Infinity AS BIGINT)), and ssd = 0 (all
    * lengths identical) sends ln to −Infinity; the n ≥ 2 ∧ ssd > 0
    * filter is mirrored verbatim in the oracle so both engines see the
    * same grid. Bartlett's statistic is only defined for groups with a
    * positive sample variance, so the drop IS the textbook
    * definition, not a workaround. */
  private[graft] def bartlettFromMoments(grid: DataFrame): DataFrame =
    grid
      .select(col("n"),
        expr("n * qx - CAST(sx AS DECIMAL(38,0)) * sx").as("ssd"))
      .filter(col("n") >= 2 && col("ssd") > 0)
      .select(col("n"),
        expr("""CAST(floor(CAST(ssd AS DOUBLE) / n * 1e6 + 0.5D)
            AS BIGINT)""").as("t1"),
        expr("""(n - 1) * CAST(floor(
            ln(CAST(ssd AS DOUBLE) / (n * (n - 1.0D))) * 1e9 + 0.5D)
            AS BIGINT)""").as("t2"),
        expr("CAST(floor(1e12 / (n - 1) + 0.5D) AS BIGINT)").as("t3"))
      .agg(count(lit(1)).as("k"), sum(col("n")).as("ntot"),
        sum(col("t1")).as("s1"), sum(col("t2")).as("s2"),
        sum(col("t3")).as("s3"))
      .select(col("k").as("k_groups"), col("ntot").as("n_total"),
        expr("k - 1").as("df"),
        round(expr(
          """((ntot - k) * ln(CAST(s1 AS DOUBLE) / 1e6 / (ntot - k))
              - CAST(s2 AS DOUBLE) / 1e9)
             / (1.0D + (CAST(s3 AS DOUBLE) / 1e12
                        - 1.0D / (ntot - k))
                       / (3.0D * (k - 1)))"""), 6)
          .as("bartlett_chi2"))

  /** Bartlett's test for equal variances (q_stats_bartlett): do the
    * sources write documents of equally DISPERSED length? The
    * parametric sibling of q_stats_levene — more powerful when the
    * normal assumption holds, and the pair's disagreement is itself
    * the heavy-tail signal a curation gate wants. */
  val qStatsBartlett = Q(
    "q_stats_bartlett",
    (s, d) =>
      bartlettFromMoments(sourceLenMoments(
        Tables.t(s, d, "documents"))),
    Some(bartlettOracleSql))

  // def, not val: referenced by the Q above it (object init order)
  private[graft] def bartlettOracleSql: String = """WITH grid AS (
              SELECT source, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(n_chars) AS BIGINT) AS sx,
                sum(CAST(n_chars AS HUGEINT) * n_chars) AS qx
              FROM documents GROUP BY source),
            terms AS (
              SELECT n,
                CAST(floor(CAST(n * qx - CAST(sx AS HUGEINT) * sx
                    AS DOUBLE) / n * 1e6 + 0.5e0) AS BIGINT) AS t1,
                (n - 1) * CAST(floor(
                  ln(CAST(n * qx - CAST(sx AS HUGEINT) * sx AS DOUBLE)
                     / (n * (n - 1.0e0))) * 1e9 + 0.5e0)
                  AS BIGINT) AS t2,
                CAST(floor(1e12 / (n - 1) + 0.5e0) AS BIGINT) AS t3
              FROM grid
              WHERE n >= 2
                AND n * qx - CAST(sx AS HUGEINT) * sx > 0),
            st AS (
              SELECT CAST(count(*) AS BIGINT) AS k,
                CAST(sum(n) AS BIGINT) AS ntot,
                CAST(sum(t1) AS BIGINT) AS s1,
                CAST(sum(t2) AS BIGINT) AS s2,
                CAST(sum(t3) AS BIGINT) AS s3
              FROM terms)
            SELECT k AS k_groups, ntot AS n_total,
              CAST(k - 1 AS BIGINT) AS df,
              round(((ntot - k) * ln(CAST(s1 AS DOUBLE) / 1e6
                    / (ntot - k))
                  - CAST(s2 AS DOUBLE) / 1e9)
                / (1.0e0 + (CAST(s3 AS DOUBLE) / 1e12
                            - 1.0e0 / (ntot - k))
                           / (3.0e0 * (k - 1))), 6) AS bartlett_chi2
            FROM st"""

  // ---- q_stats_fleiss ---------------------------------------------------

  /** Fleiss' kappa (q_stats_fleiss): chance-corrected agreement of
    * THREE binary curation gates (char length ≥ 250, token count ≥ 45,
    * distinct tokens ≥ 40) treated as three raters per document — the
    * multi-rater extension of q_quality_kappa's Cohen view. With
    * r = positive votes per doc, P̄ᵢ = (r² + (3−r)² − 3)/6 and
    * P̄ₑ = p₁² + p₀², all from ONE 3-sum exact-integer aggregate; the
    * whole statistic is a fixed double expression over (n, Σr,
    * Σ[r²+(3−r)²]). */
  /** The commutative three-gate vote counters — the shared ingest
    * aggregate of the batch op and its streaming twin. */
  private[graft] def fleissVoteAggs(docs: DataFrame): DataFrame =
    docs
      .select(((col("n_chars") >= 250).cast("long")
        + (size(split(col("text"), " ")) >= 45).cast("long")
        + (size(array_distinct(split(col("text"), " "))) >= 40)
          .cast("long")).as("r"))
      .agg(count(lit(1)).as("n"), sum(col("r")).as("sr"),
        sum(expr("r * r + (3 - r) * (3 - r)")).as("sq"))

  /** Finisher: vote counters → Fleiss' kappa. */
  private[graft] def fleissFromVotes(st: DataFrame): DataFrame =
    st.select(col("n").as("n_docs"), lit(3L).as("n_raters"),
          round(expr(
            """CASE WHEN
                 1.0D - ((CAST(sr AS DOUBLE) / (3.0D * n))
                         * (CAST(sr AS DOUBLE) / (3.0D * n))
                         + (1.0D - CAST(sr AS DOUBLE) / (3.0D * n))
                           * (1.0D - CAST(sr AS DOUBLE) / (3.0D * n)))
                 <> 0.0D THEN
                 (CAST(sq - 3 * n AS DOUBLE) / (6.0D * n)
                  - ((CAST(sr AS DOUBLE) / (3.0D * n))
                     * (CAST(sr AS DOUBLE) / (3.0D * n))
                     + (1.0D - CAST(sr AS DOUBLE) / (3.0D * n))
                       * (1.0D - CAST(sr AS DOUBLE) / (3.0D * n))))
                 / (1.0D - ((CAST(sr AS DOUBLE) / (3.0D * n))
                            * (CAST(sr AS DOUBLE) / (3.0D * n))
                            + (1.0D - CAST(sr AS DOUBLE) / (3.0D * n))
                              * (1.0D
                                 - CAST(sr AS DOUBLE) / (3.0D * n))))
               ELSE CAST(NULL AS DOUBLE) END"""), 6)
            .as("fleiss_kappa"))

  val qStatsFleiss = Q(
    "q_stats_fleiss",
    (s, d) =>
      fleissFromVotes(fleissVoteAggs(Tables.t(s, d, "documents"))),
    Some(fleissOracleSql))

  // def, not val: referenced by the Q above it (object init order)
  private[graft] def fleissOracleSql: String = """WITH g AS (
              SELECT (CASE WHEN n_chars >= 250 THEN 1 ELSE 0 END
                + CASE WHEN len(string_split(text, ' ')) >= 45
                    THEN 1 ELSE 0 END
                + CASE WHEN len(list_distinct(string_split(text, ' ')))
                    >= 40 THEN 1 ELSE 0 END) AS r
              FROM documents),
            st AS (
              SELECT CAST(count(*) AS BIGINT) AS n,
                CAST(sum(r) AS BIGINT) AS sr,
                CAST(sum(r * r + (3 - r) * (3 - r)) AS BIGINT) AS sq
              FROM g)
            SELECT n AS n_docs, CAST(3 AS BIGINT) AS n_raters,
              round(CASE WHEN
                  1.0e0 - ((CAST(sr AS DOUBLE) / (3.0e0 * n))
                           * (CAST(sr AS DOUBLE) / (3.0e0 * n))
                           + (1.0e0 - CAST(sr AS DOUBLE) / (3.0e0 * n))
                             * (1.0e0
                                - CAST(sr AS DOUBLE) / (3.0e0 * n)))
                  <> 0.0e0 THEN
                  (CAST(sq - 3 * n AS DOUBLE) / (6.0e0 * n)
                   - ((CAST(sr AS DOUBLE) / (3.0e0 * n))
                      * (CAST(sr AS DOUBLE) / (3.0e0 * n))
                      + (1.0e0 - CAST(sr AS DOUBLE) / (3.0e0 * n))
                        * (1.0e0 - CAST(sr AS DOUBLE) / (3.0e0 * n))))
                  / (1.0e0 - ((CAST(sr AS DOUBLE) / (3.0e0 * n))
                              * (CAST(sr AS DOUBLE) / (3.0e0 * n))
                              + (1.0e0
                                 - CAST(sr AS DOUBLE) / (3.0e0 * n))
                                * (1.0e0
                                   - CAST(sr AS DOUBLE)
                                     / (3.0e0 * n))))
                ELSE CAST(NULL AS DOUBLE) END, 6) AS fleiss_kappa
            FROM st"""

  // ---- q_stats_qq -------------------------------------------------------

  /** Standard-normal quantile literals for the nine deciles — embedded
    * identically in both engines (the q_audit_dp_hist inverse-CDF
    * discipline: no engine evaluates Φ⁻¹ itself). */
  private val normalZ = Seq(
    1 -> "-1.2815515655446004", 2 -> "-0.8416212335729143",
    3 -> "-0.5244005127080407", 4 -> "-0.2533471031357997",
    5 -> "0.0", 6 -> "0.2533471031357997",
    7 -> "0.5244005127080407", 8 -> "0.8416212335729143",
    9 -> "1.2815515655446004")
  private val zCaseSql = "CASE " + normalZ.map { case (k, z) =>
    s"WHEN k = $k THEN CAST($z AS DOUBLE)" }.mkString(" ") + " END"

  /** Normal Q-Q table (q_stats_qq): empirical deciles of document
    * length against μ + σ·z_p — the nine-row normality diagnostic a
    * reviewer reads before trusting any of the parametric gates
    * (Bartlett, t, Welch). σ comes from exact integer moments; the
    * z_p grid is literal; the only estimator shared across engines is
    * the interpolated percentile both sides define identically
    * (q_ml_pr_curve precedent). */
  val qStatsQq = Q(
    "q_stats_qq",
    (s, d) => {
      val base = Tables.t(s, d, "documents")
        .select(col("n_chars").as("c"))
      val st = base.agg(count(lit(1)).as("n"), sum(col("c")).as("s1"),
        sum(expr("CAST(c * c AS DECIMAL(38,0))")).as("q1"),
        expr("percentile(c, 0.1)").as("p1"),
        expr("percentile(c, 0.2)").as("p2"),
        expr("percentile(c, 0.3)").as("p3"),
        expr("percentile(c, 0.4)").as("p4"),
        expr("percentile(c, 0.5)").as("p5"),
        expr("percentile(c, 0.6)").as("p6"),
        expr("percentile(c, 0.7)").as("p7"),
        expr("percentile(c, 0.8)").as("p8"),
        expr("percentile(c, 0.9)").as("p9"))
      st.select(expr("""stack(9, 1L, p1, 2L, p2, 3L, p3, 4L, p4,
            5L, p5, 6L, p6, 7L, p7, 8L, p8, 9L, p9)""")
          .as(Seq("k", "emp_q")),
          col("n"), col("s1"), col("q1"))
        .select(col("k").as("fence"),
          round(col("emp_q"), 6).as("emp_q"),
          round(expr(
            s"""CAST(s1 AS DOUBLE) / n
               + sqrt((CAST(n * q1 - CAST(s1 AS DECIMAL(38,0)) * s1
                         AS DOUBLE))
                      / (CAST(n AS DOUBLE) * (n - 1))) * ($zCaseSql)"""),
            6).as("theo_q"))
        .withColumn("gap", round(expr("round(emp_q, 6) - round(theo_q, 6)"), 6))
        .orderBy(col("fence"))
    },
    Some(s"""WITH base AS (SELECT n_chars AS c FROM documents),
            st AS (
              SELECT CAST(count(*) AS BIGINT) AS n,
                CAST(sum(c) AS BIGINT) AS s1,
                sum(CAST(c AS HUGEINT) * c) AS q1,
                quantile_cont(c, 0.1) AS p1, quantile_cont(c, 0.2) AS p2,
                quantile_cont(c, 0.3) AS p3, quantile_cont(c, 0.4) AS p4,
                quantile_cont(c, 0.5) AS p5, quantile_cont(c, 0.6) AS p6,
                quantile_cont(c, 0.7) AS p7, quantile_cont(c, 0.8) AS p8,
                quantile_cont(c, 0.9) AS p9
              FROM base),
            fences AS (
              SELECT k,
                CASE k WHEN 1 THEN p1 WHEN 2 THEN p2 WHEN 3 THEN p3
                       WHEN 4 THEN p4 WHEN 5 THEN p5 WHEN 6 THEN p6
                       WHEN 7 THEN p7 WHEN 8 THEN p8 ELSE p9 END
                  AS emp_q,
                n, s1, q1
              FROM st CROSS JOIN
                (SELECT unnest([1, 2, 3, 4, 5, 6, 7, 8, 9]) AS k)),
            vals AS (
              SELECT CAST(k AS BIGINT) AS fence,
                round(emp_q, 6) AS emp_q,
                round(CAST(s1 AS DOUBLE) / n
                  + sqrt((CAST(n * q1 - CAST(s1 AS HUGEINT) * s1
                            AS DOUBLE))
                         / (CAST(n AS DOUBLE) * (n - 1)))
                    * ($zCaseSql), 6) AS theo_q
              FROM fences)
            SELECT fence, emp_q, theo_q,
              round(round(emp_q, 6) - round(theo_q, 6), 6) AS gap
            FROM vals
            ORDER BY fence NULLS FIRST"""))

  // ---- q_ml_mcc_curve ---------------------------------------------------

  /** Matthews-correlation curve (q_ml_mcc_curve): MCC of the
    * "length > decile-t predicts English" classifier at the same nine
    * fences as q_ml_pr_curve — the balanced single-number companion
    * the PR table lacks when classes skew. The 2×2 cells are exact
    * BIGINT counts from one corpus pass over the broadcast fence grid;
    * the numerator tp·tn − fp·fn stays integer (≤ n², far inside
    * BIGINT) and the √ of the four marginal products runs in one
    * fixed double expression. */
  val qMlMccCurve = Q(
    "q_ml_mcc_curve",
    (s, d) => {
      val base = Tables.t(s, d, "documents")
        .select(col("n_chars").as("c"),
          when(col("lang") === "en", 1L).otherwise(0L).as("pos"))
      val thr = base.agg(
        expr("percentile(c, 0.1)").as("t1"),
        expr("percentile(c, 0.2)").as("t2"),
        expr("percentile(c, 0.3)").as("t3"),
        expr("percentile(c, 0.4)").as("t4"),
        expr("percentile(c, 0.5)").as("t5"),
        expr("percentile(c, 0.6)").as("t6"),
        expr("percentile(c, 0.7)").as("t7"),
        expr("percentile(c, 0.8)").as("t8"),
        expr("percentile(c, 0.9)").as("t9"))
        .select(expr("""stack(9, 1L, t1, 2L, t2, 3L, t3, 4L, t4,
          5L, t5, 6L, t6, 7L, t7, 8L, t8, 9L, t9)""")
          .as(Seq("k", "t")))
      base.crossJoin(broadcast(thr))
        .groupBy(col("k"))
        .agg(sum(when(col("c") > col("t"), col("pos")).otherwise(0L))
            .as("tp"),
          sum(when(col("c") > col("t"), lit(1L) - col("pos"))
            .otherwise(0L)).as("fp"),
          sum(when(col("c") <= col("t"), lit(1L) - col("pos"))
            .otherwise(0L)).as("tn"),
          sum(when(col("c") <= col("t"), col("pos")).otherwise(0L))
            .as("fn"))
        .select(col("k").as("fence"), col("tp"), col("fp"), col("tn"),
          col("fn"),
          round(expr(
            """CASE WHEN (tp + fp) * (tp + fn) > 0
                     AND (tn + fp) * (tn + fn) > 0 THEN
                 CAST(tp * tn - fp * fn AS DOUBLE)
                 / sqrt(CAST(tp + fp AS DOUBLE) * (tp + fn)
                        * (tn + fp) * (tn + fn))
               ELSE CAST(NULL AS DOUBLE) END"""), 6).as("mcc"))
        .orderBy(col("fence"))
    },
    Some("""WITH base AS (
              SELECT n_chars AS c,
                CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
              FROM documents),
            thr0 AS (
              SELECT quantile_cont(c, 0.1) AS t1,
                quantile_cont(c, 0.2) AS t2, quantile_cont(c, 0.3) AS t3,
                quantile_cont(c, 0.4) AS t4, quantile_cont(c, 0.5) AS t5,
                quantile_cont(c, 0.6) AS t6, quantile_cont(c, 0.7) AS t7,
                quantile_cont(c, 0.8) AS t8, quantile_cont(c, 0.9) AS t9
              FROM base),
            thr AS (
              SELECT k,
                CASE k WHEN 1 THEN t1 WHEN 2 THEN t2 WHEN 3 THEN t3
                       WHEN 4 THEN t4 WHEN 5 THEN t5 WHEN 6 THEN t6
                       WHEN 7 THEN t7 WHEN 8 THEN t8 ELSE t9 END AS t
              FROM thr0 CROSS JOIN
                (SELECT unnest([1, 2, 3, 4, 5, 6, 7, 8, 9]) AS k)),
            cnt AS (
              SELECT k,
                CAST(sum(CASE WHEN c > t THEN pos ELSE 0 END)
                  AS BIGINT) AS tp,
                CAST(sum(CASE WHEN c > t THEN 1 - pos ELSE 0 END)
                  AS BIGINT) AS fp,
                CAST(sum(CASE WHEN c <= t THEN 1 - pos ELSE 0 END)
                  AS BIGINT) AS tn,
                CAST(sum(CASE WHEN c <= t THEN pos ELSE 0 END)
                  AS BIGINT) AS fn
              FROM base, thr
              GROUP BY k)
            SELECT CAST(k AS BIGINT) AS fence, tp, fp, tn, fn,
              round(CASE WHEN (tp + fp) * (tp + fn) > 0
                          AND (tn + fp) * (tn + fn) > 0 THEN
                  CAST(tp * tn - fp * fn AS DOUBLE)
                  / sqrt(CAST(tp + fp AS DOUBLE) * (tp + fn)
                         * (tn + fp) * (tn + fn))
                ELSE CAST(NULL AS DOUBLE) END, 6) AS mcc
            FROM cnt
            ORDER BY fence NULLS FIRST"""))

  // ---- q_stats_tost -----------------------------------------------------

  /** TOST equivalence panel (q_stats_tost): per source, the two
    * one-sided Welch t-tests of "is this source's mean document length
    * within ±25 chars of the rest of the corpus" — the NONinferiority
    * view a curation change ships on (a failed difference test is NOT
    * evidence of equivalence; TOST is). Third consumer of the shared
    * [[sourceLenMoments]] grid: variances assemble from the exact
    * DECIMAL(38,0) sums, the rest-of-corpus side is the grid total
    * minus the source row, and each row is one fixed double
    * expression. Equivalent at α = 0.05 when t_lower > 1.645 AND
    * t_upper < −1.645. */
  val qStatsTost = Q(
    "q_stats_tost",
    (s, d) => {
      val grid = sourceLenMoments(Tables.t(s, d, "documents"))
      val tot = grid.agg(sum(col("n")).as("tn"),
        sum(col("sx")).as("ts"), sum(col("qx")).as("tq"))
      val core =
        """(CAST(sx AS DOUBLE) / n - CAST(ts - sx AS DOUBLE) / (tn - n))"""
      val se =
        """sqrt(CAST(n * qx - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE)
                 / (CAST(n AS DOUBLE) * (n - 1)) / n
               + CAST((tn - n) * (tq - qx)
                   - CAST(ts - sx AS DECIMAL(38,0)) * (ts - sx)
                   AS DOUBLE)
                 / (CAST(tn - n AS DOUBLE) * (tn - n - 1)) / (tn - n))"""
      grid.crossJoin(broadcast(tot))
        .select(col("source"), col("n").as("n_docs"),
          round(expr(core), 6).as("mean_diff"),
          round(expr(s"($core + 25.0D) / $se"), 6).as("t_lower"),
          round(expr(s"($core - 25.0D) / $se"), 6).as("t_upper"),
          expr(s"($core + 25.0D) / $se > 1.645D" +
            s" AND ($core - 25.0D) / $se < -1.645D")
            .as("is_equivalent"))
        .orderBy(col("source"))
    },
    Some {
      val core =
        "(CAST(sx AS DOUBLE) / n - CAST(ts - sx AS DOUBLE) / (tn - n))"
      val se =
        """sqrt(CAST(n * qx - sx * sx AS DOUBLE)
                 / (CAST(n AS DOUBLE) * (n - 1)) / n
               + CAST((tn - n) * (tq - qx) - (ts - sx) * (ts - sx)
                   AS DOUBLE)
                 / (CAST(tn - n AS DOUBLE) * (tn - n - 1)) / (tn - n))"""
      s"""WITH grid AS (
              SELECT source, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(n_chars) AS HUGEINT) AS sx,
                CAST(sum(CAST(n_chars AS HUGEINT) * n_chars) AS HUGEINT)
                  AS qx
              FROM documents GROUP BY source),
            tot AS (
              SELECT CAST(sum(n) AS BIGINT) AS tn,
                CAST(sum(sx) AS HUGEINT) AS ts,
                CAST(sum(qx) AS HUGEINT) AS tq
              FROM grid)
            SELECT source, n AS n_docs,
              round($core, 6) AS mean_diff,
              round(($core + 25.0e0) / $se, 6) AS t_lower,
              round(($core - 25.0e0) / $se, 6) AS t_upper,
              ($core + 25.0e0) / $se > 1.645e0
                AND ($core - 25.0e0) / $se < -1.645e0 AS is_equivalent
            FROM grid, tot
            ORDER BY source NULLS FIRST"""
    })

  // ---- q_ml_isotonic ----------------------------------------------------

  /** Isotonic calibration (q_ml_isotonic): the monotone fraction-of-
    * positives curve over 20 length bins, solved EXACTLY via the
    * max-min identity g*(i) = max_{j≤i} min_{l≥i} mean(j..l) — the
    * closed form of pool-adjacent-violators, and (unlike PAV's
    * sequential pooling) pure order-free relational algebra: one
    * corpus pass builds the bin grid, the j/l enumeration is a ≤20³
    * literal-bounded triple join over the 20-row grid, and every mean
    * is a ratio of exact integer prefix sums so both engines compare
    * identical doubles. The calibrated curve is what a quality-score
    * consumer reads instead of the raw bin fractions
    * (q_quality_calibrate's reliability view, made monotone). */
  val qMlIsotonic = Q(
    "q_ml_isotonic",
    (s, d) => {
      val grid = Tables.t(s, d, "documents")
        .select(expr("least(CAST(19 AS BIGINT), n_chars DIV 50)")
          .as("b"),
          when(col("lang") === "en", 1L).otherwise(0L).as("pos"))
        .groupBy(col("b"))
        .agg(count(lit(1)).as("cnt"), sum(col("pos")).as("p"))
      // ≤20-row literal-bounded grid: the unpartitioned window and the
      // theta joins below never touch corpus-sized relations
      val w = Window.orderBy(col("b"))
      val cum = grid
        .withColumn("cc", sum(col("cnt")).over(w))
        .withColumn("cp", sum(col("p")).over(w))
      val i = cum.select(col("b").as("ib"), col("cnt").as("icnt"),
        col("p").as("ip"))
      val j = cum.select(col("b").as("jb"),
        expr("cp - p").as("jp0"), expr("cc - cnt").as("jc0"))
      val l = cum.select(col("b").as("lb"), col("cp").as("lp"),
        col("cc").as("lc"))
      i.join(l, col("lb") >= col("ib"))
        .join(j, col("jb") <= col("ib"))
        .select(col("ib"), col("icnt"), col("ip"), col("jb"),
          expr("CAST(lp - jp0 AS DOUBLE) / (lc - jc0)").as("mean_jl"))
        .groupBy(col("ib"), col("icnt"), col("ip"), col("jb"))
        .agg(min(col("mean_jl")).as("minl"))
        .groupBy(col("ib"), col("icnt"), col("ip"))
        .agg(max(col("minl")).as("iso"))
        .select(col("ib").as("bin"), col("icnt").as("n_docs"),
          round(expr("CAST(ip AS DOUBLE) / icnt"), 6).as("raw_frac"),
          round(col("iso"), 6).as("iso_frac"))
        .orderBy(col("bin"))
    },
    Some("""WITH grid AS (
              SELECT least(19, n_chars // 50) AS b,
                CAST(count(*) AS BIGINT) AS cnt,
                CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                  AS BIGINT) AS p
              FROM documents GROUP BY least(19, n_chars // 50)),
            cum AS (
              SELECT b, cnt, p,
                CAST(sum(cnt) OVER (ORDER BY b) AS BIGINT) AS cc,
                CAST(sum(p) OVER (ORDER BY b) AS BIGINT) AS cp
              FROM grid),
            inner_min AS (
              SELECT i.b AS ib, i.cnt AS icnt, i.p AS ip, j.b AS jb,
                min(CAST(l.cp - (j.cp - j.p) AS DOUBLE)
                    / (l.cc - (j.cc - j.cnt))) AS minl
              FROM cum i
              JOIN cum l ON l.b >= i.b
              JOIN cum j ON j.b <= i.b
              GROUP BY i.b, i.cnt, i.p, j.b)
            SELECT CAST(ib AS BIGINT) AS bin, icnt AS n_docs,
              round(CAST(ip AS DOUBLE) / icnt, 6) AS raw_frac,
              round(max(minl), 6) AS iso_frac
            FROM inner_min
            GROUP BY ib, icnt, ip
            ORDER BY bin NULLS FIRST"""))

  // ---- q_stats_oddsratio ------------------------------------------------

  /** Gate odds ratio (q_stats_oddsratio): association strength of the
    * char-length and token-length curation gates as a 2×2 odds ratio
    * with a 95% Woolf log-interval — the effect-size companion to
    * q_stats_mcnemar's marginal-symmetry test, riding the SAME shared
    * 4-cell ingest aggregate (d reconstructs as n − a − b − c). All
    * cells are exact BIGINT; OR and the interval are fixed double
    * expressions, NULL when any cell is empty (the standard
    * undefined case, surfaced rather than smoothed). */
  val qStatsOddsratio = Q(
    "q_stats_oddsratio",
    (s, d) => {
      mcnemarCellAggs(Tables.t(s, d, "documents"))
        .select(col("n_both").as("a"), col("b"), col("c"),
          expr("n - n_both - b - c").as("d"))
        .select(col("a"), col("b"), col("c"), col("d"),
          round(expr(
            """CASE WHEN a > 0 AND b > 0 AND c > 0 AND d > 0 THEN
                 CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c)
               ELSE CAST(NULL AS DOUBLE) END"""), 6).as("odds_ratio"),
          round(expr(
            """CASE WHEN a > 0 AND b > 0 AND c > 0 AND d > 0 THEN
                 exp(ln(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c))
                     - 1.96D * sqrt(1.0D / a + 1.0D / b
                                    + 1.0D / c + 1.0D / d))
               ELSE CAST(NULL AS DOUBLE) END"""), 6).as("ci_lo"),
          round(expr(
            """CASE WHEN a > 0 AND b > 0 AND c > 0 AND d > 0 THEN
                 exp(ln(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c))
                     + 1.96D * sqrt(1.0D / a + 1.0D / b
                                    + 1.0D / c + 1.0D / d))
               ELSE CAST(NULL AS DOUBLE) END"""), 6).as("ci_hi"))
    },
    Some("""WITH g AS (
              SELECT n_chars >= 250 AS ga,
                len(string_split(text, ' ')) >= 45 AS gb
              FROM documents),
            st AS (
              SELECT
                CAST(sum(CASE WHEN ga AND gb THEN 1 ELSE 0 END)
                  AS BIGINT) AS a,
                CAST(sum(CASE WHEN ga AND NOT gb THEN 1 ELSE 0 END)
                  AS BIGINT) AS b,
                CAST(sum(CASE WHEN NOT ga AND gb THEN 1 ELSE 0 END)
                  AS BIGINT) AS c,
                CAST(sum(CASE WHEN NOT ga AND NOT gb THEN 1 ELSE 0 END)
                  AS BIGINT) AS d
              FROM g)
            SELECT a, b, c, d,
              round(CASE WHEN a > 0 AND b > 0 AND c > 0 AND d > 0 THEN
                  CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c)
                ELSE CAST(NULL AS DOUBLE) END, 6) AS odds_ratio,
              round(CASE WHEN a > 0 AND b > 0 AND c > 0 AND d > 0 THEN
                  exp(ln(CAST(a AS DOUBLE) * d
                         / (CAST(b AS DOUBLE) * c))
                      - 1.96e0 * sqrt(1.0e0 / a + 1.0e0 / b
                                      + 1.0e0 / c + 1.0e0 / d))
                ELSE CAST(NULL AS DOUBLE) END, 6) AS ci_lo,
              round(CASE WHEN a > 0 AND b > 0 AND c > 0 AND d > 0 THEN
                  exp(ln(CAST(a AS DOUBLE) * d
                         / (CAST(b AS DOUBLE) * c))
                      + 1.96e0 * sqrt(1.0e0 / a + 1.0e0 / b
                                      + 1.0e0 / c + 1.0e0 / d))
                ELSE CAST(NULL AS DOUBLE) END, 6) AS ci_hi
            FROM st"""))

  // ---- q_ml_infogain ----------------------------------------------------

  /** Binary-split entropy H(a, b) in nats — generated once with
    * engine-matched float suffixes; zero cells contribute zero (the
    * 0·ln0 limit), spelled as per-term guards so both engines skip the
    * same branches. */
  private def entSql(a: String, b: String, sfx: String): String = {
    def term(x: String) =
      s"""CASE WHEN $x > 0 THEN
            -(CAST($x AS DOUBLE) / ($a + $b))
              * ln(CAST($x AS DOUBLE) / ($a + $b))
          ELSE 0.0$sfx END"""
    s"(${term(a)} + ${term(b)})"
  }

  /** Feature ranking by information gain (q_ml_infogain): how many
    * nats of the lang=en label each curation gate buys — the split
    * criterion a decision-stump trainer (q_ml_stump) evaluates,
    * reported as an audit table so gate selection is data-driven. ONE
    * 7-sum exact-count aggregate over the corpus; the 3-gate panel is
    * a literal stack and each IG is a fixed double expression over
    * exact integers. */
  val qMlInfogain = Q(
    "q_ml_infogain",
    (s, d) => {
      val cells = Tables.t(s, d, "documents")
        .select(when(col("lang") === "en", 1L).otherwise(0L).as("pos"),
          (col("n_chars") >= 250).as("g1"),
          (size(split(col("text"), " ")) >= 45).as("g2"),
          (size(array_distinct(split(col("text"), " "))) >= 40)
            .as("g3"))
        .agg(count(lit(1)).as("n"), sum(col("pos")).as("np"),
          sum(expr("CAST(g1 AS LONG)")).as("t1"),
          sum(expr("CAST(g1 AS LONG) * pos")).as("p1"),
          sum(expr("CAST(g2 AS LONG)")).as("t2"),
          sum(expr("CAST(g2 AS LONG) * pos")).as("p2"),
          sum(expr("CAST(g3 AS LONG)")).as("t3"),
          sum(expr("CAST(g3 AS LONG) * pos")).as("p3"))
      val ig =
        s"""${entSql("np", "n - np", "D")}
           - (CAST(t AS DOUBLE) / n) * ${entSql("pt", "t - pt", "D")}
           - (CAST(n - t AS DOUBLE) / n)
             * ${entSql("np - pt", "n - t - (np - pt)", "D")}"""
      cells
        .select(col("n"), col("np"), expr(
          """stack(3, 'chars_ge_250', t1, p1,
                      'tokens_ge_45', t2, p2,
                      'distinct_ge_40', t3, p3)""")
          .as(Seq("gate", "t", "pt")))
        .select(col("gate"), col("t").as("n_true"),
          round(expr(
            """CASE WHEN t > 0 THEN CAST(pt AS DOUBLE) / t
               ELSE CAST(NULL AS DOUBLE) END"""), 6)
            .as("frac_pos_true"),
          round(expr(
            """CASE WHEN n - t > 0 THEN
                 CAST(np - pt AS DOUBLE) / (n - t)
               ELSE CAST(NULL AS DOUBLE) END"""), 6)
            .as("frac_pos_false"),
          round(expr(ig), 6).as("info_gain"))
        .orderBy(col("gate"))
    },
    Some {
      val ig =
        s"""${entSql("np", "n - np", "e0")}
           - (CAST(t AS DOUBLE) / n) * ${entSql("pt", "t - pt", "e0")}
           - (CAST(n - t AS DOUBLE) / n)
             * ${entSql("np - pt", "n - t - (np - pt)", "e0")}"""
      s"""WITH cells AS (
              SELECT CAST(count(*) AS BIGINT) AS n,
                CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                  AS BIGINT) AS np,
                CAST(sum(CASE WHEN n_chars >= 250 THEN 1 ELSE 0 END)
                  AS BIGINT) AS t1,
                CAST(sum(CASE WHEN n_chars >= 250 AND lang = 'en'
                  THEN 1 ELSE 0 END) AS BIGINT) AS p1,
                CAST(sum(CASE WHEN len(string_split(text, ' ')) >= 45
                  THEN 1 ELSE 0 END) AS BIGINT) AS t2,
                CAST(sum(CASE WHEN len(string_split(text, ' ')) >= 45
                  AND lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS p2,
                CAST(sum(CASE WHEN
                  len(list_distinct(string_split(text, ' '))) >= 40
                  THEN 1 ELSE 0 END) AS BIGINT) AS t3,
                CAST(sum(CASE WHEN
                  len(list_distinct(string_split(text, ' '))) >= 40
                  AND lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS p3
              FROM documents),
            panel AS (
              SELECT n, np,
                CASE k WHEN 1 THEN 'chars_ge_250'
                       WHEN 2 THEN 'tokens_ge_45'
                       ELSE 'distinct_ge_40' END AS gate,
                CASE k WHEN 1 THEN t1 WHEN 2 THEN t2 ELSE t3 END AS t,
                CASE k WHEN 1 THEN p1 WHEN 2 THEN p2 ELSE p3 END AS pt
              FROM cells CROSS JOIN
                (SELECT unnest([1, 2, 3]) AS k))
            SELECT gate, t AS n_true,
              round(CASE WHEN t > 0 THEN CAST(pt AS DOUBLE) / t
                ELSE CAST(NULL AS DOUBLE) END, 6) AS frac_pos_true,
              round(CASE WHEN n - t > 0 THEN
                  CAST(np - pt AS DOUBLE) / (n - t)
                ELSE CAST(NULL AS DOUBLE) END, 6) AS frac_pos_false,
              round($ig, 6) AS info_gain
            FROM panel
            ORDER BY gate NULLS FIRST"""
    })

  val all: Seq[Q] = Seq(
    qStatsAnova, qStatsKruskal, qStatsKendall, qStatsCramer, qMlAuc,
    qAggWinsorized, qTextReadability, qGraphHits, qStatsFdr,
    qStatsCmh, qStatsRuns, qStatsLevene, qMlGains, qMlBrier,
    qStatsFriedman, qStatsCochranQ, qStatsJarqueBera, qMlPrCurve,
    qStatsWelch, qStatsTrendCa, qStatsCronbach, qStatsMcnemar,
    qStatsCohend, qStatsBartlett, qStatsFleiss, qStatsQq, qMlMccCurve,
    qMlIsotonic, qStatsOddsratio, qStatsTost, qMlInfogain)
}
