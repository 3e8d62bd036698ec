package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-audit operators: equi-depth histogram summaries, regex field
  * extraction audits, and priority-based canonical selection among
  * duplicates — the profiling/canonicalization passes a pipeline runs
  * before and after ingest. */
object Audit {

  private def t(n: String)(implicit s: SparkSession, d: String) =
    Tables.t(s, d, "" + n)

  /** Equi-depth histogram of l_extendedprice (q_agg_equidepth): 8
    * buckets whose boundaries are the exact octile percentiles —
    * never a global ntile sort (a single-partition window at 100 TB)
    * and never the `percentile` object aggregate (its interpreted
    * per-row map update was measured at 3.2 s of this query's 3.8 at
    * sf0.1). TWO fact scans (r17; was three), each shuffling only
    * domain-bounded relations (the earlier one-scan value-histogram
    * form shuffled + checkpointed a per-CENT table that is ~97% of the
    * fact at sf0.1 — 583k of 600k cents are distinct — and cost 3.4 s):
    *  1. cell census: one map-side-combined aggregate to the ~110
    *     price-domain cells (1000-currency-unit ranges) + a prefix sum
    *     over that bounded table → each target rank's cell.
    *  2. detail: per-cent counts of ONLY the ≤14 cells containing a
    *     target rank — ≤14 × 100 000 cents whatever the corpus size —
    *     ranked within cell + census offset = exact global order
    *     statistics, interpolated with the same (n−1)p rule as the
    *     oracle's quantile_cont.
    *  3. bucket rollup (r17): DERIVED, not re-scanned — a cut always
    *     interpolates between adjacent order statistics, so any cell
    *     it splits is already a detailed target cell; interior cells
    *     map wholesale into one bucket via the census (count + min/max
    *     cent) and split candidates resolve at cent grain from the
    *     checkpointed detail.
    * Cut doubles are identical across engines (cents/100.0 is the
    * correctly-rounded double of the 2-decimal value), so bucket
    * membership is exact. The cents quantization is the registered
    * domain of this query (exact-decimal money); a genuinely
    * continuous column must switch to `approx_percentile` and pair
    * the oracle with the same sketch parameters. */
  val qAggEquidepth = Q(
    "q_agg_equidepth",
    (sp, dir) => {
      import org.apache.spark.sql.expressions.Window
      implicit val s: SparkSession = sp
      implicit val d: String = dir
      val cents = t("lineitem")
        .select(floor(col("l_extendedprice") * 100 + lit(0.5))
          .cast("long").as("c"))
        .withColumn("cell", (col("c") / 100000L).cast("long"))
      // phase 1: ~110-row price-domain census (map-side combined) with
      // prefix offsets; the unpartitioned window runs over the bounded
      // cell table, never the fact. Checkpointed: read by the rank
      // locator, the detail offsets, and the n census.
      val census = cents.groupBy(col("cell"))
        .agg(count(lit(1)).as("cn"),
          min(col("c")).as("mnc"), max(col("c")).as("mxc"))
        .withColumn("off",
          sum(col("cn")).over(Window.orderBy(col("cell"))) - col("cn"))
        .localCheckpoint()
      val n1 = census.agg(sum(col("cn")).as("n"))
      // 7-row (percentile, rank) grid; the value at an integer 0-based
      // rank k is the unique per-cent row with lo_rank <= k < hi_rank.
      val grid = n1.select(
        explode(array(Seq(0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875)
          .map(lit): _*)).as("p"), col("n"))
        .select(col("p"),
          floor((col("n") - 1) * col("p")).cast("long").as("klo"),
          ceil((col("n") - 1) * col("p")).cast("long").as("khi"),
          ((col("n") - 1) * col("p") -
            floor((col("n") - 1) * col("p"))).as("frac"))
        .localCheckpoint() // consumed by the locator and the cut join
      // which ≤14 cells contain a target rank (off <= k < off + cn)
      val needCells = grid
        .join(broadcast(census),
          (col("off") <= col("klo") &&
            col("klo") < col("off") + col("cn")) ||
          (col("off") <= col("khi") &&
            col("khi") < col("off") + col("cn")))
        .select(col("cell").as("tc")).distinct()
      // phase 2: per-cent detail of ONLY the target cells — a ≤14 ×
      // 100 000-row relation whatever the corpus size; rank within the
      // cell plus the census offset is the exact global rank
      val cum = cents
        .join(broadcast(needCells), col("cell") === col("tc"),
          "left_semi")
        .groupBy(col("cell"), col("c")).agg(count(lit(1)).as("cnt"))
        .join(broadcast(census.select(col("cell").as("ocell"),
          col("off"))), col("cell") === col("ocell"))
        .select(col("c"), col("cnt"),
          (col("off") + sum(col("cnt")).over(
            Window.partitionBy(col("cell")).orderBy(col("c"))))
            .as("hi_rank"))
        .withColumn("lo_rank", col("hi_rank") - col("cnt"))
        // r17: a second consumer arrived (the bucket rollup below) —
        // checkpoint the ≤14-cell detail (bounded by cents-per-cell ×
        // 14 whatever the corpus size) so the target-cell fact pass
        // runs once, not once per consumer
        .localCheckpoint()
      val cuts = cum
        .join(broadcast(grid),
          (col("lo_rank") <= col("klo") && col("klo") < col("hi_rank")) ||
          (col("lo_rank") <= col("khi") && col("khi") < col("hi_rank")))
        .groupBy(col("p"), col("frac"))
        .agg(
          min(when(col("lo_rank") <= col("klo") &&
            col("klo") < col("hi_rank"),
            col("c").cast("double") / 100.0)).as("vlo"),
          min(when(col("lo_rank") <= col("khi") &&
            col("khi") < col("hi_rank"),
            col("c").cast("double") / 100.0)).as("vhi"))
        .select(col("p"),
          (col("vlo") + (col("vhi") - col("vlo")) * col("frac"))
            .as("cut"))
        .agg(expr("transform(array_sort(collect_list(struct(p, cut)))," +
          " x -> x.cut)").as("cuts"))
      // phase 3 (r17): bucket rollup WITHOUT a third fact scan. A cell
      // that a cut splits provably contains a target rank — each cut
      // interpolates between two ADJACENT order statistics (khi−klo ≤
      // 1, no data value strictly between them), so a cell with data
      // on both sides of a cut contains the rank-klo value and is a
      // needCell. Every other cell maps wholesale into one bucket, so
      // census rows (cn + min/max cent) cover them and the ≤14-cell
      // per-cent detail covers the split candidates at cent grain —
      // the fact is never re-read. x ≡ c/100.0 bit-for-bit (prices
      // are an exact cents grid; the identity the cut interpolation
      // relies on), so bucket membership is exact.
      val bucketCase =
        """CAST(CASE WHEN x > cuts[0] THEN 1 ELSE 0 END
             + CASE WHEN x > cuts[1] THEN 1 ELSE 0 END
             + CASE WHEN x > cuts[2] THEN 1 ELSE 0 END
             + CASE WHEN x > cuts[3] THEN 1 ELSE 0 END
             + CASE WHEN x > cuts[4] THEN 1 ELSE 0 END
             + CASE WHEN x > cuts[5] THEN 1 ELSE 0 END
             + CASE WHEN x > cuts[6] THEN 1 ELSE 0 END AS BIGINT)"""
      val interior = census
        .join(broadcast(needCells), col("cell") === col("tc"),
          "left_anti")
        .crossJoin(broadcast(cuts))
        .select((col("mnc").cast("double") / 100.0).as("x"),
          (col("mxc").cast("double") / 100.0).as("mxx"),
          col("cn").as("cnt"), col("cuts"))
        .select(expr(bucketCase).as("bucket"), col("cnt"),
          col("x").as("mnx"), col("mxx"))
      val boundary = cum.crossJoin(broadcast(cuts))
        .select((col("c").cast("double") / 100.0).as("x"),
          col("cnt"), col("cuts"))
        .select(expr(bucketCase).as("bucket"), col("cnt"),
          col("x").as("mnx"), col("x").as("mxx"))
      interior.unionByName(boundary)
        .groupBy(col("bucket"))
        .agg(sum(col("cnt")).as("n"),
          round(min(col("mnx")), 2).as("lo"),
          round(max(col("mxx")), 2).as("hi"))
        .orderBy(col("bucket"))
    },
    Some("""WITH cuts AS (
              SELECT [quantile_cont(l_extendedprice, 0.125),
                      quantile_cont(l_extendedprice, 0.25),
                      quantile_cont(l_extendedprice, 0.375),
                      quantile_cont(l_extendedprice, 0.5),
                      quantile_cont(l_extendedprice, 0.625),
                      quantile_cont(l_extendedprice, 0.75),
                      quantile_cont(l_extendedprice, 0.875)] AS cs
              FROM lineitem)
            SELECT bucket, CAST(count(*) AS BIGINT) AS n,
              round(min(x), 2) AS lo, round(max(x), 2) AS hi
            FROM (SELECT l_extendedprice AS x,
                    CAST(len(list_filter(cs, c -> l_extendedprice > c))
                      AS BIGINT) AS bucket
                  FROM lineitem, cuts)
            GROUP BY bucket
            ORDER BY bucket NULLS FIRST"""))

  /** Regex field-extraction audit (q_fn_regex): pull the integer `k`
    * out of the JSON-ish props string by pattern, not parser, and audit
    * per event_type — extraction coverage plus exact integer stats.
    * The pattern is RE2-safe (no backtracking constructs), so Java and
    * RE2-family engines agree. */
  val qFnRegex = Q(
    "q_fn_regex",
    (sp, dir) => {
      implicit val s: SparkSession = sp
      implicit val d: String = dir
      val k = regexp_extract(col("props"), "\"k\": ([0-9]+)", 1)
      t("events")
        .select(col("event_type"),
          when(k =!= "", k.cast("long")).as("kv"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_rows"),
          count(col("kv")).as("n_matched"),
          sum(col("kv")).as("sum_k"),
          min(col("kv")).as("min_k"),
          max(col("kv")).as("max_k"))
        .orderBy(col("event_type"))
    },
    Some("""SELECT event_type,
              CAST(count(*) AS BIGINT) AS n_rows,
              CAST(count(kv) AS BIGINT) AS n_matched,
              CAST(sum(kv) AS BIGINT) AS sum_k,
              min(kv) AS min_k, max(kv) AS max_k
            FROM (SELECT event_type,
                    CAST(nullif(regexp_extract(props, '"k": ([0-9]+)', 1),
                         '') AS BIGINT) AS kv
                  FROM events)
            GROUP BY event_type
            ORDER BY event_type NULLS FIRST"""))

  /** Priority-based canonical selection (q_dedup_canonical): duplicate
    * groups share the q_dedup_prefix fingerprint (md5 of the first 8
    * tokens); within each group the SURVIVOR is chosen by POLICY —
    * lowest source index (a stand-in for a crawl priority table), then
    * longest doc, then smallest doc_id — not by arrival accident.
    * The verdict every dedup pipeline needs after clustering: WHICH
    * copy to keep (q_dedup_prefix only reports min-id groups). One
    * window-rank inside hash groups; no joins against the corpus. */
  val qDedupCanonical = Q(
    "q_dedup_canonical",
    (sp, dir) => {
      implicit val s: SparkSession = sp
      implicit val d: String = dir
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("h"))
        .orderBy(col("prio"), col("n_chars").desc, col("doc_id"))
      t("documents")
        .select(col("doc_id"), col("source"), col("n_chars"),
          md5(expr("concat_ws(' ', slice(split(text, ' '), 1, 8))")
            .cast("binary")).as("h"),
          regexp_extract(col("source"), "src([0-9]+)", 1).cast("long")
            .as("prio"))
        .withColumn("rk", row_number().over(w))
        .withColumn("n_dups", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("h"))))
        .filter(col("rk") === 1 && col("n_dups") > 1)
        .select(col("doc_id"), col("source"), col("n_dups"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id, source, n_dups
            FROM (SELECT doc_id, source,
                    row_number() OVER (
                      PARTITION BY md5(array_to_string(
                        string_split(text, ' ')[1:8], ' '))
                      ORDER BY CAST(regexp_extract(source, 'src([0-9]+)', 1)
                                 AS BIGINT),
                        n_chars DESC, doc_id) AS rk,
                    CAST(count(*) OVER (
                      PARTITION BY md5(array_to_string(
                        string_split(text, ' ')[1:8], ' '))) AS BIGINT)
                      AS n_dups
                  FROM documents)
            WHERE rk = 1 AND n_dups > 1
            ORDER BY doc_id NULLS FIRST"""))

  // ---- q_audit_expectations ---------------------------------------------

  /** Declarative expectations audit (q_audit_expectations): the
    * pre-publish data-contract census — a fixed rule catalog evaluated
    * in one pass per table, emitting (rule, n_checked, n_violations,
    * pass) for: key uniqueness, value ranges, null-freedom,
    * and referential integrity. r17: LITERALLY one pass per table now —
    * all of a table's row-predicate rules (plus orders' uniqueness)
    * ride ONE fused aggregate whose 1-row result unpivots to rule rows
    * via stack(), so lineitem is scanned twice (fused agg + FK
    * anti-join probe) and orders twice (fused agg + FK build side)
    * where the per-rule-aggregate form scanned them 6 and 4 times; the
    * FK rule's n_checked reuses the fused aggregate's count instead of
    * a third scan. Map-side combine still applies (one partial agg per
    * scan task), no windows, no collects; the rule table is
    * catalog-sized. The same shape extends to any rule that can be
    * phrased as "count rows where NOT <predicate>". */
  val qAuditExpectations = Q(
    "q_audit_expectations",
    (s, dd) => {
      implicit val is: SparkSession = s
      implicit val id: String = dd
      val orders = t("orders")
      val lineitem = t("lineitem")
      // one aggregate per table: every rule's violation count as a
      // conditional sum, the shared row count once
      val lAgg = lineitem.agg(
        count(lit(1)).as("n"),
        sum((col("l_quantity") < 1 || col("l_quantity") > 50)
          .cast("long")).as("v_qty"),
        sum((col("l_discount") < 0 || col("l_discount") > 0.1)
          .cast("long")).as("v_disc"),
        sum(col("l_shipdate").isNull.cast("long")).as("v_ship"),
        sum((col("l_tax") < 0 || col("l_tax") > 0.1)
          .cast("long")).as("v_tax"))
      val oAgg = orders.agg(
        count(lit(1)).as("n"),
        sum((col("o_totalprice") <= 0).cast("long")).as("v_price"),
        sum((!col("o_orderstatus").isin("O", "F", "P")).cast("long"))
          .as("v_status"),
        (count(lit(1)) - countDistinct(col("o_orderkey"))).as("v_uniq"))
      val fkViol = lineitem.select(col("l_orderkey"))
        .join(orders.select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"), "left_anti")
        .agg(count(lit(1)).as("v_fk"))
      // the FK rule's n_checked is the SAME lineitem count the fused
      // aggregate already computed — join the 1-row violation count in
      // before the unpivot instead of re-counting the table
      val lRules = lAgg.crossJoin(broadcast(fkViol)).select(expr(
        """stack(5,
             'lineitem_qty_range', n, v_qty,
             'lineitem_discount_range', n, v_disc,
             'lineitem_shipdate_not_null', n, v_ship,
             'lineitem_tax_range', n, v_tax,
             'lineitem_fk_orders', n, v_fk)
           AS (rule, n_checked, n_violations)"""))
      val oRules = oAgg.select(expr(
        """stack(3,
             'orders_price_positive', n, v_price,
             'orders_status_domain', n, v_status,
             'orders_pk_unique', n, v_uniq)
           AS (rule, n_checked, n_violations)"""))
      lRules.unionAll(oRules)
        .select(col("rule"), col("n_checked"), col("n_violations"),
          (col("n_violations") === 0).as("pass"))
        .orderBy(col("rule"))
    },
    Some("""WITH rules AS (
            SELECT 'orders_price_positive' AS rule,
              CAST(count(*) AS BIGINT) AS n_checked,
              CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_violations
            FROM orders
            UNION ALL
            SELECT 'orders_status_domain', count(*),
              sum(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
                THEN 1 ELSE 0 END)
            FROM orders
            UNION ALL
            SELECT 'lineitem_qty_range', count(*),
              sum(CASE WHEN l_quantity < 1 OR l_quantity > 50
                THEN 1 ELSE 0 END)
            FROM lineitem
            UNION ALL
            SELECT 'lineitem_discount_range', count(*),
              sum(CASE WHEN l_discount < 0 OR l_discount > 0.1
                THEN 1 ELSE 0 END)
            FROM lineitem
            UNION ALL
            SELECT 'lineitem_shipdate_not_null', count(*),
              sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END)
            FROM lineitem
            UNION ALL
            SELECT 'lineitem_tax_range', count(*),
              sum(CASE WHEN l_tax < 0 OR l_tax > 0.1
                THEN 1 ELSE 0 END)
            FROM lineitem
            UNION ALL
            SELECT 'orders_pk_unique', count(*),
              count(*) - count(DISTINCT o_orderkey)
            FROM orders
            UNION ALL
            SELECT 'lineitem_fk_orders',
              (SELECT count(*) FROM lineitem),
              (SELECT count(*) FROM lineitem l
               WHERE NOT EXISTS (SELECT 1 FROM orders o
                 WHERE o.o_orderkey = l.l_orderkey)))
            SELECT rule, CAST(n_checked AS BIGINT) AS n_checked,
              CAST(n_violations AS BIGINT) AS n_violations,
              n_violations = 0 AS pass
            FROM rules
            ORDER BY rule NULLS FIRST"""))

  // ---- q_audit_uniqueness -----------------------------------------------

  /** Quasi-identifier uniqueness ladder (q_audit_uniqueness): at three
    * generalization levels of the (source, lang, length) QI — exact
    * length, length÷100, then drop lang and length÷1000 — how many QI
    * cells exist, how small is the smallest (the k-anonymity floor k),
    * and what fraction of cells are singletons (the re-identification
    * risk the k-anon/l-div audits summarize per-cell). ONE pass: each
    * row stacks into its three level keys, one (level, key) count,
    * then a 3-row rollup — no per-level rescan. */
  val qAuditUniqueness = Q(
    "q_audit_uniqueness",
    (s, d) => {
      implicit val sp: SparkSession = s
      implicit val dd: String = d
      val keyed = t("documents").select(expr(
        """stack(3,
             1L, concat_ws('|', source, lang, CAST(n_chars AS STRING)),
             2L, concat_ws('|', source, lang,
               CAST(n_chars DIV 100 AS STRING)),
             3L, concat_ws('|', source,
               CAST(n_chars DIV 1000 AS STRING)))""")
        .as(Seq("lvl", "qikey")))
      keyed.groupBy(col("lvl"), col("qikey"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("lvl"))
        .agg(count(lit(1)).as("n_cells"),
          min(col("cnt")).as("k_floor"),
          sum((col("cnt") === 1).cast("long")).as("n_singletons"),
          sum(col("cnt")).as("n_docs"))
        .select(col("lvl").as("level"), col("n_cells"), col("k_floor"),
          col("n_singletons"),
          round(expr(
            "CAST(n_singletons AS DOUBLE) / n_docs"), 6)
            .as("singleton_frac"))
        .orderBy(col("level"))
    },
    Some("""WITH keyed AS (
              SELECT lvl,
                CASE lvl
                  WHEN 1 THEN concat_ws('|', source, lang,
                    CAST(n_chars AS VARCHAR))
                  WHEN 2 THEN concat_ws('|', source, lang,
                    CAST(n_chars // 100 AS VARCHAR))
                  ELSE concat_ws('|', source,
                    CAST(n_chars // 1000 AS VARCHAR))
                END AS qikey
              FROM documents CROSS JOIN
                (SELECT unnest([1, 2, 3]) AS lvl)),
            cells AS (
              SELECT lvl, qikey, CAST(count(*) AS BIGINT) AS cnt
              FROM keyed GROUP BY lvl, qikey)
            SELECT CAST(lvl AS BIGINT) AS level,
              CAST(count(*) AS BIGINT) AS n_cells,
              CAST(min(cnt) AS BIGINT) AS k_floor,
              CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT)
                AS n_singletons,
              round(CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END)
                  AS DOUBLE) / sum(cnt), 6) AS singleton_frac
            FROM cells
            GROUP BY lvl
            ORDER BY level NULLS FIRST"""))

  val all: Seq[Q] = Seq(qAggEquidepth, qFnRegex, qDedupCanonical,
    qAuditExpectations, qAuditUniqueness)
}
