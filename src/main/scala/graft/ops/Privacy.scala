package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Privacy-audit operators over the customer/events star: l-diversity
  * (the distinct-sensitive-values companion to q_audit_kanon's class
  * sizes) and a differentially-private histogram release with
  * seeded discrete-geometric noise. Both are grid-bounded rollups —
  * QI classes and event types, never raw rows — so the shapes ride
  * one hash aggregate each at any corpus size. */
object Privacy {

  private def cust(s: SparkSession, d: String): DataFrame =
    Tables.t(s, d, "customer")

  // ---- q_audit_ldiv -----------------------------------------------------

  /** l-diversity census (q_audit_ldiv): for every quasi-identifier
    * class (nation × account-balance band) the number of DISTINCT
    * sensitive values (market segment) present — k-anonymity bounds
    * re-identification, l-diversity bounds attribute disclosure: a
    * class where every member shares one segment leaks the segment
    * even when the class is large. Bands come from exact integer
    * cents; the +100000 shift keeps the band division on non-negative
    * operands, where Spark's truncating `div` and DuckDB's flooring
    * `//` agree (acctbal can be negative, and the two engines round
    * negative integer division in opposite directions). One
    * QI-grid-bounded hash aggregate; l < 3 flags the leaky classes. */
  val qAuditLdiv = Q(
    "q_audit_ldiv",
    (s, d) => {
      cust(s, d)
        .select(col("c_nationkey"),
          expr("""(CAST(floor(c_acctbal * 100 + 0.5D) AS BIGINT)
                   + 100000L) div 100000L - 1L""").as("bal_band"),
          col("c_mktsegment"))
        .groupBy(col("c_nationkey"), col("bal_band"))
        .agg(count(lit(1)).as("class_size"),
          countDistinct(col("c_mktsegment")).as("l_div"))
        .withColumn("at_risk", col("l_div") < 3)
        .orderBy(col("c_nationkey"), col("bal_band"))
    },
    Some("""SELECT c_nationkey,
              (CAST(floor(c_acctbal * 100 + 0.5e0) AS BIGINT)
                + 100000) // 100000 - 1 AS bal_band,
              CAST(count(*) AS BIGINT) AS class_size,
              CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS l_div,
              count(DISTINCT c_mktsegment) < 3 AS at_risk
            FROM customer
            GROUP BY 1, 2
            ORDER BY c_nationkey NULLS FIRST, bal_band NULLS FIRST"""))

  // ---- q_audit_dp_hist --------------------------------------------------

  /** Truncated two-sided geometric noise thresholds for ε = 1: the
    * discrete analogue of Laplace noise (the standard integer DP
    * mechanism), pmf(k) ∝ e^{-|k|} truncated to |k| ≤ 16. The inverse
    * CDF is precomputed here as INTEGER thresholds on the u32 hash
    * scale and embedded as the same literal CASE chain in both
    * engines, so the sampled noise is exact integer arithmetic —
    * no ln/exp runs inside either engine. */
  private[graft] val dpNoiseCase: String = {
    val alpha = math.exp(-1.0)
    val b = 16
    val weights = (-b to b).map(k => math.pow(alpha, math.abs(k)))
    val z = weights.sum
    val cums = weights.scanLeft(0.0)(_ + _).tail.map(_ / z)
    val thresholds = cums.map(c =>
      math.min(4294967296.0, math.floor(c * 4294967296.0)).toLong)
    // suffix-free integer literals: valid and integer-typed in BOTH
    // Spark SQL and DuckDB (the CAST pins the branch type)
    val branches = (-b until b).zip(thresholds).map { case (k, t) =>
      s"WHEN u < $t THEN CAST($k AS BIGINT)"
    }
    s"CASE ${branches.mkString(" ")} ELSE CAST($b AS BIGINT) END"
  }

  /** DP histogram release (q_audit_dp_hist): per-event-type counts
    * with ε = 1 discrete-geometric noise and a zero floor — the
    * noisy-counts release a data clearinghouse publishes instead of
    * raw frequencies. The noise draw is SEEDED (md5 of the category
    * label → u32 → shared inverse-CDF threshold chain), which makes
    * the release reproducible for the oracle compare; a production
    * release would draw fresh randomness per publication, everything
    * else — sensitivity-1 counting query, integer mechanism,
    * post-processed floor — is the real shape. Grid-bounded: one
    * corpus aggregate, then k category rows. */
  val qAuditDpHist = Q(
    "q_audit_dp_hist",
    (s, d) => {
      Tables.t(s, d, "events")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_true"))
        .withColumn("u", expr(
          """CAST(conv(substring(md5(CAST(event_type AS BINARY)), 1, 8),
               16, 10) AS BIGINT)"""))
        .withColumn("noise", expr(dpNoiseCase))
        .select(col("event_type"), col("n_true"), col("noise"),
          greatest(lit(0L), col("n_true") + col("noise")).as("n_dp"))
        .orderBy(col("event_type"))
    },
    Some(s"""WITH g AS (
              SELECT event_type, CAST(count(*) AS BIGINT) AS n_true
              FROM events GROUP BY event_type),
            drawn AS (
              SELECT event_type, n_true,
                CAST('0x' || substr(md5(event_type), 1, 8) AS BIGINT)
                  AS u
              FROM g),
            noised AS (
              SELECT event_type, n_true, $dpNoiseCase AS noise
              FROM drawn)
            SELECT event_type, n_true, noise,
              greatest(0, n_true + noise) AS n_dp
            FROM noised
            ORDER BY event_type NULLS FIRST"""))

  // ---- q_audit_tcloseness -----------------------------------------------

  /** t-closeness audit (q_audit_tcloseness): the third rung of the
    * release-audit ladder after q_audit_kanon / q_audit_ldiv — a class
    * can be large (k-anon) and diverse (l-div) yet still leak because
    * its SENSITIVE-VALUE DISTRIBUTION differs from the corpus (e.g. a
    * class holding mostly top-decile balances). t per class is the
    * ordered-domain Earth-Mover's Distance between the class and
    * global balance-decile distributions: EMD = (1/(m−1)) Σ_j
    * |P_cum(j) − Q_cum(j)|, made integer-exact by cross-multiplying
    * the two cumulative rationals (|cg·N − gcum·n_g| in
    * DECIMAL(38,0)/HUGEINT) and integer-dividing once at the end —
    * no float anywhere. Deciles are fixed cent bands (+100000 shift
    * keeps the division non-negative, the q_audit_ldiv rule). All
    * joins are grid-bounded: QI classes × 9 evaluation points, never
    * raw rows — one scan then O(classes) work at any corpus size. */
  val qAuditTcloseness = Q(
    "q_audit_tcloseness",
    (s, d) => {
      val base = cust(s, d).select(
        col("c_mktsegment").as("seg"), col("c_nationkey").as("nat"),
        expr("""(CAST(floor(c_acctbal * 100 + 0.5D) AS BIGINT)
                 + 100000L) div 110000L""").as("sbin"))
      val cb = base.groupBy(col("seg"), col("nat"), col("sbin"))
        .agg(count(lit(1)).as("cnt"))
      val cl = cb.groupBy(col("seg"), col("nat"))
        .agg(sum(col("cnt")).as("n_g"))
      val gb = cb.groupBy(col("sbin")).agg(sum(col("cnt")).as("gcnt"))
      val nTot = cl.agg(sum(col("n_g")).as("nn"))
      val js = s.range(9).select(col("id").as("j"))
      val cg = cb.crossJoin(broadcast(js))
        .filter(col("sbin") <= col("j"))
        .groupBy(col("seg"), col("nat"), col("j"))
        .agg(sum(col("cnt")).as("cg"))
      val gg = gb.crossJoin(broadcast(js))
        .filter(col("sbin") <= col("j"))
        .groupBy(col("j")).agg(sum(col("gcnt")).as("gcum"))
      val perClass = cl.crossJoin(broadcast(js))
        .join(cg, Seq("seg", "nat", "j"), "left")
        .withColumn("cg", coalesce(col("cg"), lit(0L)))
        .join(broadcast(gg), "j")
        .crossJoin(broadcast(nTot))
        .withColumn("term", abs(expr(
          """CAST(cg AS DECIMAL(38,0)) * nn
             - CAST(gcum AS DECIMAL(38,0)) * n_g""")))
        .groupBy(col("seg"), col("nat"))
        .agg(first(col("n_g")).as("n_g"), first(col("nn")).as("nn"),
          sum(col("term")).as("emd"))
        .withColumn("t_micro", expr(
          """CAST((1000000 * emd)
               div (CAST(n_g AS DECIMAL(38,0)) * nn * 9) AS BIGINT)"""))
      perClass.groupBy(col("seg"))
        .agg(count(lit(1)).as("n_classes"),
          max(col("t_micro")).as("max_t_micro"),
          sum(when(col("t_micro") > 250000, 1L).otherwise(0L))
            .as("n_violations"),
          sum(when(col("t_micro") > 250000, col("n_g")).otherwise(0L))
            .as("rows_at_risk"),
          sum(col("n_g")).as("n_rows"))
        .select(col("seg").as("c_mktsegment"), col("n_classes"),
          col("max_t_micro"), col("n_violations"), col("rows_at_risk"),
          round(expr("CAST(rows_at_risk AS DOUBLE) / n_rows"), 6)
            .as("risk_frac"))
        .orderBy(col("c_mktsegment"))
    },
    Some("""WITH base AS (
              SELECT c_mktsegment AS seg, c_nationkey AS nat,
                (CAST(floor(c_acctbal * 100 + 0.5e0) AS BIGINT)
                  + 100000) // 110000 AS sbin
              FROM customer),
            cb AS (
              SELECT seg, nat, sbin, CAST(count(*) AS BIGINT) AS cnt
              FROM base GROUP BY seg, nat, sbin),
            cl AS (
              SELECT seg, nat, CAST(sum(cnt) AS BIGINT) AS n_g
              FROM cb GROUP BY seg, nat),
            gb AS (
              SELECT sbin, CAST(sum(cnt) AS BIGINT) AS gcnt
              FROM cb GROUP BY sbin),
            tot AS (SELECT CAST(sum(n_g) AS BIGINT) AS nn FROM cl),
            js AS (SELECT unnest(range(0, 9)) AS j),
            cg AS (
              SELECT seg, nat, j, CAST(sum(cnt) AS BIGINT) AS cg
              FROM cb, js WHERE sbin <= j
              GROUP BY seg, nat, j),
            gg AS (
              SELECT j, CAST(sum(gcnt) AS BIGINT) AS gcum
              FROM gb, js WHERE sbin <= j
              GROUP BY j),
            perclass AS (
              SELECT cl.seg, cl.nat, any_value(cl.n_g) AS n_g,
                any_value(tot.nn) AS nn,
                sum(abs(CAST(coalesce(cg.cg, 0) AS HUGEINT) * tot.nn
                  - CAST(gg.gcum AS HUGEINT) * cl.n_g)) AS emd
              FROM cl
              CROSS JOIN js
              LEFT JOIN cg ON cg.seg = cl.seg AND cg.nat = cl.nat
                AND cg.j = js.j
              JOIN gg ON gg.j = js.j
              CROSS JOIN tot
              GROUP BY cl.seg, cl.nat),
            tmicro AS (
              SELECT seg, nat, n_g,
                CAST((1000000 * emd)
                  // (CAST(n_g AS HUGEINT) * nn * 9) AS BIGINT) AS t_micro
              FROM perclass)
            SELECT seg AS c_mktsegment,
              CAST(count(*) AS BIGINT) AS n_classes,
              CAST(max(t_micro) AS BIGINT) AS max_t_micro,
              CAST(sum(CASE WHEN t_micro > 250000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_violations,
              CAST(sum(CASE WHEN t_micro > 250000 THEN n_g ELSE 0 END)
                AS BIGINT) AS rows_at_risk,
              round(CAST(sum(CASE WHEN t_micro > 250000 THEN n_g
                  ELSE 0 END) AS DOUBLE) / sum(n_g), 6) AS risk_frac
            FROM tmicro
            GROUP BY seg
            ORDER BY c_mktsegment NULLS FIRST"""))

  val all: Seq[Q] = Seq(qAuditLdiv, qAuditDpHist, qAuditTcloseness)
}
