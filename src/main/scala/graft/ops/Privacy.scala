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

  val all: Seq[Q] = Seq(qAuditLdiv, qAuditDpHist)
}
