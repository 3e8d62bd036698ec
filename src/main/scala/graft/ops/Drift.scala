package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Distribution-drift and fuzzy-matching audits: PSI between time
  * cohorts, per-source duplication rate, and typo-candidate detection
  * via blocked edit distance. */
object Drift {

  private def t(n: String)(implicit s: SparkSession, d: String) =
    Tables.t(s, d, n)

  /** Population stability index (q_stats_psi) between the first and
    * second half of the event stream (by median timestamp), over 10
    * fixed-width value bins. Counts are exact integers; the PSI terms
    * are fixed double expressions on (p, q) ratios with Laplace
    * smoothing, so both engines compute identical doubles. One scan,
    * one 10-row aggregate — the drift monitor shape that runs per
    * ingest batch at fleet scale. */
  val qStatsPsi = Q(
    "q_stats_psi",
    (sp, dir) => {
      implicit val s: SparkSession = sp
      implicit val d: String = dir
      val ev = t("events")
      // epoch-half split on the exact midpoint event (by us, id order)
      val mid = ev.select(
        unix_micros(col("ts").cast("timestamp")).as("us"))
        .agg(expr("percentile(us, 0.5)").as("mid_us"))
      val binned = ev
        .crossJoin(broadcast(mid))
        .select(
          (unix_micros(col("ts").cast("timestamp")) <= col("mid_us"))
            .as("is_ref"),
          least(lit(9L), floor(col("value") / 33.0).cast("long"))
            .as("bin"))
        .groupBy(col("bin"))
        .agg(sum(when(col("is_ref"), 1L).otherwise(0L)).as("na"),
          sum(when(col("is_ref"), 0L).otherwise(1L)).as("nb"))
      val tot = binned.agg(sum(col("na")).as("ta"), sum(col("nb")).as("tb"))
      binned
        .crossJoin(broadcast(tot))
        .select(col("bin"), col("na"), col("nb"),
          (((col("na") + 1).cast("double") / (col("ta") + 10)) -
            ((col("nb") + 1).cast("double") / (col("tb") + 10))).as("dp"),
          log(((col("na") + 1).cast("double") / (col("ta") + 10)) /
            ((col("nb") + 1).cast("double") / (col("tb") + 10))).as("lr"))
        .select(col("bin"), col("na"), col("nb"),
          round(col("dp") * col("lr"), 6).as("psi_term"))
        .orderBy(col("bin"))
    },
    Some("""WITH ev AS (
              SELECT value, epoch_us(ts) AS us FROM events),
            mid AS (
              SELECT quantile_cont(us, 0.5) AS mid_us FROM ev),
            binned AS (
              SELECT least(9, CAST(floor(value / 33.0) AS BIGINT)) AS bin,
                CAST(sum(CASE WHEN us <= mid_us THEN 1 ELSE 0 END)
                  AS BIGINT) AS na,
                CAST(sum(CASE WHEN us <= mid_us THEN 0 ELSE 1 END)
                  AS BIGINT) AS nb
              FROM ev, mid GROUP BY bin),
            tot AS (
              SELECT CAST(sum(na) AS BIGINT) AS ta,
                CAST(sum(nb) AS BIGINT) AS tb
              FROM binned)
            SELECT bin, na, nb,
              round(((CAST(na + 1 AS DOUBLE) / (ta + 10)) -
                     (CAST(nb + 1 AS DOUBLE) / (tb + 10))) *
                    ln((CAST(na + 1 AS DOUBLE) / (ta + 10)) /
                       (CAST(nb + 1 AS DOUBLE) / (tb + 10))), 6)
                AS psi_term
            FROM binned CROSS JOIN tot
            ORDER BY bin NULLS FIRST"""))

  /** Per-source duplication rate (q_text_dup_ratio): fraction of each
    * source's docs whose 8-token prefix fingerprint occurs more than
    * once corpus-wide — the per-crawl health metric that decides which
    * source needs a dedup pass. Fingerprint df is a hash aggregate;
    * the rate is exact-integer until one final division. */
  val qTextDupRatio = Q(
    "q_text_dup_ratio",
    (sp, dir) => {
      implicit val s: SparkSession = sp
      implicit val d: String = dir
      val keyed = t("documents")
        .select(col("doc_id"), col("source"),
          md5(expr("concat_ws(' ', slice(split(text, ' '), 1, 8))")
            .cast("binary")).as("h"))
      val df = keyed.groupBy(col("h").as("dh"))
        .agg(count(lit(1)).as("df"))
      keyed
        .join(df, col("h") === col("dh"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("df") > 1, 1L).otherwise(0L)).as("n_dup"))
        .select(col("source"), col("n_docs"), col("n_dup"),
          round(col("n_dup").cast("double") / col("n_docs"), 6)
            .as("dup_ratio"))
        .orderBy(col("source"))
    },
    Some("""WITH keyed AS (
              SELECT doc_id, source,
                md5(array_to_string(string_split(text, ' ')[1:8], ' '))
                  AS h
              FROM documents),
            df AS (
              SELECT h AS dh, CAST(count(*) AS BIGINT) AS df
              FROM keyed GROUP BY h)
            SELECT source,
              CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(CASE WHEN df > 1 THEN 1 ELSE 0 END) AS BIGINT)
                AS n_dup,
              round(CAST(sum(CASE WHEN df > 1 THEN 1 ELSE 0 END)
                AS DOUBLE) / count(*), 6) AS dup_ratio
            FROM keyed JOIN df ON h = dh
            GROUP BY source
            ORDER BY source NULLS FIRST"""))

  /** Typo-candidate pairs (q_text_fuzzy_match): distinct corpus terms
    * within edit distance 2 of each other, candidate-blocked on the
    * first character + a ±2 length band — the fuzzy join is an
    * EQUI-join on the block key with levenshtein as a residual filter,
    * never an all-pairs distance matrix. Vocabulary-sized throughout.
    * (First-char blocking assumes leading-character typos are rare —
    * the classic trade; the spec proves recall on a typo fixture.) */
  val qTextFuzzyMatch = Q(
    "q_text_fuzzy_match",
    (sp, dir) => {
      implicit val s: SparkSession = sp
      implicit val d: String = dir
      val vocab = t("documents")
        .select(explode(split(col("text"), " ")).as("term"))
        .groupBy(col("term")).agg(count(lit(1)).as("freq"))
        .withColumn("blk", substring(col("term"), 1, 1))
      val left = vocab.select(col("term").as("a"), col("freq").as("fa"),
        col("blk"))
      val right = vocab.select(col("term").as("b"), col("freq").as("fb"),
        col("blk").as("rblk"))
      left
        .join(right, col("blk") === col("rblk") &&
          col("a") < col("b") &&
          abs(length(col("a")) - length(col("b"))) <= 2)
        .filter(levenshtein(col("a"), col("b")) <= 2)
        .select(col("a"), col("b"), col("fa"), col("fb"))
        .orderBy(col("a"), col("b"))
    },
    Some("""WITH vocab AS (
              SELECT term, CAST(count(*) AS BIGINT) AS freq,
                substr(term, 1, 1) AS blk
              FROM (SELECT unnest(string_split(text, ' ')) AS term
                    FROM documents)
              GROUP BY term)
            SELECT l.term AS a, r.term AS b, l.freq AS fa, r.freq AS fb
            FROM vocab l JOIN vocab r
              ON l.blk = r.blk AND l.term < r.term
             AND abs(len(l.term) - len(r.term)) <= 2
            WHERE levenshtein(l.term, r.term) <= 2
            ORDER BY a NULLS FIRST, b NULLS FIRST"""))

  val all: Seq[Q] = Seq(qStatsPsi, qTextDupRatio, qTextFuzzyMatch)
}
