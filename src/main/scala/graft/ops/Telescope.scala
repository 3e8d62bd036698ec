package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** T1 calibration path (SURVEY.md §2.1, md:79-98): per-pixel threshold
  * scan → DAC set → self-trigger cut → heatmap/histogram rendering data.
  *
  * Pixel coordinates derive deterministically from `events` the same way
  * the frame words do (Decode.scala): pix_row = event_id % 16,
  * pix_col = user_id % 16 — a 16×16 matrix per ETROC (md:85, md:334).
  *
  * Scale shape: every query is a two-phase hash aggregate over the fact
  * stream; the per-pixel threshold table is 256 rows → broadcast back
  * against the stream for the trigger cut (never a shuffle of the facts).
  */
object Telescope {

  private def pixels(s: SparkSession, d: String): DataFrame =
    Tables.t(s, d, "events")
      .withColumn("pix_row", expr("event_id % 16"))
      .withColumn("pix_col", expr("user_id % 16"))

  private val pixelsCte =
    """WITH pixels AS (
         SELECT event_id, ts, user_id, event_type, value,
                event_id % 16 AS pix_row, user_id % 16 AS pix_col
         FROM events)"""

  /** Threshold scan (md:84-86): per-pixel baseline + noise width. */
  val qThresholdScan = Q(
    "q_threshold_scan",
    (s, d) =>
      pixels(s, d)
        .groupBy(col("pix_row"), col("pix_col"))
        .agg(
          round(avg(col("value")), 6).as("baseline"),
          round(stddev_samp(col("value")), 6).as("noise_width"),
          count(lit(1)).as("n_samples"))
        .orderBy(col("pix_row"), col("pix_col")),
    Some(s"""$pixelsCte
             SELECT pix_row, pix_col,
               round(avg(value), 6) AS baseline,
               round(stddev_samp(value), 6) AS noise_width,
               count(*) AS n_samples
             FROM pixels GROUP BY pix_row, pix_col
             ORDER BY pix_row NULLS FIRST, pix_col NULLS FIRST"""))

  /** DAC = baseline + offset (md:87, offset = 30 from config md:413). */
  val qThresholdSet = Q(
    "q_threshold_set",
    (s, d) =>
      pixels(s, d)
        .groupBy(col("pix_row"), col("pix_col"))
        .agg(round(avg(col("value")), 6).as("baseline"))
        .select(
          col("pix_row"), col("pix_col"), col("baseline"),
          (floor(col("baseline")).cast("long") + 30).as("dac"))
        .orderBy(col("pix_row"), col("pix_col")),
    Some(s"""$pixelsCte
             SELECT pix_row, pix_col, baseline,
               CAST(floor(baseline) AS BIGINT) + 30 AS dac
             FROM (SELECT pix_row, pix_col, round(avg(value), 6) AS baseline
                   FROM pixels GROUP BY pix_row, pix_col)
             ORDER BY pix_row NULLS FIRST, pix_col NULLS FIRST"""))

  /** Threshold reuse (md:22, md:87): calibrate on the first half of the
    * stream ("previous run log"), apply to the second half — a lookup
    * join against the persisted scan instead of a rescan. */
  val qThresholdReuse = Q(
    "q_threshold_reuse",
    (s, d) => {
      val p = pixels(s, d)
      val prev = p.filter(col("event_id") % 2 === 0)
        .groupBy(col("pix_row"), col("pix_col"))
        .agg((floor(round(avg(col("value")), 6)).cast("long") + 30).as("dac"))
      val cur = p.filter(col("event_id") % 2 === 1)
      cur.join(broadcast(prev), Seq("pix_row", "pix_col"))
        .groupBy(col("pix_row"), col("pix_col"), col("dac"))
        .agg(count(when(col("value") > col("dac"), 1)).as("n_over"))
        .orderBy(col("pix_row"), col("pix_col"))
    },
    Some(s"""$pixelsCte
             SELECT c.pix_row, c.pix_col, p.dac,
               count(CASE WHEN c.value > p.dac THEN 1 END) AS n_over
             FROM (SELECT * FROM pixels WHERE event_id % 2 = 1) c
             JOIN (SELECT pix_row, pix_col,
                     CAST(floor(round(avg(value), 6)) AS BIGINT) + 30 AS dac
                   FROM pixels WHERE event_id % 2 = 0
                   GROUP BY pix_row, pix_col) p
               USING (pix_row, pix_col)
             GROUP BY c.pix_row, c.pix_col, p.dac
             ORDER BY c.pix_row NULLS FIRST, c.pix_col NULLS FIRST"""))

  /** Self-trigger (md:343-348): emit a hit iff signal > per-pixel DAC;
    * record TOA/TOT/row/col. Thresholds broadcast back over the stream. */
  val qSelfTrigger = Q(
    "q_self_trigger",
    (s, d) => {
      val p = pixels(s, d)
      val dacs = p.groupBy(col("pix_row"), col("pix_col"))
        .agg((floor(round(avg(col("value")), 6)).cast("long") + 30).as("dac"))
      p.join(broadcast(dacs), Seq("pix_row", "pix_col"))
        .filter(col("value") > col("dac"))
        .select(
          col("event_id"), col("pix_row"), col("pix_col"),
          expr("event_id % 1024").as("toa"),
          expr("user_id % 512").as("tot"),
          col("value"), col("dac"))
        .orderBy(col("event_id"))
    },
    Some(s"""$pixelsCte
             SELECT event_id, pix_row, pix_col,
               event_id % 1024 AS toa, user_id % 512 AS tot, value, dac
             FROM pixels
             JOIN (SELECT pix_row, pix_col,
                     CAST(floor(round(avg(value), 6)) AS BIGINT) + 30 AS dac
                   FROM pixels GROUP BY pix_row, pix_col) t
               USING (pix_row, pix_col)
             WHERE value > dac
             ORDER BY event_id NULLS FIRST"""))

  /** Heatmap data (md:91-93): hit count + mean amplitude per pixel cell. */
  val qHeatmap = Q(
    "q_heatmap",
    (s, d) =>
      pixels(s, d)
        .filter(col("value") > 100.0)
        .groupBy(col("pix_row"), col("pix_col"))
        .agg(
          count(lit(1)).as("n_hits"),
          round(avg(col("value")), 6).as("mean_amp"))
        .orderBy(col("pix_row"), col("pix_col")),
    Some(s"""$pixelsCte
             SELECT pix_row, pix_col, count(*) AS n_hits,
               round(avg(value), 6) AS mean_amp
             FROM pixels WHERE value > 100.0
             GROUP BY pix_row, pix_col
             ORDER BY pix_row NULLS FIRST, pix_col NULLS FIRST"""))

  /** Distribution histogram (md:93): fixed-width buckets of amplitude. */
  val qHistogram = Q(
    "q_histogram",
    (s, d) =>
      Tables.t(s, d, "events")
        .groupBy(floor(col("value") / 25.0).cast("long").as("bucket"))
        .agg(
          count(lit(1)).as("n"),
          round(sum(col("value")), 2).as("sum_value"))
        .orderBy(col("bucket")),
    Some("""SELECT CAST(floor(value / 25.0) AS BIGINT) AS bucket,
              count(*) AS n, round(sum(value), 2) AS sum_value
            FROM events GROUP BY bucket
            ORDER BY bucket NULLS FIRST"""))

  val all: Seq[Q] = Seq(
    qThresholdScan, qThresholdSet, qThresholdReuse, qSelfTrigger,
    qHeatmap, qHistogram)
}
