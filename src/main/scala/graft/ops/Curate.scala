package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Corpus-curation operators a training-data pipeline runs between
  * dedup and packing: building a sampled training mix to target
  * per-source weights, and PII redaction. Both are single-scan shapes —
  * the per-source planning table is bytes-sized and broadcast, the
  * per-row work is scan-local, so the only shuffle is the final small
  * aggregate. That is the 100 TB contract: nothing here grows with the
  * corpus except the scan itself. */
object Curate {

  /** Training-mix sampling (q_mix_sample): given per-source target
    * weights and a global token budget (half the corpus), compute each
    * source's sampling rate — rate_s = min(1, w_s/W · T / tokens_s) —
    * and keep documents by a DETERMINISTIC hash gate
    * (doc_id · 2654435761 mod 1e6 < rate · 1e6), so the sample is
    * reproducible run-to-run and engine-to-engine (no RNG, no
    * sample()). Weights are arithmetic in the source id so the oracle
    * derives them too. Shape: tiny per-source agg → broadcast rate
    * table → scan-local gate → small final agg. Over-represented
    * sources are down-sampled toward the target mix; sources whose
    * target exceeds their inventory cap at rate 1 (their shortfall
    * stays visible in achieved_frac — a silent re-normalize would hide
    * data starvation). */
  val qMixSample = Q(
    "q_mix_sample",
    (s, d) => {
      val docs = Tables.t(s, d, "documents")
      // target weight 1..3 by source number, normalized over sources
      val perSource = docs.groupBy(col("source"))
        .agg(sum(col("n_chars")).as("toks"),
          count(lit(1)).as("n_docs"))
        .withColumn("w", expr(
          "CAST(1 + CAST(regexp_extract(source, '([0-9]+)', 1) " +
            "AS BIGINT) % 3 AS DOUBLE)"))
      val totals = perSource.agg(
        sum(col("toks")).as("total_toks"), sum(col("w")).as("total_w"))
      val rates = perSource.crossJoin(broadcast(totals))
        .withColumn("rate", expr(
          "least(CAST(1.0 AS DOUBLE), " +
            "((w / total_w) * (total_toks * 0.5)) / toks)"))
        .select(col("source"), col("w"), col("total_w"), col("rate"))
      docs
        .join(broadcast(rates), Seq("source"))
        .filter(expr(
          "(doc_id * 2654435761) % 1000000 < floor(rate * 1000000)"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("kept_docs"),
          sum(col("n_chars")).as("kept_toks"),
          round(first(col("rate")), 6).as("rate"),
          round(first(col("w")) / first(col("total_w")), 6)
            .as("target_frac"))
        .orderBy(col("source"))
    },
    Some("""WITH per_source AS (
              SELECT source, CAST(sum(n_chars) AS BIGINT) AS toks,
                CAST(1 + CAST(regexp_extract(source, '([0-9]+)', 1)
                       AS BIGINT) % 3 AS DOUBLE) AS w
              FROM documents GROUP BY source),
            totals AS (
              SELECT CAST(sum(toks) AS BIGINT) AS total_toks,
                sum(w) AS total_w
              FROM per_source),
            rates AS (
              SELECT source, w, total_w,
                least(CAST(1.0 AS DOUBLE),
                  ((w / total_w) * (total_toks * 0.5)) / toks) AS rate
              FROM per_source, totals)
            SELECT d.source, count(*) AS kept_docs,
              CAST(sum(d.n_chars) AS BIGINT) AS kept_toks,
              round(any_value(r.rate), 6) AS rate,
              round(any_value(r.w) / any_value(r.total_w), 6)
                AS target_frac
            FROM documents d JOIN rates r ON d.source = r.source
            WHERE (d.doc_id * 2654435761) % 1000000
                  < floor(r.rate * 1000000)
            GROUP BY d.source
            ORDER BY d.source NULLS FIRST"""))

  /** Deterministic reservoir-style sample (q_sample_reservoir): a
    * fixed-size uniform sample WITHOUT a global sort or RNG — rank
    * every doc by md5(doc_id) and keep the k smallest, the
    * distributed stand-in for reservoir sampling (same guarantee: any
    * k-subset equally likely under a uniform hash, reproducible
    * run-to-run). Plans as TakeOrderedAndProject: each partition keeps
    * a k-heap, the driver merges k·partitions rows — no shuffle of
    * the corpus, the shape that survives 100 TB. */
  val qSampleReservoir = Q(
    "q_sample_reservoir",
    (s, d) =>
      Tables.t(s, d, "documents")
        .select(col("doc_id"), col("source"),
          md5(col("doc_id").cast("string").cast("binary")).as("rk"))
        .orderBy(col("rk"), col("doc_id"))
        .limit(100)
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id")),
    Some("""SELECT doc_id, source FROM (
              SELECT doc_id, source, md5(CAST(doc_id AS VARCHAR)) AS rk
              FROM documents
              ORDER BY rk NULLS FIRST, doc_id NULLS FIRST
              LIMIT 100) x
            ORDER BY doc_id NULLS FIRST"""))

  /** PII redaction (q_pii_redact): scrub emails, phone numbers, and
    * 16-digit card numbers with anchored regex replaces, reporting
    * per-doc match counts and the redacted text's md5 — the audit
    * record a compliance pass needs. The corpus is synthetic, so each
    * doc plants its own deterministic PII first (the fixture half, like
    * the WAV/BMP/PNG decoders); the patterns themselves are the real
    * operator. Pure per-row expressions — codegen'd, no UDF, no
    * shuffle before the output sort. */
  val qPiiRedact = Q(
    "q_pii_redact",
    (s, d) => {
      val emailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
      val phoneRe = "\\+?[0-9]{1,2}-555-[0-9]{4}"
      val cardRe = "[0-9]{16}"
      Tables.t(s, d, "documents")
        .withColumn("planted", expr(
          """concat(text, ' contact user', doc_id,
               '@mail.example.com',
               CASE WHEN doc_id % 3 = 0
                    THEN concat(' cc ', doc_id % 10, '111111111111111')
                    ELSE '' END,
               ' tel +1-555-', lpad(CAST(doc_id % 10000 AS STRING),
                                    4, '0'))"""))
        .select(
          col("doc_id"),
          regexp_count(col("planted"), lit(emailRe)).cast("long")
            .as("n_emails"),
          regexp_count(col("planted"), lit(phoneRe)).cast("long")
            .as("n_phones"),
          regexp_count(col("planted"), lit(cardRe)).cast("long")
            .as("n_cards"),
          md5(regexp_replace(
            regexp_replace(
              regexp_replace(col("planted"), lit(emailRe), lit("<EMAIL>")),
              lit(cardRe), lit("<CARD>")),
            lit(phoneRe), lit("<PHONE>")).cast("binary")).as("redacted_md5"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id,
              CAST(len(regexp_extract_all(planted,
                '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}'))
                AS BIGINT) AS n_emails,
              CAST(len(regexp_extract_all(planted,
                '\+?[0-9]{1,2}-555-[0-9]{4}'))
                AS BIGINT) AS n_phones,
              CAST(len(regexp_extract_all(planted, '[0-9]{16}'))
                AS BIGINT) AS n_cards,
              md5(regexp_replace(
                    regexp_replace(
                      regexp_replace(planted,
                        '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}',
                        '<EMAIL>', 'g'),
                      '[0-9]{16}', '<CARD>', 'g'),
                    '\+?[0-9]{1,2}-555-[0-9]{4}', '<PHONE>', 'g'))
                AS redacted_md5
            FROM (SELECT doc_id,
                    concat(text, ' contact user', doc_id,
                      '@mail.example.com',
                      CASE WHEN doc_id % 3 = 0
                           THEN concat(' cc ', doc_id % 10,
                                       '111111111111111')
                           ELSE '' END,
                      ' tel +1-555-',
                      lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'))
                      AS planted
                  FROM documents)
            ORDER BY doc_id NULLS FIRST"""))

  /** Fixed-window document chunking (q_doc_chunks): split each doc's
    * token stream into 40-token windows advancing by 30 (10-token
    * overlap) — the context-window prep step for embedding/RAG indexing
    * and long-doc training. Pure per-row array expressions
    * (split → sequence explode → slice), so chunking is scan-local and
    * embarrassingly parallel; the md5 of each chunk's joined text lets
    * the oracle verify exact chunk CONTENT, not just counts. */
  val qDocChunks = Q(
    "q_doc_chunks",
    (s, d) =>
      Tables.t(s, d, "documents")
        .withColumn("toks", split(col("text"), " "))
        .withColumn("n_tok", size(col("toks")).cast("long"))
        .withColumn("n_chunks", expr(
          "greatest(CAST(1 AS BIGINT), " +
            "CAST(ceil((n_tok - 10) / 30.0) AS BIGINT))"))
        .withColumn("chunk_idx",
          explode(expr("sequence(CAST(0 AS BIGINT), n_chunks - 1)")))
        .select(
          col("doc_id"), col("chunk_idx"),
          least(lit(40L), col("n_tok") - col("chunk_idx") * 30L)
            .as("chunk_toks"),
          md5(expr(
            """CAST(concat_ws(' ',
                 slice(toks, CAST(chunk_idx * 30 + 1 AS INT), 40))
               AS BINARY)""")).as("chunk_md5"))
        .orderBy(col("doc_id"), col("chunk_idx")),
    Some("""WITH t AS (
              SELECT doc_id, string_split(text, ' ') AS toks,
                CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
              FROM documents),
            c AS (
              SELECT doc_id, toks, n_tok,
                unnest(generate_series(0,
                  greatest(CAST(1 AS BIGINT),
                    CAST(ceil((n_tok - 10) / 30.0) AS BIGINT)) - 1))
                  AS chunk_idx
              FROM t)
            SELECT doc_id, chunk_idx,
              least(40, n_tok - chunk_idx * 30) AS chunk_toks,
              md5(array_to_string(
                toks[chunk_idx * 30 + 1 : chunk_idx * 30 + 40], ' '))
                AS chunk_md5
            FROM c
            ORDER BY doc_id NULLS FIRST, chunk_idx NULLS FIRST"""))

  /** Pareto-frontier curation (q_mix_pareto): multi-objective document
    * selection — keep every document not dominated on (lexical
    * diversity, length), the skyline a curation pipeline hands to a
    * budgeted sampler when no single quality scalar exists. Diversity
    * is the type-token ratio on a 0..100 integer grid computed
    * SCAN-LOCALLY (size(array_distinct(tokens)) — no token explode,
    * no shuffle); the skyline then reduces to: per TTR cell the
    * longest doc (ties → lowest doc_id), then a running-max filter
    * over the ≤101-row cell grid ordered by TTR descending. The
    * corpus-wide work is ONE keyed aggregate; dominance never
    * compares document pairs — that is what makes the skyline safe at
    * 100 TB (the q_stats_kendall cell-grid discipline). */
  val qMixPareto = Q(
    "q_mix_pareto",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val scored = Tables.t(s, d, "documents")
        .selectExpr("doc_id", "n_chars",
          """size(array_distinct(split(text, ' '))) * 100L
             div size(split(text, ' ')) AS ttr""")
      val cells = scored
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("ttr"))
            .orderBy(col("n_chars").desc, col("doc_id"))))
        .filter(col("rn") === 1)
        .select(col("ttr"), col("n_chars"), col("doc_id"))
      val wDesc = Window.orderBy(col("ttr").desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      cells
        .withColumn("best_above",
          coalesce(max(col("n_chars")).over(wDesc), lit(-1L)))
        .filter(col("n_chars") > col("best_above"))
        .select(col("ttr"), col("n_chars"), col("doc_id"))
        .orderBy(col("ttr").desc)
    },
    Some("""WITH scored AS (
        SELECT doc_id, n_chars,
          len(list_distinct(string_split(text, ' '))) * 100
            // len(string_split(text, ' ')) AS ttr
        FROM documents),
      cells AS (
        SELECT ttr, n_chars, doc_id FROM (
          SELECT *, row_number() OVER (PARTITION BY ttr
            ORDER BY n_chars DESC, doc_id) AS rn
          FROM scored) x
        WHERE rn = 1),
      sky AS (
        SELECT ttr, n_chars, doc_id,
          coalesce(max(n_chars) OVER (ORDER BY ttr DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
            AS best_above
        FROM cells)
      SELECT CAST(ttr AS BIGINT) AS ttr, n_chars, doc_id
      FROM sky WHERE n_chars > best_above
      ORDER BY ttr DESC"""))

  // ---- q_text_mask_plan -------------------------------------------------

  /** MLM masking plan (q_text_mask_plan): the BERT-style 15% / 80-10-10
    * token-masking assignment, made DETERMINISTIC so the plan is
    * reproducible run-to-run and auditable engine-to-engine — per
    * (doc, position) a hash gate selects 15% of tokens (u32 <
    * ⌊0.15·2³²⌋), and an independent second hash splits the selected
    * into mask/random/keep at 80/10/10. Emits the per-doc masking
    * census (counts + micro-exact mask fraction) a training-data
    * builder QA-checks before writing the masked copies. Scan-local
    * hash arithmetic, one per-doc aggregate — no windows, no joins;
    * the shape is embarrassingly parallel at any corpus size. */
  val qTextMaskPlan = Q(
    "q_text_mask_plan",
    (s, d) => {
      Tables.t(s, d, "documents")
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
        .select(col("doc_id"), col("pos"),
          expr("""CAST(conv(substring(md5(CAST(concat(
                    CAST(doc_id AS STRING), ':', CAST(pos AS STRING))
                    AS BINARY)), 1, 8), 16, 10) AS BIGINT)""").as("u"),
          expr("""CAST(conv(substring(md5(CAST(concat(
                    CAST(pos AS STRING), ':', CAST(doc_id AS STRING))
                    AS BINARY)), 1, 8), 16, 10) AS BIGINT) % 100""")
            .as("v"))
        .withColumn("sel", (col("u") < 644245094L).cast("long"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"),
          sum(col("sel")).as("n_selected"),
          sum(expr("CASE WHEN sel = 1 AND v < 80 THEN 1L ELSE 0L END"))
            .as("n_mask"),
          sum(expr("CASE WHEN sel = 1 AND v >= 80 AND v < 90 THEN 1L" +
            " ELSE 0L END")).as("n_random"),
          sum(expr("CASE WHEN sel = 1 AND v >= 90 THEN 1L ELSE 0L END"))
            .as("n_keep"))
        .withColumn("mask_frac_micro",
          expr("(1000000 * n_selected) div n_tokens"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH pos AS (
              SELECT doc_id,
                unnest(generate_series(0,
                  len(string_split(text, ' ')) - 1)) AS pos
              FROM documents),
            drawn AS (
              SELECT doc_id, pos,
                CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':'
                  || CAST(pos AS VARCHAR)), 1, 8) AS BIGINT) AS u,
                CAST('0x' || substr(md5(CAST(pos AS VARCHAR) || ':'
                  || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100
                  AS v
              FROM pos),
            flagged AS (
              SELECT doc_id,
                CAST(u < 644245094 AS BIGINT) AS sel, v
              FROM drawn)
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
              CAST(sum(sel) AS BIGINT) AS n_selected,
              CAST(sum(CASE WHEN sel = 1 AND v < 80 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_mask,
              CAST(sum(CASE WHEN sel = 1 AND v >= 80 AND v < 90 THEN 1
                ELSE 0 END) AS BIGINT) AS n_random,
              CAST(sum(CASE WHEN sel = 1 AND v >= 90 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_keep,
              (1000000 * CAST(sum(sel) AS BIGINT)) // count(*)
                AS mask_frac_micro
            FROM flagged
            GROUP BY doc_id
            ORDER BY doc_id NULLS FIRST"""))

  /** Sequence packing (q_pack_bins): greedy first-fit packing of
    * documents into fixed 256-token context windows — the sample-
    * packing step every pretraining build runs between curation and
    * tokenization — reported as the docs-per-bin histogram with exact
    * token utilization. Packing is inherently sequential, so it runs
    * per SHARD (doc_id div 64): a bounded higher-order fold over the
    * shard's collected (doc_id, tok) array on the Spark side and the
    * identical recurrence as a recursive CTE in DuckDB (the q_ts_holt
    * discipline). The shard is the scale unit: production packers
    * stream one bounded shard per task, bins never cross shards, and
    * every shard folds independently — corpus-linear with no global
    * sequential stage. All arithmetic is integer (token counts, exact
    * BIGINT sums); the only doubles are the final single divisions of
    * exact sums. Docs longer than the window are truncated to one full
    * bin (least(tok, 256) — the standard packing cap). */
  val qPackBins = Q(
    "q_pack_bins",
    (s, d) => {
      val base = Tables.t(s, d, "documents")
        .select(col("doc_id"), expr("doc_id div 64").as("shard"),
          least(size(split(col("text"), " ")).cast("bigint"), lit(256L))
            .as("tok"))
      val folded = base
        .groupBy(col("shard"))
        .agg(array_sort(collect_list(expr(
          "named_struct('doc_id', doc_id, 'tok', tok)"))).as("xs"))
        .select(col("shard"), explode(expr("""
          aggregate(
            xs,
            named_struct('fill', CAST(0 AS BIGINT),
              'bin', CAST(0 AS BIGINT),
              'hist', CAST(array() AS ARRAY<STRUCT<
                tok: BIGINT, bin: BIGINT>>)),
            (acc, x) -> IF(acc.bin = 0 OR acc.fill + x.tok > 256,
              named_struct('fill', x.tok, 'bin', acc.bin + 1,
                'hist', concat(acc.hist,
                  array(named_struct('tok', x.tok, 'bin', acc.bin + 1)))),
              named_struct('fill', acc.fill + x.tok, 'bin', acc.bin,
                'hist', concat(acc.hist,
                  array(named_struct('tok', x.tok, 'bin', acc.bin))))),
            acc -> acc.hist)""")).as("h"))
      folded
        .groupBy(col("shard"), col("h.bin").as("bin"))
        .agg(count(lit(1)).as("docs"), sum(col("h.tok")).as("toks"))
        .groupBy(col("docs").as("docs_per_bin"))
        .agg(count(lit(1)).as("n_bins"),
          sum(col("toks")).as("total_tokens"))
        .select(col("docs_per_bin"), col("n_bins"), col("total_tokens"),
          round(col("total_tokens").cast("double") / col("n_bins"), 6)
            .as("avg_bin_tokens"),
          round(col("total_tokens").cast("double") /
            (col("n_bins") * 256), 6).as("avg_util"))
        .orderBy(col("docs_per_bin"))
    },
    Some("""WITH RECURSIVE base AS (
              SELECT doc_id, doc_id // 64 AS shard,
                least(CAST(len(string_split(text, ' ')) AS BIGINT),
                  256) AS tok
              FROM documents),
            packs AS (
              SELECT shard, list(tok ORDER BY doc_id) AS arr
              FROM base GROUP BY shard),
            r(shard, i, tok, fill, bin) AS (
              SELECT shard, 1, arr[1], arr[1], CAST(1 AS BIGINT)
              FROM packs
              UNION ALL
              SELECT r.shard, r.i + 1, p.arr[r.i + 1],
                CASE WHEN r.fill + p.arr[r.i + 1] > 256
                  THEN p.arr[r.i + 1]
                  ELSE r.fill + p.arr[r.i + 1] END,
                CASE WHEN r.fill + p.arr[r.i + 1] > 256
                  THEN r.bin + 1 ELSE r.bin END
              FROM r JOIN packs p ON p.shard = r.shard
              WHERE r.i < len(p.arr)),
            bins AS (
              SELECT shard, bin, CAST(count(*) AS BIGINT) AS docs,
                CAST(sum(tok) AS BIGINT) AS toks
              FROM r GROUP BY shard, bin)
            SELECT docs AS docs_per_bin,
              CAST(count(*) AS BIGINT) AS n_bins,
              CAST(sum(toks) AS BIGINT) AS total_tokens,
              round(CAST(sum(toks) AS DOUBLE) / count(*), 6)
                AS avg_bin_tokens,
              round(CAST(sum(toks) AS DOUBLE) / (count(*) * 256), 6)
                AS avg_util
            FROM bins
            GROUP BY docs
            ORDER BY docs_per_bin NULLS FIRST"""))

  /** Shuffle-quality audit (q_shuffle_audit): how well the
    * DETERMINISTIC training shuffle (the q_mix_sample hash gate's
    * multiplier, doc_id · 2654435761 mod 2²⁰) breaks up source runs —
    * the serial source-homogeneity a data loader cares about, since
    * same-source runs make consecutive training batches correlated.
    * Adjacency is measured inside hash-range blocks (h div 65536):
    * the windowed relation is block-bounded, cross-block adjacencies
    * are simply not sampled (the estimator stays unbiased — block
    * boundaries are hash-random), and block width is the scale knob: a
    * 100 TB run shards the hash space finer so every block stays
    * memory-bounded. Reported against the exact hypergeometric
    * expectation Σ c_s(c_s−1) / (n(n−1)) for a uniform random order —
    * all counts exact BIGINTs, each emitted double one parenthesized
    * IEEE expression over exact integers. */
  val qShuffleAudit = Q(
    "q_shuffle_audit",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val base = Tables.t(s, d, "documents")
        .select(col("source"), col("doc_id"),
          expr("(doc_id * 2654435761) % 1048576").as("h"))
        .withColumn("block", expr("h div 65536"))
      val adj = base
        .withColumn("prev", lag(col("source"), 1).over(
          Window.partitionBy(col("block"))
            .orderBy(col("h"), col("doc_id"))))
        .filter(col("prev").isNotNull)
        .agg(count(lit(1)).as("n_pairs"),
          sum(when(col("source") === col("prev"), 1L).otherwise(0L))
            .as("n_same"))
      val cnts = Tables.t(s, d, "documents")
        .groupBy(col("source")).agg(count(lit(1)).as("c"))
        .agg(sum(col("c")).as("n_docs"),
          sum(col("c") * (col("c") - 1)).as("sq"))
      adj.crossJoin(broadcast(cnts))
        .select(col("n_docs"), col("n_pairs"), col("n_same"),
          round(col("n_same").cast("double") / col("n_pairs"), 6)
            .as("same_rate"),
          round(col("sq").cast("double") /
            (col("n_docs") * (col("n_docs") - 1)), 6)
            .as("expected_rate"),
          round((col("n_same").cast("double") *
              (col("n_docs") * (col("n_docs") - 1)).cast("double")) /
            (col("n_pairs").cast("double") * col("sq").cast("double")), 6)
            .as("lift"))
    },
    Some("""WITH base AS (
              SELECT source, doc_id,
                (doc_id * 2654435761) % 1048576 AS h
              FROM documents),
            adj AS (
              SELECT CAST(count(*) AS BIGINT) AS n_pairs,
                CAST(sum(CASE WHEN source = prev THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_same
              FROM (SELECT source,
                      lag(source) OVER (PARTITION BY h // 65536
                        ORDER BY h, doc_id) AS prev
                    FROM base)
              WHERE prev IS NOT NULL),
            cnts AS (
              SELECT CAST(sum(c) AS BIGINT) AS n_docs,
                CAST(sum(c * (c - 1)) AS BIGINT) AS sq
              FROM (SELECT count(*) AS c FROM documents GROUP BY source))
            SELECT n_docs, n_pairs, n_same,
              round(CAST(n_same AS DOUBLE) / n_pairs, 6) AS same_rate,
              round(CAST(sq AS DOUBLE) / (n_docs * (n_docs - 1)), 6)
                AS expected_rate,
              round((CAST(n_same AS DOUBLE)
                  * CAST(n_docs * (n_docs - 1) AS DOUBLE))
                / (CAST(n_pairs AS DOUBLE) * CAST(sq AS DOUBLE)), 6)
                AS lift
            FROM adj, cnts"""))

  val all: Seq[Q] = Seq(qMixSample, qPiiRedact, qDocChunks,
    qSampleReservoir, qMixPareto, qTextMaskPlan, qPackBins,
    qShuffleAudit)
}
