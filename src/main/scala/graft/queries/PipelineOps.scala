package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import graft.{Q, Tables}

/** Training-data pipeline operators beyond dedup/sampling (SURVEY.md
  * §2.D): benchmark decontamination, document chunking, repetition-based
  * quality filtering, and sequence packing — the steps between "corpus"
  * and "token stream" in a pretraining data pipeline. All four are pure
  * relational plans (generators, windows, joins) and hash-checkable
  * against DuckDB oracles.
  *
  * Scale posture: q55 broadcasts the benchmark shingle set (benchmark
  * suites are MBs against a 100 TB corpus — the canonical broadcast-dim
  * shape); q56/q57 are per-row generators/projections (embarrassingly
  * parallel); q58 is one window over (source, doc_id) — a single shuffle
  * on the partition key.
  */
object PipelineOps {

  /** q55 — benchmark decontamination: for every training doc, count the
    * distinct 8-token shingles it shares with any benchmark doc (the
    * n-gram-overlap test-set contamination check every serious eval
    * hygiene pipeline runs; 8 because the fixture docs are ~54 tokens —
    * production uses 13 with the same plan). The "benchmark" side is the
    * deterministic doc_id % 97 == 0 slice of the corpus, so exact and
    * near duplicates of benchmark docs are flagged, not just
    * themselves. */
  /** Core of q55 over any (doc_id, text) frame. */
  def decontaminate(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val sh = docs.filter(col("text").isNotNull)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .filter(size(col("toks")) >= 8)
        .select(col("doc_id"),
          explode(graft.functions.TextFunctions.shinglesExpr("toks", 8))
            .as("s"))
      val bench = sh.filter(col("doc_id") % 97 === 0)
        .select(col("s")).distinct()
      val hits = sh.filter(col("doc_id") % 97 =!= 0)
        .join(broadcast(bench), "s")
        .groupBy(col("doc_id"))
        .agg(countDistinct(col("s")).as("n_overlap"))
      docs.filter(col("doc_id") % 97 =!= 0).select(col("doc_id"))
        .join(hits, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
          (coalesce(col("n_overlap"), lit(0L)) > 0).as("contaminated"))
  }

  val q55: Q = Q(
    "q55_decontaminate",
    run = { (spark, dir) => decontaminate(Tables.documentsParallel(spark, dir)) },
    oracle = Some("""
      WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
                 FROM documents WHERE text IS NOT NULL),
      g AS (SELECT doc_id, toks,
              unnest(generate_series(1, len(toks) - 7)) AS i
            FROM d WHERE len(toks) >= 8),
      sh AS (SELECT DISTINCT doc_id,
               toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' ||
               toks[i+3] || ' ' || toks[i+4] || ' ' || toks[i+5] || ' ' ||
               toks[i+6] || ' ' || toks[i+7] AS s
             FROM g),
      bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0),
      hits AS (SELECT sh.doc_id, CAST(count(DISTINCT sh.s) AS BIGINT) AS n
               FROM sh JOIN bench USING (s)
               WHERE sh.doc_id % 97 <> 0 GROUP BY sh.doc_id)
      SELECT t.doc_id, COALESCE(hits.n, 0) AS n_overlap,
        COALESCE(hits.n, 0) > 0 AS contaminated
      FROM (SELECT doc_id FROM documents WHERE doc_id % 97 <> 0) t
      LEFT JOIN hits ON hits.doc_id = t.doc_id"""))

  /** q56 — fixed-size document chunking: split every doc into
    * non-overlapping 32-token chunks (the context-window pre-tokenization
    * step). Pure generator — `sequence` + `slice` per row, no shuffle;
    * integer arithmetic only ((n+31) div 32 chunks), so the chunk grid is
    * bit-identical in any engine. */
  /** Core of q56: fixed 32-token chunk grid over any (doc_id, text). */
  def chunk(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      docs
        .filter(col("text").isNotNull)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"), col("toks"),
          explode(expr("sequence(0, (size(toks) + 31) div 32 - 1)"))
            .as("chunk_idx"))
        .select(col("doc_id"), col("chunk_idx").cast("int").as("chunk_idx"),
          expr("size(slice(toks, chunk_idx * 32 + 1, 32))")
            .as("n_chunk_toks"),
          expr("concat_ws(' ', slice(toks, chunk_idx * 32 + 1, 32))")
            .as("chunk_text"))

  val q56: Q = Q(
    "q56_doc_chunking",
    run = { (spark, dir) => chunk(Tables.documentsParallel(spark, dir)) },
    oracle = Some("""
      WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
                 FROM documents WHERE text IS NOT NULL),
      c AS (SELECT doc_id, toks,
              unnest(generate_series(0, (len(toks) + 31) // 32 - 1)) AS chunk_idx
            FROM d)
      SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx,
        CAST(len(toks[chunk_idx*32 + 1 : chunk_idx*32 + 32]) AS INTEGER)
          AS n_chunk_toks,
        array_to_string(toks[chunk_idx*32 + 1 : chunk_idx*32 + 32], ' ')
          AS chunk_text
      FROM c"""))

  /** q57 — repetition-based quality filter (the Gopher-rules shape):
    * duplicate-bigram fraction and top-token fraction per doc, with the
    * keep/drop verdict. Per-row HOF projection — the inner
    * distinct×filter scan is O(L²) in DOC length (bounded, ~54 tokens),
    * never in corpus size. */
  /** Core of q57 over any (doc_id, text) frame. */
  def repetitionStats(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      docs
        .filter(col("text").isNotNull)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .filter(size(col("toks")) >= 2)
        .withColumn("n_toks", size(col("toks")))
        .withColumn("bigrams", expr(
          "transform(sequence(1, size(toks) - 1), " +
            "i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))"))
        .withColumn("dup_bigram_frac",
          lit(1.0) - size(array_distinct(col("bigrams"))).cast(DoubleType) /
            (col("n_toks") - 1))
        .withColumn("top_tok_frac", expr(
          "array_max(transform(array_distinct(toks), " +
            "t -> size(filter(toks, x -> x = t))))").cast(DoubleType) /
          col("n_toks"))
        .select(col("doc_id"), col("n_toks"), col("dup_bigram_frac"),
          col("top_tok_frac"),
          (col("dup_bigram_frac") <= 0.2 && col("top_tok_frac") <= 0.2)
            .as("keep"))

  val q57: Q = Q(
    "q57_repetition_filter",
    run = { (spark, dir) => repetitionStats(Tables.documentsParallel(spark, dir)) },
    oracle = Some("""
      WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
                 FROM documents WHERE text IS NOT NULL),
      m AS (SELECT doc_id, toks, CAST(len(toks) AS INTEGER) AS n_toks,
              list_transform(generate_series(1, len(toks) - 1),
                i -> toks[i] || ' ' || toks[i+1]) AS bigrams
            FROM d WHERE len(toks) >= 2),
      f AS (SELECT doc_id, n_toks,
              1.0 - CAST(len(list_distinct(bigrams)) AS DOUBLE) / (n_toks - 1)
                AS dup_bigram_frac,
              CAST(list_max(list_transform(list_distinct(toks),
                t -> len(list_filter(toks, x -> x = t)))) AS DOUBLE) / n_toks
                AS top_tok_frac
            FROM m)
      SELECT doc_id, n_toks, dup_bigram_frac, top_tok_frac,
        dup_bigram_frac <= 0.2 AND top_tok_frac <= 0.2 AS keep
      FROM f"""))

  /** q58 — sequence packing: assign every doc to a 2048-token pack by
    * its start offset in the per-source concatenated token stream
    * (docs ordered by doc_id). The streaming-concat packing a
    * pretraining loader runs, as ONE window aggregation: cum-sum of
    * token counts over (source, doc_id) — a single shuffle on source,
    * and a doc that straddles a boundary belongs to the pack it starts
    * in (the loader's continuation semantics). Null-text docs count 0
    * tokens and ride along so the doc→pack map is total. */
  /** Core of q58 over any (doc_id, source, text) frame. */
  def packSequences(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      docs
        .select(col("doc_id"), col("source"),
          coalesce(size(split(col("text"), " ")).cast("long"), lit(0L))
            .as("n_toks"))
        .withColumn("cum", sum(col("n_toks")).over(w))
        .select(col("doc_id"), col("source"), col("n_toks"),
          (col("cum") - col("n_toks")).as("start_off"),
          expr("(cum - n_toks) div 2048").as("pack_id"))
  }

  val q58: Q = Q(
    "q58_pack_sequences",
    run = { (spark, dir) => packSequences(Tables.documentsParallel(spark, dir)) },
    oracle = Some("""
      WITH d AS (SELECT doc_id, source,
                   COALESCE(CAST(len(string_split(text, ' ')) AS BIGINT), 0)
                     AS n_toks
                 FROM documents),
      w AS (SELECT doc_id, source, n_toks,
              sum(n_toks) OVER (PARTITION BY source ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
            FROM d)
      SELECT doc_id, source, n_toks,
        CAST(cum - n_toks AS BIGINT) AS start_off,
        CAST((cum - n_toks) // 2048 AS BIGINT) AS pack_id
      FROM w"""))

  /** Core of q59 over any (doc_id, source, text) frame. */
  def crossSourceOverlap(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    // The (source, shingle) distinct — a REAL distinct, collapsing
    // per-doc shingles across a whole source — feeds both self-join
    // sides. Round 16 staged it; round 17 re-A/B'd per the verdict
    // (item 8) and REVERTED: the self-join's two references are the
    // same exchange, which AQE stage reuse already deduplicates, so the
    // staging write was pure I/O cost (staged 1.36 s vs unstaged 1.24 s
    // warm, controls equal — the q217 lesson again: staging only pays
    // when the duplicated subtree carries windows/aggs ABOVE the
    // exchange that reuse cannot absorb).
    val sh = docs.filter(col("text").isNotNull)
        .select(col("source"), split(col("text"), " ").as("toks"))
        .filter(size(col("toks")) >= 3)
        .select(col("source"),
          explode(graft.functions.TextFunctions.shinglesExpr("toks", 3))
            .as("s"))
        .distinct()
    sh.as("a").join(sh.as("b"),
        col("a.s") === col("b.s") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("n_shared_shingles"))
  }

  /** q59 — cross-source contamination matrix: distinct 3-gram shingles
    * shared by each source pair (the "how much does source A leak into
    * source B" diagnostic behind mix design and contamination triage).
    * The key scale move is the DISTINCT (source, shingle) projection
    * BEFORE the self-join: every shingle bucket is then bounded by the
    * number of SOURCES (config-sized), never by document count, so a
    * hot shingle costs |sources|² pairs, not |docs|² — the same
    * dictionary-bounding trick as the strata guard. */
  val q59: Q = Q(
    "q59_cross_source_overlap",
    run = { (spark, dir) =>
      crossSourceOverlap(Tables.documentsParallel(spark, dir))
    },
    oracle = Some("""
      WITH d AS (SELECT source, string_split(text, ' ') AS toks
                 FROM documents WHERE text IS NOT NULL),
      g AS (SELECT source, toks,
              unnest(generate_series(1, len(toks) - 2)) AS i
            FROM d WHERE len(toks) >= 3),
      sh AS (SELECT DISTINCT source,
               toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS s
             FROM g)
      SELECT a.source AS source_a, b.source AS source_b,
        CAST(count(*) AS BIGINT) AS n_shared_shingles
      FROM sh a JOIN sh b ON a.s = b.s AND a.source < b.source
      GROUP BY a.source, b.source"""))

  /** Core of q65: canonical text normalization — lowercase, strip
    * non-alphanumerics, collapse runs of whitespace, trim. Patterns are
    * restricted to classes Java regex and RE2 interpret identically
    * (`[^a-z0-9 ]`, ` +`), so the oracle is exact; per-row projection,
    * no shuffle. */
  def normalizeText(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    docs.filter(col("text").isNotNull)
      .withColumn("norm", trim(regexp_replace(regexp_replace(
        lower(col("text")), "[^a-z0-9 ]", " "), " +", " ")))
      .select(col("doc_id"), col("norm"),
        when(col("norm") === "", 0)
          .otherwise(size(split(col("norm"), " "))).as("n_norm_toks"))

  /** q65 — normalized text + token count (the cleanup step ahead of
    * every tokenizer). */
  val q65: Q = Q(
    "q65_text_normalize",
    run = { (spark, dir) => normalizeText(Tables.documentsParallel(spark, dir)) },
    oracle = Some("""
      WITH d AS (SELECT doc_id,
                   trim(regexp_replace(regexp_replace(lower(text),
                     '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm
                 FROM documents WHERE text IS NOT NULL)
      SELECT doc_id, norm,
        CASE WHEN norm = '' THEN 0
             ELSE CAST(len(string_split(norm, ' ')) AS INTEGER) END
          AS n_norm_toks
      FROM d"""))

  /** Core of q88 over any (doc_id, source, text) frame: per-source
    * token-budget fill — rank docs longest-first within their source and
    * keep the prefix whose cumulative token count fits the per-source
    * quota. This is the dataset-MIXING primitive: given per-source token
    * budgets (uniform here; production passes a weights map), select
    * which documents make the training mix, deterministically.
    *
    * Scale: one window shuffle on source (the q58 posture). The
    * greedy-prefix rule means the selection is a pure function of
    * (source, n_toks, doc_id) — re-running on a grown corpus yields a
    * superset-or-shifted mix with no RNG state to persist. */
  def tokenBudgetMix(docs: org.apache.spark.sql.DataFrame,
      budgetPerSource: Long = 30000L): org.apache.spark.sql.DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(col("n_toks").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col("doc_id"), col("source"),
        coalesce(size(split(col("text"), " ")).cast("long"), lit(0L))
          .as("n_toks"))
      .withColumn("cum_toks", sum(col("n_toks")).over(w))
      .filter(col("cum_toks") <= budgetPerSource)
  }

  /** q88 — token-budget dataset mix (greedy longest-first per-source
    * quota fill). */
  val q88: Q = Q(
    "q88_token_budget_mix",
    run = { (spark, dir) => tokenBudgetMix(Tables.documentsParallel(spark, dir)) },
    oracle = Some("""
      WITH d AS (SELECT doc_id, source,
                   COALESCE(CAST(len(string_split(text, ' ')) AS BIGINT), 0)
                     AS n_toks
                 FROM documents),
      w AS (SELECT doc_id, source, n_toks,
              sum(n_toks) OVER (PARTITION BY source
                ORDER BY n_toks DESC, doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_toks
            FROM d)
      SELECT doc_id, source, n_toks, CAST(cum_toks AS BIGINT) AS cum_toks
      FROM w WHERE cum_toks <= 30000"""))

  /** Core of q96: corpus-wide chunk-level dedup over the q56 chunk
    * grid — the "repeated passage" scrub that document-level dedup
    * (q23/q30) cannot express: a boilerplate paragraph shared by
    * thousands of otherwise-distinct pages survives doc dedup but dies
    * here. Keep-first semantics: the occurrence with the smallest
    * (doc_id, chunk_idx) wins; every later copy is dropped and each doc
    * is re-assembled from its surviving chunks in grid order.
    *
    * Scale: the window partitions by chunk_text — a hash shuffle whose
    * per-partition size is bounded by duplicate multiplicity, never a
    * global sort (production keys the shuffle on sha2(chunk_text) and
    * re-joins the text; same plan shape). Reassembly is one hash agg on
    * doc_id with a sort_array over the per-doc chunk list — list length
    * is doc-bounded (~16 chunks), not corpus-bounded. */
  def chunkDedup(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val ch = chunk(docs)
    val w = Window.partitionBy(col("chunk_text"))
      .orderBy(col("doc_id").asc, col("chunk_idx").asc)
    val kept = ch.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
    val rebuilt = kept.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        expr("concat_ws(' ', transform(" +
          "sort_array(collect_list(struct(chunk_idx, chunk_text))), " +
          "s -> s.chunk_text))").as("clean_text"))
    ch.groupBy(col("doc_id")).agg(count(lit(1)).as("n_chunks"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chunks"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** q96 — chunk-level (passage) dedup with keep-first reassembly. */
  val q96: Q = Q(
    "q96_chunk_dedup",
    run = { (spark, dir) => chunkDedup(Tables.documentsParallel(spark, dir)) },
    oracle = Some("""
      WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
                 FROM documents WHERE text IS NOT NULL),
      c AS (SELECT doc_id, toks,
              unnest(generate_series(0, (len(toks) + 31) // 32 - 1))
                AS chunk_idx
            FROM d),
      ch AS (SELECT doc_id, chunk_idx,
               array_to_string(toks[chunk_idx*32 + 1 : chunk_idx*32 + 32], ' ')
                 AS chunk_text
             FROM c),
      k AS (SELECT doc_id, chunk_idx, chunk_text,
              row_number() OVER (PARTITION BY chunk_text
                ORDER BY doc_id, chunk_idx) AS rn
            FROM ch),
      r AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
              string_agg(chunk_text, ' ' ORDER BY chunk_idx) AS clean_text
            FROM k WHERE rn = 1 GROUP BY doc_id),
      t AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks
            FROM ch GROUP BY doc_id)
      SELECT t.doc_id, t.n_chunks, COALESCE(r.n_kept, 0) AS n_kept,
        COALESCE(r.clean_text, '') AS clean_text
      FROM t LEFT JOIN r ON r.doc_id = t.doc_id"""))

  /** Core of q98: the composite quality gate — the four curation
    * filters run as a SEQUENTIAL cascade (language → length band →
    * repetition → boilerplate, cheap-to-expensive, the order a
    * production pipeline uses so costly stages only see survivors),
    * reported as a 4-row attrition funnel (docs_in/docs_out per stage).
    * This is the integration query over q28/q70/q57/q71's predicates:
    * the per-doc verdicts reuse [[repetitionStats]] and
    * [[CorpusOps.boilerplateScore]] verbatim, so the cascade can never
    * drift from the individual filters it composes.
    *
    * Scale: per-doc flags are projections + the q71 boilerplate joins
    * (vocabulary-bounded); the funnel itself is ONE count aggregate
    * reshaped by stack — a single row crosses the driver, never data. */
  def filterCascade(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val d = docs.filter(col("text").isNotNull)
    val base = d.select(col("doc_id"), col("lang"),
      size(split(col("text"), " ")).as("n_toks"))
    val rep = repetitionStats(d).select(col("doc_id"), col("keep").as("p_rep"))
    val boil = graft.queries.CorpusOps.boilerplateScore(d)
      .select(col("doc_id"), col("keep").as("p_boil"))
    val flags = base
      .join(rep, Seq("doc_id"), "left")
      .join(boil, Seq("doc_id"), "left")
      .select(
        col("lang").isin("de", "en", "es", "fr", "zh").as("p1"),
        (col("n_toks") >= 20 && col("n_toks") <= 2000).as("p2"),
        coalesce(col("p_rep"), lit(false)).as("p3"),
        coalesce(col("p_boil"), lit(false)).as("p4"))
    flags.agg(
        count(lit(1)).as("n0"),
        sum(when(col("p1"), 1L).otherwise(0L)).as("n1"),
        sum(when(col("p1") && col("p2"), 1L).otherwise(0L)).as("n2"),
        sum(when(col("p1") && col("p2") && col("p3"), 1L).otherwise(0L))
          .as("n3"),
        sum(when(col("p1") && col("p2") && col("p3") && col("p4"), 1L)
          .otherwise(0L)).as("n4"))
      .selectExpr("""stack(4,
          1, 'lang_known',  n0, n1,
          2, 'length_band', n1, n2,
          3, 'repetition',  n2, n3,
          4, 'boilerplate', n3, n4)
        AS (stage_id, stage, docs_in, docs_out)""")
  }

  /** q98 — sequential quality-filter cascade with attrition funnel. */
  val q98: Q = Q(
    "q98_filter_cascade",
    run = { (spark, dir) => filterCascade(Tables.documentsParallel(spark, dir)) },
    oracle = Some("""
      WITH d AS (SELECT doc_id, lang, string_split(text, ' ') AS toks
                 FROM documents WHERE text IS NOT NULL),
      rep AS (SELECT doc_id,
                1.0 - CAST(len(list_distinct(list_transform(
                    generate_series(1, len(toks) - 1),
                    i -> toks[i] || ' ' || toks[i+1]))) AS DOUBLE)
                  / (len(toks) - 1) AS dup_bigram_frac,
                CAST(list_max(list_transform(list_distinct(toks),
                    t -> len(list_filter(toks, x -> x = t)))) AS DOUBLE)
                  / len(toks) AS top_tok_frac
              FROM d WHERE len(toks) >= 2),
      g AS (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 2)) AS i
            FROM d WHERE len(toks) >= 3),
      sh AS (SELECT DISTINCT doc_id,
               toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS s FROM g),
      hot AS (SELECT s FROM (SELECT s, count(*) AS nd FROM sh GROUP BY s)
              WHERE nd >= 5),
      per_doc AS (SELECT doc_id, count(*) AS n_shingles FROM sh GROUP BY doc_id),
      boiler AS (SELECT sh.doc_id, count(*) AS n_boiler
                 FROM sh JOIN hot USING (s) GROUP BY sh.doc_id),
      flags AS (SELECT
          d.lang IN ('de','en','es','fr','zh') AS p1,
          len(d.toks) >= 20 AND len(d.toks) <= 2000 AS p2,
          COALESCE(rep.dup_bigram_frac <= 0.2 AND rep.top_tok_frac <= 0.2,
            false) AS p3,
          COALESCE(CAST(COALESCE(boiler.n_boiler, 0) AS DOUBLE)
            / per_doc.n_shingles <= 0.5, false) AS p4
        FROM d
        LEFT JOIN rep ON rep.doc_id = d.doc_id
        LEFT JOIN per_doc ON per_doc.doc_id = d.doc_id
        LEFT JOIN boiler ON boiler.doc_id = d.doc_id),
      a AS (SELECT CAST(count(*) AS BIGINT) AS n0,
              CAST(count(*) FILTER (WHERE p1) AS BIGINT) AS n1,
              CAST(count(*) FILTER (WHERE p1 AND p2) AS BIGINT) AS n2,
              CAST(count(*) FILTER (WHERE p1 AND p2 AND p3) AS BIGINT) AS n3,
              CAST(count(*) FILTER (WHERE p1 AND p2 AND p3 AND p4) AS BIGINT)
                AS n4
            FROM flags)
      SELECT CAST(1 AS INTEGER) AS stage_id, 'lang_known' AS stage,
        n0 AS docs_in, n1 AS docs_out FROM a
      UNION ALL SELECT 2, 'length_band', n1, n2 FROM a
      UNION ALL SELECT 3, 'repetition', n2, n3 FROM a
      UNION ALL SELECT 4, 'boilerplate', n3, n4 FROM a"""))

  /** Core of q115 — dedup an INCOMING batch against an EXISTING corpus
    * (the daily-ingest shape: the corpus is the lake, the batch is
    * today's crawl). Verdict per incoming doc, precedence exact > near:
    *   - `exact` — its md5 content hash equals some corpus doc's
    *     (match_id = the smallest such corpus doc_id, jaccard null);
    *   - `near`  — word-3-gram Jaccard >= `threshold` against a corpus
    *     doc in the same `source` block (match_id = the best match:
    *     highest Jaccard, ties to the smallest corpus doc_id);
    *   - `new`   — neither (match_id and jaccard null).
    *
    * Scale posture: the exact arm is one equi-join on the content hash
    * (both sides bucketable by hash). The near arm is the q24 recipe made
    * ASYMMETRIC — incoming shingles join corpus shingles on
    * (source, shingle) with the lossless size-ratio prune
    * (max(n_a,n_b)·t <= min(n_a,n_b)), so the candidate space is
    * |batch|·|block| not |corpus|², and the daily batch is the small
    * side throughout: at 100 TB corpus / GB-scale daily batch every
    * per-incoming-doc aggregate is batch-sized, and AQE broadcasts the
    * batch-side counts. Unlike the symmetric self-join there is no
    * doc_a < doc_b guard — the sides are disjoint by construction. */
  def dedupAgainst(incoming: org.apache.spark.sql.DataFrame,
      corpus: org.apache.spark.sql.DataFrame,
      threshold: Double,
      restrictCorpus: Boolean = false): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.types.BinaryType
    val exact = incoming
      .select(col("doc_id"), md5(col("text").cast(BinaryType)).as("h"))
      .filter(col("h").isNotNull)
      .join(corpus.select(col("doc_id").as("c_id"),
          md5(col("text").cast(BinaryType)).as("h"))
        .filter(col("h").isNotNull), "h")
      .groupBy(col("doc_id")).agg(min(col("c_id")).as("exact_id"))

    def shingledRaw(df: org.apache.spark.sql.DataFrame)
        : org.apache.spark.sql.DataFrame =
      df.filter(col("text").isNotNull)
        .select(col("doc_id"), col("source"),
          split(col("text"), " ").as("toks"))
        .filter(size(col("toks")) >= 3)
        .select(col("doc_id"), col("source"),
          explode(graft.functions.TextFunctions.shinglesExpr("toks", 3))
            .as("shingle"))
    // round 17 (guide §2.4): the per-doc shingle count used to be a
    // self-join against a groupBy of the SAME stream — Catalyst planned
    // the tokenize+shingle derivation once per reference (and AQE's
    // exchange reuse only saves it when the agg side is not broadcast).
    // A doc-partitioned window computes the identical n in ONE pass and
    // one exchange; per-window state is doc-bounded.
    def withCounts(sh: org.apache.spark.sql.DataFrame)
        : org.apache.spark.sql.DataFrame =
      sh.withColumn("n",
        count(lit(1)).over(Window.partitionBy(col("doc_id"))))
    val a = withCounts(shingledRaw(incoming))
    // `restrictCorpus` (the q124 touched-key recipe, used by q151):
    // every corpus-side SHUFFLE must be bounded by the batch's touch
    // set, never the corpus. Two-step restriction: (1) broadcast the
    // batch-bounded touched (source, shingle) keys into a semi-join on
    // the corpus shingle stream — scan-side, pre-shuffle; (2) the docs
    // that survive (the touched docs) are re-expanded to their FULL
    // shingle sets so the per-doc count agg — the one corpus-sized
    // shuffle in the unrestricted recipe — aggregates only touched
    // docs' shingles (Jaccard denominators stay full-document by
    // construction). Net: two corpus SCANS (columnar, cheap), zero
    // corpus-sized shuffles; semantically a no-op vs the unrestricted
    // path because the pair join below restricts to the same keys.
    // The touched-doc semi-join's strategy is left to AQE: touched
    // docs are batch×block-density bounded, but a df-uncapped hot
    // shingle could inflate them past broadcast size — forcing a
    // broadcast there would be a driver-OOM risk at 100 TB.
    val b0 =
      if (restrictCorpus) {
        val cRaw = shingledRaw(corpus)
        val touchedKeys =
          broadcast(a.select(col("source"), col("shingle")).distinct())
        val touchedDocs = cRaw
          .join(touchedKeys, Seq("source", "shingle"), "left_semi")
          .select(col("doc_id")).distinct()
        val cTouched =
          cRaw.join(touchedDocs, Seq("doc_id"), "left_semi")
        withCounts(cTouched)
          .join(touchedKeys, Seq("source", "shingle"), "left_semi")
      } else withCounts(shingledRaw(corpus))
    val b = b0.select(col("doc_id").as("near_id"),
      col("source").as("source_b"), col("shingle").as("shingle_b"),
      col("n").as("n_b"))
    val best = Window.partitionBy(col("doc_id"))
      .orderBy(col("jaccard").desc, col("near_id").asc)
    val near = a.join(b,
        col("source") === col("source_b") &&
          col("shingle") === col("shingle_b") &&
          greatest(col("n"), col("n_b")) * threshold <=
            least(col("n"), col("n_b")))
      .groupBy(col("doc_id"), col("near_id"), col("n"), col("n_b"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard", col("inter").cast(DoubleType) /
        (col("n") + col("n_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .withColumn("rn", row_number().over(best))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("near_id"), col("jaccard"))

    incoming.select(col("doc_id"))
      .join(exact, Seq("doc_id"), "left")
      .join(near, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("exact_id").isNotNull, lit("exact"))
          .when(col("near_id").isNotNull, lit("near"))
          .otherwise(lit("new")).as("verdict"),
        coalesce(col("exact_id"), col("near_id")).as("match_id"),
        when(col("exact_id").isNull, col("jaccard")).as("jaccard"))
  }

  /** q115 — incremental dedup of an incoming batch (the deterministic
    * doc_id % 10 == 7 slice) against the rest of the corpus. The
    * streaming twin runs the identical [[dedupAgainst]] per micro-batch
    * (graft.streaming.DocStreams.incrementalDedupSink) — suite-asserted
    * equal across any batch split. */
  val q115: Q = Q(
    "q115_incremental_dedup",
    run = { (spark, dir) =>
      val docs = Tables.documentsParallel(spark, dir)
      dedupAgainst(docs.filter(col("doc_id") % 10 === 7),
        docs.filter(col("doc_id") % 10 =!= 7), 0.5)
    },
    oracle = Some("""
      WITH inc AS (SELECT * FROM documents WHERE doc_id % 10 = 7),
      corp AS (SELECT * FROM documents WHERE doc_id % 10 <> 7),
      ex AS (SELECT i.doc_id, min(c.doc_id) AS exact_id
             FROM inc i JOIN corp c ON md5(i.text) = md5(c.text)
             WHERE i.text IS NOT NULL AND c.text IS NOT NULL
             GROUP BY 1),
      dI AS (SELECT doc_id, source, string_split(text, ' ') AS toks
             FROM inc WHERE text IS NOT NULL),
      gI AS (SELECT doc_id, source, toks,
               unnest(generate_series(1, len(toks) - 2)) AS i
             FROM dI WHERE len(toks) >= 3),
      shI AS (SELECT DISTINCT doc_id, source,
                toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
              FROM gI),
      cntI AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
               FROM shI GROUP BY 1),
      dC AS (SELECT doc_id, source, string_split(text, ' ') AS toks
             FROM corp WHERE text IS NOT NULL),
      gC AS (SELECT doc_id, source, toks,
               unnest(generate_series(1, len(toks) - 2)) AS i
             FROM dC WHERE len(toks) >= 3),
      shC AS (SELECT DISTINCT doc_id, source,
                toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
              FROM gC),
      cntC AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
               FROM shC GROUP BY 1),
      pairs AS (SELECT a.doc_id, b.doc_id AS near_id,
                  CAST(count(*) AS BIGINT) AS inter
                FROM shI a JOIN shC b
                  ON a.source = b.source AND a.shingle = b.shingle
                GROUP BY 1, 2),
      scored AS (SELECT p.doc_id, p.near_id,
                   CAST(p.inter AS DOUBLE) / (ca.n + cb.n - p.inter)
                     AS jaccard
                 FROM pairs p
                 JOIN cntI ca ON ca.doc_id = p.doc_id
                 JOIN cntC cb ON cb.doc_id = p.near_id),
      near AS (SELECT doc_id, near_id, jaccard FROM (
                 SELECT *, row_number() OVER (PARTITION BY doc_id
                   ORDER BY jaccard DESC, near_id ASC) AS rn
                 FROM scored WHERE jaccard >= 0.5)
               WHERE rn = 1)
      SELECT i.doc_id,
        CASE WHEN ex.exact_id IS NOT NULL THEN 'exact'
             WHEN near.near_id IS NOT NULL THEN 'near'
             ELSE 'new' END AS verdict,
        COALESCE(ex.exact_id, near.near_id) AS match_id,
        CASE WHEN ex.exact_id IS NULL THEN near.jaccard END AS jaccard
      FROM inc i
      LEFT JOIN ex ON ex.doc_id = i.doc_id
      LEFT JOIN near ON near.doc_id = i.doc_id"""))

  val all: Seq[Q] = Seq(q55, q56, q57, q58, q59, q65, q88, q96, q98, q115)
}
