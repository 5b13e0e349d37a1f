package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}
import graft.{Q, Tables}
import graft.functions.TextFunctions

/** Corpus-curation operators (SURVEY.md §2.D, round 6): the filtering /
  * scrubbing / reporting layer of a pretraining data pipeline that sits
  * between raw ingestion and tokenization — term-blocklist + PII-pattern
  * scrubbing, TF-IDF distinctive-term extraction, percentile length-band
  * filtering, boilerplate n-gram removal, per-source corpus statistics —
  * plus ordered event-path mining over the `events` stream.
  *
  * All six are pure relational plans with DuckDB oracles. Determinism
  * rules follow the repo recipes: integer arithmetic wherever a score
  * feeds a comparison or a sort (the TF-IDF idf factor is an integer
  * proxy `n_docs*1e6 div df`, not a float log — libm last-ulp
  * differences between engines are not hash-stable), exact decimal
  * means, and single-division doubles only in leaf projections.
  */
object CorpusOps {

  private def nonNullDocs(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    Tables.documentsParallel(spark, dir).filter(col("text").isNotNull)

  /** q67 — blocklist / PII scrubbing: redact blocklisted terms tokenwise,
    * then an email-regex sweep over the reconstruction; emit the per-doc
    * redaction count. Pure per-row projection — no shuffle; the
    * blocklist is a literal here (production: a broadcast join against a
    * blocklist table — the q55 benchmark-side shape). The email regex
    * uses only character classes Java regex and RE2 interpret
    * identically, so the oracle is exact. */
  val q67: Q = Q(
    "q67_blocklist_scrub",
    run = { (spark, dir) =>
      nonNullDocs(spark, dir)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(
          col("doc_id"),
          expr("size(filter(toks, t -> t = 'customer' OR t = 'secret' OR t = 'password'))")
            .as("n_redacted"),
          regexp_replace(
            expr("concat_ws(' ', transform(toks, t -> CASE WHEN t = 'customer' OR t = 'secret' OR t = 'password' THEN '[REDACTED]' ELSE t END))"),
            "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}", "[EMAIL]").as("clean_text"))
    },
    oracle = Some("""
      WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
                 FROM documents WHERE text IS NOT NULL)
      SELECT doc_id,
        CAST(len(list_filter(toks,
          t -> t = 'customer' OR t = 'secret' OR t = 'password')) AS INTEGER)
          AS n_redacted,
        regexp_replace(
          array_to_string(list_transform(toks,
            t -> CASE WHEN t = 'customer' OR t = 'secret' OR t = 'password'
                 THEN '[REDACTED]' ELSE t END), ' '),
          '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '[EMAIL]', 'g')
          AS clean_text
      FROM d"""))

  /** q68 — TF-IDF distinctive terms: top-3 terms per document ranked by
    * tf × idf with an INTEGER idf proxy (`n_docs * 1_000_000 div df`) so
    * the ranking is bit-identical in any engine (a float `ln(N/df)`
    * ranks identically — log is monotone — but its hash isn't portable).
    *
    * Scale shape: explode → two hash aggs → join back on `token` (the
    * df table is vocabulary-sized: broadcasts while small, shuffles when
    * not — same posture as q53's frequency join) → one window top-k per
    * doc. The corpus-size scalar rides in as a broadcast single row. */
  /** Core of q68 over any (doc_id, text) frame. */
  def tfidfTerms(d: DataFrame): DataFrame = {
      val toks = d.select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      // tf feeds both the df aggregation and the score join — staged so
      // the explode+agg runs once, not twice
      val tf = graft.operators.Stage.materialize(
        toks.groupBy(col("doc_id"), col("token"))
          .agg(count(lit(1)).as("tf")),
        "tfidf-tf")
      val dfTab = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
      val n = d.agg(count(lit(1)).as("n_docs"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("token").asc)
      tf.join(dfTab, "token")
        .crossJoin(broadcast(n))
        .withColumn("score", col("tf") * expr("(n_docs * 1000000) div df"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("rank"), col("token"), col("tf"),
          col("df"), col("score"))
  }

  val q68: Q = Q(
    "q68_tfidf_terms",
    run = { (spark, dir) => tfidfTerms(nonNullDocs(spark, dir)) },
    oracle = Some("""
      WITH d AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
      toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM d),
      tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
             FROM toks GROUP BY doc_id, token),
      dft AS (SELECT token, CAST(count(*) AS BIGINT) AS df
              FROM tf GROUP BY token),
      n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM d),
      s AS (SELECT tf.doc_id, tf.token, tf.tf, dft.df,
              tf.tf * ((n.n_docs * 1000000) // dft.df) AS score
            FROM tf JOIN dft USING (token) CROSS JOIN n),
      r AS (SELECT doc_id, token, tf, df, score,
              CAST(row_number() OVER (PARTITION BY doc_id
                ORDER BY score DESC, token ASC) AS INTEGER) AS rank
            FROM s)
      SELECT doc_id, rank, token, tf, df, score
      FROM r WHERE rank <= 3"""))

  /** Core of q69: each user's ordered path through their first five
    * events (ties broken by event_id — the fixtures fuzz within-user
    * timestamp ties deliberately), then path frequencies. The pivot
    * `max(when(rn = k, …))` aggregates the path WITHOUT collect_list
    * (whose element order is partition-nondeterministic); concat_ws
    * skips the nulls of users with fewer than five events, matching
    * SQL string_agg over missing rows. NULL event_types are filtered
    * before ranking (mirrored in the oracle): a user whose first events
    * were ALL null would otherwise get path '' from concat_ws but NULL
    * from string_agg — a latent hash divergence. */
  def userPaths(events: DataFrame, depth: Int = 5): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val r = events
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .filter(col("event_type").isNotNull)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= depth)
    val stageCols = (1 to depth).map(k =>
      max(when(col("rn") === k, col("event_type"))))
    r.groupBy(col("user_id"))
      .agg(concat_ws(">", stageCols: _*).as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_users"), min(col("user_id")).as("min_user"))
  }

  /** q69 — ordered event-path mining (the "top navigation flows"
    * product-analytics query): one shuffle on user_id shared by the
    * window and the first agg, then a small agg on path. */
  val q69: Q = Q(
    "q69_user_paths",
    run = { (spark, dir) => userPaths(Tables.events(spark, dir)) },
    oracle = Some("""
      WITH r AS (SELECT user_id, event_type,
                   row_number() OVER (PARTITION BY user_id
                     ORDER BY CAST(ts AS TIMESTAMP) ASC, event_id ASC) AS rn
                 FROM events WHERE event_type IS NOT NULL),
      p AS (SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
            FROM r WHERE rn <= 5 GROUP BY user_id)
      SELECT path, CAST(count(*) AS BIGINT) AS n_users,
        min(user_id) AS min_user
      FROM p GROUP BY path"""))

  /** q70 — percentile length-band filter: keep documents whose token
    * count lies inside the corpus [p05, p95] band (the standard
    * too-short/too-long cut, with data-driven thresholds rather than
    * magic constants). The percentile pair is ONE sort-based aggregate
    * producing a single row, broadcast back over the corpus — at 100 TB
    * the band computation is a partial-aggregate tree, not a global
    * sort, and the join side stays a one-row broadcast. */
  val q70: Q = Q(
    "q70_length_band_filter",
    run = { (spark, dir) =>
      val lens = nonNullDocs(spark, dir)
        .select(col("doc_id"), size(split(col("text"), " ")).as("n_toks"))
      val band = lens.agg(
        percentile(col("n_toks"), array(lit(0.05), lit(0.95))).as("ps"))
        .select(col("ps").getItem(0).as("lo"), col("ps").getItem(1).as("hi"))
      lens.crossJoin(broadcast(band))
        .select(col("doc_id"), col("n_toks"), col("lo"), col("hi"),
          (col("n_toks") >= col("lo") && col("n_toks") <= col("hi")).as("keep"))
    },
    oracle = Some("""
      WITH lens AS (SELECT doc_id,
                      CAST(len(string_split(text, ' ')) AS INTEGER) AS n_toks
                    FROM documents WHERE text IS NOT NULL),
      band AS (SELECT quantile_cont(n_toks, 0.05) AS lo,
                 quantile_cont(n_toks, 0.95) AS hi FROM lens)
      SELECT doc_id, n_toks, lo, hi,
        n_toks >= lo AND n_toks <= hi AS keep
      FROM lens CROSS JOIN band"""))

  /** Core of q71: boilerplate 3-gram detection. A shingle appearing in
    * ≥ minDocs distinct documents is "boilerplate" (headers, footers,
    * navigation chrome); each document scores by the fraction of its
    * distinct shingles that are boilerplate. The hot set is
    * vocabulary-bounded — never corpus-bounded — so it broadcasts at any
    * corpus size (the same dictionary-bounding argument as q59). */
  /** Distinct per-document 3-gram shingles of a (doc_id, text) frame —
    * the shared projection under the boilerplate family. */
  private def distinctShingles3(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"),
        explode(TextFunctions.shinglesExpr("toks", 3)).as("s"))
    // no global .distinct(): shinglesExpr is array_distinct per doc and
    // doc_id is in the key, so the (doc_id, s) rows are ALREADY unique —
    // the round-16 before-plan paid a full corpus-wide exchange + agg
    // for a no-op (guide §2.4 "a distinct on data that is already
    // unique")

  /** The hot (boilerplate) shingle set of a corpus: distinct 3-grams
    * appearing in ≥ minDocs documents. Vocabulary-bounded output —
    * broadcastable at any corpus size; q151 computes it over the LAKE
    * and scores each incoming batch against it. */
  def hotShinglesOf(docs: DataFrame, minDocs: Long = 5L): DataFrame =
    distinctShingles3(docs).groupBy(col("s"))
      .agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= minDocs).select(col("s"))

  private def boilerScoreFrom(sh: DataFrame, hot: DataFrame): DataFrame = {
    val perDoc = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_shingles"))
    val boiler = sh.join(broadcast(hot), "s")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_boiler"))
    perDoc.join(boiler, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("n_boiler"), lit(0L)).as("n_boiler"),
        (coalesce(col("n_boiler"), lit(0L)).cast(DoubleType) / col("n_shingles"))
          .as("boiler_ratio"))
      .withColumn("keep", col("boiler_ratio") <= 0.5)
  }

  def boilerplateScore(docs: DataFrame, minDocs: Long = 5L): DataFrame = {
    // the distinct (doc, shingle) projection feeds THREE consumers (hot
    // set, per-doc denominators, boilerplate counts) — staged once so the
    // explode+distinct runs once, not per consumer
    val sh = graft.operators.Stage.materialize(
      distinctShingles3(docs), "boiler-sh")
    val hot = sh.groupBy(col("s")).agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= minDocs).select(col("s"))
    boilerScoreFrom(sh, hot)
  }

  /** Score `docs` against an EXTERNALLY-derived hot set (q151: the
    * lake's boilerplate statistic applied to an incoming batch — the
    * batch must not be able to vote its own chrome "not boilerplate").
    * Shingles staged once for the two consumers. */
  def boilerplateScoreAgainst(docs: DataFrame, hot: DataFrame): DataFrame =
    boilerScoreFrom(
      graft.operators.Stage.materialize(distinctShingles3(docs),
        "boiler-sh-batch"),
      hot)

  /** q71 — boilerplate n-gram filter (CCNet-style chrome removal). */
  val q71: Q = Q(
    "q71_boilerplate_ngrams",
    run = { (spark, dir) => boilerplateScore(nonNullDocs(spark, dir)) },
    oracle = Some("""
      WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
                 FROM documents WHERE text IS NOT NULL),
      g AS (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 2)) AS i
            FROM d WHERE len(toks) >= 3),
      sh AS (SELECT DISTINCT doc_id,
               toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS s FROM g),
      hot AS (SELECT s FROM (SELECT s, count(*) AS nd FROM sh GROUP BY s)
              WHERE nd >= 5),
      per_doc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles
                  FROM sh GROUP BY doc_id),
      boiler AS (SELECT sh.doc_id, CAST(count(*) AS BIGINT) AS n_boiler
                 FROM sh JOIN hot USING (s) GROUP BY sh.doc_id)
      SELECT p.doc_id, p.n_shingles,
        COALESCE(b.n_boiler, 0) AS n_boiler,
        CAST(COALESCE(b.n_boiler, 0) AS DOUBLE) / p.n_shingles AS boiler_ratio,
        CAST(COALESCE(b.n_boiler, 0) AS DOUBLE) / p.n_shingles <= 0.5 AS keep
      FROM per_doc p LEFT JOIN boiler b ON b.doc_id = p.doc_id"""))

  /** q72 — corpus statistics per (source, lang): document count, token
    * count, vocabulary size, exact-decimal mean document length, and
    * type-token ratio — the per-slice report a mix-design dashboard
    * reads. Two-level distinct aggregation (Catalyst plans the
    * multi-distinct via Expand); one shuffle on the tiny group key. */
  val q72: Q = Q(
    "q72_corpus_stats",
    run = { (spark, dir) =>
      nonNullDocs(spark, dir)
        .select(col("source"), col("lang"), col("doc_id"),
          explode(split(col("text"), " ")).as("token"))
        .groupBy(col("source"), col("lang"))
        .agg(
          countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_tokens"),
          countDistinct(col("token")).as("n_vocab"))
        .withColumn("avg_doc_toks",
          (col("n_tokens").cast(DecimalType(24, 6)) / col("n_docs"))
            .cast(DecimalType(24, 6)).cast(DoubleType))
        .withColumn("type_token_ratio",
          col("n_vocab").cast(DoubleType) / col("n_tokens"))
    },
    oracle = Some("""
      WITH toks AS (SELECT source, lang, doc_id,
                      unnest(string_split(text, ' ')) AS token
                    FROM documents WHERE text IS NOT NULL),
      a AS (SELECT source, lang,
              CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
              CAST(count(*) AS BIGINT) AS n_tokens,
              CAST(count(DISTINCT token) AS BIGINT) AS n_vocab
            FROM toks GROUP BY source, lang)
      SELECT source, lang, n_docs, n_tokens, n_vocab,
        CAST(CAST(CAST(n_tokens AS DECIMAL(24,6)) / n_docs AS DECIMAL(24,6))
          AS DOUBLE) AS avg_doc_toks,
        CAST(n_vocab AS DOUBLE) / n_tokens AS type_token_ratio
      FROM a"""))

  /** q76 — length-decile profile: doc-length distribution summarized by
    * value cutpoints. NOT ntile: a global ntile/percent_rank window is a
    * single-partition sort — the one shape that cannot survive 100 TB.
    * Instead the nine decile boundaries come from ONE percentile
    * aggregate (partial-agg tree, single output row, broadcast back),
    * and each doc's decile is "how many cutpoints lie strictly below my
    * length" — a per-row fold over a 9-element literal-sized array.
    * Docs tied on length land in the same decile (value semantics,
    * deterministic), which is what makes the result hash-checkable
    * where ntile's arbitrary tie-splitting is not. */
  val q76: Q = Q(
    "q76_length_deciles",
    run = { (spark, dir) =>
      val lens = nonNullDocs(spark, dir)
        .select(col("doc_id"), size(split(col("text"), " ")).as("n_toks"))
      val cuts = lens.agg(percentile(col("n_toks"),
        array((1 to 9).map(i => lit(i / 10.0)): _*)).as("cuts"))
      lens.crossJoin(broadcast(cuts))
        .select(col("n_toks"),
          expr("size(filter(cuts, c -> c < n_toks))").as("decile"))
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("n_toks")).as("min_toks"),
          max(col("n_toks")).as("max_toks"))
    },
    oracle = Some("""
      WITH lens AS (SELECT doc_id,
                      CAST(len(string_split(text, ' ')) AS INTEGER) AS n_toks
                    FROM documents WHERE text IS NOT NULL),
      cuts AS (SELECT quantile_cont(n_toks,
                 [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS cs FROM lens)
      SELECT CAST(len(list_filter(cs, c -> c < n_toks)) AS INTEGER)
          AS decile,
        CAST(count(*) AS BIGINT) AS n_docs,
        min(n_toks) AS min_toks, max(n_toks) AS max_toks
      FROM lens CROSS JOIN cuts
      GROUP BY 1"""))

  /** q78 — bigram collocations per language: adjacent token pairs seen
    * ≥5 times ranked by an INTEGER pointwise-mutual-information proxy,
    * `n_ab·N·1e6 div (n_a·n_b)` — monotone with PMI = log of the same
    * ratio, but hash-portable (the collocation-strength ordering is the
    * deliverable; the log is presentation). Top-20 per lang with full
    * lexical tie-break. Three hash aggs + two vocabulary-sized joins +
    * one top-k window per lang — the q68 posture. At a 100 TB corpus the
    * n_ab·N·1e6 product needs DECIMAL(38) headroom; BIGINT holds to
    * ~10¹⁸ (fixture N·n_ab·1e6 ≈ 10¹⁵). */
  val q78: Q = Q(
    "q78_collocations",
    run = { (spark, dir) =>
      val d = nonNullDocs(spark, dir)
        .select(col("lang"), split(col("text"), " ").as("toks"))
      val uni = d.select(col("lang"), explode(col("toks")).as("w"))
      val nTok = uni.groupBy(col("lang")).agg(count(lit(1)).as("n_tokens"))
      val nW = uni.groupBy(col("lang"), col("w")).agg(count(lit(1)).as("n_w"))
      val bg = d.filter(size(col("toks")) >= 2)
        .select(col("lang"), explode(expr(
          "transform(sequence(1, size(toks) - 1), " +
            "i -> struct(element_at(toks, i) as w1, element_at(toks, i + 1) as w2))"))
          .as("b"))
        .select(col("lang"), col("b.w1").as("w1"), col("b.w2").as("w2"))
        .groupBy(col("lang"), col("w1"), col("w2"))
        .agg(count(lit(1)).as("n_ab"))
        .filter(col("n_ab") >= 5)
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("score").desc, col("w1").asc, col("w2").asc)
      bg.join(nW.select(col("lang"), col("w").as("w1"), col("n_w").as("n_a")),
          Seq("lang", "w1"))
        .join(nW.select(col("lang"), col("w").as("w2"), col("n_w").as("n_b")),
          Seq("lang", "w2"))
        .join(nTok, Seq("lang"))
        .withColumn("score",
          expr("(n_ab * n_tokens * 1000000) div (n_a * n_b)"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 20)
        .select(col("lang"), col("rank"), col("w1"), col("w2"),
          col("n_ab"), col("score"))
    },
    oracle = Some("""
      WITH d AS (SELECT lang, string_split(text, ' ') AS toks
                 FROM documents WHERE text IS NOT NULL),
      uni AS (SELECT lang, unnest(toks) AS w FROM d),
      n_tok AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_tokens
                FROM uni GROUP BY lang),
      n_w AS (SELECT lang, w, CAST(count(*) AS BIGINT) AS n_w
              FROM uni GROUP BY lang, w),
      g AS (SELECT lang, toks, unnest(generate_series(1, len(toks) - 1)) AS i
            FROM d WHERE len(toks) >= 2),
      bg AS (SELECT lang, toks[i] AS w1, toks[i+1] AS w2,
               CAST(count(*) AS BIGINT) AS n_ab
             FROM g GROUP BY 1, 2, 3 HAVING count(*) >= 5),
      s AS (SELECT bg.lang, bg.w1, bg.w2, bg.n_ab,
              (bg.n_ab * t.n_tokens * 1000000) // (a.n_w * b.n_w) AS score
            FROM bg
            JOIN n_w a ON a.lang = bg.lang AND a.w = bg.w1
            JOIN n_w b ON b.lang = bg.lang AND b.w = bg.w2
            JOIN n_tok t ON t.lang = bg.lang),
      r AS (SELECT lang, w1, w2, n_ab, score,
              CAST(row_number() OVER (PARTITION BY lang
                ORDER BY score DESC, w1 ASC, w2 ASC) AS INTEGER) AS rank
            FROM s)
      SELECT lang, rank, w1, w2, n_ab, score FROM r WHERE rank <= 20"""))

  /** q80 — character-level fuzzy matching, the missing dedup modality
    * next to token-Jaccard (q24) / MinHash (q30) / SimHash (q31):
    * Levenshtein distance ≤ 12 between 32-char prefixes, candidate
    * pairs BLOCKED on STACKED keys — (source, first 4 chars) UNION
    * (source, last 4 chars of the prefix) — the classic record-linkage
    * multi-key shape: an edit inside the first 4 characters escapes the
    * prefix block but still collides on the suffix key (and vice
    * versa), so single-edit pairs are unreachable only if the edit
    * lands in BOTH key regions at once. Keys are tagged ('p|'/'s|') so
    * a prefix of one doc never aliases a suffix of another. The
    * self-join stays bucket-bounded per key, pairs are deduped BEFORE
    * the O(len²) edit-distance DP, so the DP runs once per candidate,
    * never all pairs. Recall on prefix-edited near-pairs (where the old
    * single key provably missed) is asserted in the suite. */
  val q80: Q = Q(
    "q80_fuzzy_match",
    run = { (spark, dir) => fuzzyMatch(nonNullDocs(spark, dir)) },
    oracle = Some("""
      WITH p AS (SELECT doc_id, source, substr(text, 1, 32) AS pre
                 FROM documents WHERE text IS NOT NULL),
      k AS (SELECT doc_id, source, pre, 'p|' || substr(pre, 1, 4) AS blk FROM p
            UNION ALL
            SELECT doc_id, source, pre, 's|' || right(pre, 4) AS blk FROM p),
      cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 a.source, a.pre AS pre_a, b.pre AS pre_b
               FROM k a JOIN k b
                 ON a.source = b.source AND a.blk = b.blk
                   AND a.doc_id < b.doc_id)
      SELECT doc_a, doc_b, source,
        CAST(levenshtein(pre_a, pre_b) AS INTEGER) AS dist
      FROM cand WHERE levenshtein(pre_a, pre_b) <= 12"""))

  /** q80 core (testable on arbitrary doc frames): stacked-blocking-key
    * fuzzy match over (doc_id, source, text). */
  def fuzzyMatch(docs: DataFrame, maxDist: Int = 12): DataFrame = {
    val p = docs.select(col("doc_id"), col("source"),
      substring(col("text"), 1, 32).as("pre"))
    val keyed = p.withColumn("blk", explode(array(
      concat(lit("p|"), substring(col("pre"), 1, 4)),
      concat(lit("s|"), expr("right(pre, 4)")))))
    keyed.as("a").join(keyed.as("b"),
        col("a.source") === col("b.source") &&
          col("a.blk") === col("b.blk") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.source").as("source"),
        col("a.pre").as("pre_a"), col("b.pre").as("pre_b"))
      .distinct()
      .withColumn("dist", levenshtein(col("pre_a"), col("pre_b")))
      .filter(col("dist") <= maxDist)
      .select(col("doc_a"), col("doc_b"), col("source"), col("dist"))
  }

  /** q90 — bigram-surprisal quality score: the LM-perplexity proxy a
    * codec-free pipeline can compute. Corpus-global bigram counts feed a
    * per-occurrence integer surprisal `n_total·1e6 div c(bigram)` (the
    * q68/q78 hash-portable recipe — monotone with −log p, no libm), and
    * each doc gets the ×1e6 integer-proxy MEAN over its bigrams plus the
    * MAX (its single rarest transition). High mean ⇒ improbable token
    * transitions ⇒ gibberish/boilerplate candidates — the filter rank
    * next to q27's surface stats and q53's unigram rarity, but at the
    * TRANSITION level, which is what actually separates fluent from
    * shuffled text. Docs with < 2 tokens have no transitions and are
    * excluded by construction.
    *
    * Scale: bigram counts are a vocabulary²-bounded hash agg (map-side
    * combining); the join-back is the q53 shape; n_total·1e6 needs
    * DECIMAL(38) headroom at 100 TB (BIGINT holds to ~10¹⁸; fixture
    * ≈ 10¹¹). */
  /** Core of q90 over any (doc_id, text) frame. */
  def bigramSurprisal(docs: DataFrame): DataFrame = {
      val b = docs.filter(col("text").isNotNull)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .filter(size(col("toks")) >= 2)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(toks) - 1), " +
            "i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))"))
          .as("bg"))
      val cnt = b.groupBy(col("bg")).agg(count(lit(1)).as("c"))
      val total = b.agg(count(lit(1)).as("n_total"))
      // mean as a PURE-INTEGER proxy (×1e6, floor-divided): decimal
      // division rounds its last digit differently across engines, but
      // integer div is bit-identical — the q68/q78 recipe end to end
      b.join(cnt, "bg")
        .crossJoin(broadcast(total))
        .withColumn("sp", expr("(n_total * 1000000) div c"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          sum(col("sp")).as("sum_sp"),
          max(col("sp")).as("max_surprisal"))
        .select(col("doc_id"), col("n_bigrams"),
          // sp is already the ×1e6 proxy; its floor-mean stays ×1e6
          expr("sum_sp div n_bigrams").as("mean_surprisal_x1e6"),
          col("max_surprisal"))
  }

  val q90: Q = Q(
    "q90_bigram_surprisal",
    run = { (spark, dir) => bigramSurprisal(nonNullDocs(spark, dir)) },
    oracle = Some("""
      WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
                 FROM documents WHERE text IS NOT NULL),
      g AS (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 1)) AS i
            FROM d WHERE len(toks) >= 2),
      b AS (SELECT doc_id, concat(toks[i], ' ', toks[i+1]) AS bg FROM g),
      cnt AS (SELECT bg, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY 1),
      tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM b)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        CAST(sum((n_total * 1000000) // c) // count(*) AS BIGINT)
          AS mean_surprisal_x1e6,
        max((n_total * 1000000) // c) AS max_surprisal
      FROM b JOIN cnt USING (bg) CROSS JOIN tot
      GROUP BY doc_id"""))

  /** Core of q95 over any (doc_id, source, text) frame: per-source
    * vocabulary-growth profile — the Heaps-law dashboard row a crawl
    * curator reads to spot sources whose vocabulary is saturating
    * (templated/boilerplate feeds) vs still growing (diverse text).
    * `hapax` = tokens seen exactly once in the source; the
    * type-token and hapax ratios ride the ×1e6 integer-div proxy
    * (the q68/q78/q90 hash-portable recipe). */
  def vocabGrowth(docs: DataFrame): DataFrame = {
    val wc = docs
      .select(col("source"), col("doc_id"),
        explode(split(col("text"), " ")).as("token"))
      .groupBy(col("source"), col("token"))
      .agg(count(lit(1)).as("c"))
    val nd = docs.groupBy(col("source"))
      .agg(countDistinct(col("doc_id")).as("n_docs"))
    wc.groupBy(col("source"))
      .agg(count(lit(1)).as("n_types"),
        sum(col("c")).as("n_tokens"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"))
      .join(nd, "source")
      .select(col("source"), col("n_docs"), col("n_tokens"), col("n_types"),
        col("n_hapax"),
        expr("(n_types * 1000000) div n_tokens").as("ttr_ppm"),
        expr("(n_hapax * 1000000) div n_types").as("hapax_ppm"))
  }

  /** q95 — per-source vocabulary growth (Heaps-law profile). Two hash
    * aggs — (source, token) then source — plus a 20-row join; the wide
    * shuffle is vocabulary-bounded per source, never corpus-bounded. */
  val q95: Q = Q(
    "q95_vocab_growth",
    run = { (spark, dir) =>
      vocabGrowth(nonNullDocs(spark, dir))
    },
    oracle = Some("""
      WITH toks AS (SELECT source, doc_id,
                      unnest(string_split(text, ' ')) AS token
                    FROM documents WHERE text IS NOT NULL),
      wc AS (SELECT source, token, CAST(count(*) AS BIGINT) AS c
             FROM toks GROUP BY source, token),
      nd AS (SELECT source, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
             FROM toks GROUP BY source),
      a AS (SELECT source, CAST(count(*) AS BIGINT) AS n_types,
              CAST(sum(c) AS BIGINT) AS n_tokens,
              CAST(count(*) FILTER (WHERE c = 1) AS BIGINT) AS n_hapax
            FROM wc GROUP BY source)
      SELECT a.source, nd.n_docs, a.n_tokens, a.n_types, a.n_hapax,
        (a.n_types * 1000000) // a.n_tokens AS ttr_ppm,
        (a.n_hapax * 1000000) // a.n_types AS hapax_ppm
      FROM a JOIN nd ON nd.source = a.source"""))

  /** Core of q132: per-source distinctive terms by log-likelihood-ratio
    * keyness (Dunning 1993, "Accurate Methods for the Statistics of
    * Surprise and Coincidence" — the G² statistic corpus linguistics
    * standardized on): for each (source, token), the 2×2 table of
    * (in-source vs rest) × (this token vs others), G² = 2·Σ O·ln(O/E).
    * Only POSITIVE keyness ranks (token over-represented in the
    * source: a·n > y_w·n_s — an exact integer comparison), top
    * `topN` per source by G².
    *
    * Parity: the four O·ln(O/E) terms are computed in double and added
    * in FIXED textual order (explicit association, not an agg), then
    * the sum is quantized DECIMAL(18,6) BEFORE ranking, so the
    * per-source order never rests on a cross-libm ulp; ties break by
    * token. Empty cells contribute 0 (the standard convention).
    *
    * Scale shape: one (source, token) hash-agg, one token-marginal agg
    * joined back on token (AQE broadcasts while the vocabulary fits),
    * per-source windows (source count is config-sized) — never global.
    */
  def distinctiveTerms(docs: DataFrame, topN: Int = 10): DataFrame = {
    val tok = docs
      .select(col("source"), explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
    val sw = tok.groupBy(col("source"), col("token"))
      .agg(count(lit(1)).as("a"))
    val srcTot = sw.groupBy(col("source")).agg(sum(col("a")).as("ns"))
    val tokTot = sw.groupBy(col("token")).agg(sum(col("a")).as("yw"))
    val nAll = srcTot.agg(sum(col("ns")).as("n"))
    // O·ln(O/E) with E = row·col/n; a zero cell contributes 0
    def term(o: org.apache.spark.sql.Column, row: org.apache.spark.sql.Column,
        colm: org.apache.spark.sql.Column,
        n: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      when(o > 0,
        o.cast("double") * log(o.cast("double") * n.cast("double") /
          (row.cast("double") * colm.cast("double"))))
        .otherwise(lit(0.0))
    val g2 = sw
      .join(srcTot, "source").join(tokTot, "token")
      .crossJoin(broadcast(nAll))
      // positive keyness; DECIMAL(38,0) cross-multiplication — BIGINT
      // products overflow at the operator's design scale (n ~ 2e13
      // tokens, yw·ns ~ 1e24 >> 2^63), and non-ANSI Spark would WRAP
      // silently where DuckDB errors
      .filter(col("a").cast("decimal(38,0)") * col("n") >
        col("yw").cast("decimal(38,0)") * col("ns"))
      .select(col("source"), col("token"), col("a"), col("ns"),
        col("yw"), col("n"),
        ((term(col("a"), col("ns"), col("yw"), col("n")) +
          term(col("ns") - col("a"), col("ns"), col("n") - col("yw"), col("n"))) +
          (term(col("yw") - col("a"), col("n") - col("ns"), col("yw"), col("n")) +
            term(col("n") - col("ns") - (col("yw") - col("a")),
              col("n") - col("ns"), col("n") - col("yw"), col("n"))))
          .as("g2raw"))
      .select(col("source"), col("token"), col("a").as("c_in"),
        col("yw").as("c_corpus"),
        expr("CAST(2 * g2raw AS DECIMAL(18,6))").as("g2"))
    g2.withColumn("rnk", row_number().over(
        Window.partitionBy("source")
          .orderBy(col("g2").desc, col("token").asc)))
      .filter(col("rnk") <= topN)
      // rank on the quantized decimal (the knife-edge guard), emit a
      // plain double — the checker-portable output type
      .select(col("source"), col("token"), col("c_in"), col("c_corpus"),
        col("g2").cast("double").as("g2"), col("rnk"))
  }

  /** q132 — per-source distinctive terms (Dunning G² keyness). */
  val q132: Q = Q(
    "q132_distinctive_terms",
    run = { (spark, dir) => distinctiveTerms(nonNullDocs(spark, dir)) },
    oracle = Some("""
      WITH tok AS (SELECT source, word AS token
                   FROM (SELECT source,
                           unnest(string_split(text, ' ')) AS word
                         FROM documents WHERE text IS NOT NULL)
                   WHERE len(word) > 0),
      sw AS (SELECT source, token, CAST(count(*) AS BIGINT) AS a
             FROM tok GROUP BY 1, 2),
      st AS (SELECT source, CAST(sum(a) AS BIGINT) AS ns FROM sw GROUP BY 1),
      tt AS (SELECT token, CAST(sum(a) AS BIGINT) AS yw FROM sw GROUP BY 1),
      nn AS (SELECT CAST(sum(ns) AS BIGINT) AS n FROM st),
      g AS (SELECT sw.source, sw.token, sw.a, st.ns, tt.yw, nn.n,
              (CASE WHEN sw.a > 0 THEN CAST(sw.a AS DOUBLE) *
                 ln(CAST(sw.a AS DOUBLE) * n / (CAST(ns AS DOUBLE) * yw))
               ELSE 0.0 END +
               CASE WHEN ns - sw.a > 0 THEN CAST(ns - sw.a AS DOUBLE) *
                 ln(CAST(ns - sw.a AS DOUBLE) * n /
                    (CAST(ns AS DOUBLE) * (n - yw)))
               ELSE 0.0 END) +
              (CASE WHEN yw - sw.a > 0 THEN CAST(yw - sw.a AS DOUBLE) *
                 ln(CAST(yw - sw.a AS DOUBLE) * n /
                    (CAST(n - ns AS DOUBLE) * yw))
               ELSE 0.0 END +
               CASE WHEN n - ns - (yw - sw.a) > 0
                 THEN CAST(n - ns - (yw - sw.a) AS DOUBLE) *
                   ln(CAST(n - ns - (yw - sw.a) AS DOUBLE) * n /
                      (CAST(n - ns AS DOUBLE) * (n - yw)))
               ELSE 0.0 END) AS g2raw
            FROM sw
            JOIN st ON st.source = sw.source
            JOIN tt ON tt.token = sw.token
            CROSS JOIN nn
            WHERE CAST(sw.a AS HUGEINT) * nn.n
                  > CAST(tt.yw AS HUGEINT) * st.ns),
      q AS (SELECT source, token, a AS c_in, yw AS c_corpus,
              CAST(2 * g2raw AS DECIMAL(18,6)) AS g2
            FROM g),
      r AS (SELECT source, token, c_in, c_corpus, g2,
              CAST(row_number() OVER (PARTITION BY source
                ORDER BY g2 DESC, token ASC) AS INTEGER) AS rnk
            FROM q)
      SELECT source, token, c_in, c_corpus,
        CAST(g2 AS DOUBLE) AS g2, rnk
      FROM r WHERE rnk <= 10"""))

  /** Core of q189: CROSS-SOURCE QUANTILE NORMALIZATION of a per-doc
    * score — the calibration step before mixing quality-scored sources
    * (q88/q110's mixers assume scores are comparable across sources;
    * raw scores never are — one crawl's "long" is another's median).
    * Each doc's score maps through its OWN source's decile grid to the
    * GLOBAL mid-decile value at the same quantile position: a doc at
    * its source's 7th decile gets the corpus-wide p75 value, whatever
    * its raw score was — rank-preserving within source, distribution-
    * aligned across sources (the quantile-normalization recipe from
    * expression-array statistics, applied to corpus curation).
    *
    * Scale shape: the q76 cutpoint discipline — NO global rank/ntile
    * window (a single-partition sort cannot survive 100 TB); the
    * per-source grids come from ONE grouped percentile aggregate
    * (partial-agg tree, #sources × 9 doubles) and the global grid from
    * one more, both broadcast back; each doc then folds its score over
    * a 9-element literal array. Value-tied docs land in the same
    * decile — deterministic where ntile's arbitrary tie-split is not. */
  def quantileNormalize(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val lens = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).as("n_toks"))
    val sCuts = lens.groupBy(col("source"))
      .agg(percentile(col("n_toks"),
        array((1 to 9).map(i => lit(i / 10.0)): _*)).as("cuts"))
    val gMid = lens.agg(percentile(col("n_toks"),
      array((0 until 10).map(i => lit(0.05 + i / 10.0)): _*)).as("gmid"))
    lens.join(sCuts, "source").crossJoin(broadcast(gMid))
      .select(col("doc_id"), col("source"), col("n_toks"),
        expr("size(filter(cuts, c -> c < n_toks))").as("q_dec"),
        expr("element_at(gmid, size(filter(cuts, c -> c < n_toks)) + 1)")
          .as("calib"))
  }

  /** q189 — per-doc source-decile + globally calibrated score. */
  val q189: Q = Q(
    "q189_quantile_normalize",
    run = { (spark, dir) =>
      quantileNormalize(graft.Tables.documents(spark, dir))
    },
    oracle = Some("""
      WITH lens AS (SELECT doc_id, source,
                      CAST(len(string_split(text, ' ')) AS INTEGER)
                        AS n_toks
                    FROM documents WHERE text IS NOT NULL),
      scuts AS (SELECT source,
                  quantile_cont(n_toks,
                    [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS cuts
                FROM lens GROUP BY source),
      g AS (SELECT quantile_cont(n_toks,
              [0.05, 0.15, 0.25, 0.35, 0.45, 0.55, 0.65, 0.75, 0.85, 0.95])
              AS gmid FROM lens)
      SELECT doc_id, l.source, n_toks,
        CAST(len(list_filter(s.cuts, c -> c < n_toks)) AS INTEGER)
          AS q_dec,
        g.gmid[len(list_filter(s.cuts, c -> c < n_toks)) + 1] AS calib
      FROM lens l JOIN scuts s ON s.source = l.source CROSS JOIN g"""))

  val all: Seq[Q] =
    Seq(q67, q68, q69, q70, q71, q72, q76, q78, q80, q90, q95, q132,
      q189)
}
