package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{Q, Tables}
import graft.functions.TextFunctions

/** Text-analysis + deduplication suite over `documents`
  * (SURVEY.md §2.D): exact dedup, n-gram Jaccard near-dup, token stats,
  * quality scoring, language-ID heuristic, fingerprinting. Every query is
  * oracle-checked.
  *
  * Scale notes: the Jaccard near-dup is blocked by `source` (a realistic
  * blocking key) so candidate generation is |block|²-bounded instead of
  * N²; the shingle→join plan shuffles once on (source, shingle). The
  * MinHash-LSH variant (graft.ext.MinHashDedup) is the sub-quadratic
  * 100 TB path for unblocked corpora.
  */
object TextOps {

  /** Source-blocked 3-gram-Jaccard near-dup pairs at `threshold`
    * (doc_a < doc_b): the exact formulation q24 checks against the
    * oracle, reusable as an edge generator for duplicate clustering
    * (graft.ext.DedupCluster). Includes the lossless size-ratio prune
    * (J <= min/max) inside the self-join. */
  def jaccardPairs(docs: org.apache.spark.sql.DataFrame,
      threshold: Double): org.apache.spark.sql.DataFrame = {
    val d = docs
      .select(col("doc_id"), col("source"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 3)
    val sh = d.select(col("doc_id"), col("source"),
      explode(TextFunctions.shinglesExpr("toks", 3)).as("shingle"))
    val cnt = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    // NO broadcast hint: cnt is one row PER DOCUMENT, so forcing a
    // broadcast would ship the whole corpus's counts to every executor
    // at scale. AQE still broadcasts it automatically while it is under
    // the threshold (fixture scale), and falls back to a shuffle join
    // when it is not (100 TB scale).
    val shc = sh.join(cnt, "doc_id")
    val a = shc.select(col("doc_id").as("doc_a"), col("source"),
      col("shingle"), col("n_sh").as("n_a"))
    val b = shc.select(col("doc_id").as("doc_b"), col("source").as("source_b"),
      col("shingle").as("shingle_b"), col("n_sh").as("n_b"))
    // size-ratio bound generalized to any threshold t: J <= min/max, so
    // max * t <= min is necessary for J >= t — lossless prune
    a.join(b,
        col("source") === col("source_b") && col("shingle") === col("shingle_b") &&
          col("doc_a") < col("doc_b") &&
          greatest(col("n_a"), col("n_b")) * threshold <=
            least(col("n_a"), col("n_b")))
      .groupBy("doc_a", "doc_b", "n_a", "n_b").agg(count(lit(1)).as("inter"))
      .withColumn("jaccard",
        col("inter").cast(DoubleType) / (col("n_a") + col("n_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("inter"), col("jaccard"))
  }

  /** Q23 — exact dedup via content hash (group-by md5). */
  val q23: Q = Q(
    "q23_dedup_exact",
    run = { (spark, dir) =>
      Tables.documents(spark, dir)
        .groupBy(md5(col("text").cast(BinaryType)).as("text_hash"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_doc_id"))
    },
    oracle = Some("""
      SELECT md5(text) AS text_hash, CAST(count(*) AS BIGINT) AS n_docs,
             min(doc_id) AS min_doc_id
      FROM documents GROUP BY 1"""))

  /** Q24 — near-duplicate pairs by word-3-gram Jaccard, blocked by
    * source. Catches the fixtures' planted near-dups (max J ≈ 0.97). */
  val q24: Q = Q(
    "q24_dedup_ngram_jaccard",
    run = { (spark, dir) =>
      jaccardPairs(Tables.documentsParallel(spark, dir), 0.5)
    },
    oracle = Some("""
      WITH d AS (SELECT doc_id, source, string_split(text,' ') AS toks FROM documents),
      d3 AS (SELECT doc_id, source, toks, unnest(generate_series(1, len(toks)-2)) AS i
             FROM d WHERE len(toks) >= 3),
      sh AS (SELECT DISTINCT doc_id, source,
               toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle FROM d3),
      cnt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY 1),
      pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS inter
                FROM sh a JOIN sh b
                  ON a.source = b.source AND a.shingle = b.shingle AND a.doc_id < b.doc_id
                GROUP BY 1, 2)
      SELECT doc_a, doc_b, inter,
        CAST(inter AS DOUBLE) / (ca.n + cb.n - inter) AS jaccard
      FROM pairs JOIN cnt ca ON ca.doc_id = doc_a JOIN cnt cb ON cb.doc_id = doc_b
      WHERE CAST(inter AS DOUBLE) / (ca.n + cb.n - inter) >= 0.5"""))

  /** Q26 — token statistics per (lang, source): integer sums are exactly
    * associative, so no decimal dance needed. */
  val q26: Q = Q(
    "q26_text_token_stats",
    run = { (spark, dir) =>
      Tables.documents(spark, dir)
        .select(col("lang"), col("source"), col("n_chars"),
          size(split(col("text"), " ")).as("n_toks"))
        .groupBy(col("lang"), col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_toks")).as("total_toks"),
          (sum(col("n_toks")).cast(DoubleType) / count(lit(1))).as("avg_toks"),
          max(col("n_chars")).as("max_chars"),
          min(col("n_chars")).as("min_chars"))
    },
    oracle = Some("""
      WITH d AS (SELECT lang, source, n_chars,
                   CAST(len(string_split(text, ' ')) AS INTEGER) AS n_toks
                 FROM documents)
      SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(n_toks) AS BIGINT) AS total_toks,
        CAST(CAST(sum(n_toks) AS VARCHAR) AS DOUBLE) / count(*) AS avg_toks,
        max(n_chars) AS max_chars, min(n_chars) AS min_chars
      FROM d GROUP BY lang, source"""))

  /** Q27 — per-document quality scoring: stopword ratio, distinct-token
    * ratio, length factor — the standard pretraining-data quality gates,
    * as one codegen'd projection. */
  val q27: Q = Q(
    "q27_text_quality",
    run = { (spark, dir) =>
      Tables.documentsParallel(spark, dir)
        .withColumn("toks", split(col("text"), " "))
        .withColumn("n_toks", size(col("toks")))
        .withColumn("n_distinct", size(array_distinct(col("toks"))))
        .withColumn("n_stop",
          expr("size(filter(toks, t -> t = 'the' OR t = 'a' OR t = 'of' OR t = 'and' OR t = 'to'))"))
        .withColumn("stop_ratio", col("n_stop").cast(DoubleType) / col("n_toks"))
        .withColumn("distinct_ratio", col("n_distinct").cast(DoubleType) / col("n_toks"))
        .withColumn("len_factor", least(col("n_chars").cast(DoubleType) / 500.0, lit(1.0)))
        .withColumn("quality",
          col("stop_ratio") * 0.5 + col("distinct_ratio") * 0.3 + col("len_factor") * 0.2)
        .select(col("doc_id"), col("n_toks"), col("n_distinct"), col("n_stop"),
          col("stop_ratio"), col("distinct_ratio"), col("quality"))
    },
    oracle = Some("""
      WITH d AS (SELECT doc_id, n_chars, string_split(text, ' ') AS toks FROM documents),
      m AS (SELECT doc_id, n_chars,
              CAST(len(toks) AS INTEGER) AS n_toks,
              CAST(len(list_distinct(toks)) AS INTEGER) AS n_distinct,
              CAST(len(list_filter(toks, t -> t = 'the' OR t = 'a' OR t = 'of' OR t = 'and' OR t = 'to')) AS INTEGER) AS n_stop
            FROM d)
      SELECT doc_id, n_toks, n_distinct, n_stop,
        CAST(n_stop AS DOUBLE) / n_toks AS stop_ratio,
        CAST(n_distinct AS DOUBLE) / n_toks AS distinct_ratio,
        (CAST(n_stop AS DOUBLE) / n_toks) * 0.5
          + (CAST(n_distinct AS DOUBLE) / n_toks) * 0.3
          + least(CAST(n_chars AS DOUBLE) / 500.0, 1.0) * 0.2 AS quality
      FROM m"""))

  /** Q28 — language-ID heuristic: marker-token votes with a fixed
    * precedence tie-break (the deterministic skeleton of an n-gram
    * language classifier; real marker lists slot in unchanged). */
  val q28: Q = Q(
    "q28_text_lang_id",
    run = { (spark, dir) =>
      Tables.documentsParallel(spark, dir)
        .withColumn("toks", split(col("text"), " "))
        .withColumn("s_en", expr("size(filter(toks, t -> t = 'the' OR t = 'a'))"))
        .withColumn("s_de", expr("size(filter(toks, t -> t = 'der' OR t = 'die'))"))
        .withColumn("s_es", expr("size(filter(toks, t -> t = 'el' OR t = 'la'))"))
        .withColumn("s_fr", expr("size(filter(toks, t -> t = 'le' OR t = 'les'))"))
        .withColumn("lang_guess",
          when(col("s_en") >= greatest(col("s_de"), col("s_es"), col("s_fr")), "en")
            .when(col("s_de") >= greatest(col("s_es"), col("s_fr")), "de")
            .when(col("s_es") >= col("s_fr"), "es")
            .otherwise("fr"))
        .select(col("doc_id"), col("lang"), col("lang_guess"),
          (col("lang") === col("lang_guess")).as("hit"))
    },
    oracle = Some("""
      WITH d AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
      s AS (SELECT doc_id, lang,
              len(list_filter(toks, t -> t = 'the' OR t = 'a')) AS s_en,
              len(list_filter(toks, t -> t = 'der' OR t = 'die')) AS s_de,
              len(list_filter(toks, t -> t = 'el' OR t = 'la')) AS s_es,
              len(list_filter(toks, t -> t = 'le' OR t = 'les')) AS s_fr
            FROM d)
      SELECT doc_id, lang,
        CASE WHEN s_en >= greatest(s_de, s_es, s_fr) THEN 'en'
             WHEN s_de >= greatest(s_es, s_fr) THEN 'de'
             WHEN s_es >= s_fr THEN 'es'
             ELSE 'fr' END AS lang_guess,
        lang = (CASE WHEN s_en >= greatest(s_de, s_es, s_fr) THEN 'en'
                     WHEN s_de >= greatest(s_es, s_fr) THEN 'de'
                     WHEN s_es >= s_fr THEN 'es'
                     ELSE 'fr' END) AS hit
      FROM s"""))

  /** Q29 — order-insensitive document fingerprint (md5 of the sorted
    * distinct token set): catches shuffled/reordered duplicates that the
    * exact hash misses. */
  val q29: Q = Q(
    "q29_text_fingerprint",
    run = { (spark, dir) =>
      Tables.documentsParallel(spark, dir)
        .select(col("doc_id"), TextFunctions.fingerprint(col("text")).as("fp"))
        .groupBy(col("fp"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_doc_id"))
    },
    oracle = Some("""
      SELECT md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fp,
        CAST(count(*) AS BIGINT) AS n_docs, min(doc_id) AS min_doc_id
      FROM documents GROUP BY 1"""))

  /** q53 — corpus-statistics quality score: every token's corpus
    * frequency is aggregated once, joined back per token occurrence,
    * and each document scores by its mean and rarest token frequency —
    * the two-pass shape of a statistical quality filter (a document of
    * corpus-rare tokens is likely noise). All-integer inputs and an
    * exact decimal mean keep it deterministic for the oracle (no logs,
    * whose last-ulp libm differences diverge between engines).
    *
    * Scale shape: one explode + two hash-agg shuffles + one join on
    * `token` — the frequency table is corpus-vocabulary-sized, so the
    * join broadcasts while the vocabulary is small and shuffles when it
    * is not (no forced hint).
    */
  val q53: Q = Q(
    "q53_text_rarity_score",
    run = { (spark, dir) =>
      val toks = Tables.documentsParallel(spark, dir)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      val freq = toks.groupBy("token").agg(count(lit(1)).as("tf"))
      toks.join(freq, "token")
        .groupBy("doc_id")
        .agg(
          count(lit(1)).as("n_toks"),
          // exact decimal mean of integer frequencies (order-free),
          // surfaced as double (the canonicalizer's numeric type)
          (sum(col("tf").cast(DecimalType(20, 0)))
            .cast(DecimalType(24, 6)) / count(lit(1)))
            .cast(DecimalType(24, 6)).cast(DoubleType).as("mean_tf"),
          min(col("tf")).as("rarest_tf"))
    },
    oracle = Some("""
      WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
                    FROM documents),
      freq AS (SELECT token, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY 1)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_toks,
        CAST(CAST(CAST(sum(tf) AS DECIMAL(24,6)) / count(*) AS DECIMAL(24,6)) AS DOUBLE) AS mean_tf,
        min(tf) AS rarest_tf
      FROM toks JOIN freq USING (token)
      GROUP BY doc_id"""))

  /** Core of q97: DIRECTED shingle-containment pairs — doc a is
    * "contained in" doc b when ≥ 80% of a's distinct 3-gram shingles
    * also appear in b. The asymmetric twin of q24's Jaccard: a short
    * doc quoting a long one scores near-zero Jaccard (union dominated
    * by the long doc) but near-100% containment, so this is the
    * modality that catches quotation/excerpt duplication.
    *
    * Scale: candidate pairs are generated per co-occurring shingle, and
    * shingles with document frequency > maxDf are EXCLUDED first (a
    * shingle shared by 50+ docs is boilerplate, not containment
    * evidence — and it is exactly the bucket that would blow the
    * self-join up quadratically). Both the numerator and denominator
    * count only surviving rare shingles, so the 80% threshold stays an
    * honest fraction of comparable sets. No source blocking on purpose:
    * cross-source quoting is the signal (q59's overlap matrix shape,
    * but at pair granularity). */
  /** The shared first stage of [[containmentPairs]] and
    * [[winnowedContainment]]: each doc's DISTINCT 3-gram shingles with
    * the df-capped boilerplate set removed. */
  private def rareShingles(docs: org.apache.spark.sql.DataFrame,
      maxDf: Int): org.apache.spark.sql.DataFrame = {
    val sh = docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"),
        explode(TextFunctions.shinglesExpr("toks", 3)).as("shingle"))
    // no global .distinct(): shinglesExpr is array_distinct per doc, so
    // (doc_id, shingle) rows are already unique (round 16, guide §2.4)
    // rare-shingle universe: df-capped (the hot set is vocabulary-
    // bounded, so the exclusion join broadcasts at any corpus size).
    // The shared (doc, shingle) subtree is deliberately NOT
    // Stage.materialize'd: exchange reuse already deduplicates it (two
    // ReusedExchange nodes in the executed plan) and a measured A/B at
    // sf0.1 had parquet staging 17% SLOWER (2.49 s vs 2.13 s min-of-3)
    val hot = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf).select(col("shingle"))
    sh.join(broadcast(hot), Seq("shingle"), "left_anti")
  }

  /** Session-memoized STAGED rare-shingle table per corpus path —
    * q97's exact containment and q116's verifier both consume it. The
    * intra-query A/B (see [[rareShingles]]) showed staging SLOWER for a
    * single query (exchange reuse already deduplicates the subtree);
    * the cross-QUERY reuse here is a different trade — the derivation
    * runs once per session instead of once per consumer per pass. */
  private def rareShinglesFor(spark: org.apache.spark.sql.SparkSession,
      dir: String, maxDf: Int = 50): org.apache.spark.sql.DataFrame =
    graft.operators.SessionCache.memoOn(spark, dir,
      s"rare-shingles|$dir|$maxDf") {
      graft.operators.Stage.materialize(
        rareShingles(graft.Tables.documentsParallel(spark, dir)
          .filter(col("text").isNotNull), maxDf),
        "rare-shingles")
    }

  def containmentPairs(docs: org.apache.spark.sql.DataFrame,
      minShingles: Int = 5, maxDf: Int = 50,
      thresholdPct: Int = 80): org.apache.spark.sql.DataFrame =
    containmentPairsFrom(rareShingles(docs, maxDf), minShingles,
      thresholdPct)

  /** The pairing half over an already-computed rare-shingle table. */
  def containmentPairsFrom(rare: org.apache.spark.sql.DataFrame,
      minShingles: Int = 5,
      thresholdPct: Int = 80): org.apache.spark.sql.DataFrame = {
    val cnt = rare.groupBy(col("doc_id")).agg(count(lit(1)).as("n_a"))
    // both join sides carry their doc's rare-shingle count so the
    // size-ratio prune runs INSIDE the pair join (q24's lossless trick,
    // asymmetric form): n_shared <= n_b always, so a candidate with
    // n_b·100 < threshold·n_a can never pass the final filter — pruning
    // it here shrinks the pair-aggregation shuffle, not the answer
    val rc = rare.join(cnt, "doc_id")
    val pairs = rc.select(col("doc_id").as("doc_a"), col("shingle"),
        col("n_a"))
      .join(rc.select(col("doc_id").as("doc_b"),
        col("shingle").as("shingle_b"), col("n_a").as("n_b")),
        col("shingle") === col("shingle_b") && col("doc_a") =!= col("doc_b") &&
          col("n_b") * 100 >= col("n_a") * thresholdPct &&
          col("n_a") >= minShingles)
      .groupBy(col("doc_a"), col("doc_b"), col("n_a"))
      .agg(count(lit(1)).as("n_shared"))
    pairs
      .filter(col("n_shared") * 100 >= col("n_a") * thresholdPct)
      .select(col("doc_a"), col("doc_b"), col("n_a"), col("n_shared"),
        expr("(n_shared * 100) div n_a").as("cont_pct"))
  }

  /** The declared SCALE PATH for [[containmentPairs]] on an UNBLOCKED
    * corpus (BASELINE.md's q97 100× caveat): q112's winnowing
    * fingerprints propose candidate pairs sub-quadratically (bucket-
    * bounded by the fingerprint df cap), and q97's exact containment
    * arithmetic verifies ONLY those candidates — the rare-shingle
    * self-join never runs corpus×corpus.
    *
    * Winnowing's match guarantee (any shared run of ≥ w+k−1 tokens
    * shares a fingerprint) makes the blocker high-recall for
    * quotation-shaped overlap — a doc that is 80% contained in another
    * shares long token runs with it — but scattered single-shingle
    * overlap can pass q97 while never sharing a fingerprint window, so
    * recall < 1 is possible by construction; the suite measures it on
    * the fixture corpus instead of assuming it. Output schema and
    * thresholds are exactly [[containmentPairs]]'s, so the two
    * modalities are drop-in interchangeable.
    */
  def winnowedContainment(docs: org.apache.spark.sql.DataFrame,
      minShingles: Int = 5, maxDf: Int = 50, thresholdPct: Int = 80,
      w: Int = 4, dfCap: Int = 10): org.apache.spark.sql.DataFrame =
    winnowedContainmentFrom(
      graft.queries.Lexical.winnowingFingerprints(docs, w),
      rareShingles(docs, maxDf), minShingles, thresholdPct, dfCap)

  /** The composed modality over already-computed fingerprint and
    * rare-shingle tables (what the registry runs against the
    * session-shared artifacts). */
  def winnowedContainmentFrom(fps: org.apache.spark.sql.DataFrame,
      rare: org.apache.spark.sql.DataFrame, minShingles: Int = 5,
      thresholdPct: Int = 80,
      dfCap: Int = 10): org.apache.spark.sql.DataFrame = {
    // undirected winnowing candidates, expanded to both directions (the
    // containment check is asymmetric: a-in-b and b-in-a both need a row)
    val cand = graft.queries.Lexical.winnowingPairsFrom(fps, dfCap)
      .select(col("doc_a"), col("doc_b"))
    val dirCand = cand.unionByName(
      cand.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
    val cnt = rare.groupBy(col("doc_id")).agg(count(lit(1)).as("n_a"))
    // per-candidate exact verification: stream a's rare shingles into
    // the candidate set, count how many b also carries. Both joins are
    // equi-keyed; the exploded frame is |candidates| × shingles-per-doc
    // — candidate-bounded, never corpus².
    val shared = dirCand
      .join(rare.select(col("doc_id").as("doc_a"), col("shingle")), "doc_a")
      .join(rare.select(col("doc_id").as("b_id"),
        col("shingle").as("shingle_b")),
        col("doc_b") === col("b_id") && col("shingle") === col("shingle_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
    shared
      .join(cnt.select(col("doc_id").as("doc_a"), col("n_a")), "doc_a")
      .filter(col("n_a") >= minShingles &&
        col("n_shared") * 100 >= col("n_a") * thresholdPct)
      .select(col("doc_a"), col("doc_b"), col("n_a"), col("n_shared"),
        expr("(n_shared * 100) div n_a").as("cont_pct"))
  }

  /** q97 — directed shingle containment (quotation/excerpt detection). */
  val q97: Q = Q(
    "q97_shingle_containment",
    run = { (spark, dir) =>
      containmentPairsFrom(rareShinglesFor(spark, dir))
    },
    oracle = Some("""
      WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
                 FROM documents WHERE text IS NOT NULL),
      g AS (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 2)) AS i
            FROM d WHERE len(toks) >= 3),
      sh AS (SELECT DISTINCT doc_id,
               toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
             FROM g),
      rare AS (SELECT doc_id, shingle FROM sh
               WHERE shingle NOT IN (
                 SELECT shingle FROM sh GROUP BY shingle
                 HAVING count(*) > 50)),
      cnt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_a
              FROM rare GROUP BY doc_id),
      pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  CAST(count(*) AS BIGINT) AS n_shared
                FROM rare a JOIN rare b
                  ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
                GROUP BY 1, 2)
      SELECT doc_a, doc_b, n_a, n_shared,
        (n_shared * 100) // n_a AS cont_pct
      FROM pairs JOIN cnt ON cnt.doc_id = doc_a
      WHERE n_a >= 5 AND n_shared * 100 >= n_a * 80"""))

  /** q116 — winnowing-blocked containment: the composed scale modality
    * (q112 proposes, q97 verifies), registered and oracle-checked in its
    * own right so the sub-quadratic path is held to the same hash gate
    * as the exact one. */
  val q116: Q = Q(
    "q116_winnowed_containment",
    run = { (spark, dir) =>
      winnowedContainmentFrom(
        graft.queries.Lexical.fingerprintsFor(spark, dir),
        rareShinglesFor(spark, dir))
    },
    oracle = Some("""
      WITH dnn AS (SELECT doc_id, text FROM documents
                   WHERE text IS NOT NULL),
      toks AS (
        SELECT doc_id, CAST(pos AS INTEGER) AS pos, toks[pos + 1] AS tok
        FROM (SELECT doc_id, string_split(text, ' ') AS toks,
                unnest(generate_series(0, len(string_split(text, ' ')) - 1)) AS pos
              FROM dnn)),
      grams AS (
        SELECT doc_id, pos,
          md5(tok || ' ' || lead(tok, 1) OVER w || ' ' || lead(tok, 2) OVER w) AS h,
          lead(tok, 2) OVER w AS t2
        FROM toks
        WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
      g AS (SELECT doc_id, pos, h FROM grams WHERE t2 IS NOT NULL),
      sel AS (
        SELECT doc_id, pos, min(h) OVER fw AS fp, count(*) OVER fw AS wlen
        FROM g
        WINDOW fw AS (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING)),
      fps AS (SELECT doc_id, fp FROM sel WHERE wlen = 4 OR pos = 0
              GROUP BY doc_id, fp),
      fdf AS (SELECT fp FROM fps GROUP BY fp
              HAVING count(*) >= 2 AND count(*) <= 10),
      wpairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM fps a JOIN fdf USING (fp)
        JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
        GROUP BY 1, 2 HAVING count(*) >= 2),
      cand AS (SELECT doc_a, doc_b FROM wpairs
               UNION ALL SELECT doc_b AS doc_a, doc_a AS doc_b FROM wpairs),
      d97 AS (SELECT doc_id, string_split(text, ' ') AS toks FROM dnn),
      g97 AS (SELECT doc_id, toks,
                unnest(generate_series(1, len(toks) - 2)) AS i
              FROM d97 WHERE len(toks) >= 3),
      sh AS (SELECT DISTINCT doc_id,
               toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
             FROM g97),
      rare AS (SELECT doc_id, shingle FROM sh
               WHERE shingle NOT IN (
                 SELECT shingle FROM sh GROUP BY shingle
                 HAVING count(*) > 50)),
      cnt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_a
              FROM rare GROUP BY doc_id),
      ver AS (
        SELECT c.doc_a, c.doc_b, CAST(count(*) AS BIGINT) AS n_shared
        FROM cand c
        JOIN rare ra ON ra.doc_id = c.doc_a
        JOIN rare rb ON rb.doc_id = c.doc_b AND rb.shingle = ra.shingle
        GROUP BY 1, 2)
      SELECT v.doc_a, v.doc_b, cnt.n_a, v.n_shared,
        (v.n_shared * 100) // cnt.n_a AS cont_pct
      FROM ver v JOIN cnt ON cnt.doc_id = v.doc_a
      WHERE cnt.n_a >= 5 AND v.n_shared * 100 >= cnt.n_a * 80"""))

  val all: Seq[Q] = Seq(q23, q24, q26, q27, q28, q29, q53, q97, q116)
}
