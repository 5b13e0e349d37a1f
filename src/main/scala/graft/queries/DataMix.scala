package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame
import graft.{Q, Tables}

/** Corpus-composition operators (SURVEY.md §2.8, round-8 additions):
  * the two "decide WHAT the training mix is" primitives that run after
  * dedup/quality and before splits —
  *
  *  - q109: DSIR-style importance weighting (Xie et al. 2023, "Data
  *    Selection for Language Models via Importance Resampling"): score
  *    every document by how much its unigram distribution looks like a
  *    TARGET domain relative to the raw corpus, then select the
  *    above-average half. The reference pipeline has no analogue — this
  *    is the published recipe a 100 TB pretraining pipeline actually
  *    runs to pick domain-relevant data.
  *  - q110: temperature-based source mixing (the multilingual-sampling
  *    recipe from mBERT/XLM — sample source s proportional to n_s^α,
  *    α=½, so small sources are upweighted relative to their raw share):
  *    deterministic per-source token budgets plus an md5-ranked greedy
  *    fill, so the selected subset is a pure function of the corpus.
  *
  * Both follow the repo's hash-portability recipes: q109 keeps every
  * per-feature weight in INTEGER milli-units (the q68/q90/q102 recipe —
  * ratios instead of logs, `DIV` ≡ DuckDB `//` on non-negatives) and
  * q110 draws its ranking from the q50/q83 md5 recipe and its weights
  * from an exact integer sqrt, so neither hash rests on float math.
  */
object DataMix {

  /** Core of q109 over any (doc_id, lang, text) frame: importance
    * weight of each document for a target domain, as fixed-point
    * integers.
    *
    * DSIR proper scores log p_tgt(x) − log p_raw(x) under hashed-ngram
    * bag models. This keeps the same estimator shape but swaps each
    * per-feature log-ratio for the RATIO itself in milli-units
    * (ln is monotone per feature; the repo's integer-score recipe —
    * a portable deterministic proxy, documented not hidden):
    *
    *   ratio_k(t) = 1000 · (cnt_tgt(t)+1)(raw_total+V) /
    *                       ((cnt_raw(t)+1)(tgt_total+V))
    *
    * i.e. add-one-smoothed p̂_tgt(t)/p̂_raw(t). A document's score is
    * the tf-weighted mean over its tokens: `score_k = Σ tf·ratio_k DIV
    * dl`, and `selected` marks the above-corpus-mean half
    * (`score_k · n_docs ≥ Σ score_k` — integer cross-multiply, no
    * division rounding).
    *
    * Scale shape: one corpus-sized shuffle builds tf (staged once — it
    * feeds the vocab table AND the scoring join); the per-token count
    * table is vocabulary-bounded (broadcast side of the scoring join);
    * the corpus scalars and the selection mean are 1-row broadcasts.
    * At 100 TB nothing here is quadratic and no join shuffles the
    * corpus twice. Overflow bound: the widest product is
    * (cnt_tgt+1)·(raw_total+V)·1000 — safe in BIGINT while
    * cnt·total ≤ 9·10^15 (≈ PB-scale corpora; beyond that the ratio
    * moves to DECIMAL(38,0) unchanged).
    *
    * Reference analogue: none (the wine DAG has no selection stage);
    * the published DSIR recipe is the spec. */
  def dsirWeights(d: DataFrame, targetLang: String = "en"): DataFrame = {
    val docs = d.filter(col("text").isNotNull && col("lang").isNotNull)
      .select(col("doc_id"), col("lang"), col("text"))
    val toks = docs.select(col("doc_id"), col("lang"),
      explode(split(col("text"), " ")).as("token"))
    val tf = graft.operators.Stage.materialize(
      toks.groupBy(col("doc_id"), col("lang"), col("token"))
        .agg(count(lit(1)).as("tf")),
      "dsir-tf")
    val vocab = tf.groupBy(col("token")).agg(
      sum(col("tf")).as("cnt_raw"),
      sum(when(col("lang") === targetLang, col("tf")).otherwise(lit(0L)))
        .as("cnt_tgt"))
    val scal = vocab.agg(
      sum(col("cnt_raw")).as("raw_total"),
      sum(col("cnt_tgt")).as("tgt_total"),
      count(lit(1)).as("v_size"))
    val ratio = vocab.crossJoin(broadcast(scal))
      .withColumn("ratio_k", expr(
        "((cnt_tgt + 1) * (raw_total + v_size) * 1000) DIV " +
          "((cnt_raw + 1) * (tgt_total + v_size))"))
      .select(col("token"), col("ratio_k"))
    // staged (round 16): `scored` feeds the selection mean AND the
    // final projection — unstaged, the tf⋈ratio scoring agg ran twice
    // per run. Doc-grain rows.
    val scored = graft.operators.Stage.materialize(
      tf.join(broadcast(ratio), "token")
        .groupBy(col("doc_id"), col("lang"))
        .agg(sum(col("tf")).as("dl"),
          sum(col("tf") * col("ratio_k")).as("score_raw"))
        .withColumn("score_k", expr("score_raw DIV dl"))
        .select(col("doc_id"), col("lang"), col("dl"), col("score_k")),
      "dsir-scored")
    val mean = scored.agg(sum(col("score_k")).as("sum_score"),
      count(lit(1)).as("n_docs"))
    scored.crossJoin(broadcast(mean))
      .withColumn("selected",
        when(col("score_k") * col("n_docs") >= col("sum_score"), lit(1))
          .otherwise(lit(0)))
      .select(col("doc_id"), col("lang"), col("dl"), col("score_k"),
        col("selected"))
  }

  /** q109 — DSIR-style importance weights against the en target. */
  val q109: Q = Q(
    "q109_dsir_weights",
    run = { (spark, dir) => dsirWeights(Tables.documents(spark, dir)) },
    oracle = Some("""
      WITH d AS (SELECT doc_id, lang, text FROM documents
                 WHERE text IS NOT NULL AND lang IS NOT NULL),
      toks AS (SELECT doc_id, lang,
                 unnest(string_split(text, ' ')) AS token FROM d),
      tf AS (SELECT doc_id, lang, token, CAST(count(*) AS BIGINT) AS tf
             FROM toks GROUP BY doc_id, lang, token),
      vocab AS (SELECT token, CAST(sum(tf) AS BIGINT) AS cnt_raw,
                  CAST(sum(CASE WHEN lang = 'en' THEN tf ELSE 0 END)
                    AS BIGINT) AS cnt_tgt
                FROM tf GROUP BY token),
      scal AS (SELECT CAST(sum(cnt_raw) AS BIGINT) AS raw_total,
                 CAST(sum(cnt_tgt) AS BIGINT) AS tgt_total,
                 CAST(count(*) AS BIGINT) AS v_size FROM vocab),
      ratio AS (SELECT token,
                  ((cnt_tgt + 1) * (raw_total + v_size) * 1000) //
                    ((cnt_raw + 1) * (tgt_total + v_size)) AS ratio_k
                FROM vocab CROSS JOIN scal),
      scored AS (SELECT tf.doc_id, tf.lang,
                   CAST(sum(tf.tf) AS BIGINT) AS dl,
                   CAST(sum(tf.tf * ratio.ratio_k) AS BIGINT) AS score_raw
                 FROM tf JOIN ratio USING (token)
                 GROUP BY tf.doc_id, tf.lang),
      sc2 AS (SELECT doc_id, lang, dl, score_raw // dl AS score_k
              FROM scored),
      m AS (SELECT CAST(sum(score_k) AS BIGINT) AS sum_score,
              CAST(count(*) AS BIGINT) AS n_docs FROM sc2)
      SELECT doc_id, lang, dl, score_k,
        CASE WHEN score_k * n_docs >= sum_score THEN 1 ELSE 0 END AS selected
      FROM sc2 CROSS JOIN m"""))

  /** Exact integer sqrt: floor(sqrt(n)) with the one-off correction for
    * the double rounding UP past a perfect square (sqrt(k²−1) can round
    * to k). Identical expression on both engines. */
  private[graft] def isqrtExpr(n: String): String =
    s"(CASE WHEN CAST(floor(sqrt($n)) AS BIGINT) * " +
      s"CAST(floor(sqrt($n)) AS BIGINT) > $n " +
      s"THEN CAST(floor(sqrt($n)) AS BIGINT) - 1 " +
      s"ELSE CAST(floor(sqrt($n)) AS BIGINT) END)"

  /** Core of q110 over any (doc_id, source, text) frame: temperature-
    * based source mixing at α = ½ — per-source sampling weights
    * w_s = isqrt(n_s) (∝ n_s^α; the exact integer sqrt keeps the weight
    * table hash-portable), a global token budget B = Σn_s DIV 2, per-
    * source budgets `b_s = B·w_s DIV Σw`, and a deterministic greedy
    * fill: docs ranked inside each source by `md5('mix|' ‖ doc_id)`
    * (the q50/q83 draw recipe — engine- and partitioning-stable), kept
    * while the running token total stays within b_s.
    *
    * Downweighting large sources and upweighting small ones is the
    * standard multilingual-pretraining mix (XLM's α-smoothed sampling);
    * making the draw a hash rank instead of an RNG makes the selected
    * subset reproducible across runs, engines, and partitionings — the
    * property every other sampler in this repo (q50–q54, q74, q83)
    * already guarantees.
    *
    * Scale shape: the weight/budget tables are source-count-sized
    * (broadcast); the corpus is touched twice — once for per-source
    * token counts (one hash-agg), once for the ranked cumulative fill.
    * The per-source window is one reducer per source; with config-scale
    * source counts that is the natural layout (same posture as q58
    * pack_sequences), and a pathological single-giant-source corpus
    * would swap in the two-phase partial-sum cumulative, contract
    * unchanged. */
  def sourceMix(d: DataFrame): DataFrame = {
    val docs = d.filter(col("text").isNotNull && col("source").isNotNull)
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
    val bySrc = docs.groupBy(col("source"))
      .agg(sum(col("n_tok")).as("src_tok"))
      .withColumn("w", expr(isqrtExpr("src_tok")))
    val tot = bySrc.agg(sum(col("src_tok")).as("all_tok"),
      sum(col("w")).as("sum_w"))
    val budgets = bySrc.crossJoin(broadcast(tot))
      .withColumn("budget", expr("((all_tok DIV 2) * w) DIV sum_w"))
      .select(col("source"), col("src_tok"), col("budget"))
    val h = md5(concat(lit("mix|"), col("doc_id").cast("string")))
    val w = Window.partitionBy(col("source"))
      .orderBy(h.asc, col("doc_id").asc)
    docs
      .withColumn("rnk", row_number().over(w))
      .withColumn("cum_tok", sum(col("n_tok")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .join(broadcast(budgets), "source")
      .filter(col("cum_tok") <= col("budget"))
      .select(col("doc_id"), col("source"), col("n_tok"), col("rnk"),
        col("cum_tok"), col("budget"))
  }

  /** q110 — α=½ temperature mix with deterministic greedy fill. */
  val q110: Q = Q(
    "q110_source_mix",
    run = { (spark, dir) => sourceMix(Tables.documents(spark, dir)) },
    oracle = Some("""
      WITH docs AS (SELECT doc_id, source,
                      CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
                    FROM documents
                    WHERE text IS NOT NULL AND source IS NOT NULL),
      bysrc AS (SELECT source, CAST(sum(n_tok) AS BIGINT) AS src_tok
                FROM docs GROUP BY source),
      wt AS (SELECT source, src_tok,
               (CASE WHEN CAST(floor(sqrt(src_tok)) AS BIGINT) *
                       CAST(floor(sqrt(src_tok)) AS BIGINT) > src_tok
                 THEN CAST(floor(sqrt(src_tok)) AS BIGINT) - 1
                 ELSE CAST(floor(sqrt(src_tok)) AS BIGINT) END) AS w
             FROM bysrc),
      tot AS (SELECT CAST(sum(src_tok) AS BIGINT) AS all_tok,
                CAST(sum(w) AS BIGINT) AS sum_w FROM wt),
      budgets AS (SELECT source, src_tok,
                    ((all_tok // 2) * w) // sum_w AS budget
                  FROM wt CROSS JOIN tot),
      ranked AS (SELECT doc_id, source, n_tok,
                   CAST(row_number() OVER win AS INTEGER) AS rnk,
                   CAST(sum(n_tok) OVER (win
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS cum_tok
                 FROM docs
                 WINDOW win AS (PARTITION BY source
                   ORDER BY md5('mix|' || CAST(doc_id AS VARCHAR)) ASC,
                     doc_id ASC))
      SELECT r.doc_id, r.source, r.n_tok, r.rnk, r.cum_tok, b.budget
      FROM ranked r JOIN budgets b USING (source)
      WHERE r.cum_tok <= b.budget"""))

  /** Core of q114 over any (doc_id, source, n_chars, text) frame:
    * deterministic curriculum export order — clean data first,
    * round-robin across sources inside each stage. */
  def curriculumOrder(d: DataFrame): DataFrame = {
    val scored = d.filter(col("text").isNotNull)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_toks", size(col("toks")))
      .withColumn("n_distinct", size(array_distinct(col("toks"))))
      .withColumn("n_stop",
        expr("size(filter(toks, t -> t = 'the' OR t = 'a' OR t = 'of'" +
          " OR t = 'and' OR t = 'to'))"))
      // quality in INTEGER micro-units (the q68/q101 fixed-point recipe):
      // 0.5·stop_ratio + 0.3·distinct_ratio + 0.2·min(n_chars/500, 1),
      // scaled ×1e6 and floored per term. A double-valued quality chain
      // would hand the percentile agg engine-wobbly inputs — the decile
      // cutpoint then sits a knife-edge `c < quality` comparison away
      // from a cross-engine hash flip; integer inputs make the sorted
      // percentile array bit-identical in both engines (the q76 shape).
      .withColumn("quality", expr(
        "(CAST(n_stop AS BIGINT) * 500000) DIV n_toks + " +
          "(CAST(n_distinct AS BIGINT) * 300000) DIV n_toks + " +
          "least(CAST(n_chars AS BIGINT) * 400, 200000)"))
      .select(col("doc_id"), col("source"), col("quality"))
    // value-semantics deciles via the q76 recipe: one percentile agg,
    // broadcast back, per-row fold — never a global ntile sort
    val cuts = scored.agg(percentile(col("quality"),
      array((1 to 9).map(i => lit(i / 10.0)): _*)).as("cuts"))
    val staged = scored.crossJoin(broadcast(cuts))
      .select(col("doc_id"), col("source"), col("quality"),
        (lit(9) - expr("size(filter(cuts, c -> c < quality))")).as("stage"))
    val bySrc = Window.partitionBy(col("stage"), col("source"))
      .orderBy(col("quality").desc, col("doc_id").asc)
    val inStage = Window.partitionBy(col("stage"))
      .orderBy(col("src_seq").asc, col("source").asc, col("doc_id").asc)
    staged
      .withColumn("src_seq", row_number().over(bySrc))
      .withColumn("stage_order", row_number().over(inStage))
  }

  /** q114 — curriculum construction (data ordering for training):
    * stage 0 holds the cleanest decile of the corpus and stages climb
    * toward the noisiest (the curriculum-learning export order —
    * clean-to-noisy is the standard warm-up schedule), and inside each
    * stage the sources are interleaved round-robin (src_seq-major
    * order) so no contiguous run of one source biases a training
    * window. Quality is q27's stopword/distinct/length score; stages
    * are value-semantics deciles per the q76 recipe (percentile
    * cutpoints broadcast back, ties land together — hash-checkable
    * where ntile's arbitrary tie split is not).
    *
    * Scale shape: the score is a per-row projection; the cutpoint agg
    * is one partial-agg tree to a 9-element row. The in-stage
    * round-robin window partitions by (stage, source) then stage —
    * the testbed materializes stage_order for the oracle; production
    * keeps (stage, src_seq, source, doc_id) as the SORT KEY of a
    * range-partitioned write (the order matters, not the dense
    * number), so no 10-reducer window survives at 100 TB. */
  val q114: Q = Q(
    "q114_curriculum",
    run = { (spark, dir) =>
      curriculumOrder(Tables.documentsParallel(spark, dir))
    },
    oracle = Some("""
      WITH scored AS (
        SELECT doc_id, source,
          (CAST(len(list_filter(string_split(text, ' '),
             t -> t = 'the' OR t = 'a' OR t = 'of' OR t = 'and' OR t = 'to'))
             AS BIGINT) * 500000) // len(string_split(text, ' ')) +
          (CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
             * 300000) // len(string_split(text, ' ')) +
          least(CAST(n_chars AS BIGINT) * 400, 200000) AS quality
        FROM documents WHERE text IS NOT NULL),
      cuts AS (SELECT quantile_cont(quality,
                 [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS cuts
               FROM scored),
      staged AS (
        SELECT doc_id, source, quality,
          9 - len(list_filter(cuts.cuts, c -> c < quality)) AS stage
        FROM scored, cuts),
      seq AS (
        SELECT doc_id, source, quality, CAST(stage AS INTEGER) AS stage,
          CAST(row_number() OVER (PARTITION BY stage, source
            ORDER BY quality DESC, doc_id ASC) AS INTEGER) AS src_seq
        FROM staged)
      SELECT doc_id, source, quality, stage, src_seq,
        CAST(row_number() OVER (PARTITION BY stage
          ORDER BY src_seq ASC, source ASC, doc_id ASC) AS INTEGER)
          AS stage_order
      FROM seq"""))

  val all: Seq[Q] = Seq(q109, q110, q114)
}
