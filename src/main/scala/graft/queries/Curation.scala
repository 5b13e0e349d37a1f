package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** q148 — the end-to-end training-data curation pipeline, composed
  * from the library's own stage seams (SURVEY §2.8 round-11; the
  * round-10 verdict's "the operator a 100 TB training-data user
  * actually runs"):
  *
  *   dedup (q49 clustering → q60 canonical pick)
  *     → quality filter cascade (q98's four predicates, per-doc)
  *     → benchmark decontamination (q55's 8-gram overlap)
  *     → α=½ temperature source mix (q110)
  *     → 2048-token sequence packing (q58)
  *
  * hash-gated on the FINAL packed output, so the gate certifies every
  * stage AND every seam between stages. Each stage consumes the
  * previous stage's survivors; corpus-derived statistics (boilerplate
  * hot set, mix budgets) are computed over the stage's own input —
  * what a production pipeline over staged snapshots does. The ONE
  * deliberate difference from standalone q55: the benchmark shingle
  * set comes from the ORIGINAL corpus (the eval suite is fixed — a
  * benchmark doc deduplicated or quality-filtered away must still
  * flag its near-copies), while candidates are the cascade survivors.
  *
  * Scale shape: every inter-stage seam is a staged parquet barrier
  * (cur-dedup / cur-cascade / cur-decon), so no stage's lineage is
  * ever re-derived by a later stage — by pack time the plan reads
  * ONLY staged survivor tables, never the raw corpus (CurationSpec
  * asserts exactly this on the executed plan). Stage costs are the
  * proven per-operator shapes: block-bounded near-pair generation +
  * staged CC rounds (q49), vocabulary-bounded hot-shingle joins
  * (q71/q98), a broadcast benchmark set (q55 — MBs against 100 TB),
  * source-count-sized budget tables (q110), and one window on the
  * (source, doc_id) pack key (q58).
  */
object Curation {

  /** 8-token shingles of (doc_id, text) — the q55 contamination unit. */
  private def shingles8(docs: DataFrame): DataFrame =
    docs.filter(col("text").isNotNull)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 8)
      .select(col("doc_id"),
        explode(graft.functions.TextFunctions.shinglesExpr("toks", 8))
          .as("s"))

  /** The composed pipeline over any (doc_id, source, lang, n_chars,
    * text) frame. Returns the packed-sequence table (doc_id, source,
    * n_toks, start_off, pack_id) of the curated subset. */
  def curationPipeline(docs: DataFrame,
      exactNearPairs: Boolean = false,
      labels: Option[DataFrame] = None): DataFrame = {
    val Stage = graft.operators.Stage
    // 1) dedup: cluster → canonical winner; survivors staged. Callers
    // holding an already-landed label table (the registry rides the
    // session-shared one) pass it via `labels` — the
    // canonicalFromLabels seam, so the pipeline never re-clusters a
    // corpus some earlier consumer already clustered.
    val canon = (labels match {
      case Some(cl) => graft.ext.DedupCluster.canonicalFromLabels(cl, docs)
      case None => graft.ext.DedupCluster
        .canonicalDocs(docs, exactNearPairs = exactNearPairs)
    }).select(col("canon_doc_id").as("doc_id"))
    val (d1, d1Path) = Stage.materializeWithPath(
      docs.join(canon, Seq("doc_id"), "left_semi")
        .select(col("doc_id"), col("source"), col("lang"),
          col("n_chars"), col("text")),
      "cur-dedup")
    // 2) q98's cascade predicates as a per-doc keep (q98 reports the
    // funnel; the pipeline keeps the docs that survive all four)
    val withText = d1.filter(col("text").isNotNull)
    val rep = PipelineOps.repetitionStats(withText)
      .select(col("doc_id"), col("keep").as("p3"))
    val boil = CorpusOps.boilerplateScore(withText)
      .select(col("doc_id"), col("keep").as("p4"))
    val (d2, d2Path) = Stage.materializeWithPath(
      withText
        .withColumn("n_toks", size(split(col("text"), " ")))
        .join(rep, Seq("doc_id"), "left")
        .join(boil, Seq("doc_id"), "left")
        .filter(col("lang").isin("de", "en", "es", "fr", "zh") &&
          col("n_toks") >= 20 && col("n_toks") <= 2000 &&
          coalesce(col("p3"), lit(false)) &&
          coalesce(col("p4"), lit(false)))
        .select(col("doc_id"), col("source"), col("text")),
      "cur-cascade")
    // d2 has landed, and nothing downstream reads the dedup barrier
    // (decon's benchmark side reads the ORIGINAL corpus): drop it
    // eagerly — the iterative operators' discipline, so repeated
    // invocations don't accumulate corpus-sized directories until
    // shutdown (round-11 ADVICE)
    Stage.drop(d1, d1Path)
    // 3) decontamination: benchmark shingles from the ORIGINAL corpus
    // (fixed eval suite), candidates = cascade survivors; bench docs
    // themselves leave the training pool here (q55's output domain)
    val benchSh = shingles8(docs.filter(col("doc_id") % 97 === 0))
      .select(col("s")).distinct()
    val contaminated = shingles8(d2.filter(col("doc_id") % 97 =!= 0))
      .join(broadcast(benchSh), "s")
      .select(col("doc_id")).distinct()
    val (d3, d3Path) = Stage.materializeWithPath(
      d2.filter(col("doc_id") % 97 =!= 0)
        .join(contaminated, Seq("doc_id"), "left_anti"),
      "cur-decon")
    Stage.drop(d2, d2Path) // decon landed: the cascade barrier is spent
    val _ = d3Path // the RESULT scans d3 — it lives until JVM cleanup
    // 4) temperature mix over the clean pool; 5) pack the selection
    val selected = DataMix.sourceMix(d3).select(col("doc_id"))
    PipelineOps.packSequences(d3.join(selected, Seq("doc_id"), "left_semi"))
  }

  val q148: Q = Q(
    "q148_curation_pipeline",
    run = { (spark, dir) =>
      // the pipeline's three stage barriers land once per (session,
      // corpus snapshot) — repeated bench/verify invocations reuse the
      // decon barrier and recompute only the cheap mix+pack tail
      graft.operators.SessionCache.memoOn(spark, dir,
        s"curation-packed|$dir|${graft.ext.DedupCluster.oracleExactMode}") {
        curationPipeline(Tables.documentsParallel(spark, dir),
          labels = Some(graft.ext.DedupCluster.clustersFor(spark, dir,
            graft.ext.DedupCluster.oracleExactMode)))
      }
    },
    oracle = Some(graft.ext.DedupCluster.canonicalCtes + """,
      canon AS (SELECT doc_id FROM r WHERE rn = 1),
      s1 AS (SELECT doc.doc_id, doc.source, doc.lang, doc.text
             FROM documents doc JOIN canon USING (doc_id)),
      dd AS (SELECT doc_id, source, lang, text,
               string_split(text, ' ') AS toks
             FROM s1 WHERE text IS NOT NULL),
      rep2 AS (SELECT doc_id,
                 1.0 - CAST(len(list_distinct(list_transform(
                     generate_series(1, len(toks) - 1),
                     i -> toks[i] || ' ' || toks[i+1]))) AS DOUBLE)
                   / (len(toks) - 1) AS dup_bigram_frac,
                 CAST(list_max(list_transform(list_distinct(toks),
                     t -> len(list_filter(toks, x -> x = t)))) AS DOUBLE)
                   / len(toks) AS top_tok_frac
               FROM dd WHERE len(toks) >= 2),
      g2 AS (SELECT doc_id, toks,
               unnest(generate_series(1, len(toks) - 2)) AS i
             FROM dd WHERE len(toks) >= 3),
      sh2 AS (SELECT DISTINCT doc_id,
                toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS s
              FROM g2),
      hot2 AS (SELECT s FROM (SELECT s, count(*) AS nd FROM sh2 GROUP BY s)
               WHERE nd >= 5),
      perdoc2 AS (SELECT doc_id, count(*) AS n_shingles FROM sh2
                  GROUP BY doc_id),
      boiler2 AS (SELECT sh2.doc_id, count(*) AS n_boiler
                  FROM sh2 JOIN hot2 USING (s) GROUP BY sh2.doc_id),
      s2 AS (SELECT dd.doc_id, dd.source, dd.text, dd.toks
             FROM dd
             LEFT JOIN rep2 ON rep2.doc_id = dd.doc_id
             LEFT JOIN perdoc2 ON perdoc2.doc_id = dd.doc_id
             LEFT JOIN boiler2 ON boiler2.doc_id = dd.doc_id
             WHERE dd.lang IN ('de','en','es','fr','zh')
               AND len(dd.toks) >= 20 AND len(dd.toks) <= 2000
               AND COALESCE(rep2.dup_bigram_frac <= 0.2
                     AND rep2.top_tok_frac <= 0.2, false)
               AND COALESCE(CAST(COALESCE(boiler2.n_boiler, 0) AS DOUBLE)
                     / perdoc2.n_shingles <= 0.5, false)),
      bdoc AS (SELECT doc_id, string_split(text, ' ') AS toks
               FROM documents
               WHERE text IS NOT NULL AND doc_id % 97 = 0),
      bg AS (SELECT doc_id, toks,
               unnest(generate_series(1, len(toks) - 7)) AS i
             FROM bdoc WHERE len(toks) >= 8),
      bsh AS (SELECT DISTINCT
                toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' ||
                toks[i+3] || ' ' || toks[i+4] || ' ' || toks[i+5] || ' ' ||
                toks[i+6] || ' ' || toks[i+7] AS s
              FROM bg),
      cg AS (SELECT doc_id, toks,
               unnest(generate_series(1, len(toks) - 7)) AS i
             FROM s2 WHERE len(toks) >= 8 AND doc_id % 97 <> 0),
      csh AS (SELECT DISTINCT doc_id,
                toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' ||
                toks[i+3] || ' ' || toks[i+4] || ' ' || toks[i+5] || ' ' ||
                toks[i+6] || ' ' || toks[i+7] AS s
              FROM cg),
      cont AS (SELECT DISTINCT csh.doc_id FROM csh JOIN bsh USING (s)),
      s3 AS (SELECT doc_id, source, toks FROM s2
             WHERE doc_id % 97 <> 0
               AND doc_id NOT IN (SELECT doc_id FROM cont)),
      mdocs AS (SELECT doc_id, source,
                  CAST(len(toks) AS BIGINT) AS n_tok
                FROM s3 WHERE source IS NOT NULL),
      bysrc AS (SELECT source, CAST(sum(n_tok) AS BIGINT) AS src_tok
                FROM mdocs GROUP BY source),
      wt AS (SELECT source, src_tok,
               (CASE WHEN CAST(floor(sqrt(src_tok)) AS BIGINT) *
                       CAST(floor(sqrt(src_tok)) AS BIGINT) > src_tok
                 THEN CAST(floor(sqrt(src_tok)) AS BIGINT) - 1
                 ELSE CAST(floor(sqrt(src_tok)) AS BIGINT) END) AS w
             FROM bysrc),
      tot AS (SELECT CAST(sum(src_tok) AS BIGINT) AS all_tok,
                CAST(sum(w) AS BIGINT) AS sum_w FROM wt),
      budgets AS (SELECT source, ((all_tok // 2) * w) // sum_w AS budget
                  FROM wt CROSS JOIN tot),
      ranked AS (SELECT doc_id, source, n_tok,
                   CAST(sum(n_tok) OVER (win
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS cum_tok
                 FROM mdocs
                 WINDOW win AS (PARTITION BY source
                   ORDER BY md5('mix|' || CAST(doc_id AS VARCHAR)) ASC,
                     doc_id ASC)),
      sel AS (SELECT r.doc_id FROM ranked r JOIN budgets b USING (source)
              WHERE r.cum_tok <= b.budget),
      pd AS (SELECT s3.doc_id, s3.source,
               COALESCE(CAST(len(s3.toks) AS BIGINT), 0) AS n_toks
             FROM s3 JOIN sel USING (doc_id)),
      pw AS (SELECT doc_id, source, n_toks,
               sum(n_toks) OVER (PARTITION BY source ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
             FROM pd)
      SELECT doc_id, source, n_toks,
        CAST(cum - n_toks AS BIGINT) AS start_off,
        CAST((cum - n_toks) // 2048 AS BIGINT) AS pack_id
      FROM pw"""))

  val all: Seq[Q] = Seq(q148)
}
