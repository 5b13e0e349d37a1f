package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Dataset splitting & sampling for training-data pipelines
  * (SURVEY.md §2.D): the ops that carve a corpus into train/val/test
  * and draw stratified subsets.
  *
  * Splitting is HASH-based, not RNG-based: a document's split is a pure
  * function of its content hash, so it is stable across runs, engines,
  * partitionings, and corpus growth (a new doc never moves an old doc
  * between splits — the property RNG-based splitting lacks). That also
  * makes it oracle-checkable: md5 hex is identical in Spark and DuckDB,
  * and the threshold compare is plain string ordering.
  *
  * Stratified sampling uses Spark's per-stratum Bernoulli `sampleBy`
  * (seeded, distributed, single pass). The draw is engine-specific, so
  * its contract is property-tested (per-stratum fractions), not
  * hash-compared.
  */
object Sampling {

  /** Deterministic train/val/test assignment from the md5 of
    * (doc_id, text). Fractions are expressed as hex-prefix thresholds
    * over the first 4 hex chars (65536 buckets): e.g. the default
    * ("cccc", "e666") ≈ 80% / 10% / 10%. */
  def hashSplit(docs: DataFrame, trainTo: String = "cccc",
      valTo: String = "e666"): DataFrame = {
    val bucket = substring(
      md5(concat_ws("|", col("doc_id").cast("string"), col("text"))), 1, 4)
    docs.select(col("doc_id"),
      when(bucket < lit(trainTo), lit("train"))
        .when(bucket < lit(valTo), lit("val"))
        .otherwise(lit("test")).as("split"))
  }

  /** Seeded stratified sample: `fraction` per stratum of `strataCol`.
    * One pass, no shuffle (per-row Bernoulli keyed by stratum). The
    * distinct-strata collect is bounded by the stratum cardinality —
    * strata are config-sized (languages, sources) by definition, like
    * the validation report's O(#checks); a high-cardinality column is
    * the wrong stratification key for this API. */
  def stratifiedSample(docs: DataFrame, strataCol: String,
      fraction: Double, seed: Long = 42L): DataFrame = {
    val strata = docs.select(strataCol).distinct()
      .collect().map(_.get(0)).toSeq
    docs.stat.sampleBy(strataCol,
      strata.map(s => s -> fraction).toMap, seed)
  }

  /** q50 — deterministic hash split: full doc→split map, hash-checked
    * against the same md5-prefix expression in DuckDB. */
  val q50: Q = Q(
    "q50_dataset_split",
    run = { (spark, dir) => hashSplit(Tables.documents(spark, dir)) },
    oracle = Some("""
      SELECT doc_id,
        CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || '|' || text), 1, 4) < 'cccc' THEN 'train'
             WHEN substr(md5(CAST(doc_id AS VARCHAR) || '|' || text), 1, 4) < 'e666' THEN 'val'
             ELSE 'test' END AS split
      FROM documents"""))

  /** Leakage-safe split: assign splits per DEDUP CLUSTER, not per
    * document, so exact and near duplicates of a training doc can never
    * land in val/test (train/test contamination — the failure mode of
    * per-doc splitting that [[hashSplit]] alone cannot prevent). The
    * split is keyed on the md5 of the cluster's canonical (min-id)
    * document, so it stays deterministic and content-derived. */
  def leakageSafeSplit(docs: DataFrame, trainTo: String = "cccc",
      valTo: String = "e666"): DataFrame = {
    val clusters = DedupCluster.clusters(docs)
    val canonical = docs.select(col("doc_id").as("cluster_id"),
      col("text").as("canon_text"))
    val clusterSplit = clusters.join(canonical, "cluster_id")
      .select(col("doc_id"), col("cluster_id"),
        substring(md5(concat_ws("|", col("cluster_id").cast("string"),
          col("canon_text"))), 1, 4).as("bucket"))
    clusterSplit.select(col("doc_id"), col("cluster_id"),
      when(col("bucket") < lit(trainTo), lit("train"))
        .when(col("bucket") < lit(valTo), lit("val"))
        .otherwise(lit("test")).as("split"))
  }

  /** q51 — stratified 30% sample per source (rows-only: the Bernoulli
    * draw is engine-specific; per-stratum fractions are
    * property-tested). Aggregated so the output is deterministic in
    * SHAPE (one row per stratum) even though membership is not. */
  val q51: Q = Q(
    "q51_stratified_sample",
    run = { (spark, dir) =>
      stratifiedSample(Tables.documents(spark, dir), "source", 0.3)
        .groupBy(col("source")).agg(count(lit(1)).as("n_sampled"))
    },
    oracle = None)

  /** q52 — leakage-safe split: per-cluster assignment, hash-checked end
    * to end (the oracle recomputes the connected components via the
    * recursive CTE and the same md5-prefix split of the canonical
    * doc). */
  val q52: Q = Q(
    "q52_split_leakage_safe",
    run = { (spark, dir) =>
      leakageSafeSplit(Tables.documentsParallel(spark, dir))
    },
    oracle = Some("""
      WITH RECURSIVE
      hx AS (SELECT doc_id, md5(text) AS h FROM documents),
      canon AS (SELECT h, min(doc_id) AS root FROM hx GROUP BY h),
      hpairs AS (SELECT c.root AS ea, x.doc_id AS eb FROM hx x JOIN canon c
                   ON x.h = c.h AND x.doc_id <> c.root),
      d AS (SELECT doc_id, source, string_split(text,' ') AS toks FROM documents),
      d3 AS (SELECT doc_id, source, toks, unnest(generate_series(1, len(toks)-2)) AS i
             FROM d WHERE len(toks) >= 3),
      sh AS (SELECT DISTINCT doc_id, source,
               toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle FROM d3),
      cnt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY 1),
      pairs AS (SELECT a.doc_id AS ea, b.doc_id AS eb, CAST(count(*) AS BIGINT) AS inter
                FROM sh a JOIN sh b
                  ON a.source = b.source AND a.shingle = b.shingle AND a.doc_id < b.doc_id
                GROUP BY 1, 2),
      jpairs AS (SELECT ea, eb FROM pairs JOIN cnt ca ON ca.doc_id = ea
                   JOIN cnt cb ON cb.doc_id = eb
                 WHERE CAST(inter AS DOUBLE) / (ca.n + cb.n - inter) >= 0.5),
      e0 AS (SELECT ea, eb FROM hpairs UNION SELECT ea, eb FROM jpairs),
      edges AS (SELECT ea, eb FROM e0 UNION SELECT eb, ea FROM e0),
      reach(src, dst) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT r.src, e.eb FROM reach r JOIN edges e ON r.dst = e.ea),
      cc AS (SELECT src AS doc_id, min(dst) AS cluster_id FROM reach GROUP BY src),
      cb AS (SELECT cc.doc_id, cc.cluster_id,
               substr(md5(CAST(cc.cluster_id AS VARCHAR) || '|' || t.text), 1, 4) AS bucket
             FROM cc JOIN documents t ON t.doc_id = cc.cluster_id)
      SELECT doc_id, cluster_id,
        CASE WHEN bucket < 'cccc' THEN 'train'
             WHEN bucket < 'e666' THEN 'val'
             ELSE 'test' END AS split
      FROM cb"""))

  val all: Seq[Q] = Seq(q50, q51, q52)
}
