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

  val all: Seq[Q] = Seq(q50, q51)
}
