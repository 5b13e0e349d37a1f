package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame
import graft.{Q, Tables}

/** Privacy-preserving releases of corpus statistics (SURVEY.md §2.8,
  * round-8 additions): a binomial-mechanism noisy count release and
  * k-anonymity suppression — what a pipeline publishes about a private
  * corpus (per-source volumes, demographic slices) without exposing
  * exact small counts.
  *
  * The noise is DERIVED FROM md5 BITS, the repo's engine-portable
  * randomness recipe (ext/Sampling.scala's md5-threshold draws, here
  * read out as a popcount instead of a threshold): the bit-count of a
  * 128-bit digest is Binomial(128, ½), so `popcount − 64` is symmetric
  * noise with σ = √32 ≈ 5.66 — the binomial mechanism, a discrete
  * Gaussian-mechanism analogue. Popcount is computed WITHOUT any
  * hex→int conversion (which the two engines spell differently):
  * each hex char indexes a 16-char popcount lookup table via
  * position-in-'0123456789abcdef', so both sides evaluate the identical
  * pure-string expression tree and the release hash-matches exactly.
  * Salting the digest with the group key (not the row) makes the noise
  * a pure function of the released cell, per-run stable — the
  * "deterministic DP" variant used when releases must be reproducible.
  */
object Privacy {

  private val hexDigits = "0123456789abcdef"
  private val popLookup = "0112122312232334"

  /** Sum of per-hex-char popcounts of `hCol`'s 32-char md5 hex string,
    * as a SQL expression string portable across Spark (`instr`) and
    * DuckDB (`strpos`). */
  private def popcountExpr(posFn: String): String =
    (1 to 32).map { i =>
      s"CAST(substr('$popLookup', $posFn('$hexDigits', substr(h, $i, 1)), 1) AS INT)"
    }.mkString(" + ")

  /** Core of q104 over any (source, lang) document frame. */
  def dpCounts(docs: DataFrame): DataFrame = {
    val g = docs
      .select(coalesce(col("source"), lit("??")).as("source"),
        coalesce(col("lang"), lit("??")).as("lang"))
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_true"))
      .withColumn("h",
        md5(concat(lit("dp|"), col("source"), lit("|"), col("lang"))))
    g.withColumn("noise", expr(s"${popcountExpr("instr")} - 64"))
      .select(col("source"), col("lang"),
        greatest(lit(0L), col("n_true") + col("noise")).as("n_noisy"))
  }

  /** q104 — binomial-mechanism noisy per-(source, lang) count release:
    * exact counts never leave the engine; the published cell is
    * `max(0, n + (popcount(md5('dp|' || cell)) − 64))`. */
  val q104: Q = Q(
    "q104_dp_counts",
    run = { (spark, dir) => dpCounts(Tables.documents(spark, dir)) },
    oracle = Some(s"""
      WITH g AS (SELECT COALESCE(source, '??') AS source,
                   COALESCE(lang, '??') AS lang,
                   CAST(count(*) AS BIGINT) AS n_true
                 FROM documents GROUP BY 1, 2),
      s AS (SELECT source, lang, n_true,
              md5('dp|' || source || '|' || lang) AS h FROM g),
      n AS (SELECT source, lang, n_true,
              ${popcountExpr("strpos")} - 64 AS noise FROM s)
      SELECT source, lang,
        GREATEST(CAST(0 AS BIGINT), n_true + noise) AS n_noisy FROM n"""))

  /** Core of q106: k-anonymity suppression of a quasi-identifier
    * release. Cells with fewer than k members are generalized into one
    * ('*', '*') residual cell instead of being published — no released
    * row describes fewer than k documents (the residual aggregates
    * across suppressed cells).
    *
    * Scale shape for both queries: one hash-agg on the quasi-identifier
    * (cell count is bounded by the source×lang vocabulary, never corpus
    * size); suppression/noising are per-cell scalar expressions on the
    * aggregated rows. */
  def kAnonymize(docs: DataFrame, k: Int = 12): DataFrame = {
    val g = docs
      .select(coalesce(col("source"), lit("??")).as("source"),
        coalesce(col("lang"), lit("??")).as("lang"))
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n"))
    g.select(
        when(col("n") >= k, col("source")).otherwise(lit("*")).as("source"),
        when(col("n") >= k, col("lang")).otherwise(lit("*")).as("lang"),
        col("n"))
      .groupBy(col("source"), col("lang"))
      .agg(sum(col("n")).as("n_docs"), count(lit(1)).as("n_cells"))
  }

  /** q106 — k-anonymous (k=12) release of per-(source, lang) volumes. */
  val q106: Q = Q(
    "q106_kanon_release",
    run = { (spark, dir) => kAnonymize(Tables.documents(spark, dir)) },
    oracle = Some("""
      WITH g AS (SELECT COALESCE(source, '??') AS source,
                   COALESCE(lang, '??') AS lang,
                   CAST(count(*) AS BIGINT) AS n
                 FROM documents GROUP BY 1, 2),
      m AS (SELECT CASE WHEN n >= 12 THEN source ELSE '*' END AS source,
              CASE WHEN n >= 12 THEN lang ELSE '*' END AS lang, n
            FROM g)
      SELECT source, lang, CAST(sum(n) AS BIGINT) AS n_docs,
        CAST(count(*) AS BIGINT) AS n_cells
      FROM m GROUP BY source, lang"""))

  /** Core of q213: ℓ-DIVERSITY audit (Machanavajjhala et al. 2007) —
    * the k-anonymity companion q106 leaves open: a class can hold ≥ k
    * members yet expose everyone's SENSITIVE value if they all share
    * it (the homogeneity attack). Quasi-identifier = (source, 500-char
    * length band); sensitive attribute = lang. A class is ℓ-diverse
    * when it carries ≥ ℓ distinct sensitive values; the audit emits
    * every class with its size, distinct-sensitive count, and verdict —
    * the release gate runs BEFORE publishing, on the aggregate only.
    *
    * Scale shape: one hash-agg over the QI (class count bounded by
    * source × band vocabulary, never corpus size); the distinct count
    * is per-class exact (bounded by the lang vocabulary). */
  def lDiversity(docs: DataFrame, l: Int = 3): DataFrame =
    docs.select(coalesce(col("source"), lit("??")).as("source"),
        (coalesce(col("n_chars"), lit(0L)) / 500L).cast("long").as("band"),
        coalesce(col("lang"), lit("??")).as("lang"))
      .groupBy(col("source"), col("band"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("lang")).as("n_sensitive"))
      .withColumn("diverse", col("n_sensitive") >= l)

  /** q213 — ℓ-diversity (ℓ=3) audit of the (source, band) release. */
  val q213: Q = Q(
    "q213_ldiversity",
    run = { (spark, dir) => lDiversity(Tables.documents(spark, dir)) },
    oracle = Some("""
      SELECT COALESCE(source, '??') AS source,
        COALESCE(n_chars, 0) // 500 AS band,
        CAST(count(*) AS BIGINT) AS n_docs,
        CAST(count(DISTINCT COALESCE(lang, '??')) AS BIGINT)
          AS n_sensitive,
        count(DISTINCT COALESCE(lang, '??')) >= 3 AS diverse
      FROM documents GROUP BY 1, 2"""))

  val all: Seq[Q] = Seq(q104, q106, q213)
}
