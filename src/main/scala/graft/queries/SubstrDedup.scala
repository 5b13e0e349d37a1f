package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Exact-substring duplicate spans across documents (SURVEY.md §2.8,
  * round-9): the ExactSubstr recipe of Lee et al. 2022, "Deduplicating
  * Training Data Makes Language Models Better" — find every maximal
  * run of ≥ minLen consecutive tokens shared verbatim between two
  * documents, the spans a pretraining pipeline cuts so memorized
  * boilerplate isn't trained on twice. Their implementation is a
  * suffix array; the Spark-native equivalent is the gapless-diagonal
  * join: k-gram position lists joined on gram hash, matches grouped by
  * the (doc pair, position-offset) DIAGONAL, and maximal runs
  * recovered with the islands trick (pos − dense index is constant
  * within a consecutive run) — every stage a hash-agg or equi-join.
  *
  * Span semantics: a maximal run of g consecutive matching k-grams on
  * one diagonal = a shared token span of length g + k − 1. Emitted
  * once per (doc_a < doc_b, diagonal, start) with both start offsets;
  * `minLen` filters to spans a cutter would act on.
  *
  * Parity: everything is integers and md5-string equality — no floats
  * anywhere, so the oracle is a line-for-line SQL transliteration.
  *
  * Scale shape (100 TB): gram hashing is per-doc local (one shuffle on
  * the gram hash); the position join is df-capped (a gram in > dfCap
  * docs is boilerplate — the Lee et al. implementation drops these
  * too) so each gram bucket yields ≤ dfCap² position pairs — the q30
  * band bound; the diagonal grouping keys are (doc_a, doc_b, offset),
  * bounded by the matched-pair set, never corpus²; the islands window
  * partitions by diagonal — thousands of small frames, no global sort.
  */
object SubstrDedup {

  private val kGram = 8    // gram width in tokens
  private val minLenT = 12 // emit spans of at least this many tokens
  private val dfCapG = 10  // grams in more docs than this are boilerplate

  /** Maximal cross-document duplicate token spans — see object doc. */
  def duplicateSpans(docs: DataFrame, k: Int = kGram,
      minLen: Int = minLenT, dfCap: Int = dfCapG): DataFrame = {
    // (doc_id, pos, gram-hash) for every k-token window
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    val grams = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= k)
      .select(col("doc_id"), posexplode(col("toks")).as(Seq("pos", "tok")))
      .withColumn("gram", concat_ws(" ",
        (0 until k).map(i => lead(col("tok"), i).over(byDoc)): _*))
      .withColumn("tail", lead(col("tok"), k - 1).over(byDoc))
      .filter(col("tail").isNotNull)
      .select(col("doc_id"), col("pos"), md5(col("gram")).as("h"))
    // df cap on DISTINCT docs per gram (a run repeated inside one doc
    // stays joinable; cross-doc fan-out is what the cap bounds).
    // No broadcast hint on the hot set: unlike a vocabulary-bounded
    // stopword table, the set of grams with df > dfCap GROWS with the
    // corpus (boilerplate is corpus-proportional), so a forced
    // broadcast could outgrow the driver at 100 TB — AQE broadcasts it
    // while it fits and shuffles the anti-join when it doesn't (the
    // q125 cc-model-join posture).
    val hot = grams.select(col("h"), col("doc_id")).distinct()
      .groupBy(col("h")).agg(count(lit(1)).as("gdf"))
      .filter(col("gdf") > dfCap).select(col("h"))
    val g = grams.join(hot, Seq("h"), "left_anti")
    // position pairs on the same gram, doc_a < doc_b, keyed by diagonal
    val pairs = g.alias("a")
      .join(g.select(col("h").as("h_b"), col("doc_id").as("doc_b"),
          col("pos").as("pos_b")),
        col("h") === col("h_b") && col("doc_id") < col("doc_b"))
      .select(col("doc_id").as("doc_a"), col("pos").as("pos_a"),
        col("doc_b"), col("pos_b"),
        (col("pos") - col("pos_b")).as("diag"))
    // islands: within a diagonal, consecutive pos_a values share
    // (pos_a - dense_index); each island is one maximal run
    val byDiag = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pos_a")
    pairs
      .withColumn("isl", col("pos_a") - row_number().over(byDiag))
      .groupBy(col("doc_a"), col("doc_b"), col("diag"), col("isl"))
      .agg(min(col("pos_a")).cast("long").as("start_a"),
        min(col("pos_b")).cast("long").as("start_b"),
        count(lit(1)).as("n_grams"))
      .select(col("doc_a"), col("doc_b"), col("start_a"), col("start_b"),
        (col("n_grams") + lit(k - 1)).as("span_len"))
      .filter(col("span_len") >= minLen)
  }

  /** Session-memoized STAGED duplicate-span table per corpus path —
    * shared by q128 (returns it) and q129 (rewrites through it). */
  private def spansFor(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame =
    graft.operators.SessionCache.memoOn(spark, dir,
      s"substr-spans|$dir|$kGram|$minLenT|$dfCapG") {
      graft.operators.Stage.materialize(
        duplicateSpans(Tables.documentsParallel(spark, dir)),
        "substr-spans")
    }

  val q128: Q = Q(
    "q128_exact_substr",
    run = { (spark, dir) => spansFor(spark, dir) },
    oracle = Some(s"""
      WITH toks AS (
        SELECT doc_id, CAST(pos AS INTEGER) AS pos, a[pos + 1] AS tok, a
        FROM (SELECT doc_id, string_split(text, ' ') AS a,
                unnest(generate_series(0, len(string_split(text, ' ')) - 1))
                  AS pos
              FROM documents
              WHERE text IS NOT NULL
                AND len(string_split(text, ' ')) >= $kGram)),
      grams AS (
        SELECT doc_id, pos,
          md5(array_to_string(a[pos + 1 : pos + $kGram], ' ')) AS h
        FROM toks
        WHERE pos + $kGram <= len(a)),
      hot AS (SELECT h FROM (SELECT h, count(DISTINCT doc_id) AS gdf
                             FROM grams GROUP BY h)
              WHERE gdf > $dfCapG),
      g AS (SELECT * FROM grams WHERE h NOT IN (SELECT h FROM hot)),
      pairs AS (
        SELECT a.doc_id AS doc_a, a.pos AS pos_a,
          b.doc_id AS doc_b, b.pos AS pos_b,
          a.pos - b.pos AS diag
        FROM g a JOIN g b ON a.h = b.h AND a.doc_id < b.doc_id),
      isl AS (
        SELECT doc_a, doc_b, diag, pos_a, pos_b,
          pos_a - row_number() OVER (PARTITION BY doc_a, doc_b, diag
            ORDER BY pos_a) AS island
        FROM pairs)
      SELECT doc_a, doc_b,
        CAST(min(pos_a) AS BIGINT) AS start_a,
        CAST(min(pos_b) AS BIGINT) AS start_b,
        CAST(count(*) + ${kGram - 1} AS BIGINT) AS span_len
      FROM isl
      GROUP BY doc_a, doc_b, diag, island
      HAVING count(*) + ${kGram - 1} >= $minLenT"""))

  /** Core of q129: cut every duplicated span from its LATER copy (the
    * doc with the higher id keeps the hole; the first occurrence
    * survives — Lee et al.'s keep-one policy), re-emitting each
    * affected document's text with the covered tokens removed. Docs
    * with no spans pass through untouched, so the output is a full
    * corpus rewrite.
    *
    * Scale shape: the span table is the q128 output (candidate-bounded);
    * covered positions explode one row per CUT TOKEN (bounded by total
    * span length, not corpus size); the rewrite is a per-doc anti-join
    * + one ordered re-aggregation — one shuffle on doc_id. The
    * re-aggregation is collect_list over a doc's tokens: per-doc state,
    * the same bound as the text column itself. */
  def cutSpans(docs: DataFrame, k: Int = kGram, minLen: Int = minLenT,
      dfCap: Int = dfCapG): DataFrame =
    cutSpansFrom(duplicateSpans(docs, k, minLen, dfCap), docs)

  /** The q129 rewrite half over an already-computed span table — the
    * registry rides the session-shared staged spans (q128's output is
    * q129's input; deriving it twice was the round-11 bench's last
    * duplicated heavy pass). */
  def cutSpansFrom(spans: DataFrame, docs: DataFrame): DataFrame = {
    // covered (doc, pos): the span's tokens in the HIGHER-id doc
    // (doc_b > doc_a always holds in q128's output)
    val covered = spans
      .select(col("doc_b").as("doc_id"), col("start_b"), col("span_len"))
      .select(col("doc_id"),
        explode(sequence(col("start_b"),
          col("start_b") + col("span_len") - 1)).as("pos"))
      .distinct()
    val toks = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("tok"))
    val kept = toks.join(covered, Seq("doc_id", "pos"), "left_anti")
    kept
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        concat_ws(" ", expr(
          "transform(array_sort(collect_list(struct(pos, tok))), s -> s.tok)"))
          .as("clean_text"))
  }

  val q129: Q = Q(
    "q129_span_cut",
    run = { (spark, dir) =>
      cutSpansFrom(spansFor(spark, dir),
        Tables.documentsParallel(spark, dir))
    },
    oracle = Some(s"""
      WITH toks AS (
        SELECT doc_id, CAST(pos AS INTEGER) AS pos, a[pos + 1] AS tok, a
        FROM (SELECT doc_id, string_split(text, ' ') AS a,
                unnest(generate_series(0, len(string_split(text, ' ')) - 1))
                  AS pos
              FROM documents
              WHERE text IS NOT NULL
                AND len(string_split(text, ' ')) >= $kGram)),
      grams AS (
        SELECT doc_id, pos,
          md5(array_to_string(a[pos + 1 : pos + $kGram], ' ')) AS h
        FROM toks
        WHERE pos + $kGram <= len(a)),
      hot AS (SELECT h FROM (SELECT h, count(DISTINCT doc_id) AS gdf
                             FROM grams GROUP BY h)
              WHERE gdf > $dfCapG),
      g AS (SELECT * FROM grams WHERE h NOT IN (SELECT h FROM hot)),
      pairs AS (
        SELECT a.doc_id AS doc_a, a.pos AS pos_a,
          b.doc_id AS doc_b, b.pos AS pos_b,
          a.pos - b.pos AS diag
        FROM g a JOIN g b ON a.h = b.h AND a.doc_id < b.doc_id),
      isl AS (
        SELECT doc_a, doc_b, diag, pos_a, pos_b,
          pos_a - row_number() OVER (PARTITION BY doc_a, doc_b, diag
            ORDER BY pos_a) AS island
        FROM pairs),
      spans AS (
        SELECT doc_b, CAST(min(pos_b) AS BIGINT) AS start_b,
          CAST(count(*) + ${kGram - 1} AS BIGINT) AS span_len
        FROM isl
        GROUP BY doc_a, doc_b, diag, island
        HAVING count(*) + ${kGram - 1} >= $minLenT),
      covered AS (
        SELECT DISTINCT doc_b AS doc_id,
          unnest(generate_series(start_b, start_b + span_len - 1)) AS pos
        FROM spans),
      allt AS (
        SELECT doc_id, CAST(pos AS BIGINT) AS pos, a[pos + 1] AS tok
        FROM (SELECT doc_id,
                unnest(generate_series(0, len(string_split(text, ' ')) - 1))
                  AS pos,
                string_split(text, ' ') AS a
              FROM documents WHERE text IS NOT NULL)),
      kept AS (
        SELECT t.doc_id, t.pos, t.tok
        FROM allt t
        LEFT JOIN covered c ON c.doc_id = t.doc_id AND c.pos = t.pos
        WHERE c.doc_id IS NULL)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
        string_agg(tok, ' ' ORDER BY pos) AS clean_text
      FROM kept GROUP BY doc_id"""))

  val all: Seq[Q] = Seq(q128, q129)
}
