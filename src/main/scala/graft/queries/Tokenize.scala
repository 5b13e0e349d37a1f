package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Tokenizer-training operators (SURVEY.md §2.8, round-9): BPE merge
  * learning over the corpus word-frequency table (Sennrich, Haddow &
  * Birch 2016, "Neural Machine Translation of Rare Words with Subword
  * Units" — the byte-pair-encoding recipe every modern tokenizer
  * starts from), plus the merge-application function that turns words
  * into subword arrays for downstream packing (q58).
  *
  * Semantics (pinned, engine-portable): words are space-split; each
  * word is symbolized as sentinel-padded space-separated characters
  * (" h e l l o "); a merge round counts adjacent symbol pairs
  * weighted by word frequency, picks the most frequent pair (ties by
  * pair string ascending), and applies it with ONE left-to-right
  * non-overlapping string replace of " a b " → " ab ". Both engines'
  * `replace` share that exact scan semantics, so learned merges and
  * frequencies hash-match. (An immediately-repeated pair — "a a a a" —
  * merges its odd occurrences in the NEXT round it wins, which plain
  * BPE does in the same pass; the round-granular variant is what one
  * replace per round expresses, and it is applied identically on both
  * sides.)
  *
  * Scale shape (100 TB): learning never iterates over the corpus —
  * ONE corpus-sized scan builds the (word, freq) table (hash-agg with
  * map-side combine), which is vocabulary-bounded and staged once;
  * every merge round is an agg + limit(1) over that staged table (the
  * q87 TakeOrderedAndProject pattern — never a global sort), and the
  * per-round driver collect is exactly one row. Production learns on
  * a capped word sample (`maxVocabRows`, the IVF maxFitRows posture)
  * and APPLIES the merge table everywhere — application is a pure
  * per-row expression chain, embarrassingly parallel.
  */
object Tokenize {

  private val nMerges = 12

  /** Sentinel-padded spaced-character symbolization of a word column:
    * "hello" → " h e l l o ". The sentinels make " a b " replace
    * unable to match across symbol boundaries. */
  private def symbolize(word: Column): Column =
    concat(lit(" "), trim(regexp_replace(word, "(.)", "$1 ")), lit(" "))

  /** Corpus word-frequency table — the only corpus-sized scan. */
  private def wordFreqs(docs: DataFrame): DataFrame =
    docs.filter(col("text").isNotNull)
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Learn `n` BPE merges from the corpus; returns (rank, pair, merged,
    * f) — the merge table in priority order. `maxVocabRows` caps the
    * staged word table (most-frequent-first, ties by word) so learning
    * is bounded at any corpus size; the fixture vocabulary is far
    * below every sensible cap, so the registry output is cap-free. */
  def bpeLearn(docs: DataFrame, n: Int = nMerges,
      maxVocabRows: Int = 1000000): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val words = graft.operators.Stage.materialize(
      wordFreqs(docs)
        .orderBy(col("freq").desc, col("word").asc).limit(maxVocabRows),
      "bpe-words")
    var cur = words.select(symbolize(col("word")).as("syms"), col("freq"))
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= n && !exhausted) {
      val top = cur
        .select(col("freq"), split(trim(col("syms")), " ").as("a"))
        .select(col("freq"), explode(expr(
          "zip_with(slice(a, 1, size(a) - 1), slice(a, 2, size(a) - 1)," +
            " (x, y) -> concat(x, ' ', y))")).as("pair"))
        .groupBy(col("pair")).agg(sum(col("freq")).as("f"))
        .orderBy(col("f").desc, col("pair").asc).limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val pair = top(0).getString(0)
        val f = top(0).getLong(1)
        val merged = pair.replace(" ", "")
        merges += ((r, pair, merged, f))
        cur = cur.withColumn("syms",
          replace(col("syms"), lit(s" $pair "), lit(s" $merged ")))
        r += 1
      }
    }
    merges.toSeq.toDF("rank", "pair", "merged", "f")
  }

  /** Apply a learned merge table to a word column → subword array.
    * Pure expression chain (no UDF, no shuffle): symbolize, then one
    * `replace` per merge in rank order, then split. Feeds q58's
    * sequence packing with subword-true token counts. */
  def bpeApply(word: Column, merges: Seq[(String, String)]): Column = {
    val encoded = merges.foldLeft(symbolize(word)) {
      case (c, (pair, merged)) => replace(c, lit(s" $pair "), lit(s" $merged "))
    }
    split(trim(encoded), " ")
  }

  /** Collect a learned merge table (small: `rank` rows) into the
    * (pair, merged) sequence [[bpeApply]] wants, in rank order. */
  def mergesOf(table: DataFrame): Seq[(String, String)] =
    table.orderBy(col("rank").asc).select(col("pair"), col("merged"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq

  /** The q117 learning rounds as generated MATERIALIZED CTEs (the q101
    * iterative-oracle recipe, with the hints so DuckDB evaluates each
    * round once instead of inlining the chain exponentially). Shared by
    * q117 (emits the merge table) and q119 (applies it to documents). */
  private def learnCtes: String = {
    val rounds = (1 to nMerges).map { i =>
      s"""p$i AS MATERIALIZED (SELECT a[i] || ' ' || a[i+1] AS pair,
         |         CAST(sum(freq) AS BIGINT) AS f
         |       FROM (SELECT string_split(trim(syms), ' ') AS a, freq,
         |               unnest(generate_series(1,
         |                 len(string_split(trim(syms), ' ')) - 1)) AS i
         |             FROM w${i - 1})
         |       GROUP BY 1),
         |      m$i AS MATERIALIZED (SELECT $i AS rank, pair,
         |               replace(pair, ' ', '') AS merged, f
         |             FROM p$i ORDER BY f DESC, pair ASC LIMIT 1),
         |      w$i AS MATERIALIZED (SELECT replace(syms,
         |               ' ' || (SELECT pair FROM m$i) || ' ',
         |               ' ' || (SELECT merged FROM m$i) || ' ') AS syms,
         |               freq
         |             FROM w${i - 1})""".stripMargin
    }.mkString(",\n      ")
    s"""WITH words AS MATERIALIZED (
        SELECT word, CAST(count(*) AS BIGINT) AS freq
        FROM (SELECT unnest(string_split(text, ' ')) AS word
              FROM documents WHERE text IS NOT NULL)
        WHERE len(word) > 0 GROUP BY word),
      w0 AS MATERIALIZED (SELECT ' ' || trim(regexp_replace(word, '(.)', '\\1 ', 'g'))
               || ' ' AS syms, freq
             FROM words),
      $rounds"""
  }

  /** q117 — BPE merge learning on `documents`: the top-12 merge rules
    * with their weighted frequencies. DuckDB replays the identical
    * rounds as generated chained CTEs (the q101 iterative-oracle
    * recipe) with scalar-subquery replaces. */
  /** Session-memoized learned merge table per corpus path: bpeLearn is
    * EAGER (vocab-bounded rounds with 1-row collects) and returns a
    * driver-local relation, so q117 (emits it) and q119 (applies it)
    * train once per session — the tokenizer-artifact shape: a merge
    * table is learned once per corpus snapshot and shipped to every
    * consumer. */
  private def mergeTableFor(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame =
    graft.operators.SessionCache.memoOn(spark, dir, s"bpe-table|$dir|$nMerges") {
      bpeLearn(Tables.documentsParallel(spark, dir))
    }

  val q117: Q = Q(
    "q117_bpe_merges",
    run = { (spark, dir) => mergeTableFor(spark, dir) },
    oracle = Some {
      val union = (1 to nMerges)
        .map(i => s"SELECT rank, pair, merged, f FROM m$i")
        .mkString("\n      UNION ALL ")
      s"""
      $learnCtes
      $union"""
    })

  /** Core of q118: train a Laplace-smoothed bigram LM on the
    * `refSource` slice, score EVERY document's transitions by average
    * negative log-likelihood — the CCNet-style "perplexity against a
    * reference corpus" quality signal (Wenzek et al. 2020), kept in
    * nats and UN-exponentiated so the parity tolerance is linear.
    *
    * P(w2|w1) = (c(w1,w2) + 1) / (c(w1,·) + V), V = distinct reference
    * word types; unseen history ⇒ 1/V. Each per-transition ln is cast
    * DECIMAL(28,12) BEFORE summing (the q113 recipe: partial-agg-order-
    * free, cross-engine ulp wobble quantized 6 orders below the checker
    * rounding); one double division at the end.
    *
    * Scale shape: the model is REFERENCE-slice-bounded (bigram +
    * unigram tables from the curated slice, V a 1-row scalar), built in
    * two hash-aggs; scoring streams the corpus transitions through two
    * equi-joins against the model — broadcast when the slice is small
    * (AQE decides; no hint, the model CAN outgrow a broadcast) — and
    * one per-doc hash-agg. Nothing is ever corpus × corpus. */
  def lmScore(docs: DataFrame, refSource: String = "src0"): DataFrame = {
    val toks = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), col("source"),
        split(col("text"), " ").as("a"))
    // staged (round 16, guide §2.4): `trans` feeds the model build AND
    // the scorer, and `big` feeds the unigram rollup AND the scoring
    // join — unstaged, the zip_with transition explode ran 3× and the
    // bigram agg 2× per run (8 scans in the r16 before-plan). trans is
    // transition-grain, big is train-bigram-vocabulary-bounded.
    val trans = graft.operators.Stage.materialize(
      toks.select(col("doc_id"), col("source"),
        explode(expr(
          "zip_with(slice(a, 1, size(a) - 1), slice(a, 2, size(a) - 1)," +
            " (x, y) -> struct(x AS w1, y AS w2))")).as("t"))
      .select(col("doc_id"), col("source"),
        col("t.w1").as("w1"), col("t.w2").as("w2")), "lm-trans")
    val train = trans.filter(col("source") === refSource)
    val big = graft.operators.Stage.materialize(
      train.groupBy(col("w1"), col("w2"))
        .agg(count(lit(1)).as("c")), "lm-big")
    val uni = big.groupBy(col("w1")).agg(sum(col("c")).as("cw1"))
    val vsz = toks.filter(col("source") === refSource)
      .select(explode(col("a")).as("word")).distinct()
      .agg(count(lit(1)).as("vsz"))
    trans
      .join(big, Seq("w1", "w2"), "left")
      .join(uni, Seq("w1"), "left")
      .crossJoin(broadcast(vsz))
      .select(col("doc_id"),
        expr("CAST(ln((COALESCE(c, 0) + CAST(1.0 AS DOUBLE)) /" +
          " (COALESCE(cw1, 0) + vsz)) AS DECIMAL(28,12))").as("nl"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_trans"),
        ((sum(col("nl")) * lit(-1)).cast("double") /
          count(lit(1))).as("avg_nll"))
  }

  /** q118 — reference-LM document scoring (bigram Laplace NLL). */
  val q118: Q = Q(
    "q118_lm_score",
    run = { (spark, dir) => lmScore(Tables.documentsParallel(spark, dir)) },
    oracle = Some("""
      WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS a
                    FROM documents WHERE text IS NOT NULL),
      tr AS (SELECT doc_id, source, a[i] AS w1, a[i+1] AS w2
             FROM (SELECT doc_id, source, a,
                     unnest(generate_series(1, len(a) - 1)) AS i
                   FROM toks)),
      train AS (SELECT w1, w2 FROM tr WHERE source = 'src0'),
      big AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c
              FROM train GROUP BY 1, 2),
      uni AS (SELECT w1, CAST(sum(c) AS BIGINT) AS cw1 FROM big GROUP BY 1),
      v AS (SELECT CAST(count(DISTINCT word) AS BIGINT) AS vsz
            FROM (SELECT unnest(a) AS word FROM toks
                  WHERE source = 'src0')),
      terms AS (
        SELECT t.doc_id,
          CAST(ln((COALESCE(b.c, 0) + CAST(1.0 AS DOUBLE)) /
            (COALESCE(u.cw1, 0) + v.vsz)) AS DECIMAL(28,12)) AS nl
        FROM tr t
        LEFT JOIN big b ON b.w1 = t.w1 AND b.w2 = t.w2
        LEFT JOIN uni u ON u.w1 = t.w1
        CROSS JOIN v)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trans,
        CAST(-sum(nl) AS DOUBLE) / count(*) AS avg_nll
      FROM terms GROUP BY doc_id"""))

  /** Whole-text BPE encoding: every char spaced (word gaps become
    * 3-space runs no single-space merge pattern can cross, so words
    * encode independently — the [[bpeApply]] boundary guarantee without
    * exploding words), then the merge replaces in rank order. Subword
    * count = whitespace-run-separated segments of the result. */
  private def subwordCount(text: Column,
      merges: Seq[(String, String)]): Column = {
    val spaced = concat(lit(" "), regexp_replace(text, "(.)", "$1 "))
    val encoded = merges.foldLeft(spaced) {
      case (c, (pair, merged)) => replace(c, lit(s" $pair "), lit(s" $merged "))
    }
    coalesce(
      when(length(trim(encoded)) === 0, lit(0L))
        .otherwise(size(split(trim(encoded), " +")).cast("long")),
      lit(0L))
  }

  /** Core of q119: q58's streaming-concat packing with SUBWORD-true
    * token counts — the learned q117 merge table is applied to every
    * document (pure expression chain), and the per-source cum-sum
    * assigns 2048-SUBWORD packs. The end-to-end "tokenizer-aware
    * packing" a pretraining loader needs: pack boundaries follow what
    * the tokenizer will actually emit, not whitespace counts.
    *
    * Scale shape: learning is vocabulary-bounded (q117); application
    * adds zero shuffles (expression-only column); packing is q58's one
    * shuffle on source. */
  def subwordPack(docs: DataFrame, nM: Int = nMerges): DataFrame =
    subwordPackFrom(docs, mergesOf(bpeLearn(docs, nM)))

  /** The packing half over an already-learned merge sequence. */
  def subwordPackFrom(docs: DataFrame,
      merges: Seq[(String, String)]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    docs
      .select(col("doc_id"), col("source"),
        subwordCount(col("text"), merges).as("n_subtoks"))
      .withColumn("cum", sum(col("n_subtoks")).over(w))
      .select(col("doc_id"), col("source"), col("n_subtoks"),
        (col("cum") - col("n_subtoks")).as("start_off"),
        expr("(cum - n_subtoks) div 2048").as("pack_id"))
  }

  /** q119 — subword-true sequence packing (q117 ∘ q58). The oracle
    * re-learns the merge table (the q117 CTE chain) and re-applies it
    * to every document with chained scalar-subquery replaces. */
  val q119: Q = Q(
    "q119_subword_pack",
    run = { (spark, dir) =>
      subwordPackFrom(Tables.documentsParallel(spark, dir),
        mergesOf(mergeTableFor(spark, dir)))
    },
    oracle = Some {
      val applies = (1 to nMerges).map { i =>
        s"""d$i AS MATERIALIZED (SELECT doc_id, source, replace(enc,
           |        ' ' || (SELECT pair FROM m$i) || ' ',
           |        ' ' || (SELECT merged FROM m$i) || ' ') AS enc
           |      FROM d${i - 1})""".stripMargin
      }.mkString(",\n      ")
      s"""
      $learnCtes,
      d0 AS (SELECT doc_id, source,
               ' ' || regexp_replace(text, '(.)', '\\1 ', 'g') AS enc
             FROM documents),
      $applies,
      n AS (SELECT doc_id, source,
              CASE WHEN enc IS NULL OR len(trim(enc)) = 0 THEN 0
                   ELSE len(regexp_split_to_array(trim(enc), ' +'))
              END AS n_subtoks
            FROM d$nMerges),
      w AS (SELECT doc_id, source, CAST(n_subtoks AS BIGINT) AS n_subtoks,
              sum(n_subtoks) OVER (PARTITION BY source ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
            FROM n)
      SELECT doc_id, source, n_subtoks,
        CAST(cum - n_subtoks AS BIGINT) AS start_off,
        CAST((cum - n_subtoks) // 2048 AS BIGINT) AS pack_id
      FROM w"""
    })

  /** Core of q150: per-language tokenizer FERTILITY — subwords emitted
    * per whitespace token under the learned q117 merge table. The
    * standard multilingual-tokenizer equity metric (a language with
    * fertility 2× another pays 2× the context window for the same
    * content — the number that drives vocab-allocation decisions).
    * Integer micro-units ((Σsub · 1e6) DIV Σws — Spark DIV ≡ DuckDB //)
    * keep the ratio hash-portable; sums are exact BIGINTs under any
    * partial-agg order.
    *
    * Scale shape: merge application is a pure expression chain (zero
    * shuffles), the rollup one map-side-combined hash agg to a
    * lang-count-sized result. */
  def tokenizerFertility(docs: DataFrame,
      merges: Seq[(String, String)]): DataFrame =
    docs.filter(col("text").isNotNull && col("lang").isNotNull)
      .select(col("lang"),
        subwordCount(col("text"), merges).as("n_sub"),
        size(split(col("text"), " ")).cast("long").as("n_ws"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_sub")).as("n_subtoks"),
        sum(col("n_ws")).as("n_wstoks"))
      .withColumn("fertility_x1e6",
        expr("(n_subtoks * 1000000) DIV n_wstoks"))

  /** q150 — per-language tokenizer fertility under the session-shared
    * q117 merge table. */
  val q150: Q = Q(
    "q150_tokenizer_fertility",
    run = { (spark, dir) =>
      tokenizerFertility(Tables.documentsParallel(spark, dir),
        mergesOf(mergeTableFor(spark, dir)))
    },
    oracle = Some {
      val applies = (1 to nMerges).map { i =>
        s"""f$i AS MATERIALIZED (SELECT lang, n_ws, replace(enc,
           |        ' ' || (SELECT pair FROM m$i) || ' ',
           |        ' ' || (SELECT merged FROM m$i) || ' ') AS enc
           |      FROM f${i - 1})""".stripMargin
      }.mkString(",\n      ")
      s"""
      $learnCtes,
      f0 AS (SELECT lang,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws,
               ' ' || regexp_replace(text, '(.)', '\\1 ', 'g') AS enc
             FROM documents
             WHERE text IS NOT NULL AND lang IS NOT NULL),
      $applies,
      fn AS (SELECT lang, n_ws,
               CASE WHEN enc IS NULL OR len(trim(enc)) = 0 THEN 0
                    ELSE len(regexp_split_to_array(trim(enc), ' +'))
               END AS n_sub
             FROM f$nMerges)
      SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(n_sub) AS BIGINT) AS n_subtoks,
        CAST(sum(n_ws) AS BIGINT) AS n_wstoks,
        (CAST(sum(n_sub) AS BIGINT) * 1000000)
          // CAST(sum(n_ws) AS BIGINT) AS fertility_x1e6
      FROM fn GROUP BY lang"""
    })

  val all: Seq[Q] = Seq(q117, q118, q119, q150)
}
