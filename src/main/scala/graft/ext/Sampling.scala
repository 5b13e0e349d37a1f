package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Dataset splitting & sampling for training-data pipelines
  * (SURVEY.md §2.D): the ops that carve a corpus into train/val/test
  * and draw stratified subsets.
  *
  * Splitting is HASH-based, not RNG-based: a document's split is a pure
  * function of its content hash, so it is stable across runs, engines,
  * and partitionings. [[hashSplit]] additionally guarantees corpus-
  * growth stability (a new doc never moves an old doc between splits);
  * [[leakageSafeSplit]] trades a bounded amount of that stability for
  * contamination safety — see its scaladoc. Hash-keyed splits are also
  * oracle-checkable: md5 hex is identical in Spark and DuckDB, and the
  * threshold compare is plain string ordering.
  *
  * Stratified sampling is hash-based too: each row's Bernoulli draw is
  * the first 8 hex chars of md5 over a salted row key compared against
  * the stratum's fraction rendered as an 8-hex threshold (the q83
  * recipe), so the draw is a pure function of row identity — stable
  * across runs, engines, and partitionings, and hash-oracle-checkable,
  * unlike `sampleBy`/`rand`. The statistical contract (per-stratum
  * fractions, E[copies] = f) is additionally property-tested.
  */
object Sampling {

  /** The shared split recipe: md5 over "key|text" (null text reads as
    * empty — concat, not concat_ws, so the oracle's COALESCE(text,'')
    * '||' chain produces the identical pre-image), first 4 hex chars as
    * the bucket (65536 buckets), hex-prefix thresholds as fractions. */
  private def splitOf(key: Column, text: Column,
      trainTo: String, valTo: String): Column = {
    val bucket = substring(
      md5(concat(key.cast("string"), lit("|"), coalesce(text, lit("")))), 1, 4)
    when(bucket < lit(trainTo), lit("train"))
      .when(bucket < lit(valTo), lit("val"))
      .otherwise(lit("test"))
  }

  /** Deterministic train/val/test assignment from the md5 of
    * (doc_id, text). Defaults ("cccc", "e666") ≈ 80% / 10% / 10%. */
  def hashSplit(docs: DataFrame, trainTo: String = "cccc",
      valTo: String = "e666"): DataFrame =
    docs.select(col("doc_id"),
      splitOf(col("doc_id"), col("text"), trainTo, valTo).as("split"))

  /** Per-row copy count for a fraction f: floor(f) copies plus one more
    * iff the row's deterministic draw lands below f − floor(f), so
    * E[copies] = f exactly for every f >= 0. The draw is the q83 md5-
    * threshold recipe — `substr(md5('strat|' || key), 1, 8)` compared
    * against `lpad(hex(floor(frac·2³²)), 8, '0')` — identical in Spark
    * and DuckDB. The "strat|" salt decorrelates the draw from the
    * [[splitOf]] hash: without it, a low sampling fraction would keep
    * only low-bucket docs, i.e. only 'train'-split docs. */
  private def drawCopies(key: Column, f: Column): Column = {
    val frac = f - floor(f)
    val draw = substring(md5(concat(lit("strat|"), key.cast("string"))), 1, 8)
    val thresh = lpad(lower(hex(floor(frac * 4294967296.0).cast("long"))), 8, "0")
    floor(f).cast("int") + when(draw < thresh, lit(1)).otherwise(lit(0))
  }

  /** Deterministic stratified sample with per-stratum fractions — the
    * real operator is source/language REBALANCING (upsample rare strata,
    * downsample dominant ones); a uniform map degenerates to a Bernoulli
    * filter. Single pass, no shuffle, no driver collect: the caller
    * supplies the (config-sized, like the validation check list)
    * fractions map and the row-identity column the draw is keyed on.
    *
    * Fractions may exceed 1.0 (upsampling): a row in a stratum with
    * fraction f is emitted floor(f) times plus one more with probability
    * f − floor(f) — see [[drawCopies]]. The all-<=1 case is a pure
    * filter (no generator in the plan); the explode path stays one pass
    * and shuffle-free too: per-row copy counts are a projection and
    * `explode(sequence(...))` a generator, so at 100 TB rebalancing is
    * embarrassingly parallel, with output partition sizes scaled by
    * max(f). Strata absent from the map are dropped. Because both paths
    * share one draw function of (key, fraction), per-stratum MEMBERSHIP
    * is stable across runs, engines, partitionings, and code paths —
    * changing one stratum's fraction never reshuffles another's rows
    * (the `sampleBy`/`rand` formulation this replaced could not promise
    * that).
    *
    * One caveat, by design: fractions are capped at 1000 — a fat-
    * fingered fraction (1e9) would otherwise build a 1e9-element
    * `sequence` per row and OOM an executor with no diagnostic, and no
    * real rebalance upweights 1000x. */
  def stratifiedSample(docs: DataFrame, strataCol: String,
      fractions: Map[String, Double],
      key: Column = col("doc_id")): DataFrame = {
    require(fractions.values.forall(_ >= 0.0),
      s"stratified sampling: negative fraction in $fractions")
    require(fractions.values.forall(_ <= 1000.0),
      s"stratified sampling: fraction > 1000 in $fractions — " +
        "an upweight this large is almost certainly a typo, and the " +
        "explode path would emit that many copies per row")
    val f = coalesce(
      element_at(typedlit(fractions), col(strataCol)), lit(0.0))
    val withCopies = docs.withColumn("__copies", drawCopies(key, f))
      .filter(col("__copies") > 0)
    if (fractions.values.forall(_ <= 1.0))
      withCopies.drop("__copies") // copies ∈ {0, 1}: plain filter
    else
      withCopies
        .withColumn("__copy", explode(sequence(lit(1), col("__copies"))))
        .drop("__copies", "__copy")
  }

  /** Distinct strata of `strataCol`, with a loud cardinality guard (the
    * dictEncode pattern): a fractions map is driver-side CONFIG, so the
    * stratum count must be config-sized — pointing this at a
    * high-cardinality column (doc_id, text) gets a diagnostic, not a
    * driver OOM. The scan itself is bounded by `limit` BEFORE collect,
    * so even the failing case never materializes more than
    * maxStrata + 1 rows on the driver. */
  def strataOf(docs: DataFrame, strataCol: String,
      maxStrata: Int = 10000): Seq[String] = {
    val vals = docs.select(col(strataCol).cast("string"))
      .filter(col(strataCol).isNotNull)
      .distinct().limit(maxStrata + 1).collect()
    require(vals.length <= maxStrata,
      s"stratified sampling: column '$strataCol' has more than " +
        s"$maxStrata distinct values — not a stratification key; " +
        "pass an explicit fractions map or raise maxStrata")
    vals.toIndexedSeq.map(_.getString(0))
  }

  /** q50 — deterministic hash split: full doc→split map, hash-checked
    * against the same md5-prefix expression in DuckDB. */
  val q50: Q = Q(
    "q50_dataset_split",
    run = { (spark, dir) => hashSplit(Tables.documents(spark, dir)) },
    oracle = Some("""
      SELECT doc_id,
        CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || '|' || COALESCE(text, '')), 1, 4) < 'cccc' THEN 'train'
             WHEN substr(md5(CAST(doc_id AS VARCHAR) || '|' || COALESCE(text, '')), 1, 4) < 'e666' THEN 'val'
             ELSE 'test' END AS split
      FROM documents"""))

  /** Leakage-safe split: assign splits per DEDUP CLUSTER, not per
    * document, so exact and near duplicates of a training doc can never
    * land in val/test (train/test contamination — the failure mode of
    * per-doc splitting that [[hashSplit]] alone cannot prevent). The
    * split is keyed on the md5 of the cluster's canonical (min-id)
    * document, so it stays deterministic and content-derived.
    *
    * Stability caveat (unlike [[hashSplit]]): a NEW document that
    * near-dup-bridges two existing clusters merges them, and the merged
    * cluster re-keys on the surviving canonical doc — members of the
    * absorbed cluster can change split. That is inherent to the
    * contamination guarantee (the merged group must share one split);
    * don't cache these assignments across corpus snapshots without
    * re-running. */
  def leakageSafeSplit(docs: DataFrame, trainTo: String = "cccc",
      valTo: String = "e666",
      exactNearPairs: Boolean = false): DataFrame =
    leakageSafeSplitFrom(
      DedupCluster.clusters(docs, exactNearPairs = exactNearPairs),
      docs, trainTo, valTo)

  /** Resolution against ALREADY-COMPUTED cluster labels — the
    * [[DedupCluster.canonicalFromLabels]] reuse seam applied to the
    * split (registry q52 rides the session-shared label table). */
  def leakageSafeSplitFrom(cl: DataFrame, docs: DataFrame,
      trainTo: String = "cccc", valTo: String = "e666"): DataFrame = {
    val canonical = docs.select(col("doc_id").as("cluster_id"),
      col("text").as("canon_text"))
    cl.join(canonical, "cluster_id")
      .select(col("doc_id"), col("cluster_id"),
        splitOf(col("cluster_id"), col("canon_text"), trainTo, valTo)
          .as("split"))
  }

  /** q51 — stratified 30% sample per source, hash-checked end to end:
    * the md5-threshold draw is a pure function of doc_id, so the DuckDB
    * oracle replays the identical coin flips. The strata map comes from
    * a distinct scan here because the QUERY wants uniform coverage of
    * whatever strata exist; the operator itself takes the map.
    * Aggregated to one row per stratum (membership itself is asserted
    * deterministic in the suite). */
  val q51: Q = Q(
    "q51_stratified_sample",
    run = { (spark, dir) =>
      val docs = Tables.documents(spark, dir)
      val strata = strataOf(docs, "source")
      stratifiedSample(docs, "source", strata.map(_ -> 0.3).toMap)
        .groupBy(col("source")).agg(count(lit(1)).as("n_sampled"))
    },
    oracle = Some("""
      SELECT source, CAST(count(*) AS BIGINT) AS n_sampled
      FROM documents
      WHERE source IS NOT NULL
        AND substr(md5('strat|' || CAST(doc_id AS VARCHAR)), 1, 8)
            < lpad(lower(hex(CAST(floor(0.3 * 4294967296.0) AS BIGINT))), 8, '0')
      GROUP BY source"""))

  /** q54 — stratified REBALANCE: upweight below-median-count sources
    * 2.5x, downweight the rest to 0.5 — the rare-language upweighting a
    * pretraining mix actually runs. Hash-checked end to end: the DuckDB
    * oracle recomputes the same upper-median (1-indexed rank n/2+1 ==
    * Scala's sorted.apply(n/2)) and replays the md5-threshold fractional
    * draws, summing copies per source instead of exploding. Aggregated
    * to one row per source. */
  val q54: Q = Q(
    "q54_stratified_rebalance",
    run = { (spark, dir) =>
      val docs = Tables.documents(spark, dir)
      val strata = strataOf(docs, "source")
      // per-stratum counts: bounded by the strataOf guard above
      val counts = docs.filter(col("source").isNotNull)
        .groupBy("source").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // empty corpus / all-null source column → no strata: rebalancing
      // nothing is an empty report, not a failure (an empty partition is
      // a legitimate input to a library operator)
      if (counts.isEmpty)
        docs.select(col("source"), lit(0L).as("n_sampled")).limit(0)
      else {
        val median = counts.values.toSeq.sorted.apply(counts.size / 2)
        val fractions = strata.map(s =>
          s -> (if (counts(s) < median) 2.5 else 0.5)).toMap
        stratifiedSample(docs, "source", fractions)
          .groupBy(col("source")).agg(count(lit(1)).as("n_sampled"))
      }
    },
    oracle = Some("""
      WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS n
                 FROM documents WHERE source IS NOT NULL GROUP BY source),
      m AS (SELECT n AS med
            FROM (SELECT n, row_number() OVER (ORDER BY n) AS rk FROM c)
            WHERE rk = (SELECT count(*) // 2 + 1 FROM c)),
      f AS (SELECT source,
              CASE WHEN n < (SELECT med FROM m) THEN 2.5 ELSE 0.5 END AS f
            FROM c),
      k AS (SELECT d.source,
              CAST(floor(f.f) AS BIGINT)
              + CASE WHEN substr(md5('strat|' || CAST(d.doc_id AS VARCHAR)), 1, 8)
                     < lpad(lower(hex(CAST(floor((f.f - floor(f.f)) * 4294967296.0) AS BIGINT))), 8, '0')
                THEN 1 ELSE 0 END AS copies
            FROM documents d JOIN f ON d.source = f.source)
      SELECT source, CAST(sum(copies) AS BIGINT) AS n_sampled
      FROM k GROUP BY source HAVING sum(copies) > 0"""))

  /** q52 — leakage-safe split: per-cluster assignment, hash-checked end
    * to end (the oracle recomputes the connected components via the
    * recursive CTE and the same md5-prefix split of the canonical
    * doc). */
  val q52: Q = Q(
    "q52_split_leakage_safe",
    run = { (spark, dir) =>
      // exact pairs under the oracle gate (see DedupCluster.oracleExactMode):
      // the recursive-CTE oracle is exact, so the engine side must be too
      // when the comparison decides correctness
      leakageSafeSplitFrom(
        DedupCluster.clustersFor(spark, dir, DedupCluster.oracleExactMode),
        Tables.documentsParallel(spark, dir))
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
               substr(md5(CAST(cc.cluster_id AS VARCHAR) || '|' || COALESCE(t.text, '')), 1, 4) AS bucket
             FROM cc JOIN documents t ON t.doc_id = cc.cluster_id)
      SELECT doc_id, cluster_id,
        CASE WHEN bucket < 'cccc' THEN 'train'
             WHEN bucket < 'e666' THEN 'val'
             ELSE 'test' END AS split
      FROM cb"""))

  /** q74 — balanced downsampling: cap every source at the SMALLEST
    * source's document count (the equal-share mix a contrastive or
    * multi-domain training run wants), selecting survivors by md5 rank
    * so the draw is a pure function of doc identity — stable across
    * runs, engines, and partitionings, hence hash-oracle-checkable
    * (unlike an RNG sample). One row_number window per source + a
    * broadcast single-row target; the window never sees more than one
    * source's rows per partition — the q58 shuffle shape. */
  val q74: Q = Q(
    "q74_balanced_downsample",
    run = { (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      val d = Tables.documentsParallel(spark, dir)
        .select(col("doc_id"), col("source"))
      val target = d.groupBy(col("source"))
        .agg(count(lit(1)).as("n_src"))
        .agg(min(col("n_src")).as("target_n"))
      val w = Window.partitionBy(col("source"))
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      d.withColumn("rk", row_number().over(w))
        .crossJoin(broadcast(target))
        .select(col("doc_id"), col("source"), col("rk"), col("target_n"),
          (col("rk") <= col("target_n")).as("keep"))
    },
    oracle = Some("""
      WITH d AS (SELECT doc_id, source FROM documents),
      t AS (SELECT min(n_src) AS target_n
            FROM (SELECT count(*) AS n_src FROM d GROUP BY source)),
      r AS (SELECT doc_id, source,
              CAST(row_number() OVER (PARTITION BY source
                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INTEGER)
                AS rk
            FROM d)
      SELECT doc_id, source, rk, target_n, rk <= target_n AS keep
      FROM r CROSS JOIN t"""))

  /** q83 — quality-weighted sampling: keep each doc with probability
    * equal to its q27 quality score, but DETERMINISTICALLY — the coin
    * flip is the doc's md5 8-hex prefix compared against the quality
    * rendered as an 8-hex threshold (floor(q·2³²)), so the draw is a
    * pure function of doc identity: stable across runs/engines/
    * partitionings and hash-oracle-checkable, unlike `rand() < q`.
    * E[keep fraction] = mean quality; the suite asserts the realized
    * rate at 4σ. Pure projection — no shuffle, no RNG state. */
  val q83: Q = Q(
    "q83_weighted_sample",
    run = { (spark, dir) =>
      val quality =
        (expr("size(filter(split(text, ' '), " +
          "t -> t = 'the' OR t = 'a' OR t = 'of' OR t = 'and' OR t = 'to'))")
          .cast("double") / size(split(col("text"), " "))) * 0.5 +
          (size(array_distinct(split(col("text"), " "))).cast("double") /
            size(split(col("text"), " "))) * 0.3 +
          least(col("n_chars").cast("double") / 500.0, lit(1.0)) * 0.2
      Tables.documentsParallel(spark, dir)
        .filter(col("text").isNotNull)
        .withColumn("quality", quality)
        .withColumn("h",
          md5(concat(col("doc_id").cast("string"), lit("|"), col("text"))))
        .withColumn("qhex", lpad(lower(hex(
          floor(col("quality") * 4294967296.0).cast("long"))), 8, "0"))
        .select(col("doc_id"), col("quality"),
          (substring(col("h"), 1, 8) < col("qhex")).as("keep"))
    },
    oracle = Some("""
      WITH d AS (SELECT doc_id, n_chars, text,
                   string_split(text, ' ') AS toks
                 FROM documents WHERE text IS NOT NULL),
      q AS (SELECT doc_id, text,
              (CAST(len(list_filter(toks, t -> t = 'the' OR t = 'a'
                  OR t = 'of' OR t = 'and' OR t = 'to')) AS DOUBLE)
                / len(toks)) * 0.5
              + (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)) * 0.3
              + least(CAST(n_chars AS DOUBLE) / 500.0, 1.0) * 0.2
                AS quality
            FROM d)
      SELECT doc_id, quality,
        substr(md5(CAST(doc_id AS VARCHAR) || '|' || text), 1, 8) <
          lpad(lower(hex(CAST(floor(quality * 4294967296.0) AS BIGINT))),
            8, '0') AS keep
      FROM q"""))

  /** Core of q176: PRIORITY SAMPLING (Duffield, Lund & Thorup 2007,
    * "Priority sampling for estimation of arbitrary subset sums") —
    * the weighted top-k sample a corpus-mixing pipeline draws when
    * heavier docs (more chars/tokens) should be proportionally more
    * likely to survive, while any subset's total weight stays
    * estimable from the sample alone. Each row gets priority
    * q = w / u with u uniform; the k highest-priority rows form the
    * sample. Integerized, engine-replayable: u = (first 8 md5 hex
    * digits of "prio|key") + 1 ∈ [1, 2³²], priority = (w·2³²) DIV u —
    * monotone in w/u, exact BIGINT (w·2³² ≤ ~4e13 for any real
    * n_chars), zero float knife-edges.
    *
    * Scale shape: ONE projection (the draw is a pure function of row
    * identity — re-runs land the identical sample on any cluster
    * size) + orderBy+limit, which plans TakeOrderedAndProject: every
    * partition keeps k rows, the driver merges k·p — no global sort,
    * no shuffle of the corpus, no window. Positions derive from the
    * ≤ k survivors via the q101 bounded collect_list recipe. */
  def prioritySample(docs: DataFrame, k: Int = 50): DataFrame = {
    val w = coalesce(col("n_chars"), lit(0L)) + lit(1L)
    val u = conv(substring(
        md5(concat(lit("prio|"), col("doc_id").cast("string"))), 1, 8),
      16, 10).cast("long") + lit(1L)
    val scored = docs.select(col("doc_id"), w.as("weight"), u.as("u"))
      .withColumn("priority", expr("(weight * 4294967296) DIV u"))
    scored.orderBy(col("priority").desc, col("doc_id").asc).limit(k)
      .agg(sort_array(collect_list(struct((-col("priority")).as("np"),
        col("doc_id").as("doc_id"), col("weight").as("weight")))).as("s"))
      .select(posexplode(col("s")).as(Seq("pos", "r")))
      .select(col("r.doc_id").as("doc_id"), col("r.weight").as("weight"),
        (-col("r.np")).as("priority"),
        (col("pos") + 1).cast("int").as("rnk"))
  }

  /** q176 — deterministic weighted priority sample of the corpus:
    * top-50 docs by integer Duffield priority (weight = n_chars + 1),
    * ranked. */
  val q176: Q = Q(
    "q176_priority_sample",
    run = { (spark, dir) =>
      prioritySample(Tables.documents(spark, dir))
    },
    oracle = Some("""
      WITH w AS (SELECT doc_id, COALESCE(n_chars, 0) + 1 AS weight
                 FROM documents),
      u AS (SELECT doc_id, weight,
              CAST(list_sum(list_transform(generate_series(1, 8),
                p -> CAST(strpos('0123456789abcdef',
                       substr(md5('prio|' || CAST(doc_id AS VARCHAR)),
                         CAST(p AS INTEGER), 1)) - 1 AS BIGINT)
                     * (CAST(1 AS BIGINT) << CAST(4 * (8 - p) AS INTEGER))))
                AS BIGINT) + 1 AS u
            FROM w),
      p AS (SELECT doc_id, weight,
              (weight * 4294967296) // u AS priority FROM u),
      r AS (SELECT doc_id, weight, priority,
              CAST(row_number() OVER (ORDER BY priority DESC, doc_id ASC)
                AS INTEGER) AS rnk
            FROM p)
      SELECT doc_id, weight, priority, rnk FROM r WHERE rnk <= 50"""))

  val all: Seq[Q] = Seq(q50, q51, q52, q54, q74, q83, q176)
}
