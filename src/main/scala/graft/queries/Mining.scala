package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame
import graft.{Q, Tables}

/** Multi-criteria and pattern-mining operators (SURVEY.md §2.8,
  * round-10 additions): the 2-D skyline (Pareto front) and basket
  * association rules — the "which entities are not dominated on any
  * tradeoff" and "which items predict which" primitives a curation
  * pipeline uses for frontier selection (cost vs quality, length vs
  * score) and co-occurrence boosting.
  *
  * Both are exact and hash-oracle-checked. The skyline deliberately
  * avoids BOTH the O(n²) NOT-EXISTS self-join (the naive oracle shape)
  * and a global-sort sweep: it is a banded distributed prefix-scan —
  * per-price minima, an in-band exclusive running minimum (a window
  * PARTITIONED by band, never partition-less), and a driver prefix-min
  * over the ≤ B band minima (a bounded collect of B rows) carried back
  * as a broadcast join. Association rules bound pair generation by the
  * per-basket self-join (Σ|basket|², never catalog²) — the q101/q130
  * edge recipe.
  */
object Mining {

  /** Price bands for the skyline prefix-scan. The band key only routes
    * the scan — correctness never depends on where a boundary falls —
    * so B trades driver state (B carry values) against in-band sort
    * width (~n/B rows per window partition). */
  private val skyBands = 64

  /** Core of q139: exact 2-D skyline, minimizing both dimensions
    * (Börzsönyi, Kossmann & Stocker 2001, "The Skyline Operator").
    * A row survives iff NO other row is ≤ on both dims and < on at
    * least one. Decomposed exactly as:
    *   survive(x) ⇔ x.d2 = min d2 at x.d1  AND  x.d2 < min d2 over d1' < x.d1
    * (the first clause handles same-d1 domination — strict in d2; the
    * second handles every strictly-smaller d1 — domination is then
    * automatic in d1). Duplicate (d1,d2) points all survive together,
    * matching the NOT-EXISTS oracle.
    *
    * Scale shape: ONE hash agg to per-d1 minima (map-side combined),
    * an in-BAND exclusive running min (window partitioned by the price
    * band — bounded sort width n/B, spillable, never a single-partition
    * window), a ≤B-row driver prefix-min broadcast back as the carry
    * from lower bands, and a final equi-join of the source against the
    * per-d1 verdict table. No self-join, no global sort; the only
    * corpus-sized shuffles are the d1 agg and the verdict join. */
  def skyline(pts: DataFrame, d1: String, d2: String): DataFrame = {
    val src = pts.withColumn("d1", col(d1)).withColumn("d2", col(d2))
    val stats = src.agg(min(col("d1")).cast("double"),
      max(col("d1")).cast("double")).collect()(0)
    if (stats.isNullAt(0)) return pts.limit(0)
    val (lo, hi) = (stats.getDouble(0), stats.getDouble(1))
    val span = if (hi > lo) hi - lo else 1.0
    def banded(df: DataFrame): DataFrame = df.withColumn("band",
      least(lit(skyBands - 1),
        floor((col("d1").cast("double") - lit(lo)) / lit(span) * lit(skyBands)))
        .cast("int"))
    // per-d1 minima — the only corpus-sized agg
    val perD1 = banded(src.groupBy(col("d1")).agg(min(col("d2")).as("m2")))
    // exclusive running min WITHIN the band (strictly-smaller d1 only:
    // d1 is unique per row here, so ROWS ... 1 PRECEDING is exact)
    val inBand = Window.partitionBy(col("band")).orderBy(col("d1"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val swept = perD1.withColumn("runm", min(col("m2")).over(inBand))
    // carry from strictly lower bands: ≤B rows → driver prefix-min →
    // broadcast back (the bounded-collect contract; B is a constant)
    val bandMin = perD1.groupBy(col("band")).agg(min(col("m2")).as("bm"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val spark = pts.sparkSession
    import spark.implicits._
    val carry = (0 until skyBands).map { b =>
      val prev = (0 until b).flatMap(bandMin.get)
      (b, if (prev.isEmpty) None else Some(prev.min))
    }.toDF("band", "carry")
    // Spark's least() skips nulls (null only when BOTH are), so the
    // carry-from-lower-bands and the in-band exclusive min merge in one
    val verdict = swept.join(broadcast(carry), Seq("band"))
      .withColumn("m", least(col("runm"), col("carry")))
      .filter(col("m").isNull || col("m2") < col("m"))
      .select(col("d1").as("sd1"), col("m2"))
    src.join(verdict, col("d1") === col("sd1") && col("d2") === col("m2"))
      .select(pts.columns.map(col).toIndexedSeq: _*)
  }

  /** q139 — skyline of parts minimizing (p_retailprice, p_size): the
    * cheapest-at-each-size-class Pareto front. d2 (p_size) is integral
    * so the per-d1 min and carry stay in exact integer arithmetic; d1
    * is only ever compared, never computed on. */
  val q139: Q = Q(
    "q139_skyline",
    run = { (spark, dir) =>
      skyline(
        Tables.part(spark, dir)
          .select(col("p_partkey"), col("p_retailprice"),
            col("p_size").cast("long").as("p_size")),
        "p_retailprice", "p_size")
    },
    oracle = Some("""
      SELECT a.p_partkey, a.p_retailprice, CAST(a.p_size AS BIGINT) AS p_size
      FROM part a
      WHERE NOT EXISTS (
        SELECT 1 FROM part b
        WHERE b.p_retailprice <= a.p_retailprice AND b.p_size <= a.p_size
          AND (b.p_retailprice < a.p_retailprice OR b.p_size < a.p_size))"""))

  /** Support / confidence floors for q142. Support is an absolute
    * basket count (scale-calibrated by the caller at real volume);
    * the confidence floor keeps only rules with real predictive pull. */
  private val minSupport = 2L
  private val minConfidence = 0.1

  /** Core of q142: pairwise association rules over baskets (Agrawal &
    * Srikant 1994's support/confidence frame, at the pair level — the
    * 2-itemset tier that covers the overwhelming share of production
    * basket signal without the combinatorial candidate lattice).
    * For every ordered pair (ante → cons) co-occurring in ≥ minSupport
    * baskets: support (co-basket count), confidence = supp(a,b)/supp(a),
    * lift = supp(a,b)·N / (supp(a)·supp(b)) — both computed as the same
    * IEEE double expression tree on both engines (a mult-mult-div of
    * exact integers ≤ 2⁵³, so the doubles agree bit-for-bit).
    *
    * Scale shape: pair generation is the per-basket self-join AFTER a
    * per-basket distinct — Σ|basket|² pairs, never catalog² (the q101
    * edge recipe); supports are map-side-combined hash aggs; the two
    * item-support joins are catalog-sized equi-joins AQE broadcasts
    * when small (not forced — the item table grows with the catalog,
    * the q128 advice). N rides a 1-row cross join, not a collect. */
  def assocRules(baskets: DataFrame): DataFrame = {
    val li = baskets.distinct()
    val n = li.select(col("ok")).distinct().agg(count("*").as("n"))
    val itemSupp = li.groupBy(col("part")).agg(count("*").as("supp_one"))
    val pairs = li.select(col("ok"), col("part").as("pa"))
      .join(li.select(col("ok").as("ok2"), col("part").as("pb")),
        col("ok") === col("ok2") && col("pa") =!= col("pb"))
      .groupBy(col("pa"), col("pb")).agg(count("*").as("support"))
      .filter(col("support") >= minSupport)
    pairs
      .join(itemSupp.select(col("part").as("pa"), col("supp_one").as("supp_a")),
        Seq("pa"))
      .join(itemSupp.select(col("part").as("pb"), col("supp_one").as("supp_b")),
        Seq("pb"))
      .crossJoin(broadcast(n))
      .withColumn("confidence",
        col("support").cast("double") / col("supp_a").cast("double"))
      .withColumn("lift",
        col("support").cast("double") * col("n").cast("double") /
          (col("supp_a").cast("double") * col("supp_b").cast("double")))
      .filter(col("confidence") >= minConfidence)
      .select(col("pa").as("ante"), col("pb").as("cons"),
        col("support"), col("confidence"), col("lift"))
  }

  /** q142 — association rules over order baskets (ante → cons part
    * pairs with support ≥ 2 baskets and confidence ≥ 0.1). */
  val q142: Q = Q(
    "q142_assoc_rules",
    run = { (spark, dir) =>
      assocRules(Tables.lineitem(spark, dir)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("part")))
    },
    oracle = Some("""
      WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS part
                  FROM lineitem),
      n AS (SELECT count(*) AS n FROM (SELECT DISTINCT ok FROM li)),
      item AS (SELECT part, count(*) AS supp_one FROM li GROUP BY part),
      pairs AS (
        SELECT a.part AS pa, b.part AS pb, count(*) AS support
        FROM li a JOIN li b ON a.ok = b.ok AND a.part <> b.part
        GROUP BY a.part, b.part
        HAVING count(*) >= 2)
      SELECT p.pa AS ante, p.pb AS cons, p.support,
        CAST(p.support AS DOUBLE) / CAST(ia.supp_one AS DOUBLE) AS confidence,
        CAST(p.support AS DOUBLE) * CAST(n.n AS DOUBLE) /
          (CAST(ia.supp_one AS DOUBLE) * CAST(ib.supp_one AS DOUBLE)) AS lift
      FROM pairs p
      JOIN item ia ON ia.part = p.pa
      JOIN item ib ON ib.part = p.pb
      CROSS JOIN n
      WHERE CAST(p.support AS DOUBLE) / CAST(ia.supp_one AS DOUBLE) >= 0.1"""))

  /** Neighborhood size for q144's per-item recommendation list. */
  private val cfTopK = 5

  /** Core of q144: item-item collaborative filtering (Sarwar et al.
    * 2001, "Item-based collaborative filtering recommendation
    * algorithms") on the binary basket-membership matrix: cosine
    * similarity sim(a,b) = co(a,b) / √(supp(a)·supp(b)) for pairs
    * co-occurring in ≥ minSupport baskets, then the top-k neighbors
    * per item — the precomputed item-neighborhood table a recommender
    * serves from (and a curation pipeline's "related items" signal).
    *
    * Determinism: co/supp are exact BIGINTs; the one √ and ÷ are IEEE
    * ops on identical inputs (√ is correctly-rounded per IEEE-754, so
    * both engines produce the same double bit-for-bit); rank ties
    * break on the neighbor id. Scale shape: pair generation per-basket
    * bounded (Σ|basket|²), supports map-side combined, the top-k is a
    * per-item rank window (partitioned, never global). */
  def itemCf(baskets: DataFrame): DataFrame = {
    val li = baskets.distinct()
    val itemSupp = li.groupBy(col("part")).agg(count(lit(1)).as("supp_one"))
    val co = li.select(col("ok"), col("part").as("pa"))
      .join(li.select(col("ok").as("ok2"), col("part").as("pb")),
        col("ok") === col("ok2") && col("pa") =!= col("pb"))
      .groupBy(col("pa"), col("pb")).agg(count(lit(1)).as("co"))
      .filter(col("co") >= minSupport)
    val scored = co
      .join(itemSupp.select(col("part").as("pa"), col("supp_one").as("supp_a")),
        Seq("pa"))
      .join(itemSupp.select(col("part").as("pb"), col("supp_one").as("supp_b")),
        Seq("pb"))
      .withColumn("sim", col("co").cast("double") /
        sqrt(col("supp_a").cast("double") * col("supp_b").cast("double")))
    val byItem = Window.partitionBy(col("pa"))
      .orderBy(col("sim").desc, col("pb").asc)
    scored.withColumn("rank", row_number().over(byItem))
      .filter(col("rank") <= cfTopK)
      .select(col("pa").as("item"), col("pb").as("neighbor"),
        col("co"), col("sim"), col("rank"))
  }

  /** q144 — top-5 cosine item neighborhoods over order baskets. */
  val q144: Q = Q(
    "q144_item_cf",
    run = { (spark, dir) =>
      itemCf(Tables.lineitem(spark, dir)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("part")))
    },
    oracle = Some("""
      WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS part
                  FROM lineitem),
      item AS (SELECT part, count(*) AS supp_one FROM li GROUP BY part),
      co AS (
        SELECT a.part AS pa, b.part AS pb, count(*) AS co
        FROM li a JOIN li b ON a.ok = b.ok AND a.part <> b.part
        GROUP BY a.part, b.part
        HAVING count(*) >= 2),
      scored AS (
        SELECT co.pa, co.pb, co.co,
          CAST(co.co AS DOUBLE) /
            sqrt(CAST(ia.supp_one AS DOUBLE) * CAST(ib.supp_one AS DOUBLE))
            AS sim
        FROM co
        JOIN item ia ON ia.part = co.pa
        JOIN item ib ON ib.part = co.pb)
      SELECT pa AS item, pb AS neighbor, co, sim, CAST(rank AS INTEGER) AS rank
      FROM (SELECT pa, pb, co, sim, row_number() OVER (
              PARTITION BY pa ORDER BY sim DESC, pb ASC) AS rank
            FROM scored)
      WHERE rank <= 5"""))

  val all: Seq[Q] = Seq(q139, q142, q144)
}
