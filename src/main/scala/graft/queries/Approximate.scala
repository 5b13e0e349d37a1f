package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Approximate aggregates (SURVEY.md §2.8 exclusions: tested by bounds,
  * not hash-matched — HLL++ and KLL/GK sketches are engine-specific).
  * These are the 100 TB workhorses: approx_count_distinct is one pass +
  * constant memory vs count(distinct)'s shuffle of every distinct value;
  * approx_percentile replaces the exact median's full sort.
  */
object Approximate {

  /** q39 — sketch aggregates per returnflag (rows-only check; error
    * bounds vs exact are asserted in ApproxSpec). */
  val q39: Q = Q(
    "q39_approx_aggs",
    run = { (spark, dir) =>
      Tables.lineitem(spark, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
          approx_percentile(col("l_extendedprice"), lit(0.5), lit(10000))
            .as("approx_median_price"),
          approx_percentile(col("l_extendedprice"), lit(0.99), lit(10000))
            .as("approx_p99_price"))
    },
    oracle = None)

  /** Core of q159: a COUNT-MIN SKETCH over the corpus token stream —
    * the mergeable heavy-hitter structure (Cormode & Muthukrishnan
    * 2005) every streaming/distributed frequency system ships. Unlike
    * q39's engine-private HLL/KLL sketches, this one is built on the
    * repo's md5 hash family, so it is fully DETERMINISTIC and the
    * DuckDB oracle replays every cell and every estimate digit-by-
    * digit — an approximate structure under an EXACT hash gate: the
    * gate certifies the sketch's construction and probe, while the
    * suite asserts its analytic guarantees (est ≥ true always;
    * cell-wise additivity = mergeability).
    *
    * Scale shape: rides the session-landed tf; cell building is ONE
    * hash agg into depth·width (4·1024) cells — map-side combined, so
    * each partition's partial IS its local sketch and the shuffle
    * merges sketches (the mergeability claim realized by Spark's own
    * partial aggregation); probing joins the 20-row heavy-hitter table
    * against the broadcast 4096-cell sketch. At 100 TB the sketch is
    * the only state that crosses the wire — constant bytes regardless
    * of corpus size. */
  private def cellOf(r: Int, width: Int) =
    (conv(substring(md5(concat(lit(s"cms$r|"), col("token"))), 1, 4),
      16, 10).cast("long") % width).cast("int")

  /** The sketch itself: depth·width cells from a (doc_id, token, tf)
    * stream — exposed so the suite can assert cell-wise ADDITIVITY
    * (sketch(A ∪ B) = sketch(A) ⊕ sketch(B)), the mergeability
    * property that makes CMS the distributed/streaming structure. */
  private[graft] def cmsCells(tf: org.apache.spark.sql.DataFrame,
      depth: Int = 4, width: Int = 1024): org.apache.spark.sql.DataFrame =
    tf.groupBy(col("token")).agg(sum(col("tf")).as("cnt"))
      .select(explode(array((0 until depth).map(r =>
        struct(lit(r).as("r"), cellOf(r, width).as("cell"),
          col("cnt").as("cnt"))): _*)).as("e"))
      .groupBy(col("e.r").as("r"), col("e.cell").as("cell"))
      .agg(sum(col("e.cnt")).as("cell_cnt"))

  def cmsHeavyHitters(tf: org.apache.spark.sql.DataFrame,
      depth: Int = 4, width: Int = 1024, topK: Int = 20)
      : org.apache.spark.sql.DataFrame = {
    val counts = tf.groupBy(col("token")).agg(sum(col("tf")).as("cnt"))
    val cells = cmsCells(tf, depth, width)
    // the probe set: the topK TRUE heavy hitters (deterministic
    // tie-break), estimated from the sketch alone
    val heavy = counts
      .orderBy(col("cnt").desc, col("token").asc).limit(topK)
    heavy
      .select(col("token"), col("cnt").as("true_cnt"),
        explode(array((0 until depth).map(r =>
          struct(lit(r).as("r"), cellOf(r, width).as("cell"))): _*)).as("p"))
      .join(cells, col("p.r") === col("r") && col("p.cell") === col("cell"))
      .groupBy(col("token"), col("true_cnt"))
      .agg(min(col("cell_cnt")).as("cms_est"))
      .withColumn("overcount", col("cms_est") - col("true_cnt"))
  }

  /** q159 — count-min-sketch heavy hitters under the exact hash gate:
    * the top-20 true tokens with their sketch estimates and
    * overcounts. */
  val q159: Q = Q(
    "q159_cms_heavyhitters",
    run = { (spark, dir) =>
      cmsHeavyHitters(graft.queries.Retrieval.tfFor(spark, dir))
    },
    oracle = Some("""
      WITH d AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
      toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM d),
      counts AS (SELECT token, CAST(count(*) AS BIGINT) AS cnt
                 FROM toks GROUP BY token),
      rows_ AS (SELECT unnest(generate_series(0, 3)) AS r),
      hashed AS (SELECT c.token, c.cnt, r.r,
                   CAST(list_sum(list_transform(generate_series(1, 4),
                     p -> (strpos('0123456789abcdef',
                            substr(md5('cms' || CAST(r.r AS VARCHAR) || '|'
                              || c.token), CAST(p AS INTEGER), 1)) - 1)
                          * (CAST(1 AS BIGINT)
                             << CAST(4 * (4 - p) AS INTEGER))))
                     % 1024 AS INTEGER) AS cell
                 FROM counts c CROSS JOIN rows_ r),
      cells AS (SELECT r, cell, CAST(sum(cnt) AS BIGINT) AS cell_cnt
                FROM hashed GROUP BY r, cell),
      heavy AS (SELECT token, cnt FROM (
                  SELECT token, cnt, row_number() OVER
                    (ORDER BY cnt DESC, token ASC) AS hrnk FROM counts)
                WHERE hrnk <= 20),
      est AS (SELECT h.token, h.cnt AS true_cnt,
                CAST(min(cl.cell_cnt) AS BIGINT) AS cms_est
              FROM heavy h
              JOIN hashed x ON x.token = h.token
              JOIN cells cl ON cl.r = x.r AND cl.cell = x.cell
              GROUP BY h.token, h.cnt)
      SELECT token, true_cnt, cms_est,
        CAST(cms_est - true_cnt AS BIGINT) AS overcount
      FROM est"""))

  val all: Seq[Q] = Seq(q39, q159)
}
