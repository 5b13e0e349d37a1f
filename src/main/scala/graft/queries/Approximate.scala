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

  /** Core of q160: approximate quantiles from a fixed-bin HISTOGRAM —
    * the deterministic, mergeable quantile structure (the q159 story
    * applied to q39's other half: where KLL/GK are engine-private,
    * equi-width bin counts are pure arithmetic both engines replay
    * exactly). Two passes: exact per-group (min, max, n), then one
    * hash agg into ≤ groups·bins cells; the estimate walks the 256-row
    * cumulative per group to the ceil(q·n) rank (INTEGER ceil —
    * (q·n+99) DIV 100, no float rank) and reports the bin midpoint.
    * Bin counts ADD cell-wise, so partition partials ARE local
    * histograms and the shuffle merges them — same mergeability as
    * the CMS, suite-asserted. At 100 TB: two scans, constant state,
    * error bounded by one bin width of the [min,max] span. */
  def histQuantiles(vals: org.apache.spark.sql.DataFrame,
      bins: Int = 256, qpcts: Seq[Int] = Seq(50, 90, 99))
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val s = vals.groupBy(col("flag")).agg(
      min(col("v")).as("mn"), max(col("v")).as("mx"),
      count(lit(1)).as("n"))
    val h = vals.join(broadcast(s), "flag")
      .withColumn("bin", when(col("mx") === col("mn"), lit(0)).otherwise(
        least(lit(bins - 1),
          floor((col("v") - col("mn")) * lit(bins)
            / (col("mx") - col("mn"))).cast("int"))))
      .groupBy(col("flag"), col("bin")).agg(count(lit(1)).as("c"))
    val cum = h.withColumn("cum", sum(col("c")).over(
      Window.partitionBy(col("flag")).orderBy(col("bin"))))
      .select(col("flag").as("cflag"), col("bin"), col("cum"))
    val qdf = vals.sparkSession
      .createDataset(qpcts)(org.apache.spark.sql.Encoders.scalaInt)
      .toDF("qpct")
    s.crossJoin(broadcast(qdf))
      .withColumn("tr", expr("(qpct * n + 99) DIV 100"))
      .join(cum, col("cflag") === col("flag") && col("cum") >= col("tr"))
      .groupBy(col("flag"), col("qpct"), col("n"), col("mn"), col("mx"))
      .agg(min(col("bin")).as("est_bin"))
      .withColumn("est", when(col("mx") === col("mn"), col("mn"))
        .otherwise(col("mn")
          + (col("est_bin") + lit(0.5)) * (col("mx") - col("mn"))
            / lit(bins.toDouble)))
      .select(col("flag").as("l_returnflag"), col("qpct"), col("n"),
        col("est_bin"), col("est"))
  }

  /** q160 — histogram-quantile estimates (p50/p90/p99 of
    * l_extendedprice per returnflag) under the exact hash gate. */
  val q160: Q = Q(
    "q160_hist_quantiles",
    run = { (spark, dir) =>
      histQuantiles(Tables.lineitem(spark, dir)
        .select(col("l_returnflag").as("flag"),
          col("l_extendedprice").as("v")))
    },
    oracle = Some("""
      WITH l AS (SELECT l_returnflag AS flag, l_extendedprice AS v
                 FROM lineitem),
      s AS (SELECT flag, min(v) AS mn, max(v) AS mx,
              CAST(count(*) AS BIGINT) AS n FROM l GROUP BY flag),
      b AS (SELECT l.flag,
              CASE WHEN s.mx = s.mn THEN 0
                   ELSE LEAST(255, CAST(floor((l.v - s.mn) * 256
                     / (s.mx - s.mn)) AS INTEGER)) END AS bin
            FROM l JOIN s USING (flag)),
      h AS (SELECT flag, bin, CAST(count(*) AS BIGINT) AS c
            FROM b GROUP BY flag, bin),
      cum AS (SELECT flag, bin,
                CAST(sum(c) OVER (PARTITION BY flag ORDER BY bin)
                  AS BIGINT) AS cum FROM h),
      qs AS (SELECT CAST(unnest([50, 90, 99]) AS INTEGER) AS qpct),
      t AS (SELECT s.flag, qs.qpct, s.n, s.mn, s.mx,
              (qs.qpct * s.n + 99) // 100 AS tr
            FROM s CROSS JOIN qs),
      eb AS (SELECT t.flag, t.qpct, t.n, t.mn, t.mx,
               CAST(min(c.bin) AS INTEGER) AS est_bin
             FROM t JOIN cum c ON c.flag = t.flag AND c.cum >= t.tr
             GROUP BY t.flag, t.qpct, t.n, t.mn, t.mx)
      SELECT flag AS l_returnflag, qpct, n, est_bin,
        CASE WHEN mx = mn THEN mn
             ELSE mn + (est_bin + 0.5) * (mx - mn) / 256.0 END AS est
      FROM eb"""))

  /** Core of q161: LINEAR-COUNTING distinct estimation (Whang et al.
    * 1990) — the cardinality member of the deterministic sketch trio
    * (q159 frequency, q160 quantiles): users hash into an m-cell
    * bitmap via the md5 family, the estimate is m·ln(m/(m−occupied)),
    * and because the bitmap is a pure function of the input the oracle
    * replays cells AND estimate exactly — where q77's HLL sketch is
    * engine-private, this one is hash-gated. Bitmaps OR cell-wise
    * (occupied(A ∪ B) = |cells(A) ∪ cells(B)| — suite-asserted), so
    * partition partials merge like every other sketch here. At 100 TB
    * the state is m bits per group vs count(distinct)'s shuffle of
    * every distinct key; load factors past ~occupied/m ≈ 0.7 need a
    * bigger m (the saturated m == occupied case returns NULL rather
    * than ∞). */
  def linearCountUsers(events: org.apache.spark.sql.DataFrame,
      m: Int = 4096): org.apache.spark.sql.DataFrame =
    events
      .select(date_format(col("ts"), "yyyy-MM-dd").as("day"),
        col("user_id"))
      .withColumn("cell",
        (conv(substring(md5(concat(lit("lc|"),
          col("user_id").cast("string"))), 1, 4), 16, 10).cast("long")
          % m).cast("int"))
      .groupBy(col("day"))
      .agg(countDistinct(col("user_id")).as("true_distinct"),
        countDistinct(col("cell")).as("occupied_cells"))
      .withColumn("lc_est", when(col("occupied_cells") < m,
        lit(m.toDouble) * log(lit(m.toDouble)
          / (lit(m.toDouble) - col("occupied_cells")))))

  /** q161 — linear-counting distinct users per day under the exact
    * hash gate, with the true count alongside for the accuracy story. */
  val q161: Q = Q(
    "q161_linear_count",
    run = { (spark, dir) => linearCountUsers(Tables.events(spark, dir)) },
    oracle = Some("""
      WITH e AS (SELECT strftime(CAST(CAST(ts AS TIMESTAMP) AS DATE),
                   '%Y-%m-%d') AS day, user_id FROM events),
      c AS (SELECT day, user_id,
              CAST(list_sum(list_transform(generate_series(1, 4),
                p -> (strpos('0123456789abcdef',
                       substr(md5('lc|' || CAST(user_id AS VARCHAR)),
                         CAST(p AS INTEGER), 1)) - 1)
                     * (CAST(1 AS BIGINT)
                        << CAST(4 * (4 - p) AS INTEGER))))
                % 4096 AS INTEGER) AS cell
            FROM e)
      SELECT day,
        CAST(count(DISTINCT user_id) AS BIGINT) AS true_distinct,
        CAST(count(DISTINCT cell) AS BIGINT) AS occupied_cells,
        CASE WHEN count(DISTINCT cell) < 4096
             THEN 4096.0 * ln(4096.0 / (4096.0 - count(DISTINCT cell)))
             ELSE NULL END AS lc_est
      FROM c GROUP BY day"""))

  val all: Seq[Q] = Seq(q39, q159, q160, q161)
}
