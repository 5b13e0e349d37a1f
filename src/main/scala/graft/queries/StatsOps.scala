package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}
import graft.{Q, Tables}

/** Statistical aggregates with deterministic, oracle-exact recipes
  * (SURVEY.md §2.B): grouped mode with an explicit tie-break, and
  * Pearson correlation assembled from exact moment sums.
  *
  * Spark's own `mode()` and `corr()` are the obvious spellings, and a
  * user of this library can call them — but neither is hash-stable
  * (`mode` breaks ties arbitrarily; `corr` accumulates doubles in
  * partition order), so the REGISTRY versions are the deterministic
  * formulations: mode = count + top-1 window with a value tie-break;
  * corr = five exact integer/decimal moment sums (order-free under any
  * partial-agg schedule) assembled into the final scalar with one
  * fixed double expression tree per group — the q64 z-score recipe
  * generalized to a two-variable statistic.
  */
object StatsOps {

  /** q81 — grouped mode: the most frequent l_quantity per return flag,
    * smallest-value tie-break, with its multiplicity. Two hash aggs +
    * a per-group top-1 window (partial counts combine map-side; the
    * window sees one row per distinct value, not per input row). */
  val q81: Q = Q(
    "q81_grouped_mode",
    run = { (spark, dir) =>
      val counts = Tables.lineitem(spark, dir)
        .groupBy(col("l_returnflag"), col("l_quantity"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("n").desc, col("l_quantity").asc)
      counts.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("l_returnflag"), col("l_quantity").as("mode_qty"),
          col("n").as("n_occurrences"))
    },
    oracle = Some("""
      WITH c AS (SELECT l_returnflag, l_quantity,
                   CAST(count(*) AS BIGINT) AS n
                 FROM lineitem GROUP BY 1, 2),
      r AS (SELECT *, row_number() OVER (PARTITION BY l_returnflag
              ORDER BY n DESC, l_quantity ASC) AS rn FROM c)
      SELECT l_returnflag, l_quantity AS mode_qty, n AS n_occurrences
      FROM r WHERE rn = 1"""))

  /** q82 — Pearson correlation between event value and hour-of-day per
    * event type ("do error values spike at night?"), from exact
    * moments: n (BIGINT), Σx/Σx² (BIGINT — hour is an integer),
    * Σy/Σxy/Σy² (exact decimals of the DECIMAL(12,4)-cast value). The
    * five sums commute under any partial-agg order; the final
    * correlation is ONE double expression over the single aggregated
    * row per group, written with the identical operation tree in the
    * oracle (IEEE ops on identical inputs are bit-identical). Decimal
    * sums surface through the VARCHAR-routed cast (DuckDB's
    * decimal→double is off by 1 ulp above ~2e9). */
  val q82: Q = Q(
    "q82_correlation",
    run = { (spark, dir) =>
      val m = Tables.events(spark, dir)
        .select(col("event_type"), hour(col("ts")).cast("long").as("x"),
          col("value").cast(DecimalType(12, 4)).as("y"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"),
          sum(col("x") * col("x")).as("sx2"),
          sum(col("y")).as("sy"),
          sum(col("y") * col("y")).as("sy2"),
          sum(col("y") * col("x").cast(DecimalType(12, 0))).as("sxy"))
      m.select(col("event_type"), col("n"),
        ((col("n").cast(DoubleType) * col("sxy").cast(DoubleType) -
          col("sx").cast(DoubleType) * col("sy").cast(DoubleType)) /
          sqrt((col("n").cast(DoubleType) * col("sx2").cast(DoubleType) -
            col("sx").cast(DoubleType) * col("sx").cast(DoubleType)) *
            (col("n").cast(DoubleType) * col("sy2").cast(DoubleType) -
              col("sy").cast(DoubleType) * col("sy").cast(DoubleType))))
          .as("corr_value_hour"))
    },
    oracle = Some("""
      WITH m AS (SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(x) AS BIGINT) AS sx,
                   CAST(sum(x * x) AS BIGINT) AS sx2,
                   sum(y) AS sy, sum(y * y) AS sy2, sum(y * x) AS sxy
                 FROM (SELECT event_type,
                         CAST(hour(CAST(ts AS TIMESTAMP)) AS BIGINT) AS x,
                         CAST(value AS DECIMAL(12,4)) AS y
                       FROM events)
                 GROUP BY event_type)
      SELECT event_type, n,
        (CAST(n AS DOUBLE) * CAST(CAST(sxy AS VARCHAR) AS DOUBLE) -
         CAST(sx AS DOUBLE) * CAST(CAST(sy AS VARCHAR) AS DOUBLE)) /
        sqrt((CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE) -
              CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
             (CAST(n AS DOUBLE) * CAST(CAST(sy2 AS VARCHAR) AS DOUBLE) -
              CAST(CAST(sy AS VARCHAR) AS DOUBLE) *
                CAST(CAST(sy AS VARCHAR) AS DOUBLE)))
          AS corr_value_hour
      FROM m"""))

  val all: Seq[Q] = Seq(q81, q82)
}
