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

  val all: Seq[Q] = Seq(q39)
}
