package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{Q, Tables}
import graft.functions.Exact._

/** Window/aggregate coverage round-out: RANGE frames (value-based, not
  * row-based), first/last_value analytics, and grouped exact
  * percentiles.
  */
object Windows2 {

  /** Q44 — RANGE frame: per customer, spend in the 30 days up to each
    * order (value-range frame over a day-number ordering — rows at equal
    * distance enter together, unlike ROWS frames) plus first/last_value
    * over the partition. */
  val q44: Q = Q(
    "q44_window_range_frame",
    run = { (spark, dir) =>
      val o = Tables.orders(spark, dir)
        .withColumn("day_no",
          datediff(to_date(col("o_orderdate")), lit("1995-01-01").cast(DateType)))
      val byCust = Window.partitionBy("o_custkey").orderBy(col("day_no"))
      val full = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      o.select(
        col("o_orderkey"), col("o_custkey"), col("day_no"),
        sum(dec(col("o_totalprice"))).over(byCust.rangeBetween(-30, 0))
          .cast(DoubleType).as("spend_30d"),
        first(col("o_totalprice")).over(full).as("first_price"),
        last(col("o_totalprice")).over(full).as("last_price"))
    },
    oracle = Some("""
      WITH o AS (SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice,
                   CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS day_no
                 FROM orders)
      SELECT o_orderkey, o_custkey, day_no,
        CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(12,4)))
          OVER (PARTITION BY o_custkey ORDER BY day_no
                RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE) AS spend_30d,
        first_value(o_totalprice)
          OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_price,
        last_value(o_totalprice)
          OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_price
      FROM o"""))

  /** Q45 — grouped exact percentiles (sort-based aggregate; linear
    * interpolation in both engines). */
  val q45: Q = Q(
    "q45_percentiles",
    run = { (spark, dir) =>
      // one array-percentile call: a single counting structure per group
      // instead of three (3x less state, one final sort)
      Tables.lineitem(spark, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          percentile(col("l_extendedprice"),
            array(lit(0.25), lit(0.5), lit(0.75))).as("ps"),
          min(col("l_extendedprice")).as("lo"),
          max(col("l_extendedprice")).as("hi"))
        .select(col("l_returnflag"),
          col("ps").getItem(0).as("p25"),
          col("ps").getItem(1).as("median"),
          col("ps").getItem(2).as("p75"),
          col("lo"), col("hi"))
    },
    oracle = Some("""
      SELECT l_returnflag,
        quantile_cont(l_extendedprice, 0.25) AS p25,
        quantile_cont(l_extendedprice, 0.5) AS median,
        quantile_cont(l_extendedprice, 0.75) AS p75,
        min(l_extendedprice) AS lo,
        max(l_extendedprice) AS hi
      FROM lineitem GROUP BY l_returnflag"""))

  val all: Seq[Q] = Seq(q44, q45)
}
