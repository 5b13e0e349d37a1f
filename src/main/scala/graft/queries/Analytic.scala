package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{Q, Tables}
import graft.functions.Exact._

/** Analytic surface (SURVEY.md §2.8 Q6–Q10): as-of join, window
  * functions (ranking / analytic / frames), top-k, set operations,
  * grouping sets, and the scalar-function suite.
  *
  * Determinism rules applied throughout: every window ordering includes a
  * unique tie-break key; windowed float sums go through exact decimals
  * (DuckDB's segment-tree accumulation order differs from Spark's frame
  * iteration, so raw double frame-sums drift).
  */
object Analytic {

  /** Q13 — as-of join, composed Spark-first (SURVEY §2.B "as-of"): for
    * each purchase event, the latest strictly-preceding click of the same
    * user. Implemented as union-free single-pass window `last(ignoreNulls)`
    * over (user_id, ts) — ONE shuffle on user_id, no range-join blowup;
    * this is the 100 TB-safe as-of shape (events per user stream through
    * a sorted window, never pairwise).
    */
  val q13: Q = Q(
    "q13_asof_join",
    run = { (spark, dir) =>
      val ev = Tables.events(spark, dir)
        .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      ev.withColumn("last_click_id",
          last(when(col("event_type") === "click", col("event_id")), ignoreNulls = true).over(w))
        .withColumn("last_click_ts",
          last(when(col("event_type") === "click", col("ts")), ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts").as("ts_us"),
          col("last_click_id"), col("last_click_ts").as("last_click_ts_us"))
    },
    oracle = Some("""
      WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
      m AS (SELECT e.*,
        last_value(CASE WHEN event_type='click' THEN event_id END IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_id,
        last_value(CASE WHEN event_type='click' THEN ts END IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_ts
      FROM e)
      SELECT event_id, user_id, ts AS ts_us, last_click_id,
             last_click_ts AS last_click_ts_us
      FROM m WHERE event_type = 'purchase'"""))

  /** Q14 — ranking windows: rank/dense_rank over a coarse bucket (real
    * ties), row_number/ntile over the total order (unique tie-break). */
  val q14: Q = Q(
    "q14_window_ranks",
    run = { (spark, dir) =>
      val c = Tables.customer(spark, dir)
        .withColumn("bal_bucket", floor(col("c_acctbal") / 1000).cast(LongType))
      val byNation = Window.partitionBy("c_nationkey")
      val tieOrder = byNation.orderBy(col("bal_bucket"), col("c_custkey"))
      c.select(
        col("c_custkey"), col("c_nationkey"), col("bal_bucket"),
        rank().over(byNation.orderBy(col("bal_bucket"))).as("rnk"),
        dense_rank().over(byNation.orderBy(col("bal_bucket"))).as("drnk"),
        row_number().over(tieOrder).as("rn"),
        ntile(4).over(tieOrder).as("quartile"))
    },
    oracle = Some("""
      WITH c AS (SELECT c_custkey, c_nationkey,
                   CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_bucket
                 FROM customer)
      SELECT c_custkey, c_nationkey, bal_bucket,
        CAST(rank()       OVER (PARTITION BY c_nationkey ORDER BY bal_bucket) AS INTEGER) AS rnk,
        CAST(dense_rank() OVER (PARTITION BY c_nationkey ORDER BY bal_bucket) AS INTEGER) AS drnk,
        CAST(row_number() OVER (PARTITION BY c_nationkey ORDER BY bal_bucket, c_custkey) AS INTEGER) AS rn,
        CAST(ntile(4)     OVER (PARTITION BY c_nationkey ORDER BY bal_bucket, c_custkey) AS INTEGER) AS quartile
      FROM c"""))

  /** Q15 — analytic windows: lag/lead + moving frame sum (exact decimal)
    * + running count, per customer over order date. */
  val q15: Q = Q(
    "q15_window_analytic",
    run = { (spark, dir) =>
      val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(spark, dir).select(
        col("o_orderkey"), col("o_custkey"), col("o_orderdate"), col("o_totalprice"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"),
        sum(dec(col("o_totalprice"))).over(w.rowsBetween(-2, 0))
          .cast(DoubleType).as("moving3_sum"),
        count(lit(1)).over(w.rowsBetween(Window.unboundedPreceding, 0))
          .as("running_n"))
    },
    oracle = Some("""
      SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice,
        lag(o_totalprice)  OVER w AS prev_price,
        lead(o_totalprice) OVER w AS next_price,
        CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(12,4)))
          OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE) AS moving3_sum,
        CAST(count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_n
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)"""))

  /** Q16 — top-k: Catalyst fuses orderBy+limit into TakeOrderedAndProject
    * (per-partition heaps + driver merge — no global sort at scale).
    * Aggregation is eagerly pushed below both joins (exact decimal sums
    * re-aggregate losslessly): lineitem → per-order revenue → per-customer
    * revenue → broadcast-join customer names last, so the wide name
    * column never rides through a shuffle. */
  val q16: Q = Q(
    "q16_topk",
    run = { (spark, dir) =>
      val perOrder = Tables.lineitem(spark, dir)
        .groupBy(col("l_orderkey"))
        .agg(dsumExprDec(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .as("rev_dec"))
      val perCust = Tables.orders(spark, dir)
        .join(perOrder, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(sum(col("rev_dec")).as("rev_dec2"))
      Tables.customer(spark, dir)
        .join(perCust, col("c_custkey") === col("o_custkey"))
        .select(col("c_custkey"), col("c_name"),
          col("rev_dec2").cast(DoubleType).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(10)
    },
    oracle = Some("""
      SELECT c_custkey, c_name,
        CAST(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,4)) * (1 - CAST(l_discount AS DECIMAL(12,4))) AS DECIMAL(38,12))) AS VARCHAR) AS DOUBLE) AS revenue
      FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY c_custkey, c_name
      ORDER BY revenue DESC, c_custkey LIMIT 10"""))

  /** Q17 — set operations: INTERSECT / EXCEPT / UNION-distinct over two
    * customer segments, tagged into one result. */
  val q17: Q = Q(
    "q17_setops",
    run = { (spark, dir) =>
      val c = Tables.customer(spark, dir)
      val a = c.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val b = c.filter(col("c_acctbal") > 5000).select("c_custkey")
      a.intersect(b).withColumn("op", lit("intersect"))
        .union(a.except(b).withColumn("op", lit("except")))
        .union(a.union(b).distinct().withColumn("op", lit("union")))
    },
    oracle = Some("""
      SELECT c_custkey, 'intersect' AS op FROM (
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        INTERSECT SELECT c_custkey FROM customer WHERE c_acctbal > 5000) t
      UNION ALL
      SELECT c_custkey, 'except' AS op FROM (
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        EXCEPT SELECT c_custkey FROM customer WHERE c_acctbal > 5000) t
      UNION ALL
      SELECT c_custkey, 'union' AS op FROM (
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        UNION SELECT c_custkey FROM customer WHERE c_acctbal > 5000) t"""))

  /** Q18 — GROUPING SETS (SQL surface; Spark plans one Expand + one
    * aggregate, not N scans). */
  val q18: Q = Q(
    "q18_grouping_sets",
    run = { (spark, dir) =>
      Tables.customer(spark, dir).createOrReplaceTempView("customer_v")
      spark.sql("""
        SELECT c_mktsegment, c_nationkey, count(*) AS n,
          CAST(sum(CAST(c_acctbal AS DECIMAL(12,4))) AS DOUBLE) AS bal_sum
        FROM customer_v
        GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())""")
    },
    oracle = Some("""
      SELECT c_mktsegment, c_nationkey, CAST(count(*) AS BIGINT) AS n,
        CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) AS bal_sum
      FROM customer
      GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())"""))

  /** Q19 — scalar function suite: JSON extraction, date_trunc/datediff,
    * decimal round, string fns, modular arithmetic, greatest/least. */
  val q19: Q = Q(
    "q19_scalar_fns",
    run = { (spark, dir) =>
      Tables.events(spark, dir).select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast(IntegerType).as("k_val"),
        date_trunc("day", col("ts")).as("day_ts"),
        datediff(to_date(col("ts")), lit("2024-01-01").cast(DateType)).as("days_in"),
        round(dec(col("value")) * 3, 2).cast(DoubleType).as("value_x3"),
        upper(col("event_type")).as("etype_u"),
        substring(col("props"), 2, 4).as("props_sub"),
        concat_ws("|", col("event_type"), col("user_id")).as("tag"),
        pmod(col("user_id"), lit(7)).as("mod7"),
        greatest(col("value"), lit(100.0)).as("hi"),
        least(col("value"), lit(100.0)).as("lo"))
    },
    oracle = Some("""
      SELECT event_id,
        CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val,
        date_trunc('day', CAST(ts AS TIMESTAMP)) AS day_ts,
        CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS INTEGER) AS days_in,
        CAST(round(CAST(value AS DECIMAL(12,4)) * 3, 2) AS DOUBLE) AS value_x3,
        upper(event_type) AS etype_u,
        substring(props, 2, 4) AS props_sub,
        concat_ws('|', event_type, CAST(user_id AS VARCHAR)) AS tag,
        user_id % 7 AS mod7,
        greatest(value, 100.0) AS hi,
        least(value, 100.0) AS lo
      FROM events"""))

  val all: Seq[Q] = Seq(q13, q14, q15, q16, q17, q18, q19)
}
