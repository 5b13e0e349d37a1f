package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{Q, Tables}
import graft.functions.Exact._

/** Core relational surface (SURVEY.md §2.B / §2.8 Q3–Q5): scans with
  * pushdown, hash aggregation (partial+final), rollup, and the full join
  * family. Join-strategy posture for 100 TB: dimension tables
  * (region/nation/supplier/part) are explicitly `broadcast()`; the
  * orders⋈lineitem fact-fact join shuffles on the join key and is left to
  * sort-merge + AQE. All hash-compared float aggregates go through exact
  * decimal sums (see [[graft.functions.Exact]]).
  */
object Relational {

  /** Q3 — scan + filter + project: predicates and both projected columns
    * must reach the parquet scan (PushedFilters / ReadSchema). Per-row
    * arithmetic on doubles is single-op IEEE, deterministic across engines.
    */
  val q03: Q = Q(
    "q03_scan_filter_project",
    run = { (spark, dir) =>
      Tables.lineitem(spark, dir)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast(TimestampType) &&
          col("l_shipdate") < lit("1997-01-01").cast(TimestampType) &&
          col("l_discount").between(0.02, 0.09) && col("l_quantity") < 30)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
          concat_ws("/", col("l_returnflag"), col("l_linestatus")).as("flag_status"),
          year(col("l_shipdate")).as("ship_year"))
    },
    oracle = Some("""
      SELECT l_orderkey, l_linenumber,
        l_extendedprice * (1 - l_discount) AS revenue,
        concat_ws('/', l_returnflag, l_linestatus) AS flag_status,
        CAST(year(l_shipdate) AS INTEGER) AS ship_year
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        AND l_discount BETWEEN 0.02 AND 0.09 AND l_quantity < 30"""))

  /** Q4 — TPC-H Q1 shape: multi-aggregate hash agg with map-side partial
    * aggregation; sums in exact decimal so Spark's partial/final order and
    * DuckDB's single-node order produce bit-identical doubles.
    */
  val q04: Q = Q(
    "q04_agg_tpch_q1",
    run = { (spark, dir) =>
      Tables.lineitem(spark, dir)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast(TimestampType))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsumExpr(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
            .as("sum_disc_price"),
          dsumExpr(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))
            * (lit(1) + dec(col("l_tax")))).as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
    },
    oracle = Some("""
      SELECT l_returnflag, l_linestatus,
        CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) AS sum_qty,
        CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
        CAST(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,4)) * (1 - CAST(l_discount AS DECIMAL(12,4))) AS DECIMAL(38,12))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
        CAST(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,4)) * (1 - CAST(l_discount AS DECIMAL(12,4))) * (1 + CAST(l_tax AS DECIMAL(12,4))) AS DECIMAL(38,12))) AS VARCHAR) AS DOUBLE) AS sum_charge,
        CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) / count(l_quantity) AS avg_qty,
        CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) / count(l_extendedprice) AS avg_price,
        CAST(CAST(sum(CAST(l_discount AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) / count(l_discount) AS avg_disc,
        CAST(count(*) AS BIGINT) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      GROUP BY l_returnflag, l_linestatus"""))

  /** Q5 — rollup (grouping-set lattice) with partial aggregation. */
  val q05: Q = Q(
    "q05_agg_rollup",
    run = { (spark, dir) =>
      Tables.lineitem(spark, dir)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
    },
    oracle = Some("""
      SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n,
        CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) AS sum_qty
      FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)"""))

  /** Q6 — star join through two broadcast dimensions (nation, region):
    * at 100 TB this is two broadcast hash joins, zero shuffles of the fact.
    */
  val q06: Q = Q(
    "q06_join_dims_broadcast",
    run = { (spark, dir) =>
      Tables.customer(spark, dir)
        .join(broadcast(Tables.nation(spark, dir)),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(spark, dir)),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_cust"),
          dsum(col("c_acctbal")).as("bal_sum"),
          davg(col("c_acctbal")).as("bal_avg"))
    },
    oracle = Some("""
      SELECT r_name, n_name, CAST(count(*) AS BIGINT) AS n_cust,
        CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) AS bal_sum,
        CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) / count(c_acctbal) AS bal_avg
      FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name"""))

  /** Q7 — fact⋈fact join (orders⋈lineitem), with the aggregation PUSHED
    * BELOW the join (an eager-aggregation rewrite Catalyst doesn't do
    * itself): lineitem pre-aggregates per order key — exact decimal sums,
    * so re-aggregating after the join is lossless — which shrinks the
    * join's probe side ~4:1, turns countDistinct into a plain count
    * (order keys are unique post-agg), and shuffles the pre-agg output
    * instead of raw lineitem. Same result set as the naive
    * join-then-aggregate formulation the oracle uses.
    */
  val q07: Q = Q(
    "q07_join_large",
    run = { (spark, dir) =>
      val liAgg = Tables.lineitem(spark, dir)
        .groupBy(col("l_orderkey"))
        .agg(
          dsumExprDec(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
            .as("rev_dec"),
          count(lit(1)).as("n_lines_o"))
      Tables.orders(spark, dir)
        .join(liAgg, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(
          sum(col("rev_dec")).cast(DoubleType).as("revenue"),
          count(lit(1)).as("n_orders"),
          sum(col("n_lines_o")).as("n_lines"))
    },
    oracle = Some("""
      SELECT o_orderpriority,
        CAST(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,4)) * (1 - CAST(l_discount AS DECIMAL(12,4))) AS DECIMAL(38,12))) AS VARCHAR) AS DOUBLE) AS revenue,
        CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_orders,
        CAST(count(*) AS BIGINT) AS n_lines
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY o_orderpriority"""))

  /** Q8 — left-semi join (EXISTS): customers with at least one order. */
  val q08: Q = Q(
    "q08_join_semi",
    run = { (spark, dir) =>
      Tables.customer(spark, dir)
        .join(Tables.orders(spark, dir),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .join(broadcast(Tables.nation(spark, dir)),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_cust_with_orders"))
    },
    oracle = Some("""
      SELECT n_name, CAST(count(*) AS BIGINT) AS n_cust_with_orders
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      GROUP BY n_name"""))

  /** Q9 — left-anti join (NOT EXISTS): customers with no high-value order
    * (threshold keeps the result non-empty on the fixtures: at sf0.01
    * every customer has *some* order, so a plain anti join is vacuous).
    */
  val q09: Q = Q(
    "q09_join_anti",
    run = { (spark, dir) =>
      Tables.customer(spark, dir)
        .join(Tables.orders(spark, dir).filter(col("o_totalprice") > 400000),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .join(broadcast(Tables.nation(spark, dir)),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_cust_no_big_orders"))
    },
    oracle = Some("""
      SELECT n_name, CAST(count(*) AS BIGINT) AS n_cust_no_big_orders
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey AND o_totalprice > 400000)
      GROUP BY n_name"""))

  /** Q10 — left outer join preserving order-less customers. */
  val q10: Q = Q(
    "q10_join_left",
    run = { (spark, dir) =>
      Tables.customer(spark, dir)
        .join(Tables.orders(spark, dir),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_mktsegment"))
        .agg(
          countDistinct(col("c_custkey")).as("n_customers"),
          count(col("o_orderkey")).as("n_orders"),
          dsum(col("o_totalprice")).as("total_price"))
    },
    oracle = Some("""
      SELECT c_mktsegment,
        CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_customers,
        CAST(count(o_orderkey) AS BIGINT) AS n_orders,
        CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) AS total_price
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_mktsegment"""))

  /** Q11 — full outer join of two aggregates on the nation key. */
  val q11: Q = Q(
    "q11_join_full",
    run = { (spark, dir) =>
      val cc = Tables.customer(spark, dir).groupBy(col("c_nationkey").as("k"))
        .agg(count(lit(1)).as("n_cust"))
      val ss = Tables.supplier(spark, dir).groupBy(col("s_nationkey").as("k2"))
        .agg(count(lit(1)).as("n_supp"))
      cc.join(ss, col("k") === col("k2"), "full")
        .select(
          coalesce(col("k"), col("k2")).as("nationkey"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"))
    },
    oracle = Some("""
      WITH cc AS (SELECT c_nationkey AS k, CAST(count(*) AS BIGINT) AS n_cust FROM customer GROUP BY 1),
           ss AS (SELECT s_nationkey AS k, CAST(count(*) AS BIGINT) AS n_supp FROM supplier GROUP BY 1)
      SELECT COALESCE(cc.k, ss.k) AS nationkey,
        COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp
      FROM cc FULL JOIN ss ON cc.k = ss.k"""))

  /** Q12 — theta join: equi key (nation) + non-equi predicate (acctbal
    * comparison) evaluated as a join residual, not a cartesian product.
    */
  val q12: Q = Q(
    "q12_join_theta",
    run = { (spark, dir) =>
      Tables.supplier(spark, dir)
        .join(Tables.customer(spark, dir),
          col("s_nationkey") === col("c_nationkey") &&
            col("s_acctbal") > col("c_acctbal"))
        .join(broadcast(Tables.nation(spark, dir)),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_pairs"),
          dsum(col("s_acctbal") - col("c_acctbal")).as("bal_gap"))
    },
    oracle = Some("""
      SELECT n_name, CAST(count(*) AS BIGINT) AS n_pairs,
        CAST(CAST(sum(CAST(s_acctbal - c_acctbal AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) AS bal_gap
      FROM supplier
        JOIN customer ON s_nationkey = c_nationkey AND s_acctbal > c_acctbal
        JOIN nation ON s_nationkey = n_nationkey
      GROUP BY n_name"""))

  /** q205 — SHIPPING-PRIORITY top-k (the TPC-H Q3 shape on this
    * schema): the 10 highest-revenue unshipped orders for one market
    * segment — THE canonical 3-way fact join + top-k every warehouse
    * runs. Plan posture at 100 TB: all three filters reach their scans
    * (segment on customer, date on orders, date on lineitem) BEFORE
    * any join; the segment-filtered customer keeps only c_custkey, so
    * the orders⋈customer semi-shape shuffles minimal bytes; revenue
    * sums are exact decimals; the ORDER is taken on the DECIMAL (both
    * engines compare decimals identically — a double sort key could
    * tie-break differently at the 17th digit) with o_orderkey as the
    * final tie-break, so the LIMIT boundary is deterministic; Spark
    * executes it as TakeOrderedAndProject — per-partition top-10 +
    * driver merge, never a global sort. */
  val q205: Q = Q(
    "q205_shipping_priority",
    run = { (spark, dir) =>
      val cust = Tables.customer(spark, dir)
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      val ord = Tables.orders(spark, dir)
        .filter(col("o_orderdate") < lit("1998-07-01"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
          col("o_orderpriority"))
      val li = Tables.lineitem(spark, dir)
        .filter(col("l_shipdate") > lit("1998-07-01"))
        .select(col("l_orderkey"),
          (dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
            .cast(Fine).as("rev_term"))
      ord.join(cust, col("o_custkey") === col("c_custkey"))
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate"),
          col("o_orderpriority"))
        .agg(sum(col("rev_term")).as("rev_dec"))
        .orderBy(col("rev_dec").desc, col("o_orderkey"))
        .limit(10)
        .select(col("o_orderkey"), col("o_orderdate"),
          col("o_orderpriority"),
          col("rev_dec").cast(DoubleType).as("revenue"))
    },
    oracle = Some("""
      SELECT o_orderkey, o_orderdate, o_orderpriority,
        CAST(CAST(rev_dec AS VARCHAR) AS DOUBLE) AS revenue
      FROM (
        SELECT o_orderkey, o_orderdate, o_orderpriority,
          sum(CAST(CAST(l_extendedprice AS DECIMAL(12,4))
                * (1 - CAST(l_discount AS DECIMAL(12,4)))
              AS DECIMAL(38,12))) AS rev_dec
        FROM customer
          JOIN orders ON c_custkey = o_custkey
          JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-07-01'
          AND l_shipdate > TIMESTAMP '1998-07-01'
        GROUP BY 1, 2, 3
        ORDER BY rev_dec DESC, o_orderkey
        LIMIT 10)"""))

  /** q206 — LOCAL-SUPPLIER volume (the TPC-H Q5 shape): revenue per
    * nation from lineitems where supplier and customer share the
    * nation, one region, one order-date year — the canonical 6-way
    * snowflake join. Plan posture at 100 TB: region (1 row) and the
    * region-filtered nation (≤5 rows) BROADCAST into customer and
    * supplier; the date filter reaches the orders scan; the fact side
    * joins lineitem⋈orders on orderkey, then customer on custkey, then
    * supplier on (suppkey AND s_nationkey = c_nationkey) — the
    * locality predicate rides the supplier join as an equi-condition,
    * never a post-filter on a wider join; one exact-decimal agg per
    * nation ends it. */
  val q206: Q = Q(
    "q206_local_supplier_volume",
    run = { (spark, dir) =>
      val nat = Tables.nation(spark, dir)
        .join(broadcast(Tables.region(spark, dir)
          .filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      val cust = Tables.customer(spark, dir)
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_nationkey"), col("n_name"))
      val ord = Tables.orders(spark, dir)
        .filter(col("o_orderdate") >= lit("1997-01-01") &&
          col("o_orderdate") < lit("1998-01-01"))
        .select(col("o_orderkey"), col("o_custkey"))
      val sup = Tables.supplier(spark, dir)
        .select(col("s_suppkey"), col("s_nationkey"))
      Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_suppkey"),
          (dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
            .cast(Fine).as("rev_term"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey") &&
          col("s_nationkey") === col("c_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(col("rev_term")).cast(DoubleType).as("revenue"),
          count(lit(1)).as("n_lines"))
    },
    oracle = Some("""
      SELECT n_name,
        CAST(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,4))
              * (1 - CAST(l_discount AS DECIMAL(12,4)))
            AS DECIMAL(38,12))) AS VARCHAR) AS DOUBLE) AS revenue,
        CAST(count(*) AS BIGINT) AS n_lines
      FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
          AND s_nationkey = c_nationkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1997-01-01'
        AND o_orderdate < TIMESTAMP '1998-01-01'
      GROUP BY n_name"""))

  /** q209 — SUPPLIER LEAD TIME: order-to-ship latency distribution per
    * supplier (count, exact mean, p50/p90, max of day deltas) — the
    * operational SLA readout every procurement warehouse runs. Plan
    * posture: lineitem pre-joins only orders' (key, date) projection,
    * the integer day delta aggregates BEFORE the supplier join (the
    * q07 eager-agg lesson — the join probe side is supplier-sized, not
    * line-sized), and the mean is an exact integer-sum / count divided
    * once as doubles. Percentiles are the sort-based exact aggregate
    * (≡ quantile_cont, the q45 contract). */
  val q209: Q = Q(
    "q209_supplier_leadtime",
    run = { (spark, dir) =>
      val lead = Tables.lineitem(spark, dir)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_shipdate"))
        .join(Tables.orders(spark, dir)
          .select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_suppkey"),
          datediff(col("l_shipdate"), col("o_orderdate")).as("lead_days"))
      val perSupp = lead.groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("n_lines"),
          sum(col("lead_days").cast("long")).as("lead_sum"),
          percentile(col("lead_days"),
            array(lit(0.5), lit(0.9))).as("ps"),
          max(col("lead_days")).as("lead_max"))
      perSupp.join(Tables.supplier(spark, dir)
          .select(col("s_suppkey"), col("s_name")),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_name"), col("n_lines"),
          (col("lead_sum").cast(DoubleType) /
            col("n_lines").cast(DoubleType)).as("lead_mean"),
          col("ps").getItem(0).as("lead_p50"),
          col("ps").getItem(1).as("lead_p90"),
          col("lead_max"))
    },
    oracle = Some("""
      SELECT s_name, CAST(count(*) AS BIGINT) AS n_lines,
        CAST(sum(datediff('day', o_orderdate, l_shipdate)) AS DOUBLE)
          / count(*) AS lead_mean,
        quantile_cont(datediff('day', o_orderdate, l_shipdate), 0.5)
          AS lead_p50,
        quantile_cont(datediff('day', o_orderdate, l_shipdate), 0.9)
          AS lead_p90,
        CAST(max(datediff('day', o_orderdate, l_shipdate)) AS INTEGER)
          AS lead_max
      FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
      GROUP BY s_name"""))

  /** q210 — MARKET SHARE per order-year (the TPC-H Q8 shape): one
    * nation's suppliers' share of all revenue shipped into one region,
    * year over year — the two-level agg (conditional numerator inside
    * the same pass as the denominator, never two scans) every BI stack
    * runs. Both revenue sums are exact decimals; the share is ONE
    * double division of two exact doubles (single IEEE op — bit-equal
    * in both engines). Dims broadcast; the customer-region and
    * supplier-nation attributes ride the fact join as projected
    * columns, so the conditional numerator is a codegen'd CASE inside
    * the final hash agg. */
  val q210: Q = Q(
    "q210_market_share",
    run = { (spark, dir) =>
      val nat = Tables.nation(spark, dir)
      val asia = nat
        .join(broadcast(Tables.region(spark, dir)
          .filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"))
      val cust = Tables.customer(spark, dir)
        .join(broadcast(asia), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"))
      val sup = Tables.supplier(spark, dir)
        .join(broadcast(nat.select(col("n_nationkey"),
          col("n_name").as("s_nation"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_nation"))
      Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_suppkey"),
          (dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
            .cast(Fine).as("rev_term"))
        .join(Tables.orders(spark, dir)
          .select(col("o_orderkey"), col("o_custkey"),
            year(col("o_orderdate")).as("o_year")),
          col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("o_year"))
        .agg(
          sum(col("rev_term")).as("total_dec"),
          sum(when(col("s_nation") === "NATION_7", col("rev_term"))
            .otherwise(lit(BigDecimal(0)).cast(Fine))).as("nation_dec"))
        .select(col("o_year"),
          col("total_dec").cast(DoubleType).as("total_rev"),
          col("nation_dec").cast(DoubleType).as("nation_rev"),
          (col("nation_dec").cast(DoubleType) /
            col("total_dec").cast(DoubleType)).as("share"))
    },
    oracle = Some("""
      SELECT year(o_orderdate) AS o_year,
        CAST(CAST(sum(rev) AS VARCHAR) AS DOUBLE) AS total_rev,
        CAST(CAST(sum(CASE WHEN s_nation = 'NATION_7' THEN rev
          ELSE CAST(0 AS DECIMAL(38,12)) END) AS VARCHAR) AS DOUBLE)
          AS nation_rev,
        CAST(CAST(sum(CASE WHEN s_nation = 'NATION_7' THEN rev
          ELSE CAST(0 AS DECIMAL(38,12)) END) AS VARCHAR) AS DOUBLE)
          / CAST(CAST(sum(rev) AS VARCHAR) AS DOUBLE) AS share
      FROM (
        SELECT l_orderkey, l_suppkey,
          CAST(CAST(l_extendedprice AS DECIMAL(12,4))
            * (1 - CAST(l_discount AS DECIMAL(12,4)))
            AS DECIMAL(38,12)) AS rev,
          o_orderdate, o_custkey
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey) f
      JOIN customer ON o_custkey = c_custkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      JOIN region ON cn.n_regionkey = r_regionkey
      JOIN (SELECT s_suppkey, n_name AS s_nation
            FROM supplier JOIN nation ON s_nationkey = n_nationkey) s
        ON l_suppkey = s_suppkey
      WHERE r_name = 'ASIA'
      GROUP BY 1"""))

  /** q211 — RETURNED-ITEMS report (the TPC-H Q10 shape): the 20
    * customers who returned the most revenue in one half-year — the
    * churn-risk / fraud-triage list. Plan posture: the returnflag
    * filter reaches the lineitem scan and the date filter the orders
    * scan; revenue aggregates per customer BEFORE the customer join
    * (q07 eager-agg — the join probe side is customer-sized); nation
    * broadcasts; the top-20 is taken on the exact DECIMAL with
    * c_custkey tie-break (deterministic LIMIT boundary) via
    * TakeOrderedAndProject. */
  val q211: Q = Q(
    "q211_returned_items",
    run = { (spark, dir) =>
      val li = Tables.lineitem(spark, dir)
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"),
          (dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
            .cast(Fine).as("rev_term"))
      val ord = Tables.orders(spark, dir)
        .filter(col("o_orderdate") >= lit("1997-01-01") &&
          col("o_orderdate") < lit("1997-07-01"))
        .select(col("o_orderkey"), col("o_custkey"))
      val perCust = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(sum(col("rev_term")).as("rev_dec"))
      perCust
        .join(Tables.customer(spark, dir),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(spark, dir)),
          col("c_nationkey") === col("n_nationkey"))
        .orderBy(col("rev_dec").desc, col("c_custkey"))
        .limit(20)
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
          col("n_name"),
          col("rev_dec").cast(DoubleType).as("lost_revenue"))
    },
    oracle = Some("""
      SELECT c_custkey, c_name, c_acctbal, n_name,
        CAST(CAST(rev_dec AS VARCHAR) AS DOUBLE) AS lost_revenue
      FROM (
        SELECT c_custkey, c_name, c_acctbal, n_name,
          sum(CAST(CAST(l_extendedprice AS DECIMAL(12,4))
                * (1 - CAST(l_discount AS DECIMAL(12,4)))
              AS DECIMAL(38,12))) AS rev_dec
        FROM customer
          JOIN orders ON c_custkey = o_custkey
          JOIN lineitem ON l_orderkey = o_orderkey
          JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate < TIMESTAMP '1997-07-01'
        GROUP BY 1, 2, 3, 4
        ORDER BY rev_dec DESC, c_custkey
        LIMIT 20)"""))

  /** q212 — LATE-SHIPMENT SLA per order priority: the share of orders
    * with ≥ 1 line shipped more than 90 days after the order date, in
    * exact integer ppm — the fulfillment-ops readout. Per-order flags
    * collapse with max() at (order, priority) grain, then one hash-agg
    * per priority; orders with no lines count as on-time via the left
    * join. No doubles anywhere: ppm = late·1e6 DIV n replays exactly. */
  val q212: Q = Q(
    "q212_late_shipment_sla",
    run = { (spark, dir) =>
      // agg BELOW the join (the q217 trick): the per-order late test is
      // `any line > od+90` ≡ `max(shipdate) > od+90`, so lineitem
      // collapses to per-order max_ship BEFORE orders appears — the
      // left join probes order-grain rows, never lines, and the old
      // per-(orderkey, priority) re-agg disappears entirely (the join
      // is 1:1, the priority rollup reads it directly). An order with
      // no lines left-joins a null max_ship → the when() is false →
      // on-time, exactly the old left-join semantics.
      val perOrder = Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_shipdate"))
        .groupBy(col("l_orderkey"))
        .agg(max(col("l_shipdate")).as("max_ship"))
      Tables.orders(spark, dir)
        .select(col("o_orderkey"), col("o_orderdate"),
          col("o_orderpriority"))
        .join(perOrder, col("o_orderkey") === col("l_orderkey"), "left")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          sum(when(
            // timestamp + interval (never date_add: it truncates to
            // DATE and would silently shift non-midnight timestamps)
            col("max_ship") > col("o_orderdate") + expr("INTERVAL 90 DAY"),
            1L).otherwise(0L)).as("n_late"))
        .select(col("o_orderpriority"), col("n_orders"), col("n_late"),
          expr("(n_late * 1000000) DIV n_orders").as("late_ppm"))
    },
    oracle = Some("""
      WITH per_order AS (
        SELECT o_orderkey, o_orderpriority,
          max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
              THEN 1 ELSE 0 END) AS is_late
        FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY 1, 2)
      SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders,
        CAST(sum(is_late) AS BIGINT) AS n_late,
        CAST((sum(is_late) * 1000000) // count(*) AS BIGINT) AS late_ppm
      FROM per_order GROUP BY 1"""))

  /** q216 — CUSTOMER ORDER-COUNT DISTRIBUTION (the TPC-H Q13 shape):
    * how many customers placed exactly k orders, INCLUDING k = 0 — the
    * count-of-counts histogram whose zero bucket forces the left join
    * (an inner join silently drops never-ordered customers, the
    * classic Q13 trap). Two stacked hash-aggs: per-customer counts
    * (count(o_orderkey), which ignores the left join's null rows),
    * then the distribution over those counts — both map-side
    * combined, output bounded by max order count. */
  val q216: Q = Q(
    "q216_order_count_distribution",
    run = { (spark, dir) =>
      Tables.customer(spark, dir).select(col("c_custkey"))
        .join(Tables.orders(spark, dir)
          .select(col("o_orderkey"), col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("n_customers"))
    },
    oracle = Some("""
      SELECT c_count, CAST(count(*) AS BIGINT) AS n_customers
      FROM (SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
            FROM customer LEFT JOIN orders ON c_custkey = o_custkey
            GROUP BY 1)
      GROUP BY 1"""))

  /** q217 — SOLE-BLAME SUPPLIER analysis (the TPC-H Q21 shape,
    * DECORRELATED): suppliers who were the ONLY late shipper in a
    * multi-supplier order — the vendor-accountability report. The
    * textbook formulation is a doubly-correlated EXISTS / NOT EXISTS;
    * the scale formulation is pure aggregation: collapse lineitem to
    * (order, supplier, any_late) grain, roll up per order to
    * (n_suppliers, n_late_suppliers), and blame the late supplier of
    * every order with n_suppliers ≥ 2 ∧ n_late_suppliers = 1 — two
    * hash-aggs and one order-keyed equi-join-back instead of two
    * correlated subquery rescans per row. Late = shipped > 90 days
    * after order date (this schema has no commit/receipt dates).
    * Top-10 by blame count, s_name tie-break. */
  val q217: Q = Q(
    "q217_sole_blame_supplier",
    run = { (spark, dir) =>
      // agg BELOW the join: the late test compares each line's shipdate
      // to the same per-order threshold, so `any line late` ≡
      // `max(shipdate) late` — collapse lineitem to (order, supplier,
      // max_ship) BEFORE touching orders, and the join probes
      // order×supplier-grain rows instead of every line (the map-side
      // combine also shrinks the one fact shuffle to that grain)
      val perOs = Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
        .groupBy(col("l_orderkey"), col("l_suppkey"))
        .agg(max(col("l_shipdate")).as("max_ship"))
        .join(Tables.orders(spark, dir)
          .select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_suppkey"),
          when(col("max_ship") > col("o_orderdate") + expr("INTERVAL 90 DAY"),
            1L).otherwise(0L).as("late"))
      val perOrder = perOs.groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_supp"), sum(col("late")).as("n_late"))
        .filter(col("n_supp") >= 2 && col("n_late") === 1)
        .select(col("l_orderkey").as("bo"))
      perOs.filter(col("late") === 1L)
        .join(perOrder, col("l_orderkey") === col("bo"))
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("n_blamed"))
        .join(Tables.supplier(spark, dir),
          col("l_suppkey") === col("s_suppkey"))
        .orderBy(col("n_blamed").desc, col("s_name"))
        .limit(10)
        .select(col("s_name"), col("n_blamed"))
    },
    oracle = Some("""
      WITH per_os AS (
        SELECT l_orderkey, l_suppkey,
          max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
              THEN 1 ELSE 0 END) AS late
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1, 2),
      per_order AS (
        SELECT l_orderkey
        FROM per_os GROUP BY 1
        HAVING count(*) >= 2 AND sum(late) = 1)
      SELECT s_name, CAST(count(*) AS BIGINT) AS n_blamed
      FROM per_os
        JOIN per_order USING (l_orderkey)
        JOIN supplier ON l_suppkey = s_suppkey
      WHERE late = 1
      GROUP BY 1
      ORDER BY n_blamed DESC, s_name
      LIMIT 10"""))

  /** q219 — INTER-ORDER GAP distribution per market segment: the
    * repeat-purchase cadence readout (retention teams watch its drift;
    * inventory teams plan to its p90). Per customer, consecutive
    * orders ordered by (o_orderdate, o_orderkey — the tie-break makes
    * same-day orders deterministic) yield integer day gaps via one
    * customer-keyed window; per segment, the exact sort-based
    * percentiles and an exact integer-sum mean. Two shuffles total
    * (customer window, segment agg), output bounded by segment
    * count. */
  val q219: Q = Q(
    "q219_interorder_gaps",
    run = { (spark, dir) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      val gaps = Tables.orders(spark, dir)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
        .withColumn("prev", lag(col("o_orderdate"), 1).over(w))
        .filter(col("prev").isNotNull)
        .select(col("o_custkey"),
          datediff(col("o_orderdate"), col("prev")).as("gap_days"))
      gaps.join(Tables.customer(spark, dir)
          .select(col("c_custkey"), col("c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_gaps"),
          sum(col("gap_days").cast("long")).as("gap_sum"),
          percentile(col("gap_days"), array(lit(0.5), lit(0.9))).as("ps"))
        .select(col("c_mktsegment"), col("n_gaps"),
          (col("gap_sum").cast(DoubleType) /
            col("n_gaps").cast(DoubleType)).as("gap_mean"),
          col("ps").getItem(0).as("gap_p50"),
          col("ps").getItem(1).as("gap_p90"))
    },
    oracle = Some("""
      WITH g AS (
        SELECT o_custkey,
          datediff('day',
            lag(o_orderdate) OVER (PARTITION BY o_custkey
              ORDER BY o_orderdate, o_orderkey),
            o_orderdate) AS gap_days
        FROM orders)
      SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_gaps,
        CAST(sum(gap_days) AS DOUBLE) / count(*) AS gap_mean,
        quantile_cont(gap_days, 0.5) AS gap_p50,
        quantile_cont(gap_days, 0.9) AS gap_p90
      FROM g JOIN customer ON o_custkey = c_custkey
      WHERE gap_days IS NOT NULL
      GROUP BY 1"""))

  /** q220 — NATION-PAIR TRADE VOLUME (the TPC-H Q7 shape): revenue
    * shipped between two trading nations, both directions, per ship
    * year. The textbook disjunction
    * `(n1=A ∧ n2=B) ∨ (n1=B ∧ n2=A)` is re-expressed as two
    * SARGable per-side IN filters plus one cross-side inequality —
    * `supp_nation ∈ {A,B}` prunes supplier BEFORE its broadcast,
    * `cust_nation ∈ {A,B}` prunes customer before the fact join, and
    * `supp_nation ≠ cust_nation` (equivalent to the disjunction once
    * both sides are restricted to the pair) rides the final join as a
    * cheap post-predicate instead of forcing an un-pushable OR over
    * the 5-way join. Dims broadcast; the only shuffles are
    * lineitem⋈orders and the orders⋈customer key exchange. Exact
    * decimal revenue; output bounded by 2 directions × years. */
  val q220: Q = Q(
    "q220_nation_pair_trade",
    run = { (spark, dir) =>
      val pair = Seq("NATION_3", "NATION_24")
      val n = Tables.nation(spark, dir)
        .filter(col("n_name").isin(pair: _*))
      val supp = Tables.supplier(spark, dir)
        .select(col("s_suppkey"), col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val cust = Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_nationkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("cust_nation"))
      val li = Tables.lineitem(spark, dir)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast(TimestampType) &&
          col("l_shipdate") < lit("1998-01-01").cast(TimestampType))
        .select(col("l_orderkey"), col("l_suppkey"),
          year(col("l_shipdate")).as("l_year"),
          (dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
            .cast(Fine).as("rev_term"))
      li.join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .join(Tables.orders(spark, dir)
            .select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
        .agg(sum(col("rev_term")).cast(DoubleType).as("revenue"))
    },
    oracle = Some("""
      SELECT supp_nation, cust_nation, l_year,
        CAST(CAST(sum(rev_term) AS VARCHAR) AS DOUBLE) AS revenue
      FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
          CAST(year(l_shipdate) AS INTEGER) AS l_year,
          CAST(CAST(l_extendedprice AS DECIMAL(12,4))
              * (1 - CAST(l_discount AS DECIMAL(12,4)))
            AS DECIMAL(38,12)) AS rev_term
        FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation n1 ON s_nationkey = n1.n_nationkey
          JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_24')
            OR (n1.n_name = 'NATION_24' AND n2.n_name = 'NATION_3'))
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01')
      GROUP BY 1, 2, 3"""))

  /** q221 — TOP SUPPLIER(S) by quarterly revenue (the TPC-H Q15
    * shape): suppliers whose revenue over one quarter EQUALS the
    * global maximum — the `HAVING total = (SELECT max(...))` scalar
    * subquery, decorrelated into one per-supplier hash-agg plus a
    * 1-row global-max re-agg that BROADCASTS back over the
    * per-supplier table (never a second scan of lineitem, never a
    * sort). Ties all survive, exactly as the spec's view formulation
    * requires, because the equality is tested on the exact DECIMAL
    * sum — a double compare could drop or add a tie at the 17th
    * digit. Supplier names arrive via broadcast. */
  val q221: Q = Q(
    "q221_top_supplier",
    run = { (spark, dir) =>
      val perSupp = Tables.lineitem(spark, dir)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast(TimestampType) &&
          col("l_shipdate") < lit("1996-04-01").cast(TimestampType))
        .select(col("l_suppkey"),
          (dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
            .cast(Fine).as("rev_term"))
        .groupBy(col("l_suppkey"))
        .agg(sum(col("rev_term")).as("rev_dec"))
      val top = perSupp.agg(max(col("rev_dec")).as("max_dec"))
      perSupp.join(broadcast(top), col("rev_dec") === col("max_dec"))
        .join(broadcast(Tables.supplier(spark, dir)
            .select(col("s_suppkey"), col("s_name"))),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          col("rev_dec").cast(DoubleType).as("total_revenue"))
    },
    oracle = Some("""
      WITH revenue AS (
        SELECT l_suppkey,
          sum(CAST(CAST(l_extendedprice AS DECIMAL(12,4))
                * (1 - CAST(l_discount AS DECIMAL(12,4)))
              AS DECIMAL(38,12))) AS rev_dec
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY 1)
      SELECT s_suppkey, s_name,
        CAST(CAST(rev_dec AS VARCHAR) AS DOUBLE) AS total_revenue
      FROM revenue JOIN supplier ON l_suppkey = s_suppkey
      WHERE rev_dec = (SELECT max(rev_dec) FROM revenue)"""))

  /** q222 — SMALL-QUANTITY REVENUE LEAK (the TPC-H Q17 shape): the
    * average yearly revenue that would vanish if orders below 20 % of
    * a part's mean order quantity were refused, for one brand. The
    * textbook per-row correlated subquery
    * `l_quantity < 0.2 * (SELECT avg(l_quantity) WHERE l_partkey = p)`
    * decorrelates into ONE per-part agg over the brand-pruned lineitem
    * slice joined back on partkey. Two exactness tricks: the brand's
    * partkeys broadcast-prune lineitem BEFORE the agg (partkey
    * determines brand, so the per-part average over the pruned slice
    * is identical to the spec's all-lineitem average); and the 20 %
    * threshold is tested WITHOUT division —
    * `qty < 0.2·(sum/cnt)  ⇔  qty·5·cnt < sum` for positive counts —
    * so the predicate is pure decimal×integer arithmetic, immune to
    * FP-division rounding at the boundary. */
  val q222: Q = Q(
    "q222_small_qty_revenue",
    run = { (spark, dir) =>
      val bparts = Tables.part(spark, dir)
        .filter(col("p_brand") === "Brand#3")
        .select(col("p_partkey"))
      val li = Tables.lineitem(spark, dir)
        .join(broadcast(bparts), col("l_partkey") === col("p_partkey"))
        .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      val perPart = li.groupBy(col("l_partkey").as("pp"))
        .agg(sum(dec(col("l_quantity"))).as("qty_sum"),
          count(lit(1)).as("qty_cnt"))
      li.join(perPart, col("l_partkey") === col("pp"))
        .filter(dec(col("l_quantity")) * lit(5) * col("qty_cnt") <
          col("qty_sum"))
        .agg((dsum(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"))
    },
    oracle = Some("""
      WITH li AS (
        SELECT l_partkey, l_quantity, l_extendedprice
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand = 'Brand#3'),
      per_part AS (
        SELECT l_partkey AS pp,
          sum(CAST(l_quantity AS DECIMAL(12,4))) AS qty_sum,
          count(*) AS qty_cnt
        FROM li GROUP BY 1)
      SELECT CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,4)))
          AS VARCHAR) AS DOUBLE) / 7.0 AS avg_yearly
      FROM li JOIN per_part ON l_partkey = pp
      WHERE CAST(l_quantity AS DECIMAL(12,4)) * 5 * qty_cnt < qty_sum"""))

  /** q223 — LARGE-VOLUME CUSTOMERS (the TPC-H Q18 shape): the top-100
    * orders whose total quantity exceeds a threshold, with their
    * customers. The `HAVING sum(l_quantity) > 250 IN`-subquery
    * decorrelates into one per-order hash-agg whose HAVING output IS
    * the probe set — the agg result joins back to orders/customer
    * directly (never an IN over a second lineitem scan). The qty agg
    * runs BEFORE any dimension join so only qualifying orders (a few
    * per ten thousand) reach the customer join; top-100 is taken on
    * (o_totalprice DESC, o_orderkey) — the fixture double is stored,
    * not computed, so it is bit-identical in both engines, and the
    * orderkey tie-break makes the LIMIT boundary deterministic —
    * executed as TakeOrderedAndProject. Quantities sum in exact
    * decimal. */
  val q223: Q = Q(
    "q223_large_volume_customers",
    run = { (spark, dir) =>
      val big = Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_quantity"))
        .groupBy(col("l_orderkey"))
        .agg(sum(dec(col("l_quantity"))).as("qty_dec"))
        .filter(col("qty_dec") > lit(250))
      big.join(Tables.orders(spark, dir)
          .select(col("o_orderkey"), col("o_custkey"),
            col("o_orderdate"), col("o_totalprice")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(spark, dir)
            .select(col("c_custkey"), col("c_name"))),
          col("o_custkey") === col("c_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"),
          col("qty_dec").cast(DoubleType).as("total_qty"))
    },
    oracle = Some("""
      SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        CAST(CAST(qty_dec AS VARCHAR) AS DOUBLE) AS total_qty
      FROM (
        SELECT l_orderkey,
          sum(CAST(l_quantity AS DECIMAL(12,4))) AS qty_dec
        FROM lineitem GROUP BY 1
        HAVING sum(CAST(l_quantity AS DECIMAL(12,4))) > 250)
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 100"""))

  /** q224 — DISJUNCTIVE-PREDICATE REVENUE (the TPC-H Q19 shape,
    * adapted to this schema's columns): revenue from three OR'd
    * brand/size/quantity conjunctions. The OR references BOTH join
    * sides, so it cannot push anywhere as-is; the scale trick is the
    * DERIVED per-side envelope — part prunes to the three brands at
    * its scan (`p_brand IN (...)` is the union of the brand legs) and
    * lineitem prunes to `l_quantity ∈ [1,30]` (the union of the
    * quantity legs) BEFORE the join, then the exact disjunction runs
    * as a cheap post-join filter over the already-tiny slice. Part
    * broadcasts; one scalar exact-decimal output. */
  val q224: Q = Q(
    "q224_disjunctive_revenue",
    run = { (spark, dir) =>
      val p = Tables.part(spark, dir)
        .filter(col("p_brand").isin("Brand#12", "Brand#23", "Brand#4"))
        .select(col("p_partkey"), col("p_brand"), col("p_size"))
      val li = Tables.lineitem(spark, dir)
        .filter(col("l_quantity").between(1, 30))
        .select(col("l_partkey"), col("l_quantity"),
          (dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
            .cast(Fine).as("rev_term"))
      li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 30) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#4" && col("p_size").between(20, 50) &&
            col("l_quantity").between(20, 30)))
        .agg(sum(col("rev_term")).cast(DoubleType).as("revenue"))
    },
    oracle = Some("""
      SELECT CAST(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,4))
            * (1 - CAST(l_discount AS DECIMAL(12,4)))
          AS DECIMAL(38,12))) AS VARCHAR) AS DOUBLE) AS revenue
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
             AND l_quantity BETWEEN 1 AND 11)
         OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 30
             AND l_quantity BETWEEN 10 AND 20)
         OR (p_brand = 'Brand#4' AND p_size BETWEEN 20 AND 50
             AND l_quantity BETWEEN 20 AND 30)"""))

  /** q225 — DORMANT HIGH-BALANCE CUSTOMERS per nation (the TPC-H Q22
    * shape — the win-back campaign target list): customers whose
    * balance exceeds the positive-balance average but who placed NO
    * order since 1999. Two decorrelations in one query: the scalar
    * `> (SELECT avg(...))` becomes a 1-row (sum, cnt) broadcast tested
    * WITHOUT division (`bal·cnt > sum` — cnt > 0, so the inequality
    * is equivalent and boundary-exact in decimal), and the
    * `NOT EXISTS` becomes a LEFT ANTI join against the date-pruned
    * orders projection (the date filter reaches the orders scan;
    * only o_custkey survives into the anti probe). Nation broadcasts;
    * per-nation count + exact balance sum. */
  val q225: Q = Q(
    "q225_dormant_customers",
    run = { (spark, dir) =>
      val cust = Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
      val avgRow = cust.filter(col("c_acctbal") > 0)
        .agg(sum(dec(col("c_acctbal"))).as("bal_sum"),
          count(lit(1)).as("bal_cnt"))
      val recent = Tables.orders(spark, dir)
        .filter(col("o_orderdate") >= lit("1999-01-01").cast(TimestampType))
        .select(col("o_custkey"))
      cust.join(broadcast(avgRow))
        .filter(dec(col("c_acctbal")) * col("bal_cnt") > col("bal_sum"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .join(broadcast(Tables.nation(spark, dir)
            .select(col("n_nationkey"), col("n_name"))),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_custs"),
          dsum(col("c_acctbal")).as("bal_total"))
    },
    oracle = Some("""
      WITH avg_row AS (
        SELECT sum(CAST(c_acctbal AS DECIMAL(12,4))) AS bal_sum,
          count(*) AS bal_cnt
        FROM customer WHERE c_acctbal > 0)
      SELECT n_name, CAST(count(*) AS BIGINT) AS n_custs,
        CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(12,4))) AS VARCHAR)
          AS DOUBLE) AS bal_total
      FROM customer
        CROSS JOIN avg_row
        JOIN nation ON c_nationkey = n_nationkey
      WHERE CAST(c_acctbal AS DECIMAL(12,4)) * bal_cnt > bal_sum
        AND c_custkey NOT IN (
          SELECT o_custkey FROM orders
          WHERE o_orderdate >= TIMESTAMP '1999-01-01')
      GROUP BY 1"""))

  val all: Seq[Q] = Seq(q03, q04, q05, q06, q07, q08, q09, q10, q11, q12,
    q205, q206, q209, q210, q211, q212, q216, q217, q219,
    q220, q221, q222, q223, q224, q225)
}
