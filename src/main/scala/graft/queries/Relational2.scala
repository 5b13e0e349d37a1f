package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.functions.Exact._

/** Second relational batch: bag-semantics set ops, CUBE, pivot, and a
  * generator (explode) aggregation — rounding out §2.B.
  */
object Relational2 {

  /** Q40 — INTERSECT ALL / EXCEPT ALL (bag semantics: duplicates
    * preserved by multiplicity arithmetic, not identity). */
  val q40: Q = Q(
    "q40_setops_all",
    run = { (spark, dir) =>
      val o = Tables.orders(spark, dir)
      // multisets of order-priority prefixes from two halves of orders
      val a = o.filter(col("o_orderkey") % 2 === 0).select(col("o_orderpriority"))
      val b = o.filter(col("o_totalprice") > 200000).select(col("o_orderpriority"))
      a.intersectAll(b).groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n")).withColumn("op", lit("intersect_all"))
        .union(
          a.exceptAll(b).groupBy("o_orderpriority")
            .agg(count(lit(1)).as("n")).withColumn("op", lit("except_all")))
    },
    oracle = Some("""
      WITH a AS (SELECT o_orderpriority FROM orders WHERE o_orderkey % 2 = 0),
           b AS (SELECT o_orderpriority FROM orders WHERE o_totalprice > 200000)
      SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n, 'intersect_all' AS op
      FROM (SELECT o_orderpriority FROM a INTERSECT ALL SELECT o_orderpriority FROM b) t
      GROUP BY 1
      UNION ALL
      SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n, 'except_all' AS op
      FROM (SELECT o_orderpriority FROM a EXCEPT ALL SELECT o_orderpriority FROM b) t
      GROUP BY 1"""))

  /** Q41 — CUBE: full grouping lattice over two keys. */
  val q41: Q = Q(
    "q41_agg_cube",
    run = { (spark, dir) =>
      Tables.lineitem(spark, dir)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_discount")).as("disc_sum"))
    },
    oracle = Some("""
      SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n,
        CAST(CAST(sum(CAST(l_discount AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) AS disc_sum
      FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)"""))

  /** Q42 — pivot: event counts per user-bucket pivoted by event type
    * (Spark `pivot`; oracle via portable conditional aggregation). */
  val q42: Q = Q(
    "q42_pivot",
    run = { (spark, dir) =>
      Tables.events(spark, dir)
        .withColumn("user_bucket", col("user_id") % 10)
        .groupBy("user_bucket")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        // pivot cells with no rows come back NULL from PivotFirst; the
        // oracle's count(*) FILTER yields 0 — align on 0
        .na.fill(0L, Seq("click", "error", "purchase", "signup", "view"))
    },
    oracle = Some("""
      SELECT user_id % 10 AS user_bucket,
        CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS click,
        CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS error,
        CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase,
        CAST(count(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS signup,
        CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS view
      FROM events GROUP BY 1"""))

  /** Q43 — generator/UDTF surface: explode tokens → global top-20 token
    * frequencies (deterministic tie-break on token). */
  val q43: Q = Q(
    "q43_token_freq_topn",
    run = { (spark, dir) =>
      Tables.documents(spark, dir)
        .select(explode(split(col("text"), " ")).as("token"))
        .groupBy("token").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token"))
        .limit(20)
    },
    oracle = Some("""
      SELECT token, CAST(count(*) AS BIGINT) AS n
      FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents) t
      GROUP BY token ORDER BY n DESC, token LIMIT 20"""))

  /** Q46 — map-typed columns: parse JSON props into map<string,int>,
    * explode to (key, value) rows, carry the map cardinality. The
    * fixture's props shape is {"k": int}, which the oracle mirrors via
    * scalar JSON extraction (DuckDB 1.0 has no json_each); both sides
    * drop empty maps ('{}'). Caveat: on NON-JSON props the sides are
    * asymmetric — Spark's from_json degrades to null (row dropped) but
    * DuckDB's json_extract_string ERRORS, so the oracle is only a
    * faithful mirror for the declared well-formed single-key fixture
    * shape. The Spark side runs the real from_json → MapType → explode
    * pipeline. */
  val q46: Q = Q(
    "q46_map_ops",
    run = { (spark, dir) =>
      import org.apache.spark.sql.types.{IntegerType, MapType, StringType}
      Tables.events(spark, dir)
        .select(col("event_id"),
          from_json(col("props"), MapType(StringType, IntegerType)).as("m"))
        .filter(col("m").isNotNull)
        .select(col("event_id"), size(col("m")).as("n_keys"),
          explode(col("m")))
        .withColumnRenamed("key", "map_key")
        .withColumnRenamed("value", "map_val")
    },
    oracle = Some("""
      SELECT event_id, CAST(1 AS INTEGER) AS n_keys, 'k' AS map_key,
        CAST(json_extract_string(props, '$.k') AS INTEGER) AS map_val
      FROM events
      WHERE props IS NOT NULL
        AND json_extract_string(props, '$.k') IS NOT NULL"""))

  /** q73 — UNPIVOT/melt (the inverse of q42's pivot): the four lineitem
    * measures go long as (measure, value) rows via the native
    * `Dataset.unpivot` (Expand under the hood — one generator pass, no
    * shuffle, 4× the input rows but ¼ the columns each). Raw per-row
    * values, no aggregation, so doubles hash exactly. */
  val q73: Q = Q(
    "q73_unpivot",
    run = { (spark, dir) =>
      Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount"), col("l_tax"))
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount"),
            col("l_tax")),
          "measure", "value")
    },
    oracle = Some("""
      SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure,
        l_quantity AS value FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
      FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem"""))

  val all: Seq[Q] = Seq(q40, q41, q42, q43, q46, q73)
}
