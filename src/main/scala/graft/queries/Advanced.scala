package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{Q, Tables}
import graft.functions.TopKAggregator

/** Advanced operator surface: typed UDAF top-k per group, interval
  * (range) join, and regex tokenization.
  */
object Advanced {

  /** Q35 — per-group top-k via the typed bounded-buffer Aggregator
    * (map-side combinable; no per-group sort). Top-3 orders by price per
    * order priority, tie-broken by order key. */
  val q35: Q = Q(
    "q35_topk_per_group",
    run = { (spark, dir) =>
      import spark.implicits._
      val topk = new TopKAggregator[(String, Double, Long)](3, r => (r._2, r._3))
      Tables.orders(spark, dir)
        .select(col("o_orderpriority"), col("o_totalprice"), col("o_orderkey"))
        .as[(String, Double, Long)]
        .groupByKey(_._1)
        .agg(topk.toColumn)
        .flatMap { case (prio, tops) =>
          tops.zipWithIndex.map { case ((price, okey), i) =>
            (prio, i + 1, okey, price)
          }
        }
        .toDF("o_orderpriority", "rnk", "o_orderkey", "o_totalprice")
    },
    oracle = Some("""
      WITH r AS (SELECT o_orderpriority, o_orderkey, o_totalprice,
                   CAST(row_number() OVER (PARTITION BY o_orderpriority
                     ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rnk
                 FROM orders)
      SELECT o_orderpriority, rnk, o_orderkey, o_totalprice
      FROM r WHERE rnk <= 3"""))

  /** Q36 — interval/range join: errors in the 5 minutes before each
    * purchase, per user (equi on user + time-band residual; Spark plans
    * the equi part as the shuffle key, the band as a join residual). */
  val q36: Q = Q(
    "q36_interval_join",
    run = { (spark, dir) =>
      val ev = Tables.events(spark, dir)
        .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val e = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("err_id"), col("user_id").as("err_user"),
          col("ts").as("err_ts"))
      p.join(e,
          col("user_id") === col("err_user") &&
            col("err_ts") >= col("ts") - expr("INTERVAL 5 MINUTES") &&
            col("err_ts") < col("ts"), "left")
        .groupBy(col("event_id"), col("user_id"), col("ts"))
        .agg(count(col("err_id")).as("n_errors_5m"))
        .select(col("event_id"), col("user_id"), col("ts").as("ts_us"),
          col("n_errors_5m"))
    },
    oracle = Some("""
      WITH ev AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
      p AS (SELECT event_id, user_id, ts FROM ev WHERE event_type = 'purchase'),
      e AS (SELECT event_id AS err_id, user_id AS err_user, ts AS err_ts FROM ev WHERE event_type = 'error')
      SELECT p.event_id, p.user_id, p.ts AS ts_us,
        CAST(count(e.err_id) AS BIGINT) AS n_errors_5m
      FROM p LEFT JOIN e ON p.user_id = e.err_user
        AND e.err_ts >= p.ts - INTERVAL 5 MINUTE AND e.err_ts < p.ts
      GROUP BY p.event_id, p.user_id, p.ts"""))

  /** Q37 — tokenization beyond whitespace: BPE-ish regex token runs
    * (letter runs / digit runs / single other chars) and vowel-run
    * counts, per document. */
  val q37: Q = Q(
    "q37_token_regex",
    run = { (spark, dir) =>
      Tables.documentsParallel(spark, dir).select(
        col("doc_id"),
        size(split(col("text"), " ")).as("n_ws_toks"),
        size(regexp_extract_all(col("text"),
          lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).as("n_regex_toks"),
        size(regexp_extract_all(col("text"),
          lit("[aeiou]+"), lit(0))).as("n_vowel_runs"))
    },
    oracle = Some("""
      SELECT doc_id,
        CAST(len(string_split(text, ' ')) AS INTEGER) AS n_ws_toks,
        CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INTEGER) AS n_regex_toks,
        CAST(len(regexp_extract_all(text, '[aeiou]+')) AS INTEGER) AS n_vowel_runs
      FROM documents"""))

  val all: Seq[Q] = Seq(q35, q36, q37)
}
