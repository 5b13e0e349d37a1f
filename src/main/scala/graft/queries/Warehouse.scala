package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Warehouse-maintenance operators: change-data-capture compaction into
  * SCD-2 validity intervals, and MERGE (upsert + delete) semantics —
  * the reference's append-vs-overwrite warehouse loads
  * (`/root/reference/dags/wine_etl_kaggle.py:199,226-244`) generalized
  * to the incremental-maintenance pair every lakehouse pipeline needs.
  *
  * Scale posture: q93 is two same-keyed windows over user_id — ONE
  * shuffle, shared by both (Catalyst folds equal partitioning+ordering
  * into one Window chain). q94 is a single equi-join on the table key
  * plus a union — the changeset side of a production MERGE is
  * broadcastable (a day's changes vs a 100 TB base) or the join rides
  * bucketed storage on the key; no other shuffle exists.
  */
object Warehouse {

  /** Core of q93 over any (user_id, event_type, ts, event_id) frame:
    * collapse each user's event stream into runs of equal event_type,
    * emitting [valid_from, valid_to) intervals (valid_to null = current
    * state). Ties on ts are broken by event_id — the fixture fuzzes
    * same-ts events deliberately (same contract as q69). */
  def stateIntervals(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    events
      .filter(col("event_type").isNotNull)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("event_type"))
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .select(col("user_id"), col("event_type"), col("ts").as("valid_from"),
        col("valid_to"), col("valid_to").isNull.as("is_current"))
  }

  /** q93 — SCD-2 state intervals (CDC compaction): per-user runs of
    * equal event_type become validity intervals. */
  val q93: Q = Q(
    "q93_state_intervals",
    run = { (spark, dir) => stateIntervals(Tables.events(spark, dir)) },
    oracle = Some("""
      WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
                   event_id
                 FROM events WHERE event_type IS NOT NULL),
      r AS (SELECT user_id, event_type, ts, event_id,
              lag(event_type) OVER (PARTITION BY user_id
                ORDER BY ts, event_id) AS prev
            FROM e),
      ch AS (SELECT user_id, event_type, ts, event_id FROM r
             WHERE prev IS NULL OR prev <> event_type)
      SELECT user_id, event_type, ts AS valid_from,
        lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          AS valid_to,
        lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
          AS is_current
      FROM ch"""))

  /** Core of q94: MERGE a changeset (k, op ∈ {D,U,I}, new_name,
    * new_bal, new_seg) into a base (c_custkey, c_name, c_acctbal,
    * c_mktsegment). Deletes drop, updates rewrite payload columns,
    * inserts append; every surviving row is tagged with what happened
    * to it — the audit column a backfill job wants. */
  def mergeUpsert(base: DataFrame, changes: DataFrame): DataFrame = {
    val survivors = base
      .join(changes.filter(col("op") =!= "I"),
        base("c_custkey") === changes("k"), "left")
      .filter(col("op").isNull || col("op") === "U")
      .select(col("c_custkey"), col("c_name"),
        when(col("op") === "U", col("new_bal")).otherwise(col("c_acctbal"))
          .as("c_acctbal"),
        when(col("op") === "U", col("new_seg")).otherwise(col("c_mktsegment"))
          .as("c_mktsegment"),
        when(col("op") === "U", lit("updated")).otherwise(lit("kept"))
          .as("change"))
    val inserts = changes.filter(col("op") === "I")
      .select(col("k").as("c_custkey"), col("new_name").as("c_name"),
        col("new_bal").as("c_acctbal"), col("new_seg").as("c_mktsegment"),
        lit("inserted").as("change"))
    survivors.unionByName(inserts)
  }

  /** Deterministic changeset derived from the customer table (residue
    * classes of the key, mirrored verbatim in the oracle): deletes at
    * ≡ 0 (mod 100), updates (+100 balance, segment upgrade) at the
    * remaining ≡ 0 (mod 10), inserts re-keyed +1_000_000 from the
    * ≡ 0 (mod 50) rows. */
  def syntheticChanges(base: DataFrame): DataFrame = {
    val dels = base.filter(col("c_custkey") % 100 === 0)
      .select(col("c_custkey").as("k"), lit("D").as("op"),
        lit(null).cast("string").as("new_name"),
        lit(null).cast("double").as("new_bal"),
        lit(null).cast("string").as("new_seg"))
    val upds = base.filter(col("c_custkey") % 100 =!= 0 &&
        col("c_custkey") % 10 === 0)
      .select(col("c_custkey").as("k"), lit("U").as("op"),
        lit(null).cast("string").as("new_name"),
        (col("c_acctbal") + 100.0).as("new_bal"),
        lit("UPGRADED").as("new_seg"))
    val ins = base.filter(col("c_custkey") % 50 === 0)
      .select((col("c_custkey") + 1000000L).as("k"), lit("I").as("op"),
        concat(lit("NewCustomer#"), (col("c_custkey") + 1000000L).cast("string"))
          .as("new_name"),
        lit(0.0).as("new_bal"), lit("NEW").as("new_seg"))
    dels.unionByName(upds).unionByName(ins)
  }

  /** q94 — MERGE upsert: apply a derived changeset to the customer
    * snapshot. */
  val q94: Q = Q(
    "q94_merge_upsert",
    run = { (spark, dir) =>
      val base = Tables.customer(spark, dir)
      mergeUpsert(base, syntheticChanges(base))
    },
    oracle = Some("""
      WITH ch AS (
        SELECT c_custkey AS k, 'D' AS op, CAST(NULL AS VARCHAR) AS new_name,
          CAST(NULL AS DOUBLE) AS new_bal, CAST(NULL AS VARCHAR) AS new_seg
        FROM customer WHERE c_custkey % 100 = 0
        UNION ALL
        SELECT c_custkey, 'U', CAST(NULL AS VARCHAR), c_acctbal + 100.0,
          'UPGRADED'
        FROM customer WHERE c_custkey % 100 <> 0 AND c_custkey % 10 = 0
        UNION ALL
        SELECT c_custkey + 1000000, 'I',
          'NewCustomer#' || CAST(c_custkey + 1000000 AS VARCHAR), 0.0, 'NEW'
        FROM customer WHERE c_custkey % 50 = 0),
      surv AS (
        SELECT b.c_custkey, b.c_name,
          CASE WHEN c.op = 'U' THEN c.new_bal ELSE b.c_acctbal END
            AS c_acctbal,
          CASE WHEN c.op = 'U' THEN c.new_seg ELSE b.c_mktsegment END
            AS c_mktsegment,
          CASE WHEN c.op = 'U' THEN 'updated' ELSE 'kept' END AS change
        FROM customer b
        LEFT JOIN (SELECT * FROM ch WHERE op <> 'I') c ON c.k = b.c_custkey
        WHERE c.op IS NULL OR c.op = 'U')
      SELECT * FROM surv
      UNION ALL
      SELECT k, new_name, new_bal, new_seg, 'inserted' FROM ch
      WHERE op = 'I'"""))

  /** Core of q171: POINT-IN-TIME dimension enrichment — the classic
    * warehouse join ("each fact gets the dimension VERSION valid at
    * fact time") composed from q93's SCD-2 semantics: the dimension
    * stream is the run-compacted non-purchase state history, facts are
    * purchases, and each purchase is enriched with (state_at,
    * state_since) where state_since is the RUN START — the SCD-2
    * validity answer, materially different from q13's last-raw-event
    * (three consecutive clicks are ONE state since the first).
    *
    * Spark-first shape: NO interval join and NO range predicate — the
    * compacted state points and the facts union into one stream and a
    * single `last(ignoreNulls)` window resolves validity (the q13
    * as-of recipe applied to an SCD dimension); both windows partition
    * on user_id, so Catalyst plans ONE shuffle for the whole query. A
    * state change at the purchase's exact timestamp applies (kind
    * orders dimension points before facts at equal ts) — the
    * valid_from ≤ ts inclusive contract, suite-pinned. */
  def pointInTimeState(events: DataFrame): DataFrame = {
    val e = events.filter(col("event_type").isNotNull)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
    val wDim = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val dim = e.filter(col("event_type") =!= "purchase")
      .withColumn("prev", lag(col("event_type"), 1).over(wDim))
      .filter(col("prev").isNull || col("prev") =!= col("event_type"))
      .select(col("user_id"), col("ts"), col("event_id"),
        lit(0).as("kind"), col("event_type").as("state"))
    val facts = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"),
        lit(1).as("kind"), lit(null).cast("string").as("state"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("kind"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dim.unionByName(facts)
      .withColumn("state_at", last(col("state"), ignoreNulls = true).over(w))
      .withColumn("state_since",
        last(when(col("kind") === 0, col("ts")), ignoreNulls = true).over(w))
      .filter(col("kind") === 1)
      .select(col("event_id"), col("user_id"), col("ts").as("ts_us"),
        col("state_at"), col("state_since").as("state_since_us"))
  }

  /** q171 — SCD-2 point-in-time enrichment: every purchase carries the
    * user state (non-purchase run) valid at purchase time and that
    * state's run start. */
  val q171: Q = Q(
    "q171_point_in_time",
    run = { (spark, dir) => pointInTimeState(Tables.events(spark, dir)) },
    oracle = Some("""
      WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
                   event_id
                 FROM events WHERE event_type IS NOT NULL),
      d0 AS (SELECT user_id, event_type, ts, event_id,
               lag(event_type) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS prev
             FROM e WHERE event_type <> 'purchase'),
      dim AS (SELECT user_id, ts, event_id, 0 AS kind,
                event_type AS state
              FROM d0 WHERE prev IS NULL OR prev <> event_type),
      f AS (SELECT user_id, ts, event_id, 1 AS kind,
              CAST(NULL AS VARCHAR) AS state
            FROM e WHERE event_type = 'purchase'),
      u AS (SELECT * FROM dim UNION ALL SELECT * FROM f),
      m AS (SELECT user_id, ts, event_id, kind,
              last_value(state IGNORE NULLS) OVER (
                PARTITION BY user_id ORDER BY ts, kind, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS state_at,
              last_value(CASE WHEN kind = 0 THEN ts END IGNORE NULLS)
                OVER (PARTITION BY user_id ORDER BY ts, kind, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS state_since
            FROM u)
      SELECT event_id, user_id, ts AS ts_us, state_at,
        state_since AS state_since_us
      FROM m WHERE kind = 1"""))

  val all: Seq[Q] = Seq(q93, q94, q171)
}
