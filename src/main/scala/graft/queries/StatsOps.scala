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

  /** q84 — corpus snapshot diff (dataset versioning): classify every
    * doc_id as added / removed / changed / unchanged between two corpus
    * versions by FULL OUTER join on identity + content-hash compare.
    * The fixtures carry one corpus, so the "previous" version is derived
    * deterministically from it (doc_id % 7 == 0 slice absent from old →
    * those ids are `added`; % 11 == 0 absent from new → `removed`;
    * % 5 == 0 token-reversed in old → `changed`); in production the two
    * sides are two snapshot directories and the plan is identical — one
    * co-partitioned join on doc_id, hashes computed in the scan
    * projection, never a byte-compare of full texts across the shuffle. */
  val q84: Q = Q(
    "q84_corpus_diff",
    run = { (spark, dir) =>
      val docs = Tables.documentsParallel(spark, dir)
        .filter(col("text").isNotNull)
      val oldV = docs.filter(col("doc_id") % 7 =!= 0)
        .select(col("doc_id"),
          md5(when(col("doc_id") % 5 === 0,
            concat_ws(" ", reverse(split(col("text"), " "))))
            .otherwise(col("text")).cast("binary")).as("h_old"))
      val newV = docs.filter(col("doc_id") % 11 =!= 0)
        .select(col("doc_id"), md5(col("text").cast("binary")).as("h_new"))
      oldV.join(newV, Seq("doc_id"), "full_outer")
        .select(col("doc_id"),
          when(col("h_old").isNull, "added")
            .when(col("h_new").isNull, "removed")
            .when(col("h_old") =!= col("h_new"), "changed")
            .otherwise("unchanged").as("status"))
    },
    oracle = Some("""
      WITH d AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
      oldv AS (SELECT doc_id,
                 md5(CASE WHEN doc_id % 5 = 0
                     THEN array_to_string(list_reverse(string_split(text, ' ')), ' ')
                     ELSE text END) AS h_old
               FROM d WHERE doc_id % 7 <> 0),
      newv AS (SELECT doc_id, md5(text) AS h_new
               FROM d WHERE doc_id % 11 <> 0)
      SELECT COALESCE(oldv.doc_id, newv.doc_id) AS doc_id,
        CASE WHEN h_old IS NULL THEN 'added'
             WHEN h_new IS NULL THEN 'removed'
             WHEN h_old <> h_new THEN 'changed'
             ELSE 'unchanged' END AS status
      FROM oldv FULL OUTER JOIN newv ON oldv.doc_id = newv.doc_id"""))

  /** q85 — column profiling (the data-quality report a warehouse runs on
    * every new partition): per column of `events`, row count, null
    * count, exact distinct count. ONE pass: a single aggregate computes
    * all twelve statistics (Catalyst plans the multi-distinct via
    * Expand), then an inline-table unpivot reshapes the one-row result
    * long — the q73 surface applied to profiling. Count-only stats on
    * purpose: min/max would need cross-engine numeric string rendering,
    * which is not hash-stable. */
  val q85: Q = Q(
    "q85_data_profile",
    run = { (spark, dir) =>
      def nulls(c: String) =
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"null_$c")
      val cols = Seq("event_type", "user_id", "value", "props")
      val stats = count(lit(1)).as("n_rows") +: cols.flatMap(c =>
        Seq(nulls(c), countDistinct(col(c)).as(s"dist_$c")))
      val agg = Tables.events(spark, dir).agg(stats.head, stats.tail: _*)
      agg.select(col("n_rows"), explode(array(cols.map(c =>
          struct(lit(c).as("column"), col(s"null_$c").as("n_null"),
            col(s"dist_$c").as("n_distinct"))): _*)).as("p"))
        .select(col("p.column").as("column"), col("n_rows"),
          col("p.n_null").as("n_null"), col("p.n_distinct").as("n_distinct"))
    },
    oracle = Some("""
      WITH a AS (SELECT CAST(count(*) AS BIGINT) AS n_rows,
        CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_event_type,
        CAST(count(DISTINCT event_type) AS BIGINT) AS dist_event_type,
        CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_user_id,
        CAST(count(DISTINCT user_id) AS BIGINT) AS dist_user_id,
        CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_value,
        CAST(count(DISTINCT value) AS BIGINT) AS dist_value,
        CAST(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_props,
        CAST(count(DISTINCT props) AS BIGINT) AS dist_props
        FROM events)
      SELECT 'event_type' AS column, n_rows, null_event_type AS n_null,
        dist_event_type AS n_distinct FROM a
      UNION ALL SELECT 'user_id', n_rows, null_user_id, dist_user_id FROM a
      UNION ALL SELECT 'value', n_rows, null_value, dist_value FROM a
      UNION ALL SELECT 'props', n_rows, null_props, dist_props FROM a"""))

  /** q86 — per-type daily-volume TREND (least-squares slope/intercept
    * over day index): the "is error volume growing?" monitor. Stage 1
    * collapses events to integer day counts; stage 2 sums the four
    * regression moments — ALL integers (day index × count), so every
    * intermediate is exact under any partial-agg order; the slope and
    * intercept are assembled from the single aggregated row per group
    * with one fixed double expression tree (q82's recipe, one variable
    * simpler — no decimals needed at all). */
  val q86: Q = Q(
    "q86_daily_trend",
    run = { (spark, dir) =>
      val daily = Tables.events(spark, dir)
        .select(col("event_type"),
          datediff(to_date(col("ts")), lit("2024-01-01")).cast("long").as("x"))
        .groupBy(col("event_type"), col("x"))
        .agg(count(lit(1)).as("y"))
      val m = daily.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("x") * col("x")).as("sx2"), sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"))
      m.withColumn("slope",
          (col("n").cast(DoubleType) * col("sxy").cast(DoubleType) -
            col("sx").cast(DoubleType) * col("sy").cast(DoubleType)) /
            (col("n").cast(DoubleType) * col("sx2").cast(DoubleType) -
              col("sx").cast(DoubleType) * col("sx").cast(DoubleType)))
        .withColumn("intercept",
          (col("sy").cast(DoubleType) - col("slope") * col("sx").cast(DoubleType)) /
            col("n").cast(DoubleType))
        .select(col("event_type"), col("n"), col("slope"), col("intercept"))
    },
    oracle = Some("""
      WITH daily AS (SELECT event_type,
                       CAST(date_diff('day', DATE '2024-01-01',
                         CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS BIGINT) AS x,
                       CAST(count(*) AS BIGINT) AS y
                     FROM events GROUP BY 1, 2),
      m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
              CAST(sum(x) AS BIGINT) AS sx,
              CAST(sum(x * x) AS BIGINT) AS sx2,
              CAST(sum(y) AS BIGINT) AS sy,
              CAST(sum(x * y) AS BIGINT) AS sxy
            FROM daily GROUP BY event_type),
      s AS (SELECT event_type, n,
              (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
               CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
              (CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE) -
               CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope,
              CAST(sy AS DOUBLE) AS syd, CAST(sx AS DOUBLE) AS sxd
            FROM m)
      SELECT event_type, n, slope,
        (syd - slope * sxd) / CAST(n AS DOUBLE) AS intercept
      FROM s"""))

  /** q87 — join-key skew diagnosis: the top-10 heaviest l_partkey values
    * with their share and cumulative share of all lineitem rows — the
    * report that decides whether a join needs salting (§4's skew story
    * as a QUERY, not just a mitigation). Scale shape: the top-10 comes
    * from orderBy+limit (TakeOrderedAndProject — a distributed
    * partial-top-k, never a global sort of the key frame, whose
    * cardinality at 100 TB is unbounded); rank and running sum over the
    * ten surviving rows come from a broadcast TRIANGLE join on the same
    * total order (the q199 recipe — rank = count of peers at-or-above,
    * cum_n = their sum), so no partition-less window exists anywhere in
    * the plan. The triangle prefix over the limited frame equals the
    * full-frame prefix because both use the same total order. */
  val q87: Q = Q(
    "q87_skew_report",
    run = { (spark, dir) =>
      val li = Tables.lineitem(spark, dir)
      val top10 = li.groupBy(col("l_partkey")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("l_partkey").asc).limit(10)
      val total = li.agg(count(lit(1)).as("n_total"))
      val peers = top10.select(col("l_partkey").as("pk2"), col("n").as("n2"))
      top10.join(broadcast(peers),
          col("n2") > col("n") ||
            (col("n2") === col("n") && col("pk2") <= col("l_partkey")))
        .groupBy(col("l_partkey"), col("n"))
        .agg(count(lit(1)).cast("int").as("rank"),
          sum(col("n2")).as("cum_n"))
        .crossJoin(broadcast(total))
        .select(col("rank"), col("l_partkey"), col("n"),
          (col("n").cast(DoubleType) / col("n_total")).as("share"),
          (col("cum_n").cast(DoubleType) / col("n_total")).as("cum_share"))
    },
    oracle = Some("""
      WITH top10 AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS n
                     FROM lineitem GROUP BY 1
                     ORDER BY n DESC, l_partkey ASC LIMIT 10),
      t AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM lineitem),
      r AS (SELECT l_partkey, n,
              CAST(row_number() OVER (ORDER BY n DESC, l_partkey ASC)
                AS INTEGER) AS rank,
              CAST(sum(n) OVER (ORDER BY n DESC, l_partkey ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                AS cum_n
            FROM top10)
      SELECT rank, l_partkey, n,
        CAST(n AS DOUBLE) / n_total AS share,
        CAST(cum_n AS DOUBLE) / n_total AS cum_share
      FROM r CROSS JOIN t"""))

  /** Core of q170: A/B EXPERIMENT readout — hash-bucketed assignment +
    * two-proportion effect summary, the analysis loop every
    * product/data team runs on an events stream. Assignment is the
    * house md5-draw recipe on the UNIT of randomization (user_id's
    * first hex digit mod 2) — how real experiment platforms bucket:
    * pure, stable across sessions, replayed digit-by-digit by the
    * oracle, immune to "user_id % 2" parity artifacts. Conversion =
    * the user has ≥ 1 purchase event (unit-level, not event-level — a
    * heavy clicker never double-counts). The one-row summary carries
    * per-variant counts, rates in ppm, the rate gap, and the SQUARED
    * pooled z statistic in milli-units (z² > 3841 ⇔ |z| > 1.96 ⇔
    * p < 0.05) — ALL integer arithmetic (ppm rates, one exact widened
    * quotient), so the gate certifies the statistic exactly; no float
    * knife-edges. The z² term is ONE division over DECIMAL(38,0)
    * products (oracle: HUGEINT — both truncate the non-negative
    * quotient identically): z²·1e3 = 1000·gap_ppm²·n_a·n_b DIV
    * (pooled·(1e6−pooled)·(n_a+n_b)). The round-12 formula chained
    * `1000000 DIV n` sub-quotients, which truncate to 0 once a variant
    * exceeds 1e6 units — at the 100× contract the headline statistic
    * silently nulled; the widened single quotient is exact to 38
    * digits (per-side units beyond 1e10 before the product nears the
    * decimal ceiling) and null only in the degenerate pooled ∈ {0, 1e6}
    * case, where z is genuinely undefined.
    *
    * Scale shape: one distinct over (user, variant-expr) + one
    * distinct over purchasers + a left join and a 2-group agg — the
    * variant table never materializes (the assignment is an
    * expression); the final pivot crossJoins two 1-row broadcasts.
    * At 100 TB the unit table is the only shuffle and it is
    * user-bounded, not event-bounded. */
  def abTest(events: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val variant = (conv(substring(
      md5(concat(lit("ab|"), col("user_id").cast("string"))), 1, 1),
      16, 10).cast("long") % 2).as("variant")
    val users = events.select(col("user_id")).distinct()
      .select(col("user_id"), variant)
    val purchasers = events.filter(col("event_type") === "purchase")
      .select(col("user_id")).distinct().withColumn("cv", lit(1L))
    val byVariant = users.join(purchasers, Seq("user_id"), "left")
      .groupBy(col("variant"))
      .agg(count(lit(1)).as("n"),
        sum(coalesce(col("cv"), lit(0L))).as("c"))
    val a = byVariant.filter(col("variant") === 0)
      .select(col("n").as("n_a"), col("c").as("conv_a"))
    val b = byVariant.filter(col("variant") === 1)
      .select(col("n").as("n_b"), col("c").as("conv_b"))
    a.crossJoin(broadcast(b))
      .withColumn("rate_a_ppm", expr("(conv_a * 1000000) DIV n_a"))
      .withColumn("rate_b_ppm", expr("(conv_b * 1000000) DIV n_b"))
      .withColumn("gap_ppm", expr("rate_a_ppm - rate_b_ppm"))
      .withColumn("pooled_ppm",
        expr("((conv_a + conv_b) * 1000000) DIV (n_a + n_b)"))
      .withColumn("z2_milli", expr(
        """(CAST(1000 AS DECIMAL(38,0)) * gap_ppm * gap_ppm * n_a * n_b)
          |DIV nullif(
          |  CAST(pooled_ppm AS DECIMAL(38,0)) * (1000000 - pooled_ppm)
          |    * (n_a + n_b),
          |  0)""".stripMargin))
      .select(col("n_a"), col("conv_a"), col("rate_a_ppm"),
        col("n_b"), col("conv_b"), col("rate_b_ppm"),
        col("gap_ppm"), col("pooled_ppm"), col("z2_milli"))
  }

  /** q170 — hash-bucketed A/B experiment readout over events:
    * unit-level conversion, ppm rates, and the exact-integer pooled
    * z² in milli-units. */
  val q170: Q = Q(
    "q170_ab_test",
    run = { (spark, dir) => abTest(Tables.events(spark, dir)) },
    oracle = Some("""
      WITH u AS (SELECT DISTINCT user_id FROM events),
      v AS (SELECT user_id,
              CAST((strpos('0123456789abcdef',
                substr(md5('ab|' || CAST(user_id AS VARCHAR)), 1, 1)) - 1)
                % 2 AS BIGINT) AS variant
            FROM u),
      p AS (SELECT DISTINCT user_id FROM events
            WHERE event_type = 'purchase'),
      g AS (SELECT v.variant, CAST(count(*) AS BIGINT) AS n,
              CAST(sum(CASE WHEN p.user_id IS NULL THEN 0 ELSE 1 END)
                AS BIGINT) AS c
            FROM v LEFT JOIN p ON v.user_id = p.user_id
            GROUP BY v.variant),
      a AS (SELECT n AS n_a, c AS conv_a FROM g WHERE variant = 0),
      b AS (SELECT n AS n_b, c AS conv_b FROM g WHERE variant = 1),
      s AS (SELECT n_a, conv_a, (conv_a * 1000000) // n_a AS rate_a_ppm,
              n_b, conv_b, (conv_b * 1000000) // n_b AS rate_b_ppm,
              (conv_a * 1000000) // n_a - (conv_b * 1000000) // n_b
                AS gap_ppm,
              ((conv_a + conv_b) * 1000000) // (n_a + n_b) AS pooled_ppm
            FROM a CROSS JOIN b)
      SELECT n_a, conv_a, rate_a_ppm, n_b, conv_b, rate_b_ppm, gap_ppm,
        pooled_ppm,
        CAST((CAST(1000 AS HUGEINT) * gap_ppm * gap_ppm * n_a * n_b)
          // nullif(
            CAST(pooled_ppm AS HUGEINT) * (1000000 - pooled_ppm)
              * (n_a + n_b), 0) AS BIGINT) AS z2_milli
      FROM s"""))

  /** Core of q192: CUPED variance reduction for the A/B readout
    * (Deng, Xu, Kohavi & Walker WSDM'13 — the pre-experiment-covariate
    * adjustment every mature experimentation platform applies before
    * q170's significance math): each unit's post-period activity Y is
    * adjusted by its PRE-period activity X — Y′ = Y − θ(X − x̄) with
    * θ = cov(X,Y)/var(X) pooled across variants — removing the
    * between-user variance the randomization already balanced, so the
    * same experiment resolves smaller effects (variance shrinks by
    * exactly ρ², reported as rho2_ppm).
    *
    * All-integer discipline: X/Y are event counts split at a fixed
    * date boundary; every moment (n, Σx, Σy, Σxx, Σyy, Σxy) is an
    * exact integer hash-agg, θ and the adjusted means are integer
    * ppm/milli via DECIMAL(38,0)-widened DIV (q169/q188 recipe), and
    * ρ²_ppm reuses θ_ppm·cov DIV varY so nothing is squared twice.
    * Headroom: n·Σxy must stay under ~1e19 before the DECIMAL(38)
    * product of the ρ² numerator saturates — ~1e7 units × 1e3 events
    * each; beyond that, sample the covariate scan (θ is an estimate,
    * not an invariant). Truncation compounds identically in both
    * engines.
    *
    * Scale shape: ONE user-keyed hash-agg over events (the only
    * corpus-sized shuffle — q170's unit-table posture), then 1-row
    * global moments broadcast into a 2-row per-variant frame. */
  def cupedReadout(events: org.apache.spark.sql.DataFrame,
      boundary: String = "2024-01-18"): org.apache.spark.sql.DataFrame = {
    val variant = (conv(substring(
      md5(concat(lit("ab|"), col("user_id").cast("string"))), 1, 1),
      16, 10).cast("long") % 2).as("variant")
    val xy = events.filter(col("ts").isNotNull && col("user_id").isNotNull)
      .groupBy(col("user_id"))
      .agg(count(when(to_date(col("ts")) < lit(boundary), 1)).as("x"),
        count(when(to_date(col("ts")) >= lit(boundary), 1)).as("y"))
      .select(col("user_id"), variant, col("x"), col("y"))
    cupedFromXY(xy)
  }

  /** Moment assembly of [[cupedReadout]] from a prepared (user_id,
    * variant, x, y) frame — split out so the envelope guard below is
    * testable without 10^19 synthetic events. */
  private[graft] def cupedFromXY(
      xy: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val moments = xy.agg(count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"),
      sum(col("x") * col("y")).as("sxy"))
      // LOUD envelope (dictEncode precedent): the ρ² numerator
      // θ_ppm·covn rides DECIMAL(38,0), and past n·Σxy ≈ 1e19 the
      // widened products start saturating SILENTLY (non-ANSI decimal
      // overflow → null, truncation before that). Fail the job at the
      // documented headroom boundary instead — a filter (not a pruned
      // projection) so the optimizer cannot drop the assertion.
      .filter(assert_true(
        expr("CAST(n AS DECIMAL(38,0)) * sxy " +
          "< CAST('10000000000000000000' AS DECIMAL(38,0))"),
        concat(lit("q192 CUPED envelope exceeded: n*Sxy = "),
          expr("CAST(CAST(n AS DECIMAL(38,0)) * sxy AS STRING)"),
          lit(" >= 1e19 — sample the covariate scan (theta is an " +
            "estimate, not an invariant)"))).isNull)
    val perVariant = xy.groupBy(col("variant"))
      .agg(count(lit(1)).as("n_units"),
        sum(col("x")).as("sum_x"), sum(col("y")).as("sum_y"))
    perVariant.crossJoin(broadcast(moments))
      .withColumn("covn",
        expr("CAST(n AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy"))
      .withColumn("varxn",
        expr("CAST(n AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx"))
      .withColumn("varyn",
        expr("CAST(n AS DECIMAL(38,0)) * syy - CAST(sy AS DECIMAL(38,0)) * sy"))
      .withColumn("theta_ppm",
        expr("CAST((1000000 * covn) DIV nullif(varxn, 0) AS BIGINT)"))
      .withColumn("rho2_ppm",
        expr("CAST((theta_ppm * covn) DIV nullif(varyn, 0) AS BIGINT)"))
      .withColumn("mean_y_milli", expr("(1000 * sum_y) DIV n_units"))
      // mean Y′_v·1000 = 1000·Σy_v/n_v − θ·1000·(Σx_v/n_v − Σx/n),
      // assembled as ONE integer expression over the widened moments
      .withColumn("mean_y_cuped_milli", expr(
        """(1000 * sum_y) DIV n_units -
          |CAST((theta_ppm * (CAST(1000 AS DECIMAL(38,0)) * sum_x * n
          |                   - CAST(1000 AS DECIMAL(38,0)) * sx * n_units))
          |  DIV (CAST(1000000 AS DECIMAL(38,0)) * n_units * n)
          |  AS BIGINT)""".stripMargin))
      .select(col("variant"), col("n_units"), col("sum_x"), col("sum_y"),
        col("mean_y_milli"), col("theta_ppm"), col("rho2_ppm"),
        col("mean_y_cuped_milli"))
  }

  /** q192 — CUPED-adjusted A/B readout (integer θ, ρ², adjusted
    * means). */
  val q192: Q = Q(
    "q192_cuped",
    run = { (spark, dir) => cupedReadout(Tables.events(spark, dir)) },
    oracle = Some("""
      WITH xy AS (
        SELECT user_id,
          CAST((strpos('0123456789abcdef',
            substr(md5('ab|' || CAST(user_id AS VARCHAR)), 1, 1)) - 1)
            % 2 AS BIGINT) AS variant,
          CAST(count(*) FILTER (WHERE CAST(CAST(ts AS TIMESTAMP) AS DATE)
            < DATE '2024-01-18') AS BIGINT) AS x,
          CAST(count(*) FILTER (WHERE CAST(CAST(ts AS TIMESTAMP) AS DATE)
            >= DATE '2024-01-18') AS BIGINT) AS y
        FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
        GROUP BY user_id),
      m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
              CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
              CAST(sum(x * x) AS HUGEINT) AS sxx,
              CAST(sum(y * y) AS HUGEINT) AS syy,
              CAST(sum(x * y) AS HUGEINT) AS sxy
            FROM xy),
      v AS (SELECT variant, CAST(count(*) AS BIGINT) AS n_units,
              CAST(sum(x) AS BIGINT) AS sum_x,
              CAST(sum(y) AS BIGINT) AS sum_y
            FROM xy GROUP BY variant),
      j AS (SELECT v.*, m.n, m.sx, m.sy,
              m.n * m.sxy - m.sx * m.sy AS covn,
              m.n * m.sxx - m.sx * m.sx AS varxn,
              m.n * m.syy - m.sy * m.sy AS varyn
            FROM v CROSS JOIN m),
      t AS (SELECT *, (1000000 * covn) // nullif(varxn, 0) AS theta_ppm
            FROM j)
      SELECT variant, n_units, sum_x, sum_y,
        (1000 * sum_y) // n_units AS mean_y_milli,
        CAST(theta_ppm AS BIGINT) AS theta_ppm,
        CAST((theta_ppm * covn) // nullif(varyn, 0) AS BIGINT) AS rho2_ppm,
        CAST((1000 * sum_y) // n_units -
          (theta_ppm * (1000 * CAST(sum_x AS HUGEINT) * n
                        - 1000 * sx * n_units))
          // (CAST(1000000 AS HUGEINT) * n_units * n) AS BIGINT)
          AS mean_y_cuped_milli
      FROM t"""))

  /** Core of q196: MIX-SHIFT DECOMPOSITION of a rate change between
    * two periods (the Oaxaca/Kitagawa-style "why did the overall
    * number move" analysis every metrics review runs): the overall
    * fulfilled-rate change from period 1 to period 2 splits, per
    * segment, into a WITHIN term (the segment's own rate moved,
    * weighted at its new share) and a MIX term (traffic shifted
    * between segments of different base rates, at old rates) —
    * Δ = Σ_s w2_s·(r2_s − r1_s) + Σ_s (w2_s − w1_s)·r1_s, the exact
    * asymmetric decomposition. Without this split, a flat overall rate
    * routinely hides "every segment got worse but mix moved toward the
    * better segment" — the classic Simpson trap q64-style monitoring
    * can't see.
    *
    * All-integer: counts → ppm rates/weights by integer DIV, the two
    * contribution terms DIV-truncated from exact products — identical
    * truncation both engines; the suite asserts the conservation law
    * (Σ within + Σ mix = overall Δ) to segment-count ppm truncation.
    *
    * Scale shape: ONE map-side-combined pass over the fact table
    * (conditional counts per segment), a 1-row totals broadcast, and a
    * segments-sized output — no joins wider than the segment dim. */
  def mixShift(orders: org.apache.spark.sql.DataFrame,
      y1: Int = 1995, y2: Int = 1996): org.apache.spark.sql.DataFrame = {
    val yr = year(to_date(col("o_orderdate")))
    val seg = orders
      .filter(col("o_orderdate").isNotNull && (yr === y1 || yr === y2))
      .groupBy(coalesce(col("o_orderpriority"), lit("(null)"))
        .as("segment"))
      .agg(count(when(yr === y1, 1)).as("n1"),
        count(when(yr === y1 && col("o_orderstatus") === "F", 1)).as("f1"),
        count(when(yr === y2, 1)).as("n2"),
        count(when(yr === y2 && col("o_orderstatus") === "F", 1)).as("f2"))
    val totals = seg.agg(sum(col("n1")).as("tn1"), sum(col("n2")).as("tn2"))
    seg.crossJoin(broadcast(totals))
      .withColumn("r1_ppm", expr("(f1 * 1000000) DIV nullif(n1, 0)"))
      .withColumn("r2_ppm", expr("(f2 * 1000000) DIV nullif(n2, 0)"))
      .withColumn("w1_ppm", expr("(n1 * 1000000) DIV nullif(tn1, 0)"))
      .withColumn("w2_ppm", expr("(n2 * 1000000) DIV nullif(tn2, 0)"))
      .withColumn("within_ppm",
        expr("(w2_ppm * (r2_ppm - r1_ppm)) DIV 1000000"))
      .withColumn("mix_ppm",
        expr("((w2_ppm - w1_ppm) * r1_ppm) DIV 1000000"))
      .select(col("segment"), col("n1"), col("n2"),
        col("r1_ppm"), col("r2_ppm"), col("w1_ppm"), col("w2_ppm"),
        col("within_ppm"), col("mix_ppm"))
  }

  /** q196 — per-segment within/mix decomposition of the fulfilled-rate
    * change, exact integer ppm. */
  val q196: Q = Q(
    "q196_mix_shift",
    run = { (spark, dir) => mixShift(Tables.orders(spark, dir)) },
    oracle = Some("""
      WITH seg AS (
        SELECT COALESCE(o_orderpriority, '(null)') AS segment,
          CAST(count(*) FILTER (WHERE year(CAST(o_orderdate AS TIMESTAMP))
            = 1995) AS BIGINT) AS n1,
          CAST(count(*) FILTER (WHERE year(CAST(o_orderdate AS TIMESTAMP))
            = 1995 AND o_orderstatus = 'F') AS BIGINT) AS f1,
          CAST(count(*) FILTER (WHERE year(CAST(o_orderdate AS TIMESTAMP))
            = 1996) AS BIGINT) AS n2,
          CAST(count(*) FILTER (WHERE year(CAST(o_orderdate AS TIMESTAMP))
            = 1996 AND o_orderstatus = 'F') AS BIGINT) AS f2
        FROM orders
        WHERE o_orderdate IS NOT NULL
          AND year(CAST(o_orderdate AS TIMESTAMP)) IN (1995, 1996)
        GROUP BY 1),
      t AS (SELECT CAST(sum(n1) AS BIGINT) AS tn1,
              CAST(sum(n2) AS BIGINT) AS tn2 FROM seg),
      r AS (SELECT seg.*,
              (f1 * 1000000) // nullif(n1, 0) AS r1_ppm,
              (f2 * 1000000) // nullif(n2, 0) AS r2_ppm,
              (n1 * 1000000) // nullif(tn1, 0) AS w1_ppm,
              (n2 * 1000000) // nullif(tn2, 0) AS w2_ppm
            FROM seg CROSS JOIN t)
      SELECT segment, n1, n2, r1_ppm, r2_ppm, w1_ppm, w2_ppm,
        (w2_ppm * (r2_ppm - r1_ppm)) // 1000000 AS within_ppm,
        ((w2_ppm - w1_ppm) * r1_ppm) // 1000000 AS mix_ppm
      FROM r"""))

  /** q226 — BENFORD FIRST-DIGIT AUDIT over order totals (the classic
    * fabricated-data / fraud screen: organically grown money amounts
    * follow log10(1+1/d); synthesized ones usually don't). The first
    * digit is taken from the DECIMAL(18,2) string rendering — never
    * from log10 (whose library rounding may disagree across engines at
    * exact powers of ten) and never from the raw double's string (whose
    * scientific-notation cutover is engine-specific); fixed-point
    * decimal→string is plain-format in both engines by contract. The
    * expected ppm per digit are integer literals of
    * round(log10(1+1/d)·1e6) — identical constants on both sides.
    * One digit hash-agg (9-row output), total via 1-row broadcast,
    * deviations in exact integer ppm. Domain-gated to amounts ≥ 1 (a
    * leading "0." or "-" digit has no Benford expectation). */
  val q226: Q = Q(
    "q226_benford_audit",
    run = { (spark, dir) =>
      val expCase =
        "CASE digit WHEN '1' THEN 301030 WHEN '2' THEN 176091 " +
          "WHEN '3' THEN 124939 WHEN '4' THEN 96910 WHEN '5' THEN 79181 " +
          "WHEN '6' THEN 66947 WHEN '7' THEN 57992 WHEN '8' THEN 51153 " +
          "ELSE 45757 END"
      val digits = Tables.orders(spark, dir)
        .filter(col("o_totalprice") >= 1)
        .select(substring(col("o_totalprice").cast(DecimalType(18, 2))
          .cast("string"), 1, 1).as("digit"))
        .groupBy(col("digit"))
        .agg(count(lit(1)).as("n_obs"))
      val total = digits.agg(sum(col("n_obs")).as("n_total"))
      digits.join(broadcast(total))
        .withColumn("obs_ppm", expr("(n_obs * 1000000) DIV n_total"))
        .withColumn("exp_ppm", expr(expCase))
        .select(col("digit"), col("n_obs"), col("obs_ppm"), col("exp_ppm"),
          (col("obs_ppm") - col("exp_ppm")).as("dev_ppm"))
    },
    oracle = Some("""
      WITH d AS (
        SELECT substring(CAST(CAST(o_totalprice AS DECIMAL(18,2))
            AS VARCHAR), 1, 1) AS digit,
          CAST(count(*) AS BIGINT) AS n_obs
        FROM orders WHERE o_totalprice >= 1
        GROUP BY 1),
      t AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n_total FROM d)
      SELECT digit, n_obs,
        (n_obs * 1000000) // n_total AS obs_ppm,
        CAST(CASE digit WHEN '1' THEN 301030 WHEN '2' THEN 176091
          WHEN '3' THEN 124939 WHEN '4' THEN 96910 WHEN '5' THEN 79181
          WHEN '6' THEN 66947 WHEN '7' THEN 57992 WHEN '8' THEN 51153
          ELSE 45757 END AS INTEGER) AS exp_ppm,
        (n_obs * 1000000) // n_total
          - CASE digit WHEN '1' THEN 301030 WHEN '2' THEN 176091
            WHEN '3' THEN 124939 WHEN '4' THEN 96910 WHEN '5' THEN 79181
            WHEN '6' THEN 66947 WHEN '7' THEN 57992 WHEN '8' THEN 51153
            ELSE 45757 END AS dev_ppm
      FROM d CROSS JOIN t"""))

  /** q228 — CHI-SQUARE INDEPENDENCE CELLS for market segment × order
    * priority (the "is the mix shifting by segment" readout behind
    * q196's decomposition): the full contingency table with observed
    * count, expected count (milli-units), and per-cell χ² contribution
    * (ppm). ALL exact integer arithmetic: expected = r·c/N is emitted
    * as (r·c·1000) DIV N, and the χ² cell (o−e)²/e rewrites
    * division-free as ((o·N − r·c)²·10⁶) DIV (r·c·N) — the numerator
    * reaches ~10²³ at sf0.1 so it runs in DECIMAL(38,0) on the Spark
    * side and HUGEINT in the oracle, in lockstep (the q170 recipe).
    * Margins derive from the cell table itself (≤ segments×priorities
    * rows — never a second fact scan) and ride 1-row/tiny broadcasts. */
  val q228: Q = Q(
    "q228_chisq_cells",
    run = { (spark, dir) =>
      val cells = Tables.orders(spark, dir)
        .select(col("o_custkey"), col("o_orderpriority"))
        .join(Tables.customer(spark, dir)
          .select(col("c_custkey"), col("c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_obs"))
      val rowTot = cells.groupBy(col("c_mktsegment").as("rseg"))
        .agg(sum(col("n_obs")).as("r_tot"))
      val colTot = cells.groupBy(col("o_orderpriority").as("cpri"))
        .agg(sum(col("n_obs")).as("c_tot"))
      val nTot = cells.agg(sum(col("n_obs")).as("n_tot"))
      cells
        .join(broadcast(rowTot), col("c_mktsegment") === col("rseg"))
        .join(broadcast(colTot), col("o_orderpriority") === col("cpri"))
        .join(broadcast(nTot))
        .withColumn("exp_milli", expr(
          "(CAST(r_tot AS DECIMAL(38,0)) * c_tot * 1000) DIV n_tot"))
        .withColumn("chi2_ppm", expr(
          """((CAST(n_obs AS DECIMAL(38,0)) * n_tot
            |   - CAST(r_tot AS DECIMAL(38,0)) * c_tot)
            |  * (CAST(n_obs AS DECIMAL(38,0)) * n_tot
            |     - CAST(r_tot AS DECIMAL(38,0)) * c_tot)
            |  * 1000000)
            |DIV (CAST(r_tot AS DECIMAL(38,0)) * c_tot * n_tot)"""
            .stripMargin))
        .select(col("c_mktsegment"), col("o_orderpriority"), col("n_obs"),
          col("exp_milli").cast("long").as("exp_milli"),
          col("chi2_ppm").cast("long").as("chi2_ppm"))
    },
    oracle = Some("""
      WITH cells AS (
        SELECT c_mktsegment, o_orderpriority,
          CAST(count(*) AS HUGEINT) AS n_obs
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1, 2),
      r AS (SELECT c_mktsegment AS rseg, sum(n_obs) AS r_tot
            FROM cells GROUP BY 1),
      c AS (SELECT o_orderpriority AS cpri, sum(n_obs) AS c_tot
            FROM cells GROUP BY 1),
      t AS (SELECT sum(n_obs) AS n_tot FROM cells)
      SELECT c_mktsegment, o_orderpriority,
        CAST(n_obs AS BIGINT) AS n_obs,
        CAST((r_tot * c_tot * 1000) // n_tot AS BIGINT) AS exp_milli,
        CAST(((n_obs * n_tot - r_tot * c_tot)
              * (n_obs * n_tot - r_tot * c_tot) * 1000000)
          // (r_tot * c_tot * n_tot) AS BIGINT) AS chi2_ppm
      FROM cells
        JOIN r ON c_mktsegment = rseg
        JOIN c ON o_orderpriority = cpri
        CROSS JOIN t"""))

  /** q229 — KENDALL RANK CORRELATION (τ) between daily order volume
    * and daily revenue (the robust "do busier days actually make more
    * money" check — immune to the outlier days that bend Pearson, and
    * the natural companion to q204's Theil–Sen, which is the same
    * pairwise machinery pointed at slopes). ALL-INTEGER exactness: for
    * every day pair i<j classify concordant / discordant / x-tie /
    * y-tie by comparing an integer count and an exact decimal sum —
    * no ranks, no doubles until nothing is left to round. τ_a is
    * emitted in exact ppm ((C−D)·10⁶ DIV pairs). The pairwise
    * self-join is CALENDAR-BOUNDED (days, not rows — ~3 k days even at
    * decade retention ⇒ ≤ ~10⁷ pairs), so the quadratic blowup that
    * makes Kendall infeasible row-wise is structurally capped; the
    * tiny daily table broadcasts. */
  val q229: Q = Q(
    "q229_kendall_tau",
    run = { (spark, dir) =>
      val daily = Tables.orders(spark, dir)
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(count(lit(1)).as("x"),
          sum(col("o_totalprice").cast(DecimalType(12, 4))).as("y"))
      val b = daily.select(col("day").as("bday"), col("x").as("bx"),
        col("y").as("by"))
      val pairs = daily.join(broadcast(b), col("day") < col("bday"))
        .select(
          when(col("x") === col("bx"), 1L).otherwise(0L).as("tie_x"),
          when(col("y") === col("by"), 1L).otherwise(0L).as("tie_y"),
          when(col("x") =!= col("bx") && col("y") =!= col("by") &&
            ((col("x") < col("bx")) === (col("y") < col("by"))), 1L)
            .otherwise(0L).as("conc"),
          when(col("x") =!= col("bx") && col("y") =!= col("by") &&
            ((col("x") < col("bx")) =!= (col("y") < col("by"))), 1L)
            .otherwise(0L).as("disc"))
      pairs.agg(count(lit(1)).as("n_pairs"),
        sum(col("conc")).as("concordant"),
        sum(col("disc")).as("discordant"),
        sum(col("tie_x")).as("ties_x"),
        sum(col("tie_y")).as("ties_y"))
        // DIV nullif: on a degenerate input (< 2 distinct days) both
        // engines must agree on NULL — bare `// 0` raises in DuckDB
        // while Spark DIV yields NULL (ADVICE r14)
        .withColumn("tau_a_ppm",
          expr("((concordant - discordant) * 1000000)" +
            " DIV nullif(n_pairs, 0)"))
    },
    oracle = Some("""
      WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
          CAST(count(*) AS BIGINT) AS x,
          sum(CAST(o_totalprice AS DECIMAL(12,4))) AS y
        FROM orders GROUP BY 1),
      p AS (
        SELECT
          CASE WHEN a.x = b.x THEN 1 ELSE 0 END AS tie_x,
          CASE WHEN a.y = b.y THEN 1 ELSE 0 END AS tie_y,
          CASE WHEN a.x <> b.x AND a.y <> b.y
            AND ((a.x < b.x) = (a.y < b.y)) THEN 1 ELSE 0 END AS conc,
          CASE WHEN a.x <> b.x AND a.y <> b.y
            AND ((a.x < b.x) <> (a.y < b.y)) THEN 1 ELSE 0 END AS disc
        FROM daily a JOIN daily b ON a.day < b.day)
      SELECT CAST(count(*) AS BIGINT) AS n_pairs,
        CAST(sum(conc) AS BIGINT) AS concordant,
        CAST(sum(disc) AS BIGINT) AS discordant,
        CAST(sum(tie_x) AS BIGINT) AS ties_x,
        CAST(sum(tie_y) AS BIGINT) AS ties_y,
        CAST(((sum(conc) - sum(disc)) * 1000000)
          // nullif(count(*), 0) AS BIGINT) AS tau_a_ppm
      FROM p"""))

  val all: Seq[Q] = Seq(q81, q82, q84, q85, q86, q87, q170, q192, q196,
    q226, q228, q229)
}
