package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Focused 1×/10×/100× evidence pass for the EXACT-PERCENTILE CUT
  * family (q233 gains table, q199 Lorenz, q107/q45/q219 percentile
  * reports) — the round-14 verdict's unproven scale bound: Spark's
  * exact `Percentile` buffers a value→count map, partial-aggregated
  * per partition and MERGED AT ONE FINAL REDUCER, so the thing that
  * must stay bounded is the DISTINCT-VALUE count, not the row count.
  * Same growth recipe as [[ScaleDryRun100]] (which carries this leg in
  * the full pass); this main isolates it so the bound can be
  * re-measured in minutes. Two growth directions:
  *
  *  - `catalog`: 100× rows, SAME price catalog — distinct cents stay
  *    catalog-bounded (the documented q233 contract: score = line
  *    cents, bounded by the part price list);
  *  - `distinct`: every copy's cents offset — distinct values grow
  *    with the data (60 M distinct at 100×), the adversarial case for
  *    the single-reducer merge.
  *
  * Verdict rule: if the catalog ratio leaves the ~linear band, the cut
  * computation must switch to a two-pass fixed-width histogram (exact
  * for integer cents). The distinct case is expected to degrade — it
  * measures WHERE the cliff is, so the q233 scaladoc's bound is a
  * number, not a guess. Run with SPARK_DRIVER_MEM=48g. */
object PercentileCutDryRun {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"

    def timed(df: => DataFrame): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = df.queryExecution.toRdd.count()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    def row(name: String, t: Double, n: Long, note: String = ""): Unit =
      println(f"[pcut] $name%-24s $t%8.2f s  ($n rows)$note")

    val scored0 = spark.read.parquet(s"$dir/lineitem.parquet").select(
      (col("l_extendedprice").cast("decimal(12,4)") * 10000)
        .cast("long").as("score_cents"),
      when(col("l_returnflag") === "R", 1L).otherwise(0L).as("pos"))
    def grow(mult: Int, offsetCents: Boolean): DataFrame =
      (0 until mult).map { i =>
        if (i == 0 || !offsetCents) scored0
        else scored0.select(
          (col("score_cents") + lit(i * 10000000000L)).as("score_cents"),
          col("pos"))
      }.reduce(_ unionByName _).repartition(cpus.toInt)
    def gainsCase(tag: String, scored: DataFrame): Double = {
      val cuts = scored.agg(percentile(col("score_cents"),
        array((1 to 9).map(i => lit(i / 10.0)): _*)).as("cuts"))
      val (t, n) = timed(
        scored.crossJoin(broadcast(cuts))
          .select(expr("size(filter(cuts, c -> c < score_cents))")
            .as("decile"), col("pos"))
          .groupBy(col("decile"))
          .agg(count(lit(1)).as("n"), sum(col("pos")).as("n_pos")))
      row(s"gains_cut_$tag", t, n)
      t
    }
    // warm-up (JIT + footer caches)
    scored0.agg(count(lit(1))).queryExecution.toRdd.count(): Unit
    gainsCase("warm", grow(1, offsetCents = false)): Unit

    // the round-16 cut-source seam: the SAME gains rollup fed by q237's
    // all-integer fixed-bin histogram cuts — constant cut state (256
    // cells merged by addition) under ANY distinct growth, so the
    // adversarial direction that cliffs the exact path must stay in
    // the catalog path's ~linear band here
    def histCase(tag: String, scored: DataFrame): Double = {
      val (t, n) = timed(graft.queries.Warehouse.gainsFromCuts(
        scored, graft.queries.Warehouse.histCuts(scored)))
      row(s"gains_hist_$tag", t, n)
      t
    }
    histCase("warm", grow(1, offsetCents = false)): Unit

    // case selector: `exact`, `hist`, or (default) both — the exact
    // 100x-adversarial leg can kill the JVM outright on a degraded
    // window (round-16: driver heartbeat death in the single-reducer
    // value→count merge at 60 M distinct), which is itself the
    // measurement, but it must not take the hist legs down with it
    val which = args.headOption.getOrElse("all")

    if (which == "all" || which == "exact") {
      val gc1 = gainsCase("1x", grow(1, offsetCents = false))
      val gc10 = gainsCase("10x_catalog", grow(10, offsetCents = false))
      val gc100 = gainsCase("100x_catalog", grow(100, offsetCents = false))
      val ga10 = gainsCase("10x_distinct", grow(10, offsetCents = true))
      val ga100 = gainsCase("100x_distinct", grow(100, offsetCents = true))
      println(f"[pcut] RATIO gains_catalog  10x=${gc10 / gc1}%.1fx 100x=${gc100 / gc1}%.1fx")
      println(f"[pcut] RATIO gains_distinct 10x=${ga10 / gc1}%.1fx 100x=${ga100 / gc1}%.1fx")
    }
    if (which == "all" || which == "hist") {
      val gh1 = histCase("1x", grow(1, offsetCents = false))
      val gh10 = histCase("10x_distinct", grow(10, offsetCents = true))
      val gh100 = histCase("100x_distinct", grow(100, offsetCents = true))
      println(f"[pcut] RATIO hist_distinct  10x=${gh10 / gh1}%.1fx 100x=${gh100 / gh1}%.1fx")
    }
    spark.stop()
  }
}
