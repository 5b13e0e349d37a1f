package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Focused 1×/10×/100× evidence pass for the q75-exact vs q77-KMV
  * rolling-distinct pair — re-measured in round 16 because the q77
  * plan changed fundamentally (DataSketches HLL blobs → deterministic
  * md5 min-K sketches with a dense_rank cut). Growth recipe matches
  * ScaleDryRun100's events leg: each copy offsets event and user ids,
  * so users are FRESH per copy (distinct counts grow with the data —
  * the adversarial direction for the exact plan, whose grid join
  * expands every deduped (type, day, user) row ×7) while the 30-day
  * calendar grid stays fixed. The sketch's window pass merges ≤K
  * hashes per (type, day) regardless of user count — the claim this
  * main turns into a number. Run with SPARK_DRIVER_MEM=48g. */
object RollingSketchDryRun {
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
    def row(name: String, t: Double, n: Long): Unit =
      println(f"[rolling] $name%-22s $t%8.2f s  ($n rows)")

    val ev0 = graft.Tables.events(spark, dir)
    def grow(mult: Int): DataFrame =
      (0 until mult).map { i =>
        if (i == 0) ev0
        else ev0.select((col("event_id") + lit(i * 1000000000L)).as("event_id"),
          col("ts"), (col("user_id") + lit(i * 10000000L)).as("user_id"),
          col("event_type"), col("value"), col("props"))
      }.reduce(_ unionByName _).repartition(cpus.toInt)

    def cases(tag: String, mult: Int): (Double, Double) = {
      val ev = grow(mult)
      val (tEx, nEx) = timed(graft.queries.Funnels.rollingDistinctUsers(ev))
      row(s"q75_exact_$tag", tEx, nEx)
      val (tSk, nSk) = timed(
        graft.queries.Funnels.rollingDistinctUsersSketch(ev))
      row(s"q77_kmv_$tag", tSk, nSk)
      (tEx, tSk)
    }
    cases("warm", 1): Unit
    val (e1, s1) = cases("1x", 1)
    val (e10, s10) = cases("10x", 10)
    val (e100, s100) = cases("100x", 100)
    println(f"[rolling] RATIO q75_exact 10x=${e10 / e1}%.1fx 100x=${e100 / e1}%.1fx")
    println(f"[rolling] RATIO q77_kmv   10x=${s10 / s1}%.1fx 100x=${s100 / s1}%.1fx")
    println(f"[rolling] A/B at 100x fresh-user growth: exact=${e100}%.1f s vs kmv=${s100}%.1f s (${e100 / s100}%.1fx)")
    spark.stop()
  }
}
