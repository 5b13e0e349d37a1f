package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.queries.Learn

/** q134 A/B (verdict round-9 "What's wrong #3"): the explode+hash-agg
  * Gram plan generates d(d+1)/2 = 2,080 rows per vector whose only job
  * is feeding a 2,080-key map-side-combined agg; the
  * [[graft.functions.GramAggregator]] twin accumulates the same exact-
  * decimal cells in one fixed buffer per partition. This tool measures
  * both on the sf embeddings and on a 10× replicated frame (the
  * ScaleDryRun vec_id-offset replication recipe), asserting bit-equal
  * output first — a speedup that changed a single cell would be a bug,
  * not a win. Results recorded in BASELINE.md round-10. */
object Q134GramAB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = Tables.embeddings(spark, sfDir)
    val x10 = (0 until 10).map(r =>
        base.select((col("vec_id") + lit(r * 10000000L)).as("vec_id"),
          col("embedding"), col("label")))
      .reduce(_.unionByName(_))

    def key(df: DataFrame): Map[(Int, Int), Double] =
      df.collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap

    // equality first — the contract that makes the A/B a fair swap
    val a = key(Learn.embedCovariance(base))
    val b = key(Learn.embedCovarianceAcc(base))
    require(a.keySet == b.keySet, "cell sets diverge")
    val drift = a.keys.map(k => math.abs(a(k) - b(k))).max
    require(drift == 0.0, s"bit drift between plans: $drift")
    println(s"[q134ab] equality: ${a.size} cells bit-identical")

    def time(label: String, mk: () => DataFrame): Double = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk().queryExecution.toRdd.count(): Unit
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[q134ab] $label min=${ts.min}%.3f " +
        f"samples=${ts.map(t => f"$t%.2f").mkString(",")}")
      ts.min
    }

    val e1 = time("explode  sf1x", () => Learn.embedCovariance(base))
    val a1 = time("accum    sf1x", () => Learn.embedCovarianceAcc(base))
    val e10 = time("explode sf10x", () => Learn.embedCovariance(x10))
    val a10 = time("accum   sf10x", () => Learn.embedCovarianceAcc(x10))
    println(f"[q134ab] ratio explode/accum: 1x=${e1 / a1}%.2f 10x=${e10 / a10}%.2f")
    spark.stop()
  }
}
