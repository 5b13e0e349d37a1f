package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off: q116 winnowed containment at 10x with the df window scaled
  * to the corpus (the duplication-aware cap), vs the default [2,10].
  * The per-round ScaleDryRun showed the default window EMPTYING at 10x
  * on this fixture — its ~30-word vocabulary saturates 3-gram space, so
  * every fingerprint's df exceeds 10 and the blocker correctly (but
  * unhelpfully for scaling evidence) classifies everything boilerplate.
  * This records what the knob buys when the operator is tuned to the
  * corpus instead of left at the fixture default. */
object Q116Cap {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val docs0 = spark.read.parquet(s"$dir/documents.parquet")
    // replicas permute tokens by a SEEDED hash of (replica, doc, pos,
    // token) — the round-9 unseeded shuffle() made the recorded pair
    // counts wobble 0-50 across runs; this permutation regenerates the
    // BASELINE.md numbers exactly
    val docs10 = (0 until 10).map { i =>
      if (i == 0) docs0
      else docs0.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"),
        expr(s"concat_ws(' ', transform(array_sort(transform(" +
          s"split(text, ' '), (t, p) -> struct(" +
          s"xxhash64($i, doc_id, p, t) AS k, t AS t))), s -> s.t))")
          .as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionByName _).repartition(cpus.toInt)
    def timed(df: => DataFrame): (Double, Long) = {
      val t0 = System.nanoTime(); val n = df.count()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    for (cap <- Seq(10, 110)) {
      val (t, n) = timed(graft.queries.TextOps.winnowedContainment(
        docs10.filter(col("text").isNotNull), dfCap = cap))
      println(f"[q116-cap] 10x dfCap=$cap%-4d $t%8.2f s  ($n pairs)")
    }
    spark.stop()
  }
}
