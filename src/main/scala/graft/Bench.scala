package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every registry query on
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line.
  *
  * Methodology: a small untimed warm-up first (JIT + codegen + parquet
  * footer caches), then each query timed once. Timing forces FULL
  * materialization via queryExecution.toRdd.count() — a plain
  * DataFrame.count() would let Catalyst prune every projected column and
  * under-report scan/compute cost.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warm-up: exercise scan + shuffle + codegen paths once, untimed
    try {
      SparkEntry.queries.get("q04_agg_tpch_q1")
        .foreach(f => f(spark, sfDir).queryExecution.toRdd.count())
      SparkEntry.queries.get("q25_similarity_topk")
        .foreach(f => f(spark, sfDir).queryExecution.toRdd.count())
    } catch { case _: Throwable => () }

    // two timed passes per query, report the min — local[32] run-to-run
    // noise (GC, thread scheduling) is ±30% on sub-second queries and the
    // min is the stable estimator of the plan's actual cost
    // a failed run must surface as -1 in the JSON, never as a (fast)
    // wall-time that makes a broken query look well-optimized
    def once(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Option[Double] = {
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).queryExecution.toRdd.count(); true }
      catch { case e: Throwable =>
        System.err.println(s"[bench] query failed: ${e.getMessage}"); false
      }
      val dt = (System.nanoTime() - t0) / 1e9
      // queries that persist sketches (minhash/simhash) must not leak
      // cached blocks into later queries' memory or timings
      spark.catalog.clearCache()
      if (ok) Some(dt) else None
    }
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    val results = ordered.map { case (name, fn) =>
      name -> (for (a <- once(fn); b <- once(fn)) yield math.min(a, b))
        .getOrElse(-1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total =
      if (results.nonEmpty) results.map(_._2).filter(_ >= 0).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
