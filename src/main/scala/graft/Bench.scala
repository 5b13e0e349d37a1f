package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every registry query on
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line.
  *
  * Methodology: a small untimed warm-up first (JIT + codegen + parquet
  * footer caches), then THREE full interleaved passes over the whole
  * registry (pass 1 runs q01..q54, then pass 2, then pass 3). Each
  * query's reported time is the min of its three samples. Interleaving
  * means a transient machine-load window degrades one PASS, not one
  * query's entire sample set — the min per query then comes from a quiet
  * pass, which a back-to-back min-of-N at a loaded moment cannot
  * guarantee. Timing forces FULL materialization via
  * queryExecution.toRdd.count() — a plain DataFrame.count() would let
  * Catalyst prune every projected column and under-report scan/compute
  * cost.
  *
  * Noise accounting (so a reader can tell signal from noise without
  * re-running): the JSON carries `pass_totals` (wall time of each full
  * pass), `spread` (per-query max/min ratio across the three samples),
  * and `noisy` (queries whose spread exceeds 2× — their min is still the
  * best estimate, but cross-round deltas on them are suspect).
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
    val nPasses = 3
    val samples = scala.collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    val passTotals = (0 until nPasses).map { _ =>
      // settle the heap between passes so one pass's garbage doesn't
      // become the next pass's GC pause
      System.gc()
      val p0 = System.nanoTime()
      ordered.foreach { case (name, fn) =>
        once(fn).foreach(dt => samples(name) = dt :: samples(name))
      }
      (System.nanoTime() - p0) / 1e9
    }

    val results = ordered.map { case (name, _) =>
      val s = samples(name)
      name -> (if (s.size == nPasses) s.min else -1.0)
    }
    def jmap(kvs: Seq[(String, String)]): String =
      kvs.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val qs = jmap(results.map { case (k, v) => k -> f"$v%.4f" })
    val spread = jmap(results.collect { case (k, v) if v > 0 =>
      val s = samples(k); k -> f"${s.max / s.min}%.2f"
    })
    val noisy = results.collect {
      case (k, v) if v > 0 && samples(k).max / samples(k).min > 2.0 =>
        "\"" + k + "\""
    }.mkString("[", ",", "]")
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total =
      if (results.nonEmpty) results.map(_._2).filter(_ >= 0).sum else 0.0
    val passes = passTotals.map(t => f"$t%.2f").mkString("[", ",", "]")
    // The FULL per-query line prints FIRST, the SHORT headline LAST.
    // Evidence for this order: BENCH_r08.json's `tail` field shows the
    // driver captures a BOUNDED TAIL of stdout, front-truncated
    // mid-line — a multi-KB 133-query line in last position arrives
    // with its head clipped and fails to parse (the `parsed: null` of
    // rounds 6-8). The ~200-char headline in last position always fits
    // the tail window intact; with run/outputStrategy := StdoutOutput
    // (build.sbt) it also arrives unprefixed. Consumers that want the
    // per-query map read the first {"metric" line of the full output.
    val fullLine =
      s"""{"metric":"total","spread":$spread,"noisy":$noisy,"failed":$failed,"pass_totals":$passes,"unit":"sec","sf":"$sfDir","queries":$qs,"value":$total}"""
    println(fullLine)
    // the driver's stdout tail is front-truncating, so per-query history
    // survived only in BASELINE.md prose through round 9 — persist the
    // full line to a file too, so cross-round per-query regressions are
    // machine-diffable (bench/last_run.json, plus a timestamped copy)
    try {
      val dir = java.nio.file.Paths.get("bench")
      java.nio.file.Files.createDirectories(dir)
      java.nio.file.Files.writeString(dir.resolve("last_run.json"), fullLine + "\n")
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not persist bench/last_run.json: ${e.getMessage}")
    }
    println(s"""{"metric":"total","value":$total,"unit":"sec","sf":"$sfDir","pass_totals":$passes,"n_queries":${results.size},"failed":$failed,"queries":{}}""")
    spark.stop()
  }
}
