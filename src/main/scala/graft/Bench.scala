package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every registry query on
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line.
  *
  * Methodology: ONE full UNTIMED warm-up pass over the whole registry
  * first — it pays every one-time cost (JIT + codegen + parquet footer
  * caches + every session-amortized artifact build: IVF/PQ indexes,
  * dedup labels, graph bases, the z-layout), and its wall time is
  * reported as `warmup_total`, the build-cost record. Then THREE full
  * interleaved timed passes (pass 1 runs q01..qN, then pass 2, then
  * pass 3), all WARM — so per-query spreads measure machine noise, not
  * build-on-first-touch artifacts (round-11 verdict item 3: amortized
  * builds made pass-1 spreads hit 500× and drowned the 2×-gate
  * signal). Each query's reported time is the min of its three warm
  * samples. Interleaving means a transient machine-load window
  * degrades one PASS, not one query's entire sample set. Timing forces
  * FULL materialization via queryExecution.toRdd.count() — a plain
  * DataFrame.count() would let Catalyst prune every projected column
  * and under-report scan/compute cost.
  *
  * Noise accounting (so a reader can tell signal from noise without
  * re-running): the JSON carries `warmup_total`, `pass_totals` (wall
  * time of each timed pass), `spread` (per-query max/min ratio across
  * the three samples), and `noisy` (queries whose spread exceeds 2× —
  * their min is still the best estimate, but cross-round deltas on
  * them are suspect).
  *
  * Gate accounting: `bench/baseline_queries.json` (committed — the
  * prior round's recorded per-query numbers at the same SF) yields a
  * per-query `gate_ratio` (current min / recorded baseline) and a
  * `gate_breaches` list (ratio > 2) — the 2×-vs-BASELINE contract as
  * machine-readable output instead of narrated prose. Queries new
  * since the baseline carry no ratio.
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

    val ordered0 = SparkEntry.queries.toSeq.sortBy(_._1)

    // DRIFT CANARY (round 15): one FROZEN, registry-independent probe
    // — a plain lineitem scan+agg defined inline here so no future
    // round's query edits can touch it — measured at the head of every
    // timed pass. Identical code measured 149.5–202.6 s across the
    // round-14 close window (BASELINE.md), so raw cross-round ratios
    // can hide a real 1.5x regression behind "drift": the canary gives
    // each run a machine-speed yardstick, and `gate_ratio_norm` =
    // raw ratio ÷ (this run's canary / baseline's canary) divides the
    // window's drift out.
    def canaryOnce(): Double = {
      import org.apache.spark.sql.functions.{sum, avg, count, lit}
      val t0 = System.nanoTime()
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(sum("l_quantity"), avg("l_extendedprice"), count(lit(1)))
        .queryExecution.toRdd.count(): Unit
      spark.catalog.clearCache()
      (System.nanoTime() - t0) / 1e9
    }
    // FULL untimed warm-up pass: pays JIT/codegen/footer caches AND
    // every session-amortized artifact build exactly once, so the three
    // timed passes below are all warm. Its wall time is the round's
    // build-cost record (`warmup_total`).
    val w0 = System.nanoTime()
    canaryOnce(): Unit // pay the canary's JIT inside the warm-up too
    ordered0.foreach { case (_, fn) =>
      try { fn(spark, sfDir).queryExecution.toRdd.count(): Unit }
      catch { case _: Throwable => () }
      spark.catalog.clearCache()
    }
    val warmupTotal = (System.nanoTime() - w0) / 1e9

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

    val ordered = ordered0
    val nPasses = 3
    val samples = scala.collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    val canaries = scala.collection.mutable.ListBuffer[Double]()
    val passTotals = (0 until nPasses).map { _ =>
      // settle the heap between passes so one pass's garbage doesn't
      // become the next pass's GC pause
      System.gc()
      canaries += canaryOnce() // machine-speed yardstick, per pass
      val p0 = System.nanoTime()
      ordered.foreach { case (name, fn) =>
        once(fn).foreach(dt => samples(name) = dt :: samples(name))
      }
      (System.nanoTime() - p0) / 1e9
    }
    val canaryMin = canaries.min

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
    // 2×-gate vs the committed prior-round per-query baseline: parse
    // bench/baseline_queries.json (our own fixed format) with a plain
    // "name": number scan — no JSON library in the unmanaged classpath
    val baseline: Map[String, Double] = try {
      val txt = java.nio.file.Files
        .readString(java.nio.file.Paths.get("bench/baseline_queries.json"))
      // ratios are only meaningful at the baseline's own scale factor —
      // a cross-SF comparison would flag every cheap-probe query. The
      // recorded sf may be a bare number ("0.1") or a full sfDir path
      // ("/root/testdata/sf0.1") — compare by the sfN.N path segment.
      // (Round-12 fix: the original bare-number regex never matched the
      // committed path form, silently emptying every gate_ratio map.)
      val baseSf = """"sf"\s*:\s*"?([^",}\s]+)"?""".r
        .findFirstMatchIn(txt).map(_.group(1))
      def sfTag(p: String): String =
        p.split('/').filter(_.nonEmpty).lastOption.getOrElse(p)
      if (baseSf.exists(s =>
          sfTag(sfDir) == sfTag(s) || sfTag(sfDir) == s"sf$s"))
        """"(q[0-9][^"]*)"\s*:\s*([0-9.eE+-]+)""".r
          .findAllMatchIn(txt).map(m => m.group(1) -> m.group(2).toDouble)
          .toMap
      else Map.empty
    } catch { case _: Throwable => Map.empty }
    val gateRatio = jmap(results.collect {
      case (k, v) if v > 0 && baseline.get(k).exists(_ > 0) =>
        k -> f"${v / baseline(k)}%.2f"
    })
    // drift factor: this run's canary vs the baseline's recorded
    // canary (absent in pre-round-15 baselines -> 1.0, norm == raw)
    val baseCanary = try {
      val txt = java.nio.file.Files
        .readString(java.nio.file.Paths.get("bench/baseline_queries.json"))
      """"canary_min"\s*:\s*([0-9.eE+-]+)""".r
        .findFirstMatchIn(txt).map(_.group(1).toDouble)
    } catch { case _: Throwable => None }
    val drift = baseCanary.filter(_ > 0).map(canaryMin / _).getOrElse(1.0)
    val gateRatioNorm = jmap(results.collect {
      case (k, v) if v > 0 && baseline.get(k).exists(_ > 0) =>
        k -> f"${v / baseline(k) / drift}%.2f"
    })
    // the drift-proof breach list: normalized ratio > 2 AND real
    // absolute growth — a degraded window inflates raw ratios (false
    // alarms the 0.2 s floor absorbs) but can never MASK a true
    // regression here, because masking requires drift > 1 which
    // DEFLATES nothing on the normalized axis
    val gateBreachesNorm = results.collect {
      case (k, v) if v > 0 && baseline.get(k).exists(b =>
          b > 0 && v / b / drift > 2.0 && v - b > 0.2) =>
        "\"" + k + "\""
    }.mkString("[", ",", "]")
    // a breach is a RATIO violation that is also a real absolute
    // regression: session-amortized probes have 10-20 ms baselines, so
    // a pure-ratio gate flags 30 ms of scheduler noise as 3x (the
    // first live gate_ratio run did exactly that for q49/q117/q128/
    // q130). 0.2 s of absolute growth is where a delta stops being
    // noise on this box (the recorded per-query spread floor).
    val gateBreaches = results.collect {
      case (k, v) if v > 0 && baseline.get(k).exists(b =>
          b > 0 && v / b > 2.0 && v - b > 0.2) =>
        "\"" + k + "\""
    }.mkString("[", ",", "]")
    // The FULL per-query line prints FIRST, the SHORT headline LAST.
    // Evidence for this order: BENCH_r08.json's `tail` field shows the
    // driver captures a BOUNDED TAIL of stdout, front-truncated
    // mid-line — a multi-KB 133-query line in last position arrives
    // with its head clipped and fails to parse (the `parsed: null` of
    // rounds 6-8). The ~200-char headline in last position always fits
    // the tail window intact; with run/outputStrategy := StdoutOutput
    // (build.sbt) it also arrives unprefixed. Consumers that want the
    // per-query map read the first {"metric" line of the full output.
    val canaryArr = canaries.map(c => f"$c%.3f").mkString("[", ",", "]")
    val fullLine =
      s"""{"metric":"total","spread":$spread,"noisy":$noisy,"failed":$failed,"gate_ratio":$gateRatio,"gate_ratio_norm":$gateRatioNorm,"gate_breaches":$gateBreaches,"gate_breaches_norm":$gateBreachesNorm,"canary":$canaryArr,"canary_min":${f"$canaryMin%.3f"},"drift":${f"$drift%.3f"},"warmup_total":${f"$warmupTotal%.2f"},"pass_totals":$passes,"unit":"sec","sf":"$sfDir","queries":$qs,"value":$total}"""
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
    println(s"""{"metric":"total","value":$total,"unit":"sec","sf":"$sfDir","warmup_total":${f"$warmupTotal%.2f"},"pass_totals":$passes,"canary_min":${f"$canaryMin%.3f"},"drift":${f"$drift%.3f"},"n_queries":${results.size},"failed":$failed,"gate_breaches":$gateBreaches,"gate_breaches_norm":$gateBreachesNorm,"queries":{}}""")
    spark.stop()
  }
}
