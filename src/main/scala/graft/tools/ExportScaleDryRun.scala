package graft.tools

import org.apache.spark.sql.functions._
import graft.sinks.ShardExport

/** Scale evidence for the round-12 export family (q153/q155/q158),
  * the MiningScaleDryRun recipe: id-shifted replicas grow the corpus
  * ×10 while the per-doc structure is preserved, and each leg names
  * its governing bound. Results go to BASELINE.md (round-12).
  *
  *   - q153 export write: ONE shuffle + write-sort → expect ~linear.
  *   - q155 incremental manifest: the once-per-snapshot lake-manifest
  *     build is a single scan+agg (linear in lake), while the
  *     PER-BATCH cost (delta agg over a FIXED batch + 16-row merge)
  *     must stay FLAT as the lake grows ×10 — the claim that daily
  *     maintenance shuffles ∝ batch, measured.
  *   - q158 split: per-file local re-key, no Exchange → ~linear scan.
  */
object ExportScaleDryRun {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("lang"),
        col("n_chars"), col("text"))
    def replicate(n: Int) = (0 until n).map(i =>
      docs.select((col("doc_id") + lit(i * 1000000000L)).as("doc_id"),
        col("source"), col("lang"), col("n_chars"), col("text")))
      .reduce(_ unionAll _)
    def tmp(tag: String) =
      java.nio.file.Files.createTempDirectory(s"exdry-$tag").toString
    def timed[T](f: => T): Double = {
      val t0 = System.nanoTime; f; (System.nanoTime - t0) / 1e9
    }

    // untimed warm-up: the first Spark actions of a session pay JIT +
    // codegen + scheduler warm-up that would otherwise land on the 1x
    // leg and invert the ratios (first run of this tool did exactly
    // that: 1x "slower" than 10x)
    ShardExport.writeShards(docs, "doc_id", tmp("warm"), 16)

    // --- q153 export write, 1x vs 10x vs 50x (the fixture is small
    // enough that 10x is still overhead-dominated on 32 cores) ---
    val layouts = Seq(1, 10, 50).map { n =>
      val out = tmp(s"w$n")
      val t = timed(ShardExport.writeShards(replicate(n), "doc_id", out, 16))
      println(f"q153 writeShards ${n}x: $t%.2f s")
      n -> out
    }.toMap

    // --- q155: once-per-snapshot lake manifest (linear) vs the
    //     per-batch delta+merge (must be FLAT in lake size) ---
    val batch = docs.filter(col("doc_id") % 10 === 7)
    Seq(1, 10, 50).foreach { n =>
      val mDf = ShardExport.manifest(spark.read.parquet(layouts(n)))
      var rows: Seq[org.apache.spark.sql.Row] = Seq.empty
      val mT = timed { rows = mDf.collect().toSeq }
      // stored manifest: a driver-pinned 16-row frame (the production
      // shape — the lake contributes ONLY this table to the batch
      // path), reusing the rows the timed collect already fetched
      val stored = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), mDf.schema)
      val bT = timed {
        ShardExport.mergeManifests(stored,
          ShardExport.manifest(
            ShardExport.withShardKey(batch, "doc_id", 16))).collect()
      }
      println(f"q155 ${n}x-lake: snapshot-manifest build $mT%.2f s " +
        f"(linear, one scan+agg); per-batch delta+merge $bT%.2f s " +
        "(must be ~flat)")
    }

    // --- q158 split, 1x vs 10x vs 50x ---
    Seq(1, 10, 50).foreach { n =>
      val out = tmp(s"s$n")
      val t = timed(ShardExport.splitShards(spark, layouts(n), out, 16))
      println(f"q158 splitShards ${n}x: $t%.2f s")
    }

    // --- q163 compaction: SELECTIVE wall must track the selected
    //     shards' bytes (≈ selected/16 of the full rewrite), never the
    //     batch that triggered it and never the whole lake ---
    Seq(1, 10, 50).foreach { n =>
      val out = tmp(s"c$n")
      val all = replicate(n)
      ShardExport.writeShards(all.filter(col("doc_id") % 10 =!= 7),
        "doc_id", out, 16)
      ShardExport.appendShards(all.filter(col("doc_id") % 10 === 7),
        "doc_id", out, 16)
      // a FEW absolute doc ids → a second run lands in only a few
      // shards, making them (and only them) exceed maxRuns = 2
      ShardExport.appendShards(docs.filter(col("doc_id") < 6),
        "doc_id", out, 16)
      val t0 = System.nanoTime
      val sel = ShardExport.compactShards(spark, out, maxRuns = 2)
      val tSel = (System.nanoTime - t0) / 1e9
      val t1 = System.nanoTime
      val full = ShardExport.compactShards(spark, out, maxRuns = 1)
      val tFull = (System.nanoTime - t1) / 1e9
      println(f"q163 compact ${n}x: selective ${sel.length}/16 shards " +
        f"$tSel%.2f s vs remaining-${full.length}-shard full pass " +
        f"$tFull%.2f s (expect ≈ ${sel.length}/16 of the full-rewrite wall)")
    }
    spark.stop()
  }
}
