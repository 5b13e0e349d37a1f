package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic training-shard EXPORT — the last mile of the curation
  * story (reference scope: the training-data serving shape downstream
  * of `dags/wine_etl_kaggle.py:167-202`'s sink stage, re-expressed for
  * an LLM-corpus pipeline): a reproducible global shuffle of the
  * corpus into `nShards` shards, landed as one parquet directory per
  * shard with rows in a deterministic pseudo-random order, plus a
  * per-shard MANIFEST (counts, token/char sums, an order-insensitive
  * content checksum, min/max shuffle key) that certifies the landed
  * bytes without re-reading the source.
  *
  * Why md5 draws and not `repartition(n).orderBy(rand)`: every
  * assignment and every within-shard position is a PURE FUNCTION of
  * row identity — re-running the export on the same snapshot lands
  * byte-identical shards on any cluster size (no partition-count or
  * task-scheduling dependence), an interrupted export is resumable
  * per-shard, and the DuckDB oracle can replay the exact assignment
  * (`CORRECTNESS` hash gate on the manifest). This is the q50/q83
  * md5-draw recipe applied to layout.
  *
  * Scale shape: ONE shuffle (hash-repartition on the shard id) + a
  * write-sort on (shard, draw); the manifest is one map-side-combined
  * hash agg over the landed scan with a pure per-row checksum
  * expression — no window, no driver loop. At 100 TB you raise
  * `nShards` to the loader's world size × k and set
  * `maxRecordsPerFile` so each shard streams in bounded files; the
  * draw keys make any contiguous file range a uniform random sample
  * of the corpus, so partial epochs are unbiased by construction. */
object ShardExport {

  /** The shuffle key: md5 over a salted row key — uniform in [0,16^32),
    * reproducible in both engines (hex strings compare identically). */
  def drawOf(key: Column): Column =
    md5(concat(lit("shard|"), key.cast("string")))

  /** Shard id in [0, nShards): the draw's first 4 hex digits mod
    * nShards (65536 cells — uniform for any nShards ≤ ~6k; registry
    * uses 16). DuckDB replays it via the strpos hex-digit recipe
    * ([[shardSqlExpr]]). */
  def shardOf(draw: Column, nShards: Int): Column =
    (conv(substring(draw, 1, 4), 16, 10).cast("long") % nShards)
      .cast("int")

  /** The DuckDB spelling of [[shardOf]] over a draw expression `d`:
    * Σ digit·16^(4-p) over the first 4 hex digits, mod nShards. */
  def shardSqlExpr(d: String, nShards: Int): String =
    s"""CAST(list_sum(list_transform(generate_series(1, 4),
        p -> (strpos('0123456789abcdef', substr($d, CAST(p AS INTEGER), 1)) - 1)
             * (CAST(1 AS BIGINT) << CAST(4 * (4 - p) AS INTEGER))))
        % $nShards AS INTEGER)"""

  /** Order-insensitive per-row content checksum: the first 8 hex
    * digits of md5("key|text") as a BIGINT (< 2^32 — a shard-level SUM
    * of these stays well inside BIGINT for any real shard size).
    * Identical spelling available to DuckDB via [[checksumSqlExpr]]. */
  def checksumOf(key: Column, text: Column): Column =
    conv(substring(
      md5(concat(key.cast("string"), lit("|"), coalesce(text, lit("")))),
      1, 8), 16, 10).cast("long")

  /** The DuckDB spelling of [[checksumOf]] over key/text expressions. */
  def checksumSqlExpr(key: String, text: String): String =
    s"""CAST(list_sum(list_transform(generate_series(1, 8),
        p -> CAST(strpos('0123456789abcdef',
               substr(md5(CAST($key AS VARCHAR) || '|' || COALESCE($text, '')),
                 CAST(p AS INTEGER), 1)) - 1 AS BIGINT)
             * (CAST(1 AS BIGINT) << CAST(4 * (8 - p) AS INTEGER))))
        AS BIGINT)"""

  /** `df` plus its shuffle key (`draw`) and shard assignment
    * (`shard`) — the shared front half of write, append, and delta
    * manifesting. */
  def withShardKey(df: DataFrame, keyCol: String, nShards: Int): DataFrame = {
    val keyed = df.withColumn("draw", drawOf(col(keyCol)))
    keyed.withColumn("shard", shardOf(col("draw"), nShards))
  }

  /** Land `df` as `nShards` shard directories under `outDir`
    * (`shard=<k>/part-*.parquet`), each file internally ordered by the
    * draw key. One shuffle; the write-sort makes every file a sorted
    * run so a loader streaming a shard sees the deterministic order
    * without its own sort. `maxRecordsPerFile` bounds file size at
    * scale (0 = Spark default). */
  /** EMPTY-input guard shared by every landing path: a dynamic-
    * partition write of zero rows emits no files at all (an unreadable
    * schema-less directory), so an empty overwrite lands one plain
    * schema-bearing empty parquet file (shard stays as a data column —
    * readers and manifests see the schema, aggregate to zero rows) and
    * an empty append is a no-op (a root-level file would break
    * partition discovery on the existing layout). Returns true when
    * the empty case was handled. */
  private def landedEmpty(keyed: DataFrame, outDir: String,
      mode: String): Boolean = {
    if (!keyed.isEmpty) return false
    if (mode != "append")
      keyed.coalesce(1).write.mode(mode).parquet(outDir)
    true
  }

  /** Remove a root-level empty marker (the schema-bearing file a
    * zero-row overwrite lands) before appending partition dirs: parquet
    * partition discovery rejects leaf files at two depths, so an
    * empty-day-0 layout followed by a non-empty append would otherwise
    * become unreadable. */
  private def dropEmptyMarker(spark: org.apache.spark.sql.SparkSession,
      outDir: String): Unit = {
    val root = new org.apache.hadoop.fs.Path(outDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(root))
      fs.listStatus(root).toSeq
        .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
        .foreach(f => fs.delete(f.getPath, false): Unit)
  }

  def writeShards(df: DataFrame, keyCol: String, outDir: String,
      nShards: Int, maxRecordsPerFile: Long = 0L,
      mode: String = "overwrite"): Unit = {
    val keyed = withShardKey(df, keyCol, nShards)
    if (landedEmpty(keyed, outDir, mode)) return
    if (mode == "append") dropEmptyMarker(df.sparkSession, outDir)
    val w = keyed
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("draw"))
      .write.mode(mode)
    (if (maxRecordsPerFile > 0L)
       w.option("maxRecordsPerFile", maxRecordsPerFile.toString)
     else w)
      .partitionBy("shard")
      .parquet(outDir)
  }

  /** APPEND a new batch into an existing shard layout: same pure-
    * function assignment, new files dropped into the existing
    * `shard=<k>/` directories (each new file again a sorted run —
    * per-shard data stays a small set of sorted runs a loader merges
    * or streams). Daily-ingest maintenance writes ∝ the batch; the
    * lake's landed files are never rewritten. */
  def appendShards(batch: DataFrame, keyCol: String, outDir: String,
      nShards: Int, maxRecordsPerFile: Long = 0L): Unit =
    writeShards(batch, keyCol, outDir, nShards, maxRecordsPerFile,
      mode = "append")

  /** The per-shard MANIFEST of a (landed or virtual) sharded frame
    * carrying `shard`, `draw`, `keyCol`, `textCol`, and `n_chars`:
    * doc/token/char counts, the order-insensitive content checksum,
    * and the draw range. Every field is a decomposable aggregate
    * (sum/count/min/max) — the property [[mergeManifests]] exploits
    * for exact incremental maintenance. */
  def manifest(sharded: DataFrame, keyCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    sharded.groupBy(col("shard").cast("int").as("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col(textCol).isNull, lit(0))
          .otherwise(size(split(col(textCol), " ")))).as("n_toks"),
        sum(col("n_chars")).as("sum_chars"),
        sum(checksumOf(col(keyCol), col(textCol))).as("checksum"),
        min(col("draw")).as("min_key"),
        max(col("draw")).as("max_key"))

  /** Exact incremental manifest maintenance: the updated manifest of
    * (lake ∪ batch) from the lake's STORED manifest plus the batch's
    * delta — no lake rescan, shuffles ∝ the batch, a 16-row
    * full-outer merge. Sound because every manifest field is
    * decomposable: counts/sums add, ranges combine by least/greatest;
    * the md5-prefix checksum is a SUM, so it commutes with any
    * arrival order or batch split. */
  def mergeManifests(prior: DataFrame, delta: DataFrame): DataFrame = {
    val p = prior.columns.filter(_ != "shard")
      .foldLeft(prior)((d, c) => d.withColumnRenamed(c, s"p_$c"))
    val d = delta.columns.filter(_ != "shard")
      .foldLeft(delta)((df, c) => df.withColumnRenamed(c, s"d_$c"))
    def add(c: String) =
      (coalesce(col(s"p_$c"), lit(0L)) + coalesce(col(s"d_$c"), lit(0L)))
        .as(c)
    p.join(d, Seq("shard"), "full_outer")
      .select(col("shard"),
        add("n_docs"), add("n_toks"), add("sum_chars"), add("checksum"),
        // Spark's least/greatest skip nulls, so a shard present on
        // only one side keeps that side's range
        least(col("p_min_key"), col("d_min_key")).as("min_key"),
        greatest(col("p_max_key"), col("d_max_key")).as("max_key"))
  }

  /** The per-shard sorted-RUN counts of a landed layout: one bounded
    * root listing (nShards dirs) + one listing per shard dir — the
    * driver-side planning input selective compaction reads (at 100 TB
    * this is the table a compaction scheduler keeps, never the data). */
  def runCounts(spark: org.apache.spark.sql.SparkSession,
      dir: String): Map[Int, Int] = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Map.empty
    fs.listStatus(root).toSeq
      .filter(d => d.isDirectory && d.getPath.getName.startsWith("shard="))
      .map { d =>
        val k = d.getPath.getName.stripPrefix("shard=").toInt
        val files = fs.listStatus(d.getPath).count(f =>
          f.isFile && f.getPath.getName.endsWith(".parquet"))
        k -> files
      }.toMap
  }

  /** SELECTIVE in-place COMPACTION — the LSM maintenance step the
    * append path (q155) makes necessary: each [[appendShards]] drops
    * one more sorted run into every touched shard dir, so a loader's
    * per-shard stream degrades from "read one run" to "k-way-merge k
    * runs" as days accumulate. Compaction rewrites each shard whose
    * run count exceeds `maxRuns` as ONE file fully ordered by the draw
    * key, and leaves every other shard's bytes untouched.
    *
    * Scale shape: the compaction SET is chosen from [[runCounts]]'s
    * bounded listing (driver-side, nShards rows — the scheduler's
    * table); ONE job then reads ONLY the selected shard dirs and
    * exchanges ONLY their rows (shuffle ∝ the compacted subset, never
    * the lake — the same ∝-the-touched-set posture as q124/q155), with
    * a write-sort restoring the single-run order.
    *
    * Crash contract (round-12 ADVICE — the old shape was
    * delete-then-rename, and a crash in the gap lost the shard): each
    * shard swap is rename-aside → rename-in → delete-aside, so EVERY
    * point in time keeps the shard's rows in exactly one of
    * `shard=k` / `_old_shard=k` (both renames are single directory
    * moves; the `_`-prefixed aside dir is invisible to partition
    * discovery). PER-SHARD the swap is atomic; the SET is not — a
    * crash mid-loop leaves already-swapped shards compacted and the
    * rest untouched, and the next [[compactShards]] call first
    * [[recoverLayout]]s any interrupted swap (roll the aside back when
    * `shard=k` is missing, drop it when the swap had completed). The
    * compacted bytes are written to a [[graft.operators.Stage]]-managed
    * scratch dir (shutdown-reaped; never the only copy of anything),
    * not a sibling of the layout. Returns the compacted shard ids. */
  def compactShards(spark: org.apache.spark.sql.SparkSession,
      dir: String, maxRuns: Int = 1): Seq[Int] = {
    recoverLayout(spark, dir)
    val toCompact = runCounts(spark, dir)
      .filter(_._2 > maxRuns).keys.toSeq.sorted
    if (toCompact.isEmpty) return Nil
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(
      graft.operators.Stage.allocDir(spark, "shard-compact"))
    spark.read.option("basePath", dir)
      .parquet(toCompact.map(k => s"$dir/shard=$k"): _*)
      .repartition(toCompact.length, col("shard"))
      .sortWithinPartitions(col("shard"), col("draw"))
      .write.mode("overwrite")
      .partitionBy("shard")
      .parquet(tmp.toString)
    toCompact.foreach { k =>
      val dst = new org.apache.hadoop.fs.Path(root, s"shard=$k")
      val aside = new org.apache.hadoop.fs.Path(root, s"_old_shard=$k")
      require(fs.rename(dst, aside),
        s"compaction aside-rename failed for shard=$k")
      require(fs.rename(new org.apache.hadoop.fs.Path(tmp, s"shard=$k"), dst),
        s"compaction swap failed for shard=$k")
      fs.delete(aside, true): Unit
    }
    graft.operators.Stage.dropDir(spark, tmp.toString)
    toCompact
  }

  /** Finish or roll back an interrupted [[compactShards]] swap: an
    * `_old_shard=k` aside dir with `shard=k` present means the swap
    * completed and only the aside-delete was lost — drop it; without
    * `shard=k` the crash hit between the two renames — roll the aside
    * back. Idempotent; called automatically by [[compactShards]], and
    * public for readers that want the guarantee before planning. */
  def recoverLayout(spark: org.apache.spark.sql.SparkSession,
      dir: String): Unit = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return
    fs.listStatus(root).toSeq
      .filter(d => d.isDirectory && d.getPath.getName.startsWith("_old_shard="))
      .foreach { aside =>
        val k = aside.getPath.getName.stripPrefix("_old_shard=")
        val dst = new org.apache.hadoop.fs.Path(root, s"shard=$k")
        if (fs.exists(dst)) fs.delete(aside.getPath, true): Unit
        else require(fs.rename(aside.getPath, dst),
          s"compaction recovery rename failed for shard=$k")
      }
  }

  /** SPLIT a landed layout from `nShardsOld` to `factor ×` as many
    * shards with NO global shuffle: the assignment is the draw's first
    * 4 hex digits mod nShards, and mod classes NEST — v mod 32
    * determines v mod 16, so every doc of old shard r lands in exactly
    * r or r + nShardsOld·i. The split is therefore per-input-file
    * LOCAL: each task re-keys its own rows and the partitioned write
    * fans them into the child dirs — no Exchange in the plan
    * (suite-asserted). At 100 TB this is resharding a serving layout
    * without a cluster-wide shuffle: touch every byte once, move
    * nothing between executors. Child manifests PAIR-SUM to the
    * parent's (suite-asserted) — consumers can verify a split from
    * manifests alone.
    *
    * The task-local `sortWithinPartitions` keeps every OUTPUT file a
    * single sorted run even over a post-append multi-run parent:
    * Spark's small-file packing can place two sorted runs of one
    * parent shard in the same read split, and "filtering a sorted run
    * preserves order" only covers the single-run case (round-12
    * ADVICE). The sort is per-task over bytes the task already holds
    * (no Exchange — the plan assert still proves zero data movement);
    * on a single-run parent it is a near-no-op pass over
    * already-ordered rows. */
  def splitShards(spark: org.apache.spark.sql.SparkSession,
      inDir: String, outDir: String, nShardsOld: Int,
      factor: Int = 2): Unit = {
    val rekeyed = spark.read.parquet(inDir)
      .withColumn("shard", shardOf(col("draw"), nShardsOld * factor))
    if (landedEmpty(rekeyed, outDir, "overwrite")) return
    // deliberately NO repartition: the re-key is per-file local
    // (mod-nesting) and the partitioned write fans each task's rows
    // into its child dirs without an Exchange
    rekeyed
      .sortWithinPartitions(col("shard"), col("draw"))
      .write.mode("overwrite")
      .partitionBy("shard")
      .parquet(outDir)
  }
}
