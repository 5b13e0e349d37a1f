package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.sql.DataFrame

/** Streaming document-ingest operators: the daily-crawl shape where new
  * documents arrive as a stream and are deduplicated against the static
  * lake corpus (batch q115's streaming twin).
  *
  * Two complementary surfaces:
  *   - [[incrementalDedupSink]] — `foreachBatch` running the EXACT batch
  *     recipe ([[graft.queries.PipelineOps.dedupAgainst]]) per
  *     micro-batch. This is the production shape: each trigger's files
  *     are one "daily batch", the corpus is a static frame, and the
  *     per-batch outputs concatenate to precisely the batch answer no
  *     matter how arrivals are split across triggers (suite-asserted) —
  *     verdicts depend only on (doc, corpus), never on co-arrivals.
  *   - [[exactHitsStreamStatic]] — the same exact-hash arm as a pure
  *     stream-static equi-join in append mode, the no-state fast path
  *     when only the exact verdict is needed end-to-end (Spark plans a
  *     fresh join of each micro-batch against the static side; no
  *     watermark or state store involved).
  *
  * Scale posture: the static corpus side is the big one (the 100 TB
  * lake); each micro-batch is small. In both surfaces the per-trigger
  * work is batch-side-bounded — the foreachBatch body inherits q115's
  * asymmetric join (AQE broadcasts the batch-side counts), and the
  * stream-static join shuffles only the micro-batch against the
  * hash-bucketed corpus.
  */
object DocStreams {

  /** Streaming read of `documents`-shaped parquet files in `dir` (one
    * file per arrival batch, `maxFilesPerTrigger 1` so multi-file
    * directories replay as genuinely separate micro-batches). */
  def readDocs(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    val schema = spark.read.parquet(dir).schema
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(dir)
  }

  /** q115's streaming twin: dedup each arriving micro-batch of docs
    * against the static `corpus`, appending verdicts to batchId-addressed
    * parquet (idempotent under replay, same contract as
    * [[EventStreams.startIdempotentParquetSink]]). */
  def incrementalDedupSink(incoming: DataFrame, corpus: DataFrame,
      outDir: String, checkpointDir: String,
      threshold: Double = 0.5): org.apache.spark.sql.streaming.StreamingQuery =
    incoming.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        graft.queries.PipelineOps.dedupAgainst(batch, corpus, threshold)
          .write.mode("overwrite").parquet(s"$outDir/batch_$batchId")
      }
      .start()

  /** q151's streaming twin: run the FULL incremental curation pipeline
    * per arriving micro-batch — dedup vs the static lake, quality
    * cascade with the LAKE-derived boilerplate hot set, benchmark
    * decontamination, pack APPEND. Offsets continue from the lake's
    * per-source totals PLUS the packs this sink already landed, read
    * back from its own batchId-addressed output (only ids < batchId
    * contribute — a replay of batch N therefore regenerates the SAME
    * offsets, keeping the sink idempotent under the foreachBatch replay
    * contract). Arrival order IS append order: the one-shot batch
    * pipeline equals this twin exactly when micro-batches arrive in
    * doc_id order (the suite's 3-way ordered split) — the production
    * daily cadence, where yesterday's packs never reorder around
    * today's. */
  def incrementalCurationSink(incoming: DataFrame, corpus: DataFrame,
      benchDocs: DataFrame, outDir: String, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    incoming.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        val fs = new org.apache.hadoop.fs.Path(outDir)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val prior = (0L until batchId)
          .map(i => new org.apache.hadoop.fs.Path(s"$outDir/batch_$i"))
          .filter(fs.exists).map(_.toString)
        val priorPacks =
          if (prior.nonEmpty) Some(spark.read.parquet(prior: _*)) else None
        graft.queries.Curation
          .incrementalCuration(batch, corpus, benchDocs, priorPacks)
          .write.mode("overwrite").parquet(s"$outDir/batch_$batchId")
      }
      .start()

  /** q125's streaming twin: score each arriving micro-batch of docs
    * against a STATIC Naive Bayes model (trained once from
    * `trainDocs`, staged so no micro-batch retrains it), appending
    * predictions to batchId-addressed parquet. Per-doc scoring is
    * state-free — `Learn.nbScore` is per-doc independent — so the
    * per-batch outputs concatenate to exactly the batch answer for any
    * arrival split (suite-asserted). The production shape for "classify
    * the crawl as it lands": the model is vocabulary×k bounded and
    * reused across triggers; each trigger costs one token-stream pass
    * over the batch. */
  def nbScoreSink(incoming: DataFrame, trainDocs: DataFrame,
      outDir: String, checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery = {
    val (cc0, classes0) = graft.queries.Learn.nbModel(
      trainDocs.filter(col("text").isNotNull && col("lang").isNotNull))
    // stage the model once: without the barrier the lazy plan would
    // re-run both training aggs inside every micro-batch
    val cc = graft.operators.Stage.materialize(cc0, "nb-model-counts")
    val classes = graft.operators.Stage.materialize(classes0, "nb-model-classes")
    incoming.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        graft.queries.Learn.nbScore(
            batch.filter(col("text").isNotNull && col("lang").isNotNull),
            cc, classes)
          .write.mode("overwrite").parquet(s"$outDir/batch_$batchId")
      }
      .start()
  }

  /** q126's streaming twin: assign each arriving micro-batch of
    * embeddings (an `embeddings`-shaped parquet stream — [[readDocs]]
    * reads any parquet dir, it just sniffs the schema) to its nearest
    * center of a STATIC k-means model fitted once from
    * `trainEmbeddings`. `Learn.kmeansCenters` collects every round, so
    * the model handed to the trigger loop is a driver-local k-row
    * relation — no micro-batch can retrain or even rescan the training
    * corpus. Assignment is the same zero-exchange projection fold as
    * batch q126 ([[graft.queries.CenterAssign]]) and per-vector
    * independent, so per-batch outputs concatenate to exactly the batch
    * assignment for any arrival split (suite-asserted). The production
    * shape for "bucket the crawl's embeddings as they land" — routing
    * new vectors into SemDeDup cells or IVF probe lists. */
  def kmeansAssignSink(incoming: DataFrame, trainEmbeddings: DataFrame,
      outDir: String, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val centers = graft.queries.Learn.kmeansCenters(trainEmbeddings)
    incoming.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        graft.queries.CenterAssign.withNearest(
            batch.filter(col("embedding").isNotNull), centers)
          .select(col("vec_id"), col("cluster"), col("dist_sq"))
          .write.mode("overwrite").parquet(s"$outDir/batch_$batchId")
      }
      .start()
  }

  /** q135's streaming twin: PQ-encode arriving embedding micro-batches
    * against codebooks trained ONCE on the static corpus (the
    * [[kmeansAssignSink]] recipe applied to product quantization — the
    * daily-crawl shape where new vectors are coded into the existing
    * index without retraining). Per-vector codes depend only on the
    * broadcast codebooks, so per-batch outputs concatenate to exactly
    * the whole-corpus q135 answer across any arrival split
    * (suite-asserted in PQuantSpec). */
  def pqEncodeSink(incoming: DataFrame, trainEmbeddings: DataFrame,
      outDir: String, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val books = graft.queries.PQuant.pqCodebooks(trainEmbeddings)
    incoming.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        graft.queries.PQuant.withCodes(
            batch.filter(col("embedding").isNotNull), books)
          .select(col("vec_id"), concat_ws(",",
            expr("transform(codes, c -> CAST(c AS STRING))")).as("codes"))
          .write.mode("overwrite").parquet(s"$outDir/batch_$batchId")
      }
      .start()
  }

  /** Exact-hash hits as a stream-static LEFT equi-join in append mode:
    * every incoming doc emits (doc_id, match_id nullable) rows — one per
    * matching corpus doc, or a single null-match row when the doc is not
    * an exact duplicate (or has null text). Consumers that need ONE row
    * per doc aggregate downstream (the foreachBatch twin does the min()
    * inside the batch recipe instead). */
  def exactHitsStreamStatic(incoming: DataFrame,
      corpus: DataFrame): DataFrame = {
    val corpHash = corpus
      .select(col("doc_id").as("match_id"),
        md5(col("text").cast(BinaryType)).as("h"))
      .filter(col("h").isNotNull)
    incoming
      .select(col("doc_id"), md5(col("text").cast(BinaryType)).as("h"))
      .join(corpHash, Seq("h"), "left")
      .select(col("doc_id"), col("match_id"))
  }

  /** q155's streaming twin: maintain the shard-export MANIFEST as doc
    * batches land. Each trigger aggregates the batch's 16-row manifest
    * delta (shuffles ∝ the batch) and merges it into the latest landed
    * manifest via [[graft.sinks.ShardExport.mergeManifests]], writing
    * `manifest_<batchId>` (overwrite — replay after a crash re-reads
    * `manifest_<batchId-1>` and overwrites, so the sink is idempotent,
    * the q151 batchId-addressing contract). Because every manifest
    * field is a commutative aggregate (sums, least/greatest), the
    * final manifest is EXACTLY the one-shot batch answer for ANY
    * arrival split — not just id-ordered ones (ExportSpec asserts
    * equality on a deliberately interleaved doc_id%3 split, a stronger
    * claim than the order-dependent q151 twin can make). `prior` is
    * the lake's stored manifest (staged once — no trigger rescans the
    * lake). */
  def shardManifestSink(incoming: DataFrame, prior: DataFrame,
      nShards: Int, outDir: String, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val prior0 = graft.operators.Stage.materialize(
      prior, "stream-shard-manifest-prior")
    incoming.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        val fs = new org.apache.hadoop.fs.Path(outDir)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val priorManifest = ((batchId - 1) to 0L by -1).iterator
          .map(i => new org.apache.hadoop.fs.Path(s"$outDir/manifest_$i"))
          .find(fs.exists)
          .map(p => spark.read.parquet(p.toString))
          .getOrElse(prior0)
        val delta = graft.sinks.ShardExport.manifest(
          graft.sinks.ShardExport.withShardKey(batch, "doc_id", nShards))
        graft.sinks.ShardExport.mergeManifests(priorManifest, delta)
          .write.mode("overwrite").parquet(s"$outDir/manifest_$batchId")
      }
      .start()
  }

  /** The q166 versioned lake's STREAMING INGEST arm: each micro-batch
    * COMMITS as version `batchId` of the transaction-logged layout —
    * the structured-streaming-into-a-table-format production shape.
    * Versions are batchId-addressed and both the data subtree and the
    * log rows are overwrite-mode, so a replayed batch converges to the
    * identical layout (exactly-once EFFECT from at-least-once
    * delivery, the foreachBatch idempotency recipe). Every snapshot
    * as-of batch k is exactly the stream's prefix through k —
    * suite-asserted against one-shot manifests on an interleaved
    * split. */
  def versionedLakeSink(incoming: DataFrame, dir: String, nShards: Int,
      checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    incoming.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        graft.sinks.VersionedShards.commitAs(batch.sparkSession, batch,
          "doc_id", dir, nShards, batchId.toInt): Unit
      }
      .start()

  /** q201's STREAMING arm — a CHANGE-DATA-FEED publisher: each
    * micro-batch (1) commits into the versioned lake as version
    * `batchId` (the [[versionedLakeSink]] exactly-once recipe) and
    * (2) publishes that commit's change feed
    * ([[graft.sinks.VersionedShards.readChangeFeed]] — file-pruned to
    * the batch's own files, update pre/post images paired) as
    * `feed_<batchId>` (overwrite mode, so replays converge) — the
    * production bridge that turns a streaming ingest into the
    * incremental diet a downstream consumer (index updater, feature
    * store, audit trail) actually eats. Batch 0's feed is the full
    * batch tagged `insert` (there is no version −1 to diff against). */
  def changeFeedSink(incoming: DataFrame, lakeDir: String, nShards: Int,
      outDir: String, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    incoming.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        graft.sinks.VersionedShards.commitAs(spark, batch, "doc_id",
          lakeDir, nShards, batchId.toInt)
        val feed =
          if (batchId == 0L)
            graft.sinks.VersionedShards.readAsOf(spark, lakeDir, 0)
              .drop("shard", "draw").withColumn("_change_type", lit("insert"))
          else
            graft.sinks.VersionedShards.readChangeFeed(spark, lakeDir,
              batchId.toInt - 1, batchId.toInt, "doc_id").drop("shard", "draw")
        feed.write.mode("overwrite").parquet(s"$outDir/feed_$batchId")
      }
      .start()

  /** q182's STREAMING arm — continuous materialized-view maintenance:
    * each micro-batch (1) COMMITS into the versioned lake as version
    * `batchId` (the [[versionedLakeSink]] exactly-once recipe) and
    * (2) advances the stored per-(lang, source) rollup by folding
    * ONLY that commit's CDC rows
    * ([[graft.sinks.VersionedShards.readChanges]] — file-pruned to the
    * batch's own files) into the prior view via the same
    * `Export.mvApply` retract/apply fold the batch registry query
    * gates. The view is batchId-addressed (`mv_<b>`, overwrite mode)
    * and its input state is the PREVIOUS batch's landed view, so a
    * replayed micro-batch re-derives the identical view from identical
    * inputs — exactly-once effect from at-least-once delivery, with no
    * trigger ever rescanning the lake (the q151/q155 incremental
    * discipline applied to a grouped aggregate WITH retractions).
    * ExportSpec asserts every mv_k equals the full recompute of its
    * arrival prefix on an interleaved split. */
  def incrementalMvSink(incoming: DataFrame, lakeDir: String,
      nShards: Int, outDir: String, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    incoming.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        graft.sinks.VersionedShards.commitAs(spark, batch, "doc_id",
          lakeDir, nShards, batchId.toInt)
        val fs = new org.apache.hadoop.fs.Path(outDir)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        // the fold's input state MUST be exactly the previous batch's
        // view: folding onto any OLDER mv_k would silently skip the
        // intermediate deltas — fail loudly instead (outDir/checkpoint
        // mismatch or manual cleanup)
        val prior =
          if (batchId == 0L) graft.queries.Export.groupedMv(batch.limit(0))
          else {
            val p = new org.apache.hadoop.fs.Path(s"$outDir/mv_${batchId - 1}")
            require(fs.exists(p), s"incrementalMvSink: prior view " +
              s"mv_${batchId - 1} missing under $outDir — refusing to fold " +
              s"batch $batchId onto a stale view")
            spark.read.parquet(p.toString)
          }
        val changes = graft.sinks.VersionedShards.readChanges(spark,
          lakeDir, batchId.toInt - 1, batchId.toInt, "doc_id")
        graft.queries.Export.mvApply(prior, changes)
          .write.mode("overwrite").parquet(s"$outDir/mv_$batchId")
      }
      .start()
}
