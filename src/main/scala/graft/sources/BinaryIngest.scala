package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Raw media-file ingestion: a directory of opaque files (images,
  * audio, shards) read through Spark's `binaryFile` source into the
  * `(doc_id, payload)` shape every multimodal operator in
  * [[graft.ext.Multimodal]] consumes (reference ingests its raw inputs
  * as staged files, `dags/wine_etl_kaggle.py:57-69`; this is the
  * binary-side equivalent).
  *
  * Scale posture: `binaryFile` assigns one partition per file up to
  * `spark.sql.files.maxPartitionBytes` packing — a 100 TB media corpus
  * reads in parallel across executors with no driver-side listing
  * bottleneck beyond the initial file index, and `pathGlobFilter`
  * prunes at the listing (files never opened). The doc id is the first
  * 15 hex chars (60 bits, so it always fits a signed BIGINT) of
  * md5(path relative to the ingest root) — stable across re-ingestion,
  * cluster layout, listing order, AND corpus relocation (moving the
  * root directory leaves every id unchanged), never an ingestion-order
  * rowid (which would reshuffle on every re-run).
  */
object BinaryIngest {

  /** Read `dir` (non-recursive unless glob says otherwise) into
    * (doc_id, path, n_bytes, mtime, payload). */
  def readDir(spark: SparkSession, dir: String,
      glob: String = "*"): DataFrame = {
    // Canonical root, resolved through the HADOOP filesystem (not
    // java.io.File, which mangles s3a://… URIs into <cwd>/s3a:/…):
    // ids hash the path AFTER this prefix. The strip is anchored at
    // the FIRST occurrence — a last-occurrence split would collide
    // /data/x/data/y with /data/y when the root string reoccurs
    // deeper in the tree. A path that somehow doesn't contain the
    // root falls back to hashing the full path (still deterministic,
    // just not relocation-stable) rather than mis-stripping.
    val hRoot = new org.apache.hadoop.fs.Path(dir)
    val fs = hRoot.getFileSystem(spark.sessionState.newHadoopConf())
    val rootPath = fs.makeQualified(hRoot).toUri.getPath
      .stripSuffix("/") + "/"
    val loc = locate(rootPath, col("path"))
    val rel = when(loc > 0,
        col("path").substr(loc + lit(rootPath.length), lit(Int.MaxValue)))
      .otherwise(col("path"))
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(
        // 60 bits keeps ids non-negative and engine-portable
        conv(substring(md5(rel), 1, 15), 16, 10).cast("long")
          .as("doc_id"),
        col("path"),
        col("length").as("n_bytes"),
        col("modificationTime").as("mtime"),
        col("content").as("payload"))
  }

  /** Ingest + decode in one pass: the q34 feature router over a raw
    * file directory. */
  def features(spark: SparkSession, dir: String,
      glob: String = "*"): DataFrame = {
    import spark.implicits._
    readDir(spark, dir, glob)
      .select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        graft.ext.Multimodal.decode(id, bytes)
      })
      .toDF()
  }
}
