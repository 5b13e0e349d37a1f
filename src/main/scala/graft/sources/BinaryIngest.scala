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
  * 8 bytes of md5(relative path) — stable across re-ingestion, cluster
  * layout, and listing order, never an ingestion-order rowid (which
  * would reshuffle on every re-run).
  */
object BinaryIngest {

  /** Read `dir` (non-recursive unless glob says otherwise) into
    * (doc_id, path, n_bytes, mtime, payload). */
  def readDir(spark: SparkSession, dir: String,
      glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(
        // sign-cleared so ids are non-negative and engine-portable
        expr("cast(conv(substring(md5(path), 1, 15), 16, 10) as bigint)")
          .as("doc_id"),
        col("path"),
        col("length").as("n_bytes"),
        col("modificationTime").as("mtime"),
        col("content").as("payload"))

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
