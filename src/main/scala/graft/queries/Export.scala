package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.sinks.ShardExport

/** q153 — deterministic training-shard export under the hash gate
  * (the q149 landed-layout recipe applied to the serving side of the
  * curation story): documents are LANDED through
  * [[graft.sinks.ShardExport.writeShards]] — a reproducible md5-draw
  * global shuffle into 16 shard directories, each file a sorted run on
  * the draw key — and the query reads the LANDED layout back and emits
  * the per-shard MANIFEST (doc/token/char counts, an order-insensitive
  * content checksum, min/max shuffle key). The oracle recomputes the
  * identical manifest straight from the raw table (the draw, the
  * shard assignment, and the checksum are pure md5/integer functions
  * of row identity — replayed digit-by-digit in DuckDB), so
  * hash-green certifies the export lost, duplicated, and mutated
  * NOTHING, per shard, without ever diffing row-level data. The spec
  * additionally certifies the within-file draw order (the property
  * the oracle's order-insensitive aggregates can't see).
  *
  * At 100 TB this is the corpus-to-trainer handoff: one shuffle to
  * land, manifests computed from the landed scan in the same job, and
  * a loader that checks its shard's manifest before an epoch —
  * corruption or a partial write surfaces as a checksum mismatch, not
  * a silently-wrong gradient. The layout is written once per
  * (session, corpus snapshot) via SessionCache — the production
  * write-once shape. */
object Export {

  private val nShards = 16

  /** Land the shard export once per (session, corpus snapshot), under
    * Stage's managed staging root (one cleanup mechanism — the q149
    * discipline); production writes to its dataset location. */
  private[graft] def shardLayoutFor(
      spark: org.apache.spark.sql.SparkSession, dir: String): String =
    graft.operators.SessionCache.memoOn(spark, dir,
      s"shard-export|$dir|$nShards") {
      val out = graft.operators.Stage.allocDir(spark, "shards-q153")
      ShardExport.writeShards(
        Tables.documents(spark, dir)
          .select(col("doc_id"), col("source"), col("lang"),
            col("n_chars"), col("text")),
        "doc_id", out, nShards)
      out
    }

  val q153: Q = Q(
    "q153_shard_export",
    run = { (spark, dir) =>
      spark.read.parquet(shardLayoutFor(spark, dir))
        .groupBy(col("shard").cast("int").as("shard"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("text").isNull, lit(0))
            .otherwise(size(split(col("text"), " ")))).as("n_toks"),
          sum(col("n_chars")).as("sum_chars"),
          sum(ShardExport.checksumOf(col("doc_id"), col("text")))
            .as("checksum"),
          min(col("draw")).as("min_key"),
          max(col("draw")).as("max_key"))
    },
    oracle = Some(s"""
      WITH d AS (SELECT doc_id, n_chars, text,
                   md5('shard|' || CAST(doc_id AS VARCHAR)) AS draw
                 FROM documents),
      s AS (SELECT doc_id, n_chars, text, draw,
              ${ShardExport.shardSqlExpr("draw", nShards)} AS shard
            FROM d)
      SELECT shard,
        CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(CASE WHEN text IS NULL THEN 0
                 ELSE len(string_split(text, ' ')) END) AS BIGINT) AS n_toks,
        CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        CAST(sum(${ShardExport.checksumSqlExpr("doc_id", "text")})
          AS BIGINT) AS checksum,
        min(draw) AS min_key, max(draw) AS max_key
      FROM s GROUP BY shard"""))

  val all: Seq[Q] = Seq(q153)
}
