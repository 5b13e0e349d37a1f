package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sinks.ShardExport

/** q153 shard export: the landed layout round-trips exactly, the
  * within-file order is the deterministic draw order (the property the
  * manifest's order-insensitive aggregates can't certify), and the
  * whole export is a pure function of row identity — invariant to how
  * the input happened to be partitioned. */
class ExportSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"shards-$tag").toString

  private def landedFiles(dir: String): Seq[java.io.File] = {
    val root = new java.io.File(dir)
    root.listFiles().toSeq.filter(_.getName.startsWith("shard="))
      .flatMap(_.listFiles().toSeq)
      .filter(_.getName.endsWith(".parquet"))
  }

  test("shard export round-trips the corpus and orders every file by draw") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"), col("source"), col("lang"),
        col("n_chars"), col("text"))
    val out = tmp("rt")
    ShardExport.writeShards(docs, "doc_id", out, nShards = 16)
    val landed = spark.read.parquet(out)
    // nothing lost, duplicated, or mutated
    assert(landed.count() == docs.count())
    assert(landed.select("doc_id").except(docs.select("doc_id")).isEmpty &&
      docs.select("doc_id").except(landed.select("doc_id")).isEmpty)
    // every landed shard id matches a fresh recompute from doc_id
    val mismatched = landed.withColumn(
      "expect", ShardExport.shardOf(ShardExport.drawOf(col("doc_id")), 16))
      .filter(col("shard") =!= col("expect")).count()
    assert(mismatched == 0L, s"$mismatched rows in the wrong shard")
    // within every landed FILE, rows ascend by draw (a sorted run —
    // the loader's deterministic order needs no re-sort)
    val files = landedFiles(out)
    assert(files.nonEmpty)
    files.foreach { f =>
      val draws = spark.read.parquet(f.getAbsolutePath)
        .select("draw").collect().map(_.getString(0)).toSeq
      assert(draws == draws.sorted, s"file ${f.getName} not in draw order")
    }
  }

  test("export is invariant to input partitioning (pure function of row identity)") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"), col("source"), col("lang"),
        col("n_chars"), col("text"))
    val (a, b) = (tmp("a"), tmp("b"))
    ShardExport.writeShards(docs, "doc_id", a, nShards = 16)
    ShardExport.writeShards(
      docs.repartition(7, col("lang")), "doc_id", b, nShards = 16)
    def perShard(dir: String): Map[Int, Seq[String]] =
      spark.read.parquet(dir)
        .select(col("shard").cast("int"), col("draw"))
        .collect().groupBy(_.getInt(0))
        .map { case (s, rs) => s -> rs.map(_.getString(1)).toSeq.sorted }
    assert(perShard(a) == perShard(b))
  }

  test("q153 registry run: full manifest, checksum catches a dropped doc") {
    val rows = queries.Export.q153.run(spark, TestSpark.sf0001).collect()
    assert(rows.length == 16, s"expected 16 shards, got ${rows.length}")
    val total = Tables.documents(spark, TestSpark.sf0001).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == total)
    // the checksum is sensitive: recompute the manifest with one doc
    // removed and the victim shard's checksum must move
    val landed = spark.read.parquet(
      queries.Export.shardLayoutFor(spark, TestSpark.sf0001))
    val victim = landed.select(col("doc_id"), col("shard").cast("int"))
      .head()
    val tampered = landed.filter(col("doc_id") =!= victim.getLong(0))
      .groupBy(col("shard").cast("int").as("shard"))
      .agg(sum(ShardExport.checksumOf(col("doc_id"), col("text")))
        .as("checksum"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val clean = rows.map(r =>
      r.getAs[Int]("shard") -> r.getAs[Long]("checksum")).toMap
    assert(tampered(victim.getInt(1)) != clean(victim.getInt(1)))
    assert((clean - victim.getInt(1)).forall { case (s, c) =>
      tampered(s) == c })
  }
}
