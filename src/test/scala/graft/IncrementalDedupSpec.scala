package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.PipelineOps
import graft.streaming.DocStreams

/** q115 incremental dedup: batch verdict semantics, split invariance,
  * and the streaming twins (foreachBatch ≡ batch across any micro-batch
  * split; stream-static exact join ≡ batch exact arm). */
class IncrementalDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docsDF(rows: Seq[(Long, String, String)]) =
    rows.toDF("doc_id", "text", "source")

  test("dedupAgainst classifies exact, near, and new incoming docs") {
    val corpus = docsDF(Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta", "web"),
      (2L, "one two three four five six seven eight nine", "web"),
      (3L, "totally different corpus content here folks today", "web")))
    val incoming = docsDF(Seq(
      (107L, "alpha beta gamma delta epsilon zeta eta theta", "web"), // exact of 1
      (117L, "one two three four five six seven eight SALT", "web"),  // near of 2
      (127L, "completely novel text that matches nothing at all", "web")))
    val got = PipelineOps.dedupAgainst(incoming, corpus, 0.5)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    assert(got(107L) == ("exact", 1L))
    assert(got(117L)._1 == "near" && got(117L)._2 == 2L)
    assert(got(127L) == ("new", -1L))
  }

  test("exact verdict wins over near; best near match ties to smallest corpus id") {
    // doc 9 is an exact copy of corpus 5 AND near corpus 6 → exact, match 5
    // doc 19 is equally near corpus 7 and 8 (same jaccard) → near, match 7
    val corpus = docsDF(Seq(
      (5L, "a b c d e f g h", "s"),
      (6L, "a b c d e f g SALT", "s"),
      (7L, "p q r s t u v w", "s"),
      (8L, "p q r s t u v w", "s"))) // 7 and 8 identical → equal jaccard
    val incoming = docsDF(Seq(
      (9L, "a b c d e f g h", "s"),
      (19L, "p q r s t u v SALT", "s")))
    val got = PipelineOps.dedupAgainst(incoming, corpus, 0.3)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(got(9L) == ("exact", 5L))
    assert(got(19L) == ("near", 7L))
  }

  test("null-text incoming docs come back as new, never dropped") {
    val corpus = docsDF(Seq((1L, "x y z w v u t s", "s")))
    val incoming = Seq((107L, Option.empty[String], "s"),
      (117L, Some("x y z w v u t s"), "s"))
      .toDF("doc_id", "text", "source")
    val got = PipelineOps.dedupAgainst(incoming, corpus, 0.5).collect()
    assert(got.length == 2)
    val byId = got.map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byId(107L) == "new" && byId(117L) == "exact")
  }

  test("q115 registry run is partitioning-invariant and covers all three verdicts") {
    val base = queries.PipelineOps.q115.run(spark, TestSpark.sf0001)
    val docs = Tables.documents(spark, TestSpark.sf0001).repartition(7)
    val reparted = PipelineOps.dedupAgainst(
      docs.filter(col("doc_id") % 10 === 7),
      docs.filter(col("doc_id") % 10 =!= 7), 0.5)
    assert(base.count() ==
      Tables.documents(spark, TestSpark.sf0001)
        .filter(col("doc_id") % 10 === 7).count())
    assert(base.exceptAll(reparted).count() == 0)
    assert(reparted.exceptAll(base).count() == 0)
    val verdicts = base.groupBy("verdict").count().collect()
      .map(r => r.getString(0)).toSet
    assert(verdicts.contains("new")) // fixtures are mostly unique
  }

  test("foreachBatch streaming twin equals batch q115 across any micro-batch split") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val incoming = docs.filter(col("doc_id") % 10 === 7)
    val corpus = docs.filter(col("doc_id") % 10 =!= 7)
    // split the incoming batch across three files → three micro-batches
    val inDir = Files.createTempDirectory("incr_in").toString
    incoming.filter(col("doc_id") % 3 === 0).coalesce(1)
      .write.mode("overwrite").parquet(s"$inDir/f0")
    incoming.filter(col("doc_id") % 3 === 1).coalesce(1)
      .write.mode("overwrite").parquet(s"$inDir/f1")
    incoming.filter(col("doc_id") % 3 === 2).coalesce(1)
      .write.mode("overwrite").parquet(s"$inDir/f2")
    // flatten the three part-dirs into one stream dir
    val streamDir = Files.createTempDirectory("incr_stream").toString
    var i = 0
    Seq("f0", "f1", "f2").foreach { f =>
      Files.list(java.nio.file.Paths.get(s"$inDir/$f")).forEach { p =>
        if (p.toString.endsWith(".parquet")) {
          Files.copy(p, java.nio.file.Paths.get(s"$streamDir/part_$i.parquet"))
          i += 1
        }
      }
    }
    val outDir = Files.createTempDirectory("incr_out").toString
    val ckpt = Files.createTempDirectory("incr_ckpt").toString
    val q = DocStreams.incrementalDedupSink(
      DocStreams.readDocs(spark, streamDir), corpus, outDir, ckpt)
    q.processAllAvailable()
    q.stop()
    val got = spark.read.parquet(s"$outDir/batch_*")
    val want = queries.PipelineOps.q115.run(spark, TestSpark.sf0001)
    assert(got.count() == want.count())
    assert(got.exceptAll(want).count() == 0)
    assert(want.exceptAll(got).count() == 0)
  }

  test("stream-static exact join emits the same hit pairs as the batch exact arm") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val incoming = docs.filter(col("doc_id") % 10 === 7)
    val corpus = docs.filter(col("doc_id") % 10 =!= 7)
    val streamDir = Files.createTempDirectory("ss_in").toString
    incoming.coalesce(1).write.mode("overwrite").parquet(streamDir)
    val got = graft.streaming.EventStreams.runToMemory(
      DocStreams.exactHitsStreamStatic(
        DocStreams.readDocs(spark, streamDir), corpus),
      "ss_exact_out", OutputMode.Append)
    val want = DocStreams.exactHitsStreamStatic(incoming, corpus)
    assert(got.count() == want.count())
    assert(got.exceptAll(want).count() == 0)
    assert(want.exceptAll(got).count() == 0)
  }
}
