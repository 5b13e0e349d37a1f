package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q148 composed curation pipeline: seam reuse, staged-lineage
  * isolation, and packing invariants. The value-level gate is the
  * DuckDB oracle (hash-green at sf0.001/0.01/0.1); these tests pin
  * the STRUCTURAL claims the oracle can't see. */
class CurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val docs = Tables.documentsParallel(spark, TestSpark.sf0001)

  test("q148 equals the manual stage-by-stage composition of the public ops") {
    val pipeline = queries.Curation
      .curationPipeline(docs, exactNearPairs = true).collect().toSet
    // the same five stages, chained by hand through the public seams
    val canon = ext.DedupCluster.canonicalDocs(docs, exactNearPairs = true)
      .select(col("canon_doc_id").as("doc_id"))
    val d1 = docs.join(canon, Seq("doc_id"), "left_semi")
      .filter(col("text").isNotNull)
    val rep = queries.PipelineOps.repetitionStats(d1)
      .filter(col("keep")).select("doc_id")
    val boil = queries.CorpusOps.boilerplateScore(d1)
      .filter(col("keep")).select("doc_id")
    val d2 = d1
      .filter(col("lang").isin("de", "en", "es", "fr", "zh") &&
        size(split(col("text"), " ")).between(20, 2000))
      .join(rep, Seq("doc_id"), "left_semi")
      .join(boil, Seq("doc_id"), "left_semi")
    // decon: bench shingles from the ORIGINAL corpus (q55 core over a
    // frame that unions bench originals with the survivors)
    val deconInput = d2.select(col("doc_id"), col("source"), col("text"))
      .unionByName(docs.filter(col("doc_id") % 97 === 0)
        .select(col("doc_id"), col("source"), col("text")))
    val clean = queries.PipelineOps.decontaminate(deconInput)
      .filter(!col("contaminated")).select("doc_id")
    val d3 = d2.join(clean, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), col("source"), col("text"))
    val sel = queries.DataMix.sourceMix(d3).select("doc_id")
    val manual = queries.PipelineOps
      .packSequences(d3.join(sel, Seq("doc_id"), "left_semi"))
      .collect().toSet
    assert(pipeline == manual)
    assert(pipeline.nonEmpty)
  }

  test("q148 final plan reads ONLY staged survivor tables, never the raw corpus") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val df = queries.Curation.curationPipeline(docs, exactNearPairs = true)
    df.queryExecution.toRdd.count(): Unit
    // AQE hides subtrees twice over: AdaptiveSparkPlanExec behind
    // executedPlan, and each materialized QueryStageExec behind .plan
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case s: QueryStageExec => Seq(s.plan)
        case o => o.children
      }
      (p match {
        case f: FileSourceScanExec => Seq(f)
        case _ => Nil
      }) ++ kids.flatMap(scans)
    }
    val leaves = scans(df.queryExecution.executedPlan)
    assert(leaves.nonEmpty)
    val raw = leaves.filterNot(_.relation.location.rootPaths
      .forall(_.toString.contains("_graft_stage")))
    assert(raw.isEmpty,
      s"final pack plan re-reads non-staged inputs: ${raw.map(_.relation.location.rootPaths.mkString(","))}")
  }

  test("q148 packing invariants: offsets tile each source; pack_id is the 2048 grid") {
    val out = queries.Curation
      .curationPipeline(docs, exactNearPairs = true).cache()
    try {
      // pack_id = start_off div 2048, and per source the offsets are a
      // contiguous prefix-sum tiling (no gaps, no overlaps)
      assert(out.filter(col("pack_id") =!= expr("start_off div 2048"))
        .count() == 0)
      val bad = out.groupBy("source").agg(
          sum(col("n_toks")).as("tok_sum"),
          max(col("start_off") + col("n_toks")).as("hi"),
          min(col("start_off")).as("lo"))
        .filter(col("tok_sum") =!= col("hi") || col("lo") =!= 0)
      assert(bad.count() == 0)
    } finally out.unpersist(): Unit
  }

  test("labels-shared path (the registry seam) equals the self-clustering path") {
    val viaLabels = queries.Curation.curationPipeline(docs,
      labels = Some(ext.DedupCluster.clusters(docs, exactNearPairs = true)))
      .collect().toSet
    val selfCluster = queries.Curation
      .curationPipeline(docs, exactNearPairs = true).collect().toSet
    assert(viaLabels == selfCluster)
    assert(viaLabels.nonEmpty)
  }

  // ---- q151 incremental curation ----

  test("q151 pack APPEND continues each source's offsets from the lake") {
    import spark.implicits._
    // lake: source 'web' totals 10 tokens, 'book' 4; batch survivors
    // must start exactly there. Texts are 20+ clean unique tokens so
    // every cascade predicate passes and dedup finds nothing.
    def words(tag: String, n: Int): String =
      (1 to n).map(i => s"$tag$i").mkString(" ")
    val corpus = Seq(
      (1L, "web", "en", 40L, words("lakeA", 6)),
      (2L, "web", "en", 40L, words("lakeB", 4)),
      (3L, "book", "en", 40L, words("lakeC", 4)))
      .toDF("doc_id", "source", "lang", "n_chars", "text")
    val batch = Seq(
      (11L, "web", "en", 200L, words("new", 25)),
      (12L, "book", "en", 200L, words("other", 30)))
      .toDF("doc_id", "source", "lang", "n_chars", "text")
    val out = queries.Curation
      .incrementalCuration(batch, corpus, corpus.limit(0))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out(11L) == (("web", 25L, 10L, 0L)))
    assert(out(12L) == (("book", 30L, 4L, 0L)))
  }

  test("q151 priorPacks shift the append window (the streaming twin's running state)") {
    import spark.implicits._
    def words(tag: String, n: Int): String =
      (1 to n).map(i => s"$tag$i").mkString(" ")
    val corpus = Seq((1L, "web", "en", 40L, words("lake", 6)))
      .toDF("doc_id", "source", "lang", "n_chars", "text")
    val batch = Seq((21L, "web", "en", 200L, words("fresh", 1900)))
      .toDF("doc_id", "source", "lang", "n_chars", "text")
    val prior = Seq((15L, "web", 500L, 6L, 0L))
      .toDF("doc_id", "source", "n_toks", "start_off", "pack_id")
    val out = queries.Curation
      .incrementalCuration(batch, corpus, corpus.limit(0), Some(prior))
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4)))
    // base = 6 (lake) + 500 (prior pack) = 506; 506 div 2048 = 0
    assert(out.toSeq == Seq((21L, 506L, 0L)))
  }

  test("q151 foreachBatch twin equals one batch run across an id-ordered 3-way split") {
    import java.nio.file.Files
    val incoming = docs.filter(col("doc_id") % 10 === 7)
    val corpus = docs.filter(col("doc_id") % 10 =!= 7)
    val bench = docs.filter(col("doc_id") % 97 === 0)
    // id-ordered terciles — arrival order IS append order, so the
    // split must respect doc_id order for ≡ batch
    val ids = incoming.select("doc_id").orderBy("doc_id")
      .collect().map(_.getLong(0))
    val (t1, t2) = (ids(ids.length / 3), ids(2 * ids.length / 3))
    val streamDir = Files.createTempDirectory("inc_cur_stream").toString
    Seq(
      col("doc_id") < t1,
      col("doc_id") >= t1 && col("doc_id") < t2,
      col("doc_id") >= t2).zipWithIndex.foreach { case (pred, i) =>
      val part = Files.createTempDirectory(s"inc_cur_p$i").toString
      incoming.filter(pred).coalesce(1).write.mode("overwrite").parquet(part)
      val src = Files.list(java.nio.file.Paths.get(part)).toArray
        .map(_.asInstanceOf[java.nio.file.Path])
        .find(_.toString.endsWith(".parquet")).get
      val dst = java.nio.file.Paths.get(s"$streamDir/part_$i.parquet")
      Files.copy(src, dst)
      // FileStreamSource orders by modification time: force strictly
      // increasing mtimes so arrival order is the id order
      Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(1000000000000L + i * 60000L))
    }
    val outDir = Files.createTempDirectory("inc_cur_out").toString
    val ckpt = Files.createTempDirectory("inc_cur_ckpt").toString
    val q = streaming.DocStreams.incrementalCurationSink(
      streaming.DocStreams.readDocs(spark, streamDir), corpus, bench,
      outDir, ckpt)
    q.processAllAvailable()
    q.stop()
    val got = spark.read.parquet(s"$outDir/batch_*")
    val want = queries.Curation.incrementalCuration(incoming, corpus, bench)
    assert(got.count() == want.count())
    assert(got.exceptAll(want).count() == 0)
    assert(want.exceptAll(got).count() == 0)
    assert(want.count() > 0)
  }
}
