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
}
