package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.{queries => qs}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * All queries live in `graft.queries.*` / `graft.ext.*` as [[Q]] values;
  * this object is the flat registry the driver consumes.
  */
object SparkEntry {

  /** Declared §2.8 inventory size — THE single source of truth for "how
    * many queries does this engine ship". Update together with SURVEY.md
    * §2.8 when a query lands; PlanHygieneSpec asserts the registry
    * matches, so a landed-but-undeclared (or declared-but-unregistered)
    * query fails the suite instead of silently drifting from the docs. */
  val declaredCount = 238

  /** Every implemented query, in registry order. */
  def registry: Seq[Q] =
    qs.WineParity.all ++ qs.Relational.all ++ qs.Analytic.all ++
      qs.EventWindows.all ++ qs.TextOps.all ++ qs.VectorOps.all ++
      qs.Advanced.all ++ qs.Approximate.all ++ qs.Relational2.all ++
      qs.Windows2.all ++ qs.PipelineOps.all ++ qs.Funnels.all ++
      qs.CorpusOps.all ++ qs.StatsOps.all ++
      qs.Hygiene.all ++ qs.Warehouse.all ++
      qs.GraphOps.all ++ qs.Retrieval.all ++ qs.Privacy.all ++
      qs.DataMix.all ++ qs.Lexical.all ++ qs.Tokenize.all ++
      qs.Quantize.all ++ qs.PQuant.all ++ qs.Learn.all ++ qs.SubstrDedup.all ++
      qs.Mining.all ++ qs.Curation.all ++ qs.Layout.all ++ qs.Export.all ++
      ext.MinHashDedup.all ++
      ext.SimHashDedup.all ++ ext.Multimodal.all ++ ext.Similarity.all ++
      ext.DedupCluster.all ++ ext.Sampling.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    qs.Relational.q04.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(o => q.name -> o.trim)).toMap
}
