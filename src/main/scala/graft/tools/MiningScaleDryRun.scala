package graft.tools

import org.apache.spark.sql.functions._

/** 10×-GRAPH dry-run for the round-10 traversal family: replicates the
  * sf0.1 basket set into R id-shifted DISJOINT copies (unlike a plain
  * row replication, which the per-order `distinct` would collapse back
  * to the same edge set), so node count, edge count AND component
  * count all grow ×R — the honest "bigger graph", not just "more rows
  * scanned". labelProp/assocRules/itemCf process EVERY replica (true
  * ×R work). The single-seed traversals only walk replica 0's
  * component on a disjoint-replica graph: BFS is excluded outright,
  * and weightedPaths' ratio measures the ×R EDGE-STREAM scan cost
  * around an unchanged frontier — read it as scan scaling, not
  * traversal scaling (its per-round state stays node-of-one-component
  * sized by design).
  */
object MiningScaleDryRun {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = 10
    val base = graft.Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("part"))
    // disjoint replicas: shift both ids by a replica offset far above
    // the fixture key range
    val big = spark.range(reps).crossJoin(base)
      .select((col("ok") + col("id") * lit(1000000000L)).as("ok"),
        (col("part") + col("id") * lit(10000000L)).as("part"))
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    for ((name, df) <- Seq("1x" -> base, s"${reps}x" -> big)) {
      time(s"labelProp $name") {
        graft.queries.GraphOps.labelProp(df).count()
      }
      time(s"weightedPaths $name") {
        graft.queries.GraphOps.weightedPaths(df).count()
      }
      time(s"assocRules $name") {
        graft.queries.Mining.assocRules(df).count()
      }
      time(s"itemCf $name") {
        graft.queries.Mining.itemCf(df).count()
      }
    }
    spark.stop()
  }
}
