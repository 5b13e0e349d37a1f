package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-10 evidence for the q101 chunked-CSR adjacency: a synthetic
  * power-law worst case — ONE hub co-purchased with every other part
  * (N star orders of {hub, leaf}) — where the round-9 one-row-per-src
  * build concentrates the hub's whole neighbor list into a single
  * unbounded, unspillable row (an 8·N-byte collect_list buffer per
  * aggregation key; at web-graph degrees a multi-GB row → OOM in both
  * rank-state modes). The chunked build (`dst div 64k`) caps every row
  * at 64k ids by construction.
  *
  * Prints: per-row neighbor-array bounds for both builds, then runs the
  * PRODUCTION partPageRank end-to-end on the star graph and reports
  * timing + the top ranks (the hub must dominate: every leaf's full
  * contribution flows to it).
  */
object Q101HubDryRun {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_HUB_N", "2000000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // N orders of {hub=0, leaf=i} — per-order self-join stays bounded
    // (|order| = 2) while the hub's degree grows to N
    val leaves = spark.range(1, n + 1)
    val baskets = leaves.select(col("id").as("ok"), lit(0L).as("part"))
      .unionByName(leaves.select(col("id").as("ok"), col("id").as("part")))
    val li = baskets.distinct()
    val edges = li.join(li.withColumnRenamed("part", "dst"), Seq("ok"))
      .filter(col("part") =!= col("dst"))
      .select(col("part").as("src"), col("dst")).distinct()

    def rowStats(label: String, adj: org.apache.spark.sql.DataFrame): Unit = {
      val s = adj.select(max(size(col("dsts"))).as("mx"),
        count(lit(1)).as("rows")).collect()(0)
      println(s"[q101hub] $label: rows=${s.getLong(1)} maxRowIds=${s.getInt(0)}")
    }
    // round-9 build: one row per src — the hub row holds ALL N ids
    val t0 = System.nanoTime()
    rowStats("r9 one-row-per-src",
      edges.groupBy(col("src")).agg(collect_list(col("dst")).as("dsts")))
    println(f"[q101hub] r9 build ${(System.nanoTime() - t0) / 1e9}%.1f s")
    // round-10 build: (src, dst div 64k) chunks — every row <= 64k ids
    val t1 = System.nanoTime()
    rowStats("r10 chunked",
      edges.groupBy(col("src"), expr("dst div 65536").as("seg"))
        .agg(collect_list(col("dst")).as("dsts")))
    println(f"[q101hub] r10 build ${(System.nanoTime() - t1) / 1e9}%.1f s")
    // the production operator end-to-end on the star graph
    val t2 = System.nanoTime()
    val top = graft.queries.GraphOps.partPageRank(baskets, topK = 3).collect()
    println(f"[q101hub] partPageRank(star N=$n) ${(System.nanoTime() - t2) / 1e9}%.1f s " +
      s"top=${top.map(r => s"${r.getLong(0)}:${r.getLong(1)}").mkString(", ")}")
    spark.stop()
  }
}
