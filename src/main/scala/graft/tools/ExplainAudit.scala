package graft.tools
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    def p(name: String) = {
      val df = graft.SparkEntry.queries(name)(spark, dir)
      val s = df.queryExecution.executedPlan.toString
      println(s"===== $name")
      println(s.linesIterator.take(40).mkString("\n"))
    }
    p("q03_scan_filter_project"); p("q06_join_dims_broadcast"); p("q16_topk")
    // partitioned events layout: date filter must prune at planning time
    val part = java.nio.file.Files.createTempDirectory("events_part").toString
    graft.sources.EventsLayout.writePartitionedByDay(
      graft.Tables.events(spark, dir), part)
    val pruned = graft.sources.EventsLayout.readPartitioned(spark, part)
      .filter(org.apache.spark.sql.functions.col("event_date") === "2024-01-05")
    println("===== events_partitioned_by_day (pruned read)")
    println(pruned.queryExecution.executedPlan.toString.linesIterator
      .take(8).mkString("\n"))
    spark.stop()
  }
}
