package graft.tools

/** Registry-wide partition-less-window detector: prints every registry
  * query whose EXECUTED plan contains a Window/WindowGroupLimit with an
  * empty partition spec (the "Moving all data to a single partition"
  * shape). Bounded-input windows (operator-constant frames like the
  * 32-candidate MMR set) are fine at any scale and belong on the
  * allowlist in the round notes; anything corpus-sized here is a bug. */
object WindowAudit {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    graft.SparkEntry.registry.foreach { q =>
      try {
        // AdaptiveSparkPlanExec reports NO children (its inner plan is
        // a field), so a naive collect is vacuously empty under AQE —
        // walk through it explicitly (the ExplainAudit lesson)
        import org.apache.spark.sql.execution.SparkPlan
        import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
        import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
        def walk(p: SparkPlan): Seq[String] = {
          val here = p match {
            case w: WindowExec if w.partitionSpec.isEmpty => Seq(w.nodeName)
            case w: WindowGroupLimitExec if w.partitionSpec.isEmpty =>
              Seq(w.nodeName)
            case _ => Nil
          }
          val kids = p match {
            case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
            case o => o.children
          }
          here ++ kids.flatMap(walk)
        }
        val hits = walk(q.run(spark, dir).queryExecution.executedPlan)
        if (hits.nonEmpty)
          println(s"PARTITIONLESS ${q.name}: ${hits.mkString(", ")}")
      } catch { case e: Throwable =>
        println(s"ERROR ${q.name}: ${e.toString.linesIterator.next()}")
      }
    }
    println("window audit done")
    spark.stop()
  }
}
