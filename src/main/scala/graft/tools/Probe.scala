package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.window.WindowExec
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (q <- Seq("q101_part_pagerank", "q102_bm25")) {
      println(s"======== $q")
      val df = graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.01")
      df.queryExecution.toRdd.count()
      val ep = df.queryExecution.executedPlan
      println("TOP NODE: " + ep.getClass.getSimpleName + " children=" + ep.children.size)
      val fin = ep match { case a: AdaptiveSparkPlanExec => a.executedPlan; case p => p }
      fin.foreach {
        case w: WindowExec => println("WINDOW partSpec=" + w.partitionSpec + " SPECSIZE=" + w.partitionSpec.size)
        case _ =>
      }
      println(fin.toString.linesIterator.filter(l => l.contains("Window") || l.contains("TakeOrdered")).mkString("\n"))
    }
    spark.stop()
  }
}
