package graft.tools

import org.apache.spark.sql.functions._
import graft.sinks.BloomLayout

/** q154's skipping evidence at bench scale: land orders date-sorted
  * with and without a bloom filter on o_orderkey (256 KB row groups —
  * many groups per file, the q149 row-group-evidence recipe), probe
  * the registry's deterministic 8-key set, and print per-key row-group
  * survivor counts under stats-only vs stats+bloom. Results go to
  * BASELINE.md (round-12). */
object BloomAB {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val orders = graft.Tables.orders(spark, dir)
      .select(col("o_orderkey"),
        datediff(to_date(col("o_orderdate")), to_date(lit("1992-01-01")))
          .cast("long").as("day"))
    val n = orders.count()
    val keys = orders
      .withColumn("d",
        md5(concat(lit("probe|"), col("o_orderkey").cast("string"))))
      .orderBy(col("d"), col("o_orderkey")).limit(8)
      .collect().toSeq.map(_.getLong(0))
    val bDir = java.nio.file.Files.createTempDirectory("bloomab-b").toString
    val sDir = java.nio.file.Files.createTempDirectory("bloomab-s").toString
    BloomLayout.writeBloomIndexed(orders, "day", "o_orderkey", bDir,
      nFiles = 16, expectedNdv = math.max(1024L, n / 16),
      blockSize = Some(256L * 1024))
    BloomLayout.writeBloomIndexed(orders, "day", "o_orderkey", sDir,
      nFiles = 16, expectedNdv = math.max(1024L, n / 16),
      blockSize = Some(256L * 1024), bloom = false)
    val withB = BloomLayout.rowGroupBloomProbe(spark, bDir, "o_orderkey", keys)
    val noB = BloomLayout.rowGroupBloomProbe(spark, sDir, "o_orderkey", keys)
    println(s"orders=$n totalRowGroups=${withB.head.totalRowGroups}")
    println("key | stats-only survivors | stats+bloom survivors")
    withB.zip(noB).foreach { case (b, s) =>
      println(f"${b.key}%12d | ${s.statsSurvivors}%3d/${s.totalRowGroups}%3d " +
        f"| ${b.bloomSurvivors}%3d/${b.totalRowGroups}%3d")
    }
    val statsTotal = noB.map(_.statsSurvivors).sum
    val bloomTotal = withB.map(_.bloomSurvivors).sum
    println(s"TOTAL opens for the 8-key probe set: " +
      s"stats-only=$statsTotal stats+bloom=$bloomTotal " +
      f"(${statsTotal.toDouble / math.max(1, bloomTotal)}%.1fx fewer)")
    spark.stop()
  }
}
