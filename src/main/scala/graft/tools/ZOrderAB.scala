package graft.tools

import org.apache.spark.sql.functions._
import graft.sinks.ZOrderLayout

/** Measured file-skip A/B for the Morton writer (round-10 verdict item
  * 6): lands orders at the given SF in (a) Z-order on (custkey, day)
  * and (b) 1-D sort on custkey, derives each layout's per-file zone
  * map, and reports how many files a zone-map reader opens under
  * x-only / y-only / 2-D box predicates, plus the wall time of real
  * filtered scans (parquet row-group statistics give the same skipping
  * inside Spark's reader). Results recorded in BASELINE.md round-11. */
object ZOrderAB {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val nFiles = 64
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val orders = graft.Tables.orders(spark, dir)
      .select(col("o_custkey").as("ck"),
        datediff(to_date(col("o_orderdate")), to_date(lit("1992-01-01")))
          .as("day"))
    val zDir = java.nio.file.Files.createTempDirectory("zab-z").toString
    val xDir = java.nio.file.Files.createTempDirectory("zab-x").toString
    ZOrderLayout.writeZOrdered(orders, "ck", "day", zDir, nFiles)
    ZOrderLayout.writeSorted1D(orders, "ck", "day", xDir, nFiles)
    val cols = Seq("zx", "zy")
    val zMap = ZOrderLayout.fileZoneMap(spark, zDir, cols).cache()
    val xMap = ZOrderLayout.fileZoneMap(spark, xDir, cols).cache()
    println(s"files per layout: z=${zMap.count()} x=${xMap.count()}")
    val probes = Seq(
      "x-only zx in [0,31]" -> Seq(("zx", 0L, 31L)),
      "y-only zy in [0,31]" -> Seq(("zy", 0L, 31L)),
      "2-D box 32x32" -> Seq(("zx", 0L, 31L), ("zy", 0L, 31L)))
    probes.foreach { case (label, box) =>
      val z = ZOrderLayout.overlappingFiles(zMap, box)
      val x = ZOrderLayout.overlappingFiles(xMap, box)
      println(s"$label: z-layout opens $z/$nFiles, 1-D opens $x/$nFiles")
    }
    // ROW-GROUP granularity (round-11 verdict item 7): at 100 TB with
    // ~1 GB files the row group is the skipping unit — land 8-file
    // layouts with 256 KB row groups so each file carries many, then
    // count row groups a footer-stats reader prunes per probe
    val zrDir = java.nio.file.Files.createTempDirectory("zab-zrg").toString
    val xrDir = java.nio.file.Files.createTempDirectory("zab-xrg").toString
    val rgBlock = Some(256L * 1024)
    ZOrderLayout.writeZOrdered(orders, "ck", "day", zrDir, 8, blockSize = rgBlock)
    ZOrderLayout.writeSorted1D(orders, "ck", "day", xrDir, 8, blockSize = rgBlock)
    val zRg = ZOrderLayout.rowGroupZoneMap(spark, zrDir, cols)
    val xRg = ZOrderLayout.rowGroupZoneMap(spark, xrDir, cols)
    println(s"row groups per layout: z=${zRg.size} x=${xRg.size}")
    probes.foreach { case (label, box) =>
      val z = ZOrderLayout.overlappingRowGroups(zRg, box)
      val x = ZOrderLayout.overlappingRowGroups(xRg, box)
      println(s"row-groups $label: z-layout reads $z/${zRg.size}, 1-D reads $x/${xRg.size}")
    }
    // real filtered scans (row-group stats do the skipping): min-of-3
    def scan(d: String, pred: String): Double = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        spark.read.parquet(d).filter(pred).queryExecution.toRdd.count(): Unit
        (System.nanoTime() - t0) / 1e9
      }
      ts.min
    }
    Seq("zy BETWEEN 0 AND 31" -> "y-only", "zx BETWEEN 0 AND 31" -> "x-only",
      "zx BETWEEN 0 AND 31 AND zy BETWEEN 0 AND 31" -> "2-D box")
      .foreach { case (pred, label) =>
        println(f"scan $label: z=${scan(zDir, pred)}%.3f s 1-D=${scan(xDir, pred)}%.3f s")
      }
    spark.stop()
  }
}
