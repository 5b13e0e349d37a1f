package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sinks.BloomLayout

/** q154's bloom-filter layout claim, measured on the landed footers:
  * on a date-sorted table the probed key is scattered, so min/max
  * stats open (nearly) every row group; the landed blooms cut that to
  * the truly-containing groups plus false positives — and NEVER skip
  * a group that holds the key (the correctness half of the A/B). */
class BloomLayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"bloom-$tag").toString

  private lazy val orders = Tables.orders(spark, TestSpark.sf0001)
    .select(col("o_orderkey"),
      datediff(to_date(col("o_orderdate")), to_date(lit("1992-01-01")))
        .cast("long").as("day"))

  // 8 scattered probe keys, deterministic
  private lazy val keys: Seq[Long] = orders
    .withColumn("d",
      md5(concat(lit("probe|"), col("o_orderkey").cast("string"))))
    .orderBy(col("d"), col("o_orderkey")).limit(8)
    .collect().toSeq.map(_.getLong(0))

  // sf0.001 orders are too small to span many 16 KB row groups — union
  // 8 key-shifted replicas (keys stay unique, day distribution kept)
  // so each file carries several groups
  private lazy val wideOrders = (0 until 8)
    .map(i => orders.select(
      (col("o_orderkey") + lit(i * 10000000L)).as("o_orderkey"),
      col("day")))
    .reduce(_ unionAll _)

  test("blooms skip row groups stats can't, and never skip a containing group") {
    val dir = tmp("ab")
    // 16 KB row groups -> many groups per file even at fixture scale
    BloomLayout.writeBloomIndexed(wideOrders, "day", "o_orderkey", dir,
      nFiles = 4, expectedNdv = 16384, blockSize = Some(16L * 1024))
    val probes = BloomLayout.rowGroupBloomProbe(
      spark, dir, "o_orderkey", keys)
    assert(probes.head.totalRowGroups >= 8,
      s"fixture too coarse: ${probes.head.totalRowGroups} row groups")
    // truth: which groups actually contain each key (via the landed
    // data itself, grouped by file+row-group-sized stats is overkill —
    // a full read suffices at fixture scale)
    val landed = spark.read.parquet(dir).cache()
    try {
      probes.foreach { p =>
        val present =
          landed.filter(col("o_orderkey") === p.key).count() > 0
        assert(present, s"probe key ${p.key} missing from landed data")
        assert(p.bloomSurvivors >= 1,
          s"bloom skipped every group incl. the one holding ${p.key}")
        assert(p.bloomSurvivors <= p.statsSurvivors)
      }
      // the aggregate win: stats-only opens nearly everything on the
      // off-sort key; blooms open strictly less overall
      val statsTotal = probes.map(_.statsSurvivors).sum
      val bloomTotal = probes.map(_.bloomSurvivors).sum
      assert(bloomTotal < statsTotal,
        s"no bloom win: stats=$statsTotal bloom=$bloomTotal")
    } finally { landed.unpersist(); () }
  }

  test("a layout written WITHOUT blooms reports bloom == stats (null filter excludes nothing)") {
    val dir = tmp("nb")
    BloomLayout.writeBloomIndexed(orders, "day", "o_orderkey", dir,
      nFiles = 2, expectedNdv = 4096, blockSize = Some(16L * 1024),
      bloom = false)
    BloomLayout.rowGroupBloomProbe(spark, dir, "o_orderkey", keys)
      .foreach(p => assert(p.bloomSurvivors == p.statsSurvivors))
  }

  test("q154 registry run: exactly the 8 probed orders, pushed as point predicates") {
    val out = queries.Layout.q154.run(spark, TestSpark.sf0001)
    val rows = out.collect()
    assert(rows.length == 8, s"expected 8 probed orders, got ${rows.length}")
    assert(rows.map(_.getLong(0)).toSet == keys.toSet)
    // the scan pushes the IN list (<= parquet inFilterThreshold), so
    // parquet-mr's row-group filter consults the landed blooms in the
    // real plan
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("In(o_orderkey"),
      s"IN probe not pushed to the scan:\n$plan")
  }
}
