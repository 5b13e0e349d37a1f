package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.Similarity

/** ANN recall, top-k aggregator vs window formulation, staged sources. */
class AdvancedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("LSH top-k recalls most of the exact brute-force neighbors") {
    val exact = graft.queries.VectorOps.q25.run(spark, TestSpark.sf0001)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.lshTopK(
      Tables.embeddings(spark, TestSpark.sf0001))
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall $recall too low (|exact∩approx|=${(exact intersect approx).size}/${exact.size})")
  }

  test("TopKAggregator equals the window row_number formulation") {
    import org.apache.spark.sql.expressions.Window
    val viaAgg = graft.queries.Advanced.q35.run(spark, TestSpark.sf0001)
      .select("o_orderpriority", "rnk", "o_orderkey").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    val viaWindow = Tables.orders(spark, TestSpark.sf0001)
      .withColumn("rnk", row_number().over(Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))))
      .filter(col("rnk") <= 3)
      .select("o_orderpriority", "rnk", "o_orderkey").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(viaAgg == viaWindow)
  }

  test("KaggleSource stages from a local mirror; errors clearly offline") {
    val mirror = java.nio.file.Files.createTempDirectory("mirror")
    java.nio.file.Files.writeString(mirror.resolve("wine.json"), "[]")
    val staging = java.nio.file.Files.createTempDirectory("staging").toString
    val staged = graft.sources.KaggleSource.fetch(
      "zynicide/wine-reviews", staging, Some(mirror.toString))
    assert(staged.size == 1 && staged.head.endsWith("wine.json"))
    val e = intercept[java.io.IOException] {
      graft.sources.KaggleSource.fetch("zynicide/wine-reviews", staging)
    }
    assert(e.getMessage.contains("no network egress"))
  }

  test("rolling fingerprint is order-sensitive; set fingerprint is not") {
    import graft.functions.TextFunctions
    val df = Seq((1L, "alpha beta gamma"), (2L, "gamma alpha beta"))
      .toDF("id", "text")
      .withColumn("toks", split(col("text"), " "))
      .select(col("id"),
        TextFunctions.fingerprint(col("text")).as("set_fp"),
        TextFunctions.rollingFingerprint("toks").as("roll_fp"))
    val rows = df.collect().map(r => (r.getString(1), r.getLong(2)))
    assert(rows(0)._1 == rows(1)._1)  // same token set
    assert(rows(0)._2 != rows(1)._2)  // different order
  }

  test("globAssert throws FileNotFoundException on empty glob") {
    intercept[java.io.FileNotFoundException] {
      graft.sources.Staged.globAssert(spark, "/tmp/definitely-missing-*.json")
    }
  }

  test("format round-trips: csv (declared schema), orc, json lines") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("fmt").toString
    val src = Tables.nation(spark, TestSpark.sf0001)
    val schema = src.schema
    graft.sinks.Sinks.writeCsv(src, s"$dir/csv")
    graft.sinks.Sinks.writeOrc(src, s"$dir/orc")
    graft.sinks.Sinks.writeJsonLines(src, s"$dir/json")
    // CSV re-read with DECLARED schema (the reference's §4.1 dtype-erasure
    // round-trip, minus inference)
    val csv = graft.sources.Staged.readCsv(spark, s"$dir/csv", schema)
    val orc = spark.read.orc(s"$dir/orc")
    val jsn = graft.sources.Staged.readJsonLines(spark, s"$dir/json", schema)
    for (df <- Seq(csv, orc, jsn)) {
      assert(df.count() == 25)
      assert(df.exceptAll(src).count() == 0)
    }
  }

  test("staged cleanup deletes children, tolerates missing dir") {
    val d = java.nio.file.Files.createTempDirectory("staging")
    java.nio.file.Files.writeString(d.resolve("a.json"), "[]")
    java.nio.file.Files.writeString(d.resolve("b.csv"), "x")
    val deleted = graft.sources.Staged.cleanup(spark, d.toString)
    assert(deleted.size == 2)
    assert(graft.sources.Staged.cleanup(spark, "/tmp/no-such-staging-dir").isEmpty)
  }
}
