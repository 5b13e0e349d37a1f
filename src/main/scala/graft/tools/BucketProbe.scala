package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Diagnostic: band-bucket size distribution of the MinHashK banded
  * join on the duplicate-dense dry-run corpus — distinguishes "buckets
  * are true dup groups" from "frequent-shingle minima glue unrelated
  * docs into mega-buckets" (the quadratic-join failure mode). */
object BucketProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs0 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def dense(depth: Int): DataFrame =
      (0 until depth).map { k =>
        if (k == 0) docs0
        else docs0.select((col("doc_id") + lit(k * 10000000L)).as("doc_id"),
          concat(col("text"), lit(s" salt$k")).as("text"),
          col("lang"), col("source"), col("n_chars"))
      }.reduce(_ unionByName _).repartition(32)
    val d = dense(10)
    graft.functions.TextFunctions.registerMinHash(spark)
    val sh = d.filter(col("text").isNotNull)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"),
        graft.functions.TextFunctions.shinglesExpr("toks", 3).as("shingles"))
    val sig = sh.select(col("doc_id"),
      call_function("minhash_k", col("shingles"), lit(8)).as("sig"))
    val banded = sig.select(col("doc_id"),
      posexplode(array((0 until 8).map(b => col("sig")(b)): _*))
        .as(Seq("band", "bkey")))
    val sizes = banded.groupBy("band", "bkey").agg(count(lit(1)).as("n"))
    sizes.agg(count(lit(1)).as("n_buckets"), max(col("n")).as("max"),
      expr("percentile(n, array(0.5, 0.9, 0.99, 0.999))").as("pcts"),
      sum(col("n") * (col("n") - 1) / 2).as("total_join_pairs")).show(false)
    sizes.orderBy(col("n").desc).show(10, false)
    spark.stop()
  }
}
