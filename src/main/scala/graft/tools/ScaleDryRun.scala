package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale dry-run: self-union the sf0.1 fact tables 10× (~6M lineitem
  * rows) and re-run the heavy relational queries, to observe whether
  * wall-time scales ~linearly (shuffle-bound plans should; anything
  * super-linear flags a plan that won't survive a real scale-up).
  * Synthetic only as INPUT VOLUME — correctness is still gated on the
  * driver fixtures.
  */
object ScaleDryRun {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val mult = 10

    def x10(df: DataFrame): DataFrame =
      (1 to mult).map(_ => df).reduce(_ union _).repartition(cpus.toInt)

    val li = x10(spark.read.parquet(s"$dir/lineitem.parquet"))
    val o = x10(spark.read.parquet(s"$dir/orders.parquet"))
    li.createOrReplaceTempView("li10")
    o.createOrReplaceTempView("o10")

    def time(name: String)(df: DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.queryExecution.toRdd.count()
      println(f"[scale-dry-run] $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (${mult}x sf0.1)")
    }

    // warm-up
    li.agg(count(lit(1))).queryExecution.toRdd.count()

    time("tpch_q1_agg") {
      import graft.functions.Exact._
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(dsum(col("l_quantity")).as("sum_qty"),
          dsumExpr(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
            .as("rev"),
          count(lit(1)).as("n"))
    }
    time("fact_fact_join") {
      import graft.functions.Exact._
      o.join(li, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(dsumExpr(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .as("rev"), count(lit(1)).as("n"))
    }
    time("topk") {
      o.join(li, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(sum(col("l_extendedprice")).as("r"))
        .orderBy(col("r").desc, col("o_custkey")).limit(10)
    }
    spark.stop()
  }
}
