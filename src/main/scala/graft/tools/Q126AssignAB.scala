package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.queries.{CenterAssign, Learn}

/** A/B evidence for the round-10 q126/q111 assignment change: the
  * legacy round-9 window-argmin (crossJoin(broadcast(centers)) +
  * row_number over Window.partitionBy(vec_id) — an n·k-row exchange
  * whose only job is picking the min of k co-located rows) vs the
  * projection fold (CenterAssign — zero exchanges). The legacy arm
  * lives ONLY here, as the measured baseline; production code uses the
  * fold. Run on SPARK_GRAFT_SF_DIR (default sf0.1 = the 10× scale),
  * min-of-3 per arm, plus the end-to-end 4-round k-means under each
  * assignment (the loop pays the assignment 5×). */
object Q126AssignAB {

  // the round-9 shape, verbatim semantics (Learn.scala@2369b0d:175-186)
  private def windowAssign(e: DataFrame, centers: DataFrame): DataFrame =
    e.crossJoin(broadcast(centers))
      .withColumn("dist_sq", expr(
        "aggregate(zip_with(embedding, centroid," +
          " (v, m) -> (CAST(v AS DOUBLE) - m) * (CAST(v AS DOUBLE) - m))," +
          " CAST(0 AS DOUBLE), (acc, x) -> acc + x)"))
      .withColumn("arnk", row_number().over(
        Window.partitionBy("vec_id")
          .orderBy(col("dist_sq").asc, col("center_id").asc)))
      .filter(col("arnk") === 1)
      .select(col("vec_id"), col("center_id").as("cluster"),
        col("dist_sq"), col("embedding"))

  private def foldAssign(e: DataFrame, centers: DataFrame): DataFrame =
    CenterAssign.withNearest(e, centers)
      .select(col("vec_id"), col("cluster"), col("dist_sq"), col("embedding"))

  // the q126 Lloyd loop, parameterized on the assignment arm — k/iters
  // and the exact-decimal centroid update mirror Learn.kmeans
  private def lloyd(e: DataFrame,
      assignFn: (DataFrame, DataFrame) => DataFrame,
      k: Int, iters: Int): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val seeds = e.orderBy(col("vec_id").asc).limit(k)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().sortBy(_.getLong(0)).zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Double](1)) }
    var centers = seeds.toSeq.toDF("center_id", "centroid")
    for (_ <- 1 to iters) {
      val means = assignFn(e, centers)
        .select(col("cluster"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("cluster"), col("pos"))
        .agg(count(lit(1)).as("n"),
          sum(col("v").cast("double").cast("decimal(20,10)"))
            .cast("double").as("sum_v"))
        .select(col("cluster"), col("pos"), (col("sum_v") / col("n")).as("m"))
        .collect()
      centers = means.groupBy(_.getInt(0))
        .map { case (cid, rows) =>
          (cid, rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq)
        }.toSeq.sortBy(_._1).toDF("center_id", "centroid")
    }
    assignFn(e, centers).select(col("vec_id"), col("cluster"), col("dist_sq"))
  }

  private def time3(label: String)(mk: => DataFrame): Double = {
    val ts = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      mk.queryExecution.toRdd.count(): Unit
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[q126ab] $label min=${ts.min}%.3f samples=${ts.map(t => f"$t%.2f").mkString(",")}")
    ts.min
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // optional corpus replication (the ScaleDryRun recipe): sf0.1 has
    // only 2k vectors, far below where an n·k exchange shows — REP=50
    // gives a 100k-vector corpus with distinct vec_ids (offset keeps
    // the argmin per replica identical to the base corpus)
    val rep = sys.env.getOrElse("SPARK_GRAFT_REP", "1").toInt
    val base = graft.Tables.embeddings(spark, sfDir)
      .filter(col("embedding").isNotNull)
      .select(col("vec_id"), col("embedding"))
    // materialize the replicated corpus at full parallelism: a real
    // 100 TB scan has thousands of input splits, but the sf0.1 file is
    // ONE split — without this, the fold arm's single-stage pipeline
    // runs 1-way while the window arm's shuffle accidentally fans out,
    // and the A/B measures file layout instead of plan shape
    val e = (if (rep <= 1) base
      else base.crossJoin(spark.range(rep).select(col("id").as("r")))
        .select((col("vec_id") * rep + col("r")).as("vec_id"), col("embedding")))
      .repartition(cpus.toInt).persist()
    val n = e.count()
    println(s"[q126ab] sfDir=$sfDir rep=$rep vectors=$n")
    val seeds = e.orderBy(col("vec_id").asc).limit(8)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().sortBy(_.getLong(0)).zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Double](1)) }
    val centers = seeds.toSeq.toDF("center_id", "centroid")
    // equivalence first: both arms must produce identical assignments
    val diff = windowAssign(e, centers).select("vec_id", "cluster")
      .except(foldAssign(e, centers).select("vec_id", "cluster")).count()
    println(s"[q126ab] assignment diff rows (must be 0): $diff")
    require(diff == 0, "fold argmin diverged from window argmin")
    def meansOf(assigned: DataFrame): DataFrame = assigned
      .select(col("cluster"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("cluster"), col("pos"))
      .agg(count(lit(1)).as("n"),
        sum(col("v").cast("double").cast("decimal(20,10)"))
          .cast("double").as("sum_v"))
    time3("assign window (r9)")(windowAssign(e, centers))
    time3("assign fold   (r10)")(foldAssign(e, centers))
    time3("means window (r9)")(meansOf(windowAssign(e, centers)))
    time3("means fold   (r10)")(meansOf(foldAssign(e, centers)))
    if (sys.env.contains("SPARK_GRAFT_EXPLAIN")) {
      println("===== means-fold plan")
      meansOf(foldAssign(e, centers)).explain("formatted")
    }
    time3("kmeans4 window (r9)")(lloyd(e, windowAssign, 8, 4))
    time3("kmeans4 fold   (r10)")(lloyd(e, foldAssign, 8, 4))
    spark.stop()
  }
}
