package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.PQuant

/** 10× scale evidence for q135/q136 (the ScaleDryRun replication
  * recipe): replicate the sf0.1 embedding store REP× with distinct
  * vec_ids, then time the three PQ stages separately at 1× and REP× —
  * codebook training (bounded driver collects, 2 Lloyd rounds over the
  * corpus), the zero-exchange encode scan, and ADC top-k scoring.
  * Training and encode are corpus-linear single scans; the recorded
  * ratios belong in BASELINE.md round-10.
  *
  * Replica vectors are identical to base vectors (only ids shift), so
  * codebooks trained on the replicated corpus see the same value
  * distribution — the timing compares equal work per row, not a
  * degenerate skew.
  */
object PQDryRun {

  private def time3(label: String)(mk: => DataFrame): Double = {
    val ts = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      mk.queryExecution.toRdd.count(): Unit
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[pqdry] $label min=${ts.min}%.3f " +
      f"samples=${ts.map(t => f"$t%.2f").mkString(",")}")
    ts.min
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val rep = sys.env.getOrElse("SPARK_GRAFT_REP", "10").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = graft.Tables.embeddings(spark, sfDir)
      .filter(col("embedding").isNotNull)
      .select(col("vec_id"), col("embedding"))
    Seq(1, rep).foreach { r =>
      val e = (if (r <= 1) base
        else base.crossJoin(spark.range(r).select(col("id").as("rr")))
          .select((col("vec_id") * r + col("rr")).as("vec_id"),
            col("embedding")))
        .repartition(cpus.toInt).persist()
      val n = e.count()
      println(s"[pqdry] rep=$r vectors=$n")
      // training wall-clock: the call itself runs the Lloyd jobs eagerly
      // (bounded per-round collects), so wall time IS the train cost
      val tTrain = {
        val ts = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          PQuant.pqCodebooks(e).collect(): Unit
          (System.nanoTime() - t0) / 1e9
        }
        println(f"[pqdry] train rep=$r min=${ts.min}%.3f " +
          f"samples=${ts.map(t => f"$t%.2f").mkString(",")}")
        ts.min
      }
      val books = PQuant.pqCodebooks(e)
      val tEnc = time3(s"encode rep=$r")(PQuant.encode(e, books))
      val tAdc = time3(s"adc_topk rep=$r")(PQuant.adcTopK(e, books))
      println(f"[pqdry] rep=$r train=$tTrain%.3f encode=$tEnc%.3f " +
        f"adc=$tAdc%.3f")
      e.unpersist(): Unit
    }
    spark.stop()
  }
}
