package graft.tools

import org.apache.spark.sql.functions._

/** One-off stage breakdown for q238: times (a) the bitmap build+collect,
  * (b) the probe+filter pass alone, (c) the verification join + agg, and
  * (d) the full registry query, min-of-3 each, warm. Evidence for the
  * r17 fused-bitmap + spread-probe work. */
object Q238Probe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def hx(c: org.apache.spark.sql.Column) =
      md5(concat(lit("bf|"), c.cast("string")))
    def sliceOf(r: Int, h: org.apache.spark.sql.Column) =
      conv(substring(h, 1 + 5 * r, 5), 16, 10).cast("long")
    def timed(label: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[q238probe] $label%-28s min=${ts.min}%.3f " +
        ts.map(t => f"$t%.2f").mkString(","))
    }
    val facts = graft.Tables.lineitem(spark, dir).select(
      col("l_orderkey").as("k"), col("l_returnflag").as("flag"))
    val keys = graft.Tables.orders(spark, dir)
      .filter(col("o_totalprice") > 400000).select(col("o_orderkey").as("k"))
    // warm everything once
    graft.SparkEntry.queries("q238_bloom_semijoin")(spark, dir)
      .queryExecution.toRdd.count(): Unit
    timed("bits agg+collect") {
      keys.withColumn("hx", hx(col("k")))
        .select(explode(array((0 until 3).map(r =>
          sliceOf(r, col("hx"))): _*)).as("pos"))
        .select(expr("pos div 64").as("w"),
          expr("shiftleft(1L, CAST(pos % 64 AS INT))").as("b"))
        .groupBy(col("w")).agg(expr("bit_or(b)").as("bits"))
        .collect(): Unit
    }
    timed("probe md5 only (no spread)") {
      facts.withColumn("hx", hx(col("k")))
        .withColumn("h0", sliceOf(0, col("hx")))
        .withColumn("h1", sliceOf(1, col("hx")))
        .withColumn("h2", sliceOf(2, col("hx")))
        .queryExecution.toRdd.count(): Unit
    }
    timed("probe md5 only (spread)") {
      facts.repartition(32).withColumn("hx", hx(col("k")))
        .withColumn("h0", sliceOf(0, col("hx")))
        .withColumn("h1", sliceOf(1, col("hx")))
        .withColumn("h2", sliceOf(2, col("hx")))
        .queryExecution.toRdd.count(): Unit
    }
    val m = 1 << 20
    val words = new Array[Long](m >> 6)
    keys.withColumn("hx", hx(col("k")))
      .select(explode(array((0 until 3).map(r =>
        sliceOf(r, col("hx"))): _*)).as("pos"))
      .select(expr("pos div 64").as("w"),
        expr("shiftleft(1L, CAST(pos % 64 AS INT))").as("b"))
      .groupBy(col("w")).agg(expr("bit_or(b)").as("bits"))
      .collect()
      .foreach(r => words(r.getLong(0).toInt) = r.getLong(1))
    val bmDf = spark.createDataFrame(
      java.util.Collections.singletonList(
        org.apache.spark.sql.Row(words.toSeq)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("bm",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.LongType, containsNull = false)))))
    def spreadProbes = {
      val s0 = facts.repartition(32).withColumn("hx", hx(col("k")))
      (0 until 3).foldLeft(s0) { (df, r) =>
        df.withColumn(s"h$r", sliceOf(r, col("hx")))
      }
    }
    timed("probe+filter via crossJoin") {
      spreadProbes.crossJoin(broadcast(bmDf))
        .filter((0 until 3).map(r =>
          expr(s"element_at(bm, CAST(h$r div 64 AS INT) + 1)")
            .bitwiseAND(expr(s"shiftleft(1L, CAST(h$r % 64 AS INT))")) =!= 0L)
          .reduce(_ && _))
        .select(col("k"), col("flag"))
        .queryExecution.toRdd.count(): Unit
    }
    val bmLit = typedlit(words.toSeq)
    timed("probe+filter via literal") {
      spreadProbes
        .filter((0 until 3).map(r =>
          element_at(bmLit, expr(s"CAST(h$r div 64 AS INT) + 1"))
            .bitwiseAND(expr(s"shiftleft(1L, CAST(h$r % 64 AS INT))")) =!= 0L)
          .reduce(_ && _))
        .select(col("k"), col("flag"))
        .queryExecution.toRdd.count(): Unit
    }
    timed("probe+filter literal+barrier") {
      val h = facts.withColumn("hx", hx(col("k")))
      val hs = (0 until 3).foldLeft(h) { (df, r) =>
        df.withColumn(s"h$r", sliceOf(r, col("hx")))
      }.select(col("k"), col("flag"), col("h0"), col("h1"), col("h2"))
        .repartition(32)
      hs.filter((0 until 3).map(r =>
          element_at(bmLit, expr(s"CAST(h$r div 64 AS INT) + 1"))
            .bitwiseAND(expr(s"shiftleft(1L, CAST(h$r % 64 AS INT))")) =!= 0L)
          .reduce(_ && _))
        .select(col("k"), col("flag"))
        .queryExecution.toRdd.count(): Unit
    }
    timed("probe+verify lit+barrier") {
      val h = facts.withColumn("hx", hx(col("k")))
      val hs = (0 until 3).foldLeft(h) { (df, r) =>
        df.withColumn(s"h$r", sliceOf(r, col("hx")))
      }.select(col("k"), col("flag"), col("h0"), col("h1"), col("h2"))
        .repartition(32)
      hs.filter((0 until 3).map(r =>
          element_at(bmLit, expr(s"CAST(h$r div 64 AS INT) + 1"))
            .bitwiseAND(expr(s"shiftleft(1L, CAST(h$r % 64 AS INT))")) =!= 0L)
          .reduce(_ && _))
        .join(broadcast(keys.withColumn("hit", lit(1L))), Seq("k"), "left")
        .groupBy(col("flag"))
        .agg(count(lit(1)).as("n_pass"),
          sum(coalesce(col("hit"), lit(0L))).as("n_true"))
        .withColumn("n_false_pos", col("n_pass") - col("n_true"))
        .queryExecution.toRdd.count(): Unit
    }
    timed("full q238") {
      graft.SparkEntry.queries("q238_bloom_semijoin")(spark, dir)
        .queryExecution.toRdd.count(): Unit
    }
    timed("control canary") {
      graft.Tables.lineitem(spark, dir)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(sum("l_quantity"), count(lit(1)))
        .queryExecution.toRdd.count(): Unit
    }
    spark.stop()
  }
}
