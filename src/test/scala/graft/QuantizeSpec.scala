package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Quantize

/** q120 int8 quantization + q121 MMR selection: quantization-error
  * bounds, endpoint mapping, and an independent in-test replay of the
  * integer greedy. */
class QuantizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("q120: codes span exactly 0..255, error within the half-step bound") {
    val out = Quantize.q120.run(spark, TestSpark.sf0001).cache()
    try {
      val codes = out.select(col("vec_id"),
        split(col("codes"), ",").cast("array<int>").as("cl"), col("mse"))
      // every code in range; per-dim endpoints hit both rails
      val flat = codes.select(posexplode(col("cl")).as(Seq("i", "c")))
      val bad = flat.filter(col("c") < 0 || col("c") > 255).count()
      assert(bad == 0, "code outside 0..255")
      val rails = flat.groupBy("i")
        .agg(min(col("c")).as("lo"), max(col("c")).as("hi"))
        .filter(col("lo") =!= 0 || col("hi") =!= 255).count()
      assert(rails == 0, "a dim's min/max did not map to 0/255")
      // mse <= sum_dims (span_i / 510)^2 + slack: half-step worst case
      val e = Tables.embeddings(spark, TestSpark.sf0001)
        .filter(col("embedding").isNotNull)
      val bound = e.select(posexplode(col("embedding")).as(Seq("i", "x")))
        .groupBy("i").agg((max(col("x")) - min(col("x"))).as("span"))
        .select(sum(pow(col("span") / 510.0, 2.0))).head.getDouble(0)
      val worst = out.agg(max(col("mse"))).head.getDouble(0)
      assert(worst <= bound * 1.000001, s"mse $worst exceeds bound $bound")
    } finally { out.unpersist(); () }
  }

  test("q121: engine output equals an independent integer-greedy replay") {
    val got = Quantize.q121.run(spark, TestSpark.sf0001)
      .select("rank", "vec_id", "rel", "score")
      .as[(Int, Long, Long, Long)].collect().sortBy(_._1)
    // independent replay: plain Scala doubles, left-to-right dot folds
    // (the same index order vec_dot_f accumulates in)
    val vecs = Tables.embeddings(spark, TestSpark.sf0001)
      .filter(col("embedding").isNotNull)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().toMap
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    def cosMicro(a: Array[Float], b: Array[Float]): Long =
      math.round(dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
        * 1e6)
    val qv = vecs(0L)
    val cands = vecs.toSeq.collect { case (id, v) if id != 0L =>
      (id, cosMicro(v, qv))
    }.sortBy { case (id, rel) => (-rel, id) }.take(32)
    val sel = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long, Long)]
    (1 to 8).foreach { k =>
      val chosen = sel.map(_._2).toSet
      val best = cands.iterator.filterNot { case (id, _) => chosen(id) }
        .map { case (id, rel) =>
          val ms = if (chosen.isEmpty) 0L
            else chosen.iterator.map(s => cosMicro(vecs(id), vecs(s))).max
          (id, rel, 7 * rel - 3 * ms)
        }.minBy { case (id, _, sc) => (-sc, id) }
      sel += ((k, best._1, best._2, best._3))
    }
    assert(got.toSeq == sel.toSeq,
      s"engine MMR diverges from replay:\n${got.toSeq}\nvs\n${sel.toSeq}")
    // rank 1 is pure max-relevance with no diversity penalty
    assert(got.head._2 == cands.head._1)
    assert(got.head._4 == 7 * got.head._3)
  }
}
