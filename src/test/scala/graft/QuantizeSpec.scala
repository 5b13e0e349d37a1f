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

  test("q123: matches a plain-Scala replay exactly and preserves pair distances") {
    val out = queries.Quantize.q123.run(spark, TestSpark.sf0001)
      .as[(Long, Int, Double)].collect()
      .groupBy(_._1).map { case (id, rows) =>
        id -> rows.sortBy(_._2).map(_._3)
      }
    val vecs = Tables.embeddings(spark, TestSpark.sf0001)
      .filter(col("embedding").isNotNull)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().toMap
    val signs = queries.Quantize.jlSigns
    // exact replay: same left-to-right fold, same scale
    vecs.take(10).foreach { case (id, v) =>
      val expect = signs.map { row =>
        var s = 0.0; var i = 0
        while (i < v.length) { s += v(i).toDouble * row(i); i += 1 }
        s / math.sqrt(16.0)
      }
      assert(out(id).toSeq == expect,
        s"vec $id projection diverges from replay")
    }
    // JL bound, averaged: squared pair distances preserved within 30%
    val ids = vecs.keys.toSeq.sorted.take(40)
    val ratios = for {
      a <- ids; b <- ids if a < b
    } yield {
      val (va, vb) = (vecs(a), vecs(b))
      val orig = va.indices.map(i =>
        math.pow(va(i).toDouble - vb(i).toDouble, 2)).sum
      val proj = out(a).indices.map(j =>
        math.pow(out(a)(j) - out(b)(j), 2)).sum
      proj / orig
    }
    val mean = ratios.sum / ratios.size
    assert(mean > 0.7 && mean < 1.3,
      s"JL mean distance ratio $mean outside [0.7, 1.3]")
  }

  test("q122: deltas reconstruct the exact per-segment doc sets, lists bounded") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val out = queries.Retrieval.invertedPostings(docs, segSize = 100)
      .select(col("token"), col("segment"), col("seg_df"), col("deltas"))
      .as[(String, Long, Long, String)].collect()
    // independent truth: token -> docs containing it
    val truth = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0).distinct()
      .as[(Long, String)].collect()
      .groupBy(_._2).map { case (t, rows) => t -> rows.map(_._1).toSet }
    out.groupBy(_._1).foreach { case (token, segs) =>
      val rebuilt = segs.flatMap { case (_, _, df, deltas) =>
        val gaps = deltas.split(",").map(_.toLong)
        assert(gaps.length == df, s"$token: seg_df != list length")
        assert(gaps.length <= 100, s"$token: segment list exceeds segSize")
        gaps.scanLeft(0L)(_ + _).drop(1) // cumulative: absolute doc ids
      }.toSet
      assert(rebuilt == truth(token),
        s"$token: postings reconstruct ${rebuilt.size} docs, truth ${truth(token).size}")
    }
    assert(out.map(_._1).toSet == truth.keySet, "vocabulary mismatch")
  }

  test("q124: (old index - touched keys) union update == full rebuild") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val corpus = docs.filter(col("doc_id") % 10 =!= 7)
    val batch = docs.filter(col("doc_id") % 10 === 7)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("token"), col("segment"), col("seg_df"),
          col("seg_tf"), col("deltas"))
        .as[(String, Long, Long, Long, String)].collect().toSet
    val old = rows(queries.Retrieval.invertedPostings(corpus))
    val update = rows(queries.Retrieval.postingsUpdate(corpus, batch))
    val full = rows(queries.Retrieval.invertedPostings(
      corpus.unionByName(batch)))
    val touchedKeys = update.map(r => (r._1, r._2))
    val patched = old.filterNot(r => touchedKeys((r._1, r._2))) ++ update
    assert(patched == full,
      s"patch law broken: ${(patched diff full).size} extra, " +
        s"${(full diff patched).size} missing")
    // the update only contains keys the batch actually touches
    val batchKeys = rows(queries.Retrieval.invertedPostings(batch))
      .map(r => (r._1, r._2))
    assert(touchedKeys == batchKeys, "touched set != batch key set")
  }
}
