package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.PQuant

/** q135 PQ encode + q136 ADC top-k: codebook/code well-formedness, the
  * ADC ≡ distance-to-reconstruction identity (the algebra product
  * quantization rests on — squared L2 decomposes over subspaces, so the
  * table-lookup sum IS the exact distance to the reconstructed vector),
  * and recall floors vs an exact squared-L2 replay (measured values
  * recorded in BASELINE.md round-10).
  */
class PQuantSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val mSub = PQuant.mSub
  private val subDim = PQuant.subDim
  private val kCodes = PQuant.kCodes

  private lazy val vecs: Map[Long, Array[Float]] =
    Tables.embeddings(spark, TestSpark.sf0001)
      .filter(col("embedding").isNotNull)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().toMap

  // (s, center_id) -> centroid, from the production training seam
  private lazy val books: Map[(Int, Int), Array[Double]] =
    PQuant.pqCodebooks(Tables.embeddings(spark, TestSpark.sf0001))
      .as[(Int, Int, Array[Double])].collect()
      .map { case (s, cid, c) => (s, cid) -> c }.toMap

  private lazy val codes: Map[Long, Array[Int]] =
    PQuant.q135.run(spark, TestSpark.sf0001)
      .as[(Long, String)].collect()
      .map { case (id, cs) => id -> cs.split(",").map(_.toInt) }.toMap

  // index-ordered squared-L2 fold between a query's subspace slice and a
  // centroid — the exact arithmetic shape both engines pin
  private def subDist(q: Array[Float], s: Int, c: Array[Double]): Double = {
    var acc = 0.0; var i = 0
    while (i < c.length) {
      val v = q(s * subDim + i).toDouble - c(i)
      acc += v * v; i += 1
    }
    acc
  }

  // ADC of candidate `nid` against query `q`: mSub table entries summed
  // in subspace order, starting from 0.0 (the engine's outer fold)
  private def adc(q: Array[Float], nid: Long): Double = {
    var acc = 0.0; var s = 0
    val cs = codes(nid)
    while (s < mSub) { acc += subDist(q, s, books((s, cs(s)))); s += 1 }
    acc
  }

  test("q135: every vector carries mSub valid codes; every subspace trains a codebook") {
    assert(codes.size == vecs.size)
    assert(codes.values.forall(_.length == mSub))
    val bySub = books.keys.groupBy(_._1).view.mapValues(_.size).toMap
    assert(bySub.keySet == (0 until mSub).toSet)
    // no empty-cluster collapse on the fixture: all k codewords survive
    assert(bySub.values.forall(_ == kCodes), s"codebook sizes: $bySub")
    assert(books.values.forall(_.length == subDim))
    codes.values.foreach(cs => cs.zipWithIndex.foreach { case (c, s) =>
      assert(books.contains((s, c)), s"code $c not in subspace-$s codebook")
    })
  }

  test("q136: ADC equals the exact squared-L2 to the PQ reconstruction, bit-for-bit") {
    val out = PQuant.q136.run(spark, TestSpark.sf0001)
      .select("qid", "nid", "adc", "rnk")
      .as[(Long, Long, Double, Int)].collect()
    assert(out.length == 30)
    out.foreach { case (qid, nid, got, _) =>
      // identical fold order + identical doubles => identical bits
      assert(got == adc(vecs(qid), nid),
        s"ADC mismatch for q=$qid n=$nid: engine $got vs replay ${adc(vecs(qid), nid)}")
      // and that IS the distance to the reconstructed vector: summing
      // per-subspace distances to the chosen codewords is the full
      // 64-dim distance to their concatenation (disjoint index ranges)
      val recon = (0 until mSub).flatMap(s => books((s, codes(nid)(s)))).toArray
      var full = 0.0
      for (s <- 0 until mSub) {
        var acc = 0.0
        var i = 0
        while (i < subDim) {
          val v = vecs(qid)(s * subDim + i).toDouble - recon(s * subDim + i)
          acc += v * v; i += 1
        }
        full += acc
      }
      assert(got == full)
    }
    // per-query ordering: rnk follows (adc asc, nid asc)
    out.groupBy(_._1).values.foreach { rows =>
      val sorted = rows.sortBy(_._4)
      assert(sorted.map(r => (r._3, r._2)).sameElements(
        sorted.map(r => (r._3, r._2)).sortBy(identity)))
    }
  }

  test("q135 streaming twin: micro-batch PQ encode equals the batch answer") {
    import java.nio.file.Files
    val emb = Tables.embeddings(spark, TestSpark.sf0001)
    // split arrivals across two files → two micro-batches
    val inDir = Files.createTempDirectory("pq_in").toString
    emb.filter(col("vec_id") % 2 === 0).coalesce(1)
      .write.mode("overwrite").parquet(s"$inDir/f0")
    emb.filter(col("vec_id") % 2 === 1).coalesce(1)
      .write.mode("overwrite").parquet(s"$inDir/f1")
    val streamDir = Files.createTempDirectory("pq_stream").toString
    var i = 0
    Seq("f0", "f1").foreach { f =>
      Files.list(java.nio.file.Paths.get(s"$inDir/$f")).forEach { p =>
        if (p.toString.endsWith(".parquet")) {
          Files.copy(p, java.nio.file.Paths.get(s"$streamDir/part_$i.parquet"))
          i += 1
        }
      }
    }
    val outDir = Files.createTempDirectory("pq_out").toString
    val ckpt = Files.createTempDirectory("pq_ckpt").toString
    val q = graft.streaming.DocStreams.pqEncodeSink(
      graft.streaming.DocStreams.readDocs(spark, streamDir), emb, outDir, ckpt)
    q.processAllAvailable()
    q.stop()
    val got = spark.read.parquet(s"$outDir/batch_*")
    val want = PQuant.q135.run(spark, TestSpark.sf0001)
    assert(got.count() == want.count())
    assert(got.exceptAll(want).count() == 0)
    assert(want.exceptAll(got).count() == 0,
      "per-batch PQ codes must concatenate to the batch answer")
  }

  test("q137: candidates come only from probed cells; residual recall beats plain PQ") {
    def sqL2(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); acc += d * d; i += 1 }
      acc
    }
    val e = Tables.embeddings(spark, TestSpark.sf0001)
      .filter(col("embedding").isNotNull)
      .select(col("vec_id"), col("embedding"))
    val cents = graft.queries.Learn
      .kmeansCenters(e, k = PQuant.ivfCells, iters = PQuant.ivfIters)
      .as[(Int, Array[Double])].collect().sortBy(_._1)
    def nearestCells(v: Array[Double], n: Int): Seq[Int] =
      cents.map { case (cid, c) => (cid, sqL2(v, c)) }
        .sortBy { case (cid, d) => (d, cid) }.take(n).map(_._1).toSeq
    val dbl = vecs.view.mapValues(_.map(_.toDouble)).toMap
    val out = PQuant.q137.run(spark, TestSpark.sf0001)
      .select("qid", "nid", "adc", "rnk")
      .as[(Long, Long, Double, Int)].collect()
    assert(out.length == 30)
    out.foreach { case (qid, nid, adc, _) =>
      assert(adc >= 0.0)
      // the candidate's own cell must be among the query's probes —
      // IVF-PQ never scans an unprobed cell
      val probed = nearestCells(dbl(qid), PQuant.nProbe).toSet
      assert(probed.contains(nearestCells(dbl(nid), 1).head),
        s"candidate $nid for query $qid sits in an unprobed cell")
    }
    // recall vs exact full-scan top-10: the residual quantization should
    // beat plain PQ (q136) on the same fixture despite scanning only
    // nProbe/nCells of it (measured 0.60 vs 0.20 — BASELINE.md round-10)
    def exactTop(qid: Long): Set[Long] =
      dbl.iterator.filter(_._1 != qid)
        .map { case (id, v) => (id, sqL2(dbl(qid), v)) }
        .toSeq.sortBy { case (id, d) => (d, id) }.take(10).map(_._1).toSet
    val byQ = out.groupBy(_._1)
    val rec = Seq(0L, 1L, 2L).map { q =>
      (exactTop(q) & byQ(q).map(_._2).toSet).size / 10.0
    }
    info(f"IVF-PQ recall@10 ${rec.sum / 3}%.2f per-query $rec")
    assert(rec.sum / 3 >= 0.2, s"mean IVF-PQ recall ${rec.sum / 3} below floor")
  }

  test("q138: rerank equals exact top-10 restricted to the ADC shortlist") {
    def sq(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) {
        val d = a(i).toDouble - b(i).toDouble; acc += d * d; i += 1
      }
      acc
    }
    val out = PQuant.q138.run(spark, TestSpark.sf0001)
      .select("qid", "nid", "dist_sq", "rnk")
      .as[(Long, Long, Double, Int)].collect()
    assert(out.length == 30)
    // independent replay: ADC shortlist (driver-side, same fold) →
    // exact rerank. Tier 2 must agree with plain exact distance.
    Seq(0L, 1L, 2L).foreach { qid =>
      val short = vecs.keysIterator.filter(_ != qid)
        .map(id => (id, adc(vecs(qid), id))).toSeq
        .sortBy { case (id, d) => (d, id) }.take(PQuant.shortN).map(_._1)
      val want = short.map(id => (id, sq(vecs(qid), vecs(id))))
        .sortBy { case (id, d) => (d, id) }.take(10)
      val got = out.filter(_._1 == qid).sortBy(_._4)
        .map { case (_, nid, d, _) => (nid, d) }.toSeq
      assert(got == want,
        s"rerank for query $qid diverges from the exact-on-shortlist replay")
    }
  }

  test("q136: recall floors vs the exact squared-L2 top-10 hold") {
    def exactTop(qid: Long, n: Int): Set[Long] = {
      val q = vecs(qid)
      vecs.iterator.filter(_._1 != qid).map { case (id, v) =>
        var acc = 0.0; var i = 0
        while (i < v.length) {
          val d = q(i).toDouble - v(i).toDouble; acc += d * d; i += 1
        }
        (id, acc)
      }.toSeq.sortBy { case (id, d) => (d, id) }.take(n).map(_._1).toSet
    }
    def adcTop(qid: Long, n: Int): Set[Long] = {
      val q = vecs(qid)
      vecs.keysIterator.filter(_ != qid).map(id => (id, adc(q, id)))
        .toSeq.sortBy { case (id, d) => (d, id) }.take(n).map(_._1).toSet
    }
    val qids = Seq(0L, 1L, 2L)
    val r10 = qids.map(q => (exactTop(q, 10) & adcTop(q, 10)).size / 10.0)
    val r50 = qids.map(q => (exactTop(q, 10) & adcTop(q, 50)).size / 10.0)
    info(f"recall@10 ${r10.sum / 3}%.2f per-query $r10; " +
      f"exact-top10 coverage in ADC top-50 ${r50.sum / 3}%.2f per-query $r50")
    // measured 0.20 / 0.67 on the fixture (BASELINE.md round-10); loose
    // floors so fixture regeneration doesn't knife-edge the suite
    assert(r10.sum / 3 >= 0.1, s"mean recall@10 ${r10.sum / 3} below floor")
    assert(r50.sum / 3 >= 0.4, s"mean shortlist coverage ${r50.sum / 3} below floor")
  }
}
