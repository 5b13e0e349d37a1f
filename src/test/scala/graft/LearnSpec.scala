package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Learn

/** Behavioral tests for the learned-model operators (q125 NB
  * classifier, q126 Lloyd k-means). Oracle parity is covered by the
  * driver gate; these pin the LEARNING behavior on separable synthetic
  * fixtures (the registry fixture's lang labels are uncorrelated with
  * its shared-vocabulary text, so fixture accuracy only reflects the
  * class prior — by design not asserted here).
  */
class LearnSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docsOf(rows: Seq[(Long, String, String)]) =
    rows.map { case (id, lang, text) => (id, text, lang, "srcX", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("q125 NB learns a separable vocabulary: held-out accuracy 1.0") {
    // three classes with disjoint vocabularies; doc_id % 5 == 0 held out
    val words = Map("aa" -> "alpha beta gamma", "bb" -> "delta eps zeta",
      "cc" -> "eta theta iota")
    val rows = (0L until 60L).map { i =>
      val lang = Seq("aa", "bb", "cc")((i % 3).toInt)
      (i, lang, s"${words(lang)} ${words(lang)}")
    }
    val out = Learn.nbLangId(docsOf(rows)).cache()
    assert(out.count() == 12) // 60/5 held out
    assert(out.filter(!col("correct")).count() == 0,
      "disjoint vocabularies must classify perfectly")
    assert(out.filter(col("pred_lang") === col("true_lang")).count() == 12)
  }

  test("q125 scores exactly the held-out docs that have tokens") {
    val rows = Seq(
      (0L, "aa", "alpha beta"), (1L, "aa", "alpha alpha"),
      (2L, "bb", "delta eps"), (3L, "bb", "delta"),
      (4L, "bb", "eps eps"), (5L, "aa", "beta"),
      (10L, "aa", ""))  // held out but token-free: not scored
    val out = Learn.nbLangId(docsOf(rows))
    assert(out.select("doc_id").as[Long].collect().sorted.toSeq == Seq(0L, 5L))
    val preds = out.select("pred_lang").distinct().as[String].collect().toSet
    assert(preds.subsetOf(Set("aa", "bb")), "prediction outside train classes")
  }

  test("q126 k-means recovers well-separated blobs with full purity") {
    // 3 blobs far apart in 4-d; k=3, deterministic seeds land one per
    // blob is NOT guaranteed, but Lloyd converges to the blobs in 4
    // rounds from any seed split because inter-blob distance >> intra
    val blobs = Seq(
      (0, Seq(0.0, 0.0, 0.0, 0.0)), (1, Seq(100.0, 0.0, 0.0, 0.0)),
      (2, Seq(0.0, 100.0, 0.0, 0.0)))
    val rows = (0L until 90L).map { i =>
      val b = (i % 3).toInt
      val base = blobs(b)._2
      // deterministic jitter well inside the blob radius
      val jit = base.zipWithIndex.map { case (v, d) =>
        (v + ((i * 7 + d * 3) % 5).toDouble * 0.1).toFloat }
      (i, jit, b)
    }
    val emb = rows.toDF("vec_id", "embedding", "blob")
    val out = Learn.kmeans(emb, k = 3, iters = 4)
      .join(emb.select(col("vec_id"), col("blob")), "vec_id")
    // purity: every cluster maps to exactly one blob and vice versa
    val m = out.groupBy("cluster", "blob").count()
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(m.size == 3, s"expected a 1:1 cluster-blob map, got $m")
    assert(m.map(_._1).distinct.size == 3 && m.map(_._2).distinct.size == 3)
  }

  test("q125 streaming twin: micro-batch scoring equals the batch answer") {
    import java.nio.file.Files
    val docs = Tables.documents(spark, TestSpark.sf0001)
      .filter(col("text").isNotNull && col("lang").isNotNull)
    val trainDocs = docs.filter(col("doc_id") % 5 =!= 0)
    val heldOut = docs.filter(col("doc_id") % 5 === 0)
    // split the held-out docs across two files → two micro-batches
    val inDir = Files.createTempDirectory("nb_in").toString
    heldOut.filter(col("doc_id") % 2 === 0).coalesce(1)
      .write.mode("overwrite").parquet(s"$inDir/f0")
    heldOut.filter(col("doc_id") % 2 === 1).coalesce(1)
      .write.mode("overwrite").parquet(s"$inDir/f1")
    val streamDir = Files.createTempDirectory("nb_stream").toString
    var i = 0
    Seq("f0", "f1").foreach { f =>
      Files.list(java.nio.file.Paths.get(s"$inDir/$f")).forEach { p =>
        if (p.toString.endsWith(".parquet")) {
          Files.copy(p, java.nio.file.Paths.get(s"$streamDir/part_$i.parquet"))
          i += 1
        }
      }
    }
    val outDir = Files.createTempDirectory("nb_out").toString
    val ckpt = Files.createTempDirectory("nb_ckpt").toString
    val q = graft.streaming.DocStreams.nbScoreSink(
      graft.streaming.DocStreams.readDocs(spark, streamDir),
      trainDocs, outDir, ckpt)
    q.processAllAvailable()
    q.stop()
    val got = spark.read.parquet(s"$outDir/batch_*")
    val want = Learn.nbLangId(docs)
    assert(got.count() == want.count())
    assert(got.exceptAll(want).count() == 0)
    assert(want.exceptAll(got).count() == 0,
      "per-batch NB scoring must concatenate to the batch answer")
  }

  test("q126 streaming twin: micro-batch assignment equals the batch answer") {
    import java.nio.file.Files
    val emb = Tables.embeddings(spark, TestSpark.sf0001)
    // split arrivals across two files → two micro-batches
    val inDir = Files.createTempDirectory("km_in").toString
    emb.filter(col("vec_id") % 2 === 0).coalesce(1)
      .write.mode("overwrite").parquet(s"$inDir/f0")
    emb.filter(col("vec_id") % 2 === 1).coalesce(1)
      .write.mode("overwrite").parquet(s"$inDir/f1")
    val streamDir = Files.createTempDirectory("km_stream").toString
    var i = 0
    Seq("f0", "f1").foreach { f =>
      Files.list(java.nio.file.Paths.get(s"$inDir/$f")).forEach { p =>
        if (p.toString.endsWith(".parquet")) {
          Files.copy(p, java.nio.file.Paths.get(s"$streamDir/part_$i.parquet"))
          i += 1
        }
      }
    }
    val outDir = Files.createTempDirectory("km_out").toString
    val ckpt = Files.createTempDirectory("km_ckpt").toString
    val q = graft.streaming.DocStreams.kmeansAssignSink(
      graft.streaming.DocStreams.readDocs(spark, streamDir), emb, outDir, ckpt)
    q.processAllAvailable()
    q.stop()
    val got = spark.read.parquet(s"$outDir/batch_*")
    val want = Learn.kmeans(emb)
    assert(got.count() == want.count())
    assert(got.exceptAll(want).count() == 0)
    assert(want.exceptAll(got).count() == 0,
      "per-batch k-means assignment must concatenate to the batch answer")
  }

  test("q134 covariance recovers a hand-computed matrix exactly") {
    // dim0 = [1,2,3,4], dim1 = 2*dim0 (perfect correlation),
    // dim2 = const (zero variance, zero covariance with everything)
    val emb = Seq(
      (0L, Seq(1.0f, 2.0f, 5.0f), 0),
      (1L, Seq(2.0f, 4.0f, 5.0f), 0),
      (2L, Seq(3.0f, 6.0f, 5.0f), 0),
      (3L, Seq(4.0f, 8.0f, 5.0f), 0)
    ).toDF("vec_id", "embedding", "label")
    val got = Learn.embedCovariance(emb)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    // sample variance of [1,2,3,4] = 5/3
    val v = 5.0 / 3.0
    assert(math.abs(got((0, 0)) - v) < 1e-12)
    assert(math.abs(got((0, 1)) - 2 * v) < 1e-12) // cov(x, 2x) = 2 var
    assert(math.abs(got((1, 1)) - 4 * v) < 1e-12)
    assert(got((2, 2)) == 0.0 && got((0, 2)) == 0.0 && got((1, 2)) == 0.0)
    assert(got.size == 6, "upper triangle of a 3x3 has 6 entries")
  }

  test("q134 ragged arrays divide each cell by pos-i's own count") {
    // pos0 has 3 observations (n=3, mu=2); pos1 only 2 (n=2, mu=15).
    // Cell (i,j) must divide by nv[i] — the oracle's ma.n — not a
    // global max(n): (0,0)=2/(3-1)=1, (0,1)=5/(3-1)=2.5, (1,1)=50/(2-1)=50.
    val emb = Seq(
      (0L, Seq(1.0f, 10.0f)),
      (1L, Seq(2.0f, 20.0f)),
      (2L, Seq(3.0f))
    ).toDF("vec_id", "embedding")
    val got = Learn.embedCovariance(emb)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(math.abs(got((0, 0)) - 1.0) < 1e-12)
    assert(math.abs(got((0, 1)) - 2.5) < 1e-12)
    assert(math.abs(got((1, 1)) - 50.0) < 1e-12)
    assert(got.size == 3)
  }

  test("q134 accumulator twin is bit-identical to the explode plan") {
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val emb = Tables.embeddings(spark, TestSpark.sf0001)
    val a = key(Learn.embedCovariance(emb))
    val b = key(Learn.embedCovarianceAcc(emb))
    assert(a.keySet == b.keySet)
    assert(a.keys.forall(k => a(k) == b(k)),
      "accumulator drifted from the explode plan at full double precision")
    // ragged arrays: the per-position divisor contract must match too
    val ragged = Seq(
      (0L, Seq(1.0f, 10.0f)), (1L, Seq(2.0f, 20.0f)), (2L, Seq(3.0f))
    ).toDF("vec_id", "embedding")
    val ra = key(Learn.embedCovariance(ragged))
    val rb = key(Learn.embedCovarianceAcc(ragged))
    assert(ra == rb)
  }

  test("ZCA whitening: covariance of the whitened store is the identity") {
    val emb = Tables.embeddings(spark, TestSpark.sf0001)
    val white = Learn.zcaWhiten(emb)
      .select(col("vec_id"), col("whitened").as("embedding"))
    val cov = Learn.embedCovariance(white)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val offDiag = cov.filter { case ((i, j), _) => i != j }.values
    val diag = cov.filter { case ((i, j), _) => i == j }.values
    // exact identity is unreachable BY DESIGN: whitened covariance is
    // E·diag(λ/(λ+ε))·Eᵀ, whose off-diagonals are O(ε/λ) ~ 1e-4 at
    // eps=1e-5 on this fixture's eigenvalue range — the regularizer's
    // price, not a convergence failure (residual is sweep-invariant)
    assert(offDiag.forall(v => math.abs(v) < 1e-3),
      s"max off-diagonal ${offDiag.map(math.abs).max}")
    assert(diag.forall(v => math.abs(v - 1.0) < 1e-2),
      s"diagonal drifted: min ${diag.min}, max ${diag.max}")
  }

  test("q126 assignment is invariant under input repartitioning") {
    val emb = Tables.embeddings(spark, TestSpark.sf0001)
    val a = Learn.kmeans(emb, k = 4, iters = 2)
    val b = Learn.kmeans(emb.repartition(13), k = 4, iters = 2)
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0,
      "k-means must be deterministic: exact-decimal means + ordered folds")
  }
}
