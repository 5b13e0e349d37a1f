package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.SubstrDedup

/** Behavioral laws of q128 exact-substring spans: planted-span
  * recovery with exact offsets, run maximality (one island per shared
  * run, not per-gram fragments), and the cross-doc df cap. */
class SubstrDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docsOf(rows: Seq[(Long, String)]) =
    rows.map { case (id, t) => (id, t, "en", "srcX", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  private val run20 = (1 to 20).map(i => s"dup$i").mkString(" ")

  test("a planted 20-token shared run is recovered as ONE maximal span") {
    val docs = docsOf(Seq(
      (1L, s"alpha beta $run20 gamma delta"),
      (2L, s"x1 x2 x3 x4 x5 $run20 y1 y2"),
      (3L, "unrelated words only here nothing shared at all in this one")))
    val out = SubstrDedup.duplicateSpans(docs, k = 8, minLen = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // one span, doc 1 offset 2, doc 2 offset 5, exactly 20 tokens
    assert(out.toSeq == Seq((1L, 2L, 2L, 5L, 20L)),
      s"expected the planted span once, maximal; got ${out.toSeq}")
  }

  test("spans shorter than minLen are not emitted") {
    val run10 = (1 to 10).map(i => s"s$i").mkString(" ")
    val docs = docsOf(Seq(
      (1L, s"alpha beta $run10 gamma delta eps zeta eta theta"),
      (2L, s"p q r $run10 u v w x y z")))
    val out = SubstrDedup.duplicateSpans(docs, k = 8, minLen = 12)
    assert(out.count() == 0, "a 10-token run must not pass minLen=12")
  }

  test("a gram shared by more docs than dfCap is dropped as boilerplate") {
    val rows = (1L to 13L).map(i => (i, s"pre$i $run20 post$i"))
    val out = SubstrDedup.duplicateSpans(docsOf(rows), k = 8,
      minLen = 12, dfCap = 10)
    assert(out.count() == 0,
      "a run present in 13 docs exceeds dfCap=10 and must be pruned")
  }

  test("spans are deterministic under repartitioning") {
    val docs = Tables.documentsParallel(spark, TestSpark.sf0001)
    val a = SubstrDedup.duplicateSpans(docs)
    val b = SubstrDedup.duplicateSpans(docs.repartition(7))
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("q129 cuts the span from the LATER doc only; others pass through") {
    val docs = docsOf(Seq(
      (1L, s"alpha beta $run20 gamma delta"),
      (2L, s"x1 x2 x3 x4 x5 $run20 y1 y2"),
      (3L, "unrelated words only here nothing shared at all in this one")))
    val out = SubstrDedup.cutSpans(docs, k = 8, minLen = 12)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    // doc 1 (first occurrence) keeps everything
    assert(out(1L) == (24L, s"alpha beta $run20 gamma delta"))
    // doc 2 loses exactly the 20 shared tokens
    assert(out(2L) == (7L, "x1 x2 x3 x4 x5 y1 y2"))
    // doc 3 untouched
    assert(out(3L)._2.startsWith("unrelated words"))
  }
}
