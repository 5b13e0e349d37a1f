package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.DataMix

/** Behavioral checks for the corpus-composition operators (q109/q110).
  * Oracle hash parity is the driver's gate; these assert the invariants
  * a hash can't express: the importance weight actually upweights
  * target-looking documents, the selection flag is exactly the
  * above-mean half, the integer sqrt is exact at its rounding hazards,
  * the greedy fill is budget-maximal, and α=½ really flattens the mix
  * (small sources keep a larger fraction of themselves than big ones).
  */
class DataMixSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  val dir = TestSpark.sf0001

  // ---- q109 dsir_weights ----

  test("q109: target-domain-looking docs outscore off-domain docs") {
    // en docs speak "alpha", de docs speak "beta"; the mixed doc sits
    // between. p_tgt(alpha) >> p_raw(alpha) so alpha-heavy docs win.
    val d = Seq(
      (1L, "en", "alpha alpha alpha alpha"),
      (2L, "en", "alpha alpha alpha beta"),
      (3L, "de", "beta beta beta beta"),
      (4L, "de", "alpha beta beta beta")).toDF("doc_id", "lang", "text")
    val out = DataMix.dsirWeights(d).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out(1L) > out(2L), "pure-alpha must beat mixed en")
    assert(out(2L) > out(4L) && out(4L) > out(3L),
      s"score must be monotone in alpha share: $out")
    // the de doc that borrows target vocabulary outranks the pure-beta
    // one — the weight tracks CONTENT, not the lang label
    assert(out(4L) > out(3L))
  }

  test("q109: selected is exactly the above-corpus-mean half") {
    val out = DataMix.dsirWeights(Tables.documents(spark, dir)).cache()
    try {
      val rows = out.select("score_k", "selected").collect()
      val n = rows.length.toLong
      val sum = rows.map(_.getLong(0)).sum
      rows.foreach { r =>
        val expect = if (r.getLong(0) * n >= sum) 1 else 0
        assert(r.getInt(1) == expect, s"selected flag disagrees at $r")
      }
      assert(rows.exists(_.getInt(1) == 1) && rows.exists(_.getInt(1) == 0),
        "fixture should straddle the mean")
    } finally out.unpersist()
  }

  test("q109: partitioning-invariant (pure function of the corpus)") {
    val d = Tables.documents(spark, dir)
    val a = DataMix.dsirWeights(d).collect().toSet
    val b = DataMix.dsirWeights(d.repartition(7)).collect().toSet
    assert(a == b)
  }

  // ---- q110 source_mix ----

  test("isqrt expression is exact at perfect squares and k^2 - 1") {
    // floor(sqrt(x)) in doubles rounds UP past the square at e.g.
    // (2^26+1)^2 - 1; the corrected expression must not
    val cases = Seq(0L, 1L, 3L, 4L, 15L, 16L, 17L,
      (1L << 52) - 1, 1L << 52,
      4503599761588224L /* (2^26+1)^2 */, 4503599761588223L /* -1 */)
    val got = cases.toDF("n")
      .selectExpr("n", DataMix.isqrtExpr("n") + " AS s").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    cases.foreach { n =>
      val s = got(n)
      assert(s * s <= n && (s + 1) * (s + 1) > n, s"isqrt($n) = $s wrong")
    }
  }

  test("q110: per-source fill is within budget and greedy-maximal") {
    val out = DataMix.sourceMix(Tables.documents(spark, dir)).cache()
    try {
      // within budget
      assert(out.filter(col("cum_tok") > col("budget")).count() == 0)
      // maximal: the selected prefix is contiguous in rnk, and the next
      // ranked doc (if any) would overflow the budget
      val bySrc = out.groupBy("source").agg(
        max(col("rnk")).as("max_rnk"), count(lit(1)).as("n_sel"),
        max(col("cum_tok")).as("sel_tok"), max(col("budget")).as("budget"))
        .collect()
      bySrc.foreach { r =>
        assert(r.getAs[Int]("max_rnk").toLong == r.getAs[Long]("n_sel"),
          s"selected ranks not a prefix: $r")
      }
      val docs = Tables.documents(spark, dir)
        .filter(col("text").isNotNull && col("source").isNotNull)
        .select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tok"))
      val perSrcDocs = docs.groupBy("source").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      bySrc.foreach { r =>
        val src = r.getAs[String]("source")
        val nSel = r.getAs[Long]("n_sel")
        if (nSel < perSrcDocs(src)) {
          // find the (nSel+1)-th doc's tokens via a fresh ranking
          val h = md5(concat(lit("mix|"), col("doc_id").cast("string")))
          val next = docs.filter(col("source") === src)
            .withColumn("rnk", row_number().over(
              org.apache.spark.sql.expressions.Window
                .partitionBy(col("source")).orderBy(h.asc, col("doc_id").asc)))
            .filter(col("rnk") === nSel + 1)
            .select("n_tok").collect().head.getLong(0)
          assert(r.getAs[Long]("sel_tok") + next > r.getAs[Long]("budget"),
            s"fill for $src not maximal")
        }
      }
    } finally out.unpersist()
  }

  test("q110: alpha=1/2 flattens the mix — small source keeps a larger " +
    "fraction of itself than a 100x bigger one") {
    val big = (1L to 400L).map(i => (i, "big", "t " * 25 + "t"))
    val small = (1001L to 1004L).map(i => (i, "small", "t " * 25 + "t"))
    val d = (big ++ small).toDF("doc_id", "source", "text")
    val out = DataMix.sourceMix(d)
      .groupBy("source").agg(sum(col("n_tok")).as("kept")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val keptBig = out.getOrElse("big", 0L).toDouble / (400 * 26)
    val keptSmall = out.getOrElse("small", 0L).toDouble / (4 * 26)
    assert(keptSmall > keptBig,
      s"small-source fraction $keptSmall <= big-source fraction $keptBig")
  }

  // ---- q114 curriculum ----

  private def currFixture = {
    // 4 sources x 25 docs with a quality spread: doc i of source s has
    // i 'the' stopwords against a fixed filler, so quality rises with i
    (0 until 4).flatMap { s =>
      (0 until 25).map { i =>
        val text = (Seq.fill(i)("the") ++ (0 until 25 - i).map(j => s"w${s}_${i}_$j"))
          .mkString(" ")
        (s * 100L + i, s"src$s", text.length.toLong, text)
      }
    }.toDF("doc_id", "source", "n_chars", "text")
  }

  test("q114: stages are quality-monotone (clean-to-noisy) and cover every doc") {
    val out = DataMix.curriculumOrder(currFixture)
      .select("doc_id", "quality", "stage").as[(Long, Double, Int)].collect()
    assert(out.length == 100 && out.map(_._1).distinct.length == 100)
    val byStage = out.groupBy(_._3).view.mapValues(_.map(_._2)).toMap
    val stages = byStage.keys.toSeq.sorted
    for (Seq(a, b) <- stages.sliding(2).toSeq if byStage.contains(b))
      assert(byStage(a).min >= byStage(b).max,
        s"stage $a (cleaner) must not rank below stage $b")
  }

  test("q114: the head of every stage round-robins across its sources") {
    val rows = DataMix.curriculumOrder(currFixture)
      .select("stage", "stage_order", "source", "src_seq")
      .as[(Int, Int, String, Int)].collect()
    rows.groupBy(_._1).foreach { case (_, inStage) =>
      val nSrc = inStage.map(_._3).distinct.length
      val head = inStage.sortBy(_._2).take(nSrc)
      assert(head.map(_._3).distinct.length == nSrc,
        s"first $nSrc slots must visit $nSrc distinct sources, got ${head.map(_._3).toSeq}")
      assert(head.forall(_._4 == 1), "head slots must be each source's first pick")
    }
  }

  test("q114: deterministic under repartitioning") {
    val a = DataMix.curriculumOrder(currFixture).collect().map(_.toString).sorted
    val b = DataMix.curriculumOrder(currFixture.repartition(7))
      .collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("q110: partitioning-invariant and deterministic") {
    val d = Tables.documents(spark, dir)
    val a = DataMix.sourceMix(d).collect().toSet
    val b = DataMix.sourceMix(d.repartition(7)).collect().toSet
    assert(a == b)
  }
}
