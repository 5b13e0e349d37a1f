package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Tokenize

/** Behavioral laws of the round-9 tokenizer/LM operators beyond the
  * hash oracle: BPE learning picks the right merges on a constructed
  * corpus, application is lossless and actually compresses, and the
  * reference-LM score separates in-distribution from out-of-
  * distribution text. */
class TokenizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bpeLearn: first merge is the most frequent adjacent pair; freqs non-increasing") {
    // 'ab' appears inside every word of the dominant type (freq 50)
    val docs = (
      Seq.fill(50)((1L, "abcd abcd")) ++ Seq.fill(3)((2L, "xyz"))
    ).zipWithIndex.map { case ((_, t), i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val m = Tokenize.bpeLearn(docs, n = 4)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    // word "abcd" has pairs (a b), (b c), (c d) each with weight 100;
    // tie-break ascending picks "a b" first, then chains
    assert(m(0)._2 == "a b" && m(0)._3 == "ab" && m(0)._4 == 100L,
      s"unexpected first merge: ${m(0)}")
    // follow-on merges absorb the same dominant word
    assert(m(1)._2 == "ab c" && m(2)._2 == "abc d", s"chain: ${m.toSeq}")
    // learned frequencies never increase with rank on this corpus
    assert(m.map(_._4).sliding(2).forall(s => s(0) >= s(1)))
  }

  test("bpeApply: lossless (concat of subwords = word) and compresses the trained word") {
    val docs = Seq.fill(30)("abcd abcd").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val merges = Tokenize.mergesOf(Tokenize.bpeLearn(docs, n = 3))
    assert(merges.nonEmpty)
    val words = Seq("abcd", "abcde", "zzz", "a").toDF("word")
    val out = words
      .select(col("word"), Tokenize.bpeApply(col("word"), merges).as("sub"))
      .as[(String, Seq[String])].collect().toMap
    out.foreach { case (w, sub) =>
      assert(sub.mkString("") == w, s"lossy encoding of $w: $sub")
    }
    // the fully-trained word collapses to one symbol; unseen stays chars
    assert(out("abcd") == Seq("abcd"))
    assert(out("zzz") == Seq("z", "z", "z"))
    // a word EXTENDING the trained one reuses the learned prefix symbol
    assert(out("abcde").head == "abcd" || out("abcde").head == "abc",
      s"no learned prefix reuse: ${out("abcde")}")
  }

  test("bpeApply never merges across the sentinel word boundary") {
    val docs = Seq.fill(20)("ab ab").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val merges = Tokenize.mergesOf(Tokenize.bpeLearn(docs, n = 2))
    // applying to a word whose SUFFIX+next-word-PREFIX would form the
    // pair must not fuse them: each word is encoded independently
    val out = Seq("ba").toDF("word")
      .select(Tokenize.bpeApply(col("word"), merges).as("s"))
      .as[Seq[String]].head()
    assert(out == Seq("b", "a"), s"boundary leak: $out")
  }

  test("lmScore: in-distribution docs score lower NLL than out-of-distribution") {
    val ref = (0 until 40).map(i =>
      (i.toLong, "src0", "the cat sat on the mat and the cat ran"))
    val ood = (100 until 110).map(i =>
      (i.toLong, "srcX", "qq ww ee rr tt yy uu ii oo pp"))
    val ind = (200 until 210).map(i =>
      (i.toLong, "srcY", "the cat sat on the mat"))
    val docs = (ref ++ ood ++ ind).toDF("doc_id", "source", "text")
    val out = Tokenize.lmScore(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val avgOod = (100 until 110).map(i => out(i.toLong)).sum / 10
    val avgInd = (200 until 210).map(i => out(i.toLong)).sum / 10
    assert(avgInd < avgOod,
      f"in-distribution $avgInd%.3f should beat OOD $avgOod%.3f")
    // every transition of a doc made ONLY of reference bigrams is seen
    // -> strictly below the unseen-history ceiling ln(V_types)
    assert(avgInd < math.log(8.0), s"seen bigrams scored as unseen: $avgInd")
  }

  test("subwordPack: counts match per-word bpeApply, packs are contiguous per source") {
    val docs = Tables.documents(spark, TestSpark.sf0001).limit(120)
    val out = Tokenize.subwordPack(docs).cache()
    try {
      // n_subtoks agrees with summing bpeApply over exploded words —
      // the whole-text 3-space-boundary encoding must equal per-word
      // encoding, doc by doc
      val merges = Tokenize.mergesOf(Tokenize.bpeLearn(docs))
      val perWord = docs.filter(col("text").isNotNull)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .filter(length(col("w")) > 0)
        .select(col("doc_id"),
          size(Tokenize.bpeApply(col("w"), merges)).cast("long").as("n"))
        .groupBy("doc_id").agg(sum(col("n")).as("n_subtoks"))
        .as[(Long, Long)].collect().toMap
      val got = out.select("doc_id", "n_subtoks").as[(Long, Long)]
        .collect().toMap
      perWord.foreach { case (id, n) =>
        assert(got(id) == n, s"doc $id whole-text $n vs per-word ${got(id)}")
      }
      // subwords never exceed whitespace tokens × word length; at least
      // some compression must have happened on a natural corpus
      val ws = docs.filter(col("text").isNotNull)
        .select(sum(size(split(col("text"), " ")).cast("long")))
        .head.getLong(0)
      val sub = out.agg(sum(col("n_subtoks"))).head.getLong(0)
      assert(sub > ws, "subword count should exceed word count pre-merge-saturation")
      // start offsets are a per-source exact prefix sum
      val rows = out.select("source", "doc_id", "n_subtoks", "start_off")
        .as[(String, Long, Long, Long)].collect()
        .groupBy(_._1)
      rows.foreach { case (_, ds) =>
        val sorted = ds.sortBy(_._2)
        sorted.foldLeft(0L) { case (acc, (_, _, n, off)) =>
          assert(off == acc, s"offset gap: $off vs $acc"); acc + n
        }
      }
    } finally { out.unpersist(); () }
  }

  test("lmScore is repartition-invariant and covers every non-null doc with >= 2 tokens") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val a = Tokenize.lmScore(docs).collect().map(_.toString).sorted
    val b = Tokenize.lmScore(docs.repartition(7)).collect().map(_.toString).sorted
    assert(a.sameElements(b))
    val expected = docs.filter(col("text").isNotNull &&
      size(split(col("text"), " ")) >= 2).count()
    assert(a.length == expected)
  }

  test("q150 fertility: zero merges means chars-per-word; merges only reduce it") {
    import spark.implicits._
    val docs = Seq((1L, "en", "ab cd", "s0"), (2L, "en", "abc de", "s0"),
      (3L, "fr", "abcdef", "s0"))
      .toDF("doc_id", "lang", "text", "source")
    // no merges: every char is one subword -> fertility = Σchars/Σwords
    val base = queries.Tokenize.tokenizerFertility(docs, Seq.empty)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // en: chars 4+5=9 over words 2+2=4 -> 2.25e6; fr: 6/1 -> 6e6
    assert(base("en") == ((2L, 9L, 4L, 2250000L)))
    assert(base("fr") == ((1L, 6L, 1L, 6000000L)))
    // learned merges can only fuse symbols: fertility never increases
    val merges = queries.Tokenize.mergesOf(queries.Tokenize.bpeLearn(docs, 4))
    val merged = queries.Tokenize.tokenizerFertility(docs, merges)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(merged("en") <= 2250000L && merged("fr") <= 6000000L)
  }
}
