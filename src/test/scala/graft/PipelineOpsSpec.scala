package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.PipelineOps

/** Semantic contracts for the q55–q58 pipeline operators, on crafted
  * frames (the oracle gate covers fixture parity; these pin the
  * invariants a user relies on). */
class PipelineOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("q55 decontamination flags exact and near duplicates of benchmark docs") {
    // doc 0 (%97==0) is "benchmark"; doc 1 copies it verbatim; doc 2
    // shares an 8-token run (near dup); doc 3 is unrelated
    val run = (0 until 12).map(i => s"w$i").mkString(" ")   // 12 tokens
    val docs = Seq(
      (0L, run),
      (1L, run),
      (2L, (0 until 8).map(i => s"w$i").mkString(" ") + " x1 x2 x3 x4"),
      (3L, (0 until 12).map(i => s"z$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = PipelineOps.decontaminate(docs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out(1L) == (5L, true))   // 12 tokens -> 5 distinct 8-grams, all shared
    assert(out(2L) == (1L, true))   // exactly the one shared 8-token run
    assert(out(3L) == (0L, false))
    assert(!out.contains(0L))       // benchmark docs are not scored
  }

  test("q56 chunks reassemble to the original text in chunk order") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
      .filter(col("text").isNotNull)
    val rebuilt = PipelineOps.chunk(docs)
      .groupBy("doc_id")
      .agg(concat_ws(" ",
        array_sort(collect_list(struct(col("chunk_idx"), col("chunk_text"))))
          .getField("chunk_text")).as("rebuilt"))
    val diff = docs.join(rebuilt, "doc_id")
      .filter(col("text") =!= col("rebuilt"))
    assert(diff.count() == 0)
    // every chunk except a doc's last is exactly 32 tokens
    val bad = PipelineOps.chunk(docs)
      .withColumn("max_idx",
        max(col("chunk_idx")).over(
          org.apache.spark.sql.expressions.Window.partitionBy("doc_id")))
      .filter(col("chunk_idx") < col("max_idx") && col("n_chunk_toks") =!= 32)
    assert(bad.count() == 0)
  }

  test("q57 repetition metrics: degenerate doc dropped, diverse doc kept") {
    val docs = Seq(
      (1L, "a a a a a a"),                       // all-repeat
      (2L, "b c d e f g h i j k l m n o p q"),  // fully diverse
      (3L, "spam spam spam spam eggs and some other words here now ok"))
      .toDF("doc_id", "text")
    val out = PipelineOps.repetitionStats(docs)
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(2), r.getDouble(3), r.getBoolean(4))).toMap
    assert(out(1L)._1 == 0.8)            // 5 bigrams, 1 distinct
    assert(out(1L)._2 == 1.0 && !out(1L)._3)
    assert(out(2L)._1 == 0.0 && out(2L)._3)
    assert(out(3L)._2 > 0.3 && !out(3L)._3)  // spam = 4/12 tokens
  }

  test("q59 cross-source overlap counts distinct shared shingles once") {
    val docs = Seq(
      (1L, "a b c d e", "s1"),
      (2L, "a b c x y", "s2"),   // shares shingle "a b c" with s1
      (3L, "a b c z w", "s2"),   // same shared shingle — must count ONCE
      (4L, "p q r s t", "s3"))   // no overlap with anyone
      .toDF("doc_id", "text", "source")
    val out = queries.PipelineOps.crossSourceOverlap(docs)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out == Map(("s1", "s2") -> 1L))
  }

  test("q60 canonical docs: quality winner per cluster, min-id tie-break") {
    // docs 1,2 exact dups (equal quality -> min id 1 wins the tie);
    // doc 3 near-dups them with MORE stopwords (higher quality) -> the
    // {1,2,3} cluster's canonical is 3; doc 4 is a singleton
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "s1", 43),
      (2L, "the quick brown fox jumps over the lazy dog", "s1", 43),
      (3L, "the quick brown fox jumps over the lazy dog and a cat of", "s1", 57),
      (4L, "completely different words about parquet shuffles here", "s1", 54))
      .toDF("doc_id", "text", "source", "n_chars")
    val out = graft.ext.DedupCluster.canonicalDocs(docs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L)._2 == 3L)        // cluster 1 has 3 members
    assert(out(1L)._1 == 3L,        // doc 3's stopword-rich text wins
      s"expected canonical 3, got ${out(1L)._1}")
    assert(out(4L) == (4L, 1L))     // singleton canonicalizes itself
  }

  test("q61 funnel: stages strictly ordered and monotonically shrinking") {
    val out = queries.Funnels.funnel(Tables.events(spark, TestSpark.sf0001))
    // ordering invariant: each stage timestamp strictly after the prior
    assert(out.filter(col("t_click").isNotNull &&
      col("t_click") <= col("t_view")).count() == 0)
    assert(out.filter(col("t_purchase").isNotNull &&
      col("t_purchase") <= col("t_click")).count() == 0)
    // monotone funnel: stage-k population contains stage-(k+1)
    val n1 = out.count()
    val n2 = out.filter(col("stage") >= 2).count()
    val n3 = out.filter(col("stage") === 3).count()
    assert(n1 >= n2 && n2 >= n3 && n1 > 0)
    // a click BEFORE the first view must not count: craft one
    val crafted = Seq(
      (10L, "click", java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
      (10L, "view", java.sql.Timestamp.valueOf("2024-01-01 01:00:00")))
      .toDF("user_id", "event_type", "ts")
    val c = queries.Funnels.funnel(crafted).collect()
    assert(c.length == 1 && c(0).getInt(4) == 1) // view only — no ordered click
  }

  test("q62 retention: day 0 counts every cohort member exactly once") {
    val events = Tables.events(spark, TestSpark.sf0001)
    val out = queries.Funnels.retention(events)
    // every user is active on their own cohort day, so summing day 0
    // across cohorts = total distinct users
    val day0 = out.filter(col("day_offset") === 0)
      .agg(sum(col("n_active"))).head().getLong(0)
    val users = events.select(countDistinct(col("user_id"))).head().getLong(0)
    assert(day0 == users)
    assert(out.filter(col("day_offset") < 0).count() == 0)
  }

  test("q58 packing: offsets contiguous per source, pack = start div 2048") {
    val out = PipelineOps.packSequences(
      Tables.documents(spark, TestSpark.sf0001))
    // total: every doc mapped exactly once
    assert(out.count() ==
      Tables.documents(spark, TestSpark.sf0001).count())
    // start_off of each doc = previous doc's start_off + n_toks (per
    // source, doc_id order) and the first doc starts at 0
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("doc_id")
    val bad = out.withColumn("prev_end",
        lag(col("start_off") + col("n_toks"), 1, 0L).over(w))
      .filter(col("start_off") =!= col("prev_end"))
    assert(bad.count() == 0)
    val badPack = out.filter(col("pack_id") =!= expr("start_off div 2048"))
    assert(badPack.count() == 0)
  }
}
