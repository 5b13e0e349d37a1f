package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.{Lexical, VectorOps}

/** Behavioral laws of the round-8 lexical/semantic additions that the
  * DuckDB oracle can't express: the winnowing match guarantee, the
  * SemDeDup suppression contract, and the Zipf fit on a constructed
  * exact power law. */
class LexicalSemDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // --- winnowing ---

  test("winnowing guarantee: a shared run of >= w+k-1 tokens shares a fingerprint") {
    // w=4, k=3 word-grams: any common substring of >= 6 tokens must
    // surface at least one common fingerprint (Schleimer et al. Thm)
    val run = "one two three four five six" // 6 shared tokens
    val docs = Seq(
      (1L, s"aa bb cc $run dd ee"),
      (2L, s"xx yy $run zz ww qq")).toDF("doc_id", "text")
    val fps = Lexical.winnowingFingerprints(docs)
      .select("doc_id", "fp").as[(Long, String)].collect()
    val f1 = fps.filter(_._1 == 1L).map(_._2).toSet
    val f2 = fps.filter(_._1 == 2L).map(_._2).toSet
    assert((f1 & f2).nonEmpty, "guaranteed shared fingerprint missing")
  }

  test("winnowing: disjoint-vocabulary docs share nothing; short doc still fingerprints") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "uno dos tres cuatro cinco seis"),
      (3L, "tiny little doc")). // exactly one 3-gram, fewer than w windows
      toDF("doc_id", "text")
    val fps = Lexical.winnowingFingerprints(docs)
      .select("doc_id", "fp").as[(Long, String)].collect()
    val byDoc = fps.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert((byDoc(1L) & byDoc(2L)).isEmpty)
    assert(byDoc(3L).size == 1, "short doc must contribute its global minimum")
  }

  test("winnowing pairs are deterministic under repartitioning and doc order") {
    // five docs per group share a group phrase (df=5, inside the cap)
    val base = (0L until 40L).map { i =>
      val shared = s"p${i / 5} q${i / 5} r${i / 5} s${i / 5} t${i / 5} u${i / 5} v${i / 5} w${i / 5}"
      val noise = (0 to 6).map(j => s"n${i}_$j").mkString(" ")
      (i, if (i % 4 == 0) s"$noise $shared" else s"$shared $noise ex$i")
    }
    val d1 = base.toDF("doc_id", "text")
    val d2 = base.reverse.toDF("doc_id", "text").repartition(7)
    val a = Lexical.winnowingPairs(d1).collect().map(_.toString).sorted
    val b = Lexical.winnowingPairs(d2).collect().map(_.toString).sorted
    assert(a.sameElements(b))
    assert(a.nonEmpty, "fixture should produce overlap pairs")
  }

  test("winnowing df cap drops boilerplate fingerprints from pair generation") {
    // one 6-token boilerplate phrase present in ALL 30 docs -> its
    // fingerprints exceed dfCap and generate no pairs; distinctive
    // phrases pair up only their two carriers
    val boiler = "all rights reserved contact us today"
    val docs = (0L until 30L).map { i =>
      val distinct = if (i < 2) "rare shared phrase here twice over" else s"u$i v$i w$i x$i y$i z$i"
      (i, s"$boiler $distinct")
    }.toDF("doc_id", "text")
    val pairs = Lexical.winnowingPairs(docs, dfCap = 10)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L)), s"expected only the rare pair, got $pairs")
  }

  // --- SemDeDup ---

  private def centersOf(vecs: Seq[(Int, Int, Array[Float])]) = {
    val emb = vecs.toDF("vec_id", "label", "embedding")
    emb.filter(col("embedding").isNotNull && col("label").isNotNull)
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos"))
      .agg(sum(col("v").cast("double").cast("decimal(20,10)")).cast("double").as("sum_v"),
        count(lit(1)).as("n"))
      .select(col("label"), col("pos"), (col("sum_v") / col("n")).as("mean_v"))
      .groupBy(col("label"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, mean_v)))," +
        " s -> s.mean_v)").as("centroid"))
      .select(col("label").as("center_id"), col("centroid"))
  }

  test("semDedup: a removed vector always has a kept higher-priority near-duplicate") {
    val vecs = Seq(
      // cluster around (1,0,0): three near-identical + one member far
      // from the centroid in a third dimension (low cosine to the trio,
      // still nearest to this cluster's center)
      (0, 0, Array(1f, 0f, 0f)), (1, 0, Array(0.999f, 0.01f, 0f)),
      (2, 0, Array(0.998f, 0.02f, 0f)), (3, 0, Array(0.7f, 0f, 0.7f)),
      // cluster around (0,1,0): two members under the cosine threshold
      (10, 1, Array(0f, 1f, 0f)), (11, 1, Array(0.45f, 0.65f, 0f)))
    val emb = vecs.toDF("vec_id", "label", "embedding")
    val out = VectorOps.semDedup(emb, centersOf(vecs), tau = 0.95)
      .select("vec_id", "cluster", "rep_rank", "removed")
      .as[(Int, Int, Int, Boolean)].collect()
    val byId = out.map(r => r._1 -> r).toMap
    // the three near-identical vectors: exactly the highest-priority one
    // survives; both lower-priority copies are suppressed
    val trio = Seq(0, 1, 2).map(byId)
    assert(trio.count(!_._4) == 1, s"expected 1 survivor in the trio, got $trio")
    val survivorRank = trio.filter(!_._4).head._3
    assert(trio.filter(_._4).forall(_._3 > survivorRank))
    // vectors with no near-duplicate are never removed
    assert(!byId(3)._4 && !byId(10)._4 && !byId(11)._4)
  }

  test("semDedup assigns to the nearest center and is repartition-invariant") {
    val vecs = (0 until 60).map { i =>
      val lbl = i % 3
      val base = lbl match {
        case 0 => Array(1f, 0f, 0f)
        case 1 => Array(0f, 1f, 0f)
        case _ => Array(0f, 0f, 1f)
      }
      (i, lbl, base.map(v => v + (i % 7) * 0.01f))
    }
    val emb = vecs.toDF("vec_id", "label", "embedding")
    val centers = centersOf(vecs)
    val out = VectorOps.semDedup(emb, centers)
      .select("vec_id", "cluster").as[(Int, Int)].collect().toMap
    // axis-aligned fixture: every vector stays with its own label's center
    assert(vecs.forall { case (id, lbl, _) => out(id) == lbl })
    val out2 = VectorOps.semDedup(emb.repartition(5), centers)
      .collect().map(_.toString).sorted
    val out1 = VectorOps.semDedup(emb, centers)
      .collect().map(_.toString).sorted
    assert(out1.sameElements(out2))
  }

  test("semDedup through the q48 IVF-center seam: same schema, same contract") {
    val vecs = (0 until 80).map { i =>
      val lbl = i % 4
      val base = lbl match {
        case 0 => Array(1f, 0f, 0f)
        case 1 => Array(0f, 1f, 0f)
        case 2 => Array(0f, 0f, 1f)
        case _ => Array(0.7f, 0.7f, 0f)
      }
      (i, lbl, base.map(v => v + (i % 5) * 0.004f))
    }
    val emb = vecs.toDF("vec_id", "label", "embedding")
    val idx = graft.ext.Similarity.ivfBuild(emb, nCells = 4).get
    val viaIvf = VectorOps.semDedup(emb, VectorOps.ivfCenters(idx))
    val viaLabels = VectorOps.semDedup(emb, centersOf(vecs))
    // the production seam returns the exact same schema as the testbed
    assert(viaIvf.schema.map(f => (f.name, f.dataType)) ==
      viaLabels.schema.map(f => (f.name, f.dataType)))
    val rows = viaIvf.select("vec_id", "cluster", "rep_rank", "removed")
      .as[(Int, Int, Int, Boolean)].collect()
    assert(rows.length == vecs.length, "one verdict row per input vector")
    // contract: per cluster, rep_rank is a 1..n permutation and the
    // top-priority member (rep_rank 1) is never suppressed
    rows.groupBy(_._2).foreach { case (c, members) =>
      val ranks = members.map(_._3).sorted
      assert(ranks.sameElements(1 to members.length),
        s"cluster $c rep_rank not a permutation: ${ranks.toSeq}")
      assert(!members.find(_._3 == 1).get._4,
        s"cluster $c suppressed its own representative")
    }
    // tight near-duplicate packs around each axis mean SOME suppression
    // must fire through the IVF centers too
    assert(rows.exists(_._4), "IVF-center path suppressed nothing")
  }

  // --- Zipf slope ---

  test("zipf slope recovers -1 on an exact power-law corpus") {
    // token t_r appears floor(1000/r) times, ranks 1..50 -> slope ~ -1
    val toks = (1 to 50).flatMap(r => Seq.fill(1000 / r)(s"t$r"))
    val docs = toks.grouped(97).zipWithIndex
      .map { case (g, i) => (i.toLong, "zipf", g.mkString(" ")) }
      .toSeq.toDF("doc_id", "source", "text")
    val row = Lexical.zipfSlopes(docs, topN = 50)
      .select("source", "n_terms", "slope").as[(String, Long, Double)]
      .collect().head
    assert(row._2 == 50)
    assert(math.abs(row._3 - (-1.0)) < 0.05, s"slope was ${row._3}")
  }

  test("zipf slope excludes degenerate sources instead of emitting NaN") {
    val docs = Seq(
      (1L, "flat", "a a a a a b b b c"),
      (2L, "mono", "x x x x")).toDF("doc_id", "source", "text")
    val rows = Lexical.zipfSlopes(docs)
      .select("source", "slope").as[(String, Double)].collect().toMap
    assert(!rows.contains("mono"), "single-token source must be excluded")
    assert(rows.contains("flat") && !rows("flat").isNaN)
  }

  // --- q127 sparse all-pairs cosine ---

  private def apDocs(rows: Seq[(Long, String)]) =
    rows.map { case (id, t) => (id, t, "en", "srcX", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("allpairs: near-identical docs score high, disjoint docs are absent") {
    val docs = apDocs(Seq(
      (1L, "alpha beta gamma delta eps"),
      (2L, "alpha beta gamma delta zeta"),   // 4/5 token overlap with 1
      (3L, "omega psi chi phi upsilon")))    // disjoint vocabulary
    val out = Lexical.sparseAllPairs(docs, dfCap = 50, tau = 0.30)
      .select("doc_a", "doc_b", "cos_sim")
      .as[(Long, Long, Double)].collect()
    assert(out.map(p => (p._1, p._2)).toSet == Set((1L, 2L)),
      s"expected only the overlapping pair, got ${out.toSeq}")
    // in a 3-doc corpus the df-1 unique tokens carry ln(3) idf vs the
    // shared tokens' ln(3/2), so a 4/5 token overlap lands near 0.35 —
    // correct TF-IDF down-weighting of shared-but-common terms
    assert(out.head._3 > 0.30 && out.head._3 <= 1.0 + 1e-9)
  }

  test("allpairs: df cap drops boilerplate tokens from pair generation") {
    // 'common' appears in every doc; with dfCap below the corpus size it
    // is pruned, so docs sharing ONLY it produce no pair
    val docs = apDocs(Seq(
      (1L, "common alpha beta"), (2L, "common gamma delta"),
      (3L, "common eps zeta"), (4L, "common eta theta")))
    val out = Lexical.sparseAllPairs(docs, dfCap = 3, tau = 0.0)
    assert(out.count() == 0,
      "pairs sharing only a df-capped token must not be generated")
  }

  test("allpairs is deterministic under repartitioning") {
    val docs = Tables.documentsParallel(spark, TestSpark.sf0001)
    val a = Lexical.sparseAllPairs(docs)
    val b = Lexical.sparseAllPairs(docs.repartition(7))
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0,
      "decimal-quantized idf + order-free sums must make pairs exact")
  }

  test("q184 prefix filtering is EXACT: equals the unfiltered brute-force join on a fixture slice") {
    import org.apache.spark.sql.functions._
    // 150 fixture docs: big enough for real near-dup structure, small
    // enough that the deliberately-unfiltered all-pairs reference stays
    // a test-only cost
    val docs = Tables.documents(spark, TestSpark.sf0001)
      .filter(col("doc_id") < 150)
    val viaPrefix = Lexical.prefixJaccardPairs(docs)
      .select("doc_a", "doc_b", "jac_milli")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // brute force: FULL shingle self-join (no prefix, no size filter),
    // exact Jaccard on every co-shingled pair
    val sh = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"),
        explode(graft.functions.TextFunctions.shinglesExpr("toks", 3))
          .as("sh"))
      .distinct()
    val sz = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val brute = sh.select(col("sh"), col("doc_id").as("doc_a"))
      .join(sh.select(col("sh"), col("doc_id").as("doc_b")),
        Seq("sh"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .join(sz.select(col("doc_id").as("doc_a"), col("sz").as("n_a")),
        "doc_a")
      .join(sz.select(col("doc_id").as("doc_b"), col("sz").as("n_b")),
        "doc_b")
      .filter(col("n_shared") * 1000 >=
        lit(800) * (col("n_a") + col("n_b") - col("n_shared")))
      .select(col("doc_a"), col("doc_b"),
        expr("(n_shared * 1000) div (n_a + n_b - n_shared)")
          .as("jac_milli"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(brute.nonEmpty, "slice has no qualifying pairs — test is vacuous")
    assert(viaPrefix == brute,
      s"prefix filtering lost/invented pairs: only-brute=" +
        s"${brute -- viaPrefix}, only-prefix=${viaPrefix -- brute}")
  }

  test("q184: identical docs score 1000; sub-threshold overlap is absent") {
    val docs = apDocs(Seq(
      (1L, "a b c d e f g h i j k l"),
      (2L, "a b c d e f g h i j k l"),       // identical → jac 1000
      (3L, "a b c d e f g h i j kk l"),      // penultimate-token edit
      (4L, "p q r s t u v w x y z0 z1")))    // disjoint
    val out = Lexical.prefixJaccardPairs(docs)
      .select("doc_a", "doc_b", "jac_milli")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out((1L, 2L)) == 1000L, s"$out")
    // docs 1 vs 3: 12 tokens → 10 shingles each; editing token 11
    // rewrites shingles (i j k*) and (j k* l) → inter 8, union 12 →
    // jac 666 < 800: correctly absent (a LAST-token edit would kill
    // only one shingle → 818 ≥ 800, still a near-dup)
    assert(!out.contains((1L, 3L)) && !out.contains((3L, 1L)), s"$out")
    assert(!out.keys.exists(k => k._1 == 4L || k._2 == 4L), s"$out")
  }

  test("q184 positional filter: strict subset of plain prefix candidates, and exact on the fixture") {
    import org.apache.spark.sql.functions._
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // constructed kill case, shingle table built directly so rank
    // positions are controlled: docs 1 and 2 share ONE prefix shingle
    // s at asymmetric positions (pos 1 vs pos 3), so the match bound
    // ub = 1 + min(pos)−1 + min(sz−pos) = 1+0+9 = 10 < α = 11 prunes
    // a pair the bare prefix match admits — and rightly so: the pair's
    // real overlap is 10/14 ≈ 0.71 < 0.8.
    import spark.implicits._
    val boiler = (1 to 11).map(i => f"z boiler $i%02d")
    val shRows: Seq[(Long, String)] =
      (boiler.map(1L -> _) :+ (1L -> "m shared")) ++          // doc 1: sz 12
      (boiler.take(9).map(2L -> _) ++
        Seq(2L -> "m shared", 2L -> "a early1", 2L -> "a early2")) ++ // doc 2
      (Seq(3L -> "a early1", 3L -> "a early2") ++
        (1 to 10).map(i => 3L -> f"u uniq $i%02d")) ++        // df-2 donors
      (for (d <- Seq(10L, 11L, 12L); g <- boiler) yield d -> g) ++ // boilerplate
      (boiler.map(4L -> _) :+ (4L -> "m shared"))             // doc 4 ≡ doc 1
    val sh = shRows.toDF("doc_id", "sh")
    val bare = pairs(Lexical.prefixCandidates(sh, 800, positional = false))
    val pos = pairs(Lexical.prefixCandidates(sh, 800))
    assert(pos.subsetOf(bare), s"positional invented candidates: ${pos -- bare}")
    // the identical pair always survives
    assert(bare.contains((1L, 4L)) && pos.contains((1L, 4L)), s"$bare / $pos")
    // the asymmetric-position pair survives the bare prefix match but
    // not the positional bound — the pruning this filter exists for
    assert(bare.contains((1L, 2L)),
      s"constructed pair never became a bare candidate: $bare — test vacuous")
    assert(!pos.contains((1L, 2L)),
      s"positional bound failed to prune the low-overlap pair: $pos")
    // and pruning is EXACT end-to-end: the verified output is identical
    val outPos = Lexical.prefixJaccardFrom(sh)
      .select("doc_a", "doc_b", "jac_milli").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(outPos.exists(t => t._1 == 1L && t._2 == 4L && t._3 == 1000L),
      s"$outPos")
    assert(!outPos.exists(t => (t._1, t._2) == ((1L, 2L))), s"$outPos")
    // fixture-level law: never more candidates than the bare prefix join
    val fsh = Lexical.shingleRows(
      Tables.documents(spark, TestSpark.sf0001).filter(col("doc_id") < 150))
    val fBare = pairs(Lexical.prefixCandidates(fsh, 800, positional = false))
    val fPos = pairs(Lexical.prefixCandidates(fsh, 800))
    assert(fPos.subsetOf(fBare),
      s"positional filter invented fixture candidates (${fBare.size} -> ${fPos.size})")
  }
}
