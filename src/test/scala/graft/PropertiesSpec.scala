package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import graft.operators.Transforms

/** Property-based laws (SURVEY §5.2-4), as native ScalaCheck properties —
  * data is generated driver-side and pushed through the same Column
  * expressions the engine uses. */
object TransformProperties extends Properties("graft.transforms") {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val bins = Seq(0.0, 20.0, 50.0, 100.0, 500.0)
  private val labels = Seq("cheap", "affordable", "midrange", "premium", "luxury")

  property("binning totality: every price > 0 lands in exactly one bucket") =
    forAll(Gen.nonEmptyListOf(Gen.choose(0.01, 2000.0))) { prices =>
      val out = Transforms.binRightClosed("p", "cat", bins, labels)(
        prices.toDF("p")).select("cat").collect().map(_.getString(0))
      out.forall(c => c != null && labels.contains(c))
    }

  property("dictEncode bijection on sorted distinct values") =
    forAll(Gen.nonEmptyListOf(Gen.resize(8, Gen.alphaStr).suchThat(_.nonEmpty))) { vs =>
      val out = Transforms.dictEncode("v", "c")(vs.toDF("v"))
        .select("v", "c").distinct().collect()
        .map(r => r.getString(0) -> r.getShort(1))
      val byVal = out.toMap
      val sorted = vs.distinct.sorted
      Prop.all(
        byVal.size == vs.distinct.size,
        out.map(_._2).distinct.length == byVal.size,
        sorted.zipWithIndex.forall { case (v, i) => byVal(v) == i })
    }

  property("set-op cardinality: |A∪B| = |A| + |B| - |A∩B| on distincts") =
    forAll(Gen.listOf(Gen.choose(0, 50)), Gen.listOf(Gen.choose(0, 50))) {
      (a, b) =>
        val da = a.toDF("x").distinct()
        val db = b.toDF("x").distinct()
        val union = da.union(db).distinct().count()
        val inter = da.intersect(db).count()
        union == da.count() + db.count() - inter
    }

  property("coalesce/fillna null algebra: no nulls survive, non-nulls kept") =
    forAll(Gen.listOf(Gen.option(Gen.choose(-100.0, 100.0)))) { xs =>
      val filled = Transforms.imputeConst(Map("x" -> 0.0))(xs.toDF("x"))
        .collect().map(_.getDouble(0))
      filled.length == xs.length &&
        xs.zip(filled).forall {
          case (Some(v), f) => f == v
          case (None, f) => f == 0.0
        }
    }

  /** q30's AND-amplification law (round-15 verdict item 7): on a
    * constructed corpus of 200 pairs at EXACT shingle-set Jaccard 0.5
    * (two 32-token docs sharing their first 22 tokens in a pair-unique
    * vocabulary → |A∩B| = 20, |A∪B| = 40 — the boundary shingles all
    * differ), the measured band-collision survival must track the
    * analytic 1 − (1 − J^r)^b at each (r, b), and be monotone in the
    * banding direction. Deterministic under the fixed md5 slot family:
    * each pair's shingles are distinct strings, so collision outcomes
    * are independent draws from the hash family (σ ≈ 0.02–0.03 at
    * n = 200; tolerance 0.08 ≈ 3σ). Pairs are source-isolated, so the
    * survival count is exactly the emitted-pair count. */
  property("q30 banding: candidate survival matches 1-(1-J^r)^b across (r,b), monotone") = {
    val nPairs = 200
    val docs = (0 until nPairs).flatMap { p =>
      val shared = (0 until 22).map(i => s"a${p}x$i")
      val tailA = (22 until 32).map(i => s"a${p}x$i")
      val tailB = (0 until 10).map(i => s"b${p}x$i")
      Seq((2L * p, s"s$p", (shared ++ tailA).mkString(" ")),
        (2L * p + 1, s"s$p", (shared ++ tailB).mkString(" ")))
    }.toDF("doc_id", "source", "text")
    val j = 0.5
    val cases = Seq((1, 8), (2, 8), (2, 4), (4, 4))
    val survival = cases.map { case (r, b) =>
      val got = graft.ext.MinHashDedup
        .bandedJaccardPairs(docs, 0.4, numTables = b, bandWidth = r)
        .count().toDouble / nPairs
      (r, b, got)
    }
    Prop.all(
      (survival.map { case (r, b, s) =>
        val analytic = 1.0 - math.pow(1.0 - math.pow(j, r), b)
        Prop(math.abs(s - analytic) < 0.08) :|
          f"(r=$r,b=$b): measured $s%.3f vs analytic $analytic%.3f"
      } :+ (Prop(survival.map(_._3).zip(survival.map(_._3).tail)
        .forall { case (hi, lo) => hi >= lo }) :|
        s"banding survival not monotone: $survival")): _*)
  }
}
