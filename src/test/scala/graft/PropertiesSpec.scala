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
}
