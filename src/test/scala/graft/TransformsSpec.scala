package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Transforms

/** Unit semantics of the reference-parity transforms (SURVEY §5.2-3):
  * pd.cut boundary behavior, cat.codes ordering, median interpolation,
  * coerce-cast, null-aware string length. */
class TransformsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val bins = Seq(0.0, 20.0, 50.0, 100.0, 500.0)
  val labels = Seq("cheap", "affordable", "midrange", "premium", "luxury")

  test("binRightClosed matches pd.cut right-closed/left-open semantics") {
    val df = Seq[Option[Double]](
      Some(0.0), Some(0.01), Some(20.0), Some(20.01), Some(50.0), Some(100.0),
      Some(500.0), Some(501.0), None, Some(-3.0))
      .toDF("price")
    val out = Transforms.binRightClosed("price", "cat", bins, labels)(df)
      .select("price", "cat").collect().map(r =>
        (Option(r.get(0)).map(_.asInstanceOf[Double]), r.getString(1))).toMap
    assert(out(Some(0.0)) == null)      // left-open first bin: (0,20]
    assert(out(Some(0.01)) == "cheap")
    assert(out(Some(20.0)) == "cheap")  // right-closed edge
    assert(out(Some(20.01)) == "affordable")
    assert(out(Some(50.0)) == "affordable")
    assert(out(Some(100.0)) == "midrange")
    assert(out(Some(500.0)) == "premium")
    assert(out(Some(501.0)) == "luxury") // unbounded last bin
    assert(out(None) == null)
    assert(out(Some(-3.0)) == null)     // below first edge
  }

  test("dictEncode assigns codes by sorted distinct order, null -> -1") {
    val df = Seq(Some("US"), Some("France"), Some("Italy"), Some("France"), None)
      .toDF("country")
    val out = Transforms.dictEncode("country", "code")(df)
      .collect().map(r => (Option(r.getString(0)), r.getShort(1))).toMap
    assert(out(Some("France")) == 0)
    assert(out(Some("Italy")) == 1)
    assert(out(Some("US")) == 2)
    assert(out(None) == -1)
  }

  test("dictEncode handles 10^6 distinct values without an unpartitioned window") {
    // zero-padded strings: lexicographic sort order == numeric order, so
    // the expected dense code of value i is exactly i
    val n = 1000000L
    val df = spark.range(n)
      .select(format_string("%07d", col("id")).as("v"), col("id"))
    val out = Transforms.dictEncode("v", "code",
      codeType = IntegerType, broadcastCodes = false)(df)
    // no Window node anywhere in the plan: the codes come from a
    // range-partitioned sort + zipWithIndex, never a single-partition
    // global window
    assert(!out.queryExecution.optimizedPlan.toString.contains("Window"))
    val bad = out.filter(col("code") =!= col("id").cast(IntegerType)).count()
    assert(bad == 0)
    assert(out.count() == n)
  }

  test("dictEncode fails loudly when the dictionary overflows the code type") {
    val df = spark.range(40000)
      .select(format_string("%07d", col("id")).as("v"))
    val ex = intercept[Exception] {
      Transforms.dictEncode("v", "code")(df) // default ShortType, 40k codes
        .queryExecution.toRdd.count()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("dictEncode")), messages(ex).mkString(" | "))
  }

  test("imputeMedian averages middle pair on even counts (pandas parity)") {
    val df = Seq(Some(1.0), Some(2.0), Some(10.0), Some(20.0), None).toDF("v")
    val out = Transforms.imputeMedian("v")(df).select("v")
      .collect().map(_.getDouble(0)).sorted
    assert(out.contains(6.0)) // median of (1,2,10,20) = (2+10)/2
  }

  test("castCoerce nulls malformed values instead of failing") {
    val df = Seq("87", "ninety", "91", "", "  ").toDF("points")
    val out = Transforms.castCoerce("points", IntegerType)(df)
      .select("points").collect().map(r => Option(r.get(0)))
    assert(out.count(_.isDefined) == 2)
    assert(out.flatten.map(_.asInstanceOf[Int]).toSet == Set(87, 91))
  }

  test("strLen counts chars, null -> 0") {
    val df = Seq(Some("abcd"), Some(""), None).toDF("t")
    val out = Transforms.strLen("t", "n")(df).select("n")
      .collect().map(_.getInt(0)).toSeq
    assert(out == Seq(4, 0, 0))
  }

  test("coalesceCols takes first non-null") {
    val df = Seq((Some("a"), Some("b")), (None, Some("b")), (Some("a"), None),
      (None, None)).toDF("x", "y")
    val out = Transforms.coalesceCols("z", "x", "y")(df)
      .select("z").collect().map(r => Option(r.getString(0))).toSeq
    assert(out == Seq(Some("a"), Some("b"), Some("a"), None))
  }
}
