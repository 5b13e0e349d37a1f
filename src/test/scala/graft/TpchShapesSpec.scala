package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Boundary laws of the round-14 TPC-H-shape block (q220–q225) that the
  * oracle hash gate can only exercise if the fixture happens to land on
  * the boundary — so they are pinned here on CONSTRUCTED tables:
  *
  *  - q221 ties: two suppliers with bit-identical quarterly revenue must
  *    BOTH survive the `= max` filter (the Q15 view semantics; a double
  *    compare could drop one at the 17th digit).
  *  - q222 threshold: a lineitem at EXACTLY 20 % of its part's mean
  *    quantity is excluded (strict <), one infinitesimally below is in.
  *  - q225 threshold: a customer at EXACTLY the positive-balance average
  *    is excluded (strict >); the anti-join spares customers whose only
  *    orders predate the dormancy cutoff.
  *  - q216 zero bucket: a customer with no orders lands in c_count = 0
  *    (the left-join law the inner-join formulation silently breaks).
  */
class TpchShapesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Writes the given rows as `$dir/$name.parquet` and returns dir. */
  private def fixture(tables: (String, StructType, Seq[Row])*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_tpch").toString
    tables.foreach { case (name, schema, rows) =>
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema)
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/$name.parquet")
    }
    dir
  }

  private val liSchema = StructType(Seq(
    StructField("l_orderkey", LongType), StructField("l_partkey", LongType),
    StructField("l_suppkey", LongType),
    StructField("l_linenumber", IntegerType),
    StructField("l_quantity", DoubleType),
    StructField("l_extendedprice", DoubleType),
    StructField("l_discount", DoubleType), StructField("l_tax", DoubleType),
    StructField("l_returnflag", StringType),
    StructField("l_linestatus", StringType),
    StructField("l_shipdate", TimestampType)))

  private def ts(s: String): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(s + " 00:00:00")

  private def li(order: Long, part: Long, supp: Long, qty: Double,
      price: Double, disc: Double, ship: String): Row =
    Row(order, part, supp, 1, qty, price, disc, 0.0, "N", "O", ts(ship))

  test("q221: suppliers tied at the exact max revenue BOTH survive") {
    // suppliers 1 and 2 reach identical revenue via DIFFERENT row
    // splits (one row vs two rows summing to it) — the tie must hold
    // after aggregation, which only exact decimal sums guarantee
    val supSchema = StructType(Seq(
      StructField("s_suppkey", LongType), StructField("s_name", StringType),
      StructField("s_nationkey", IntegerType),
      StructField("s_acctbal", DoubleType)))
    val dir = fixture(
      ("lineitem", liSchema, Seq(
        li(1, 1, 1, 1, 300.0, 0.0, "1996-02-01"),
        li(2, 1, 2, 1, 100.0, 0.0, "1996-02-01"),
        li(3, 1, 2, 1, 200.0, 0.0, "1996-02-02"),
        li(4, 1, 3, 1, 299.99, 0.0, "1996-02-03"), // just below the max
        li(5, 1, 1, 1, 999.0, 0.0, "1995-01-01"))), // outside the quarter
      ("supplier", supSchema, Seq(
        Row(1L, "S1", 0, 0.0), Row(2L, "S2", 0, 0.0), Row(3L, "S3", 0, 0.0))))
    val out = queries.Relational.q221.run(spark, dir)
      .orderBy("s_suppkey").collect()
    assert(out.map(_.getString(1)).toSeq == Seq("S1", "S2"),
      s"expected both tied suppliers, got ${out.mkString(",")}")
    assert(out.forall(_.getDouble(2) == 300.0))
  }

  test("q222: the 20% threshold is strict — exactly-at-mean/5 is out") {
    val partSchema = StructType(Seq(
      StructField("p_partkey", LongType), StructField("p_name", StringType),
      StructField("p_brand", StringType), StructField("p_type", StringType),
      StructField("p_size", IntegerType),
      StructField("p_retailprice", DoubleType)))
    // part 1 quantities (9, 1): mean 5, threshold 0.2·5 = 1 — the
    // qty-1 row sits EXACTLY at the threshold and must be EXCLUDED
    // (strict <). part 2 quantities (9, 0.99): mean 4.995, threshold
    // 0.999 — the 0.99 row is strictly below and must be INCLUDED.
    val dir = fixture(
      ("lineitem", liSchema, Seq(
        li(1, 1, 1, 9, 111.0, 0.0, "1996-01-01"),
        li(2, 1, 1, 1, 222.0, 0.0, "1996-01-02"), // exactly 0.2·mean
        li(3, 2, 1, 9.0, 333.0, 0.0, "1996-01-03"),
        li(4, 2, 1, 0.99, 70.0, 0.0, "1996-01-04"))), // just below
      ("part", partSchema, Seq(
        Row(1L, "p1", "Brand#3", "t", 1, 1.0),
        Row(2L, "p2", "Brand#3", "t", 1, 1.0))))
    val out = queries.Relational.q222.run(spark, dir).collect()
    // only the 70.0 row (part 2, qty 0.99 < 0.2·4.995 = 0.999) leaks
    assert(out.length == 1)
    assert(math.abs(out.head.getDouble(0) - 70.0 / 7.0) < 1e-9,
      s"expected 70/7, got ${out.head.getDouble(0)}")
  }

  test("q225: exact-average balance is excluded; pre-cutoff orders don't count as activity") {
    val custSchema = StructType(Seq(
      StructField("c_custkey", LongType), StructField("c_name", StringType),
      StructField("c_nationkey", IntegerType),
      StructField("c_acctbal", DoubleType),
      StructField("c_mktsegment", StringType)))
    val ordSchema = StructType(Seq(
      StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
      StructField("o_orderstatus", StringType),
      StructField("o_totalprice", DoubleType),
      StructField("o_orderdate", TimestampType),
      StructField("o_orderpriority", StringType)))
    val natSchema = StructType(Seq(
      StructField("n_nationkey", IntegerType),
      StructField("n_name", StringType),
      StructField("n_regionkey", IntegerType)))
    // positive balances: 100, 200, 300, 250, 150 → avg EXACTLY 200.
    // cust 2 sits exactly at the average (strict > excludes); cust 3
    // (300) qualifies and its only order predates 1999 (dormant
    // despite having ordered); cust 4 (250) qualifies on balance but
    // ordered in 2000 → active; cust 5 (150) is below.
    val dir = fixture(
      ("customer", custSchema, Seq(
        Row(1L, "c1", 0, 100.0, "A"), Row(2L, "c2", 0, 200.0, "A"),
        Row(3L, "c3", 0, 300.0, "A"), Row(4L, "c4", 0, 250.0, "A"),
        Row(5L, "c5", 0, 150.0, "A"))),
      ("orders", ordSchema, Seq(
        Row(10L, 3L, "F", 1.0, ts("1997-05-05"), "1-URGENT"),
        Row(11L, 4L, "O", 1.0, ts("2000-05-05"), "1-URGENT"))),
      ("nation", natSchema, Seq(Row(0, "NATION_0", 0))))
    val out = queries.Relational.q225.run(spark, dir).collect()
    assert(out.length == 1 && out.head.getLong(1) == 1L &&
      out.head.getDouble(2) == 300.0,
      s"expected only the dormant 300-balance customer, got ${out.toSeq}")
  }

  test("q216: never-ordered customers land in the zero bucket") {
    val custSchema = StructType(Seq(
      StructField("c_custkey", LongType), StructField("c_name", StringType),
      StructField("c_nationkey", IntegerType),
      StructField("c_acctbal", DoubleType),
      StructField("c_mktsegment", StringType)))
    val ordSchema = StructType(Seq(
      StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
      StructField("o_orderstatus", StringType),
      StructField("o_totalprice", DoubleType),
      StructField("o_orderdate", TimestampType),
      StructField("o_orderpriority", StringType)))
    val dir = fixture(
      ("customer", custSchema, Seq(
        Row(1L, "c1", 0, 0.0, "A"), Row(2L, "c2", 0, 0.0, "A"),
        Row(3L, "c3", 0, 0.0, "A"))),
      ("orders", ordSchema, Seq(
        Row(10L, 1L, "F", 1.0, ts("1997-05-05"), "1-URGENT"),
        Row(11L, 1L, "F", 1.0, ts("1997-06-05"), "1-URGENT"))))
    val out = queries.Relational.q216.run(spark, dir)
      .orderBy("c_count").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSeq
    assert(out == Seq(0L -> 2L, 2L -> 1L),
      s"expected zero-bucket {0→2, 2→1}, got $out")
  }
}
