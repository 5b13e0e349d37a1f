package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dense-vector math over `array<float>` embedding columns, built from
  * codegen'd higher-order functions (SURVEY.md §2.D) — no UDFs, no
  * serialization boundary.
  *
  * Determinism: floats are widened to double BEFORE any arithmetic, and
  * `aggregate` folds element-by-element in index order — the same
  * sequential order DuckDB's list_sum uses, so cosine values are
  * bit-identical to the oracle.
  */
object VectorFunctions {

  /** array<float> → array<double>. */
  def vecToDouble(a: Column): Column = transform(a, x => x.cast(DoubleType))

  /** Sequential-fold dot product of two array<double> columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Euclidean norm. */
  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, x) => acc + x))

  /** Cosine similarity; expression shape mirrors the oracle SQL exactly
    * (dot / (sqrt(ssA) * sqrt(ssB))) so every IEEE op matches. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Codegen'd float-array dot product (see [[VecDotFloat]]): the scale
    * path — same values as [[dot]] over [[vecToDouble]]'d inputs, ~an
    * order of magnitude faster (stays in whole-stage codegen). Exposed
    * through the session's function registry so no private Column
    * constructors are needed. */
  def registerVecDot(spark: org.apache.spark.sql.SparkSession): Unit = {
    // no-op when already registered (e.g. the session was built with
    // spark.sql.extensions=graft.GraftExtensions — the preferred front
    // door): re-registering would spam "replaced a previously registered
    // function" warnings on every query invocation
    val reg = spark.sessionState.functionRegistry
    val ident = new org.apache.spark.sql.catalyst.FunctionIdentifier("vec_dot_f")
    if (!reg.functionExists(ident))
      reg.createOrReplaceTempFunction("vec_dot_f", vecDotBuilder, "built-in")
  }

  /** Single arity-checked builder shared by the temp-function path and
    * GraftExtensions' injectFunction path. */
  val vecDotBuilder: Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
      org.apache.spark.sql.catalyst.expressions.Expression = { exprs =>
    require(exprs.length == 2,
      s"vec_dot_f expects 2 arguments, got ${exprs.length}")
    VecDotFloat(exprs.head, exprs(1))
  }

  /** Column form of the codegen'd dot product (requires registerVecDot
    * on the session; inputs must be array<float>). */
  def dotF(a: Column, b: Column): Column =
    call_function("vec_dot_f", a, b)
}
