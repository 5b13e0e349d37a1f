package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-pipeline building blocks (SURVEY.md §2.D): tokenization, word
  * n-gram shingling, document fingerprinting, SimHash. All pure built-in
  * expressions — each stays a per-row projection (no shuffle) until the
  * caller aggregates or joins.
  */
object TextFunctions {

  /** Whitespace tokenization. */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct word `n`-gram shingles (positional n-grams joined by a
    * space) over a NAMED array<string> column. TOTAL: arrays shorter than
    * `n` yield an empty shingle set (without the guard, sequence(0, neg)
    * runs descending into negative indices, which ANSI mode rejects).
    * SQL-expression form because lambda-with-index is most direct in SQL
    * syntax. */
  def shinglesExpr(toksCol: String, n: Int): Column = {
    val parts = (0 until n).map(j => s"$toksCol[i + $j]").mkString(", ")
    expr(s"CASE WHEN size($toksCol) >= $n THEN " +
      s"array_distinct(transform(sequence(0, size($toksCol) - $n), " +
      s"i -> concat_ws(' ', $parts))) " +
      s"ELSE array_repeat('', 0) END")
  }

  /** Order-insensitive document fingerprint: md5 over the sorted distinct
    * token set. NULL text yields a NULL fingerprint (SQL null
    * propagation — concat_ws alone would silently treat the null token
    * array as empty and fingerprint null docs as if they were ""). */
  def fingerprint(text: Column): Column =
    when(text.isNull, lit(null))
      .otherwise(md5(concat_ws(" ", array_sort(array_distinct(split(text, " "))))))

  /** Order-SENSITIVE rolling-hash fingerprint (Rabin–Karp shape): fold
    * h ← (h·P + hash(token)) mod M over the token sequence — catches
    * documents with identical token sets but different order,
    * complementing [[fingerprint]]. Modular (M = 2³¹−1, P = 1000003)
    * keeps every intermediate ≤ 2⁵¹, so ANSI mode (Spark 4 default)
    * never sees a long overflow. Pure projection, no shuffle. */
  def rollingFingerprint(toksCol: String): Column =
    expr(s"aggregate($toksCol, 0L, (h, t) -> " +
      "pmod(h * 1000003L + pmod(xxhash64(t), 2147483647L), 2147483647L))")

  /** 64-bit SimHash: codegen'd Catalyst expression (the scale path; see
    * [[SimHash64]]) registered as SQL function `simhash64`. Values are
    * identical to [[simhash64Hof]] on the SAME token array (same xxhash64
    * seed-42 per token, one vote per element) — callers choose whether to
    * array_distinct first; neither implementation dedupes internally. */
  def registerSimHash(spark: org.apache.spark.sql.SparkSession): Unit = {
    // no-op when already registered (GraftExtensions sessions) — see
    // VectorFunctions.registerVecDot for rationale
    val reg = spark.sessionState.functionRegistry
    val ident = new org.apache.spark.sql.catalyst.FunctionIdentifier("simhash64")
    if (!reg.functionExists(ident))
      reg.createOrReplaceTempFunction("simhash64", simHashBuilder, "built-in")
  }

  /** Single arity-checked builder shared by the temp-function path and
    * GraftExtensions' injectFunction path. */
  val simHashBuilder: Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
      org.apache.spark.sql.catalyst.expressions.Expression = { exprs =>
    require(exprs.length == 1,
      s"simhash64 expects 1 argument, got ${exprs.length}")
    SimHash64(exprs.head)
  }

  /** md5-family SimHash signature (codegen'd — see [[SimHashMd5]])
    * registered as SQL function `simhash_md5(tokens)`. */
  def registerSimHashMd5(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    val ident =
      new org.apache.spark.sql.catalyst.FunctionIdentifier("simhash_md5")
    if (!reg.functionExists(ident))
      reg.createOrReplaceTempFunction("simhash_md5", simHashMd5Builder,
        "built-in")
  }

  /** Arity-checked builder shared by the temp-function path and
    * GraftExtensions. */
  val simHashMd5Builder: Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
      org.apache.spark.sql.catalyst.expressions.Expression = { exprs =>
    require(exprs.length == 1,
      s"simhash_md5 expects 1 argument, got ${exprs.length}")
    SimHashMd5(exprs.head)
  }

  /** k-minhash signature (codegen'd — see [[MinHashK]]) registered as
    * SQL function `minhash_k(shingles, k)`. */
  def registerMinHash(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    val ident = new org.apache.spark.sql.catalyst.FunctionIdentifier("minhash_k")
    if (!reg.functionExists(ident))
      reg.createOrReplaceTempFunction("minhash_k", minHashBuilder, "built-in")
  }

  /** Arity/foldability-checked builder shared by the temp-function path
    * and GraftExtensions. */
  val minHashBuilder: Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
      org.apache.spark.sql.catalyst.expressions.Expression = { exprs =>
    require(exprs.length == 2,
      s"minhash_k expects 2 arguments (shingles, k), got ${exprs.length}")
    require(exprs(1).foldable, "minhash_k: k must be a literal")
    MinHashK(exprs.head, exprs(1).eval().asInstanceOf[Number].intValue())
  }

  /** 64-bit SimHash over the tokens of `toksCol` (a named array<string>
    * column): per-token xxhash64, ±1 vote per bit, sign → bit. One vote
    * PER ELEMENT — pass array_distinct(toks) for set semantics. Entirely
    * in one projection via higher-order folds — no explode, no shuffle;
    * at 100 TB this is embarrassingly parallel per row. Reference
    * (interpreted) formulation; [[SimHash64]] is the codegen'd equivalent
    * used by the queries. */
  def simhash64Hof(toksCol: String): Column = expr(
    s"""aggregate(
          zip_with(
            aggregate(
              transform($toksCol, t -> xxhash64(t)),
              array_repeat(0L, 64),
              (acc, h) -> zip_with(acc, sequence(0, 63),
                            (a, b) -> a + CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END)),
            sequence(0, 63),
            (s, b) -> CASE WHEN s > 0 THEN shiftleft(1L, b) ELSE 0L END),
          0L, (acc, x) -> acc | x)""")
}
