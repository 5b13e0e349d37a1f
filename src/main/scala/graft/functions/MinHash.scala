package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Codegen'd k-minhash signature over an `array<string>` shingle set:
  * slot j = min over elements of xxhash64(element, seed_j), with
  * deterministic seeds 42 + 1000003·j. Registered as SQL function
  * `minhash_k(shingles, k)`.
  *
  * This hashes SHINGLE IDENTITY directly — no intermediate
  * term-frequency bucketing — so P(sig_j(A) = sig_j(B)) is exactly the
  * Jaccard similarity of the two shingle sets (the classic minhash
  * estimator), with no hash-bucket collision layer distorting it. One
  * tight generated loop per row; the signature is k longs, so a staged
  * signature table is doc_id + k·8 bytes per doc.
  *
  * Null elements are skipped; a null array yields null; an empty array
  * yields all-Long.MaxValue slots (callers filter empty shingle sets
  * upstream — two empty docs would otherwise band-collide).
  */
case class MinHashK(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1 && k <= 64, s"minhash_k: k must be in [1, 64], got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_k expects array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        var j = 0
        while (j < k) {
          val h = XXH64.hashUnsafeBytes(
            s.getBaseObject, s.getBaseOffset, s.numBytes, 42L + 1000003L * j)
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val s = ctx.freshName("s")
      s"""
         |long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  if (!$a.isNullAt($i)) {
         |    UTF8String $s = $a.getUTF8String($i);
         |    for (int $j = 0; $j < $k; $j++) {
         |      long $h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
         |        $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L + 1000003L * $j);
         |      if ($h < $mins[$j]) $mins[$j] = $h;
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
