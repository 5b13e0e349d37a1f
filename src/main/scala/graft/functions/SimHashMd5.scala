package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd md5-family 64-bit SimHash over an `array<string>` TOKEN
  * column, emitted as the 16-hex-char signature string (round 17).
  *
  * Semantics identical to q31's former higher-order-function chain
  * (md5 per token → two conv() radix decodes → 16×4 nibble-bit vote
  * folds → hex re-pack), which dispatched ~64 interpreted lambdas per
  * token and materialized per-token hex strings plus 16 intermediate
  * vote arrays per row. Here: one MessageDigest MD5 per token (the
  * same digest bytes Spark's `md5()` hex-encodes and DuckDB replays),
  * ±1 vote per (hex position p ∈ 0..15, bit k ∈ 0..3) of the digest's
  * leading 64 bits, ties-to-0 via strict `> 0`, output nibble packed
  * back to lowercase hex. A NULL array yields NULL; a NULL element
  * votes −1 on every bit (exactly what the old chain's
  * IF(NULL-condition) else-branch did). TextVectorSpec pins equality
  * against the interpreted SQL formulation; the DuckDB oracle replays
  * the full signature digit by digit under the hash gate.
  */
case class SimHashMd5(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash_md5 expects array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = StringType

  @transient private lazy val mdLocal =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val md = mdLocal.get()
    val votes = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (arr.isNullAt(i)) {
        var b = 0
        while (b < 64) { votes(b) -= 1; b += 1 }
      } else {
        val dg = md.digest(arr.getUTF8String(i).getBytes)
        var p = 0
        while (p < 16) {
          val nib = (dg(p >> 1) >> (if ((p & 1) == 0) 4 else 0)) & 0xF
          var k = 0
          while (k < 4) {
            votes(4 * p + k) += (if (((nib >> k) & 1) == 1) 1 else -1)
            k += 1
          }
          p += 1
        }
      }
      i += 1
    }
    val out = new Array[Byte](16)
    var p = 0
    while (p < 16) {
      var nib = 0
      var k = 0
      while (k < 4) { if (votes(4 * p + k) > 0) nib |= (1 << k); k += 1 }
      out(p) = SimHashMd5.HexDigits(nib)
      p += 1
    }
    UTF8String.fromBytes(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val md = ctx.addMutableState("java.security.MessageDigest", "graftMd5",
      v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
               |catch (java.security.NoSuchAlgorithmException e) {
               |  throw new RuntimeException(e);
               |}""".stripMargin)
    nullSafeCodeGen(ctx, ev, a => {
      val votes = ctx.freshName("votes")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val p = ctx.freshName("p")
      val k = ctx.freshName("k")
      val dg = ctx.freshName("dg")
      val nib = ctx.freshName("nib")
      val out = ctx.freshName("out")
      s"""
         |int[] $votes = new int[64];
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  if ($a.isNullAt($i)) {
         |    for (int $b = 0; $b < 64; $b++) $votes[$b] -= 1;
         |  } else {
         |    byte[] $dg = $md.digest($a.getUTF8String($i).getBytes());
         |    for (int $p = 0; $p < 16; $p++) {
         |      int $nib = ($dg[$p >> 1] >> ((($p & 1) == 0) ? 4 : 0)) & 0xF;
         |      for (int $k = 0; $k < 4; $k++) {
         |        $votes[4 * $p + $k] += ((($nib >> $k) & 1) == 1) ? 1 : -1;
         |      }
         |    }
         |  }
         |}
         |byte[] $out = new byte[16];
         |for (int $p = 0; $p < 16; $p++) {
         |  int $nib = 0;
         |  for (int $k = 0; $k < 4; $k++) {
         |    if ($votes[4 * $p + $k] > 0) $nib |= (1 << $k);
         |  }
         |  $out[$p] = graft.functions.SimHashMd5.hexDigit($nib);
         |}
         |${ev.value} = UTF8String.fromBytes($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashMd5 {
  private[functions] val HexDigits: Array[Byte] =
    "0123456789abcdef".getBytes("US-ASCII")
  /** codegen helper */
  def hexDigit(nib: Int): Byte = HexDigits(nib)
}
