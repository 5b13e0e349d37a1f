package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{MinHashK, SimHash64, SimHashMd5, VecDotFloat}

/** Session extensions: registers the engine's native expressions
  * (`vec_dot_f`, `simhash64`) for every session created with
  *
  * {{{
  * spark.sql.extensions=graft.GraftExtensions
  * // or: SparkSession.builder().withExtensions(new GraftExtensions)
  * }}}
  *
  * so SQL users get them without per-session registry calls (the query
  * registry also self-registers defensively; this is the library-wide
  * front door).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("vec_dot_f"),
      new ExpressionInfo(classOf[VecDotFloat].getName, "vec_dot_f"),
      graft.functions.VectorFunctions.vecDotBuilder))
    e.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      graft.functions.TextFunctions.simHashBuilder))
    e.injectFunction((
      new FunctionIdentifier("simhash_md5"),
      new ExpressionInfo(classOf[SimHashMd5].getName, "simhash_md5"),
      graft.functions.TextFunctions.simHashMd5Builder))
    e.injectFunction((
      new FunctionIdentifier("minhash_k"),
      new ExpressionInfo(classOf[MinHashK].getName, "minhash_k"),
      graft.functions.TextFunctions.minHashBuilder))
  }
}
