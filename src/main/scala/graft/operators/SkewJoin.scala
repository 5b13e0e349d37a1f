package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys (SURVEY.md engine posture; the manual
  * fallback when AQE's runtime skew-split isn't available — e.g. the
  * skew is in a non-shuffle-stats-visible place, or the join is written
  * by an upstream tool).
  *
  * Left (skewed, large) rows get a random salt in [0, factor); right
  * (small-but-not-broadcastable) rows are replicated `factor` times with
  * every salt value. The join key becomes (key, salt), spreading each hot
  * key over `factor` reducers. Row multiplicity is preserved exactly —
  * each left row matches exactly the one replica with its salt.
  */
object SkewJoin {

  /** Inner equi-join `left.key == right.key` with `factor`-way salting.
    * Column name collisions must be resolved by the caller beforehand. */
  def saltedInnerJoin(left: DataFrame, leftKey: String,
      right: DataFrame, rightKey: String, factor: Int): DataFrame = {
    require(factor >= 1)
    val salted = left.withColumn("__salt",
      (rand(seed = 42L) * factor).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated,
        salted(leftKey) === replicated(rightKey) &&
          salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }
}
