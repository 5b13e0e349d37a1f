package graft

import org.scalatest.funsuite.AnyFunSuite

/** Global plan hygiene: every registry query must plan without an
  * unpartitioned CartesianProduct (broadcast nested-loop for the
  * deliberately-broadcast query-vector joins is fine), and must plan at
  * all (analysis errors surface here, before the driver's gate). */
class PlanHygieneSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("no registry query plans a CartesianProduct; all queries plan") {
    val offenders = SparkEntry.registry.flatMap { q =>
      val plan = q.run(spark, TestSpark.sf0001).queryExecution.executedPlan.toString
      if (plan.contains("CartesianProduct")) Some(q.name) else None
    }
    assert(offenders.isEmpty, s"cartesian products in: $offenders")
  }
}
