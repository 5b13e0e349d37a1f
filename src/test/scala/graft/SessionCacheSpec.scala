package graft

import org.scalatest.funsuite.AnyFunSuite

/** Key discipline for the session-scoped build-once memo every
  * registry build/probe seam rides (IVF/PQ/PageRank indexes, dedup
  * labels, graph edge bases, shingle/fingerprint/span tables). */
class SessionCacheSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("memo builds once per key and never cross-contaminates keys") {
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    def build(tag: String): String = { builds.incrementAndGet(); tag }
    val a1 = operators.SessionCache.memo(spark, "spec-key-a")(build("a"))
    val a2 = operators.SessionCache.memo(spark, "spec-key-a")(build("a'"))
    val b = operators.SessionCache.memo(spark, "spec-key-b")(build("b"))
    assert(a1 == "a" && a2 == "a") // second call returns the FIRST build
    assert(b == "b")
    assert(builds.get == 2) // one build per distinct key
  }

  test("keys parameterized by path/params isolate different corpora") {
    // the contract every ...For(spark, dir) seam relies on: the key
    // carries the input path + every build parameter, so two corpora
    // (or two parameterizations) can never share an artifact
    val x = operators.SessionCache.memo(spark, "spec-art|/d1|k=4")(1)
    val y = operators.SessionCache.memo(spark, "spec-art|/d2|k=4")(2)
    val z = operators.SessionCache.memo(spark, "spec-art|/d1|k=8")(3)
    assert(x == 1 && y == 2 && z == 3)
  }
}
