package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions: a session built with the extensions gets the native
  * functions in plain SQL without per-query registration. */
class ExtensionsSpec extends AnyFunSuite {

  test("withExtensions exposes vec_dot_f and simhash64 in SQL") {
    // getOrCreate() returns any already-active session and IGNORES
    // withExtensions — clear the active/default slots so a fresh session
    // (sharing the same SparkContext) is built with the extensions, then
    // restore the shared session for the other suites.
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val dot = s.sql(
        "SELECT vec_dot_f(array(cast(1.0 as float), cast(2.0 as float)), " +
          "array(cast(3.0 as float), cast(4.0 as float))) AS d").head().getDouble(0)
      assert(dot == 11.0)
      val sh = s.sql(
        "SELECT simhash64(array('alpha', 'beta')) AS h").head().getLong(0)
      assert(sh != 0L)
    } finally {
      // don't stop (shared SparkContext); restore the prior session slots
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
