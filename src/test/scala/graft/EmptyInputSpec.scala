package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import scala.util.control.NonFatal

/** Degenerate-input robustness: every registry query must run to
  * completion on ZERO-ROW copies of the fixture tables (schemas
  * preserved) and produce a (possibly empty) result — a library user's
  * first empty partition must not throw. Queries whose semantics
  * legitimately demand data (none, by design) would be listed here with
  * a rationale; the assertion is that the list stays empty. */
class EmptyInputSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  lazy val emptyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_empty").toString
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "documents", "embeddings")
    tables.foreach { t =>
      spark.read.parquet(s"${TestSpark.sf0001}/$t.parquet")
        .limit(0).coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    // events is TIMESTAMP(NANOS) parquet: route through the scoped
    // loader, then write the empty slice back as plain (µs) parquet —
    // Tables.events re-reads that fine (the nanos scope is a no-op on
    // already-µs files)
    Tables.events(spark, TestSpark.sf0001).limit(0).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("every registry query completes on zero-row inputs") {
    val failures = SparkEntry.registry.flatMap { q =>
      try { q.run(spark, emptyDir).queryExecution.toRdd.count(); None }
      // NonFatal only: an OOM/linkage error must abort the suite, not
      // masquerade as one query's robustness failure
      catch { case NonFatal(e) =>
        Some(q.name -> e.toString.linesIterator.next()) }
    }
    assert(failures.isEmpty,
      "queries failing on empty inputs:\n" +
        failures.map { case (n, e) => s"  $n: $e" }.mkString("\n"))
  }

  test("clustering and splits return empty maps on empty corpora") {
    val cl = ext.DedupCluster.clusters(Tables.documents(spark, emptyDir))
    assert(cl.count() == 0)
    val sp = ext.Sampling.hashSplit(Tables.documents(spark, emptyDir))
    assert(sp.filter(col("split").isNull).count() == 0)
  }
}
