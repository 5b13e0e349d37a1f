package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Hygiene

/** Semantic contracts for the q91/q92 hygiene operators: complete
  * redaction (no survivor matches), count correctness against the
  * deterministic injection schedule, and domain extraction. */
class HygieneSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("q91 redaction is complete and counts match the injection schedule") {
    val injected = Hygiene.injectPii(
      Tables.documents(spark, TestSpark.sf0001))
    val out = Hygiene.piiScrub(injected).cache()
    // nothing the three scrubbers target survives in redacted text
    val survivors = out.filter(
      size(regexp_extract_all(col("redacted"),
        lit("""[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""), lit(0))) > 0 ||
      size(regexp_extract_all(col("redacted"),
        lit("""\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"""), lit(0))) > 0 ||
      size(regexp_extract_all(col("redacted"),
        lit("""\b555-\d{4}\b"""), lit(0))) > 0)
    assert(survivors.count() == 0)
    // the injection schedule is a pure function of doc_id residues
    val wrong = out.filter(
      (col("doc_id") % 5 === 0 && col("n_email") < 1) ||
      (col("doc_id") % 5 =!= 0 && col("n_email") > 0) ||
      (col("doc_id") % 7 === 0 && col("n_phone") < 1) ||
      (col("doc_id") % 11 === 0 && col("n_ip") < 1))
    assert(wrong.count() == 0)
    // redaction markers appear exactly where counts say they should
    val marks = out.filter(col("n_email") > 0 &&
      !col("redacted").contains("[EMAIL]"))
    assert(marks.count() == 0)
    out.unpersist()
  }

  test("q91 scrubs organic PII too, not just the synthetic injection") {
    val docs = Seq(
      (1L, "mail me at jane.doe+spam@corp.example.co then visit"),
      (2L, "host is 192.168.0.1 port 8080"),
      (3L, "call 555-0199 now"),
      (4L, "clean text with no pii at all")).toDF("doc_id", "text")
    val out = Hygiene.piiScrub(docs)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4))).toMap
    assert(out(1L)._1 == 1 && out(1L)._4.contains("[EMAIL]"))
    assert(out(2L)._3 == 1 && out(2L)._4.contains("[IP]"))
    assert(out(3L)._2 == 1 && out(3L)._4.contains("[PHONE]"))
    assert(out(4L) == ((0, 0, 0, "clean text with no pii at all")))
  }

  test("q92 finds every injected URL and maps it to the right domain") {
    val injected = Hygiene.injectUrls(
      Tables.documents(spark, TestSpark.sf0001))
    val docs = Tables.documents(spark, TestSpark.sf0001)
      .filter(col("text").isNotNull)
    val nMod4 = docs.filter(col("doc_id") % 4 === 0).count()
    val nMod6 = docs.filter(col("doc_id") % 6 === 0).count()
    val out = Hygiene.urlDomains(injected).cache()
    val total = out.agg(sum("n_urls")).as[Long].head()
    assert(total == nMod4 + nMod6,
      s"expected ${nMod4 + nMod6} urls, found $total")
    // every domain is one of the two injected families, and the https
    // flag follows the scheme of its family
    val badDomain = out.filter(
      !col("domain").rlike("""^site\d+\.example\.org$""") &&
      !col("domain").rlike("""^cdn\d+\.example\.net$"""))
    assert(badDomain.count() == 0)
    val badScheme = out.filter(
      (col("domain").startsWith("site") && col("n_https") =!= col("n_urls")) ||
      (col("domain").startsWith("cdn") && col("n_https") =!= 0))
    assert(badScheme.count() == 0)
    out.unpersist()
  }

  test("q91 scrub is idempotent: a second pass changes nothing") {
    val once = Hygiene.piiScrub(Hygiene.injectPii(
      Tables.documents(spark, TestSpark.sf0001)))
      .select(col("doc_id"), col("redacted").as("text"))
    val twice = Hygiene.piiScrub(once)
    assert(twice.filter(col("n_email") > 0 || col("n_phone") > 0 ||
      col("n_ip") > 0).count() == 0)
    assert(twice.join(once.withColumnRenamed("text", "orig"), "doc_id")
      .filter(col("redacted") =!= col("orig")).count() == 0)
  }

  test("q92 handles organic URLs: query strings, ports, dedup by host") {
    val docs = Seq(
      (1L, "read https://docs.example.io/a?q=1&x=2 and " +
        "https://docs.example.io/b#frag today"),
      (2L, "local http://localhost:8080/health check"),
      (3L, "no links here at all")).toDF("doc_id", "text")
    val out = Hygiene.urlDomains(docs)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("docs.example.io") == ((2L, 1L, 2L)))
    assert(out("localhost:8080") == ((1L, 1L, 0L)))
    assert(out.size == 2)
  }

  test("q190 fkEdge: orphans counted, null FKs set aside, clean edges report zero") {
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val child = Seq(Some(1L), Some(1L), Some(2L), Some(99L), None)
      .toDF("fk_col")
    val row = Hygiene.fkEdge("child.fk->parent", child, "fk_col",
      parent, "pk").collect().head
    assert(row.getString(0) == "child.fk->parent")
    assert(row.getLong(1) == 5L, "child_rows")
    assert(row.getLong(2) == 1L, "null_keys — the None row is unknown, not an orphan")
    assert(row.getLong(3) == 1L, "orphans — only the 99 key")
    // duplicate matched keys are NOT orphans however many times they repeat
    val clean = Hygiene.fkEdge("x", Seq(1L, 1L, 1L).toDF("fk_col"),
      "fk_col", parent, "pk").collect().head
    assert(clean.getLong(3) == 0L)
  }

  test("q190 registry run: the fixture warehouse is referentially intact on all 7 edges") {
    val out = Hygiene.q190.run(spark, TestSpark.sf0001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out.size == 7)
    out.foreach { case (edge, (rows, nulls, orphans)) =>
      assert(rows > 0, s"$edge audited an empty child")
      assert(orphans == 0L, s"$edge reports $orphans orphans on clean fixtures")
      assert(nulls >= 0L)
    }
  }
}
