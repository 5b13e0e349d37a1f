package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Corpus hygiene operators: PII redaction and URL/domain auditing —
  * the scrub-and-audit steps a training-data pipeline runs before any
  * corpus leaves the ingest zone (reference analog: the wine ETL's
  * strip-@-handle step, `/root/reference/dags/wine_etl_kaggle.py:79`,
  * generalized from one vanity column to document text).
  *
  * Both queries are pure per-row regex projections followed by a hash
  * aggregate — embarrassingly parallel, no joins, no window, nothing
  * corpus-bounded on the reduce side (the domain table is
  * web-graph-vocabulary-sized). The regexes are deliberately restricted
  * to the Java∩RE2 common subset (`\b`, `\d`, classes, bounded
  * repetition — no backrefs/lookaround) so Spark (java.util.regex) and
  * the DuckDB oracle (RE2) match byte-identically. One residual engine
  * difference is documented rather than hidden: `\b` is Unicode-aware
  * in Java but ASCII-only in RE2, so a digit pattern ADJACENT to a
  * non-ASCII letter (e.g. "café555-0000") can diverge between Spark
  * and an RE2-based oracle. The fixture corpus is pure ASCII (verified
  * — zero non-ASCII, zero digit chars), and all injected spans are
  * space-delimited, so the gate is exact; on a CJK-heavy user corpus
  * the scrubber itself stays self-consistent (Java semantics).
  *
  * The driver fixture is word-soup with no organic PII/URLs, so both
  * sides inject deterministic spans keyed off `doc_id` (same recipe as
  * q34's synthetic BMP/WAV payloads): the redactor is then exercised on
  * rows that genuinely contain emails/phones/IPs/URLs, and the expected
  * counts are a pure function of the doc_id residue classes.
  */
object Hygiene {

  private val EmailRe = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
  private val IpRe    = """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"""
  private val PhoneRe = """\b555-\d{4}\b"""
  private val UrlRe   = """https?://[^ ]+"""

  /** Deterministic PII injection over (doc_id, text): every doc_id ≡ 0
    * (mod 5/7/11) gains an email / phone / IPv4 span. Mirrored verbatim
    * in the oracle SQL so counts hash-match. */
  def injectPii(docs: DataFrame): DataFrame =
    docs.filter(col("text").isNotNull).select(col("doc_id"),
      concat(
        col("text"),
        when(col("doc_id") % 5 === 0,
          concat(lit(" contact u"), col("doc_id").cast("string"),
            lit("@ex"), (col("doc_id") % 3).cast("string"), lit(".com")))
          .otherwise(lit("")),
        when(col("doc_id") % 7 === 0,
          concat(lit(" call 555-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
          .otherwise(lit("")),
        when(col("doc_id") % 11 === 0,
          concat(lit(" from 10."), (col("doc_id") % 256).cast("string"),
            lit("."), ((col("doc_id") / 256).cast("long") % 256).cast("string"),
            lit(".7")))
          .otherwise(lit(""))).as("text"))

  /** Core of q91 over any (doc_id, text) frame: per-category match
    * counts on the raw text, then email → IP → phone redaction (the
    * categories are textually disjoint, so order only matters for
    * defense in depth). */
  def piiScrub(docs: DataFrame): DataFrame =
    docs
      .withColumn("n_email", size(regexp_extract_all(col("text"), lit(EmailRe), lit(0))))
      .withColumn("n_ip",    size(regexp_extract_all(col("text"), lit(IpRe), lit(0))))
      .withColumn("n_phone", size(regexp_extract_all(col("text"), lit(PhoneRe), lit(0))))
      .withColumn("redacted",
        regexp_replace(
          regexp_replace(
            regexp_replace(col("text"), EmailRe, "[EMAIL]"),
            IpRe, "[IP]"),
          PhoneRe, "[PHONE]"))
      .select(col("doc_id"), col("n_email"), col("n_phone"), col("n_ip"),
        col("redacted"))

  /** q91 — PII scrub: count + redact emails, phone numbers, and IPv4
    * addresses per document. */
  val q91: Q = Q(
    "q91_pii_scrub",
    run = { (spark, dir) =>
      piiScrub(injectPii(Tables.documentsParallel(spark, dir)))
    },
    oracle = Some("""
      WITH d AS (SELECT doc_id,
              text ||
              CASE WHEN doc_id % 5 = 0 THEN ' contact u' ||
                CAST(doc_id AS VARCHAR) || '@ex' ||
                CAST(doc_id % 3 AS VARCHAR) || '.com' ELSE '' END ||
              CASE WHEN doc_id % 7 = 0 THEN ' call 555-' ||
                lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END ||
              CASE WHEN doc_id % 11 = 0 THEN ' from 10.' ||
                CAST(doc_id % 256 AS VARCHAR) || '.' ||
                CAST((doc_id // 256) % 256 AS VARCHAR) || '.7' ELSE '' END
                AS text
            FROM documents WHERE text IS NOT NULL)
      SELECT doc_id,
        CAST(len(regexp_extract_all(text,
          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INTEGER)
          AS n_email,
        CAST(len(regexp_extract_all(text,
          '\b555-\d{4}\b')) AS INTEGER) AS n_phone,
        CAST(len(regexp_extract_all(text,
          '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS INTEGER) AS n_ip,
        regexp_replace(regexp_replace(regexp_replace(text,
          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
          '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g'),
          '\b555-\d{4}\b', '[PHONE]', 'g') AS redacted
      FROM d"""))

  /** Deterministic URL injection (same pattern as [[injectPii]]):
    * doc_id ≡ 0 (mod 4) gains an https link, ≡ 0 (mod 6) an http one. */
  def injectUrls(docs: DataFrame): DataFrame =
    docs.filter(col("text").isNotNull).select(col("doc_id"),
      concat(
        col("text"),
        when(col("doc_id") % 4 === 0,
          concat(lit(" see https://site"), (col("doc_id") % 20).cast("string"),
            lit(".example.org/p/"), col("doc_id").cast("string")))
          .otherwise(lit("")),
        when(col("doc_id") % 6 === 0,
          concat(lit(" ref http://cdn"), (col("doc_id") % 5).cast("string"),
            lit(".example.net/x")))
          .otherwise(lit(""))).as("text"))

  /** Core of q92: extract every URL, group by host. The reduce side is
    * bounded by the distinct-host vocabulary (web-graph-sized, not
    * corpus-sized) — the same bounding argument as q68's df table. */
  def urlDomains(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        explode(regexp_extract_all(col("text"), lit(UrlRe), lit(0))).as("url"))
      .select(col("doc_id"), col("url"),
        regexp_extract(col("url"), "https?://([^/ ]+)", 1).as("domain"),
        col("url").startsWith("https://").as("is_https"))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_urls"),
        countDistinct(col("doc_id")).as("n_docs"),
        sum(when(col("is_https"), 1L).otherwise(0L)).as("n_https"))

  /** q92 — URL/domain audit: the per-host link census an allowlist /
    * robots-compliance pass reads. */
  val q92: Q = Q(
    "q92_url_domains",
    run = { (spark, dir) =>
      urlDomains(injectUrls(Tables.documentsParallel(spark, dir)))
    },
    oracle = Some("""
      WITH d AS (SELECT doc_id,
              text ||
              CASE WHEN doc_id % 4 = 0 THEN ' see https://site' ||
                CAST(doc_id % 20 AS VARCHAR) || '.example.org/p/' ||
                CAST(doc_id AS VARCHAR) ELSE '' END ||
              CASE WHEN doc_id % 6 = 0 THEN ' ref http://cdn' ||
                CAST(doc_id % 5 AS VARCHAR) || '.example.net/x' ELSE '' END
                AS text
            FROM documents WHERE text IS NOT NULL),
      u AS (SELECT doc_id, unnest(regexp_extract_all(text, 'https?://[^ ]+'))
              AS url FROM d)
      SELECT regexp_extract(url, 'https?://([^/ ]+)', 1) AS domain,
        CAST(count(*) AS BIGINT) AS n_urls,
        CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        CAST(count(*) FILTER (WHERE url LIKE 'https://%') AS BIGINT)
          AS n_https
      FROM u GROUP BY 1"""))

  /** Core of q190: REFERENTIAL-INTEGRITY AUDIT across the warehouse's
    * seven FK edges — the data-quality contract a lake can't enforce
    * at write time (no constraints on parquet) and therefore must
    * AUDIT: per edge, child cardinality, NULL keys (SQL semantics: a
    * null FK is unknown, not an orphan — counted separately, the q178
    * null-predicate discipline), and orphans (non-null keys with no
    * parent). A zero-row violation report is the point: the audit is
    * the proof, and on fuzzed/ingest-corrupted inputs the counts
    * localize the break to an edge instead of a failing join somewhere
    * downstream.
    *
    * Scale shape: each edge is one left-anti join on its key —
    * dimension parents broadcast; the two fact⋈fact edges
    * (lineitem→orders twice-keyed) shuffle co-partitioned on the FK,
    * which is the minimum possible cost of checking it. Counts are
    * map-side-combined; output is 7 rows. */
  /** One FK edge of the audit: (child cardinality, null FKs, orphans)
    * as a 1-row frame — the crossJoin glues two 1-row aggregates, the
    * bounded-scalar shape, never a data cross product. */
  private[graft] def fkEdge(name: String,
      child: org.apache.spark.sql.DataFrame, fk: String,
      parent: org.apache.spark.sql.DataFrame,
      pk: String): org.apache.spark.sql.DataFrame = {
    val stats = child.agg(count(lit(1)).as("child_rows"),
      count(when(col(fk).isNull, 1)).as("null_keys"))
    val orphans = child.filter(col(fk).isNotNull)
      .join(parent.select(col(pk).as(fk)), Seq(fk), "left_anti")
      .agg(count(lit(1)).as("orphans"))
    stats.crossJoin(orphans)
      .select(lit(name).as("fk"), col("child_rows"), col("null_keys"),
        col("orphans"))
  }

  def fkAudit(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    import graft.Tables
    def edge(name: String, child: org.apache.spark.sql.DataFrame,
        fk: String, parent: org.apache.spark.sql.DataFrame,
        pk: String): org.apache.spark.sql.DataFrame =
      fkEdge(name, child, fk, parent, pk)
    Seq(
      edge("lineitem.l_orderkey->orders", Tables.lineitem(spark, dir),
        "l_orderkey", Tables.orders(spark, dir), "o_orderkey"),
      edge("lineitem.l_partkey->part", Tables.lineitem(spark, dir),
        "l_partkey", Tables.part(spark, dir), "p_partkey"),
      edge("lineitem.l_suppkey->supplier", Tables.lineitem(spark, dir),
        "l_suppkey", Tables.supplier(spark, dir), "s_suppkey"),
      edge("orders.o_custkey->customer", Tables.orders(spark, dir),
        "o_custkey", Tables.customer(spark, dir), "c_custkey"),
      edge("customer.c_nationkey->nation", Tables.customer(spark, dir),
        "c_nationkey", Tables.nation(spark, dir), "n_nationkey"),
      edge("supplier.s_nationkey->nation", Tables.supplier(spark, dir),
        "s_nationkey", Tables.nation(spark, dir), "n_nationkey"),
      edge("nation.n_regionkey->region", Tables.nation(spark, dir),
        "n_regionkey", Tables.region(spark, dir), "r_regionkey")
    ).reduce(_.unionByName(_))
  }

  /** q190 — warehouse FK integrity report (7 edges, exact counts). */
  val q190: Q = Q(
    "q190_fk_audit",
    run = { (spark, dir) => fkAudit(spark, dir) },
    oracle = Some {
      def sql(name: String, child: String, fk: String, parent: String,
          pk: String) = s"""
        SELECT '$name' AS fk,
          CAST(count(*) AS BIGINT) AS child_rows,
          CAST(count(*) FILTER (WHERE $fk IS NULL) AS BIGINT) AS null_keys,
          CAST(count(*) FILTER (WHERE $fk IS NOT NULL AND NOT EXISTS
            (SELECT 1 FROM $parent p WHERE p.$pk = c.$fk)) AS BIGINT)
            AS orphans
        FROM $child c"""
      Seq(
        sql("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
          "orders", "o_orderkey"),
        sql("lineitem.l_partkey->part", "lineitem", "l_partkey",
          "part", "p_partkey"),
        sql("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey",
          "supplier", "s_suppkey"),
        sql("orders.o_custkey->customer", "orders", "o_custkey",
          "customer", "c_custkey"),
        sql("customer.c_nationkey->nation", "customer", "c_nationkey",
          "nation", "n_nationkey"),
        sql("supplier.s_nationkey->nation", "supplier", "s_nationkey",
          "nation", "n_nationkey"),
        sql("nation.n_regionkey->region", "nation", "n_regionkey",
          "region", "r_regionkey")
      ).mkString(" UNION ALL ")
    })

  val all: Seq[Q] = Seq(q91, q92, q190)
}
