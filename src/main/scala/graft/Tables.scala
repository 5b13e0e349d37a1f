package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet fixtures (TESTDATA.md /
  * FIXTURES.md). One parquet per table under `$dir/`. All reads are plain
  * `spark.read.parquet` — schema comes from the footer, scans are
  * vectorized + column-pruned + filter-pushed by Catalyst, so every query
  * that projects/filters gets pushdown for free (verified via
  * `.explain("formatted")`: `PushedFilters`, `ReadSchema`).
  */
object Tables {
  /** Round 17 (verdict item: the per-query session floor): the resolved
    * DataFrame — file listing + footer schema read + analysis — is
    * memoized per (session, dir, name). Every one of the 238 registry
    * queries re-called `spark.read.parquet` per construction per bench
    * pass, re-listing and re-footer-reading the same immutable fixture
    * file thousands of times per bench run. The memo returns the SAME
    * immutable DataFrame (a logical plan — reuse is free and
    * side-effect-less); keys carry the session token, so a new session
    * re-resolves. Fixture tables are immutable for the life of a
    * session (the driver contract: one sfDir per process), which is
    * exactly the raw-`memo` contract. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    graft.operators.SessionCache.memo(spark, s"tables|$dir|$name") {
      spark.read.parquet(s"$dir/$name.parquet")
    }

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** Normalizes `events.ts` to a microsecond instant (TimestampType)
    * whatever the fixture's physical parquet shape is — driver
    * regenerations have shipped it three ways:
    *  - TIMESTAMP(NANOS), which Spark's reader rejects
    *    ([PARQUET_TYPE_ILLEGAL]) unless the nanosAsLong legacy conf
    *    surfaces it as LongType: truncate ns→µs — the same truncation
    *    DuckDB applies on `CAST(ts AS TIMESTAMP)`. Integer `div` (not
    *    `/`) — ns since epoch ≈ 1.7e18 exceeds double precision (2^53).
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false), inferred as
    *    TIMESTAMP_NTZ: cast to TimestampType. All entry points pin
    *    `spark.sql.session.timeZone=UTC`, so the cast is
    *    micros-preserving and agrees with DuckDB's naive-timestamp read.
    *  - ordinary UTC-adjusted µs/ms timestamp: pass through.
    */
  def events(s: SparkSession, d: String): DataFrame =
    graft.operators.SessionCache.memo(s, s"tables|$d|events-normalized") {
      eventsUnmemoized(s, d)
    }

  private def eventsUnmemoized(s: SparkSession, d: String): DataFrame =
    withNanosAsLong(s) {
      import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
      import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
      val t = table(s, d, "events")
      t.schema("ts").dataType match {
        case LongType =>
          t.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case TimestampNTZType =>
          t.withColumn("ts", col("ts").cast(TimestampType))
        case _ => t
      }
    }

  /** Scopes `spark.sql.legacy.parquet.nanosAsLong` to a BATCH read: sets
    * it, forces analysis (a batch scan snapshots the conf then —
    * verified: the materialization still succeeds after the conf is
    * restored), and restores the previous value so later parquet reads of
    * TIMESTAMP(NANOS) columns in the same session get the normal typed
    * behavior. Not for streaming reads — a streaming source re-converts
    * footer schemas at micro-batch execution, after this scope has
    * closed; see `EventStreams.readEvents`, which sets the flag
    * session-wide instead.
    *
    * The set/analyze/restore window is serialized by synchronizing on the
    * session's shared state, so two threads loading tables on the same
    * SparkSession can't interleave and leak (or prematurely clear) the
    * legacy flag. */
  def withNanosAsLong(s: SparkSession)(read: => DataFrame): DataFrame =
    s.sharedState.synchronized {
      val key = "spark.sql.legacy.parquet.nanosAsLong"
      val prev = s.conf.getOption(key)
      s.conf.set(key, "true")
      try {
        val df = read
        df.schema // force analysis while the conf is set
        df
      } finally prev match {
        case Some(v) => s.conf.set(key, v)
        case None    => s.conf.unset(key)
      }
    }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")

  /** Documents spread across the session's cores: each fixture table is
    * ONE small parquet file → one input partition, which serializes
    * CPU-heavy per-row work (simhash, shingling, hashing TF). A 100 TB
    * corpus arrives pre-split, so an explicit round-robin repartition
    * here reproduces the parallelism production would get for free. */
  def documentsParallel(s: SparkSession, d: String): DataFrame =
    documents(s, d).repartition(s.sparkContext.defaultParallelism)
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Embeddings spread across the session's cores — the
    * [[documentsParallel]] rationale applied to the vector store: the
    * zero-exchange assignment fold (CenterAssign) runs CPU-heavy k·dim
    * work per row in the SCAN's partitioning, and the one-file fixture
    * would serialize it; production's pre-split corpus parallelizes for
    * free. */
  def embeddingsParallel(s: SparkSession, d: String): DataFrame =
    embeddings(s, d).repartition(s.sparkContext.defaultParallelism)
}

/** One registry entry: a named query (the driver contract's
  * `(SparkSession, sfDir) => DataFrame`) plus, when the semantics are
  * ANSI-SQL-expressible, the DuckDB oracle SQL the driver hash-compares
  * against. Column names/types are aligned on both sides (the driver sorts
  * columns by name before hashing).
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)
