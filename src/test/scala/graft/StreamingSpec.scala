package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventStreams

/** §5.2-6: streaming ≡ batch on the same windows; watermarked dedup;
  * custom keyed state. */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** The streaming file source wants a directory of files. */
  private lazy val eventsDir: String = {
    val d = Files.createTempDirectory("events_stream")
    Files.copy(Paths.get(s"${TestSpark.sf0001}/events.parquet"),
      d.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    d.toString
  }

  test("streaming tumbling window equals batch q20 on the same data") {
    val stream = EventStreams.tumbling(EventStreams.readEvents(spark, eventsDir))
    val got = EventStreams.runToMemory(stream, "tumbling_out", OutputMode.Complete)
    val want = graft.queries.EventWindows.q20.run(spark, TestSpark.sf0001)
    assert(got.count() == want.count())
    assert(got.exceptAll(want).count() == 0)
    assert(want.exceptAll(got).count() == 0)
  }

  test("streaming session windows equal batch q22") {
    val stream = EventStreams.sessions(EventStreams.readEvents(spark, eventsDir))
    val got = EventStreams.runToMemory(stream, "session_out", OutputMode.Complete)
    val want = graft.queries.EventWindows.q22.run(spark, TestSpark.sf0001)
    assert(got.count() == want.count())
    assert(got.exceptAll(want).count() == 0)
  }

  test("dropDuplicatesWithinWatermark removes in-watermark duplicates") {
    // duplicate every event id by unioning the raw file with itself
    val d2 = Files.createTempDirectory("events_dup")
    Files.copy(Paths.get(s"$eventsDir/events.parquet"),
      d2.resolve("a.parquet"), StandardCopyOption.REPLACE_EXISTING)
    Files.copy(Paths.get(s"$eventsDir/events.parquet"),
      d2.resolve("b.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val deduped = EventStreams.dedupWithinWatermark(
      EventStreams.readEvents(spark, d2.toString))
    val got = EventStreams.runToMemory(deduped, "dedup_out", OutputMode.Append)
    assert(got.count() == 1000) // sf0.001 events, each seen twice
  }

  test("foreachBatch idempotent sink: checkpoint restart does not duplicate") {
    val src = Files.createTempDirectory("fb_src")
    val out = Files.createTempDirectory("fb_out").toString
    val ckpt = Files.createTempDirectory("fb_ckpt").toString
    Files.copy(Paths.get(s"${TestSpark.sf0001}/events.parquet"),
      src.resolve("a.parquet"))
    def readSrc = EventStreams.readEvents(spark, src.toString)
      .select("event_id", "ts", "user_id", "event_type", "value")
    // run 1: process the first file
    val q1 = EventStreams.startIdempotentParquetSink(readSrc, out, ckpt)
    q1.processAllAvailable(); q1.stop()
    val after1 = spark.read.parquet(s"$out/batch_*").count()
    assert(after1 == 1000)
    // restart with NO new data: checkpoint must prevent reprocessing
    val q2 = EventStreams.startIdempotentParquetSink(readSrc, out, ckpt)
    q2.processAllAvailable(); q2.stop()
    assert(spark.read.parquet(s"$out/batch_*").count() == 1000)
    // restart with one new file: only the new file's rows are appended
    Files.copy(Paths.get(s"${TestSpark.sf0001}/events.parquet"),
      src.resolve("b.parquet"))
    val q3 = EventStreams.startIdempotentParquetSink(readSrc, out, ckpt)
    q3.processAllAvailable(); q3.stop()
    assert(spark.read.parquet(s"$out/batch_*").count() == 2000)
  }

  test("stream-stream interval join equals the batch twin q235 ROW-EXACTLY, across arrival splits") {
    // the registry twin (q235) is the ground truth; run the streaming
    // join over TWO different physical arrival splits of the same
    // events and demand row-set equality each time — the watermarked
    // stream-stream state provably loses nothing on in-watermark data
    val want = graft.queries.EventWindows.q235
      .run(spark, TestSpark.sf0001).cache()
    try {
      // split A: everything in one file (single micro-batch)
      val gotOne = EventStreams.runToMemory(
        EventStreams.purchaseErrorJoin(
          EventStreams.readEvents(spark, eventsDir)),
        "ssjoin_out", OutputMode.Append)
      // split B: the error side arrives a WHOLE MICRO-BATCH before the
      // purchase side (two processAllAvailable rounds with a file copy
      // in between), so the join must buffer error state across
      // batches. Errors first: the purchase-side watermark is still
      // unadvanced when they arrive, so nothing is droppable-as-late —
      // the law isolates state buffering from late-data policy.
      val d2 = Files.createTempDirectory("events_split_stage")
      val flat = Files.createTempDirectory("events_split")
      val ev = graft.Tables.events(spark, TestSpark.sf0001)
      ev.filter(col("event_type") =!= "purchase").coalesce(1)
        .write.parquet(s"$d2/errs")
      ev.filter(col("event_type") === "purchase").coalesce(1)
        .write.parquet(s"$d2/purch")
      def firstParquet(part: String) = new java.io.File(s"$d2/$part")
        .listFiles().find(_.getName.endsWith(".parquet")).get.toPath
      Files.copy(firstParquet("errs"), flat.resolve("a.parquet"))
      val joined = EventStreams.purchaseErrorJoin(
        EventStreams.readEvents(spark, flat.toString))
      val q = joined.writeStream.outputMode(OutputMode.Append)
        .format("memory").queryName("ssjoin_split_out").start()
      q.processAllAvailable()
      Files.copy(firstParquet("purch"), flat.resolve("b.parquet"))
      q.processAllAvailable()
      q.stop()
      val gotSplit = spark.table("ssjoin_split_out")
      Seq("one-file" -> gotOne, "split-arrival" -> gotSplit).foreach {
        case (tag, got) =>
          assert(got.count() == want.count(), s"$tag: row count")
          assert(got.exceptAll(want).count() == 0 &&
            want.exceptAll(got).count() == 0,
            s"$tag: streaming join diverged from batch twin q235")
      }
    } finally { want.unpersist(); () }
  }

  test("streaming funnel state machine equals batch q61 on ordered arrival") {
    val stream = EventStreams.streamingFunnel(
      EventStreams.readEvents(spark, eventsDir))
    val got = EventStreams.runToMemory(stream.toDF(), "funnel_out",
      OutputMode.Update)
    val want = graft.queries.Funnels.q61.run(spark, TestSpark.sf0001)
    assert(got.count() == want.count())
    assert(got.exceptAll(want).count() == 0)
    assert(want.exceptAll(got).count() == 0)
  }

  test("streaming sessionize equals batch q79 on ordered arrival") {
    val stream = EventStreams.streamingSessionize(
      EventStreams.readEvents(spark, eventsDir))
    val got = EventStreams.runToMemory(stream.toDF(), "sessionize_out",
      OutputMode.Append)
    val want = graft.queries.EventWindows.q79.run(spark, TestSpark.sf0001)
      .select(col("event_id"), col("user_id"), col("ts"),
        col("session_idx"))
    assert(got.count() == want.count())
    assert(got.exceptAll(want).count() == 0)
    assert(want.exceptAll(got).count() == 0)
  }

  test("streaming SCD-2 intervals equal batch q93's closed intervals") {
    val stream = EventStreams.streamingStateIntervals(
      EventStreams.readEvents(spark, eventsDir))
    val got = EventStreams.runToMemory(stream.toDF(), "scd_out",
      OutputMode.Append)
    val want = graft.queries.Warehouse.q93.run(spark, TestSpark.sf0001)
      .filter(!col("is_current"))
      .select(col("user_id"), col("event_type"), col("valid_from"),
        col("valid_to"))
    assert(got.count() == want.count())
    assert(got.exceptAll(want).count() == 0)
    assert(want.exceptAll(got).count() == 0)
  }

  /** Splits the sf0.001 events fixture at its median timestamp into two
    * single-file micro-batches (file a triggers before b). Reads through
    * `Tables.events`, so the split is agnostic to the fixture's physical
    * encoding (ns-long, µs-NTZ, µs-instant — driver regenerations have
    * shipped all three); the written halves are ordinary µs instants,
    * which `readEvents` sniffs and passes through typed. */
  private def timeSplitEventsDir(tag: String): java.nio.file.Path = {
    val d = Files.createTempDirectory(s"events_$tag")
    val tmpA = Files.createTempDirectory(s"${tag}_a").toString
    val tmpB = Files.createTempDirectory(s"${tag}_b").toString
    val ev = Tables.events(spark, TestSpark.sf0001)
      .withColumn("us", unix_micros(col("ts")))
    val mid = ev.stat.approxQuantile("us", Array(0.5), 0.0)(0).toLong
    ev.filter(col("us") <= mid).drop("us").coalesce(1)
      .write.mode("overwrite").parquet(tmpA)
    ev.filter(col("us") > mid).drop("us").coalesce(1)
      .write.mode("overwrite").parquet(tmpB)
    def partOf(dir: String) = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).head.toPath
    val fa = d.resolve("a.parquet")
    val fb = d.resolve("b.parquet")
    Files.copy(partOf(tmpA), fa)
    Files.copy(partOf(tmpB), fb)
    fa.toFile.setLastModified(1000000L) // file source processes a before b
    fb.toFile.setLastModified(2000000L)
    d
  }

  test("streaming SCD-2 twin carries open runs across micro-batches") {
    // time-split files -> two micro-batches (maxFilesPerTrigger=1): a
    // run that STARTS in batch A and closes in batch B must emit with
    // its valid_from carried through state, not batch B's first sight
    val d = timeSplitEventsDir("scd")
    val stream = EventStreams.streamingStateIntervals(
      EventStreams.readEvents(spark, d.toString))
    val got = EventStreams.runToMemory(stream.toDF(), "scd_mb_out",
      OutputMode.Append)
    val want = graft.queries.Warehouse.q93.run(spark, TestSpark.sf0001)
      .filter(!col("is_current"))
      .select(col("user_id"), col("event_type"), col("valid_from"),
        col("valid_to"))
    assert(got.count() == want.count())
    assert(got.exceptAll(want).count() == 0,
      "streamed interval not in batch q93 (state carry broke valid_from)")
    assert(want.exceptAll(got).count() == 0,
      "batch interval missing from the two-batch stream")
  }

  test("streaming last-touch twin equals batch q100 across micro-batches") {
    // same two-file time split as the SCD twin: purchases in batch B
    // must credit touches whose state was written in batch A
    val d = timeSplitEventsDir("lt")
    val stream = EventStreams.streamingLastTouch(
      EventStreams.readEvents(spark, d.toString))
    val got = EventStreams.runToMemory(stream.toDF(), "lt_out",
      OutputMode.Append)
    val want = graft.queries.Funnels.q100.run(spark, TestSpark.sf0001)
    assert(got.count() == want.count())
    assert(got.exceptAll(want).count() == 0,
      "streamed attribution diverges from batch q100")
    assert(want.exceptAll(got).count() == 0)
  }

  test("streaming HLL sketch twin equals batch q77 exactly (multi-batch)") {
    // two time-split files → two micro-batches: the second batch's days
    // fall inside the first's 7-day windows, so incremental sketch
    // merges AND window re-emission are both exercised, not just a
    // single-batch replay of the batch plan
    val d = timeSplitEventsDir("hll")
    val stream = EventStreams.streamingRollingUsersSketch(
      EventStreams.readEvents(spark, d.toString))
    val all = EventStreams.runToMemory(stream.toDF(), "hll_twin_out",
      OutputMode.Update)
    // keep-last per (type, day): seq is monotone per event_type
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type"), col("day")).orderBy(col("seq").desc)
    val gotAll = all.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("day"), col("users_7d_est"))
    val want = graft.queries.Funnels.q77.run(spark, TestSpark.sf0001)
    // streaming emits each type's calendar-span SUPERSET; the contract is
    // equality after semijoin to the global day grid (= batch q77's days)
    val got = gotAll.join(want.select("day").distinct(), Seq("day"), "left_semi")
      .select(col("event_type"), col("day"), col("users_7d_est"))
    assert(got.count() == want.count())
    assert(got.exceptAll(want).count() == 0, "streaming estimates diverge from batch q77")
    assert(want.exceptAll(got).count() == 0, "batch rows missing from streaming output")
    // update mode really did supersede first-batch estimates
    assert(all.count() > gotAll.count(),
      "expected re-emission of windows across micro-batches")
  }

  /** Sparse-day fixture for the HLL twin grid contract: clicks on day 1
    * only, purchases on day 3 only — so the global grid has a day where
    * each type is quiet but still windowed by batch q77. Rows are
    * (event_id, ts_ns, user_id, event_type); written one file per group
    * with mtimes forcing the given trigger order. */
  private def writeSparseEvents(groups: Seq[Seq[(Long, Long, Long, String)]]): String = {
    import spark.implicits._
    val d = Files.createTempDirectory("events_sparse")
    groups.zipWithIndex.foreach { case (rows, i) =>
      val tmp = Files.createTempDirectory(s"sparse_$i").toString
      rows.map { case (id, ts, uid, et) => (id, ts, uid, et, 1.0, "{}") }
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head.toPath
      val dst = d.resolve(f"g$i%02d.parquet")
      Files.copy(part, dst)
      dst.toFile.setLastModified(1000000L * (i + 1))
    }
    d.toString
  }

  private val dayNs = 86400L * 1000000000L
  private val sparseRows: Seq[(Long, Long, Long, String)] = Seq(
    (1L, 1 * dayNs + 1000L, 10L, "click"),
    (2L, 1 * dayNs + 2000L, 11L, "click"),
    (3L, 3 * dayNs + 1000L, 20L, "purchase"),
    (4L, 3 * dayNs + 2000L, 21L, "purchase"),
    (5L, 3 * dayNs + 3000L, 10L, "purchase"))

  private def batchSketchOf(rows: Seq[(Long, Long, Long, String)]) = {
    import spark.implicits._
    val batch = rows
      .map { case (id, ts, uid, et) => (id, ts / 1000L, uid, et) }
      .toDF("event_id", "ts_us", "user_id", "event_type")
      .withColumn("ts", expr("timestamp_micros(ts_us)"))
    graft.queries.Funnels.rollingDistinctUsersSketch(batch)
  }

  private def keepLastOnGrid(streamDir: String, name: String) = {
    val stream = EventStreams.streamingRollingUsersSketch(
      EventStreams.readEvents(spark, streamDir))
    val all = EventStreams.runToMemory(stream.toDF(), name, OutputMode.Update)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type"), col("day")).orderBy(col("seq").desc)
    all.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("event_type"), col("day"), col("users_7d_est"))
  }

  test("streaming HLL twin emits grid rows for days where a type is quiet") {
    // one trigger per type → the click group's machine never sees day 3
    val dir = writeSparseEvents(Seq(
      sparseRows.filter(_._4 == "click"),
      sparseRows.filter(_._4 == "purchase")))
    val want = batchSketchOf(sparseRows)
    val got = keepLastOnGrid(dir, "hll_sparse_out")
      .join(want.select("day").distinct(), Seq("day"), "left_semi")
      .select(col("event_type"), col("day"), col("users_7d_est"))
    // batch emits (click, day3): quiet that day, active within the window
    assert(want.filter(col("event_type") === "click").count() == 2)
    assert(got.count() == want.count())
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0,
      "sparse-day grid rows diverge from batch q77")
  }

  test("streaming HLL twin is arrival-order independent (shuffled triggers)") {
    // same rows, two hostile orders: later days first, types interleaved,
    // one event per trigger
    val orderA = Seq(sparseRows(4), sparseRows(0), sparseRows(2),
      sparseRows(1), sparseRows(3)).map(Seq(_))
    val orderB = Seq(sparseRows(1), sparseRows(3), sparseRows(0),
      sparseRows(4), sparseRows(2)).map(Seq(_))
    val want = batchSketchOf(sparseRows)
    val grid = want.select("day").distinct()
    Seq(writeSparseEvents(orderA) -> "hll_ooo_a",
        writeSparseEvents(orderB) -> "hll_ooo_b").foreach { case (dir, nm) =>
      val got = keepLastOnGrid(dir, nm)
        .join(grid, Seq("day"), "left_semi")
        .select(col("event_type"), col("day"), col("users_7d_est"))
      assert(got.count() == want.count(), s"$nm row count")
      assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0,
        s"$nm diverges from batch under shuffled arrival")
    }
  }

  test("nanosAsLong is restored after the last streaming query terminates") {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    // drive one events stream to completion
    val stream = EventStreams.tumbling(EventStreams.readEvents(spark, eventsDir))
    EventStreams.runToMemory(stream, "nanos_restore_out", OutputMode.Complete)
    // the restore rides the async listener bus — poll briefly
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (spark.conf.getOption(key).contains("true") &&
        System.nanoTime() < deadline) Thread.sleep(50)
    assert(!spark.conf.getOption(key).contains("true"),
      "nanosAsLong still set after stream termination")
    // with the flag restored, a batch events read through the scoped
    // loader still yields TYPED timestamps (the scope sets and restores
    // around analysis), and the session default is back: a raw read of
    // the fixture must not silently produce longs. Only the
    // TIMESTAMP(NANOS) fixture shape has an error symptom (Spark's
    // default rejects nanos); a µs fixture legitimately reads typed.
    val ts = Tables.events(spark, TestSpark.sf0001).schema("ts").dataType
    assert(ts == org.apache.spark.sql.types.TimestampType)
    val rawTs = scala.util.Try(
      spark.read.parquet(s"$eventsDir/events.parquet").schema("ts").dataType)
    assert(rawTs.toOption.forall(_ != org.apache.spark.sql.types.LongType),
      "raw read produced longs: nanosAsLong leaked past stream termination")
  }

  test("streaming histogram quantile twin equals batch q107 exactly") {
    // same two-file time split as the HLL twin: batch B's days land
    // inside batch A's 7-day windows, exercising merge + re-emission
    val d = timeSplitEventsDir("hist")
    val stream = EventStreams.streamingQuantileRollup(
      EventStreams.readEvents(spark, d.toString))
    val all = EventStreams.runToMemory(stream.toDF(), "hist_twin_out",
      OutputMode.Update)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type"), col("day")).orderBy(col("seq").desc)
    val gotAll = all.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("day"), col("n"),
        col("p50_est"), col("p90_est"), col("p99_est"))
    val want = graft.queries.Funnels.q107.run(spark, TestSpark.sf0001)
    val got = gotAll.join(want.select("day").distinct(), Seq("day"), "left_semi")
      .select(col("event_type"), col("day"), col("n"),
        col("p50_est"), col("p90_est"), col("p99_est"))
    // integer histograms make the twin EXACT, not estimate-close
    assert(got.count() == want.count(),
      s"row counts differ: ${got.count()} vs ${want.count()}")
    assert(got.exceptAll(want).count() == 0,
      "streaming quantile twin diverged from batch q107")
  }

  test("q104 DP release composes with streaming: complete mode equals batch") {
    // dpCounts is an algebraic count agg + a stateless per-cell release
    // expression, so the SAME code runs under readStream; complete-mode
    // state converges to the batch release once the stream drains —
    // split the fixture into two files to force a multi-batch run
    val src = java.nio.file.Files.createTempDirectory("dp_src")
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val half1 = docs.filter(col("doc_id") % 2 === 0)
    val half2 = docs.filter(col("doc_id") % 2 =!= 0)
    half1.coalesce(1).write.mode("overwrite").parquet(s"$src/a")
    half2.coalesce(1).write.mode("overwrite").parquet(s"$src/b")
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$src/*")
    val got = EventStreams.runToMemory(
      graft.queries.Privacy.dpCounts(stream), "dp_out", OutputMode.Complete)
    val want = graft.queries.Privacy.dpCounts(docs)
    assert(got.count() == want.count())
    assert(got.exceptAll(want).count() == 0,
      "streaming DP release diverged from batch")
  }

  test("flatMapGroupsWithState keeps running per-user totals") {
    val stream = EventStreams.runningUserTotals(
      EventStreams.readEvents(spark, eventsDir))
    val got = EventStreams.runToMemory(stream.toDF(), "state_out", OutputMode.Update)
    // final state row per user must match the batch aggregate
    val finalRows = got.groupBy("user_id")
      .agg(max(col("n_events")).as("n_events"))
    val batch = Tables.events(spark, TestSpark.sf0001)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
    val joined = finalRows.join(batch, "user_id")
      .filter(col("n_events") =!= col("n"))
    assert(joined.count() == 0)
  }
}
