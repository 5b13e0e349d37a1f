package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._
import graft.functions.Exact._

/** Structured Streaming surface (SURVEY.md §2.C): the same event-time
  * window expressions as the batch queries q20–q22 — `window`,
  * `session_window` — run under `readStream` with watermarks, plus
  * watermarked dedup and custom keyed state via flatMapGroupsWithState.
  *
  * Tests assert streaming ≡ batch on the same fixture (the §5.2-6
  * contract); late rows beyond the watermark are verifiably dropped.
  *
  * Scale posture: state is keyed by (window, event_type) or user_id, so
  * state distributes across executors; watermarks bound state size —
  * nothing here accumulates unbounded driver state.
  */
object EventStreams {

  /** The events schema as the streaming file source must declare it:
    * parquet TIMESTAMP(NANOS) arrives as long under the nanosAsLong
    * conf (see graft.Tables.events). */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  private val NanosKey = "spark.sql.legacy.parquet.nanosAsLong"

  /** Per-session bookkeeping for the nanosAsLong restore handshake
    * (below). All fields are guarded by `spark.sharedState` — the same
    * lock `Tables.withNanosAsLong` serializes its batch scopes on. */
  private final class NanosFlagState {
    var epoch: Long = 0L                       // bumped by each readEvents
    var prior: Option[String] = None           // conf value to restore
    var pendingRestore: Boolean = false
    val startEpochs =
      scala.collection.mutable.Map.empty[java.util.UUID, Long]
    var listenerRegistered = false
  }
  private val flagStates =
    new java.util.WeakHashMap[SparkSession, NanosFlagState]()
  private def flagState(spark: SparkSession): NanosFlagState = {
    val existing = flagStates.get(spark)
    if (existing != null) existing
    else { val st = new NanosFlagState; flagStates.put(spark, st); st }
  }

  /** Streaming read of an events parquet directory; ns→µs truncation
    * identical to the batch loader so streaming and batch agree.
    *
    * Conf lifetime: unlike batch scans (which snapshot
    * `spark.sql.legacy.parquet.nanosAsLong` at analysis — see
    * `graft.Tables.withNanosAsLong`), a streaming parquet source
    * re-converts each file's footer schema when its micro-batch
    * *executes*, which may be long after this method returns. A
    * save/restore scope around the builder therefore breaks the second
    * micro-batch ([PARQUET_TYPE_ILLEGAL]). So the flag is set here for
    * the lifetime of the STREAM, and a StreamingQueryListener restores
    * the prior value once the last active query terminates — a later
    * batch TIMESTAMP(NANOS) read in the same session then gets the
    * session's normal typed behavior instead of silently yielding longs.
    *
    * Restore handshake: each readEvents bumps an epoch; the listener
    * stamps every started query with the epoch current at its start and
    * restores ONLY when (a) no other query is active and (b) the
    * terminated query's stamp equals the current epoch. (b) is what
    * makes sequential stream tests safe: if a new readEvents has already
    * re-armed the flag for a not-yet-started query, the stale
    * termination event's stamp is behind the epoch and the restore is
    * skipped rather than yanking the flag out from under the new
    * stream's first micro-batch. */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    // Sniff the fixture's physical ts shape from a batch footer read
    // (scoped nanos conf — a no-op for non-nanos files) and normalize to
    // a µs instant, mirroring graft.Tables.events. Only the
    // TIMESTAMP(NANOS) shape needs the stream-lifetime legacy flag; the
    // µs-NTZ and µs-instant shapes read with an ordinary typed schema.
    // An EMPTY landing directory (the normal file-source pattern:
    // subscribe first, files arrive later) has no footer to sniff —
    // fall back to the current driver fixture shape (µs-NTZ) rather
    // than failing stream construction; files of that shape then read
    // normally, and a later nanos-shaped file would surface a loud
    // schema-conversion error, never silent wrong timestamps.
    val tsType =
      try graft.Tables.withNanosAsLong(spark)(
        spark.read.parquet(dir)).schema("ts").dataType
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getMessage.contains("infer schema") ||
              e.getMessage.contains("PATH_NOT_FOUND") ||
              e.getMessage.contains("UNABLE_TO_INFER_SCHEMA") =>
          TimestampNTZType
      }
    def stream(t: DataType) =
      spark.readStream
        .schema(StructType(rawSchema.map(f =>
          if (f.name == "ts") f.copy(dataType = t) else f)))
        .option("maxFilesPerTrigger", "1")
        .parquet(dir)
    tsType match {
      case TimestampNTZType =>
        // session tz is pinned UTC at every entry point, so the cast is
        // micros-preserving (same instants as the batch loader)
        return stream(TimestampNTZType)
          .withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType =>
        return stream(TimestampType)
      case _ => () // LongType: TIMESTAMP(NANOS) — fall through to the
                   // stream-lifetime legacy-flag path below
    }
    // same lock as Tables.withNanosAsLong: without it, a concurrent
    // batch loader's save/restore scope could snapshot the flag as
    // unset and then clear it underneath this query's micro-batches
    spark.sharedState.synchronized {
      val st = flagState(spark)
      if (!st.pendingRestore) {
        st.prior = spark.conf.getOption(NanosKey)
        st.pendingRestore = true
      }
      st.epoch += 1
      spark.conf.set(NanosKey, "true")
      if (!st.listenerRegistered) {
        st.listenerRegistered = true
        spark.streams.addListener(
          new org.apache.spark.sql.streaming.StreamingQueryListener {
            import org.apache.spark.sql.streaming.StreamingQueryListener._
            override def onQueryStarted(e: QueryStartedEvent): Unit =
              spark.sharedState.synchronized {
                val s = flagState(spark); s.startEpochs(e.id) = s.epoch
              }
            override def onQueryProgress(e: QueryProgressEvent): Unit = ()
            override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
              spark.sharedState.synchronized {
                val s = flagState(spark)
                val stamp = s.startEpochs.remove(e.id)
                val othersActive = spark.streams.active.exists(_.id != e.id)
                if (s.pendingRestore && !othersActive &&
                    stamp.contains(s.epoch)) {
                  s.prior match {
                    case Some(v) => spark.conf.set(NanosKey, v)
                    case None    => spark.conf.unset(NanosKey)
                  }
                  s.pendingRestore = false
                  s.prior = None
                }
              }
          })
      }
    }
    spark.readStream.schema(rawSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Tumbling 1-hour counts+sums per event type (≡ batch q20). */
  def tumbling(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("val_sum"))
      .select(col("window.start").as("w_start"), col("window.end").as("w_end"),
        col("event_type"), col("n"), col("val_sum"))

  /** Session windows, 30-minute gap, per user (≡ batch q22). */
  def sessions(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("val_sum"))
      .select(col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"),
        col("user_id"), col("n"), col("val_sum"))

  /** Watermarked exact dedup on event_id: state for an id is dropped once
    * the watermark passes it — bounded state, unlike global
    * dropDuplicates. */
  def dedupWithinWatermark(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(Seq("event_id"))

  final case class EventRow(event_id: Long, ts: java.sql.Timestamp,
      user_id: Long, event_type: String, value: Double)
  final case class UserAgg(user_id: Long, n_events: Long, total_value: Double)

  /** Custom keyed state: running per-user totals emitted on every trigger
    * (flatMapGroupsWithState, update mode). The state object is a pair of
    * scalars — O(#users) state, watermark-free by design. */
  def runningUserTotals(events: DataFrame): Dataset[UserAgg] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value")).as[EventRow]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[(Long, Double), UserAgg](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[EventRow], state: GroupState[(Long, Double)]) =>
          val (n0, v0) = state.getOption.getOrElse((0L, 0.0))
          var n = n0; var v = v0
          rows.foreach { r => n += 1; v += r.value }
          state.update((n, v))
          Iterator(UserAgg(uid, n, v))
      }
  }

  // full java.sql.Timestamp in state, NOT epoch-millis: getTime drops
  // the microsecond component and the batch q61 timestamps carry µs
  final case class FunnelState(tView: Option[java.sql.Timestamp],
      tClick: Option[java.sql.Timestamp],
      tPurchase: Option[java.sql.Timestamp])
  final case class FunnelRow(user_id: Long, t_view: java.sql.Timestamp,
      t_click: java.sql.Timestamp, t_purchase: java.sql.Timestamp, stage: Int)

  /** Streaming twin of the batch q61 ordered funnel: a per-user state
    * machine over view → click → purchase, via flatMapGroupsWithState.
    * State per user is three optional timestamps — O(#users), same as
    * the batch aggregate's width.
    *
    * Ordering contract: events are applied in event-time order WITHIN
    * each micro-batch (the handler sorts its group's rows), so streaming
    * ≡ batch whenever arrival order across batches respects event time
    * (the file-source default for chronologically written logs). A
    * late-arriving EARLIER view can tighten t_view but cannot retract a
    * click/purchase decision already taken against the old t_view —
    * exact repair of that non-monotonic case is a batch backfill's job
    * (the standard production split: streaming approximation + periodic
    * batch recompute). */
  def streamingFunnel(events: DataFrame): Dataset[FunnelRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value")).as[EventRow]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[EventRow], state: GroupState[FunnelState]) =>
          var s = state.getOption.getOrElse(FunnelState(None, None, None))
          rows.toSeq.sortWith((a, b) => a.ts.before(b.ts)).foreach { r =>
            val t = r.ts
            r.event_type match {
              case "view" if s.tView.forall(t.before) =>
                s = s.copy(tView = Some(t))
              case "click" if s.tView.exists(t.after) &&
                  s.tClick.forall(t.before) =>
                s = s.copy(tClick = Some(t))
              case "purchase" if s.tClick.exists(t.after) &&
                  s.tPurchase.forall(t.before) =>
                s = s.copy(tPurchase = Some(t))
              case _ => ()
            }
          }
          state.update(s)
          if (s.tView.isEmpty) Iterator.empty
          else Iterator(FunnelRow(uid, s.tView.orNull, s.tClick.orNull,
            s.tPurchase.orNull,
            1 + s.tClick.size + s.tPurchase.size))
      }
  }

  final case class SessState(lastUs: Option[Long], idx: Long)
  final case class SessionRow(event_id: Long, user_id: Long,
      ts: java.sql.Timestamp, session_idx: Long)

  private def micros(t: java.sql.Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  /** Streaming twin of the batch q79 per-event sessionization: a
    * per-user state machine (flatMapGroupsWithState, append mode) whose
    * state is two numbers — last event time in µs and the running
    * session index — O(#users), independent of history length. The gap
    * rule is the SAME µs-exact compare as batch q79 (> 30 min starts a
    * session; the exact boundary merges), applied in (ts, event_id)
    * order within each micro-batch, so streaming ≡ batch on arrival
    * that respects event time; out-of-order repair across sessions is
    * the batch backfill's job (same contract as [[streamingFunnel]]). */
  def streamingSessionize(events: DataFrame): Dataset[SessionRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value")).as[EventRow]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, SessionRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[EventRow], state: GroupState[SessState]) =>
          var s = state.getOption.getOrElse(SessState(None, 0L))
          val out = rows.toSeq
            .sortBy(r => (micros(r.ts), r.event_id))
            .map { r =>
              val us = micros(r.ts)
              if (s.lastUs.forall(prev => us - prev > 1800L * 1000000L))
                s = s.copy(idx = s.idx + 1)
              s = s.copy(lastUs = Some(us))
              SessionRow(r.event_id, uid, r.ts, s.idx)
            }
          state.update(s)
          out.iterator
      }
  }

  final case class IntervalState(curType: Option[String],
      curFrom: Option[java.sql.Timestamp])
  final case class ClosedInterval(user_id: Long, event_type: String,
      valid_from: java.sql.Timestamp, valid_to: java.sql.Timestamp)

  /** Streaming twin of batch q93's SCD-2 / CDC compaction
    * (graft.queries.Warehouse.stateIntervals): a per-user state machine
    * (flatMapGroupsWithState, append mode) that emits an interval the
    * moment the user's event_type CHANGES. State is O(1) per user — the
    * current run's type and start timestamp — independent of history
    * length; the still-open run lives in state until its closing change
    * arrives, which is exactly the closed-vs-open split a CDC sink
    * (e.g. q94's MERGE) consumes. Within a micro-batch, rows are
    * processed in (ts, event_id) order — the same tie-break as batch
    * q93 — so on arrival in event-time order the emitted rows EQUAL
    * batch q93's is_current=false rows (suite-asserted); out-of-order
    * repair across runs is the batch backfill's job (the
    * [[streamingFunnel]]/[[streamingSessionize]] contract). */
  def streamingStateIntervals(events: DataFrame): Dataset[ClosedInterval] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.filter(col("event_type").isNotNull)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value")).as[EventRow]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[IntervalState, ClosedInterval](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[EventRow],
            state: GroupState[IntervalState]) =>
          var s = state.getOption.getOrElse(IntervalState(None, None))
          val out = Seq.newBuilder[ClosedInterval]
          rows.toSeq.sortBy(r => (micros(r.ts), r.event_id)).foreach { r =>
            s.curType match {
              case Some(t) if t == r.event_type => // run continues
              case Some(t) =>
                out += ClosedInterval(uid, t, s.curFrom.get, r.ts)
                s = IntervalState(Some(r.event_type), Some(r.ts))
              case None =>
                s = IntervalState(Some(r.event_type), Some(r.ts))
            }
          }
          state.update(s)
          out.result().iterator
      }
  }

  final case class TouchState(attrType: Option[String], attrUs: Option[Long])
  final case class AttributedPurchase(event_id: Long, user_id: Long,
      ts: java.sql.Timestamp, attr_type: Option[String], gap_s: Option[Long])

  /** Streaming twin of batch q100 last-touch attribution
    * (graft.queries.Funnels.lastTouch): per-user state is the most
    * recent non-purchase touch (type + µs) — O(1) per user — and every
    * purchase emits immediately with the credit and touch→purchase gap
    * (append mode; an attribution row is final the moment the purchase
    * arrives, so there is nothing to retract). Same (ts, event_id)
    * in-batch ordering and NULL "direct" bucket as batch q100; equality
    * on ordered arrival is suite-asserted, including across a
    * two-micro-batch split where the credited touch arrived in an
    * EARLIER batch than its purchase. */
  def streamingLastTouch(events: DataFrame): Dataset[AttributedPurchase] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.filter(col("event_type").isNotNull)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value")).as[EventRow]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[TouchState, AttributedPurchase](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[EventRow],
            state: GroupState[TouchState]) =>
          var s = state.getOption.getOrElse(TouchState(None, None))
          val out = Seq.newBuilder[AttributedPurchase]
          rows.toSeq.sortBy(r => (micros(r.ts), r.event_id)).foreach { r =>
            if (r.event_type == "purchase")
              out += AttributedPurchase(r.event_id, uid, r.ts, s.attrType,
                s.attrUs.map(us => (micros(r.ts) - us) / 1000000L))
            else
              s = TouchState(Some(r.event_type), Some(micros(r.ts)))
          }
          state.update(s)
          out.result().iterator
      }
  }

  final case class DayUser(event_type: String, day: String, user_id: Long)
  final case class SketchWindowRow(event_type: String, day: String,
      users_7d_est: Double, seq: Long)
  /** Per-type state: one KMV sketch (sorted distinct min-K 48-bit user
    * hashes) per day plus a monotone sequence number (stamped on
    * emitted rows so a keep-last consumer can supersede earlier
    * estimates of the same (type, day)). */
  final case class TypeSketchState(days: Map[String, Array[Long]], seq: Long)

  /** The batch q77 user hash, replayed in JVM arithmetic: the first 12
    * hex chars of md5("kmv|" || user_id) = the first 6 digest bytes as
    * a big-endian 48-bit value (what Spark's conv(substr(hex,1,12),16,
    * 10) and the DuckDB oracle's nibble sum both compute). */
  private def kmvHash(userId: Long): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(("kmv|" + userId.toString)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ((d(0) & 0xffL) << 40) | ((d(1) & 0xffL) << 32) |
      ((d(2) & 0xffL) << 24) | ((d(3) & 0xffL) << 16) |
      ((d(4) & 0xffL) << 8) | (d(5) & 0xffL)
  }

  /** Streaming twin of the batch q77 rolling 7-day distinct-users
    * sketch: a per-event_type state machine (flatMapGroupsWithState,
    * update mode) holding ONE deterministic KMV sketch per day — the
    * IDENTICAL md5 min-K structure and estimate formula as batch q77
    * (graft.queries.Funnels.rollingDistinctUsersSketch), so on any
    * prefix of the stream the emitted estimate is EXACTLY the batch
    * q77 value over the events seen so far (suite-asserted, not
    * approximately — keeping the K smallest distinct hashes is an
    * idempotent commutative fold, so incremental == batch). Each
    * trigger updates the touched days' sketches and re-emits every
    * (type, day) whose 7-day window intersects a touched day, with a
    * per-key monotone `seq` for keep-last semantics downstream.
    *
    * Because min-K sets are commutative mergeable monoids, the final
    * state is arrival-order-INDEPENDENT — late or shuffled events
    * converge to the same per-day sketches, a strictly stronger
    * contract than the funnel/sessionize twins' ordered-arrival one.
    * State per type is #days × ≤K longs (~16 KB) — bounded by the
    * calendar, not the user count, which is the whole point of the
    * sketch formulation at 100 TB (the batch side merges 7 sketches
    * per grid day instead of re-scanning a week of raw events; the
    * streaming side carries those sketches as keyed state).
    *
    * GRID CONTRACT: batch q77 windows every type over the GLOBAL
    * distinct-day grid, but a per-key state machine cannot observe
    * other types' days. So each type emits the full CALENDAR span of
    * its touched days — every g in [t, t+6] per touched day t, whose
    * window [g-6, g] necessarily contains t — a deterministic SUPERSET
    * of any global grid restricted to that type. Keep-last rows
    * semijoined to the global day grid (a calendar dimension any
    * consumer already has, or `SELECT DISTINCT to_date(ts)` over the
    * landed events) are then EXACTLY batch q77, including (type, g)
    * rows where the type was quiet on g but active in the prior six
    * days (suite-asserted on a sparse-day fixture). */
  def streamingRollingUsersSketch(events: DataFrame): Dataset[SketchWindowRow] = {
    val k = graft.queries.Funnels.KmvK
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("event_type"),
        date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"),
        col("user_id")).as[DayUser]
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[TypeSketchState, SketchWindowRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (etype: String, rows: Iterator[DayUser], state: GroupState[TypeSketchState]) =>
          val st = state.getOption.getOrElse(TypeSketchState(Map.empty, 0L))
          val sketches = scala.collection.mutable.Map.empty[String, Array[Long]]
          st.days.foreach { case (d, hs) => sketches(d) = hs }
          val fresh = scala.collection.mutable
            .Map.empty[String, scala.collection.mutable.Set[Long]]
          rows.foreach { r =>
            fresh.getOrElseUpdate(r.day,
              scala.collection.mutable.Set.empty[Long]) += kmvHash(r.user_id)
          }
          val touched = fresh.keySet.toSet
          fresh.foreach { case (d, hs) =>
            val merged = (sketches.getOrElse(d, Array.emptyLongArray) ++ hs)
              .distinct.sorted.take(k)
            sketches(d) = merged
          }
          val typeDays = sketches.keys.map(java.time.LocalDate.parse).toSeq
          val seq = st.seq + 1
          // every window a touched day can affect: g in [t, t+6] — see
          // GRID CONTRACT above; each union is non-empty (contains t)
          val out = touched.toSeq.map(java.time.LocalDate.parse)
            .flatMap(t => (0 to 6).map(t.plusDays(_)))
            .distinct
            .sortBy(_.toString)
            .map { g =>
              // min-K of the union: the batch plan's distinct + rn <= K
              val u = typeDays
                .filter(d => !d.isAfter(g) && !d.isBefore(g.minusDays(6)))
                .iterator.flatMap(d => sketches(d.toString))
                .toArray.distinct.sorted
              // the SAME fixed double expression as batch q77's
              // kmvEstExpr — identical operands, identical order
              val est =
                if (u.length < k) u.length.toDouble
                else (k - 1).toDouble * math.pow(2.0, 48) / u(k - 1).toDouble
              SketchWindowRow(etype, g.toString, est, seq)
            }
          state.update(TypeSketchState(sketches.toMap, seq))
          out.iterator
      }
  }

  final case class DayValue(event_type: String, day: String, value: Double)
  final case class QuantileWindowRow(event_type: String, day: String,
      n: Long, p50_est: Long, p90_est: Long, p99_est: Long, seq: Long)

  /** Per-type state for the quantile twin: one 64-long bin vector per
    * day plus the monotone seq (same keep-last contract as
    * [[TypeSketchState]]). */
  final case class TypeHistState(days: Map[String, Array[Long]], seq: Long)

  /** Streaming twin of batch q107's rolling 7-day value percentiles:
    * the same per-(type, day) 64-bin integer histogram carried as keyed
    * state — integer bin vectors are a commutative mergeable monoid
    * (addition), so like the HLL twin the final state is arrival-order-
    * INDEPENDENT, and UNLIKE the HLL twin the emitted numbers are not
    * estimates of the batch value but EXACTLY the batch value on any
    * stream prefix: binning, threshold (`cum·k ≥ n·q` integer
    * arithmetic), and bin-upper-bound readout are the identical integer
    * formulas. State per type is #days × 64 longs — calendar-bounded.
    *
    * Same GRID CONTRACT as the HLL twin: each type emits the calendar
    * span [t, t+6] of its touched days (a deterministic superset);
    * keep-last rows semijoined to the global day grid equal batch q107
    * exactly. */
  def streamingQuantileRollup(events: DataFrame): Dataset[QuantileWindowRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.filter(col("value").isNotNull)
      .select(col("event_type"),
        date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"),
        col("value")).as[DayValue]
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[TypeHistState, QuantileWindowRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (etype: String, rows: Iterator[DayValue], state: GroupState[TypeHistState]) =>
          val st = state.getOption.getOrElse(TypeHistState(Map.empty, 0L))
          val hists = scala.collection.mutable.Map.empty[String, Array[Long]]
          st.days.foreach { case (d, b) => hists(d) = b.clone() }
          val touched = scala.collection.mutable.Set.empty[String]
          rows.foreach { r =>
            val h = hists.getOrElseUpdate(r.day, new Array[Long](64))
            val bin = math.min(63L, math.max(0L, math.floor(r.value / 8.0).toLong))
            h(bin.toInt) += 1
            touched += r.day
          }
          val typeDays = hists.keys.map(java.time.LocalDate.parse).toSeq
          val seq = st.seq + 1
          val out = touched.toSeq.map(java.time.LocalDate.parse)
            .flatMap(t => (0 to 6).map(t.plusDays(_)))
            .distinct
            .sortBy(_.toString)
            .map { g =>
              val merged = new Array[Long](64)
              typeDays.filter(d => !d.isAfter(g) && !d.isBefore(g.minusDays(6)))
                .foreach { d =>
                  val h = hists(d.toString)
                  var i = 0; while (i < 64) { merged(i) += h(i); i += 1 }
                }
              val n = merged.sum
              // identical integer threshold readout as the batch side:
              // first bin whose cumulative count reaches ceil(q·n)
              def quant(num: Long, den: Long): Long = {
                var cum = 0L; var i = 0
                while (i < 64) {
                  cum += merged(i)
                  if (cum * den >= n * num) return (i + 1L) * 8L
                  i += 1
                }
                512L
              }
              QuantileWindowRow(etype, g.toString, n,
                quant(1, 2), quant(9, 10), quant(99, 100), seq)
            }
          state.update(TypeHistState(hists.toMap, seq))
          out.iterator
      }
  }

  /** Stream-stream inner join with event-time bounds: each purchase
    * joined to the same user's errors in the preceding 5 minutes
    * (streaming twin of the batch q36 interval join). Both sides carry
    * watermarks so the join state is bounded: a buffered error can be
    * evicted once the purchase-side watermark passes its 5-minute
    * usefulness horizon. */
  def purchaseErrorJoin(events: DataFrame,
      watermark: String = "1 hour"): DataFrame = {
    val p = events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
      .withWatermark("ts", watermark)
    val e = events.filter(col("event_type") === "error")
      .select(col("event_id").as("err_id"), col("user_id").as("err_user"),
        col("ts").as("err_ts"))
      .withWatermark("err_ts", watermark)
    p.join(e,
      col("user_id") === col("err_user") &&
        col("err_ts") >= col("ts") - expr("INTERVAL 5 MINUTES") &&
        col("err_ts") < col("ts"))
      .select(col("event_id"), col("user_id"), col("ts").as("ts_us"),
        col("err_id"), col("err_ts").as("err_ts_us"))
  }

  /** Idempotent durable sink: foreachBatch writing each micro-batch to a
    * batchId-addressed parquet directory with overwrite — re-processing a
    * batch after a crash/restart overwrites the same directory instead of
    * duplicating rows, which together with the checkpoint gives
    * effectively-exactly-once file output. Returns the started query;
    * caller drives/stops it. */
  def startIdempotentParquetSink(df: DataFrame, outDir: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        batch.write.mode("overwrite").parquet(s"$outDir/batch_$batchId")
      }
      .start()

  /** Drain a streaming DataFrame into an in-memory table and return the
    * final result (test/local harness; production would writeStream to a
    * real sink). */
  def runToMemory(df: DataFrame, name: String,
      mode: OutputMode = OutputMode.Append): DataFrame = {
    val q = df.writeStream.outputMode(mode).format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
    df.sparkSession.table(name)
  }
}
