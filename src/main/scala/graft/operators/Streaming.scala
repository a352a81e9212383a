package graft.operators

import graft.{Canon, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Structured Streaming surface (SURVEY.md §2.4 E16–E17): event-time
  * windowed aggregation with watermarks, session windows, and stateful
  * deduplication over the `events` table.
  *
  * Each operator is ONE transformation (`DataFrame => DataFrame`) applied
  * to either source:
  *  - batch: `Tables.events` — this is what `SparkEntry.queries` runs and
  *    the DuckDB oracle checks (streaming≡batch on bounded input is the
  *    correctness contract, SURVEY §2.4 E16);
  *  - streaming: a `MemoryStream`/file source in StreamingSpec, executed
  *    with `processAllAvailable` and compared row-for-row to the batch
  *    result.
  *
  * `withWatermark` is part of the shared transformation: on the batch
  * path Spark ignores it, on the streaming path it bounds state. The
  * 2-hour watermark exceeds the corpus's max event-time disorder, so no
  * row is dropped as late and streaming output equals batch output.
  */
object Streaming {
  import Canon._

  /** Write a sink's effectively-once marker, LOUDLY: `mkdirs`/
    * `createNewFile` return false on failure, and a silently-missing
    * marker downgrades every `_applied/<id>` belt to at-least-once
    * (harmless only where the guarded effect happens to be idempotent).
    * NIO throws on a broken marker directory instead of masking it;
    * an already-present marker (a crash-backfill re-run) is fine. */
  private[operators] def markApplied(marker: java.io.File): Unit = {
    java.nio.file.Files.createDirectories(marker.getParentFile.toPath)
    if (!marker.exists())
      java.nio.file.Files.createFile(marker.toPath): Unit
  }

  /** The s24/s25 EMPTY-REFERENCE signal: batch 0 is the reference
    * snapshot BY CONTRACT, so an empty batch 0 permanently disables
    * monitoring — no model ever freezes and no PSI is ever emitted.
    * That is the CORRECT fail-open for an empty reference corpus (the
    * oracle's empty slice yields the same nothing), but it must never
    * be a SILENT one: an operator watching the PSI output cannot tell
    * "no drift" from "never armed". The durable signal is the
    * `_empty_reference` sentinel beside the (absent) frozen model —
    * dashboards and the feed can probe it — plus one stderr line for a
    * human tail. */
  private def emptyReferenceSignal(base: String, who: String): Unit = {
    markApplied(new java.io.File(s"$base/_empty_reference"))
    Console.err.println(s"graft $who: reference batch 0 is EMPTY — " +
      s"no model frozen, monitoring permanently disabled for $base " +
      "(sentinel: _empty_reference)")
  }

  // ——————————————— shared event-time transformations ———————————————

  /** E16a — tumbling 1-hour windows per event type. */
  def tumblingAgg(events: DataFrame): DataFrame =
    events.withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
      .select(tsStr(col("window.start")).as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** E16b — sliding 1-hour windows every 30 minutes (each event lands in
    * exactly 2 windows). No distinct aggregates here: the transformation
    * must stay valid under streaming execution, which forbids
    * `countDistinct` (use approx_count_distinct in a real pipeline). */
  def slidingAgg(events: DataFrame): DataFrame =
    events.withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour", "30 minutes"))
      .agg(count(lit(1)).as("n_events"),
        max(col("value")).as("max_value"),
        dsum(col("value")).as("sum_value"))
      .select(tsStr(col("window.start")).as("window_start"),
        col("n_events"), col("max_value"), col("sum_value"))

  /** E17a — session windows per user with a 30-minute inactivity gap.
    * Spark session semantics: an event at `t` extends the session to
    * `t + gap`; the session closes when the next event's time is ≥ the
    * current end. Reported `session_end` is last event + gap. */
  def sessionAgg(events: DataFrame): DataFrame =
    events.withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
      .select(col("user_id"),
        tsStr(col("session_window.start")).as("session_start"),
        tsStr(col("session_window.end")).as("session_end"),
        col("n_events"), col("sum_value"))

  // ————————————————————— batch query entries —————————————————————

  def tumbling(s: SparkSession, d: String): DataFrame =
    tumblingAgg(Tables.events(s, d)).orderBy("window_start", "event_type")

  def sliding(s: SparkSession, d: String): DataFrame =
    slidingAgg(Tables.events(s, d)).orderBy("window_start")

  def sessions(s: SparkSession, d: String): DataFrame =
    sessionAgg(Tables.events(s, d)).orderBy("user_id", "session_start")

  /** E16d — stream-STATIC enrichment join: the event stream joined to a
    * broadcast dimension table (market segment keyed off `user_id` into
    * `customer`), then windowed per segment — the most common streaming
    * join in practice (enrich-then-aggregate). The static side needs no
    * watermark and holds NO streaming state: it broadcasts to every
    * task, so at scale the stream never shuffles for the join at all —
    * the only stateful operator is the downstream windowed aggregation.
    * Events whose user has no dimension row drop out (inner join), which
    * also swallows StreamingSpec's watermark sentinel by construction. */
  def staticEnrichAgg(dim: DataFrame)(events: DataFrame): DataFrame =
    events.withWatermark("ts", "2 hours")
      .join(broadcast(dim), col("user_id") === col("c_custkey"))
      .groupBy(window(col("ts"), "1 hour"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
      .select(tsStr(col("window.start")).as("window_start"),
        col("c_mktsegment"), col("n_events"), col("sum_value"))

  /** The static dimension side of [[staticEnrichAgg]]. */
  def custDim(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(col("c_custkey"), col("c_mktsegment"))

  /** Batch entry for [[staticEnrichAgg]]. */
  def staticEnrich(s: SparkSession, d: String): DataFrame =
    staticEnrichAgg(custDim(s, d))(Tables.events(s, d))
      .orderBy("window_start", "c_mktsegment")

  /** E16c — stream-stream inner join: each error event joined to every
    * purchase by the same user in the preceding 30 minutes.
    *
    * Both sides carry watermarks and the join condition bounds event
    * time on both ends, which is exactly what Spark's stream-stream
    * join needs to evict buffered state (without the time bound, both
    * sides would buffer forever). On the batch path the same
    * transformation is a plain range join the DuckDB oracle replays.
    * At scale this shuffles both streams on `user_id` once; state per
    * key is bounded by the 30-minute window + watermark slack. */
  def errorPurchaseJoin(errors: DataFrame, purchases: DataFrame): DataFrame = {
    val e = errors.select(col("event_id").as("err_id"),
        col("user_id"), col("ts").as("err_ts"))
      .withWatermark("err_ts", "2 hours")
    val p = purchases.select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("value").as("purchase_value"))
      .withWatermark("p_ts", "2 hours")
    e.join(p, col("user_id") === col("p_user") &&
        col("p_ts") <= col("err_ts") &&
        col("p_ts") >= col("err_ts") - expr("INTERVAL 30 MINUTES"))
      .select(col("err_id"), col("user_id"), col("purchase_id"),
        tsStr(col("err_ts")).as("err_ts"),
        tsStr(col("p_ts")).as("purchase_ts"),
        col("purchase_value"))
  }

  /** Batch entry for [[errorPurchaseJoin]]. */
  def streamJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    errorPurchaseJoin(
      ev.filter(col("event_type") === "error"),
      ev.filter(col("event_type") === "purchase"))
      .orderBy("err_id", "purchase_id")
  }

  /** E16g — stream-stream LEFT OUTER join: every error, enriched with
    * the preceding-30-minutes purchases when they exist and emitted with
    * NULL purchase columns when they don't. The outer side is the part
    * inner joins can't express: "errors with no recent purchase" is the
    * alerting query. Structured Streaming emits the null-extended rows
    * only once the WATERMARK passes the error's join window (before
    * that, a matching purchase could still arrive) — which is why both
    * sides carry watermarks and the join condition bounds event time in
    * both directions; state stays watermark-bounded exactly as in
    * [[errorPurchaseJoin]].
    *
    * Gotcha this operator documents (it bit during construction): a
    * null-extended row flushes only when ITS side's watermark passes its
    * join window, and the watermark advances only with events the
    * EventTimeWatermark node actually SEES. Filtering event types
    * INSIDE the transform cannot widen what it sees — even written
    * `withWatermark(...).filter(...)`, Catalyst pushes the deterministic
    * non-watermark predicate BELOW the watermark node, so a
    * watermark-advancing sentinel of another type is dropped before the
    * event-time stats and the newest unmatched rows never emit
    * (observed: every outer row flushed except the final error's, with
    * the watermark frozen at last-error − delay). So the operator takes
    * the two PRE-FILTERED streams, and a bounded replay that wants a
    * final flush feeds its flush marker into BOTH streams as a join
    * participant whose event time can never satisfy the range condition
    * (StreamingSpec does exactly that and excludes the marker row from
    * the compare) — in production the flush happens naturally as events
    * keep arriving. */
  def errorPurchaseLeftJoin(errors: DataFrame, purchases: DataFrame): DataFrame = {
    val e = errors.select(col("event_id").as("err_id"),
        col("user_id"), col("ts").as("err_ts"))
      .withWatermark("err_ts", "2 hours")
    val p = purchases.select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("value").as("purchase_value"))
      .withWatermark("p_ts", "2 hours")
    e.join(p, col("user_id") === col("p_user") &&
        col("p_ts") <= col("err_ts") &&
        col("p_ts") >= col("err_ts") - expr("INTERVAL 30 MINUTES"),
        "left_outer")
      .select(col("err_id"), col("user_id"), col("purchase_id"),
        tsStr(col("err_ts")).as("err_ts"),
        tsStr(col("p_ts")).as("purchase_ts"),
        col("purchase_value"))
  }

  /** E16h — stream-stream FULL OUTER join: the last stream-stream join
    * mode (s06 inner, s10 left). Both sides emit their unmatched rows —
    * errors with no preceding-30-minutes purchase (the s10 alert) AND
    * purchases followed by no error within 30 minutes (the
    * healthy-purchase complement, null error columns) — each flushed
    * only once ITS side's watermark passes the row's join window.
    * Everything the s10 scaladoc documents about watermark advancement
    * and pre-filtered streams applies doubled: a bounded replay's flush
    * sentinel must ride BOTH streams, because each side's null-extension
    * waits on its own watermark. State stays watermark-bounded on both
    * sides; the join itself is the same user_id-keyed, time-range-
    * bounded condition — never a cross product. */
  def errorPurchaseFullJoin(errors: DataFrame, purchases: DataFrame): DataFrame = {
    val e = errors.select(col("event_id").as("err_id"),
        col("user_id").as("err_user"), col("ts").as("err_ts"))
      .withWatermark("err_ts", "2 hours")
    val p = purchases.select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("value").as("purchase_value"))
      .withWatermark("p_ts", "2 hours")
    e.join(p, col("err_user") === col("p_user") &&
        col("p_ts") <= col("err_ts") &&
        col("p_ts") >= col("err_ts") - expr("INTERVAL 30 MINUTES"),
        "full_outer")
      .select(col("err_id"), col("purchase_id"),
        coalesce(col("err_user"), col("p_user")).as("user_id"),
        tsStr(col("err_ts")).as("err_ts"),
        tsStr(col("p_ts")).as("purchase_ts"),
        col("purchase_value"))
  }

  /** Batch entry for [[errorPurchaseFullJoin]]. Order key is null-safe:
    * a full outer mixes null and non-null ids within one sort column,
    * and Spark sorts nulls FIRST where DuckDB sorts them LAST — the
    * coalesce sidesteps the engine divergence (ids are non-negative). */
  def streamFullJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    errorPurchaseFullJoin(
      ev.filter(col("event_type") === "error"),
      ev.filter(col("event_type") === "purchase"))
      .orderBy(coalesce(col("err_id"), lit(-1L)),
        coalesce(col("purchase_id"), lit(-1L)))
  }

  /** Batch entry for [[errorPurchaseLeftJoin]]. */
  def streamLeftJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    errorPurchaseLeftJoin(
      ev.filter(col("event_type") === "error"),
      ev.filter(col("event_type") === "purchase"))
      .orderBy("err_id", "purchase_id")
  }

  /** E17b — stateful dedup, batch form: keep the first event per
    * (user_id, event_type) by event time (unique tie-break on event_id).
    * The streaming form is `dropDuplicatesWithinWatermark` /
    * `dropDuplicates` keyed the same way (StreamingSpec feeds events in
    * event-time order so "first arrived" ≡ "first by event time"). */
  def dedupFirst(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id"),
        tsStr(col("ts")).as("first_ts"))
      .orderBy("user_id", "event_type")
  }

  /** Streaming GLOBAL dedup (used by StreamingSpec): first-arrived row
    * per key, state never evicted — exactly equivalent to the batch
    * [[dedupFirst]] when events arrive in event-time order. Unbounded
    * state: fine for bounded replays/tests, not for a forever-stream. */
  def streamingDedup(events: DataFrame): DataFrame =
    events.dropDuplicates("user_id", "event_type")

  /** Streaming WITHIN-WATERMARK dedup: the production shape at 100 TB —
    * state is evicted once the watermark passes, so a key's duplicates
    * are suppressed only while it is in state and may re-emit later.
    * Output is therefore a superset of [[dedupFirst]] and a subset of
    * the input (StreamingSpec pins exactly that contract). */
  def streamingDedupWithinWatermark(events: DataFrame): DataFrame =
    events.withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("user_id", "event_type")

  /** E17c — custom keyed state via `flatMapGroupsWithState`: each event's
    * per-user arrival ordinal (1-based by event time, event_id
    * tie-break). State is one Long per user (the count so far), so the
    * operator's state size is O(users) regardless of stream length.
    *
    * The SAME function runs as the batch query (Spark invokes it once
    * per group with empty state — output ≡ a row_number window, which is
    * the DuckDB oracle) and as a real stateful streaming query
    * (StreamingSpec feeds chunks in event-time order and asserts the
    * ordinals are identical, proving state carries across micro-batches
    * and the result is invariant under batching). */
  def statefulOrdinal(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val ds = events
      .select(col("event_id"), col("ts"), col("user_id"))
      .as[(Long, java.sql.Timestamp, Long)]
    ds.groupByKey(_._3)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (user: Long, it: Iterator[(Long, java.sql.Timestamp, Long)],
         state: GroupState[Long]) => {
          // micro-batch iterator order is not defined: impose the event-
          // time order inside the group so output is batching-invariant
          val sorted = it.toSeq.sortBy(r => (r._2.getTime, r._1))
          val start = state.getOption.getOrElse(0L)
          state.update(start + sorted.size)
          sorted.iterator.zipWithIndex.map { case ((eid, ts, _), i) =>
            (user, eid, ts, start + i + 1)
          }
        })
      .toDF("user_id", "event_id", "ts", "ordinal")
  }

  /** Batch entry for [[statefulOrdinal]] (oracle: row_number window). */
  def stateOrdinal(s: SparkSession, d: String): DataFrame =
    statefulOrdinal(Tables.events(s, d))
      .select(col("user_id"), col("event_id"), col("ordinal"))
      .orderBy("user_id", "ordinal")

  /** s21 — STREAMING AS-OF enrichment: the e20/e42 temporal join as a
    * stateful stream. Each `error` event is enriched with the SAME
    * user's most recent `purchase` at-or-before its event time — the
    * "attach the last thing this key did" join every clickstream/
    * sessionization pipeline runs live, which neither the stream-stream
    * equi joins (s06/s10/s15 — time-BOUNDED, not most-recent) nor the
    * batch as-of kernels express in a stream.
    *
    * Shape: both sides arrive as ONE union stream keyed user_id (the
    * e20 union-tag trick in state form); per-key state is the single
    * latest purchase so far — O(users), independent of stream length
    * (no buffering of the error side at all). Within a micro-batch the
    * group iterator is sorted (ts, kind, event_id) with purchases
    * before errors at equal ts, so a same-µs purchase matches its
    * error with Δ = 0 — the e42 tie rule — and output is invariant
    * under re-batching of an event-time-ordered feed (the s05
    * contract; StreamingSpec proves state carries across batches).
    * Purchase-less errors emit with NULL enrichment (left-complete,
    * the e42 rule). Production hardening for out-of-order feeds is the
    * documented swap: buffer within the watermark and flush on event-
    * time timers (the s12 machinery) — same contract, state O(users ×
    * within-watermark rows) instead of O(users). */
  def asofEnrich(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val ds = events.filter(col("event_type").isin("error", "purchase"))
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
      .as[(Long, java.sql.Timestamp, Long, String, Double)]
    ds.groupByKey(_._3)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (user: Long,
         it: Iterator[(Long, java.sql.Timestamp, Long, String, Double)],
         state: GroupState[(Long, Double)]) => {
          // FULL-µs ordering (getTime is ms-grain — two same-ms events
          // with different µs must not tie, the oracle compares full
          // ts); purchases sort BEFORE errors at equal µs so a same-µs
          // purchase is visible to its error (Δ = 0, the e42 rule)
          def micros(t: java.sql.Timestamp): Long =
            t.getTime / 1000 * 1000000L + t.getNanos / 1000
          val sorted = it.toSeq.sortBy(r =>
            (micros(r._2), if (r._4 == "purchase") 0 else 1, r._1))
          var latest = state.getOption
          val out = sorted.flatMap {
            case (eid, _, _, "purchase", v) =>
              latest = Some((eid, v)); None
            case (eid, _, _, _, _) =>
              Some((user, eid, latest.map(_._1), latest.map(_._2)))
          }
          latest.foreach(state.update)
          out.iterator
        })
      .toDF("user_id", "err_id", "purchase_id", "purchase_value")
  }

  /** Batch entry for [[asofEnrich]] (oracle: per error, the argmax
    * purchase by (p_ts, p_event_id) among p_ts ≤ err_ts, left joined). */
  def asofEnrichBatch(s: SparkSession, d: String): DataFrame =
    asofEnrich(Tables.events(s, d))
      .select(col("err_id"), col("user_id"), col("purchase_id"),
        col("purchase_value"))
      .orderBy("err_id")

  /** s22 — the DISORDER-TOLERANT as-of: [[asofEnrich]]'s documented
    * production swap made real. s21's O(users) state is correct only on
    * an event-time-ordered feed — a purchase arriving one micro-batch
    * AFTER an error it precedes in event time is silently missed. This
    * variant buffers BOTH sides per key and flushes strictly below the
    * watermark on event-time TIMERS (the s12 machinery), so the output
    * is correct for ANY arrival order the watermark admits — the same
    * answer, re-derived under the weakest ordering assumption a real
    * bus (Kafka across partitions) actually provides.
    *
    * Mechanics: rows append to a per-user ListState buffer; every
    * invocation (data or expired timer) flushes the buffered rows whose
    * event time is strictly below the current watermark — by the
    * watermark guarantee no future row can sort before them — in the
    * same (µs, purchases-first, event_id) order as s21, advancing the
    * latest-purchase ValueState and emitting enriched errors; the
    * remainder re-buffers with a timer at its earliest event time, so a
    * group that never hears again still flushes when the watermark
    * passes it. State is O(users × within-watermark rows) — the honest
    * price of disorder tolerance, bounded by the watermark delay, and
    * the reason BOTH variants exist (the s21/s22 pair is the ordering-
    * assumption dial). Rows later than the watermark delay are dropped
    * by the engine upstream — the standard late-data contract.
    *
    * The registry twin is the only registry entry that executes a REAL
    * streaming query: a deliberately DISORDERED file replay (events
    * dealt round-robin across six files by event_id, one file per
    * micro-batch — event time jumps wildly across batches) plus a
    * far-future sentinel file that drives the final watermark, and the
    * output still hash-matches the ordered oracle (s21's, verbatim). */
  def asofEnrichBuffered(events: DataFrame, delay: String = "2 hours"): DataFrame = {
    import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, ExpiredTimerInfo, TTLConfig, ValueState, ListState}
    val spark = events.sparkSession
    import spark.implicits._
    org.apache.spark.sql.execution.streaming.state.StateStoreCoordinatorRef
      .forDriver(org.apache.spark.SparkEnv.get, spark.sessionState.conf)
    // NO pre-state kind filter: a filter can be pushed below the
    // EventTimeWatermark node, hiding the watermark-driving sentinel
    // from it — kinds other than error/purchase are skipped INSIDE the
    // processor instead (they still advance the watermark, the s12
    // sentinel discipline)
    val ds = events.withWatermark("ts", delay)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
      .as[(Long, java.sql.Timestamp, Long, String, Double)]
    type Buffered = (Long, Long, String, Double) // (event_id, µs, kind, value)
    type Latest = (Long, Double)                 // (purchase_id, value)
    class AsofProcessor
      extends StatefulProcessor[Long, (Long, java.sql.Timestamp, Long, String, Double),
        (Long, Long, Option[Long], Option[Double])] {
      type Out = (Long, Long, Option[Long], Option[Double])
      @transient private var buf: ListState[Buffered] = _
      @transient private var latest: ValueState[Latest] = _
      override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
        buf = getHandle.getListState[Buffered]("buf",
          org.apache.spark.sql.catalyst.encoders
            .ExpressionEncoder[(Long, Long, String, Double)](),
          TTLConfig.NONE)
        latest = getHandle.getValueState[Latest]("latest",
          org.apache.spark.sql.catalyst.encoders
            .ExpressionEncoder[(Long, Double)](),
          TTLConfig.NONE)
      }
      /** Flush everything strictly below the watermark, in s21's order;
        * re-buffer the rest with a timer at its earliest event time. */
      private def flush(key: Long, wmMs: Long): Iterator[Out] = {
        val all = buf.get().toSeq
        val (ready, rest) = all.partition(_._2 / 1000 < wmMs)
        buf.clear()
        // materialize before deleting — mutating the timer store while
        // its iterator is open corrupts the listing
        getHandle.listTimers().toSeq.foreach(getHandle.deleteTimer)
        if (rest.nonEmpty) {
          rest.foreach(buf.appendValue)
          getHandle.registerTimer(rest.map(_._2 / 1000).min + 1)
        }
        var cur: Option[Latest] = if (latest.exists()) Some(latest.get()) else None
        val out = ready
          .sortBy(r => (r._2, if (r._3 == "purchase") 0 else 1, r._1))
          .flatMap {
            case (eid, _, "purchase", v) => cur = Some((eid, v)); None
            case (eid, _, _, _) =>
              Some((key, eid, cur.map(_._1), cur.map(_._2)))
          }
        cur.foreach(latest.update)
        out.iterator
      }
      override def handleInputRows(
          key: Long,
          rows: Iterator[(Long, java.sql.Timestamp, Long, String, Double)],
          timerValues: TimerValues): Iterator[Out] = {
        rows.foreach { case (eid, ts, _, kind, v) =>
          if (kind == "error" || kind == "purchase")
            buf.appendValue((eid,
              ts.getTime / 1000 * 1000000L + ts.getNanos / 1000, kind, v))
        }
        flush(key, timerValues.getCurrentWatermarkInMs())
      }
      override def handleExpiredTimer(key: Long, timerValues: TimerValues,
          expiredTimerInfo: ExpiredTimerInfo): Iterator[Out] =
        flush(key, timerValues.getCurrentWatermarkInMs())
    }
    ds.groupByKey(_._3)
      .transformWithState(new AsofProcessor, TimeMode.EventTime(), OutputMode.Append())
      .toDF("user_id", "err_id", "purchase_id", "purchase_value")
  }

  /** The s22 registry twin — a real streaming query over a disordered
    * file replay (see the scaladoc above); oracle identical to s21's. */
  def asofEnrichDisorderedFeed(s: SparkSession, d: String): DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory("graft-s22").toFile
    org.apache.commons.io.FileUtils.forceDeleteOnExit(dir)
    // ts → TIMESTAMP: withWatermark rejects NTZ, and the UTC session
    // makes the cast value-preserving (the standing events-table rule)
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("ts").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"), col("value"))
    // four round-robin shards by event_id: each spans the WHOLE corpus
    // time range, so the one-file-per-trigger replay jumps backwards in
    // event time on every micro-batch — the disorder under test (six
    // shards until round 18: the last two triggers re-exercised nothing
    // — every backward jump after the second shard hits the same
    // buffer/flush paths — and each trigger pays a full RocksDB state
    // commit; the oracle is batch-split-independent by construction).
    // StreamingSpec's s22 pins run on their own replay fixture. The
    // watermark delay must exceed the corpus span (any smaller delay
    // would legitimately DROP the older shards as late data — the
    // late-data contract, not what this twin measures), so it is sized
    // from the data and the sentinel lands beyond ts_max + delay.
    (0 until 4).foreach { i =>
      ev.filter(pmod(col("event_id"), lit(4L)) === i)
        .coalesce(1).write.parquet(s"$dir/replay/part_$i")
    }
    val spanH = {
      val r = ev.agg(unix_micros(min(col("ts"))),
        unix_micros(max(col("ts")))).head()
      if (r.isNullAt(0)) 1L
      else (r.getLong(1) - r.getLong(0)) / 3600000000L + 2L // µs → h, +margin
    }
    // far-future sentinel, path-sorted LAST: drives the final watermark
    // past every real event so every buffer flushes
    ev.orderBy(col("ts").desc).limit(1)
      .select(lit(-1L).as("event_id"),
        (col("ts") + expr(s"INTERVAL ${spanH + 2} HOURS")).as("ts"),
        lit(0L).as("user_id"), lit("sentinel").as("event_type"),
        lit(0.0).as("value"))
      .coalesce(1).write.parquet(s"$dir/replay/part_9_sentinel")
    val src = s.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/replay/part_*")
    val name = s"s22_sink_${System.identityHashCode(dir)}"
    val q = asofEnrichBuffered(src, s"$spanH hours")
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", s"$dir/ckpt")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    s.table(name)
      .select(col("err_id"), col("user_id"), col("purchase_id"),
        col("purchase_value"))
      .orderBy("err_id")
  }

  /** E17d — the same per-user arrival ordinal via `transformWithState`,
    * Spark 4's arbitrary-state API (typed ValueState handles, explicit
    * TimeMode, per-state TTL — the successor to
    * [[flatMapGroupsWithState]]). Implementing the SAME contract as
    * [[statefulOrdinal]] on both APIs pins their equivalence: one
    * oracle (the row_number window) checks both, and StreamingSpec runs
    * this one as a real stream too. State is one Long per user. */
  def statefulOrdinalTws(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}
    import org.apache.spark.sql.Encoders
    val spark = events.sparkSession
    import spark.implicits._
    // BATCH execution of transformWithState loads a transient state store,
    // whose RocksDB snapshot-upload report needs the driver-side
    // StateStoreCoordinator RPC endpoint — which only *streaming* query
    // startup normally creates (RpcEndpointNotFoundException otherwise).
    // forDriver is create-or-lookup (idempotent), so this is safe whether
    // or not a streaming query already registered it.
    org.apache.spark.sql.execution.streaming.state.StateStoreCoordinatorRef
      .forDriver(org.apache.spark.SparkEnv.get, spark.sessionState.conf)
    val ds = events
      .select(col("event_id"), col("ts"), col("user_id"))
      .as[(Long, java.sql.Timestamp, Long)]
    class OrdinalProcessor
      extends StatefulProcessor[Long, (Long, java.sql.Timestamp, Long), (Long, Long, Long)] {
      @transient private var count: ValueState[Long] = _
      override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
        count = getHandle.getValueState[Long]("count", Encoders.scalaLong, TTLConfig.NONE)
      override def handleInputRows(
          key: Long,
          rows: Iterator[(Long, java.sql.Timestamp, Long)],
          timerValues: TimerValues): Iterator[(Long, Long, Long)] = {
        // iterator order is not defined: impose event-time order so the
        // output is batching-invariant (same as statefulOrdinal)
        val sorted = rows.toSeq.sortBy(r => (r._2.getTime, r._1))
        val start = if (count.exists()) count.get() else 0L
        count.update(start + sorted.size)
        sorted.iterator.zipWithIndex.map { case ((eid, _, _), i) =>
          (key, eid, start + i + 1)
        }
      }
    }
    ds.groupByKey(_._3)
      .transformWithState(new OrdinalProcessor, TimeMode.None(), OutputMode.Append())
      .toDF("user_id", "event_id", "ordinal")
  }

  /** Batch entry for [[statefulOrdinalTws]] (same oracle as s05). */
  def stateOrdinalTws(s: SparkSession, d: String): DataFrame =
    statefulOrdinalTws(Tables.events(s, d))
      .select(col("user_id"), col("event_id"), col("ordinal"))
      .orderBy("user_id", "ordinal")

  /** E16e — CHAINED stateful operators in one streaming query: global
    * dedup (first event per (user_id, event_type)) feeding a tumbling
    * window aggregation — the dedup-then-aggregate shape of every
    * exactly-once metrics pipeline (suppress redelivered events, then
    * count). Spark 4 runs multiple stateful operators in one append-mode
    * query as long as event time flows forward; the dedup state is
    * O(keys) and the window state is bounded by the watermark.
    *
    * Streaming form — the spec runs this as a real two-stateful-op
    * stream and compares to the batch query below. The watermark is
    * defined ONCE, upstream of the dedup: with multiple stateful
    * operators Spark propagates it through the chain, and redefining it
    * between operators is an analysis error. */
  def streamingDedupThenWindow(events: DataFrame): DataFrame =
    events.withWatermark("ts", "2 hours")
      .dropDuplicates("user_id", "event_type")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
      .select(tsStr(col("window.start")).as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Batch form of [[streamingDedupThenWindow]]. Streaming
    * `dropDuplicates` keeps the first-ARRIVED row per key; on the
    * event-time-ordered replay the spec feeds (and any log-ordered
    * source), that is the (ts, event_id)-minimal row — which is what
    * this deterministic row_number form pins, same argument as
    * [[dedupFirst]] vs [[streamingDedup]]. */
  def dedupThenWindow(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val deduped = Tables.events(s, d)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
    tumblingAgg(deduped).orderBy("window_start", "event_type")
  }

  /** E16h — COMPLETE-mode running totals: the live-dashboard aggregate.
    * Unlike every append-mode query here, complete mode re-emits the
    * ENTIRE result table each micro-batch and needs no watermark — state
    * is one row per group forever, which is exactly right when the
    * grouping key is a low-cardinality dimension (event types here) and
    * exactly wrong for unbounded keys (that's what the watermarked
    * window queries are for; the scaladoc contrast IS the operator
    * selection rule). The sentinel filter keeps a bounded replay's
    * flush marker out of the totals; real deployments have no sentinel
    * and the filter is a no-op. */
  def runningTotals(events: DataFrame): DataFrame =
    events.filter(col("event_type") =!= "sentinel")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))

  /** Batch entry for [[runningTotals]]. */
  def runningTotalsBatch(s: SparkSession, d: String): DataFrame =
    runningTotals(Tables.events(s, d)).orderBy("event_type")

  /** E16h — complete-mode TRENDING top-k (s13): the "top items right
    * now" dashboard query — running per-item counts, ranked, truncated
    * to k, the WHOLE ranking re-emitted each micro-batch. Complete mode
    * is the only output mode that can re-RANK (a row's rank changes
    * when other rows' counts change — append can never retract, update
    * can't express a global sort), and it is only correct because the
    * item domain is LOW-CARDINALITY (s11's selection rule: state = one
    * row per item). The sort feeds a LIMIT, so each emission is a
    * top-k heap pass over ≤|items| aggregated rows, never a big sort.
    * Count ties break by item id — deterministic in both engines. */
  def trendingTopK(events: DataFrame, k: Int = 10): DataFrame =
    events.filter(col("event_type") =!= "sentinel")
      .select(get_json_object(col("props"), "$.k").cast("long").as("item"))
      .groupBy("item")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("item"))
      .limit(k)

  /** Batch entry for [[trendingTopK]] (same oracle shape). */
  def trendingTopKBatch(s: SparkSession, d: String): DataFrame =
    trendingTopK(Tables.events(s, d))

  /** E17e — TIMER-closed sessions (`transformWithState` + EVENT-TIME
    * timers): the session operator rebuilt on arbitrary state, which is
    * what a pipeline needs when sessions must close on INACTIVITY with
    * no further event ever arriving — `session_window` (s03) can only
    * emit when the watermark passes a window the NEXT event already
    * bounded, while a registered timer fires purely because time
    * passed. Per user: events extend the open session while the gap to
    * the last event is ≤ `gapMin`; a larger gap closes it inline; the
    * final (still-open) session is emitted by `handleExpiredTimer` when
    * the watermark passes `last + gap` — the timeout-emission path, the
    * part only timers can express. Each batch re-registers exactly one
    * timer per user (the old one deleted first), so timer state is O(1)
    * per live key; session state is (start, last, n) — O(1) too, never
    * a buffered event list. Emitted `session_end` is the LAST EVENT's
    * time (not last+gap — s03's convention), `n_events` the exact count.
    *
    * Ordering caveat (documented contract): within one micro-batch the
    * iterator is sorted by (ts, event_id); ACROSS batches an event older
    * than the open session's last event still joins it (state keeps no
    * per-event history) — with in-order replay and the 2 h watermark the
    * streaming result equals the batch gaps-and-islands form, which is
    * what StreamingSpec pins and the oracle checks. */
  def timerSessions(events: DataFrame, gapMin: Int = 30): DataFrame = {
    import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, ExpiredTimerInfo, TTLConfig, ValueState}
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMin.toLong * 60000L
    // same batch-execution guard as statefulOrdinalTws
    org.apache.spark.sql.execution.streaming.state.StateStoreCoordinatorRef
      .forDriver(org.apache.spark.SparkEnv.get, spark.sessionState.conf)
    val ds = events
      .withWatermark("ts", "2 hours")
      .select(col("event_id"), col("ts"), col("user_id"))
      .as[(Long, java.sql.Timestamp, Long)]
    type Sess = (Long, Long, Long) // (startMs, lastMs, n)
    class SessionProcessor
      extends StatefulProcessor[Long, (Long, java.sql.Timestamp, Long), (Long, java.sql.Timestamp, java.sql.Timestamp, Long)] {
      @transient private var sess: ValueState[Sess] = _
      override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
        sess = getHandle.getValueState[Sess]("sess",
          org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, Long, Long)](),
          TTLConfig.NONE)
      private def emit(key: Long, s: Sess) =
        (key, new java.sql.Timestamp(s._1), new java.sql.Timestamp(s._2), s._3)
      override def handleInputRows(
          key: Long,
          rows: Iterator[(Long, java.sql.Timestamp, Long)],
          timerValues: TimerValues): Iterator[(Long, java.sql.Timestamp, java.sql.Timestamp, Long)] = {
        val sorted = rows.toSeq.sortBy(r => (r._2.getTime, r._1))
        var cur: Option[Sess] = if (sess.exists()) Some(sess.get()) else None
        // the open session's timeout timer is superseded by this batch
        cur.foreach(c => getHandle.deleteTimer(c._2 + gapMs))
        var closed = List.empty[(Long, java.sql.Timestamp, java.sql.Timestamp, Long)]
        sorted.foreach { case (_, ts, _) =>
          val t = ts.getTime
          cur = cur match {
            case Some((st, last, n)) if t - last <= gapMs =>
              Some((st, math.max(t, last), n + 1))
            case Some(s) =>
              closed ::= emit(key, s); Some((t, t, 1L))
            case None => Some((t, t, 1L))
          }
        }
        cur.foreach { c => sess.update(c); getHandle.registerTimer(c._2 + gapMs) }
        closed.reverse.iterator
      }
      override def handleExpiredTimer(
          key: Long,
          timerValues: TimerValues,
          expiredTimerInfo: ExpiredTimerInfo): Iterator[(Long, java.sql.Timestamp, java.sql.Timestamp, Long)] = {
        if (!sess.exists()) Iterator.empty
        else {
          val s = sess.get()
          // guard against a stale timer racing a same-batch extension
          if (expiredTimerInfo.getExpiryTimeInMs >= s._2 + gapMs) {
            sess.clear(); Iterator.single(emit(key, s))
          } else Iterator.empty
        }
      }
    }
    ds.groupByKey(_._3)
      .transformWithState(new SessionProcessor, TimeMode.EventTime(), OutputMode.Append())
      .toDF("user_id", "session_start", "session_end", "n_events")
      .select(col("user_id"),
        tsStr(col("session_start")).as("session_start"),
        tsStr(col("session_end")).as("session_end"),
        col("n_events"))
  }

  /** Batch form of [[timerSessions]] — the gaps-and-islands computation
    * the timer operator must agree with on bounded in-order input (same
    * rule as E34 at a 30-minute gap; `session_end` = last event). This
    * is the oracle-checked `queries` entry: batch execution of
    * event-time TIMERS is undefined (no watermark exists to fire them),
    * so the batch side states the semantics relationally and
    * StreamingSpec pins the real timer query against it. */
  def timerSessionsBatch(s: SparkSession, d: String, gapMin: Int = 30): DataFrame = {
    val gapUs = gapMin.toLong * 60L * 1000000L
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("ts"))
      .withColumn("gap_us",
        unix_micros(col("ts").cast("timestamp")) -
          unix_micros(lag(col("ts"), 1).over(w).cast("timestamp")))
      .withColumn("is_new",
        (col("gap_us").isNull || col("gap_us") > gapUs).cast("long"))
      .withColumn("sidx",
        sum(col("is_new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("sidx"))
      .agg(min(col("ts")).as("start_ts"), max(col("ts")).as("end_ts"),
        count(lit(1)).as("n_events"))
      .select(col("user_id"),
        tsStr(col("start_ts")).as("session_start"),
        tsStr(col("end_ts")).as("session_end"),
        col("n_events"))
      .orderBy("user_id", "session_start")
  }

  // ———————————— effectively-once foreachBatch upsert sink ————————————

  /** Keyed MERGE of one micro-batch into a parquet state table, made
    * replay-safe by a per-batch-id marker — the effectively-once
    * `foreachBatch` pattern every Structured Streaming upsert pipeline
    * uses. foreachBatch delivers AT-LEAST-once (a batch re-runs after a
    * failure between sink write and checkpoint commit); recording the
    * applied batch id turns redelivery into a no-op, which is the whole
    * exactly-once-from-at-least-once argument. StreamingSpec proves
    * both halves: the streamed state equals the batch last-per-key
    * query, and re-applying an already-applied batch id changes
    * nothing.
    *
    * Merge rule: last write wins per user_id, within a batch by
    * (ts, event_id) order. The state swap here is
    * write-next/rename (single-writer; a production deployment puts a
    * transactional table format under the same foreachBatch body —
    * the idempotence logic is unchanged). Scale: the anti-join is keyed
    * on user_id and the batch side is one micro-batch — broadcast-sized
    * against a state table of any size.
    *
    * The store is deliberately schema-preserving: the state table holds
    * exactly the batch's declared types, including the timestamp flavor
    * (TIMESTAMP from a typed `MemoryStream` encoder, TIMESTAMP_NTZ from
    * the nanos-parquet tables). A caller comparing the store against a
    * differently-sourced reference casts to one flavor first — under a
    * UTC session the cast is value-preserving (StreamingSpec does this). */
  /** E16i — VERSIONED lakehouse sink: `foreachBatch` → f13 MERGE → f09
    * WAP publish with f14 retention. Every micro-batch of change rows
    * (payload + `op` ∈ upsert/delete) becomes one AUDITED, ATOMICALLY
    * promoted table version — so the stream's history is time-travelable
    * (f14 readAsOf), diffable (f15 CDF between consecutive versions ≡
    * that batch's effect), and boundable (f16 retention). This is the
    * streaming↔lakehouse composition a production ingest runs: the
    * sink owns nothing new, it CHAINS the storage ladder per batch.
    *
    * Effectively-once: a per-batch-id marker (the [[upsertBatch]]
    * protocol) turns at-least-once redelivery into a no-op — without
    * it, a redelivered batch would mint a duplicate version. The WAP
    * audit (row count vs the plan's own, null/dup keys) runs on every
    * batch: a corrupt batch fails its audit and the table stays at the
    * previous version (nothing to roll back — promote never ran). */
  def versionedSink(base: String, key: String)(batch: DataFrame, batchId: Long): Unit = {
    val marker = new java.io.File(s"$base/_applied/$batchId")
    if (marker.exists()) return // redelivered batch: effectively once
    // The batch id is ALSO recorded atomically with the promote itself:
    // writeAuditPublishStaged drops `_batch_<id>` (underscore-prefixed —
    // invisible to parquet readers) into staging before the rename, so
    // the promoted version carries its batch id. A crash BETWEEN promote
    // and the side marker below therefore can't mint a duplicate
    // version on redelivery: the promoted-marker check catches it, we
    // backfill the side marker and no-op.
    if (new java.io.File(s"$base/published/_batch_$batchId").exists()) {
      markApplied(marker)
      return
    }
    val s = batch.sparkSession
    val pubDir = new java.io.File(s"$base/published")
    val payload = org.apache.spark.sql.types.StructType(
      batch.schema.filterNot(_.name == "op"))
    val target =
      if (pubDir.exists()) s.read.parquet(pubDir.toString)
      else s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        payload)
    val merged = Sources.mergeUpsertOver(target, batch, key).drop("action")
    val audit = Sources.writeAuditPublishStaged(s, merged, base,
      Seq(key), true, Some(s"_batch_$batchId"))
    // marker ONLY after a successful promote: a failed audit leaves no
    // marker AND throws, so the streaming query fails and the engine
    // redelivers the batch — a corrected retry is NOT skipped. (Writing
    // the marker unconditionally would turn the retry into a no-op and
    // silently drop the batch.)
    val failed = audit.filter(!col("ok"))
      .select("check_name", "observed").collect()
    if (failed.nonEmpty)
      throw new IllegalStateException(
        s"versionedSink audit failed for batch $batchId: ${failed.mkString(", ")}")
    markApplied(marker)
  }

  /** The s16 registry instance (batch twin — StreamingSpec drives the
    * same three batches through a real `writeStream.foreachBatch` and
    * asserts the on-disk ladders agree): the customer snapshot arrives
    * as batch 0 (all upserts), the f13 feed as batch 1, a bucket-7
    * delete feed as batch 2; output = per retained VERSION the row
    * count and exact-decimal balance sum, all re-read from the
    * promoted directories — version arithmetic over what the sink
    * actually left on disk. */
  def versionedFeed(s: SparkSession, d: String): DataFrame = {
    import graft.Canon.dsum
    val (target, feed, _) = Sources.customerLadder(s, d)
    val b0 = target.withColumn("op", lit("upsert"))
    val b2 = graft.Tables.customer(s, d)
      .filter(pmod(col("c_custkey"), lit(10L)) === 7)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
        lit("delete").as("op"))
    val base = java.nio.file.Files.createTempDirectory("graft-vsink").toFile
    org.apache.commons.io.FileUtils.forceDeleteOnExit(base)
    Seq(b0, feed, b2).zipWithIndex.foreach { case (b, i) =>
      versionedSink(base.toString, "c_custkey")(b, i.toLong)
    }
    (1 to 3).map { v =>
      Sources.readAsOf(s, base.toString, v)
        .agg(count(lit(1)).as("n_rows"), dsum(col("c_acctbal")).as("bal_sum"))
        .select(lit(v.toLong).as("version"), col("n_rows"), col("bal_sum"))
    }.reduce(_.unionByName(_)).orderBy("version")
  }

  /** s17 — STREAMING pair-store maintenance: the d46 publisher stops
    * being a daily batch job. Each micro-batch of NEW documents is
    * merged into the docs store, and the pairs it introduces upsert
    * into the published pair store keyed (i, j). Values are stable by
    * construction (docs are immutable, the exact verify reads full
    * shingle sets), so the pair merge is insert-only dedup.
    *
    * THE WHOLE BATCH IS O(Δ) — reads and writes. Four relations live
    * in the [[Sources.bucketedUpsertStaged]] layout
    * (`published/bucket=<b>/`, bucket = f(key)):
    *
    *   - `docs`  (doc_id, text)          keyed/bucketed doc_id
    *   - `pairs` (i, j, …, jac)          keyed/bucketed (i, j)
    *   - `shdf`  (shingle, df)           keyed/bucketed shingle —
    *     the MAINTAINED shingle document-frequency relation: each
    *     batch SUM-merges its delta's per-shingle counts, so the zipf
    *     cap re-derives from maintained totals instead of a per-batch
    *     corpus re-scan (the round-15 read-side scale-killer);
    *   - `shidx` (shingle, doc_id, n_sh) keyed (shingle, doc_id),
    *     bucketed shingle — the PUBLISHED shingle index (postings of
    *     CURRENTLY-RARE shingles only; a shingle's postings are
    *     evicted the batch its maintained df crosses the cap, so a
    *     bucket's bytes stay bounded by its shingle count × cap and
    *     the zipf head never bloats the probe path).
    *
    * Writes stage and swap only touched buckets ([[Sources
    * .bucketedUpsertStaged]]); reads are bucket-PRUNED probes
    * ([[Sources.readBucketedStoreBuckets]]): the batch reads the docs
    * buckets its own doc_ids route to (the genuinely-new anti-join),
    * the shdf/shidx buckets its own shingles route to (df readback +
    * posting probe — each rare shingle carries ≤ cap postings), and
    * the docs buckets its candidate pairs route to (exact verify).
    * Nothing in the batch plan scans a corpus-sized relation
    * (StorageSpec pins the plan's input files to the touched buckets).
    *
    * Candidate semantics are EXACTLY [[PairGraph.deltaPairs]]'s: a
    * shared shingle with a genuinely-new doc is BY DEFINITION one of
    * the batch's own shingles, so probing the index with the delta's
    * rare shingles reproduces the full-corpus candidate set restricted
    * to pairs touching the delta; rarity (df ≤ cap) is judged on the
    * post-merge maintained totals = the union-so-far df the one-shot
    * derivation computes. The hot-count upper-bound prune is dropped
    * (it would need partner hot counts, which change as shingles cross
    * the cap); the bound is sound, so verifying the un-pruned
    * candidate set yields the identical pair relation (PairStoreSpec
    * pins incremental ≡ one-shot at every sf).
    *
    * Crash discipline (the s16 ladder, four tables): shdf promotes
    * FIRST (every later read wants post-merge totals — and the
    * SUM-merge is the one rule where re-applying an absorbed delta is
    * not a no-op, so its per-bucket `_batch_<id>` marker skip is
    * load-bearing), then shidx, then pairs, then DOCS last: the
    * genuinely-new anti-join reads the docs store, so every
    * recomputation before the docs promote sees the pre-batch corpus
    * and derives identical deltas; a doc re-sent in a LATER batch
    * anti-joins away and cannot double-count df. Failed audit →
    * throw, no marker, the engine redelivers (the versionedSink
    * contract). StreamingSpec drives a real writeStream through this
    * body; the registry twin feeds three deterministic batches. */
  def pairStoreSink(base: String)(batch: DataFrame, batchId: Long): Unit = {
    val marker = new java.io.File(s"$base/_applied/$batchId")
    if (marker.exists()) return // redelivered batch: effectively once
    val s = batch.sparkSession
    val batchDocs = batch.dropDuplicates("doc_id")
    // genuinely new = not already published; the probe reads ONLY the
    // docs buckets the batch's own ids route to
    val newDocs = batchDocs.join(
      Sources.readBucketedStoreBuckets(s, s"$base/docs", batchDocs.schema,
        Sources.touchedBucketIds(batchDocs, Seq("doc_id")))
        .select(col("doc_id")), Seq("doc_id"), "left_anti")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // ONE shingle derivation per batch, owned here and shared by both
      // halves: the merge step's DF delta/posting index AND the probe's
      // batch-shingle semi-join read this cached stream. The old shape
      // re-derived docShinglesOver(newDocs) inside incrementalPairs
      // AFTER the merge step had unpersisted its copy — a second full
      // normalize+shingle pass per batch (guide §1.2: remove passes).
      val shB = LlmOps.docShinglesOver(newDocs)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val shBuckets = shingleStoreMerge(s, base, newDocs, batchId, Some(shB))
        val (newPairs, cached) =
          incrementalPairs(s, base, newDocs, shBuckets, Some(shB))
        try {
          publishChecked(s, s"$base/pairs", newPairs, Seq("i", "j"), batchId)
        } finally cached.unpersist()
        publishChecked(s, s"$base/docs", batchDocs, Seq("doc_id"), batchId)
        markApplied(marker)
      } finally shB.unpersist()
    } finally newDocs.unpersist()
  }

  /** One [[Sources.bucketedUpsertStaged]] publish + audit check; a
    * failed check throws so the engine redelivers (no marker). */
  private def publishChecked(s: SparkSession, tb: String, delta: DataFrame,
      keyCols: Seq[String], batchId: Long, bucketCols: Seq[String] = Nil,
      sumCols: Seq[String] = Nil, newWins: Boolean = false,
      deleteKeys: Option[DataFrame] = None): Unit = {
    val audit = Sources.bucketedUpsertStaged(s, delta, tb, keyCols,
      stagedMarker = s"_batch_$batchId", bucketCols = bucketCols,
      sumCols = sumCols, newWins = newWins, deleteKeys = deleteKeys)
    val failed = audit.filter(!col("ok"))
      .select("check_name", "observed").collect()
    if (failed.nonEmpty)
      throw new IllegalStateException(
        s"pairStoreSink audit failed for batch $batchId at $tb: " +
          failed.mkString(", "))
  }

  private val ShDfSchema = org.apache.spark.sql.types.StructType.fromDDL(
    "shingle STRING, df BIGINT")
  private val ShIdxSchema = org.apache.spark.sql.types.StructType.fromDDL(
    "shingle STRING, doc_id BIGINT, n_sh BIGINT")

  /** s17 steps 1–2: SUM-merge the batch's shingle counts into the
    * maintained DF store, then maintain the posting index — insert the
    * batch's postings for (post-merge) rare shingles, evict the stored
    * postings of shingles the batch pushed over the cap. Returns the
    * touched shingle-bucket ids (the probe set for
    * [[incrementalPairs]]). Package-visible so StorageSpec can pin the
    * batch plan's input files to the touched buckets. */
  private[graft] def shingleStoreMerge(s: SparkSession, base: String,
      newDocs: DataFrame, batchId: Long,
      shB0: Option[DataFrame] = None): Seq[Int] = {
    val cap = PairGraph.MaxShingleDf
    // shB0: the caller-owned shared shingle stream (pairStoreSink);
    // None = self-contained (the StorageSpec pin's direct call)
    val shB = shB0.getOrElse(LlmOps.docShinglesOver(newDocs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    try {
      val dfDelta = shB.groupBy("shingle").agg(count(lit(1)).as("df"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        publishChecked(s, s"$base/shdf", dfDelta, Seq("shingle"), batchId,
          sumCols = Seq("df"))
        val shBuckets = Sources.touchedBucketIds(dfDelta, Seq("shingle"))
        // post-merge totals for the batch's own shingles — crash-
        // consistent: a redelivered batch re-reads the same post-state
        // (the marker skip above made the re-merge a no-op)
        val dfNow = Sources.readBucketedStoreBuckets(s, s"$base/shdf",
            ShDfSchema, shBuckets)
          .join(dfDelta.withColumnRenamed("df", "d_add"), "shingle")
        val newlyHot = dfNow
          .filter(col("df") > cap && col("df") - col("d_add") <= cap)
          .select(col("shingle"))
        val evictKeys = Sources.readBucketedStoreBuckets(s, s"$base/shidx",
            ShIdxSchema, shBuckets)
          .join(newlyHot, Seq("shingle"), "left_semi")
          .select(col("shingle"), col("doc_id"))
        val sizesB = shB.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
        val idxDelta = shB.join(sizesB, "doc_id")
          .join(dfNow.filter(col("df") <= cap).select(col("shingle")),
            Seq("shingle"), "left_semi")
          .select(col("shingle"), col("doc_id"), col("n_sh"))
        publishChecked(s, s"$base/shidx", idxDelta, Seq("shingle", "doc_id"),
          batchId, bucketCols = Seq("shingle"), newWins = true,
          deleteKeys = Some(evictKeys))
        shBuckets
      } finally dfDelta.unpersist()
    } finally { if (shB0.isEmpty) shB.unpersist() }
  }

  /** s17 steps 3–4: probe the maintained index with the batch, verify
    * exactly. Candidates = postings of the batch's (post-merge) rare
    * shingles — each list ≤ cap entries — self-joined under the d02
    * size-ratio prefilter, requiring one genuinely-new side; verify
    * re-derives the candidate docs' FULL shingle sets from the docs
    * store (bucket-pruned to the candidates' own buckets) ∪ the batch.
    * Returns (the (i, j, n_common, n_i, n_j, jac) delta, the cached
    * candidate subtree) — the caller unpersists the latter after
    * publishing the former. */
  private[graft] def incrementalPairs(s: SparkSession, base: String,
      newDocs: DataFrame, shBuckets: Seq[Int],
      shB0: Option[DataFrame] = None): (DataFrame, DataFrame) = {
    val threshold = PairStore.Threshold
    val cap = PairGraph.MaxShingleDf
    // every posting of a batch shingle, old and new docs alike (the
    // batch's own postings just published); rarity from maintained df
    val post = Sources.readBucketedStoreBuckets(s, s"$base/shidx",
        ShIdxSchema, shBuckets)
      .join(Sources.readBucketedStoreBuckets(s, s"$base/shdf",
          ShDfSchema, shBuckets)
          .filter(col("df") <= cap).select(col("shingle")),
        Seq("shingle"), "left_semi")
      .join(shB0.getOrElse(LlmOps.docShinglesOver(newDocs))
          .select(col("shingle")).distinct(),
        Seq("shingle"), "left_semi")
      .join(newDocs.select(col("doc_id"), lit(1L).as("is_new")),
        Seq("doc_id"), "left")
    // candidate-side key NARROWING (round 19, guide §2.3 shuffle fewer
    // bytes): the self-join below is the one corpus-shaped exchange of
    // the batch, and it only needs shingle EQUALITY, never the shingle
    // text — so it rides an 8-byte xxhash64 of the shingle instead of
    // the full n-gram string (the dominant column of the exchange). A
    // hash collision can only ADD join rows (equal strings always hash
    // equal), which can only RAISE n_cr, hence the upper bound `ub` —
    // the prune weakens, never tightens, and the exact verify
    // downstream (true shingle sets, array_intersect) is unchanged, so
    // the output is identical (PairStoreSpec pins incremental ≡
    // one-shot; the s17 oracle is d02's full-corpus derivation).
    val postH = post.select(xxhash64(col("shingle")).as("sh"),
      col("doc_id"), col("n_sh"), col("is_new"))
    val cand = postH.as("a")
      .join(postH.as("b"), col("a.sh") === col("b.sh") &&
        col("a.doc_id") < col("b.doc_id") &&
        col("a.n_sh") * threshold <= col("b.n_sh") &&
        col("b.n_sh") * threshold <= col("a.n_sh") &&
        (col("a.is_new").isNotNull || col("b.is_new").isNotNull))
      .groupBy(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
      .agg(count(lit(1)).as("n_cr"),
        first(col("a.n_sh")).as("n_i"), first(col("b.n_sh")).as("n_j"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // ——— the d02 upper-bound prune, recovered for the incremental
    // setting (round 18): round 16 dropped it because the bound needs
    // per-doc HOT counts and a STORE doc's hot count is not maintained.
    // But every candidate pair has a genuinely-NEW side by
    // construction, and a new doc's shingles are ALL batch shingles —
    // so (a) `n_cr` counts EVERY common post-merge-rare shingle of the
    // pair (a rare common shingle is a shingle of the new side, hence
    // a batch shingle, hence in `post` for both sides: df only grows,
    // so a still-rare shingle's old postings were inserted and never
    // evicted), and (b) the NEW side's hot count is computable from
    // the batch's own shingle stream against the post-merge DF store.
    // n_common ≤ n_cr + min over the new side(s) of their hot counts
    // (common hot shingles are shingles of the new side), and
    // n_common ≤ min(n_i, n_j); jac is monotone in n_common, so a
    // pair whose bound sits below τ is provably below τ — the verify
    // (re-shingle candidate docs + array_intersect) now touches only
    // pairs that can actually pass, exactly like the one-shot d02.
    // Measured (s17 probe, sf0.1): the unpruned verify was 16.5 s of
    // the 44 s query. Output unchanged — the exact filter downstream
    // is identical (PairStoreSpec pins incremental ≡ one-shot).
    val hotNew = shB0.getOrElse(LlmOps.docShinglesOver(newDocs))
      .join(Sources.readBucketedStoreBuckets(s, s"$base/shdf",
          ShDfSchema, shBuckets)
          .filter(col("df") > cap).select(col("shingle")),
        Seq("shingle"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hot"))
    val hotOf = newDocs.select(col("doc_id"))
      .join(hotNew, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("n_hot"), lit(0L)).as("n_hot"))
    val bounded = cand
      .join(hotOf.select(col("doc_id").as("i"), col("n_hot").as("h_i")),
        Seq("i"), "left")
      .join(hotOf.select(col("doc_id").as("j"), col("n_hot").as("h_j")),
        Seq("j"), "left")
      // hot term: min of the available hot counts (the candidate join
      // guarantees ≥ 1 new side, so at least one is non-null). FAIL-SAFE
      // (round-18 ADVICE): if both were ever null, the term is null,
      // `n_cr + null` is null, and `least` SKIPS nulls — the bound falls
      // back to least(n_i, n_j), which is always sound — instead of the
      // old Long.MaxValue sentinel arithmetic that wrapped negative and
      // silently dropped the pair before its exact verify.
      .withColumn("ub", least(
        col("n_cr") + least(coalesce(col("h_i"), col("h_j")),
          coalesce(col("h_j"), col("h_i"))),
        col("n_i"), col("n_j")))
      .filter(col("ub").cast("double") /
        (col("n_i") + col("n_j") - col("ub")) >= threshold)
      .select("i", "j", "n_i", "n_j")
    val candDocs = bounded
      .select(explode(array(col("i"), col("j"))).as("doc_id")).distinct()
    // candidate shingle sets: BATCH docs come from the cached shared
    // stream (their shingles were already derived once for the merge
    // step — at bootstrap, where every candidate is a batch doc, the
    // old shape re-normalized and re-shingled the entire batch from
    // text a second time); only STORE docs re-shingle from their
    // stored text, bucket-pruned to the candidates' buckets. The docs
    // store cannot hold a batch doc here (docs promote AFTER pairs),
    // so the union partitions exactly.
    val storeShingles = LlmOps.docShinglesOver(
      Sources.readBucketedStoreBuckets(s, s"$base/docs",
          newDocs.schema, Sources.labeled(s, "s17-cand-buckets") {
            Sources.touchedBucketIds(candDocs, Seq("doc_id")) })
        .join(candDocs, Seq("doc_id"), "left_semi"))
    val batchShingles = shB0.getOrElse(LlmOps.docShinglesOver(newDocs))
      .join(candDocs, Seq("doc_id"), "left_semi")
    val docsets = storeShingles.unionByName(batchShingles)
      .groupBy("doc_id").agg(collect_list(col("shingle")).as("ss"))
    val pairs = bounded
      .join(docsets.select(col("doc_id").as("i"), col("ss").as("ss_i")), "i")
      .join(docsets.select(col("doc_id").as("j"), col("ss").as("ss_j")), "j")
      .withColumn("n_common",
        size(array_intersect(col("ss_i"), col("ss_j"))).cast("long"))
      .withColumn("jac",
        col("n_common").cast("double") /
          (col("n_i") + col("n_j") - col("n_common")))
      .filter(col("jac") >= threshold)
      .select("i", "j", "n_common", "n_i", "n_j", "jac")
    (pairs, cand)
  }

  /** The s17 registry twin (StreamingSpec drives the same batches
    * through a real `writeStream.foreachBatch`): the corpus arrives as
    * two batches — the `doc_id % 10 < 8` "existing corpus" (the d30
    * convention), then the `≥ 8` delta — and the output is the final
    * published pair store re-read from DISK. One bootstrap + one
    * maintenance batch exercises every code path the sink has (the
    * genuinely-new anti-join, the SUM-merge against non-empty state,
    * cap-crossing eviction, index probes against old postings);
    * multi-delta sequencing, redelivery and crash points are
    * StreamingSpec's job, and the round-16 THREE-batch twin paid a
    * third 4-table publish cycle (~12 s at sf0.1) for no additional
    * registry-level coverage. The oracle is d02's one-shot pair
    * derivation over the WHOLE corpus: incremental maintenance must
    * converge to exactly the batch publish. (The df cap is computed
    * over the union-so-far, which can only have FEWER hot shingles
    * than the final corpus — so the incremental store is a superset in
    * general; PairStoreSpec pins set-equality on every sf, the
    * d73-style oracle precondition.) */
  def pairMaintFeed(s: SparkSession, d: String): DataFrame = {
    import graft.Canon.round4
    val docs = graft.Tables.documents(s, d).select(col("doc_id"), col("text"))
    val base = java.nio.file.Files.createTempDirectory("graft-pairmaint").toFile
    org.apache.commons.io.FileUtils.forceDeleteOnExit(base)
    Seq(docs.filter(pmod(col("doc_id"), lit(10L)) < 8),
        docs.filter(pmod(col("doc_id"), lit(10L)) >= 8))
      .zipWithIndex.foreach { case (b, i) =>
        pairStoreSink(base.toString)(b, i.toLong)
      }
    // a bucketed store that NOTHING routed to is never created (the
    // O(Δ) contract — an empty delta writes nothing); that happens iff
    // the corpus is empty, where the right answer is the empty pair set
    if (!new java.io.File(s"$base/pairs/published").exists)
      docs.limit(0).select(col("doc_id").as("i"), col("doc_id").as("j"),
        round4(lit(0.0)).as("jac"))
    else s.read.parquet(s"$base/pairs/published")
      .select(col("i"), col("j"), round4(col("jac")).as("jac"))
      .orderBy("i", "j")
  }

  /** s18 — STREAMING label-store maintenance: the d61 publisher's
    * incremental twin. The production clustering cadence is
    * retrain-rarely / assign-daily: the FIRST batch (the reference
    * corpus) trains the d59 Lloyd centroids and publishes them as a
    * frozen table; every later batch of new vectors is ASSIGNED to the
    * frozen centroids ([[EmbeddingOps.assignEmbeddings]] — one
    * broadcast join + the decimal argmin aggregate, O(Δ·k·dim), no
    * retraining) and upserted into the label store keyed vec_id.
    * Labels are stable by construction (vectors immutable, centroids
    * frozen), so the merge is insert-only dedup.
    *
    * PUBLISH IS O(Δ): the corpus-sized LABEL store lives in the
    * [[Sources.bucketedUpsertStaged]] layout — each batch stages and
    * swaps only the vec_id buckets its delta touches (insert-only: a
    * re-sent vec_id keeps its stored label). The CENTROID table is a
    * k·dim MODEL (KB at any corpus scale), so it keeps the whole-table
    * WAP promote — full rewrite is the right shape for model tables,
    * wrong only for corpus-sized ones.
    *
    * Crash discipline is [[pairStoreSink]]'s verbatim: labels promote
    * first, then centroids (batch 0 only — later batches find the
    * centroid table already complete), with per-BUCKET `_batch_<id>`
    * markers on labels and the whole-table marker on centroids; the
    * batch effect is a pure function of (frozen centroids, batch), so
    * redelivery after any crash point recomputes identical work.
    * Batch 0's two tables both derive from the in-memory batch, not
    * from each other's published paths, so the promote order carries
    * no read-after-rename hazard; labels-first keeps the s17 symmetry.
    *
    * Scale: per delta one broadcast of the k·dim centroid table against
    * the batch's exploded points — the cheapest possible admission of
    * new vectors into a clustered corpus; the full retrain remains the
    * d61 weekly job. */
  def labelMaintSink(base: String)(batch: DataFrame, batchId: Long): Unit = {
    val marker = new java.io.File(s"$base/_applied/$batchId")
    if (marker.exists()) return // redelivered batch: effectively once
    val s = batch.sparkSession
    val centBase = s"$base/centroids"
    val labBase = s"$base/labels"
    def tableDone(tb: String): Boolean =
      new java.io.File(s"$tb/published/_batch_$batchId").exists
    def doneAll(): Unit = markApplied(marker)
    def checkAudit(tb: String, audit: DataFrame): Unit = {
      val failed = audit.filter(!col("ok"))
        .select("check_name", "observed").collect()
      if (failed.nonEmpty)
        throw new IllegalStateException(
          s"labelMaintSink audit failed for batch $batchId at $tb: " +
            failed.mkString(", "))
    }
    val centPublished = new java.io.File(s"$centBase/published")
    val isTraining = !centPublished.exists || tableDone(centBase)
    // frozen centroids: train them from THIS batch iff none exist yet
    // (the reference-corpus batch), else read the published table
    val cent =
      if (centPublished.exists) s.read.parquet(centPublished.toString)
      else {
        val pts = batch.select(col("vec_id"),
          posexplode(col("embedding").cast("array<double>")))
          .toDF("vec_id", "dim", "v")
        EmbeddingOps.lloydCentroids(batch, pts,
          EmbeddingOps.KmeansK, EmbeddingOps.KmeansIters)
      }
    val labels = EmbeddingOps.assignEmbeddings(batch, cent)
      .dropDuplicates("vec_id")
    checkAudit(labBase, Sources.bucketedUpsertStaged(s, labels, labBase,
      Seq("vec_id"), stagedMarker = s"_batch_$batchId"))
    if (isTraining && !tableDone(centBase))
      checkAudit(centBase, Sources.writeAuditPublishStaged(s, cent,
        centBase, Seq("cid", "dim"), false,
        Some(s"_batch_$batchId")))
    doneAll()
  }

  /** The s18 registry twin: the embeddings corpus arrives as the
    * `vec_id % 10 < 8` reference batch (trains + freezes the
    * centroids), then the `≥ 8` delta (assign-only) — one bootstrap +
    * one maintenance batch, the s17 twin rationale: the admission path
    * is a pure function of (frozen centroids, batch), so a second
    * delta re-exercises nothing at registry level (multi-delta
    * sequencing, redelivery and crash points are StreamingSpec's job).
    * Output = the final label store re-read from DISK, per vector.
    * Oracle: the d59 Lloyd CTE chain TRAINED ON THE SLICE with the
    * final assignment over the whole corpus — incremental maintenance
    * is definitionally the frozen-centroid assignment, so equality is
    * structural, not a fixture accident (and batch-split-independent). */
  def labelMaintFeed(s: SparkSession, d: String): DataFrame = {
    val emb = graft.Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val base = java.nio.file.Files.createTempDirectory("graft-labmaint").toFile
    org.apache.commons.io.FileUtils.forceDeleteOnExit(base)
    Seq(emb.filter(pmod(col("vec_id"), lit(10L)) < 8),
        emb.filter(pmod(col("vec_id"), lit(10L)) >= 8))
      .zipWithIndex.foreach { case (b, i) =>
        labelMaintSink(base.toString)(b, i.toLong)
      }
    // empty corpus → no vec_id ever routed → the bucketed label store
    // was never created; the right answer is the empty label set
    if (!new java.io.File(s"$base/labels/published").exists)
      emb.limit(0).select(col("vec_id"), col("vec_id").as("cid"),
        lit(0.0).as("dist2"))
    else s.read.parquet(s"$base/labels/published")
      .select(col("vec_id"), col("cid"),
        col("dist2").cast("double").as("dist2"))
      .orderBy("vec_id")
  }

  /** s19 — STREAMING vector-index maintenance: the d74 publisher's
    * incremental twin, completing the store trilogy (s17 pairs, s18
    * labels, s19 the ANN index). The production cadence is the s18 one,
    * applied to BOTH quantizers: the FIRST batch (the reference corpus)
    * trains the coarse IVF centroids and the m PQ codebooks — the full
    * d73 build — and publishes all four index relations with the models
    * FROZEN; every later batch of new vectors is admitted by
    * assignment alone: cells via [[EmbeddingOps.assignCellsOver]]
    * (one broadcast of the k coarse centroids, the cosine argmax
    * aggregate) and codes via [[EmbeddingOps.pqAssignOver]] against the
    * published codebook (one broadcast of the m·kPq·sw table, the
    * decimal argmin) — O(Δ·(k·dim + m·kPq·sw)), no retraining, exactly
    * the incremental admission a FAISS-style index performs on add().
    * Index entries are stable by construction (vectors immutable,
    * models frozen), so both upserts are insert-only dedup.
    *
    * Crash discipline is [[labelMaintSink]]'s verbatim: data tables
    * (cells, then codes) promote first, model tables (codebook, then
    * centroids — batch 0 only) last, each with the atomic `_batch_<id>`
    * staged marker; a delta batch's effect is a pure function of
    * (frozen models, batch) and batch 0's of the batch alone
    * (deterministic seeded training), so redelivery after ANY crash
    * point recomputes identical work and per-table markers skip the
    * promoted halves. Failed audit → throw, no marker, the engine
    * redelivers.
    *
    * Scale: the delta path never touches the published corpus-sized
    * tables except through [[Sources.bucketedUpsertStaged]] — per
    * batch only the vec_id buckets the delta routes to are read,
    * staged, and swapped, so index-maintenance I/O is
    * O(Δ · bucketBytes) — and the model broadcasts are KB-sized at
    * any corpus scale. The full retrain stays the d74 weekly job —
    * rerun it when the frozen quantizers drift from the data
    * distribution (the recall spec is the gate). */
  def vectorIndexMaintSink(base: String)(batch: DataFrame, batchId: Long): Unit = {
    val marker = new java.io.File(s"$base/_applied/$batchId")
    if (marker.exists()) return // redelivered batch: effectively once
    val s = batch.sparkSession
    graft.functions.CosineSimilarity.ensureRegistered(s)
    val tables = Seq("cells", "codes", "codebook", "centroids")
      .map(n => n -> s"$base/$n").toMap
    def tableDone(tb: String): Boolean =
      new java.io.File(s"$tb/published/_batch_$batchId").exists
    def doneAll(): Unit = markApplied(marker)
    def checkAudit(tb: String, audit: DataFrame): Unit = {
      val failed = audit.filter(!col("ok"))
        .select("check_name", "observed").collect()
      if (failed.nonEmpty)
        throw new IllegalStateException(
          s"vectorIndexMaintSink audit failed for batch $batchId at $tb: " +
            failed.mkString(", "))
    }
    def publish(tb: String, df: DataFrame, keyCols: Seq[String]): Unit =
      checkAudit(tb, Sources.writeAuditPublishStaged(s, df, tb,
        keyCols, false, Some(s"_batch_$batchId")))
    val centPublished = new java.io.File(s"${tables("centroids")}/published")
    val isTraining = !centPublished.exists || tableDone(tables("centroids"))
    // persisted: the Lloyd rounds (batch 0) and the two admission paths
    // (deltas) each re-read the batch several times, and at production
    // scale the reference batch is corpus-sized
    val e = LlmOps.persistCorpus(batch.select(col("vec_id"),
      col("embedding").cast("array<double>").as("v")))
    val (m, sw) = (4, 16)
    // (newCells (vec_id, cid), newCodes packed (vec_id, codes),
    //  codebook long form, coarse centroids) — trained on batch 0,
    // assignment-only against the frozen published models afterwards
    val (newCells, newCodes, cb, cent) =
      if (isTraining && !centPublished.exists) {
        val (cells, codes, cb0, cent0) = EmbeddingOps.pqIndexRelationsOver(e)
        (cells, packCodes(codes), cb0, cent0)
      } else {
        val cent0 = s.read.parquet(centPublished.toString)
        val cb0 = s.read.parquet(s"${tables("codebook")}/published")
        val cells = EmbeddingOps.assignCellsOver(e, cent0)
          .select(col("vec_id"), col("cid"))
        val codes = EmbeddingOps.pqAssignEmbeddings(e,
          cb0.select(col("m"), col("code").as("cid"), col("pos").as("dim"),
            col("c")), m, sw)
          .select(col("vec_id"), col("m"), col("cid").as("code"))
        (cells, packCodes(codes), cb0, cent0)
      }
    // corpus-sized data tables: O(Δ) bucketed upserts, insert-only —
    // a re-sent vec_id keeps its STORED row in BOTH tables (one merge
    // rule, applied per table), so a conflicting re-send can never
    // leave cells on the old assignment while codes take the new one
    checkAudit(tables("cells"), Sources.bucketedUpsertStaged(s,
      newCells.dropDuplicates("vec_id"), tables("cells"), Seq("vec_id"),
      stagedMarker = s"_batch_$batchId"))
    checkAudit(tables("codes"), Sources.bucketedUpsertStaged(s,
      newCodes.dropDuplicates("vec_id"), tables("codes"), Seq("vec_id"),
      stagedMarker = s"_batch_$batchId"))
    if (isTraining) {
      if (!tableDone(tables("codebook")))
        publish(tables("codebook"), cb, Seq("m", "code", "pos"))
      if (!tableDone(tables("centroids")))
        publish(tables("centroids"), cent, Seq("cid"))
    }
    doneAll()
  }

  /** The d74 packed layout: one row per vector, its m code words as an
    * m-position array (position = sub-space). */
  private def packCodes(codes: DataFrame): DataFrame =
    codes.groupBy("vec_id")
      .agg(transform(array_sort(collect_list(struct(col("m"), col("code")))),
        x => x.getField("code")).as("codes"))

  /** The s19 registry twin (the s18 batch convention): the embeddings
    * corpus arrives as the `vec_id % 10 < 8` reference batch (trains +
    * freezes both quantizers, publishes the full index) and the `≥ 8`
    * delta (assignment-only admission) — one bootstrap + one
    * maintenance batch, the s17/s18 twin rationale. Output = per-vector
    * STORE SHAPE re-read from DISK — how many cell rows and how many
    * code words the final index holds for each vector — whose oracle is
    * the pure invariant (1 cell row, m = 4 code words, every vector):
    * an unadmitted delta vector is a missing row, a double admission is
    * a dup — exactly the incremental-maintenance failure modes. The
    * cid/code VALUES are engine artifacts no SQL oracle could
    * reproduce (the d73/d74 footnote discipline); their deep equality —
    * final store ≡ frozen-model assignment over the whole corpus, and
    * deltas never moving reference rows — is LlmOpsSpec/StreamingSpec
    * structural pins. */
  def vectorIndexMaintFeed(s: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    val emb = graft.Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val base = java.nio.file.Files.createTempDirectory("graft-vixmaint").toFile
    org.apache.commons.io.FileUtils.forceDeleteOnExit(base)
    Seq(emb.filter(pmod(col("vec_id"), lit(10L)) < 8),
        emb.filter(pmod(col("vec_id"), lit(10L)) >= 8))
      .zipWithIndex.foreach { case (b, i) =>
        vectorIndexMaintSink(base.toString)(b, i.toLong)
      }
    // empty corpus → the bucketed cells/codes stores were never
    // created; the store-shape invariant over nothing is no rows
    if (!new java.io.File(s"$base/cells/published").exists)
      return emb.limit(0).select(col("vec_id"),
        lit(0L).as("n_cell_rows"), lit(0L).as("n_code_words"))
    val cells = s.read.parquet(s"$base/cells/published")
      .groupBy("vec_id").agg(count(lit(1)).as("n_cell_rows"))
    val codes = s.read.parquet(s"$base/codes/published")
      .groupBy("vec_id")
      .agg(sum(size(col("codes"))).as("n_code_words"))
    cells.join(codes, Seq("vec_id"), "full_outer")
      .select(col("vec_id"),
        coalesce(col("n_cell_rows"), lit(0L)).as("n_cell_rows"),
        coalesce(col("n_code_words"), lit(0L)).cast("long").as("n_code_words"))
      .orderBy("vec_id")
  }

  private val FamVecSchema = org.apache.spark.sql.types.StructType.fromDDL(
    "vec_id BIGINT, cid INT, v ARRAY<DOUBLE>")
  private val FamSchema = org.apache.spark.sql.types.StructType.fromDDL(
    "vec_id BIGINT, family_id BIGINT")

  /** s26 — STREAMING family-store maintenance: the maintained-store
    * QUARTET's fourth member (s17 pairs, s18 labels, s19 the ANN
    * index, s26 the d82 GRAPH FAMILIES) — d84's admission decision
    * turned into a published, incrementally-maintained store. The
    * cadence is the s18/s19 one: the FIRST batch (the reference
    * corpus) trains the coarse cells (`ivfCellsOver` — frozen
    * thereafter), derives the d82 families over its own cells-blocked
    * k-NN adjacency, and publishes THREE tables — `centroids` (k·dim
    * model, whole-table promote), `vecs` (vec_id, cid, v) bucketed by
    * CELL (the probe's access path), `families` (vec_id, family_id)
    * bucketed by vec_id; every later batch is admitted by the d84
    * rule: assign to the frozen cells (one broadcast argmax), probe
    * ONLY the touched cells' member buckets for the best existing
    * neighbor (O(Δ · cellBytes) read — never the corpus), join the
    * best's family at sim ≥ τ or found a new one, and upsert both
    * data tables insert-only.
    *
    * Admission is against the PRE-batch store by contract (two
    * mutual near-dups arriving in ONE batch each found their own
    * family unless either matches the store) — the within-batch merge
    * is the weekly d82 retrain's job, the retrain-rarely discipline
    * s18 documents for centroids applied to families. This is what
    * keeps each batch's effect a pure function of (frozen models,
    * pre-batch store, batch) — the crash/redelivery currency.
    *
    * Crash discipline: families promote FIRST, then vecs, model last
    * (batch 0 only). Deltas carry the WHOLE batch (the s18 shape):
    * insert-only merges keep the stored row for any re-sent id, and a
    * redelivered delta re-touches every bucket its ids route to — a
    * lost per-bucket marker re-promotes from a CONTENT-identical
    * merge even when the probe ran against a half-applied store
    * (recomputed rows only differ for ids the store already holds,
    * and those lose to the stored rows). Self-pairs are excluded at
    * the probe join; a redelivered REFERENCE batch re-enters the
    * training branch (the centroid table's own `_batch_0` marker —
    * recompute-identical, bucket markers skip the promoted halves). */
  def familyMaintSink(base: String)(batch: DataFrame, batchId: Long): Unit = {
    val marker = new java.io.File(s"$base/_applied/$batchId")
    if (marker.exists()) return // redelivered batch: effectively once
    val s = batch.sparkSession
    graft.functions.CosineSimilarity.ensureRegistered(s)
    val famB = s"$base/families"
    val vecB = s"$base/vecs"
    val centB = s"$base/centroids"
    def tableDone(tb: String): Boolean =
      new java.io.File(s"$tb/published/_batch_$batchId").exists
    def checkAudit(tb: String, audit: DataFrame): Unit = {
      val failed = audit.filter(!col("ok"))
        .select("check_name", "observed").collect()
      if (failed.nonEmpty)
        throw new IllegalStateException(
          s"familyMaintSink audit failed for batch $batchId at $tb: " +
            failed.mkString(", "))
    }
    val e = LlmOps.persistCorpus(batch.dropDuplicates("vec_id")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v")))
    val centPublished = new java.io.File(s"$centB/published")
    val isTraining = !centPublished.exists || tableDone(centB)
    if (isTraining) {
      // reference batch (or its redelivery — recompute-identical):
      // train cells, derive the d82 families over the reference corpus
      val (cells, cent) = Sources.labeled(s, "s26-train-cells") {
        EmbeddingOps.ivfCellsOver(e) }
      val edges = EmbeddingOps.knnGraphOver(
          cells.select(col("vec_id"), col("cid").as("block"), col("v")), 3)
        .filter(col("sim") >= EmbeddingOps.KnnDedupTau)
        .select(col("i"), col("j"))
      val labels = Sources.labeled(s, "s26-cc") {
        ConnectedComponents.largeSmallStar(edges) }
      val fams = cells.select(col("vec_id"))
        .join(labels, col("vec_id") === col("node"), "left")
        .select(col("vec_id"),
          coalesce(col("component"), col("vec_id")).as("family_id"))
      checkAudit(famB, Sources.bucketedUpsertStaged(s, fams, famB,
        Seq("vec_id"), stagedMarker = s"_batch_$batchId"))
      checkAudit(vecB, Sources.bucketedUpsertStaged(s,
        cells.select(col("vec_id"), col("cid"), col("v")), vecB,
        Seq("cid", "vec_id"), stagedMarker = s"_batch_$batchId",
        bucketCols = Seq("cid")))
      if (!tableDone(centB))
        checkAudit(centB, Sources.writeAuditPublishStaged(s, cent,
          centB, Seq("cid"), false,
          Some(s"_batch_$batchId")))
    } else {
      val cent = s.read.parquet(centPublished.toString)
      // decisions are derived for the WHOLE batch (the s18 delta
      // shape): the insert-only upsert keeps the STORED row for any
      // re-sent id, and — load-bearing for crash recovery — a
      // redelivered delta re-touches every bucket its ids route to,
      // so a lost per-bucket marker re-promotes from a merge whose
      // CONTENT is identical (existing rows win; the only rows a
      // half-applied redelivery recomputes differently are for ids
      // the store already holds). Self-pairs are excluded at the
      // probe so a redelivered vector never matches itself.
      val assigned = LlmOps.persistCorpus(
        EmbeddingOps.assignCellsOver(e, cent))
      val members = Sources.readBucketedStoreBuckets(s, vecB,
        FamVecSchema, Sources.touchedBucketIds(assigned, Seq("cid")))
      val best = assigned.as("b").join(members.as("a"),
          col("a.cid") === col("b.cid") &&
            col("a.vec_id") =!= col("b.vec_id"))
        .select(col("b.vec_id").as("vec_id"),
          col("a.vec_id").as("cand_id"),
          round4(EmbeddingOps.cosine(col("b.v"), col("a.v"))).as("csim"))
        .groupBy("vec_id")
        .agg(max_by(struct(col("cand_id"), col("csim")),
          struct(col("csim"), -col("cand_id"))).as("w"))
        .select(col("vec_id"), col("w.cand_id").as("best_id"),
          col("w.csim").as("sim"))
      val famOfBest = Sources.readBucketedStoreBuckets(s, famB, FamSchema,
          Sources.touchedBucketIds(
            best.select(col("best_id").as("vec_id")), Seq("vec_id")))
        .select(col("vec_id").as("best_id"), col("family_id").as("fid"))
      val fams = assigned.select(col("vec_id"))
        .join(best, Seq("vec_id"), "left")
        .join(famOfBest, Seq("best_id"), "left")
        .select(col("vec_id"),
          when(col("sim") >= EmbeddingOps.KnnDedupTau, col("fid"))
            .otherwise(col("vec_id")).as("family_id"))
      checkAudit(famB, Sources.bucketedUpsertStaged(s, fams, famB,
        Seq("vec_id"), stagedMarker = s"_batch_$batchId"))
      checkAudit(vecB, Sources.bucketedUpsertStaged(s,
        assigned.select(col("vec_id"), col("cid"), col("v")), vecB,
        Seq("cid", "vec_id"), stagedMarker = s"_batch_$batchId",
        bucketCols = Seq("cid")))
    }
    markApplied(marker)
  }

  /** The s26 registry twin: the embeddings corpus arrives as the
    * `vec_id % 10 < 8` reference batch (trains cells, derives and
    * publishes the d82 families) and the 8- and 9-bucket deltas —
    * THREE batches here, unlike the two-batch s17/s18/s19 twins,
    * because sequential admission IS the registry-level semantics: a
    * 9-bucket vector can join a family a 8-bucket vector FOUNDED, and
    * only a second delta exercises that store evolution. Output = the
    * final family store re-read from DISK, every vector labeled.
    * Oracle: the reference-slice d82 chain + two unrolled admission
    * rounds (the d84 CASE, round 2 probing reference ∪ batch-1). */
  def familyMaintFeed(s: SparkSession, d: String): DataFrame = {
    val emb = graft.Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val base = java.nio.file.Files.createTempDirectory("graft-fammaint").toFile
    org.apache.commons.io.FileUtils.forceDeleteOnExit(base)
    Seq(emb.filter(pmod(col("vec_id"), lit(10L)) < 8),
        emb.filter(pmod(col("vec_id"), lit(10L)) === 8),
        emb.filter(pmod(col("vec_id"), lit(10L)) === 9))
      .zipWithIndex.foreach { case (b, i) =>
        familyMaintSink(base.toString)(b, i.toLong)
      }
    // empty corpus → no vec_id ever routed → the bucketed family store
    // was never created; the right answer is the empty label set
    if (!new java.io.File(s"$base/families/published").exists)
      emb.limit(0).select(col("vec_id"), col("vec_id").as("family_id"))
    else s.read.parquet(s"$base/families/published")
      .select(col("vec_id"), col("family_id"))
      .orderBy("vec_id")
  }

  /** s20 — CDC REPLICATION: the change feed consumed AS a stream. f15
    * recovers the minimal keyed diff between two retained versions and
    * s16 writes versions FROM a stream; this closes the remaining
    * direction — subscribe to a versioned table's change feed and
    * maintain a derived REPLICA from post-images and deletes alone (the
    * Delta-CDF/Debezium read path: bootstrap from one snapshot, then
    * tail O(changes)-sized feeds, never re-reading the source table).
    *
    * Apply rule per CDC batch: post-image rows (`insert` +
    * `update_postimage`) upsert by key, `delete` rows remove their key,
    * `update_preimage` rows are provenance only and are ignored — the
    * batch effect is a pure function of (replica, batch), so a
    * redelivered batch recomputes identical work. Effectively-once is
    * the [[versionedSink]] marker protocol verbatim: `_applied/<id>`
    * side marker, `_batch_<id>` carried atomically with the promote
    * (crash between promote and marker → backfill + no-op), audit
    * failure → throw with no marker so the engine redelivers.
    *
    * Scale: the replica lives in the [[Sources.bucketedUpsertStaged]]
    * layout, applied in `newWins` mode — post-images replace their
    * keys' stored rows, delete keys leave — so each batch reads,
    * stages, and swaps ONLY the key buckets the feed touches:
    * apply I/O is O(changes · bucketBytes) against a replica of any
    * size, and after bootstrap the source table is never re-read — the
    * point of replicating from a feed. */
  def cdcReplicaSink(base: String, key: String)(batch: DataFrame, batchId: Long): Unit = {
    val marker = new java.io.File(s"$base/_applied/$batchId")
    if (marker.exists()) return // redelivered batch: effectively once
    def backfill(): Unit = markApplied(marker)
    val s = batch.sparkSession
    // post-images come back whole, so an `insert` for a key the replica
    // already holds (a redelivered-source artifact) degrades to an
    // upsert, not a duplicate; preimages are provenance only. A crash
    // between the bucket promotes and the side marker heals here: every
    // touched bucket carries the batch marker, so the re-apply is a
    // per-bucket no-op and the side marker backfills
    val post = batch.filter(col("change_type")
        .isin("insert", "update_postimage"))
      .drop("change_type")
    val deletes = batch.filter(col("change_type") === "delete")
      .select(col(key)).distinct()
    val audit = Sources.bucketedUpsertStaged(s, post, base, Seq(key),
      stagedMarker = s"_batch_$batchId", newWins = true,
      deleteKeys = Some(deletes))
    val failed = audit.filter(!col("ok"))
      .select("check_name", "observed").collect()
    if (failed.nonEmpty)
      throw new IllegalStateException(
        s"cdcReplicaSink audit failed for batch $batchId: ${failed.mkString(", ")}")
    backfill()
  }

  /** The SUBSCRIBE half of s20 — the replication cursor loop: catch the
    * replica up to the source's current version. Version 1 bootstraps
    * (the initial snapshot replayed as an all-insert feed — the
    * standard CDC bootstrap); every later version applies
    * [[Sources.changesBetween]](v−1, v) — O(changes) rows per feed.
    * The cursor is the sink's own `_applied` markers, so catch-up is
    * idempotent: a repeated — or crashed-and-restarted — call skips
    * every applied version and applies only the missing tail. Returns
    * the number of feeds applied by THIS call. */
  def replicateUpTo(s: org.apache.spark.sql.SparkSession, srcBase: String,
      replicaBase: String, key: String): Int = {
    val cur = Sources.currentVersion(srcBase)
    (1 to cur).count { v =>
      val unapplied = !new java.io.File(s"$replicaBase/_applied/$v").exists
      if (unapplied) {
        val feed =
          if (v == 1) Sources.readAsOf(s, srcBase, 1)
            .withColumn("change_type", lit("insert"))
          else Sources.changesBetween(s, srcBase, v - 1, v, key)
        cdcReplicaSink(replicaBase, key)(feed, v.toLong)
      }
      unapplied
    }
  }

  /** The s20 registry twin: the s16 ladder (customer snapshot → f13
    * feed → bucket-7 deletes) builds the 3-version SOURCE, one
    * [[replicateUpTo]] call tails its change feed into a replica, and
    * the output is the replica re-read from DISK — which must equal
    * the source's current version row-for-row (the oracle derives v3's
    * content directly from `customer`). StreamingSpec drives the sink
    * through a real `writeStream` and pins idempotent catch-up,
    * redelivery, audit-retry, and crash-marker behavior. */
  def cdcReplicationFeed(s: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    val (target, feed, _) = Sources.customerLadder(s, d)
    val b0 = target.withColumn("op", lit("upsert"))
    val b2 = graft.Tables.customer(s, d)
      .filter(pmod(col("c_custkey"), lit(10L)) === 7)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
        lit("delete").as("op"))
    val srcBase = java.nio.file.Files.createTempDirectory("graft-cdcsrc").toFile
    org.apache.commons.io.FileUtils.forceDeleteOnExit(srcBase)
    Seq(b0, feed, b2).zipWithIndex.foreach { case (b, i) =>
      versionedSink(srcBase.toString, "c_custkey")(b, i.toLong)
    }
    val repBase = java.nio.file.Files.createTempDirectory("graft-cdcrep").toFile
    org.apache.commons.io.FileUtils.forceDeleteOnExit(repBase)
    replicateUpTo(s, srcBase.toString, repBase.toString, "c_custkey")
    // empty source → all-empty change feeds → the bucketed replica was
    // never created; the replica of an empty table is empty
    if (!new java.io.File(s"$repBase/published").exists)
      graft.Tables.customer(s, d)
        .select(col("c_custkey"), col("c_name"), col("c_acctbal")).limit(0)
    else s.read.parquet(s"$repBase/published")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      .orderBy("c_custkey")
  }

  /** s23 — STREAMING index DELETES: the missing verb of the maintained
    * vector index. d74 builds it, s19 admits streamed ADDS by frozen-
    * model assignment, d79 deletes from it in batch — this consumes a
    * STREAM of delete keys and tombstones their inverted-file entries
    * per micro-batch through the f23 deletion-vector sidecar
    * ([[Sources.dvDeleteMatching]]: the batch's keys semi-join the
    * tagged cells scan, never a driver-side isin). Per-batch write =
    * the (file, pos) sidecar swap alone — O(rows deleted this batch),
    * ZERO data files touched at any store size (spec pins published
    * cells bytes identical across delete batches), which is the one
    * maintenance verb where merge-on-read beats even the bucketed
    * upsert: nothing is re-staged, the tombstone IS the write. Code
    * rows for dead ids become unreachable at the cells join; their
    * physical removal is a compaction ([[Sources.dvCompact]]) on the
    * f10/d74 cadence.
    *
    * Effectively-once is belt-and-braces: the `_applied/<id>` side
    * marker skips a redelivered batch outright, and underneath,
    * dvDeleteMatching is idempotent anyway (already-tombstoned
    * coordinates anti-join away — a half-applied crash redelivery
    * appends nothing twice). A crash between the sidecar's two renames
    * heals FORWARD in every reader (the f23 recoverDvSwap discipline,
    * inherited verbatim). */
  def indexDeleteSink(base: String)(batch: DataFrame, batchId: Long): Unit = {
    val marker = new java.io.File(s"$base/_applied/$batchId")
    if (marker.exists()) return // redelivered batch: effectively once
    Sources.dvDeleteMatching(batch.sparkSession, base,
      batch.select(col("vec_id")), Seq("vec_id"))
    markApplied(marker)
  }

  /** The s23 registry twin: clone the shared d74 store's cells relation
    * into this operator's own published base (the mid-suite-immutable
    * singleton argument of d79), stream the `vec_id % 7 = 3` delete
    * keys in as THREE micro-batches (split by `(vec_id / 7) % 3` — the
    * s19 batch convention), then search the maintained store end-to-end
    * with the real d73 kernel (nprobe = 2, per-list cut). The final
    * store state is BY CONSTRUCTION the d79 batch-delete state —
    * streaming ≡ batch, the s17/s18/s19 twin discipline — so the oracle
    * is d79's: brute-force NN excluding every streamed tombstone. */
  def indexDeleteFeed(s: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    val (_, codes, cb, cent) = VectorIndexStore.relations(s, d)
    val base = EmbeddingOps.clonedCells(s, d, "ixdel") { b =>
      val dels = graft.Tables.embeddings(s, d)
        .filter(pmod(col("vec_id"), lit(7L)) === 3)
        .select(col("vec_id"),
          // integer `div`, not double `/`: beyond 2^53 the truncated
          // double quotient can diverge from (vec_id / 7) % 3
          pmod(expr("vec_id div 7"), lit(3L)).as("b"))
      (0L to 2L).foreach { i =>
        indexDeleteSink(b)(dels.filter(col("b") === i), i)
      }
    }
    val live = Sources.readWithDv(s, base)
    EmbeddingOps.ivfPqSearch(s, d, live, codes, cb, cent,
      shortlist = 64, sw = 16, nprobe = 2, perCellCut = true)
  }

  def upsertBatch(stateDir: String)(batch: DataFrame, batchId: Long): Unit = {
    // the marker/rename protocol below uses local-FS atomic renames; a
    // production deployment on an object store puts a transactional
    // table format in this body instead (the idempotence logic is
    // identical). Guard so a URI path can't silently void the markers.
    require(!stateDir.matches("^[a-zA-Z][a-zA-Z0-9+.-]*://.*") || stateDir.startsWith("file:"),
      s"upsertBatch state swap is local-filesystem only, got: $stateDir")
    import org.apache.commons.io.FileUtils
    val marker = new java.io.File(s"$stateDir/_applied/$batchId")
    if (marker.exists()) return // redelivered batch: effectively once
    val s = batch.sparkSession
    val curDir = new java.io.File(s"$stateDir/current")
    val nextDir = new java.io.File(s"$stateDir/next")
    val prevDir = new java.io.File(s"$stateDir/prev")
    // crash recovery, in swap order: an orphaned `next` is an incomplete
    // write (discard); a missing `current` with a surviving `prev` means
    // the crash hit between the two renames (restore — the interrupted
    // batch has no marker and will re-apply, which re-merges to the same
    // state: the merge is idempotent on identical input)
    FileUtils.deleteQuietly(nextDir)
    if (!curDir.exists() && prevDir.exists()) FileUtils.moveDirectory(prevDir, curDir)
    FileUtils.deleteQuietly(prevDir)
    val lastPerKey = lastEventPerUser(batch)
    val cur =
      if (curDir.exists()) s.read.parquet(curDir.toString)
      else s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        batch.schema)
    val next = cur.join(lastPerKey.select("user_id"), Seq("user_id"), "left_anti")
      .select(batch.columns.map(col).toIndexedSeq: _*)
      .unionByName(lastPerKey)
    next.write.mode("overwrite").parquet(nextDir.toString)
    // swap via two renames, never a delete of live state: current → prev,
    // next → current, then drop prev — every crash point above restores
    if (curDir.exists()) FileUtils.moveDirectory(curDir, prevDir)
    FileUtils.moveDirectory(nextDir, curDir)
    FileUtils.deleteQuietly(prevDir)
    markApplied(marker)
  }

  /** s24 — STREAMING DRIFT MONITOR: p05's PSI brought to the ingest
    * path, the s18 frozen-model discipline applied to monitoring. The
    * FIRST batch is the reference snapshot: its length extrema freeze
    * the 10 integral bins (the f17 closed-form formula — integer `div`
    * rather than p05's float-width p03 bins, the form that stays exact
    * when the frozen extrema become plan literals) and its
    * histogram publishes as a 10-row model table (KB at any corpus
    * scale — whole-table promote, the centroid-table rule). Every
    * later batch computes its per-bin PSI terms against the FROZEN
    * reference — monitored batches never move the bins or the
    * reference counts (a drifting reference would hide exactly the
    * drift being measured; StreamingSpec pins the reference dir
    * byte-identical across monitored batches) — and appends its rows
    * to `psi/batch=<id>/`. Out-of-range lengths clamp into the edge
    * bins (`greatest(0, least(9, …))` — a reference bin layout cannot
    * anticipate a drifted snapshot's range, and clamping is what
    * real PSI monitoring does with overflow bins; the clamp also
    * keeps the integer `div` on non-negative operands, where Spark
    * `div` ≡ DuckDB `//`).
    *
    * Scale: each batch is ONE scan of ITSELF + a broadcast of the
    * 10-row reference — nothing corpus-sized, nothing keyed by
    * history. Crash discipline: each batch's psi rows are a pure
    * function of (frozen reference, batch), so a redelivery
    * recomputes identical rows and the overwrite + `_applied` marker
    * make it effectively once; an EMPTY monitored batch emits
    * nothing (no snapshot arrived — and the empty-corpus feed stays
    * empty end to end). [[driftMultiSink]] (s25) is this monitor at
    * (feature, bin) grain — the multi-feature ingest gate. */
  def driftMonitorSink(base: String)(batch: DataFrame, batchId: Long): Unit = {
    val marker = new java.io.File(s"$base/_applied/$batchId")
    if (marker.exists()) return // redelivered batch: effectively once
    val s = batch.sparkSession
    import s.implicits._
    val nBins = 10L
    val refDir = new java.io.File(s"$base/ref")
    val lens = batch.select(length(col("text")).cast("long").as("x"))
    if (!new java.io.File(refDir, "_ready").exists) {
      // BATCH 0 = the reference snapshot BY CONTRACT: freeze bins +
      // histogram. A later batch must never inherit the reference role
      // (an empty batch 0 means the reference corpus was empty — no
      // model ever freezes and no PSI is ever emitted, which is also
      // what the oracle's empty reference slice yields; letting the
      // first NON-empty batch freeze instead would silently score the
      // remaining batches against a drifted baseline the oracle
      // doesn't model).
      val r = if (batchId == 0L) lens.agg(min(col("x")), max(col("x"))).head()
        else null
      if (batchId == 0L && (r == null || r.isNullAt(0)))
        emptyReferenceSignal(base, "driftMonitorSink")
      if (r != null && !r.isNullAt(0)) {
        val lo = r.getLong(0)
        val rng = math.max(r.getLong(1) - lo + 1, 1L)
        val hist = s.range(nBins).select(col("id").as("bucket"))
          .join(lens.withColumn("bucket",
              least(lit(nBins - 1), expr(s"(x - $lo) * $nBins div $rng")))
            .groupBy("bucket").agg(count(lit(1)).as("n_ref")),
            Seq("bucket"), "left")
          .select(col("bucket"), coalesce(col("n_ref"), lit(0L)).as("n_ref"),
            lit(lo).as("lo"), lit(rng).as("rng"))
        val staging = new java.io.File(s"$base/ref_staging")
        org.apache.commons.io.FileUtils.deleteQuietly(staging)
        hist.coalesce(1).write.parquet(staging.toString)
        // markers travel atomically with the rename: _ready gates the
        // frozen-reference branch, _batch_<id> records WHICH batch
        // froze it (a crash between this rename and the side marker
        // must redeliver as a no-op, never as a monitored batch — the
        // reference scoring PSI against itself would read as "no
        // drift" forever)
        markApplied(new java.io.File(staging, "_ready"))
        markApplied(new java.io.File(staging, s"_batch_$batchId"))
        org.apache.commons.io.FileUtils.deleteQuietly(refDir)
        java.nio.file.Files.move(staging.toPath, refDir.toPath,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      }
      markApplied(marker)
      return
    }
    if (new java.io.File(refDir, s"_batch_$batchId").exists) {
      // redelivered reference batch (crash before the side marker):
      // the freeze already promoted — backfill and no-op
      markApplied(marker)
      return
    }
    // monitored batch: PSI terms vs the frozen reference (broadcast-
    // sized — 10 rows + 2 literals read to the planner, the f17 rule)
    val ref = s.read.parquet(refDir.toString)
    val h = ref.head()
    val (lo, rng) = (h.getLong(ref.columns.indexOf("lo")),
      h.getLong(ref.columns.indexOf("rng")))
    val refN = ref.agg(sum(col("n_ref"))).head().getLong(0)
    val counts = lens.withColumn("bucket",
        greatest(lit(0L), least(lit(nBins - 1),
          expr(s"(x - $lo) * $nBins div $rng"))))
      .groupBy("bucket").agg(count(lit(1)).as("n_obs"))
    val obsN = lens.count()
    if (obsN > 0L) {
      val pCol = (col("n_ref") + 1).cast("double") /
        lit((refN + nBins).toDouble)
      val qCol = (col("n_obs") + 1).cast("double") /
        lit((obsN + nBins).toDouble)
      val rows = ref.select(col("bucket"), col("n_ref"))
        .join(counts, Seq("bucket"), "left")
        .select(lit(batchId).as("batch_id"), col("bucket"), col("n_ref"),
          coalesce(col("n_obs"), lit(0L)).as("n_obs"))
        .select(col("batch_id"), col("bucket"), col("n_ref"), col("n_obs"),
          graft.Canon.round4(pCol).as("share_ref"),
          graft.Canon.round4(qCol).as("share_obs"),
          graft.Canon.round4((pCol - qCol) *
            graft.Canon.dec(log(pCol / qCol)).cast("double")).as("psi"))
      rows.coalesce(1).write.mode("overwrite")
        .parquet(s"$base/psi/batch=$batchId")
    }
    markApplied(marker)
  }

  /** The s24 registry twin (StreamingSpec drives the same batches
    * through a real `writeStream.foreachBatch`): the corpus arrives as
    * the `doc_id % 4 < 2` reference snapshot, then the %4 = 2 and
    * %4 = 3 monitored snapshots; output = every monitored batch's PSI
    * rows re-read from DISK, ordered (batch_id, bucket). The oracle
    * recomputes reference bins, clamped counts, smoothed shares and
    * canonical-ln terms per monitored slice — drift fidelity is what
    * hashes. */
  def driftMonitorFeed(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val base = java.nio.file.Files.createTempDirectory("graft-drift").toFile
    org.apache.commons.io.FileUtils.forceDeleteOnExit(base)
    Seq(docs.filter(pmod(col("doc_id"), lit(4L)) < 2),
        docs.filter(pmod(col("doc_id"), lit(4L)) === 2),
        docs.filter(pmod(col("doc_id"), lit(4L)) === 3))
      .zipWithIndex.foreach { case (b, i) =>
        driftMonitorSink(base.toString)(b, i.toLong)
      }
    val psiRoot = new java.io.File(base, "psi")
    val dirs = Option(psiRoot.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith("batch=")).map(_.toString).sorted
    if (dirs.isEmpty)
      s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(
          "batch_id BIGINT, bucket BIGINT, n_ref BIGINT, n_obs BIGINT, " +
            "share_ref DOUBLE, share_obs DOUBLE, psi DOUBLE"))
    else s.read.option("basePath", psiRoot.toString).parquet(dirs: _*)
      .select("batch_id", "bucket", "n_ref", "n_obs",
        "share_ref", "share_obs", "psi")
      .orderBy("batch_id", "bucket")
  }

  /** The s25 monitored features: name → integral expression over a
    * documents-shaped batch. Integral on purpose — the frozen bins are
    * the f17 closed-form integer `div`, exact in both engines; a new
    * feature is one more row here (the monitor is (feature, bin)-grain
    * everywhere downstream). Shared with the oracle, term for term. */
  private[graft] val DriftFeatures: Seq[(String, org.apache.spark.sql.Column)] = Seq(
    "len" -> length(col("text")).cast("long"),
    "words" -> size(split(col("text"), " ")).cast("long"))

  /** s25 — MULTI-FEATURE streaming drift monitor: s24's frozen-
    * reference PSI lifted from one hard-coded feature (text length) to
    * a (feature, bin)-grain model table — the shape a real ingest gate
    * runs, where drift in ANY monitored feature (length, token count,
    * …) must fire. p05's PSI arithmetic is per-term and therefore
    * feature-agnostic; the lift is purely a grain change:
    *
    *  - the FIRST batch freezes, PER FEATURE, the 10 integral bins
    *    (per-feature extrema, the f17 closed-form `div`) and the
    *    reference histogram — a (feature, bucket, n_ref, lo, rng)
    *    model table, |features|×10 rows, KB at any corpus scale,
    *    whole-table promote with the s24 marker discipline verbatim;
    *  - every later batch scans ITSELF once (each row emits one
    *    (feature, x) pair per monitored feature — a width-|features|
    *    explode in the scan, no extra pass), clamps into the frozen
    *    edge bins, and emits per-(feature, bucket) PSI terms against
    *    the broadcast reference.
    *
    * Scale: per batch one self-scan + a |features|·10-row broadcast —
    * nothing corpus-sized, nothing history-keyed (the s24 posture,
    * unchanged by the extra grain). Crash/redelivery discipline is
    * s24's verbatim: `_applied` markers, `_batch_<id>` on the frozen
    * ref (a redelivered reference batch no-ops), psi rows a pure
    * function of (frozen ref, batch) so re-writes are identical. */
  def driftMultiSink(base: String)(batch: DataFrame, batchId: Long): Unit = {
    val marker = new java.io.File(s"$base/_applied/$batchId")
    if (marker.exists()) return // redelivered batch: effectively once
    val s = batch.sparkSession
    import s.implicits._
    val nBins = 10L
    val refDir = new java.io.File(s"$base/ref")
    val feats = batch.select(explode(array(DriftFeatures.map { case (n, c) =>
        struct(lit(n).as("feature"), c.as("x")) }: _*)).as("f"))
      .select(col("f.feature").as("feature"), col("f.x").as("x"))
    if (!new java.io.File(refDir, "_ready").exists) {
      // BATCH 0 = the reference snapshot BY CONTRACT (the s24 rule —
      // see driftMonitorSink: a later batch must never inherit the
      // reference role; an empty reference corpus freezes nothing and
      // the monitor emits nothing, matching the oracle's empty slice)
      val gr = feats.groupBy("feature").agg(min(col("x")).as("lo"),
        greatest(max(col("x")) - min(col("x")) + 1, lit(1L)).as("rng"))
      val grEmpty = batchId == 0L && gr.isEmpty
      if (grEmpty) emptyReferenceSignal(base, "driftMultiSink")
      if (batchId == 0L && !grEmpty) {
        val spine = DriftFeatures.map(_._1).toDF("feature")
          .crossJoin(s.range(nBins).select(col("id").as("bucket")))
        val counts = feats.join(gr, "feature")
          .withColumn("bucket",
            least(lit(nBins - 1), expr(s"(x - lo) * $nBins div rng")))
          .groupBy("feature", "bucket").agg(count(lit(1)).as("n_ref"))
        val hist = spine
          .join(counts, Seq("feature", "bucket"), "left")
          .join(gr, "feature")
          .select(col("feature"), col("bucket"),
            coalesce(col("n_ref"), lit(0L)).as("n_ref"),
            col("lo"), col("rng"))
        val staging = new java.io.File(s"$base/ref_staging")
        org.apache.commons.io.FileUtils.deleteQuietly(staging)
        hist.coalesce(1).write.parquet(staging.toString)
        // the s24 marker protocol verbatim: _ready gates the frozen
        // branch, _batch_<id> records which batch froze it
        markApplied(new java.io.File(staging, "_ready"))
        markApplied(new java.io.File(staging, s"_batch_$batchId"))
        org.apache.commons.io.FileUtils.deleteQuietly(refDir)
        java.nio.file.Files.move(staging.toPath, refDir.toPath,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      }
      markApplied(marker)
      return
    }
    if (new java.io.File(refDir, s"_batch_$batchId").exists) {
      // redelivered reference batch: the freeze already promoted
      markApplied(marker)
      return
    }
    // monitored batch: per-(feature, bucket) PSI vs the frozen model
    // table (|features|·10 rows + per-feature extrema — broadcast)
    val ref = s.read.parquet(refDir.toString)
    val tRef = ref.groupBy("feature")
      .agg(sum(col("n_ref")).as("t_ref"), first(col("lo")).as("lo"),
        first(col("rng")).as("rng"))
    val counts = feats.join(broadcast(tRef.select("feature", "lo", "rng")),
        "feature")
      .withColumn("bucket", greatest(lit(0L), least(lit(nBins - 1),
        expr(s"(x - lo) * $nBins div rng"))))
      .groupBy("feature", "bucket").agg(count(lit(1)).as("n_obs"))
    val tObs = feats.groupBy("feature").agg(count(lit(1)).as("t_obs"))
    if (!batch.isEmpty) {
      // one IEEE division of exact integers per share (the d38 rule);
      // ln canonicalized per term (the d34 contract)
      val pCol = (col("n_ref") + 1).cast("double") /
        (col("t_ref") + lit(nBins)).cast("double")
      val qCol = (col("n_obs") + 1).cast("double") /
        (col("t_obs") + lit(nBins)).cast("double")
      val rows = ref.select(col("feature"), col("bucket"), col("n_ref"))
        .join(counts, Seq("feature", "bucket"), "left")
        .join(broadcast(tRef.select("feature", "t_ref")), "feature")
        .join(broadcast(tObs), "feature")
        .select(lit(batchId).as("batch_id"), col("feature"), col("bucket"),
          col("n_ref"), coalesce(col("n_obs"), lit(0L)).as("n_obs"),
          col("t_ref"), col("t_obs"))
        .select(col("batch_id"), col("feature"), col("bucket"),
          col("n_ref"), col("n_obs"),
          graft.Canon.round4(pCol).as("share_ref"),
          graft.Canon.round4(qCol).as("share_obs"),
          graft.Canon.round4((pCol - qCol) *
            graft.Canon.dec(log(pCol / qCol)).cast("double")).as("psi"))
      rows.coalesce(1).write.mode("overwrite")
        .parquet(s"$base/psi/batch=$batchId")
    }
    markApplied(marker)
  }

  /** The s25 registry twin (the s24 feed shape at (feature, bin)
    * grain): reference = the `doc_id % 4 < 2` snapshot, monitored =
    * the %4 = 2 / %4 = 3 snapshots; output = every monitored batch's
    * per-(feature, bucket) PSI rows re-read from DISK. */
  def driftMultiFeed(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val base = java.nio.file.Files.createTempDirectory("graft-driftm").toFile
    org.apache.commons.io.FileUtils.forceDeleteOnExit(base)
    Seq(docs.filter(pmod(col("doc_id"), lit(4L)) < 2),
        docs.filter(pmod(col("doc_id"), lit(4L)) === 2),
        docs.filter(pmod(col("doc_id"), lit(4L)) === 3))
      .zipWithIndex.foreach { case (b, i) =>
        driftMultiSink(base.toString)(b, i.toLong)
      }
    val psiRoot = new java.io.File(base, "psi")
    val dirs = Option(psiRoot.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith("batch=")).map(_.toString).sorted
    if (dirs.isEmpty)
      s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(
          "batch_id BIGINT, feature STRING, bucket BIGINT, n_ref BIGINT, " +
            "n_obs BIGINT, share_ref DOUBLE, share_obs DOUBLE, psi DOUBLE"))
    else s.read.option("basePath", psiRoot.toString).parquet(dirs: _*)
      .select("batch_id", "feature", "bucket", "n_ref", "n_obs",
        "share_ref", "share_obs", "psi")
      .orderBy("batch_id", "feature", "bucket")
  }

  /** Batch reference for the upsert sink's final state: the last event
    * per user by (ts, event_id). */
  def lastEventPerUser(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    events.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
  }
}
