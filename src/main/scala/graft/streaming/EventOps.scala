package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-stream operators. The reference is batch-only (SURVEY §2.9),
  * so this layer is extension work: the same declarative plans run
  * under Structured Streaming (`readStream` → transform →
  * `writeStream`) or in batch — windowedCounts is written once and
  * used both ways; sessionize is the stateful-streaming variant with
  * a batch-equivalent formulation for oracle checks.
  */
object EventOps {
  /** Tumbling event-time window aggregation, shared batch/streaming.
    * In streaming, pair with `withWatermark("ts", ...)` upstream (done
    * in [[streamingWindowedCounts]]) so state is bounded and late data
    * beyond the watermark is dropped. */
  def windowedCounts(events: DataFrame, win: String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts"), win).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("value_cents"))

  /** Streaming entry: watermarked tumbling-window counts. */
  def streamingWindowedCounts(events: DataFrame, win: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    windowedCounts(events.withWatermark("ts", watermark), win)

  /** Stream-static enrichment: LEFT join the stream against a
    * catalog-sized dimension, broadcast. The canonical streaming
    * pattern for attaching dim attributes: stateless (no watermark
    * needed), and the broadcast keeps every micro-batch shuffle-free
    * on the stream side — at cluster scale a shuffling enrichment
    * join would put an exchange in every trigger's critical path.
    * Works identically in batch (same plan either way). */
  def enrichWithDim(events: DataFrame, dim: DataFrame,
      key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** Batch sessionization: a session breaks after `gapMinutes` of user
    * inactivity. Pure window functions (lag → gap flag → running sum),
    * one shuffle on user_id — the batch-equivalent of the stateful
    * streaming form below, and oracle-checkable. */
  def sessionizeBatch(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    events
      .withColumn("__prev", lag(col("ts"), 1).over(byUser))
      .withColumn("__brk",
        when(col("__prev").isNull ||
          col("ts").cast("long") - col("__prev").cast("long") > gapMinutes * 60L, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum(col("__brk")).over(byUser))
      .groupBy("user_id", "session_seq")
      .agg(min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"))
  }

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)
  final case class SessionOut(user_id: Long, session_start: java.sql.Timestamp,
      n_events: Long)
  /** Public: Catalyst's generated encoder code must see the ctor. */
  final case class SessionState(start: Long, last: Long, n: Long)

  /** Stateful streaming sessionization via mapGroupsWithState: state
    * per user is O(1); a timeout (or a gap observed within a batch)
    * closes the session. Emits closed sessions only.
    *
    * `timeoutConf` defaults to ProcessingTimeTimeout for production
    * (idle users' sessions eventually close). Tests pass NoTimeout:
    * with timeouts registered, the zero-interval trigger runs no-data
    * micro-batches continuously to service timers, so
    * `processAllAvailable` never observes quiescence and blocks
    * forever. */
  def sessionizeStreaming(events: Dataset[Event], gapMinutes: Int = 30,
      timeoutConf: GroupStateTimeout = GroupStateTimeout.ProcessingTimeTimeout)
      : Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L
    val useTimeout = timeoutConf != GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, timeoutConf) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(s =>
              SessionOut(userId, new java.sql.Timestamp(s.start), s.n)).toSeq
            state.remove()
            out.iterator
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  cur = Some(s.copy(last = t, n = s.n + 1))
                case Some(s) =>
                  closed ::= SessionOut(userId, new java.sql.Timestamp(s.start), s.n)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              if (useTimeout) state.setTimeoutDuration(gapMs)
            }
            closed.reverseIterator
          }
      }
  }
}
