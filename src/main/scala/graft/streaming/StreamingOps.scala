package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import java.sql.Timestamp

/** Structured Streaming forms of the event-time operators. The reference is
  * strictly bounded (its generator loop, `dump_table.py:81-111`, is cursor
  * iteration, not a stream), so these are north-star extensions: the same
  * `window`/`session_window` logic as graft.operators.EventOps, lifted to
  * `readStream` with watermarks, plus a custom-state sessionizer via
  * `flatMapGroupsWithState` for semantics the built-ins can't express.
  *
  * Design for scale: state is keyed (user_id / window), so it partitions
  * across executors; the watermark bounds state size — without it an
  * unbounded-lateness stream would accumulate state forever.
  */
object StreamingOps {

  /** Watermarked sliding-window counts over a streaming events frame. */
  def windowedCounts(
      events: DataFrame,
      watermark: String = "10 minutes",
      width: String = "1 hour",
      slide: String = "30 minutes"
  ): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n_events"), col("sum_value"))

  /** Watermarked session windows (built-in session_window). */
  def sessionCounts(events: DataFrame, watermark: String = "10 minutes", gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"), col("n_events"))

  final case class Ev(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)
  final case class SessionState(start: Long, lastTs: Long, n: Long)
  final case class SessionOut(user_id: Long, session_start: Timestamp, n_events: Long)

  /** Custom stateful sessionizer: emits a session row when the gap elapses
    * (processing-time timeout drives emission between batches). Demonstrates
    * the KeyValueGroupedDataset.flatMapGroupsWithState extension point for
    * state machines the declarative API can't express.
    */
  def sessionize(events: Dataset[Ev], gapMs: Long = 30 * 60 * 1000L): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(),
        GroupStateTimeout.ProcessingTimeTimeout
      ) { (user: Long, rows: Iterator[Ev], state: GroupState[SessionState]) =>
        val sorted = rows.toSeq.sortBy(_.ts.getTime)
        var cur = state.getOption
        val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
        sorted.foreach { ev =>
          val t = ev.ts.getTime
          cur match {
            case Some(s) if t - s.lastTs <= gapMs =>
              cur = Some(s.copy(lastTs = t, n = s.n + 1))
            case Some(s) =>
              out += SessionOut(user, new Timestamp(s.start), s.n)
              cur = Some(SessionState(t, t, 1))
            case None =>
              cur = Some(SessionState(t, t, 1))
          }
        }
        cur match {
          case Some(s) => state.update(s); state.setTimeoutDuration(gapMs)
          case None => ()
        }
        out.iterator
      }
  }

  /** Run a streaming frame to completion against bounded input via the
    * memory sink (used by tests; production would writeStream to parquet/
    * kafka with a real trigger).
    */
  def runToMemory(spark: SparkSession, df: DataFrame, name: String, mode: String = "append"): DataFrame = {
    val q = df.writeStream.outputMode(mode).format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }
}
