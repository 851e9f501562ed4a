package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Event-time operators over the bounded `events` table: tumbling / sliding /
  * session windows and an as-of join. All are batch-mode forms of the same
  * constructs Structured Streaming uses (`window`, `session_window`), so the
  * logic lifts to `readStream` unchanged (see graft.streaming).
  *
  * Monetary/valued sums are accumulated as DECIMAL(18,2) and returned as
  * double: decimal addition is associative and order-independent, so results
  * are identical regardless of partitioning — a float sum would drift under
  * Spark's nondeterministic reduce order and could never hash-match an
  * oracle (or itself, across runs).
  */
object EventOps {

  /** Tumbling event-time windows: epoch-aligned buckets of `width`. */
  def tumbling(events: DataFrame, width: String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value")
      )
      .select(col("w.start").as("window_start"), col("event_type"), col("n_events"), col("sum_value"))

  /** Sliding windows (width, slide): each event lands in width/slide buckets. */
  def sliding(events: DataFrame, width: String = "1 hour", slide: String = "30 minutes"): DataFrame =
    events
      .groupBy(window(col("ts"), width, slide).as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("window_start"), col("n_events"))

  /** Session windows per user: sessions close after `gap` of inactivity.
    * Output keeps min/max event time rather than Spark's gap-padded window
    * end so the semantics are engine-independent.
    */
  def sessions(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end")
      )
      .select(col("user_id"), col("session_start"), col("session_end"), col("n_events"))

  /** As-of join: for every `purchase` event, the most recent `signup` event
    * of the same user at-or-before it.
    *
    * Implemented as the scalable union-and-scan idiom rather than an
    * inequality join: tag both sides, sort within user by time, and carry
    * the last signup forward with `last(ignoreNulls)`. One shuffle on
    * user_id, no range-join explosion — this is the plan you want when both
    * sides are 100 TB-scale (an inequality join would be O(n·m) per user).
    */
  def asofPurchaseSignup(events: DataFrame): DataFrame = {
    val tagged = events
      .filter(col("event_type").isin("purchase", "signup"))
      .select(
        col("event_id"),
        col("user_id"),
        col("ts"),
        col("event_type"),
        when(col("event_type") === "signup", col("ts")).as("signup_ts")
      )
    // signup sorts before purchase at identical ts (as-of is inclusive).
    val w = Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts"), when(col("event_type") === "signup", lit(0)).otherwise(lit(1)), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("last_signup_ts", last(col("signup_ts"), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("last_signup_ts"))
  }
}
