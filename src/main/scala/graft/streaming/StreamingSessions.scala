package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming sessionization: the batch `q_sessionize` shape
  * (per-user sessions cut at inactivity gaps) as Spark's NATIVE
  * `session_window` aggregation — dynamic-gap session state merged by
  * the engine, closed and emitted once the watermark passes the
  * session's end. This is the built-in the brief's "Structured
  * Streaming for streams" guidance points at; no custom state op is
  * needed.
  *
  * Batch/stream boundary convention: both sides keep an event at
  * EXACTLY gap distance in the SAME session — the batch cut starts a
  * new session only on `t - prev &gt; gap`, and `session_window` merges
  * inclusively at `prev + gap` (StreamingSessionsSpec pins the
  * boundary case as well as the off-boundary parity), so the two
  * paths agree everywhere.
  *
  * Scale: state is one merging session buffer per (user, open
  * session) inside the watermark horizon — the engine compacts
  * overlapping windows per key; shuffle is the same hash partitioning
  * on user_id the batch groupBy uses.
  */
object StreamingSessions {

  /** Per-session rollup of an event stream (`ts` must be a timestamp
    * column): one row per CLOSED session — (user_id, t_start, t_end =
    * last event + gap, n_events, sum_value round6).
    */
  def sessionStats(events: DataFrame, gap: String = "30 minutes",
                   lateness: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"),
        round(sum("value"), 6).as("sum_value"))
      .select(col("user_id"),
        col("w.start").as("t_start"), col("w.end").as("t_end"),
        col("n_events"), col("sum_value"))
}
