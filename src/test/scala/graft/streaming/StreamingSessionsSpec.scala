package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Native session_window sessionization: closed sessions match the
  * batch gap-cut rollup (t_end = last event + gap), and the exact-gap
  * boundary MERGES inclusively — the same `t - prev > gap` cut rule
  * the batch `q_sessionize` applies, pinned so the parity claim covers
  * the boundary too.
  */
class StreamingSessionsSpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  private def ts(min: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:$sec%02d")

  private def run(batches: Seq[Seq[(Long, Timestamp, Double)]],
                  name: String): Map[(Long, Long), (Long, Long, Double)] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val events = input.toDF().toDF("user_id", "ts", "value")
    val query = StreamingSessions.sessionStats(events,
        gap = "30 minutes", lateness = "0 seconds")
      .writeStream.format("memory").queryName(name).outputMode("append")
      .start()
    batches.foreach { b => input.addData(b: _*); query.processAllAvailable() }
    query.stop()
    spark.table(name)
      .select(col("user_id"), col("t_start").cast("long"),
        col("t_end").cast("long"), col("n_events"), col("sum_value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
  }

  test("closed sessions match the batch gap-cut rollup; end = last + gap") {
    // user 1: events at 00, 10, 20 (one session), then 60, 65 (second);
    // user 2: one event at 05. Sentinel events far out close everything.
    val out = run(Seq(
      Seq((1L, ts(0), 1.0), (1L, ts(10), 2.0), (2L, ts(5), 9.0)),
      Seq((1L, ts(20), 3.0), (1L, ts(60), 4.0), (1L, ts(65), 5.0)),
      Seq((1L, ts(300), 0.0), (2L, ts(300), 0.0))), "sess_basic")
    val t0 = ts(0).getTime / 1000
    // session 1: [00, 20+30); n=3; sum 6.0
    assert(out((1L, t0)) == ((t0 + 20 * 60 + 30 * 60, 3L, 6.0)))
    // session 2: [60, 65+30); n=2; sum 9.0
    assert(out((1L, t0 + 3600)) == ((t0 + 65 * 60 + 30 * 60, 2L, 9.0)))
    // user 2 single-event session
    assert(out((2L, t0 + 300)) == ((t0 + 5 * 60 + 30 * 60, 1L, 9.0)))
  }

  test("exact-gap event merges inclusively — same boundary rule as the batch cut") {
    val out = run(Seq(
      Seq((1L, ts(0), 1.0), (1L, ts(30), 2.0)), // exactly 30min apart
      Seq((1L, ts(300), 0.0))), "sess_boundary")
    val t0 = ts(0).getTime / 1000
    // one merged session [00, 30+30) with both events — matching the
    // batch convention (only t - prev > gap starts a new session)
    assert(out((1L, t0)) == ((t0 + 3600, 2L, 3.0)))
    assert(!out.contains((1L, t0 + 1800)))
  }
}
