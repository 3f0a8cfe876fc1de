package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.etd.Model.ImputeType

/** Streaming imputation of cumulative-meter gaps — the arbitrary-stateful
  * twin of the batch cascade's known-gap-jump branches (I7,
  * /root/reference/etdtransform/vectorized_impute.py:630-756, re-expressed
  * over per-house state instead of window functions).
  *
  * Semantics: readings arrive on the 5-minute ETD grain with a
  * possibly-null cumulative value (null = the meter didn't report — the
  * NA gap the batch pipeline imputes). A gap CLOSES when the next
  * non-null cumulative arrives; at that moment the gap jump
  * (end - previous cumulative) is known and every row of the gap —
  * including the closing row, whose lag-diff is equally unknowable,
  * exactly as in the batch diff definition — is emitted with the
  * cascade's fill:
  *   - jump < 0      -> 0.0, NEGATIVE_GAP_JUMP
  *   - jump ~ 0      -> 0.0, NEAR_ZERO_GAP_JUMP
  *   - jump >= 1e-8  -> round(jump / gapLength, 10), LINEAR_FILL
  * Rows before a house's first observed cumulative have no defined diff
  * and are emitted unimputed (the batch no-start branch leaves them NA
  * too). The avg-diff-scaled branches (SCALED_FILL etc.) need the
  * corpus-wide average table — a batch artifact; a production topology
  * broadcasts yesterday's averages as a static join upstream and this
  * operator stays unchanged.
  *
  * Open gaps (stream tail) are NOT imputed — a stream cannot know the
  * jump until the gap closes; the batch backfill owns the tail, and
  * because both paths share the same fill arithmetic the hand-off is
  * seamless (StreamingImputeSpec pins streaming == batch on closed gaps).
  *
  * Scale: state per house is one (timestamp, cumulative) pair plus the
  * open gap's timestamps — bounded by the longest real gap, a few hundred
  * longs worst-case; the shuffle is the same house-hash partitioning the
  * batch impute uses. NoTimeout by design: state is overwritten in place
  * and never grows with stream length. (ProcessingTimeTimeout is also a
  * planner landmine on Spark 4.1.2.)
  *
  * Ordering: rows are processed in timestamp order within a micro-batch;
  * a row at or before the house's last processed timestamp is late beyond
  * the upstream watermark and is dropped (counted nowhere — feed the
  * stream through a watermark that matches the batch backfill horizon).
  */
object StreamingImpute {

  /** One meter reading; `cum` null while the meter is dark. */
  case class CumReading(huis: Long, tsSec: Long, cum: Option[Double])

  /** Per-house state: last processed slot, last OBSERVED cumulative, and
    * the open gap's slot timestamps (newest first).
    */
  case class HouseState(lastTs: Long, lastCum: Option[Double],
                        pending: List[Long])

  /** Emitted diff row; `imputeType` is the batch bit-flag, null when the
    * value is observed (or unknowable: pre-first-observation rows).
    */
  case class ImputedDiff(huis: Long, tsSec: Long, diff: Option[Double],
                         imputeType: Option[Int], isImputed: Boolean)

  /** Spark round(x, 10) semantics: HALF_UP over the shortest decimal
    * representation — keeps streaming fills bit-identical to the batch
    * cascade's round(jump/gapLength, 10).
    */
  private def round10(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(10, java.math.RoundingMode.HALF_UP).doubleValue()

  def imputeStream(readings: Dataset[CumReading]): Dataset[ImputedDiff] = {
    implicit val outEnc = Encoders.product[ImputedDiff]
    implicit val stateEnc = Encoders.product[HouseState]
    implicit val keyEnc = Encoders.scalaLong
    readings
      .groupByKey(_.huis)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (huis: Long, rows: Iterator[CumReading], state: GroupState[HouseState]) =>
          var st = state.getOption.getOrElse(
            HouseState(Long.MinValue, None, Nil))
          val out = Seq.newBuilder[ImputedDiff]
          rows.toSeq.sortBy(_.tsSec).foreach { r =>
            if (r.tsSec > st.lastTs) r.cum match {
              case None =>
                st = st.copy(lastTs = r.tsSec, pending = r.tsSec :: st.pending)
              case Some(c) =>
                st.lastCum match {
                  case None =>
                    // no prior observation: gap has no start — diffs stay
                    // NA, matching the batch no-start-no-end branch
                    st.pending.reverse.foreach(ts =>
                      out += ImputedDiff(huis, ts, None, None, isImputed = false))
                    out += ImputedDiff(huis, r.tsSec, None, None, isImputed = false)
                  case Some(prev) =>
                    val jump = c - prev
                    if (st.pending.isEmpty) {
                      // uninterrupted: plain observed diff
                      out += ImputedDiff(huis, r.tsSec, Some(jump), None,
                        isImputed = false)
                    } else {
                      // closed gap: pending rows + closing row all carry
                      // the cascade fill (gap_length = pending + 1)
                      val n = st.pending.size + 1
                      val (fill, tpe) =
                        if (jump < 0) (0.0, ImputeType.NegativeGapJump)
                        else if (jump < 1e-8) (0.0, ImputeType.NearZeroGapJump)
                        else (round10(jump / n), ImputeType.LinearFill)
                      (st.pending.reverse :+ r.tsSec).foreach(ts =>
                        out += ImputedDiff(huis, ts, Some(fill), Some(tpe),
                          isImputed = true))
                    }
                }
                st = HouseState(r.tsSec, Some(c), Nil)
            }
          }
          if (st.lastTs > Long.MinValue) state.update(st)
          out.result().iterator
      }
  }
}
