package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-handling utilities for the 100 TB contract.
  *
  * AQE's skew-join split (spark.sql.adaptive.skewJoin) is the first
  * choice — it needs no code change and both bench/verify sessions enable
  * AQE. These helpers cover the cases AQE cannot: skewed AGGREGATIONS
  * (two-phase salted groupBy) and sort-merge joins whose build side is
  * small enough to replicate but too big to broadcast.
  */
object Skew {

  /** Content-derived row salt: xxhash64 over `saltBy` (every column when
    * empty), mod `salt`. Unlike monotonically_increasing_id this is a
    * pure function of the row — identical across task retries and
    * repartitionings (a retried salted stage reproduces the same
    * partials). Full-row duplicates share a salt — if a hot key's rows
    * can be byte-identical (deduplicated heartbeats, projected
    * low-cardinality frames), pass a unique discriminator column as
    * `saltBy` (an event id, a source offset) or the hot key collapses
    * back into one bucket and the mitigation silently disappears.
    */
  private def rowSalt(df: DataFrame, salt: Int,
                      saltBy: Seq[String] = Nil) = {
    val cols = if (saltBy.nonEmpty) saltBy else df.columns.toIndexedSeq
    pmod(xxhash64(cols.map(col): _*), lit(salt.toLong))
  }

  /** Salted equi-join: the big side gets a deterministic row salt, the
    * small side is replicated `salt` ways, and the join key becomes
    * (keys :+ __salt) — one hot key's rows spread over `salt` tasks
    * instead of one straggler. Row-for-row equivalent to
    * `big.join(small, keys, joinType)`.
    *
    * Use when `small` is above the broadcast threshold but per-executor
    * replication x salt is still cheap (dimension tables in the GB range).
    * joinType is restricted to types where replicating the right side is
    * correct per-row for left rows (inner / left_outer / left_semi needs
    * no dedup because each left row carries exactly ONE salt value and
    * meets exactly one replica).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 salt: Int, joinType: String = "inner",
                 saltBy: Seq[String] = Nil): DataFrame = {
    require(Seq("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi")
      .contains(joinType.toLowerCase(java.util.Locale.ROOT)),
      s"saltedJoin does not support $joinType")
    val bigS = big.withColumn("__salt", rowSalt(big, salt, saltBy))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(salt.toLong - 1))))
    bigS.join(smallS, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Two-phase salted aggregation for skewed group keys: partial
    * aggregates on (keys, salt) spread one hot group over `salt` reducers,
    * then a second (tiny) aggregation merges the partials. `aggs` maps
    * output column -> ("sum" | "count" | "max" | "min") over the input
    * column of the same name. (Spark's hash aggregate already does
    * map-side partial combine; explicit salting matters when the
    * REDUCE side of one key exceeds a single task — e.g. high-cardinality
    * distinct-ish payloads where partial buffers keep spilling.)
    */
  def saltedAggregate(df: DataFrame, keys: Seq[String],
                      aggs: Seq[(String, String)], salt: Int,
                      saltBy: Seq[String] = Nil): DataFrame = {
    def phase1(v: String, m: String) = m match {
      case "sum" => sum(col(v)).as(v)
      case "count" => count(col(v)).as(v)
      case "max" => max(col(v)).as(v)
      case "min" => min(col(v)).as(v)
      case other => throw new IllegalArgumentException(s"Unknown method $other")
    }
    // counts merge by SUM in phase 2; everything else by its own op
    def phase2(v: String, m: String) = m match {
      case "sum" | "count" => sum(col(v)).as(v)
      case "max" => max(col(v)).as(v)
      case "min" => min(col(v)).as(v)
      case other => throw new IllegalArgumentException(s"Unknown method $other")
    }
    val salted = df.withColumn("__salt", rowSalt(df, salt, saltBy))
    val p1 = salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(phase1(aggs.head._1, aggs.head._2),
        aggs.tail.map { case (v, m) => phase1(v, m) }: _*)
    p1.groupBy(keys.map(col): _*)
      .agg(phase2(aggs.head._1, aggs.head._2),
        aggs.tail.map { case (v, m) => phase2(v, m) }: _*)
  }
}
