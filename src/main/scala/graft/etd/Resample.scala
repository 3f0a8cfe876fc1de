package graft.etd

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import Model._

/** Time-bucket resampling with per-interval min_count gates and
  * empty-bucket densification (SURVEY §2.4 A8, §7.4.1 — the hardest
  * semantic trap in the port).
  *
  * Reference: resample_by_columns + resample_{sum,max,avg} at
  * /root/reference/etdtransform/aggregate.py:800-1041. pandas
  * `groupby().resample(interval)` DENSIFIES: it emits every interval bucket
  * between each group's min and max timestamp, including empty ones (the
  * skeleton is built explicitly via `.resample().size()` at
  * aggregate.py:843-852); empty buckets then fall below min_count and get
  * NA. Spark's groupBy(window(...)) emits only non-empty buckets, so the
  * bucket spine is generated per group with sequence()+explode and the
  * aggregates are left-joined onto it.
  *
  * Scale notes: the spine generation is one row per (group, bucket) — the
  * same cardinality as the output — and the join key (group, bucket) is
  * exactly the aggregation key, so AQE plans a single co-partitioned
  * sort-merge join with no extra shuffle beyond the groupBy's own. All
  * variables aggregate in ONE groupBy pass (the reference loops per
  * variable and outer-joins each result — J6 — which at 169 columns would
  * be 169 shuffles; here it is one).
  */
object Resample {

  /** Floor a timestamp to its interval bucket start — exact integer µs
    * arithmetic (a double roundtrip could mis-bucket values within one ulp
    * of a boundary).
    */
  def bucket(ts: Column, interval: String): Column = {
    val us = lit(intervalSeconds(interval) * 1000000L)
    timestamp_micros(unix_micros(ts) - pmod(unix_micros(ts), us))
  }

  def intervalSeconds(interval: String): Long = interval match {
    case "5min" => 300L
    case "15min" => 900L
    case "60min" => 3600L
    case "6h" => 21600L
    case "24h" => 86400L
    case other => throw new IllegalArgumentException(s"Unknown interval $other")
  }

  /** The densified bucket spine: for each group, every interval bucket from
    * its min to its max observed bucket (aggregate.py:843-852's
    * `.resample().size()` skeleton).
    */
  def bucketSpine(df: DataFrame, groupCols: Seq[String],
                  interval: String): DataFrame = {
    val secs = intervalSeconds(interval)
    val b = bucket(col(ReadingDate), interval).cast("long")
    df.groupBy(groupCols.map(col): _*)
      .agg(min(b).as("__min_b"), max(b).as("__max_b"))
      .select(
        groupCols.map(col) :+
          explode(sequence(col("__min_b"), col("__max_b"), lit(secs)))
            .as("__bucket"): _*)
      .withColumn(ReadingDate, timestamp_seconds(col("__bucket")))
      .drop("__bucket")
  }

  /** Resample one or more variables to `interval` with the reference's
    * min_count gate (aggregate.py:830-841: 3/12/72/288 source rows for
    * 15min/60min/6h/24h). `variables` maps column name -> method
    * ("sum" | "max" | "avg").
    */
  def resample(df: DataFrame, variables: Seq[(String, String)],
               interval: String,
               groupCols: Seq[String] = Seq(ProjectId, HouseId),
               minCountOverride: Option[Int] = None): DataFrame = {
    val minCount = lit(minCountOverride.getOrElse(intervalMinCount(interval)))
    val aggs = variables.map { case (v, method) =>
      val gated = method match {
        case "sum" => Aggregates.sumMinCount(col(v), minCount)
        case "max" => Aggregates.maxMinCount(col(v), minCount)
        case "avg" => Aggregates.avgMinCount(col(v), minCount)
        case "avg_stable" => Aggregates.avgMinCountStable(col(v), minCount)
        case other => throw new IllegalArgumentException(s"Unknown method $other")
      }
      gated.as(v)
    }
    val bucketed = df
      .withColumn(ReadingDate, bucket(col(ReadingDate), interval))
      .groupBy((groupCols :+ ReadingDate).map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    bucketSpine(df, groupCols, interval)
      .join(bucketed, groupCols :+ ReadingDate, "left")
  }

  /** Resample every standard aggregation variable present in the frame
    * (resample_by_columns, aggregate.py:800-866).
    */
  def resampleStandard(df: DataFrame, interval: String,
                       groupCols: Seq[String] = Seq(ProjectId, HouseId)): DataFrame = {
    val present = df.columns.toSet
    val vars = aggregationVariables.collect {
      case (v, resampleMethod, _) if present(v) => (v, resampleMethod)
    }
    resample(df, vars, interval, groupCols)
  }
}
