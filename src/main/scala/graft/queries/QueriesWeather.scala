package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkEntry.table
import graft.etd.{Model, Weather}
import graft.etd.Model.{ProjectId, ReadingDate}

/** Weather-path coverage (SURVEY §2.5 W1-W4, W12-W14; §2.3 J2/J3/J9):
  * events reshaped into an hourly-weather-like frame — station =
  * user_id % 10, temperature = value (negative values welcome) — run
  * through graft.etd.Weather, with DuckDB oracles.
  */
object QueriesWeather {

  /** Weather-shaped frame: one observation per (stn, t_us, event_id). */
  def wx(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")
      .withColumn("t_us", expr("ts div 1000"))
      .withColumn("stn", pmod(col("user_id"), lit(10L)))
      .withColumn("temp", when(col("event_type") =!= "error", col("value")))
      .withColumn("day", expr("t_us div 86400000000"))
      .withColumn("week", expr("t_us div 604800000000"))

  private val wxSql =
    """WITH wx AS (
      |  SELECT *, epoch_ns(ts)//1000 AS t_us, user_id % 10 AS stn,
      |    CASE WHEN event_type <> 'error' THEN value END AS temp,
      |    (epoch_ns(ts)//1000)//86400000000 AS day,
      |    (epoch_ns(ts)//1000)//604800000000 AS week
      |  FROM events
      |)""".stripMargin

  /** Daily per-station averages with a ReadingDate timestamp (the grain
    * the period-marking operators run on).
    */
  def daily(spark: SparkSession, dir: String): DataFrame =
    wx(spark, dir)
      .groupBy(col("stn"), col("day"))
      .agg(graft.etd.Aggregates.exactMean(col("temp")).as("t"))
      .withColumn(ReadingDate, timestamp_seconds(col("day") * 86400))

  private val dailySql = wxSql +
    """, daily AS (
      |  SELECT stn, day,
      |    floor((sum(temp::DECIMAL(28,12))::DOUBLE / count(temp)) * 1000000 + 0.5) / 1000000 AS t
      |  FROM wx GROUP BY 1, 2
      |)""".stripMargin

  /** W1 — rolling mean over 24-row lookback, min_periods 12 (pandas
    * min_periods gates on non-null count in the frame).
    */
  def q_w1_rolling(spark: SparkSession, dir: String): DataFrame =
    wx(spark, dir)
      .withColumn("ra", round(Weather.rollingMean(col("temp"),
        Seq(col("stn")), Seq(col("t_us"), col("event_id")), 24, 12), 6))
      .select("event_id", "stn", "ra")

  /** W2 — group-broadcast weekly mean stamped on every observation. */
  def q_w2_group_mean(spark: SparkSession, dir: String): DataFrame =
    wx(spark, dir)
      .withColumn("wk_mean",
        round(Weather.groupMean(col("temp"), Seq(col("stn"), col("week"))), 6))
      .select("event_id", "stn", "week", "wk_mean")

  /** W3/W4/A9 — weekly summary, rank within station, 2-coldest flag. */
  def weeklyRanked(spark: SparkSession, dir: String): DataFrame = {
    val summary = wx(spark, dir)
      .groupBy(col("stn").as("STN"), col("week").as("week_of_year"))
      .agg(graft.etd.Aggregates.exactMean(col("temp")).as("wk_t"))
      .withColumn("year", lit(2024L))
    Weather.coldestWeekFlags(summary, "wk_t", "koudste2")
  }

  def q_w3w4_coldest_weeks(spark: SparkSession, dir: String): DataFrame =
    weeklyRanked(spark, dir)
      .select(col("STN").as("stn"), col("week_of_year").as("week"),
        col("wk_t"), col("rank_wk_t").cast("long").as("rnk"), col("koudste2"))

  /** J9 — weekly flags joined back onto the hourly observations. */
  def q_j9_weekly_joinback(spark: SparkSession, dir: String): DataFrame = {
    val flags = weeklyRanked(spark, dir)
      .select(col("STN"), col("year"), col("week_of_year"), col("koudste2"))
    val hourly = wx(spark, dir)
      .withColumn("STN", col("stn"))
      .withColumn("year", lit(2024L))
      .withColumn("week_of_year", col("week"))
    Weather.joinWeeklyFlags(hourly, flags)
      .select(col("event_id"), col("stn"), col("koudste2"))
  }

  /** W12 — mark every daily row within 3 days before the station's
    * coldest daily average (time-based, ties all mark).
    */
  def q_w12_mark_coldest(spark: SparkSession, dir: String): DataFrame =
    Weather.markPeriodBeforeExtreme(daily(spark, dir), "t",
        col(ReadingDate), Seq("stn"), days = 3, lowest = true, "coldest")
      .select(col("stn"), col("day"), col("coldest"))

  /** W13 — top-1 period extraction: (StartTime, EndTime, extreme). */
  def q_w13_extreme_period(spark: SparkSession, dir: String): DataFrame =
    Weather.extremeAvgPeriod(daily(spark, dir), "t", Seq("stn"),
        days = 3, highest = false)
      .select(col("stn"), col("StartTime").cast("long").as("start_s"),
        col("EndTime").cast("long").as("end_s"),
        col("LowestRollingAverage").as("extreme"))

  /** W14 — simultaneity ratio: max daily avg over max hourly avg. */
  def q_w14_simultaneity(spark: SparkSession, dir: String): DataFrame = {
    val hourly = wx(spark, dir)
      .groupBy(col("stn"), expr("t_us div 3600000000").as("hr"))
      .agg(graft.etd.Aggregates.exactMean(col("temp")).as("t"))
    Weather.simultaneityRatio(daily(spark, dir), hourly, "t", Seq("stn"))
      .select(col("stn"), col("HighestDailyAvg"), col("Highest5MinAvg"),
        round(col("Ratio"), 6).as("ratio"))
  }

  /** J2/J3 — station mapping + 3-key weather join with the reference's
    * HH = hour+1 / YYYYMMDD key derivation (load_data.py:301-315).
    */
  def q_j3_weather_join(spark: SparkSession, dir: String): DataFrame = {
    val rd = QueriesEtd.readings(spark, dir)
    val stationMap = rd.select(col(ProjectId)).distinct()
      .withColumn("STN", pmod(col(ProjectId), lit(3L)))
      .withColumn("Weerstation", concat(lit("S"), col("STN")))
    val weather = rd
      .withColumn("STN", pmod(col(ProjectId), lit(3L)))
      .withColumn("HH", hour(col(ReadingDate)) + 1)
      .withColumn("YYYYMMDD", date_format(col(ReadingDate), "yyyyMMdd").cast("int"))
      .groupBy("STN", "YYYYMMDD", "HH")
      .agg(graft.etd.Aggregates.exactMean(col("value")).as("wtemp"))
    Weather.joinWeather(rd, stationMap, weather)
      .select(col("event_id"), col("STN"), col("wtemp"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_w1_rolling" -> (q_w1_rolling _),
    "q_w2_group_mean" -> (q_w2_group_mean _),
    "q_w3w4_coldest_weeks" -> (q_w3w4_coldest_weeks _),
    "q_j9_weekly_joinback" -> (q_j9_weekly_joinback _),
    "q_w12_mark_coldest" -> (q_w12_mark_coldest _),
    "q_w13_extreme_period" -> (q_w13_extreme_period _),
    "q_w14_simultaneity" -> (q_w14_simultaneity _),
    "q_j3_weather_join" -> (q_j3_weather_join _),
  )

  private val weeklySql = wxSql +
    """, weekly AS (
      |  SELECT stn, week,
      |    floor((sum(temp::DECIMAL(28,12))::DOUBLE / count(temp)) * 1000000 + 0.5) / 1000000 AS wk_t
      |  FROM wx GROUP BY 1, 2
      |), ranked AS (
      |  SELECT *, rank() OVER w AS rnk, row_number() OVER w <= 2 AS koudste2
      |  FROM weekly WINDOW w AS (PARTITION BY stn ORDER BY wk_t)
      |)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_w1_rolling" -> (wxSql +
      """ SELECT event_id, stn,
        |  CASE WHEN count(temp) OVER w >= 12 THEN round(avg(temp) OVER w, 6) END AS ra
        |FROM wx WINDOW w AS (PARTITION BY stn ORDER BY t_us, event_id
        |  ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)""".stripMargin),
    "q_w2_group_mean" -> (wxSql +
      """ SELECT event_id, stn, week,
        |  round(avg(temp) OVER (PARTITION BY stn, week), 6) AS wk_mean
        |FROM wx""".stripMargin),
    "q_w3w4_coldest_weeks" -> (weeklySql +
      " SELECT stn, week, wk_t, rnk::BIGINT AS rnk, koudste2 FROM ranked"),
    "q_j9_weekly_joinback" -> (weeklySql +
      """ SELECT wx.event_id, wx.stn, r.koudste2
        |FROM wx LEFT JOIN ranked r ON wx.stn = r.stn AND wx.week = r.week""".stripMargin),
    "q_w12_mark_coldest" -> (dailySql +
      """, ext AS (
        |  SELECT stn, day AS eday FROM (
        |    SELECT stn, day, t, min(t) OVER (PARTITION BY stn) AS mn FROM daily)
        |  WHERE t = mn
        |)
        |SELECT d.stn, d.day,
        |  coalesce(bool_or(d.day > e.eday - 3 AND d.day <= e.eday), false) AS coldest
        |FROM daily d LEFT JOIN ext e ON d.stn = e.stn
        |GROUP BY d.stn, d.day""".stripMargin),
    "q_w13_extreme_period" -> (dailySql +
      """, rk AS (
        |  SELECT *, rank() OVER (PARTITION BY stn ORDER BY t ASC) AS r FROM daily
        |  WHERE t IS NOT NULL
        |)
        |SELECT stn, day*86400 - 3*86400 AS start_s, day*86400 AS end_s,
        |  t AS extreme
        |FROM rk WHERE r = 1""".stripMargin),
    "q_w14_simultaneity" -> (dailySql +
      """, hourly AS (
        |  SELECT stn, t_us//3600000000 AS hr,
        |    floor((sum(temp::DECIMAL(28,12))::DOUBLE / count(temp)) * 1000000 + 0.5) / 1000000 AS t
        |  FROM wx GROUP BY 1, 2
        |), d AS (SELECT stn, max(t) AS hd FROM daily GROUP BY 1),
        |h AS (SELECT stn, max(t) AS hm FROM hourly GROUP BY 1)
        |SELECT d.stn, d.hd AS HighestDailyAvg, h.hm AS Highest5MinAvg,
        |  round(CASE WHEN h.hm <> 0 THEN d.hd/h.hm END, 6) AS ratio
        |FROM d JOIN h ON d.stn = h.stn""".stripMargin),
    "q_j3_weather_join" -> (QueriesEtd.shimSql +
      """, keyed AS (
        |  SELECT event_id, value, project % 3 AS STN,
        |    hour(make_timestamp(t_us)) + 1 AS HH,
        |    strftime(make_timestamp(t_us), '%Y%m%d')::INT AS YYYYMMDD
        |  FROM r
        |), wth AS (
        |  SELECT STN, YYYYMMDD, HH,
        |    floor((sum(value::DECIMAL(28,12))::DOUBLE / count(value)) * 1000000 + 0.5) / 1000000 AS wtemp
        |  FROM keyed GROUP BY 1, 2, 3
        |)
        |SELECT k.event_id, k.STN, wth.wtemp
        |FROM keyed k LEFT JOIN wth ON k.STN = wth.STN
        |  AND k.YYYYMMDD = wth.YYYYMMDD AND k.HH = wth.HH""".stripMargin),
  )
}
