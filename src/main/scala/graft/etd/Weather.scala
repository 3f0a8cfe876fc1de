package graft.etd

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Weather-path operators (SURVEY §2.5 W1-W4, W12-W14; §2.3 J2/J3/J9).
  *
  * Reference: get_weather_data_table at
  * /root/reference/etdtransform/load_data.py:103-246 (rolling 14-day
  * averages, ISO-week means, coldest-week ranking and join-back), the
  * generic rolling/period helpers at
  * /root/reference/etdtransform/calculated_columns.py:148-527, and the
  * KNMI derived measures at /root/reference/etdtransform/knmi.py:77-98.
  *
  * The reference's groupby-apply/iloc-slicing style becomes window specs +
  * joins: period marking is time-based (timestamps between [extreme - days,
  * extreme]) rather than positional row slicing — more robust than the
  * reference's iloc arithmetic (SURVEY W12 note) and shuffle-free beyond
  * the one per-station sort.
  */
object Weather {

  /** Derived KNMI measures (knmi.py:77-98): unit conversions plus the
    * vapor-pressure ("Dampdruk") and feels-like ("Gevoelstemperatuur")
    * formulas. Expects raw KNMI columns T, FH, U.
    */
  def withDerivedMeasures(df: DataFrame): DataFrame = {
    val humidityCoefficient = 0.33
    val windSpeedAdjustment = 4.00
    val vaporPressureConstant = 17.27
    val windSpeedCoefficient = 0.7
    df
      .withColumn("Temperatuur", col("T") / 10)
      .withColumn("Windsnelheid", col("FH") / 10)
      .withColumn("Vochtigheid", col("U"))
      .withColumn("Dampdruk",
        col("Vochtigheid") * 6.105
          * exp(col("Temperatuur") * vaporPressureConstant
              / (col("Temperatuur") + lit(237.7))) / 100)
      .withColumn("Gevoelstemperatuur",
        col("Temperatuur") + col("Dampdruk") * humidityCoefficient
          - col("Windsnelheid") * windSpeedCoefficient
          - windSpeedAdjustment)
  }

  /** W1 — rolling mean over a fixed row-count lookback with min_periods
    * (load_data.py:122-128: window 14d x 24h = 336 rows, min_periods 168;
    * generic form calculated_columns.py:148-205 with min_periods =
    * window/2). pandas min_periods gates on non-null count in the frame.
    */
  def rollingMean(c: Column, partitionBy: Seq[Column], orderBy: Seq[Column],
                  window: Int, minPeriods: Int): Column = {
    val w = Window.partitionBy(partitionBy: _*).orderBy(orderBy: _*)
      .rowsBetween(-(window - 1), Window.currentRow)
    when(count(c).over(w) >= minPeriods, avg(c).over(w))
  }

  /** W2 — group-broadcast mean (ISO-week mean stamped on hourly rows,
    * load_data.py:177-190).
    */
  def groupMean(c: Column, groupBy: Seq[Column]): Column =
    avg(c).over(Window.partitionBy(groupBy: _*))

  /** W3/W4 — rank weeks within (station, year) by mean temperature and flag
    * the coldest two (load_data.py:204-229: row_number() < 2 on a 0-based
    * row number = the 2 coldest ISO weeks).
    */
  def coldestWeekFlags(weeklySummary: DataFrame, tempCol: String,
                       flagName: String): DataFrame = {
    val w = Window.partitionBy("STN", "year").orderBy(col(tempCol))
    weeklySummary
      .withColumn("rank_" + tempCol, rank().over(w))
      .withColumn(flagName, row_number().over(w) <= 2)
  }

  /** W12 — mark every row within `days` before the group's rolling-average
    * extreme (mark_coldest_two_weeks / mark_highest_peak,
    * calculated_columns.py:429-527). Two phases: (1) group-broadcast
    * extreme of the rolling average, (2) flag rows whose timestamp lies in
    * (t_extreme - days, t_extreme] for ANY extreme row — ties all mark, as
    * in the reference loop. Time-based, not positional.
    */
  def markPeriodBeforeExtreme(df: DataFrame, avgVar: String, ts: Column,
                              groupCols: Seq[String], days: Int,
                              lowest: Boolean, flagName: String): DataFrame = {
    val grp = Window.partitionBy(groupCols.map(col): _*)
    val extreme = if (lowest) min(col(avgVar)).over(grp) else max(col(avgVar)).over(grp)
    val extremeTs = when(col(avgVar) === extreme, ts)
    // group-broadcast every extreme timestamp (usually one; ties collect)
    val extremes = collect_set(extremeTs).over(grp)
    df.withColumn(flagName,
      exists(extremes, t =>
        ts > t - expr(s"INTERVAL $days DAYS") && ts <= t) && size(extremes) > 0)
      .withColumn(flagName, coalesce(col(flagName), lit(false)))
  }

  /** W13 — top-1 period extraction: (StartTime, EndTime, extreme) per group
    * (get_highest_avg_period / get_lowest_avg_period,
    * calculated_columns.py:209-294, 340-425). rank()==1 keeps ties like the
    * reference's equality filter; StartTime = EndTime - days (time-based).
    */
  def extremeAvgPeriod(df: DataFrame, avgVar: String, groupCols: Seq[String],
                       days: Int, highest: Boolean): DataFrame = {
    // nulls explicitly last: Spark's plain asc sorts nulls FIRST, which
    // would hand rank 1 to a null rolling average and then drop the
    // station entirely at the isNotNull filter below.
    val ord = if (highest) col(avgVar).desc_nulls_last else col(avgVar).asc_nulls_last
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(ord)
    val label = if (highest) "HighestRollingAverage" else "LowestRollingAverage"
    df
      .withColumn("__r", rank().over(w))
      .filter(col("__r") === 1 && col(avgVar).isNotNull)
      .select(
        groupCols.map(col) ++ Seq(
          (col(Model.ReadingDate) - expr(s"INTERVAL $days DAYS")).as("StartTime"),
          col(Model.ReadingDate).as("EndTime"),
          col(avgVar).as(label)): _*)
  }

  /** W14 — simultaneity ratio ("gelijktijdigheid",
    * calculated_columns.py:297-337): max rolling average at the daily grain
    * over max at the 5-minute grain, per group.
    */
  def simultaneityRatio(daily: DataFrame, fiveMin: DataFrame, avgVar: String,
                        groupCols: Seq[String]): DataFrame = {
    val d = daily.groupBy(groupCols.map(col): _*)
      .agg(max(avgVar).as("HighestDailyAvg"))
    val m = fiveMin.groupBy(groupCols.map(col): _*)
      .agg(max(avgVar).as("Highest5MinAvg"))
    d.join(m, groupCols)
      .withColumn("Ratio",
        when(col("Highest5MinAvg") =!= 0.0,
          col("HighestDailyAvg") / col("Highest5MinAvg")))
  }

  /** J2 + J3 — stamp the weather station per project and join hourly
    * weather on (STN, YYYYMMDD, HH) with the reference's key derivation
    * HH = hour + 1, YYYYMMDD = yyyyMMdd int (load_data.py:301-315).
    * Both dimension sides are small -> broadcast.
    */
  def joinWeather(df: DataFrame, stationMap: DataFrame,
                  weather: DataFrame): DataFrame =
    df
      .join(broadcast(stationMap.select(Model.ProjectId, "Weerstation", "STN")),
        Seq(Model.ProjectId), "left")
      .withColumn("HH", hour(col(Model.ReadingDate)) + 1)
      .withColumn("YYYYMMDD",
        date_format(col(Model.ReadingDate), "yyyyMMdd").cast("int"))
      .join(broadcast(weather), Seq("STN", "YYYYMMDD", "HH"), "left")

  /** J9 — weekly summary flags joined back onto hourly rows
    * (load_data.py:241-243).
    */
  def joinWeeklyFlags(hourly: DataFrame, weeklyFlags: DataFrame): DataFrame =
    hourly.join(broadcast(weeklyFlags), Seq("STN", "year", "week_of_year"), "left")
}
