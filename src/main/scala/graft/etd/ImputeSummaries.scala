package graft.etd

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

import Model._

/** Imputation gap statistics and summaries (SURVEY §2.9 I10, §2.4
  * A11-A15).
  *
  * Reference: calculate_imputation_gap_stats at
  * /root/reference/etdtransform/vectorized_impute.py:168-188 (a pandas
  * groupby-apply returning a Series — here a single multi-expression
  * groupBy, A13), methods_to_bitwise at vectorized_impute.py:18-55 (A15),
  * and the house/project summaries at
  * /root/reference/etdtransform/impute.py:662-761 (A11/A12/A14, J8).
  */
object ImputeSummaries {

  /** I10/A13 — per (project, house) stats for one column after imputation
    * (requires the gap columns kept via Impute.imputeColumn(keepGapCols =
    * true)). One aggregation pass replaces the reference's groupby-apply.
    */
  def gapStats(df: DataFrame, cum: String): DataFrame = {
    val diffC = diffCol(cum)
    val impTy = imputeTypeCol(cum)
    df.groupBy(col(ProjectId), col(HouseId))
      .agg(
        sum(diffC).as("diff_col_total"),
        (max(cum) - min(cum)).as("cum_col_min_max_diff"),
        (sum(diffC) - (max(cum) - min(cum))).as("deviation"),
        count(when(col("gap_length").isNotNull, 1)).as("missing"),
        // A12 input: distinct impute methods used, as a sorted array
        array_sort(collect_set(col(impTy))).as("methods"),
        count(col(impTy)).as("imputed"),
        (count(when(col("cumulative_value_group").isNotNull, 1))
          - count(col(impTy))).as("imputed_na"),
        // A15: methods -> bitmask. The reference folds 1 << (method-1) over
        // the method list; our method values are already the bit flags
        // (Model.ImputeType), THRESHOLD_ADJUSTED composites included, so
        // the fold is a bit_or over the per-row flag values.
        coalesce(bit_or(col(impTy)), lit(0)).cast("long").as("bitwise_methods"))
      .withColumn("column", lit(diffC))
  }

  /** Run gapStats for every column and union (impute.py:255-260's
    * per-column concat — J11).
    */
  def gapStatsAll(perColumn: Seq[DataFrame]): DataFrame =
    perColumn.reduce(_.unionByName(_))

  /** A14/J8 — house-level summary with total records and imputed
    * percentage (impute.py:672-699). The total-records side is a
    * per-house aggregate joined back (J8).
    */
  def householdSummary(gapStats: DataFrame, df: DataFrame): DataFrame = {
    val totals = df.groupBy(col(HouseId)).agg(count(lit(1)).as("total_records"))
    gapStats
      .join(totals, Seq(HouseId))
      .withColumn("percentage_imputed",
        col("imputed") / col("total_records") * 100)
  }

  /** A11/A12/A14 — project-level summary (impute.py:701-731): bit_or
    * reduce of bitmasks, set-union of method lists
    * (array_distinct(flatten(collect_list))), summed counts, then total
    * records joined and percentage derived.
    */
  def projectSummary(gapStats: DataFrame, df: DataFrame): DataFrame = {
    val totals = df.groupBy(col(ProjectId)).agg(count(lit(1)).as("total_records"))
    gapStats
      .groupBy(col(ProjectId), col("column"))
      .agg(
        bit_or(col("bitwise_methods")).as("bitwise_methods"),
        array_sort(array_distinct(flatten(collect_list(col("methods")))))
          .as("methods"),
        sum("missing").as("missing"),
        sum("imputed").as("imputed"),
        sum("imputed_na").as("imputed_na"))
      .join(totals, Seq(ProjectId))
      .withColumn("percentage_imputed",
        col("imputed") / col("total_records") * 100)
  }

  /** The >40%-imputed warning gate (impute.py:733-759) as data: rows that
    * would be warned about. Callers log/alert on the result.
    */
  def over40PctImputed(summary: DataFrame): DataFrame =
    summary.filter(col("percentage_imputed") > 40)
}
