package graft.etd

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Model._

/** Staged pipeline orchestration (SURVEY §3.1) and the analysis-loading
  * facade (SURVEY §3.2).
  *
  * Reference flow (README.md:157-297, enacted by
  * /root/reference/tests/test_total_imputation_workflow.py:24-152):
  * combine -> prepare diffs -> impute -> calculated -> resample
  * {5min,15min,60min,6h,24h} -> project aggregate. Each stage is a lazy
  * DataFrame -> DataFrame function; parquet writes between stages keep the
  * reference's restartability checkpoints, but *within* a stage Catalyst
  * pipelines everything (SURVEY §3.1 IR note).
  *
  * Scale: one repartition to (ProjectIdBSV, HuisIdBSV) ahead of the impute
  * stage serves all 13 columns' windows (exchange reuse); the project
  * aggregation reuses the project-hash partitioning; sinks partition by
  * project so downstream reads prune.
  */
object Pipeline {

  /** The pipeline's stage handles. Every stage is built (and therefore
    * ANALYZED by Catalyst) on first access, then memoized: a consumer that
    * executes only `projectAggregated("24h")` pays analysis for that one
    * lineage — not for 13 gap-stats branches and every interval it never
    * touches. (Analysis is eager at Dataset creation in Spark, so a
    * strict Stages container was charging every caller the full
    * all-stages analyzer bill up front.)
    */
  final class Stages private[Pipeline] (
      val intervals: Seq[String],
      imputedThunk: () => DataFrame,
      gapStatsThunk: () => DataFrame,
      calculatedThunk: () => DataFrame) {
    lazy val imputed: DataFrame = imputedThunk()
    lazy val gapStats: DataFrame = gapStatsThunk()
    lazy val calculated: DataFrame = calculatedThunk()
    lazy val householdSummary: DataFrame =
      ImputeSummaries.householdSummary(gapStats, imputed)
    lazy val projectSummary: DataFrame =
      ImputeSummaries.projectSummary(gapStats, imputed)

    private val resampledCache =
      scala.collection.concurrent.TrieMap.empty[String, DataFrame]
    /** A8 — the calculated frame resampled to `iv`. 5min resamples too
      * (the reference's resample_hh_data includes it): on-grid complete
      * input passes through value-identical, but off-grid timestamps
      * floor to their bucket and absent rows densify to NA fillers —
      * skipping it made the 60%-gate denominator of the 5min project
      * aggregation diverge from the reference wherever a row was missing.
      */
    def resampled(iv: String): DataFrame = {
      require(intervals.contains(iv), s"interval $iv not in $intervals")
      resampledCache.getOrElseUpdate(iv,
        Resample.resampleStandard(calculated, iv))
    }

    private val projectAggCache =
      scala.collection.concurrent.TrieMap.empty[String, DataFrame]
    /** A5-A7/J6/J7 — project aggregation of the `iv` resample. */
    def projectAggregated(iv: String): DataFrame =
      projectAggCache.getOrElseUpdate(iv,
        ProjectAggregate.aggregateStandard(resampled(iv)))
  }

  /** Run the full transformation pipeline lazily over a combined household
    * frame (cumulative meters + Diff columns present). Nothing executes —
    * or is even analyzed — until the caller touches a stage. The impute
    * stage is the BATCHED all-columns implementation
    * ([[Impute.imputeColumnsBatched]]), whose plan size is bounded
    * regardless of column count; set `localCheckpointEvery` to
    * additionally cut lineage after the impute stage (mirrors the
    * reference's staged materialization; at production scale prefer
    * durable checkpoints via [[Sources.writeStage]]).
    */
  /** `assumeColocated = true` declares the input already hash-partitioned
    * on (ProjectIdBSV, HuisIdBSV) — a bucketed table written with
    * [[Sources.writeBucketed]] on those keys. The pipeline then relies on
    * the storage co-location instead of shuffling the full readings: the
    * one full-table exchange the impute windows otherwise require
    * disappears from the plan (BucketingSpec asserts zero
    * house-partitioned exchanges remain; the only shuffles left touch
    * house- or project-grain aggregates). At 100 TB this turns every
    * pipeline run's largest exchange into a metadata no-op for the price
    * of one bucketed write.
    */
  def run(household: DataFrame,
          cumulativeCols: Seq[String] = cumulativeColumns,
          intervals: Seq[String] = Seq("5min", "15min", "60min", "6h", "24h"),
          localCheckpointEvery: Option[Int] = None,
          assumeColocated: Boolean = false)
      : Stages = {

    // One shuffle serves all per-house windows of every column below
    // (mirrors sort_for_impute, impute.py:415-441, as a physical hint);
    // a co-located input skips it and only sorts within partitions.
    // AQE's byte-based coalescing is deliberately left in charge of the
    // exchange's partition count after two r21 A/Bs on the
    // 16-physical-core bench box: pinning the full thread count (32)
    // doubled the cascade stage's CPU (115 -> 213 CPU-s, hyperthread
    // contention) at unchanged wall, and pinning a rows-derived 13
    // (vs AQE's coalesced 7) raised CPU 137 -> 198 with the wall flat
    // — the cascade's row churn is memory-bandwidth-bound, so extra
    // tasks burn cycles without buying wall. Bytes-per-partition is a
    // poor proxy for this stage's work, but the coalesced count beat
    // every pinned alternative on real hardware.
    lazy val sorted =
      if (assumeColocated)
        household.sortWithinPartitions(ProjectId, HouseId, ReadingDate)
      else household
        .repartition(col(ProjectId), col(HouseId))
        .sortWithinPartitions(ProjectId, HouseId, ReadingDate)

    // I3..I9 for ALL columns in batched stages (shared lag/cumsum/house
    // window nodes + one per-gap window node per column): byte-identical
    // to the per-column fold, but the plan is ~20 nodes instead of
    // |columns| x ~10 nested stages — at 13 columns that is the
    // difference between minutes and seconds of optimizer time.
    // `localCheckpointEvery` (kept for API compatibility) now means: cut
    // lineage once after the impute stage.
    lazy val imputedAll = {
      // I1/I2 — averages + bounds, then J4 join-back.
      val (avgDiffs, _) = Diffs.prepare(sorted, cumulativeCols)
      val withAvgs = Diffs.joinAverages(sorted, avgDiffs)
      val imputedAll0 = Impute.imputeColumnsBatched(withAvgs, cumulativeCols,
        keepGapCols = true)
      // lazy: materialize inside the first consumer's execution instead
      // of blocking at stage construction (r9 full13 lesson — an eager
      // checkpoint charges every build, even ones that never execute).
      // The cut's blocks belong to the caller: free them with
      // Checkpoints.free(<consumed stage frame>) after the last action
      // over the stages, or Checkpoints.sweep between measurements.
      localCheckpointEvery.fold(imputedAll0)(_ =>
        imputedAll0.localCheckpoint(eager = false))
    }

    // I10 — per-column gap stats, unioned.
    lazy val gapStats = ImputeSummaries.gapStatsAll(
      cumulativeCols.map { cum =>
        ImputeSummaries.gapStats(
          imputedAll
            .withColumn("gap_length", col(s"__gap_length_$cum"))
            .withColumn("cumulative_value_group", col(s"__cvg_$cum")),
          cum)
      })

    lazy val imputed = {
      val tempStatCols = cumulativeCols.flatMap(c =>
        Seq(s"__gap_length_$c", s"__cvg_$c"))
      ProjectAggregate.rebuildCumulative(
        imputedAll.drop(tempStatCols: _*), cumulativeCols)
    }

    // I13 — calculated energy-balance columns.
    lazy val calculated = Calculated.addEnergyBalance(imputed)

    new Stages(intervals, () => imputed, () => gapStats, () => calculated)
  }

  /** Write every stage as the reference's staged parquet layout
    * (SURVEY §1.1 eager-pipeline row; names mirror
    * aggregate.py:118-121,224-261,294-297,411-414,481-484).
    *
    * Each write materializes its own lineage; the stages share the impute
    * DAG, so build `stages` with `localCheckpointEvery = Some(1)` (cut
    * after the impute stage) when writing all of them — otherwise every
    * sink re-executes the shared cascade (the reference avoids the same
    * re-compute by materializing parquet between steps).
    */
  /** `partitionByProject` routes every HOUSEHOLD-grain sink through
    * `partitionBy(ProjectIdBSV)` so downstream project-sliced reads prune
    * at the directory level — the production layout. Project-grain sinks
    * (summaries, project_{iv}) stay unpartitioned: they are small by
    * construction and one file per project per table would be pure
    * small-file overhead.
    */
  def writeStages(stages: Stages, dir: String,
                  partitionByProject: Boolean = false): Unit = {
    Sources.writeStage(stages.imputed, dir, "household_imputed",
      partitionByProject)
    Sources.writeStage(stages.gapStats, dir, "impute_gap_stats")
    Sources.writeStage(stages.householdSummary, dir, "impute_summary_household")
    Sources.writeStage(stages.projectSummary, dir, "impute_summary_project")
    Sources.writeStage(stages.calculated, dir, "household_calculated",
      partitionByProject)
    stages.intervals.foreach { iv =>
      Sources.writeStage(stages.resampled(iv), dir, s"household_$iv",
        partitionByProject)
      Sources.writeStage(stages.projectAggregated(iv), dir, s"project_$iv")
    }
  }
}

/** Analysis-loading facade (SURVEY §3.2): lazy tables per interval, like
  * the reference's get_household_tables/get_project_tables
  * (/root/reference/etdtransform/load_data.py:23-67,320-351) — DataFrame
  * lineage IS the deferred expression tree; Catalyst prunes and pushes
  * down, so the "load quickly despite many columns" property is native.
  */
object Tables {

  val intervals = Seq("5min", "15min", "60min", "6h", "24h")

  /** `metadataColumns` selects WHICH index columns ride along
    * (read_hh_data's metadata_columns, aggregate.py:57-96) — None joins
    * the whole index; Catalyst prunes unused ones anyway, so this is an
    * API-parity convenience, not a performance lever.
    */
  def household(spark: SparkSession, dir: String,
                index: Option[DataFrame] = None,
                wanted: Seq[String] = intervals,
                metadataColumns: Option[Seq[String]] = None)
      : Map[String, DataFrame] =
    wanted.map { iv =>
      val df = Sources.normalizeLegacyColumns(
        spark.read.parquet(s"$dir/household_$iv.parquet"))
      iv -> index.fold(df) { ix =>
        val keys = Seq(Model.HouseId, Model.ProjectId)
        val ixSel = metadataColumns.fold(ix)(ms =>
          ix.select((keys ++ ms.filterNot(keys.contains)).map(col): _*))
        df.join(broadcast(ixSel), keys, "left")
      }
    }.toMap

  def project(spark: SparkSession, dir: String,
              wanted: Seq[String] = intervals): Map[String, DataFrame] =
    wanted.map { iv =>
      iv -> spark.read.parquet(s"$dir/project_$iv.parquet")
    }.toMap
}
