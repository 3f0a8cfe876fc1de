package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Largest-remainder (Hamilton) apportionment of an integer budget
  * over weighted keys — the quota arithmetic a crawl scheduler uses to
  * split a global fetch budget across hosts proportionally to
  * authority, a sampler to split a row budget across strata, or a
  * shard planner to split file counts across sources. Every key gets
  * floor(B·w/W); the `B − Σfloor` largest fractional remainders get
  * one more (ties by key ascending), so quotas sum to EXACTLY the
  * budget with no key ever off by more than one from its real share —
  * the same discipline as `Mixing.mixturePlan`'s epoch arithmetic.
  *
  * INTEGER-EXACT, no floating point anywhere: weights are longs
  * (callers with double weights rescale onto an integer grid first —
  * authority ranks are already on the 1e6 grid, so `rank·1e6` is the
  * natural weight), quotas are `(w·B) div W`, remainders `(w·B) mod W`
  * — bit-identical across engines and partitionings by construction.
  * Bounds (documented, guarded where cheap): `B·max(w)` and `Σw` must
  * fit a signed long; the max guard is checked from the same one-row
  * aggregate that resolves W.
  *
  * Scale shape: one one-row aggregate (W, max w — a driver scalar,
  * codebook-grain), map-side quota/remainder arithmetic, and the bump
  * set as a distributed top-r under the TOTAL order (remainder desc,
  * key) — `orderBy.limit(r)` plans TakeOrdered (per-partition heaps,
  * r rows merged at the driver; r < budget, a user scalar), never a
  * global sort exchange. Non-positive weights receive quota 0 and do
  * not dilute W.
  */
object Apportion {

  /** (key, weight, quota) per input key with positive weight and a
    * NON-NULL key (a null stratum is meaningless as a quota target,
    * and null keys would silently lose their bump through the equi-
    * rejoin — dropped like non-positive weights); quotas sum to
    * exactly `budget` (when any qualifying key exists). Keys must be
    * UNIQUE among qualifying rows (guarded loud from the same one-row
    * aggregate): duplicates would fan out the bump rejoin and void the
    * sum-to-budget invariant — aggregate weights per key first. The result
    * rides a lazy checkpoint of the scored frame (the input lineage —
    * often a full rank computation — must not re-execute for the bump
    * pass); the CALLER frees it via `graft.Checkpoints.free` once the
    * result is consumed — the jaccardJoin ownership contract.
    */
  def largestRemainder(df: DataFrame, keyCol: String, weightCol: String,
                       budget: Long): DataFrame = {
    require(budget >= 0, s"largestRemainder: budget must be >= 0, got $budget")
    val w = df.select(col(keyCol).as("key"),
        col(weightCol).cast("long").as("weight"))
      .filter(col("key").isNotNull && col("weight") > 0)
    // Σweight through DECIMAL: a long sum can wrap PAST zero back to a
    // plausible positive, which the intended loud failure must catch.
    // count vs countDistinct rides the same one-row aggregate: a
    // duplicate key would fan out the bump equi-rejoin and break the
    // quotas-sum-to-budget invariant silently — fail loud instead
    val stats = w.agg(sum(col("weight").cast("decimal(38,0)")),
      coalesce(max(col("weight")), lit(0L)),
      count(lit(1)), countDistinct(col("key"))).collect().head
    val totalWDec =
      if (stats.isNullAt(0)) java.math.BigDecimal.ZERO else stats.getDecimal(0)
    val maxW = stats.getLong(1)
    require(stats.getLong(2) == stats.getLong(3),
      s"largestRemainder: duplicate keys in '$keyCol' " +
        s"(${stats.getLong(2)} rows, ${stats.getLong(3)} distinct) — " +
        "aggregate weights per key before apportioning")
    require(totalWDec.compareTo(
        java.math.BigDecimal.valueOf(Long.MaxValue)) <= 0,
      "largestRemainder: Σweight overflows Long — rescale weights to a " +
        "coarser grid")
    val totalW = totalWDec.longValueExact()
    require(budget == 0 || maxW <= Long.MaxValue / budget,
      s"largestRemainder: budget·max(weight) overflows Long " +
        s"($budget · $maxW) — rescale weights to a coarser grid")
    if (totalW == 0L)
      return w.withColumn("quota", lit(0L))
    val scored = w
      .withColumn("__q", expr(s"(weight * ${budget}L) div ${totalW}L"))
      .withColumn("__rem", expr(s"(weight * ${budget}L) % ${totalW}L"))
      .localCheckpoint(false)
    val assigned = scored.agg(coalesce(sum(col("__q")), lit(0L)))
      .collect().head.getLong(0)
    val r = budget - assigned
    // r = Σ fractional parts < the number of positive-weight keys; a
    // bump set beyond Int range would mean billions of keys hitting
    // the driver-merged top-r — out of this operator's regime
    require(r >= 0 && r <= Int.MaxValue,
      s"largestRemainder: bump set $r out of range")
    val out =
      if (r == 0L) scored.withColumn("quota", col("__q"))
      else {
        val bumps = scored.orderBy(col("__rem").desc, col("key"))
          .limit(r.toInt)
          .select(col("key"), lit(1L).as("__bump"))
        scored.join(bumps, Seq("key"), "left")
          .withColumn("quota", col("__q") + coalesce(col("__bump"), lit(0L)))
      }
    out.select(col("key"), col("weight"), col("quota"))
  }
}
