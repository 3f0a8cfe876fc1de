package graft.ops

import org.apache.spark.sql.DataFrame

/** Memory auto-sizing for the iterative graph operators (VERDICT r18
  * #1): [[PageRank]] and [[Hits]] already count edges and nodes every
  * run — this derives the three levers PERFNOTES r18's graphscale100
  * measured as the difference between OOM and 3.0-3.5 GB peak task
  * memory at the 55M-edge tier, so the 100× tier runs on DEFAULT conf
  * with no hand-tuning:
  *
  *  (a) a shuffle-partition count holding contribution ROWS PER TASK
  *      roughly constant (fixed 32 partitions put ~1.7M rows in each
  *      hash-aggregate task at 55M edges → 4.5-6.8 GB grabs and
  *      UNABLE_TO_ACQUIRE_MEMORY on an 8 GB heap);
  *  (b) the AQE coalescing floor
  *      (`spark.sql.adaptive.coalescePartitions.minPartitionNum`) for
  *      the iteration's stages — raising partitions ALONE changed
  *      nothing at r18 because the coalescer re-merged them to its
  *      64 MB byte target (it optimizes bytes/partition, not
  *      memory/task);
  *  (c) an input respread when the source partitioning is FAT
  *      (edges-per-input-split ≫ the target): the first map-side
  *      partial aggregate runs on the INPUT's splits, upstream of any
  *      exchange, so it is partition-count-independent — measured
  *      7.4-11.7 GB grabs on 32 fat cached splits. File-sourced edges
  *      split by `maxPartitionBytes` and rarely trigger this; cached/
  *      synthetic edge frames do.
  *
  * Sizing is TWO-PHASE because the edge-collapse aggregation (distinct
  * / weight-sum) that builds the iteration's edge frame is itself the
  * first victim: phase 1 sizes from the RAW edge count (one map-only
  * count of the input — an upper bound on the distinct count) so the
  * collapse survives, phase 2 refines the conf to the true distinct
  * count once the frame is materialized (a heavily multi-edged input
  * would otherwise leave the rounds over-tasked).
  *
  * Levers are applied-and-restored around the iteration (the r18
  * graphScale100 finally-block discipline, moved into the operators):
  * session conf mutates only until the returned restore runs, and
  * results cannot change — the exact tiers sum through order-free
  * decimals (spec-pinned partitioning invariance), which is what makes
  * auto-sizing correctness-free. Below the trigger edge count
  * (fixture / bench scale) nothing is touched and plans stay
  * byte-identical.
  */
object GraphMemory {

  /** ~250k contribution rows per hash-aggregate task: the r18 manual
    * fix ran 55M edges on 256 partitions (~215k rows/task) at
    * 3.0-3.5 GB peak; the default 32-partition session stays untouched
    * up to 8M edges (the 10× tier keeps its measured baseline shape).
    */
  val targetRowsPerTask: Long = 250000L

  /** Backstop against a pathological count on one box; a real cluster
    * job at this scale sets its own shuffle parallelism anyway.
    */
  val maxPartitions: Int = 65536

  private val minKey = "spark.sql.adaptive.coalescePartitions.minPartitionNum"

  /** Partition count holding rows/task ≈ [[targetRowsPerTask]] —
    * never below the session's current setting (small graphs keep
    * their plans byte-identical).
    */
  def autoPartitions(totalEdges: Long, current: Int): Int = {
    val want = (totalEdges + targetRowsPerTask - 1) / targetRowsPerTask
    math.max(current, math.min(maxPartitions.toLong, want).toInt)
  }

  /** Set shuffle partitions + the AQE coalescing floor; returns the
    * restore closure (captures the PREVIOUS values, including "floor
    * was unset").
    */
  private def applyConf(spark: org.apache.spark.sql.SparkSession,
                        parts: Int): () => Unit = {
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions", "200")
    val prevMin = spark.conf.getOption(minKey)
    spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
    spark.conf.set(minKey, parts.toString)
    () => {
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      prevMin match {
        case Some(v) => spark.conf.set(minKey, v)
        case None => spark.conf.unset(minKey)
      }
    }
  }

  /** Build the materialized edge frame for an iteration under
    * auto-sized levers. `raw` is the operator's projected edge input
    * (pre-collapse); `collapse` is its dedup/weight-sum aggregation.
    * Returns (materialized frame, restore-closure for the finally).
    *
    * Phase 1: one map-only count of `raw` sizes the conf so the
    * collapse itself survives, and a fat raw input (rows per split
    * > 2× the target) is respread first — the collapse's map-side
    * partial aggregation runs on the INPUT's splits. Phase 2: once the
    * collapsed frame is materialized, the conf is refined to its true
    * row count for the rounds. Below the trigger both phases are
    * no-ops and the built plan is byte-identical to an unlevered one.
    */
  def sizedEdges(raw: DataFrame,
                 collapse: DataFrame => DataFrame): (DataFrame, () => Unit) = {
    val spark = raw.sparkSession
    val cur = spark.conf.get("spark.sql.shuffle.partitions", "200").toInt
    val rawCount = raw.count()
    val preParts = autoPartitions(rawCount, cur)
    var restore: () => Unit = () => ()
    var input = raw
    if (preParts > cur) {
      restore = applyConf(spark, preParts)
      val inParts = math.max(1, raw.rdd.getNumPartitions)
      if (rawCount / inParts > 2 * targetRowsPerTask)
        input = raw.repartition(preParts)
    }
    // above the trigger the checkpoint stores SERIALIZED (still
    // memory-first, disk-spillable): the r19 re-measure showed the
    // DESERIALIZED default is the 8 GB heap's biggest tenant at 55M
    // edges (MemoryStore SizeEstimator OOMs while 32 shuffle writers
    // hold their buffers) — serialized rows are ~3-4× smaller and
    // evictable; the per-round deserialization cost is map-side and
    // edge-linear. Below the trigger the default level keeps the
    // fixture/bench path byte-identical.
    val e =
      if (preParts > cur)
        collapse(input).localCheckpoint(true,
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
      else collapse(input).localCheckpoint()
    val finalParts = autoPartitions(e.count(), cur)
    if (preParts > cur && finalParts != preParts) {
      restore()
      restore =
        if (finalParts > cur) applyConf(spark, finalParts) else () => ()
    }
    (e, restore)
  }
}
