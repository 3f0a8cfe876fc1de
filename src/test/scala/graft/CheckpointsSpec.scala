package graft

import org.scalatest.funsuite.AnyFunSuite

/** [[Checkpoints.sweep]]'s keep contract (PERFNOTES r15, the
  * `q_bm25_indexed` mixed-mode defect): a Dataset-level `.persist()`
  * lives in the SQL CacheManager, and an unconditional
  * `catalog.clearCache()` evicts it REGARDLESS of the RDD-id keep set —
  * so a keep-sweep between timed runs would silently drop the prepared
  * index and every run after the first would re-pay the build inside
  * the timed region. The pin: a keep-sweep leaves the kept Dataset
  * cache LIVE (storageLevel stays non-NONE — the public CacheManager
  * probe) while still freeing non-kept state; a keep-free sweep clears
  * everything.
  */
class CheckpointsSpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  test("keep-sweep spares a persisted Dataset's SQL cache; keep-free " +
      "sweep clears it") {
    // start clean so the keep snapshot is exactly the index's ids
    Checkpoints.sweep(spark)
    val index = (1L to 100L).toDF("id").persist()
    index.count() // materialize: ids register in getPersistentRDDs
    assert(index.storageLevel.useMemory, "fixture must be cached")
    val keep = Checkpoints.persistentIds(spark)
    assert(keep.nonEmpty)

    // non-kept state a "run" leaves behind: a lazy localCheckpoint cut
    val cut = (1L to 10L).toDF("x").localCheckpoint(false)
    cut.count()
    assert(Checkpoints.persistentIds(spark).size > keep.size)

    Checkpoints.sweep(spark, keep)
    assert(index.storageLevel.useMemory,
      "keep-sweep must leave the kept Dataset cache live in the " +
        "CacheManager (not just its blocks)")
    assert(Checkpoints.persistentIds(spark) == keep,
      "keep-sweep must free everything not kept")
    // and the kept cache is actually SERVED: re-count without error
    // after the sweep freed the non-kept state
    assert(index.count() == 100L)

    Checkpoints.sweep(spark)
    assert(index.storageLevel == org.apache.spark.storage.StorageLevel.NONE,
      "keep-free sweep must clear the SQL cache")
    assert(Checkpoints.persistentIds(spark).isEmpty)
  }
}
