package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-group top-k as a partial aggregate instead of a window sort.
  *
  * The window form — `row_number().over(Window.partitionBy(query)
  * .orderBy(score.desc, id))` then `rank <= k` — shuffles EVERY scored
  * row into the query's partition and sorts it there, only to discard
  * all but k. This helper routes the same selection through the native
  * [[org.apache.spark.sql.graft.TopKPairs]] aggregate: each map task
  * reduces its slice to at most k entries per group before the
  * exchange (ObjectHashAggregate partial + final merge), so the shuffle
  * carries O(groups x k) per task instead of the scored relation. On a
  * 1000-executor scan of a 100 TB corpus the scored relation is
  * (corpus x queries)-sized; this is the difference between re-shuffling
  * the corpus and shuffling kilobytes.
  *
  * Result equality with the window form (including null scores — DESC
  * NULLS LAST — id tie-breaks, and -0.0/0.0) is pinned in TopKAggSpec.
  */
object TopK {

  /** `scored` must carry `queryCol`, `idCol` (integral — emitted as
    * long), `scoreCol` (numeric — emitted as double). Returns one row
    * per kept entry: (queryCol, idCol, rankCol int 1..k, scoreCol),
    * ordered within a group by (score DESC NULLS LAST, id ASC) exactly
    * as the window form. Groups absent from `scored` are absent here
    * too; a group with fewer than k rows keeps them all.
    */
  def topKPerQuery(scored: DataFrame, queryCol: String, idCol: String,
                   scoreCol: String, k: Int,
                   rankCol: String = "rank"): DataFrame =
    scored
      .groupBy(queryCol)
      .agg(org.apache.spark.sql.graft.TopKExpressions.topkPairs(
        col(scoreCol).cast("double"), col(idCol).cast("long"), k).as("__tk"))
      .select(col(queryCol), posexplode(col("__tk")).as(Seq("__pos", "__e")))
      .select(col(queryCol), col("__e.id").as(idCol),
        (col("__pos") + 1).cast("int").as(rankCol),
        col("__e.score").as(scoreCol))
}
