package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Hadoop-FS plumbing for `foreachBatch` state directories.
  *
  * Every probe goes through the FileSystem OF THE PATH — never
  * `java.io.File` — so a state dir works on any storage Spark itself
  * can read (hdfs://, s3a://, file:/). A driver-local `File.exists()`
  * probe reads every remote dir as absent, which silently disables
  * cross-batch state: each micro-batch would fold into nothing and
  * overwrite the history. The helpers here are the only sanctioned way
  * the streaming maintainers touch their state dirs.
  */
object BatchState {

  def fs(spark: SparkSession, dir: String): (FileSystem, Path) = {
    val p = new Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** True iff `dir` exists and holds at least one visible entry
    * (hidden/meta names `_*` and `.*` — `_SUCCESS`, `.crc` — don't
    * count as data).
    */
  def hasData(spark: SparkSession, dir: String): Boolean = {
    val (f, p) = fs(spark, dir)
    f.exists(p) && f.listStatus(p).exists { s =>
      val n = s.getPath.getName
      !(n.startsWith("_") || n.startsWith("."))
    }
  }

  /** Committed version numbers under a versioned state dir: subdirs
    * named `v<N>`. A version is only ever visible under that name via
    * [[commitVersion]]'s rename, so presence == completeness.
    */
  def versions(spark: SparkSession, stateDir: String): Seq[Long] = {
    val (f, p) = fs(spark, stateDir)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(_.matches("v\\d+")).map(_.stripPrefix("v").toLong)
  }

  /** Durably replace versioned state: write the frame to `v<N>.tmp`,
    * rename to `v<N>` (atomic on HDFS and local FS — the new version
    * appears all-or-nothing), then prune versions `< N`. The previous
    * version stays readable until the new one is durable, so a crash
    * at ANY point leaves a complete version on disk:
    *   - mid-write: only `.tmp` is partial; committed versions intact;
    *   - post-rename, pre-prune: two versions; readers take the max;
    *   - replay of batch N: the write mode is overwrite and a stale
    *     `v<N>` from a failed attempt is deleted before the rename,
    *     so the commit is idempotent.
    */
  def commitVersion(spark: SparkSession, stateDir: String, version: Long,
                    df: org.apache.spark.sql.DataFrame): Unit = {
    val (f, root) = fs(spark, stateDir)
    val tmp = new Path(root, s"v$version.tmp")
    df.write.mode("overwrite").parquet(tmp.toString)
    val fin = new Path(root, s"v$version")
    if (f.exists(fin)) f.delete(fin, true)
    if (!f.rename(tmp, fin))
      sys.error(s"commitVersion: cannot promote $tmp to $fin")
    versions(spark, stateDir).filter(_ < version)
      .foreach(v => f.delete(new Path(root, s"v$v"), true))
  }

  /** The newest committed version strictly below `beforeVersion` —
    * the read side of [[commitVersion]]. Bounding by the current batch
    * id makes a REPLAYED batch ignore its own failed attempt and fold
    * from exactly the pre-batch state.
    */
  def latestVersion(spark: SparkSession, stateDir: String,
                    beforeVersion: Long = Long.MaxValue): Option[Long] = {
    val vs = versions(spark, stateDir).filter(_ < beforeVersion)
    if (vs.isEmpty) None else Some(vs.max)
  }
}
