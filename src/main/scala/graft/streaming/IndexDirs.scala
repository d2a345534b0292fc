package graft.streaming

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Crash-safe directory discipline shared by every maintained index
  * ([[IncrementalNearDup]], [[IncrementalEmbeddingDedup]],
  * [[IncrementalAnnIndex]], [[IncrementalIvfIndex]]): a full-directory
  * rewrite (compaction, retrain) stages into `dir.compacting`, moves
  * the live directory aside to `dir.old`, renames the staged one in,
  * then drops `.old`. A crash at any point leaves either the old or
  * the new directory whole — [[recover]] (run by every reader) moves a
  * stranded `.old` back when the live directory is missing, so content
  * is never lost; the interrupted rewrite simply didn't happen. */
private[streaming] object IndexDirs {

  def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sessionState.newHadoopConf())

  /** If a rewrite crashed between its two renames (live dir moved
    * aside, staged dir not yet in place), restore the previous
    * directory from `.old`. Idempotent; cheap when nothing is wrong. */
  def recover(spark: SparkSession, path: String): Unit = {
    val f = fs(spark, path)
    if (!f.exists(new Path(path)) && f.exists(new Path(s"$path.old"))) {
      f.rename(new Path(s"$path.old"), new Path(path))
      ()
    }
  }

  /** The directory as a DataFrame, after [[recover]] — None before the
    * first write. */
  def readIfExists(spark: SparkSession, path: String): Option[DataFrame] = {
    recover(spark, path)
    if (fs(spark, path).exists(new Path(path)))
      Some(spark.read.parquet(path))
    else None
  }

  /** Atomically (to readers that [[recover]]) replace `path` with the
    * fully written staging directory `tmp`. */
  def swapIn(spark: SparkSession, path: String, tmp: String): Unit = {
    val f = fs(spark, path)
    val old = new Path(s"$path.old")
    f.delete(old, true) // stale leftover from a crash after a prior swap
    f.rename(new Path(path), old)
    f.rename(new Path(tmp), new Path(path))
    f.delete(old, true)
    ()
  }
}
