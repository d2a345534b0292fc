package graft.streaming

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned directory discipline shared by every maintained index
  * ([[IncrementalNearDup]], [[IncrementalEmbeddingDedup]],
  * [[IncrementalAnnIndex]], [[IncrementalIvfIndex]],
  * [[IncrementalIvfPqIndex]]) — the physical-layout analogue of
  * [[LabelStore]]'s versioned commits.
  *
  * Layout: `<path>/v<N>` version directories. A version is LIVE once
  * its root `_SUCCESS` (written by the Spark job that filled it) and
  * every required sidecar `marker` exist; readers resolve the
  * newest live version. Per-batch appends land INSIDE the current
  * live version (appended files extend a snapshot — they never
  * invalidate a file listing a reader already holds). A full rewrite
  * (compaction, retrain) writes the NEXT version number and becomes
  * visible atomically when its markers land, then [[retire]]s all but
  * the newest two live versions: the previous version's files survive
  * one more generation, so a reader that resolved it BEFORE the swap
  * still completes with its snapshot intact — snapshot isolation at
  * the directory-version level, one generation deep (a reader older
  * than two rewrites is out of retention, the standard trade). A
  * crash mid-rewrite leaves an unmarked directory readers ignore and
  * the next successful rewrite sweeps; content is never lost — the
  * interrupted rewrite simply didn't happen. */
private[graft] object IndexDirs {

  def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sessionState.newHadoopConf())

  private val Ver = "^v(\\d+)$".r

  /** Every `v<N>` child of `path`, live or not, ascending. */
  private def versionDirs(spark: SparkSession,
                          path: String): Seq[(Long, Path)] = {
    val f = fs(spark, path)
    if (!f.exists(new Path(path))) Nil
    else f.listStatus(new Path(path)).toSeq.map(_.getPath)
      .flatMap(p => p.getName match {
        case Ver(n) => Some((n.toLong, p))
        case _ => None
      }).sortBy(_._1)
  }

  /** LIVE versions ascending: root `_SUCCESS` plus every `marker`
    * (a path relative to the version dir, e.g. the
    * `_centroids/_SUCCESS` sidecar gate) present. */
  def versions(spark: SparkSession, path: String,
               markers: Seq[String] = Nil): Seq[Long] = {
    val f = fs(spark, path)
    versionDirs(spark, path).filter { case (_, p) =>
      ("_SUCCESS" +: markers).forall(m => f.exists(new Path(p, m)))
    }.map(_._1)
  }

  /** The newest live version's directory — what readers resolve. */
  def currentDir(spark: SparkSession, path: String,
                 markers: Seq[String] = Nil): Option[String] =
    versions(spark, path, markers).lastOption.map(v => s"$path/v$v")

  /** Where per-batch appends land: the newest live version, or the
    * initial `v0` before the first commit (the append itself creates
    * it and its `_SUCCESS` makes it live). */
  def appendDir(spark: SparkSession, path: String,
                markers: Seq[String] = Nil): String =
    currentDir(spark, path, markers).getOrElse(s"$path/v0")

  /** The newest live version as a DataFrame — None before the first
    * commit. */
  def readIfExists(spark: SparkSession, path: String,
                   markers: Seq[String] = Nil): Option[DataFrame] =
    currentDir(spark, path, markers).map(spark.read.parquet)

  /** Staging target for a full rewrite: one past the highest existing
    * version number (live or not — a crashed rewrite's leftover is
    * never reused). Invisible to readers until its markers land. */
  def nextDir(spark: SparkSession, path: String): String = {
    val n = versionDirs(spark, path).map(_._1).maxOption.getOrElse(-1L) + 1
    s"$path/v$n"
  }

  /** After a rewrite committed: drop every version directory except
    * the newest `keep` live ones — retaining the previous generation
    * for readers still holding its file listing, and sweeping crashed
    * rewrites' unmarked leftovers. Single-writer, like the folds. */
  def retire(spark: SparkSession, path: String,
             markers: Seq[String] = Nil, keep: Int = 2): Unit = {
    val f = fs(spark, path)
    val live = versions(spark, path, markers).takeRight(keep).toSet
    versionDirs(spark, path).filterNot(d => live.contains(d._1))
      .foreach { case (_, p) => f.delete(p, true) }
  }
}
