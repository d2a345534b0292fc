package graft.streaming

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned (node, component) labelings under `<statePath>/labels/vN`
  * — the commit protocol the incremental dedup maintainers share:
  * a writer materializes the next version into its own directory and
  * readers only ever list versions whose `_SUCCESS` marker exists, so
  * an in-flight or crashed write is invisible; after a commit all but
  * the previous version are pruned (one rollback step is retained). */
private[streaming] object LabelStore {

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sessionState.newHadoopConf())

  /** Complete (SUCCESS-marked) label versions only. */
  def versions(spark: SparkSession, statePath: String): Seq[Long] = {
    val dir = new Path(s"$statePath/labels")
    val f = fs(spark, statePath)
    if (!f.exists(dir)) Nil
    else f.listStatus(dir).toSeq.map(_.getPath)
      .filter(p => p.getName.startsWith("v") &&
        f.exists(new Path(p, "_SUCCESS")))
      .map(_.getName.drop(1).toLong).sorted
  }

  /** The current labeling — empty frame before the first commit.
    * Nodes absent from every pair carry no row. */
  def labels(spark: SparkSession, statePath: String): DataFrame = {
    import spark.implicits._
    versions(spark, statePath).lastOption match {
      case Some(v) => spark.read.parquet(s"$statePath/labels/v$v")
      case None => Seq.empty[(Long, Long)].toDF("node", "component")
    }
  }

  /** Write `updated` as the next version and prune all but the
    * previous one. */
  def commit(spark: SparkSession, statePath: String,
             updated: DataFrame): Unit = {
    val vs = versions(spark, statePath)
    val next = vs.lastOption.getOrElse(-1L) + 1
    updated.write.mode("overwrite").parquet(s"$statePath/labels/v$next")
    vs.dropRight(1).foreach(v =>
      fs(spark, statePath).delete(new Path(s"$statePath/labels/v$v"), true))
  }

  /** Standalone retention sweep for long-running streams, with the
    * [[IndexDirs.retire]] contract: keep the newest `keep` committed
    * versions (the reader grace window — a reader that resolved the
    * previous version before a commit still completes on its
    * snapshot), delete older committed versions, and sweep crashed
    * UNCOMMITTED leftovers strictly below the newest committed version
    * (their numbers are never reused — `commit` probes past the
    * newest committed — so without the sweep they'd linger forever).
    * An uncommitted dir AT or ABOVE the newest committed version may
    * be an in-flight writer's target and is left alone. `commit`
    * already prunes to two on every call; vacuum is for stores whose
    * maintainer crashed mid-write, or a `keep=1` tightening between
    * runs. Single-writer, like commit. */
  def vacuum(spark: SparkSession, statePath: String,
             keep: Int = 2): Unit = {
    require(keep >= 1, "must retain the current labeling")
    val f = fs(spark, statePath)
    val dir = new Path(s"$statePath/labels")
    if (!f.exists(dir)) return
    val committed = versions(spark, statePath)
    val retained = committed.takeRight(keep).toSet
    val newest = committed.lastOption.getOrElse(Long.MinValue)
    f.listStatus(dir).toSeq.map(_.getPath)
      .filter(_.getName.startsWith("v"))
      .flatMap(p => p.getName.drop(1).toLongOption.map((_, p)))
      .foreach { case (v, p) =>
        val staleCommitted = committed.contains(v) && !retained(v)
        val crashedLeftover = !committed.contains(v) && v < newest
        if (staleCommitted || crashedLeftover) { f.delete(p, true); () }
      }
  }
}
