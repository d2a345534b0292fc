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
}
