package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Deterministic release of a `localCheckpoint()`ed DataFrame's
  * storage blocks. Spark reclaims checkpointed RDDs only when the RDD
  * object becomes weakly reachable AND a driver GC runs — on a
  * long-lived driver with a large heap that can be tens of minutes,
  * during which every iterative job's superseded round checkpoints
  * (32+ blocks each) pile up in the block manager (measured: 1.7 GB
  * of dead round state after ~100 micro-batch folds). A caller that
  * KNOWS a checkpoint is superseded calls [[release]] and the blocks
  * drop immediately; passing a non-checkpointed frame is a no-op. */
object CheckpointRelease {
  def release(df: DataFrame): Unit = df.queryExecution.logical match {
    case lr: LogicalRDD => lr.rdd.unpersist(blocking = false); ()
    case _ => ()
  }
}
