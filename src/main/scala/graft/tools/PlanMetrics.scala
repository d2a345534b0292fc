package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Dev tool: execute a catalog query and dump per-operator output-row
  * metrics from the FINAL adaptive plan — where does a heavy query's
  * volume actually appear? Usage: runMain graft.tools.PlanMetrics
  * <query> [sfDir]. */
object PlanMetrics {
  def main(args: Array[String]): Unit = {
    val q = args.headOption.getOrElse("d16_containment_decontaminate")
    val sf = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.Queries.all(q)(spark, sf)
    val t0 = System.nanoTime()
    df.queryExecution.toRdd.count()
    println(f"[metrics] $q wall ${(System.nanoTime() - t0) / 1e9}%.2f s")
    def walk(p: SparkPlan, depth: Int): Unit = {
      val rows = p.metrics.get("numOutputRows").map(_.value)
      val shuffleBytes = p.metrics.get("shuffleBytesWritten")
        .orElse(p.metrics.get("dataSize")).map(_.value)
      val tag = rows.fold("")(r => f"$r%,d rows") +
        shuffleBytes.fold("")(b => f"  ${b / 1048576.0}%.1f MB")
      println(f"[metrics] ${"  " * depth}${p.nodeName}%-35s $tag")
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan, depth + 1)
        case q: QueryStageExec => walk(q.plan, depth + 1)
        case other => other.children.foreach(walk(_, depth + 1))
      }
    }
    walk(df.queryExecution.executedPlan, 0)
    spark.stop()
  }
}
