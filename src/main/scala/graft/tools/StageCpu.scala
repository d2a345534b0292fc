package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev profile: run a catalog query once and print PER-STAGE executor
  * CPU / wall / task count / shuffle volumes, sorted by CPU — locates
  * which exchange-delimited piece of a heavy query actually burns the
  * time (PlanMetrics gives rows per operator; this gives seconds per
  * stage). Usage: runMain graft.tools.StageCpu <query...> [sfDir via
  * SPARK_GRAFT_SF_DIR]. */
object StageCpu {
  def main(args: Array[String]): Unit = {
    val queries =
      if (args.nonEmpty) args.toSeq else Seq("d16_containment_decontaminate")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val repeats = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPEATS", "1").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    final case class Row(name: String, var cpu: Double = 0, var run: Double = 0,
                         var tasks: Int = 0, var srMB: Double = 0,
                         var swMB: Double = 0, var rows: Long = 0)
    val stages = mutable.LinkedHashMap.empty[Int, Row]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        val r = stages.getOrElseUpdate(si.stageId,
          Row(si.name.linesIterator.next().take(90)))
        r.cpu += m.executorCpuTime / 1e9
        r.run += m.executorRunTime / 1e3
        r.tasks += si.numTasks
        r.srMB += m.shuffleReadMetrics.totalBytesRead / 1048576.0
        r.swMB += m.shuffleWriteMetrics.bytesWritten / 1048576.0
        r.rows += m.outputMetrics.recordsWritten
        ()
      }
    })

    // warm the shared caches the catalog entry expects (same as Bench)
    for (w <- Seq("q01_purchase_summary", "c01_curation_pipeline"))
      try graft.SparkEntry.queries(w)(spark, sf).count()
      catch { case _: Throwable => () }

    for (q <- queries) {
      stages.clear()
      for (i <- 1 to repeats) {
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(q)(spark, sf).queryExecution.toRdd.count()
        println(f"[stagecpu] $q run $i wall ${(System.nanoTime() - t0) / 1e9}%.2f s")
        if (sys.env.get("SPARK_GRAFT_BENCH_KEEP_CACHES").isEmpty)
          graft.dedup.Dedup.releaseCaches()
      }
      val rows = stages.values.toSeq.sortBy(-_.cpu)
      println(f"[stagecpu] $q total cpu ${rows.map(_.cpu).sum}%.2f s over ${rows.size} stages")
      rows.take(12).foreach { r =>
        println(f"[stagecpu] cpu=${r.cpu}%7.2f run=${r.run}%7.2f tasks=${r.tasks}%4d " +
          f"sr=${r.srMB}%7.1fMB sw=${r.swMB}%7.1fMB  ${r.name}")
      }
    }
    spark.stop()
  }
}
