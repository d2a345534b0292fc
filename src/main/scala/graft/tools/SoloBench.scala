package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Solo-query bench for regression adjudication: the full
  * [[graft.Bench]] protocol (same session config, same untimed q01 +
  * shared-cache warmups, same toRdd materialization and repeat
  * policy) but timing ONLY the named queries — the isolation run
  * BENCH_NOTES adjudications call for when a full-bench row drifts
  * and nobody knows whether the query or the box moved.
  *
  * Usage: runMain graft.tools.SoloBench <query...>
  * Env:   SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS,
  *        SPARK_GRAFT_BENCH_REPEATS (default 5).
  */
object SoloBench {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: SoloBench <query...>")
    val repeats = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPEATS", "5").toInt
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // Mirror Bench's raised Janino cache (f0f3fe6): without it a
      // codegen-heavy query isolated here pays re-compilation the
      // full bench no longer pays — skewing exactly the drift
      // adjudications this tool exists to settle.
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    for (q <- Seq("q01_purchase_summary", "c01_curation_pipeline"))
      try graft.SparkEntry.queries(q)(spark, sfDir).count()
      catch { case _: Throwable => () }

    val cpuNs = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        cpuNs.addAndGet(sc.stageInfo.taskMetrics.executorCpuTime)
        ()
      }
    })
    args.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val attempts = Seq.fill(math.max(1, repeats)) {
        val c0 = cpuNs.get
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).queryExecution.toRdd.count(); true }
          catch { case e: Throwable =>
            println(s"[solo] $name FAILED: $e"); false }
        ((System.nanoTime() - t0) / 1e9, (cpuNs.get - c0) / 1e9, ok)
      }
      if (sys.env.get("SPARK_GRAFT_BENCH_KEEP_CACHES").isEmpty)
        graft.dedup.Dedup.releaseCaches()
      // failed repeats are excluded from the stats (their wall time
      // measures the failure, not the query); all= marks them with !
      val times = attempts.filter(_._3)
      if (times.isEmpty) println(s"[solo] $name: all $repeats repeats FAILED")
      else {
        val w = times.map(_._1).sorted
        val c = times.map(_._2).sorted
        println(f"[solo] $name wall med=${w(w.length / 2)}%.3f " +
          f"min=${w.head}%.3f max=${w.last}%.3f " +
          f"cpu med=${c(c.length / 2)}%.3f " +
          f"all=${attempts.map(t =>
            f"${t._1}%.2f${if (t._3) "" else "!"}").mkString(",")}")
      }
    }
    spark.stop()
  }
}
