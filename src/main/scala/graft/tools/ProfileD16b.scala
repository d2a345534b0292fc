package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profile: decompose d16's containment-join cost into its stages
  * by timing successively larger prefixes of the same pipeline on the
  * live box — where do the CPU-seconds actually go? Each step is timed
  * with the Bench toRdd materialization over REPEATS runs (min
  * reported: this box shows heavy hypervisor steal under sustained
  * load, and the min of warm repeats is the load-free-est estimate). */
object ProfileD16b {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val repeats = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.text.TextFunctions

    val cpuNs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          cpuNs.addAndGet(sc.stageInfo.taskMetrics.executorCpuTime)
          ()
        }
      })

    val docs = graft.sources.TestData.table(spark, sf, "documents").cache()
    docs.count()

    def t(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val runs = (1 to repeats).map { _ =>
        val c0 = cpuNs.get
        val t0 = System.nanoTime()
        val n = mk.queryExecution.toRdd.count()
        graft.dedup.Dedup.releaseCaches()
        ((System.nanoTime() - t0) / 1e9, (cpuNs.get - c0) / 1e9, n)
      }
      val w = runs.map(_._1).min; val c = runs.map(_._2).min
      println(f"[d16b] $name%-28s wall_min=$w%7.2f cpu_min=$c%7.2f rows=${runs.head._3}%,d")
    }

    def toks = docs.select(col("doc_id"), col("source"),
      array_distinct(TextFunctions.tokens(col("text"))).as("w"))
    val isBench = col("source").isin("src0", "src1")

    t("tokens only") { toks }
    t("full d16") {
      graft.dedup.Dedup.containmentJoinAcross(
        toks.filter(!isBench), toks.filter(isBench), "doc_id", "w", 0.9)
        .groupBy(col("a").as("doc_id"))
        .agg(count(lit(1)).as("n_bench_matches"),
             max(col("containment")).as("max_containment"))
        .orderBy("doc_id")
    }
    t("pairs only (no agg)") {
      graft.dedup.Dedup.containmentJoinAcross(
        toks.filter(!isBench), toks.filter(isBench), "doc_id", "w", 0.9)
    }
    t("pairs sketchK=32") {
      graft.dedup.Dedup.containmentJoinAcross(
        toks.filter(!isBench), toks.filter(isBench), "doc_id", "w", 0.9,
        sketchK = 32)
    }
    t("full d16 sketchK=32") {
      graft.dedup.Dedup.containmentJoinAcross(
        toks.filter(!isBench), toks.filter(isBench), "doc_id", "w", 0.9,
        sketchK = 32)
        .groupBy(col("a").as("doc_id"))
        .agg(count(lit(1)).as("n_bench_matches"),
             max(col("containment")).as("max_containment"))
        .orderBy("doc_id")
    }
    t("j03 sketchK=24") {
      graft.dedup.Dedup.containmentJoin(toks, "doc_id", "w", 0.9,
        Seq("source")).orderBy("a", "b")
    }
    t("j03 sketchK=32") {
      graft.dedup.Dedup.containmentJoin(toks, "doc_id", "w", 0.9,
        Seq("source"), sketchK = 32).orderBy("a", "b")
    }
    spark.stop()
  }
}
