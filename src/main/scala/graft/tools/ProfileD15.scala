package graft.tools

import org.apache.spark.sql.SparkSession

import graft.dedup.Dedup

/** Times d15's two forms (string grams vs xxhash64 grams) on a
  * testdata-shaped dir — the scale-path comparison quoted in
  * BENCH_NOTES. Usage: ProfileD15 [dir] */
object ProfileD15 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft-scale10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val shuffled = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          shuffled.addAndGet(
            sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
          ()
        }
      })
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    for (pass <- 1 to 2; hashed <- Seq(false, true)) {
      org.apache.spark.graft.ListenerDrain.drain(spark.sparkContext)
      shuffled.set(0L)
      val t0 = System.nanoTime()
      val n = Dedup.crossDocGramStats(docs, "doc_id", "text", 5, hashed)
        .queryExecution.toRdd.count()
      org.apache.spark.graft.ListenerDrain.drain(spark.sparkContext)
      println(f"[d15] $dir pass$pass hashed=$hashed: " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows, " +
        f"${shuffled.get / 1048576.0}%.1f MB shuffled)")
    }
    spark.stop()
  }
}
