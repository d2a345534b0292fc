package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev plan audit for t20: the vocabulary-sized bigram-count table is
  * eagerly materialized (localCheckpoint) before the four derived
  * count relations consume it, so the corpus regex extraction can
  * appear in the SCORING plan exactly once — the model side reads
  * checkpoint blocks (Scan ExistingRDD), never the corpus. ReuseExchange
  * sharing was the r10 design; it is best-effort, and when it failed to
  * hold under load the extraction re-ran 4-5× (the r11 driver capture's
  * 92.6 s / 62 CPU-s t20 repeat). QueriesSpec pins the same invariant
  * as a test; this main prints the evidence for BENCH_NOTES.
  */
object ExplainT20 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val df = graft.Queries.all("t20_kneser_ney")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    println("regex scans in scoring plan (must be 1): " +
      "regexp_extract_all".r.findAllIn(plan).length)
    println("checkpoint scans: " + "ExistingRDD".r.findAllIn(plan).length)
    plan.linesIterator.filter(l =>
      l.contains("Exchange hash") || l.contains("ReusedExchange") ||
      l.contains("ExistingRDD"))
      .foreach(println)
    spark.stop()
  }
}
