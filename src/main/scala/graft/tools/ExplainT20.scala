package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev plan audit for t20: the four vocabulary-sized count relations
  * must SHARE one physical bigram-count subplan (ReusedExchange), so
  * the regex extraction runs once per side — bg-stream side + model
  * side — and the only full-stream exchanges are the (w1,w2) join and
  * the final doc regroup. */
object ExplainT20 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val df = graft.Queries.all("t20_kneser_ney")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    println("regex scans: " +
      "regexp_extract_all".r.findAllIn(plan).length)
    println("reused exchanges: " + "ReusedExchange".r.findAllIn(plan).length)
    plan.linesIterator.filter(l =>
      l.contains("Exchange hash") || l.contains("ReusedExchange"))
      .foreach(println)
    spark.stop()
  }
}
