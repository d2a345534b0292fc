package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev plan audit for t20: the KN count relations must ride TWO
  * bigram-stream exchanges (w1-keyed and w2-keyed) plus the final
  * doc_id re-group — a (w1,w2) window must NOT add a third. */
object ExplainT20 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.Queries.all("t20_kneser_ney")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    plan.linesIterator.filter(_.contains("Exchange")).foreach(println)
    spark.stop()
  }
}
