package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print formatted physical plans for the headline queries —
  * the review loop for broadcast/pushdown/codegen posture. */
object ExplainPlans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/root/testdata/sf0.001"
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q01_purchase_summary", "q02_customer_spending",
               "q15_top_merchant", "q05_date_range",
               "q34_asof_purchase", "q37_interval_join", "d04_decontaminate")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      graft.Queries.all(n)(spark, sf).explain("formatted")
    }
    spark.stop()
  }
}
