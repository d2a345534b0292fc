package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev profile: c11/c12 wall with the shared NLL-score cache. */
object ProfileC12 {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(tag: String, q: String): Unit = {
      val t0 = System.nanoTime()
      graft.Queries.all(q)(spark, sf).queryExecution.toRdd.count()
      println(f"[prof] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    for (pass <- 1 to 2; q <- Seq("t16_bigram_logprob",
        "c11_perplexity_buckets", "c12_perplexity_gated_mixture"))
      time(s"pass$pass $q", q)
    spark.stop()
  }
}
