package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev profile: d16/j03 standalone cost (the containment family — the
  * heaviest catalog entries after the exact baselines). */
object ProfileD16 {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(q: String): Unit = {
      val t0 = System.nanoTime()
      graft.Queries.all(q)(spark, sf).queryExecution.toRdd.count()
      println(f"[prof] $q: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    for (_ <- 1 to 2; q <- Seq("j03_containment_pairs",
        "d16_containment_decontaminate")) time(q)
    spark.stop()
  }
}
