package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.text.TextFunctions

/** Dev profiling: bigram-count formulations. */
object ProfileT05 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").cache()
    docs.count()
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[t05] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    for (_ <- 1 to 2) {
      time("shingles-transform") {
        docs.select(explode(TextFunctions.shingles(col("text"), 2)).as("b"))
          .groupBy("b").count().orderBy(col("count").desc, col("b")).limit(50).count()
      }
      time("tokens-only-explode") {
        docs.select(explode(TextFunctions.tokens(col("text"))).as("t"))
          .groupBy("t").count().orderBy(col("count").desc, col("t")).limit(50).count()
      }
      time("shingles-eval-only") {
        docs.select(sum(size(TextFunctions.shingles(col("text"), 2)))).head()
      }
    }
    spark.stop()
  }
}
