package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profile: where does t20 spend its wall — the eager T scan, the
  * two window exchanges, or the regroup? */
object ProfileT20 {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val norm = regexp_replace(lower(trim(col("text"))), "\\s+", " ")
    val pat = "(?:^|(?<= ))(?=((?:\\S+ ){1}\\S+))"
    val bg = docs.select(col("doc_id"),
        explode(regexp_extract_all(norm, lit(pat), lit(1))).as("bg"))
      .withColumn("w1", split_part(col("bg"), lit(" "), lit(1)))
      .withColumn("w2", split_part(col("bg"), lit(" "), lit(2)))
    for (pass <- 1 to 2) {
      time(s"pass$pass regex-scan-only")(bg.select(count(lit(1))).head())
      time(s"pass$pass T distinct job")(
        bg.select("w1", "w2").distinct().count())
      time(s"pass$pass full t20")(
        graft.Queries.all("t20_kneser_ney")(spark, sf)
          .queryExecution.toRdd.count())
    }
    spark.stop()
  }
}
