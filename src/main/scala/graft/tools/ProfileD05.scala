package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.TestData
import graft.text.TextFunctions
import graft.dedup.{ConnectedComponents, Dedup}

/** Dev profiling: break d05 into its stages (edge build vs CC rounds). */
object ProfileD05 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[d05] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val docs = TestData.table(spark, sfDir, "documents").cache()
    docs.count()
    val t = docs.select(col("doc_id"), col("source"),
      array_distinct(TextFunctions.tokens(col("text"))).as("w"))
    val pairs = time("jaccard edges") {
      Dedup.jaccardJoinExact(t, "doc_id", "w", 0.7, Seq("source"))
        .select(col("a"), col("b")).cache()
    }
    println(s"[d05] edges: ${time("edge count")(pairs.count())}")
    val cc = time("connectedComponents") {
      ConnectedComponents.connectedComponents(pairs, "a", "b", verbose = true)
    }
    println(s"[d05] labels: ${time("label count")(cc.count())}")
    spark.stop()
  }
}
