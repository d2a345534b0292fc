package graft.tools

import org.apache.spark.sql.SparkSession

/** Learn a BPE merge table from a documents corpus and print it as
  * Scala source — how graft.text.Bpe.DefaultMerges was produced
  * (and how to re-freeze it against a different corpus).
  *
  * Usage: runMain graft.tools.TrainBpe <sfDir> <numMerges>
  */
object TrainBpe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val n = args.lift(1).map(_.toInt).getOrElse(24)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.sources.TestData.table(spark, sfDir, "documents")
    val t0 = System.nanoTime()
    val merges = graft.text.Bpe.train(docs, "text", n)
    println(f"[bpe] learned ${merges.length} merges in ${(System.nanoTime() - t0) / 1e9}%.1f s:")
    println(merges.map { case (a, b) => s""""$a" -> "$b"""" }
      .grouped(5).map(_.mkString(", ")).mkString(",\n    "))
    spark.stop()
  }
}
