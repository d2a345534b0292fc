package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.text.TextFunctions

/** Recall diagnostics for the banded-minhash near-dup (d02): compares
  * `Dedup.nearDuplicates` at the catalog parameters against the EXACT
  * global 1-gram jaccard pair set (via the prefix-filtered exact join,
  * itself brute-force-property-tested) on the shipped corpora.
  *
  * Usage: runMain graft.tools.MinhashRecall <sfDir>
  */
object MinhashRecall {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet").cache()
    val toks = docs.select(col("doc_id"),
      array_distinct(TextFunctions.tokens(col("text"))).as("w"))
    val exact = Dedup.jaccardJoinExact(toks, "doc_id", "w", 0.7, Nil).cache()
    val nExact = exact.count()
    val d02 = Dedup.nearDuplicates(docs, "doc_id", "text",
      shingleLen = 1, numHashes = 32, numBands = 4, threshold = 0.7,
      maxBucket = 200).cache()
    val nD02 = d02.count()
    val missed = exact.join(d02, Seq("a", "b"), "left_anti").count()
    val extra = d02.join(exact, Seq("a", "b"), "left_anti").count()
    val valDiff = d02.join(exact.withColumnRenamed("jaccard", "jx"), Seq("a", "b"))
      .filter(col("jaccard") =!= col("jx")).count()
    println(f"[recall] $sfDir exact=$nExact d02=$nD02 missed=$missed " +
      f"extra=$extra value_mismatch=$valDiff recall=${
        if (nExact == 0) 1.0 else (nExact - missed).toDouble / nExact}%.4f")
    spark.stop()
  }
}
