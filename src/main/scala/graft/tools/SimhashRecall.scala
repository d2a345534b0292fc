package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Completeness diagnostics for the simhash near-dup (d03): compares
  * `Dedup.simhashNearDuplicates` at the catalog parameters against the
  * brute-force all-pairs Hamming join over the same packed signatures.
  * The chunk pigeonhole guarantees completeness UNLESS a bucket hits
  * the `maxBucket` cap — this measures whether the shipped corpora
  * ever trip the cap.
  *
  * Usage: runMain graft.tools.SimhashRecall <sfDir>
  */
object SimhashRecall {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet").cache()
    val sigs = Dedup.simhashSignaturesPacked(docs, "doc_id", "text").cache()
    val x = sigs.select(col("doc_id").as("a"), col("__sig").as("__sx"))
    val y = sigs.select(col("doc_id").as("b"), col("__sig").as("__sy"))
    val exact = x.join(y, col("a") < col("b"))
      .withColumn("hamming",
        bit_count(col("__sx").bitwiseXOR(col("__sy"))).cast("int"))
      .filter(col("hamming") <= 3)
      .select("a", "b", "hamming").cache()
    val nExact = exact.count()
    val d03 = Dedup.simhashNearDuplicates(docs, "doc_id", "text",
      maxHamming = 3).cache()
    val nD03 = d03.count()
    val missed = exact.join(d03, Seq("a", "b"), "left_anti").count()
    val extra = d03.join(exact, Seq("a", "b"), "left_anti").count()
    println(f"[recall] $sfDir exact=$nExact d03=$nD03 missed=$missed " +
      f"extra=$extra recall=${
        if (nExact == 0) 1.0 else (nExact - missed).toDouble / nExact}%.4f")
    spark.stop()
  }
}
