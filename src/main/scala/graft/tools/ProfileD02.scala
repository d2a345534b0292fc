package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.text.TextFunctions

/** Dev profiling harness for the minhash near-dup pipeline. */
object ProfileD02 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    println("docs: " + docs.count())
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", 1, 32).cache()
    time("signatures")(sigs.count())
    val cands = Dedup.lshCandidates(sigs, "doc_id", "__sig", 4, 8, 200).cache()
    time("candidates")(println("cands: " + cands.count()))
    val out = time("full")(
      Dedup.nearDuplicates(docs, "doc_id", "text", 1, 32, 4, 0.7, 200).count())
    println("pairs: " + out)
    val out2 = time("full-again")(
      Dedup.nearDuplicates(docs, "doc_id", "text", 1, 32, 4, 0.7, 200).count())
    println("pairs2: " + out2)
    spark.stop()
  }
}
