package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.TextFunctions

/** Dev profiling harness for the prefix-filtered jaccard join stages. */
object ProfileJ01 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[j01] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select(col("doc_id"), col("source"),
        array_distinct(TextFunctions.tokens(col("text"))).as("w"))
    val t = 0.7
    def plen(n: org.apache.spark.sql.Column) =
      (n - ceil(lit(t) * n) + 1).cast("int")
    val ex = docs.select(col("source"), col("doc_id").as("__id"),
      explode(col("w")).as("__t"))
    val vocab = ex.groupBy("__t").agg(count(lit(1)).as("__f"))
      .select(col("__t"), row_number().over(Window.orderBy(col("__f"), col("__t"))).as("__r"))
    val sorted = ex.join(vocab, "__t").groupBy("source", "__id")
      .agg(sort_array(collect_list(col("__r"))).as("__w")).cache()
    time("tokenize+rank+sort")(sorted.count())
    val pref = sorted.select(col("source"), col("__id"), col("__w"),
      explode(slice(col("__w"), lit(1), plen(size(col("__w"))))).as("__pt"))
    val buckets = pref.groupBy("source", "__pt")
      .agg(collect_list(struct(col("__id"), col("__w"))).as("__ms"))
      .filter(size(col("__ms")) >= 2).cache()
    time("buckets")(println("[j01] buckets: " +
      buckets.select(sum(size(col("__ms"))), max(size(col("__ms")))).head()))
    val nx = size(col("x.__w")); val ny = size(col("y.__w"))
    val pairs = buckets
      .select(col("__ms"), col("__pt"), explode(col("__ms")).as("x"))
      .select(col("__pt"), col("x"), explode(col("__ms")).as("y"))
      .filter(col("x.__id") < col("y.__id"))
    time("pair explode only")(println("[j01] raw pairs: " + pairs.count()))
    val guarded = pairs
      .filter(ny >= lit(t) * nx && nx >= lit(t) * ny)
      .filter(col("__pt") === array_min(array_intersect(
        slice(col("x.__w"), lit(1), plen(nx)),
        slice(col("y.__w"), lit(1), plen(ny)))))
    time("guard")(println("[j01] guarded: " + guarded.count()))
    val out = guarded
      .withColumn("__si", size(array_intersect(col("x.__w"), col("y.__w"))))
      .withColumn("jaccard", col("__si").cast("double") / (nx + ny - col("__si")))
      .filter(col("jaccard") >= t)
    time("verify")(println("[j01] out: " + out.count()))
    spark.stop()
  }
}
