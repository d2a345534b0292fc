package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.similarity.Similarity
import graft.sources.TestData

/** Recall@10 of the multi-table LSH ANN probe vs exact brute force,
  * averaged over the first `nQueries` vectors — the measurement behind
  * s02's pinned recall spec (the single-table probe measured ~0 recall
  * on this gapless corpus; OR-amplification is what makes LSH top-k
  * usable here).
  *
  * Usage: runMain graft.tools.AnnRecall <sfDir> [nQueries] [tables]
  */
object AnnRecall {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nQueries = args.lift(1).map(_.toInt).getOrElse(10)
    val tables = args.lift(2).map(_.toInt).getOrElse(8)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = TestData.table(spark, sfDir, "embeddings").cache()
    val dir = java.nio.file.Files.createTempDirectory("graft-annrecall").toString
    val idx = Similarity.ensureLshIndexMulti(emb, "embedding",
      s"$dir/lsh", tables = tables)
    val queries = emb.filter(col("vec_id") < nQueries)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val recalls = queries.map { case (qid, q) =>
      val exact = Similarity.bruteForceTopK(
        emb.filter(col("vec_id") =!= qid), "vec_id", "embedding", q, 10)
        .collect().map(_.getLong(0)).toSet
      val ann = Similarity.annTopKMulti(
        idx.filter(col("vec_id") =!= qid), "vec_id", "embedding", q, 10,
        tables = tables).collect().map(_.getLong(0)).toSet
      ann.intersect(exact).size / 10.0
    }
    println(f"[ann] $sfDir tables=$tables " +
      f"meanRecall@10=${recalls.sum / recalls.length}%.3f min=${recalls.min}%.2f")
    spark.stop()
  }
}
