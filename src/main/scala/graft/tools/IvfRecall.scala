package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.similarity.Similarity
import graft.sources.TestData

/** Recall@10 of the IVF ANN probe vs the exact brute-force top-10,
  * averaged over the first `nQueries` vectors, for the stride-seed
  * quantizer (refineSteps=0) and the Lloyd-refined one — the
  * measurement behind s03's pinned recall spec.
  *
  * Usage: runMain graft.tools.IvfRecall <sfDir> [nQueries] [nProbe]
  */
object IvfRecall {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nQueries = args.lift(1).map(_.toInt).getOrElse(20)
    val nProbe = args.lift(2).map(_.toInt).getOrElse(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = TestData.table(spark, sfDir, "embeddings").cache()
    val queries = emb.filter(col("vec_id") < nQueries)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))

    for (steps <- Seq(0, 1, 2)) {
      val cents = Similarity.ivfCentroids(emb, "vec_id", "embedding",
        k = 16, refineSteps = steps)
      val listed = Similarity.withIvfLists(emb, "embedding", cents).cache()
      val recalls = queries.map { case (qid, q) =>
        val corpus = listed.filter(col("vec_id") =!= qid)
        val exact = Similarity.bruteForceTopK(
          emb.filter(col("vec_id") =!= qid), "vec_id", "embedding", q, 10)
          .collect().map(_.getLong(0)).toSet
        val ann = Similarity.ivfTopK(corpus, "vec_id", "embedding", q, 10,
          cents, nProbe).collect().map(_.getLong(0)).toSet
        ann.intersect(exact).size / 10.0
      }
      println(f"[ivf] $sfDir refineSteps=$steps nProbe=$nProbe " +
        f"meanRecall@10=${recalls.sum / recalls.length}%.3f " +
        f"min=${recalls.min}%.2f")
      listed.unpersist()
    }
    spark.stop()
  }
}
