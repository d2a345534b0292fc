package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.similarity.Similarity
import graft.sources.TestData

/** Recall diagnostics for the OR-amplified embedding LSH: compares
  * [[Similarity.cosineNearDuplicatesMulti]] against the exact
  * brute-force pair set at a given threshold and table counts — the
  * measurement behind the pinned `tables` default (the catalog's e03
  * gate needs measured-100% recall on the shipped corpora to share the
  * exact oracle).
  *
  * Usage: runMain graft.tools.LshRecall <sfDir> <threshold> [tables...]
  */
object LshRecall {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val threshold = args.lift(1).map(_.toDouble).getOrElse(0.4)
    val tableCounts = if (args.length > 2) args.drop(2).toSeq.map(_.toInt)
                      else Seq(8, 12, 16)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = TestData.table(spark, sfDir, "embeddings").cache()
    val exact = Similarity.exactCosinePairs(emb, "vec_id", "embedding", threshold)
      .cache()
    val nExact = exact.count()
    println(f"[recall] exact pairs >= $threshold at $sfDir: $nExact")
    for (t <- tableCounts) {
      val t0 = System.nanoTime()
      val lsh = Similarity.cosineNearDuplicatesMulti(
        emb, "vec_id", "embedding", threshold, tables = t).cache()
      val nLsh = lsh.count()
      val extra = lsh.join(exact, Seq("a", "b"), "left_anti").count()
      val missed = exact.join(lsh, Seq("a", "b"), "left_anti")
      val nMissed = missed.count()
      println(f"[recall] tables=$t%2d: found $nLsh, missed $nMissed, " +
        f"non-subset $extra, recall ${
          if (nExact == 0) 1.0 else (nExact - nMissed).toDouble / nExact}%.4f, " +
        f"${(System.nanoTime() - t0) / 1e9}%.1f s")
      if (nMissed > 0) missed.orderBy("a", "b").show(20, false)
      lsh.unpersist()
    }
    spark.stop()
  }
}
