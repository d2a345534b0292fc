package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TestData
import graft.text.{Mixture, TextFunctions}

/** c11 perplexity bucketing beyond the oracle's NTILE check: the
  * threshold-sketch scale form (no per-language sort) agrees with the
  * exact form everywhere the two CAN agree, and the bucketing is
  * monotone in the score. */
class PerplexityBucketSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  // a deterministic per-doc "LM score" stand-in: any monotone scorer
  // exercises the bucketing identically, and quality_score is cheap
  private def scored = {
    val docs = TestData.table(spark, sf, "documents")
    docs.select(col("doc_id"), col("lang"),
      TextFunctions.qualityScore(col("text")).as("score"))
  }

  test("threshold scale form matches exact NTILE away from boundaries") {
    val exact = Mixture.perplexityBuckets(scored, "doc_id", "lang", "score")
      .select(col("doc_id"), col("ppl_bucket").as("b_exact"))
    val approx = Mixture.perplexityBucketsByThreshold(
        scored, "doc_id", "lang", "score")
      .select(col("doc_id"), col("ppl_bucket").as("b_approx"))
    val both = exact.join(approx, "doc_id").cache()
    try {
      val n = both.count()
      val agree = both.filter(col("b_exact") === col("b_approx")).count()
      // the two differ only where NTILE's exact size-balancing splits
      // score ties across a boundary — a sliver of the corpus
      assert(agree >= (n * 0.95).toLong,
        s"threshold buckets agree on $agree/$n docs (< 95%)")
      // and never by more than one bucket
      val far = both.filter(abs(col("b_exact") - col("b_approx")) > 1).count()
      assert(far == 0, s"$far docs moved more than one bucket")
    } finally { both.unpersist(); () }
  }

  test("both forms are monotone in the score within a language") {
    for (df <- Seq(
        Mixture.perplexityBuckets(scored, "doc_id", "lang", "score"),
        Mixture.perplexityBucketsByThreshold(
          scored, "doc_id", "lang", "score"))) {
      // bucket of the lower-scored doc never exceeds the higher's
      val viol = df.as("x").join(df.as("y"),
          col("x.lang") === col("y.lang") &&
          col("x.score") < col("y.score") &&
          col("x.ppl_bucket") > col("y.ppl_bucket"))
        .count()
      assert(viol == 0, "bucketing must be monotone in the score")
    }
  }

  test("NULL-lang docs survive the threshold form (null-safe join)") {
    val withNull = Seq(
      (1L, "en", 0.1), (2L, "en", 0.5), (3L, "en", 0.9),
      (4L, null, 0.2), (5L, null, 0.6), (6L, null, 0.8))
      .toDF("doc_id", "lang", "score")
    val exact = Mixture.perplexityBuckets(withNull, "doc_id", "lang",
      "score").collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val approx = Mixture.perplexityBucketsByThreshold(withNull, "doc_id",
      "lang", "score").collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(approx.keySet == exact.keySet,
      s"threshold form dropped docs: ${exact.keySet -- approx.keySet}")
    assert(approx == exact)
  }

  test("exact NTILE balances bucket sizes within one row per language") {
    val sizes = Mixture.perplexityBuckets(scored, "doc_id", "lang", "score")
      .groupBy("lang", "ppl_bucket").count()
      .groupBy("lang").agg((max("count") - min("count")).as("spread"))
      .filter(col("spread") > 1).count()
    assert(sizes == 0)
  }
}
