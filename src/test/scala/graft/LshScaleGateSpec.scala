package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.similarity.Similarity
import graft.sources.TestData

/** Gates the LSH scale forms of embedding dedup against their exact
  * baselines on the SHIPPED corpora (not just random property
  * corpora): e03's oracle row in CORRECTNESS is only valid while
  * multi-table recall stays 100% here, and the subset property (never
  * a false pair) must hold at ANY table count because verification is
  * exact. Measured headroom: tables=16 already reaches 100% recall on
  * sf0.01 and sf0.1 (LshRecall tool); the catalog pins tables=20.
  */
class LshScaleGateSpec extends AnyFunSuite {
  import SparkTestSession._

  private def pairKey(r: org.apache.spark.sql.Row) =
    (r.getLong(0), r.getLong(1), r.getDouble(2))

  test("e03: multi-table LSH pairs == exact brute-force pairs (sf0.001 + sf0.01)") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val emb = TestData.table(spark, dir, "embeddings").cache()
      val exact = Similarity.exactCosinePairs(emb, "vec_id", "embedding", Similarity.PairThreshold)
        .select(col("a").cast("long"), col("b").cast("long"), col("cosine"))
        .collect().map(pairKey).toSet
      val lsh = Similarity.cosineNearDuplicatesMulti(
          emb, "vec_id", "embedding", Similarity.PairThreshold,
        tables = Similarity.PairTables)
        .select(col("a").cast("long"), col("b").cast("long"), col("cosine"))
        .collect().map(pairKey).toSet
      assert(exact.nonEmpty, s"$dir: degenerate gate — no exact pairs")
      assert(lsh == exact,
        s"$dir: missed ${(exact -- lsh).take(5)} extra ${(lsh -- exact).take(5)}")
      emb.unpersist()
    }
  }

  test("e03: recall stays 100% on the bench corpus (sf0.1)") {
    val emb = TestData.table(spark, "/root/testdata/sf0.1", "embeddings").cache()
    val exact = Similarity.exactCosinePairs(emb, "vec_id", "embedding", Similarity.PairThreshold)
      .select(col("a").cast("long"), col("b").cast("long"), col("cosine"))
      .collect().map(pairKey).toSet
    val lsh = Similarity.cosineNearDuplicatesMulti(
        emb, "vec_id", "embedding", Similarity.PairThreshold,
        tables = Similarity.PairTables)
      .select(col("a").cast("long"), col("b").cast("long"), col("cosine"))
      .collect().map(pairKey).toSet
    assert(exact.size >= 900, s"corpus drifted: ${exact.size} exact pairs")
    assert(lsh == exact,
      s"missed ${(exact -- lsh).take(5)} extra ${(lsh -- exact).take(5)}")
    emb.unpersist()
  }

  test("e03 subset property: few tables may miss pairs but never invent them") {
    val emb = TestData.table(spark, "/root/testdata/sf0.01", "embeddings")
    val exact = Similarity.exactCosinePairs(emb, "vec_id", "embedding", Similarity.PairThreshold)
      .select(col("a").cast("long"), col("b").cast("long"), col("cosine"))
      .collect().map(pairKey).toSet
    val lsh = Similarity.cosineNearDuplicatesMulti(
        emb, "vec_id", "embedding", Similarity.PairThreshold, tables = 2)
      .select(col("a").cast("long"), col("b").cast("long"), col("cosine"))
      .collect().map(pairKey).toSet
    assert(lsh.subsetOf(exact), s"non-subset pairs: ${(lsh -- exact).take(5)}")
  }

  test("e03 plan shape: no quadratic join anywhere in the LSH pipeline") {
    // the entire point of the scale form is replacing e02's
    // BroadcastNestedLoopJoin with bucket-local candidates + equi-join
    // verification — a quadratic operator reappearing in this plan is
    // a regression even if results stay right
    val emb = TestData.table(spark, "/root/testdata/sf0.01", "embeddings")
    val df = Similarity.cosineNearDuplicatesMulti(
      emb, "vec_id", "embedding", Similarity.PairThreshold,
        tables = Similarity.PairTables)
    df.count()
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val quadratic = plan.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
      case j: org.apache.spark.sql.execution.joins.CartesianProductExec => j
    }
    assert(quadratic.isEmpty, s"LSH pipeline planned a quadratic join:\n$plan")
  }

  test("e04: bucketed self-NN == exact argmax restricted to the 0.4 band") {
    val emb = TestData.table(spark, "/root/testdata/sf0.01", "embeddings").cache()
    val exact = Similarity.selfNearestNeighbor(emb, "vec_id", "embedding")
      .filter(col("cosine") >= Similarity.PairThreshold)
      .select(col("id").cast("long"), col("nn").cast("long"), col("cosine"))
      .collect().map(pairKey).toSet
    val bucketed = Similarity.selfNearestNeighborBucketed(
        emb, "vec_id", "embedding", Similarity.PairThreshold,
        tables = Similarity.PairTables)
      .select(col("id").cast("long"), col("nn").cast("long"), col("cosine"))
      .collect().map(pairKey).toSet
    assert(exact.nonEmpty, "degenerate gate — no vectors in the band")
    assert(bucketed == exact,
      s"missed ${(exact -- bucketed).take(5)} extra ${(bucketed -- exact).take(5)}")
    emb.unpersist()
  }
}
