package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TestData
import graft.text.Mixture

/** DSIR importance weighting (c10) beyond the oracle's hash check:
  * the score actually SELECTS target-looking raw docs on a planted
  * corpus, and the hashed fixed-state scale form ranks like the exact
  * raw-token form on the shipped corpus. */
class DsirSpec extends AnyFunSuite {
  import SparkTestSession._

  test("c10: planted target-vocabulary docs outrank the background pool") {
    import spark.implicits._
    // Target domain speaks {alpha..epsilon}; the raw pool speaks
    // {kappa..omicron}; two planted raw docs speak the target's
    // vocabulary. DSIR must put the planted docs at ranks 1-2 with
    // positive log-ratios and every pure-background doc negative.
    val target = (1L to 5L).map(i =>
      (i, "alpha beta gamma delta epsilon alpha beta gamma", "t"))
    val planted = Seq(
      (101L, "alpha beta gamma delta epsilon beta gamma alpha", "r"),
      (102L, "epsilon delta gamma beta alpha alpha delta beta", "r"))
    val background = (201L to 220L).map(i =>
      (i, "kappa lambda mu nu xi omicron kappa lambda mu nu", "r"))
    val docs = (target ++ planted ++ background).toDF("doc_id", "text", "g")

    val out = Mixture.importanceWeights(docs, "doc_id", "text",
        col("g") === "t")
      .orderBy(col("logratio").desc, col("doc_id")).collect()

    assert(out.map(_.getLong(0)).toSet ==
      (planted.map(_._1) ++ background.map(_._1)).toSet,
      "raw docs only, all of them")
    assert(out.take(2).map(_.getLong(0)).sorted.sameElements(
      Array(101L, 102L)), "planted target-vocab docs must rank first")
    assert(out.take(2).forall(_.getDouble(2) > 0),
      "target-vocab docs score positive")
    assert(out.drop(2).forall(_.getDouble(2) < 0),
      "background docs score negative")
  }

  test("c10: hashed fixed-state form ranks like the exact form") {
    val docs = TestData.table(spark, sf, "documents")
    val isTgt = col("source") === Mixture.DsirTargetSource
    def ranked(buckets: Int): Seq[Long] =
      Mixture.importanceWeights(docs, "doc_id", "text", isTgt, buckets)
        .orderBy(col("logratio").desc, col("doc_id"))
        .collect().map(_.getLong(0)).toSeq
    val exact = ranked(0)
    val hashed = ranked(1 << 16)
    assert(exact.size == hashed.size)
    // With 65536 buckets over a few-thousand-word vocabulary,
    // collisions perturb scores only marginally: the selected top
    // slice must agree almost entirely (this is the paper's operating
    // regime — hashing trades exactness for bounded model state).
    val k = math.min(Mixture.DsirTopK, exact.size)
    val overlap = exact.take(k).toSet.intersect(hashed.take(k).toSet).size
    assert(overlap >= (k * 0.9).toInt,
      s"top-$k overlap $overlap below 90% — hashing broke the ranking")
  }

  test("c10: factored frozen-model path reproduces the fused form exactly") {
    val docs = TestData.table(spark, sf, "documents")
    val isTgt = col("source") === Mixture.DsirTargetSource
    for (buckets <- Seq(0, 1 << 16)) {
      val fused = Mixture.importanceWeights(docs, "doc_id", "text",
        isTgt, buckets)
      val m = Mixture.dsirModel(docs, "text", isTgt, buckets)
      val factored = Mixture.scoreUnderModel(
        docs.filter(!isTgt), "doc_id", "text", m)
      assert(fused.exceptAll(factored).isEmpty &&
        factored.exceptAll(fused).isEmpty,
        s"factored/fused diverged at hashBuckets=$buckets")
    }
  }

  test("c10: weights are invariant under repartitioning") {
    import spark.implicits._
    val docs = TestData.table(spark, sf, "documents")
    val isTgt = col("source") === Mixture.DsirTargetSource
    val a = Mixture.importanceWeights(docs, "doc_id", "text", isTgt)
    val b = Mixture.importanceWeights(docs.repartition(17), "doc_id",
      "text", isTgt)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "integer-grid scores must not depend on partitioning")
  }

  test("c10: empty target or raw pool fails fast") {
    import spark.implicits._
    val docs = Seq((1L, "a b c", "r"), (2L, "d e f", "r"))
      .toDF("doc_id", "text", "g")
    val e = intercept[IllegalArgumentException](
      Mixture.importanceWeights(docs, "doc_id", "text", col("g") === "t")
        .collect())
    assert(e.getMessage.contains("non-empty"))
  }
}
