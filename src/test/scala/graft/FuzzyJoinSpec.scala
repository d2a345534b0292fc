package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Dedup

/** The deletion-neighborhood fuzzy join must be EXACT: identical pairs
  * to the brute-force all-pairs levenshtein filter — the candidate
  * scheme's completeness claim (one edit always shares a deletion
  * key), verified on real data and on handcrafted insert/delete/
  * substitute cases the synthetic names don't exercise. */
class FuzzyJoinSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("equals brute force on the customer names") {
    val c = graft.sources.TestData.table(spark, sf, "customer")
      .select("c_custkey", "c_name")
    val got = Dedup.editDistance1Join(c, "c_custkey", "c_name")
      .as[(Long, Long, Long)].collect().toSet
    val brute = c.as("x").join(c.as("y"),
        col("x.c_custkey") < col("y.c_custkey"))
      .withColumn("dist", levenshtein(col("x.c_name"), col("y.c_name")))
      .filter(col("dist") <= 1)
      .select(col("x.c_custkey"), col("y.c_custkey"),
        col("dist").cast("long"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == brute)
    assert(got.nonEmpty)
  }

  test("covers substitution, insertion, deletion, exact-dup, and misses dist 2") {
    val rows = Seq(
      (1L, "kitten"), (2L, "mitten"),   // substitution → dist 1
      (3L, "kittens"),                  // insertion vs 1 → dist 1
      (4L, "kitte"),                    // deletion vs 1 → dist 1
      (5L, "kitten"),                   // exact duplicate → dist 0
      (6L, "mittens"),                  // dist 2 from kitten — excluded
      (7L, "zebra")                     // unrelated
    ).toDF("id", "s")
    val got = Dedup.editDistance1Join(rows, "id", "s")
      .as[(Long, Long, Long)].collect().toSet
    assert(got.contains((1L, 2L, 1L)))
    assert(got.contains((1L, 3L, 1L)))
    assert(got.contains((1L, 4L, 1L)))
    assert(got.contains((1L, 5L, 0L)))
    assert(!got.exists { case (a, b, _) => Set(a, b) == Set(1L, 6L) })
    assert(!got.exists { case (a, b, _) => a == 7L || b == 7L })
    // completeness on this set: equals brute force
    val brute = rows.as("x").join(rows.as("y"), col("x.id") < col("y.id"))
      .withColumn("dist", levenshtein(col("x.s"), col("y.s")))
      .filter(col("dist") <= 1)
      .select(col("x.id"), col("y.id"), col("dist").cast("long"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == brute)
  }

  test("plan: one equi-join on the deletion key, no cartesian product") {
    val c = graft.sources.TestData.table(spark, sf, "customer")
      .select("c_custkey", "c_name")
    val p = Dedup.editDistance1Join(c, "c_custkey", "c_name")
      .queryExecution.executedPlan.toString
    assert(!p.toLowerCase.contains("cartesian"),
      s"candidate join must be an equi hash/merge join:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"candidate join must not be a nested loop:\n$p")
  }
}
