package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Dedup
import graft.sources.TestData
import graft.text.TextFunctions

/** The row-local signature kernels must equal the aggregation
  * formulations BIT-FOR-BIT on real documents — they replace a
  * shuffle, not the semantics. Any drift here silently changes d02/d03
  * candidates and the incremental dedup index. */
class SignatureParitySpec extends AnyFunSuite {
  import SparkTestSession._
  import graft.functions.signatures._

  private val NumHashes = 32

  test("minhash_signature == explode+groupBy signatures on real docs") {
    val docs = TestData.table(spark, sf, "documents")
    // independent aggregation-path reference (the pre-kernel shape)
    val ex = docs.select(col("doc_id"),
      explode(TextFunctions.shingles(col("text"), 1)).as("__s"))
    val minAggs = Seq.tabulate(NumHashes)(i =>
      min(xxhash64(col("__s"), lit(i + 1))).as(s"__h$i"))
    val aggs = minAggs :+ sort_array(collect_set(xxhash64(col("__s")))).as("shh")
    val ref = ex.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"), col("shh"),
        array(Seq.tabulate(NumHashes)(i => col(s"__h$i")): _*).as("sig"))
      .collect().map(r => r.getLong(0) ->
        (r.getSeq[Long](1), r.getSeq[Long](2))).toMap

    val got = docs.select(col("doc_id"),
        minhash_signature(col("text"), NumHashes).as("m"))
      .select(col("doc_id"), col("m.shh"), col("m.sig"))
      .collect().map(r => r.getLong(0) ->
        (r.getSeq[Long](1), r.getSeq[Long](2))).toMap

    assert(got.keySet == ref.keySet)
    got.keySet.foreach { id =>
      assert(got(id)._1 == ref(id)._1, s"doc $id: shh diverged")
      assert(got(id)._2 == ref(id)._2, s"doc $id: sig diverged")
    }
  }

  test("simhash_packed == explode+agg packed signatures on real docs") {
    val docs = TestData.table(spark, sf, "documents")
    val ref = Dedup.simhashSignaturesPacked(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val got = docs.select(col("doc_id"), simhash_packed(col("text")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == ref)
  }

  test("simhash_packed_md5 == the Column-form portable signature on real docs") {
    // the md5-nibble convention has two implementations: the Column
    // fold (Dedup.simhashPackedPortable — the executable spec, also
    // mirrored by the DuckDB d03 oracle) and the codegen kernel the
    // catalog query runs; they must agree bit-for-bit
    val docs = TestData.table(spark, sf, "documents")
      .filter(col("text").isNotNull)
    val ref = docs.select(col("doc_id"),
        Dedup.simhashPackedPortable(col("text")).as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val got = docs.select(col("doc_id"),
        simhash_packed_md5(col("text")).as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == ref)
  }

  test("kernels participate in codegen; repeated use in one stage compiles") {
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val docs = TestData.table(spark, sf, "documents").limit(50)
      val n = docs
        .filter(simhash_packed(col("text")).isNotNull &&
          minhash_signature(col("text"), 8).isNotNull)
        .select(simhash_packed(col("text")).as("s1"),
          simhash_packed(col("text")).as("s2"),
          minhash_signature(col("text"), 8).as("m1"),
          minhash_signature(col("text"), 8).as("m2"))
        .count()
      assert(n == 50)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }

  test("signature stage plans with no exchange (the point of the kernel)") {
    val docs = TestData.table(spark, sf, "documents")
    val plan = docs.select(col("doc_id"),
        minhash_signature(col("text"), NumHashes).as("m"))
      .queryExecution.executedPlan
    val exchanges = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.isEmpty, s"signature stage shuffles:\n$plan")
  }
}
