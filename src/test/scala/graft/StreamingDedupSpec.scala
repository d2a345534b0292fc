package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingDedup

case class Doc(doc_id: Long, fp: String, event_time: Timestamp)

class StreamingDedupSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def t(s: Long) = new Timestamp(s * 1000L)

  test("watermarked streaming dedup keeps one row per fingerprint across batches") {
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[Doc]
    val out = StreamingDedup.firstSeen(
      stream.toDF(), "event_time", "10 minutes", "fp")
    val q = out.writeStream.outputMode(OutputMode.Append())
      .queryName("dedup_out").format("memory")
      .trigger(Trigger.ProcessingTime(200)).start()

    stream.addData(Doc(1, "A", t(10)), Doc(2, "A", t(20)), Doc(3, "B", t(30)))
    q.processAllAvailable()
    // duplicate of A arrives in a LATER micro-batch — still dropped
    stream.addData(Doc(4, "A", t(40)), Doc(5, "C", t(50)))
    q.processAllAvailable()
    q.stop()

    val kept = spark.table("dedup_out").select("doc_id", "fp")
      .as[(Long, String)].collect().sortBy(_._1)
    assert(kept.map(_._2).toSet == Set("A", "B", "C"))
    assert(kept.count(_._2 == "A") == 1)
    assert(kept.map(_._1).toSet.subsetOf(Set(1L, 2L, 3L, 5L)))
  }

  test("typed mapGroupsWithState dedup: first seen wins, later batches filtered") {
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[Doc]
    val out = StreamingDedup.firstSeenTyped[Doc](stream.toDS(), _.fp)
    val q = out.writeStream.outputMode(OutputMode.Update())
      .queryName("dedup_typed_out").format("memory")
      .trigger(Trigger.ProcessingTime(200)).start()

    stream.addData(Doc(1, "X", t(1)), Doc(2, "X", t(2)), Doc(3, "Y", t(3)))
    q.processAllAvailable()
    stream.addData(Doc(4, "X", t(4)), Doc(5, "Z", t(5)))
    q.processAllAvailable()
    q.stop()

    val kept = spark.table("dedup_typed_out")
      .as[Doc].collect().sortBy(_.doc_id)
    assert(kept.map(_.fp).toSet == Set("X", "Y", "Z"))
    assert(kept.count(_.fp == "X") == 1)
    assert(kept.head.doc_id == 1L)
  }

  test("typed dedup with `within` ordering: deterministic survivor per batch") {
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[Doc]
    // min event_time (ties by id) wins within the batch, regardless of
    // partition arrival order
    val out = StreamingDedup.firstSeenTyped[Doc](stream.toDS(), _.fp,
      within = Some(Ordering.by((d: Doc) => (d.event_time.getTime, d.doc_id))))
    val q = out.writeStream.outputMode(OutputMode.Update())
      .queryName("dedup_within_out").format("memory")
      .trigger(Trigger.ProcessingTime(200)).start()

    // doc 2 has the EARLIEST event time of fingerprint W in the batch
    stream.addData(Doc(1, "W", t(9)), Doc(2, "W", t(3)), Doc(3, "W", t(7)),
      Doc(4, "V", t(1)))
    q.processAllAvailable()
    q.stop()

    val kept = spark.table("dedup_within_out").as[Doc].collect().sortBy(_.fp)
    assert(kept.map(_.fp).toSeq == Seq("V", "W"))
    assert(kept.find(_.fp == "W").get.doc_id == 2L)
  }
}
