package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TestData
import graft.streaming.StreamingPacker
import graft.streaming.StreamingPacker.DocTok
import graft.text.TextFunctions

/** Streaming ≡ batch for sequence packing: feeding the documents table
  * through micro-batches in doc order must reproduce the batch window
  * assignment exactly (same per-doc seq_id and start offset). */
class StreamingPackerSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val Budget = 2048L

  private def docToks() =
    TestData.table(spark, sf, "documents")
      .select(col("source"), col("doc_id"),
        TextFunctions.tokenCount(col("text")).cast("long").as("tok"))
      .as[DocTok]

  private def batchAssignment() = {
    val w = Window.partitionBy("source").orderBy("doc_id")
    docToks().toDF()
      .withColumn("start", sum(col("tok")).over(w) - col("tok"))
      .withColumn("seq_id", floor(col("start") / Budget))
      .select("source", "doc_id", "seq_id", "start")
      .as[(String, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
  }

  test("streaming packer across micro-batches matches the batch window form") {
    implicit val sq = spark.sqlContext
    val all = docToks().collect().sortBy(_.doc_id)
    val batches = all.grouped(math.max(1, all.length / 3)).toSeq

    val stream = MemoryStream[DocTok]
    val out = StreamingPacker.packAssignments(stream.toDS(), Budget)
    val q = out.writeStream.outputMode(OutputMode.Append())
      .queryName("packer_out").format("memory")
      .trigger(Trigger.ProcessingTime(100)).start()
    batches.foreach { b =>
      stream.addData(b.toIndexedSeq)
      q.processAllAvailable() // one micro-batch per chunk, in doc order
    }
    q.stop()

    val streamed = spark.table("packer_out")
      .select("source", "doc_id", "seq_id", "start")
      .as[(String, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(streamed.length == all.length)
    assert(streamed.sameElements(batchAssignment()))
  }

  test("batch-mode packer also matches (fresh state, one pass)") {
    val packed = StreamingPacker.packAssignments(docToks(), Budget)
      .select("source", "doc_id", "seq_id", "start")
      .as[(String, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(packed.sameElements(batchAssignment()))
  }

  test("cursor state is one long per source: sequences never restart across batches") {
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[DocTok]
    val q = StreamingPacker.packAssignments(stream.toDS(), 10L)
      .writeStream.outputMode(OutputMode.Append())
      .queryName("packer_state").format("memory")
      .trigger(Trigger.ProcessingTime(100)).start()
    stream.addData(DocTok("s", 1, 6), DocTok("s", 2, 6))
    q.processAllAvailable()
    stream.addData(DocTok("s", 3, 6)) // starts at 12 → seq 1, not 0
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("packer_state")
      .select("doc_id", "seq_id", "start")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.toSeq == Seq((1L, 0L, 0L), (2L, 0L, 6L), (3L, 1L, 12L)))
  }

  test("out-of-order cross-batch arrival fails loudly, not with silent divergence") {
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[DocTok]
    val q = StreamingPacker.packAssignments(stream.toDS(), 10L)
      .writeStream.outputMode(OutputMode.Append())
      .queryName("packer_ooo").format("memory")
      .trigger(Trigger.ProcessingTime(100)).start()
    stream.addData(DocTok("s", 5, 6))
    q.processAllAvailable()
    stream.addData(DocTok("s", 3, 6)) // doc 3 after doc 5 was packed
    val e = intercept[Exception] { q.processAllAvailable(); q.awaitTermination() }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("out-of-order")),
      s"expected the monotonicity guard, got: ${messages(e)}")
    try q.stop() catch { case _: Exception => () }
  }
}
