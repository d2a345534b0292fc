package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamJoin

case class Click(click_id: Long, user: Long, click_time: Timestamp)
case class Buy(buy_user: Long, buy_time: Timestamp, amount: Double)

class StreamJoinSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def t(s: Long) = new Timestamp(s * 1000L)

  private val clicks = Seq(
    Click(1, 10, t(100)), Click(2, 10, t(200)),
    Click(3, 20, t(150)), Click(4, 30, t(300)))
  private val buys = Seq(
    Buy(10, t(95), 5.0),   // within 60s of click 1 only
    Buy(10, t(199), 7.0),  // within 60s of click 2 (and not click 1)
    Buy(20, t(150), 9.0),  // exactly AT click 3's time — inclusive
    Buy(30, t(230), 3.0))  // 70s before click 4 — outside lookback

  private val expected = Set((1L, 5.0), (2L, 7.0), (3L, 9.0))

  test("batch interval join: inclusive upper bound, exclusive window start") {
    val got = StreamJoin.intervalJoin(
      clicks.toDF(), buys.toDF(), "user", "buy_user",
      "click_time", "buy_time", expr("INTERVAL 60 seconds"))
      .select("click_id", "amount")
      .as[(Long, Double)].collect().toSet
    assert(got == expected)
  }

  test("streaming: watermarked stream-stream join emits the same matches") {
    implicit val sq = spark.sqlContext
    val cs = MemoryStream[Click]
    val bs = MemoryStream[Buy]
    val joined = StreamJoin.intervalJoin(
      cs.toDF().withWatermark("click_time", "30 seconds"),
      bs.toDF().withWatermark("buy_time", "30 seconds"),
      "user", "buy_user", "click_time", "buy_time",
      expr("INTERVAL 60 seconds"))
    val q = joined.select("click_id", "amount")
      .writeStream.outputMode(OutputMode.Append())
      .queryName("sj_out").format("memory").start()

    // arrivals split across micro-batches, buys both before and after
    // their matching clicks
    bs.addData(buys(0))
    cs.addData(clicks(0), clicks(2))
    q.processAllAvailable()
    bs.addData(buys(1), buys(2), buys(3))
    cs.addData(clicks(1), clicks(3))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("sj_out").as[(Long, Double)].collect().toSet
    assert(got == expected)
  }

  test("rejects overlapping column names") {
    intercept[IllegalArgumentException] {
      StreamJoin.intervalJoin(clicks.toDF(), clicks.toDF(),
        "user", "user", "click_time", "click_time", expr("INTERVAL 1 second"))
    }
  }
}
