package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, ShuffleQueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The co-located-join posture claimed in COVERAGE.md, demonstrated:
  * two tables bucketed on the join key join WITHOUT a shuffle (no
  * ShuffleExchange on either side of the join in the physical plan),
  * while the same join over plain parquet shuffles both sides. This is
  * the big-fact ⋈ big-fact answer at 100 TB — pre-bucket both sides on
  * the key and every later join/aggregation on that key is
  * exchange-free.
  */
class BucketedJoinSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  /** Shuffle nodes of an EXECUTED frame, looking through AQE (which
    * rewraps exchanges as query stages in its final plan). */
  private def shufflesOf(df: DataFrame): Seq[SparkPlan] = {
    val top = df.queryExecution.executedPlan
    val finalPlan = top match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    finalPlan.collect {
      case s: ShuffleQueryStageExec => s
      case s: ShuffleExchangeExec => s
    }
  }

  test("bucketed tables join without a shuffle; plain parquet shuffles") {
    // managed tables land in the session's default warehouse
    // (spark-warehouse/, gitignored) and are dropped in finally
    // disable broadcast so the join strategy is decided by partitioning
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val left = (1 to 5000).map(i => (i.toLong, s"l$i")).toDF("k", "lv")
      val right = (1 to 5000).map(i => (i.toLong, i * 2.0)).toDF("k", "rv")

      left.write.mode("overwrite").bucketBy(8, "k")
        .sortBy("k").saveAsTable("graft_bucketed_left")
      right.write.mode("overwrite").bucketBy(8, "k")
        .sortBy("k").saveAsTable("graft_bucketed_right")

      val bucketedJoin = spark.table("graft_bucketed_left")
        .join(spark.table("graft_bucketed_right"), Seq("k"))
      assert(bucketedJoin.count() == 5000)
      val bucketedShuffles = shufflesOf(bucketedJoin)
      assert(bucketedShuffles.isEmpty,
        s"bucketed join must not shuffle:\n${bucketedJoin.queryExecution.executedPlan}")

      // same data as plain parquet: the join must shuffle both sides
      val dir = Files.createTempDirectory("graft-plain").toString
      left.write.mode("overwrite").parquet(s"$dir/l")
      right.write.mode("overwrite").parquet(s"$dir/r")
      val plainJoin = spark.read.parquet(s"$dir/l")
        .join(spark.read.parquet(s"$dir/r"), Seq("k"))
      assert(plainJoin.count() == 5000)
      val plainShuffles = shufflesOf(plainJoin)
      assert(plainShuffles.nonEmpty, "plain parquet join should shuffle")

      // bucketing also serves aggregation on the bucket key shuffle-free
      val agg = spark.table("graft_bucketed_left").groupBy("k").count()
      assert(agg.count() == 5000)
      assert(shufflesOf(agg).isEmpty, "groupBy on the bucket key must not shuffle")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_bucketed_left")
      spark.sql("DROP TABLE IF EXISTS graft_bucketed_right")
    }
  }
}
