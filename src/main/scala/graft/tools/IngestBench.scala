package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.cdc._
import graft.operators.PurchaseSummary
import graft.sources.ReferenceCsv
import graft.streaming.DynamicTable

case class TxChangeRow(transaction_id: String, customer_id: Int,
  product_id: Int, merchant_id: Int, transaction_date: java.sql.Date,
  transaction_time: String, quantity: Int, total_price: Double,
  transaction_card: String, transaction_category: String,
  _op: String, _lsn: Long, _commit_ts: java.sql.Timestamp)

/** Measures the CDC → dynamic-table pipeline against BASELINE.md's
  * engine targets (sustained ingest ≥ 1e5 rows/min locally; change →
  * view latency ≤ TARGET_LAG). Prints one JSON line.
  */
object IngestBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val dir = Files.createTempDirectory("graft-ingest").toString
    val tables = ReferenceCsv.loadAll(spark, "/root/reference/scripts/postgres_csv")
    def viewOf(tx: DataFrame): DataFrame =
      PurchaseSummary.customerPurchaseSummary(
        tx, tables("customers"), tables("products"), tables("merchants"))

    val fact = new ReplicatedTable(spark, s"$dir/tx", Seq("transaction_id"))
    val result = new ReplicatedTable(spark, s"$dir/view", Seq("transaction_id"))
    fact.snapshot(tables("transactions"))
    val dt = new DynamicTable(fact, result, viewOf)
    dt.fullRefresh()

    val n = 20000
    val changes = TransactionGenerator.generate(
      spark, tables("customers"), tables("products"), tables("merchants"),
      n = n, seed = 99L, startLsn = 1000L)
      .as[TxChangeRow].collect()

    // batch apply throughput (one micro-batch of n rows through the merge)
    val t0 = System.nanoTime()
    val batchDf = changes.toSeq.toDF()
    fact.applyChanges(batchDf)
    dt.incrementalRefresh(batchDf)
    val batchSec = (System.nanoTime() - t0) / 1e9

    // streaming change→view latency across 10 micro-batches of 500 rows
    val fact2 = new ReplicatedTable(spark, s"$dir/tx2", Seq("transaction_id"))
    val result2 = new ReplicatedTable(spark, s"$dir/view2", Seq("transaction_id"))
    fact2.snapshot(tables("transactions"))
    val dt2 = new DynamicTable(fact2, result2, viewOf)
    dt2.fullRefresh()
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[TxChangeRow]
    val q = dt2.start(stream.toDF(), s"$dir/ckpt",
      trigger = Trigger.ProcessingTime(0))
    val batches = 20
    val per = 500
    // per-batch change→view latency: enqueue, then wait until the view
    // reflects the batch (processAllAvailable returns once the
    // foreachBatch — replica merge + incremental view refresh — is
    // done). p95 over the batches is the SLA number BASELINE.md's
    // TARGET_LAG contract asks about.
    val latencies = (0 until batches).map { i =>
      val t = System.nanoTime()
      stream.addData(changes.slice(i * per, (i + 1) * per).toIndexedSeq)
      q.processAllAvailable()
      (System.nanoTime() - t) / 1e9
    }.sorted
    val streamSec = latencies.sum
    val p50 = latencies((latencies.size - 1) / 2)
    val p95 = latencies(math.ceil(latencies.size * 0.95).toInt - 1)
    // sustained streaming throughput: the 500-row batches above are
    // latency probes (fixed per-micro-batch scheduling cost dominates);
    // sustained rows/min is measured with production-sized micro-batches
    // through the SAME streaming pipeline
    val bulk = TransactionGenerator.generate(
      spark, tables("customers"), tables("products"), tables("merchants"),
      n = 30000, seed = 101L, startLsn = 200000L)
      .as[TxChangeRow].collect()
    val tBulk = System.nanoTime()
    (0 until 3).foreach { i =>
      stream.addData(bulk.slice(i * 10000, (i + 1) * 10000).toIndexedSeq)
      q.processAllAvailable()
    }
    val bulkSec = (System.nanoTime() - tBulk) / 1e9
    q.stop()

    // change → DEEPEST-view latency through a 2-hop DAG: hop 1 is the
    // flagship dim-join view, hop 2 a row-local derivation over hop
    // 1's OUTPUT (spend-bucket + cents — the view-over-view shape the
    // reference's dynamic-table pipelines stack). One trigger covers
    // the whole chain (DynamicTable.startDag), so the SLA contract is
    // unchanged: p95 change→deepest-view vs TARGET_LAG = 60 s.
    def viewOf2(v1: DataFrame): DataFrame = {
      import org.apache.spark.sql.functions._
      v1.select(col("transaction_id"), col("customer_id"),
        col("merchant_name"), col("transaction_date"),
        col("total_price"),
        (col("total_price") * 100).cast("long").as("cents"),
        when(col("total_price") < 50, "small")
          .when(col("total_price") < 500, "mid")
          .otherwise("large").as("bucket"))
    }
    val fact3 = new ReplicatedTable(spark, s"$dir/tx3", Seq("transaction_id"))
    val mid3 = new ReplicatedTable(spark, s"$dir/mid3", Seq("transaction_id"))
    val top3 = new ReplicatedTable(spark, s"$dir/top3", Seq("transaction_id"))
    fact3.snapshot(tables("transactions"))
    val dag1 = new DynamicTable(fact3, mid3, viewOf)
    val dag2 = new DynamicTable(mid3, top3, viewOf2)
    dag2.incrementalRefresh(dag1.fullRefresh())
    val dagStream = MemoryStream[TxChangeRow]
    val qd = dag1.startDag(dagStream.toDF(), s"$dir/ckpt-dag", Seq(dag2),
      trigger = Trigger.ProcessingTime(0))
    val dagLat = (0 until batches).map { i =>
      val t = System.nanoTime()
      dagStream.addData(changes.slice(i * per, (i + 1) * per).toIndexedSeq)
      qd.processAllAvailable()
      (System.nanoTime() - t) / 1e9
    }.sorted
    qd.stop()
    val dagP50 = dagLat((dagLat.size - 1) / 2)
    val dagP95 = dagLat(math.ceil(dagLat.size * 0.95).toInt - 1)

    // partitioned star path: date-partitioned fact AND view, plus a
    // dimension-delta refresh (the affected-fact recompute)
    val star = new StarReplication(spark, s"$dir/star")
    star.snapshotAll(tables("transactions"), tables("customers"),
      tables("products"), tables("merchants"))
    val t2 = System.nanoTime()
    star.applyBatch("transactions", batchDf)
    val partBatchSec = (System.nanoTime() - t2) / 1e9
    val someProduct = tables("products").head()
    val t3 = System.nanoTime()
    star.applyBatch("products", Seq((someProduct.getInt(0), "bench-renamed",
      someProduct.getString(2), someProduct.getDouble(3) * 1.1,
      CdcApply.Update, 99999L, new java.sql.Timestamp(0)))
      .toDF("product_id", "product_name", "product_category", "price",
            "_op", "_lsn", "_commit_ts"))
    val dimSec = (System.nanoTime() - t3) / 1e9

    val rowsPerMinBatch = n / batchSec * 60
    val rowsPerMinStream = (batches * per) / streamSec * 60
    println(f"""{"batch_rows":$n,"batch_sec":$batchSec%.2f,""" +
      f""""batch_rows_per_min":${rowsPerMinBatch}%.0f,""" +
      f""""stream_batches":$batches,"stream_rows":${batches * per},""" +
      f""""stream_sec":$streamSec%.2f,""" +
      f""""stream_latency_p50_sec":$p50%.2f,""" +
      f""""stream_latency_p95_sec":$p95%.2f,""" +
      f""""stream_rows_per_min":${rowsPerMinStream}%.0f,""" +
      f""""dag2_latency_p50_sec":$dagP50%.2f,""" +
      f""""dag2_latency_p95_sec":$dagP95%.2f,""" +
      f""""stream_bulk_rows":30000,"stream_bulk_sec":$bulkSec%.2f,""" +
      f""""stream_bulk_rows_per_min":${30000 / bulkSec * 60}%.0f,""" +
      f""""partitioned_star_batch_sec":$partBatchSec%.2f,""" +
      f""""dim_delta_refresh_sec":$dimSec%.2f}""")
    spark.stop()
  }
}
