package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev scaling experiment: replicate the FACT side (orders+lineitem)
  * `factor`× with shifted order keys — dims unchanged, so the
  * fact:dim ratio grows the way a real warehouse grows — and time the
  * headline queries at both scales in one warm session. Near-linear
  * ratios are the evidence that the plans (broadcast star, map-side
  * partial aggs, single-shuffle windows) hold as data outgrows the
  * test SF; a super-linear ratio would flag a hidden quadratic or a
  * broadcast about to tip over.
  *
  * Usage: runMain graft.tools.ScaleBench [srcSf] [factor] [query...]
  */
object ScaleBench {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val names = if (args.length > 2) args.drop(2).toSeq
      else Seq("q01_purchase_summary", "q11_daily_items",
               "q19_category_revenue", "q24_median_order_value")
    val dst = s"${sys.props("java.io.tmpdir")}/graft-scale$factor"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // events.parquet carries ns timestamps (see TestData.events)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    val done = new org.apache.hadoop.fs.Path(dst, "_DONE2")
    val fs = done.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(done)) {
      def t(n: String): DataFrame = spark.read.parquet(s"$src/$n.parquet")
      val maxOrder = t("orders").agg(max("o_orderkey")).head().getLong(0) + 1
      val copies = explode(array(Seq.tabulate(factor)(i => lit(i.toLong)): _*))
      t("orders").withColumn("__i", copies)
        .withColumn("o_orderkey", col("o_orderkey") + col("__i") * maxOrder)
        .drop("__i")
        .write.mode("overwrite").parquet(s"$dst/orders.parquet")
      t("lineitem").withColumn("__i", copies)
        .withColumn("l_orderkey", col("l_orderkey") + col("__i") * maxOrder)
        .drop("__i")
        .write.mode("overwrite").parquet(s"$dst/lineitem.parquet")
      // documents scale with COPY-ISOLATED tokens (each token prefixed
      // with its copy tag): every copy reproduces the original's whole
      // near-dup structure without cross-copy similarity, so the TRUE
      // pair/cluster output grows ×factor (linear), and wall-time
      // ratios measure the ALGORITHM's scaling — replicating identical
      // texts would instead ×factor² the true output (every dup group
      // merges across copies) and any engine would look quadratic.
      val maxDoc = t("documents").agg(max("doc_id")).head().getLong(0) + 1
      t("documents").withColumn("__i", copies)
        .withColumn("doc_id", col("doc_id") + col("__i") * maxDoc)
        .withColumn("text", array_join(
          transform(split(col("text"), "\\s+"),
            tok => concat(lit("c"), col("__i"), lit("_"), tok)), " "))
        .drop("__i")
        .write.mode("overwrite").parquet(s"$dst/documents.parquet")
      for (n <- Seq("region", "nation", "customer", "supplier", "part",
                    "events", "embeddings"))
        t(n).write.mode("overwrite").parquet(s"$dst/$n.parquet")
      fs.create(done).close()
    }

    for (dir <- Seq(src, dst); pass <- 1 to 2; name <- names) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, dir).count()
      println(f"[scale] $dir pass$pass $name: " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}
