package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A fastText-shaped document quality classifier: logistic regression
  * over hashed bag-of-words features, trained IN the engine.
  *
  * Features are md5-bucketed token counts ([[TextFunctions.md5Bucket]]
  * — the engine-portable hash, so a frozen model scores identically
  * in any engine). Training is batch gradient descent expressed as
  * Spark aggregations: each round is two map-side-combined shuffles
  * over the cached feature table (margins per doc, then gradients per
  * bucket) and a NumBuckets-sized driver collect — bounded by the
  * model, never the corpus. At 100 TB the feature table is
  * |docs|·avg_distinct_buckets rows; rounds are linear scans of it.
  *
  * Scoring with a frozen model works on an exact integer grid:
  * weights are micro-units (1e-6) BIGINTs, the margin is an exact
  * integer sum (addition-order-free, so Spark and a SQL oracle agree
  * bit-for-bit), and only the final sigmoid touches doubles.
  */
object TextClassifier {

  val NumBuckets = 64

  /** Hashed feature id of one token. */
  def bucket(token: Column): Column =
    TextFunctions.md5Bucket(token, NumBuckets)

  /** (id, h, cnt) hashed bag-of-words features of a corpus. */
  def featurize(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol),
        explode(TextFunctions.tokens(col(textCol))).as("__t"))
      .select(col(idCol), bucket(col("__t")).as("h"))
      .groupBy(col(idCol), col("h"))
      .agg(count(lit(1)).cast("double").as("cnt"))

  /** Frozen default model for the t17 catalog entry: micro-unit
    * weights (index = bucket) + bias, produced by [[train]] against
    * the t02 heuristic quality gate on the sf0.01 corpus (the
    * distillation story: a cheap linear model learns the handwritten
    * gate) and frozen via graft.tools.TrainTextClassifier. */
  val DefaultBiasMicro: Long = -10443315L
  val DefaultWeightsMicro: Seq[Long] = Seq(
    151549L, 0L, 0L, 0L, 46120L, 87565L, 0L, 0L,
    0L, 0L, 0L, 0L, 0L, 61541L, 0L, 0L,
    508323L, 0L, 0L, 723784L, -583347L, 0L, 0L, 47101L,
    0L, 258908L, 0L, 0L, 0L, 0L, 0L, -86772L,
    0L, 111317L, 169020L, -292756L, 0L, 57834L, 0L, 200138L,
    0L, 0L, 1970970L, 0L, -185264L, -21965L, -616555L, 186425L,
    -16712L, 0L, 0L, 0L, -238128L, 282943L, -152126L, 0L,
    280580L, 522572L, 436795L, 1984235L, 0L, 64063L, 0L, 0L)

  /** Exact integer margin (micro-units) of each doc under a frozen
    * model: Σ_token w_micro[h(token)] + bias. Addition-order-free, so
    * any engine computes the identical BIGINT. */
  def marginMicro(docs: DataFrame, idCol: String, textCol: String,
                  weightsMicro: Seq[Long] = DefaultWeightsMicro,
                  biasMicro: Long = DefaultBiasMicro): DataFrame = {
    val warr = array(weightsMicro.map(lit): _*)
    docs.select(col(idCol),
        explode(TextFunctions.tokens(col(textCol))).as("__t"))
      .select(col(idCol), bucket(col("__t")).as("__h"))
      .groupBy(col(idCol))
      .agg((sum(element_at(warr, col("__h") + 1)) + biasMicro)
        .cast("long").as("score_micro"))
  }

  /** Train by batch gradient descent; returns (weights, bias) as
    * doubles. Labels: (idCol, label) with label in {0.0, 1.0}. */
  def train(docs: DataFrame, idCol: String, textCol: String,
            labels: DataFrame, iters: Int = 100,
            lr: Double = 0.5): (Array[Double], Double) = {
    val feats = featurize(docs, idCol, textCol)
      .join(labels.select(col(idCol), col("label").cast("double")), idCol)
      .cache()
    try {
      val n = labels.count().toDouble
      val w = new Array[Double](NumBuckets)
      var b = 0.0
      for (_ <- 0 until iters) {
        val warr = array(w.toSeq.map(lit): _*)
        val err = feats
          .groupBy(col(idCol))
          .agg((sum(element_at(warr, col("h") + 1) * col("cnt")) + b)
                 .as("m"),
               first(col("label")).as("y"))
          .select(col(idCol),
            (lit(1.0) / (lit(1.0) + exp(-col("m"))) - col("y")).as("e"))
        val grads = feats.join(err, idCol)
          .groupBy("h").agg(sum(col("e") * col("cnt")).as("g"))
          .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
        val gb = err.agg(sum("e")).collect()(0).getDouble(0)
        for (j <- 0 until NumBuckets)
          w(j) -= lr * grads.getOrElse(j, 0.0) / n
        b -= lr * gb / n
      }
      (w, b)
    } finally { feats.unpersist(); () }
  }
}
