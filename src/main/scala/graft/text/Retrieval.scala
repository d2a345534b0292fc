package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sparse lexical retrieval over the documents table — the scoring
  * side of retrieval-based pipeline steps (pull the training docs most
  * similar to a benchmark item before a manual contamination audit;
  * mine domain-positive examples for a quality classifier; build the
  * BM25 baseline an embedding retriever is judged against).
  */
object Retrieval {

  /** Okapi BM25 top-k: score every document against a bag-of-words
    * query and keep the k best (score desc, id asc — deterministic).
    * Lucene's idf variant, ln(1 + (N − df + 0.5)/(df + 0.5)), so
    * scores are non-negative for any df.
    *
    * Shape at 100 TB: the token explode is filtered to the query's
    * terms SCAN-LOCALLY (isin on a literal list), so only matching
    * occurrences leave the scan — the shuffle is |matching (doc,
    * term) pairs|, not the token stream. df and the two corpus
    * scalars (N, avgdl) are one tiny aggregate each, broadcast back;
    * the final top-k is TakeOrderedAndProject (no global sort). */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               terms: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val withLen = docs.select(col(idCol),
      TextFunctions.tokens(col(textCol)).as("__t"))
      .withColumn("__dl", size(col("__t")).cast("double"))
    val stats = withLen.agg(count(lit(1)).cast("double").as("__n"),
      avg(col("__dl")).as("__avgdl"))
    val tf = withLen.select(col(idCol), col("__dl"),
        explode(col("__t")).as("__term"))
      .filter(col("__term").isin(terms: _*))
      .groupBy(col(idCol), col("__dl"), col("__term"))
      .agg(count(lit(1)).cast("double").as("__tf"))
    // rows are distinct per (doc, term) after the aggregate, so the
    // per-term doc frequency is a plain count
    val dfreq = tf.groupBy("__term")
      .agg(count(lit(1)).cast("double").as("__df"))
    tf.join(broadcast(dfreq), "__term")
      .crossJoin(broadcast(stats))
      .withColumn("__idf",
        log(lit(1.0) + (col("__n") - col("__df") + 0.5)
          / (col("__df") + 0.5)))
      .withColumn("__s",
        col("__idf") * col("__tf") * (k1 + 1) /
          (col("__tf") +
            (col("__dl") / col("__avgdl") * b + (1 - b)) * k1))
      .groupBy(idCol)
      .agg(round(sum("__s"), 4).as("bm25"),
           count(lit(1)).cast("long").as("n_matched_terms"))
      .orderBy(col("bm25").desc, col(idCol))
      .limit(k)
  }
}
