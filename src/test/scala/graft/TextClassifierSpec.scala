package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.TextClassifier

class TextClassifierSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("training separates a planted two-class corpus", Slow) {
    val rnd = new scala.util.Random(3)
    val good = Seq("crisp", "lucid", "cogent", "vivid", "polished")
    val bad = Seq("garbled", "spammy", "mangled", "rambling", "hollow")
    val filler = Seq("the", "a", "data", "table", "row")
    def doc(words: Seq[String]) =
      Seq.fill(10)(if (rnd.nextBoolean()) words(rnd.nextInt(words.size))
                   else filler(rnd.nextInt(filler.size))).mkString(" ")
    val docs = (0 until 80).map { i =>
      val y = i % 2
      (i.toLong, doc(if (y == 1) good else bad), y.toDouble)
    }.toDF("doc_id", "text", "label")

    val (w, b) = TextClassifier.train(
      docs, "doc_id", "text", docs.select("doc_id", "label"),
      iters = 150, lr = 1.0)

    val wm = w.map(x => math.round(x * 1e6)).toSeq
    val bm = math.round(b * 1e6)
    val acc = TextClassifier.marginMicro(docs, "doc_id", "text", wm, bm)
      .join(docs.select("doc_id", "label"), "doc_id")
      .select(((col("score_micro") > 0).cast("double") === col("label"))
        .cast("double").as("ok"))
      .agg(avg("ok")).collect()(0).getDouble(0)
    assert(acc >= 0.95, s"planted-corpus accuracy $acc")
  }

  test("micro scoring matches an independent driver-side recompute") {
    // plain-JVM reimplementation of md5Bucket + margin — checks the
    // whole hashed-feature path (normalization, bucket arithmetic,
    // element_at indexing, integer grid) against Spark's
    def bucketOf(tok: String): Int = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString
      (hex(0).toInt * 1000 + hex(1).toInt * 100 +
        hex(2).toInt * 10 + hex(3).toInt) % TextClassifier.NumBuckets
    }
    val texts = Seq("Crisp data TABLE  row", "spammy spammy the", "x", "the a")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = TextClassifier.marginMicro(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    val w = TextClassifier.DefaultWeightsMicro
    for ((t, i) <- texts.zipWithIndex) {
      val toks = t.trim.toLowerCase.split("\\s+").toSeq
      val want = toks.map(tok => w(bucketOf(tok))).sum +
        TextClassifier.DefaultBiasMicro
      assert(got(i.toLong) == want, s"margin for '$t'")
    }
  }

  test("featurize counts token occurrences per bucket") {
    val docs = Seq((1L, "a a b")).toDF("doc_id", "text")
    val f = TextClassifier.featurize(docs, "doc_id", "text")
      .as[(Long, Int, Double)].collect().toSeq
    assert(f.map(_._3).sum == 3.0)
    assert(f.length <= 2 && f.nonEmpty) // 'a' twice in one bucket
  }
}
