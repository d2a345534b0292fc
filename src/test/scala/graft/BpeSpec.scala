package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.Bpe

class BpeSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  /** Reference BPE encoder: explicit symbol lists, each merge applied
    * as one greedy left-to-right non-overlapping pass — the textbook
    * (Sennrich 2016) apply step the piped-replace formulation must
    * reproduce exactly. */
  private def refEncode(text: String,
                        merges: Seq[(String, String)]): Vector[String] = {
    val norm = text.trim.toLowerCase.replaceAll("\\s+", " ")
    var syms = norm.map(_.toString).toVector
    for ((a, b) <- merges) {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += syms(i); i += 1 }
      }
      syms = out.result()
    }
    syms
  }

  private def pipedOf(syms: Vector[String]): String =
    syms.map("|" + _ + "|").mkString

  test("piped-replace encode == textbook greedy BPE on adversarial strings") {
    val texts = Seq(
      "to be or not to be", "the thing", "aaa aaaa a", "join join hash",
      "batch scan scans canned", "erer rer err", "  padded   spaces  ",
      "x", "", "jojoin inin atcatch", "parquet partition merge sort")
    val df = texts.toDF("text")
    val got = df.select(Bpe.encode(col("text")).as("e"))
      .as[String].collect().toSeq
    val want = texts.map(t => pipedOf(refEncode(t, Bpe.DefaultMerges)))
    assert(got == want)
  }

  test("piped-replace encode == textbook greedy BPE on random strings") {
    val rnd = new scala.util.Random(42)
    // Biased alphabet so merge pairs actually occur, including runs
    // that exercise the overlapping-pair greedy semantics.
    val alpha = "aaabccehijnorstuw "
    val texts = Seq.fill(200)(
      (0 until (1 + rnd.nextInt(40)))
        .map(_ => alpha(rnd.nextInt(alpha.length))).mkString)
    val got = texts.toDF("text").select(Bpe.encode(col("text")).as("e"))
      .as[String].collect().toSeq
    val want = texts.map(t => pipedOf(refEncode(t, Bpe.DefaultMerges)))
    assert(got == want)
  }

  test("single-pass kernel encode is bit-identical to the replace chain") {
    val rnd = new scala.util.Random(7)
    val alpha = "aaabccehijnorstuw "
    val texts = Seq("", " ", "  leading  inner  trailing ", "x",
      "jojoin inin atcatch", "ThE MiXeD CaSe") ++
      Seq.fill(300)(
        (0 until (1 + rnd.nextInt(60)))
          .map(_ => alpha(rnd.nextInt(alpha.length))).mkString)
    val r = texts.toDF("text")
      .select(Bpe.encode(col("text")).as("chain"),
              Bpe.encodeKernel(col("text")).as("kernel"))
      .as[(String, String)].collect()
    for (((c, k), t) <- r.zip(texts))
      assert(c == k, s"kernel diverged from chain on '$t'")
  }

  test("kernel refuses merge symbols that cross the per-word domain") {
    // per-word merging only equals the whole-string chain while no
    // merge symbol contains a space (or the '|' piping) — the kernel
    // must fail loudly, not diverge silently
    for (bad <- Seq(("a ", "b"), ("a", " b"), ("a|", "b"), ("a", "|")))
      intercept[IllegalArgumentException] {
        Seq("aa bb").toDF("text")
          .select(Bpe.encodeKernel(col("text"), Seq(bad))).collect()
      }
  }

  test("token count: merges only ever shrink it; zero merges = non-space chars") {
    val texts = Seq("join the batch", "scan scan scan", "q w e r t y", "")
    val df = texts.toDF("text")
    val norm = Bpe.normalize(col("text"))
    val r = df.select(
      Bpe.tokenCount(Bpe.piped(col("text")), norm).as("raw"),
      Bpe.tokenCount(Bpe.encode(col("text")), norm).as("enc"))
      .as[(Long, Long)].collect()
    for (((raw, enc), t) <- r.zip(texts)) {
      val nonSpace = t.trim.toLowerCase.replaceAll("\\s+", " ")
        .count(_ != ' ').toLong
      assert(raw == nonSpace, s"raw count for '$t'")
      assert(enc <= raw && (enc > 0 || t.trim.isEmpty), s"enc count for '$t'")
    }
  }

  test("train: hand-computed golden on the classic corpus") {
    // word freqs: low:5 lower:2 newest:3 widest:2 (no </w> marker).
    // Hand-derived pair counts give, with the (count desc, pair asc)
    // tie-break: (l,o) ties (o,w) at 7 -> (l,o); then (lo,w) at 7;
    // then (e,s) ties (s,t) at 5 -> (e,s); then (es,t) at 5.
    val docs = Seq(
      "low low low low low", "lower lower",
      "newest newest newest", "widest widest").toDF("text")
    val merges = Bpe.train(docs, "text", numMerges = 4)
    assert(merges == Seq("l" -> "o", "lo" -> "w", "e" -> "s", "es" -> "t"))
  }

  test("train then encode: learned merges compress the training corpus") {
    val docs = Seq(
      "the merge the merge", "sorted sorted merge", "the sorted table")
      .toDF("text")
    val merges = Bpe.train(docs, "text", numMerges = 8)
    assert(merges.nonEmpty && merges.length <= 8)
    val norm = Bpe.normalize(col("text"))
    val r = docs.select(
      Bpe.tokenCount(Bpe.piped(col("text")), norm).as("raw"),
      Bpe.tokenCount(Bpe.encode(col("text"), merges), norm).as("enc"))
      .as[(Long, Long)].collect()
    assert(r.forall { case (raw, enc) => enc < raw })
    // and the spark encode of the learned table still matches the
    // reference encoder (merges built on merged symbols included)
    val texts = Seq("the merge", "sorted", "unseen words zzz")
    val got = texts.toDF("text")
      .select(Bpe.encode(col("text"), merges).as("e")).as[String].collect()
    assert(got.toSeq == texts.map(t => pipedOf(refEncode(t, merges))))
  }

  test("train early-stops below minFreq instead of emitting junk merges") {
    val docs = Seq("ab", "cd", "ef").toDF("text") // every pair freq 1
    assert(Bpe.train(docs, "text", numMerges = 5, minFreq = 2L).isEmpty)
  }
}
