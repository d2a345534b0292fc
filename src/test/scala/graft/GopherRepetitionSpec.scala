package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TestData
import graft.text.TextFunctions

/** The Gopher repetition filters (Rae et al. 2021 §A1.1) and the
  * row-local multiset machinery under them. The catalog correctness
  * gate (t23/t24 vs DuckDB) checks end-to-end values; these specs pin
  * (a) hand-computed known values for the run-scan accounting, and
  * (b) equivalence of the row-local sorted-run formulation with the
  * exploded groupBy formulation it exists to avoid — over every
  * document in the real table, so shingle extraction, tie-breaks and
  * duplicate-char accounting are exercised on natural data too. */
class GopherRepetitionSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def stats(text: String, n: Int) =
    Seq(text).toDF("text")
      .select(TextFunctions.multisetStats(
        TextFunctions.allShingles(col("text"), n)).as("st"))
      .select("st.*").collect().head

  test("multisetStats: hand-computed run accounting") {
    // 2-grams of "a b a b a": [a b, b a, a b, b a] — both grams occur
    // twice; top = "a b" (ties break to the lexicographically
    // smallest), every occurrence is a duplicate occurrence
    val r = stats("a b a b a", 2)
    assert(r.getAs[Int]("n") == 4)
    assert(r.getAs[Int]("n_distinct") == 2)
    assert(r.getAs[Int]("top_cnt") == 2)
    assert(r.getAs[Int]("top_len") == 3)
    assert(r.getAs[Int]("dup_occ") == 4)
    assert(r.getAs[Long]("dup_chars") == 12L)
    assert(r.getAs[Long]("tot_chars") == 12L)
  }

  test("multisetStats: unique elements have no duplicate accounting") {
    val r = stats("w x y z", 2) // [w x, x y, y z] all distinct
    assert(r.getAs[Int]("n") == 3 && r.getAs[Int]("n_distinct") == 3)
    assert(r.getAs[Int]("top_cnt") == 1 && r.getAs[Int]("dup_occ") == 0)
    assert(r.getAs[Long]("dup_chars") == 0L)
  }

  test("multisetStats: short and empty documents yield empty multisets") {
    for (t <- Seq("", "   ", "solo")) {
      val r = stats(t, 2)
      assert(r.getAs[Int]("n") == 0, s"text '$t'")
      assert(r.getAs[Int]("top_cnt") == 0 && r.getAs[Int]("dup_occ") == 0)
    }
  }

  test("multi-byte UTF-8: lengths count characters, not bytes") {
    // "é" is 2 bytes / 1 char; "aé bé aé bé" → 2-grams [aé bé, bé aé,
    // aé bé]: top = "aé bé" ×2, char length 5 (not 7 bytes); dup
    // chars 10; total normalized chars 11
    val r = stats("aé bé aé bé", 2)
    assert(r.getAs[Int]("top_cnt") == 2)
    assert(r.getAs[Int]("top_len") == 5)
    assert(r.getAs[Long]("dup_chars") == 10L)
    val one = Seq("aé bé aé bé").toDF("text")
      .select(TextFunctions.repetitionStats(col("text")).as("st"))
      .select("st.top2_cnt", "st.top2_len", "st.dup5_chars", "st.tot_chars")
      .collect().head
    assert(one.getInt(0) == 2 && one.getInt(1) == 5)
    assert(one.getLong(2) == 0L && one.getInt(3) == 11)
  }

  test("top tie-break is the lexicographically smallest argmax gram") {
    // "z z q q": 1-grams q and z both twice; top must be q (len 1
    // either way, but the pinned contract is gram-ascending)
    val df = Seq("zz zz q q").toDF("text")
      .select(TextFunctions.multisetStats(
        TextFunctions.allShingles(col("text"), 1)).as("st"))
      .select("st.top_cnt", "st.top_len").collect().head
    assert(df.getInt(0) == 2 && df.getInt(1) == 1) // q, not zz
  }

  test("multisetStats rejects null array elements with a clear error") {
    val ex = intercept[Throwable] {
      Seq(1).toDF("i")
        .select(TextFunctions.multisetStats(
          array(lit("a"), lit(null).cast("string"))).as("st"))
        .collect()
    }
    val msgs = Iterator.iterate(ex)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("null element"), s"unexpected failure chain: $msgs")
  }

  test("allShingles n=1 honors the empty-document contract (no [\"\"] token)") {
    // split("") yields [""] — one empty token, not a 1-gram occurrence.
    // The n>=2 branches already return [] for short docs; n=1 must too.
    val r = Seq("", "   ", "one").toDF("text")
      .select(size(TextFunctions.allShingles(col("text"), 1)).as("n"))
      .collect().map(_.getInt(0)).toSeq
    assert(r == Seq(0, 0, 1), s"expected Seq(0, 0, 1), got $r")
  }

  test("row-local stats == exploded groupBy formulation on real docs") {
    val docs = TestData.table(spark, sf, "documents")
      .select("doc_id", "text")
    for (n <- Seq(2, 5)) {
      val local = docs.select(col("doc_id"), TextFunctions.multisetStats(
          TextFunctions.allShingles(col("text"), n)).as("st"))
        .select(col("doc_id"), col("st.top_cnt"), col("st.dup_chars"),
          col("st.n_distinct"), col("st.tot_chars"))
        .collect().map(r => r.getLong(0) ->
          (r.getInt(1), r.getLong(2), r.getInt(3), r.getLong(4))).toMap
      val exploded = docs.select(col("doc_id"),
          explode(TextFunctions.allShingles(col("text"), n)).as("g"))
        .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
        .groupBy("doc_id").agg(
          max("c").cast("int").as("top_cnt"),
          sum(when(col("c") >= 2, col("c") * length(col("g")))
            .otherwise(0L)).as("dup_chars"),
          count(lit(1)).cast("int").as("n_distinct"),
          sum(col("c") * length(col("g"))).as("tot_chars"))
        .collect().map(r => r.getLong(0) ->
          (r.getInt(1), r.getLong(2), r.getInt(3), r.getLong(4))).toMap
      // docs too short for any n-gram carry zero stats row-locally and
      // no row at all in the exploded form
      local.foreach { case (id, l) =>
        exploded.get(id) match {
          case Some(e) => assert(l == e, s"doc $id n=$n")
          case None => assert(l == ((0, 0L, 0, 0L)), s"doc $id n=$n")
        }
      }
    }
  }

  test("single-pass repetitionStats == per-n multiset formulation on real docs") {
    val norm = regexp_replace(lower(trim(col("text"))), "\\s+", " ")
    val docs = TestData.table(spark, sf, "documents")
      .select(col("doc_id"), norm.as("t"))
    val single = docs.select(col("doc_id"),
        TextFunctions.repetitionStats(col("t")).as("st"))
      .select(col("doc_id"), col("st.*"))
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5),
          r.getInt(6), r.getLong(7), r.getInt(8))).toMap
    val perN = docs.select(col("doc_id"),
        TextFunctions.multisetStats(
          TextFunctions.allShingles(col("t"), 2)).as("s2"),
        TextFunctions.multisetStats(
          TextFunctions.allShingles(col("t"), 3)).as("s3"),
        TextFunctions.multisetStats(
          TextFunctions.allShingles(col("t"), 4)).as("s4"),
        TextFunctions.multisetStats(
          TextFunctions.allShingles(col("t"), 5)).as("s5"),
        length(col("t")).as("tot"))
      .select(col("doc_id"), col("s2.top_cnt"), col("s2.top_len"),
        col("s3.top_cnt").as("c3"), col("s3.top_len").as("l3"),
        col("s4.top_cnt").as("c4"), col("s4.top_len").as("l4"),
        col("s5.dup_chars"), col("tot"))
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5),
          r.getInt(6), r.getLong(7), r.getInt(8))).toMap
    assert(single.keySet == perN.keySet)
    single.foreach { case (id, v) => assert(v == perN(id), s"doc $id") }
  }

  private def decorate(c: org.apache.spark.sql.Column) = {
    val norm = regexp_replace(lower(trim(c)), "\\s+", " ")
    val lined = regexp_replace(norm, "((?:\\S+ ){4}\\S+) ", "$1\n")
    regexp_replace(
      regexp_replace(lined, "(?m)^the( |$)", "- the$1"),
      "(?m)( |^)dup$", "$1dup ...")
  }

  test("t24 derived lines: known literal document") {
    // 11 tokens → lines of 5/5/1; "the"-opening lines get a bullet,
    // "dup"-closing lines an ellipsis (the catalog's string-level
    // (?m) decoration)
    val df = Seq((0L, "the a b c dup x y z w v q"))
      .toDF("doc_id", "text")
    val got = df.select(split(decorate(col("text")), "\n").as("ls"))
      .as[Seq[String]].collect().head
    assert(got == Seq("- the a b c dup ...", "x y z w v", "q"))
  }

  test("string-level (?m) decoration == per-line lambda on real docs") {
    val docs = TestData.table(spark, sf, "documents")
    val viaLambda = {
      val norm = regexp_replace(lower(trim(col("text"))), "\\s+", " ")
      val lined = regexp_replace(norm, "((?:\\S+ ){4}\\S+) ", "$1\n")
      transform(split(lined, "\n"), l => {
        val b = when(l.rlike("^the( |$)"), concat(lit("- "), l)).otherwise(l)
        when(l.rlike("( |^)dup$"), concat(b, lit(" ..."))).otherwise(b)
      })
    }
    val n = docs.select(split(decorate(col("text")), "\n").as("a"),
        viaLambda.as("b"))
      .filter(not(col("a") === col("b"))).count()
    assert(n == 0)
  }
}
