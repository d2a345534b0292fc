package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.arrays.{sorted_first_common, sorted_intersect_size}

class SortedArraysSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val rnd = new scala.util.Random(11)
  private def randSortedLong(): Seq[Long] =
    Seq.fill(rnd.nextInt(30))(rnd.nextInt(50).toLong).distinct.sorted
  private def randSortedInt(): Seq[Int] =
    Seq.fill(rnd.nextInt(30))(rnd.nextInt(50)).distinct.sorted

  test("merge walk == array_intersect formulations on random sorted arrays (long + int)") {
    val longs = Seq.fill(300)((randSortedLong(), randSortedLong())).toDF("a", "b")
    val dl = longs.select(
      (sorted_intersect_size(col("a"), col("b")) -
        size(array_intersect(col("a"), col("b")))).as("ds"),
      (sorted_first_common(col("a"), col("b")) <=>
        array_min(array_intersect(col("a"), col("b")))).as("fc"))
      .collect()
    assert(dl.forall(r => r.getInt(0) == 0 && r.getBoolean(1)))

    val ints = Seq.fill(300)((randSortedInt(), randSortedInt())).toDF("a", "b")
    val di = ints.select(
      (sorted_intersect_size(col("a"), col("b")) -
        size(array_intersect(col("a"), col("b")))).as("ds"),
      (sorted_first_common(col("a"), col("b")) <=>
        array_min(array_intersect(col("a"), col("b")))).as("fc"))
      .collect()
    assert(di.forall(r => r.getInt(0) == 0 && r.getBoolean(1)))
  }

  test("sketch_intersect_bound: sound (never below true overlap), exact when untruncated") {
    import graft.functions.arrays.sketch_intersect_bound
    // sets as sorted distinct non-negative ints; sketches = first k
    // after a MONOTONE lossy map (divide by 3 — forces duplicates, the
    // saturation case); truth computed on the raw sets
    val cases = Seq.fill(500) {
      val x = Seq.fill(rnd.nextInt(40))(rnd.nextInt(120)).distinct.sorted
      val y = Seq.fill(rnd.nextInt(40))(rnd.nextInt(120)).distinct.sorted
      val k = 1 + rnd.nextInt(12)
      val lossy = rnd.nextBoolean()
      def sk(s: Seq[Int]) = s.take(k).map(v => if (lossy) v / 3 else v)
      (sk(x), x.size, sk(y), y.size, x.intersect(y).size, k, lossy)
    }
    val df = cases.toDF("xsk", "nx", "ysk", "ny", "truth", "k", "lossy")
      .withColumn("ub", sketch_intersect_bound(
        col("xsk"), col("nx"), col("ysk"), col("ny")))
    val rows = df.select("ub", "truth", "nx", "ny", "k", "lossy").collect()
    rows.foreach { r =>
      val (ub, truth, nx, ny, k, lossy) = (r.getInt(0), r.getInt(1),
        r.getInt(2), r.getInt(3), r.getInt(4), r.getBoolean(5))
      assert(ub >= truth, s"bound $ub < true $truth (n=$nx/$ny k=$k)")
      assert(ub <= math.min(nx, ny), s"bound $ub above min size")
      // both sets inside the sketch and no lossy map → exact
      if (!lossy && nx <= k && ny <= k)
        assert(ub == truth, s"untruncated bound $ub != $truth")
    }
    // eval/codegen parity: interpreted projection must agree
    val evald = cases.map { case (xsk, nx, ysk, ny, _, _, _) =>
      org.apache.spark.sql.graft.SketchIntersectBound(
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          xsk, org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.IntegerType)),
        org.apache.spark.sql.catalyst.expressions.Literal(nx),
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          ysk, org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.IntegerType)),
        org.apache.spark.sql.catalyst.expressions.Literal(ny)).eval(null)
    }
    assert(rows.map(_.getInt(0)).toSeq == evald)
  }

  test("eval and codegen paths agree on a parquet-backed frame, and participate in codegen") {
    // parquet-backed → whole-stage codegen path
    val docs = graft.sources.TestData.table(spark, sf, "documents").limit(100)
      .select(col("doc_id"),
        sort_array(array_distinct(transform(
          graft.text.TextFunctions.tokens(col("text")), t => xxhash64(t)))).as("h"))
    val gen = docs.select(col("doc_id"),
      sorted_intersect_size(col("h"), slice(col("h"), 1, 5)).as("s"),
      sorted_first_common(col("h"), slice(col("h"), 3, 5)).as("f"))
      .collect().map(r => (r.getLong(0), (r.getInt(1), r.get(2)))).toMap
    // local relation → interpreted eval path
    val local = docs.collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toSeq
      .toDF("doc_id", "h")
    val ev = local.select(col("doc_id"),
      sorted_intersect_size(col("h"), slice(col("h"), 1, 5)).as("s"),
      sorted_first_common(col("h"), slice(col("h"), 3, 5)).as("f"))
      .collect().map(r => (r.getLong(0), (r.getInt(1), r.get(2)))).toMap
    local.select("doc_id").as[Long].collect().foreach { id =>
      assert(gen(id) == ev(id), s"doc $id")
    }

    val exec = docs.select(sorted_intersect_size(col("h"), col("h")))
      .queryExecution.executedPlan
    val inCodegen = exec.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }.exists(_.toString.contains("sortedintersectsize"))
    assert(inCodegen, exec.toString)
  }

  test("repeated use in one stage (filter + project) compiles — no interpretation fallback") {
    // the bug class this guards: fixed local names in doGenCode are a
    // "Redefinition of local variable" janino error when the same
    // expression appears twice in one codegen method — and Spark then
    // SILENTLY interprets the stage. fallback=false turns that into a
    // hard failure.
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val docs = graft.sources.TestData.table(spark, sf, "documents").limit(50)
        .select(col("doc_id"),
          sort_array(array_distinct(transform(
            graft.text.TextFunctions.tokens(col("text")), t => xxhash64(t)))).as("h"))
      val n = docs
        .filter(sorted_intersect_size(col("h"), col("h")) > 0 &&
          sorted_first_common(col("h"), col("h")).isNotNull)
        .select(
          sorted_intersect_size(col("h"), slice(col("h"), 1, 5)).as("s1"),
          sorted_intersect_size(col("h"), slice(col("h"), 2, 5)).as("s2"),
          sorted_first_common(col("h"), slice(col("h"), 1, 5)).as("f1"),
          sorted_first_common(col("h"), slice(col("h"), 3, 5)).as("f2"))
        .count()
      assert(n == 50)

      import graft.functions.vectors.{vector_dot, vector_lsh_bucket}
      val emb = graft.sources.TestData.table(spark, sf, "embeddings").limit(50)
      val m = emb
        .filter(vector_dot(col("embedding"), col("embedding")) > 0 &&
          vector_lsh_bucket(col("embedding"), 8, 42L) >= 0)
        .select(vector_dot(col("embedding"), col("embedding")).as("d1"),
                vector_dot(col("embedding"), col("embedding")).as("d2"),
                vector_lsh_bucket(col("embedding"), 8, 42L).as("b1"),
                vector_lsh_bucket(col("embedding"), 8, 43L).as("b2"))
        .count()
      assert(m == 50)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }

  test("mismatched element types are rejected") {
    val df = Seq((Seq(1, 2), Seq(1L, 2L))).toDF("i", "l")
    val e = intercept[Exception] {
      df.select(sorted_intersect_size(col("i"), col("l"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("type"))
  }
}
