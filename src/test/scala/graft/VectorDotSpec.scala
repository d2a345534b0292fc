package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.vectors.vector_dot

class VectorDotSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("q16 blobs: approx cosine within the documented error bound; zero-norm safe") {
    import graft.functions.vectors.{q16_cosine, vector_q16}
    val rnd = new scala.util.Random(11)
    def unit(): Array[Float] = {
      val v = Array.fill(64)((rnd.nextDouble() * 2 - 1).toFloat)
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      v.map(x => (x / n).toFloat)
    }
    val rows = Seq.tabulate(300)(i => (i.toLong, unit(), unit())) :+
      (300L, Array.fill(64)(0.0f), unit()) // zero vector → cosine 0.0
    val got = rows.toDF("id", "x", "y")
      .select(col("id"),
        q16_cosine(vector_q16(col("x")), vector_q16(col("y"))).as("approx"),
        {
          val nn = sqrt(vector_dot(col("x"), col("x"))) *
            sqrt(vector_dot(col("y"), col("y")))
          when(nn === 0.0, 0.0)
            .otherwise(vector_dot(col("x"), col("y")) / nn).as("exact")
        })
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    for ((id, approx, exact) <- got) {
      val e = if (id == 300L) 0.0 else exact
      assert(math.abs(approx - e) <= 2.5e-4,
        s"row $id: |$approx - $e| over the q16 bound")
    }
  }

  test("native dot product: values, widening, and codegen participation") {
    val df = Seq(
      (1L, Array(1.0f, 2.0f, 3.0f), Array(4.0, 5.0, 6.0)),
      (2L, Array(0.5f, -0.5f, 0.0f), Array(2.0, 2.0, 9.0))
    ).toDF("id", "vf", "vd")

    // float×double widening, left-to-right accumulation
    val got = df.select(col("id"),
      vector_dot(col("vf"), col("vd")).as("d"),
      vector_dot(col("vf"), col("vf")).as("ff"),
      vector_dot(col("vd"), col("vd")).as("dd"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3))).sortBy(_._1)
    assert(got(0)._2 == 1.0 * 4 + 2.0 * 5 + 3.0 * 6)
    assert(got(1)._2 == 0.5 * 2 + (-0.5) * 2 + 0.0 * 9)
    assert(got(0)._3 == 14.0 && got(0)._4 == 77.0)

    // participates in whole-stage codegen (not a fallback/interpreted
    // node) — checked on a parquet scan; a local relation would be
    // evaluated eagerly into a LocalTableScan
    val exec = graft.sources.TestData.table(spark, sf, "embeddings")
      .select(vector_dot(col("embedding"), col("embedding")))
      .queryExecution.executedPlan
    val inCodegen = exec.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }.exists(_.toString.contains("vectordot"))
    assert(inCodegen, exec.toString)

    // length mismatch is an error, not silent truncation
    val bad = Seq((Array(1.0f), Array(1.0, 2.0))).toDF("a", "b")
    val e = intercept[Exception] {
      bad.select(vector_dot(col("a"), col("b"))).collect()
    }
    assert(e.getMessage != null)
  }

  test("lsh bucket: eval and codegen agree, participates in codegen, bits match planes") {
    import graft.functions.vectors.vector_lsh_bucket
    val emb = graft.sources.TestData.table(spark, sf, "embeddings").limit(200)

    // codegen path (parquet-backed scan)
    val gen = emb.select(col("vec_id"),
      vector_lsh_bucket(col("embedding"), 8, 42L).as("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // interpreted-eval path (local relation → eager eval, no codegen)
    val local = emb.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
      .toDF("vec_id", "embedding")
    val ev = local.select(col("vec_id"),
      vector_lsh_bucket(col("embedding"), 8, 42L).as("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(gen == ev, "doGenCode and nullSafeEval must be bit-identical")

    // all buckets within range, and multiple buckets populated
    assert(gen.values.forall(b => b >= 0 && b < 256))
    assert(gen.values.toSet.size > 1, "degenerate bucketing")

    // participates in whole-stage codegen on the parquet scan
    val exec = graft.sources.TestData.table(spark, sf, "embeddings")
      .select(vector_lsh_bucket(col("embedding"), 8, 42L))
      .queryExecution.executedPlan
    val inCodegen = exec.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }.exists(_.toString.contains("vectorlshbucket"))
    assert(inCodegen, exec.toString)
  }

  test("native dot matches the interpreted fold bit-for-bit on real embeddings") {
    val emb = graft.sources.TestData.table(spark, sf, "embeddings").limit(100)
    val fold = aggregate(
      zip_with(col("embedding"), col("embedding"),
        (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    val diffs = emb.select(
      (vector_dot(col("embedding"), col("embedding")) - fold).as("d"))
      .filter(col("d") =!= 0.0).count()
    assert(diffs == 0, "native and fold paths must agree exactly")
  }
}
