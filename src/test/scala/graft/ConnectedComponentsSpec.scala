package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.ConnectedComponents

class ConnectedComponentsSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  /** Brute-force union-find — the semantics oracle. */
  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // path-compress to the true min root
    val touched = edges.flatMap(e => Seq(e._1, e._2)).distinct
    touched.map(v => v -> find(v.toInt).toLong).toMap
  }

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents
      .connectedComponents(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("matches union-find on random graphs (sparse, dense, multi-edge)") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 8) {
      val n = 10 + rnd.nextInt(50)
      val m = rnd.nextInt(3 * n)
      val edges = Seq.fill(m)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)) // incl. self-loops
      assert(run(edges) === unionFind(n, edges), s"trial $trial n=$n m=$m")
    }
  }

  test("chain graph (worst case for naive propagation) converges") {
    val n = 300
    val edges = Seq.tabulate(n - 1)(i => (i.toLong, (i + 1).toLong))
    val got = run(edges)
    assert(got.size === n)
    assert(got.values.toSet === Set(0L), "all chain nodes label to node 0")
  }

  test("duplicate, reversed and self-loop edges are tolerated") {
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 2L), (1L, 2L), (4L, 3L))
    assert(run(edges) === Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L))
  }

  test("dupClusters assigns singletons to themselves") {
    val docs = Seq(0L, 1L, 2L, 3L, 4L).toDF("doc_id")
    val pairs = Seq((1L, 3L)).toDF("a", "b")
    val got = ConnectedComponents.dupClusters(docs, "doc_id", pairs, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 1L, 4L -> 4L))
  }

  test("property: incremental addEdges ≡ full recompute over random edge batches") {
    val rnd = new scala.util.Random(99)
    for (trial <- 0 until 5) {
      val n = 20 + rnd.nextInt(40)
      val batches = Seq.fill(1 + rnd.nextInt(3))(
        Seq.fill(rnd.nextInt(2 * n))(
          (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)))
      // fold batches incrementally
      var labels = ConnectedComponents
        .connectedComponents(batches.head.toDF("a", "b"), "a", "b")
      batches.tail.foreach { b =>
        labels = ConnectedComponents.addEdges(labels, b.toDF("a", "b"), "a", "b")
      }
      val inc = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val full = run(batches.flatten)
      assert(inc === full, s"trial $trial n=$n batches=${batches.map(_.size)}")
    }
  }

  test("incremental fold of a bridge merges two stars in bounded rounds") {
    // two converged components, one bridging edge: the delta graph is
    // |comp|+1 star edges, never the original chain
    val chainA = Seq.tabulate(50)(i => (i.toLong, (i + 1).toLong))
    val chainB = Seq.tabulate(50)(i => (100L + i, 101L + i))
    val base = ConnectedComponents
      .connectedComponents((chainA ++ chainB).toDF("a", "b"), "a", "b")
    val merged = ConnectedComponents
      .addEdges(base, Seq((50L, 100L)).toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(merged.values.toSet === Set(0L), "bridge merges everything to 0")
    assert(merged.size === 102)
  }

  test("incremental dedup pipeline on real docs: batch arrivals ≡ full recompute") {
    import graft.sources.TestData
    import graft.text.TextFunctions
    import graft.dedup.Dedup

    val docs = TestData.table(spark, sf, "documents")
    def toks(df: org.apache.spark.sql.DataFrame) = df.select(col("doc_id"),
      col("source"), array_distinct(TextFunctions.tokens(col("text"))).as("w"))
    def pairsOf(df: org.apache.spark.sql.DataFrame) =
      Dedup.jaccardJoinExact(toks(df), "doc_id", "w", 0.7, Seq("source"))
        .select(col("a"), col("b"))

    // full: every doc labeled over the complete pair graph
    val full = graft.dedup.ConnectedComponents
      .dupClusters(docs, "doc_id", pairsOf(docs), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // incremental: first 300 docs land, then the rest arrive as a batch;
    // the delta edges are the pairs touching a new doc (a real pipeline
    // gets them from the LSH index probe of the new docs)
    val batch0 = docs.filter(col("doc_id") < 300)
    val labels0 = graft.dedup.ConnectedComponents
      .connectedComponents(pairsOf(batch0), "a", "b")
    val newIds = docs.filter(col("doc_id") >= 300).select(col("doc_id"))
    val delta = pairsOf(docs).join(newIds,
      col("a") === col("doc_id") || col("b") === col("doc_id"), "left_semi")
    val labels1 = graft.dedup.ConnectedComponents
      .addEdges(labels0, delta, "a", "b")
    val incMap = labels1.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val inc = docs.select("doc_id").collect().map(_.getLong(0))
      .map(id => id -> incMap.getOrElse(id, id)).toMap

    assert(inc === full)
  }

  test("deterministic across runs and repartitionings") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(200)((rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
    val a = run(edges)
    val b = ConnectedComponents
      .connectedComponents(edges.toDF("a", "b").repartition(13), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
  }
}
