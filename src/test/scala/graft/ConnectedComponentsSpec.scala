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
