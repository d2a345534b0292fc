package graft

import java.sql.Timestamp

import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.cdc.CdcApply

/** ScalaCheck properties for the CDC merge (SURVEY.md §5.3): for random
  * change sequences, applying batches through Spark equals a trivial
  * in-memory model (sorted-by-lsn sequential map updates), and apply is
  * idempotent and batch-split-invariant.
  */
object CdcApplyProps extends Properties("CdcApply") {
  import SparkTestSession._
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8) // each trial runs Spark jobs

  private val genOp: Gen[(Int, String, String, Long)] = for {
    k <- Gen.choose(0, 12)
    op <- Gen.oneOf(CdcApply.Insert, CdcApply.Update, CdcApply.Delete)
    v <- Gen.alphaStr.map(_.take(4))
  } yield (k, op, v, 0L)

  private val genSeq: Gen[List[(Int, String, String, Long)]] =
    Gen.listOfN(30, genOp).map(_.zipWithIndex.map {
      case ((k, op, v, _), i) => (k, op, v, i.toLong + 1)
    })

  /** The model: process events in lsn order; DELETE removes, others
    * upsert the after-image. */
  private def model(initial: Map[Int, String],
                    ops: List[(Int, String, String, Long)]): Map[Int, String] =
    ops.sortBy(_._4).foldLeft(initial) {
      case (m, (k, op, v, _)) =>
        if (op == CdcApply.Delete) m - k else m.updated(k, v)
    }

  private def toChanges(ops: List[(Int, String, String, Long)]) =
    ops.map { case (k, op, v, lsn) =>
      KvChange(k, v, op, lsn, new Timestamp(lsn))
    }.toDF()

  private def run(current: Map[Int, String],
                  ops: List[(Int, String, String, Long)]): Map[Int, String] =
    CdcApply.applyBatch(
      current.toSeq.map { case (k, v) => Kv(k, v) }.toDF(),
      toChanges(ops), Seq("k"))
      .as[Kv].collect().map(r => r.k -> r.v).toMap

  private val initial = Map(1 -> "a", 2 -> "b", 3 -> "c")

  property("applyBatch ≡ sequential model") = Prop.forAll(genSeq) { ops =>
    run(initial, ops) == model(initial, ops)
  }

  property("idempotent per batch") = Prop.forAll(genSeq) { ops =>
    val once = run(initial, ops)
    run(once, ops) == once
  }

  property("batch-split invariant") = Prop.forAll(genSeq) { ops =>
    val whole = run(initial, ops)
    val (first, second) = ops.splitAt(ops.length / 2)
    run(run(initial, first), second) == whole
  }
}
