package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.{CdcApply, Scd2History}

/** SCD2 history: incremental folding equals whole-log derivation, and
  * `asOf(lsn)` reconstructs exactly the CdcApply state of the prefix —
  * the time-travel contract, over random I/U/D sequences. */
class Scd2HistorySpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def randomOps(seed: Int, n: Int): List[KvChange] = {
    val rnd = new scala.util.Random(seed)
    List.tabulate(n) { i =>
      val op = rnd.nextInt(3) match {
        case 0 => CdcApply.Insert
        case 1 => CdcApply.Update
        case _ => CdcApply.Delete
      }
      KvChange(rnd.nextInt(8), s"v$i", op, i.toLong + 1,
        new Timestamp(i.toLong))
    }
  }

  private def historySet(df: DataFrame): Set[(Int, String, Long, Option[Long], Boolean)] =
    df.select("k", "v", "valid_from_lsn", "valid_to_lsn", "is_current")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getBoolean(4)))
      .toSet

  private def stateSet(df: DataFrame): Set[(Int, String)] =
    df.select("k", "v").collect().map(r => (r.getInt(0), r.getString(1))).toSet

  test("incremental applyBatch over any split == fromChanges over the whole log") {
    for (seed <- 1 to 3) {
      val ops = randomOps(seed, 40)
      val whole = historySet(Scd2History.fromChanges(ops.toDF(), Seq("k")))
      for (cut <- Seq(1, 13, 27)) {
        val (a, b) = ops.splitAt(cut)
        val inc = Scd2History.applyBatch(
          Scd2History.fromChanges(a.toDF(), Seq("k")), b.toDF(), Seq("k"))
        assert(historySet(inc) == whole, s"seed=$seed cut=$cut")
      }
    }
  }

  test("asOf(lsn) == CdcApply over the change-log prefix, at every position") {
    val ops = randomOps(9, 30)
    val hist = Scd2History.fromChanges(ops.toDF(), Seq("k"))
    val empty = Seq.empty[Kv].toDF()
    for (lsn <- Seq(0L, 1L, 7L, 15L, 29L, 30L, 99L)) {
      val prefix = ops.filter(_._lsn <= lsn)
      val expected =
        if (prefix.isEmpty) Set.empty[(Int, String)]
        else stateSet(CdcApply.applyBatch(empty, prefix.toDF(), Seq("k")))
      assert(stateSet(Scd2History.asOf(hist, lsn)) == expected, s"lsn=$lsn")
    }
    // the live view is the final prefix state
    assert(stateSet(Scd2History.current(hist)) ==
      stateSet(Scd2History.asOf(hist, Long.MaxValue)))
  }

  test("deleted keys have no open interval; re-inserts reopen") {
    val ops = List(
      KvChange(1, "a", CdcApply.Insert, 1, new Timestamp(1)),
      KvChange(1, "b", CdcApply.Update, 2, new Timestamp(2)),
      KvChange(1, null, CdcApply.Delete, 3, new Timestamp(3)),
      KvChange(1, "c", CdcApply.Insert, 5, new Timestamp(5)))
    val hist = Scd2History.fromChanges(ops.toDF(), Seq("k"))
    assert(historySet(hist) == Set(
      (1, "a", 1L, Some(2L), false),
      (1, "b", 2L, Some(3L), false),
      (1, "c", 5L, None, true)))
    // between the delete and the re-insert the key does not exist
    assert(stateSet(Scd2History.asOf(hist, 4)) == Set.empty)
  }
}
