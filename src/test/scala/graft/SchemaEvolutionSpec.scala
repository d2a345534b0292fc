package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.{CdcApply, ReplicatedTable}

/** Upstream `ALTER TABLE ADD COLUMN` mid-stream: the replicated table
  * evolves (existing rows take NULL for the new column), and batches
  * that LOSE columns are rejected instead of silently nulling data. */
class SchemaEvolutionSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def ts(i: Long) = new Timestamp(i)

  test("column add evolves the table; column loss is rejected") {
    val dir = java.nio.file.Files.createTempDirectory("graft-evolve").toString
    val t = new ReplicatedTable(spark, s"$dir/t", Seq("k"))
    t.snapshot(Seq((1, "a"), (2, "b")).toDF("k", "v"))

    // batch with a NEW column `w`
    val evolved = Seq((2, "b2", "x", CdcApply.Update, 10L, ts(10)),
                      (3, "c", "y", CdcApply.Insert, 11L, ts(11)))
      .toDF("k", "v", "w", "_op", "_lsn", "_commit_ts")
    t.applyChanges(evolved)

    val cur = t.current()
    assert(cur.columns.toSet == Set("k", "v", "w"))
    val byK = cur.collect()
      .map(r => r.getInt(0) -> ((r.getString(1), Option(r.getString(2)))))
      .toMap
    assert(byK(1) == (("a", None)), "pre-existing row takes NULL for the added column")
    assert(byK(2) == (("b2", Some("x"))))
    assert(byK(3) == (("c", Some("y"))))

    // a later batch REVERTING to the old schema must be rejected
    val regressed = Seq((4, "d", CdcApply.Insert, 12L, ts(12)))
      .toDF("k", "v", "_op", "_lsn", "_commit_ts")
    val e = intercept[IllegalArgumentException] { t.applyChanges(regressed) }
    assert(e.getMessage.contains("lacks table columns"))

    // CdcApply itself stays strict unless evolution is opted in
    val e2 = intercept[IllegalArgumentException] {
      CdcApply.applyBatch(Seq((1, "a")).toDF("k", "v"),
        evolved, Seq("k"))
    }
    assert(e2.getMessage.contains("allowEvolution"))
  }

  test("partitioned table: evolution rewrites the schema sidecar, untouched partitions null-fill") {
    import graft.cdc.PartitionedReplicatedTable
    val dir = java.nio.file.Files.createTempDirectory("graft-evolve-p").toString
    val t = new PartitionedReplicatedTable(spark, s"$dir/t", Seq("k"), "day")
    t.snapshot(Seq((1, "d1", "a"), (2, "d2", "b")).toDF("k", "day", "v"))

    // the batch touches ONLY partition d2 and adds column `w`
    val evolved = Seq((2, "d2", "b2", "x", CdcApply.Update, 10L, ts(10)))
      .toDF("k", "day", "v", "w", "_op", "_lsn", "_commit_ts")
    t.applyChanges(evolved)

    val byK = t.current().select("k", "v", "w").collect()
      .map(r => r.getInt(0) -> ((r.getString(1), Option(r.getString(2)))))
      .toMap
    // d1's parquet was NOT rewritten, yet reads null-fill the new column
    assert(byK(1) == (("a", None)))
    assert(byK(2) == (("b2", Some("x"))))
    // pruned reads see the evolved schema too
    assert(t.currentForValues(Seq("d1")).columns.contains("w"))
  }
}
