package graft.cdc

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** A CDC-maintained table: versioned parquet snapshots with an atomic
  * current-version pointer.
  *
  * Mirrors the reference connector's replicated tables
  * (`CONNECTOR_DEST_DB."raw_cdc".*`): [[snapshot]] is the initial full
  * copy (`SNAPSHOT_REPLICATION_STATUS`), [[applyChanges]] the
  * continuous incremental apply. Readers always see a complete,
  * immutable version; the pointer swap is the only mutation, so a
  * crashed writer never corrupts the table (the half-written version is
  * simply never referenced).
  *
  * Scale posture: each apply rewrites the table once through a PK
  * shuffle — O(|table|) per batch, which is the simple-and-correct v1.
  * The 100 TB path is the same algorithm scoped to affected partitions
  * (partition by date/bucket by key, rewrite only partitions holding
  * changed keys); the versioned-pointer layout already supports that
  * evolution. State lives entirely in the object store — no unbounded
  * executor memory.
  */
final class ReplicatedTable(spark: SparkSession, path: String,
                            val keys: Seq[String]) extends KeyedTable {

  private val root = new Path(path)
  private val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
  private val pointer = new Path(root, "_CURRENT")

  def currentVersion: Option[Int] =
    if (!fs.exists(pointer)) None
    else {
      val in = fs.open(pointer)
      try Some(new String(
        in.readAllBytes(), StandardCharsets.UTF_8).trim.toInt)
      finally in.close()
    }

  private def versionPath(v: Int) = s"$path/v=$v"

  private def commit(df: DataFrame, v: Int): Unit = {
    df.write.mode("overwrite").parquet(versionPath(v))
    val out = fs.create(pointer, true)
    try out.write(v.toString.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Initial snapshot — phase 1 of the replication protocol. */
  def snapshot(df: DataFrame): Unit = commit(df, 0)

  def isSnapshotDone: Boolean = currentVersion.isDefined

  def current(): DataFrame = currentVersion match {
    case Some(v) => spark.read.parquet(versionPath(v))
    case None => throw new IllegalStateException(
      s"replicated table at $path has no snapshot yet")
  }

  /** Incremental apply — phase 2. Idempotent per batch. Upstream
    * column ADDs evolve the table automatically (existing rows take
    * NULL), mirroring the connector's transparent handling of
    * `ALTER TABLE ADD COLUMN`. */
  def applyChanges(changes: DataFrame): Unit = {
    val v = currentVersion.getOrElse(throw new IllegalStateException(
      s"cannot apply changes before snapshot: $path"))
    commit(CdcApply.applyBatch(current(), changes, keys,
      allowEvolution = true), v + 1)
  }

  /** Versions applied after the snapshot (CONNECTOR_STATS analog). */
  def appliedBatches: Int = currentVersion.map(v => v).getOrElse(0)

  /** COMMITTED version dirs still on disk, ascending — the TIME-TRAVEL
    * window ([[vacuum]]'s `keep` sets the horizon). Each is the
    * complete table as of that commit (full rewrite per batch in this
    * layout). Bounded by the pointer: [[commit]] writes the version
    * dir BEFORE the pointer swap, so a crashed apply can leave a
    * half-written dir above the committed version — uncommitted data
    * that must never be served (and that the writer's retry will
    * overwrite, possibly with different content). */
  def versions(): Seq[Int] = currentVersion match {
    case None => Seq.empty
    case Some(committed) =>
      fs.listStatus(root).map(_.getPath.getName)
        .filter(_.startsWith("v="))
        .flatMap(_.stripPrefix("v=").toIntOption)
        .filter(_ <= committed).sorted.toSeq
  }

  /** Read the table AS OF a committed version — fails loudly on a
    * vacuumed, never-committed, or written-but-uncommitted one rather
    * than silently serving the wrong snapshot. */
  def asOf(version: Int): DataFrame = {
    val committed = currentVersion.getOrElse(
      throw new IllegalStateException(s"no snapshot at $path yet"))
    require(version <= committed &&
        fs.exists(new Path(versionPath(version))),
      s"version $version not retained at $path (vacuumed, never " +
        s"committed, or written-but-uncommitted) — retained: " +
        s"${versions().mkString(", ")}")
    spark.read.parquet(versionPath(version))
  }

  /** Table maintenance: delete all version dirs older than the newest
    * `keep` (retention = the reader grace window, as in
    * `PartitionedReplicatedTable.vacuum`). Single-writer, between
    * applies. */
  def vacuum(keep: Int = 2): Unit = {
    require(keep >= 1, "must retain the current version")
    currentVersion.foreach { v =>
      fs.listStatus(root).toSeq.map(_.getPath)
        .filter(_.getName.startsWith("v="))
        .filter(_.getName.stripPrefix("v=").toIntOption
          .exists(_ <= v - keep))
        .foreach { p => fs.delete(p, true); () }
    }
  }
}
