package graft.cdc

import java.net.{URLDecoder, URLEncoder}
import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** The 100 TB form of [[ReplicatedTable]]: partition-scoped CDC merge.
  *
  * Layout: `path/p=<encoded-value>/v=N` with an atomic `_CURRENT`
  * pointer per partition. A change batch only ever reads and rewrites
  * the partitions its keys live in — apply cost is O(touched
  * partitions), not O(table). For a fact table partitioned by
  * `transaction_date`, a steady-state CDC batch touches one or two
  * date partitions of an arbitrarily large table.
  *
  * Mechanics per batch: LWW-collapse the changes, collect the affected
  * partition values (a tiny driver-side list), merge against a
  * partition-pruned read of just those partitions in one job, stage the
  * result with a partitioned write, then rename each staged partition
  * into place as its next version and swap the pointer. Readers always
  * see complete immutable versions; untouched partitions are untouched
  * (asserted in the spec).
  *
  * Constraints (documented contract):
  *  - every event (including DELETEs) must carry the partition column —
  *    the replica identity of a partitioned table includes its
  *    partition key;
  *  - the partition value is immutable per primary key (a key never
  *    migrates between partitions) — true of transaction_date per
  *    transaction_id, and of event-time partitioning generally.
  */
final class PartitionedReplicatedTable(spark: SparkSession, path: String,
                                       val keys: Seq[String],
                                       val partitionCol: String)
    extends KeyedTable {

  private val root = new Path(path)
  private val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
  private val Empty = "EMPTY"

  private def enc(v: Any): String =
    URLEncoder.encode(String.valueOf(v), StandardCharsets.UTF_8)
  private def partDir(e: String) = new Path(root, s"p=$e")
  private def pointer(e: String) = new Path(partDir(e), "_CURRENT")

  private def readPointer(e: String): Option[String] = {
    val p = pointer(e)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(in.readAllBytes(), StandardCharsets.UTF_8).trim)
      finally in.close()
    }
  }

  private def writePointer(e: String, content: String): Unit = {
    fs.mkdirs(partDir(e))
    val out = fs.create(pointer(e), true)
    try out.write(content.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  private def schemaPath = new Path(root, "_SCHEMA")

  private def writeSchema(s: StructType): Unit = {
    val out = fs.create(schemaPath, true)
    try out.write(s.json.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  private def schema: StructType = {
    val in = fs.open(schemaPath)
    try DataType.fromJson(new String(in.readAllBytes(),
      StandardCharsets.UTF_8)).asInstanceOf[StructType]
    finally in.close()
  }

  def isSnapshotDone: Boolean = fs.exists(schemaPath)

  /** Partition values present (encoded form). */
  private def partitions(): Seq[String] =
    if (!fs.exists(root)) Nil
    else fs.listStatus(root).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("p=")).map(_.stripPrefix("p="))

  private def currentDirs(parts: Seq[String]): Seq[String] =
    parts.flatMap { e =>
      readPointer(e) match {
        case Some(Empty) | None => None
        case Some(v) => Some(new Path(partDir(e), v).toString)
      }
    }

  private def read(parts: Seq[String]): DataFrame = {
    val dirs = currentDirs(parts)
    if (dirs.isEmpty) spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    // recursiveFileLookup disables partition-dir inference — the p=/v=
    // path segments are our layout, not Hive partitioning; the
    // partition column is stored in the files themselves
    else spark.read.schema(schema)
      .option("recursiveFileLookup", "true").parquet(dirs: _*)
  }

  def current(): DataFrame = read(partitions())

  /** Pruned read of the partitions holding the given values. */
  def currentForValues(values: Seq[Any]): DataFrame = read(values.map(enc))

  /** Encoded partition values of a frame, computed with the same Spark
    * expression the staged write uses — encoding parity by construction. */
  private def encodedValues(df: DataFrame): Seq[String] =
    df.select(url_encode(col(partitionCol).cast("string")).as("__p"))
      .distinct().collect().map(r => Option(r.getString(0)).orNull).toSeq

  /** Initial snapshot: stage a partitioned write, install every
    * partition as v=0. */
  def snapshot(df: DataFrame): Unit = {
    writeSchema(df.schema)
    stageAndInstall(df, encodedValues(df))
  }

  /** Partition-scoped incremental apply. */
  def applyChanges(changes: DataFrame): Unit = {
    require(isSnapshotDone, s"cannot apply changes before snapshot: $path")
    val winners = CdcApply.latest(changes, keys)
    val affected = encodedValues(winners)
    require(!affected.contains(null),
      s"every change event must carry $partitionCol (incl. DELETE replica identity)")
    val merged = CdcApply.applyBatch(read(affected), winners, keys)
    stageAndInstall(merged, affected)
  }

  /** One staged partitioned write, then per-partition version install.
    * A partition absent from the staged output became empty. */
  private def stageAndInstall(df: DataFrame, affected: Seq[String]): Unit = {
    val stage = new Path(root, s"_stage-${System.nanoTime()}")
    df.withColumn("__p", url_encode(col(partitionCol).cast("string")))
      .write.partitionBy("__p").parquet(stage.toString)
    affected.foreach { e =>
      val staged = new Path(stage, s"__p=$e")
      // next = one past the highest version ever written, NOT pointer+1:
      // an EMPTY partition keeps its old version dirs, which must never
      // be reused (the rename would land inside the existing dir).
      val next =
        if (!fs.exists(partDir(e))) 0
        else fs.listStatus(partDir(e)).toSeq.map(_.getPath.getName)
          .filter(_.startsWith("v="))
          .map(_.stripPrefix("v=").toInt)
          .maxOption.fold(0)(_ + 1)
      if (fs.exists(staged)) {
        fs.mkdirs(partDir(e))
        val dest = new Path(partDir(e), s"v=$next")
        if (!fs.rename(staged, dest))
          throw new IllegalStateException(s"failed to install $dest")
        writePointer(e, s"v=$next")
      } else writePointer(e, Empty)
    }
    fs.delete(stage, true)
  }

  /** Version pointer of one partition value (None = no such partition,
    * Some(Empty) = all rows deleted). Exposed for tests/monitoring. */
  def partitionVersion(value: Any): Option[String] = readPointer(enc(value))
}
