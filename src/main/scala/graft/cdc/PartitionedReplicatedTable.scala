package graft.cdc

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** The 100 TB form of [[ReplicatedTable]]: partition-scoped CDC merge.
  *
  * Layout: `path/p=<enc>/v=N` immutable version directories plus a
  * root manifest (`m=N` files + one `_CURRENT` pointer). A change batch
  * only ever reads and rewrites the partitions its keys live in — apply
  * cost is O(touched partitions), not O(table). For a fact table
  * partitioned by `transaction_date`, a steady-state CDC batch touches
  * one or two date partitions of an arbitrarily large table.
  *
  * Mechanics per batch: LWW-collapse the changes, collect the affected
  * partition values (a tiny driver-side list), merge against a
  * partition-pruned read of just those partitions in one job, stage the
  * result with a partitioned write, rename each staged partition into
  * place as its next immutable version, then publish ONE new manifest
  * mapping every partition to its version and swap the root pointer.
  * The pointer swap is the single commit point: readers resolve all
  * partitions from one manifest, so a multi-partition batch is visible
  * all-or-nothing — no torn reads — and a crashed writer leaves only
  * unreferenced version dirs.
  *
  * Partition values are encoded as `x` + uppercase hex of the UTF-8
  * bytes (`hex()` on the write side, the same bytes driver-side).
  * Hex is escape-free — every generated directory name is alphanumeric
  * — so values containing `%`, `:`, spaces, or non-ASCII survive
  * Spark's Hive-style partition-name escaping verbatim (a URL-encoded
  * scheme would be re-escaped by the writer and break the staged-dir
  * lookup). The `x` prefix keeps the name non-empty for `""`.
  *
  * Constraints (documented contract):
  *  - every event (including DELETEs) must carry the partition column —
  *    the replica identity of a partitioned table includes its
  *    partition key; snapshots must not contain null partition values
  *    either;
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
  private val head = new Path(root, "_CURRENT")

  /** Driver-side twin of [[encExpr]]: `x` + uppercase hex of UTF-8. */
  private def enc(v: Any): String =
    if (v == null) null
    else "x" + String.valueOf(v).getBytes(StandardCharsets.UTF_8)
      .map(b => f"${b & 0xff}%02X").mkString

  /** Spark-side partition encoding — must emit byte-identical names to
    * [[enc]] (hex of the same UTF-8 bytes; spec-checked with `:`,
    * space, `%`, and non-ASCII values). */
  private def encExpr: Column =
    concat(lit("x"), hex(col(partitionCol).cast("string")))

  private def partDir(e: String) = new Path(root, s"p=$e")

  private def writeSmall(p: Path, content: String): Unit = {
    val out = fs.create(p, true)
    try out.write(content.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  private def readSmall(p: Path): String = {
    val in = fs.open(p)
    try new String(in.readAllBytes(), StandardCharsets.UTF_8).trim
    finally in.close()
  }

  private def schemaPath = new Path(root, "_SCHEMA")

  private def schema: StructType =
    DataType.fromJson(readSmall(schemaPath)).asInstanceOf[StructType]

  def isSnapshotDone: Boolean = fs.exists(head)

  /** The committed manifest: encoded partition value → "v=N" | EMPTY. */
  private def manifest(): Map[String, String] =
    if (!isSnapshotDone) Map.empty
    else readSmall(new Path(root, s"m=${readSmall(head)}"))
      .linesIterator.filter(_.nonEmpty).map { line =>
        val Array(e, v) = line.split('\t'); e -> v
      }.toMap

  private def read(m: Map[String, String], parts: Seq[String]): DataFrame = {
    // pair each requested partition with ITS OWN manifest entry —
    // partitions absent from the manifest (new in this batch) or EMPTY
    // contribute no dir
    val dirs = parts.flatMap(e => m.get(e).collect {
      case v if v != Empty => new Path(partDir(e), v).toString
    })
    if (dirs.isEmpty) spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    // recursiveFileLookup disables partition-dir inference — the p=/v=
    // path segments are our layout, not Hive partitioning; the
    // partition column is stored in the files themselves
    else spark.read.schema(schema)
      .option("recursiveFileLookup", "true").parquet(dirs: _*)
  }

  def current(): DataFrame = {
    val m = manifest(); read(m, m.keys.toSeq)
  }

  /** Pruned read of the partitions holding the given values. */
  def currentForValues(values: Seq[Any]): DataFrame =
    read(manifest(), values.map(enc))

  /** Encoded partition values of a frame, computed with the same Spark
    * expression the staged write uses — encoding parity by construction. */
  private def encodedValues(df: DataFrame): Seq[String] =
    df.select(encExpr.as("__p"))
      .distinct().collect().map(r => Option(r.getString(0)).orNull).toSeq

  /** Initial snapshot: stage a partitioned write, install every
    * partition as v=0, publish manifest 0. */
  def snapshot(df: DataFrame): Unit = {
    writeSmall(schemaPath, df.schema.json)
    val parts = encodedValues(df)
    require(!parts.contains(null),
      s"snapshot rows must carry a non-null $partitionCol")
    stageAndInstall(df, parts, Map.empty, 0)
  }

  /** Partition-scoped incremental apply. Upstream column ADDs evolve
    * the table (see [[CdcApply.applyBatch]]): the schema sidecar is
    * rewritten first, and since reads apply the stored schema, parquet
    * files of untouched partitions null-fill the new column at read
    * time — no rewrite of unaffected data. (Crash window: schema
    * updated but manifest not yet published shows the added column as
    * all-NULL until the batch lands — benign, no data loss.) */
  def applyChanges(changes: DataFrame): Unit = {
    require(isSnapshotDone, s"cannot apply changes before snapshot: $path")
    val winners = CdcApply.latest(changes, keys)
    val affected = encodedValues(winners)
    require(!affected.contains(null),
      s"every change event must carry $partitionCol (incl. DELETE replica identity)")
    val m = manifest()
    val merged = CdcApply.applyBatch(read(m, affected), winners, keys,
      allowEvolution = true)
    if (merged.schema.fieldNames.toSeq != schema.fieldNames.toSeq)
      writeSmall(schemaPath, merged.schema.json)
    stageAndInstall(merged, affected, m, readSmall(head).toInt + 1)
  }

  /** One staged partitioned write, per-partition version renames, then
    * a single manifest publish as the batch's commit point. A partition
    * absent from the staged output became empty. */
  private def stageAndInstall(df: DataFrame, affected: Seq[String],
                              prev: Map[String, String],
                              manifestV: Int): Unit = {
    val stage = new Path(root, s"_stage-${System.nanoTime()}")
    df.withColumn("__p", encExpr)
      .write.partitionBy("__p").parquet(stage.toString)
    val updates = affected.map { e =>
      val staged = new Path(stage, s"__p=$e")
      // next = one past the highest version ever written, NOT prev+1:
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
        e -> s"v=$next"
      } else e -> Empty
    }
    val next = prev ++ updates
    writeSmall(new Path(root, s"m=$manifestV"),
      next.map { case (e, v) => s"$e\t$v" }.mkString("\n"))
    writeSmall(head, manifestV.toString) // the commit point
    fs.delete(stage, true)
  }

  /** Version of one partition value (None = no such partition,
    * Some(EMPTY) = all rows deleted). Exposed for tests/monitoring. */
  def partitionVersion(value: Any): Option[String] =
    manifest().get(enc(value))

  /** Table maintenance — the VACUUM analog this layout needs at a
    * 1-minute lag cadence (every touched partition leaves its previous
    * version dir behind; 1 440 manifests/day accumulate): delete every
    * partition version dir not referenced by the newest
    * `keepManifests` manifests, the manifests older than those, and
    * crashed `_stage-*` leftovers. Retention gives concurrent readers
    * the same grace window as `IndexDirs.retire` — a reader that
    * resolved any retained manifest still finds all its files; run
    * with the single-writer discipline (between applies, like the ANN
    * compactions). Version-number reuse after a sweep is safe: the
    * writer's next-version probe keys off dirs that still exist, and
    * a fully swept partition restarts at a dir that no longer does. */
  def vacuum(keepManifests: Int = 2,
             stageGraceMs: Long = 15 * 60 * 1000L): Unit = {
    require(keepManifests >= 1, "must retain at least the head manifest")
    if (!isSnapshotDone) return
    val hv = readSmall(head).toInt
    val keepFrom = math.max(0, hv - keepManifests + 1)
    // live (partition, version-dir) references across retained manifests
    val live: Set[(String, String)] = (keepFrom to hv).flatMap { v =>
      val p = new Path(root, s"m=$v")
      if (!fs.exists(p)) Nil
      else readSmall(p).linesIterator.filter(_.nonEmpty).map { line =>
        val Array(e, ver) = line.split('\t'); (e, ver)
      }.toSeq
    }.filter(_._2 != Empty).toSet
    // sweep unreferenced partition versions
    fs.listStatus(root).toSeq.map(_.getPath)
      .filter(_.getName.startsWith("p=")).foreach { pd =>
        val e = pd.getName.stripPrefix("p=")
        fs.listStatus(pd).toSeq.map(_.getPath)
          .filter(_.getName.startsWith("v="))
          .filterNot(vd => live((e, vd.getName)))
          .foreach { vd => fs.delete(vd, true); () }
      }
    // sweep superseded manifests and crashed staging dirs. Stage dirs
    // are age-gated on filesystem mtime: the single-writer convention
    // says vacuum runs between applies, but if an apply IS in flight
    // (convention violated, or a human ran vacuum by hand), its fresh
    // _stage-* must not be yanked out from under the staging write —
    // a crashed leftover is by definition old, so the grace window
    // only delays its sweep, never leaks it.
    val now = System.currentTimeMillis()
    fs.listStatus(root).toSeq.foreach { st =>
      val n = st.getPath.getName
      val oldManifest = n.startsWith("m=") &&
        n.stripPrefix("m=").toIntOption.exists(_ < keepFrom)
      val deadStage = n.startsWith("_stage-") &&
        now - st.getModificationTime >= stageGraceMs
      if (oldManifest || deadStage) { fs.delete(st.getPath, true); () }
    }
  }
}
