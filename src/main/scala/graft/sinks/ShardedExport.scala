package graft.sinks

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.text.TextFunctions

/** Materialized training-data export: write a frame as `numShards`
  * deterministic shards — the disk-level counterpart of the c08 shard
  * MANIFEST query. Shard assignment is `md5Bucket(key, numShards)`
  * (c08's formula: a pure function of the key, so the same corpus
  * exports identically across runs, engines, and partitionings — and
  * a re-export after an incremental append moves only the rows whose
  * keys changed shards, i.e. none).
  *
  * Layout: `dir/shard=N/…` hive directories (readers filter-prune on
  * the shard column), data repartitioned BY the shard column so each
  * shard's rows land in one task's output files (`maxRecordsPerFile`
  * bounds single-file size at 100 TB — a shard splits into more files,
  * never across directories), `parquet` (columnar, default) or `json`
  * (JSONL, the interchange format training stacks ingest). The
  * `_manifest.json` sidecar — per-shard row counts + total, computed
  * by re-reading the files ACTUALLY WRITTEN (one shard-grouped count
  * over the output; parquet answers it from footer metadata) — is
  * written LAST as the commit marker: a crashed export has no
  * manifest and readers treat it as absent, and a non-deterministic
  * input frame (or a source mutated mid-export) can never commit a
  * manifest that disagrees with the data on disk.
  *
  * Cost at corpus scale: one hash exchange on the shard id (the
  * export shuffle a training pipeline pays anyway to get its fixed
  * shard count) + one |shards|-row aggregate. No collect of data rows.
  */
object ShardedExport {

  final case class Manifest(shards: Map[Int, Long], totalRows: Long)

  private def manifestPath(dir: String) = new Path(dir, "_manifest.json")

  /** Write and return the manifest. Existing data at `dir` is
    * overwritten atomically-enough for the single-writer contract the
    * CDC stores document: data first, manifest (the read gate) last. */
  def writeShards(df: DataFrame, shardKey: String, dir: String,
                  numShards: Int, format: String = "parquet",
                  maxRecordsPerFile: Long = 5000000L): Manifest = {
    require(numShards >= 1, s"numShards must be >= 1, got $numShards")
    require(Seq("parquet", "json").contains(format),
      s"format must be parquet or json, got $format")
    val spark = df.sparkSession
    val sharded = df.withColumn("shard",
      TextFunctions.md5Bucket(col(shardKey), numShards))
    sharded.repartition(numShards, col("shard"))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("shard")
      .format(format).save(dir)
    // Counts come from the written output, not a re-aggregation of the
    // input frame: a second job over a non-deterministic frame (or a
    // source mutated between the two jobs) would commit a manifest
    // disagreeing with the files on disk. Parquet serves this count
    // from footer metadata; json pays one output scan — the price of
    // the commit marker being truthful. The schema is passed explicitly:
    // a 0-row export writes no data files, and schema inference over an
    // empty dir throws instead of yielding the empty frame we want (it
    // also costs json a full inference pass on top of the count scan).
    val counts = spark.read.schema(sharded.schema).format(format).load(dir)
      .groupBy("shard").agg(count(lit(1)).as("n"))
      .collect().map(r => r.get(0).toString.toInt -> r.getLong(1)).toMap
    val m = Manifest(counts, counts.values.sum)
    val json = counts.toSeq.sorted
      .map { case (s, n) => s""""$s": $n""" }
      .mkString(s"""{"total_rows": ${m.totalRows}, "shards": {""", ", ",
        "}}")
    val fs = manifestPath(dir).getFileSystem(
      spark.sessionState.newHadoopConf())
    val out = fs.create(manifestPath(dir), true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
    m
  }

  /** Read a committed export (None before/without its manifest —
    * a crashed write is invisible, like the IndexDirs stores). */
  def readShards(spark: SparkSession, dir: String,
                 format: String = "parquet"): Option[DataFrame] = {
    val fs = manifestPath(dir).getFileSystem(
      spark.sessionState.newHadoopConf())
    if (!fs.exists(manifestPath(dir))) None
    else Some(spark.read.format(format).load(dir))
  }

  /** The committed manifest, parsed. */
  def manifest(spark: SparkSession, dir: String): Option[Manifest] = {
    val fs = manifestPath(dir).getFileSystem(
      spark.sessionState.newHadoopConf())
    if (!fs.exists(manifestPath(dir))) None
    else {
      val in = fs.open(manifestPath(dir))
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
                finally in.close()
      val total = """"total_rows":\s*(\d+)""".r
        .findFirstMatchIn(txt).get.group(1).toLong
      // only shard entries have all-digit keys; "total_rows" cannot match
      val shards = """"(\d+)":\s*(\d+)""".r.findAllMatchIn(txt)
        .map(m => m.group(1).toInt -> m.group(2).toLong).toMap
      Some(Manifest(shards, total))
    }
  }
}
