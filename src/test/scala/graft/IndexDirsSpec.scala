package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.IndexDirs

/** The versioned directory discipline shared by every maintained
  * index: liveness gating, flat-layout adoption (upgrade continuity),
  * and writer-side first-append hygiene. */
class IndexDirsSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("flat-layout state is adopted into v0, preserving continuity") {
    // an index written by the pre-version layout: data files +
    // _SUCCESS directly under the state path
    val path = Files.createTempDirectory("graft-idirs-flat").toString + "/index"
    Seq((1L, 10), (2L, 20)).toDF("id", "x")
      .write.parquet(path) // flat: part files + _SUCCESS at the root
    assert(new java.io.File(s"$path/_SUCCESS").exists)

    // first contact through the versioned API adopts it as a live v0
    val adopted = IndexDirs.readIfExists(spark, path)
    assert(adopted.isDefined, "flat state read as empty after upgrade")
    assert(adopted.get.select("id").collect().map(_.getLong(0)).sorted.toSeq
      == Seq(1L, 2L))
    assert(new java.io.File(s"$path/v0/_SUCCESS").exists)
    assert(IndexDirs.appendDir(spark, path) == s"$path/v0")
    // idempotent: a second read sees the same single live version
    assert(IndexDirs.versions(spark, path) == Seq(0L))
  }

  test("an INCOMPLETE flat layout stays invisible after adoption") {
    val path = Files.createTempDirectory("graft-idirs-flat2").toString + "/index"
    Seq((1L, 10)).toDF("id", "x").write.parquet(path)
    assert(new java.io.File(s"$path/_SUCCESS").delete())
    assert(IndexDirs.readIfExists(spark, path).isEmpty,
      "incomplete flat state became visible")
    // the writer's next append sweeps the unmarked leftover
    assert(IndexDirs.prepareAppend(spark, path) == s"$path/v0")
    assert(!new java.io.File(s"$path/v0").exists
      || new java.io.File(s"$path/v0").listFiles().isEmpty)
  }

  test("prepareAppend sweeps a crashed first append before the replay") {
    val path = Files.createTempDirectory("graft-idirs-crash").toString + "/index"
    // simulate: sidecar landed, data append crashed mid job-commit —
    // partial part file present, no root _SUCCESS
    Seq((0, Seq(1.0f))).toDF("ivf_list", "centroid")
      .write.parquet(s"$path/v0/_centroids")
    Seq((1L, 0)).toDF("id", "ivf_list").write.parquet(s"$path/v0/__tmp")
    // move a stranded data file to the version root, as a partial
    // job-commit would leave it
    val part = new java.io.File(s"$path/v0/__tmp").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    assert(part.renameTo(new java.io.File(s"$path/v0/${part.getName}")))

    val markers = Seq("_centroids/_SUCCESS")
    assert(IndexDirs.readIfExists(spark, path, markers).isEmpty,
      "unmarked v0 visible to readers")
    // the replayed first batch gets a CLEAN v0: no stranded partials
    // to surface when its _SUCCESS lands, no stale quantizer to adopt
    val target = IndexDirs.prepareAppend(spark, path, markers)
    assert(target == s"$path/v0")
    assert(!new java.io.File(s"$path/v0").exists,
      "crashed first-append leftovers not swept")

    // the replay commits normally and the state is exactly its content
    Seq((1L, 0), (2L, 1)).toDF("id", "ivf_list").write.parquet(target)
    assert(IndexDirs.readIfExists(spark, path).get.count() == 2)
    // once a live version exists, prepareAppend never deletes anything
    assert(IndexDirs.prepareAppend(spark, path) == s"$path/v0")
    assert(IndexDirs.readIfExists(spark, path).get.count() == 2)
  }

  test("rewrites retire all but the newest two live versions") {
    val path = Files.createTempDirectory("graft-idirs-ret").toString + "/index"
    Seq((1L, 1)).toDF("id", "x").write.parquet(IndexDirs.prepareAppend(spark, path))
    for (_ <- 1 to 3) {
      val cur = IndexDirs.readIfExists(spark, path).get
      cur.write.parquet(IndexDirs.nextDir(spark, path))
      IndexDirs.retire(spark, path)
    }
    val vs = IndexDirs.versions(spark, path)
    assert(vs == Seq(2L, 3L), s"expected two newest live versions, got $vs")
    assert(!new java.io.File(s"$path/v0").exists)
    assert(!new java.io.File(s"$path/v1").exists)
  }
}
