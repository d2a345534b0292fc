ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "sfguideintrotocdcusingsnowflakepostgresconnectordynamictablesspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Long-haul properties (soak sequences, crash kill matrices) carry
// the graft.Slow tag and stay OUT of the per-commit `sbt test` loop;
// GRAFT_SLOW=1 runs the full contract (required before a round
// close). `sbt "testOnly * -- -n graft.Slow"` runs only the slow set.
Test / testOptions ++= (
  if (sys.env.get("GRAFT_SLOW").contains("1")) Seq.empty
  else Seq(Tests.Argument(TestFrameworks.ScalaTest, "-l", "graft.Slow")))
// Suite-level parallelism ACROSS forked JVMs (spark_optimization_guide
// §2.6 — overlap independent jobs — applied to the test suite): the
// suites share one lazy SparkSession per JVM and several mutate session
// conf (broadcast thresholds, codegen.fallback) or the dedup cache
// registry, so in-JVM parallel suites would race; separate JVMs are
// fully isolated and each runs its suites sequentially exactly as
// before. 4 groups × local[8] sessions fit the 32-core box; each group
// JVM caps its heap so four coexist. Suites are assigned greedily,
// heaviest first onto the lightest group, from the measured r15
// per-suite wall table (idle box, -oD run; unlisted suites default to
// 10 s) — round-robin measured an 11-min straggler group where the
// balanced split's critical path is ~7 min. One JVM
// (GRAFT_TEST_JVMS=1) restores the r14 behavior byte-for-byte.
val testJvms = sys.env.get("GRAFT_TEST_JVMS").map(_.toInt).getOrElse(4)
// measured seconds per suite, r15 (-oD), for balance only — staleness
// just shifts balance, never correctness
val suiteWeight: Map[String, Int] = Map(
  "StreamingEmbeddingDedupSpec" -> 189, "StreamingDupSpansSpec" -> 136,
  "DynamicTableSpec" -> 95, "IncrementalNearDupSpec" -> 95,
  "StreamingCrossDocGramsSpec" -> 86, "ConnectedComponentsSpec" -> 73,
  "StreamingBm25Spec" -> 55, "PqAnnSpec" -> 47, "StreamingDsirSpec" -> 47,
  "BucketTrieSpec" -> 42, "ExtensionsSpec" -> 38,
  "StreamingContentDedupSpec" -> 37, "SimilarityIvfSpec" -> 35,
  "ContainmentJoinSpec" -> 33, "PartitionedDynamicTableSpec" -> 30,
  "StreamingDedupScaleSpec" -> 30, "StreamingDsirScaleSpec" -> 29,
  "StreamingContainmentSpec" -> 29, "StreamingAnnSpec" -> 24,
  "PartitionedReplicatedTableSpec" -> 22, "QueriesSpec" -> 20,
  "DashboardLiveSpec" -> 20, "CrashRecoverySpec" -> 18,
  "StreamingIvfSpec" -> 15, "StreamingDecontaminationSpec" -> 15,
  "StreamingSegmentDedupSpec" -> 15, "DedupRecallGateSpec" -> 15,
  "StreamingDedupSpec" -> 12, "StreamingCurationSpec" -> 12)
Test / testGrouping := {
  val tests = (Test / definedTests).value
    .sortBy(t => (-suiteWeight.getOrElse(
      t.name.split('.').last, 10), t.name))
  val base = (Test / forkOptions).value
  val loads = Array.fill(testJvms)(0L)
  val groups = Array.fill(testJvms)(Vector.empty[TestDefinition])
  tests.foreach { t =>
    val i = loads.indexOf(loads.min)
    loads(i) += suiteWeight.getOrElse(t.name.split('.').last, 10).toLong
    groups(i) = groups(i) :+ t
  }
  groups.toSeq.zipWithIndex.map { case (ts, i) =>
    // per-group java.io.tmpdir: the catalog's persisted ANN indexes
    // (and any other tmp-rooted shared state) are keyed under the
    // JVM's tmpdir, so concurrent groups would race a shared
    // build-once path without this isolation
    val tmp = file(s"target/test-tmp/jvm-$i").getAbsoluteFile
    java.nio.file.Files.createDirectories(tmp.toPath)
    val opts = (Test / javaOptions).value.toVector ++
      Vector("-Xmx10g", s"-Djava.io.tmpdir=$tmp")
    Tests.Group(s"jvm-$i", ts, Tests.SubProcess(base.withRunJVMOptions(opts)))
  }
}
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, testJvms),
  Tags.limitAll(math.max(4, testJvms)))
// The driver parses graft.Bench's one JSON stdout line; sbt's default
// LoggedOutput would prefix every forked-process line with "[info] ",
// breaking any line-anchored parse. Inherit stdout/stderr directly.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // Default heap: half of physical RAM, capped at 24g (the full-
  // catalog bench box has 128 GiB; the old flat 8g left ~4.6 GB of
  // unified pool for 130+ queries' shared caches PLUS the containment
  // family's aggregation state — measured cache-eviction churn doubled
  // the CPU of every cache-reading query). Sizing from the machine
  // keeps a 16 GB laptop from swapping under a heap bigger than RAM;
  // SPARK_DRIVER_MEM still overrides.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", {
    val physGb =
      try java.lang.management.ManagementFactory.getOperatingSystemMXBean
        .asInstanceOf[com.sun.management.OperatingSystemMXBean]
        .getTotalMemorySize >> 30
      catch { case _: Throwable => 16L }
    s"${math.max(4L, math.min(24L, physGb / 2))}g"
  })}",
)
