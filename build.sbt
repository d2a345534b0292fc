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
