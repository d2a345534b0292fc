package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev profiling harness: time any subset of catalog queries at any SF
  * directory, with repeat runs to separate one-time costs (index
  * builds, codegen) from steady-state plans.
  *
  * Usage: runMain graft.tools.ProfileQueries <sfDir> <repeats> [name...]
  * (no names = every catalog query).
  */
object ProfileQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val repeats = args.lift(1).map(_.toInt).getOrElse(1)
    val names =
      if (args.length > 2) args.drop(2).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (r <- 1 to repeats; name <- names) {
      val t0 = System.nanoTime()
      // Full materialization (toRdd), matching graft.Bench — count()
      // lets Catalyst prune computed columns and under-measures
      // projection-heavy queries.
      val n = graft.SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.toRdd.count()
      println(f"[profile] run$r $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}
