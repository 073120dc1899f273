package graft.dev

import org.apache.spark.sql.SparkSession

/** Writes `.explain("formatted")` output for named declared queries to
  * files — the optimization rounds' plan-evidence artifact
  * (`plans/r<N>/<query>_{before,after}.txt`). Each query is EXECUTED
  * first so the dumped plan is the AQE final plan (chosen joins, codegen
  * markers), not the pre-execution placeholder.
  *
  * Usage: PlanDump <sfDir> <outDir> <suffix> [query ...]
  * (no query names = every declared query).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = java.nio.file.Paths.get(args(1))
    val suffix = args(2)
    val names = if (args.length > 3) args.drop(3).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    java.nio.file.Files.createDirectories(outDir)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val all = graft.SparkEntry.queries ++ graft.SparkEntry.benchExtras
    for (name <- names) {
      spark.sparkContext.setJobDescription(s"plandump: $name")
      val df = all(name)(spark, sfDir)
      // materialize THIS df's QueryExecution so AQE finalizes the plan
      df.collect()
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(outDir.resolve(s"${name}_$suffix.txt"),
        txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      System.err.println(s"[plandump] $name -> ${name}_$suffix.txt")
    }
    spark.stop()
  }
}
