package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // ≥5 interleaved reps, min AND median reported: the host is
    // co-tenant and single runs swing ±3× (r5 showed a 40% phantom
    // regression on byte-identical code), so round-over-round deltas
    // need the min (noise is strictly additive) with the median as the
    // typical-case companion
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "5").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warmup so the first measured query isn't charged for
    // session spin-up; not included in reported timings
    try {
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy("l_returnflag").count().collect()
    } catch { case _: Throwable => () }
    val names = (SparkEntry.queries ++ SparkEntry.benchExtras)
      .toSeq.sortBy(_._1)
    // interleaved rounds (all queries rep 1, then rep 2, …) so a noise
    // spike hits one rep of many queries, not every rep of one query
    val times = Array.fill(names.length)(List.empty[Double])
    for (_ <- 1 to reps; i <- names.indices) {
      val (_, fn) = names(i)
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      times(i) ::= (System.nanoTime() - t0) / 1e9
    }
    def median(xs: List[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    // headline value = sum of per-query MINIMA: scheduling noise on a
    // co-tenant host only ever ADDS time, so min-of-n is the stable
    // estimator for regression gating; medians ride along for the
    // typical-case view. Values at ms precision: the full double repr
    // doubled the line length for digits below measurement noise, and a
    // byte-limited stdout capture must fit the WHOLE line (r6's record
    // lost its tail to exactly that)
    def fmt(v: Double) = f"$v%.3f"
    def obj(f: List[Double] => Double) =
      names.map(_._1).zip(times.map(f))
        .map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}")
    val qs = obj(_.min)
    val qsMedian = obj(median)
    val total = times.map(_.min).sum
    val line = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n":$reps,"stat":"min","queries":$qs,"queries_median":$qsMedian,"sf":"$sfDir"}"""
    // stop Spark BEFORE printing so no shutdown output lands after the
    // JSON line in a tail-limited capture; also persist a sidecar copy —
    // the durable record even if the stdout capture clips
    spark.stop()
    val sidecar = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      "/tmp/graft_bench_last.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(sidecar),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case _: java.io.IOException => () }
    println(line)
    System.out.flush()
  }
}
