package graft.dev

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scratch: A/B for the union staged writes (r17 judge ask #4 — merge
  * same-bucket-spec component writes). Absorbs the SAME batch sequence
  * into two fresh text indexes, once with
  * `spark.graft.stage.unionwrites=true` (bands+simbands and
  * sizes+simsizes each ride one partitioned insert) and once with the
  * per-component writes, and reports per-absorb wall plus the Spark
  * JOB COUNT each mode schedules (the lever the union pulls: fewer
  * fixed-latency jobs per staged commit). Output: one JSON line.
  */
object UnionWriteProbe {

  def main(args: Array[String]): Unit = {
    val absorbs = sys.env.getOrElse("SPARK_GRAFT_UWP_ITERS", "8").toInt
    val batch = sys.env.getOrElse("SPARK_GRAFT_UWP_BATCH", "400").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.graft.stage.parallelism", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val jobs = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            s: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); ()
        }
      })

    def doc(i: Long) = s"union probe doc $i " +
      (1 to 24).map(w => s"w${(i * 37 + w * 11) % 499}").mkString(" ")
    def docs(lo: Long, n: Int): DataFrame =
      (lo until lo + n).map(i => (i, doc(i))).toDF("doc_id", "text")

    def run(union: Boolean): (Double, Int, Long) = {
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft-uwp-$union").toString
      spark.conf.set("spark.graft.stage.unionwrites", union.toString)
      graft.operators.DedupIndex.writeText(
        docs(0L, 2000), "doc_id", "text", dir)
      // settle listener delivery before counting the timed region
      Thread.sleep(500)
      val j0 = jobs.get()
      val t0 = System.nanoTime()
      (0 until absorbs).foreach { k =>
        graft.operators.DedupIndex.appendText(
          docs(1000000L + k.toLong * batch, batch), "doc_id", "text", dir)
      }
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      val j = jobs.get() - j0
      val live = graft.operators.DedupIndex.loadText(spark, dir)
        .sigs.count()
      (wall, j, live)
    }

    // run serial first, union second, then the reverse order in the
    // same JVM — JIT/metastore warmup must not be attributed to a mode
    val s1 = run(union = false)
    val u1 = run(union = true)
    val u2 = run(union = true)
    val s2 = run(union = false)
    // Locale.ROOT, as Bench.fmt/Sentinel.statsJson do: the f
    // interpolator honors the JVM default locale, and a comma-decimal
    // locale would emit "1,23" (invalid JSON, and toDouble would throw)
    def f(d: Double) =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(d))
    println(s"""{"metric":"union_write_ab","absorbs":$absorbs,""" +
      s""""batch":$batch,""" +
      s""""serial_wall_sec":[${f(s1._1)},${f(s2._1)}],""" +
      s""""union_wall_sec":[${f(u1._1)},${f(u2._1)}],""" +
      s""""serial_jobs":[${s1._2},${s2._2}],""" +
      s""""union_jobs":[${u1._2},${u2._2}],""" +
      s""""live_rows":[${s1._3},${u1._3},${u2._3},${s2._3}]}""")
    spark.stop()
  }
}
