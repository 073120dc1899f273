package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: per-call latency of the staged-commit primitive at
  * micro-batch scale — where does a 10-row component write's time go on
  * a 4-core session (the suite's shape)? Prints per-call wall for
  * writeBucketedAt (shuffle exchange + bucketed insert + move) so the
  * suite-wall work can target the real term instead of guessing.
  */
object WriteLatencyProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft-wlat").toString
    val df = (0L until 10L).map(i => (i, s"v$i")).toDF("id", "v")
    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    // warmup
    graft.operators.ScaleOps.writeBucketedAt(df, s"$root/w", Seq("id"), 8)
    val n = 20
    val times = (1 to n).map { i =>
      timed(graft.operators.ScaleOps.writeBucketedAt(
        df.withColumn("v", concat(lit(s"r$i-"), col("v"))),
        s"$root/d$i", Seq("id"), 8))
    }
    println(f"writeBucketedAt 10 rows: min ${times.min}%.3f s  " +
      f"median ${times.sorted.apply(n / 2)}%.3f s  max ${times.max}%.3f s")
    // contrast: plain parquet write of the same 10 rows (no catalog, no
    // exchange, no move) — the floor the staged path could approach
    val plain = (1 to n).map { i =>
      timed(df.write.mode("overwrite").parquet(s"$root/p$i"))
    }
    println(f"plain parquet write:     min ${plain.min}%.3f s  " +
      f"median ${plain.sorted.apply(n / 2)}%.3f s  max ${plain.max}%.3f s")
    spark.stop()
  }
}
