package graft.dev

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable.ArrayBuffer

/** Scratch: runs one query cold and prints per-stage wall times. */
object PerfProbe3 {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val stages = ArrayBuffer[(Int, String, Long, Int)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val info = sc.stageInfo
        val dur = for {
          s <- info.submissionTime; c <- info.completionTime
        } yield c - s
        stages += ((info.stageId, info.name.take(60), dur.getOrElse(-1L),
          info.numTasks))
      }
    })
    val t0 = System.nanoTime()
    val n = graft.SparkEntry.queries(name)(spark, sfDir).count()
    println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    Thread.sleep(500)
    stages.sortBy(-_._3).take(15).foreach { case (id, nm, dur, tasks) =>
      println(f"  stage $id%4d ${dur}%6d ms  $tasks%4d tasks  $nm")
    }
  }
}
