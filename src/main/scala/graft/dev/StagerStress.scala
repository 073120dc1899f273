package graft.dev

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch: CONCURRENT-STAGER stress for the pooled-scratch staged
  * write path ([[graft.operators.ScaleOps.writeBucketedAt]] +
  * [[graft.operators.DedupIndex]]'s Stager). The driver's r16 bench
  * run carried a stack trace through `stageComponent` →
  * `writeBucketedAt`'s `insertInto` — an intermittent failure of the
  * commit machinery that the bench harness of the time swallowed.
  * This harness exists to REPRODUCE that shape at will: three
  * persisted indexes (media + text + vectors) absorbing fresh CDC
  * batches from three driver threads simultaneously, each absorb
  * fanning its component writes across a Stager pool
  * (`spark.graft.stage.parallelism`, default 8 here — twice the
  * production default), every write borrowing pooled scratch tables.
  * One JVM run = `iters` absorbs per modality ≈ iters×(4+11+10)
  * concurrent bucketed writes through the shared pool, including the
  * cold CREATE TABLE burst of every first-use signature.
  *
  * Exit: 0 and a JSON line when every absorb committed and the final
  * loaded indexes carry exactly the expected live row counts; 1 with
  * the first failure's full stack otherwise.
  */
object StagerStress {

  def main(args: Array[String]): Unit = {
    val iters = sys.env.getOrElse("SPARK_GRAFT_STAGER_ITERS", "12").toInt
    val par = sys.env.getOrElse("SPARK_GRAFT_STAGE_PAR", "8")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.graft.stage.parallelism", par)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def tempDir(tag: String) =
      java.nio.file.Files.createTempDirectory(s"graft-stager-$tag").toString
    val mediaDir = tempDir("media")
    val textDir = tempDir("text")
    val vecDir = tempDir("vec")

    def doc(i: Long) = s"stager stress doc $i " +
      (1 to 24).map(w => s"w${(i * 37 + w * 11) % 499}").mkString(" ")
    def textBatch(lo: Long, n: Int): DataFrame =
      (lo until lo + n).map(i => (i, doc(i))).toDF("doc_id", "text")
    def mediaBatch(lo: Long, n: Int): DataFrame =
      (lo until lo + n).map { i =>
        (i, graft.operators.SyntheticMedia.bmp(s"t${i % 40}", s"n$i"))
      }.toDF("doc_id", "payload")
    def vecBatch(lo: Long, n: Int): DataFrame =
      (lo until lo + n).map { i =>
        (i, Array.tabulate(16)(d =>
          (((i * 31 + d * 17) % 97) / 97.0f) - 0.5f))
      }.toDF("doc_id", "vec")

    // small cold bases — the stress measures the MAINTENANCE path
    graft.operators.DedupIndex.writeMedia(
      mediaBatch(0L, 200), "doc_id", "payload", mediaDir)
    graft.operators.DedupIndex.writeText(
      textBatch(0L, 200), "doc_id", "text", textDir)
    graft.operators.DedupIndex.writeVectors(
      vecBatch(0L, 200), "doc_id", "vec", vecDir,
      planes = 8, dim = 16, numCentroids = 8)

    val firstFailure =
      new java.util.concurrent.atomic.AtomicReference[Throwable]()
    def worker(name: String)(body: Int => Unit): Thread = {
      val t = new Thread(() => {
        var k = 0
        while (k < iters && firstFailure.get() == null) {
          try body(k) catch {
            case t: Throwable =>
              firstFailure.compareAndSet(null, t)
              System.err.println(s"[$name iter $k] FAILED:")
              t.printStackTrace()
          }
          k += 1
        }
      }, s"stager-stress-$name")
      t.start(); t
    }
    val batch = 300
    val t0 = System.nanoTime()
    val threads = Seq(
      worker("media") { k =>
        graft.operators.DedupIndex.appendMedia(
          mediaBatch(1000000L + k.toLong * batch, batch),
          "doc_id", "payload", mediaDir)
      },
      worker("text") { k =>
        graft.operators.DedupIndex.appendText(
          textBatch(2000000L + k.toLong * batch, batch),
          "doc_id", "text", textDir)
      },
      worker("vec") { k =>
        graft.operators.DedupIndex.appendVectors(
          vecBatch(3000000L + k.toLong * batch, batch),
          "doc_id", "vec", vecDir)
      })
    threads.foreach(_.join())
    val wall = (System.nanoTime() - t0) / 1e9

    if (firstFailure.get() != null) {
      System.err.println("stager stress FAILED; first failure above")
      spark.stop()
      sys.exit(1)
    }
    // live-count audit: every absorb must have committed exactly once
    val want = 200L + iters.toLong * batch
    val gotMedia = graft.operators.DedupIndex
      .loadMedia(spark, mediaDir).codes.count()
    val gotText = graft.operators.DedupIndex
      .loadText(spark, textDir).sigs.count()
    val gotVec = graft.operators.DedupIndex
      .loadVectors(spark, vecDir).buckets.count()
    val ok = gotMedia == want && gotText == want && gotVec == want
    println(s"""{"metric":"stager_stress","iters":$iters,"par":$par,""" +
      s""""batch":$batch,"want":$want,"media":$gotMedia,""" +
      s""""text":$gotText,"vec":$gotVec,"wall_sec":${wall.round},""" +
      s""""ok":$ok}""")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
