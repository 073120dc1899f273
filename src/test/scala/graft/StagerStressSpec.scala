package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded in-suite version of `graft.dev.StagerStress` (r17 ask: the
  * concurrent-commit path the r16 bench incident implicated should be
  * exercised on every `sbt test`, not only when someone runs the dev
  * main). Three driver threads absorb fresh CDC batches into three
  * persisted indexes (media + text + vectors) simultaneously, each
  * absorb fanning its component writes across the shared Stager pool at
  * width 8 and borrowing pooled scratch tables — the full
  * staged-commit concurrency surface, sized to stay well under a
  * minute: 3 absorbs × 3 modalities ≈ 3×(4+11+10) concurrent bucketed
  * writes, including each signature's cold CREATE TABLE.
  */
class StagerStressSpec extends SparkSpec {
  import spark.implicits._

  test("concurrent absorbs across three modalities commit exactly once each") {
    val iters = 3
    val batch = 150
    def tempDir(tag: String) =
      java.nio.file.Files.createTempDirectory(s"graft-sss-$tag").toString
    val mediaDir = tempDir("media")
    val textDir = tempDir("text")
    val vecDir = tempDir("vec")

    def doc(i: Long) = s"stager smoke doc $i " +
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

    val prevPar = spark.conf.getOption("spark.graft.stage.parallelism")
    spark.conf.set("spark.graft.stage.parallelism", "8")
    try {
      // small cold bases — the stress targets the MAINTENANCE path
      graft.operators.DedupIndex.writeMedia(
        mediaBatch(0L, batch), "doc_id", "payload", mediaDir)
      graft.operators.DedupIndex.writeText(
        textBatch(0L, batch), "doc_id", "text", textDir)
      graft.operators.DedupIndex.writeVectors(
        vecBatch(0L, batch), "doc_id", "vec", vecDir,
        planes = 8, dim = 16, numCentroids = 8)

      val firstFailure =
        new java.util.concurrent.atomic.AtomicReference[Throwable]()
      def worker(name: String)(body: Int => Unit): Thread = {
        val t = new Thread(() => {
          var k = 0
          while (k < iters && firstFailure.get() == null) {
            try body(k) catch {
              case t: Throwable => firstFailure.compareAndSet(null, t)
            }
            k += 1
          }
        }, s"stager-smoke-$name")
        t.start(); t
      }
      Seq(
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
        }).foreach(_.join())
      if (firstFailure.get() != null) throw firstFailure.get()

      // live-count audit: every absorb committed exactly once
      val want = batch.toLong * (1 + iters)
      assert(graft.operators.DedupIndex
        .loadMedia(spark, mediaDir).codes.count() === want)
      assert(graft.operators.DedupIndex
        .loadText(spark, textDir).sigs.count() === want)
      assert(graft.operators.DedupIndex
        .loadVectors(spark, vecDir).buckets.count() === want)
    } finally {
      prevPar match {
        case Some(p) => spark.conf.set("spark.graft.stage.parallelism", p)
        case None => spark.conf.unset("spark.graft.stage.parallelism")
      }
    }
  }
}
