package graft

import graft.cdc.{CdcConfig, SnapshotJob, ValidateJob}
import graft.model.{CdcColumns => C, ListingMode, TableSpec}
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** The two verbs end-to-end: snapshot (folder → reconstructed parquet
  * state) then validate (source vs reconstruction), incl. the digest
  * mode, mirroring the reference's CLI flow (main.rs:345-373).
  */
class CdcJobsSpec extends SparkSpec {
  import spark.implicits._

  test("snapshot then validate: clean replay reports all-match") {
    val base = Files.createTempDirectory("jobs").toString
    val tdir = s"$base/db/public/items"
    val out = s"$base/out"

    val load = (1L to 100L).map(i => ("I", "t0", i, s"v$i"))
      .toDF(C.Op, C.IngestTs, "id", "payload")
    load.coalesce(1).write.parquet(s"$tdir/_w1")
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    def place(src: String, dst: String): Unit = {
      val p = fs.listStatus(new org.apache.hadoop.fs.Path(src))
        .map(_.getPath).find(_.getName.endsWith(".parquet")).get
      fs.rename(p, new org.apache.hadoop.fs.Path(dst))
      fs.delete(new org.apache.hadoop.fs.Path(src), true)
    }
    place(s"$tdir/_w1", s"$tdir/LOAD00000001.parquet")
    val cdc = ((1L to 10L).map(i => ("D", "t1", i, s"v$i")) ++
      (90L to 100L).map(i => ("U", "t1", i, s"u$i")))
      .toDF(C.Op, C.IngestTs, "id", "payload")
    cdc.coalesce(1).write.parquet(s"$tdir/_w2")
    place(s"$tdir/_w2", s"$tdir/20240102-000.parquet")

    val cfg = CdcConfig(s"$base/db/public", "public",
      mode = ListingMode.DateAware(0L, None))
    val spec = TableSpec("items", tdir, Seq("id"))
    val counts = SnapshotJob.run(spark, cfg, Seq(spec), out)
    assert(counts === Map("items" -> 90L)) // 100 - 10 deleted

    // expected state derived independently
    val expected = (11L to 89L).map(i => (i, s"v$i")) ++
      (90L to 100L).map(i => (i, s"u$i"))
    val target = spark.read.parquet(s"$out/items")
    val source = expected.toDF("id", "payload")

    val rep = ValidateJob.validateTable(source, target.select("id", "payload"),
      spec)
    assert(rep.ok && rep.matched === 90L)

    // digest mode agrees, and localizes an injected corruption
    assert(ValidateJob.validateByDigest(source,
      target.select("id", "payload"), spec, 25) === Seq.empty)
    val corrupted = target.select("id", "payload")
      .withColumn("payload",
        when($"id" === 42L, lit("XX")).otherwise($"payload"))
    val bad = ValidateJob.validateByDigest(source, corrupted, spec, 25)
    assert(bad.length === 1)
  }
}
