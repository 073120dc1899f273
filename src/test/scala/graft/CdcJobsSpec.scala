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

  test("digest resume skips mismatches before --start-position") {
    // stable chunk ids: PK-order rank / chunkSize → ids 0..9 at size 10
    val spec = TableSpec("t", "", Seq("id"))
    val source = (1L to 100L).map(i => (i, s"v$i")).toDF("id", "payload")
    // corrupt one row in chunk 0 (id=3 → rank 2) and one in chunk 7 (id=75)
    val target = source.withColumn("payload",
      when($"id" === 3L || $"id" === 75L, lit("XX")).otherwise($"payload"))
    assert(ValidateJob.validateByDigest(source, target, spec, 10)
      === Seq(0L, 7L))
    // resume at chunk 1: the chunk-0 mismatch is neither computed in the
    // compare join nor reported; the later one still is
    assert(ValidateJob.validateByDigest(source, target, spec, 10,
      startChunk = 1L) === Seq(7L))
    // resume past every mismatch: clean report
    assert(ValidateJob.validateByDigest(source, target, spec, 10,
      startChunk = 8L) === Seq.empty)
  }

  test("pooled per-table snapshot reconstructs every table correctly") {
    val base = Files.createTempDirectory("pool").toString
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    def place(src: String, dst: String): Unit = {
      val p = fs.listStatus(new org.apache.hadoop.fs.Path(src))
        .map(_.getPath).find(_.getName.endsWith(".parquet")).get
      fs.rename(p, new org.apache.hadoop.fs.Path(dst))
      fs.delete(new org.apache.hadoop.fs.Path(src), true)
    }
    // four tables with distinct row counts so a cross-wired result is
    // impossible to miss; the pool (4 driver threads) runs their Spark
    // jobs concurrently
    val sizes = Map("ta" -> 10L, "tb" -> 25L, "tc" -> 40L, "td" -> 55L)
    sizes.foreach { case (t, n) =>
      val tdir = s"$base/db/public/$t"
      (1L to n).map(i => ("I", "t0", i, s"$t$i"))
        .toDF(C.Op, C.IngestTs, "id", "payload")
        .coalesce(1).write.parquet(s"$tdir/_w")
      place(s"$tdir/_w", s"$tdir/LOAD00000001.parquet")
    }
    val cfg = CdcConfig(s"$base/db/public", "public",
      mode = ListingMode.FullLoadOnly, maxConcurrentTables = 4)
    val specs = sizes.keys.toSeq.sorted.map(t =>
      TableSpec(t, s"$base/db/public/$t", Seq("id")))
    val counts = SnapshotJob.run(spark, cfg, specs, s"$base/out")
    assert(counts === sizes)
    // content, not just counts: each table's rows carry its own prefix
    sizes.foreach { case (t, n) =>
      val got = spark.read.parquet(s"$base/out/$t")
        .as[(Long, String)].collect().sortBy(_._1)
      assert(got.length === n && got.head === (1L, s"${t}1") &&
        got.last === (n, s"$t$n"))
    }
  }

  test("partitioned snapshot layout: validate-side reads prune partitions") {
    val base = Files.createTempDirectory("partsnap").toString
    val tdir = s"$base/db/public/items"
    val out = s"$base/out"
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    def place(src: String, dst: String): Unit = {
      val p = fs.listStatus(new org.apache.hadoop.fs.Path(src))
        .map(_.getPath).find(_.getName.endsWith(".parquet")).get
      fs.rename(p, new org.apache.hadoop.fs.Path(dst))
      fs.delete(new org.apache.hadoop.fs.Path(src), true)
    }
    val regions = Seq("eu", "us", "ap")
    val load = (1L to 90L).map(i =>
      ("I", "t0", i, regions((i % 3).toInt), s"v$i"))
      .toDF(C.Op, C.IngestTs, "id", "region", "payload")
    load.coalesce(1).write.parquet(s"$tdir/_w1")
    place(s"$tdir/_w1", s"$tdir/LOAD00000001.parquet")

    val cfg = CdcConfig(s"$base/db/public", "public",
      mode = ListingMode.FullLoadOnly,
      snapshotPartitionBy = Seq("region"))
    val spec = TableSpec("items", tdir, Seq("id"))
    assert(SnapshotJob.run(spark, cfg, Seq(spec), out)
      === Map("items" -> 90L))
    // layout on disk is hive-style partition dirs
    assert(regions.forall(r => fs.exists(
      new org.apache.hadoop.fs.Path(s"$out/items/region=$r"))))

    // a validate-side read filtered on the partition column must reach
    // the scan as a PARTITION filter and list only that region's files
    val read = spark.read.parquet(s"$out/items").filter($"region" === "eu")
    val scan = read.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.getOrElse(fail("no FileSourceScanExec in plan"))
    assert(scan.partitionFilters.exists(_.references.exists(
      _.name == "region")), s"no partition filter: ${scan.partitionFilters}")
    val files = scan.relation.location
      .listFiles(scan.partitionFilters, scan.dataFilters)
      .flatMap(_.files).map(_.getPath.toString)
    assert(files.nonEmpty && files.forall(_.contains("region=eu")),
      s"scan lists unpruned files: $files")
    assert(read.count() === 30L)

    // PK-bucketed layout: external table with the bucket spec recorded,
    // files still plain-parquet-readable at the same path
    val cfgB = cfg.copy(snapshotBuckets = 4)
    assert(SnapshotJob.run(spark, cfgB, Seq(spec), s"$base/outb")
      === Map("items" -> 90L))
    val tabB = SnapshotJob.snapshotTableName("items", s"$base/outb/items")
    val desc = spark.sql(s"DESCRIBE EXTENDED $tabB")
      .collect().map(r => s"${r.getString(0)}=${r.getString(1)}").mkString
    assert(desc.contains("Num Buckets=4") && desc.contains("id"), desc)
    // catalog names are path-qualified: a second snapshot of the SAME
    // table name to a different outDir registers beside, not over, the
    // first — both stay queryable in one session
    assert(SnapshotJob.run(spark, cfgB, Seq(spec), s"$base/outc")
      === Map("items" -> 90L))
    val tabC = SnapshotJob.snapshotTableName("items", s"$base/outc/items")
    assert(tabB !== tabC)
    assert(spark.table(tabB).count() === 90L)
    assert(spark.table(tabC).count() === 90L)
    spark.sql(s"DROP TABLE IF EXISTS $tabB")
    spark.sql(s"DROP TABLE IF EXISTS $tabC")
  }

  test("TablePool keeps input order and fails fast on error") {
    import graft.cdc.TablePool
    assert(TablePool.map(Seq(3, 1, 2), maxConcurrent = 4)(_ * 10)
      === Seq(30, 10, 20))
    // concurrency actually happens: with a pool of 4, four tasks that
    // each wait on a shared barrier all enter before any finishes
    val barrier = new java.util.concurrent.CyclicBarrier(4)
    val r = TablePool.map(1 to 4, maxConcurrent = 4) { i =>
      barrier.await(10, java.util.concurrent.TimeUnit.SECONDS); i
    }
    assert(r === Seq(1, 2, 3, 4))
    val e = intercept[RuntimeException] {
      TablePool.map(Seq(1, 2, 3), maxConcurrent = 2) { i =>
        if (i == 2) sys.error("boom") else i
      }
    }
    assert(e.getMessage.contains("boom"))
  }
}
