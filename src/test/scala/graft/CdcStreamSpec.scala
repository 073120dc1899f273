package graft

import graft.model.{CdcColumns => C, ListingMode}
import graft.operators.ChangeLogReducer
import graft.sources.{CdcFileLister, ChangeLogReader}
import graft.streaming.CdcStream
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Streaming replay must be state-equivalent to batch replay at every
  * micro-batch boundary, and the streaming windowed aggregation must
  * equal its batch counterpart on the same inputs.
  */
class CdcStreamSpec extends CdcStreamSpecBase {
  import spark.implicits._

  test("incremental merge equals batch replay after each batch") {
    val src = Files.createTempDirectory("stream_src").toString
    val state = Files.createTempDirectory("stream_state").toString + "/st"

    writeFile(src, "LOAD00000001.parquet", Seq(
      ("I", "t0", 1L, "a"), ("I", "t0", 2L, "b"), ("I", "t0", 3L, "c")))

    // batch 1: just the LOAD file
    val files1 = CdcFileLister.list(spark, src, ListingMode.DateAware(0, None))
    val log1 = ChangeLogReader.read(spark, files1)
    CdcStream.mergeBatch(spark, log1, Seq("id"), state)
    assert(CdcStream.readState(spark, state).sort("id")
      .select("id", "payload").collect().toSeq ===
      Seq(Row(1L, "a"), Row(2L, "b"), Row(3L, "c")))

    // batch 2: updates + delete + insert arrive as a later CDC file
    writeFile(src, "20240102-0001.parquet", Seq(
      ("U", "t1", 1L, "a2"), ("D", "t1", 2L, "b"), ("I", "t1", 4L, "d")))
    val files2 = CdcFileLister.list(spark, src, ListingMode.DateAware(0, None))
      .filter(_.path.contains("20240102"))
    val log2 = ChangeLogReader.read(spark, files2)
    CdcStream.mergeBatch(spark, log2, Seq("id"), state)

    val streamed = CdcStream.readState(spark, state).sort("id")
      .select("id", "payload").collect().toSeq

    // ground truth: full batch replay over all files
    val all = CdcFileLister.list(spark, src, ListingMode.DateAware(0, None))
    val fullLog = ChangeLogReader.read(spark, all)
    val batch = ChangeLogReducer.reduce(fullLog, Seq("id"),
        ChangeLogReader.eventSeq(fullLog))
      .sort("id").select("id", "payload").collect().toSeq

    assert(streamed === batch)
    assert(streamed === Seq(Row(1L, "a2"), Row(3L, "c"), Row(4L, "d")))
  }

  test("out-of-order file arrival still equals batch replay") {
    // the CDC file arrives in batch 1, the LOAD file (earlier in global
    // order!) only in batch 2 — e.g. a lagging multipart upload; and a
    // delete in batch 1 must not be resurrected by batch 2's LOAD
    val src = Files.createTempDirectory("ooo_src").toString
    val state = Files.createTempDirectory("ooo_state").toString + "/st"

    writeFile(src, "20240102-0001.parquet", Seq(
      ("U", "t1", 1L, "updated"), ("D", "t1", 2L, "gone")))
    val cdc = CdcFileLister.list(spark, src, ListingMode.DateAware(0, None))
    CdcStream.mergeBatch(spark,
      ChangeLogReader.read(spark, cdc), Seq("id"), state)

    writeFile(src, "LOAD00000001.parquet", Seq(
      ("I", "t0", 1L, "loaded"), ("I", "t0", 2L, "loaded"),
      ("I", "t0", 3L, "loaded")))
    val load = CdcFileLister.list(spark, src, ListingMode.DateAware(0, None))
      .filter(_.isLoad)
    CdcStream.mergeBatch(spark,
      ChangeLogReader.read(spark, load), Seq("id"), state)

    val streamed = CdcStream.readState(spark, state).sort("id")
      .select("id", "payload").collect().toSeq
    // ground truth: full batch replay over all files (LOAD first)
    val all = CdcFileLister.list(spark, src, ListingMode.DateAware(0, None))
    val fullLog = ChangeLogReader.read(spark, all)
    val batch = ChangeLogReducer.reduce(fullLog, Seq("id"),
        ChangeLogReader.eventSeq(fullLog))
      .sort("id").select("id", "payload").collect().toSeq
    assert(streamed === batch)
    // key 1 keeps the CDC update, key 2 stays deleted, key 3 from LOAD
    assert(streamed === Seq(Row(1L, "updated"), Row(3L, "loaded")))
  }

  test("bucketed merge equals batch replay and rewrites only touched buckets") {
    val src = Files.createTempDirectory("bkt_src").toString
    val state = Files.createTempDirectory("bkt_state").toString + "/st"
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    def bucketDirs = fs.listStatus(new org.apache.hadoop.fs.Path(state))
      .map(_.getPath.getName).filter(_.startsWith("_bucket=")).sorted.toSeq
    def mtimes = fs.listStatus(new org.apache.hadoop.fs.Path(state))
      .filter(_.getPath.getName.startsWith("_bucket="))
      .map(s => s.getPath.getName -> s.getModificationTime).toMap

    writeFile(src, "LOAD00000001.parquet",
      (1L to 40L).map(i => ("I", "t0", i, s"v$i")))
    val load = CdcFileLister.list(spark, src, ListingMode.DateAware(0, None))
    CdcStream.mergeBatchBucketed(spark,
      ChangeLogReader.read(spark, load), Seq("id"), state, numBuckets = 8)
    assert(bucketDirs.nonEmpty)
    assert(CdcStream.readState(spark, state).count() === 40)
    val before = mtimes

    // batch 2 touches a handful of keys → only their buckets may change
    Thread.sleep(1100) // local FS mtime granularity
    writeFile(src, "20240102-0001.parquet", Seq(
      ("U", "t1", 1L, "u1"), ("D", "t1", 2L, "v2")))
    val cdc = CdcFileLister.list(spark, src, ListingMode.DateAware(0, None))
      .filter(_.path.contains("20240102"))
    CdcStream.mergeBatchBucketed(spark,
      ChangeLogReader.read(spark, cdc), Seq("id"), state, numBuckets = 8)

    val after = mtimes
    val changed = after.filter { case (k, t) => before.get(k).exists(_ != t) }
    assert(changed.size < before.size, "every bucket was rewritten")

    // state equals a full batch replay
    val all = CdcFileLister.list(spark, src, ListingMode.DateAware(0, None))
    val fullLog = ChangeLogReader.read(spark, all)
    val batch = ChangeLogReducer.reduce(fullLog, Seq("id"),
        ChangeLogReader.eventSeq(fullLog))
      .sort("id").select("id", "payload").collect().toSeq
    val streamed = CdcStream.readState(spark, state).sort("id")
      .select("id", "payload").collect().toSeq
    assert(streamed === batch)
    assert(!streamed.exists(_.getLong(0) == 2L) &&
      streamed.exists(r => r.getLong(0) == 1L && r.getString(1) == "u1"))
  }

  test("startReplay end-to-end: file stream to bucketed state") {
    val src = Files.createTempDirectory("replay_src").toString
    val state = Files.createTempDirectory("replay_state").toString + "/st"
    val ckpt = Files.createTempDirectory("replay_ckpt").toString

    writeFile(src, "LOAD00000001.parquet",
      (1L to 30L).map(i => ("I", "t0", i, s"v$i")))
    writeFile(src, "20240102-0001.parquet", Seq(
      ("U", "t1", 3L, "u3"), ("D", "t1", 4L, "v4")))

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField(C.Op,
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField(C.IngestTs,
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("payload",
        org.apache.spark.sql.types.StringType)))
    val stream = CdcStream.changeStream(spark, src, schema)
    val q = CdcStream.startReplay(spark, stream, Seq("id"), state, ckpt)
    try q.processAllAvailable() finally q.stop()

    val got = CdcStream.readState(spark, state).sort("id")
      .select("id", "payload").collect().toSeq
    assert(got.size === 29) // 30 loaded, one deleted
    assert(got.exists(r => r.getLong(0) == 3L && r.getString(1) == "u3"))
    assert(!got.exists(_.getLong(0) == 4L))
    // default stateBuckets > 0 → bucketed layout on disk
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.listStatus(new org.apache.hadoop.fs.Path(state))
      .exists(_.getPath.getName.startsWith("_bucket=")))
  }

  test("bucketed merge migrates flat-layout state transparently") {
    val src = Files.createTempDirectory("mig_src").toString
    val state = Files.createTempDirectory("mig_state").toString + "/st"
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)

    // batch 1 written by the OLD flat-layout merge
    writeFile(src, "LOAD00000001.parquet",
      (1L to 20L).map(i => ("I", "t0", i, s"v$i")))
    val load = CdcFileLister.list(spark, src, ListingMode.DateAware(0, None))
    CdcStream.mergeBatch(spark,
      ChangeLogReader.read(spark, load), Seq("id"), state)

    // batch 2 through the bucketed merge: must keep ALL flat keys, apply
    // the new events, and leave a pure bucketed layout behind
    writeFile(src, "20240102-0001.parquet", Seq(
      ("U", "t1", 1L, "u1"), ("D", "t1", 2L, "v2")))
    val cdc = CdcFileLister.list(spark, src, ListingMode.DateAware(0, None))
      .filter(_.path.contains("20240102"))
    CdcStream.mergeBatchBucketed(spark,
      ChangeLogReader.read(spark, cdc), Seq("id"), state, numBuckets = 4)

    val all = CdcFileLister.list(spark, src, ListingMode.DateAware(0, None))
    val fullLog = ChangeLogReader.read(spark, all)
    val batch = ChangeLogReducer.reduce(fullLog, Seq("id"),
        ChangeLogReader.eventSeq(fullLog))
      .sort("id").select("id", "payload").collect().toSeq
    val streamed = CdcStream.readState(spark, state).sort("id")
      .select("id", "payload").collect().toSeq
    assert(streamed === batch && streamed.size === 19)

    val entries = fs.listStatus(new org.apache.hadoop.fs.Path(state))
    assert(!entries.exists(e =>
      e.isFile && e.getPath.getName.endsWith(".parquet")), "flat files remain")
    assert(entries.exists(_.getPath.getName.startsWith("_bucket=")))
  }

  test("bucketed merge repairs an interrupted swap and retry is idempotent") {
    val src = Files.createTempDirectory("crash_src").toString
    val state = Files.createTempDirectory("crash_state").toString + "/st"
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)

    writeFile(src, "LOAD00000001.parquet",
      (1L to 20L).map(i => ("I", "t0", i, s"v$i")))
    val load = CdcFileLister.list(spark, src, ListingMode.DateAware(0, None))
    val log = ChangeLogReader.read(spark, load)
    CdcStream.mergeBatchBucketed(spark, log, Seq("id"), state, numBuckets = 4)

    // simulate a crash between park and promote: bucket dir exists only
    // as its .old park
    val parked = fs.listStatus(new org.apache.hadoop.fs.Path(state))
      .map(_.getPath).find(_.getName.startsWith("_bucket=")).get
    val k = parked.getName.stripPrefix("_bucket=")
    assert(fs.rename(parked,
      new org.apache.hadoop.fs.Path(state, s".old_bucket_$k")))

    // checkpoint retry re-runs the SAME batch: repair must restore the
    // bucket first, and re-merging already-applied events must be a no-op
    CdcStream.mergeBatchBucketed(spark, log, Seq("id"), state, numBuckets = 4)
    assert(CdcStream.readState(spark, state).sort("id")
      .select("id", "payload").as[(Long, String)].collect().toSeq ===
      (1L to 20L).map(i => i -> s"v$i"))

    // the marker pins the original bucket count even if callers drift
    CdcStream.mergeBatchBucketed(spark, log, Seq("id"), state, numBuckets = 16)
    val dirs = fs.listStatus(new org.apache.hadoop.fs.Path(state))
      .map(_.getPath.getName).filter(_.startsWith("_bucket="))
      .map(_.stripPrefix("_bucket=").toInt)
    assert(dirs.forall(_ < 4), s"bucket ids exceeded pinned count: ${dirs.toSeq}")
  }

  test("bucketed merge recovers from an empty bucket-count marker") {
    val src = Files.createTempDirectory("marker_src").toString
    val state = Files.createTempDirectory("marker_state").toString + "/st"
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)

    // simulate the old non-atomic layout's crash window: a marker that
    // exists but is empty (created, never written)
    val statePath = new org.apache.hadoop.fs.Path(state)
    fs.mkdirs(statePath)
    val marker = new org.apache.hadoop.fs.Path(statePath, "_graft_buckets")
    fs.create(marker, true).close()

    writeFile(src, "LOAD00000001.parquet",
      (1L to 10L).map(i => ("I", "t0", i, s"v$i")))
    val load = CdcFileLister.list(spark, src, ListingMode.DateAware(0, None))
    val log = ChangeLogReader.read(spark, load)
    // must not throw: falls back to the caller's numBuckets and re-pins
    CdcStream.mergeBatchBucketed(spark, log, Seq("id"), state, numBuckets = 4)

    val in = fs.open(marker)
    val pinned =
      try new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
        java.nio.charset.StandardCharsets.UTF_8).trim
      finally in.close()
    assert(pinned === "4")
    assert(CdcStream.readState(spark, state).count() === 10L)
  }

  test("stateful sessionization carries state across micro-batches") {
    import graft.streaming.CdcStream.{SessAssign, SessEvent}
    val dir = Files.createTempDirectory("sess_src").toString
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

    // batch 1: user 1 events at 10:00, 10:05 (one session)
    Seq(SessEvent(1L, 1L, ts(0), 1.0), SessEvent(1L, 2L, ts(5), 1.0))
      .toDF().coalesce(1).write.parquet(s"$dir/b1")
    // batch 2: 10:10 continues session 1 (gap 5m < 30m);
    //          10:55 starts session 2 (gap 45m)
    Seq(SessEvent(1L, 3L, ts(10), 1.0), SessEvent(1L, 4L, ts(55), 1.0))
      .toDF().coalesce(1).write.parquet(s"$dir/b2")

    val schema = implicitly[org.apache.spark.sql.Encoder[SessEvent]].schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$dir/b*/")
      .as[SessEvent]
    val q = graft.streaming.CdcStream.sessionizeStream(stream, 1800L)
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("sess_out").as[SessAssign]
      .collect().sortBy(_.event_id)
      .map(a => a.event_id -> a.session_ord).toSeq
    // events 1-3 share session 1 even though 3 arrived in a later
    // micro-batch; event 4's 45-minute gap starts session 2
    assert(got === Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L))
  }

  test("streaming windowed aggregation equals batch aggregation") {
    val dir = Files.createTempDirectory("stream_ev").toString
    val events = (0 until 200).map { i =>
      (java.sql.Timestamp.valueOf(f"2024-01-01 ${i % 5}%02d:${i % 60}%02d:00"),
        if (i % 3 == 0) "click" else "view", i.toDouble)
    }.toDF("ts", "event_type", "value")
    events.write.mode("overwrite").parquet(dir)

    val stream = spark.readStream
      .schema(events.schema).option("maxFilesPerTrigger", 1).parquet(dir)
    val agg = CdcStream.windowedCounts(stream, "ts", "event_type",
      "1 hour", "10 minutes")
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("win_out").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("win_out")
      .sort("win_start", "event_type").collect().toSeq
    val batch = CdcStream.windowedCounts(
        spark.read.parquet(dir), "ts", "event_type", "1 hour", "10 minutes")
      .sort("win_start", "event_type").collect().toSeq
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("streaming SCD2 state survives a query restart (checkpoint recovery)") {
    import CdcStream.Scd2Event
    val dir = Files.createTempDirectory("scd2_ck_src").toString
    val out = Files.createTempDirectory("scd2_ck_out").toString
    val ck = Files.createTempDirectory("scd2_ck").toString
    val schema = implicitly[org.apache.spark.sql.Encoder[Scd2Event]].schema
    def run(): Unit = {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(s"$dir/b*/").as[Scd2Event]
      val q = CdcStream.scd2Stream(stream).writeStream
        .outputMode("append")
        .option("checkpointLocation", ck)
        .format("parquet").option("path", out)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    val b1 = Seq(Scd2Event("1", 1L, 1000L, "I", "a1"),
      Scd2Event("2", 2L, 2000L, "I", "b1"),
      Scd2Event("2", 3L, 4000L, "D", ""))
    val b2 = Seq(Scd2Event("1", 4L, 9000L, "U", "a2"),
      Scd2Event("2", 5L, 12000L, "I", "b2"))
    b1.toDF().coalesce(1).write.parquet(s"$dir/b1")
    run() // first query: processes b1, checkpoints its state, stops
    b2.toDF().coalesce(1).write.parquet(s"$dir/b2")
    run() // RESTARTED query: must resume per-key version counters

    val got = CdcStream.scd2Latest(spark.read.parquet(out))
      .select("key", "version", "payload", "valid_from", "valid_to",
        "is_current")
      .as[(String, Int, String, Long, Option[Long], Int)]
      .collect().toSet
    val log = (b1 ++ b2).map(e => (e.op, e.key, e.seq, e.tsMicros,
      e.payload)).toDF(C.Op, "key", "seq", "ts_micros", "payload")
    val expected = ChangeLogReducer.history(log, Seq("key"),
        struct(col("ts_micros"), col("seq")), col("ts_micros"))
      .select(col("key"), col("version"), col("payload"),
        col("valid_from"), col("valid_to"), col("is_current"))
      .as[(String, Int, String, Long, Option[Long], Int)]
      .collect().toSet
    assert(got === expected, s"stream $got\nbatch $expected")
    // the recovery-sensitive facts: key 1's post-restart update is
    // version 2 (counter recovered, not restarted at 1) and key 2's
    // reinsert skipped its pre-restart tombstone ordinal
    assert(got.exists(r => r._1 == "1" && r._2 == 2 && r._5.isEmpty))
    assert(got.exists(r => r._1 == "2" && r._2 == 3 && r._5.isEmpty))
  }

  test("streaming SCD2 equals the batch history on the same log") {
    import CdcStream.{Scd2Event, Scd2Row}
    val dir = Files.createTempDirectory("scd2_src").toString
    // (key, seq, tsMicros, op, payload) — intervals crossing the
    // micro-batch boundary, a delete-then-reinsert, a trailing delete,
    // and an untouched current row
    val b1 = Seq(
      Scd2Event("1", 1L, 1000L, "I", "a1"),
      Scd2Event("1", 2L, 5000L, "U", "a2"),
      Scd2Event("2", 3L, 1000L, "I", "b1"),
      Scd2Event("3", 4L, 3000L, "I", "c1"),
      Scd2Event("4", 5L, 1000L, "I", "d1"))
    val b2 = Seq(
      Scd2Event("1", 6L, 10000L, "U", "a3"),
      Scd2Event("2", 7L, 6000L, "D", ""),
      Scd2Event("2", 8L, 12000L, "I", "b2"),
      Scd2Event("4", 9L, 9000L, "D", ""))
    b1.toDF().coalesce(1).write.parquet(s"$dir/b1")
    b2.toDF().coalesce(1).write.parquet(s"$dir/b2")

    val schema = implicitly[org.apache.spark.sql.Encoder[Scd2Event]].schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$dir/b*/")
      .as[Scd2Event]
    val q = CdcStream.scd2Stream(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("scd2_out").start()
    try q.processAllAvailable() finally q.stop()

    val emissions = spark.table("scd2_out")
    // closed versions are emitted exactly twice (open, then close),
    // never-closed ones once — the stream really is incremental updates
    val perVersion = emissions.groupBy("key", "version").count()
      .as[(String, Int, Long)].collect()
    assert(perVersion.forall(c => c._3 == 1L || c._3 == 2L))
    val got = CdcStream.scd2Latest(emissions)
      .select("key", "version", "payload", "valid_from", "valid_to",
        "is_current")
      .as[(String, Int, String, Long, Option[Long], Int)]
      .collect().toSet

    // batch history over the identical events
    val log = (b1 ++ b2).map(e => (e.op, e.key, e.seq, e.tsMicros,
      e.payload)).toDF(C.Op, "key", "seq", "ts_micros", "payload")
    val expected = ChangeLogReducer.history(log, Seq("key"),
        struct(col("ts_micros"), col("seq")), col("ts_micros"))
      .select(col("key"), col("version"), col("payload"),
        col("valid_from"), col("valid_to"), col("is_current"))
      .as[(String, Int, String, Long, Option[Long], Int)]
      .collect().toSet
    assert(got === expected, s"stream $got\nbatch $expected")
    // sanity on shape: key 2's reinsert skipped the tombstone's ordinal
    assert(got.exists(r => r._1 == "2" && r._2 == 3 && r._5.isEmpty))
    // key 4 ends deleted: its only version is closed, nothing current
    assert(got.count(_._1 == "4") === 1 &&
      got.exists(r => r._1 == "4" && r._5 == Some(9000L) && r._6 == 0))
  }

}
