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
class CdcStreamSpec extends SparkSpec {
  import spark.implicits._

  private def writeFile(dir: String, name: String,
      rows: Seq[(String, String, Long, String)]): Unit = {
    val df = rows.toDF(C.Op, C.IngestTs, "id", "payload")
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/_tmp")
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val part = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/_tmp"))
      .map(_.getPath).find(_.getName.endsWith(".parquet")).get
    fs.rename(part, new org.apache.hadoop.fs.Path(s"$dir/$name"))
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/_tmp"), true)
  }

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

  test("streaming dedup drops cross-batch replays within the watermark") {
    val dir = Files.createTempDirectory("stream_dd").toString
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    // batch 1: docs 1, 2; batch 2 replays doc 1 (later ts) + new doc 3
    Seq((1L, ts(0), "a"), (2L, ts(1), "b"))
      .toDF("doc_id", "ts", "payload").coalesce(1).write.parquet(s"$dir/b1")
    Seq((1L, ts(2), "a-replay"), (3L, ts(3), "c"))
      .toDF("doc_id", "ts", "payload").coalesce(1).write.parquet(s"$dir/b2")

    val schema = spark.read.parquet(s"$dir/b1").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$dir/b*/")
    val q = graft.streaming.CdcStream
      .dedupStream(stream, "ts", "1 hour", Seq("doc_id"))
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("dedup_out")
      .select("doc_id", "payload").as[(Long, String)]
      .collect().sortBy(_._1).toSeq
    assert(got === Seq(1L -> "a", 2L -> "b", 3L -> "c"),
      "first occurrence kept, within-watermark replay dropped")
  }

  test("streaming incremental dedup probes the static corpus index") {
    val dir = Files.createTempDirectory("stream_incr").toString
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    // batch 1: corpus dup + fresh doc; batch 2: replay of the fresh text
    // (within-stream dup) + another fresh doc
    Seq((10L, ts(0), "known text"), (11L, ts(1), "fresh one"))
      .toDF("doc_id", "ts", "text").coalesce(1).write.parquet(s"$dir/b1")
    Seq((12L, ts(2), "fresh one"), (13L, ts(3), "fresh two"))
      .toDF("doc_id", "ts", "text").coalesce(1).write.parquet(s"$dir/b2")
    // the already-deduped corpus's stored hash index
    val corpusIndex = Seq("known text").toDF("t")
      .select(md5($"t").as("content_hash"))

    val schema = spark.read.parquet(s"$dir/b1").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$dir/b*/")
    val q = graft.streaming.CdcStream
      .incrementalDedupStream(stream, corpusIndex, "text", "ts", "1 hour")
      .writeStream.outputMode("append")
      .format("memory").queryName("incr_out").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("incr_out")
      .select("doc_id").as[Long].collect().sorted.toSeq
    // 10 hits the corpus index, 12 replays 11 within the watermark
    assert(got === Seq(11L, 13L))
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

  test("streaming near-dup detection flags pairs within and across batches") {
    val dir = Files.createTempDirectory("stream_nd").toString
    val same = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    // batch 1: two identical docs (within-batch pair); batch 2: a third
    // identical doc (cross-batch pairs vs state) + a disjoint doc
    Seq((1L, same), (2L, same))
      .toDF("doc_id", "text").coalesce(1).write.parquet(s"$dir/b1")
    Seq((3L, same), (4L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text").coalesce(1).write.parquet(s"$dir/b2")

    val schema = spark.read.parquet(s"$dir/b1").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/b*/")
    val q = CdcStream.nearDupStream(stream, "doc_id", "text")
      .writeStream.outputMode("append")
      .format("memory").queryName("neardup_out").start()
    try q.processAllAvailable() finally q.stop()

    val cands = spark.table("neardup_out")
      .filter(!$"overflow")
      .select("a_id", "b_id", "est_jaccard")
      .as[(Long, Long, Double)].collect().toSeq
    // identical docs agree on every minhash component in every band
    assert(cands.forall(_._3 === 1.0))
    val pairs = cands.map(c => (c._1, c._2)).distinct.sorted
    assert(pairs === Seq((1L, 2L), (1L, 3L), (2L, 3L)),
      "within-batch pair + both cross-batch pairs, disjoint doc unflagged")
    // on identical docs the estimate equals exact Jaccard, so the
    // stream's output matches the batch pipeline's verified pairs here
    // (in general streams emit CANDIDATES; batch re-verifies exactly)
    val batchPairs = graft.operators.Dedup.minHashNearDups(
        spark.read.parquet(s"$dir/b*/"), "doc_id", "text",
        shingleN = 3, numHashes = 12, bands = 4, threshold = 0.5)
      .select("a_id", "b_id").as[(Long, Long)].collect().sorted.toSeq
    assert(batchPairs === pairs)
  }

  test("index-aware near-dup pairs arrivals against the persisted corpus from batch 1") {
    val dir = Files.createTempDirectory("stream_ndidx").toString
    val corpusText = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val freshText = "one two three four five six seven eight nine ten"
    // the already-indexed corpus: docs 100 (known) and 101 (unrelated)
    val corpus = Seq(
      (100L, corpusText),
      (101L, "red green blue cyan magenta yellow black white gray pink"))
      .toDF("doc_id", "text")
    val idxDir = Files.createTempDirectory("stream_ndidx_idx").toString
    graft.operators.DedupIndex.writeText(corpus, "doc_id", "text", idxDir)
    val idx = graft.operators.DedupIndex.loadText(spark, idxDir)

    // batch 1: a near-dup of corpus doc 100 — a plain nearDupStream
    // restarted with empty state would emit NOTHING for it; the indexed
    // form must pair it immediately. batch 2: twin fresh docs (the
    // stateful new×new path must still work alongside the probe).
    Seq((1L, corpusText)).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$dir/b1")
    Seq((2L, freshText), (3L, freshText)).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$dir/b2")
    val schema = spark.read.parquet(s"$dir/b1").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/b*/")
    val q = CdcStream.nearDupStreamIndexed(stream, "doc_id", "text", idx)
      .writeStream.outputMode("append")
      .format("memory").queryName("ndidx_out").start()
    try q.processAllAvailable() finally q.stop()

    val cands = spark.table("ndidx_out")
      .filter(!$"overflow")
      .select("a_id", "b_id", "est_jaccard")
      .as[(Long, Long, Double)].collect().toSeq
    assert(cands.forall(_._3 === 1.0), cands)
    val pairs = cands.map(c => (c._1, c._2)).distinct.sorted
    assert(pairs === Seq((2L, 3L), (100L, 1L)),
      "corpus probe pairs (100,1); stateful path pairs (2,3); " +
        "unrelated corpus doc 101 stays unflagged")
  }

  test("index-aware streaming near-dup probe ignores retired corpus docs") {
    val dir = Files.createTempDirectory("stream_ndret").toString
    val idxDir = Files.createTempDirectory("stream_ndret_idx").toString
    val corpusText = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    // docs 100 and 101 share the text — both would pair an arrival;
    // retiring 100 must leave only 101 pairing (per-copy liveness)
    graft.operators.DedupIndex.writeText(
      Seq((100L, corpusText), (101L, corpusText)).toDF("doc_id", "text"),
      "doc_id", "text", idxDir)
    graft.operators.DedupIndex.retireText(
      Seq(100L).toDF("doc_id"), "doc_id", idxDir)
    val idx = graft.operators.DedupIndex.loadText(spark, idxDir)

    Seq((1L, corpusText)).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$dir/b1")
    val schema = spark.read.parquet(s"$dir/b1").schema
    val stream = spark.readStream.schema(schema).parquet(s"$dir/b*/")
    val q = CdcStream.nearDupStreamIndexed(stream, "doc_id", "text", idx)
      .writeStream.outputMode("append")
      .format("memory").queryName("ndret_out").start()
    try q.processAllAvailable() finally q.stop()

    val pairs = spark.table("ndret_out")
      .filter(!$"overflow")
      .select("a_id", "b_id").as[(Long, Long)].collect().toSeq.distinct
    assert(pairs === Seq((101L, 1L)),
      s"retired corpus doc must not pair the stream probe: $pairs")
  }

  test("streaming SimHash probe equals the batch indexed probe, sees mid-stream retires, replays clean") {
    graft.plans.CachedPlans.clear()
    val dir = Files.createTempDirectory("stream_shprobe").toString
    val idxDir = Files.createTempDirectory("stream_shprobe_idx").toString
    val outDir = Files.createTempDirectory("stream_shprobe_out").toString
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    // corpus: 100/101 share a signature-near text; 102 distinct
    val corpus = Seq((100L, base), (101L, base + " lambda"),
      (102L, "totally different words about other topics entirely"))
    graft.operators.DedupIndex.writeText(
      corpus.toDF("doc_id", "text"), "doc_id", "text", idxDir)

    def writeBatch(name: String, rows: Seq[(Long, String)]): Unit =
      rows.toDF("doc_id", "text").coalesce(1).write.parquet(s"$dir/$name")
    val b1 = Seq((1L, base), (2L, "unrelated probe text nothing shared"))
    writeBatch("b1", b1)
    val schema = spark.read.parquet(s"$dir/b1").schema
    def start(ck: String) = CdcStream.startSimHashNearDup(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(s"$dir/b*/"),
      "doc_id", "text", idxDir, outDir,
      Files.createTempDirectory(ck).toString)
    val q = start("stream_shprobe_c1")
    try {
      q.processAllAvailable()
      // batch reference over the same docs and the same index state
      def expected(docs: Seq[(Long, String)]) = graft.operators.Dedup
        .incrementalSimHashNearDupsReportIndexed(
          docs.toDF("doc_id", "text"), "doc_id", "text",
          graft.operators.DedupIndex.loadText(spark, idxDir))
        .pairs.select("a_id", "b_id", "hamming")
        .as[(Long, Long, Int)].collect().toSeq.sorted
      def got(bIds: Set[Long]) = spark.read.parquet(outDir)
        .filter($"b_id".isin(bIds.toSeq: _*))
        .select("a_id", "b_id", "hamming")
        .as[(Long, Long, Int)].collect().toSeq.sorted
      val exp1 = expected(b1)
      assert(exp1.nonEmpty, "fixture must pair the stream probe")
      assert(got(Set(1L, 2L)) === exp1)

      // mid-stream CDC retire: doc 100 leaves; the NEXT trigger's
      // probe must no longer pair it (fresh index via _version marker)
      graft.operators.DedupIndex.retireText(
        Seq(100L).toDF("doc_id"), "doc_id", idxDir)
      val b2 = Seq((3L, base))
      writeBatch("b2", b2)
      q.processAllAvailable()
      val after = got(Set(3L))
      assert(after === expected(b2))
      assert(!after.exists(_._1 == 100L),
        s"retired corpus doc still pairs the stream probe: $after")
      assert(after.exists(_._1 == 101L), "live near-dup must still pair")

      // checkpoint-lost replay rewrites each batch's own partition
      // against the CURRENT index (doc 100 now retired) — results are
      // the live probe per batch, never old rows stacked on new ones
      val qr = start("stream_shprobe_c2")
      try qr.processAllAvailable() finally qr.stop()
      assert(got(Set(1L, 2L)) === expected(b1),
        "replayed batch 1 must re-probe the live index, unduplicated")
      assert(got(Set(3L)) === expected(b2))
      assert(!got(Set(1L, 2L, 3L)).exists(_._1 == 100L),
        "replay resurrected a retired pairing")
    } finally q.stop()
  }

  test("streaming audio probe + maintenance serve the audio-coder media index via the pinned dispatch") {
    graft.plans.CachedPlans.clear()
    import MediaFixture.mediaDf
    def wavOf(t: String, n: String): Array[Byte] =
      graft.operators.SyntheticMedia.wav(t, n)
    // groups of 4, audio twin: 0/1 byte-identical, 2 template-near,
    // 3 distinct
    def mkAudio(ids: Seq[Long]): Seq[(Long, Array[Byte])] =
      ids.map { i =>
        val g = i / 4
        i % 4 match {
          case 0 | 1 => (i, wavOf(s"sgrp$g", s"scom$g"))
          case 2     => (i, wavOf(s"sgrp$g", s"snear$i"))
          case _     => (i, wavOf(s"ssolo${i * 37}", s"sn$i"))
        }
      }
    val dir = Files.createTempDirectory("stream_auprobe").toString
    val evDir = Files.createTempDirectory("stream_aumaint").toString
    val idxDir = Files.createTempDirectory("stream_auprobe_idx").toString
    val outDir = Files.createTempDirectory("stream_auprobe_out").toString
    val corpus = mkAudio(0L until 16L)
    graft.operators.DedupIndex.writeMedia(
      mediaDf(spark, corpus), "doc_id", "payload", idxDir,
      coder = "audio_energy")

    val b1 = Seq((1000L, wavOf("sgrp0", "scom0")),
      (1001L, wavOf("sgrp1", "snearZ")),
      (1002L, wavOf("nothing-like-it", "x")))
    mediaDf(spark, b1).coalesce(1).write.parquet(s"$dir/b1")
    val schema = spark.read.parquet(s"$dir/b1").schema
    // the generic media stream probe serves the AUDIO index because the
    // coder rides the index params — no audio-specific sink exists or
    // is needed
    val q = CdcStream.startAhashNearDup(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(s"$dir/b*/"),
      "doc_id", "payload", idxDir, outDir,
      Files.createTempDirectory("stream_auprobe_c1").toString)
    try {
      q.processAllAvailable()
      def expected(docs: Seq[(Long, Array[Byte])]) = graft.operators.Dedup
        .incrementalAhashNearDupsReportIndexed(
          mediaDf(spark, docs), "doc_id", "payload",
          graft.operators.DedupIndex.loadMedia(spark, idxDir))
        .pairs.select("a_id", "b_id", "hamming")
        .as[(Long, Long, Int)].collect().toSeq.sorted
      def got(bIds: Set[Long]) = spark.read.parquet(outDir)
        .filter($"b_id".isin(bIds.toSeq: _*))
        .select("a_id", "b_id", "hamming")
        .as[(Long, Long, Int)].collect().toSeq.sorted
      val exp1 = expected(b1)
      assert(exp1.exists(_._3 == 0), "byte-identical clip must pair at Hamming 0")
      assert(got(Set(1000L, 1001L, 1002L)) === exp1)

      // mid-stream CDC through the maintenance sink: the absorb must
      // derive ENERGY codes (coder dispatch) — a new identical clip
      // pairs, a retired one stops
      mediaDf(spark, Seq((200L, wavOf("sgrp0", "scom0"))))
        .select(lit("I").as(C.Op), lit(1L).as("seq"), col("doc_id"),
          col("payload"))
        .unionByName(mediaDf(spark, Seq((0L, corpus.head._2)))
          .select(lit("D").as(C.Op), lit(2L).as("seq"), col("doc_id"),
            col("payload")))
        .coalesce(1).write.parquet(s"$evDir/e1")
      val m = CdcStream.startMediaIndexMaintenance(
        spark.readStream.schema(
          spark.read.parquet(s"$evDir/e1").schema).parquet(s"$evDir/e*/"),
        "doc_id", "payload", idxDir,
        Files.createTempDirectory("stream_aumaint_c1").toString,
        col("seq"))
      try m.processAllAvailable() finally m.stop()
      val b2 = Seq((2000L, wavOf("sgrp0", "scom0")))
      mediaDf(spark, b2).coalesce(1).write.parquet(s"$dir/b2")
      q.processAllAvailable()
      val after = got(Set(2000L))
      assert(after === expected(b2))
      assert(!after.exists(_._1 == 0L),
        s"retired clip still pairs the stream probe: $after")
      assert(after.exists(_._1 == 200L),
        s"absorbed clip must pair the next trigger: $after")
    } finally q.stop()
  }

  test("streaming video probe + maintenance serve the framehash media index via the pinned dispatch") {
    graft.plans.CachedPlans.clear()
    import MediaFixture.mediaDf
    def gifOf(t: String, n: String): Array[Byte] =
      graft.operators.SyntheticMedia.gif(t, n)
    // groups of 4, video twin: 0/1 byte-identical clips, 2
    // template-near (fresh per-frame noise), 3 distinct footage
    def mkVideo(ids: Seq[Long]): Seq[(Long, Array[Byte])] =
      ids.map { i =>
        val g = i / 4
        i % 4 match {
          case 0 | 1 => (i, gifOf(s"tgrp$g", s"tcom$g"))
          case 2     => (i, gifOf(s"tgrp$g", s"tnear$i"))
          case _     => (i, gifOf(s"tsolo${i * 37}", s"tn$i"))
        }
      }
    val dir = Files.createTempDirectory("stream_viprobe").toString
    val evDir = Files.createTempDirectory("stream_vimaint").toString
    val idxDir = Files.createTempDirectory("stream_viprobe_idx").toString
    val outDir = Files.createTempDirectory("stream_viprobe_out").toString
    val corpus = mkVideo(0L until 16L)
    graft.operators.DedupIndex.writeMedia(
      mediaDf(spark, corpus), "doc_id", "payload", idxDir,
      coder = "video_framehash")

    val b1 = Seq((1000L, gifOf("tgrp0", "tcom0")),
      (1001L, gifOf("tgrp1", "tnearZ")),
      (1002L, gifOf("nothing-like-it", "x")))
    mediaDf(spark, b1).coalesce(1).write.parquet(s"$dir/b1")
    val schema = spark.read.parquet(s"$dir/b1").schema
    // the generic media stream probe serves the VIDEO index because the
    // coder rides the index params — the third modality through the
    // same sinks, zero video-specific streaming code
    val q = CdcStream.startAhashNearDup(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(s"$dir/b*/"),
      "doc_id", "payload", idxDir, outDir,
      Files.createTempDirectory("stream_viprobe_c1").toString)
    try {
      q.processAllAvailable()
      def expected(docs: Seq[(Long, Array[Byte])]) = graft.operators.Dedup
        .incrementalAhashNearDupsReportIndexed(
          mediaDf(spark, docs), "doc_id", "payload",
          graft.operators.DedupIndex.loadMedia(spark, idxDir))
        .pairs.select("a_id", "b_id", "hamming")
        .as[(Long, Long, Int)].collect().toSeq.sorted
      def got(bIds: Set[Long]) = spark.read.parquet(outDir)
        .filter($"b_id".isin(bIds.toSeq: _*))
        .select("a_id", "b_id", "hamming")
        .as[(Long, Long, Int)].collect().toSeq.sorted
      val exp1 = expected(b1)
      assert(exp1.exists(_._3 == 0), "byte-identical clip must pair at Hamming 0")
      assert(got(Set(1000L, 1001L, 1002L)) === exp1)

      // mid-stream CDC through the maintenance sink: the absorb must
      // derive FRAME-SAMPLED codes (coder dispatch) — a new identical
      // clip pairs, a retired one stops
      mediaDf(spark, Seq((200L, gifOf("tgrp0", "tcom0"))))
        .select(lit("I").as(C.Op), lit(1L).as("seq"), col("doc_id"),
          col("payload"))
        .unionByName(mediaDf(spark, Seq((0L, corpus.head._2)))
          .select(lit("D").as(C.Op), lit(2L).as("seq"), col("doc_id"),
            col("payload")))
        .coalesce(1).write.parquet(s"$evDir/e1")
      val m = CdcStream.startMediaIndexMaintenance(
        spark.readStream.schema(
          spark.read.parquet(s"$evDir/e1").schema).parquet(s"$evDir/e*/"),
        "doc_id", "payload", idxDir,
        Files.createTempDirectory("stream_vimaint_c1").toString,
        col("seq"))
      try m.processAllAvailable() finally m.stop()
      val b2 = Seq((2000L, gifOf("tgrp0", "tcom0")))
      mediaDf(spark, b2).coalesce(1).write.parquet(s"$dir/b2")
      q.processAllAvailable()
      val after = got(Set(2000L))
      assert(after === expected(b2))
      assert(!after.exists(_._1 == 0L),
        s"retired clip still pairs the stream probe: $after")
      assert(after.exists(_._1 == 200L),
        s"absorbed clip must pair the next trigger: $after")
    } finally q.stop()
  }

  test("streaming media probe equals the batch indexed probe; the maintenance sink's commits land at the next trigger") {
    graft.plans.CachedPlans.clear()
    import MediaFixture.{bmpOf, mediaDf, mkMedia}
    val dir = Files.createTempDirectory("stream_mmprobe").toString
    val evDir = Files.createTempDirectory("stream_mmmaint").toString
    val idxDir = Files.createTempDirectory("stream_mmprobe_idx").toString
    val outDir = Files.createTempDirectory("stream_mmprobe_out").toString
    // corpus: ids 0..15 — groups of 4 (0/1 byte-identical, 2 near,
    // 3 distinct)
    val corpus = mkMedia(0L until 16L)
    graft.operators.DedupIndex.writeMedia(
      mediaDf(spark, corpus), "doc_id", "payload", idxDir)

    def writeBatch(base: String, name: String,
        rows: Seq[(Long, Array[Byte])]): Unit =
      mediaDf(spark, rows).coalesce(1).write.parquet(s"$base/$name")
    // probe batch 1: 1000 is byte-identical to corpus 0/1 (Hamming 0),
    // 1001 shares group1's template (near), 1002 is its own template
    val b1 = Seq((1000L, bmpOf("group0", "common0")),
      (1001L, bmpOf("group1", "nearZ")),
      (1002L, bmpOf("nothing-like-it", "x")))
    writeBatch(dir, "b1", b1)
    val schema = spark.read.parquet(s"$dir/b1").schema
    def start(ck: String) = CdcStream.startAhashNearDup(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(s"$dir/b*/"),
      "doc_id", "payload", idxDir, outDir,
      Files.createTempDirectory(ck).toString)
    val q = start("stream_mmprobe_c1")
    try {
      q.processAllAvailable()
      def expected(docs: Seq[(Long, Array[Byte])]) = graft.operators.Dedup
        .incrementalAhashNearDupsReportIndexed(
          mediaDf(spark, docs), "doc_id", "payload",
          graft.operators.DedupIndex.loadMedia(spark, idxDir))
        .pairs.select("a_id", "b_id", "hamming")
        .as[(Long, Long, Int)].collect().toSeq.sorted
      def got(bIds: Set[Long]) = spark.read.parquet(outDir)
        .filter($"b_id".isin(bIds.toSeq: _*))
        .select("a_id", "b_id", "hamming")
        .as[(Long, Long, Int)].collect().toSeq.sorted
      val exp1 = expected(b1)
      assert(exp1.nonEmpty, "fixture must pair the stream probe")
      assert(got(Set(1000L, 1001L, 1002L)) === exp1)

      // mid-stream CDC through the MAINTENANCE SINK: insert 200 (another
      // byte-identical group0 copy), delete corpus id 0
      mediaDf(spark, Seq((200L, bmpOf("group0", "common0"))))
        .select(lit("I").as(C.Op), lit(1L).as("seq"), col("doc_id"),
          col("payload"))
        .unionByName(mediaDf(spark, Seq((0L, corpus.head._2)))
          .select(lit("D").as(C.Op), lit(2L).as("seq"), col("doc_id"),
            col("payload")))
        .coalesce(1).write.parquet(s"$evDir/e1")
      val evSchema = spark.read.parquet(s"$evDir/e1").schema
      val m = CdcStream.startMediaIndexMaintenance(
        spark.readStream.schema(evSchema).parquet(s"$evDir/e*/"),
        "doc_id", "payload", idxDir,
        Files.createTempDirectory("stream_mmmaint_c1").toString,
        col("seq"))
      try m.processAllAvailable() finally m.stop()

      // the NEXT probe trigger sees the commit (index version marker):
      // 0 no longer pairs, 200 does
      val b2 = Seq((2000L, bmpOf("group0", "common0")))
      writeBatch(dir, "b2", b2)
      q.processAllAvailable()
      val after = got(Set(2000L))
      assert(after === expected(b2))
      assert(!after.exists(_._1 == 0L),
        s"retired corpus image still pairs the stream probe: $after")
      assert(after.exists(_._1 == 200L),
        s"absorbed image must pair the next trigger: $after")
      assert(after.exists(_._1 == 1L), "surviving dup copy must pair")

      // checkpoint-lost replay rewrites each batch's own partition
      // against the CURRENT index — no stacking, no resurrection
      val qr = start("stream_mmprobe_c2")
      try qr.processAllAvailable() finally qr.stop()
      assert(got(Set(1000L, 1001L, 1002L)) === expected(b1),
        "replayed batch 1 must re-probe the live index, unduplicated")
      assert(!got(Set(1000L, 2000L)).exists(_._1 == 0L),
        "replay resurrected a retired pairing")

      // replayed MAINTENANCE from a fresh checkpoint: absorb and retire
      // both no-op — no duplicate ledger rows
      val m2 = CdcStream.startMediaIndexMaintenance(
        spark.readStream.schema(evSchema).parquet(s"$evDir/e*/"),
        "doc_id", "payload", idxDir,
        Files.createTempDirectory("stream_mmmaint_c2").toString,
        col("seq"))
      try m2.processAllAvailable() finally m2.stop()
      val codes = graft.operators.DedupIndex.loadMedia(spark, idxDir).codes
      assert(codes.groupBy($"id").count().filter($"count" > 1).isEmpty,
        "replayed maintenance stacked duplicate ledger rows")
      assert(got(Set(2000L)) === expected(b2),
        "replayed maintenance changed probe results")
    } finally q.stop()
  }

  test("CDC index maintenance sink: stream inserts absorb, deletes retire, replay commits nothing") {
    val dir = Files.createTempDirectory("stream_idxmaint").toString
    val idxDir = Files.createTempDirectory("stream_idxmaint_idx").toString
    val ckpt1 = Files.createTempDirectory("stream_idxmaint_c1").toString
    def doc(i: Long) = s"maintained document number $i with its own " +
      s"distinct vocabulary token$i and filler words to shingle"
    // seed index: docs 1 and 2
    graft.operators.DedupIndex.writeText(
      Seq((1L, doc(1)), (2L, doc(2))).toDF("doc_id", "text"),
      "doc_id", "text", idxDir)

    // change stream: batch 1 inserts 3 and 4; batch 2 deletes 2, updates
    // 3 (content kept by contract), and inserts-then-deletes 5 inside
    // ONE batch (last event wins → tombstoned)
    def writeEvents(name: String,
        rows: Seq[(String, Long, Long, String)]): Unit = {
      rows.toDF(C.Op, "seq", "doc_id", "text")
        .coalesce(1).write.parquet(s"$dir/$name")
    }
    writeEvents("b1", Seq(("I", 1L, 3L, doc(3)), ("I", 2L, 4L, doc(4))))
    writeEvents("b2", Seq(("D", 3L, 2L, doc(2)), ("U", 4L, 3L, doc(3)),
      ("I", 5L, 5L, doc(5)), ("D", 6L, 5L, doc(5))))
    val schema = spark.read.parquet(s"$dir/b1").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/b*/")
    val q = CdcStream.startTextIndexMaintenance(stream, "doc_id", "text",
      idxDir, ckpt1, col("seq"))
    try q.processAllAvailable() finally q.stop()

    // live corpus after the stream: 1, 3, 4 (2 deleted, 5 tombstoned
    // same-batch); probe near-identical copies and check verdicts
    def verdicts(): Map[Long, String] = {
      val idx = graft.operators.DedupIndex.loadText(spark, idxDir)
      graft.operators.Dedup.incrementalExactIndexed(
          (1L to 5L).map(i => (100L + i, doc(i))).toDF("doc_id", "text"),
          "doc_id", "text", idx)
        .select(($"doc_id" - 100L).as("orig"), $"verdict")
        .as[(Long, String)].collect().toMap
    }
    val v = verdicts()
    assert(v(1L) === "dup_of_existing" && v(3L) === "dup_of_existing" &&
      v(4L) === "dup_of_existing", v)
    assert(v(2L) === "kept", s"deleted doc 2 still matches: $v")
    assert(v(5L) === "kept", s"same-batch insert+delete leaked: $v")

    // replay from a FRESH checkpoint over the same files: absorb and
    // retire are both no-ops — same verdicts, no duplicate index rows
    val ckpt2 = Files.createTempDirectory("stream_idxmaint_c2").toString
    val q2 = CdcStream.startTextIndexMaintenance(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(s"$dir/b*/"),
      "doc_id", "text", idxDir, ckpt2, col("seq"))
    try q2.processAllAvailable() finally q2.stop()
    assert(verdicts() === v, "replayed maintenance changed the index")
    val counts = graft.operators.DedupIndex.loadText(spark, idxDir).counts
    assert(counts.groupBy($"id").count().filter($"count" > 1).isEmpty,
      "replay stacked duplicate rows under one id")
  }

  test("CDC index maintenance sink: updates refresh content, delete-then-reinsert resurrects") {
    val dir = Files.createTempDirectory("stream_idxrefresh").toString
    val idxDir = Files.createTempDirectory("stream_idxrefresh_idx").toString
    val ckpt = Files.createTempDirectory("stream_idxrefresh_c").toString
    def doc(i: Long) = s"maintained document number $i with its own " +
      s"distinct vocabulary token$i and filler words to shingle"
    def docV2(i: Long) = doc(i) + " second edition entirely revised"
    // seed index: docs 1, 2, 3
    graft.operators.DedupIndex.writeText(
      (1L to 3L).map(i => (i, doc(i))).toDF("doc_id", "text"),
      "doc_id", "text", idxDir)

    def writeEvents(name: String,
        rows: Seq[(String, Long, Long, String)]): Unit =
      rows.toDF(C.Op, "seq", "doc_id", "text")
        .coalesce(1).write.parquet(s"$dir/$name")
    // batch 1: UPDATE doc 1 to v2 content, DELETE doc 2
    writeEvents("b1", Seq(("U", 1L, 1L, docV2(1)), ("D", 2L, 2L, doc(2))))
    // batch 2: doc 2 comes BACK (cross-batch resurrection). The D→I
    // order is load-bearing here, and FileStreamSource orders by
    // modification time — force b2 strictly newer so a coarse-mtime
    // filesystem cannot tie (and flip) the batches.
    writeEvents("b2", Seq(("I", 3L, 2L, doc(2))))
    val maxB1 = new java.io.File(s"$dir/b1").listFiles
      .map(_.lastModified).max
    new java.io.File(s"$dir/b2").listFiles
      .foreach(f => f.setLastModified(maxB1 + 2000))
    val schema = spark.read.parquet(s"$dir/b1").schema
    val q = CdcStream.startTextIndexMaintenance(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(s"$dir/b*/"),
      "doc_id", "text", idxDir, ckpt, col("seq"))
    try q.processAllAvailable() finally q.stop()

    // the maintained index answers for the POST-STREAM corpus:
    // doc 1 = v2 only (old content refreshed away), doc 2 live again,
    // doc 3 untouched
    val idx = graft.operators.DedupIndex.loadText(spark, idxDir)
    val probe = Seq((101L, doc(1)), (111L, docV2(1)), (102L, doc(2)),
      (103L, doc(3))).toDF("doc_id", "text")
    val v = graft.operators.Dedup.incrementalExactIndexed(
        probe, "doc_id", "text", idx)
      .select($"doc_id", $"verdict").as[(Long, String)].collect().toMap
    assert(v(101L) === "kept", s"stale pre-update content still matches: $v")
    assert(v(111L) === "dup_of_existing", s"refreshed content not indexed: $v")
    assert(v(102L) === "dup_of_existing", s"reinserted doc 2 not live: $v")
    assert(v(103L) === "dup_of_existing", v.toString)
    // one live ledger row per live id
    assert(idx.counts.groupBy($"id").count().filter($"count" > 1).isEmpty,
      "refresh stacked duplicate live rows")
  }

  test("CDC index maintenance sink: auto-compaction reclaims tombstones past the threshold") {
    val dir = Files.createTempDirectory("stream_idxautocomp").toString
    val idxDir = Files.createTempDirectory("stream_idxautocomp_idx").toString
    val ckpt = Files.createTempDirectory("stream_idxautocomp_c").toString
    def doc(i: Long) = s"compacted document number $i with its own " +
      s"distinct vocabulary token$i and filler words to shingle"
    graft.operators.DedupIndex.writeText(
      (1L to 6L).map(i => (i, doc(i))).toDF("doc_id", "text"),
      "doc_id", "text", idxDir)
    // one batch deleting docs 2 and 4: with threshold 1, the sink
    // retires them (2 tombstones) and then compacts in the same
    // micro-batch — the tombstone set must come back empty while the
    // deletes stay deleted
    Seq(("D", 1L, 2L, doc(2)), ("D", 2L, 4L, doc(4)))
      .toDF(C.Op, "seq", "doc_id", "text")
      .coalesce(1).write.parquet(s"$dir/b1")
    val schema = spark.read.parquet(s"$dir/b1").schema
    val q = CdcStream.startTextIndexMaintenance(
      spark.readStream.schema(schema).parquet(s"$dir/b*/"),
      "doc_id", "text", idxDir, ckpt, col("seq"),
      autoCompactTombstones = Some(1L))
    try q.processAllAvailable() finally q.stop()

    val idx = graft.operators.DedupIndex.loadText(spark, idxDir)
    assert(idx.tombstones.count() === 0,
      "auto-compaction must have cleared the tombstone set")
    val v = graft.operators.Dedup.incrementalExactIndexed(
        (1L to 6L).map(i => (100L + i, doc(i))).toDF("doc_id", "text"),
        "doc_id", "text", idx)
      .select(($"doc_id" - 100L).as("orig"), $"verdict")
      .as[(Long, String)].collect().toMap
    assert(v(2L) === "kept" && v(4L) === "kept",
      s"compacted deletes resurfaced: $v")
    assert(Seq(1L, 3L, 5L, 6L).forall(v(_) === "dup_of_existing"), v)
  }

  test("CDC lexical index maintenance sink: I/U/D keep BM25 exact, replay commits nothing") {
    val dir = Files.createTempDirectory("stream_lexmaint").toString
    val idxDir = Files.createTempDirectory("stream_lexmaint_idx").toString
    val ckpt1 = Files.createTempDirectory("stream_lexmaint_c1").toString
    def doc(i: Long) = s"ranked$i corpus$i shared lexical filler words " +
      s"ranked$i tail$i"
    def docV2(i: Long) = doc(i) + " revised second edition"
    graft.operators.DedupIndex.writeLexical(
      (1L to 3L).map(i => (i, doc(i))).toDF("doc_id", "text"),
      "doc_id", "text", idxDir, termNgram = 2)

    def writeEvents(name: String,
        rows: Seq[(String, Long, Long, String)]): Unit =
      rows.toDF(C.Op, "seq", "doc_id", "text")
        .coalesce(1).write.parquet(s"$dir/$name")
    // batch 1: INSERT doc 4, UPDATE doc 1 to v2; batch 2: DELETE doc 2,
    // insert-then-delete doc 5 inside one batch (last event wins)
    writeEvents("b1", Seq(("I", 1L, 4L, doc(4)), ("U", 2L, 1L, docV2(1))))
    writeEvents("b2", Seq(("D", 3L, 2L, doc(2)), ("I", 4L, 5L, doc(5)),
      ("D", 5L, 5L, doc(5))))
    val maxB1 = new java.io.File(s"$dir/b1").listFiles
      .map(_.lastModified).max
    new java.io.File(s"$dir/b2").listFiles
      .foreach(f => f.setLastModified(maxB1 + 2000))
    val schema = spark.read.parquet(s"$dir/b1").schema
    val q = CdcStream.startLexicalIndexMaintenance(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(s"$dir/b*/"),
      "doc_id", "text", idxDir, ckpt1, col("seq"))
    try q.processAllAvailable() finally q.stop()

    // the maintained index must score exactly as a recompute over the
    // post-stream corpus {1v2, 3, 4} — deleted/stale postings would
    // shift df/doclen/total_len and break bit-equality
    val live = Seq(1L -> docV2(1), 3L -> doc(3), 4L -> doc(4))
    val queries = Seq(501L -> docV2(1), 502L -> doc(2), 503L -> doc(4))
      .toDF("doc_id", "text")
    val cols = Seq("q_id", "rank", "doc_id", "n_terms", "score")
    def probe() = graft.operators.Retrieval
      .bm25TopKIndexed(
        graft.operators.DedupIndex.loadLexical(spark, idxDir),
        queries, "doc_id", "text")
      .select(cols.head, cols.tail: _*)
      .as[(Long, Int, Long, Long, Long)].collect().toSeq.sorted
    val expected = graft.operators.Retrieval
      .bm25TopK(live.toDF("doc_id", "text"), queries,
        "doc_id", "text", "doc_id", "text", termNgram = 2)
      .select(cols.head, cols.tail: _*)
      .as[(Long, Int, Long, Long, Long)].collect().toSeq.sorted
    val got = probe()
    assert(got.nonEmpty && got === expected,
      "maintained lexical index diverged from live-corpus recompute")
    assert(!got.exists(_._3 == 2L), "deleted doc 2 still ranks")
    assert(!got.exists(_._3 == 5L), "same-batch insert+delete leaked")

    // checkpoint-lost replay: absorb skips matching content, retire
    // finds no live generation — results unchanged, nothing committed
    val ckpt2 = Files.createTempDirectory("stream_lexmaint_c2").toString
    val q2 = CdcStream.startLexicalIndexMaintenance(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(s"$dir/b*/"),
      "doc_id", "text", idxDir, ckpt2, col("seq"))
    try q2.processAllAvailable() finally q2.stop()
    assert(probe() === expected, "replayed maintenance changed rankings")
    val doclens = graft.operators.DedupIndex.loadLexical(spark, idxDir)
      .doclens
    assert(doclens.groupBy($"id").count().filter($"count" > 1).isEmpty,
      "replay stacked duplicate live doclen rows")
  }

  test("CDC lexical maintenance sink: auto-compaction reclaims tombstones, rankings stay exact") {
    val dir = Files.createTempDirectory("stream_lexautocomp").toString
    val idxDir = Files.createTempDirectory("stream_lexautocomp_idx").toString
    val ckpt = Files.createTempDirectory("stream_lexautocomp_c").toString
    def doc(i: Long) = s"compact$i lexical$i shared ranking filler " +
      s"words compact$i"
    graft.operators.DedupIndex.writeLexical(
      (1L to 6L).map(i => (i, doc(i))).toDF("doc_id", "text"),
      "doc_id", "text", idxDir, termNgram = 2)
    // one batch deleting docs 2 and 4: threshold 1 retires (2
    // tombstones) then compacts inside the same micro-batch
    Seq(("D", 1L, 2L, doc(2)), ("D", 2L, 4L, doc(4)))
      .toDF(C.Op, "seq", "doc_id", "text")
      .coalesce(1).write.parquet(s"$dir/b1")
    val schema = spark.read.parquet(s"$dir/b1").schema
    val q = CdcStream.startLexicalIndexMaintenance(
      spark.readStream.schema(schema).parquet(s"$dir/b*/"),
      "doc_id", "text", idxDir, ckpt, col("seq"),
      autoCompactTombstones = Some(1L))
    try q.processAllAvailable() finally q.stop()

    // tombstones physically reclaimed (no data files left behind)
    val tombFiles = Option(new java.io.File(s"$idxDir/tombstones")
        .listFiles()).toSeq.flatten
      .filter(f => f.isFile && !f.getName.startsWith("_") &&
        !f.getName.startsWith("."))
    assert(tombFiles.isEmpty,
      s"auto-compaction left tombstone files: ${tombFiles.mkString(", ")}")
    // and the compacted index still scores exactly as the live corpus
    val live = Seq(1L, 3L, 5L, 6L).map(i => i -> doc(i))
    val queries = Seq(501L -> doc(1), 502L -> doc(2)).toDF("doc_id", "text")
    val cols = Seq("q_id", "rank", "doc_id", "n_terms", "score")
    val got = graft.operators.Retrieval
      .bm25TopKIndexed(
        graft.operators.DedupIndex.loadLexical(spark, idxDir),
        queries, "doc_id", "text")
      .select(cols.head, cols.tail: _*)
      .as[(Long, Int, Long, Long, Long)].collect().toSeq.sorted
    val expected = graft.operators.Retrieval
      .bm25TopK(live.toDF("doc_id", "text"), queries,
        "doc_id", "text", "doc_id", "text", termNgram = 2)
      .select(cols.head, cols.tail: _*)
      .as[(Long, Int, Long, Long, Long)].collect().toSeq.sorted
    assert(got.nonEmpty && got === expected)
    assert(!got.exists(r => r._3 == 2L || r._3 == 4L),
      "compacted deletes resurfaced in rankings")
  }

  test("index-aware streaming embedding probe ignores retired vectors") {
    val dir = Files.createTempDirectory("stream_endret").toString
    val idxDir = Files.createTempDirectory("stream_endret_idx").toString
    val dim = 8
    def vec(j: Int): Array[Float] = Array.tabulate(dim)(
      d => 10f + ((j + d * 3) % 5) * 0.1f)
    // both corpus vectors sit in one cluster; retiring 100 must leave
    // only 101 pairing the arrival
    graft.operators.DedupIndex.writeVectors(
      Seq((100L, vec(1)), (101L, vec(2))).toDF("vec_id", "embedding"),
      "vec_id", "embedding", idxDir, planes = 2, dim = dim)
    graft.operators.DedupIndex.retireVectors(
      Seq(100L).toDF("vec_id"), "vec_id", idxDir)
    val idx = graft.operators.DedupIndex.loadVectors(spark, idxDir)

    Seq((1L, vec(3))).toDF("vec_id", "embedding")
      .coalesce(1).write.parquet(s"$dir/b1")
    val schema = spark.read.parquet(s"$dir/b1").schema
    val stream = spark.readStream.schema(schema).parquet(s"$dir/b*/")
    val q = CdcStream.embedNearDupStreamIndexed(stream, "vec_id",
        "embedding", idx, threshold = 0.9)
      .writeStream.outputMode("append")
      .format("memory").queryName("endret_out").start()
    try q.processAllAvailable() finally q.stop()

    val pairs = spark.table("endret_out")
      .filter(!$"overflow")
      .select("a_id", "b_id").as[(Long, Long)].collect().toSeq.distinct
    assert(pairs === Seq((101L, 1L)),
      s"retired vector must not pair the stream probe: $pairs")
  }

  test("CDC vector index maintenance sink: deletes retire from the cosine probe") {
    val dir = Files.createTempDirectory("stream_vecmaint").toString
    val idxDir = Files.createTempDirectory("stream_vecmaint_idx").toString
    val ckpt = Files.createTempDirectory("stream_vecmaint_c").toString
    val dim = 8
    def vec(cluster: Int, j: Int): Array[Float] = Array.tabulate(dim)(
      d => (if (cluster == 0) 10f else -10f) + ((j + d * 3) % 5) * 0.1f)
    graft.operators.DedupIndex.writeVectors(
      Seq((1L, vec(0, 1)), (2L, vec(1, 2))).toDF("vec_id", "embedding"),
      "vec_id", "embedding", idxDir, planes = 2, dim = dim)

    // stream: insert 3 (cluster 0), delete 2 (cluster 1's only member)
    Seq(("I", 1L, 3L, vec(0, 2)), ("D", 2L, 2L, vec(1, 2)))
      .toDF(C.Op, "seq", "vec_id", "embedding")
      .coalesce(1).write.parquet(s"$dir/b1")
    val schema = spark.read.parquet(s"$dir/b1").schema
    val stream = spark.readStream.schema(schema).parquet(s"$dir/b*/")
    val q = CdcStream.startVectorIndexMaintenance(stream, "vec_id",
      "embedding", idxDir, ckpt, col("seq"))
    try q.processAllAvailable() finally q.stop()

    val idx = graft.operators.DedupIndex.loadVectors(spark, idxDir)
    val pairs = graft.operators.Similarity
      .incrementalCosineNearDupsIndexed(
        Seq((101L, vec(0, 3)), (102L, vec(1, 4)))
          .toDF("vec_id", "embedding"),
        "vec_id", "embedding", idx, threshold = 0.9)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSeq.sorted
    // cluster-0 probe pairs corpus 1 AND the absorbed 3; the deleted 2
    // no longer pairs the cluster-1 probe
    assert(pairs === Seq((1L, 101L), (3L, 101L)), pairs)
  }

  test("CDC vector maintenance sink: autoRetrain keeps IVF centroids on the live selection") {
    val dir = Files.createTempDirectory("stream_vecretrain").toString
    val idxDir = Files.createTempDirectory("stream_vecretrain_idx").toString
    val ckpt = Files.createTempDirectory("stream_vecretrain_c").toString
    val dim = 8
    def vec(i: Long): Array[Float] = Array.tabulate(dim)(
      d => (if (i % 2 == 0) 10f else -10f) + ((i * 7 + d * 3) % 5) * 0.1f)
    // build over 30 evens (selection = md5 top-20 of those), then stream
    // in 30 odds and delete one even — the live selection must follow
    graft.operators.DedupIndex.writeVectors(
      (0L until 60L by 2).map(i => (i, vec(i))).toDF("vec_id", "embedding"),
      "vec_id", "embedding", idxDir, planes = 2, dim = dim)
    val events =
      (1L until 60L by 2).map(i => ("I", i + 100L, i, vec(i))) :+
        (("D", 500L, 0L, vec(0L)))
    events.toDF(C.Op, "seq", "vec_id", "embedding")
      .coalesce(1).write.parquet(s"$dir/b1")
    val schema = spark.read.parquet(s"$dir/b1").schema
    val stream = spark.readStream.schema(schema).parquet(s"$dir/b*/")
    val q = CdcStream.startVectorIndexMaintenance(stream, "vec_id",
      "embedding", idxDir, ckpt, col("seq"), autoRetrainEvery = Some(1))
    try q.processAllAvailable() finally q.stop()

    val idx = graft.operators.DedupIndex.loadVectors(spark, idxDir)
    val live = ((2L until 60L by 2) ++ (1L until 60L by 2))
      .map(i => (i, vec(i)))
    val want = graft.operators.Similarity.selectCentroids(
        live.toDF("vec_id", "embedding"), "vec_id", 20)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val have = idx.centroids.select(col("cent_id"))
      .collect().map(_.getLong(0)).toSet
    assert(have === want,
      "maintained index serves centroids trained on a dead corpus")
    // and the maintained selection settled — nothing left to retrain
    assert(!graft.operators.DedupIndex.retrainVectorsIfNeeded(spark, idxDir))
    // a non-positive cadence would run the O(corpus) scan per batch —
    // reject it loudly instead of silently coercing
    intercept[IllegalArgumentException] {
      CdcStream.startVectorIndexMaintenance(stream, "vec_id",
        "embedding", idxDir, ckpt, col("seq"), autoRetrainEvery = Some(0))
    }
  }

  test("CDC vector maintenance sink: autoRebuild escalates to fresh quantization geometry on saturation") {
    val dir = Files.createTempDirectory("stream_vecrebuild").toString
    val idxDir = Files.createTempDirectory("stream_vecrebuild_idx").toString
    val ckpt = Files.createTempDirectory("stream_vecrebuild_c").toString
    val dim = 8
    def vec(i: Long, c: Float): Array[Float] = Array.tabulate(dim)(
      d => c + ((i * 7 + d * 3) % 5) * 0.1f)
    graft.operators.DedupIndex.writeVectors(
      (0L until 40L by 2).map(i => (i, vec(i, 10f)))
        .toDF("vec_id", "embedding"),
      "vec_id", "embedding", idxDir, planes = 2, dim = dim)
    // the streamed inserts land FAR outside the trained per-dim ranges:
    // under frozen geometry every one of their components would encode
    // clamped — the drift retrain cannot repair
    (1L until 40L by 2).map(i => ("I", i + 100L, i, vec(i, 60f)))
      .toDF(C.Op, "seq", "vec_id", "embedding")
      .coalesce(1).write.parquet(s"$dir/b1")
    val schema = spark.read.parquet(s"$dir/b1").schema
    val stream = spark.readStream.schema(schema).parquet(s"$dir/b*/")
    val q = CdcStream.startVectorIndexMaintenance(stream, "vec_id",
      "embedding", idxDir, ckpt, col("seq"),
      autoRebuildEvery = Some((1, 0.01)))
    try q.processAllAvailable() finally q.stop()

    // the sink rebuilt: stored ranges span the absorbed corpus, so the
    // saturation signal reads zero and the stored codes match a fresh
    // build over the live rows
    assert(graft.operators.DedupIndex.sq8Saturation(spark, idxDir)._1 === 0L,
      "maintained index still serves saturated codes under stale ranges")
    val freshDir = Files.createTempDirectory("stream_vecrebuild_f").toString
    graft.operators.DedupIndex.writeVectors(
      ((0L until 40L by 2).map(i => (i, vec(i, 10f))) ++
        (1L until 40L by 2).map(i => (i, vec(i, 60f))))
        .toDF("vec_id", "embedding"),
      "vec_id", "embedding", freshDir, planes = 2, dim = dim)
    def codes(d: String) = graft.operators.DedupIndex
      .loadVectors(spark, d).buckets.select($"id", $"codes")
      .as[(Long, Seq[Int])].collect().toMap
    assert(codes(idxDir) === codes(freshDir))
    // invalid knobs are rejected loudly
    intercept[IllegalArgumentException] {
      CdcStream.startVectorIndexMaintenance(stream, "vec_id",
        "embedding", idxDir, ckpt, col("seq"),
        autoRebuildEvery = Some((0, 0.01)))
    }
    intercept[IllegalArgumentException] {
      CdcStream.startVectorIndexMaintenance(stream, "vec_id",
        "embedding", idxDir, ckpt, col("seq"),
        autoRebuildEvery = Some((1, 1.5)))
    }
  }

  test("streaming near-dup estimator error vs batch exact Jaccard is bounded") {
    // The stream accepts corpus candidates on the 12-hash SIGNATURE
    // AGREEMENT estimate (est = matching components / 12) while the
    // batch pipeline verifies exact Jaccard — a documented divergence.
    // This case QUANTIFIES it: est is Binomial(12, J)/12, so Hoeffding
    // gives P(|est − J| ≥ ε) ≤ 2·exp(−24ε²) — ≈ 2% at ε = 0.4, ≈ 11%
    // at ε = 0.35. The declared contract asserted here:
    //   (a) no acceptance flip outside the |J − t| < 0.35 gray zone,
    //   (b) every emitted estimate within 0.4 of its exact Jaccard,
    //   (c) flips confined to a minority of the verified pairs.
    // Fixture: 30 corpus/arrival pairs with ANALYTIC Jaccard — each
    // pair has its own 40-word vocabulary, the two docs share k of
    // their 20 distinct words, so J = k / (40 − k) sweeps 0.05…1.0
    // across the t = 0.5 threshold (shingleN = 1 ⇒ shingles = words).
    val dir = Files.createTempDirectory("stream_nderr").toString
    val ks = Seq(2, 5, 8, 10, 12, 13, 14, 16, 18, 20)
    val pairsSpec = for (rep <- 0 until 3; k <- ks) yield (rep, k)
    def words(pair: Int, from: Int, n: Int): String =
      (from until from + n).map(j => s"p${pair}w$j").mkString(" ")
    val fixtures = pairsSpec.zipWithIndex.map { case ((_, k), p) =>
      // corpus doc: words 0..19; arrival: words (20−k)..(39−k) → k shared
      val corpusDoc = (1000L + p, words(p, 0, 20))
      val arrival = (p.toLong, words(p, 20 - k, 20))
      val jexact = k.toDouble / (40 - k).toDouble
      (p, corpusDoc, arrival, jexact)
    }
    val corpus = fixtures.map(_._2).toDF("doc_id", "text")
    val idxDir = Files.createTempDirectory("stream_nderr_idx").toString
    graft.operators.DedupIndex.writeText(corpus, "doc_id", "text", idxDir,
      shingleN = 1)
    val idx = graft.operators.DedupIndex.loadText(spark, idxDir)

    fixtures.map(_._3).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$dir/b1")
    val schema = spark.read.parquet(s"$dir/b1").schema
    val stream = spark.readStream.schema(schema).parquet(s"$dir/b*/")
    val q = CdcStream.nearDupStreamIndexed(stream, "doc_id", "text", idx)
      .writeStream.outputMode("append")
      .format("memory").queryName("nderr_out").start()
    try q.processAllAvailable() finally q.stop()

    val t = 0.5
    val jOf = fixtures.map(f => f._1 -> f._4).toMap
    // stream-accepted (corpus probe side only) with the emitted estimate
    val streamAcc = spark.table("nderr_out")
      .filter(!$"overflow" && $"a_id" >= 1000L)
      .select(($"a_id" - 1000L).as("p"), $"est_jaccard")
      .as[(Long, Double)].collect().toMap
    // batch-accepted: same index candidacy, EXACT-Jaccard verify
    val batchAcc = graft.operators.Dedup
      .incrementalMinHashNearDupsReportIndexed(
        fixtures.map(_._3).toDF("doc_id", "text"), "doc_id", "text", idx,
        threshold = t)
      .pairs.select(($"a_id" - 1000L).as("p"), $"jaccard")
      .as[(Long, Double)].collect().toMap
    // the analytic Jaccard IS the batch-verified one (sanity)
    batchAcc.foreach { case (p, j) =>
      assert(math.abs(j - jOf(p.toInt)) < 1e-12, s"pair $p: $j") }
    assert(batchAcc.nonEmpty && streamAcc.nonEmpty)

    // (b) every emitted estimate within Hoeffding ε = 0.4 of exact
    streamAcc.foreach { case (p, est) =>
      assert(math.abs(est - jOf(p.toInt)) <= 0.4,
        s"pair $p: est $est vs exact ${jOf(p.toInt)} — estimator drifted " +
          "past the 0.4 bound (P ≈ 2% per pair under Hoeffding)")
    }
    // (a) flips only inside the |J − t| < 0.35 gray zone
    val flips = (streamAcc.keySet diff batchAcc.keySet) ++
      (batchAcc.keySet diff streamAcc.keySet)
    flips.foreach { p =>
      assert(math.abs(jOf(p.toInt) - t) < 0.35,
        s"pair $p flipped with exact J = ${jOf(p.toInt)} — outside the " +
          "gray zone the 12-hash estimate is contracted to respect")
    }
    // (c) flips are the minority of all pairs either side verified
    val union = streamAcc.keySet ++ batchAcc.keySet
    assert(flips.size.toDouble / union.size <= 0.34,
      s"${flips.size}/${union.size} acceptance flips — estimator too " +
        "noisy for the declared threshold contract")
    val falseAcc = (streamAcc.keySet diff batchAcc.keySet).size
    val falseRej = (batchAcc.keySet diff streamAcc.keySet).size
    info(s"measured on the 30-pair sweep: $falseAcc false-accepts, " +
      s"$falseRej false-rejects over ${union.size} verified pairs; " +
      s"flip J values: ${flips.toSeq.sorted.map(p => jOf(p.toInt))
        .map(j => f"$j%.3f").mkString(", ")}")
    // non-vacuity: clear accepts (J = 1) agree on both sides
    val sureIds = fixtures.filter(_._4 >= 0.99).map(_._1.toLong)
    assert(sureIds.forall(p => streamAcc.contains(p) && batchAcc.contains(p)),
      "exact-duplicate pairs must be accepted by BOTH semantics")
  }

  test("index-aware embedding near-dup pairs arrivals against the persisted vector index") {
    val dir = Files.createTempDirectory("stream_endidx").toString
    val dim = 8
    // two well-separated clusters; members of a cluster are near-dups
    def vec(cluster: Int, jitter: Int): Array[Float] = Array.tabulate(dim)(
      d => (if (cluster == 0) 10f else -10f) + ((jitter + d * 3) % 5) * 0.1f)
    // the already-indexed corpus: one vector per cluster
    val corpus = Seq((100L, vec(0, 1)), (101L, vec(1, 2)))
      .toDF("vec_id", "embedding")
    val idxDir = Files.createTempDirectory("stream_endidx_idx").toString
    graft.operators.DedupIndex.writeVectors(corpus, "vec_id", "embedding",
      idxDir, planes = 2, dim = dim)
    val idx = graft.operators.DedupIndex.loadVectors(spark, idxDir)

    // batch 1: a near-dup of corpus vector 100 — pairs via the index
    // probe immediately. batch 2: twin fresh cluster-1 vectors — the
    // stateful new×new path pairs them (and each pairs corpus 101).
    Seq((1L, vec(0, 3))).toDF("vec_id", "embedding")
      .coalesce(1).write.parquet(s"$dir/b1")
    Seq((2L, vec(1, 4)), (3L, vec(1, 4)))
      .toDF("vec_id", "embedding").coalesce(1).write.parquet(s"$dir/b2")
    val schema = spark.read.parquet(s"$dir/b1").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/b*/")
    val q = CdcStream.embedNearDupStreamIndexed(stream, "vec_id",
        "embedding", idx, threshold = 0.9)
      .writeStream.outputMode("append")
      .format("memory").queryName("endidx_out").start()
    try q.processAllAvailable() finally q.stop()

    val cands = spark.table("endidx_out")
      .filter(!$"overflow")
      .select("a_id", "b_id", "score")
      .as[(Long, Long, Double)].collect().toSeq
    assert(cands.forall(_._3 >= 0.9), cands)
    val pairs = cands.map(c => (c._1, c._2)).distinct.sorted
    assert(pairs === Seq((2L, 3L), (100L, 1L), (101L, 2L), (101L, 3L)),
      "corpus probes (100,1)/(101,2)/(101,3); stateful path (2,3)")

    // corpus-pair scores are bit-identical to the batch indexed probe
    val batchScores = graft.operators.Similarity
      .incrementalCosineNearDupsIndexed(
        spark.read.parquet(s"$dir/b*/"), "vec_id", "embedding", idx,
        threshold = 0.9)
      .select("a_id", "b_id", "score")
      .as[(Long, Long, Double)].collect().toSeq.sorted
    val streamCorpusScores = cands.filter(_._1 >= 100L).distinct.sorted
    assert(streamCorpusScores === batchScores)
  }

  test("streaming SQ8 probe bit-matches the batch SQ8 indexed probe") {
    val dir = Files.createTempDirectory("stream_esq8").toString
    val dim = 8
    def vec(cluster: Int, jitter: Int): Array[Float] = Array.tabulate(dim)(
      d => (if (cluster == 0) 10f else -10f) + ((jitter + d * 3) % 5) * 0.1f)
    val corpus = Seq((100L, vec(0, 1)), (101L, vec(1, 2)))
      .toDF("vec_id", "embedding")
    val idxDir = Files.createTempDirectory("stream_esq8_idx").toString
    graft.operators.DedupIndex.writeVectors(corpus, "vec_id", "embedding",
      idxDir, planes = 2, dim = dim)
    val idx = graft.operators.DedupIndex.loadVectors(spark, idxDir)

    Seq((1L, vec(0, 3))).toDF("vec_id", "embedding")
      .coalesce(1).write.parquet(s"$dir/b1")
    Seq((2L, vec(1, 4)), (3L, vec(1, 4)))
      .toDF("vec_id", "embedding").coalesce(1).write.parquet(s"$dir/b2")
    val schema = spark.read.parquet(s"$dir/b1").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/b*/")
    val q = CdcStream.embedNearDupStreamSq8Indexed(stream, "vec_id",
        "embedding", idx, threshold = 0.9)
      .writeStream.outputMode("append")
      .format("memory").queryName("esq8_out").start()
    try q.processAllAvailable() finally q.stop()

    val cands = spark.table("esq8_out")
      .filter(!$"overflow")
      .select("a_id", "b_id", "score")
      .as[(Long, Long, Double)].collect().toSeq
    val pairs = cands.map(c => (c._1, c._2)).distinct.sorted
    assert(pairs === Seq((2L, 3L), (100L, 1L), (101L, 2L), (101L, 3L)),
      s"same pair set as the float probe on this fixture: $pairs")

    // corpus-pair scores carry quantization, so they differ from the
    // float probe — but must be BIT-identical to the batch SQ8 probe
    val batchScores = graft.operators.Similarity
      .incrementalCosineNearDupsSq8Indexed(
        spark.read.parquet(s"$dir/b*/"), "vec_id", "embedding", idx,
        threshold = 0.9)
      .select("a_id", "b_id", "score")
      .as[(Long, Long, Double)].collect().toSeq.sorted
    val streamCorpusScores = cands.filter(_._1 >= 100L).distinct.sorted
    assert(streamCorpusScores === batchScores)
    assert(streamCorpusScores.nonEmpty)
  }

  test("near-dup state expires past the event-time horizon") {
    val dir = Files.createTempDirectory("stream_ndttl").toString
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val same = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val other = "one two three four five six seven eight nine ten"
    val third = "red green blue cyan magenta yellow black white gray pink"
    // b1 seeds bucket A at 10:00 (expiry 11:00 with a 1h horizon);
    // b2 advances the watermark to 12:00; b3 gives bucket A an idle
    // trigger at watermark > expiry → state removed; b4's identical doc
    // must NOT pair with doc 1 — only with its same-batch twin
    Seq((1L, ts(10, 0), same)).toDF("doc_id", "ts", "text")
      .coalesce(1).write.parquet(s"$dir/b1")
    Seq((2L, ts(13, 0), other)).toDF("doc_id", "ts", "text")
      .coalesce(1).write.parquet(s"$dir/b2")
    Seq((4L, ts(13, 30), third)).toDF("doc_id", "ts", "text")
      .coalesce(1).write.parquet(s"$dir/b3")
    Seq((5L, ts(13, 45), same), (6L, ts(13, 50), same))
      .toDF("doc_id", "ts", "text").coalesce(1).write.parquet(s"$dir/b4")

    val schema = spark.read.parquet(s"$dir/b1").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/b*/")
    val q = CdcStream.nearDupStream(stream, "doc_id", "text",
        eventTime = Some(("ts", "1 hour")))
      .writeStream.outputMode("append")
      .format("memory").queryName("ndttl_out").start()
    try q.processAllAvailable() finally q.stop()

    val pairs = spark.table("ndttl_out").filter(!$"overflow")
      .select("a_id", "b_id").as[(Long, Long)].collect().distinct.sorted.toSeq
    assert(pairs === Seq((5L, 6L)),
      "expired bucket must not pair across the horizon; fresh twins must")
  }

  test("near-dup stream survives null event-time rows") {
    val dir = Files.createTempDirectory("stream_ndnull").toString
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val same = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    // a null-timestamp row rides along in BOTH batches: it must be
    // dropped (not NPE the bucket-expiry max) and never pair
    Seq((1L, Option(ts(10, 0)), same), (2L, Option.empty[java.sql.Timestamp], same))
      .toDF("doc_id", "ts", "text").coalesce(1).write.parquet(s"$dir/b1")
    Seq((3L, Option(ts(10, 5)), same), (4L, Option.empty[java.sql.Timestamp], same))
      .toDF("doc_id", "ts", "text").coalesce(1).write.parquet(s"$dir/b2")

    val schema = spark.read.parquet(s"$dir/b1").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/b*/")
    val q = CdcStream.nearDupStream(stream, "doc_id", "text",
        eventTime = Some(("ts", "1 hour")))
      .writeStream.outputMode("append")
      .format("memory").queryName("ndnull_out").start()
    try q.processAllAvailable() finally q.stop()

    val pairs = spark.table("ndnull_out").filter(!$"overflow")
      .select("a_id", "b_id").as[(Long, Long)].collect().distinct.sorted.toSeq
    assert(pairs === Seq((1L, 3L)),
      "timestamped twins pair; null-ts rows are dropped, not fatal")
  }

  test("streaming perceptual dedup keys on what the image looks like") {
    val dir = Files.createTempDirectory("stream_ahash").toString
    import graft.operators.MediaCodecs
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val rgbA = Array.tabulate(192)(i =>
      if ((i / 3) % 8 >= 4) 200.toByte else 0.toByte)
    val rgbB = Array.tabulate(192)(i =>
      if ((i / 3) % 8 < 4) 200.toByte else 0.toByte)
    // b1: BMP of pattern A + an undecodable payload; b2: a PNG
    // RE-ENCODE of pattern A (byte-different, perceptually identical),
    // a BMP of pattern B, another undecodable payload
    Seq((1L, ts(0), MediaCodecs.encodeBmp(8, 8, rgbA)),
        (4L, ts(1), Array[Byte](1, 2, 3, 4, 5)))
      .toDF("doc_id", "ts", "payload").coalesce(1).write.parquet(s"$dir/b1")
    Seq((2L, ts(5), MediaCodecs.encodePng(8, 8, rgbA)),
        (3L, ts(6), MediaCodecs.encodeBmp(8, 8, rgbB)),
        (5L, ts(7), Array[Byte](9, 9, 9, 9, 9)))
      .toDF("doc_id", "ts", "payload").coalesce(1).write.parquet(s"$dir/b2")
    val schema = spark.read.parquet(s"$dir/b1").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/b*/")
    val q = CdcStream.ahashDedupStream(stream, "doc_id", "payload",
        "ts", "1 hour")
      .writeStream.outputMode("append")
      .format("memory").queryName("ahash_out").start()
    try q.processAllAvailable() finally q.stop()
    val rows = spark.table("ahash_out").select("doc_id", "decoded")
      .as[(Long, Boolean)].collect().toMap
    assert(rows.keySet === Set(1L, 3L, 4L, 5L),
      s"the PNG re-encode of pattern A must dedup against its BMP: $rows")
    // decodable rows carry their code; undecodable rows pass with the flag
    assert(rows(1L) && rows(3L) && !rows(4L) && !rows(5L))
  }

  test("streaming absorb sink grows the vector index; a replayed stream is a no-op") {
    val dir = Files.createTempDirectory("stream_absorb").toString
    val dim = 8
    def vec(cluster: Int, jitter: Int): Array[Float] = Array.tabulate(dim)(
      d => (if (cluster == 0) 10f else -10f) + ((jitter + d * 3) % 5) * 0.1f)
    val corpus = Seq((100L, vec(0, 1)), (101L, vec(1, 2)))
      .toDF("vec_id", "embedding")
    val idxDir = Files.createTempDirectory("stream_absorb_idx").toString
    graft.operators.DedupIndex.writeVectors(corpus, "vec_id", "embedding",
      idxDir, planes = 2, dim = dim)

    Seq((1L, vec(0, 3))).toDF("vec_id", "embedding")
      .coalesce(1).write.parquet(s"$dir/b1")
    Seq((2L, vec(1, 4)), (3L, vec(0, 2))).toDF("vec_id", "embedding")
      .coalesce(1).write.parquet(s"$dir/b2")
    val schema = spark.read.parquet(s"$dir/b1").schema
    def arrivals = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/b*/")
    val q = CdcStream.startVectorIndexAbsorb(arrivals, "vec_id",
      "embedding", idxDir,
      Files.createTempDirectory("stream_absorb_ck1").toString)
    try q.processAllAvailable() finally q.stop()

    val idx = graft.operators.DedupIndex.loadVectors(spark, idxDir)
    assert(idx.buckets.select("id").as[Long].collect().sorted.toSeq
      === Seq(1L, 2L, 3L, 100L, 101L))
    assert(idx.lists.count() === 5, "inverted lists must grow in step")

    // absorbed arrivals are immediately probe-visible
    val probe = graft.operators.Similarity.incrementalCosineNearDupsIndexed(
      Seq((10L, vec(0, 3))).toDF("vec_id", "embedding"),
      "vec_id", "embedding", idx, threshold = 0.9)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(probe.contains((1L, 10L)),
      s"absorbed vector 1 must be probe-visible, got $probe")

    // the worst replay case — same files, checkpoint LOST — re-lands as
    // a row-for-row no-op through the per-id freshness anti-join
    val q2 = CdcStream.startVectorIndexAbsorb(arrivals, "vec_id",
      "embedding", idxDir,
      Files.createTempDirectory("stream_absorb_ck2").toString)
    try q2.processAllAvailable() finally q2.stop()
    val after = graft.operators.DedupIndex.loadVectors(spark, idxDir)
    assert(after.buckets.count() === 5 && after.lists.count() === 5,
      "replayed micro-batches must not duplicate index rows")
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

  test("day-in-the-life: standing hybrid search over all three maintenance sinks stays batch-exact after every commit") {
    graft.plans.CachedPlans.clear()
    val dim = 8
    def vec(seed: Int): Array[Float] =
      Array.tabulate(dim)(d => (((seed * 7 + d * 3) % 11) - 5).toFloat)
    def doc(i: Long) = s"daily$i corpus shared hybrid words token$i tail$i"
    def docV2(i: Long) = doc(i) + " revised second edition"

    val chDir = Files.createTempDirectory("dil-changes").toString
    val qDir = Files.createTempDirectory("dil-queries").toString
    val outDir = Files.createTempDirectory("dil-out").toString
    val lexDir = Files.createTempDirectory("dil-lex").toString
    val vecDir = Files.createTempDirectory("dil-vec").toString
    val txtDir = Files.createTempDirectory("dil-txt").toString

    // seed corpus 1..8, all three indexes built from it
    var live = (1L to 8L).map(i => i -> doc(i)).toMap
    var liveVec = (1L to 8L).map(i => i -> vec(i.toInt)).toMap
    graft.operators.DedupIndex.writeLexical(
      live.toSeq.toDF("doc_id", "text"), "doc_id", "text", lexDir,
      termNgram = 2)
    graft.operators.DedupIndex.writeVectors(
      liveVec.toSeq.toDF("vec_id", "embedding"), "vec_id", "embedding",
      vecDir, planes = 2, dim = dim)
    graft.operators.DedupIndex.writeText(
      live.toSeq.toDF("doc_id", "text"), "doc_id", "text", txtDir)

    def writeChanges(name: String,
        rows: Seq[(String, Long, Long, String, Array[Float])]): Unit =
      rows.toDF(C.Op, "seq", "doc_id", "text", "embedding")
        .coalesce(1).write.parquet(s"$chDir/$name")
    def writeQueries(name: String,
        rows: Seq[(Long, String, Array[Float])]): Unit =
      rows.toDF("doc_id", "text", "embedding")
        .coalesce(1).write.parquet(s"$qDir/$name")
    // schema seeds so the file sources can start before day 1 arrives
    writeChanges("b0", Seq(("I", 0L, 1L, doc(1), vec(1))))
    writeQueries("q0", Seq((100L, doc(1), vec(1))))

    val chSchema = spark.read.parquet(s"$chDir/b0").schema
    val qSchema = spark.read.parquet(s"$qDir/q0").schema
    def changeStream = spark.readStream.schema(chSchema)
      .option("maxFilesPerTrigger", 1).parquet(s"$chDir/b*/")
    val maintTxt = CdcStream.startTextIndexMaintenance(changeStream,
      "doc_id", "text", txtDir,
      Files.createTempDirectory("dil-ck-txt").toString, col("seq"))
    val maintLex = CdcStream.startLexicalIndexMaintenance(changeStream,
      "doc_id", "text", lexDir,
      Files.createTempDirectory("dil-ck-lex").toString, col("seq"))
    val maintVec = CdcStream.startVectorIndexMaintenance(changeStream,
      "doc_id", "embedding", vecDir,
      Files.createTempDirectory("dil-ck-vec").toString, col("seq"))
    val search = CdcStream.startHybridSearch(
      spark.readStream.schema(qSchema).option("maxFilesPerTrigger", 1)
        .parquet(s"$qDir/q*/"),
      "doc_id", "text", "embedding", lexDir, vecDir, outDir,
      Files.createTempDirectory("dil-ck-q").toString, k = 3, legK = 3)

    // the staleness contract, asserted after EVERY commit: a search
    // micro-batch fired after the maintenance sinks commit must equal
    // the batch recompute on the live corpus — lexical leg recomputed
    // FROM SCRATCH on the live docs (the signed-delta contract), dense
    // leg the batch probe of the maintained index (the frozen-geometry
    // absorb contract), fused by the same integer-rank RRF.
    // a day's queries are written only AFTER its maintenance settles —
    // the standing search stream polls continuously, so writing them
    // earlier would race a search micro-batch against the commit
    def settleMaint(): Unit = {
      maintTxt.processAllAvailable(); maintLex.processAllAvailable()
      maintVec.processAllAvailable()
    }
    val lexW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("score").desc, col("doc_id"))
    def expectedFor(qs: Seq[(Long, String, Array[Float])])
        : Seq[(Long, Int, Long)] = {
      val queries = qs.toDF("doc_id", "text", "embedding")
      val lex = graft.operators.Retrieval
        .bm25TopK(live.toSeq.toDF("doc_id", "text"), queries,
          "doc_id", "text", "doc_id", "text", 3, 8, termNgram = 2)
        .filter(col("doc_id") =!= col("q_id"))
        .withColumn("rank", row_number().over(lexW))
        .select(col("q_id"), col("doc_id"), col("rank"))
      val den = graft.operators.Similarity.ivfSq8TopKIndexed(
          queries, "doc_id", "embedding",
          graft.operators.DedupIndex.loadVectors(spark, vecDir), 3,
          nprobe = 3)
        .select(col("q_id"), col("n_id").as("doc_id"), col("rank"))
      graft.operators.Retrieval.rrfFuse(Seq(lex, den), 3)
        .select("q_id", "rank", "doc_id")
        .as[(Long, Int, Long)].collect().toSeq.sortBy(r => (r._1, r._2))
    }
    def gotFor(qIds: Set[Long]): Seq[(Long, Int, Long)] =
      spark.read.parquet(outDir).filter(col("q_id").isin(qIds.toSeq: _*))
        .select("q_id", "rank", "doc_id")
        .as[(Long, Int, Long)].collect().toSeq.sortBy(r => (r._1, r._2))
    def assertDay(qs: Seq[(Long, String, Array[Float])]): Unit = {
      val exp = expectedFor(qs)
      val got = gotFor(qs.map(_._1).toSet)
      assert(got.nonEmpty, "day produced no search results")
      assert(got === exp, s"stream $got\nbatch $exp")
    }

    // day 1: INSERT 9, UPDATE 2 (text and embedding both move)
    writeChanges("b1", Seq(("I", 1L, 9L, doc(9), vec(9)),
      ("U", 2L, 2L, docV2(2), vec(52))))
    live += (9L -> doc(9)); live += (2L -> docV2(2))
    liveVec += (9L -> vec(9)); liveVec += (2L -> vec(52))
    val day1Q = Seq((101L, doc(9), vec(9)), (102L, docV2(2), vec(52)))
    settleMaint(); writeQueries("q1", day1Q)
    search.processAllAvailable(); assertDay(day1Q)

    // day 2: DELETE 3, INSERT 10, UPDATE 9 — a doc inserted by stream
    writeChanges("b2", Seq(("D", 3L, 3L, doc(3), vec(3)),
      ("I", 4L, 10L, doc(10), vec(10)),
      ("U", 5L, 9L, docV2(9), vec(59))))
    live -= 3L; live += (10L -> doc(10)); live += (9L -> docV2(9))
    liveVec -= 3L; liveVec += (10L -> vec(10)); liveVec += (9L -> vec(59))
    val day2Q = Seq((201L, doc(3), vec(3)), (202L, doc(10), vec(10)))
    settleMaint(); writeQueries("q2", day2Q)
    search.processAllAvailable(); assertDay(day2Q)
    assert(!gotFor(Set(201L, 202L)).exists(_._3 == 3L),
      "deleted doc 3 still retrieved")

    // day 3: DELETE the stream-inserted 9, re-INSERT 3 (resurrection)
    writeChanges("b3", Seq(("D", 6L, 9L, docV2(9), vec(59)),
      ("I", 7L, 3L, doc(3), vec(3))))
    live -= 9L; live += (3L -> doc(3))
    liveVec -= 9L; liveVec += (3L -> vec(3))
    val day3Q = Seq((301L, docV2(9), vec(59)), (302L, doc(3), vec(3)))
    settleMaint(); writeQueries("q3", day3Q)
    search.processAllAvailable(); assertDay(day3Q)
    val day3 = gotFor(Set(301L, 302L))
    assert(!day3.exists(_._3 == 9L), "retired doc 9 still retrieved")
    assert(day3.exists(_._3 == 3L), "resurrected doc 3 never retrieved")

    // the maintained vector index serves exactly the live id set
    val servedIds = graft.operators.DedupIndex.loadVectors(spark, vecDir)
      .buckets.select("id").distinct().as[Long].collect().toSet
    assert(servedIds === liveVec.keySet)

    // the third sink's text index: every probe modality equals the
    // live-corpus recompute after three days of mixed I/U/D
    val probeBatch = Seq(401L -> doc(3), 402L -> docV2(9))
      .toDF("doc_id", "text")
    val liveDf = live.toSeq.toDF("doc_id", "text")
    val exactIdx = graft.operators.Dedup.incrementalExactIndexed(
      probeBatch, "doc_id", "text",
      graft.operators.DedupIndex.loadText(spark, txtDir))
    val exactRe = graft.operators.Dedup.incrementalExact(
      probeBatch, liveDf, "doc_id", "text")
    assert(exactIdx.orderBy("doc_id").collect().toSeq ===
      exactRe.orderBy("doc_id").collect().toSeq)
    val simIdx = graft.operators.Dedup
      .incrementalSimHashNearDupsReportIndexed(probeBatch, "doc_id",
        "text", graft.operators.DedupIndex.loadText(spark, txtDir))
      .pairs.orderBy("a_id", "b_id").collect().toSeq
    val simRe = graft.operators.Dedup.incrementalSimHashNearDupsReport(
        probeBatch, liveDf, "doc_id", "text")
      .pairs.orderBy("a_id", "b_id").collect().toSeq
    assert(simIdx === simRe)

    maintTxt.stop(); maintLex.stop(); maintVec.stop(); search.stop()
  }
}
