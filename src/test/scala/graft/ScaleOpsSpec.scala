package graft

import graft.operators.ScaleOps
import org.apache.spark.sql.functions._

class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join with no shuffle exchange") {
    val a = spark.range(0, 10000).select($"id",
      concat(lit("a"), $"id").as("va"))
    val b = spark.range(0, 10000).select($"id",
      concat(lit("b"), $"id").as("vb"))
    ScaleOps.writeBucketed(a, "bucketed_a", Seq("id"), 8)
    ScaleOps.writeBucketed(b, "bucketed_b", Seq("id"), 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a non-broadcast join so the bucket layout is what avoids
      // the shuffle
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bucketed_a")
        .join(spark.table("bucketed_b"), Seq("id"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() === 10000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bucketed_a")
      spark.sql("DROP TABLE IF EXISTS bucketed_b")
    }
  }

  /** Register a directory written by [[ScaleOps.writeBucketedAt]] as a
    * bucketed external table, the way DedupIndex.component re-attaches
    * in a fresh session — schema inferred from the parquet footers,
    * bucket spec re-declared from the write parameters.
    */
  private def attachBucketed(table: String, dir: String, cols: Seq[String],
      numBuckets: Int): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val ddl = spark.read.parquet(dir).schema.toDDL
    val cs = cols.mkString(", ")
    spark.sql(
      s"""CREATE TABLE $table ($ddl) USING parquet
         |CLUSTERED BY ($cs) SORTED BY ($cs) INTO $numBuckets BUCKETS
         |LOCATION '$dir'""".stripMargin)
  }

  private def scratchTables(): Set[String] =
    spark.sql("SHOW TABLES").collect()
      .map(_.getAs[String]("tableName"))
      .filter(_.startsWith("graft_scratch_")).toSet

  test("writeBucketedAt: pooled-scratch writes are valid bucketed " +
      "components and pay no per-write DDL") {
    val root = java.nio.file.Files.createTempDirectory("graft-wba").toString
    // column names unique to this test: the scratch pool is shared
    // session-wide, so the assertions below count the DELTA of tables
    // created for THESE signatures, not a global total
    val a = spark.range(0, 5000).select($"id",
      concat(lit("a"), $"id").as("wba_va"))
    val b = spark.range(0, 5000).select($"id",
      concat(lit("b"), $"id").as("wba_vb"))
    val before = scratchTables()
    ScaleOps.writeBucketedAt(a, s"$root/a", Seq("id"), 8)
    val afterFirst = scratchTables()
    ScaleOps.writeBucketedAt(b, s"$root/b", Seq("id"), 8)
    // second write of a DIFFERENT schema signature creates its own
    // scratch table; a REPEAT of the same signature must reuse
    ScaleOps.writeBucketedAt(
      a.withColumn("wba_va", concat($"wba_va", lit("x"))), s"$root/a2",
      Seq("id"), 8)
    val afterRepeat = scratchTables()
    assert((afterRepeat -- before).size === 2,
      s"expected exactly 2 new pooled scratch tables (one per " +
        s"signature), got ${afterRepeat -- before}")
    assert(afterFirst.subsetOf(afterRepeat))
    // files are parseable bucket members: a bucketed-table read works
    // and a bucketed join needs NO exchange on either side
    attachBucketed("wba_a", s"$root/a", Seq("id"), 8)
    attachBucketed("wba_b", s"$root/b", Seq("id"), 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("wba_a").join(spark.table("wba_b"), Seq("id"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"moved bucket files lost their layout:\n${plan.take(3000)}")
      assert(joined.count() === 5000)
      assert(spark.table("wba_a").select("wba_va").as[String].collect().toSet
        === (0 until 5000).map(i => s"a$i").toSet)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS wba_a")
      spark.sql("DROP TABLE IF EXISTS wba_b")
    }
    // ≤ one file per bucket even though shuffle.partitions (4) is far
    // below numBuckets — the capped exchange still co-locates each
    // bucket in one task and the bucketed writer splits within the task
    val files = new java.io.File(s"$root/a").listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("_")
        && !f.getName.startsWith("."))
    assert(files.length <= 8, s"file explosion: ${files.length} files")
    assert(files.forall(_.getName.matches(""".*_(\d+)(\..*)?$""")),
      s"unparseable bucket file names: ${files.map(_.getName).toSeq}")
  }

  test("writeBucketedAt: ≤1 file per bucket when shuffle.partitions " +
      "does NOT divide numBuckets") {
    // bucket id is hash pmod numBuckets, task id is hash pmod p: with
    // p=6 over 8 buckets (gcd 2) a naive cap would spread each bucket
    // over 3 tasks (up to 24 files); the divisor rounding must pick
    // p=4 and keep the ≤1-file-per-bucket bound
    val root = java.nio.file.Files.createTempDirectory("graft-wband")
      .toString
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "6")
      val df = spark.range(0, 5000).select($"id",
        concat(lit("n"), $"id").as("wband_v"))
      ScaleOps.writeBucketedAt(df, s"$root/d", Seq("id"), 8)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    val files = new java.io.File(s"$root/d").listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("_")
        && !f.getName.startsWith("."))
    assert(files.length <= 8,
      s"file explosion with non-divisor partition count: " +
        s"${files.length} files")
    assert(spark.read.parquet(s"$root/d").count() === 5000)
  }

  test("writeBucketedAt: overwrite replaces, empty write stays readable") {
    val root = java.nio.file.Files.createTempDirectory("graft-wbae").toString
    val a = spark.range(0, 100).select($"id",
      concat(lit("v"), $"id").as("va"))
    ScaleOps.writeBucketedAt(a, s"$root/c", Seq("id"), 8)
    val a2 = spark.range(100, 150).select($"id",
      concat(lit("w"), $"id").as("va"))
    ScaleOps.writeBucketedAt(a2, s"$root/c", Seq("id"), 8)
    assert(spark.read.parquet(s"$root/c").count() === 50)
    // empty result: the component keeps a schema-readable (and
    // bucket-registerable) footprint — fresh-session re-attach depends
    // on inferring the schema from the directory
    ScaleOps.writeBucketedAt(a.limit(0), s"$root/empty", Seq("id"), 8)
    val empty = spark.read.parquet(s"$root/empty")
    assert(empty.count() === 0)
    assert(empty.schema.fieldNames.toSeq === Seq("id", "va"))
    attachBucketed("wba_empty", s"$root/empty", Seq("id"), 8)
    try assert(spark.table("wba_empty").count() === 0)
    finally spark.sql("DROP TABLE IF EXISTS wba_empty")
  }

  test("writeBucketedUnionAt: one insert fans same-schema parts to their dirs") {
    val root = java.nio.file.Files.createTempDirectory("graft-wbu").toString
    val a = spark.range(0, 500).select($"id",
      concat(lit("a"), $"id").as("wbu_v"))
    val b = spark.range(500, 800).select($"id",
      concat(lit("b"), $"id").as("wbu_v"))
    val empty = a.limit(0)
    ScaleOps.writeBucketedUnionAt(
      Seq(a -> s"$root/pa", b -> s"$root/pb", empty -> s"$root/pe"),
      Seq("id"), 8)
    // each destination holds exactly its part's rows, nothing tagged
    val ra = spark.read.parquet(s"$root/pa")
    assert(ra.schema.fieldNames.toSeq === Seq("id", "wbu_v"),
      "partition tag leaked into the data files")
    assert(ra.count() === 500)
    assert(spark.read.parquet(s"$root/pb").count() === 300)
    assert(ra.select("wbu_v").as[String].collect().forall(_.startsWith("a")))
    // staged-append semantics: an empty part stages ZERO files
    val pe = new java.io.File(s"$root/pe")
    assert(!pe.exists() || pe.listFiles().forall(f =>
      f.getName.startsWith("_") || f.getName.startsWith(".")),
      "empty part must stage no data files")
    // bucket layout holds per destination: ≤1 file per bucket,
    // bucket-parseable names, and a bucketed attach joins exchange-free
    Seq("pa", "pb").foreach { d =>
      val files = new java.io.File(s"$root/$d").listFiles()
        .filter(f => f.isFile && !f.getName.startsWith("_")
          && !f.getName.startsWith("."))
      assert(files.length <= 8, s"$d file explosion: ${files.length}")
      assert(files.forall(_.getName.matches(""".*_(\d+)(\..*)?$""")),
        s"$d unparseable bucket names: ${files.map(_.getName).toSeq}")
    }
    attachBucketed("wbu_a", s"$root/pa", Seq("id"), 8)
    attachBucketed("wbu_b", s"$root/pb", Seq("id"), 8)
    try {
      val j = spark.table("wbu_a").join(spark.table("wbu_b"), "id")
      val exchanges = j.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(exchanges.isEmpty,
        "bucketed join over union-written components must not exchange")
    } finally Seq("wbu_a", "wbu_b").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS $t"))
    // unlike shapes are refused loudly, not silently superset-unioned
    val odd = spark.range(0, 10).select($"id", $"id".as("other"))
    intercept[IllegalArgumentException] {
      ScaleOps.writeBucketedUnionAt(
        Seq(a -> s"$root/x1", odd -> s"$root/x2"), Seq("id"), 8)
    }
  }

  test("writeBucketedUnionAt under dynamic partitionOverwriteMode clears stale pooled partitions") {
    val root = java.nio.file.Files.createTempDirectory("graft-wbud").toString
    // dynamic overwrite only replaces partitions PRESENT in the incoming
    // batch — without the explicit clear, a pooled scratch table reused
    // by a NARROWER union (or one with an empty part) would republish the
    // previous borrow's __graft_part rows into the new component
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      val a = spark.range(0, 200).select($"id",
        concat(lit("a"), $"id").as("dyn_v"))
      val b = spark.range(200, 300).select($"id",
        concat(lit("b"), $"id").as("dyn_v"))
      val c = spark.range(300, 350).select($"id",
        concat(lit("c"), $"id").as("dyn_v"))
      ScaleOps.writeBucketedUnionAt(
        Seq(a -> s"$root/p0", b -> s"$root/p1", c -> s"$root/p2"),
        Seq("id"), 8)
      assert(spark.read.parquet(s"$root/p1").count() === 100)
      // simulate a prior borrow that FAILED between its insert and its
      // move: the table went back to the pool with files still staged
      // in a partition dir (the normal path leaves dirs empty — every
      // move drains them — so this is the window dynamic mode exposes)
      val scratchTbls = spark.catalog.listTables().collect()
        .map(_.name).filter(_.startsWith("graft_scratch_"))
        .filter(t => spark.table(t).schema.fieldNames.toSeq ===
          Seq("id", "dyn_v", "__graft_part"))
      assert(scratchTbls.nonEmpty, "pooled partitioned scratch not found")
      scratchTbls.foreach(t => spark.sql(
        s"INSERT INTO $t PARTITION(__graft_part=1) " +
          "SELECT id, concat('stale', id) FROM range(100)"))
      // second borrow of the SAME pooled signature: two parts, the
      // second empty — part index 1 must NOT publish the leftover rows
      val d = spark.range(400, 450).select($"id",
        concat(lit("d"), $"id").as("dyn_v"))
      ScaleOps.writeBucketedUnionAt(
        Seq(d -> s"$root/q0", a.limit(0) -> s"$root/q1"), Seq("id"), 8)
      val q0 = spark.read.parquet(s"$root/q0")
      assert(q0.count() === 50)
      assert(q0.select("dyn_v").as[String].collect()
        .forall(_.startsWith("d")))
      val q1 = new java.io.File(s"$root/q1")
      assert(!q1.exists() || q1.listFiles().forall(f =>
        f.getName.startsWith("_") || f.getName.startsWith(".")),
        "stale pooled partition files republished into the empty part")
    } finally
      spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
  }

  test("writeBucketedAt recovers when a pooled scratch table was dropped externally") {
    val root = java.nio.file.Files.createTempDirectory("graft-wbad").toString
    val a = spark.range(0, 60).select($"id",
      concat(lit("x"), $"id").as("va"))
    // first write creates and pools the scratch table for this signature
    ScaleOps.writeBucketedAt(a, s"$root/one", Seq("id"), 8)
    // drop EVERY pooled table of this JVM behind the pool's back — the
    // write path no longer pre-checks existence per borrow (that
    // round-trip serialized concurrent staged writes on the global
    // metastore lock), so the recovery now lives in the insert itself
    spark.catalog.listTables().collect()
      .filter(_.name.startsWith("graft_scratch_"))
      .foreach(t => spark.sql(s"DROP TABLE ${t.name}"))
    ScaleOps.writeBucketedAt(a, s"$root/two", Seq("id"), 8)
    assert(spark.read.parquet(s"$root/two").count() === 60)
    // and the freshly recreated table is pooled again: a third write
    // succeeds without external interference
    ScaleOps.writeBucketedAt(a, s"$root/three", Seq("id"), 8)
    assert(spark.read.parquet(s"$root/three").count() === 60)
  }

  test("salted join equals plain join (incl. skewed hot key)") {
    // 90% of left rows share one hot key
    val left = spark.range(0, 20000).select(
      when($"id" % 10 < 9, 7L).otherwise($"id").as("k"),
      $"id".as("lv"))
    val right = (0L to 30L).map(k => (k, s"r$k")).toDF("k", "rv")
    val plain = left.join(right, Seq("k"))
      .select("k", "lv", "rv").collect().toSet
    val salted = ScaleOps.saltedJoin(left, right, Seq("k"), saltFactor = 8)
      .select("k", "lv", "rv").collect().toSet
    assert(salted === plain)
    assert(plain.nonEmpty)
  }

  test("skew report surfaces the hot key with its share") {
    val df = spark.range(0, 1000).select(
      when($"id" < 900, 42L).otherwise($"id").as("k"))
    val top = ScaleOps.skewReport(df, Seq("k"), 1).collect().head
    assert(top.getLong(0) === 42L)
    assert(top.getLong(1) === 900L)
    assert(math.abs(top.getDouble(2) - 0.9) < 1e-9)
  }

  test("balanced repartitions tiny files bin-packed into few splits") {
    val dir = java.nio.file.Files.createTempDirectory("graft-balanced")
      .toString
    spark.range(0, 8).repartition(8)
      .write.mode("overwrite").parquet(dir)
    val prevMax = spark.conf.get("spark.sql.files.maxPartitionBytes")
    val prevCost = spark.conf.get("spark.sql.files.openCostInBytes")
    val prevMin = spark.conf.getOption("spark.sql.files.minPartitionNum")
    try {
      // bin-pack all files into one split: a raw file count would call
      // this "parallel enough" while the planned scan is 1 partition
      spark.conf.set("spark.sql.files.maxPartitionBytes", "1g")
      spark.conf.set("spark.sql.files.openCostInBytes", "0")
      spark.conf.set("spark.sql.files.minPartitionNum", "1")
      val df = spark.read.parquet(dir)
      assert(df.inputFiles.length >= 4, "fixture needs many tiny files")
      assert(df.rdd.getNumPartitions === 1, "fixture must bin-pack")
      val got = graft.operators.Dedup.balanced(df)
      assert(got.rdd.getNumPartitions ===
        spark.sparkContext.defaultParallelism)
      assert(got.count() === 8)
    } finally {
      spark.conf.set("spark.sql.files.maxPartitionBytes", prevMax)
      spark.conf.set("spark.sql.files.openCostInBytes", prevCost)
      prevMin match {
        case Some(v) => spark.conf.set("spark.sql.files.minPartitionNum", v)
        case None => spark.conf.unset("spark.sql.files.minPartitionNum")
      }
    }
  }

  test("skew bench probes: salted and split joins agree with plain") {
    val sf = "/root/testdata/sf0.001"
    val plain = graft.queries.CdcQueries.cdcSkewJoinPlain(spark, sf)
      .collect()
    val salted = graft.queries.CdcQueries.cdcSkewJoinSalted(spark, sf)
      .collect()
    val split = graft.queries.CdcQueries.cdcSkewJoinSplit(spark, sf)
      .collect()
    assert(plain.length === 1 && salted.length === 1 && split.length === 1)
    assert(plain.head === salted.head,
      s"plain ${plain.head} != salted ${salted.head}")
    assert(plain.head === split.head,
      s"plain ${plain.head} != split ${split.head}")
    assert(plain.head.getAs[Long]("n_events") > 0L)
  }

  test("skewSplitJoin equals the plain join and broadcasts the hot side") {
    import spark.implicits._
    val left = ((1 to 500).map(_ => (1L, "hot")) ++
      (2L to 80L).map(k => (k, s"cold$k"))).toDF("k", "lv")
    val right = (1L to 100L).map(k => (k, s"r$k")).toDF("k", "rv")
    val hot = Seq(1L).toDF("k")
    val got = graft.operators.ScaleOps
      .skewSplitJoin(left, right, Seq("k"), hot)
    val want = left.join(right, Seq("k"))
    assert(got.count() === want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }
}
