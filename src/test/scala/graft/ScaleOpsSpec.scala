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
