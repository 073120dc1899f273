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
}
