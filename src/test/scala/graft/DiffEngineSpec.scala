package graft

import graft.operators.DiffEngine
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class DiffEngineSpec extends SparkSpec {
  import spark.implicits._

  private def sample = Seq(
    (1L, "a", Some(1.0)), (2L, "b", Some(2.0)), (3L, "c", None))
    .toDF("id", "name", "val")

  test("diff of a table with itself is all match") {
    val d = DiffEngine.rowDiff(sample, sample, Seq("id"))
    assert(d.filter(col(DiffEngine.StatusCol) =!= "match").count() === 0)
  }

  test("diff detects value change, missing and extra rows, NULL-safely") {
    val right = Seq(
      (1L, "a", Some(1.5)),   // val changed
      (3L, "c", None),        // identical incl. NULL — must MATCH (<=>)
      (4L, "d", Some(4.0)))   // extra
      .toDF("id", "name", "val")
    val d = DiffEngine.rowDiff(sample, right, Seq("id"))
      .select("id", DiffEngine.StatusCol, DiffEngine.MismatchCol).sort("id")
    val rows = d.collect().toSeq
    assert(rows === Seq(
      Row(1L, "mismatch", Seq("val")),
      Row(2L, "only_left", Seq()),
      Row(3L, "match", Seq()),
      Row(4L, "only_right", Seq())))
  }

  test("NULL vs value is a mismatch, not a match") {
    val right = Seq((3L, "c", Some(0.0))).toDF("id", "name", "val")
    val d = DiffEngine.rowDiff(sample.filter($"id" === 3), right, Seq("id"))
    assert(d.select(DiffEngine.StatusCol).head().getString(0) === "mismatch")
  }

  test("chunk digests equal iff content equal") {
    val a = spark.range(0, 5000).select($"id",
      concat(lit("p"), $"id").as("payload"))
    val b = a.withColumn("payload",
      when($"id" === 4321, lit("CHANGED")).otherwise($"payload"))
    val da = DiffEngine.chunkDigest(a, Seq("id"), 1000)
    val db = DiffEngine.chunkDigest(b, Seq("id"), 1000)
    val cmp = DiffEngine.compareDigests(da, db, "chunk_id")
    assert(cmp.filter(!$"ok").select("chunk_id").collect().toSeq ===
      Seq(Row(4L)))
    val self = DiffEngine.compareDigests(da,
      DiffEngine.chunkDigest(a, Seq("id"), 1000), "chunk_id")
    assert(self.filter(!$"ok").count() === 0)
  }

  test("chunk digest matches a naive single-partition global sort") {
    // exercises the offset lifting across many range partitions, including
    // duplicate PKs (tie-broken by row hash on both paths); 200k rows so
    // range-boundary SAMPLING is real — at this size, unpinned layouts
    // between the counts pre-job and the final job diverge (regression
    // test for the per-execution resampling bug)
    val a = spark.range(0, 200000)
      .select(($"id" % 997).as("k"), concat(lit("p"), $"id" % 3).as("payload"))
    val fast = DiffEngine.chunkDigest(a, Seq("k"), 300)
    val w = org.apache.spark.sql.expressions.Window.orderBy($"k", $"_rh")
    val naive = a
      .withColumn("_rh", DiffEngine.rowHash(a, a.columns.sorted.toSeq))
      .withColumn("_rn", row_number().over(w))
      .withColumn("chunk_id", (($"_rn" - 1) / 300).cast("long"))
      .groupBy($"chunk_id")
      .agg(count(lit(1)).as("n_rows"),
        md5(array_join(transform(
          array_sort(collect_list(struct($"_rn", $"_rh"))),
          s => s.getField("_rh")), "|")).as("digest"))
    val cmp = DiffEngine.compareDigests(fast, naive, "chunk_id")
    assert(cmp.filter(!$"ok").count() === 0)
    assert(fast.count() === math.ceil(200000.0 / 300).toLong)
  }

  test("chunk digest rejects non-positive chunk size") {
    intercept[IllegalArgumentException] {
      DiffEngine.chunkDigest(sample, Seq("id"), 0)
    }
  }

  test("native dot product is bit-identical to the portable fold") {
    import graft.functions.VectorFunctions
    val vecs = Seq(
      (1L, Array(0.1f, -2.5f, 3.25f, 0.7f), Array(1.5f, 0.25f, -0.125f, 2.0f)),
      (2L, Array(1e-7f, 1e7f, -1e-7f, 1e7f), Array(1e7f, 1e-7f, 1e7f, 1e-7f)))
      .toDF("id", "a", "b")
    val r = vecs.select(
      VectorFunctions.dot($"a", $"b").as("fast"),
      VectorFunctions.dotFold($"a", $"b").as("fold")).collect()
    r.foreach { row =>
      assert(java.lang.Double.doubleToLongBits(row.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(row.getDouble(1)))
    }
    // mismatched lengths: both forms must agree on NULL
    val mism = Seq((Array(1f, 2f), Array(3f)))
      .toDF("a", "b")
      .select(VectorFunctions.dot($"a", $"b").as("fast"),
        VectorFunctions.dotFold($"a", $"b").as("fold"))
      .head()
    assert(mism.isNullAt(0) && mism.isNullAt(1))
  }

  test("bucket digests localize a difference to one bucket") {
    val a = spark.range(0, 5000).select($"id",
      concat(lit("p"), $"id").as("payload"))
    val b = a.withColumn("payload",
      when($"id" === 1234, lit("CHANGED")).otherwise($"payload"))
    val cmp = DiffEngine.compareDigests(
      DiffEngine.bucketDigest(a, Seq("id")),
      DiffEngine.bucketDigest(b, Seq("id")), "bucket")
    assert(cmp.filter(!$"ok").count() === 1)
  }

  test("re-digesting a mutated parquet side is fresh without an explicit clear") {
    // the chunkDigest cache is snapshot-keyed (listing+length+mtime):
    // a validate that re-reads a file-backed side after mutation must
    // see current contents with NO CachedPlans.clear() at the boundary
    graft.plans.CachedPlans.clear() // isolate from other suites only
    val dir = java.nio.file.Files
      .createTempDirectory("graft-digest-fresh").toString
    spark.range(0, 100).select($"id", concat(lit("v"), $"id").as("payload"))
      .write.mode("overwrite").parquet(dir)
    val before = DiffEngine.chunkDigest(
        spark.read.parquet(dir), Seq("id"), 40)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    // mutate IN PLACE (overwrite the same path), then re-validate —
    // deliberately no clear() here
    spark.range(0, 100).select($"id",
        concat(lit("CHANGED"), $"id").as("payload"))
      .write.mode("overwrite").parquet(dir)
    val after = DiffEngine.chunkDigest(
        spark.read.parquet(dir), Seq("id"), 40)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(before.keySet === after.keySet)
    assert(before.keySet.forall(k => before(k) != after(k)),
      "every chunk digest must reflect the mutated contents")
    graft.plans.CachedPlans.clear()
  }
}
