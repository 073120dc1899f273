package graft

import graft.cdc.{CdcConfig, SnapshotJob, ValidateJob}
import graft.model.{CdcColumns => C, ListingMode, TableSpec}
import graft.sources.{CdcFileLister, ChangeLogReader}
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** t1 end-to-end smoke (SURVEY.md §5.2.4 / BASELINE.md): synthesize a
  * LOAD+CDC file set from sf0.001 lineitem, replay, diff against the
  * independently-derived expected state (zero differences), then mutate
  * one row and assert exactly one reported difference.
  */
class T1SmokeSpec extends SparkSpec {

  private val Sf = "/root/testdata/sf0.001"

  test("lineitem LOAD+CDC replay diffs clean; one mutation = one diff") {
    val base = Files.createTempDirectory("t1").toString
    val tdir = s"$base/db/public/lineitem"
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    def place(tmp: String, dst: String): Unit = {
      val p = fs.listStatus(new org.apache.hadoop.fs.Path(tmp))
        .map(_.getPath).find(_.getName.endsWith(".parquet")).get
      fs.rename(p, new org.apache.hadoop.fs.Path(dst))
      fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
    }

    // PK for the replay: l_orderkey alone (unique per reduced state);
    // dedupe the source to one row per orderkey first (the raw table has
    // duplicate (orderkey, linenumber) pairs — FIXTURES.md caveat)
    val li = spark.read.parquet(s"$Sf/lineitem.parquet")
      .groupBy(col("l_orderkey"))
      .agg(max_by(struct(col("*")), struct(col("l_linenumber"), col("l_partkey"))).as("r"))
      .select(col("r.*"))

    // LOAD file: 90% of keys as inserts
    val loadRows = li.filter(col("l_orderkey") % 10 =!= 0)
      .withColumn(C.Op, lit("I"))
      .withColumn(C.IngestTs, lit("2024-01-01T00:00:00Z"))
    loadRows.coalesce(1).write.parquet(s"$tdir/_w1")
    place(s"$tdir/_w1", s"$tdir/LOAD00000001.parquet")

    // CDC file: insert the held-out 10%, update keys %7==0, delete %13==0
    val inserts = li.filter(col("l_orderkey") % 10 === 0)
      .withColumn(C.Op, lit("I"))
    val updates = li.filter(col("l_orderkey") % 7 === 0)
      .withColumn("l_quantity", col("l_quantity") + 100)
      .withColumn(C.Op, lit("U"))
    val deletes = li.filter(col("l_orderkey") % 13 === 0)
      .withColumn(C.Op, lit("D"))
    inserts.unionByName(updates).unionByName(deletes)
      .withColumn(C.IngestTs, lit("2024-01-02T00:00:00Z"))
      .coalesce(1).write.parquet(s"$tdir/_w2")
    place(s"$tdir/_w2", s"$tdir/2024/01/02/20240102-001.parquet")

    // replay through the job layer
    val cfg = CdcConfig(s"$base/db/public", "public",
      mode = ListingMode.DateAware(0L, None))
    val spec = TableSpec("lineitem", tdir, Seq("l_orderkey"))
    val state = SnapshotJob.reconstructTable(spark, cfg, spec)

    // expected state derived independently (plain DataFrame algebra):
    // all keys except %13==0; quantity +100 where %7==0 (CDC order puts
    // updates after inserts, deletes last)
    val expected = li.filter(col("l_orderkey") % 13 =!= 0)
      .withColumn("l_quantity",
        when(col("l_orderkey") % 7 === 0, col("l_quantity") + 100)
          .otherwise(col("l_quantity")))

    val rep = ValidateJob.validateTable(expected, state, spec)
    assert(rep.ok, s"replay diverged: $rep")
    assert(rep.matched === expected.count())

    // mutate exactly one row → exactly one difference
    val firstKey = expected.agg(min(col("l_orderkey"))).head().getLong(0)
    val mutated = state.withColumn("l_tax",
      when(col("l_orderkey") === firstKey, lit(9.99))
        .otherwise(col("l_tax")))
    val rep2 = ValidateJob.validateTable(expected, mutated, spec)
    assert(rep2.mismatched === 1 && rep2.onlyLeft === 0 && rep2.onlyRight === 0)
  }

  test("schema drift across CDC files is absorbed (new column → NULLs)") {
    val dir = Files.createTempDirectory("drift").toString
    import spark.implicits._
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    def place(tmp: String, dst: String): Unit = {
      val p = fs.listStatus(new org.apache.hadoop.fs.Path(tmp))
        .map(_.getPath).find(_.getName.endsWith(".parquet")).get
      fs.rename(p, new org.apache.hadoop.fs.Path(dst))
      fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
    }
    Seq(("I", "t0", 1L, "a"), ("I", "t0", 2L, "b"))
      .toDF(C.Op, C.IngestTs, "id", "v")
      .coalesce(1).write.parquet(s"$dir/_w1")
    place(s"$dir/_w1", s"$dir/LOAD00000001.parquet")
    // later file carries an ADDED column the LOAD file lacks
    Seq(("U", "t1", 2L, "b2", "extra"))
      .toDF(C.Op, C.IngestTs, "id", "v", "new_col")
      .coalesce(1).write.parquet(s"$dir/_w2")
    place(s"$dir/_w2", s"$dir/20240102-001.parquet")

    val files = CdcFileLister.list(spark, dir, ListingMode.DateAware(0, None))
    val log = ChangeLogReader.read(spark, files)
    val state = graft.operators.ChangeLogReducer
      .reduce(log, Seq("id"), ChangeLogReader.eventSeq(log))
      .sort("id")
    val rows = state.select("id", "v", "new_col").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq ===
      Seq((1L, "a", null), (2L, "b2", "extra")))
  }
}
