package graft

import graft.model.{CdcColumns => C, ListingMode}
import graft.operators.ChangeLogReducer
import graft.sources.{CdcFileLister, ChangeLogReader}
import org.apache.spark.sql.{DataFrame, Row}

import java.nio.file.Files

/** End-to-end CDC replay over DMS-shaped parquet fixtures written to a
  * temp dir (FIXTURES.md §A): LOAD file bulk state + CDC files replayed
  * last-event-wins per PK, including the edge cases the reference's
  * semantics pin down (delete-then-reinsert, composite PK, update
  * arriving in an earlier file than its insert, NULLs in non-key
  * columns).
  */
class CdcReplaySpec extends SparkSpec {
  import spark.implicits._

  private def writeFixture(dir: String, name: String,
      rows: Seq[(String, String, Long, Int, String, Option[Double])]): Unit = {
    val df = rows.toDF(C.Op, C.IngestTs, "id", "seq_part", "payload", "amount")
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/_tmp_$name")
    // rename part file to a deterministic name (LOAD... or date-sorted)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val src = new org.apache.hadoop.fs.Path(s"$dir/_tmp_$name")
    val part = fs.listStatus(src).map(_.getPath)
      .find(_.getName.endsWith(".parquet")).get
    fs.rename(part, new org.apache.hadoop.fs.Path(s"$dir/$name"))
    fs.delete(src, true)
  }

  private def replay(dir: String, pks: Seq[String]): DataFrame = {
    val files = CdcFileLister.list(spark, dir, ListingMode.DateAware(0L, None))
    val log = ChangeLogReader.read(spark, files)
    ChangeLogReducer.reduce(log, pks, ChangeLogReader.eventSeq(log))
  }

  test("LOAD + CDC replay: last event wins, trailing delete removes key") {
    val dir = Files.createTempDirectory("cdc1").toString
    writeFixture(dir, "LOAD00000001.parquet", Seq(
      ("I", "2024-01-01T00:00:00Z", 1L, 0, "a", Some(1.0)),
      ("I", "2024-01-01T00:00:00Z", 2L, 0, "b", Some(2.0)),
      ("I", "2024-01-01T00:00:00Z", 3L, 0, "c", None)))
    writeFixture(dir, "20240102-0001.parquet", Seq(
      ("U", "2024-01-02T00:00:00Z", 1L, 0, "a2", Some(1.5)),
      ("D", "2024-01-02T00:01:00Z", 2L, 0, "b", Some(2.0))))
    writeFixture(dir, "20240103-0001.parquet", Seq(
      ("U", "2024-01-03T00:00:00Z", 1L, 0, "a3", Some(1.75)),
      ("I", "2024-01-03T00:01:00Z", 4L, 0, "d", Some(4.0))))
    val state = replay(dir, Seq("id"))
      .select("id", "payload", "amount").sort("id")
    assert(state.collect().toSeq === Seq(
      Row(1L, "a3", 1.75), Row(3L, "c", null), Row(4L, "d", 4.0)))
  }

  test("delete-then-reinsert resurrects the key with the new payload") {
    val dir = Files.createTempDirectory("cdc2").toString
    writeFixture(dir, "LOAD00000001.parquet", Seq(
      ("I", "2024-01-01T00:00:00Z", 1L, 0, "orig", Some(1.0))))
    writeFixture(dir, "20240102-0001.parquet", Seq(
      ("D", "2024-01-02T00:00:00Z", 1L, 0, "orig", Some(1.0)),
      ("I", "2024-01-02T00:01:00Z", 1L, 0, "reborn", Some(9.0))))
    val state = replay(dir, Seq("id")).select("id", "payload").sort("id")
    assert(state.collect().toSeq === Seq(Row(1L, "reborn")))
  }

  test("composite primary key reduces per full key, never concatenated") {
    val dir = Files.createTempDirectory("cdc3").toString
    // keys (1,10) and (11,0) would collide if pk were string-concatenated
    writeFixture(dir, "LOAD00000001.parquet", Seq(
      ("I", "2024-01-01T00:00:00Z", 1L, 10, "k1", Some(1.0)),
      ("I", "2024-01-01T00:00:00Z", 11L, 0, "k2", Some(2.0))))
    writeFixture(dir, "20240102-0001.parquet", Seq(
      ("D", "2024-01-02T00:00:00Z", 1L, 10, "k1", Some(1.0))))
    val state = replay(dir, Seq("id", "seq_part"))
      .select("id", "seq_part", "payload").sort("id")
    assert(state.collect().toSeq === Seq(Row(11L, 0, "k2")))
  }

  test("LOAD file ordering beats lexicographic file order") {
    val dir = Files.createTempDirectory("cdc4").toString
    // "20240101-..." sorts BEFORE "LOAD..." lexicographically, but the
    // LOAD file must be applied first (reference rotate_right semantics)
    writeFixture(dir, "20240101-0001.parquet", Seq(
      ("U", "2024-01-01T00:00:00Z", 1L, 0, "updated", Some(2.0))))
    writeFixture(dir, "LOAD00000001.parquet", Seq(
      ("I", "2023-12-31T00:00:00Z", 1L, 0, "loaded", Some(1.0))))
    val state = replay(dir, Seq("id")).select("id", "payload")
    assert(state.collect().toSeq === Seq(Row(1L, "updated")))
  }

  test("window-based reducer agrees with max_by reducer") {
    val dir = Files.createTempDirectory("cdc5").toString
    writeFixture(dir, "LOAD00000001.parquet",
      (1L to 50L).map(i => ("I", "2024-01-01T00:00:00Z", i, 0, s"v$i", Some(i.toDouble))))
    writeFixture(dir, "20240102-0001.parquet",
      (1L to 50L).filter(_ % 3 == 0).map(i =>
        ("D", "2024-01-02T00:00:00Z", i, 0, s"v$i", Some(i.toDouble))) ++
      (1L to 50L).filter(_ % 7 == 0).map(i =>
        ("U", "2024-01-02T00:01:00Z", i, 0, s"u$i", Some(i * 2.0))))
    val files = CdcFileLister.list(spark, dir, ListingMode.DateAware(0L, None))
    val log = ChangeLogReader.read(spark, files)
    val a = ChangeLogReducer.reduce(log, Seq("id"),
      ChangeLogReader.eventSeq(log)).sort("id")
    val b = ChangeLogReducer.reduceViaMaxBy(log, Seq("id"),
      ChangeLogReader.eventSeq(log))
      .select(a.columns.toIndexedSeq.map(org.apache.spark.sql.functions.col): _*)
      .sort("id")
    assert(a.collect().toSeq === b.collect().toSeq)
  }
}
