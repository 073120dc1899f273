package graft

import graft.model.ListingMode
import graft.sources.CdcFileLister
import org.apache.hadoop.fs.Path

import java.nio.file.Files

/** Listing-mode contract (reference: src/s3/s3_operator.rs:131-315):
  * LOAD files always pass the date filter, CDC files honor the strict
  * (start, stop) mtime window, date directories before the start day are
  * pruned, and LOAD files order first regardless of lexicographic path
  * order.
  */
class CdcFileListerSpec extends SparkSpec {

  private def touch(dir: String, rel: String, mtime: Long): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val p = new Path(s"$dir/$rel")
    fs.mkdirs(p.getParent)
    fs.create(p).close()
    fs.setTimes(p, mtime, -1)
  }

  private def fixture(): String = {
    val dir = Files.createTempDirectory("lister").toString
    touch(dir, "LOAD00000001.parquet", 1000L)          // ancient LOAD
    touch(dir, "2024/01/01/a.parquet", 5000L)          // before start day dir
    touch(dir, "2024/01/02/b.parquet", 10000L)         // inside window
    touch(dir, "2024/01/02/c.parquet", 20000L)         // after stop
    touch(dir, "2024/01/03/d.parquet", 15000L)         // inside window
    dir
  }

  test("DateAware: strict mtime window, LOAD exempt") {
    val dir = fixture()
    val got = CdcFileLister.list(spark, dir,
      ListingMode.DateAware(6000L, Some(16000L)))
      .map(f => new Path(f.path).getName)
    // LOAD kept despite mtime 1000 < start 6000; c dropped (>= stop);
    // the 2024/01/01 directory isn't pruned here (start epoch is
    // 1970-01-01) but file 'a' fails the mtime window
    assert(got === Seq("LOAD00000001.parquet", "b.parquet", "d.parquet"))
  }

  test("DateAware prunes whole date directories before the start day") {
    val dir = fixture()
    // start = 2024-01-02T00:00:00Z → the 2024/01/01 dir must be skipped
    // even though its file would pass a pure-mtime check
    val startMs = java.time.Instant.parse("2024-01-02T00:00:00Z").toEpochMilli
    touch(dir, "2024/01/01/late_mtime.parquet", System.currentTimeMillis())
    val got = CdcFileLister.list(spark, dir,
      ListingMode.DateAware(startMs, None))
      .map(f => new Path(f.path).getName)
    assert(!got.contains("late_mtime.parquet"))
    assert(!got.contains("a.parquet"))
    assert(got.head === "LOAD00000001.parquet") // still exempt + first
  }

  test("FullLoadOnly lists only LOAD files; ordering is LOAD-first") {
    val dir = fixture()
    val fl = CdcFileLister.list(spark, dir, ListingMode.FullLoadOnly)
    assert(fl.map(f => new Path(f.path).getName) ===
      Seq("LOAD00000001.parquet"))
    // '2024/...' sorts before 'LOAD...' lexicographically — ordered()
    // must still put LOAD first (reference rotate_right semantics)
    val all = CdcFileLister.list(spark, dir, ListingMode.DateAware(0L, None))
    assert(all.head.isLoad && all.tail.forall(!_.isLoad))
  }

  test("AbsolutePath returns exactly the one file") {
    val dir = fixture()
    val got = CdcFileLister.list(spark, dir,
      ListingMode.AbsolutePath(s"$dir/2024/01/02/b.parquet"))
    assert(got.map(f => new Path(f.path).getName) === Seq("b.parquet"))
    assert(!got.head.isLoad)
  }
}
