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

  /** In-memory ListObjectsV2: ascending keys strictly after the cursor,
    * page-size-capped, call-counted — drives the protocol contract the
    * Hadoop path can't (truncation loops, cursor pruning).
    */
  private final class FakePager(keys: Seq[(String, Long)])
      extends graft.sources.PagedLister.PageLister {
    var calls = 0
    var smallestCursorSeen: Option[String] = None
    def page(prefix: String, startAfter: String, pageSize: Int)
        : Seq[graft.sources.PagedLister.PageEntry] = {
      calls += 1
      if (smallestCursorSeen.forall(startAfter < _))
        smallestCursorSeen = Some(startAfter)
      keys.sortBy(_._1)
        .filter { case (k, _) => k.startsWith(prefix) && k > startAfter }
        .take(pageSize)
        .map { case (k, m) =>
          graft.sources.PagedLister.PageEntry(k, m, 1L) }
    }
  }

  test("paged listing drains truncated pages through the cursor loop") {
    val keys = (1 to 10).map(i => (f"t/2024/01/02/f$i%02d.parquet", 9000L))
    val pager = new FakePager(keys)
    val got = graft.sources.PagedLister.listAll(pager, "t/", pageSize = 3)
    assert(got.map(_.key) === keys.map(_._1).sorted)
    // 10 keys at 3/page: three full pages signal truncation, the fourth
    // (one key) ends the loop — exactly 4 RPCs
    assert(pager.calls === 4)
  }

  test("paged date-aware listing: cursor prunes, LOAD exempt, window applies") {
    // one timestamp drives BOTH the day cursor and the mtime window,
    // like the reference's start_date
    val startMs = java.time.Instant.parse("2024-01-02T00:00:00Z")
      .toEpochMilli
    val keys = Seq(
      ("t/LOAD00000001.parquet", 1000L), // ancient LOAD — always kept
      ("t/2024/01/01/a.parquet", startMs + 9000L), // pre-cursor day: never listed
      ("t/2024/01/02/b.parquet", startMs + 10000L), // in window
      ("t/2024/01/02/c.parquet", startMs + 20000L), // after stop
      ("t/2024/01/03/d.parquet", startMs + 15000L), // in window
      ("t/2024/01/03/junk.txt", startMs + 15000L)) // not parquet
    val pager = new FakePager(keys)
    val got = graft.sources.PagedLister.listDateAware(pager, "t",
      startMs, Some(startMs + 16000L), pageSize = 2)
    assert(got.map(_.path) === Seq("t/LOAD00000001.parquet",
      "t/2024/01/02/b.parquet", "t/2024/01/03/d.parquet"))
    assert(got.head.isLoad)
    // the CDC pass's cursor starts AT the start day's directory — keys
    // for earlier days are pruned by the LIST, not listed-then-dropped
    assert(pager.smallestCursorSeen === Some(""))
    // '' belongs to the LOAD-prefix pass; the date pass cursor:
    assert(pager.calls >= 2)
  }

  test("paged full-load listing uses the LOAD prefix trick") {
    val pager = new FakePager(Seq(
      ("t/LOAD00000001.parquet", 1000L),
      ("t/LOAD00000002.parquet", 1200L),
      ("t/2024/01/02/b.parquet", 10000L)))
    val got = graft.sources.PagedLister.listFullLoad(pager, "t")
    assert(got.map(_.path) === Seq("t/LOAD00000001.parquet",
      "t/LOAD00000002.parquet"))
    // the prefix reaches the pager: the date key never matches, so the
    // result is filter-free by construction
    assert(got.forall(_.isLoad))
  }

  test("Hadoop pager adapter agrees with the FileSystem lister") {
    val dir = fixture()
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val pager = new graft.sources.PagedLister.HadoopPageLister(fs)
    val paged = graft.sources.PagedLister.listDateAware(pager, dir,
      6000L, Some(16000L), pageSize = 2)
      .map(f => new Path(f.path).getName)
    // same fixture + window as the DateAware FileSystem test — but note
    // the paged path's DAY-cursor prunes 2024/01/01 entirely (start
    // 6000ms is 1970-01-01, so nothing is below the cursor here)
    val direct = CdcFileLister.list(spark, dir,
      ListingMode.DateAware(6000L, Some(16000L)))
      .map(f => new Path(f.path).getName)
    assert(paged === direct)
  }

  test("Hadoop pager: one traversal per drain, fresh drains re-list") {
    val dir = fixture()
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val pager = new graft.sources.PagedLister.HadoopPageLister(fs)
    // multi-page drain: 5+ files at 2/page needs ≥3 page RPCs, but the
    // adapter must walk the filesystem exactly ONCE (the round-10 form
    // re-walked per page — O(N²/pageSize) LIST work across a drain)
    val first = graft.sources.PagedLister.listAll(pager, s"$dir/",
      pageSize = 2)
    assert(first.size >= 5, s"fixture too small: ${first.size}")
    assert(pager.traversals === 1,
      s"a drain must be one traversal, saw ${pager.traversals}")
    // a NEW drain re-lists (fresh files must show up): traversals += 1
    val second = graft.sources.PagedLister.listAll(pager, s"$dir/",
      pageSize = 2)
    assert(second.map(_.key) === first.map(_.key))
    assert(pager.traversals === 2)
  }

  test("property: Hadoop pager drains equal the ListObjectsV2 model on random key sets") {
    // seeded randomized parity (same style as ReducerPropertySpec): for
    // random nested key sets — segment names extending each other, so
    // string-prefix vs path-component semantics actually differ — and
    // random (prefix, cursor, pageSize) probes, a HadoopPageLister drain
    // must equal both the in-memory FakePager drain and the flat
    // ListObjectsV2 model (sorted keys, string-prefix match, strictly
    // after the cursor), in ONE traversal per drain. Edge cases hit by
    // construction: cursors that are proper prefixes of surviving keys,
    // empty result sets, trailing-slash vs bare-dir prefixes, cursors
    // past the last key.
    val rnd = new scala.util.Random(20260814L)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val segs = Vector("a", "ab", "b", "2024", "01", "LOAD")
    val names = Vector("f", "f0", "f00", "g")
    for (trial <- 1 to 4) {
      val dir = Files.createTempDirectory(s"lister-prop$trial").toString
      val keys = (1 to 30).map { i =>
        val dirs = Seq.fill(1 + rnd.nextInt(3))(segs(rnd.nextInt(segs.size)))
        (dirs :+ s"${names(rnd.nextInt(names.size))}$i.parquet")
          .mkString("/")
      }.distinct
      keys.foreach(k => touch(dir, k, 1000L + rnd.nextInt(100000)))
      val fullKeys = keys.map(k => s"$dir/$k").sorted.toVector
      val fake = new FakePager(fullKeys.map(k => (k, 1L)))
      val pager = new graft.sources.PagedLister.HadoopPageLister(fs)
      for (_ <- 1 to 25) {
        val k = fullKeys(rnd.nextInt(fullKeys.size))
        val base = s"$dir/"
        val prefix = rnd.nextInt(5) match {
          case 0 => base
          case 1 => // any string prefix of a real key (may split a name)
            k.substring(0,
              base.length + rnd.nextInt(k.length - base.length + 1))
          case 2 => k.substring(0, k.lastIndexOf('/') + 1) // dir + slash
          case 3 => k.substring(0, k.lastIndexOf('/'))     // bare dir
          case 4 => k + "zzz"                              // matches nothing
        }
        val startAfter = rnd.nextInt(5) match {
          case 0 => ""
          case 1 => fullKeys(rnd.nextInt(fullKeys.size)) // exactly a key
          case 2 => // a proper PREFIX of some key — survivors extend it
            k.substring(0, base.length +
              rnd.nextInt(k.length - base.length + 1))
          case 3 => prefix // cursor == prefix (first-page shape)
          case 4 => fullKeys.last + "z" // past everything: empty drain
        }
        val pageSize = 1 + rnd.nextInt(5)
        val expected = fullKeys
          .filter(key => key.startsWith(prefix) && key > startAfter)
        val before = pager.traversals
        val got = graft.sources.PagedLister
          .listAll(pager, prefix, startAfter, pageSize)
        assert(got.map(_.key) === expected,
          s"hadoop drain diverged: prefix=$prefix cursor=$startAfter " +
            s"page=$pageSize")
        assert(pager.traversals === before + 1,
          s"drain must cost exactly one traversal (prefix=$prefix)")
        val viaFake = graft.sources.PagedLister
          .listAll(fake, prefix, startAfter, pageSize)
        assert(viaFake.map(_.key) === expected,
          s"fake-pager drain diverged: prefix=$prefix cursor=$startAfter")
      }
    }
  }

  test("Hadoop pager: scheme-qualified prefixes match the listed keys") {
    val dir = fixture()
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val pager = new graft.sources.PagedLister.HadoopPageLister(fs)
    val bare = graft.sources.PagedLister.listAll(pager, s"$dir/",
      pageSize = 100)
    assert(bare.nonEmpty)
    // a fully-qualified table dir (what fs.makeQualified hands callers)
    // must list the same keys — the round-10 form compared the qualified
    // prefix against scheme-less keys and returned empty
    val qualified = fs.makeQualified(new Path(dir)).toString
    assert(qualified.contains(":"), s"not qualified: $qualified")
    val viaQualified = graft.sources.PagedLister.listAll(pager,
      s"$qualified/", pageSize = 100)
    assert(viaQualified.map(_.key) === bare.map(_.key))
  }
}
