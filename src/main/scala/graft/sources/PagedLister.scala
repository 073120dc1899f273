package graft.sources

import graft.model.CdcFile

import java.time.format.DateTimeFormatter
import java.time.{LocalDate, ZoneOffset}

/** ListObjectsV2-shaped listing: the reference walks S3 with paginated
  * key-prefix requests and a lexicographic `start_after` cursor
  * (src/s3/s3_operator.rs:208-275 date-aware with pagination loop,
  * :277-315 full-load prefix mode, ≤1000 keys/page). The Hadoop
  * `FileSystem` path in [[CdcFileLister]] is the idiomatic-Spark
  * equivalent; THIS path reproduces the reference's native listing
  * protocol against any pager — object stores whose SDK exposes
  * `(prefix, startAfter, pageSize) → page` directly, or the bundled
  * [[HadoopPageLister]] adapter — so the engine's listing semantics are
  * testable at the protocol level (truncation loops, cursor skipping,
  * the LOAD-prefix trick) rather than only end-to-end.
  */
object PagedLister {

  /** One listed object: full key, modification time, size. */
  final case class PageEntry(key: String, mtimeMillis: Long, size: Long)

  /** The ListObjectsV2 essentials: up to `pageSize` keys that start with
    * `prefix`, lexicographically AFTER `startAfter` (exclusive), in key
    * order. A full page means "maybe truncated" — the caller loops with
    * the last key as the next cursor, exactly the reference's
    * `continuation` handling.
    */
  trait PageLister {
    def page(prefix: String, startAfter: String, pageSize: Int)
        : Seq[PageEntry]
  }

  private val DateDirFmt = DateTimeFormatter.ofPattern("yyyy/MM/dd")

  /** Drain every page: loop while pages come back full (the truncation
    * signal), advancing the cursor to the last key seen — one RPC per
    * `pageSize` keys, constant memory per page at any corpus size.
    */
  def listAll(pager: PageLister, prefix: String, startAfter: String = "",
      pageSize: Int = 1000): Seq[PageEntry] = {
    require(pageSize > 0, s"pageSize must be > 0, got $pageSize")
    val out = Seq.newBuilder[PageEntry]
    var cursor = startAfter
    var more = true
    while (more) {
      val p = pager.page(prefix, cursor, pageSize)
      require(p.map(_.key) == p.map(_.key).sorted &&
          p.forall(_.key > cursor),
        "pager contract: ascending keys strictly after the cursor")
      out ++= p
      more = p.size == pageSize
      if (more) cursor = p.last.key
    }
    out.result()
  }

  /** Full-load-only listing via the reference's prefix trick: LOAD files
    * sit directly under the table dir (in ASCII key order they sort
    * AFTER the `YYYY/` date dirs — 'L' 0x4C > '9' 0x39 — but that never
    * matters: this dedicated `prefix = <tableDir>/LOAD` pass lists
    * exactly them, s3_operator.rs:289-293, and the date pass filters
    * `!isLoad`) — no filtering pass at all here.
    */
  def listFullLoad(pager: PageLister, tableDir: String,
      pageSize: Int = 1000): Seq[CdcFile] =
    CdcFileLister.ordered(
      listAll(pager, s"${tableDir.stripSuffix("/")}/LOAD",
        pageSize = pageSize)
        .filter(_.key.endsWith(".parquet")).map(toCdcFile))

  /** Date-aware listing: one pass for the LOAD files (always kept — the
    * reference contract) plus one CURSORED pass over the date layout
    * starting at `<tableDir>/YYYY/MM/DD/` derived from `startMillis`
    * (the `start_after` pruning of s3_operator.rs:147-154,221-226 — keys
    * for earlier days are never listed, not listed-then-dropped), with
    * the (start, stop) mtime window applied to CDC files
    * (s3_operator.rs:244-261).
    */
  def listDateAware(pager: PageLister, tableDir: String, startMillis: Long,
      stopMillis: Option[Long], pageSize: Int = 1000): Seq[CdcFile] = {
    val base = tableDir.stripSuffix("/")
    val load = listAll(pager, s"$base/LOAD", pageSize = pageSize)
      .filter(_.key.endsWith(".parquet")).map(toCdcFile)
    val startDay = LocalDate.ofInstant(
      java.time.Instant.ofEpochMilli(startMillis), ZoneOffset.UTC)
    val cursor = s"$base/${startDay.format(DateDirFmt)}/"
    val cdc = listAll(pager, s"$base/", startAfter = cursor,
      pageSize = pageSize)
      .filter(_.key.endsWith(".parquet")).map(toCdcFile)
      .filter(f => !f.isLoad &&
        f.mtimeMillis > startMillis &&
        stopMillis.forall(f.mtimeMillis < _))
    CdcFileLister.ordered(load ++ cdc)
  }

  private def toCdcFile(e: PageEntry): CdcFile =
    CdcFile(e.key, CdcFileLister.isLoadFile(
      e.key.substring(e.key.lastIndexOf('/') + 1)), e.mtimeMillis, e.size)

  /** Scheme-less URI path of `s` (unchanged when `s` is already bare):
    * ListObjectsV2 keys are store-relative, so every string entering the
    * paged protocol — prefixes, cursors, and the keys a pager emits —
    * lives in one bare-path key space.
    */
  private[sources] def uriPath(s: String): String =
    if (s.isEmpty || !s.contains(":")) s
    else
      try {
        val u = new java.net.URI(s)
        if (u.getScheme != null && u.getPath != null && u.getPath.nonEmpty)
          u.getPath
        else s
      } catch { case _: java.net.URISyntaxException => s }

  /** [[graft.model.ListingMode]] dispatch through the paged protocol —
    * the CLI's `--lister paged` backend. Same listing semantics as
    * [[CdcFileLister.list]] (the Hadoop-native default), but every key
    * travels the reference's ListObjectsV2 shape: prefix passes, a
    * lexicographic date-dir cursor, truncation loops. The table dir is
    * normalized to the bare key space first, so date-aware cursors
    * (built from it by string concat) compare against pager keys
    * correctly even when the caller holds a scheme-qualified dir.
    */
  def list(spark: org.apache.spark.sql.SparkSession, tableDir: String,
      mode: graft.model.ListingMode, pageSize: Int = 1000): Seq[CdcFile] = {
    import graft.model.ListingMode
    val conf = spark.sessionState.newHadoopConf()
    def pagerFor(p: String) = new HadoopPageLister(
      new org.apache.hadoop.fs.Path(p).getFileSystem(conf))
    mode match {
      case ListingMode.AbsolutePath(p) =>
        val key = uriPath(p)
        val got = listAll(pagerFor(p), key, pageSize = pageSize)
          .filter(_.key == key)
        require(got.size == 1, s"absolute path $p listed ${got.size} keys")
        got.map(toCdcFile)
      case ListingMode.FullLoadOnly =>
        listFullLoad(pagerFor(tableDir), uriPath(tableDir), pageSize)
      case ListingMode.DateAware(start, stop) =>
        listDateAware(pagerFor(tableDir), uriPath(tableDir), start, stop,
          pageSize)
    }
  }

  /** [[PageLister]] over any Hadoop filesystem: a recursive `listFiles`
    * filtered to the prefix window, sorted, and served page by page.
    *
    * Keys (and incoming prefix/cursor strings) are normalized to
    * scheme-less URI paths, so a fully-qualified table dir
    * (`s3a://bucket/tbl`, `file:/tmp/tbl`) matches the keys the listing
    * produces instead of silently returning empty pages.
    *
    * Cost: ONE filesystem traversal per DRAIN, not per page. The first
    * page call walks and sorts the prefix's listing; continuation calls
    * (same prefix, `startAfter` == exactly the cursor where the previous
    * page left off — the shape [[listAll]] produces) serve from the
    * cached listing. A short page ends the drain and drops the cache, so
    * a NEW drain always re-lists (fresh files show up); any call that
    * isn't a continuation of the previous one also re-lists. The
    * recursive walk can't apply `startAfter` server-side the way a real
    * ListObjectsV2 does — a native store pager should push the cursor
    * down instead of using this adapter (the Hadoop-native production
    * path is [[CdcFileLister]]'s streaming iterator either way).
    */
  final class HadoopPageLister(fs: org.apache.hadoop.fs.FileSystem)
      extends PageLister {

    // the cached drain: listing for `drainPrefix`, sorted ascending;
    // `drainCursor` = last key served (null ⇒ no active drain)
    private var drainPrefix: String = null
    private var drainCursor: String = null
    private var drainEntries: Vector[PageEntry] = Vector.empty
    /** Filesystem traversals performed — observability for the
      * linear-cost contract (specs assert one traversal per drain).
      */
    private[graft] var traversals = 0

    private def traverse(prefix: String): Vector[PageEntry] = {
      traversals += 1
      // deepest existing directory at-or-above the prefix: LIST from
      // there, filter by full-key prefix (ListObjectsV2 prefixes are
      // string prefixes, not path components)
      val dir = {
        val slash = prefix.lastIndexOf('/')
        new org.apache.hadoop.fs.Path(
          if (slash <= 0) "/" else prefix.substring(0, slash))
      }
      if (!fs.exists(dir)) return Vector.empty
      val it = fs.listFiles(dir, true)
      val all = Vector.newBuilder[PageEntry]
      while (it.hasNext) {
        val st = it.next()
        val key = st.getPath.toUri.getPath
        if (key.startsWith(prefix))
          all += PageEntry(key, st.getModificationTime, st.getLen)
      }
      all.result().sortBy(_.key)
    }

    def page(prefix0: String, startAfter0: String, pageSize: Int)
        : Seq[PageEntry] = {
      val prefix = uriPath(prefix0)
      val startAfter = uriPath(startAfter0)
      val continues = drainCursor != null && prefix == drainPrefix &&
        startAfter == drainCursor
      if (!continues) {
        drainPrefix = prefix
        // entries at-or-under the cursor drop ONCE at drain start; the
        // cache then holds only the unserved tail, so each continuation
        // page is O(pageSize), not a rescan
        drainEntries = traverse(prefix).dropWhile(_.key <= startAfter)
      }
      val (out, rest) = drainEntries.splitAt(pageSize)
      drainEntries = rest
      if (out.size < pageSize) { // short page = drain over; drop cache
        drainPrefix = null; drainCursor = null; drainEntries = Vector.empty
      } else drainCursor = out.last.key
      out
    }
  }
}
