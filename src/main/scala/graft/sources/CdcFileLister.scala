package graft.sources

import graft.model.{CdcFile, ListingMode}
import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.sql.SparkSession

import java.time.format.DateTimeFormatter
import java.time.{LocalDate, ZoneOffset}

/** Driver-side CDC folder listing, the Spark-native replacement for the
  * reference's S3 `ListObjectsV2` walker (src/s3/s3_operator.rs:131-315).
  *
  * Works against any Hadoop filesystem (local, s3a, abfs, gs) so the same
  * code path covers unit tests on local FS and a production S3 bucket.
  *
  * Semantics preserved from the reference:
  *  - a file is a full-load file iff its NAME contains "LOAD"
  *    (s3_operator.rs:43-45);
  *  - in DateAware mode, LOAD files are always kept regardless of date
  *    (s3_operator.rs:251,256) and CDC files are kept when their
  *    modification time lies strictly inside (start, stop)
  *    (s3_operator.rs:244-261);
  *  - LOAD files order before CDC files; the reference achieves this with
  *    a `rotate_right` positional trick (s3_operator.rs:178-183), we sort
  *    explicitly by (isLoad desc, path asc) — same effect, no positional
  *    assumption (SURVEY.md §2.3.2).
  *
  * Scale note: directory pruning for the DMS `YYYY/MM/DD` layout happens
  * here on the driver (skip whole date directories before any file RPC),
  * mirroring the reference's `start_after` cursor (s3_operator.rs:147-154).
  * The per-file result is a manifest, not data — actual reads happen in
  * executors via `spark.read.parquet(paths: _*)`.
  */
object CdcFileLister {

  private val DateDirFmt = DateTimeFormatter.ofPattern("yyyy/MM/dd")

  def list(spark: SparkSession, tableDir: String, mode: ListingMode)
      : Seq[CdcFile] = {
    val conf = spark.sessionState.newHadoopConf()
    mode match {
      case ListingMode.AbsolutePath(p) =>
        val path = new Path(p)
        val fs = path.getFileSystem(conf)
        val st = fs.getFileStatus(path)
        Seq(toCdcFile(st))

      case ListingMode.FullLoadOnly =>
        val dir = new Path(tableDir)
        val fs = dir.getFileSystem(conf)
        listParquet(fs, dir)
          .filter(_.isLoad)
          .sortBy(_.path)

      case ListingMode.DateAware(start, stopOpt) =>
        val dir = new Path(tableDir)
        val fs = dir.getFileSystem(conf)
        val startDay = LocalDate.ofInstant(
          java.time.Instant.ofEpochMilli(start), ZoneOffset.UTC)
        val files = listDateAware(fs, dir, startDay)
        ordered(files.filter { f =>
          // LOAD files bypass the date filter (reference contract).
          f.isLoad ||
            (f.mtimeMillis > start && stopOpt.forall(f.mtimeMillis < _))
        })
    }
  }

  /** Sorted ordering key the rest of the engine uses: LOAD files first,
    * then lexicographic path order (== chronological for zero-padded
    * `YYYY/MM/DD` DMS layouts).
    */
  def ordered(files: Seq[CdcFile]): Seq[CdcFile] =
    files.sortBy(f => (!f.isLoad, f.path))

  private def toCdcFile(st: FileStatus): CdcFile =
    CdcFile(st.getPath.toString, isLoadFile(st.getPath.getName),
      st.getModificationTime, st.getLen)

  /** Name-contains-LOAD, exactly like S3ParquetFile::is_load_file. */
  def isLoadFile(name: String): Boolean = name.contains("LOAD")

  private def listParquet(fs: FileSystem, dir: Path): Seq[CdcFile] = {
    if (!fs.exists(dir)) return Seq.empty
    fs.listStatus(dir).toIndexedSeq.collect {
      case f if f.isFile && f.getPath.getName.endsWith(".parquet") =>
        toCdcFile(f)
    }
  }

  /** Walk `tableDir`: top-level LOAD* files + `YYYY/MM/DD` date dirs, with
    * whole-directory pruning of dates before `startDay` (the reference's
    * `start_after` listing cursor, s3_operator.rs:147-154,221-226).
    */
  private def listDateAware(fs: FileSystem, dir: Path, startDay: LocalDate)
      : Seq[CdcFile] = {
    if (!fs.exists(dir)) return Seq.empty
    val top = fs.listStatus(dir).toIndexedSeq
    val loadFiles = top.collect {
      case f if f.isFile && f.getPath.getName.endsWith(".parquet") =>
        toCdcFile(f)
    }
    val startPrefix = startDay.format(DateDirFmt) // e.g. 2024/01/05
    val dateFiles = top.filter(_.isDirectory).flatMap { y =>
      fs.listStatus(y.getPath).toIndexedSeq.filter(_.isDirectory).flatMap { m =>
        fs.listStatus(m.getPath).toIndexedSeq.filter(_.isDirectory).flatMap { d =>
          val rel = s"${y.getPath.getName}/${m.getPath.getName}/${d.getPath.getName}"
          // prune whole day-directories strictly before the start date
          if (rel >= startPrefix)
            fs.listStatus(d.getPath).toIndexedSeq
              .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
              .map(toCdcFile)
          else Seq.empty
        }
      }
    }
    loadFiles ++ dateFiles
  }
}
