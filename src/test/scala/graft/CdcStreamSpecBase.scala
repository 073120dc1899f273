package graft

import graft.model.{CdcColumns => C, ListingMode}
import graft.operators.ChangeLogReducer
import graft.sources.{CdcFileLister, ChangeLogReader}
import graft.streaming.CdcStream
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Shared fixture writer for the CdcStream* suites. One ~250 s spec
  * became five (core replay/merge semantics + streaming near-dup +
  * text/lexical maintenance sinks + vector maintenance sinks +
  * media/audio/video incl. the day-in-the-life) so no single suite
  * anchors the forked-group wall.
  */
trait CdcStreamSpecBase extends SparkSpec {
  import spark.implicits._

  protected def writeFile(dir: String, name: String,
      rows: Seq[(String, String, Long, String)]): Unit = {
    val df = rows.toDF(C.Op, C.IngestTs, "id", "payload")
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/_tmp")
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val part = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/_tmp"))
      .map(_.getPath).find(_.getName.endsWith(".parquet")).get
    fs.rename(part, new org.apache.hadoop.fs.Path(s"$dir/$name"))
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/_tmp"), true)
  }

}
