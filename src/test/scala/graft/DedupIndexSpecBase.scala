package graft

import graft.operators.{Dedup, DedupIndex, Similarity}
import graft.plans.CachedPlans
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared fixture helpers for the DedupIndex* suites. One ~220 s spec
  * became four (text probes/plans + CDC verb lifecycle + staged-commit
  * machinery + vector probes/geometry) so the forked test groups can
  * balance around what was the single largest anchor suite.
  */
trait DedupIndexSpecBase extends SparkSpec {

  protected def mkDocs(ids: Seq[Long]): Seq[(Long, String)] = {
    val base = "the quick brown fox jumps over the lazy dog while rain " +
      "falls on the quiet gray town square every single evening"
    ids.map { i =>
      // groups of 4 share a template; member 0/1 of a group are exact
      // dups, member 2 a near-dup (one word swapped), member 3 distinct
      val g = i / 4
      i % 4 match {
        case 0 | 1 => (i, s"group $g: $base")
        case 2 => (i, s"group $g: ${base.replace("lazy", "sleepy")}")
        case _ => (i, s"doc $i is entirely different text " +
          s"about topic ${i * 37} with its own unique vocabulary $i")
      }
    }
  }

  protected def sortedRows(df: DataFrame): Seq[Seq[Any]] = {
    val cols = df.columns.sorted.toSeq
    df.select(cols.map(col): _*).collect()
      .map(_.toSeq).sortBy(_.mkString("|")).toSeq
  }

}
