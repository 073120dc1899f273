package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan

/** Scratch: audits physical plans of declared queries for the
  * scale-relevant properties — parquet filter pushdown, pruned scan
  * schemas, broadcast vs shuffle joins, partial aggregation, codegen
  * coverage.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args.drop(1).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- names) {
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      df.collect() // materialize THIS df's QueryExecution (count() would
                   // build its own): AQE only shows the FINAL plan (with
                   // codegen markers and chosen joins) post-run
      val plan = df.queryExecution.executedPlan
      val s = plan.toString
      def count(p: String) = p.r.findAllIn(s).length
      val pushed = "PushedFilters: \\[[^\\]]+\\]".r.findAllIn(s)
        .filterNot(_.contains("[]")).length
      println(f"$name%-24s bhj=${count("BroadcastHashJoin")}%d smj=${count("SortMergeJoin")}%d " +
        f"hashAgg=${count("HashAggregate")}%d objAgg=${count("ObjectHashAggregate")}%d sortAgg=${count("SortAggregate")}%d " +
        // whole-stage-codegen SPANS = distinct "*(n)" ids (every operator
        // in a span repeats its id; raw marker counts would inflate)
        f"exch=${count("Exchange")}%d wsc=${"\\*\\((\\d+)\\)".r.findAllMatchIn(s).map(_.group(1)).toSet.size}%d pushedF=$pushed%d")
    }
  }
}
