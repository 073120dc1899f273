package graft.dev

import org.apache.spark.sql.SparkSession

object Q6Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries("q6_forecast_revenue")(spark, "/root/testdata/sf0.01")
    val s = df.queryExecution.executedPlan.toString
    s.split("\n").filter(l => l.contains("PushedFilters") || l.contains("ReadSchema") || l.contains("Scan")).foreach(println)
  }
}
