package graft.dev

import graft.operators.DiffEngine
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch main for local plan/value inspection (not part of the driver
  * contract).
  */
object Debug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val cols = orders.columns.toSeq
    val canon = cols.map(c =>
      DiffEngine.canonicalColumn(col(c), orders.schema(c).dataType).as(c))
    orders.orderBy(col("o_orderkey")).limit(2).select(canon: _*)
      .collect().foreach(r => println(r.toSeq.map(v => s"[$v]").mkString(" ")))
    orders.limit(2).select(DiffEngine.rowHash(orders, cols).as("rh"))
      .collect().foreach(println)
  }
}
