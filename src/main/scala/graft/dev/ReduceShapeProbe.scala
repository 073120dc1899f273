package graft.dev

import graft.model.{CdcColumns => C}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch: isolates WHERE the max_by reduction loses time vs the window
  * form — candidate physical shapes for last-event-per-key at scale.
  */
object ReduceShapeProbe {
  def main(args: Array[String]): Unit = {
    val factor = if (args.nonEmpty) args(0).toInt else 10
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](label: String)(f: => A): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    val big = li
      .withColumn("_rep", explode(sequence(lit(0), lit(factor - 1))))
      .withColumn("l_orderkey",
        col("l_orderkey") + col("_rep").cast("long") * 100000000L)
      .drop("_rep").repartition(64).persist()
    println(s"rows: ${big.count()}")
    val pks = Seq("l_orderkey")
    val payloadCols = big.columns.filterNot(pks.contains).toSeq
    val payload = struct(payloadCols.map(col): _*)
    // seq shapes: struct-with-string vs single long
    val seqStruct = struct(col("l_linenumber"), col("l_returnflag"),
      col("l_partkey"))
    val seqLong = col("l_linenumber").cast("long") * 1000000L +
      col("l_partkey") % 1000000L

    // consume a field of the result so Catalyst can't prune the agg away
    def sink(df: org.apache.spark.sql.DataFrame, field: String): Unit =
      println("  -> " + df.select(max(xxhash64(col(field)))).head().getLong(0))
    time("A max_by(payload, seqStruct)   ")(
      sink(big.groupBy(pks.map(col): _*)
        .agg(max_by(payload, seqStruct).as("x")), "x.l_quantity"))
    time("B max_by(payload, seqLong)     ")(
      sink(big.groupBy(pks.map(col): _*)
        .agg(max_by(payload, seqLong).as("x")), "x.l_quantity"))
    time("C max(struct(seqLong, payload))")(
      sink(big.groupBy(pks.map(col): _*)
        .agg(max(struct(seqLong.as("_s"), payload.as("_p"))).as("x")),
        "x._p.l_quantity"))
    time("D window rn=1 (seqStruct)      ")(
      big.withColumn("_rn", row_number().over(
          Window.partitionBy(pks.map(col): _*).orderBy(seqStruct.desc)))
        .filter(col("_rn") === 1).count())
    time("E agg max(seqLong) + self-join ")({
      val last = big.groupBy(pks.map(col): _*)
        .agg(max(seqLong).as("_s"))
      last.join(big.withColumn("_s", seqLong), pks :+ "_s").count()
    })
  }
}
