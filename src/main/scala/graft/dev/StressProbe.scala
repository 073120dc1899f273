package graft.dev

import graft.model.{CdcColumns => C}
import graft.operators.{ChangeLogReducer, DiffEngine}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: 10× scale stress of the CDC core — explodes sf0.1 lineitem
  * to ~6M events in-memory (key-shifted replicas), then times reduction,
  * row diff and bucket digests. Validates the scaling claims beyond the
  * largest driver-provided SF.
  */
object StressProbe {
  def main(args: Array[String]): Unit = {
    val factor = if (args.nonEmpty) args(0).toInt else 10
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    val big = li
      .withColumn("_rep", explode(sequence(lit(0), lit(factor - 1))))
      .withColumn("l_orderkey",
        col("l_orderkey") + col("_rep").cast("long") * 100000000L)
      .drop("_rep")
      .repartition(64)
      .persist()
    println(s"rows: ${big.count()} (cached)")

    val log = big
      .withColumn(C.Op, when(col("l_quantity") < 3, lit("D"))
        .when(col("l_quantity") < 25, lit("U")).otherwise(lit("I")))
      .withColumn(C.IngestTs, lit("2024-01-01T00:00:00Z"))
    val seq = struct(col("l_linenumber"),
      DiffEngine.rowHash(log, Seq("l_orderkey", "l_partkey", "l_linenumber")))
    time(s"reduce ${factor}x (window default, md5 tie-break seq)")(
      println("  -> " + ChangeLogReducer.reduce(log, Seq("l_orderkey"), seq)
        .count() + " final rows"))
    // the REAL replay path orders by (load_rank, file, row_index) — plain
    // comparable columns, no hashing; time that shape too
    val plainSeq = struct(col("l_linenumber"), col("l_partkey"),
      col("l_suppkey"), col("l_extendedprice"))
    time(s"reduce ${factor}x (window default, plain seq)")(
      println("  -> " + ChangeLogReducer.reduce(log, Seq("l_orderkey"), plainSeq)
        .count() + " final rows"))
    time(s"reduce ${factor}x (max_by variant, plain seq)")(
      println("  -> " + ChangeLogReducer.reduceViaMaxBy(log, Seq("l_orderkey"), plainSeq)
        .count() + " final rows"))

    val mutated = big.filter(col("l_orderkey") % 997 =!= 3)
      .withColumn("l_extendedprice",
        when(col("l_orderkey") % 1000 === 7, col("l_extendedprice") + 1.5)
          .otherwise(col("l_extendedprice")))
    time(s"rowDiff ${factor}x (full-outer, composite PK)")(
      println("  -> " + DiffEngine.summarize(DiffEngine.rowDiff(
        big, mutated, Seq("l_orderkey", "l_linenumber", "l_partkey")))
        .collect().mkString(", ")))

    time(s"bucketDigest ${factor}x")(
      println("  -> " + DiffEngine.bucketDigest(big,
        Seq("l_orderkey", "l_linenumber", "l_partkey")).count() + " buckets"))

    time(s"chunkDigest ${factor}x (range-partitioned, no global window)")(
      println("  -> " + DiffEngine.chunkDigest(big,
        Seq("l_orderkey", "l_linenumber", "l_partkey"), 100000).count() +
        " chunks"))
  }
}
