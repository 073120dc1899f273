package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.Column

/** Access to the driver-generated test tables (TESTDATA.md) + shared
  * numeric helpers for oracle-exact arithmetic.
  */
object Tables {
  def tbl(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.ts is TIMESTAMP(NANOS) parquet, which Spark cannot scan
    // natively; with spark.sql.legacy.parquet.nanosAsLong=true (set in
    // Verify/Bench sessions) it arrives as LongType nanos — normalize to
    // a microsecond TimestampType (integer `div`, no double rounding).
    // DuckDB truncates ns→µs the same way.
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    df.schema.fields.find(f => f.name == "ts" &&
        f.dataType == org.apache.spark.sql.types.LongType) match {
      case Some(_) =>
        // NTZ keeps parity with the other tables (parquet timestamps with
        // isAdjustedToUTC=false infer as TIMESTAMP_NTZ in Spark 4)
        df.withColumn("ts", timestamp_micros(expr("ts div 1000"))
          .cast(org.apache.spark.sql.types.TimestampNTZType))
      case None => df
    }
  }

  /** Money/ratio columns are doubles in the test data; casting to a fixed
    * DECIMAL before aggregation makes sums EXACT and order-independent, so
    * results are bit-identical across engines and across shuffles/AQE
    * re-plans. Final results are cast back to double (exact decimal →
    * nearest double is deterministic).
    */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))
}
