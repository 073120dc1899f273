package graft

import graft.model.PgTypes
import graft.operators.SchemaChecker
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class ModelSpec extends AnyFunSuite {

  test("pg → catalyst type mapping") {
    assert(PgTypes.toCatalyst("integer") === IntegerType)
    assert(PgTypes.toCatalyst("bigint") === LongType)
    assert(PgTypes.toCatalyst("numeric(12,4)") === DecimalType(12, 4))
    assert(PgTypes.toCatalyst("character varying") === StringType)
    assert(PgTypes.toCatalyst("timestamp without time zone") === TimestampType)
    // the reference's one normalization: ARRAY → text[]
    assert(PgTypes.toCatalyst("ARRAY") === ArrayType(StringType))
    assert(PgTypes.toCatalyst("double precision") === DoubleType)
  }

  test("catalyst → pg round trip for DDL") {
    assert(PgTypes.toPg(DecimalType(38, 6)) === "numeric(38,6)")
    assert(PgTypes.toPg(StringType) === "text")
    assert(PgTypes.toPg(ArrayType(StringType)) === "text[]")
    assert(PgTypes.toPg(TimestampType) === "timestamp without time zone")
  }

  test("schema check: both directions, DMS columns allowlisted") {
    val parquet = StructType(Seq(
      StructField("Op", StringType),
      StructField("_dms_ingestion_timestamp", StringType),
      StructField("id", LongType),
      StructField("extra_col", StringType)))
    val rep = SchemaChecker.check(parquet, Seq("id", "name"))
    assert(rep.extraInParquet === Seq("extra_col"))
    assert(rep.missingFromParquet === Seq("name"))
    assert(!rep.ok)
    assertThrows[IllegalArgumentException] {
      SchemaChecker.requireSubset(parquet, Seq("id", "name"))
    }
    // reference behavior: missing-from-parquet alone is NOT a subset error
    SchemaChecker.requireSubset(
      StructType(Seq(StructField("Op", StringType), StructField("id", LongType))),
      Seq("id", "name"))
  }
}
