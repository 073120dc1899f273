package graft.model

import org.apache.spark.sql.types._

/** Postgres catalog type name ⇄ Catalyst DataType mapping.
  *
  * The reference passes `information_schema.columns.data_type` strings
  * through verbatim into DDL, with a single normalization: `ARRAY` →
  * `text[]` (reference: src/postgres/postgres_operator_impl.rs:25-37,64-72).
  * We keep a real two-way mapping so schemas can round-trip between a
  * Postgres catalog and Spark `StructType`s. Decimals use DecimalType with
  * the declared precision/scale (the reference renders decimals through an
  * i64 mantissa, which silently truncates >i64 mantissas —
  * src/postgres/postgres_row_struct.rs:43; we don't, per SURVEY.md §2.3.6).
  */
object PgTypes {

  private val NumericRe = """numeric\((\d+)\s*,\s*(\d+)\)""".r

  /** Postgres type name (as found in information_schema) → Catalyst type. */
  def toCatalyst(pgType: String): DataType = pgType.trim.toLowerCase match {
    case "smallint" | "int2"                      => ShortType
    case "integer" | "int" | "int4"               => IntegerType
    case "bigint" | "int8"                        => LongType
    case "real" | "float4"                        => FloatType
    case "double precision" | "float8"            => DoubleType
    case NumericRe(p, s)                          => DecimalType(p.toInt, s.toInt)
    case "numeric" | "decimal"                    => DecimalType(38, 18)
    case "boolean" | "bool"                       => BooleanType
    case "text" | "character varying" | "varchar" | "name" | "uuid" | "json" |
        "jsonb" | "citext"                        => StringType
    case s if s.startsWith("character varying")   => StringType
    case s if s.startsWith("character")           => StringType
    case "bytea"                                  => BinaryType
    case "date"                                   => DateType
    case s if s.startsWith("timestamp")           => TimestampType
    case s if s.startsWith("time")                => StringType
    case "array" | "text[]"                       => ArrayType(StringType)
    case s if s.endsWith("[]")                    => ArrayType(StringType)
    case _                                        => StringType
  }

  /** Catalyst type → Postgres DDL type name (for CREATE TABLE synthesis,
    * mirroring src/postgres/table_query.rs:73-87).
    */
  def toPg(dt: DataType): String = dt match {
    case ShortType            => "smallint"
    case IntegerType          => "integer"
    case LongType             => "bigint"
    case FloatType            => "real"
    case DoubleType           => "double precision"
    case d: DecimalType       => s"numeric(${d.precision},${d.scale})"
    case BooleanType          => "boolean"
    case StringType           => "text"
    case BinaryType           => "bytea"
    case DateType             => "date"
    case TimestampType        => "timestamp without time zone"
    case ArrayType(_, _)      => "text[]"
    case _                    => "text"
  }

  /** Ordered (name, pgType) pairs → StructType (order matters for DDL
    * parity — the reference keeps an insertion-ordered IndexMap,
    * src/postgres/postgres_operator.rs:36-40).
    */
  def toStruct(columns: Seq[(String, String)]): StructType =
    StructType(columns.map { case (n, t) =>
      StructField(n, toCatalyst(t), nullable = true)
    })
}
