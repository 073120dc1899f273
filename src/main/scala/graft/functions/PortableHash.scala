package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Hashing helpers in two flavors:
  *
  *  - FAST: `xxhash64` — Spark-native, codegen'd, the default for
  *    production paths (LSH bucketing, dedup at 100 TB).
  *  - PORTABLE: `md5`-derived — bit-identical in any SQL engine, used
  *    where results must be reproducible outside Spark (cross-engine
  *    validation digests, oracle-checked dedup). md5 of a UTF-8 string is
  *    specified byte-for-byte, so min/argmin over md5 values is a
  *    deterministic pseudo-permutation in every engine.
  */
object PortableHash {

  import org.apache.spark.sql.graftshim.ColumnBridge

  /** Portable 60-bit non-negative hash: first 15 hex chars of md5 → long.
    * (15 hex digits < 2^60, so the cast never overflows ANSI longs.)
    * Computed by the fused [[graft.plans.Md5Long60]] expression — value
    * identical to `conv(substring(md5(c), 1, 15), 16, 10)::long`, ~4×
    * cheaper per row (no hex string, no radix parse).
    */
  def md5Long(c: Column): Column =
    ColumnBridge.column(graft.plans.Md5Long60(
      ColumnBridge.expression(c.cast("string"))))

  /** Portable seeded hash string: md5 of "<seed>|<value>". Min over this is
    * the portable MinHash primitive.
    */
  def seeded(seed: Int, c: Column): Column =
    md5(concat_ws("|", lit(seed), c))

  /** Portable seeded hash as a 60-bit LONG — the MinHash primitive that
    * keeps aggregation in Tungsten's HashAggregate: a long min-buffer is
    * mutable, a string one is not (string mins fall back to interpreted
    * SortAggregate). DuckDB replica:
    * `('0x' || substr(md5(concat_ws('|', s, x)), 1, 15))::BIGINT`.
    * The seed rides as a fused digest prefix — no per-row concat.
    *
    * NULL CONTRACT: null input → null (the fused expression is
    * null-intolerant). The old concat_ws chain — and the DuckDB replica
    * above — instead hash the bare seed for null input (concat_ws skips
    * nulls). Feed non-null columns only (all engine callers hash
    * shingles, which are never null); a nullable column must be
    * coalesced first or its oracle diverges.
    */
  def seededLong(seed: Int, c: Column): Column =
    ColumnBridge.column(graft.plans.Md5Long60(
      ColumnBridge.expression(c.cast("string")), s"$seed|"))

  /** Fast seeded 64-bit hash (xxhash64). */
  def fastSeeded(seed: Int, c: Column): Column =
    xxhash64(lit(seed), c)

  /** Portable bucket id in [0, 16^hexChars): leading hex digits of md5,
    * kept AS TEXT so no engine-specific hex→int conversion is needed.
    */
  def md5Bucket(c: Column, hexChars: Int): Column =
    substring(md5(c), 1, hexChars)
}
