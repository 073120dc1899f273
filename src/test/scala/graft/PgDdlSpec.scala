package graft

import graft.cdc.CdcConfig
import graft.sinks.PgDdl
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Golden-string DDL tests — the engine-side mirror of the reference's
  * query-builder tests (src/postgres/table_query.rs:103-195), adjusted
  * for our deliberate differences (quoted identifiers, typed DDL).
  */
class PgDdlSpec extends AnyFunSuite {

  test("find all columns") {
    assert(PgDdl.findAllColumns("public", "t1") ===
      """SELECT column_name, data_type
        |FROM information_schema.columns
        |WHERE table_schema = 'public' AND table_name = 't1'
        |ORDER BY ordinal_position""".stripMargin)
  }

  test("find primary key hits pg_index ordered by key position") {
    val sql = PgDdl.findPrimaryKey("public", "t1")
    assert(sql.contains("pg_index"))
    assert(sql.contains("indisprimary"))
    // quoted-identifier regclass literal (mixed case survives)
    assert(sql.contains("'\"public\".\"t1\"'::regclass"))
    assert(sql.contains("array_position"))
  }

  test("literals escape embedded quotes in catalog queries") {
    assert(PgDdl.findAllColumns("s", "it's")
      .contains("table_name = 'it''s'"))
    assert(PgDdl.findTablesInSchema("s", Seq("a'b"), exclude = false)
      .endsWith("AND table_name IN ('a''b')"))
  }

  test("table list: include, exclude, all") {
    assert(PgDdl.findTablesInSchema("s", Seq("a", "b"), exclude = false)
      .endsWith("AND table_name IN ('a', 'b')"))
    assert(PgDdl.findTablesInSchema("s", Seq("a"), exclude = true)
      .endsWith("AND table_name NOT IN ('a')"))
    assert(!PgDdl.findTablesInSchema("s", Seq.empty, exclude = false)
      .contains("IN ("))
  }

  test("create schema / drop schema") {
    assert(PgDdl.createSchema("target") ===
      """CREATE SCHEMA IF NOT EXISTS "target"""")
    assert(PgDdl.dropSchema("target") ===
      """DROP SCHEMA IF EXISTS "target" CASCADE""")
  }

  test("create table: ordered columns, typed, PK clause last") {
    val st = StructType(Seq(
      StructField("id", LongType),
      StructField("name", StringType),
      StructField("amount", DecimalType(12, 2)),
      StructField("tags", ArrayType(StringType))))
    assert(PgDdl.createTable("s", "t", st, Seq("id")) ===
      """CREATE TABLE IF NOT EXISTS "s"."t" ("id" bigint, "name" text, """ +
        """"amount" numeric(12,2), "tags" text[], PRIMARY KEY ("id"))""")
    // no PK → clause omitted (reference table_query.rs:84-86)
    assert(!PgDdl.createTable("s", "t", st, Seq.empty).contains("PRIMARY KEY"))
  }

  test("delete / upsert placeholder forms for composite PKs") {
    assert(PgDdl.deleteByPk("s", "t", Seq("a", "b")) ===
      """DELETE FROM "s"."t" WHERE "a" = ? AND "b" = ?""")
    val up = PgDdl.upsert("s", "t", Seq("a", "b", "v"), Seq("a", "b"))
    assert(up ===
      """INSERT INTO "s"."t" ("a", "b", "v") VALUES (?, ?, ?) """ +
        """ON CONFLICT ("a", "b") DO UPDATE SET "v" = EXCLUDED."v"""")
    // all columns are key columns → DO NOTHING
    assert(PgDdl.upsert("s", "t", Seq("a"), Seq("a")).endsWith("DO NOTHING"))
  }

  test("identifier quoting resists embedded quotes") {
    assert(PgDdl.ident("we\"ird") === "\"we\"\"ird\"")
  }

  test("config: conflicting flags rejected like the reference payload") {
    assertThrows[IllegalArgumentException] {
      CdcConfig("/x", "s", onlySnapshot = true, onlyDatadiff = true)
    }
    assertThrows[IllegalArgumentException] {
      CdcConfig("/x", "s", includeTables = Seq("a"), excludeTables = Seq("b"))
    }
    val c = CdcConfig("/x", "s", includeTables = Seq("a", "c"))
    assert(c.selectTables(Seq("a", "b", "c")) === Seq("a", "c"))
    val e = CdcConfig("/x", "s", excludeTables = Seq("b"))
    assert(e.selectTables(Seq("a", "b", "c")) === Seq("a", "c"))
  }
}
