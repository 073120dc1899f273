package graft

import graft.operators.Packing
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("token-budget packing equals the sequential greedy computation") {
    val rnd = new scala.util.Random(7)
    val docs = (0L until 1000L).map(i => (i, rnd.nextInt(400).toLong + 1L))
    val got = Packing
      .packByTokenBudget(docs.toDF("doc_id", "n_tokens"), "doc_id",
        "n_tokens", budget = 2048L)
      .select("doc_id", "cum_before", "bin_id", "bin_offset")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)

    var cum = 0L
    docs.zip(got).foreach { case ((id, toks), (gid, gcum, gbin, goff)) =>
      assert(gid === id)
      assert(gcum === cum, s"cum_before wrong for doc $id")
      assert(gbin === cum / 2048L)
      assert(goff === cum % 2048L)
      cum += toks
    }
  }

  test("packing survives real range-boundary sampling at 200k rows") {
    // large enough that repartitionByRange actually samples; the global
    // cum sums must still be exact (the persisted-layout contract)
    val docs = spark.range(0, 200000)
      .select(col("id").as("doc_id"),
        (pmod(col("id") * 2654435761L, lit(97L)) + 1L).as("n_tokens"))
    val packed = Packing
      .packByTokenBudget(docs, "doc_id", "n_tokens", budget = 4096L)
    // total bins and final cum must match the closed-form total
    val total = docs.agg(sum("n_tokens")).as[Long].head()
    val (maxCumPlus, nRows) = packed
      .agg(max(col("cum_before") + col("n_tokens")), count(lit(1)))
      .as[(Long, Long)].head()
    assert(nRows === 200000L)
    assert(maxCumPlus === total, "global running sum lost rows or double-counted")
    // cum_before must be strictly increasing with doc_id (spot-check via
    // a window-free pairwise self-join on adjacent ids)
    val bad = packed.as("a").join(packed.as("b"),
        col("a.doc_id") + 1 === col("b.doc_id"))
      .filter(col("b.cum_before") =!= col("a.cum_before") + col("a.n_tokens"))
    assert(bad.isEmpty, "adjacent cum_before not contiguous")
  }

  test("globalRank matches a window row_number under a desc total order") {
    // scores with heavy ties — the id tiebreaker must resolve them the
    // same way in both computations
    val rows = (0L until 5000L).map(i => (i, (i * 2654435761L) % 17L))
    val df = rows.toDF("doc_id", "score")
    val got = Packing
      .globalRank(df, "rn", col("score").desc, col("doc_id"))
      .select("doc_id", "rn").as[(Long, Long)].collect().toMap
    val expected = rows.sortBy { case (id, s) => (-s, id) }
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
    assert(got === expected)
  }

  test("globalRank survives range-boundary sampling at 200k rows") {
    val df = spark.range(0, 200000)
      .select(col("id").as("doc_id"),
        pmod(col("id") * 2654435761L, lit(97L)).as("score"))
    val ranked = Packing.globalRank(df, "rn", col("score"), col("doc_id"))
    // ranks are a permutation of 1..N
    val (n, mn, mx, s) = ranked
      .agg(count(lit(1)), min("rn"), max("rn"), sum("rn"))
      .as[(Long, Long, Long, Long)].head()
    assert(n === 200000L && mn === 1L && mx === 200000L)
    assert(s === 200000L * 200001L / 2L, "ranks are not a permutation")
    // and ordered consistently with the sort key: no inversion exists
    val inv = ranked.as("a").join(ranked.as("b"),
        col("a.rn") + 1 === col("b.rn"))
      .filter(col("a.score") > col("b.score") ||
        (col("a.score") === col("b.score") &&
          col("a.doc_id") >= col("b.doc_id")))
    assert(inv.isEmpty, "adjacent ranks out of sort order")
  }
}
