package graft

import graft.queries.{PipelineQueries, TextQueries}
import org.apache.spark.sql.functions._

/** The two round-10 curation operators — Gopher rule filtering and
  * DSIR importance weighting — are oracle-gated for exact values; these
  * specs pin the SEMANTIC properties the oracle cannot see: that the
  * rule cascade fires in its declared order, and that the importance
  * ranking actually separates the target slice.
  */
class CurationQueriesSpec extends SparkSpec {
  import spark.implicits._

  private val Sf = "/root/testdata/sf0.001"

  test("gopher rules: verdict is the first failing rule, corpus splits") {
    val out = TextQueries.gopherRules(spark, Sf)
    val rows = out.select("n_words", "mean_wlen", "top_frac", "stop_hits",
        "verdict")
      .as[(Long, Double, Double, Long, String)].collect().toSeq
    // the verdict column must be recomputable from the reported metrics
    // by applying the thresholds in cascade order — i.e. the metrics the
    // query REPORTS are the ones it DECIDED on
    rows.foreach { case (n, mw, tf, sh, v) =>
      val expect =
        if (n < 25) "too_short"
        else if (n > 90) "too_long"
        else if (mw < 4.3 || mw > 4.7) "word_length"
        else if (tf > 0.10) "repetition"
        else if (sh < 2) "no_stopwords"
        else "kept"
      assert(v === expect, s"n=$n mw=$mw tf=$tf sh=$sh")
    }
    // thresholds are tuned so the rule set is non-degenerate on the
    // synthetic corpus: some docs kept, several distinct failure modes
    val byVerdict = rows.groupBy(_._5).view.mapValues(_.size).toMap
    assert(byVerdict.getOrElse("kept", 0) > 0, s"nothing kept: $byVerdict")
    assert(byVerdict.size >= 3, s"rule set degenerate: $byVerdict")
  }

  test("importance weights: terciles balance and the target slice ranks high") {
    val out = PipelineQueries.importanceWeights(spark, Sf).cache()
    val n = out.count()
    // tercile sizes differ by at most 1 (the rank formula's guarantee)
    val sizes = out.groupBy("tercile").count()
      .as[(Int, Long)].collect().toMap
    assert(sizes.keySet === Set(1, 2, 3))
    assert(sizes.values.max - sizes.values.min <= 1, sizes.toString)
    assert(sizes.values.sum === n)
    // iw_score is exactly the declared function of the integer columns
    val bad = out.filter(
      abs(col("iw_score") -
        col("iw_q").cast("double") / col("n_words") / 10000.0) > 1e-12)
    assert(bad.count() === 0)
    // DSIR sanity, directional: the estimator is scored against the
    // lang='en' target, so the en concentration must fall monotonically
    // across terciles (top tercile strictly richer in en than bottom —
    // an absolute fraction would overconstrain when en exceeds 1/3 of
    // the corpus)
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
      .select(col("doc_id"), col("lang"))
    val rate = out.join(docs, "doc_id").groupBy("tercile")
      .agg((sum(when(col("lang") === "en", 1).otherwise(0)) /
        count(lit(1))).as("en_rate"))
      .as[(Int, Double)].collect().toMap
    assert(rate(1) > rate(3),
      s"en rate not decreasing across terciles: $rate")
    out.unpersist()
  }

  test("pipeline capstone: stage verdicts compose and column scopes hold") {
    val out = graft.queries.PipelineQueries.pipelineE2e(spark, Sf)
      .persist()
    val n = out.count()
    assert(n === spark.read.parquet(s"$Sf/documents.parquet").count(),
      "one row per ORIGINAL document")
    // canonical/dedup columns exist exactly for quality survivors;
    // token/shard columns exactly for final keepers
    assert(out.filter(col("q_verdict") =!= "kept" &&
      col("canonical_id").isNotNull).count() === 0)
    assert(out.filter(col("q_verdict") === "kept" &&
      col("canonical_id").isNull).count() === 0)
    assert(out.filter(col("final_kept") =!= col("n_tokens").isNotNull)
      .count() === 0)
    assert(out.filter(col("final_kept") =!= col("shard").isNotNull)
      .count() === 0)
    // final keepers = quality-kept docs that are their own canonical
    assert(out.filter(col("final_kept")).count() ===
      out.filter(col("q_verdict") === "kept" &&
        col("doc_id") === col("canonical_id")).count())
    // stage order matters and the fixture exercises it: some docs fail
    // quality, some quality-survivors collapse into a near-dup cluster
    assert(out.filter(col("q_verdict") =!= "kept").count() > 0)
    assert(out.filter(col("q_verdict") === "kept" &&
      !col("final_kept")).count() > 0)
    // dedup ran on SURVIVORS only: the capstone's keeper count must be
    // >= a whole-corpus canonicalize restricted to survivors would give
    // (a rejected doc must never absorb a surviving near-dup)
    val wholeCanon = graft.queries.DedupQueries.canonicalize(spark, Sf)
    val stolen = out.filter(col("q_verdict") === "kept")
      .select(col("doc_id"))
      .join(wholeCanon.filter(!col("kept")), Seq("doc_id"), "left_semi")
      .join(out.filter(col("final_kept")).select(col("doc_id")),
        Seq("doc_id"), "left_semi")
    // docs the whole-corpus dedup would drop but the staged pipeline
    // keeps (their cluster head was quality-rejected) — present in this
    // fixture, proving the stages are NOT order-independent
    assert(stolen.count() > 0,
      "fixture should show filter-then-dedup differs from dedup-then-filter")
    out.unpersist()
  }
}
