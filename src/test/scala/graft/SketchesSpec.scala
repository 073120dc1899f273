package graft

import graft.operators.Sketches
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("CMS counters are bounded and estimates never underestimate") {
    // skewed input: value i appears 101 - i times
    val vals = (1 to 100).flatMap(i => Seq.fill(101 - i)(s"v$i"))
      .toDF("v")
    val depth = 4; val width = 64 // deliberately tight: collisions certain
    val counters = Sketches.cmsCounters(vals, "v", depth, width)
    assert(counters.count() <= depth * width)
    // every cell coordinate is in range
    val cells = counters.select("r", "c").as[(Int, Long)].collect()
    assert(cells.forall { case (r, c) => r >= 0 && r < depth &&
      c >= 0 && c < width })
    val exact = vals.groupBy("v").agg(count(lit(1)).as("exact_cnt"))
    val est = Sketches.cmsEstimates(exact.select("v"), "v", counters,
        depth, width)
      .join(exact, Seq("v"))
      .as[(String, Long, Long)].collect()
    assert(est.length === 100)
    // the CMS guarantee: one-sided error (with width 64 and 100 keys,
    // at least some estimates MUST overestimate — assert both sides)
    est.foreach { case (v, e, x) => assert(e >= x, s"$v: est $e < exact $x") }
    assert(est.exists { case (_, e, x) => e > x },
      "tight sketch produced no collisions — width/test mismatch")
  }

  test("CMS estimate of an unseen value can only be sketch noise, never negative") {
    val vals = Seq.fill(50)("present").toDF("v")
    val counters = Sketches.cmsCounters(vals, "v", 4, 1024)
    val est = Sketches.cmsEstimates(Seq("absent").toDF("v"), "v",
        counters, 4, 1024)
      .as[(String, Long)].collect().head
    assert(est._2 >= 0)
  }

  test("heavy hitters surface the top grams with exact counts attached") {
    val docs = (Seq.fill(30)("the quick brown fox") ++
      Seq.fill(5)("a different phrase here") :+
      "the quick brown cat").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val out = Sketches.cmsHeavyHitters(docs, "text", n = 3, depth = 4,
        width = 1024, topK = 3)
      .as[(String, Long, Long)].collect()
    assert(out.length === 3)
    // 31 docs contain "the quick brown"; with width 1024 and ~6 distinct
    // grams the sketch is collision-free, so est == exact == 31 on top
    assert(out.head._1 === "the quick brown" && out.head._3 === 31L)
    assert(out.head._2 >= out.head._3)
    // frequency, not document frequency: per-doc repeats would count
    val rep = Seq((0L, "x y z x y z x y z")).toDF("doc_id", "text")
    val repOut = Sketches.cmsHeavyHitters(rep, "text", 3, 4, 1024, 10)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(repOut("x y z") === 3L) // windows 1,4,7 of 9 tokens
  }

  test("bloom probe has no false negatives and flags false positives") {
    val corpus = (0 until 200).map(i => s"doc-$i").toDF("v")
    // tiny m forces false positives from the probe set
    val k = 4; val m = 256
    val bits = Sketches.bloomBits(corpus, "v", k, m)
    assert(bits.count() <= m)
    // every corpus value probes back as a hit — structurally guaranteed
    val self = Sketches.bloomProbe(
        corpus.withColumn("id", col("v")), "id", "v", bits, k, m)
      .filter(!col("bloom_hit"))
    assert(self.count() === 0, "bloom filter produced a false negative")
    // absent values: some hit (m=256 is saturated), and determinism —
    // the same probe twice gives the identical verdict set
    val absent = (0 until 100).map(i => s"other-$i").toDF("v")
      .withColumn("id", col("v"))
    val p1 = Sketches.bloomProbe(absent, "id", "v", bits, k, m)
      .as[(String, String, Boolean)].collect().toSet
    val p2 = Sketches.bloomProbe(absent, "id", "v", bits, k, m)
      .as[(String, String, Boolean)].collect().toSet
    assert(p1 === p2)
    assert(p1.exists(_._3), "saturated filter yielded no false positive")
    assert(p1.exists(!_._3), "every absent value hit — m/k sizing broken")
  }

  test("declared bloom query marks every true duplicate dup_of_existing") {
    val got = graft.queries.DedupQueries
      .incrementalBloom(spark, "/root/testdata/sf0.001")
      .as[(Long, String, String)].collect()
    assert(got.nonEmpty)
    // cross-check the verdict taxonomy against the exact probe: every
    // doc the exact probe calls dup_of_existing must be a bloom hit
    val exact = graft.queries.DedupQueries
      .incrementalExact(spark, "/root/testdata/sf0.001")
      .as[(Long, String, String)].collect()
      .filter(_._3 == "dup_of_existing").map(_._1).toSet
    val bloomNew = got.filter(_._3 == "new").map(_._1).toSet
    assert(exact.intersect(bloomNew).isEmpty,
      "exact dup claimed provably-absent by the bloom probe")
    got.filter(r => exact.contains(r._1)).foreach { r =>
      assert(r._3 === "dup_of_existing")
    }
  }
}
