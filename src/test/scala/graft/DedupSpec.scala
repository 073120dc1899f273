package graft

import graft.queries.DedupQueries
import org.apache.spark.sql.DataFrame

/** Pins the bench-only production (xxhash64) dedup flavors to the
  * oracle-checked portable flavors: the exact-Jaccard verify makes final
  * pairs hash-scheme-independent as long as LSH recall holds, so on the
  * test corpus both flavors must emit identical results.
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def pairs(df: DataFrame): Seq[(Long, Long)] =
    df.select("a_id", "b_id").as[(Long, Long)].collect().sorted.toSeq

  test("connected components label transitive clusters with the min id") {
    import graft.operators.Dedup
    // two clusters: a 30-node CHAIN (exercises pointer-jumping — plain
    // 1-hop propagation would need 29 rounds, over the default cap) and
    // a triangle, plus an isolated pair
    val chain = (1L to 29L).map(i => (i, i + 1))
    val tri = Seq((100L, 101L), (101L, 102L), (100L, 102L))
    val pair = Seq((200L, 201L))
    val pairs = (chain ++ tri ++ pair).toDF("a_id", "b_id")
    val comp = Dedup.connectedComponents(pairs, "a_id", "b_id")
      .as[(Long, Long)].collect().toMap
    assert((1L to 30L).forall(comp(_) === 1L), "chain not fully labeled")
    assert(Seq(100L, 101L, 102L).forall(comp(_) === 100L))
    assert(comp(200L) === 200L && comp(201L) === 200L)
    assert(comp.size === 35)
  }

  test("connected components throw instead of returning unconverged labels") {
    import graft.operators.Dedup
    val chain = (1L to 29L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val e = intercept[IllegalStateException] {
      Dedup.connectedComponents(chain, "a_id", "b_id", maxIter = 1)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("connected components equal driver-side union-find on random graphs") {
    import graft.operators.Dedup
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 200
      val edges = Seq.fill(150)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      // ground truth: classic union-find with path compression
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x
        else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val expected = nodes.map(v => v -> find(v)).toMap
      val got = Dedup.connectedComponents(
          edges.toDF("a_id", "b_id"), "a_id", "b_id")
        .as[(Long, Long)].collect().toMap
      assert(got === expected, s"trial $trial diverged from union-find")
    }
  }

  test("canonicalize folds clusters onto the full corpus as kept verdicts") {
    import graft.operators.Dedup
    val docs = (1L to 10L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    // cluster {2,5,7} (transitive via 5) and pair {3,9}
    val p = Seq((2L, 5L), (5L, 7L), (3L, 9L)).toDF("a_id", "b_id")
    val got = Dedup.canonicalize(docs, "doc_id", p, "a_id", "b_id")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    val expected = (1L to 10L).map {
      case 5L => (5L, 2L, false)
      case 7L => (7L, 2L, false)
      case 9L => (9L, 3L, false)
      case i  => (i, i, true)
    }
    assert(got === expected)
  }

  test("canonicalizeBy keeps the best-scoring member, ties to min id") {
    import graft.operators.Dedup
    val docs = (1L to 10L).map(i =>
      (i, s"doc$i", if (i == 5L) 99L else 10L)) // 5 is the best of {2,5,7}
      .toDF("doc_id", "text", "score")
    val p = Seq((2L, 5L), (5L, 7L), (3L, 9L)).toDF("a_id", "b_id")
    val got = Dedup.canonicalizeBy(docs, "doc_id", "score", p, "a_id", "b_id")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    val expected = (1L to 10L).map {
      case 2L => (2L, 5L, false)
      case 7L => (7L, 5L, false)
      case 9L => (9L, 3L, false) // tie on score → min id wins
      case i  => (i, i, true)
    }
    assert(got === expected)
    // an all-NULL-score cluster degrades to the min-id policy (it must
    // still deduplicate, not silently keep every member)
    val nullDocs = Seq[(Long, String, Option[Long])](
      (2L, "a", None), (5L, "b", None), (7L, "c", None), (8L, "d", Some(1L)))
      .toDF("doc_id", "text", "score")
    val gotNull = Dedup.canonicalizeBy(nullDocs, "doc_id", "score",
        Seq((2L, 5L), (5L, 7L)).toDF("a_id", "b_id"), "a_id", "b_id")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(gotNull === Seq((2L, 2L, true), (5L, 2L, false),
      (7L, 2L, false), (8L, 8L, true)))
  }

  test("spanOverlap counts spans shared across documents") {
    import graft.operators.Dedup
    // doc 1 and 2 share one 3-gram span ("b c d"); doc 3 is disjoint
    val docs = Seq(
      (1L, "a b c d"),   // spans: "a b c", "b c d"
      (2L, "b c d e"),   // spans: "b c d", "c d e"
      (3L, "x y z w"))   // spans: "x y z", "y z w"
      .toDF("doc_id", "text")
    val got = Dedup.spanOverlap(docs, "doc_id", "text", n = 3)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got === Seq(
      (1L, 2L, 1L, 0.5), (2L, 2L, 1L, 0.5), (3L, 2L, 0L, 0.0)))
  }

  test("spanDedupClean cuts exactly the cross-doc-covered word positions") {
    import graft.operators.Dedup
    // docs 1 and 2 share the 3-gram "b c d"; in doc 1 it starts at word
    // 2 (covering b,c,d), in doc 2 at word 1 (covering b,c,d). doc 3 is
    // untouched; doc 4 repeats a gram WITHIN itself only — not removed
    // (cross-document dup is the removal trigger)
    val docs = Seq(
      (1L, "a b c d e"),
      (2L, "b c d e2"),
      (3L, "x y z w"),
      (4L, "p q r p q r"))
      .toDF("doc_id", "text")
    val got = Dedup.spanDedupClean(docs, "doc_id", "text", n = 3)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(got === Seq(
      (1L, 5L, 3L, "a e"),
      (2L, 4L, 3L, "e2"),
      (3L, 4L, 0L, "x y z w"),
      (4L, 6L, 0L, "p q r p q r")))
    // a doc that is ALL duplicated span collapses to empty, not a null
    val twin = Seq((1L, "s t u"), (2L, "s t u")).toDF("doc_id", "text")
    val gone = Dedup.spanDedupClean(twin, "doc_id", "text", n = 3)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(gone === Seq((1L, 3L, 3L, ""), (2L, 3L, 3L, "")))
  }

  test("simHashNearDups finds close signatures and honors the band guard") {
    import graft.operators.Dedup
    // signatures hash the DISTINCT token set, so reordered/repeated
    // tokens give Hamming 0; a disjoint doc stays far away
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "theta eta zeta epsilon delta gamma beta alpha alpha"),
      (3L, "one two three four five six seven eight"))
      .toDF("doc_id", "text")
    val got = Dedup.simHashNearDups(docs, "doc_id", "text")
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(got.contains((1L, 2L)))
    assert(!got.contains((1L, 3L)) && !got.contains((2L, 3L)))
    // exact-recall precondition is enforced, not assumed
    val e = intercept[IllegalArgumentException] {
      Dedup.simHashNearDups(docs, "doc_id", "text", bands = 2, maxHamming = 3)
    }
    assert(e.getMessage.contains("bands > maxHamming"))
  }

  test("simHashNearDupsReport surfaces buckets dropped by the cap") {
    import graft.operators.Dedup
    // ten identical docs share one signature, hence every band bucket,
    // so maxBucket = 4 drops those hot buckets; an unrelated close pair
    // must still be found through its own small buckets
    val template = "alpha beta gamma delta epsilon zeta eta theta"
    val hot = (1L to 10L).map(i => (i, template))
    val other = Seq(
      (100L, "one two three four five six seven eight"),
      (101L, "eight seven six five four three two one one"))
    val docs = (hot ++ other).toDF("doc_id", "text")

    val capped = Dedup.simHashNearDupsReport(docs, "doc_id", "text",
      maxBucket = 4)
    val over = capped.oversizedBuckets
      .select("band", "band_key", "bucket_size")
      .as[(Int, String, Long)].collect()
    assert(over.nonEmpty, "hot buckets must be reported, not dropped")
    assert(over.forall(_._3 > 4))
    // recall loss is REAL under the cap (template pairs lost) and the
    // report explains it; the independent small-bucket pair survives
    val cappedPairs = pairs(capped.pairs).toSet
    assert(cappedPairs.contains((100L, 101L)))
    assert(!cappedPairs.contains((1L, 2L)))
    // with a generous cap the report is empty — certifying exact recall —
    // and the template pairs reappear
    val full = Dedup.simHashNearDupsReport(docs, "doc_id", "text",
      maxBucket = 1000)
    assert(full.oversizedBuckets.isEmpty)
    assert(pairs(full.pairs).toSet.contains((1L, 2L)))
  }

  test("fast minhash flavor finds the portable flavor's verified pairs") {
    assert(pairs(DedupQueries.minHashLshFast(spark, sf)) ===
      pairs(DedupQueries.minHashLsh(spark, sf)))
  }

  test("fast ngram-block flavor finds the portable flavor's verified pairs") {
    assert(pairs(DedupQueries.ngramJaccardFast(spark, sf)) ===
      pairs(DedupQueries.ngramJaccard(spark, sf)))
  }

  test("editDistanceNearDups verifies banded candidates by Levenshtein") {
    import graft.operators.Dedup
    val base = "the quick brown fox jumps over the lazy dog and then " +
      "runs far away into the deep dark woods tonight"
    val docs = Seq(
      (1L, base),                        // original
      (2L, base.dropRight(1) + "s"),     // one-char edit → dist 1
      (3L, base),                        // exact copy → dist 0
      (4L, "completely different content about spark catalyst plans " +
        "and tungsten codegen with nothing shared at all here"))
      .toDF("doc_id", "text")
    val got = Dedup.editDistanceNearDups(docs, "doc_id", "text",
        maxDistRatio = 0.05).pairs
      .select("a_id", "b_id", "dist").as[(Long, Long, Long)]
      .collect().sorted.toSeq
    assert(got === Seq((1L, 2L, 1L), (1L, 3L, 0L), (2L, 3L, 1L)))
    // ratio 0 keeps only exact copies — the cut is on the verify, not
    // the banding
    val strict = Dedup.editDistanceNearDups(docs, "doc_id", "text",
        maxDistRatio = 0.0).pairs
      .select("a_id", "b_id").as[(Long, Long)].collect().sorted.toSeq
    assert(strict === Seq((1L, 3L)))
  }

  test("incrementalExact verdicts a batch against the corpus without re-pairing it") {
    import graft.operators.Dedup
    val existing = Seq((1L, "alpha"), (2L, "beta"), (3L, "alpha"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, "alpha"), // already in the corpus
      (11L, "gamma"), // first sight anywhere
      (12L, "gamma"), // second sight within the batch
      (13L, "delta")) // first sight anywhere
      .toDF("doc_id", "text")
    val got = Dedup.incrementalExact(batch, existing, "doc_id", "text")
      .select("doc_id", "verdict").as[(Long, String)].collect().toMap
    assert(got === Map(10L -> "dup_of_existing", 11L -> "kept",
      12L -> "dup_within_batch", 13L -> "kept"))
  }

  test("incremental minhash probe pairs new against existing only, cap reported") {
    import graft.operators.Dedup
    graft.plans.CachedPlans.clear()
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val existing = Seq(
      (2L, base), (4L, base + " tail"), // near-dups of each other: must NOT pair
      (6L, "completely different content about spark catalyst plans"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (1L, base + " indeed"), // near-dup of 2 and 4
      (3L, "unrelated fresh text nothing shares shingles with this"))
      .toDF("doc_id", "text")
    val rep = Dedup.incrementalMinHashNearDupsReport(
      batch, existing, "doc_id", "text", threshold = 0.5)
    val got = rep.pairs.select("a_id", "b_id").as[(Long, Long)]
      .collect().toSet
    assert(got.contains((2L, 1L)), s"missing (2,1) in $got")
    // a_id is always existing (even), b_id always batch (odd): the
    // existing×existing near-dup (2,4) must not re-emerge
    assert(got.forall { case (a, b) => a % 2 == 0 && b % 2 == 1 }, got)
    assert(rep.oversizedBuckets.isEmpty)

    // cap on the EXISTING side: maxBucket=1 with three same-template
    // existing docs overflows their shared band buckets and reports them
    graft.plans.CachedPlans.clear()
    val template = Seq((2L, base), (4L, base), (8L, base))
      .toDF("doc_id", "text")
    val capped = Dedup.incrementalMinHashNearDupsReport(
      batch, template, "doc_id", "text", threshold = 0.5, maxBucket = 1)
    assert(capped.oversizedBuckets.count() > 0)
    assert(capped.pairs.isEmpty) // every colliding bucket was dropped
    graft.plans.CachedPlans.clear()
  }
}
