package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def corpus(n: Int) =
    spark.range(0, n).select($"id".as("vec_id"),
      transform(sequence(lit(0), lit(7)),
        d => ($"id" % 17 + d).cast("float")).as("embedding"))

  test("centroid count is bounded regardless of corpus size") {
    assert(Similarity.selectCentroids(corpus(1000), "vec_id", 20).count() === 20)
    assert(Similarity.selectCentroids(corpus(20000), "vec_id", 20).count() === 20)
    // deterministic: same corpus → identical selection
    val a = Similarity.selectCentroids(corpus(5000), "vec_id", 10)
      .select("vec_id").as[Long].collect().sorted.toSeq
    val b = Similarity.selectCentroids(corpus(5000), "vec_id", 10)
      .select("vec_id").as[Long].collect().sorted.toSeq
    assert(a === b)
  }

  test("planesFor holds bucket occupancy as the corpus grows") {
    import graft.operators.Similarity.planesFor
    // occupancy n / 2^planes stays within ~2x of the target
    for (n <- Seq(1000L, 100000L, 10000000L, 1000000000L)) {
      val p = planesFor(n, targetBucket = 256)
      val occupancy = n.toDouble / math.pow(2, p)
      assert(occupancy <= 256.0 && occupancy >= 64.0,
        s"n=$n planes=$p occupancy=$occupancy")
    }
    assert(planesFor(10, 256) === 1)    // tiny corpus floors at 1
    assert(planesFor(Long.MaxValue, 1) === 30) // cap
  }

  test("auto near-dup pairing derives planes from the corpus size") {
    import graft.operators.Similarity
    val c = corpus(1000)
      .select($"vec_id", transform($"embedding", x => x / lit(20f)).as("embedding"))
    val auto = Similarity.cosineNearDupPairsAuto(c, "vec_id", "embedding",
      threshold = 0.99, dim = 8, targetBucket = 64)
    val manual = Similarity.cosineNearDupPairs(c, "vec_id", "embedding",
      threshold = 0.99, planes = Similarity.planesFor(1000, 64), dim = 8)
    assert(auto.collect().toSet === manual.collect().toSet)
  }

  test("dot normalizes array<double> inputs instead of misreading them") {
    import graft.functions.VectorFunctions
    val df = Seq((Array(1.0d, 2.0d), Array(3.0d, 4.0d))).toDF("a", "b")
    val v = df.select(VectorFunctions.dot($"a", $"b").as("d")).head().getDouble(0)
    assert(v === 11.0)
    // un-castable inputs fail analysis instead of computing garbage
    intercept[org.apache.spark.sql.AnalysisException] {
      Seq(("x", "y")).toDF("a", "b")
        .select(VectorFunctions.dot($"a", $"b")).head()
    }
  }

  test("ivfTopK returns k ranked neighbors per query") {
    val c = corpus(500)
    val out = Similarity.ivfTopK(c, c.filter($"vec_id" < 3), "vec_id",
      "embedding", k = 4, numCentroids = 8, nprobe = 2)
    val byQ = out.groupBy("q_id").count().as[(Long, Long)].collect().toMap
    assert(byQ.keySet === Set(0L, 1L, 2L) && byQ.values.forall(_ === 4L))
  }
}
