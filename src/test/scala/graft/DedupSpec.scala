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

  test("fast minhash flavor finds the portable flavor's verified pairs") {
    assert(pairs(DedupQueries.minHashLshFast(spark, sf)) ===
      pairs(DedupQueries.minHashLsh(spark, sf)))
  }

  test("fast ngram-block flavor finds the portable flavor's verified pairs") {
    assert(pairs(DedupQueries.ngramJaccardFast(spark, sf)) ===
      pairs(DedupQueries.ngramJaccard(spark, sf)))
  }
}
