package graft

import graft.functions.TopKAggregator
import org.apache.spark.sql.functions._

class TopKAggregatorSpec extends SparkSpec {
  import spark.implicits._

  test("typed top-k agrees with window ranking, incl. tie-breaks") {
    val rnd = new scala.util.Random(7)
    val scored = (1L to 5000L).map { id =>
      (id % 10, id, math.floor(rnd.nextDouble() * 50) / 50.0) // forced ties
    }.toDS().toDF("grp", "id", "score")

    // window formulation
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"grp").orderBy($"score".desc, $"id")
    val expected = scored.withColumn("rk", row_number().over(w))
      .filter($"rk" <= 5)
      .select($"grp", $"id", $"score")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    // aggregator formulation: bounded buffer, partial-agg friendly
    val topK = new TopKAggregator(5).toColumn
    val got = scored.as[(Long, Long, Double)]
      .groupByKey(_._1)
      .mapValues(t => (t._3, t._2))
      .agg(topK.name("top"))
      .flatMap { case (grp, top) => top.map(p => (grp, p._2, p._1)) }
      .collect().toSet

    assert(got === expected)
  }
}
