package graft.dev

import graft.functions.TextFunctions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage timing of the BM25 plan at sf0.1. */
object Bm25Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    for (rep <- 1 to 2) {
      println(s"--- rep $rep")
      val tf = graft.plans.CachedPlans.cached(
        docs.select(col("doc_id"),
            explode(TextFunctions.tokens(lower(col("text")))).as("tok"))
          .groupBy(col("doc_id"), col("tok"))
          .agg(count(lit(1)).as("tf")))
      time("tf materialize")(tf.count())
      time("dfAll")(tf.groupBy(col("tok")).agg(count(lit(1)).as("df")).count())
      time("dl")(tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl")).count())
      time("stats")(tf.select(sum(col("tf"))).collect())
      val queries = docs.filter(col("doc_id") % 101 === 0)
      val qtok = queries.select(col("doc_id").as("q_id"),
          explode(TextFunctions.tokens(lower(col("text")))).as("tok"))
        .distinct()
      time("qtok")(qtok.count())
      val dfAll = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      val qw = org.apache.spark.sql.expressions.Window
        .partitionBy(col("q_id")).orderBy(col("df"), col("tok"))
      val qt = dfAll.join(broadcast(qtok), Seq("tok"))
        .withColumn("rn", row_number().over(qw))
        .filter(col("rn") <= 8)
        .select(col("q_id"), col("tok"), col("df"))
      time("qt")(qt.count())
      val dlDf = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
      val stats = broadcast(
        docs.select(count(lit(1)).as("n_docs"))
          .crossJoin(tf.select(sum(col("tf")).as("total_len"))))
      val hits = tf.join(broadcast(qt), Seq("tok"))
        .join(dlDf, Seq("doc_id")).crossJoin(stats)
      time("hits")(hits.count())
      val scored = hits.withColumn("score_q", expr(
        "CAST((CAST(10000 AS DECIMAL(38,0)) * (2*n_docs - 2*df + 1) * 44 * tf * total_len) DIV ((2*df + 1) * (CAST(20 AS DECIMAL(38,0)) * tf * total_len + 6 * total_len + 18 * dl * n_docs)) AS BIGINT)"))
      time("scored")(scored.count())
      time("scored agg")(scored.groupBy(col("q_id"), col("doc_id"))
        .agg(count(lit(1)).as("n_terms"), sum(col("score_q")).as("score"))
        .count())
      time("full query")(
        graft.SparkEntry.queries("text_bm25_topk")(spark, sfDir).count())
    }
  }
}
