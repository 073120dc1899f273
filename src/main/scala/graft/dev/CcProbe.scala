package graft.dev

import graft.operators.Dedup
import graft.queries.Tables.tbl
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: where does dedup_components spend its time at sf0.1?
  * Splits pair-detection cost from the CC loop and reports round count.
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val pairs = Dedup.minHashNearDups(
      tbl(spark, sfDir, "documents"), "doc_id", "text",
      shingleN = 3, numHashes = 12, bands = 4, threshold = 0.5)
      .select(col("a_id"), col("b_id"))
    val mat = time("pair detection (count)") { pairs.count() }
    println(s"[probe] pairs: $mat")
    val frozen = time("pairs localCheckpoint") { pairs.localCheckpoint(true) }
    val cc = time("CC loop (frozen pairs)") {
      Dedup.connectedComponents(frozen, "a_id", "b_id").count()
    }
    println(s"[probe] cc rows: $cc")

    // instrumented copy of the current loop: per-round timing
    time("CC instrumented") {
      val edges = frozen.select(col("a_id").as("src"), col("b_id").as("dst"))
        .union(frozen.select(col("b_id").as("src"), col("a_id").as("dst")))
        .distinct().persist()
      var labels = edges.select(col("src").as("id")).distinct()
        .withColumn("component_id", col("id")).localCheckpoint(true)
      var iter = 0
      var converged = false
      while (!converged && iter < 20) {
        val t0 = System.nanoTime()
        val viaEdges = edges
          .join(labels.withColumnRenamed("id", "src"), Seq("src"))
          .groupBy(col("dst").as("id"))
          .agg(min(col("component_id")).as("component_id"))
        val propagated = labels.select("id", "component_id")
          .union(viaEdges)
          .groupBy("id").agg(min("component_id").as("component_id"))
        val parents = propagated
          .select(col("id").as("_cid"), col("component_id").as("_pcid"))
        val next = propagated
          .join(parents, propagated("component_id") === parents("_cid"), "left")
          .join(labels.select(col("id"), col("component_id").as("_old")), Seq("id"))
          .select(col("id"),
            coalesce(col("_pcid"), propagated("component_id")).as("component_id"),
            col("_old")).localCheckpoint(true)
        val t1 = System.nanoTime()
        converged = next.filter(col("component_id") < col("_old")).isEmpty
        val t2 = System.nanoTime()
        labels = next.drop("_old")
        iter += 1
        println(f"[probe] round $iter: ckpt ${(t1 - t0) / 1e9}%.2f s, probe ${(t2 - t1) / 1e9}%.2f s")
      }
      edges.unpersist()
    }
    val full = time("full components query (as benched)") {
      graft.queries.DedupQueries.components(spark, sfDir).count()
    }
    println(s"[probe] full rows: $full")
    spark.stop()
  }
}
