package graft.dev

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cross-PROCESS chaos harness for the persisted text index's writer
  * lease + staged-commit contract (r19 judge ask #6). The spec-level
  * crash matrix injects failures per staged-commit verb INSIDE one JVM;
  * what it cannot exercise is the r15-bug shape — a second session
  * holding a probe open while the writer dies for real. This harness
  * (driven by dev/chaos_lease.sh) runs three separate JVMs per
  * iteration:
  *
  *   - [[ChaosAbsorb]]  appends a fresh batch and is `kill -9`ed by the
  *     driver at a RANDOM point after it prints `ABSORB_START` — some
  *     kills land mid-staged-commit, some after publish, some during
  *     session spin-down;
  *   - [[ChaosProbe]]   concurrently RE-LOADS the index and probes it in
  *     a loop across the kill, asserting every load+probe succeeds and
  *     that the observed live-id counts take at most TWO distinct values
  *     (pre-commit and post-commit) — a third value is a torn read;
  *   - [[ChaosCheck]]   after the dust settles, loads the index (recover
  *     rolls back a stale holder's staging), counts live ids per
  *     generational component and asserts all four components agree —
  *     the all-or-nothing publish invariant — printing one JSON line the
  *     driver gates on (`live` must equal the pre count or pre + batch).
  *
  * leaseStaleMs is shortened process-wide in these mains so a killed
  * holder's lease goes stale in seconds rather than the production
  * 10 minutes — the reclaim path itself is part of what's under test.
  */
object ChaosLease {

  private[dev] def session(threads: Int = 8): SparkSession = {
    val spark = SparkSession.builder().master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", threads)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.operators.DedupIndex.leaseStaleMs =
      sys.env.getOrElse("SPARK_GRAFT_CHAOS_LEASE_MS", "2000").toLong
    spark
  }

  /** Corpus/batch rows: the sf documents table replicated REP times
    * (default 20 → 10k rows from sf0.01's 500) so one absorb's staged
    * commit spans several seconds — a kill window wide enough that the
    * random kill lands at genuinely different staged-commit points
    * across iterations. Ids stay disjoint across reps; text varies per
    * rep so content hashes differ.
    */
  private[dev] def docs(spark: SparkSession): DataFrame = {
    val rep = sys.env.getOrElse("SPARK_GRAFT_CHAOS_REP", "20").toInt
    val base = spark.read.parquet(sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.01") + "/documents.parquet")
      .select(col("doc_id"), col("text"))
    base.crossJoin(spark.range(rep).select(col("id").as("r")))
      .select((col("doc_id") * rep + col("r")).as("doc_id"),
        concat(col("text"), lit(" rep-"), col("r")).as("text"))
  }

  private[dev] def indexDir: String =
    sys.env.getOrElse("SPARK_GRAFT_CHAOS_DIR", "/tmp/graft_chaos/idx")

  /** Distinct live ids of one public component view ([[graft.operators
    * .DedupIndex.loadText]] already applies the tombstone restriction
    * and drops gen). Computed component-by-component so a partially-
    * published absorb (some components carrying the new batch, others
    * not) cannot agree.
    */
  private[dev] def liveIds(c: DataFrame): Long =
    c.select("id").distinct().count()
}

/** Builds the seed index (arg `seed`) or absorbs one fresh batch whose
  * ids/content are keyed by SPARK_GRAFT_CHAOS_OFFSET. Prints
  * ABSORB_START immediately before entering appendText so the driver
  * can aim its kill inside the staged-commit region.
  */
object ChaosAbsorb {
  def main(args: Array[String]): Unit = {
    val spark = ChaosLease.session()
    val base = ChaosLease.docs(spark)
    if (args.headOption.contains("seed")) {
      graft.operators.DedupIndex.writeText(base, "doc_id", "text",
        ChaosLease.indexDir)
      println(s"SEED_DONE rows=${base.count()}")
    } else {
      val off = sys.env("SPARK_GRAFT_CHAOS_OFFSET").toLong
      val batch = base.select(
        (col("doc_id") + off).as("doc_id"),
        concat(col("text"), lit(s" chaos-$off")).as("text"))
      println("ABSORB_START"); System.out.flush()
      graft.operators.DedupIndex.appendText(batch, "doc_id", "text",
        ChaosLease.indexDir)
      println("ABSORB_DONE")
    }
    spark.stop()
  }
}

/** Re-load + probe loop across the kill window: every iteration loads
  * the index fresh (the relation-cache shape that bit r15) and runs the
  * LSH probe. Exit 0 iff every load+probe succeeded AND at most two
  * distinct live counts were observed.
  */
object ChaosProbe {
  def main(args: Array[String]): Unit = {
    val spark = ChaosLease.session()
    val secs = sys.env.getOrElse("SPARK_GRAFT_CHAOS_PROBE_SECS", "25").toInt
    val probeBatch = ChaosLease.docs(spark)
      .filter(col("doc_id") % 7 === 3).limit(200)
      .select((col("doc_id") + 9000000000L).as("doc_id"),
        concat(col("text"), lit(" probe")).as("text"))
      .cache()
    probeBatch.count()
    val deadline = System.nanoTime() + secs * 1000000000L
    val seen = scala.collection.mutable.LinkedHashSet.empty[Long]
    var loops = 0
    var failure: Option[Throwable] = None
    while (System.nanoTime() < deadline && failure.isEmpty) {
      try {
        val idx = graft.operators.DedupIndex.loadText(spark,
          ChaosLease.indexDir)
        graft.operators.Dedup.incrementalMinHashNearDupsReportIndexed(
          probeBatch, "doc_id", "text", idx, threshold = 0.5)
          .pairs.count()
        seen += ChaosLease.liveIds(idx.sigs)
        loops += 1
      } catch { case t: Throwable => failure = Some(t) }
    }
    spark.stop()
    failure match {
      case Some(t) =>
        println(s"PROBE_FAIL after $loops loops: ${t.getClass.getName}: ${
          Option(t.getMessage).getOrElse("").linesIterator.take(1)
            .mkString}")
        sys.exit(1)
      case None if seen.size > 2 =>
        println(s"PROBE_TORN counts=${seen.mkString(",")}")
        sys.exit(2)
      case None =>
        println(s"PROBE_OK loops=$loops counts=${seen.mkString(",")}")
    }
  }
}

/** Post-kill integrity gate: one JSON line with the per-component live
  * counts; exit 1 unless all four generational components agree.
  */
object ChaosCheck {
  def main(args: Array[String]): Unit = {
    val spark = ChaosLease.session()
    val idx = graft.operators.DedupIndex.loadText(spark,
      ChaosLease.indexDir)
    val comps = Seq("sigs" -> idx.sigs, "dochashes" -> idx.dochashes,
      "counts" -> idx.counts, "simhashes" -> idx.simhashes)
    val ns = comps.map { case (n, c) => n -> ChaosLease.liveIds(c) }
    spark.stop()
    val consistent = ns.map(_._2).distinct.size == 1
    println(s"""{"metric":"chaos_check","live":${ns.head._2},""" +
      s""""consistent":$consistent,""" +
      ns.map { case (n, v) => s""""$n":$v""" }.mkString(",") + "}")
    if (!consistent) sys.exit(1)
  }
}
