package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one JVM-wide session — sbt
  * forks a single test JVM).
  */
object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    // measured A/B (r15): the suite is LATENCY-bound on many small
    // Spark jobs, not parallelism — 4 vs 8 threads times within noise
    // (94 vs 97 s on the two index suites) — so the default stays at 4
    // (fewer tasks per tiny job, less memory pressure); the env knob
    // remains for hosts where the trade differs. Specs that depend on
    // the partitioning read it from the conf rather than assuming 4.
    .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_TEST_CPUS", "4")}]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions",
      sys.env.getOrElse("SPARK_GRAFT_TEST_CPUS", "4"))
    // staged-commit fan-out width (the Stager pool). Distinct from the
    // session-thread knob above: component writes are LATENCY-bound
    // small jobs, so a wider stager overlaps their fixed per-job cost
    // even on 4 session cores — A/B'd per round like the CPU knob.
    .config("spark.graft.stage.parallelism",
      sys.env.getOrElse("SPARK_GRAFT_TEST_STAGE_PAR", "4"))
    // A/B knob: whole-stage fusion compile cost vs the suite's many
    // small distinct plans (expression-level codegen — incl. the custom
    // doGenCode expressions — still runs with fusion off)
    .config("spark.sql.codegen.wholeStage",
      sys.env.getOrElse("SPARK_GRAFT_TEST_WSCG", "true"))
    // plan-shape tests read scan metadata (ReadSchema, Location) from
    // rendered plan strings; the default 100-char truncation made those
    // assertions silently depend on how long the tmpdir path is (forked
    // test groups relocate java.io.tmpdir). Render enough to never clip.
    .config("spark.sql.maxMetadataStringLength", "1000")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = TestSpark.spark
    s.sparkContext.setLogLevel("WARN")
    // empty INSERT OVERWRITEs into pooled scratch tables leave the
    // scratch location deleted; these two loggers then WARN with a full
    // stack trace on the next listing — benign, and noisy enough to
    // drown real warnings in the suite output
    Seq("org.apache.spark.util.HadoopFSUtils",
      "org.apache.spark.sql.execution.streaming.sinks.FileStreamSink")
      .foreach(n => org.apache.logging.log4j.core.config.Configurator
        .setLevel(n, org.apache.logging.log4j.Level.ERROR))
    s
  }
}
