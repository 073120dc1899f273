package graft

import org.scalatest.funsuite.AnyFunSuite

/** The persisted quiet floor behind `sentinel_quiet_ref`: a monotone
  * per-host, per-core-count minimum. If these invariants break, every
  * record's normalization anchor silently drifts — so they're pinned.
  * Tests run against a temp root (`rootOverride`) so they can never
  * touch the real dev/sentinel_quiet_ref_c32.txt.
  */
class SentinelSpec extends AnyFunSuite {

  private def tmpRoot() =
    java.nio.file.Files.createTempDirectory("graft-quietref")

  private def stored(root: java.nio.file.Path, cores: Int): String =
    new String(java.nio.file.Files.readAllBytes(
      root.resolve("dev").resolve(s"sentinel_quiet_ref_c$cores.txt")),
      java.nio.charset.StandardCharsets.UTF_8).trim

  test("quietRef lowers the persisted floor when beaten, never raises it") {
    val root = tmpRoot()
    assert(Sentinel.quietRef(0.700, 32, Some(root)) === 0.700)
    assert(stored(root, 32) === "0.700")
    // a taxed run must not raise the floor
    assert(Sentinel.quietRef(0.950, 32, Some(root)) === 0.700)
    assert(stored(root, 32) === "0.700")
    // a calmer run lowers it
    assert(Sentinel.quietRef(0.610, 32, Some(root)) === 0.610)
    assert(stored(root, 32) === "0.610")
  }

  test("quietRef is keyed by core count — an 8-core run neither inherits nor pollutes the 32-core floor") {
    val root = tmpRoot()
    assert(Sentinel.quietRef(0.550, 32, Some(root)) === 0.550)
    // the fixed-work sentinel runs ~4x longer on 8 cores; its floor is
    // its own file, and the 32-core floor is untouched
    assert(Sentinel.quietRef(2.100, 8, Some(root)) === 2.100)
    assert(stored(root, 32) === "0.550")
    assert(stored(root, 8) === "2.100")
    assert(Sentinel.quietRef(9.999, 32, Some(root)) === 0.550)
  }

  test("quietRef survives a corrupt floor file by re-seeding from the run") {
    val root = tmpRoot()
    val dir = root.resolve("dev")
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.write(dir.resolve("sentinel_quiet_ref_c32.txt"),
      "not-a-number".getBytes)
    assert(Sentinel.quietRef(0.640, 32, Some(root)) === 0.640)
    assert(stored(root, 32) === "0.640")
  }

  test("quietRef does NOT persist on a transient read failure — a run min above the stored floor must never replace it") {
    val root = tmpRoot()
    val dir = root.resolve("dev")
    java.nio.file.Files.createDirectories(dir)
    // a DIRECTORY at the floor path makes readAllBytes throw IOException
    // (not NoSuchFileException) — the stand-in for a permissions hiccup
    // or transient IO error: the floor may exist but is unreadable
    val p = dir.resolve("sentinel_quiet_ref_c32.txt")
    java.nio.file.Files.createDirectory(p)
    assert(Sentinel.quietRef(0.900, 32, Some(root)) === 0.900)
    // nothing was written over it: the path is still the directory
    assert(java.nio.file.Files.isDirectory(p))
  }

  test("lowering the floor appends a provenance line naming the run that set it") {
    val root = tmpRoot()
    assert(Sentinel.quietRef(0.700, 32, Some(root), tag = "bench") === 0.700)
    assert(Sentinel.quietRef(0.600, 32, Some(root), tag = "probe") === 0.600)
    // a non-lowering run leaves the ledger alone
    assert(Sentinel.quietRef(0.800, 32, Some(root), tag = "taxed") === 0.600)
    val prov = new String(java.nio.file.Files.readAllBytes(
      root.resolve("dev").resolve("sentinel_quiet_ref_c32.provenance.txt")),
      java.nio.charset.StandardCharsets.UTF_8)
    val lines = prov.trim.split("\\R").toSeq
    assert(lines.size === 2)
    assert(lines(0).startsWith("0.700 set_by=bench at="))
    assert(lines(1).startsWith("0.600 set_by=probe at="))
    assert(!prov.contains("taxed"))
  }

  test("statsJson and seriesJson are locale-proof and carry the band") {
    val s = Seq(0.70, 0.55, 0.61)
    val json = Sentinel.statsJson(s)
    assert(json.contains("\"min\":0.550") && json.contains("\"max\":0.700"))
    assert(json.contains("\"median\":0.610"))
    assert(json.contains("\"ratio\":1.273"))
    assert(Sentinel.seriesJson(s) === "[0.700,0.550,0.610]")
    assert(Sentinel.statsJson(Nil) === """{"n":0}""")
  }
}
