package graft

import org.scalatest.funsuite.AnyFunSuite

/** Demonstrates the build's canceled-test guard (build.sbt): with
  * GRAFT_FORCE_CANCEL set, this test cancels, and `sbt test` must FAIL
  * even though nothing failed — canceled means "did not run", the
  * silent mode that hid 6 PgLiveSpec tests for a round when the forked
  * groups' work dirs were unreadable to the postgres user. Without the
  * env var this is an instant pass.
  */
class CanceledGuardSpec extends AnyFunSuite {
  test("forced cancel trips the build guard when GRAFT_FORCE_CANCEL is set") {
    if (sys.env.contains("GRAFT_FORCE_CANCEL"))
      cancel("forced by GRAFT_FORCE_CANCEL to demonstrate the guard")
  }
}
