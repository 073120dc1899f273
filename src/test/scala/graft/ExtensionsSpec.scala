package graft

import graft.plans.GraftExtensions
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The native expression must be reachable from SQL via
  * SparkSessionExtensions registration.
  */
class ExtensionsSpec extends AnyFunSuite {

  test("dot_product_f callable from SQL through GraftExtensions") {
    // extensions bind at session BUILD time; getOrCreate would return the
    // suite-shared session, so detach it first and build a fresh session
    // (the underlying SparkContext is reused either way)
    val prior = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder().master("local[2]")
      .appName("graft-ext-test")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val r = spark.sql(
        """SELECT dot_product_f(
          |  array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT)),
          |  array(CAST(2.0 AS FLOAT), CAST(0.25 AS FLOAT))) AS d""".stripMargin)
        .head().getDouble(0)
      assert(r === 3.5)
      // SQL array literals are array<double>: the registration inserts
      // float coercion, so plain literals give the right answer too
      val r2 = spark.sql("SELECT dot_product_f(array(1.5, 2.0), array(2.0, 0.25)) AS d")
        .head().getDouble(0)
      assert(r2 === 3.5)
      val err = intercept[Exception] {
        spark.sql("SELECT dot_product_f(array(CAST(1.0 AS FLOAT)))").collect()
      }
      assert(err.getMessage.contains("2 arguments") ||
        err.getMessage.toLowerCase.contains("requires"))
    } finally {
      // don't stop(): shares the JVM-wide SparkContext with other suites;
      // restore the prior default session binding
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prior.foreach(SparkSession.setDefaultSession)
    }
  }
}
