package graft.core

import graft.SparkSpec
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier

/** The extension-point installation path: a session built with
  * [[GraftExtensions]] injected resolves graft's functions from SQL text
  * without any code calling `Tables.load` / `ensureRegistered` — the
  * spark-submit story for clusters that use graft as a jar plus
  * `spark.sql.extensions=graft.core.GraftExtensions`.
  *
  * The conf-string route itself can't be exercised in-JVM (it's a
  * STATIC conf, read from the SparkContext's conf at session build — a
  * shared test context predates it), so the spec drives the same
  * builder seam via `withExtensions` and separately proves the class is
  * what `applyExtensions` needs: public, zero-arg-constructible, typed
  * `SparkSessionExtensions => Unit`. */
class GraftExtensionsSpec extends SparkSpec {

  test("withExtensions(GraftExtensions) session resolves graft functions without Tables.load") {
    val base = spark // materialize the shared session first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // same JVM-wide SparkContext, fresh session state + injected extensions
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      assert(s2 ne base)
      for (fn <- Seq("graft_fdot", "graft_bloom_agg", "graft_might_contain"))
        assert(s2.sessionState.functionRegistry.functionExists(FunctionIdentifier(fn)),
          s"$fn not injected")
      val dot = s2.sql(
        """SELECT graft_fdot(CAST(array(1.0, 2.0) AS ARRAY<FLOAT>),
          |                  CAST(array(3.0, 4.0) AS ARRAY<FLOAT>)) AS d""".stripMargin)
        .head().getDouble(0)
      assert(dot == 11.0)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("class shape matches what spark.sql.extensions reflective loading requires") {
    // Spark's applyExtensions does Utils.classForName(name).getConstructor()
    //   .newInstance() and casts to SparkSessionExtensions => Unit
    val inst = Class.forName("graft.core.GraftExtensions")
      .getConstructor().newInstance()
    assert(inst.isInstanceOf[org.apache.spark.sql.SparkSessionExtensions => Unit])
  }
}
