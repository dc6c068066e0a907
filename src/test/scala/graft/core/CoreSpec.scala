package graft.core

import graft.SparkSpec

/** Driver-facing invariants: the session factory's scale-critical confs,
  * the table loaders, and the automatic native-function registration. */
class CoreSpec extends SparkSpec {

  test("GraftSession builder sets the scale-critical confs") {
    val b = GraftSession.builder("local[2]", 2).getOrCreate()
    assert(b.conf.get("spark.sql.adaptive.enabled") == "true")
    assert(b.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true")
    assert(b.conf.get("spark.sql.session.timeZone") == "UTC")
    assert(b.conf.get("spark.sql.autoBroadcastJoinThreshold").toLong ==
      200L * 1024 * 1024)
    // getOrCreate may reuse the suite session — confs above are what we
    // assert; shuffle partitions come from whichever session won
  }

  test("every harness table loads with a non-empty schema") {
    Tables.all.foreach { t =>
      val df = Tables.load(spark, sfDir, t)
      assert(df.columns.nonEmpty, s"table $t has no columns")
    }
    // events gets its nanos column restored to a usable timestamp
    val ts = Tables.events(spark, sfDir).schema("ts").dataType
    assert(ts == org.apache.spark.sql.types.TimestampType)
  }

  test("native functions are registered by any table load") {
    Tables.load(spark, sfDir, "region")
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    assert(spark.sessionState.functionRegistry
      .functionExists(FunctionIdentifier("graft_fdot")))
  }
}
