package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the harness-provided parquet tables (TESTDATA.md).
  *
  * Every query in [[graft.SparkEntry.queries]] receives an `sfDir`
  * (e.g. `/root/testdata/sf0.01`) and reads through these helpers so the
  * scan always goes through one place: plain parquet scans that Catalyst
  * can push filters/pruning into. At cluster scale these would be
  * partitioned tables; the API surface is identical.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // install graft's native expressions into whatever session runs the
    // query — every query path goes through a table load
    graft.expressions.GraftFunctions.ensureRegistered(spark)
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** The harness has written `events.ts` in two parquet flavors across
    * rounds: TIMESTAMP(NANOS) (no native Spark type — sessions set
    * `spark.sql.legacy.parquet.nanosAsLong=true`, see [[graft.core.GraftSession]],
    * and the scan yields epoch-nano longs) and plain TIMESTAMP(MICROS) with
    * `isAdjustedToUTC=false` (Spark reads TIMESTAMP_NTZ). Normalize both once
    * here to a proper UTC TimestampType (micros — same instants DuckDB sees)
    * so every downstream query sees one normal timestamp column regardless of
    * which generator wrote the file. Sessions run in UTC, so the NTZ→TZ cast
    * is a pure type change, not a wall-clock shift.
    */
  private def restoreNanoTs(df: DataFrame, col: String): DataFrame =
    df.schema(col).dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn(col, org.apache.spark.sql.functions.expr(s"timestamp_micros($col div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn(col, df(col).cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  // o_orderdate gets the same flavor guard as events.ts: the harness
  // regenerated events as TIMESTAMP(NANOS) in round 5 and nothing says
  // orders is immune. Today's MICROS/NTZ form is cast NTZ→UTC
  // TimestampType (pure type change in a UTC session — identical
  // wall-clock strings/dates downstream); a NANOS regen would otherwise
  // surface as LongType and break every date query on orders.
  def orders(s: SparkSession, d: String): DataFrame =
    restoreNanoTs(load(s, d, "orders"), "o_orderdate")
  // l_shipdate: same flavor guard as o_orderdate/ts (see orders above)
  def lineitem(s: SparkSession, d: String): DataFrame =
    restoreNanoTs(load(s, d, "lineitem"), "l_shipdate")
  def events(s: SparkSession, d: String): DataFrame     = restoreNanoTs(load(s, d, "events"), "ts")
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
