package graft.core

import org.apache.spark.sql.SparkSession

/** SparkSession factory for the engine (replaces the reference's
  * `cn/ipanel/common/SparkSession.scala:12-39`, which hand-tuned Spark 1.6
  * confs: codegen on, 200 MB broadcast threshold, Kryo).
  *
  * On Spark 4.x, codegen / compressed columnar cache / vectorized parquet
  * are default-on; we keep the raised broadcast threshold (all dimension
  * tables here are small) and turn on AQE so skewed shuffles re-plan at
  * runtime — the knob that matters at 100 TB.
  */
object GraftSession {
  def local(threads: Int = Runtime.getRuntime.availableProcessors()): SparkSession =
    builder(s"local[$threads]", threads).getOrCreate()

  /** CBO-enabled builder (round 12, VERDICT r11 #2): catalog-statistics
    * cost estimation plus the DP join-reorder rule. Only effective over
    * tables that carry `ANALYZE TABLE ... COMPUTE STATISTICS [FOR
    * COLUMNS ...]` stats — every join side needs a rowCount estimate or
    * CostBasedJoinReorder skips the tree (CboReorderSpec pins the
    * end-to-end seam: stats → estimation → a reordered TPC-H join).
    * Kept a VARIANT, not the default: the driver fixtures are bare
    * parquet reads with no catalog stats, where CBO adds planning cost
    * for nothing — a production deployment that ANALYZEs its warehouse
    * tables turns it on here. */
  def cboBuilder(master: String, shufflePartitions: Int): SparkSession.Builder =
    builder(master, shufflePartitions)
      .config("spark.sql.cbo.enabled", "true")
      .config("spark.sql.cbo.joinReorder.enabled", "true")

  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      // static (first-session-wins) JVM-level codegen class cache: the
      // default 100 entries thrash across a few hundred distinct query
      // shapes, so re-runs of a query janino-recompile every generated
      // class (r12, guide §1: measured as a 1-3 s/query driver-side gap
      // between wall time and summed job time). Scale-independent — a
      // production driver running a large query mix wants this for the
      // same reason. ~10-100 KB metaspace per entry.
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.subexpressionElimination.cache.maxEntries", "5000")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (200L * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      // harness events.ts is parquet TIMESTAMP(NANOS); read as long, convert
      // in Tables.events (Spark has no nanos timestamp type)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
}
