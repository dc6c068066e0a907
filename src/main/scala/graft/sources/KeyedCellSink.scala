package graft.sources

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** K3: HBase-shaped bulk cell sink (`utils/DBUtils.scala:119-133`
  * `saveToHbase` — an RDD of Puts through `TableOutputFormat`).
  *
  * Re-expressed for bulk-load scale rather than per-Put RPCs: HFile bulk
  * load requires cells GLOBALLY sorted by rowkey with one file per region,
  * so the Spark-side contract here is `repartitionByRange(regions, rowkey)`
  * + `sortWithinPartitions(rowkey)` — range partitions are ordered and
  * non-overlapping, so partition p is exactly region p's sorted run
  * (O4's `sortWithinPartitions`, here in its load-bearing role). The
  * HBase client/HFile writer itself is out of this env and stays behind
  * [[CellWriter]]; a `BufferedMutator` or `HFile.Writer` slots straight
  * into the factory. Writers are executor-side (one per partition, unlike
  * the driver-side [[HttpPush]]) because this sink carries facts, not
  * report heads; cell writes are idempotent on (rowkey, qualifier), so a
  * task retry re-writes the same cells rather than duplicating.
  *
  * Monotonic rowkeys (timestamps, sequential ids) hotspot the tail region
  * under bulk write — the standard fix is a hash-salt prefix bucket,
  * [[saltedRowkey]], which spreads the load while keeping per-bucket scan
  * order (readers fan out one scan per salt bucket).
  */
object KeyedCellSink {

  /** One region's writer. `put` receives rows in ascending rowkey order;
    * `close` flushes. Constructed per partition ON THE EXECUTOR by the
    * (serializable) factory passed to [[bulkWrite]]. */
  trait CellWriter {
    def put(rowkey: String, cells: Seq[(String, Array[Byte])]): Unit
    def close(): Unit
  }

  /** Salted rowkey: `NN|key` where NN = hash(key) mod buckets, zero-padded
    * so string order equals (bucket, key) order. */
  def saltedRowkey(key: Column, buckets: Int): Column = {
    require(buckets >= 1 && buckets <= 100, s"salt buckets must be 1..100 (got $buckets)")
    concat(lpad(pmod(hash(key), lit(buckets)).cast("string"), 2, "0"), lit("|"), key)
  }

  /** Bulk-write `df` as keyed cells: qualifier = column name, value =
    * UTF-8 of the column's string form (the reference stores readable
    * strings via `Bytes.toBytes`), NULL columns skipped (HBase has no
    * null cells — absence is the encoding). `writerFactory(p)` runs on
    * the executor for range-partition p; rows arrive in ascending rowkey
    * order and partitions cover disjoint, ordered key ranges. */
  def bulkWrite(df: DataFrame, rowkeyCol: String, regions: Int,
      writerFactory: Int => CellWriter): Unit = {
    require(regions >= 1, s"regions must be >= 1 (got $regions)")
    val valueCols = df.columns.filterNot(_ == rowkeyCol)
    require(valueCols.nonEmpty, "cell sink needs at least one value column")
    val encoded = df
      .filter(col(rowkeyCol).isNotNull)
      .select(
        col(rowkeyCol).cast("string").as("rk") +:
          valueCols.map(c => col(c).cast("string").as(c)): _*)
      .repartitionByRange(regions, col("rk"))
      .sortWithinPartitions("rk")
    encoded.foreachPartition { rows: Iterator[Row] =>
      if (rows.hasNext) {
        val w = writerFactory(TaskContext.getPartitionId())
        try rows.foreach { r =>
          val cells = valueCols.indices.flatMap { i =>
            val v = r.getString(i + 1)
            if (v == null) None
            else Some(valueCols(i) -> v.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          }
          w.put(r.getString(0), cells)
        } finally w.close()
      }
    }
  }
}
