package graft.sources

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** K3: HBase-shaped bulk cell sink (`utils/DBUtils.scala:119-133`
  * `saveToHbase` — an RDD of Puts through `TableOutputFormat`).
  *
  * Re-expressed for bulk-load scale rather than per-Put RPCs: HFile bulk
  * load requires cells GLOBALLY sorted by rowkey with one file per region.
  * Two variants:
  *
  *  - [[bulkWrite]] (region COUNT): `repartitionByRange(regions, rowkey)`
  *    + `sortWithinPartitions(rowkey)` — partitions are disjoint ordered
  *    sorted runs, but the boundaries come from SAMPLING, so the
  *    partition index is NOT a region id of a pre-split table (and fewer
  *    than `regions` partitions may materialize). Writers must derive
  *    their target region from the keys they receive (e.g. the first
  *    put's key), exactly as an HFile writer rolls files on region
  *    boundaries.
  *  - [[bulkWriteWithSplits]] (explicit SPLIT KEYS — the pre-split
  *    table's region start keys): a custom partitioner routes each key to
  *    its region by binary search, so partition p IS region p by
  *    construction; `repartitionAndSortWithinPartitions` (the canonical
  *    bulk-load idiom) gives the in-region sort in the same exchange.
  *
  * The HBase client/HFile writer itself is out of this env and stays
  * behind [[CellWriter]]; a `BufferedMutator` or `HFile.Writer` slots
  * straight into the factory. Writers are executor-side (one per partition, unlike
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
      writePartition(rows, valueCols, writerFactory)
    }
  }

  /** Bulk-write against a PRE-SPLIT table: `splitKeys` are the start keys
    * of regions 1..n (region 0 starts at the empty key), exactly what
    * `Admin.getRegions` hands back. Region routing is a binary search —
    * a pure function of the key, independent of data distribution — so
    * partition p is region p by construction, including empty regions.
    * `repartitionAndSortWithinPartitions` does the routing and the
    * in-region rowkey sort in one exchange (the canonical HFile
    * bulk-load shape). */
  def bulkWriteWithSplits(df: DataFrame, rowkeyCol: String, splitKeys: Seq[String],
      writerFactory: Int => CellWriter): Unit = {
    require(splitKeys.nonEmpty, "need at least one split key (else use bulkWrite)")
    require(splitKeys == splitKeys.sorted && splitKeys.distinct == splitKeys,
      "split keys must be strictly ascending")
    val valueCols = df.columns.filterNot(_ == rowkeyCol)
    require(valueCols.nonEmpty, "cell sink needs at least one value column")
    val splits = splitKeys.toArray
    val partitioner = new org.apache.spark.Partitioner {
      override def numPartitions: Int = splits.length + 1
      override def getPartition(key: Any): Int = {
        val i = java.util.Arrays.binarySearch(
          splits.asInstanceOf[Array[AnyRef]], key.asInstanceOf[String])
        // exact hit on region p's start key belongs to region p (= i+1);
        // otherwise -(i+1) is the count of start keys below the key
        if (i >= 0) i + 1 else -(i + 1)
      }
    }
    val pairs = df
      .filter(col(rowkeyCol).isNotNull)
      .select(
        col(rowkeyCol).cast("string").as("rk") +:
          valueCols.map(c => col(c).cast("string").as(c)): _*)
      .rdd.map(r => (r.getString(0), r))
    pairs.repartitionAndSortWithinPartitions(partitioner)
      .foreachPartition { kvs: Iterator[(String, Row)] =>
        writePartition(kvs.map(_._2), valueCols, writerFactory)
      }
  }

  private def writePartition(rows: Iterator[Row], valueCols: Array[String],
      writerFactory: Int => CellWriter): Unit = {
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
