package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.col
import org.apache.hadoop.fs.Path

/** Keyed upsert sinks (SURVEY §2.1 K2): the reference overwrites Phoenix
  * state tables per batch (`utils/DBUtils.scala:142-162`); here the same
  * semantics are a MERGE — new rows replace existing rows with equal
  * keys. [[ParquetUpsertStore]] is the self-contained implementation
  * (anti-join + union + rewrite — at lake scale this maps 1:1 to a Delta
  * `MERGE WHEN MATCHED`); a JDBC store implements the same trait with
  * `DELETE ... WHERE key IN` + append inside one transaction. */
trait UpsertStore {
  def upsert(rows: DataFrame): Unit
  def read(spark: org.apache.spark.sql.SparkSession): DataFrame
}

final class ParquetUpsertStore(path: String, keys: Seq[String]) extends UpsertStore {

  override def upsert(rows: DataFrame): Unit = {
    val spark = rows.sparkSession
    // resolve the filesystem OF THE STORE PATH (not fs.defaultFS — a
    // store on s3a/file while defaultFS is hdfs would throw "Wrong FS")
    val storePath = new Path(path)
    val fs = storePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // emptiness is decided by an existence probe, NEVER by catching read
    // errors: a transient read failure mistaken for "empty store" would
    // delete all accumulated state below
    val existing =
      if (fs.exists(storePath)) Some(spark.read.parquet(path)) else None
    // rows feeds both the anti-join key set and the union — persist so
    // the (possibly expensive) upstream plan runs once per upsert
    rows.persist()
    try {
      val merged = existing match {
        case None => rows
        case Some(cur) =>
          // keep current rows whose key is NOT being replaced, then append
          cur.join(rows.select(keys.map(col): _*).distinct(), keys, "left_anti")
            .unionByName(rows)
      }
      // rewrite via a temp dir: the plan reads `path` lazily, so writing
      // over it in place would truncate its own input
      val tmpPath = new Path(path + ".tmp")
      merged.write.mode(SaveMode.Overwrite).parquet(tmpPath.toString)
      // the swap must fail loudly: rename returning false (object-store
      // quirks, races) with the old path already deleted would otherwise
      // read as success while the store is gone
      if (fs.exists(storePath) && !fs.delete(storePath, true))
        throw new java.io.IOException(s"upsert: failed to delete old store $path")
      if (!fs.rename(tmpPath, storePath))
        throw new java.io.IOException(
          s"upsert: failed to promote $tmpPath to $path (merged data left in .tmp)")
    } finally {
      rows.unpersist()
    }
  }

  override def read(spark: org.apache.spark.sql.SparkSession): DataFrame =
    spark.read.parquet(path)

  /** Wire into a stream: `stream.writeStream.foreachBatch(store.asBatchSink)` —
    * the micro-batch replacement for the reference's per-batch Phoenix
    * overwrite (R4's external round-trip, now one merge per trigger). */
  def asBatchSink: (DataFrame, Long) => Unit = (batch, _) => upsert(batch)
}
