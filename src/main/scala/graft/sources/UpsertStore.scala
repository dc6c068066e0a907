package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.col

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
    val existing =
      try Some(spark.read.parquet(path))
      catch { case _: Exception => None }
    val merged = existing match {
      case None => rows
      case Some(cur) =>
        // keep current rows whose key is NOT being replaced, then append
        cur.join(rows.select(keys.map(col): _*).distinct(), keys, "left_anti")
          .unionByName(rows)
    }
    // rewrite via a temp dir: the plan reads `path` lazily, so writing
    // over it in place would truncate its own input
    val tmp = path + ".tmp"
    merged.write.mode(SaveMode.Overwrite).parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), new org.apache.hadoop.fs.Path(path))
  }

  override def read(spark: org.apache.spark.sql.SparkSession): DataFrame =
    spark.read.parquet(path)

  /** Wire into a stream: `stream.writeStream.foreachBatch(store.asBatchSink)` —
    * the micro-batch replacement for the reference's per-batch Phoenix
    * overwrite (R4's external round-trip, now one merge per trigger). */
  def asBatchSink: (DataFrame, Long) => Unit = (batch, _) => upsert(batch)
}
