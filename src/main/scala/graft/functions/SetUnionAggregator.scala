package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable

/** Exact distinct-set union as a typed Aggregator (SURVEY §2.4 A8, H-4).
  *
  * The reference computes exact cross-day UV by storing per-day user-id
  * arrays and `reduceByKey`-unioning Scala Sets
  * (`homed/repots/LiveChannelStatistics.scala:522-546,574-600`). This is
  * that operator as a Catalyst-managed aggregate: partial aggregation
  * (map-side combine) happens automatically, the buffer is a HashSet so
  * duplicates collapse at insert time, and `finish` sorts so downstream
  * hashing/oracle comparison is deterministic (H-3).
  *
  * Scale: memory per group is O(distinct values in group) — the same
  * envelope as the reference's arrays. For unbounded groups switch to the
  * sketch path (`approx_count_distinct`, already covered by q08).
  */
class StringSetUnion extends Aggregator[String, mutable.HashSet[String], Array[String]] {
  override def zero: mutable.HashSet[String] = mutable.HashSet.empty
  override def reduce(b: mutable.HashSet[String], a: String): mutable.HashSet[String] = {
    if (a != null) b += a
    b
  }
  override def merge(b1: mutable.HashSet[String], b2: mutable.HashSet[String]): mutable.HashSet[String] =
    b1 ++= b2
  override def finish(b: mutable.HashSet[String]): Array[String] = {
    val arr = b.toArray
    java.util.Arrays.sort(arr, java.util.Comparator.naturalOrder[String]())
    arr
  }
  override def bufferEncoder: Encoder[mutable.HashSet[String]] =
    Encoders.kryo[mutable.HashSet[String]]
  override def outputEncoder: Encoder[Array[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[String]]()
}
