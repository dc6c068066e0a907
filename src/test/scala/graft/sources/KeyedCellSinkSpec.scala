package graft.sources

import graft.SparkSpec
import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._

/** K3 bulk-cell sink against an in-JVM recording backend (local[*] tasks
  * share the JVM, so a static registry stands in for the HBase client). */
object KeyedCellSinkSpec {
  // runId -> partitionId -> rowkeys in arrival order (+ cells of the last row)
  val seen = new ConcurrentHashMap[String, ConcurrentHashMap[Int, Vector[(String, Map[String, String])]]]()

  final class RecordingWriter(runId: String, pid: Int) extends KeyedCellSink.CellWriter {
    private var buf = Vector.empty[(String, Map[String, String])]
    override def put(rowkey: String, cells: Seq[(String, Array[Byte])]): Unit =
      buf :+= (rowkey, cells.map { case (q, v) => q -> new String(v, "UTF-8") }.toMap)
    override def close(): Unit =
      seen.computeIfAbsent(runId, _ => new ConcurrentHashMap()).put(pid, buf)
  }
}

class KeyedCellSinkSpec extends SparkSpec {
  import KeyedCellSinkSpec._

  private def run(runId: String, df: org.apache.spark.sql.DataFrame,
      regions: Int): Map[Int, Vector[(String, Map[String, String])]] = {
    KeyedCellSink.bulkWrite(df, "rk", regions,
      pid => new RecordingWriter(runId, pid))
    seen.get(runId).asScala.toMap.map { case (p, v) => (p.toInt, v) }
  }

  test("bulkWrite delivers every row exactly once, sorted within disjoint ordered ranges") {
    import spark.implicits._
    val df = spark.range(500).selectExpr(
      "concat('k', lpad(cast(pmod(id * 7919, 500) as string), 4, '0')) AS rk",
      "cast(id as string) AS v", "cast(id % 3 as string) AS grp")
    val parts = run("sorted", df, regions = 4)

    val all = parts.values.flatten.map(_._1).toVector
    assert(all.size == 500, s"expected 500 cells, saw ${all.size}")
    assert(all.distinct.size == 500, "rowkeys must be unique across partitions")
    // sorted within each partition
    parts.foreach { case (p, rows) =>
      val ks = rows.map(_._1)
      assert(ks == ks.sorted, s"partition $p not sorted: ${ks.take(5)}...")
    }
    // ranges disjoint and ordered by partition id (the bulk-load contract:
    // partition p IS region p's sorted run)
    val ranges = parts.toVector.sortBy(_._1)
      .map { case (p, rows) => (p, rows.head._1, rows.last._1) }
    ranges.sliding(2).foreach {
      case Vector((_, _, hiA), (_, loB, _)) => assert(hiA < loB, s"$hiA !< $loB")
      case _ =>
    }
  }

  test("null rowkeys are dropped and null cells are omitted, not written") {
    import spark.implicits._
    val df = Seq(("a", Some("1"), "x"), (null, Some("2"), "y"), ("b", None, "z"))
      .toDF("rk", "v", "w")
    val parts = run("nulls", df, regions = 1)
    val rows = parts.values.flatten.toMap
    assert(rows.keySet == Set("a", "b"))
    assert(rows("a") == Map("v" -> "1", "w" -> "x"))
    assert(rows("b") == Map("w" -> "z"), "null cell must be absent, not empty")
  }

  test("bulkWriteWithSplits routes every key to exactly the region its split range dictates") {
    import spark.implicits._
    val df = spark.range(300).selectExpr(
      "concat('k', lpad(cast(pmod(id * 7919, 300) as string), 4, '0')) AS rk",
      "cast(id as string) AS v")
    // region starts: r0 = (-inf, k0100), r1 = [k0100, k0200), r2 = [k0200, inf)
    KeyedCellSink.bulkWriteWithSplits(df, "rk", Seq("k0100", "k0200"),
      pid => new RecordingWriter("splits", pid))
    val parts = seen.get("splits").asScala.toMap.map { case (p, v) => (p.toInt, v) }
    assert(parts.values.map(_.size).sum == 300)
    // partition id IS the region id — verify against the pure range rule,
    // and rows arrive sorted (repartitionAndSortWithinPartitions contract)
    parts.foreach { case (p, rows) =>
      val ks = rows.map(_._1)
      assert(ks == ks.sorted, s"region $p not sorted")
      ks.foreach { k =>
        val expected = if (k < "k0100") 0 else if (k < "k0200") 1 else 2
        assert(p == expected, s"key $k landed in region $p, belongs to $expected")
      }
    }
    // the exact-hit boundary key belongs to the region it starts
    assert(parts(1).map(_._1).contains("k0100"))
  }

  test("saltedRowkey spreads monotonic keys across buckets, order = (bucket, key)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val salted = spark.range(1000)
      .selectExpr("concat('2026081200', lpad(cast(id as string), 4, '0')) AS ts_key")
      .select(KeyedCellSink.saltedRowkey(col("ts_key"), 8).as("rk"))
      .as[String].collect()
    val buckets = salted.map(_.take(2)).distinct
    assert(buckets.length == 8, s"monotonic keys must spread over all 8 salt buckets, got ${buckets.length}")
    salted.foreach(k => assert(k.matches("^\\d{2}\\|2026081200\\d{4}$"), k))
    // within one bucket, salted order == raw key order (scan order preserved)
    val b0 = salted.filter(_.startsWith(buckets.sorted.head)).sorted
    assert(b0.map(_.drop(3)).toVector == b0.map(_.drop(3)).sorted.toVector)
  }
}
