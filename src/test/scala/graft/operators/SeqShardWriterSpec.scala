package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[SeqPacker.writeShards]]/[[SeqPacker.readShards]] — the
  * export layer q249 drives: faithful round trip, manifest/file
  * agreement, retry-idempotence after both crash and success (the
  * VectorIndex tmp-swap pattern), and the empty-export read path
  * (explicit schemas, no parquet inference failure). */
class SeqShardWriterSpec extends SparkSpec {

  import SeqPacker.Piece

  private def dir(tag: String): String = java.nio.file.Paths.get(
    System.getProperty("java.io.tmpdir"), s"graft_shardspec_$tag").toString

  private def fixturePacked = {
    val s = spark
    import s.implicits._
    val ps = Seq(
      Piece("en", 0L, 0L, 0L, 1L, 400L), Piece("en", 0L, 1L, 0L, 2L, 200L),
      Piece("en", 0L, 2L, 0L, 3L, 512L), Piece("en", 1L, 0L, 0L, 4L, 100L),
      Piece("fr", 0L, 0L, 0L, 5L, 300L), Piece("fr", 0L, 1L, 0L, 6L, 300L),
      Piece("fr", 0L, 2L, 0L, 7L, 100L)).toDS()
    SeqPacker.pack(ps, 512)
  }

  test("round trip: read-back placement rows equal the packed frame") {
    val s = spark
    val d = dir("rt")
    val packed = fixturePacked
    SeqPacker.writeShards(packed, d)
    val (files, man) = SeqPacker.readShards(s, d)
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select("lang", "bucket", "ord1", "ord2", "docId", "size", "seq")
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    assert(key(files) == key(packed.toDF()), "placement rows must survive")
    // manifest equals an independent recomputation from the FILES
    val recomputed = SeqPacker.manifest(files)
    assert(recomputed.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq ==
      man.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq,
      "manifest must equal the census of what was actually written")
    // data layout is directory-partitioned by (lang, bucket)
    val root = new java.io.File(s"$d/data")
    assert(root.listFiles().exists(f => f.getName.startsWith("lang=")),
      "data must be partitioned by lang")
  }

  test("retry-idempotent: rerun after success and after a simulated " +
    "crash both converge; stale tmp never leaks into the export") {
    val s = spark
    val d = dir("retry")
    val packed = fixturePacked
    SeqPacker.writeShards(packed, d)
    val first = SeqPacker.readShards(s, d)._1.collect()
      .map(_.toSeq).sortBy(_.mkString("|")).toSeq
    // simulated crash: a half-built tmp from a dead attempt
    val tmp = new java.io.File(d + ".tmp/data")
    tmp.mkdirs()
    val junk = new java.io.File(tmp, "part-junk.parquet")
    java.nio.file.Files.write(junk.toPath, Array[Byte](1, 2, 3))
    SeqPacker.writeShards(packed, d)
    val second = SeqPacker.readShards(s, d)._1.collect()
      .map(_.toSeq).sortBy(_.mkString("|")).toSeq
    assert(second == first, "rerun must converge to identical content")
    assert(!new java.io.File(d + ".tmp").exists(), "tmp must be swapped away")
    assert(!new java.io.File(s"$d/data/part-junk.parquet").exists() &&
      SeqPacker.readShards(s, d)._1.count() == first.size,
      "crashed-attempt junk must not survive into the export")
  }

  test("empty export reads back as empty frames (explicit schemas)") {
    val s = spark
    import s.implicits._
    val d = dir("empty")
    SeqPacker.writeShards(
      SeqPacker.pack(Seq.empty[Piece].toDS(), 512), d)
    val (files, man) = SeqPacker.readShards(s, d)
    assert(files.count() == 0 && man.count() == 0)
    assert(files.schema == SeqPacker.shardSchema)
  }
}
