package graft.sources

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import scala.jdk.CollectionConverters._

/** IoOps.writeBloomFiltered: the parquet footers must actually carry
  * bloom filters for the requested columns (offset present + readable +
  * positive on a known value), and NOT for others — asserted on the
  * file metadata itself, not just on write options being set. */
class ParquetBloomSpec extends SparkSpec {

  test("bloom-filtered write plants readable bloom filters on the requested column only") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_pqbloom").toString + "/t"
    val li = graft.core.Tables.lineitem(spark, sfDir)
      .select($"l_orderkey", $"l_partkey", $"l_quantity")
    IoOps.writeBloomFiltered(li, dir, Seq("l_orderkey"), ndv = 10000L)

    val part = new java.io.File(dir).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(
      new Path(part.getAbsolutePath), spark.sparkContext.hadoopConfiguration))
    try {
      val rg = reader.getFooter.getBlocks.get(0)
      val cols = rg.getColumns.asScala
      val keyCol = cols.find(_.getPath.toDotString == "l_orderkey").get
      val otherCol = cols.find(_.getPath.toDotString == "l_quantity").get
      assert(keyCol.getBloomFilterOffset > 0, "no bloom filter on l_orderkey")
      assert(otherCol.getBloomFilterOffset < 0, "unexpected bloom filter on l_quantity")

      // functional: a value present in the file must hash positive
      val bf = reader.getBloomFilterDataReader(rg).readBloomFilter(keyCol)
      assert(bf != null, "bloom filter unreadable")
      val someKey = spark.read.parquet(dir).select($"l_orderkey")
        .head().getLong(0)
      assert(bf.findHash(bf.hash(someKey)), "present key hashed negative")
    } finally reader.close()
  }
}
