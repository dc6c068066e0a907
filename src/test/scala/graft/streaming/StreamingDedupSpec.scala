package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import scala.collection.mutable

class StreamingDedupSpec extends SparkSpec {

  // a 40-token text with a distinctive shingle set; `tag` makes families
  private def text(tag: String, perturb: Boolean = false): String = {
    val base = (1 to 40).map(i => s"w$tag$i")
    val toks = if (perturb) base.updated(7, "PERTURBED") else base
    toks.mkString(" ")
  }

  test("verdicts accumulate across micro-batches through the persisted index") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import s.implicits._
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_sdedup").toString

    val got = mutable.Map[Long, String]()
    val in = MemoryStream[(Long, String)]
    val q = in.toDF().toDF("doc_id", "text")
      .writeStream
      .foreachBatch(StreamingDedup.incrementalDedupSink(s"$dir/index",
        (v, _) => v.collect().foreach(r => got(r.getLong(0)) = r.getString(1))))
      .start()

    // batch 1: two distinct docs — both new
    in.addData((1L, text("a")), (2L, text("b")))
    q.processAllAvailable()
    assert(got.toMap == Map(1L -> "new", 2L -> "new"))

    // batch 2: exact copy of 1, near-dup (one-token perturbation) of 2,
    // genuinely new doc 5
    got.clear()
    in.addData((3L, text("a")), (4L, text("b", perturb = true)), (5L, text("c")))
    q.processAllAvailable()
    assert(got.toMap == Map(3L -> "exact_dup", 4L -> "near_dup", 5L -> "new"))

    // batch 3: in-batch pair of a brand-new family — min doc_id wins even
    // with no index hit; and the index still remembers batch 1
    got.clear()
    in.addData((6L, text("d")), (7L, text("d")), (8L, text("a")))
    q.processAllAvailable()
    assert(got.toMap == Map(6L -> "new", 7L -> "exact_dup", 8L -> "exact_dup"))
    q.stop()
  }

  test("streaming classification matches the batch q106 semi-join form") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sdedup_b").toString
    val docs = graft.core.Tables.documents(spark, sfDir)
    val corpus = docs.filter($"source" =!= "src19")
    val batch = docs.filter($"source" === "src19")
    // seed the index with the corpus, then classify the batch — must
    // equal the batch query's verdicts on the same split
    StreamingDedup.classifyAndIndex(corpus.select($"doc_id", $"text"), s"$dir/index")
    val streaming = StreamingDedup
      .classifyAndIndex(batch.select($"doc_id", $"text"), s"$dir/index")
      .as[(Long, String)].collect().toMap
    val reference = graft.queries.CorpusOpsQueries
      .queries("q106_incremental_dedup")(spark, sfDir)
      .as[(Long, String)].collect().toMap
    assert(streaming == reference)
  }
}
