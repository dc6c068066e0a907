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

  test("a retried batch never sees its own prior attempt (verdicts stable)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sdedup_r").toString
    val idx = s"$dir/index"
    StreamingDedup.classifyAndIndex(
      Seq((1L, text("a"))).toDF("doc_id", "text"), idx, batchId = 0L)
    val b1 = Seq((2L, text("b")), (3L, text("a"))).toDF("doc_id", "text")
    val attempt1 = StreamingDedup.classifyAndIndex(b1, idx, batchId = 1L)
      .as[(Long, String)].collect().toMap
    // foreachBatch is at-least-once: the same batchId re-runs after the
    // index write of the failed attempt. Without batch-scoped writes, doc
    // 2 would self-match via attempt 1's index rows and flip to exact_dup.
    val retry = StreamingDedup.classifyAndIndex(b1, idx, batchId = 1L)
      .as[(Long, String)].collect().toMap
    assert(attempt1 == Map(2L -> "new", 3L -> "exact_dup"))
    assert(retry == attempt1, "retry must reproduce the first attempt's verdicts")
    // and the retry's overwrite leaves no duplicate index rows behind
    val fpRows = spark.read.parquet(s"$idx/fp")
    assert(fpRows.count() == fpRows.dropDuplicates("doc_id", "fp", "batch_id").count())
    // a LATER batch does see batch 1's rows through the index
    val next = StreamingDedup.classifyAndIndex(
      Seq((4L, text("b"))).toDF("doc_id", "text"), idx, batchId = 2L)
      .as[(Long, String)].collect().toMap
    assert(next == Map(4L -> "exact_dup"))
  }

  test("streaming classification matches the batch q106 semi-join form") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sdedup_b").toString
    val docs = graft.core.Tables.documents(spark, sfDir)
    val corpus = docs.filter($"source" =!= "src19")
    val batch = docs.filter($"source" === "src19")
    // seed the index with the corpus, then classify the batch — must
    // equal the batch query's verdicts on the same split
    StreamingDedup.classifyAndIndex(corpus.select($"doc_id", $"text"),
      s"$dir/index", batchId = 0L)
    val streaming = StreamingDedup
      .classifyAndIndex(batch.select($"doc_id", $"text"),
        s"$dir/index", batchId = 1L)
      .as[(Long, String)].collect().toMap
    val reference = graft.queries.CorpusOpsQueries
      .queries("q106_incremental_dedup")(spark, sfDir)
      .as[(Long, String)].collect().toMap
    assert(streaming == reference)
  }
}
