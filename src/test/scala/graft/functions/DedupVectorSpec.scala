package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupVectorSpec extends SparkSpec {

  test("hash32 equals first 8 md5 hex chars as unsigned int") {
    import spark.implicits._
    graft.expressions.GraftFunctions.ensureRegistered(spark)
    // md5("abc") = 900150983cd24fb0... → 0x90015098 = 2416005272
    val v = Seq("abc").toDF("s")
      .select(DedupFunctions.hash32($"s").as("h")).head().getLong(0)
    assert(v == 2416005272L)
  }

  test("shingleRows emits k-grams in tokenization contract") {
    import spark.implicits._
    val docs = Seq((1L, "  a b  c d "), (2L, "x y")).toDF("doc_id", "text")
    val out = DedupFunctions.shingleRows(docs, "doc_id", "text", 3)
      .as[(Long, String)].collect().toSet
    // doc 2 has <3 tokens → no shingles; whitespace runs collapse
    assert(out == Set((1L, "a b c"), (1L, "b c d")))
  }

  test("simhash of identical shingle sets is identical; near sets are close") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "a b c d e f g h i j"),          // identical
      (3L, "a b c d e f g h i k"),          // one token changed
      (4L, "z y x w v u t s r q")).toDF("doc_id", "text")
    val votes = DedupFunctions.simhashVoteAggs(col("h"))
    val sims = DedupFunctions.shingleRows(docs, "doc_id", "text", 3)
      .dropDuplicates("doc_id", "s")
      .select(col("doc_id"), DedupFunctions.hash32(col("s")).as("h"))
      .groupBy(col("doc_id"))
      .agg(votes.head, votes.tail: _*)
      .select(col("doc_id"), DedupFunctions.simhashFromVotes().as("sim"))
      .as[(Long, Long)].collect().toMap
    assert(sims(1L) == sims(2L))
    val hamNear = java.lang.Long.bitCount(sims(1L) ^ sims(3L))
    val hamFar = java.lang.Long.bitCount(sims(1L) ^ sims(4L))
    assert(hamNear < hamFar)
  }

  test("packed vote lanes reproduce the naive per-bit majority simhash exactly") {
    import spark.implicits._
    val docs = (1L to 20L).map(i =>
      (i, (0 until 30).map(j => s"w${(i * 31 + j * 7) % 23}").mkString(" ")))
      .toDF("doc_id", "text")
    val base = DedupFunctions.shingleRows(docs, "doc_id", "text", 3)
      .dropDuplicates("doc_id", "s")
      .select(col("doc_id"), DedupFunctions.hash64(col("s")).as("h"))
    val votes = DedupFunctions.simhashVoteAggs(col("h"), bits = 64)
    val packed = base.groupBy(col("doc_id"))
      .agg(votes.head, votes.tail: _*)
      .select(col("doc_id"), DedupFunctions.simhashFromVotes(64).as("sim"))
      .as[(Long, Long)].collect().toMap
    // naive reference: per-bit sum of +1/-1, bit set when positive
    val naiveAggs = (0 until 64).map(b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
        .as(s"nv$b"))
    val naive = base.groupBy(col("doc_id"))
      .agg(naiveAggs.head, naiveAggs.tail: _*)
      .select(col("doc_id"), (0 until 64).map(b =>
        when(col(s"nv$b") > 0, lit(1L << b)).otherwise(lit(0L)))
        .reduce(_ bitwiseOR _).as("sim"))
      .as[(Long, Long)].collect().toMap
    assert(packed == naive)
  }

  test("vote-lane overflow fails loudly instead of corrupting the simhash") {
    import spark.implicits._
    // fake partial-vote row claiming 2^20 shingles: the guard must fire
    val row = Seq(1L).toDF("doc_id")
      .select(col("doc_id") +:
        (0 to 10).map(g => lit(0L).as(s"pv$g")) :+
        lit(1L << 20).as("pn"): _*)
    val ex = intercept[Exception] {
      row.select(DedupFunctions.simhashFromVotes(32)).collect()
    }
    assert(ex.getMessage.contains("overflow") ||
      ex.getCause != null && ex.getCause.getMessage.contains("overflow"),
      ex.getMessage)
  }

  test("native dot product matches hand computation and DuckDB contract") {
    import spark.implicits._
    graft.expressions.GraftFunctions.ensureRegistered(spark)
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)))
      .toDF("a", "b")
    val d = df.select(VectorFunctions.dot($"a", $"b")).head().getDouble(0)
    assert(d == 32.0)
    val c = df.select(VectorFunctions.cosine($"a", $"a")).head().getDouble(0)
    assert(math.abs(c - 1.0) < 1e-12)
    // mixed float/double arrays (the IVF centroid path)
    val mixed = Seq((Array(1.0f, 2.0f), Array(0.5, 0.25))).toDF("a", "b")
    assert(mixed.select(VectorFunctions.dot($"a", $"b")).head().getDouble(0) == 1.0)
  }

  test("dot is null-safe and truncates to shorter array") {
    import spark.implicits._
    graft.expressions.GraftFunctions.ensureRegistered(spark)
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(2.0f))).toDF("a", "b")
    assert(df.select(VectorFunctions.dot($"a", $"b")).head().getDouble(0) == 2.0)
    val withNull = df.select(VectorFunctions.dot($"a", lit(null).cast("array<float>")))
    assert(withNull.head().isNullAt(0))
  }

  test("quality/text functions produce stable values on a known doc") {
    import spark.implicits._
    // tokens: the cat sat on the mat with a hat and a bat now  (13)
    // stopwords among them: the, on, the, with, a, and, a      (7)
    val df = Seq("the cat sat on the mat with a hat and a bat now").toDF("text")
    assert(df.select(TextFunctions.tokenCount($"text")).head().getLong(0) == 13L)
    val sr = df
      .select(explode(TextFunctions.tokens($"text")).as("tok"))
      .agg(TextFunctions.stopwordRatioOf(
        sum(TextFunctions.isStopword($"tok").cast("long")), count(lit(1))))
      .head().getDouble(0)
    assert(sr == BigDecimal(7.0 / 13.0)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val fp = df.select(TextFunctions.fingerprint($"text")).head().getString(0)
    assert(fp.matches("[0-9a-f]{32}"))
  }
}
