package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[ZOrderLayout]]: the Morton interleave against a bit-twiddling
  * Scala reference, the Column-vs-text spelling parity ([[ZOrderLayout
  * .interleave]] == `expr(zText)` — the oracle runs the text), quantize
  * bounds/monotonicity/degeneracy, the q252 locality claim (a 2-d box
  * touches FEWER z-order partitions than linear ones, with both layouts
  * balanced to ±1 row), and the real [[ZOrderLayout.writeZOrdered]]
  * write path (per-FILE skipping on the non-leading column beats a
  * linear layout's). */
class ZOrderLayoutSpec extends SparkSpec {

  /** Plain bit-twiddling reference (the textbook Morton spelling). */
  private def mortonRef(a: Long, b: Long, bits: Int): Long = {
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((a >> i) & 1L) << (2 * i + 1)
      z |= ((b >> i) & 1L) << (2 * i)
      i += 1
    }
    z
  }

  test("interleave matches the bit-twiddling reference on the full 5-bit grid") {
    val s = spark; import s.implicits._
    val grid = for (a <- 0L until 32L; b <- 0L until 32L) yield (a, b)
    val got = grid.toDF("a", "b")
      .withColumn("z", ZOrderLayout.interleave(col("a"), col("b"), 5))
      .orderBy("a", "b")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (a, b, z) =>
      assert(z == mortonRef(a, b, 5), s"interleave($a, $b)")
    }
    // Morton is a bijection on the grid
    assert(got.map(_._3).distinct.length == grid.length)
  }

  test("zText arithmetic spelling == interleave column spelling (10 bits)") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(500)((rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong))
    val n = rows.toDF("a", "b")
      .withColumn("z_fn", ZOrderLayout.interleave(col("a"), col("b"), 10))
      .withColumn("z_tx", expr(ZOrderLayout.zText("a", "b", 10, "DIV")))
      .where(col("z_fn") =!= col("z_tx"))
      .count()
    assert(n == 0L)
  }

  test("quantize: bounds, monotonicity, degenerate range, text parity") {
    val s = spark; import s.implicits._
    val df = (0L to 999L).toDF("v")
      .withColumn("lo", lit(0L)).withColumn("hi", lit(999L))
      .withColumn("c", ZOrderLayout.quantize(col("v"), col("lo"), col("hi"), 10))
      .withColumn("ct", expr(ZOrderLayout.quantizeText("v", "lo", "hi", 10, "DIV")))
    assert(df.where(col("c") < 0 || col("c") > 1023).count() == 0L)
    assert(df.where(col("c") =!= col("ct")).count() == 0L)
    val cs = df.orderBy("v").select("c").collect().map(_.getLong(0))
    assert(cs.zip(cs.tail).forall { case (x, y) => x <= y }, "monotone")
    // top code is (hi-lo)*2^bits DIV (hi-lo+1): 1023 only when the range
    // divides the code space; 0..999 tops out at 999*1024 DIV 1000 = 1022
    assert(cs.head == 0L && cs.last == 999L * 1024L / 1000L, "endpoints")
    val full = (0L to 1023L).toDF("v")
      .select(ZOrderLayout.quantize(col("v"), lit(0L), lit(1023L), 10).as("c"))
      .agg(min("c"), max("c"), countDistinct("c")).head()
    assert(full.getLong(0) == 0L && full.getLong(1) == 1023L &&
      full.getLong(2) == 1024L, "identity on an exact 2^bits range")
    // degenerate lo == hi codes to 0, never divides by zero
    val deg = Seq(7L).toDF("v")
      .select(ZOrderLayout.quantize(col("v"), lit(7L), lit(7L), 10).as("c"))
      .head().getLong(0)
    assert(deg == 0L)
  }

  test("q252 census: z-order touches fewer partitions than linear; both balanced") {
    val out = graft.SparkEntry.queries("q252_zorder_skip")(spark, sfDir)
      .collect()
    val byLayout = out.groupBy(_.getString(0))
    assert(byLayout.keySet == Set("zorder", "linear"))
    byLayout.foreach { case (layout, rows) =>
      assert(rows.length == 32, s"$layout partition count")
      val counts = rows.map(_.getLong(2))
      assert(counts.max - counts.min <= 1L, s"$layout balance (rank-derived pids)")
    }
    def touched(l: String) = byLayout(l).map(_.getInt(7)).sum
    assert(touched("zorder") < touched("linear"),
      s"2-d box: zorder=${touched("zorder")} vs linear=${touched("linear")}")
    assert(touched("zorder") > 0, "the box is non-empty — someone must serve it")
  }

  test("q254 census: equi-depth codes are balanced and out-occupy min/max on a clustered key") {
    val out = graft.SparkEntry.queries("q254_equidepth_codes")(spark, sfDir)
      .collect()
    val byScheme = out.groupBy(_.getString(0))
    assert(byScheme.keySet == Set("minmax", "equidepth"))
    val ed = byScheme("equidepth")
    // balanced by construction: codes are ±1 rows, buckets hold 32 codes
    assert(ed.map(_.getLong(2)).max - ed.map(_.getLong(2)).min <= 32L)
    def buckets(s: String) = byScheme(s).length
    def codes(s: String) = byScheme(s).map(_.getLong(3)).sum
    assert(buckets("equidepth") >= buckets("minmax"), "bucket occupancy")
    assert(codes("equidepth") > codes("minmax"),
      s"code occupancy: equidepth=${codes("equidepth")} vs minmax=${codes("minmax")}")
    // both schemes partition the same rows
    assert(byScheme("minmax").map(_.getLong(2)).sum ==
      ed.map(_.getLong(2)).sum)
  }

  test("writeZOrdered: non-leading-column probe skips files a linear layout reads") {
    val s = spark; import s.implicits._
    val li = graft.core.Tables.lineitem(s, sfDir)
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    ZOrderLayout.writeZOrdered(li, s"$dir/z", "l_partkey", "l_suppkey",
      bits = 10, partitions = 8)
    // linear comparison layout: range-partitioned + sorted on partkey only
    li.repartitionByRange(8, col("l_partkey"))
      .sortWithinPartitions("l_partkey")
      .write.parquet(s"$dir/lin")
    def filesTouched(path: String): (Long, Long) = {
      val r = s.read.parquet(path)
      val Array(blo, bhi) = r.agg(min("l_suppkey"), max("l_suppkey"))
        .head().toSeq.map(_.asInstanceOf[Long]).toArray
      val q1 = blo + (bhi - blo + 1) / 4
      val q2 = blo + (bhi - blo + 1) / 2
      val total = r.select(input_file_name()).distinct().count()
      // per-file suppkey bounding ranges — what parquet footer stats
      // would serve; a file is touched iff its range overlaps the probe
      val touched = r.groupBy(input_file_name().as("f"))
        .agg(min("l_suppkey").as("lo"), max("l_suppkey").as("hi"))
        .where(col("hi") >= q1 && col("lo") < q2)
        .count()
      (touched, total)
    }
    val (zt, ztot) = filesTouched(s"$dir/z")
    val (lt, ltot) = filesTouched(s"$dir/lin")
    assert(ztot == 8L && ltot == 8L, s"file counts z=$ztot lin=$ltot")
    // linear-by-partkey files each span the whole suppkey range: all read
    assert(lt == ltot, "linear layout cannot skip on the second column")
    assert(zt < lt, s"z-order must skip: z=$zt vs linear=$lt")
  }

  test("writeZOrdered(hilbert=true): tighter per-file box mass than Morton") {
    val s = spark; import s.implicits._
    val li = graft.core.Tables.lineitem(s, sfDir)
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    val dir = java.nio.file.Files.createTempDirectory("hilbw").toString
    ZOrderLayout.writeZOrdered(li, s"$dir/m", "l_partkey", "l_suppkey",
      bits = 10, partitions = 8)
    ZOrderLayout.writeZOrdered(li, s"$dir/h", "l_partkey", "l_suppkey",
      bits = 10, partitions = 8, hilbert = true)
    def boxMass(path: String): Long = {
      val r = s.read.parquet(path)
      val st = r.agg(min("l_partkey"), max("l_partkey"),
        min("l_suppkey"), max("l_suppkey")).head()
      val (alo, ahi, blo, bhi) =
        (st.getLong(0), st.getLong(1), st.getLong(2), st.getLong(3))
      r.withColumn("ca", ZOrderLayout.quantize(col("l_partkey"),
          lit(alo), lit(ahi), 10))
        .withColumn("cb", ZOrderLayout.quantize(col("l_suppkey"),
          lit(blo), lit(bhi), 10))
        .groupBy(input_file_name())
        .agg(((max("ca") - min("ca") + 1) *
          (max("cb") - min("cb") + 1)).as("area"))
        .agg(sum("area")).head().getLong(0)
    }
    val (hm, mm) = (boxMass(s"$dir/h"), boxMass(s"$dir/m"))
    assert(hm < mm, s"hilbert box mass $hm must beat morton $mm " +
      "(the q253 census claim, proven at the real file grain)")
  }

  test("writeZOrdered guards: empty/all-null frame and overflowing key range fail loud") {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("zguard").toString
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    val e1 = intercept[IllegalArgumentException] {
      ZOrderLayout.writeZOrdered(empty, s"$dir/e", "a", "b", bits = 10)
    }
    assert(e1.getMessage.contains("nothing to quantize"))
    val nulls = Seq((null.asInstanceOf[java.lang.Long], java.lang.Long.valueOf(1L)))
      .toDF("a", "b")
    val e2 = intercept[IllegalArgumentException] {
      ZOrderLayout.writeZOrdered(nulls, s"$dir/n", "a", "b", bits = 10)
    }
    assert(e2.getMessage.contains("nothing to quantize"))
    // range wider than 2^(63-bits): (v-lo)*2^bits would overflow Long
    // SILENTLY and land codes on wrong partitions -- must throw instead
    val wide = Seq((0L, 1L), (Long.MaxValue / 2, 2L)).toDF("a", "b")
    val e3 = intercept[IllegalArgumentException] {
      ZOrderLayout.writeZOrdered(wide, s"$dir/w", "a", "b", bits = 20)
    }
    assert(e3.getMessage.contains("overflow"))
  }

  test("writeCurvedExact: one real file per pid, deterministic layout, " +
    "non-leading-column probe skips files (footer stats + pushed filter)") {
    val s = spark; import s.implicits._
    val li = graft.core.Tables.lineitem(s, sfDir)
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    val dir = java.nio.file.Files.createTempDirectory("curvedx").toString
    ZOrderLayout.writeCurvedExact(li, s"$dir/h", "l_partkey", "l_suppkey",
      bits = 10, parts = 8L, hilbert = true,
      tieCols = Seq("l_orderkey", "l_linenumber"))
    ZOrderLayout.writeCurvedExact(li, s"$dir/h2", "l_partkey", "l_suppkey",
      bits = 10, parts = 8L, hilbert = true,
      tieCols = Seq("l_orderkey", "l_linenumber"))
    val r = s.read.parquet(s"$dir/h")
    // one file per pid directory (the hash-repartition guarantees it)
    val perPid = r.select($"pid", input_file_name().as("f")).distinct()
      .groupBy($"pid").agg(count(lit(1)).as("nf")).collect()
    assert(perPid.length == 8 && perPid.forall(_.getLong(1) == 1L),
      "exactly one real file per pid")
    // deterministic: a second write assigns every row the same pid
    val k = Seq("l_orderkey", "l_linenumber", "pid").map(col)
    assert(r.select(k: _*).exceptAll(
      s.read.parquet(s"$dir/h2").select(k: _*)).count() == 0L,
      "exact write must be bit-for-bit reproducible")
    // file-grain skip on the NON-LEADING column, from real footers'
    // content: per-file suppkey ranges vs a quartile probe
    val Array(blo, bhi) = r.agg(min("l_suppkey"), max("l_suppkey"))
      .head().toSeq.map(_.asInstanceOf[Long]).toArray
    val q1 = blo + (bhi - blo + 1) / 4
    val q2 = blo + (bhi - blo + 1) / 2
    val touched = r.groupBy(input_file_name().as("f"))
      .agg(min("l_suppkey").as("lo"), max("l_suppkey").as("hi"))
      .where(col("hi") >= q1 && col("lo") < q2).count()
    assert(touched < 8L, s"probe must skip files (touched $touched of 8)")
    // and the probe predicate actually reaches the parquet scan
    val probed = r.where($"l_suppkey" >= q1 && $"l_suppkey" < q2)
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:") &&
      plan.contains("GreaterThanOrEqual(l_suppkey"),
      s"suppkey range must be pushed to the scan:\n$plan")
  }
}
