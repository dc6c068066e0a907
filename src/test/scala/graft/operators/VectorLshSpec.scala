package graft.operators

import graft.SparkSpec

/** Production-parameter coverage for the vector-LSH operators (the
  * oracle query q50 pins the fixture 2×4-plane key): seeded planes are
  * reproducible, near-identical vectors pair at wide parameters, and the
  * keep/drop form suppresses all but one representative per clique. */
class VectorLshSpec extends SparkSpec {

  private val dim = 16

  private def vec(seed: Int): Array[Float] = {
    val r = new java.util.Random(seed)
    Array.fill(dim)(r.nextGaussian().toFloat)
  }
  private def jitter(v: Array[Float], eps: Float, seed: Int): Array[Float] = {
    val r = new java.util.Random(seed)
    v.map(x => x + eps * r.nextGaussian().toFloat)
  }

  private lazy val embs = {
    val s = spark
    import s.implicits._
    val base = vec(1)
    // 1..3 a near-dup clique (tiny jitter), 4..5 unrelated
    Seq(
      (1L, base), (2L, jitter(base, 1e-4f, 2)), (3L, jitter(base, 1e-4f, 3)),
      (4L, vec(4)), (5L, vec(5))
    ).toDF("vec_id", "embedding")
  }

  test("planes are deterministic in the seed and Gaussian-shaped") {
    val a = VectorLsh.planes(6, 32, seed = 7L)
    val b = VectorLsh.planes(6, 32, seed = 7L)
    val c = VectorLsh.planes(6, 32, seed = 8L)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    assert(a.map(_.toSeq).toSeq != c.map(_.toSeq).toSeq)
    val flat = a.flatten
    assert(flat.count(_ >= 0) > 40 && flat.count(_ < 0) > 40,
      "signs should be roughly balanced")
  }

  test("cosinePairs finds the clique and only the clique at wide parameters") {
    val pairs = VectorLsh
      .cosinePairs(embs, "vec_id", "embedding",
        nBands = 4, bandBits = 6, threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L)), pairs.toString)
  }

  test("cosineDropIds keeps exactly one representative of the clique") {
    val dropped = VectorLsh
      .cosineDropIds(embs, "vec_id", "embedding",
        nBands = 4, bandBits = 6, threshold = 0.99)
      .collect().map(_.getLong(0)).toSet
    assert(dropped == Set(2L, 3L), dropped.toString)
  }

  test("threshold gates the drop: nothing near-dups at cos >= 1") {
    val dropped = VectorLsh
      .cosineDropIds(embs, "vec_id", "embedding",
        nBands = 4, bandBits = 6, threshold = 1.0000001)
      .count()
    assert(dropped == 0L)
  }

  test("empty and all-null inputs yield empty results, not a crash") {
    import org.apache.spark.sql.functions.{col, lit}
    val empty = embs.where(lit(false))
    assert(VectorLsh.cosinePairs(empty, "vec_id", "embedding").count() == 0L)
    assert(VectorLsh.cosineDropIds(empty, "vec_id", "embedding").count() == 0L)
    val nulls = embs.select(col("vec_id"),
      lit(null).cast("array<float>").as("embedding"))
    assert(VectorLsh.cosinePairs(nulls, "vec_id", "embedding").count() == 0L)
  }

  test("zero-norm vectors are excluded, never emitted as NaN-cosine pairs") {
    val s = spark
    import s.implicits._
    // two all-zero vectors share identical all-sign band keys in every
    // band; cos would be 0/0 = NaN, which Spark orders ABOVE any
    // threshold — the guard must drop them at the source
    val withZeros = embs.union(Seq(
      (6L, Array.fill(dim)(0f)), (7L, Array.fill(dim)(0f))
    ).toDF("vec_id", "embedding"))
    val pairs = VectorLsh
      .cosinePairs(withZeros, "vec_id", "embedding",
        nBands = 4, bandBits = 6, threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L)), pairs.toString)
    val dropped = VectorLsh
      .cosineDropIds(withZeros, "vec_id", "embedding",
        nBands = 4, bandBits = 6, threshold = 0.99)
      .collect().map(_.getLong(0)).toSet
    assert(dropped == Set(2L, 3L), dropped.toString)
  }

  test("invalid band shapes are rejected") {
    intercept[IllegalArgumentException] {
      VectorLsh.cosinePairs(embs, "vec_id", "embedding", nBands = 0)
    }
    intercept[IllegalArgumentException] {
      VectorLsh.cosinePairs(embs, "vec_id", "embedding", bandBits = 63)
    }
  }
}
