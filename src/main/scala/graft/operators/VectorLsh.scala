package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.{dot, l2norm}

/** Parameterized hyperplane-LSH over embedding columns — the production
  * surface behind q50/q52 (`queries/{Dedup,Similarity}Queries`), which
  * pin a fixture-sized 8-plane key with a hand-inlined DuckDB mirror.
  * Production scale is this code with wider parameters: nBands·bandBits
  * seeded Gaussian hyperplanes (sign-LSH: P[bit match] = 1 − θ/π), band
  * width trading recall against bucket selectivity exactly like MinHash
  * bands — recall ≈ 1 − (1 − p^bandBits)^nBands at bit-match prob p.
  *
  * Scale shape (unchanged at any width): plane matrices are driver-side
  * literals baked into the plan (nBands·bandBits·dim floats — a few KB
  * at 64 planes × 1k dims); band keys are codegen'd sign-bit sums over
  * the native dot product; candidates always come from a band-bucket
  * equi self-join fed by ONE exchange; keep/drop output is O(n) via
  * min-neighbor suppression (same argument as [[NearDup.lshDropIds]]).
  */
object VectorLsh {

  /** Deterministic Gaussian hyperplanes: `java.util.Random(seed)` has a
    * specified, JVM-stable algorithm, so every driver rebuilds the same
    * matrix from the seed — no matrix needs persisting or shipping. */
  def planes(nPlanes: Int, dim: Int, seed: Long): Array[Array[Float]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian().toFloat))
  }

  /** One band key: bit i of the key is the sign of the projection onto
    * plane `planes(lo + i)`, for i in [0, width). */
  private def bandKey(v: Column, ps: Array[Array[Float]], lo: Int, width: Int): Column =
    (0 until width).map { i =>
      val plane = array(ps(lo + i).map(lit): _*)
      when(dot(v, plane) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** (id, band, key, vec, nrm) rows, hash-distributed on (band, key):
    * the one exchange every consumer (pair join, keeper agg) needs. */
  private def banded(embs: DataFrame, idCol: String, vecCol: String,
      nBands: Int, bandBits: Int, seed: Long): DataFrame = {
    require(nBands >= 1 && bandBits >= 1 && bandBits <= 62,
      s"need 1+ bands of 1..62 bits (got $nBands x $bandBits)")
    // the native dot product resolves through the function registry;
    // Tables.load registers it for query paths, standalone callers here
    graft.expressions.GraftFunctions.ensureRegistered(embs.sparkSession)
    val nonNull = embs.filter(col(vecCol).isNotNull)
    firstVecDim(nonNull, vecCol) match {
      case None => // no vectors at all: empty result, correct schema
        nonNull.select(col(idCol), col(vecCol).as("__vec"),
            lit(0d).as("__nrm"), lit(0).as("band"), lit(0L).as("key"))
          .where(lit(false))
      case Some(dim) =>
        val ps = planes(nBands * bandBits, dim, seed)
        nonNull.select(col(idCol), col(vecCol).as("__vec"),
            l2norm(col(vecCol)).as("__nrm"),
            posexplode(array((0 until nBands).map(b =>
              bandKey(col(vecCol), ps, b * bandBits, bandBits)): _*)))
          .toDF(idCol, "__vec", "__nrm", "band", "key")
          // zero-norm vectors have no direction: cos would be 0/0 = NaN,
          // and Spark orders NaN above every double, so `cos >= t` would
          // admit them as near-dups of each other (they share the all-zero
          // sign key in every band). Exclude them at the source.
          .where(col("__nrm") > 0)
          .repartition(col("band"), col("key"))
    }
  }

  /** Dimension probe: one driver action on one non-null row (callers
    * pass vectors of uniform length — the first row defines it); None
    * when the input has no vectors. */
  private def firstVecDim(embs: DataFrame, vecCol: String): Option[Int] =
    embs.select(size(col(vecCol)).as("__d")).limit(1)
      .collect().headOption.map(_.getInt(0))

  /** Near-dup pairs (id_a, id_b, n_bands, cos) with exact cosine ≥
    * `threshold`, candidates from the band buckets; a pair sharing
    * several bands arrives once per band — collapsed by groupBy, cosine
    * identical on every copy. */
  def cosinePairs(embs: DataFrame, idCol: String, vecCol: String,
      nBands: Int = 8, bandBits: Int = 8, threshold: Double = 0.9,
      seed: Long = 42L): DataFrame = {
    val b = banded(embs, idCol, vecCol, nBands, bandBits, seed)
    b.as("a").join(b.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
        (dot(col("a.__vec"), col("b.__vec")) /
          (col("a.__nrm") * col("b.__nrm"))).as("cos"))
      .where(col("cos") >= threshold)
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_bands"), max(col("cos")).as("cos"))
  }

  /** Ids to DROP under min-neighbor suppression: an id is dropped when
    * the MINIMUM id of one of its band buckets is smaller than it AND
    * clears the cosine threshold. Verifying against only the bucket
    * minimum (not every smaller bucket member) is what keeps output AND
    * compare work O(n·bands) at any clique size; the trade is recall — a
    * near-dup of a non-minimum member survives when the bucket minimum
    * itself is not near (add bands to re-bucket such pairs). */
  def cosineDropIds(embs: DataFrame, idCol: String, vecCol: String,
      nBands: Int = 8, bandBits: Int = 8, threshold: Double = 0.9,
      seed: Long = 42L): DataFrame = {
    val b = banded(embs, idCol, vecCol, nBands, bandBits, seed)
    val keeper = b.groupBy(col("band"), col("key"))
      .agg(min(col(idCol)).as("__keeper"))
    b.join(keeper, Seq("band", "key"))
      .where(col(idCol) > col("__keeper"))
      // one row per (id, band) by construction, so this join is 1:1
      .join(b.select(col(idCol).as("__keeper"), col("band"),
          col("__vec").as("__kvec"), col("__nrm").as("__knrm")),
        Seq("__keeper", "band"))
      .where(dot(col("__vec"), col("__kvec")) /
        (col("__nrm") * col("__knrm")) >= threshold)
      .select(col(idCol)).distinct()
  }
}
